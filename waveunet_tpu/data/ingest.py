"""Dataset ingest: MUSDB18 stems and the CCMixter manifest.

Host-side, mirrors `/root/reference/Datasets.py:221-295`:
  * MUSDB: decode each track's stems (via the ``musdb`` package + ffmpeg when
    installed, else a pre-extracted WAV directory layout), write per-stem WAVs,
    synthesise accompaniment = clip(sum of non-vocal stems) and the mixture,
    print the additivity-deviation check, and skip tracks already converted.
  * CCMixter: parse the XML manifest into {mix, accompaniment, vocals} paths.

Because ``musdb``/``ffmpeg`` may be absent, ``get_musdb`` also accepts a plain
directory tree of WAVs: ``<root>/{train,test}/<song>/{mixture,bass,drums,other,
vocals}.wav`` (the musdb "is_wav" layout), which needs no decoder at all.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from waveunet_tpu.data.audio_io import load, write_wav

_STEMS = ("bass", "drums", "other", "vocals")


def _ingest_wav_track(track_dir: str) -> Dict[str, str]:
    """Build sample paths from a pre-decoded WAV track dir; synthesise the
    accompaniment (clip(sum of non-vocals), `Datasets.py:260-261`) and verify
    mixture additivity (`Datasets.py:269-271`) if not already done."""
    paths = {}
    mix_src = os.path.join(track_dir, "mixture.wav")
    if not os.path.exists(mix_src):
        raise FileNotFoundError(f"{track_dir}: no mixture.wav")
    paths["mix"] = mix_src
    have_stems = True
    for stem in _STEMS:
        p = os.path.join(track_dir, f"{stem}.wav")
        if os.path.exists(p):
            paths[stem] = p
        elif stem == "vocals":
            raise FileNotFoundError(f"{track_dir}: missing stem vocals")
        else:
            have_stems = False  # voice-task layout: vocals + accompaniment only

    acc_path = os.path.join(track_dir, "accompaniment.wav")
    if not os.path.exists(acc_path) and not have_stems:
        raise FileNotFoundError(
            f"{track_dir}: needs accompaniment.wav or bass/drums/other stems")
    if not os.path.exists(acc_path):
        stems = {s: load(paths[s], sr=None, mono=False)[0] for s in _STEMS}
        sr = load(paths["mix"], sr=None, mono=False)[1]
        acc = np.clip(sum(stems[s] for s in _STEMS if s != "vocals"), -1.0, 1.0)
        write_wav(acc_path, acc, sr)
        mix_audio = load(paths["mix"], sr=None, mono=False)[0]
        n = min(mix_audio.shape[0], acc.shape[0], stems["vocals"].shape[0])
        diff = np.abs(mix_audio[:n] - acc[:n] - stems["vocals"][:n])
        print(f"Additivity check {os.path.basename(track_dir)}: "
              f"max={diff.max():.4f} mean={diff.mean():.6f}")
    paths["accompaniment"] = acc_path
    return paths


def get_musdb(database_path: str) -> Tuple[List[Dict[str, str]],
                                           List[Dict[str, str]]]:
    """Return (train_samples, test_samples); each sample maps source name +
    "mix" to an audio path. Prefers the decoded-WAV layout; falls back to the
    ``musdb`` stem decoder when installed."""
    wav_layout = all(
        os.path.isdir(os.path.join(database_path, part))
        for part in ("train", "test"))
    if wav_layout:
        subsets = []
        for part in ("train", "test"):
            part_dir = os.path.join(database_path, part)
            samples = []
            for song in sorted(os.listdir(part_dir)):
                track_dir = os.path.join(part_dir, song)
                if not os.path.isdir(track_dir):
                    continue
                try:
                    samples.append(_ingest_wav_track(track_dir))
                except FileNotFoundError as e:
                    print(f"WARNING: skipping {track_dir}: {e}")
            subsets.append(samples)
        if subsets[0]:
            return subsets[0], subsets[1]

    try:
        import musdb  # type: ignore
    except ImportError as e:
        raise RuntimeError(
            f"MUSDB not found at {database_path!r} in WAV layout and the "
            f"'musdb' stem decoder is not installed") from e

    mus = musdb.DB(root=database_path)

    def _part_tracks(part):
        if hasattr(mus, "load_mus_tracks"):
            return mus.load_mus_tracks(part)
        # Older/newer musdb without load_mus_tracks: build a per-subset DB —
        # falling back to mus.tracks here would hand BOTH loop iterations the
        # full track list, silently making train == test (round-2 review).
        return musdb.DB(root=database_path, subsets=[part]).tracks

    subsets = []
    for part in ("train", "test"):
        samples = []
        for track in _part_tracks(part):
            base = os.path.splitext(track.path)[0]
            paths = {"mix": base + "_mix.wav"}
            if not os.path.exists(paths["mix"]):
                sr = track.rate
                stem_audio = {}
                for stem in _STEMS:
                    p = base + f"_{stem}.wav"
                    write_wav(p, track.targets[stem].audio, sr)
                    stem_audio[stem] = track.targets[stem].audio
                    paths[stem] = p
                acc = np.clip(sum(stem_audio[s] for s in _STEMS
                                  if s != "vocals"), -1.0, 1.0)
                write_wav(base + "_accompaniment.wav", acc, sr)
                write_wav(paths["mix"], track.audio, sr)
            for stem in _STEMS:
                paths[stem] = base + f"_{stem}.wav"
            paths["accompaniment"] = base + "_accompaniment.wav"
            samples.append(paths)
        subsets.append(samples)
    return subsets[0], subsets[1]


def get_ccmixter(xml_path: str) -> List[Dict[str, str]]:
    """Parse the CCMixter XML manifest -> {mix, accompaniment, vocals} paths
    (`/root/reference/Datasets.py:279-295`)."""
    import xml.etree.ElementTree as ET

    tree = ET.parse(xml_path)
    root = tree.getroot()
    db_path = root.findtext("./databaseFolderPath") or ""

    samples = []
    for track in root.iter("track"):
        by_name = {}
        for inst in track.iter("instrument"):
            name = inst.findtext("instrumentName")
            rel = inst.findtext("relativeFilepath")
            if name and rel:
                by_name[name] = os.path.join(db_path, rel)
        if {"Voice", "Mix", "Instrumental"} <= set(by_name):
            samples.append({"mix": by_name["Mix"],
                            "accompaniment": by_name["Instrumental"],
                            "vocals": by_name["Voice"]})
    return samples
