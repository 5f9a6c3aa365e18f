"""On-disk preprocessed dataset cache (npz shards, one per song).

TPU-native replacement for the reference's TFRecord cache
(`/root/reference/Datasets.py:43-115`): each song becomes one compressed ``.npz``
holding float32 ``(length, channels)`` arrays per key (sources + mix), already
zero-padded at both ends by the network's context ``(input - output) // 2``
(`Datasets.py:47-49,76`). Cache directory naming mirrors the reference
(`task_X_sr_Y_mono_Z`, `Datasets.py:129-132`) so a config change re-triggers
preprocessing.

Corrupt/unreadable source files are skipped with a warning, keeping the
reference's fault tolerance (`Datasets.py:70-73`).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from waveunet_tpu.config import Config
from waveunet_tpu.data.audio_io import load


def cache_dir(cfg: Config) -> str:
    name = f"task_{cfg.task}_sr_{cfg.expected_sr}_mono_{cfg.mono_downmix}"
    return os.path.join(cfg.data_path, name)


def partition_dir(cfg: Config, partition: str) -> str:
    return os.path.join(cache_dir(cfg), partition)


def is_prepared(cfg: Config) -> bool:
    # meta.json is the LAST file each partition write emits, so it doubles as
    # the completion marker: a bare cache directory can be a crashed partial
    # preprocess and must not be treated as complete (round-2 review finding).
    return all(
        os.path.exists(os.path.join(partition_dir(cfg, p), "meta.json"))
        for p in ("train", "valid", "test"))


def write_song(path: str, tracks: Dict[str, np.ndarray]):
    np.savez(path, **{k: v.astype(np.float32) for k, v in tracks.items()})


def load_song(path: str) -> Dict[str, np.ndarray]:
    # A shard that prepared cleanly can still rot on disk (partial write on
    # a crash mid-copy, bit flips); np.load surfaces that as zipfile/zlib
    # internals (BadZipFile, EOFError, ...) with no path. Normalise the
    # CORRUPTION signatures to a ValueError naming the shard so callers can
    # skip-and-warn uniformly (pipeline reader, device banks) — found by
    # fuzzing. Environmental failures (FileNotFoundError, PermissionError,
    # MemoryError, NFS outages) propagate untouched: skipping those would
    # silently shrink the training set over a storage problem.
    import pickle
    import zipfile
    import zlib
    try:
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    except (zipfile.BadZipFile, zlib.error, EOFError, KeyError,
            pickle.UnpicklingError, ValueError) as e:
        raise ValueError(f"corrupt cache shard {path!r}: {e}") from e


def list_songs(cfg: Config, partition: str) -> List[str]:
    d = partition_dir(cfg, partition)
    if not os.path.isdir(d):
        return []
    return sorted(os.path.join(d, f) for f in os.listdir(d) if f.endswith(".npz"))


def preprocess_partition(cfg: Config, partition: str,
                         sample_list: Sequence[Dict[str, str]],
                         pad_frames: int) -> List[str]:
    """Load every song's stems, context-pad, and write npz shards.

    ``sample_list`` entries map each source name + "mix" to an audio file path
    (the output of the MUSDB/CCMixter ingest, `Datasets.py:221-295`).
    """
    out_dir = partition_dir(cfg, partition)
    os.makedirs(out_dir, exist_ok=True)
    all_keys = list(cfg.source_names) + ["mix"]
    written = []
    for idx, sample in enumerate(sample_list):
        try:
            tracks: Dict[str, np.ndarray] = {}
            for key in all_keys:
                audio, _ = load(sample[key], sr=cfg.expected_sr,
                                mono=cfg.mono_downmix)
                if not cfg.mono_downmix and audio.shape[1] == 1:
                    audio = np.tile(audio, [1, 2])  # mono -> stereo duplicate
                tracks[key] = audio
        except Exception as e:  # skip corrupt files (`Datasets.py:70-73`)
            print(f"WARNING: skipping sample {idx} ({e})")
            continue

        length = tracks["mix"].shape[0]
        channels = tracks["mix"].shape[1]
        ok = all(v.shape == (length, channels) for v in tracks.values())
        if not ok:
            # Some stems are off by a frame after decode; trim to the minimum.
            length = min(v.shape[0] for v in tracks.values())
            tracks = {k: v[:length] for k, v in tracks.items()}

        if pad_frames > 0:
            tracks = {k: np.pad(v, [(pad_frames, pad_frames), (0, 0)])
                      for k, v in tracks.items()}
        path = os.path.join(out_dir, f"song_{idx:04d}.npz")
        write_song(path, tracks)
        written.append(path)

    meta = {"pad_frames": pad_frames, "num_songs": len(written),
            "keys": all_keys, "sr": cfg.expected_sr,
            "channels": cfg.num_channels}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return written


def prepare_dataset(cfg: Config, pad_frames: int,
                    seed: Optional[int] = None) -> None:
    """Full preprocessing: MUSDB (+CCMixter for voice) -> npz cache.

    Mirrors `Datasets.get_dataset`'s cache-miss branch (`Datasets.py:134-185`):
    fixed seeded 25-song validation split out of the MUSDB train set, CCMixter
    appended to train for the voice task.
    """
    from waveunet_tpu.data.ingest import get_ccmixter, get_musdb

    if is_prepared(cfg):
        return
    train_list, test_list = get_musdb(cfg.musdb_path)
    rng = np.random.RandomState(cfg.seed if seed is None else seed)
    # cfg.num_val_songs validation songs (reference: 25, `Datasets.py:140`),
    # but never drain a small dataset's train partition.
    n_val = min(cfg.num_val_songs, max(0, len(train_list) - 1))
    val_idx = rng.choice(len(train_list), size=n_val, replace=False)
    val_set = set(int(i) for i in val_idx)
    partitions = {
        "train": [s for i, s in enumerate(train_list) if i not in val_set],
        "valid": [s for i, s in enumerate(train_list) if i in val_set],
        "test": list(test_list),
    }
    if cfg.task == "voice" and os.path.exists(cfg.ccmixter_xml):
        partitions["train"].extend(get_ccmixter(cfg.ccmixter_xml))

    for part, samples in partitions.items():
        print(f"Writing {part} partition ({len(samples)} songs)...")
        preprocess_partition(cfg, part, samples, pad_frames)
