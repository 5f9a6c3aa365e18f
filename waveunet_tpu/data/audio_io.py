"""Host-side audio I/O: WAV read/write without third-party decoders.

The reference leans on librosa/soundfile/ffmpeg for decode (`Utils.py:97-102`,
`Datasets.py:62-69`); none of those are guaranteed here, so we provide a
self-contained numpy WAV codec (PCM 8/16/24/32 and float32/64) plus optional
hooks: soundfile if importable, ffmpeg CLI if on PATH (for mp3/stems).

Convention matches `Utils.load`: audio is always returned as float32
``(n_frames, n_channels)`` in [-1, 1].
"""

from __future__ import annotations

import os
import shutil
import struct
import subprocess
import wave
from typing import Optional, Tuple

import numpy as np

try:  # optional accelerator, not required
    import soundfile as _sf  # type: ignore
except Exception:  # pragma: no cover
    _sf = None

_FFMPEG = shutil.which("ffmpeg")


def _read_wav_numpy(path: str) -> Tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        hdr12 = f.read(12)
        if len(hdr12) < 12:
            raise ValueError(f"{path}: truncated WAV header")
        riff, size, wave_id = struct.unpack("<4sI4s", hdr12)
        if riff != b"RIFF" or wave_id != b"WAVE":
            raise ValueError(f"{path}: not a RIFF/WAVE file")
        fmt = None
        data = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            chunk_id, chunk_sz = struct.unpack("<4sI", hdr)
            if chunk_id == b"fmt ":
                fmt = f.read(chunk_sz)
                f.seek(chunk_sz & 1, 1)  # RIFF pads odd chunks by one byte
            elif chunk_id == b"data":
                data = f.read(chunk_sz)
                f.seek(chunk_sz & 1, 1)
            else:
                f.seek(chunk_sz + (chunk_sz & 1), 1)
            if fmt is not None and data is not None:
                break
    if fmt is None or data is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError(f"{path}: truncated fmt chunk ({len(fmt)} bytes)")
    audio_fmt, n_ch, sr, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if n_ch < 1 or sr < 1:
        # a zero here would surface as a bare ZeroDivisionError from the
        # de-interleave / resampler — malformed input must be a ValueError
        raise ValueError(
            f"{path}: invalid WAV header (channels={n_ch}, sample rate={sr})")
    if audio_fmt == 0xFFFE and len(fmt) >= 40:  # WAVE_FORMAT_EXTENSIBLE
        audio_fmt = struct.unpack("<H", fmt[24:26])[0]
    if audio_fmt == 1:  # PCM
        if bits == 8:
            x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, np.uint8).reshape(-1, 3)
            x = ((raw[:, 0].astype(np.int32)) | (raw[:, 1].astype(np.int32) << 8)
                 | (raw[:, 2].astype(np.int32) << 16))
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, "<i4").astype(np.float32) / float(1 << 31)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_fmt == 3:  # IEEE float
        x = np.frombuffer(data, "<f4" if bits == 32 else "<f8").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV format tag {audio_fmt}")
    n = (len(x) // n_ch) * n_ch
    return x[:n].reshape(-1, n_ch), sr


def write_wav(path: str, audio: np.ndarray, sr: int, subtype: str = "PCM_16"):
    """Write float32 (n_frames, n_channels) audio as a WAV file."""
    audio = np.asarray(audio)
    if audio.ndim == 1:
        audio = audio[:, None]
    if np.issubdtype(audio.dtype, np.floating) \
            and not np.isfinite(audio).all():
        # np.round(nan)*32767 -> astype(i2) writes garbage PCM silently; a
        # diverged model or broken pipeline should fail loudly, not ship a
        # corrupt WAV (found by fuzzing)
        raise ValueError(f"non-finite samples in audio for {path!r}")
    if subtype == "PCM_16":
        pcm = np.clip(audio, -1.0, 1.0)
        pcm = np.round(pcm * 32767.0).astype("<i2")
        with wave.open(path, "wb") as w:
            w.setnchannels(audio.shape[1])
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
    elif subtype == "FLOAT":
        data = audio.astype("<f4").tobytes()
        n_ch = audio.shape[1]
        byte_rate = sr * n_ch * 4
        with open(path, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
            f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, n_ch, sr,
                                          byte_rate, n_ch * 4, 32))
            f.write(b"data" + struct.pack("<I", len(data)) + data)
    else:
        raise ValueError(f"unsupported subtype {subtype}")


def _decode_via_ffmpeg(path: str) -> Tuple[np.ndarray, int]:
    """Decode arbitrary formats via the ffmpeg CLI (stems/mp3), if present."""
    if _FFMPEG is None:
        raise RuntimeError(
            f"cannot decode {path!r}: not a WAV and ffmpeg is unavailable")
    # The reference documents ffmpeg hangs during MUSDB conversion with
    # "regenerate" as the remedy (`/root/reference/README.md:137`); a timeout
    # turns the hang into a skippable per-file error.
    probe = subprocess.run(
        [_FFMPEG, "-i", path, "-f", "f32le", "-acodec", "pcm_f32le", "-"],
        capture_output=True, check=True, timeout=600)
    # Parse sample rate + channels from stderr metadata.
    sr, n_ch = 44100, 2
    for line in probe.stderr.decode("utf-8", "ignore").splitlines():
        if "Audio:" in line:
            for part in line.split(","):
                part = part.strip()
                if part.endswith("Hz"):
                    sr = int(part.split()[0])
                elif part in ("mono", "stereo"):
                    n_ch = 1 if part == "mono" else 2
                elif part.endswith("channels"):
                    n_ch = int(part.split()[0])
            break
    x = np.frombuffer(probe.stdout, "<f4")
    n = (len(x) // n_ch) * n_ch
    return x[:n].reshape(-1, n_ch), sr


def load(path: str, sr: Optional[int] = None, mono: bool = True
         ) -> Tuple[np.ndarray, int]:
    """Load audio as float32 (frames, channels); optionally downmix + resample.

    Mirrors `Utils.load` semantics (`/root/reference/Utils.py:97-102`): mono
    downmix averages channels; resampling happens if ``sr`` differs from native.
    """
    ext = os.path.splitext(path)[1].lower()
    if ext in (".wav", ".wave"):
        try:
            audio, native_sr = _read_wav_numpy(path)
        except (ValueError, struct.error, EOFError):
            # struct.error covers truncated headers — not a ValueError
            # subclass, so it previously bypassed the soundfile fallback.
            if _sf is not None:
                data, native_sr = _sf.read(path, dtype="float32", always_2d=True)
                audio = np.asarray(data, np.float32)
            else:
                raise
    elif ext in (".mp3", ".mp2", ".mpga"):
        # Primary mp3 path: the system libmpg123 via ctypes (data/mp3.py) —
        # no ffmpeg in this environment; soundfile/ffmpeg remain fallbacks.
        from waveunet_tpu.data import mp3 as _mp3
        if _mp3.available():
            audio, native_sr = _mp3.decode_mp3(path)
        elif _sf is not None:
            data, native_sr = _sf.read(path, dtype="float32", always_2d=True)
            audio = np.asarray(data, np.float32)
        else:
            audio, native_sr = _decode_via_ffmpeg(path)
    elif _sf is not None:
        data, native_sr = _sf.read(path, dtype="float32", always_2d=True)
        audio = np.asarray(data, np.float32)
    else:
        audio, native_sr = _decode_via_ffmpeg(path)

    if mono and audio.shape[1] > 1:
        audio = np.mean(audio, axis=1, keepdims=True)
    if sr is not None and sr != native_sr:
        from waveunet_tpu.ops.resample import resample
        audio = resample(audio, native_sr, sr)
        native_sr = sr
    return np.ascontiguousarray(audio, np.float32), native_sr
