"""Batched sliding-window separation engine.

The reference separates full songs with a *serial* loop — one batch-1 ``sess.run``
per window, hop = output length (`/root/reference/Evaluate.py:82-145`). That is the
reference's biggest inefficiency and our north-star redesign target (SURVEY.md §3.2):

  * all windows of a song are framed host-side as a zero-copy strided view,
  * swept through a **jitted, fixed-shape, batched** forward pass (one XLA program,
    amortised dispatch), optionally **sharded across a device mesh** so windows ride
    the data axis (window parallelism = data parallelism over time),
  * and stitched back on host with the reference's exact overlap semantics
    (last window right-aligned, later writes win — `Evaluate.py:125-139`).

Semantics match `predict_track` step by step: mono downmix / channel duplication
(`:98-102`), resample to model rate (`:104`), zero-pad short songs (`:107-111`),
context padding (`:121-122`), and end-trim (`:142-143`).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from waveunet_tpu.config import Config
from waveunet_tpu.models.waveunet import apply_waveunet
from waveunet_tpu.ops import shapes
from waveunet_tpu.ops.resample import resample


def window_positions(n_total: int, out_len: int) -> np.ndarray:
    """Window start positions: hop = out_len, last window right-aligned
    (`Evaluate.py:125-128`)."""
    pos = np.arange(0, n_total, out_len, dtype=np.int64)
    pos = np.minimum(pos, n_total - out_len)
    return pos


def frame_windows(padded: np.ndarray, positions: np.ndarray, in_len: int
                  ) -> np.ndarray:
    """Gather [n_win, in_len, ch] windows from context-padded audio.

    Uniform-hop windows come from a zero-copy ``sliding_window_view``; the
    (possibly) right-aligned last window is gathered explicitly.
    """
    view = np.lib.stride_tricks.sliding_window_view(padded, in_len, axis=0)
    # view: [n_total_padded - in_len + 1, ch, in_len]
    wins = view[positions]                      # [n_win, ch, in_len]
    return np.ascontiguousarray(np.transpose(wins, (0, 2, 1)))


class Separator:
    """Reusable jitted separation engine for one (config, params) pair.

    ``forward_fn(params, mix_batch) -> {source: batch}`` defaults to the
    Wave-U-Net forward in inference mode; the spectrogram model plugs in its own.
    """

    def __init__(self, cfg: Config, params,
                 forward_fn: Optional[Callable] = None,
                 mesh: Optional[jax.sharding.Mesh] = None):
        self.cfg = cfg
        self.params = params
        self.in_len, self.out_len = shapes.get_padding(cfg, cfg.num_frames)
        self.pad = (self.in_len - self.out_len) // 2
        self.mesh = mesh
        n_dev = 1 if mesh is None else mesh.size
        # Per-sweep device batch: windows per step across the whole mesh.
        self.batch = max(1, cfg.infer_batch) * n_dev

        if forward_fn is None:
            def forward_fn(p, x):
                return apply_waveunet(p, cfg, x, training=False)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data_axes = mesh.axis_names
            x_sharding = NamedSharding(mesh, P(data_axes, None, None))
            rep = NamedSharding(mesh, P())
            self._fwd = jax.jit(
                forward_fn,
                in_shardings=(rep, x_sharding),
                out_shardings=x_sharding)
        else:
            self._fwd = jax.jit(forward_fn)

        # Device-resident params (replicated when on a mesh).
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(mesh, P())
            self.params = jax.device_put(params, rep)

    # -- full-song separation -------------------------------------------------
    def separate(self, mix_audio: np.ndarray, mix_sr: int) -> Dict[str, np.ndarray]:
        """Separate (n_frames, n_channels) audio; returns sources at the model's
        ``expected_sr`` and channel count (resampling back is the caller's
        concern, mirroring `Evaluate.py:61-64`)."""
        cfg = self.cfg
        assert mix_audio.ndim == 2
        # Channel handling (`Evaluate.py:98-102`).
        if cfg.mono_downmix:
            mix_audio = np.mean(mix_audio, axis=1, keepdims=True)
        elif mix_audio.shape[1] == 1:
            mix_audio = np.tile(mix_audio, [1, 2])
        mix_audio = resample(mix_audio, mix_sr, cfg.expected_sr)

        # Zero-pad short songs up to one full network input (`:107-111`).
        extra_pad = 0
        if mix_audio.shape[0] < self.in_len:
            extra_pad = self.in_len - mix_audio.shape[0]
            mix_audio = np.pad(mix_audio, [(0, extra_pad), (0, 0)])

        n_total = mix_audio.shape[0]
        padded = np.pad(mix_audio, [(self.pad, self.pad), (0, 0)])
        positions = window_positions(n_total, self.out_len)
        windows = frame_windows(padded, positions, self.in_len)
        outs = self._run_batched(windows)

        # Stitch (in order: later windows overwrite, matching `:139`).
        preds = {}
        for name, src_wins in outs.items():
            buf = np.zeros_like(mix_audio)
            for i, p in enumerate(positions):
                buf[p:p + self.out_len] = src_wins[i]
            if extra_pad > 0:
                buf = buf[:-extra_pad]
            preds[name] = buf
        return preds

    def _run_batched(self, windows: np.ndarray) -> Dict[str, np.ndarray]:
        """Sweep [n_win, in_len, ch] through the jitted forward in fixed-shape
        chunks (pad the tail chunk; static shapes keep XLA to one program)."""
        n_win = windows.shape[0]
        bs = self.batch
        n_chunks = -(-n_win // bs)
        out_chunks: Dict[str, list] = {}
        for ci in range(n_chunks):
            chunk = windows[ci * bs:(ci + 1) * bs]
            if chunk.shape[0] < bs:
                pad = bs - chunk.shape[0]
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            res = self._fwd(self.params, jnp.asarray(chunk))
            res = jax.device_get(res)
            for name, v in res.items():
                out_chunks.setdefault(name, []).append(v)
        return {name: np.concatenate(vs)[:n_win]
                for name, vs in out_chunks.items()}


def separate_file(cfg: Config, params, input_path: str,
                  output_path: Optional[str] = None,
                  mesh: Optional[jax.sharding.Mesh] = None) -> Dict[str, str]:
    """Separate an audio file into per-source WAVs next to the input
    (mirrors `Evaluate.produce_source_estimates`, `/root/reference/Evaluate.py:161-193`).
    Returns {source_name: written_path}."""
    import os

    from waveunet_tpu.data.audio_io import load, write_wav

    audio, sr = load(input_path, sr=None, mono=False)
    sep = Separator(cfg, params, mesh=mesh)
    preds = sep.separate(audio, sr)

    folder, fname = os.path.split(input_path)
    out_dir = output_path or folder
    os.makedirs(out_dir, exist_ok=True)
    written = {}
    for name, est in preds.items():
        # Resample back to the original rate, trim to source length (`:64`).
        est = resample(est, cfg.expected_sr, sr)[:audio.shape[0]]
        if cfg.mono_downmix and audio.shape[1] > 1:
            est = np.tile(est, [1, audio.shape[1]])
        path = os.path.join(out_dir, f"{fname}_{name}.wav")
        write_wav(path, est, sr)
        written[name] = path
    return written
