"""Streaming separation for serving: push audio chunks, pull separated stems.

The reference only supports whole-file offline separation
(`/root/reference/Evaluate.py:82-145`). For production serving this wrapper
runs the same context-padded windowed inference incrementally:

  * incoming samples accumulate in a ring buffer seeded with (in-out)/2 zeros
    of leading context (the offline engine's left pad);
  * whenever full analysis windows are available, up to ``batch_windows`` of
    them are swept through ONE jitted batched forward (batch sizes bucketed to
    powers of two so at most log2(batch_windows)+1 shapes ever compile),
    emitting ``out_len`` new samples per window (algorithmic latency =
    out_len + context, independent of batching);
  * ``flush()`` zero-pads the tail to emit the remainder (the only place the
    stream can differ from offline separation, which right-aligns its final
    window into real future context).

Serving throughput: the serial batch-1 dispatch pattern this replaces is
exactly the reference's per-window ``sess.run`` loop
(`Evaluate.py:125-139`); batching keeps the MXU busy across windows the same
way the offline engine does.

Parity: every fully-contexted output sample matches the offline engine's
output for the same signal, and batched draining matches serial draining to
fp32 conv-tiling tolerance (tested in tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from waveunet_tpu.config import Config
from waveunet_tpu.models.waveunet import apply_waveunet
from waveunet_tpu.ops import shapes


class StreamingSeparator:
    def __init__(self, cfg: Config, params, batch_windows: int = 1):
        self.cfg = cfg
        frames = cfg.infer_num_frames or cfg.num_frames
        self.in_len, self.out_len = shapes.get_padding(cfg, frames)
        self.pad = (self.in_len - self.out_len) // 2
        self.batch = max(1, batch_windows)
        self.params = params

        def fwd(p, x):
            return apply_waveunet(p, cfg, x, training=False)

        self._fwd = jax.jit(fwd)
        self.reset()

    def reset(self):
        # leading context zeros, matching the offline engine's left pad
        self._buf = np.zeros((self.pad, self.cfg.num_channels), np.float32)
        self._emitted = 0  # output samples produced so far
        self._pushed = 0   # input samples received so far

    @property
    def latency_samples(self) -> int:
        """Algorithmic latency: a sample is emitted once the window covering it
        plus its right context has arrived."""
        return self.out_len + self.pad

    def push(self, chunk: np.ndarray) -> Dict[str, np.ndarray]:
        """Feed (n, ch) samples at the model rate; returns newly separated
        audio per source ((0, ch) arrays when nothing is ready yet)."""
        chunk = np.asarray(chunk, np.float32)
        if chunk.ndim == 1:
            chunk = chunk[:, None]
        assert chunk.shape[1] == self.cfg.num_channels
        self._buf = np.concatenate([self._buf, chunk])
        self._pushed += chunk.shape[0]
        return self._drain(final=False)

    def flush(self) -> Dict[str, np.ndarray]:
        """Zero-pad the tail and emit everything up to the stream end."""
        remaining = self._pushed - self._emitted
        if remaining <= 0:
            return self._empty()
        pad_needed = self.in_len  # enough to complete the last window(s)
        self._buf = np.concatenate(
            [self._buf, np.zeros((pad_needed, self.cfg.num_channels),
                                 np.float32)])
        out = self._drain(final=True)
        return out

    def _empty(self) -> Dict[str, np.ndarray]:
        return {s: np.zeros((0, self.cfg.num_channels), np.float32)
                for s in self.cfg.source_names}

    @staticmethod
    def _bucket(k: int) -> int:
        b = 1
        while b < k:
            b *= 2
        return b

    def _drain(self, final: bool) -> Dict[str, np.ndarray]:
        outs = {s: [] for s in self.cfg.source_names}
        target = self._pushed if final else None
        while True:
            if target is not None and self._emitted >= target:
                break
            # number of complete windows sitting in the buffer
            avail = 0
            if self._buf.shape[0] >= self.in_len:
                avail = (self._buf.shape[0] - self.in_len) // self.out_len + 1
            if target is not None:
                need = -(-(target - self._emitted) // self.out_len)
                avail = min(avail, need)
            if avail <= 0:
                break
            k = min(avail, self.batch)
            windows = np.stack([
                self._buf[i * self.out_len:i * self.out_len + self.in_len]
                for i in range(k)])
            b = self._bucket(k)
            if b > k:  # pad to the bucket shape; padded rows are discarded
                windows = np.concatenate(
                    [windows, np.zeros((b - k,) + windows.shape[1:],
                                       np.float32)])
            res = self._fwd(self.params, jnp.asarray(windows))
            for i in range(k):
                take = self.out_len
                if target is not None:
                    take = min(take, target - self._emitted)
                if take <= 0:
                    break
                for s in self.cfg.source_names:
                    outs[s].append(np.asarray(res[s][i, :take]))
                self._emitted += take
            self._buf = self._buf[k * self.out_len:]
        if not outs[self.cfg.source_names[0]]:
            return self._empty()
        return {s: np.concatenate(v) for s, v in outs.items()}
