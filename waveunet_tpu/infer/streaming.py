"""Streaming separation for serving: push audio chunks, pull separated stems.

The reference only supports whole-file offline separation
(`/root/reference/Evaluate.py:82-145`). For production serving this runs the
same context-padded windowed inference incrementally — designed transfer-first
like the offline engine:

  * the analysis context lives in a DEVICE-RESIDENT ring buffer: each pushed
    sample crosses the host->device wire exactly once (a host-side buffer
    would re-ship the in_len/out_len ~ 9x redundant context of every window);
    chunk H2D lengths are bucketed to powers of two so appends compile O(log)
    many times;
  * whenever full analysis windows are available, up to ``batch_windows`` of
    them are framed on device (static-offset dynamic_slice) and swept through
    ONE jitted batched forward (window-count buckets: powers of two), the
    buffer rolling forward in the same program;
  * outputs are quantised to int16 on device when ``cfg.infer_wire_dtype ==
    "int16"`` (halves the device->host wire, identical to the offline
    engine's PCM16-lossless trick);
  * ``flush()`` zero-pads the tail to emit the remainder (the only place the
    stream can differ from offline separation, which right-aligns its final
    window into real future context).

Algorithmic latency = out_len + context, independent of batching.

Parity: every fully-contexted output sample matches the offline engine's
output for the same signal, and batched draining matches serial draining to
fp32 conv-tiling tolerance (tested in tests/test_streaming.py).

Both families stream: the time-domain Wave-U-Net (context-padded windows)
and the spectrogram U-Net (`UnetSpectrogramSeparator.py:40-106` semantics —
its windows satisfy the same (in_len, out_len) stitching contract with zero
context pad, so the ring/drain machinery is shared; mask+phase STFT work
happens inside the jitted forward per window).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from waveunet_tpu.config import Config
from waveunet_tpu.models.waveunet import apply_waveunet
from waveunet_tpu.ops import shapes
from waveunet_tpu.ops.shapes import pow2_ceil as _pow2_ceil




class StreamingSeparator:
    def __init__(self, cfg: Config, params, batch_windows: int = 1,
                 model_state=None):
        self.cfg = cfg
        frames = cfg.infer_num_frames or cfg.num_frames
        if frames == -1:
            # The offline engine's auto window (-1, the Config default) tunes
            # for throughput; streaming's contract is LATENCY, and the
            # algorithmic latency grows with in_len. Keep the training window
            # here — pass an explicit infer_num_frames int to trade latency
            # for throughput deliberately.
            frames = cfg.num_frames
        self.in_len, self.out_len = shapes.get_padding(cfg, frames)
        self.pad = (self.in_len - self.out_len) // 2
        self.batch = max(1, batch_windows)
        self.params = params
        self._wire16 = cfg.infer_wire_dtype == "int16"

        # Ring capacity: after a full drain valid < in_len; one appended
        # chunk bucket (<= 2 * max piece) plus flush-tail slack must fit.
        self._max_piece = self.batch * self.out_len
        self._cap = (self.in_len + 2 * _pow2_ceil(self._max_piece)
                     + 2 * self.out_len)

        n_ch = cfg.num_channels
        in_len = self.in_len
        out_len = self.out_len
        wire16 = self._wire16

        @jax.jit
        def append(buf, chunk, valid):
            return jax.lax.dynamic_update_slice(buf, chunk, (valid, 0))

        self._append = append

        # Forward for either family: the spectrogram net streams through the
        # same ring because its windows satisfy the identical (in_len,
        # out_len) stitching contract — get_padding validates the iSTFT
        # emits exactly out_len samples per window (engine.py:110-123), and
        # with context=False the windows tile with zero context pad.
        if cfg.network == "unet":
            def forward(p, wins):
                return apply_waveunet(p, cfg, wins, training=False)
        else:
            from waveunet_tpu.models.spectrogram_unet import (
                apply_spectrogram_unet)
            mstate = model_state or {}

            def forward(p, wins):
                out, _ = apply_spectrogram_unet(p, cfg, wins, training=False,
                                                state=mstate)
                got = out[cfg.source_names[0]].shape[1]
                if got != out_len:
                    raise ValueError(
                        f"spectrogram window/iSTFT length mismatch "
                        f"({out_len - got} samples of framing slack escaped "
                        f"get_padding validation)")
                return out

        @functools.partial(jax.jit, static_argnames=("k",))
        def drain(p, buf, *, k: int):
            wins = jnp.stack([
                jax.lax.dynamic_slice(buf, (i * out_len, 0), (in_len, n_ch))
                for i in range(k)])
            out = forward(p, wins)
            if wire16:
                # INT16_MIN = non-finite sentinel, same contract as the
                # offline engine's chunk_fwd (NaN must not be laundered
                # into finite garbage by the int16 cast)
                out = {s: jnp.where(
                    jnp.isfinite(v),
                    jnp.round(jnp.clip(v, -1.0, 1.0) * 32767.0),
                    jnp.float32(-32768)).astype(jnp.int16)
                       for s, v in out.items()}
            # advance the ring: the tail beyond `valid` is dead and will be
            # overwritten by future appends before it is ever framed.
            new_buf = jnp.roll(buf, -k * out_len, axis=0)
            return out, new_buf

        self._drain_k = drain
        self.reset()

    def reset(self):
        # leading context zeros, matching the offline engine's left pad
        self._buf = jnp.zeros((self._cap, self.cfg.num_channels), jnp.float32)
        self._valid = self.pad   # rows of self._buf that hold real signal
        self._emitted = 0        # output samples produced so far
        self._pushed = 0         # input samples received so far

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
        self._pushed += chunk.shape[0]
        outs = {s: [] for s in self.cfg.source_names}
        off = 0
        while off < chunk.shape[0]:
            piece = chunk[off:off + self._max_piece]
            off += piece.shape[0]
            n_real = piece.shape[0]
            bucket = _pow2_ceil(n_real)
            if n_real < bucket:
                piece = np.pad(piece, [(0, bucket - n_real), (0, 0)])
            if self._valid + bucket > self._cap:
                self._drain_into(outs, target=None)
            if self._valid + bucket > self._cap:  # pathological: force-drain
                raise RuntimeError("streaming ring overflow")
            self._buf = self._append(self._buf, jnp.asarray(piece),
                                     self._valid)
            self._valid += n_real
            self._drain_into(outs, target=None)
        return self._collect(outs)

    def flush(self) -> Dict[str, np.ndarray]:
        """Zero-pad the tail and emit everything up to the stream end."""
        remaining = self._pushed - self._emitted
        if remaining <= 0:
            return self._empty()
        n_win = -(-remaining // self.out_len)
        need = (n_win - 1) * self.out_len + self.in_len - self._valid
        outs = {s: [] for s in self.cfg.source_names}
        while need > 0:
            z = min(need, self._max_piece)
            bucket = _pow2_ceil(z)
            if self._valid + bucket > self._cap:
                self._drain_into(outs, target=self._pushed)
            self._buf = self._append(
                self._buf,
                jnp.zeros((bucket, self.cfg.num_channels), jnp.float32),
                self._valid)
            self._valid += z
            need -= z
        self._drain_into(outs, target=self._pushed)
        return self._collect(outs)

    def _drain_into(self, outs, target):
        # Two phases so device work and D2H overlap: every drain program is
        # DISPATCHED first (jax dispatch is async; each drain's new ring
        # buffer feeds the next dispatch device-side) with copy_to_host_async
        # started on its outputs, and only then are results materialised. The
        # former per-drain synchronous np.asarray serialised
        # dispatch -> transfer -> dispatch, leaving the device idle during
        # every D2H (round-3 review) — the offline engine already pipelines
        # this way (engine.py slab pipeline).
        planned = self._emitted  # output samples covered by dispatched drains
        pending = []
        while True:
            if target is not None and planned >= target:
                break
            avail = 0
            if self._valid >= self.in_len:
                avail = (self._valid - self.in_len) // self.out_len + 1
            if target is not None:
                need = -(-(target - planned) // self.out_len)
                avail = min(avail, need)
            if avail <= 0:
                break
            k = min(avail, self.batch)
            k = 1 << (k.bit_length() - 1)  # pow2 bucket <= k available
            res, self._buf = self._drain_k(self.params, self._buf, k=k)
            self._valid -= k * self.out_len
            planned += k * self.out_len
            for s in self.cfg.source_names:
                res[s].copy_to_host_async()
            pending.append((k, res))
        for k, res in pending:
            # one D2H per source for the whole drained batch
            host = {s: np.asarray(res[s]) for s in self.cfg.source_names}
            for i in range(k):
                take = self.out_len
                if target is not None:
                    take = min(take, target - self._emitted)
                if take <= 0:
                    break
                for s in self.cfg.source_names:
                    v = host[s][i, :take]
                    if self._wire16:
                        sentinel = v == -32768
                        v = v.astype(np.float32) / 32767.0
                        if sentinel.any():
                            v[sentinel] = np.nan
                    outs[s].append(v)
                self._emitted += take

    def _empty(self) -> Dict[str, np.ndarray]:
        return {s: np.zeros((0, self.cfg.num_channels), np.float32)
                for s in self.cfg.source_names}

    def _collect(self, outs) -> Dict[str, np.ndarray]:
        if not outs[self.cfg.source_names[0]]:
            return self._empty()
        return {s: np.concatenate(v) for s, v in outs.items()}
