"""Batched sliding-window separation engine.

The reference separates full songs with a *serial* loop — one batch-1 ``sess.run``
per window, hop = output length (`/root/reference/Evaluate.py:82-145`). That is the
reference's biggest inefficiency and our north-star redesign target (SURVEY.md §3.2):

  * the (optionally int16-quantised) song crosses the host->device wire ONCE;
    windows are framed on device by vmapped dynamic_slice,
  * every chunk is swept through one **jitted, fixed-shape, batched** forward
    (length-bucketed: no per-song recompiles), dispatched asynchronously,
    optionally **sharded across a device mesh** so windows ride the data axis
    (window parallelism = data parallelism over time),
  * outputs return per-chunk with async host copies and are stitched on host
    with the reference's exact overlap semantics (last window right-aligned,
    later writes win — `Evaluate.py:125-139`).

Semantics match `predict_track` step by step: mono downmix / channel duplication
(`:98-102`), resample to model rate (`:104`), zero-pad short songs (`:107-111`),
context padding (`:121-122`), and end-trim (`:142-143`).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

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


class Separator:
    """Reusable jitted separation engine for one (config, params) pair.

    ``forward_fn(params, mix_batch) -> {source: batch}`` defaults to the
    Wave-U-Net forward in inference mode; the spectrogram model plugs in its own.
    """

    def __init__(self, cfg: Config, params, model_state=None,
                 forward_fn: Optional[Callable] = None,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 h2d_mode: Optional[str] = None):
        self.cfg = cfg
        self.params = params
        frames = cfg.infer_num_frames or cfg.num_frames
        if frames == -1:  # auto (Config default): tuned window, overlap <= 3x
            frames = shapes.auto_infer_frames(cfg)
        self.in_len, self.out_len = shapes.get_padding(cfg, frames)
        self.pad = (self.in_len - self.out_len) // 2
        self.mesh = mesh
        n_dev = 1 if mesh is None else mesh.size
        # Per-sweep device batch: windows per step across the whole mesh.
        self.batch = max(1, cfg.infer_batch) * n_dev
        # Host->device strategy: "song" ships the padded song once and frames
        # every window from it (minimum wire bytes); "slabs" ships each
        # chunk's span separately so the transfer of chunk i+1 overlaps chunk
        # i's compute, at (in_len-out_len)/(batch*out_len) extra wire from the
        # inter-slab context overlap. None = auto: slabs when that overhead is
        # <=1/3 (true for the tuned large inference windows, false at the
        # 9x-context training window) on a single device.
        assert h2d_mode in (None, "song", "slabs")
        self._h2d_mode = h2d_mode

        # Host-side reconstruction of the difference source (skips its device
        # compute + D2H transfer); only for the default unet forward.
        self._host_reconstruct_last = (
            forward_fn is None and cfg.network == "unet"
            and cfg.output_type == "difference")

        if forward_fn is None:
            if cfg.network == "unet":
                drop_last = self._host_reconstruct_last
                last_name = cfg.source_names[-1]

                def forward_fn(p, x):
                    out = apply_waveunet(p, cfg, x, training=False)
                    if drop_last:
                        out = {k: v for k, v in out.items() if k != last_name}
                    return out
            else:
                from waveunet_tpu.models.spectrogram_unet import (
                    apply_spectrogram_unet)
                mstate = model_state or {}

                def forward_fn(p, x):
                    out, _ = apply_spectrogram_unet(p, cfg, x, training=False,
                                                    state=mstate)
                    # iSTFT output is hop*(F-1)+frame_len samples; get_padding
                    # validates the window carries no framing slack, so this
                    # must equal the stitch hop exactly — padding zeros here
                    # would silently stitch gaps of silence into the song.
                    short = self.out_len - out[cfg.source_names[0]].shape[1]
                    if short != 0:
                        raise ValueError(
                            f"spectrogram window/iSTFT length mismatch "
                            f"({short} samples of framing slack escaped "
                            f"get_padding validation)")
                    return out

        self._forward_fn = forward_fn

        # Windows are framed on-device via vmapped dynamic_slice from either
        # the whole padded song or a per-chunk slab (see h2d_mode above) —
        # measured free vs the forward pass; an index-matrix gather costs
        # ~2x, and per-WINDOW host framing would send ~in_len/out_len (up to
        # 9x) redundant H2D traffic.
        in_len = self.in_len
        n_ch = cfg.num_channels
        wire = cfg.infer_wire_dtype

        def chunk_fwd(params, song, pos):
            # song: [T, C] padded mixture (possibly int16-quantised for the
            # host->device wire); pos: [batch] window starts.
            if song.dtype == jnp.int16:
                song = song.astype(jnp.float32) / 32767.0
            wins = jax.vmap(
                lambda s: jax.lax.dynamic_slice(song, (s, 0), (in_len, n_ch))
            )(pos)
            out = forward_fn(params, wins)
            if wire == "int16":
                # quantise on device: halves the D2H wire (lossless vs the
                # PCM16 output WAVs). NaN/Inf must NOT be laundered into
                # finite garbage by the int16 cast (the float wire carries
                # them to write_wav's non-finite guard; this wire must fail
                # the same way): clip() keeps the range in [-32767, 32767],
                # so INT16_MIN is free as a non-finite sentinel that the
                # host dequant turns back into NaN.
                out = {k: jnp.where(
                    jnp.isfinite(v),
                    jnp.round(jnp.clip(v, -1.0, 1.0) * 32767.0),
                    jnp.float32(-32768)).astype(jnp.int16)
                       for k, v in out.items()}
            return out

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(mesh, P())
            pos_shard = NamedSharding(mesh, P(mesh.axis_names))
            out_shard = NamedSharding(mesh, P(mesh.axis_names, None, None))
            self._fwd = jax.jit(chunk_fwd,
                                in_shardings=(rep, rep, pos_shard),
                                out_shardings=out_shard)
            self.params = jax.device_put(params, rep)
            self._song_sharding = rep
        else:
            self._fwd = jax.jit(chunk_fwd)
            self._song_sharding = None

    def precompile(self, max_song_s: float = 6 * 60.0,
                   progress: Optional[Callable[[str], None]] = None) -> int:
        """Compile EVERY program a real song can hit — all pow2 chunk sizes
        (split-tail batching) x both H2D modes x every song-length bucket up
        to ``max_song_s`` — into the persistent XLA cache. Serving/eval then
        never stalls on the remote compiler (minutes per shape here).
        Returns the number of programs exercised.

        ``progress`` (e.g. ``print``) receives one "i/N ... ETA" line per
        program: a cold warmup walks ~80 programs through a remote compiler
        that takes minutes per shape, and without output it looks hung.
        Remaining-time estimates use the mean of COLD programs only (cache
        hits come back in milliseconds and would wreck the ETA).
        """
        import time as _time

        wire16 = self.cfg.infer_wire_dtype == "int16"
        dt = jnp.int16 if wire16 else jnp.float32
        n_ch = self.cfg.num_channels
        ks = []
        k = 1
        while k < self.batch:
            ks.append(k)
            k *= 2
        ks.append(self.batch)
        if self.mesh is not None:
            ks = [self.batch]  # mesh tails stay full-batch (shard-divisible)
        # song-mode programs: one per length bucket; chunk programs retrace
        # per positions length only, so any bucketed song length serves
        n_buckets = -(-int(max_song_s * self.cfg.expected_sr
                           + 2 * self.pad) // self._LEN_BUCKET)
        total = n_buckets * len(ks) + (len(ks) if self.mesh is None else 0)
        count = 0
        cold_times: list = []

        def _run_one(song, k, label):
            nonlocal count
            t0 = _time.perf_counter()
            res = self._fwd(self.params, song, jnp.zeros((k,), jnp.int32))
            # scalar value fetch (not block_until_ready, which the tunnel
            # client has been seen no-op'ing): the warmup CLI exits right
            # after, and compiles must have persisted to the cache by
            # then. One element — not the whole [K, out_len, ch] source,
            # which is several MB over the ~0.03 GB/s link per program.
            np.asarray(next(iter(res.values()))[0, 0, 0])
            dt_s = _time.perf_counter() - t0
            count += 1
            if dt_s > 2.0:  # a cache hit over this tunnel is well under 2 s
                cold_times.append(dt_s)
            if progress is not None:
                remaining = total - count
                eta = (f", ~{remaining * np.mean(cold_times) / 60:.0f} min "
                       f"left if all cold"
                       if cold_times and remaining else "")
                progress(f"  [{count}/{total}] {label} k={k}: "
                         f"{dt_s:.1f}s{' (cached)' if dt_s <= 2.0 else ''}"
                         f"{eta}")

        for b in range(1, n_buckets + 1):
            song = jnp.zeros((b * self._LEN_BUCKET, n_ch), dt)
            if self._song_sharding is not None:
                song = jax.device_put(song, self._song_sharding)
            for k in ks:
                _run_one(song, k, f"song-bucket {b}/{n_buckets}")
        # slab-mode programs (single-device auto/explicit path)
        if self.mesh is None:
            for k in ks:
                slab = jnp.zeros(((k - 1) * self.out_len + self.in_len, n_ch),
                                 dt)
                _run_one(slab, k, "slab")
        return count

    def resident_chunk_sizes(self, n_win: int):
        """The chunk schedule `resident_sweep` runs for an ``n_win``-window
        song: one exact chunk for a single-device sub-batch song (the
        latency-floor regime — see `resident_sweep`'s docstring), the pow2
        split tail otherwise. The ONE place the rule lives; tools/
        engine_probe.py records and A/Bs against it."""
        if self.mesh is None and n_win < self.batch:
            return [n_win]
        return self._chunk_sizes(n_win)

    def resident_sweep(self, n_total: int, chunk_sizes=None):
        """ONE jitted program sweeping a whole DEVICE-RESIDENT padded song:
        on-device framing, every window through the batched forward (equal-
        size chunk groups under ``lax.map``), the wire-dtype quantise/
        dequantise round trip, a device-side stitch with the reference
        overlap semantics (`Evaluate.py:125-139`), and difference-source
        reconstruction.

        Chunk schedule: `_run_batched`'s pow2-bucketed split tail, EXCEPT
        that a song smaller than one device batch runs as a single
        exact-size chunk. Inside one program the sub-forwards of a split
        tail SERIALISE, so when per-chunk latency dominates the split is
        pure loss (v5e: the 60 s U7 bench song is 5 windows at ~8 ms/
        dispatch-floor forwards; the [4, 1] schedule ran 10.5 ms where the
        exact [5] runs 8.8 ms, +20% — tools/engine_probe.py). When
        per-chunk COMPUTE dominates the pow2 split keeps winning instead —
        a non-pow2 chunk detiles the conv batch dim (flagship @ B16,
        measured: 41 windows [16,16,8,1] = 1072 audio-s/s vs exact
        [16,16,9] = 968; sub-batch 11 windows [8,4] = 822 vs exact [11] =
        789). The sub-batch rule optimises the regime short songs actually
        hit (cheap windows, latency floor); the flagship's sub-batch −4%
        is inside this link's noise and short flagship songs (<24 s) are
        the rare case.

        Returns ``(fn, positions)`` where ``fn(params, song_dev) ->
        (sources, checksum)``: ``sources`` are stitched [n_total, C] float32
        arrays still in HBM; ``checksum`` is a scalar whose VALUE fetch syncs
        the sweep with a single scalar D2H. This is bench.py's
        tunnel-independent engine headline path — identical compute graph to
        the production sweep but one dispatch and zero bulk host traffic, so
        the number moves when the engine moves, not when the host link does.
        Compiles per song length (fine for a fixed bench song; dataset evals
        keep `_run_batched`'s host stitch for exactly that reason).
        """
        if n_total < self.out_len:
            raise ValueError(f"song shorter than one output window "
                             f"({n_total} < {self.out_len}); pad first")
        positions = window_positions(n_total, self.out_len).astype(np.int32)
        n_win = int(positions.shape[0])
        if chunk_sizes is not None:  # probe override (tools/engine_probe)
            sizes = list(chunk_sizes)
            if sum(sizes) < n_win:
                raise ValueError(f"chunk_sizes {sizes} cover {sum(sizes)} "
                                 f"< {n_win} windows")
        else:
            sizes = self.resident_chunk_sizes(n_win)
        pos_pad = np.full((sum(sizes),), positions[-1], np.int32)
        pos_pad[:n_win] = positions
        groups = []  # equal-size runs of the chunk schedule: (k, count)
        for k in sizes:
            if groups and groups[-1][0] == k:
                groups[-1][1] += 1
            else:
                groups.append([k, 1])
        out_len, pad = self.out_len, self.pad
        names = list(self.cfg.source_names)
        reconstruct_last = self._host_reconstruct_last

        def fn(params, song):
            off = 0
            parts = []
            for k, cnt in groups:
                pmat = jnp.asarray(
                    pos_pad[off:off + cnt * k].reshape(cnt, k))
                outs = jax.lax.map(
                    lambda p: self._fwd(params, song, p), pmat)
                parts.append({n: v.reshape(cnt * k, out_len, v.shape[-1])
                              for n, v in outs.items()})
                off += cnt * k
            wins = {n: jnp.concatenate([c[n] for c in parts], 0)[:n_win]
                    for n in parts[0]}
            pos_arr = jnp.asarray(positions)

            def stitch(w):
                if w.dtype == jnp.int16:  # dequant-then-stitch == the host
                    # INT16_MIN = chunk_fwd's non-finite sentinel -> NaN,
                    # matching the host dequant (a diverged model poisons
                    # the checksum instead of reading as finite audio)
                    w = jnp.where(w == -32768, jnp.nan,
                                  w.astype(jnp.float32) / 32767.0)
                buf = jnp.zeros((n_total, w.shape[2]), jnp.float32)

                def body(i, b):  # writes in window order: later writes win
                    return jax.lax.dynamic_update_slice(
                        b, w[i], (pos_arr[i], 0))
                return jax.lax.fori_loop(0, n_win, body, buf)

            out = {n: stitch(w) for n, w in wins.items()}
            if reconstruct_last:
                mix = jax.lax.dynamic_slice_in_dim(song, pad, n_total, 0)
                if mix.dtype == jnp.int16:
                    mix = mix.astype(jnp.float32) / 32767.0
                out[names[-1]] = jnp.clip(
                    mix - sum(out[s] for s in names[:-1]), -1.0, 1.0)
            checksum = sum(jnp.sum(v) for v in out.values())
            return out, checksum

        return jax.jit(fn), positions

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
        preds = self._run_batched(padded, positions, n_total)
        if extra_pad > 0:
            preds = {k: v[:-extra_pad] for k, v in preds.items()}

        # Difference output: the device only computes/ships the K-1 conv
        # sources; the last is clip(mix - sum(others)) (`OutputLayer.py:20-21`),
        # reconstructed here. fp32 wire: bit-exact (every stitched sample
        # originates from one window and mix_window[t] == mix[t]). int16
        # wire: the conv sources quantise individually before the subtraction
        # here, while a device-side difference would quantise once after it —
        # the results can differ by ~1 LSB per conv source (inside the PCM16
        # output's quantisation floor either way).
        if self._host_reconstruct_last:
            last = self.cfg.source_names[-1]
            mix_trim = (mix_audio[:-extra_pad] if extra_pad > 0 else mix_audio)
            acc = sum(preds[s] for s in self.cfg.source_names[:-1])
            preds[last] = np.clip(mix_trim - acc, -1.0, 1.0).astype(np.float32)
        return preds

    # Songs are length-bucketed so the jitted program recompiles at most
    # log-many times instead of once per song length.
    _LEN_BUCKET = 1 << 20  # ~23.8 s at 44.1 kHz

    def _chunk_sizes(self, n_win: int):
        """Per-dispatch window counts: full device batches, then a
        pow2-bucketed tail chunk (single-device only — a sharded batch must
        stay mesh-divisible). Padding the tail to the FULL batch instead
        wastes up to ~2x compute and D2H on short songs (measured: a 30 s
        22 kHz song at the 65536 window is 11 windows — 16-slot padding
        burned 45% of the sweep)."""
        bs = self.batch
        sizes = [bs] * (n_win // bs)
        rem = n_win % bs
        if rem:
            if self.mesh is None:
                from waveunet_tpu.ops.shapes import pow2_ceil as pow2ceil
                single = min(pow2ceil(rem), bs)
                lo = 1 << (rem.bit_length() - 1)  # largest pow2 <= rem
                if rem > lo and lo + pow2ceil(rem - lo) < single:
                    # two pow2 chunks waste fewer padded slots than one
                    # (e.g. 11 -> 8+4=12 slots, not 16); each padded slot
                    # costs real compute AND D2H wire.
                    sizes += [lo, pow2ceil(rem - lo)]
                else:
                    sizes.append(single)
            else:
                sizes.append(bs)
        return sizes

    def _run_batched(self, padded: np.ndarray, positions: np.ndarray,
                     n_total: int) -> Dict[str, np.ndarray]:
        """Sweep every window through the jitted on-device-framed forward;
        per-chunk results copy back asynchronously and are stitched on HOST.

        Chunks are dispatched asynchronously, overlapping H2D, compute, and the
        per-chunk D2H copies. The host stitch (see the inline comment below —
        no song-length-dependent device program, so dataset evals never hit
        the remote compiler per song) reproduces the reference's serial
        overlap semantics (`Evaluate.py:125-139`): windows are contiguous at
        hop = out_len except the right-aligned final window, whose tail slice
        supplies the last ``n_total - (n_win-1)*out_len`` samples. A fully
        device-side stitch DOES exist — ``resident_sweep`` — and is the bench
        headline path; it compiles per song length, which is fine for one
        fixed bench song and wrong for an eval over many lengths.
        """
        n_win = positions.shape[0]
        bs = self.batch
        sizes = self._chunk_sizes(n_win)
        # Pad positions (repeat last) to the chunk-size sum, and the song to a
        # length bucket (extra zeros are never gathered: positions are bounded
        # by n_total - out_len).
        pos_pad = np.full((sum(sizes),), positions[-1], np.int32)
        pos_pad[:n_win] = positions
        t = padded.shape[0]
        t_bucket = -(-t // self._LEN_BUCKET) * self._LEN_BUCKET
        if t_bucket > t:
            padded = np.pad(padded, [(0, t_bucket - t), (0, 0)])

        wire16 = self.cfg.infer_wire_dtype == "int16"
        if wire16:
            # Halve the wire traffic both ways; exact for PCM16-derived
            # sources, -96 dB quantisation floor otherwise (the output WAVs
            # are PCM16 regardless). Native C++ kernel when built.
            from waveunet_tpu.runtime import native
            padded = native.quantize_int16(padded)
        # Slabs are a single-device strategy (slab arrays are not
        # mesh-placed); with a mesh the song ships once, replicated.
        use_slabs = self.mesh is None and (
            self._h2d_mode == "slabs" or (
                self._h2d_mode is None and len(sizes) >= 2
                and 3 * (self.in_len - self.out_len) <= bs * self.out_len))

        futures = []
        offsets = np.concatenate([[0], np.cumsum(sizes)])
        if use_slabs:
            # Pipelined H2D: each chunk's span ships separately, so chunk
            # i+1's transfer rides the wire while chunk i computes (the
            # song-mode transfer is one blob every chunk depends on).
            for ci, k in enumerate(sizes):
                cpos = pos_pad[offsets[ci]:offsets[ci + 1]]
                slab_len = (k - 1) * self.out_len + self.in_len
                start = int(cpos[0])
                slab = padded[start:start + slab_len]
                if slab.shape[0] < slab_len:
                    slab = np.pad(slab,
                                  [(0, slab_len - slab.shape[0]), (0, 0)])
                rel = jnp.asarray((cpos - start).astype(np.int32))
                res = self._fwd(self.params, jnp.asarray(slab), rel)
                for v in res.values():
                    try:
                        v.copy_to_host_async()
                    except Exception:
                        pass
                futures.append(res)
        else:
            song = jnp.asarray(padded)
            if self._song_sharding is not None:
                song = jax.device_put(song, self._song_sharding)

            dpos = jnp.asarray(pos_pad)  # one tiny H2D; chunks slice on device
            for ci, k in enumerate(sizes):
                res = self._fwd(
                    self.params, song,
                    jax.lax.slice(dpos, (int(offsets[ci]),),
                                  (int(offsets[ci + 1]),)))
                for v in res.values():  # start D2H as each chunk finishes
                    try:
                        v.copy_to_host_async()
                    except Exception:
                        pass
                futures.append(res)

        # Host-side stitch: no song-length-dependent device program (a device
        # stitch would recompile per song — fatal for dataset evals on this
        # remote compiler), and the per-chunk async copies overlap D2H with
        # later chunks' compute. Reference overlap semantics preserved: writes
        # in window order, the right-aligned final window overwrites its span.
        names = list(futures[0].keys())
        out = {}
        for name in names:
            buf = np.empty((n_total, self.cfg.num_channels),
                           np.int16 if wire16 else np.float32)
            wi = 0
            for res in futures:
                host = np.asarray(res[name])  # [bs, out_len, C]
                for b in range(host.shape[0]):
                    if wi >= n_win:
                        break
                    p = int(positions[wi])
                    buf[p:p + self.out_len] = host[b]
                    wi += 1
            if wire16:
                # INT16_MIN is the device quantiser's non-finite sentinel
                # (chunk_fwd): turn it back into NaN so a diverged model
                # fails at write_wav's guard exactly like the float wire,
                # instead of shipping laundered garbage PCM.
                f = buf.astype(np.float32) / 32767.0
                f[buf == -32768] = np.nan
                out[name] = f
            else:
                out[name] = buf
        return out


def separate_file(cfg: Config, params, input_path: str,
                  output_path: Optional[str] = None,
                  mesh: Optional[jax.sharding.Mesh] = None,
                  model_state=None) -> Dict[str, str]:
    """Separate an audio file into per-source WAVs next to the input
    (mirrors `Evaluate.produce_source_estimates`, `/root/reference/Evaluate.py:161-193`).
    ``model_state`` carries the spectrogram model's BN statistics.
    Returns {source_name: written_path}."""
    import os

    from waveunet_tpu.data.audio_io import load, write_wav

    audio, sr = load(input_path, sr=None, mono=False)
    sep = Separator(cfg, params, model_state=model_state, mesh=mesh)
    preds = sep.separate(audio, sr)

    folder, fname = os.path.split(input_path)
    out_dir = output_path or folder or "."
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
