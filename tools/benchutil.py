"""Shared fixtures/timing discipline for bench.py and tools/perf_probe.py.

bench.py's headline numbers and perf_probe's sweeps must stay measurements of
the SAME workload under the SAME sync discipline — the probe exists to
cross-check the bench. Keeping the song synthesis and the pipelined
value-fetch timing loop in one place prevents the copies from silently
desynchronising (a seed/length/sync change applied to one file only).
"""

from __future__ import annotations

import time

import numpy as np

# v5e bf16 MXU peak, the MFU denominator shared by bench.py and
# tools/precision_probe.py (the HBM roof those files also quote is 819 GB/s).
PEAK_BF16_TFLOPS = 197.0


def cost_analysis_of(lowerable, *args) -> dict:
    """XLA cost analysis of one call of a jitted fn ({'flops', 'bytes
    accessed', ...}).

    Lowers with ShapeDtypeStructs (live buffers may have been donated by
    timed dispatches — CLAUDE.md aliasing hazard; abstract args also skip
    re-staging them) and tolerates the list-wrapped cost_analysis some
    backends return. Raises if the backend exposes no cost analysis;
    callers fall back to a recorded constant / CPU-subprocess measurement.
    """
    import jax
    abs_args = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), args)
    ca = lowerable.lower(*abs_args).compile().cost_analysis()
    return ca[0] if isinstance(ca, (list, tuple)) else ca


def flops_of(lowerable, *args) -> float:
    """Logical FLOPs of one call of a jitted fn via XLA cost analysis."""
    return float(cost_analysis_of(lowerable, *args)["flops"])


def make_bench_song(sr: int, seconds: float = 60.0) -> np.ndarray:
    """The canonical bench song: 440 Hz sine + noise, stereo, float32.

    Deterministic (seed 0) so every probe and bench rep separates identical
    bytes; shape [seconds*sr, 2].
    """
    n = int(seconds * sr)
    rng = np.random.default_rng(0)
    t = np.arange(n) / sr
    mono = (0.3 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * rng.standard_normal(n)).astype(np.float32)
    return np.stack([mono, mono], axis=1)


def stage_resident_song(sep, song_np: np.ndarray):
    """Context-pad + wire-quantise + device_put a song for a resident sweep,
    exactly as the engine's host path would stage it."""
    import jax
    import jax.numpy as jnp
    padded = np.pad(song_np, [(sep.pad, sep.pad), (0, 0)])
    if sep.cfg.infer_wire_dtype == "int16":
        from waveunet_tpu.runtime import native
        padded = native.quantize_int16(padded)
    return jax.device_put(jnp.asarray(padded))


def resident_rtf(res_fn, params, song_dev, seconds: float, k: int | None = None
                 ) -> float:
    """Warm (compile) then time a ``resident_sweep`` program under the
    standard pipelined value-fetch discipline; returns audio-s/s. One copy
    of this harness (flagship + family rows in bench.py) — hand-rolled
    duplicates desynchronise, see module docstring.

    ``k=None`` (default) sizes the pipelined batch adaptively — see
    ``best_pipelined``.
    """
    float(res_fn(params, song_dev)[1])  # compile + warm
    best = best_pipelined_s(lambda: res_fn(params, song_dev)[1], k=k)
    return seconds / best


def pick_k(est_s: float, target_s: float = 0.3) -> int:
    """Pipelined batch size for an estimated `est_s` per-call cost: cover
    >=~`target_s` per timing batch, clamped to [4, 32]."""
    return max(4, min(32, round(target_s / max(est_s, 1e-4))))


def best_pipelined(dispatch, k: int | None = None, reps: int = 3
                   ) -> tuple:
    """Best-of-`reps` per-call seconds for `k` pipelined dispatches;
    returns ``(best_per_call_s, k)``.

    `dispatch()` must enqueue ONE warmed device program and return a jax
    scalar. Only the LAST call's value is fetched: device execution is
    in-order, so that scalar's arrival bounds all k programs, while the
    k-1 unfetched calls pipeline behind it — amortising the per-dispatch
    tunnel latency. The fetch is a VALUE fetch (float()), not
    block_until_ready: the axon client's block_until_ready has been
    observed returning without syncing (CLAUDE.md hazard); a scalar D2H
    cannot lie.

    ``k=None`` sizes the batch adaptively (``pick_k``: cover >=~0.3 s per
    batch, clamp [4, 32]). A fixed k=4 left the per-batch sync overhead
    (final value-fetch round trip + timer jitter, ~4-15 ms here) at
    ~3.7 ms/call — noise for the 54 ms flagship program, but a ~75%
    inflation on the ~5 ms U7 resident program (read 8.8 ms; adaptive k
    reads 5.05, engine_probe round 5). Two-stage sizing: a synced single
    call bounds per-call cost from ABOVE (it includes the very sync
    overhead this loop amortises, so it undersizes k for dispatch-floor
    programs, and one tunnel-noise spike would skew it); the first timed
    batch at that provisional k then yields an overhead-amortised
    estimate from which k is re-sized before the scored reps. The 54 ms
    flagship program lands on the k=4 floor either way, so its rows stay
    comparable with rounds 1-4; M6 (~37 ms) sizes to k~6-8 and its row
    read +3% higher on the switch (CLAUDE.md round-5 notes).
    """
    def one_batch(kk):
        t0 = time.perf_counter()
        for _ in range(kk):
            cs = dispatch()
        float(cs)
        return (time.perf_counter() - t0) / kk

    best = None
    if k is None:
        t0 = time.perf_counter()
        float(dispatch())
        k = pick_k(time.perf_counter() - t0)
        first = one_batch(k)
        refined = pick_k(first)
        if refined == k:  # the refining batch already ran at the final k
            best = first
            reps -= 1
        k = refined
    for _ in range(max(reps, 1)):
        dt = one_batch(k)
        best = dt if best is None else min(best, dt)
    return best, k


def best_pipelined_s(dispatch, k: int | None = None, reps: int = 3) -> float:
    """``best_pipelined`` without the chosen-k return (most callers)."""
    return best_pipelined(dispatch, k=k, reps=reps)[0]
