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


def best_pipelined_s(dispatch, k: int, reps: int = 3) -> float:
    """Best-of-`reps` per-call seconds for `k` pipelined dispatches.

    `dispatch()` must enqueue ONE device program and return a jax scalar.
    Only the LAST call's value is fetched: device execution is in-order, so
    that scalar's arrival bounds all k programs, while the k-1 unfetched
    calls pipeline behind it — amortising the per-dispatch tunnel latency.
    The fetch is a VALUE fetch (float()), not block_until_ready: the axon
    client's block_until_ready has been observed returning without syncing
    (CLAUDE.md hazard); a scalar D2H cannot lie.
    """
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            cs = dispatch()
        float(cs)
        dt = (time.perf_counter() - t0) / k
        best = dt if best is None else min(best, dt)
    return best
