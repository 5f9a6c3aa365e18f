"""Real-chip probe for the fp64 device BSS-Eval kernel (eval/bsseval_tpu64).

Measures compile + warm per-window time of the FFT-free f64 kernel at the
production shape (1 s stereo 2-source windows, L=512) and cross-checks the
scores against the host fp64 (exact-assembly) oracle on the same windows.

Usage:
    python tools/bss_f64_probe.py [n_windows] [window_batch] [out.jsonl]

Context: XLA:TPU emulates f64 in software (no f64 FFT at all — the reason
the kernel is FFT-free), and compiles of f64 programs through this
environment's remote compile helper are very slow; the persistent cache
makes reruns instant. Compare against the measured 20 ms/window fp32 kernel
and 460 ms/window host fp64 (eval/bsseval_tpu.py docstring).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_windows = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    wb = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/bss_f64_probe.jsonl"

    import jax
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from waveunet_tpu.eval.bsseval import bss_eval_framewise
    from waveunet_tpu.eval.bsseval_tpu64 import bss_eval_framewise_tpu64

    sr = 44100
    rng = np.random.default_rng(0)
    S, C = 2, 2
    n = sr * n_windows
    t = np.arange(n) / sr
    # music-shaped: correlated stereo (near-parallel channels -> the
    # ill-conditioned Gram class), harmonic + noise beds
    refs = np.zeros((S, n, C))
    for s in range(S):
        base = 0.2 * np.sin(2 * np.pi * (180 + 70 * s) * t)
        base += 0.1 * np.sin(2 * np.pi * (2.01 * (180 + 70 * s)) * t)
        base += 0.02 * rng.standard_normal(n)
        r = np.roll(base, 17)
        refs[s, :, 0] = base
        refs[s, :, 1] = 0.95 * r + 0.05 * base
    ests = refs + 0.05 * rng.standard_normal(refs.shape) \
        + 0.04 * refs[::-1]

    rec = {"mode": "bss_f64", "n_windows": n_windows, "window_batch": wb,
           "platform": jax.devices()[0].platform}

    t0 = time.perf_counter()
    dev = bss_eval_framewise_tpu64(refs, ests, sr, window_batch=wb)
    rec["first_call_s"] = round(time.perf_counter() - t0, 1)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        dev = bss_eval_framewise_tpu64(refs, ests, sr, window_batch=wb)
        times.append(time.perf_counter() - t0)
    rec["warm_ms_per_window"] = round(min(times) / n_windows * 1e3, 1)

    t0 = time.perf_counter()
    host = bss_eval_framewise(refs, ests, sr, assembly="exact")
    rec["host_exact_ms_per_window"] = round(
        (time.perf_counter() - t0) / n_windows * 1e3, 1)

    worst = 0.0
    for k in host:
        # matching NaNs are equal; a one-sided NaN is an inf disagreement
        # (nanmax would silently skip it)
        if not np.array_equal(np.isnan(host[k]), np.isnan(dev[k])):
            worst = float("inf")
            continue
        d = np.abs(host[k] - dev[k])
        d[np.isnan(host[k])] = 0.0
        worst = max(worst, float(np.max(d)))
    rec["max_abs_diff_db_vs_host_exact"] = round(worst, 6)

    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
