"""bench.py machinery smoke: the driver's benchmark artifact is produced by
a script no test previously imported or executed — a schema or code-path
break would only surface on the real TPU at round end. BENCH_SMOKE=1 runs
the IDENTICAL bench code (warmup, compute roof, resident sweeps for all
three families, serial baselines, interleaved e2e reps, FLOP accounting,
JSON emit) on the CPU backend with tiny models and a short song. The
numbers are meaningless; only the schema and the phases' survival are
asserted.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REQUIRED_KEYS = [
    "metric", "value", "unit", "vs_baseline",
    "serial_resident_audio_s_per_s", "compute_roof_audio_s_per_s",
    "flagship_tflops_per_s", "flagship_mfu_vs_bf16_peak",
    "flagship_flops_source", "m6_resident_audio_s_per_s",
    "u7_resident_audio_s_per_s", "n_devices", "song_seconds",
    "infer_num_frames", "e2e_rtf", "e2e_vs_baseline",
    "e2e_vs_baseline_paired_median", "e2e_serial_baseline_rtf",
    "e2e_elapsed_s", "e2e_elapsed_median_s", "e2e_elapsed_spread",
    "e2e_serial_median_s", "e2e_serial_spread", "e2e_reps",
]


def test_bench_smoke_schema():
    env = dict(os.environ, BENCH_SMOKE="1")
    proc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          capture_output=True, text=True, timeout=900,
                          env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    rec = json.loads(line)

    for k in REQUIRED_KEYS:
        assert k in rec, f"bench JSON lost key {k!r}"
    assert rec["metric"] == "engine_device_resident_audio_s_per_s"
    assert rec["smoke"] is True  # never confusable with a real artifact
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    for fam in ("m6_resident_audio_s_per_s", "u7_resident_audio_s_per_s"):
        assert rec[fam] > 0
    assert rec["flagship_flops_source"] in ("cost-analysis",
                                            "recorded-constant")
    # CPU exposes cost analysis, so the live-FLOP path itself is exercised
    assert rec["flagship_flops_source"] == "cost-analysis"
    assert rec["e2e_reps"] >= 2


def test_pick_k_contract():
    """pick_k: cover >=~0.3 s per timing batch, clamped to [4, 32]."""
    sys.path.insert(0, REPO)
    from tools.benchutil import pick_k

    assert pick_k(0.02) == 15
    assert pick_k(0.2) == 4      # long programs -> floor
    assert pick_k(1.0) == 4
    assert pick_k(0.0) == 32     # instant -> ceiling (est clamped)
    assert pick_k(1e-9) == 32


def test_best_pipelined_adaptive_sizing(monkeypatch):
    """best_pipelined(k=None) two-stage sizing, on a fake clock so the
    contract is deterministic under CI load: the synced single-call
    estimate (program + sync overhead) picks a provisional k, then the
    first batch's overhead-amortised per-call time re-sizes it — the fix
    for fixed k=4 reading dispatch-floor programs ~75% slow
    (tools/benchutil round 5)."""
    import time as time_mod

    sys.path.insert(0, REPO)
    from tools import benchutil

    clock = {"t": 0.0}
    monkeypatch.setattr(benchutil.time, "perf_counter",
                        lambda: clock["t"], raising=True)
    assert time_mod.perf_counter is benchutil.time.perf_counter  # same module

    def make_dispatch(prog_s, ovh_s):
        # Device programs serialise (each dispatch accrues prog_s of device
        # time); only the final value fetch pays the sync overhead.
        class Scalar:
            def __float__(self):
                clock["t"] += ovh_s
                return 0.0

        def dispatch():
            clock["t"] += prog_s
            return Scalar()
        return dispatch

    # Dispatch-floor program: single-call est 5+15=20 ms -> provisional
    # k=15; first batch per-call 5+1=6 ms -> refined k=32 (clamp).
    best, k = benchutil.best_pipelined(make_dispatch(0.005, 0.015))
    assert k == 32
    assert abs(best - (0.005 + 0.015 / 32)) < 1e-9

    # Long program lands on the k=4 floor both passes; the refining batch
    # is kept as a scored rep.
    best, k = benchutil.best_pipelined(make_dispatch(0.2, 0.015))
    assert k == 4
    assert abs(best - (0.2 + 0.015 / 4)) < 1e-9

    # Explicit k bypasses sizing entirely.
    best, k = benchutil.best_pipelined(make_dispatch(0.005, 0.015), k=8)
    assert k == 8
    assert abs(best - (0.005 + 0.015 / 8)) < 1e-9
