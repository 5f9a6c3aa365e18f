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
    """pick_k sizes the pipelined timing batch from one synced call: cover
    >=~0.3 s per batch, clamped to [4, 32] (tools/benchutil.pick_k — the
    fix for fixed k=4 reading dispatch-floor programs ~75% slow)."""
    import time

    sys.path.insert(0, REPO)
    from tools.benchutil import pick_k

    calls = []
    k = pick_k(lambda: (calls.append(1), time.sleep(0.02))[-1])
    assert calls == [1]          # exactly one estimating call
    assert 10 <= k <= 32         # ~0.3 s / ~0.02-0.03 s per call

    assert pick_k(lambda: time.sleep(0.2)) == 4    # long programs -> floor
    assert pick_k(lambda: None) == 32              # instant -> ceiling
