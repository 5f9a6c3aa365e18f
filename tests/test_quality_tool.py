"""Smoke test for the trained-quality harness (`make quality`).

tools/quality.py produces the docs/quality_synth*.json artifacts BASELINE.md
quotes (synthesize dataset -> REAL `cli train` to early stop ->
`cli evaluate checkpoint=best` -> mixture-as-estimate baseline -> SDR table).
The recorded artifacts were measured at production scale on the attached
TPU; this test drives the same harness end to end at toy scale on the host
CPU so the runbook cannot rot: every stage runs, the artifact has the
documented schema, and the delta column is computed against the mixture
baseline.
"""

import json
import os
import subprocess
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_quality_harness_smoke(tmp_path):
    out = tmp_path / "quality.json"
    cmd = [sys.executable, os.path.join(_REPO, "tools", "quality.py"),
           "--root", str(tmp_path / ".q"),
           "--train-songs", "2", "--test-songs", "1", "--num-val-songs", "1",
           "--seconds", "6", "--epoch-it", "3", "--worse-epochs", "1",
           "--max-epochs", "1",
           "--preset", "full_44KHz", "--out", str(out),
           # toy scale on the host CPU; fragments reach BOTH train and
           # evaluate (the scoring config must match the trained arch)
           "platform=cpu", "num_layers=3", "num_frames=2048",
           "num_initial_filters=4", "batch_size=4",
           "num_snippets_per_track=4", "cache_size=8",
           "infer_num_frames=16384", "infer_batch=4"]
    res = subprocess.run(cmd, cwd=_REPO, capture_output=True, text=True,
                         timeout=1200)
    assert res.returncode == 0, res.stdout[-3000:] + "\n" + res.stderr[-3000:]
    assert "Quality table" in res.stdout

    with open(out) as f:
        table = json.load(f)
    assert table["preset"] == "full_44KHz"
    assert table["task"] == "voice"
    assert set(table["model"]) == {"vocals", "accompaniment"}
    for src in ("vocals", "accompaniment"):
        for side in ("model", "mixture_baseline"):
            sdr = table[side][src]["SDR"]
            assert np.isfinite(sdr["median"]), table
        # delta column = model - mixture baseline, the number BASELINE.md
        # headlines (1 toy epoch makes no quality promise; the arithmetic
        # and schema must hold)
        want = round(table["model"][src]["SDR"]["median"]
                     - table["mixture_baseline"][src]["SDR"]["median"], 2)
        assert abs(table["delta_sdr_median"][src] - want) < 1e-9
    assert table["regime"]["train_wall_s"] is not None
