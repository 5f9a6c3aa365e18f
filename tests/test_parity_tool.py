"""Smoke test for the one-command zoo-parity pipeline (`make parity`).

tools/parity.py is the runbook for the headline SDR comparison the offline
environment cannot execute for real (no MUSDB18 download, no pretrained-zoo
download — BASELINE.md "environment-bound gaps"). This test pins the whole
pipeline end to end against stand-ins that exercise every stage it will run
on the real artifacts:

  * a zoo laid out exactly as the reference ships it
    (`<zoo>/<preset>/<preset>-<step>.index|.data*`,
    `/root/reference/Predict.py:10`) — populated with the checked-in
    PRODUCTION-SCALE TF checkpoint fixture (12-layer M5-HighSR, the same one
    test_compat.py pins forward parity on),
  * a MUSDB18 test-subset directory in the decoded-WAV layout
    (`Datasets.py:252-267` output shape),
  * the real `cli evaluate` subprocess with inline TF->pytree conversion,
    the batched inference engine, in-repo BSS-Eval v4, and the aggregate
    table + docs/parity.json artifact.

So when MUSDB18 + the zoo appear, `make parity MUSDB=... ZOO=...` is known
to run — the only untested inputs are the artifacts themselves.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PROD_CKPT = os.path.join(_REPO, "tests", "golden", "waveunet_tf",
                          "full_44khz_production")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(_PROD_CKPT, "model.ckpt.index")),
    reason="production golden checkpoint missing; run "
           "tests/golden/gen_waveunet_tf.py")
def test_parity_pipeline_smoke(tmp_path):
    from waveunet_tpu.data.audio_io import write_wav

    # MUSDB test subset, decoded-WAV layout, one short stereo song.
    sr = 44100
    n = int(sr * 2.0)
    t = np.arange(n) / sr
    rng = np.random.default_rng(7)
    voc = (0.3 * np.sin(2 * np.pi * 440 * t)
           * (1 + 0.3 * np.sin(2 * np.pi * 3 * t)))
    acc = 0.2 * np.sin(2 * np.pi * 110 * t) + 0.02 * rng.standard_normal(n)
    voc = np.stack([voc, 0.8 * voc], 1).astype(np.float32)
    acc = np.stack([acc, acc], 1).astype(np.float32)
    song = tmp_path / "db" / "test" / "song_parity"
    song.mkdir(parents=True)
    write_wav(str(song / "vocals.wav"), voc, sr)
    write_wav(str(song / "accompaniment.wav"), acc, sr)
    write_wav(str(song / "mixture.wav"), np.clip(voc + acc, -1, 1), sr)

    # Zoo in the reference's checkpoints/ layout, via symlinks to the
    # checked-in production fixture. A second preset with NO checkpoint
    # pins the skip-and-continue path.
    zoo = tmp_path / "zoo" / "full_44KHz"
    zoo.mkdir(parents=True)
    for suffix in (".index", ".data-00000-of-00001"):
        os.symlink(os.path.join(_PROD_CKPT, "model.ckpt" + suffix),
                   str(zoo / ("full_44KHz-236118" + suffix)))

    out = tmp_path / "parity.json"
    cmd = [sys.executable, os.path.join(_REPO, "tools", "parity.py"),
           "--musdb", str(tmp_path / "db"),
           "--zoo", str(tmp_path / "zoo"),
           "--presets", "full_44KHz,baseline_stereo",
           "--max-tracks", "1",
           "--out", str(out),
           "--estimates", str(tmp_path / "est"),
           # host-CPU run: small window/batch, no process pool for scoring
           "--extra", "platform=cpu",
           "--extra", "infer_num_frames=16384",
           "--extra", "infer_batch=2"]
    res = subprocess.run(cmd, cwd=_REPO, capture_output=True, text=True,
                         timeout=900)
    assert res.returncode == 0, res.stdout + "\n" + res.stderr
    assert "skip baseline_stereo" in res.stdout
    assert "published +4.95 / +1.01" in res.stdout  # the comparison row

    with open(out) as f:
        artifact = json.load(f)
    row = artifact["results"]["full_44KHz"]
    assert row["published"]["vocals"]["median"] == 4.95
    measured = row["measured"]
    assert set(measured) == {"vocals", "accompaniment"}
    for src in measured:
        assert np.isfinite(measured[src]["median"]), measured
        assert np.isfinite(measured[src]["mean"]), measured
    # An UNTRAINED-at-this-task checkpoint has no quality guarantee, but the
    # pipeline must produce sane in-range BSS-Eval numbers, not NaN/inf junk.
    assert -60 < measured["vocals"]["median"] < 60
