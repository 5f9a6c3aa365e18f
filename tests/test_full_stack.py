"""Full-stack quality gate: train -> checkpoint -> restore -> full eval harness.

Builds a tiny synthetic 'MUSDB' (sine mixes in the decoded-WAV layout), trains a
small Wave-U-Net via the real optimise() driver, restores the best checkpoint,
runs the complete evaluation harness (engine separation + BSS-Eval v4 + JSON +
aggregation), and requires the trained model's median SDR to beat the
mixture-as-estimate baseline. This is the reference's whole workflow
(`Training.py` -> `Test.py` -> `Evaluate.py`) exercised end-to-end in one test.
"""

import os

import numpy as np
import pytest

from waveunet_tpu.config import get_config
from waveunet_tpu.data.audio_io import write_wav
from waveunet_tpu.eval.bsseval import bss_eval_framewise


def _write_db(root, sr, n_songs=2, seconds=3.0):
    rng = np.random.default_rng(7)
    for part in ("train", "valid", "test"):
        for i in range(n_songs):
            d = root / part / f"song{i}"
            d.mkdir(parents=True, exist_ok=True)
            n = int(sr * seconds)
            t = np.arange(n) / sr
            # fixed frequencies so train and test distributions match
            voc = (0.4 * np.sin(2 * np.pi * 523.0 * t + i)).astype(np.float32)
            acc = (0.4 * np.sin(2 * np.pi * 130.8 * t + 2 * i)).astype(np.float32)
            write_wav(str(d / "vocals.wav"), voc[:, None], sr)
            write_wav(str(d / "accompaniment.wav"), acc[:, None], sr)
            write_wav(str(d / "mixture.wav"), (voc + acc)[:, None], sr)


def test_train_then_evaluate_beats_baseline(tmp_path):
    from waveunet_tpu.data import cache
    from waveunet_tpu.data.ingest import get_musdb
    from waveunet_tpu.eval.harness import evaluate_musdb, iter_tracks
    from waveunet_tpu.ops import shapes
    from waveunet_tpu.train import checkpoint as ckpt
    from waveunet_tpu.train.loop import optimise

    sr = 8192
    cfg = get_config(
        "baseline", num_layers=3, num_frames=512, num_initial_filters=12,
        expected_sr=sr, batch_size=8, epoch_it=120, init_sup_sep_lr=1e-3,
        num_snippets_per_track=16, cache_size=64, worse_epochs=1,
        musdb_path=str(tmp_path / "db"), data_path=str(tmp_path / "cache"),
        model_base_dir=str(tmp_path / "ckpts"), log_dir=str(tmp_path / "logs"),
        infer_batch=4)
    _write_db(tmp_path / "db", sr)

    # preprocessing via the real ingest (accompaniment synthesis is a no-op
    # here since the stem exists) + cache
    pad = shapes.context_pad(cfg, cfg.num_frames)
    train_list, test_list = get_musdb(cfg.musdb_path)
    assert len(train_list) == len(test_list) == 2
    for part, samples in [("train", train_list), ("valid", train_list),
                          ("test", test_list)]:
        cache.preprocess_partition(cfg, part, samples, pad)

    best_path, test_loss = optimise(cfg, experiment_id="fullstack",
                                    max_epochs_per_round=1)
    assert np.isfinite(test_loss)

    restored = ckpt.restore_checkpoint(best_path)
    stats = evaluate_musdb(cfg, restored["params"],
                           model_state=restored["model_state"],
                           subset="test", output_path=str(tmp_path / "est"))
    med_sdrs = [s[0] for s in stats]

    # baseline: mixture as the estimate for every source
    base = []
    for name, mix, rate, targets in iter_tracks(cfg.musdb_path, "test"):
        refs = np.stack([targets[s] for s in ("vocals", "accompaniment")])
        ests = np.stack([mix, mix])
        res = bss_eval_framewise(refs, ests, rate)
        base.append(np.nanmedian(res["SDR"], axis=1))
    base_med = np.nanmedian(np.stack(base), axis=0)

    for got, b in zip(med_sdrs, base_med):
        assert got > b + 3.0, (med_sdrs, base_med)
    # JSONs exist for the figure pipeline
    assert len(os.listdir(tmp_path / "est" / "test")) == 2
