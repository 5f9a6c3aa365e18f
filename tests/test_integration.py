"""End-to-end integration tests: full optimise() driver, multi-instrument
model, spectrogram-net serving through the inference engine."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waveunet_tpu.config import get_config
from waveunet_tpu.ops import shapes


def _make_cache(tmp_path, cfg, n_songs=2, seconds=2.0):
    from waveunet_tpu.data import cache
    from waveunet_tpu.data.audio_io import write_wav

    rng = np.random.default_rng(0)
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    pad = (in_len - out_len) // 2
    for part in ("train", "valid", "test"):
        samples = []
        for i in range(n_songs):
            n = int(cfg.expected_sr * seconds)
            t = np.arange(n) / cfg.expected_sr
            tracks, mix = {}, 0
            for j, name in enumerate(cfg.source_names):
                f = 200.0 * (j + 1) + 50 * i
                sig = (0.3 * np.sin(2 * np.pi * f * t)).astype(np.float32)
                sig = np.tile(sig[:, None], (1, cfg.num_channels))
                tracks[name] = sig
                mix = mix + sig
            tracks["mix"] = mix
            d = tmp_path / "wav" / part
            d.mkdir(parents=True, exist_ok=True)
            paths = {}
            for k, v in tracks.items():
                p = str(d / f"s{i}_{k}.wav")
                write_wav(p, v, cfg.expected_sr, subtype="FLOAT")
                paths[k] = p
            samples.append(paths)
        cache.preprocess_partition(cfg, part, samples, pad_frames=pad)


def test_optimise_end_to_end(tmp_path):
    """One epoch x two rounds of the full early-stopping driver: checkpoints
    written, validation evaluated, test loss finite, resume path works."""
    from waveunet_tpu.train import checkpoint as ckpt
    from waveunet_tpu.train.loop import optimise

    cfg = get_config("baseline", num_layers=2, num_frames=256,
                     num_initial_filters=4, batch_size=2, epoch_it=4,
                     num_snippets_per_track=4, cache_size=8, worse_epochs=1,
                     data_path=str(tmp_path / "cache"),
                     model_base_dir=str(tmp_path / "ckpts"),
                     log_dir=str(tmp_path / "logs"))
    _make_cache(tmp_path, cfg)
    best_path, test_loss = optimise(cfg, experiment_id="itest",
                                    max_epochs_per_round=1)
    assert np.isfinite(test_loss)
    assert best_path and os.path.exists(best_path)
    # metrics log written
    assert os.path.exists(tmp_path / "logs" / "itest" / "metrics.jsonl")
    # restore gives the same tree structure
    restored = ckpt.restore_checkpoint(best_path)
    assert "params" in restored and int(restored["step"]) > 0


def test_multi_instrument_model(rng):
    cfg = get_config("full_multi_instrument", num_layers=3, num_frames=256,
                     num_initial_filters=8)
    from waveunet_tpu.models.waveunet import apply_waveunet, init_waveunet
    inp, out = shapes.get_padding(cfg, cfg.num_frames)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    mix = jnp.asarray((0.1 * rng.standard_normal((1, inp, 2))).astype(np.float32))
    y = apply_waveunet(params, cfg, mix, training=True)
    assert set(y) == {"bass", "drums", "other", "vocals"}
    # difference output: sources sum to the cropped mix in training mode
    total = sum(y.values())
    from waveunet_tpu.ops.primitives import crop
    np.testing.assert_allclose(np.asarray(total),
                               np.asarray(crop(mix, out)), atol=1e-5)


def test_spectrogram_separator_engine(rng):
    """U7 through the batched window engine: full-song separation shapes."""
    from waveunet_tpu.infer.engine import Separator
    from waveunet_tpu.models.spectrogram_unet import init_spectrogram_unet

    cfg = get_config("unet_spectrogram", num_layers=3,
                     num_frames=768 * 15 + 1024, infer_batch=2)
    params, state = init_spectrogram_unet(jax.random.PRNGKey(0), cfg)
    sep = Separator(cfg, params, model_state=state)
    n = int(cfg.expected_sr * 4.5)
    audio = (0.2 * rng.standard_normal((n, 1))).astype(np.float32)
    preds = sep.separate(audio, cfg.expected_sr)
    assert set(preds) == {"accompaniment", "vocals"}
    for v in preds.values():
        assert v.shape == (n, 1)
        assert np.all(np.isfinite(v))


def test_optimise_spectrogram_u7(tmp_path):
    """The full driver also trains the spectrogram net (BN state threading
    through step/checkpoint/eval)."""
    from waveunet_tpu.train.loop import optimise

    cfg = get_config("unet_spectrogram", num_layers=3,
                     num_frames=768 * 15 + 1024, batch_size=1, epoch_it=2,
                     num_snippets_per_track=2, cache_size=4, worse_epochs=1,
                     data_path=str(tmp_path / "cache"),
                     model_base_dir=str(tmp_path / "ckpts"),
                     log_dir=str(tmp_path / "logs"))
    _make_cache(tmp_path, cfg, n_songs=2, seconds=2.0)
    best, test_loss = optimise(cfg, experiment_id="u7",
                               max_epochs_per_round=1)
    assert np.isfinite(test_loss) and best


def test_u7a_l1_magnitude_loss_step(rng):
    """U7a: L1 loss on STFT magnitudes (`Training.py:55-60`) trains one step."""
    from waveunet_tpu.models.spectrogram_unet import init_spectrogram_unet
    from waveunet_tpu.train.step import make_train_step

    cfg = get_config("unet_spectrogram_l1", num_layers=3,
                     num_frames=768 * 15 + 1024, batch_size=1)
    params, mstate = init_spectrogram_unet(jax.random.PRNGKey(0), cfg)
    init_opt, step = make_train_step(cfg, 1e-4)
    n = cfg.num_frames
    srcs = {s: jnp.asarray(
        (0.1 * rng.standard_normal((1, n, 1))).astype(np.float32))
        for s in cfg.source_names}
    batch = dict(srcs)
    batch["mix"] = sum(srcs.values())
    _, _, _, loss = step(params, mstate, init_opt(params), batch,
                         jax.random.PRNGKey(0))
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_optimise_on_mesh_with_device_bank(tmp_path):
    """optimise() over the 8-device mesh with the device-resident bank:
    sharded train step + bank sampling + eval all compose."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from waveunet_tpu.parallel.mesh import make_mesh
    from waveunet_tpu.train.loop import optimise

    cfg = get_config("baseline", num_layers=2, num_frames=256,
                     num_initial_filters=4, batch_size=8, epoch_it=3,
                     num_snippets_per_track=4, cache_size=8, worse_epochs=1,
                     data_path=str(tmp_path / "cache"),
                     model_base_dir=str(tmp_path / "ckpts"),
                     log_dir=str(tmp_path / "logs"))
    _make_cache(tmp_path, cfg)
    best, test_loss = optimise(cfg, experiment_id="mesh",
                               mesh=make_mesh(), max_epochs_per_round=1)
    assert np.isfinite(test_loss) and best
