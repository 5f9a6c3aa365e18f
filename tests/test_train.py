"""Training tests: loss math, overfit smoke, checkpoint round-trip, resume."""

import numpy as np
import os
import jax
import jax.numpy as jnp
import pytest

from waveunet_tpu.config import get_config
from waveunet_tpu.models.waveunet import init_waveunet
from waveunet_tpu.ops import shapes
from waveunet_tpu.train import checkpoint as ckpt
from waveunet_tpu.train.step import make_eval_step, make_loss_fn, make_train_step


def _batch(cfg, rng, n=2):
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    srcs = {name: (0.2 * rng.standard_normal((n, out_len, cfg.num_channels))
                   ).astype(np.float32) for name in cfg.source_names}
    # mix = sum of sources, context-padded to the input window
    pad = (in_len - out_len) // 2
    mix = sum(srcs.values())
    mix = np.pad(mix, [(0, 0), (pad, pad), (0, 0)])
    batch = {k: jnp.asarray(v) for k, v in srcs.items()}
    batch["mix"] = jnp.asarray(mix)
    return batch


def test_loss_is_mean_mse_over_sources(rng):
    cfg = get_config("baseline", num_layers=3, num_frames=256)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, rng)
    loss_fn = make_loss_fn(cfg, training=True)
    loss, _ = loss_fn(params, {}, batch, None)
    # manual check
    from waveunet_tpu.models.waveunet import apply_waveunet
    est = apply_waveunet(params, cfg, batch["mix"], training=True)
    want = np.mean([np.mean((np.asarray(est[s]) - np.asarray(batch[s])) ** 2)
                    for s in cfg.source_names])
    np.testing.assert_allclose(float(loss), want, rtol=1e-6)


def test_overfit_tiny():
    """A few Adam steps on one fixed batch must reduce the loss sharply.

    Uses a private rng: the shared session fixture's stream shifts whenever
    tests are added, which made this threshold assertion order-dependent.
    """
    cfg = get_config("baseline", num_layers=2, num_frames=128,
                     num_initial_filters=8)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    init_opt, step = make_train_step(cfg, 1e-3)
    opt_state = init_opt(params)
    batch = _batch(cfg, np.random.default_rng(42), n=4)
    rng_key = jax.random.PRNGKey(0)
    losses = []
    state = {}
    for i in range(100):
        params, state, opt_state, loss = step(params, state, opt_state, batch,
                                              rng_key)
        losses.append(float(loss))
    assert losses[-1] < 0.3 * losses[0], (losses[0], losses[-1])


def test_eval_step_matches_loss(rng):
    cfg = get_config("baseline", num_layers=2, num_frames=128,
                     num_initial_filters=8)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, rng)
    ev = make_eval_step(cfg)
    loss = float(ev(params, {}, batch))
    assert np.isfinite(loss) and loss > 0


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = get_config("baseline", num_layers=2, num_frames=128,
                     num_initial_filters=8)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    init_opt, _ = make_train_step(cfg, cfg.init_sup_sep_lr)
    state = {"params": params, "model_state": {},
             "opt_state": init_opt(params), "step": 42}
    path = ckpt.save_checkpoint(str(tmp_path / "ck"), "exp1", 42, state)
    restored = ckpt.restore_checkpoint(path)
    assert int(restored["step"]) == 42
    for k in params:
        np.testing.assert_array_equal(np.asarray(restored["params"][k]["kernel"]),
                                      np.asarray(params[k]["kernel"]))
    assert ckpt.latest_checkpoint(str(tmp_path / "ck"), "exp1") == path


def test_spectrogram_train_step(rng):
    """One train step of the spectrogram net updates params + BN stats."""
    cfg = get_config("unet_spectrogram", num_layers=3,
                     num_frames=768 * 15 + 1024, batch_size=1)
    from waveunet_tpu.models.spectrogram_unet import init_spectrogram_unet
    params, mstate = init_spectrogram_unet(jax.random.PRNGKey(0), cfg)
    init_opt, step = make_train_step(cfg, 1e-4)
    opt_state = init_opt(params)
    n = cfg.num_frames
    srcs = {s: (0.1 * rng.standard_normal((1, n, 1))).astype(np.float32)
            for s in cfg.source_names}
    batch = {k: jnp.asarray(v) for k, v in srcs.items()}
    batch["mix"] = jnp.asarray(sum(srcs.values()))
    k = f"{cfg.source_names[0]}/down_0_bn"
    mean_before = np.asarray(mstate[k]["mean"]).copy()  # step donates buffers
    p2, s2, opt_state, loss = step(params, mstate, opt_state, batch,
                                   jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert float(np.max(np.abs(np.asarray(s2[k]["mean"]) - mean_before))) > 0


def test_remat_matches_plain_grads(rng):
    """jax.checkpoint rematerialisation must not change loss or gradients."""
    from waveunet_tpu.train.step import make_loss_fn

    base = get_config("baseline", num_layers=2, num_frames=128,
                      num_initial_filters=8)
    params = init_waveunet(jax.random.PRNGKey(0), base)
    batch = _batch(base, rng)

    def grads(cfg):
        loss_fn = make_loss_fn(cfg, training=True)
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, {}, batch, None)
        return float(l), g

    l0, g0 = grads(base)
    l1, g1 = grads(base.replace(remat=True))
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    for k in g0:
        np.testing.assert_allclose(np.asarray(g0[k]["kernel"]),
                                   np.asarray(g1[k]["kernel"]),
                                   rtol=1e-5, atol=1e-7)


def test_checkpoint_retention(tmp_path):
    from waveunet_tpu.train.checkpoint import (latest_checkpoint,
                                               prune_checkpoints,
                                               save_checkpoint)

    base = str(tmp_path / "ck")
    paths = [save_checkpoint(base, "e", s, {"step": s}) for s in range(5)]
    # keep=0: no pruning (reference parity)
    prune_checkpoints(base, "e", 0)
    assert len(os.listdir(tmp_path / "ck" / "e")) == 5
    # keep 2 newest, protect an old one (the "best" model)
    prune_checkpoints(base, "e", 2, protect=(paths[1],))
    left = sorted(os.listdir(tmp_path / "ck" / "e"))
    assert len(left) == 3
    assert os.path.basename(paths[1]) in left
    assert latest_checkpoint(base, "e") == paths[4]
