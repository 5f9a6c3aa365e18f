"""Learning-dynamics smoke: a tiny Wave-U-Net must actually learn to separate.

Trains ~150 Adam steps on a two-sine mixture (vocals 523 Hz, accompaniment
130.8 Hz, random phase per example) and checks the estimates beat the trivial
mixture-as-estimate baseline by a wide SDR margin — this exercises forward,
backward, the optimiser, and inference-mode behavior together (the quality gate
the reference only had via its validation loop, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from waveunet_tpu.config import get_config
from waveunet_tpu.models.waveunet import apply_waveunet, init_waveunet
from waveunet_tpu.ops import shapes
from waveunet_tpu.train.step import make_train_step


def _sdr(ref, est):
    ref, est = np.asarray(ref), np.asarray(est)
    return 10 * np.log10((ref ** 2).sum() / ((ref - est) ** 2).sum())


def test_learns_to_separate_sines():
    cfg = get_config("baseline", num_layers=3, num_frames=512,
                     num_initial_filters=12)
    _, out = shapes.get_padding(cfg, cfg.num_frames)
    sr = cfg.expected_sr
    rng = np.random.default_rng(0)

    def make_batch(n):
        t0 = rng.uniform(0, 100, (n, 1))
        t = np.arange(out) / sr + t0
        voc = 0.4 * np.sin(2 * np.pi * 523.0 * t).astype(np.float32)[..., None]
        acc = 0.4 * np.sin(2 * np.pi * 130.8 * t).astype(np.float32)[..., None]
        return {"vocals": jnp.asarray(voc), "accompaniment": jnp.asarray(acc),
                "mix": jnp.asarray(voc + acc)}

    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    init_opt, step = make_train_step(cfg, 1e-3)
    opt = init_opt(params)
    key = jax.random.PRNGKey(0)
    first_loss = None
    for i in range(150):
        params, _, opt, loss = step(params, {}, opt, make_batch(8), key)
        if first_loss is None:
            first_loss = float(loss)
    assert float(loss) < 0.05 * first_loss

    batch = make_batch(4)
    est = apply_waveunet(params, cfg, batch["mix"], training=False)
    for s in cfg.source_names:
        model_sdr = _sdr(batch[s], est[s])
        baseline_sdr = _sdr(batch[s], batch["mix"])
        assert model_sdr > baseline_sdr + 10, (s, model_sdr, baseline_sdr)


def test_learns_with_context_and_learned_upsampling():
    """The hard variant (valid convs + learned interp + difference output +
    stereo, i.e. the M5 family) also trains to separate."""
    cfg = get_config("full", num_layers=3, num_frames=512,
                     num_initial_filters=12)
    inp, out = shapes.get_padding(cfg, cfg.num_frames)
    sr = cfg.expected_sr
    rng = np.random.default_rng(1)

    def make_batch(n):
        t0 = rng.uniform(0, 100, (n, 1))
        t = np.arange(inp) / sr + t0
        voc = 0.4 * np.sin(2 * np.pi * 523.0 * t).astype(np.float32)
        acc = 0.4 * np.sin(2 * np.pi * 130.8 * t).astype(np.float32)
        voc = np.tile(voc[..., None], (1, 1, 2))
        acc = np.tile(acc[..., None], (1, 1, 2))
        pad = (inp - out) // 2
        return {"vocals": jnp.asarray(voc[:, pad:pad + out]),
                "accompaniment": jnp.asarray(acc[:, pad:pad + out]),
                "mix": jnp.asarray(voc + acc)}

    params = init_waveunet(jax.random.PRNGKey(1), cfg)
    init_opt, step = make_train_step(cfg, 1e-3)
    opt = init_opt(params)
    key = jax.random.PRNGKey(0)
    for i in range(150):
        params, _, opt, loss = step(params, {}, opt, make_batch(8), key)

    batch = make_batch(4)
    est = apply_waveunet(params, cfg, batch["mix"], training=False)
    for s in cfg.source_names:
        model_sdr = _sdr(batch[s], est[s])
        base_sdr = _sdr(batch[s], batch["mix"][:, (inp - out) // 2:
                                               (inp - out) // 2 + out])
        assert model_sdr > base_sdr + 8, (s, model_sdr, base_sdr)
