"""Jitted training/eval steps: loss, Adam, data-parallel mesh execution.

Replaces the reference's per-step ``sess.run`` hot loop
(`/root/reference/Training.py:103-109`) with a single compiled XLA program per
step. Loss math matches `Training.py:49-63`: per-source MSE on raw audio (or L1 on
STFT magnitudes for the U7a spectrogram config), averaged over sources. Optimiser
is Adam at ``init_sup_sep_lr`` (`Training.py:77`) via optax.

Data parallelism: batches are sharded along the leading axis of a 1-D
``jax.sharding.Mesh``; gradients are combined by XLA-inserted all-reduces over ICI
(jit + sharding annotations — no hand-written collectives needed at this scale,
SURVEY.md §C22/C23).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from waveunet_tpu.config import Config
from waveunet_tpu.models.waveunet import apply_waveunet


def make_loss_fn(cfg: Config, forward_fn: Optional[Callable] = None,
                 training: bool = True) -> Callable:
    """loss(params, batch) -> scalar. ``batch`` maps "mix" + source names to
    [B, len, C] arrays (targets already centre-cropped to the output window)."""
    spectro_l1 = (cfg.network == "unet_spectrogram" and not cfg.raw_audio_loss)

    if forward_fn is None:
        if cfg.network == "unet":
            def forward_fn(p, x, train):
                return apply_waveunet(p, cfg, x, training=train)
        else:
            from waveunet_tpu.models.spectrogram_unet import apply_spectrogram_unet

            def forward_fn(p, x, train):
                return apply_spectrogram_unet(
                    p, cfg, x, training=train,
                    return_spectrogram=spectro_l1)

    def loss_fn(params, batch):
        est = forward_fn(params, batch["mix"], training)
        total = 0.0
        for name in cfg.source_names:
            target = batch[name]
            pred = est[name]
            if spectro_l1:
                # L1 on magnitude spectrograms (`Training.py:55-60`).
                from waveunet_tpu.ops.stft import stft_magnitude
                real_mag = stft_magnitude(target[..., 0])
                total = total + jnp.mean(jnp.abs(real_mag - pred))
            else:
                total = total + jnp.mean(jnp.square(target - pred))
        return total / cfg.num_sources

    return loss_fn


def make_optimizer(lr: float) -> optax.GradientTransformation:
    """Adam with TF1 defaults (beta1=.9, beta2=.999, eps=1e-8) — `Training.py:77`."""
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


def make_train_step(cfg: Config, lr: float,
                    forward_fn: Optional[Callable] = None,
                    mesh: Optional[jax.sharding.Mesh] = None):
    """Returns (init_opt_state, step) where
    ``step(params, opt_state, batch) -> (params, opt_state, loss)`` is jitted
    (and mesh-sharded if a mesh is given)."""
    loss_fn = make_loss_fn(cfg, forward_fn, training=True)
    tx = make_optimizer(lr)

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return tx.init, jax.jit(step)

    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(mesh.axis_names, None, None))
    # in_shardings prefixes broadcast over pytrees: every leaf of `batch` is
    # sharded on its leading (batch) axis; params/opt state are replicated.
    step_jit = jax.jit(
        step,
        in_shardings=(rep, rep, data),
        out_shardings=(rep, rep, rep))
    return tx.init, step_jit


def make_eval_step(cfg: Config, forward_fn: Optional[Callable] = None,
                   mesh: Optional[jax.sharding.Mesh] = None):
    """Jitted validation loss step (inference mode) — replaces the reference's
    fresh-graph evaluator (`/root/reference/Test.py:34,73-79`)."""
    loss_fn = make_loss_fn(cfg, forward_fn, training=False)
    if mesh is None:
        return jax.jit(loss_fn)
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(mesh.axis_names, None, None))
    return jax.jit(loss_fn, in_shardings=(rep, data), out_shardings=rep)
