"""Jitted training/eval steps: loss, Adam, data-parallel mesh execution.

Replaces the reference's per-step ``sess.run`` hot loop
(`/root/reference/Training.py:103-109`) with a single compiled XLA program per
step. Loss math matches `Training.py:49-63`: per-source MSE on raw audio (or L1 on
STFT magnitudes for the U7a spectrogram config), averaged over sources. Optimiser
is Adam at ``init_sup_sep_lr`` (`Training.py:77`) via optax.

Model state (spectrogram net batch-norm moving stats — the reference's UPDATE_OPS
control dependency, `Training.py:74-75`) threads functionally through every step;
the Wave-U-Net has empty state. Dropout randomness comes from an explicit PRNG key
folded with the step index.

Data parallelism: batches are sharded along the leading axis of a 1-D
``jax.sharding.Mesh``; XLA inserts the gradient all-reduces over ICI from the
sharding annotations alone (SURVEY.md §C22/C23 — no hand-written collectives
needed at 10M params).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from waveunet_tpu.config import Config
from waveunet_tpu.models.waveunet import apply_waveunet


def make_forward(cfg: Config) -> Callable:
    """forward(params, state, x, training, rng) -> (outputs, new_state).

    ``outputs`` maps source names to estimates: raw audio for the unet /
    spectrogram-L2 paths, magnitude spectrograms for the U7a L1 path
    (mirroring `Training.py:47`'s ``return_spectrogram`` plumbing).
    """
    if cfg.network == "unet":
        def forward(params, state, x, training, rng=None):
            return apply_waveunet(params, cfg, x, training), state
        return forward

    from waveunet_tpu.models.spectrogram_unet import apply_spectrogram_unet
    return_spec = not cfg.raw_audio_loss

    def forward(params, state, x, training, rng=None):
        return apply_spectrogram_unet(params, cfg, x, training, state,
                                      return_spectrogram=return_spec, rng=rng)
    return forward


def make_loss_fn(cfg: Config, training: bool) -> Callable:
    """loss(params, state, batch, rng) -> (scalar, new_state)."""
    forward = make_forward(cfg)
    spectro_l1 = (cfg.network == "unet_spectrogram" and not cfg.raw_audio_loss)

    def loss_fn(params, state, batch, rng=None):
        est, new_state = forward(params, state, batch["mix"], training, rng)
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
                if pred.shape[1] != target.shape[1]:
                    # iSTFT output is hop*(F-1)+frame_len <= input length; crop
                    # the target tail to match (TF loss broadcasting relied on
                    # equal shapes; we align explicitly).
                    target = target[:, :pred.shape[1], :]
                total = total + jnp.mean(jnp.square(target - pred))
        return total / cfg.num_sources, new_state

    return loss_fn


def make_optimizer(lr: float) -> optax.GradientTransformation:
    """Adam with TF1 defaults (beta1=.9, beta2=.999, eps=1e-8) — `Training.py:77`."""
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


def _shardings(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(mesh.axis_names, None, None))
    return rep, data


def make_train_step(cfg: Config, lr: float,
                    mesh: Optional[jax.sharding.Mesh] = None
                    ) -> Tuple[Callable, Callable]:
    """Returns (init_opt, step) with
    ``step(params, state, opt_state, batch, rng) ->
        (params, state, opt_state, loss)`` jitted (mesh-sharded if given)."""
    loss_fn = make_loss_fn(cfg, training=True)
    tx = make_optimizer(lr)

    def step(params, state, opt_state, batch, rng):
        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    # Donating params/state/opt buffers lets XLA update Adam slots in place
    # instead of allocating a second copy of every parameter each step.
    if mesh is None:
        return tx.init, jax.jit(step, donate_argnums=(0, 1, 2))
    rep, data = _shardings(mesh)
    # in_shardings prefixes broadcast over pytrees: every leaf of `batch` is
    # sharded on its leading (batch) axis; params/opt state are replicated.
    step_jit = jax.jit(step,
                       in_shardings=(rep, rep, rep, data, rep),
                       out_shardings=(rep, rep, rep, rep),
                       donate_argnums=(0, 1, 2))
    return tx.init, step_jit


def make_scanned_epoch(cfg: Config, lr: float, n_steps: int, sample_fn,
                       mesh: Optional[jax.sharding.Mesh] = None,
                       chunk: Optional[int] = None,
                       bank_shardings=None, presharded_batch: bool = False):
    """ONE jitted program for a whole epoch: ``lax.scan`` over
    sample-from-HBM-bank -> train step.

    The per-step dispatch pattern (even with async dispatch) pays host->device
    launch latency and host-loop jitter 2000x per epoch; scanning the step
    compiles the epoch once (scan does not unroll) and runs it with ZERO host
    involvement — the TPU-native shape of `Training.py:103-109`'s hot loop.
    Data comes from the device-resident bank via ``sample_fn`` (the bank's raw
    traceable sampler, called as ``sample_fn(*bank_args, key)``), keys folded
    from (data_key, offset + i) and (step_rng, step0 + i) so the stream
    matches the eager loop's convention.

    Returns ``epoch(params, mstate, opt_state, *bank_args, data_key,
    step_rng, step0) -> (params, mstate, opt_state, losses)`` with donated
    model/optimizer buffers; ``bank_args`` defaults to the single-device
    bank's ``(bank, starts, valids)`` triple.

    With ``mesh``, the in-scan batch is sharding-constrained along the data
    axis (bank/params replicated): the scan body is the same DP step XLA
    compiles for the eager mesh path — gradients all-reduce inside the scan.
    At pod scale pass a :class:`~waveunet_tpu.data.device_cache.ShardedBank`'s
    ``sample_raw`` plus its ``shardings`` as ``bank_shardings`` and
    ``presharded_batch=True``: the shard_map sampler already emits a
    data-sharded global batch from per-device bank shards, so a multi-host
    epoch runs with the same zero per-step dispatches as single-host.
    """
    loss_fn = make_loss_fn(cfg, training=True)
    tx = make_optimizer(lr)
    n_bank = 3 if bank_shardings is None else len(bank_shardings)

    def build(m: int):
        def epoch(params, mstate, opt_state, *rest):
            bank_args, (data_key, step_rng, step0) = rest[:-3], rest[-3:]

            def body(carry, i):
                params, mstate, opt_state = carry
                batch = sample_fn(*bank_args,
                                  jax.random.fold_in(data_key, step0 + i))
                if mesh is not None and not presharded_batch:
                    from jax.sharding import NamedSharding, PartitionSpec as P
                    data = NamedSharding(mesh, P(mesh.axis_names, None, None))
                    batch = {k: jax.lax.with_sharding_constraint(v, data)
                             for k, v in batch.items()}
                rng = jax.random.fold_in(step_rng, step0 + i)
                (loss, new_state), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, mstate, batch, rng)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, new_state, opt_state), loss

            (params, mstate, opt_state), losses = jax.lax.scan(
                body, (params, mstate, opt_state), jnp.arange(m))
            return params, mstate, opt_state, losses

        if mesh is None:
            return jax.jit(epoch, donate_argnums=(0, 1, 2))
        rep, _ = _shardings(mesh)
        bsh = ((rep,) * n_bank if bank_shardings is None
               else tuple(bank_shardings))
        return jax.jit(epoch, donate_argnums=(0, 1, 2),
                       in_shardings=(rep, rep, rep) + bsh + (rep, rep, None),
                       out_shardings=(rep, rep, rep, rep))

    if not chunk or chunk >= n_steps:
        return build(n_steps)

    # Chunked: ceil(n_steps / chunk) back-to-back dispatches, bit-exact with
    # the monolithic scan (both RNG streams fold on the ABSOLUTE step index
    # step0 + i, and lax.scan carries params sequentially either way).
    # Bounds any single program's device execution time — the axon TPU
    # worker crashes on single ~66 s programs (config.scan_chunk docs) —
    # at one extra ~7 ms dispatch per chunk, with all chunks after the first
    # enqueued while the first still runs (async dispatch).
    n_full, rem = divmod(n_steps, chunk)
    chunk_fn = build(chunk)
    rem_fn = build(rem) if rem else None

    def chunked(params, mstate, opt_state, *rest):
        bank_args, (data_key, step_rng, step0) = rest[:-3], rest[-3:]
        losses = []
        off = 0
        for fn, m in [(chunk_fn, chunk)] * n_full + (
                [(rem_fn, rem)] if rem_fn is not None else []):
            params, mstate, opt_state, l = fn(
                params, mstate, opt_state, *bank_args, data_key,
                step_rng, step0 + off)
            losses.append(l)
            off += m
        return params, mstate, opt_state, jnp.concatenate(losses)

    return chunked


def make_eval_step(cfg: Config, mesh: Optional[jax.sharding.Mesh] = None):
    """Jitted validation loss (inference mode; BN uses moving stats) — replaces
    the reference's fresh-graph evaluator (`/root/reference/Test.py:34,73-79`)."""
    loss_fn = make_loss_fn(cfg, training=False)

    def eval_step(params, state, batch):
        loss, _ = loss_fn(params, state, batch, None)
        return loss

    if mesh is None:
        return jax.jit(eval_step)
    rep, data = _shardings(mesh)
    return jax.jit(eval_step, in_shardings=(rep, rep, data), out_shardings=rep)
