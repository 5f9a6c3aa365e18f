"""Training driver: epoch loop, early-stopping optimiser, resume.

Pure-Python control flow around jitted steps, mirroring the reference driver:
  * ``train_one_epoch``: N steps then checkpoint
    (`/root/reference/Training.py:100-113` — 2000 sess.run calls/epoch become
    2000 dispatches of one compiled program with host prefetch overlapped).
  * ``evaluate``: running-mean validation loss over a deterministic pass
    (`/root/reference/Test.py:73-87`).
  * ``optimise``: two rounds — round 2 doubles batch size and drops lr to 1e-5 —
    each early-stopped after ``worse_epochs`` non-improving validation epochs;
    finishes with a test-partition evaluation
    (`/root/reference/Training.py:123-150`).
"""

from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from waveunet_tpu.config import Config
from waveunet_tpu.data.pipeline import BatchPipeline, EmptyShardError
from waveunet_tpu.models.waveunet import init_waveunet, num_params
from waveunet_tpu.ops import shapes
from waveunet_tpu.train import checkpoint as ckpt
from waveunet_tpu.train.metrics import MetricLogger
from waveunet_tpu.train.step import make_eval_step, make_train_step


@dataclass
class TrainState:
    params: Any
    model_state: Any  # batch-norm moving stats ({} for the time-domain net)
    opt_state: Any
    step: int

    def as_pytree(self) -> Dict[str, Any]:
        return {"params": self.params, "model_state": self.model_state,
                "opt_state": self.opt_state, "step": self.step}


def make_train_source(cfg: Config, in_len: int, out_len: int,
                      seed_offset: int = 0):
    """(bank, iterator): the device-resident HBM bank when it fits (zero
    per-step host transfer; iterator None), else (None, host pipeline)."""
    if cfg.device_data:
        try:
            from waveunet_tpu.data.device_cache import DeviceBank
            bank = DeviceBank(cfg, "train", in_len, out_len,
                              max_bytes=cfg.device_data_max_bytes)
            print(f"Training from device-resident bank: {bank.n_songs} "
                  f"songs, {bank.nbytes() / 1e6:.0f} MB HBM")
            return bank, None
        except (FileNotFoundError, ValueError) as e:
            print(f"Device bank unavailable ({e}); using host pipeline")
    pipe = BatchPipeline(cfg, "train", in_len, out_len,
                         seed=cfg.seed + seed_offset)
    return None, pipe.prefetched(pipe.train_batches())


def make_eval_source(cfg: Config, partition: str, in_len: int, out_len: int,
                     batch_size: Optional[int] = None):
    """Device-resident :class:`EvalBank` when it fits (zero per-epoch host
    transfer), else None (callers fall back to the host pipeline)."""
    if cfg.device_data:
        try:
            from waveunet_tpu.data.device_cache import EvalBank
            bank = EvalBank(cfg, partition, in_len, out_len,
                            batch_size=batch_size or cfg.batch_size,
                            max_bytes=cfg.device_data_max_bytes)
            print(f"Evaluating {partition!r} from device-resident bank: "
                  f"{bank.n_windows} windows, {bank.nbytes() / 1e6:.0f} MB HBM")
            return bank
        except (FileNotFoundError, ValueError) as e:
            print(f"Device eval bank unavailable ({e}); using host pipeline")
    return None


def init_state(cfg: Config, rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
    if cfg.network == "unet":
        params, model_state = init_waveunet(rng, cfg), {}
    else:
        from waveunet_tpu.models.spectrogram_unet import init_spectrogram_unet
        params, model_state = init_spectrogram_unet(rng, cfg)
    init_opt, _ = make_train_step(cfg, cfg.init_sup_sep_lr)
    return TrainState(params, model_state, init_opt(params), 0)


def train_one_epoch(cfg: Config, state: TrainState, step_fn,
                    batches: Iterator[Dict[str, np.ndarray]],
                    logger: Optional[MetricLogger] = None,
                    base_rng=None) -> Tuple[TrainState, float]:
    params, mstate, opt_state = state.params, state.model_state, state.opt_state
    base_rng = base_rng if base_rng is not None else jax.random.PRNGKey(cfg.seed)
    losses = []
    t0 = time.time()
    for it in range(cfg.epoch_it):
        batch = next(batches)
        batch = {k: v if isinstance(v, jax.Array) else jnp.asarray(v)
                 for k, v in batch.items()}
        rng = jax.random.fold_in(base_rng, state.step + it)
        params, mstate, opt_state, loss = step_fn(params, mstate, opt_state,
                                                  batch, rng)
        if logger is not None and (it % 50 == 0 or it == cfg.epoch_it - 1):
            logger.log(state.step + it, sep_loss=float(loss))
        losses.append(loss)
    mean_loss = float(jnp.mean(jnp.stack(losses)))
    dt = time.time() - t0
    if logger is not None:
        logger.log(state.step + cfg.epoch_it, epoch_mean_loss=mean_loss,
                   steps_per_sec=cfg.epoch_it / dt)
    return TrainState(params, mstate, opt_state,
                      state.step + cfg.epoch_it), mean_loss


def train_one_epoch_scanned(cfg: Config, state: TrainState, epoch_fn, bank,
                            data_key, logger: Optional[MetricLogger] = None,
                            base_rng=None) -> Tuple[TrainState, float]:
    """One epoch as a handful of scanned device programs (lax.scan over
    sample+step, cut into ``cfg.scan_chunk``-step dispatches — see
    ``make_scanned_epoch``). Equivalent stream/rng conventions to
    :func:`train_one_epoch` over a bank iterator."""
    base_rng = base_rng if base_rng is not None else jax.random.PRNGKey(
        cfg.seed)
    t0 = time.time()
    # bank.arrays is (bank, starts, valids) for the single-device DeviceBank,
    # (bank, starts, valids, n_songs) device-sharded for the pod ShardedBank;
    # the epoch_fn was built against the matching sampler either way.
    params, mstate, opt_state, losses = epoch_fn(
        state.params, state.model_state, state.opt_state,
        *bank.arrays, data_key, base_rng, state.step)
    losses = np.asarray(losses)
    dt = time.time() - t0
    if logger is not None:
        # Same logging points as the eager loop: every 50th step plus the
        # final step of the epoch.
        its = list(range(0, cfg.epoch_it, 50))
        if cfg.epoch_it - 1 not in its:
            its.append(cfg.epoch_it - 1)
        for it in its:
            logger.log(state.step + it, sep_loss=float(losses[it]))
        logger.log(state.step + cfg.epoch_it,
                   epoch_mean_loss=float(losses.mean()),
                   steps_per_sec=cfg.epoch_it / dt)
    return TrainState(params, mstate, opt_state,
                      state.step + cfg.epoch_it), float(losses.mean())


def evaluate(cfg: Config, params, model_state, eval_step,
             batches: Iterator[Dict[str, np.ndarray]]) -> float:
    """Running-mean loss over one deterministic pass (`Test.py:73-79`)."""
    total, n = 0.0, 0
    for batch in batches:
        batch = {k: v if isinstance(v, jax.Array) else jnp.asarray(v)
                 for k, v in batch.items()}
        loss = float(eval_step(params, model_state, batch))
        n += 1
        total += (loss - total) / n
    if n == 0:
        # No full batch available (songs shorter than the input window):
        # returning 0 would masquerade as a perfect validation score.
        print("WARNING: evaluation produced no batches; returning inf")
        return float("inf")
    return total


@functools.lru_cache(maxsize=4)
def _local_eval_step(cfg: Config):
    """One LOCAL (mesh-free) jitted eval step per config: pod host-shard
    validation runs every epoch and must not re-trace the full eval graph
    each time (a fresh ``jax.jit`` object has an empty cache)."""
    return make_eval_step(cfg)


def _pod_host_evaluate(cfg: Config, params, model_state, partition: str,
                       in_len: int, out_len: int):
    """Host-sharded host-fed eval fallback: this process streams ONLY its
    disjoint song shard and scores it with a LOCAL jit — no global-mesh
    collectives, so shards of any size (including empty) compose without the
    equal-batch-count deadlock constraint that previously forced every pod
    process to stream the FULL partition. Returns this shard's (loss sum,
    batch count) for ``parallel.distributed.pod_weighted_mean``."""
    import jax as _jax

    from waveunet_tpu.parallel import distributed as D

    params = D.replicated_local_view(params)
    model_state = D.replicated_local_view(model_state)
    try:
        pipe = D.make_pod_pipeline(cfg, partition, in_len, out_len,
                                   seed=cfg.seed)
    except EmptyShardError as e:  # weight-0 contribution; anything else
        #                           (missing cache, bad batch split) raises
        print(f"[pod {_jax.process_index()}] empty {partition} shard ({e})")
        return 0.0, 0
    eval_step = _local_eval_step(cfg)
    total, n = 0.0, 0
    for batch in pipe.eval_batches():
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        total += float(eval_step(params, model_state, batch))
        n += 1
    return total, n


def optimise(cfg: Config, experiment_id: Optional[str] = None,
             mesh: Optional[jax.sharding.Mesh] = None,
             resume_path: Optional[str] = None,
             max_epochs_per_round: Optional[int] = None) -> Tuple[str, float]:
    """Full early-stopped two-round training. Returns (best_ckpt_path, test_loss).

    Multi-host (pod) mode engages automatically when ``jax.process_count()``
    > 1 (bring the processes up first — ``parallel.distributed.initialize``
    or the CLI's ``coordinator=/num_processes=/process_id=`` options): every
    process runs this same driver SPMD-style; songs shard per host (device
    bank or pipeline), each host feeds its rows of the global batch, XLA
    all-reduces gradients across hosts, and losses/early-stop decisions are
    identical everywhere by construction. Only process 0 writes checkpoints,
    logs, and the best-model marker. Requires ``mesh`` spanning all
    processes' devices.
    """
    n_proc = jax.process_count()
    pod = n_proc > 1
    is_main = jax.process_index() == 0
    if pod:
        if mesh is None:
            raise ValueError("pod training requires a mesh over the global "
                             "device set (parallel.mesh.make_mesh())")
        from waveunet_tpu.parallel import distributed as D
    if experiment_id is None:
        if pod:
            # must agree across processes: derive deterministically
            import hashlib
            experiment_id = "pod-" + hashlib.sha1(
                cfg.to_json().encode()).hexdigest()[:8]
        else:
            experiment_id = str(np.random.randint(0, 1_000_000))
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    logger = MetricLogger(cfg.log_dir, experiment_id) if is_main else None
    if is_main:
        # Capture the exact run configuration (sacred's role in the
        # reference, `Training.py:17-22`): reproducibility record next to
        # the metrics.
        with open(os.path.join(logger.dir, "config.json"), "w") as f:
            f.write(cfg.to_json())

    state = init_state(cfg)
    print(f"Sep_Vars: {num_params(state.params)}")
    if resume_path:
        restored = ckpt.restore_checkpoint(resume_path, like=state.as_pytree())
        state = TrainState(restored["params"], restored["model_state"],
                           restored["opt_state"], int(restored["step"]))

    best_loss = float("inf")
    best_path = None
    epoch = 0
    round_cfgs = [cfg, cfg.replace(batch_size=cfg.batch_size * 2,
                                   init_sup_sep_lr=1e-5)]
    bank = None
    valid_bank = None
    valid_bank_tried = False
    # Pod validation runs on LOCAL devices over host-sharded data (see
    # _pod_host_evaluate / EvalBank host sharding); use a local mesh when
    # this host has several chips and the batch splits evenly.
    local_eval_mesh = None
    if pod:
        local = jax.local_devices()
        # eval banks sweep the PER-HOST batch share (make_pod_eval_bank)
        if len(local) > 1 and (cfg.batch_size // n_proc) % len(local) == 0:
            from waveunet_tpu.parallel.mesh import make_mesh
            local_eval_mesh = make_mesh(devices=local)
    for rnd, rcfg in enumerate(round_cfgs):
        if rnd == 1:
            print("Finished first round of training, entering fine-tuning stage")
        _, step_fn = make_train_step(rcfg, rcfg.init_sup_sep_lr, mesh=mesh)
        eval_step = make_eval_step(rcfg, mesh=mesh)
        epoch_fn = None
        train_it = None  # releases the old round's generator (closes over
        #                  the old sampler; the bank arrays are shared)
        # Adam slots (moments + bias-correction count) carry across the round
        # boundary AND across resume: the reference restores ALL variables —
        # including Adam m/v and beta-power accumulators — from the previous
        # epoch's checkpoint every time it rebuilds the graph
        # (`Training.py:92-96,131-137`); only the lr constant changes in
        # round 2. optax.adam state layout is lr-independent, so the same
        # opt_state threads straight into the new step_fn.

        if pod:
            # Pod data, best to worst: (1) the device-SHARDED bank — songs
            # round-robin across every mesh device, 1/n_devices of the
            # dataset per chip, sampling inside the jitted program, so the
            # zero-dispatch scanned epoch extends to pod training; (2) the
            # per-host eager bank (one host-local shard sampled on a local
            # device, global batch assembled without cross-host audio
            # traffic); (3) the host pipeline shard.
            from waveunet_tpu.data.device_cache import ShardedBank
            if bank is None and rcfg.device_data and rcfg.scan_epoch:
                try:
                    bank = D.make_sharded_bank(rcfg, "train", in_len,
                                               out_len, mesh,
                                               batch_size=rcfg.batch_size)
                    print(f"[pod {jax.process_index()}] device-sharded "
                          f"bank: {bank.local_songs} songs / "
                          f"{bank.nbytes() / 1e6:.0f} MB HBM across "
                          f"{bank.n_local_devices} local devices")
                except (FileNotFoundError, ValueError) as e:
                    print(f"pod sharded bank unavailable ({e}); "
                          f"trying per-host bank")
            if isinstance(bank, ShardedBank):
                bank.set_batch(rcfg.batch_size)
                from waveunet_tpu.train.step import make_scanned_epoch
                epoch_fn = make_scanned_epoch(
                    rcfg, rcfg.init_sup_sep_lr, rcfg.epoch_it,
                    bank.sample_raw, mesh=mesh, chunk=rcfg.scan_chunk,
                    bank_shardings=bank.shardings, presharded_batch=True)
                data_key = jax.random.PRNGKey(rcfg.seed + rnd)
            else:
                if bank is None:
                    if rcfg.device_data:
                        try:
                            bank = D.make_pod_bank(rcfg, "train", in_len,
                                                   out_len)
                            print(f"[pod {jax.process_index()}] per-host "
                                  f"bank: {bank.n_songs} songs, "
                                  f"{bank.nbytes() / 1e6:.0f} MB HBM")
                        except (FileNotFoundError, ValueError) as e:
                            print(f"pod device bank unavailable ({e}); "
                                  f"using host pipeline")
                else:
                    bank.set_batch(rcfg.batch_size // n_proc)
                if bank is not None:
                    # start = absolute step: the eager fold index matches the
                    # scanned epoch's fold_in(data_key, step) in round 2 and
                    # across resume (device_cache.DeviceBank.batches).
                    local_it = bank.batches(
                        jax.random.PRNGKey(rcfg.seed + rnd),
                        start=state.step)
                else:
                    pipe = D.make_pod_pipeline(rcfg, "train", in_len,
                                               out_len, seed=rcfg.seed + rnd)
                    local_it = pipe.prefetched(pipe.train_batches())
                train_it = (D.global_batch_from_local(mesh, lb)
                            for lb in local_it)
        else:
            if bank is None:
                bank, train_it = make_train_source(rcfg, in_len, out_len,
                                                   seed_offset=rnd)
            else:
                # Round 2+ reuses the round-1 device bank — its contents are
                # byte-identical (only batch_size/lr change); rebuilding would
                # re-upload the multi-GB int16 bank over the host link for
                # nothing (round-2 review finding).
                bank.set_batch(rcfg.batch_size)
            if bank is not None and cfg.scan_epoch:
                # Whole-epoch lax.scan over the device bank: one dispatch per
                # epoch instead of epoch_it (`make_scanned_epoch`); on a mesh
                # the in-scan batch shards over the data axis.
                from waveunet_tpu.train.step import make_scanned_epoch
                epoch_fn = make_scanned_epoch(rcfg, rcfg.init_sup_sep_lr,
                                              rcfg.epoch_it, bank.sample_raw,
                                              mesh=mesh,
                                              chunk=rcfg.scan_chunk)
                data_key = jax.random.PRNGKey(rcfg.seed + rnd)
            elif bank is not None:
                # start = absolute step, matching the scanned path's key fold
                # (a scan_epoch=0/1 toggle must not change the sample stream)
                train_it = bank.batches(jax.random.PRNGKey(rcfg.seed + rnd),
                                        start=state.step)

        # Zero-host-byte validation: the device-resident valid windows are
        # built once and re-chunked across rounds (the round-2 batch doubling
        # only changes the drop-remainder boundary, not the bank contents).
        # Pod mode builds a HOST-SHARDED eval bank (1/num_hosts of the valid
        # set per HBM) and combines per-host loss sums collectively.
        if not valid_bank_tried:
            if pod:
                if rcfg.device_data:
                    try:
                        valid_bank = D.make_pod_eval_bank(
                            rcfg, "valid", in_len, out_len,
                            batch_size=rcfg.batch_size)
                        print(f"[pod {jax.process_index()}] per-host valid "
                              f"bank: {valid_bank.n_windows} windows, "
                              f"{valid_bank.nbytes() / 1e6:.0f} MB HBM")
                    except (FileNotFoundError, ValueError) as e:
                        print(f"pod device eval bank unavailable ({e}); "
                              f"using host pipeline shard")
            else:
                valid_bank = make_eval_source(rcfg, "valid", in_len, out_len,
                                              batch_size=rcfg.batch_size)
            valid_bank_tried = True
        elif valid_bank is not None:
            # Per-host share in pod mode: make_pod_eval_bank built the bank
            # at batch_size // n_proc (the sweep runs on LOCAL devices only —
            # a global-batch sweep would put process_count x the training
            # step's per-device activation memory on each chip); the round-2
            # re-chunk must divide the same way. n_proc == 1 single-host.
            valid_bank.set_batch(rcfg.batch_size // n_proc)

        worse = 0
        epochs_this_round = 0
        while worse < rcfg.worse_epochs:
            if (max_epochs_per_round is not None
                    and epochs_this_round >= max_epochs_per_round):
                break
            print(f"EPOCH: {epoch}")
            t_ep = time.time()
            if epoch_fn is not None:
                state, train_loss = train_one_epoch_scanned(
                    rcfg, state, epoch_fn, bank, data_key, logger)
            else:
                state, train_loss = train_one_epoch(rcfg, state, step_fn,
                                                    train_it, logger)
            # EVERY process calls the orbax save: it is a collective (orbax
            # runs sync_global_processes barriers inside save()); only the
            # primary host actually writes bytes. A process-0-only call
            # deadlocks the pod on the first checkpoint. Single process, an
            # on-device snapshot decouples the state from donation and the
            # D2H fetch + disk write + prune all run in a background thread
            # — the critical path is one copy-program dispatch
            # (checkpoint.py; measured round 4, DESIGN.md §2).
            t_train = time.time()
            if pod:
                path = ckpt.save_checkpoint(cfg.model_base_dir, experiment_id,
                                            state.step, state.as_pytree())
                if is_main:
                    ckpt.prune_checkpoints(cfg.model_base_dir, experiment_id,
                                           cfg.keep_checkpoints,
                                           protect=(best_path, path))
            else:
                path = ckpt.save_checkpoint_async(
                    cfg.model_base_dir, experiment_id, state.step,
                    state.as_pytree(), prune_keep=cfg.keep_checkpoints,
                    protect=(best_path,))
            t_ckpt = time.time()
            if pod:
                if valid_bank is not None:
                    s, c = valid_bank.loss_sums(
                        D.replicated_local_view(state.params),
                        D.replicated_local_view(state.model_state),
                        mesh=local_eval_mesh)
                else:
                    s, c = _pod_host_evaluate(rcfg, state.params,
                                              state.model_state, "valid",
                                              in_len, out_len)
                curr = D.pod_weighted_mean(s, c)
            elif valid_bank is not None:
                curr = valid_bank.evaluate(state.params, state.model_state,
                                           mesh=mesh)
            else:
                valid_pipe = BatchPipeline(rcfg, "valid", in_len, out_len,
                                           seed=rcfg.seed)
                curr = evaluate(rcfg, state.params, state.model_state,
                                eval_step, valid_pipe.eval_batches())
            t_valid = time.time()
            # Per-epoch wall-clock by phase: the whole driver loop must stay
            # compute-bound — validation/checkpoint riding a slow host link
            # is the failure mode this print makes visible (round-2 review).
            print(f"epoch {epoch} wall: train {t_train - t_ep:.1f}s | "
                  f"checkpoint {t_ckpt - t_train:.1f}s | "
                  f"valid {t_valid - t_ckpt:.1f}s | "
                  f"total {t_valid - t_ep:.1f}s")
            if logger is not None:
                logger.log(state.step, valid_loss=curr,
                           epoch_wall_s=t_valid - t_ep,
                           valid_wall_s=t_valid - t_ckpt,
                           checkpoint_wall_s=t_ckpt - t_train)
            epoch += 1
            epochs_this_round += 1
            if curr < best_loss:
                print(f"Validation improved {best_loss} -> {curr}")
                best_loss, best_path, worse = curr, path, 0
                if is_main:
                    # marker for CLI/users: the current best checkpoint.
                    # Deferred behind any in-flight background write so a
                    # concurrent `checkpoint=best` reader never resolves a
                    # step dir orbax hasn't finished renaming into place.
                    marker = os.path.join(cfg.model_base_dir,
                                          str(experiment_id), "best.txt")

                    def _write_marker(marker=marker, path=path):
                        with open(marker, "w") as f:
                            f.write(path + "\n")

                    ckpt.after_saves(_write_marker)
            else:
                worse += 1
                print(f"Validation worsened to {curr}")

    print(f"TRAINING FINISHED - testing best model {best_path}")
    if pod:
        # process 0 may still be flushing the final checkpoint; every loss
        # so far came out of collectives, so all processes agree on best_path
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("waveunet_final_ckpt")
    else:
        # join the background checkpoint writer before restoring best_path
        # (and before returning it to callers who will restore it)
        ckpt.wait_for_saves()
    if best_path is not None:
        restored = ckpt.restore_checkpoint(best_path)
        params, model_state = restored["params"], restored["model_state"]
    else:
        params, model_state = state.params, state.model_state
    if pod:
        test_bank = None
        if cfg.device_data:
            try:
                test_bank = D.make_pod_eval_bank(cfg, "test", in_len, out_len,
                                                 batch_size=cfg.batch_size)
            except (FileNotFoundError, ValueError) as e:
                print(f"pod device test bank unavailable ({e}); "
                      f"using host pipeline shard")
        if test_bank is not None:
            s, c = test_bank.loss_sums(D.replicated_local_view(params),
                                       D.replicated_local_view(model_state),
                                       mesh=local_eval_mesh)
        else:
            s, c = _pod_host_evaluate(cfg, params, model_state, "test",
                                      in_len, out_len)
        test_loss = D.pod_weighted_mean(s, c)
    else:
        eval_step = make_eval_step(cfg, mesh=mesh)
        test_bank = make_eval_source(cfg, "test", in_len, out_len,
                                     batch_size=cfg.batch_size)
        if test_bank is not None:
            test_loss = test_bank.evaluate(params, model_state, mesh=mesh)
        else:
            test_pipe = BatchPipeline(cfg, "test", in_len, out_len,
                                      seed=cfg.seed)
            test_loss = evaluate(cfg, params, model_state, eval_step,
                                 test_pipe.eval_batches())
    if logger is not None:
        logger.log(state.step, test_loss=test_loss)
        logger.close()
    return best_path or "", test_loss
