"""Checkpoint save/restore (Orbax) — replaces TF Saver V2.

Reference behavior (`/root/reference/Training.py:92-98,113`): save the full
variable set (params + optimiser slots + global_step) after every epoch under
``checkpoints/<experiment_id>/``, restore by path for resume/eval/predict.
Here the train state pytree {params, opt_state, step} goes through
``orbax.checkpoint`` (async-capable, multi-host-safe); `latest_checkpoint`
resolves the newest step like TF's checkpoint protocol did.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

_STEP_DIR = re.compile(r"^step_\d+$")


def _is_step_dir(name: str) -> bool:
    """Exactly ``step_<digits>`` — a crashed orbax save leaves
    ``step_X.orbax-checkpoint-tmp-<ts>`` siblings that must never be resumed
    from or counted by the retention policy (round-2 review finding)."""
    return bool(_STEP_DIR.fullmatch(name))


def _ckptr():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(base_dir: str, experiment_id: str, step: int, state) -> str:
    """Write state pytree to <base_dir>/<experiment_id>/step_<step>; returns
    path. Orbax saves are collective: in a pod EVERY process calls this and
    gets the same path back."""
    path = os.path.abspath(os.path.join(base_dir, str(experiment_id),
                                        f"step_{step:010d}"))
    state = jax.device_get(state)
    _ckptr().save(path, state, force=True)
    return path


# -- background checkpoint writes (single-process only) ----------------------
# Measured on the tunnel-attached v5e (round 4): the per-epoch orbax save
# costs 4-10 s against a 16.6 s scanned train epoch. Donation makes the state
# fetch time-critical: the next epoch's step CONSUMES the device buffers, so
# the bytes must leave them before it runs. Instead of a blocking host fetch,
# an on-device SNAPSHOT (one jitted tree-copy program, ~ms to dispatch,
# executed in device order before any later donated step touches the
# buffers) decouples the state from donation; the D2H fetch, the orbax
# tmp-dir write + atomic rename, and the retention prune all run in one
# background worker while the next epoch trains. Pods keep the synchronous
# collective save: orbax save() barriers across processes, and driving that
# barrier from a side thread while the main thread issues training
# collectives on the same coordination service can interleave/deadlock.

_save_pool = None
_pending: list = []
_MAX_IN_FLIGHT = 2  # bounds host+HBM copies of the state and error latency


@jax.jit
def _copy_leaves(xs):
    import jax.numpy as jnp
    return [jnp.copy(x) for x in xs]


def _device_snapshot(state):
    """One-dispatch on-device copy of every jax.Array leaf (non-jax leaves
    pass through). jit without donation guarantees the outputs are FRESH
    buffers — the snapshot survives the next train step's donation."""
    leaves, treedef = jax.tree.flatten(state)
    dev_idx = [i for i, x in enumerate(leaves) if isinstance(x, jax.Array)]
    if not dev_idx:
        return state
    copies = _copy_leaves([leaves[i] for i in dev_idx])
    for i, c in zip(dev_idx, copies):
        leaves[i] = c
    return jax.tree.unflatten(treedef, leaves)


def save_checkpoint_async(base_dir: str, experiment_id: str, step: int,
                          state, prune_keep: int = 0, protect=()) -> str:
    """Snapshot ``state`` on-device NOW (donation-safe: the copy program
    executes before the caller's next donated step reuses the buffers), then
    fetch + write the checkpoint — and apply the retention policy — in a
    background thread. Returns the final path immediately;
    ``wait_for_saves()`` joins + re-raises write errors and MUST run before
    restoring any path this returned. At most ``_MAX_IN_FLIGHT`` writes are
    outstanding (the single worker keeps step dirs appearing in order)."""
    from concurrent.futures import ThreadPoolExecutor

    global _save_pool
    path = os.path.abspath(os.path.join(base_dir, str(experiment_id),
                                        f"step_{step:010d}"))
    # Bounded overlap: re-raises earlier write failures within two epochs and
    # caps snapshot HBM + host state copies. The wait must precede the
    # snapshot dispatch (nothing donating runs in between, so this is equally
    # donation-safe) or a slow writer transiently holds _MAX_IN_FLIGHT+1
    # snapshots in HBM.
    while len(_pending) >= _MAX_IN_FLIGHT:
        _pending.pop(0).result()
    snap = _device_snapshot(state)
    if _save_pool is None:
        _save_pool = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="ckpt-write")

    def _write():
        host_state = jax.device_get(snap)
        _ckptr().save(path, host_state, force=True)
        if prune_keep > 0:
            prune_checkpoints(base_dir, experiment_id, prune_keep,
                              protect=tuple(protect) + (path,))

    _pending.append(_save_pool.submit(_write))
    return path


def wait_for_saves() -> None:
    """Block until every background checkpoint write has landed; re-raises
    the first write error. Call before restoring a just-saved path and at
    the end of training."""
    while _pending:
        _pending.pop(0).result()


def after_saves(fn) -> None:
    """Run ``fn()`` strictly AFTER every currently-pending background write
    has landed, without blocking the caller (the single writer thread
    executes queued work in order). Use for side effects that must observe a
    fully-written checkpoint — e.g. a best-model marker file must never name
    a step directory whose orbax write is still in flight, or a concurrent
    ``checkpoint=best`` reader sees a dangling path. Runs inline when no
    write is pending."""
    if _save_pool is None or not _pending:
        fn()
    else:
        _pending.append(_save_pool.submit(fn))


def restore_checkpoint(path: str, like: Optional[Any] = None):
    """Restore a state pytree from an exact checkpoint path."""
    path = os.path.abspath(path)
    if like is not None:
        return _ckptr().restore(path, item=like)
    return _ckptr().restore(path)


def prune_checkpoints(base_dir: str, experiment_id: str, keep: int,
                      protect=()) -> None:
    """Keep only the newest ``keep`` step checkpoints (0 = keep all, the
    reference's behavior); paths in ``protect`` (e.g. the best model) are
    never removed."""
    if keep <= 0:
        return
    import shutil

    d = os.path.join(base_dir, str(experiment_id))
    if not os.path.isdir(d):
        return
    protected = {os.path.abspath(p) for p in protect if p}
    steps = sorted(f for f in os.listdir(d) if _is_step_dir(f))
    for f in steps[:-keep]:
        path = os.path.abspath(os.path.join(d, f))
        if path in protected:
            continue
        shutil.rmtree(path, ignore_errors=True)


def latest_checkpoint(base_dir: str, experiment_id: str) -> Optional[str]:
    d = os.path.join(base_dir, str(experiment_id))
    if not os.path.isdir(d):
        return None
    steps = [f for f in os.listdir(d) if _is_step_dir(f)]
    if not steps:
        return None
    return os.path.join(d, max(steps))
