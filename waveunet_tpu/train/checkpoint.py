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
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _ckptr():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(base_dir: str, experiment_id: str, step: int, state) -> str:
    """Write state pytree to <base_dir>/<experiment_id>/step_<step>; returns path."""
    path = os.path.abspath(os.path.join(base_dir, str(experiment_id),
                                        f"step_{step:010d}"))
    state = jax.device_get(state)
    _ckptr().save(path, state, force=True)
    return path


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
    steps = sorted(f for f in os.listdir(d) if f.startswith("step_"))
    for f in steps[:-keep]:
        path = os.path.abspath(os.path.join(d, f))
        if path in protected:
            continue
        shutil.rmtree(path, ignore_errors=True)


def latest_checkpoint(base_dir: str, experiment_id: str) -> Optional[str]:
    d = os.path.join(base_dir, str(experiment_id))
    if not os.path.isdir(d):
        return None
    steps = [f for f in os.listdir(d) if f.startswith("step_")]
    if not steps:
        return None
    return os.path.join(d, max(steps))
