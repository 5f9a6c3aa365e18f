"""Device mesh construction and sharding helpers.

The reference is single-process single-GPU (SURVEY.md §C22/C23: no NCCL/MPI, the
only parallelism is host preprocessing forks). Here parallelism is first-class:

  * a 1-D ``data`` mesh carries batch (training) or window (inference)
    parallelism across TPU chips over ICI;
  * params/optimizer state are replicated, batches sharded on the leading axis;
  * XLA inserts ``psum`` gradient all-reduces from sharding annotations;
  * multi-host pods use ``jax.distributed`` + per-host data sharding
    (``BatchPipeline(host_id, num_hosts)``).

Model/tensor parallelism is deliberately out of scope at 10.2M params — the whole
parameter set fits comfortably in a single core's HBM and is bandwidth-trivial to
replicate (documented in SURVEY.md §C22).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Tuple[str, ...] = ("data",),
              devices=None) -> Mesh:
    """Build a mesh over the available devices. shape=(-1,) uses all of them."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None or tuple(shape) == (-1,):
        shape = (n,)
    shape = tuple(int(s) if s != -1 else n // int(np.prod(
        [x for x in shape if x != -1]) or 1) for s in shape)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Shard the leading (batch/window) axis across every mesh axis."""
    return NamedSharding(mesh, P(mesh.axis_names, *([None] * (ndim - 1))))


def put_replicated(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def put_batch_sharded(x, mesh: Mesh):
    return jax.device_put(x, batch_sharded(mesh, getattr(x, "ndim", 3)))
