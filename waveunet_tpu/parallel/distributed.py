"""Multi-host (pod) initialisation and host-sharded data feeding.

The reference has no distributed backend at all (SURVEY.md §C23). On TPU pods,
coordination is ``jax.distributed`` over DCN while all tensor traffic rides ICI
via XLA collectives — nothing NCCL/MPI-like to manage by hand. This module is
the thin glue:

  * :func:`initialize` — bring up ``jax.distributed`` from standard TPU env
    vars (no-op on a single host),
  * :func:`local_batch_slice` — which rows of the global batch this host feeds,
  * :func:`make_pod_pipeline` — a BatchPipeline that reads a disjoint song
    subset per host and emits this host's shard of the global batch; combined
    with ``jax.make_array_from_process_local_data`` the global array is
    assembled without any cross-host copies of audio.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import numpy as np

from waveunet_tpu.config import Config
from waveunet_tpu.data.pipeline import BatchPipeline


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> int:
    """Initialise jax.distributed when running multi-host; returns process id.

    With no arguments, jax autodetects the TPU pod environment
    (megascale/GCE metadata). Safe to call on a single host.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return jax.process_index()


def local_batch_slice(global_batch: int) -> slice:
    """Rows of the global batch owned by this host (even split)."""
    n_proc = jax.process_count()
    if global_batch % n_proc:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n_proc} hosts")
    per = global_batch // n_proc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def make_pod_pipeline(cfg: Config, partition: str, input_len: int,
                      output_len: int, seed: int = 0) -> BatchPipeline:
    """Per-host pipeline: disjoint song subset, per-host batch shard."""
    n_proc = jax.process_count()
    per_host_batch = cfg.batch_size // n_proc
    if per_host_batch * n_proc != cfg.batch_size:
        raise ValueError("batch_size must divide evenly across hosts")
    return BatchPipeline(cfg, partition, input_len, output_len,
                         batch_size=per_host_batch,
                         host_id=jax.process_index(), num_hosts=n_proc,
                         seed=seed)


def global_batch_from_local(mesh: jax.sharding.Mesh, local_batch: dict):
    """Assemble the globally-sharded batch arrays from this host's shard."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(mesh.axis_names, None, None))
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in local_batch.items()
    }
