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


def make_pod_bank(cfg: Config, partition: str, input_len: int,
                  output_len: int, batch_size: Optional[int] = None):
    """Per-host device-resident bank: this host's disjoint song subset in its
    own HBM, sampling its rows of the global batch (zero host audio bytes per
    step — the pod-scale form of the single-host DeviceBank)."""
    from waveunet_tpu.data.device_cache import DeviceBank

    n_proc = jax.process_count()
    global_batch = batch_size or cfg.batch_size
    per_host_batch = global_batch // n_proc
    if per_host_batch * n_proc != global_batch:
        raise ValueError("batch_size must divide evenly across hosts")
    return DeviceBank(cfg, partition, input_len, output_len,
                      batch_size=per_host_batch,
                      max_bytes=cfg.device_data_max_bytes,
                      host_id=jax.process_index(), num_hosts=n_proc)


def make_sharded_bank(cfg: Config, partition: str, input_len: int,
                      output_len: int, mesh: jax.sharding.Mesh,
                      batch_size: Optional[int] = None):
    """Device-sharded training bank over the GLOBAL mesh: songs round-robin
    across every device (1/n_devices of the dataset per chip), sampling as a
    shard_map program composable inside the scanned epoch — pod training's
    zero-per-step-dispatch data source (see
    :class:`~waveunet_tpu.data.device_cache.ShardedBank`). Collective
    construction: call on every process. Raises ValueError when the mesh has
    more devices than usable songs or the batch does not divide."""
    from waveunet_tpu.data.device_cache import ShardedBank

    return ShardedBank(cfg, partition, input_len, output_len, mesh,
                       batch_size=batch_size or cfg.batch_size,
                       max_bytes=cfg.device_data_max_bytes)


def make_pod_eval_bank(cfg: Config, partition: str, input_len: int,
                       output_len: int, batch_size: Optional[int] = None):
    """Per-host device-resident eval bank: this host's disjoint song subset
    (1/num_hosts of the partition per HBM, mirroring :func:`make_pod_bank`);
    combine each host's ``loss_sums`` with :func:`pod_weighted_mean`.

    The default batch is the per-host share of the global batch (as in
    :func:`make_pod_bank`): the sweep runs on LOCAL devices only, so a
    global-batch sweep would put ``process_count``x the training step's
    per-device activation memory on each chip — validation must never OOM
    a configuration whose training step fits."""
    from waveunet_tpu.data.device_cache import EvalBank

    n_proc = jax.process_count()
    global_batch = batch_size or cfg.batch_size
    per_host_batch = global_batch // n_proc
    if per_host_batch * n_proc != global_batch:
        raise ValueError("batch_size must divide evenly across hosts")
    return EvalBank(cfg, partition, input_len, output_len,
                    batch_size=per_host_batch,
                    max_bytes=cfg.device_data_max_bytes,
                    host_id=jax.process_index(),
                    num_hosts=n_proc)


def replicated_local_view(tree):
    """Host-local single-device view of fully-replicated global arrays.

    Pod validation runs on each host's LOCAL devices only (the data is
    host-sharded; a global-mesh eval would impose the equal-batch-count
    deadlock constraint) — but the train step's params are global arrays a
    local jit cannot consume. Every process holds a full replica, so the
    local view is a zero-copy handle to this host's shard 0."""
    def f(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x.addressable_data(0)
        return x
    return jax.tree.map(f, tree)


def pod_weighted_mean(local_sum: float, local_count: int) -> float:
    """Global mean of per-batch losses from per-host (sum, count) pairs.

    A FIXED-SHAPE host-level allgather: every process contributes exactly one
    [2] vector per call, so hosts with differently-sized (even empty) eval
    shards compose safely — the cross-host coupling that previously forced
    every pod process to stream the FULL partition (equal batch counts or
    collective deadlock) is gone. All hosts return the identical value, so
    early-stop decisions stay SPMD-consistent."""
    from jax.experimental import multihost_utils

    # Wire the f64 (sum, count) pair as its uint32 bit pattern: EvalBank
    # deliberately accumulates loss sums in float64, and allgathering
    # float64 directly would silently downcast to f32 under jax's default
    # x64-disabled mode (thousands of batches -> ~1e-4 relative rounding
    # noise in the validation mean that can flip adjacent-epoch early-stop
    # comparisons).
    payload = np.asarray([local_sum, local_count],
                         np.float64).view(np.uint32)
    arr = np.asarray(multihost_utils.process_allgather(payload))
    arr = arr.reshape(-1, 4).view(np.float64).reshape(-1, 2)
    total, count = arr[:, 0].sum(), arr[:, 1].sum()
    if count == 0:
        print("WARNING: evaluation produced no batches; returning inf")
        return float("inf")
    return float(total / count)


def global_batch_from_local(mesh: jax.sharding.Mesh, local_batch: dict):
    """Assemble the globally-sharded batch arrays from this host's shard.

    Device-resident local arrays (a pod bank's sampled batch) are split
    across this host's addressable mesh devices WITHOUT a host round-trip
    (``make_array_from_single_device_arrays``); numpy shards take the
    host-upload path (``make_array_from_process_local_data``).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(mesh.axis_names, None, None))
    n_proc = jax.process_count()
    pid = jax.process_index()
    out = {}
    for k, v in local_batch.items():
        if isinstance(v, jax.Array):
            global_shape = (v.shape[0] * n_proc,) + v.shape[1:]
            local_rows = slice(pid * v.shape[0], (pid + 1) * v.shape[0])
            shards = []
            for dev, idx in sharding.devices_indices_map(global_shape).items():
                if dev.process_index != pid:
                    continue
                r = idx[0]
                if not (local_rows.start <= r.start
                        and r.stop <= local_rows.stop):
                    # mesh lays this host's rows non-contiguously; fall back
                    # to the host path rather than mis-assemble
                    shards = None
                    break
                shards.append(jax.device_put(
                    v[r.start - local_rows.start:r.stop - local_rows.start],
                    dev))
            if shards is not None:
                out[k] = jax.make_array_from_single_device_arrays(
                    global_shape, sharding, shards)
                continue
            v = np.asarray(v)
        out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out
