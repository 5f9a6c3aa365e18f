"""Worker process for the 2-process multi-host test (tests/test_parallel.py).

Each invocation is one "host" of a 2-host CPU pod: it initialises
``jax.distributed`` (gloo CPU collectives), builds its per-host pipeline shard
via :func:`waveunet_tpu.parallel.distributed.make_pod_pipeline`, assembles the
global batch with :func:`global_batch_from_local`, and runs one sharded eval
step over the cross-process mesh. Prints one JSON line with the results.

argv: <process_id> <num_processes> <port> <overrides_json>
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

# The axon plugin ignores JAX_PLATFORMS env; only the config call sticks.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    overrides = json.loads(sys.argv[4])
    preset = overrides.pop("preset", "baseline")

    from waveunet_tpu.config import get_config
    from waveunet_tpu.models.waveunet import init_waveunet
    from waveunet_tpu.ops import shapes
    from waveunet_tpu.parallel import distributed as D
    from waveunet_tpu.parallel.mesh import make_mesh
    from waveunet_tpu.train.step import make_eval_step

    got = D.initialize(coordinator_address=f"127.0.0.1:{port}",
                       num_processes=nproc, process_id=pid)
    assert got == pid, (got, pid)
    assert jax.process_count() == nproc, jax.process_count()

    cfg = get_config(preset, **overrides)
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)

    sl = D.local_batch_slice(cfg.batch_size)
    pipe = D.make_pod_pipeline(cfg, "valid", in_len, out_len, seed=0)
    local = next(pipe.eval_batches())

    mesh = make_mesh()
    glob = D.global_batch_from_local(mesh, local)
    assert glob["mix"].shape[0] == cfg.batch_size

    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    ev = make_eval_step(cfg, mesh=mesh)
    loss = float(ev(params, {}, glob))

    # Full sharded TRAIN step across processes: the gradient all-reduce rides
    # the cross-process collective backend (gloo here, ICI/DCN on pods).
    from waveunet_tpu.train.step import make_train_step
    init_opt, step = make_train_step(cfg, 1e-4, mesh=mesh)
    p2, _, _, train_loss = step(params, {}, init_opt(params), glob,
                                jax.random.PRNGKey(0))
    # every host must hold identical replicated params after the update
    param_digest = float(sum(
        np.abs(np.asarray(v)).sum()
        for v in jax.tree_util.tree_leaves(p2)))

    # Device-SHARDED bank + whole-epoch lax.scan across processes: the pod
    # form of the zero-dispatch scanned epoch. Every process builds the same
    # synthetic song list; construction round-robins songs across the global
    # mesh (each process uploads only its local devices' shards), then a
    # 3-step scanned epoch must produce the SAME losses as the eager
    # sample+step loop over the same shard_map sampler — and identical
    # values on every host (all outputs are replicated collectives).
    from waveunet_tpu.data.device_cache import ShardedBank
    from waveunet_tpu.train.step import make_scanned_epoch

    # (the earlier train step donated `params`: re-init a fresh tree)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    tracks = []
    for i in range(jax.device_count()):
        n = in_len + 300 + 41 * i
        t = {s: (0.2 * rng.standard_normal((n, cfg.num_channels))
                 ).astype(np.float32) for s in cfg.source_names}
        t["mix"] = np.zeros((n, cfg.num_channels), np.float32)
        tracks.append(t)
    sbank = ShardedBank.from_tracks(cfg, in_len, out_len, mesh, tracks,
                                    batch_size=cfg.batch_size)
    kd, ks = jax.random.PRNGKey(5), jax.random.PRNGKey(6)
    copy = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x + 0, t)
    eager_p, eager_o = copy(params), init_opt(copy(params))
    eager_losses = []
    for i in range(3):
        b = sbank._sample(*sbank.arrays, jax.random.fold_in(kd, i))
        eager_p, _, eager_o, el = step(eager_p, {}, eager_o, b,
                                       jax.random.fold_in(ks, i))
        eager_losses.append(float(el))
    epoch_fn = make_scanned_epoch(cfg, 1e-4, 3, sbank.sample_raw, mesh=mesh,
                                  bank_shardings=sbank.shardings,
                                  presharded_batch=True)
    _, _, _, scanned = epoch_fn(copy(params), {}, init_opt(copy(params)),
                                *sbank.arrays, kd, ks, 0)
    scanned_losses = [float(x) for x in np.asarray(scanned)]

    print(json.dumps({
        "pid": pid,
        "procs": jax.process_count(),
        "devices": jax.device_count(),
        "local_rows": int(local["mix"].shape[0]),
        "slice": [sl.start, sl.stop],
        "digest": float(np.abs(local["mix"]).sum()),
        "loss": loss,
        "train_loss": float(train_loss),
        "param_digest": param_digest,
        "sharded_local_songs": sbank.local_songs,
        "eager_losses": eager_losses,
        "scanned_losses": scanned_losses,
    }), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
