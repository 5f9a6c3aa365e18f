"""Real-chip performance probes: window-size compute roof, bf16, train step.

Each invocation measures ONE configuration (so a crash/timeout loses nothing)
and appends a JSON line to the output file. Timings follow the repo's bench
discipline: whole jitted graphs only, warm-up dispatch first, best-of-N
(the axon tunnel has +-30-50% contention noise; device-bound timings use
block_until_ready on device-resident inputs so the tunnel is excluded).

Usage:
  python tools/perf_probe.py roof  <num_frames> <batch> <fp32|bf16> [out.jsonl]
  python tools/perf_probe.py e2e   <num_frames> <batch> <fp32|bf16> [out.jsonl]
  python tools/perf_probe.py resident <num_frames> <batch> <fp32|bf16> [out.jsonl]
  python tools/perf_probe.py train <num_frames> <batch> <fp32|bf16> [out.jsonl]
  python tools/perf_probe.py scan  <num_frames> <batch> <fp32|bf16> [out.jsonl]
  python tools/perf_probe.py podscan <num_frames> <batch> <fp32|bf16> [out.jsonl]

The `roof` mode times the bare jitted forward (no transfers): the number the
inference engine approaches when the host link is not the bottleneck
(attached-TPU production). `e2e` times Separator.separate on a 60 s song
including the tunnel. `train` times the donated-buffer train step.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mode, frames, batch, dtype = (sys.argv[1], int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    out_path = sys.argv[5] if len(sys.argv) > 5 else "/tmp/perf_probe.jsonl"

    import jax
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from tools.benchutil import (best_pipelined, best_pipelined_s,
                                 make_bench_song)
    from waveunet_tpu.config import get_config
    from waveunet_tpu.models.waveunet import apply_waveunet, init_waveunet
    from waveunet_tpu.ops import shapes

    # dtype arg accepts an optional lowering suffix, e.g. "fp32-slice"
    dtype, _, lowering = dtype.partition("-")
    compute_dtype = "bfloat16" if dtype == "bf16" else "float32"
    cfg = get_config("full_44KHz", compute_dtype=compute_dtype,
                     decimate_lowering=lowering or "dilate")
    in_len, out_len = shapes.get_padding(cfg, frames)
    sr = cfg.expected_sr
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    rec = {"mode": mode, "frames": frames, "in_len": in_len,
           "out_len": out_len, "batch": batch, "dtype": dtype,
           "lowering": cfg.decimate_lowering,
           "platform": jax.devices()[0].platform}

    if mode == "roof":
        # checksum-scalar output + value-fetch sync: the axon client's
        # block_until_ready has been observed returning without syncing
        # (bench.py has the same guard); a scalar D2H cannot lie.
        fwd = jax.jit(lambda p, x: sum(
            jnp.sum(v)
            for v in apply_waveunet(p, cfg, x, training=False).values()))
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (batch, in_len, cfg.num_channels)).astype(np.float32))
        x = jax.device_put(x)
        t0 = time.perf_counter()
        float(fwd(params, x))
        rec["first_call_s"] = round(time.perf_counter() - t0, 3)
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            float(fwd(params, x))
            times.append(time.perf_counter() - t0)
        best = min(times)
        rec["forward_ms"] = round(best * 1e3, 3)
        # pipelined: K async dispatches, one final sync — amortises the
        # ~6-8 ms per-dispatch tunnel latency the engine also hides
        best_p, k = best_pipelined(lambda: fwd(params, x))
        rec["pipeline_k"] = k
        rec["forward_pipelined_ms"] = round(best_p * 1e3, 3)
        rec["audio_s_per_s"] = round(batch * out_len / sr / best_p, 1)
        rec["context_overlap"] = round(in_len / out_len, 3)

    elif mode == "e2e":
        from waveunet_tpu.infer.engine import Separator
        icfg = cfg.replace(infer_num_frames=frames, infer_batch=batch,
                           infer_wire_dtype="int16")
        sep = Separator(icfg, params)
        seconds = 60.0
        song = make_bench_song(sr, seconds)
        t0 = time.perf_counter()
        sep.separate(song, sr)
        rec["first_call_s"] = round(time.perf_counter() - t0, 3)
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            sep.separate(song, sr)
            times.append(time.perf_counter() - t0)
        best = min(times)
        rec["e2e_s"] = round(best, 4)
        rec["rtf"] = round(seconds / best, 1)

    elif mode == "resident":
        # Tunnel-independent engine number at this (window, batch): the full
        # resident sweep (bench.py's engine_device_resident path) on the
        # 60 s bench song. Unlike e2e, the window choice here is NOT about
        # H2D pipelining — bigger windows cut the valid-conv context overlap
        # per audio-second, so the roof-optimal window should win.
        from waveunet_tpu.infer.engine import Separator
        from waveunet_tpu.runtime import native
        icfg = cfg.replace(infer_num_frames=frames, infer_batch=batch,
                           infer_wire_dtype="int16")
        sep = Separator(icfg, params)
        seconds = 60.0
        n = int(seconds * sr)
        song = make_bench_song(sr, seconds)
        res_fn, positions = sep.resident_sweep(n)
        song_dev = jax.device_put(jnp.asarray(native.quantize_int16(
            np.pad(song, [(sep.pad, sep.pad), (0, 0)]))))
        t0 = time.perf_counter()
        _, cs = res_fn(params, song_dev)
        float(cs)
        rec["first_call_s"] = round(time.perf_counter() - t0, 3)
        rec["n_windows"] = int(positions.shape[0])
        rec["sweep_in_len"] = sep.in_len
        rec["sweep_out_len"] = sep.out_len
        best, k = best_pipelined(lambda: res_fn(params, song_dev)[1])
        rec["pipeline_k"] = k
        rec["sweep_s"] = round(best, 4)
        rec["audio_s_per_s"] = round(seconds / best, 1)

    elif mode == "train":
        from waveunet_tpu.train.step import make_train_step
        tcfg = cfg.replace(num_frames=frames, batch_size=batch)
        t_in, t_out = shapes.get_padding(tcfg, frames)
        init_opt, step = make_train_step(tcfg, 1e-4)
        opt_state = init_opt(params)
        rng = np.random.default_rng(0)
        batch_d = {s: jnp.asarray(rng.standard_normal(
            (batch, t_out, tcfg.num_channels)).astype(np.float32) * 0.2)
            for s in tcfg.source_names}
        batch_d["mix"] = jnp.asarray(rng.standard_normal(
            (batch, t_in, tcfg.num_channels)).astype(np.float32) * 0.2)
        key = jax.random.PRNGKey(0)
        mstate = {}

        def run_once(p, ms, os_):
            p, ms, os_, loss = step(p, ms, os_, batch_d, key)
            float(loss)  # value fetch = real sync (block_until_ready hazard)
            return p, ms, os_

        t0 = time.perf_counter()
        params, mstate, opt_state = run_once(params, mstate, opt_state)
        rec["first_call_s"] = round(time.perf_counter() - t0, 3)
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            params, mstate, opt_state = run_once(params, mstate, opt_state)
            times.append(time.perf_counter() - t0)
        rec["step_ms"] = round(min(times) * 1e3, 3)
        rec["steps_per_s"] = round(1.0 / min(times), 2)

    elif mode == "scan":
        # Scanned-epoch steady state: lax.scan over (bank sample -> step),
        # synthetic device bank, N_STEPS per dispatch (train/loop.py default
        # path). steps/s here is what a real epoch(2000) runs at.
        from waveunet_tpu.train.step import make_scanned_epoch, make_train_step
        tcfg = cfg.replace(num_frames=frames, batch_size=batch)
        t_in, t_out = shapes.get_padding(tcfg, frames)
        S = tcfg.num_sources
        rng = np.random.default_rng(0)
        bank = jnp.asarray((np.clip(rng.standard_normal(
            (S, 8 * t_in, tcfg.num_channels)) * 0.1, -1, 1)
            * 32767).astype(np.int16))
        starts = jnp.asarray(np.array([0, 4 * t_in], np.int32))
        valids = jnp.asarray(np.array([3 * t_in, 3 * t_in], np.int32))

        def sample_fn(bk, st, va, key):
            k1, k2 = jax.random.split(key)
            song = jax.random.randint(k1, (batch,), 0, st.shape[0])
            frac = jax.random.uniform(k2, (batch,))
            pos = st[song] + (frac * va[song].astype(jnp.float32)
                              ).astype(jnp.int32)
            wins = jax.vmap(lambda p: jax.lax.dynamic_slice(
                bk, (0, p, 0), (S, t_in, tcfg.num_channels)))(pos)
            wins = wins.astype(jnp.float32) / 32767.0
            pad = (t_in - t_out) // 2
            tgt = wins[:, :, pad:pad + t_out, :]
            b = {n: tgt[:, i] for i, n in enumerate(tcfg.source_names)}
            b["mix"] = jnp.sum(wins, axis=1)
            return b

        n_steps = int(os.environ.get("SCAN_STEPS", "50"))
        # SCAN_CHUNK=0 (default) = one program; the axon worker crashes on
        # single ~66 s programs, so pass SCAN_CHUNK=250 for long scans.
        chunk = int(os.environ.get("SCAN_CHUNK", "0")) or None
        epoch_fn = make_scanned_epoch(tcfg, 1e-4, n_steps, sample_fn,
                                      chunk=chunk)
        init_opt, _ = make_train_step(tcfg, 1e-4)
        opt_state = init_opt(params)
        mstate = {}

        def run(p, ms, os_):
            p, ms, os_, losses = epoch_fn(p, ms, os_, bank, starts, valids,
                                          jax.random.PRNGKey(1),
                                          jax.random.PRNGKey(2), 0)
            # value fetch, not block_until_ready: the axon client's
            # block_until_ready intermittently returns without syncing
            # (CLAUDE.md); a scalar D2H of the last loss cannot lie.
            float(losses[-1])
            return p, ms, os_

        t0 = time.perf_counter()
        params, mstate, opt_state = run(params, mstate, opt_state)
        rec["first_call_s"] = round(time.perf_counter() - t0, 3)
        times = []
        for _ in range(int(os.environ.get("SCAN_REPEATS", "4"))):
            t0 = time.perf_counter()
            params, mstate, opt_state = run(params, mstate, opt_state)
            times.append(time.perf_counter() - t0)
        rec["scan_steps"] = n_steps
        if times:
            rec["scan_step_ms"] = round(min(times) / n_steps * 1e3, 3)
            rec["steps_per_s"] = round(n_steps / min(times), 2)
        else:
            # SCAN_REPEATS=0: only the cold call ran — that includes the
            # (multi-minute) compile, so recording it as a warm per-step
            # figure would be wildly wrong. Leave the warm fields out.
            rec["scan_step_ms"] = rec["steps_per_s"] = None

    elif mode == "podscan":
        # The POD form of the scanned epoch on the attached chip(s): the
        # device-SHARDED bank's shard_map sampler inside the whole-epoch
        # lax.scan (optimise()'s multi-host default, train/loop.py). On one
        # chip the mesh is size 1 — this isolates the shard_map + global-
        # array overhead vs plain `scan` mode (same synthetic songs/shapes),
        # i.e. what extending zero-dispatch training to pods costs per step.
        from waveunet_tpu.data.device_cache import ShardedBank
        from waveunet_tpu.parallel.mesh import make_mesh
        from waveunet_tpu.train.step import make_scanned_epoch, make_train_step
        tcfg = cfg.replace(num_frames=frames, batch_size=batch)
        t_in, t_out = shapes.get_padding(tcfg, frames)
        mesh = make_mesh()
        rec["mesh_devices"] = mesh.size
        rng = np.random.default_rng(0)
        tracks = []
        for i in range(max(2 * mesh.size, 2)):
            n = 4 * t_in + 37 * i
            t = {s: (0.1 * rng.standard_normal((n, tcfg.num_channels))
                     ).astype(np.float32) for s in tcfg.source_names}
            t["mix"] = np.zeros((n, tcfg.num_channels), np.float32)
            tracks.append(t)
        sbank = ShardedBank.from_tracks(tcfg, t_in, t_out, mesh, tracks,
                                        batch_size=batch)
        n_steps = int(os.environ.get("SCAN_STEPS", "50"))
        chunk = int(os.environ.get("SCAN_CHUNK", "0")) or None
        epoch_fn = make_scanned_epoch(tcfg, 1e-4, n_steps, sbank.sample_raw,
                                      mesh=mesh, chunk=chunk,
                                      bank_shardings=sbank.shardings,
                                      presharded_batch=True)
        init_opt, _ = make_train_step(tcfg, 1e-4, mesh=mesh)
        opt_state = init_opt(params)
        mstate = {}

        def run(p, ms, os_):
            p, ms, os_, losses = epoch_fn(p, ms, os_, *sbank.arrays,
                                          jax.random.PRNGKey(1),
                                          jax.random.PRNGKey(2), 0)
            float(losses[-1])  # value fetch = real sync (CLAUDE.md hazard)
            return p, ms, os_

        t0 = time.perf_counter()
        params, mstate, opt_state = run(params, mstate, opt_state)
        rec["first_call_s"] = round(time.perf_counter() - t0, 3)
        times = []
        for _ in range(int(os.environ.get("SCAN_REPEATS", "4"))):
            t0 = time.perf_counter()
            params, mstate, opt_state = run(params, mstate, opt_state)
            times.append(time.perf_counter() - t0)
        rec["scan_steps"] = n_steps
        if times:
            rec["scan_step_ms"] = round(min(times) / n_steps * 1e3, 3)
            rec["steps_per_s"] = round(n_steps / min(times), 2)
        else:
            rec["scan_step_ms"] = rec["steps_per_s"] = None
    else:
        raise SystemExit(f"unknown mode {mode}")

    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
