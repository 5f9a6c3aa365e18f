"""Probe the XLA long-window conv cliff (DESIGN.md §1: 262144-frame windows
anti-scale — device ms/call jumps from 23 ms at 131072@B8 to 53+ ms at
262144@B2-4, i.e. >2x the time for ~1.9x the samples *plus* a worse
context-overlap ratio, so throughput drops 1035 -> 447 audio-s/s).

This measures WHERE the time goes (down-path prefixes) and A/B-tests
alternative lowerings of the early low-channel convs:

  native : jax.lax.conv_general_dilated (the production path)
  stack  : im2col-by-shifted-slices -> one [B*L, W*Cin] x [W*Cin, Cout]
           matmul (XLA fuses the slice-stack into the GEMM input)

Usage: python tools/conv_cliff_probe.py [frames batch] [out.jsonl]
Appends one JSON line per measurement. Timings: warm-up, then best-of-N
pipelined (K async dispatches / one sync) on device-resident inputs.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, K=6, reps=3):
    jax_block(fn(*args))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(K)]
        jax_block(outs[-1])
        dt = (time.perf_counter() - t0) / K
        best = dt if best is None else min(best, dt)
    return best


def jax_block(x):
    import jax
    jax.block_until_ready(x)


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/conv_cliff.jsonl"

    import jax
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from waveunet_tpu.config import get_config
    from waveunet_tpu.models.waveunet import apply_waveunet, init_waveunet
    from waveunet_tpu.ops import shapes
    from waveunet_tpu.ops.conv import conv1d

    cfg = get_config("full_44KHz")
    in_len, out_len = shapes.get_padding(cfg, frames)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    recs = []

    def emit(**kw):
        rec = {"frames": frames, "batch": batch, **kw}
        recs.append(rec)
        print(json.dumps(rec))

    # 1) whole forward
    fwd = jax.jit(lambda p, x: apply_waveunet(p, cfg, x, training=False))
    x = jnp.asarray(rng.standard_normal(
        (batch, in_len, cfg.num_channels)).astype(np.float32))
    dt = timed(fwd, params, x)
    emit(probe="full_forward", ms=round(dt * 1e3, 2),
         audio_s_per_s=round(batch * out_len / cfg.expected_sr / dt, 1))

    # 2) down-path prefixes: first k (conv+lrelu+decimate) blocks
    def make_prefix(k):
        def f(p, x):
            cur = x
            for i in range(k):
                y = conv1d(cur, p[f"down_{i}"], padding="VALID")
                cur = jnp.where(y >= 0, y, 0.2 * y)[:, ::2, :]
            return cur
        return jax.jit(f)

    for k in (1, 2, 3, 4, 6, 12):
        dt = timed(make_prefix(k), params, x)
        emit(probe=f"down_prefix_{k}", ms=round(dt * 1e3, 2))

    # 3) single first conv: native vs stacked-shift matmul
    W = cfg.filter_size
    c_in, c_out = cfg.num_channels, cfg.num_initial_filters
    kern = params["down_0"]["kernel"]
    bias = params["down_0"]["bias"]

    native = jax.jit(lambda x, k, b: conv1d(
        x, {"kernel": k, "bias": b}, padding="VALID"))
    dt = timed(native, x, kern, bias)
    emit(probe="conv0_native", ms=round(dt * 1e3, 2))

    def stack_conv(x, k, b):
        L = x.shape[1] - W + 1
        cols = jnp.concatenate(
            [jax.lax.slice_in_dim(x, t, t + L, axis=1) for t in range(W)],
            axis=-1)  # [B, L, W*Cin] (shift-major to match kernel reshape)
        kmat = k.reshape(W * c_in, c_out)
        y = jnp.einsum("blc,co->blo", cols, kmat,
                       preferred_element_type=jnp.float32)
        return y + b

    stack = jax.jit(stack_conv)
    dt = timed(stack, x, kern, bias)
    emit(probe="conv0_stack_matmul", ms=round(dt * 1e3, 2))
    # parity
    a = np.asarray(native(x[:1, :1 << 14], kern, bias))
    bee = np.asarray(stack(x[:1, :1 << 14], kern, bias))
    emit(probe="conv0_stack_parity_max_err",
         ms=float(np.abs(a - bee).max()))

    # 4) reshape-to-2D lowering: [B, L, C] -> [B, L/R, R, C], conv over the
    #    folded dim with halo rows. Width-15 valid conv needs 14 halo samples.
    def fold_conv(x, k, b, R=1024):
        B, Lin, C = x.shape
        L = Lin - W + 1
        nrow = -(-L // R)
        need = nrow * R + W - 1
        xp = jnp.pad(x, [(0, 0), (0, need - Lin), (0, 0)])
        rows = jax.vmap(lambda r: jax.lax.dynamic_slice(
            xp, (0, r * R, 0), (B, R + W - 1, C)), out_axes=1)(
                jnp.arange(nrow))  # [B, nrow, R+W-1, C]
        y = jax.lax.conv_general_dilated(
            rows.reshape(B * nrow, R + W - 1, C), k, (1,), "VALID",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                (1, 1, 1), (1, 1, 1), ("NWC", "WIO", "NWC")),
            preferred_element_type=jnp.float32)
        return (y + b).reshape(B, nrow * R, c_out)[:, :L]

    fold = jax.jit(fold_conv)
    dt = timed(fold, x, kern, bias)
    emit(probe="conv0_fold2d", ms=round(dt * 1e3, 2))
    a = np.asarray(native(x[:1, :1 << 14], kern, bias))
    bee = np.asarray(fold(x[:1, :1 << 14], kern, bias))
    emit(probe="conv0_fold2d_parity_max_err", ms=float(np.abs(a - bee).max()))

    with open(out_path, "a") as f:
        for rec in recs:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
