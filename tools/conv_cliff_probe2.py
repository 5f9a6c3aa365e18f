"""Follow-up to conv_cliff_probe: isolate the conv epilogue pathology and
A/B the stacked-shift matmul lowering per layer / per window size.

Usage: python tools/conv_cliff_probe2.py [frames batch] [out.jsonl]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    from waveunet_tpu.models.waveunet import init_waveunet
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
        print(json.dumps(rec), flush=True)

    def timed(fn, *args, K=6, reps=3):
        jax.block_until_ready(fn(*args))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(K)]
            jax.block_until_ready(outs[-1])
            dt = (time.perf_counter() - t0) / K
            best = dt if best is None else min(best, dt)
        return best

    W = cfg.filter_size

    def stack_conv(x, k, b):
        w, c_in, c_out = k.shape
        L = x.shape[1] - w + 1
        cols = jnp.concatenate(
            [jax.lax.slice_in_dim(x, t, t + L, axis=1) for t in range(w)],
            axis=-1)
        kmat = k.reshape(w * c_in, c_out)
        y = jnp.einsum("blc,co->blo", cols, kmat,
                       preferred_element_type=jnp.float32)
        return y + b

    def lrelu(y):
        return jnp.where(y >= 0, y, 0.2 * y)

    kern, bias = params["down_0"]["kernel"], params["down_0"]["bias"]
    x = jnp.asarray(rng.standard_normal(
        (batch, in_len, cfg.num_channels)).astype(np.float32))

    variants = {
        "native": lambda x, k, b: conv1d(
            x, {"kernel": k, "bias": b}, padding="VALID"),
        "stack": stack_conv,
    }
    for vn, vf in variants.items():
        emit(probe=f"conv0_{vn}_plain",
             ms=round(timed(jax.jit(vf), x, kern, bias) * 1e3, 2))
        emit(probe=f"conv0_{vn}_lrelu",
             ms=round(timed(jax.jit(
                 lambda x, k, b: lrelu(vf(x, k, b))), x, kern, bias) * 1e3, 2))
        emit(probe=f"conv0_{vn}_lrelu_dec",
             ms=round(timed(jax.jit(
                 lambda x, k, b: lrelu(vf(x, k, b))[:, ::2, :]),
                 x, kern, bias) * 1e3, 2))

    # Per-layer A/B down the first 6 levels (realistic shapes: halved length,
    # growing channels).
    cur_len = in_len
    c_in = cfg.num_channels
    for i in range(6):
        c_out = cfg.num_initial_filters * (i + 1)
        kp = params[f"down_{i}"]
        xi = jnp.asarray(rng.standard_normal(
            (batch, cur_len, c_in)).astype(np.float32))
        tn = timed(jax.jit(lambda x, k, b: lrelu(conv1d(
            x, {"kernel": k, "bias": b}, padding="VALID"))[:, ::2, :]),
            xi, kp["kernel"], kp["bias"])
        ts = timed(jax.jit(lambda x, k, b: lrelu(
            stack_conv(x, k, b))[:, ::2, :]), xi, kp["kernel"], kp["bias"])
        emit(probe=f"layer{i}_native_ms", ms=round(tn * 1e3, 2),
             stack_ms=round(ts * 1e3, 2), L=cur_len, c_in=c_in, c_out=c_out)
        cur_len = (cur_len - W + 1 - 1) // 2 + 1
        c_in = c_out

    with open(out_path, "a") as f:
        for rec in recs:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
