"""Full-forward A/B of conv lowerings at production window sizes.

Variants (applied to the down path only, which probe2 showed dominates):
  native     : production path (lax.conv, decimate as strided slice)
  stack<K>   : first K down convs as stacked-shift matmul (probe2: 2x on the
               c_in=2 first conv in isolation)
  dilate     : decimation folded into the NEXT conv as stride-2 + dilation-2
               (no strided-slice materialisation anywhere in the down path)

Usage: python tools/conv_cliff_probe3.py <frames> <batch> [out.jsonl]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    frames = int(sys.argv[1])
    batch = int(sys.argv[2])
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
    from waveunet_tpu.ops.primitives import crop, crop_and_concat, leaky_relu
    from waveunet_tpu.ops.upsample import learned_interp_x2

    cfg = get_config("full_44KHz")
    in_len, out_len = shapes.get_padding(cfg, frames)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    sr = cfg.expected_sr

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

    recs = []

    def emit(**kw):
        rec = {"frames": frames, "batch": batch, **kw}
        recs.append(rec)
        print(json.dumps(rec), flush=True)

    def stack_conv(x, p):
        k, b = p["kernel"], p["bias"]
        w, c_in, c_out = k.shape
        L = x.shape[1] - w + 1
        cols = jnp.concatenate(
            [jax.lax.slice_in_dim(x, t, t + L, axis=1) for t in range(w)],
            axis=-1)
        y = jnp.einsum("blc,co->blo", cols, k.reshape(w * c_in, c_out),
                       preferred_element_type=jnp.float32)
        return y + b

    _dn = jax.lax.conv_dimension_numbers((1, 1, 1), (1, 1, 1),
                                         ("NWC", "WIO", "NWC"))

    def dilated_conv(x, p, stride, dil):
        y = jax.lax.conv_general_dilated(
            x, p["kernel"], window_strides=(stride,), padding="VALID",
            rhs_dilation=(dil,), dimension_numbers=_dn,
            preferred_element_type=jnp.float32)
        return y + p["bias"]

    def forward(params, mix, mode, stack_k=0):
        """Down path variants; up path/outputs identical to production."""
        skips = []
        cur = mix
        if mode == "dilate":
            # layer i consumes the full-rate output of layer i-1 with
            # stride 2^1? No: each layer's INPUT is the previous decimated
            # output; chaining dilations compounds. Instead: keep the
            # full-rate conv output for the skip, and give the next conv
            # stride-2 dilation-2 over it (== conv over x[::2]).
            for i in range(cfg.num_layers):
                p = params[f"down_{i}"]
                if i == 0:
                    y = leaky_relu(dilated_conv(cur, p, 1, 1))
                else:
                    y = leaky_relu(dilated_conv(cur, p, 2, 2))
                skips.append(y)
                cur = y
            cur = dilated_conv(cur, params["bottleneck"], 2, 2)
            cur = leaky_relu(cur)
        else:
            for i in range(cfg.num_layers):
                p = params[f"down_{i}"]
                f = stack_conv if (mode == "stack" and i < stack_k) else (
                    lambda x, pp: conv1d(x, pp, padding="VALID"))
                cur = leaky_relu(f(cur, p))
                skips.append(cur)
                cur = cur[:, ::2, :]
            cur = leaky_relu(conv1d(cur, params["bottleneck"],
                                    padding="VALID"))

        for i in range(cfg.num_layers):
            cur = learned_interp_x2(cur, params[f"interp_{i}"]["weights"],
                                    True)
            cur = crop_and_concat(skips[-i - 1], cur)
            cur = leaky_relu(conv1d(cur, params[f"up_{i}"], padding="VALID"))
        cur = crop_and_concat(mix, cur)
        out = {}
        acc = None
        for name in cfg.source_names[:-1]:
            y = conv1d(cur, params[f"out_{name}"], padding="VALID")
            y = jnp.clip(y, -1, 1)
            out[name] = y
            acc = y if acc is None else acc + y
        out[cfg.source_names[-1]] = jnp.clip(crop(mix, acc.shape[1]) - acc,
                                             -1, 1)
        return out

    x = jnp.asarray(rng.standard_normal(
        (batch, in_len, cfg.num_channels)).astype(np.float32))

    # production baseline via apply_waveunet
    base = jax.jit(lambda p, x: apply_waveunet(p, cfg, x, training=False))
    dt = timed(base, params, x)
    emit(probe="fwd_production", ms=round(dt * 1e3, 2),
         audio_s_per_s=round(batch * out_len / sr / dt, 1))

    for stack_k in (1, 2, 4, 12):
        f = jax.jit(lambda p, x, k=stack_k: forward(p, x, "stack", k))
        dt = timed(f, params, x)
        emit(probe=f"fwd_stack{stack_k}", ms=round(dt * 1e3, 2),
             audio_s_per_s=round(batch * out_len / sr / dt, 1))

    fd = jax.jit(lambda p, x: forward(p, x, "dilate"))
    dt = timed(fd, params, x)
    emit(probe="fwd_dilate", ms=round(dt * 1e3, 2),
         audio_s_per_s=round(batch * out_len / sr / dt, 1))
    # dilate-variant parity vs production (same math, different lowering)
    ref = base(params, x)
    got = fd(params, x)
    err = max(float(jnp.max(jnp.abs(ref[k] - got[k]))) for k in ref)
    emit(probe="fwd_dilate_max_err", ms=err)

    with open(out_path, "a") as f:
        for rec in recs:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
