"""A/B the up-path lowering candidates on the real chip.

The round-2 split probe (tools/updown_probe.py) showed the up path is ~58% of
forward compute at the tuned windows. Candidates, all bit-exact reformulations
of [learned-interp x2 -> crop_and_concat -> conv5 VALID] (context mode):

  V0 interleave: current production path (materialise the 2n-1 upsampled
     signal at cur_ch channels, concat with skip, one wide conv).
  V1 split: conv5(skip_crop) + conv5(upsampled) — isolates the channel-concat
     cost (kernel split along input channels is exact).
  V2 folddil: upsample == width-3 lhs_dilation=2 conv with taps
     [diag(w), I, diag(1-w)]; conv5 o upsample composes into ONE width-7
     lhs_dilation=2 conv over the HALF-RATE cur:
       C7[u] = Kc[u]*w + Kc[u-1] + Kc[u-2]*(1-w)   (channel-wise scale on ci)
     out = conv5(skip_crop) + conv(cur, C7, lhs_dil=2, pad=(1,1)).
  V3 polyphase: same algebra with the zero phases removed by hand — even
     output taps [C7[1],C7[3],C7[5]] (width-3 conv over cur), odd taps
     [C7[0],C7[2],C7[4],C7[6]] (width-4), interleaved at out_ch channels.

Usage: python tools/up_fold_probe.py <num_frames> <batch> [out.jsonl]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    frames, batch = int(sys.argv[1]), int(sys.argv[2])
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/up_fold_probe.jsonl"

    import jax
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from jax import lax

    from waveunet_tpu.config import get_config
    from waveunet_tpu.models.waveunet import init_waveunet
    from waveunet_tpu.ops import shapes
    from waveunet_tpu.ops.conv import conv1d
    from waveunet_tpu.ops.primitives import crop, crop_and_concat, leaky_relu
    from waveunet_tpu.ops.upsample import learned_interp_x2

    cfg = get_config("full_44KHz")
    in_len, out_len = shapes.get_padding(cfg, frames)
    sr = cfg.expected_sr
    params = init_waveunet(jax.random.PRNGKey(0), cfg)

    def conv(x, p, *, stride=1, dil=1):
        return conv1d(x, p, padding="VALID", stride=stride, rhs_dilation=dil,
                      fp32_accum=True)

    def down(p, mix):
        skips, cur = [], mix
        for i in range(cfg.num_layers):
            if i > 0:
                cur = leaky_relu(conv(cur, p[f"down_{i}"], stride=2, dil=2))
            else:
                cur = leaky_relu(conv(cur, p[f"down_{i}"]))
            skips.append(cur)
        cur = leaky_relu(conv(cur, p["bottleneck"], stride=2, dil=2))
        return tuple(skips), cur

    def raw_conv(x, kernel, *, lhs_dil=1, pad=(0, 0)):
        # [B, L, Cin] x [w, Cin, Cout], optional input dilation.
        return lax.conv_general_dilated(
            x, kernel, window_strides=(1,), padding=[pad],
            lhs_dilation=(lhs_dil,),
            dimension_numbers=("NWC", "WIO", "NWC"))

    def sig(w):
        return 1.0 / (1.0 + jnp.exp(-w))

    # -- V0: production formulation ------------------------------------------
    def up_v0(p, skips, cur):
        for i in range(cfg.num_layers):
            cur = learned_interp_x2(cur, p[f"interp_{i}"]["weights"], True)
            cur = crop_and_concat(skips[-i - 1], cur)
            cur = leaky_relu(conv(cur, p[f"up_{i}"]))
        return cur

    # -- V1: split the concat into two convs ---------------------------------
    def up_v1(p, skips, cur):
        for i in range(cfg.num_layers):
            skip = skips[-i - 1]
            y = learned_interp_x2(cur, p[f"interp_{i}"]["weights"], True)
            K = p[f"up_{i}"]["kernel"]
            sc = skip.shape[2]
            s = crop(skip, y.shape[1])
            out = (raw_conv(s, K[:, :sc]) + raw_conv(y, K[:, sc:])
                   + p[f"up_{i}"]["bias"])
            cur = leaky_relu(out)
        return cur

    def composed7(Kc, w):
        # C7[u] = Kc[u]*w + Kc[u-1] + Kc[u-2]*(1-w), Kc out-of-range = 0.
        wcol = w[:, None]
        taps = []
        for u in range(7):
            t = jnp.zeros_like(Kc[0])
            if u <= 4:
                t = t + Kc[u] * wcol
            if 0 <= u - 1 <= 4:
                t = t + Kc[u - 1]
            if 0 <= u - 2 <= 4:
                t = t + Kc[u - 2] * (1.0 - wcol)
            taps.append(t)
        return jnp.stack(taps)

    # -- V2: fold upsample into one width-7 lhs-dilated conv -----------------
    def up_v2(p, skips, cur):
        for i in range(cfg.num_layers):
            skip = skips[-i - 1]
            n = cur.shape[1]
            K = p[f"up_{i}"]["kernel"]
            sc = skip.shape[2]
            w = sig(p[f"interp_{i}"]["weights"]).astype(cur.dtype)
            C7 = composed7(K[:, sc:], w)
            s = crop(skip, 2 * n - 1)
            out = (raw_conv(s, K[:, :sc]) +
                   raw_conv(cur, C7, lhs_dil=2, pad=(1, 1)) +
                   p[f"up_{i}"]["bias"])
            cur = leaky_relu(out)
        return cur

    def _interleave2(a, b):
        # a: [B, m, C] (even out positions), b: [B, m-1, C] -> [B, 2m-1, C]
        bpad = jnp.concatenate([b, jnp.zeros_like(b[:, :1])], axis=1)
        out = jnp.stack([a, bpad], axis=2).reshape(
            a.shape[0], 2 * a.shape[1], a.shape[2])
        return out[:, :-1]

    # -- V3: polyphase (no lhs dilation, interleave at out_ch) ---------------
    def up_v3(p, skips, cur):
        for i in range(cfg.num_layers):
            skip = skips[-i - 1]
            n = cur.shape[1]
            K = p[f"up_{i}"]["kernel"]
            sc = skip.shape[2]
            w = sig(p[f"interp_{i}"]["weights"]).astype(cur.dtype)
            C7 = composed7(K[:, sc:], w)
            even = raw_conv(cur, C7[1::2])          # width 3 -> n-2
            odd = raw_conv(cur, C7[0::2])           # width 4 -> n-3
            y = _interleave2(even, odd)             # 2n-5
            s = crop(skip, 2 * n - 1)
            out = raw_conv(s, K[:, :sc]) + y + p[f"up_{i}"]["bias"]
            cur = leaky_relu(out)
        return cur

    down_j = jax.jit(down)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, in_len, cfg.num_channels)).astype(np.float32))
    skips, cur = jax.block_until_ready(down_j(params, x))

    fns = {"v0_interleave": jax.jit(up_v0), "v1_split": jax.jit(up_v1),
           "v2_folddil": jax.jit(up_v2), "v3_polyphase": jax.jit(up_v3)}

    want = jax.block_until_ready(fns["v0_interleave"](params, skips, cur))
    rec = {"frames": frames, "batch": batch,
           "platform": jax.devices()[0].platform}
    for name, fn in fns.items():
        got = jax.block_until_ready(fn(params, skips, cur))
        err = float(jnp.max(jnp.abs(got - want)))
        assert err <= 0.02, (name, err)
        best = None
        jax.block_until_ready(fn(params, skips, cur))
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(params, skips, cur) for _ in range(8)]
            jax.block_until_ready(outs[-1])
            dt = (time.perf_counter() - t0) / 8
            best = dt if best is None else min(best, dt)
        rec[name + "_ms"] = round(best * 1e3, 3)
        rec[name + "_err"] = round(err, 6)
    print(json.dumps(rec))
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
