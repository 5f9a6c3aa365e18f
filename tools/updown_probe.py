"""Split the Wave-U-Net forward into down/bottleneck vs up/output subgraphs
and time each on the real chip, to locate the remaining compute after the
round-2 dilated-decimation lowering fixed the down path.

The split is probe-local (mirrors models/waveunet.py apply_waveunet with
decimate_lowering="dilate"); the probe FIRST asserts that down+up composed
matches the production forward bit-for-bit, so any drift from the model code
fails loudly instead of timing the wrong graph.

Usage:
  python tools/updown_probe.py <num_frames> <batch> [out.jsonl]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    frames, batch = int(sys.argv[1]), int(sys.argv[2])
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/updown_probe.jsonl"

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
    from waveunet_tpu.ops.primitives import audio_clip, crop, crop_and_concat, leaky_relu
    from waveunet_tpu.ops.upsample import learned_interp_x2

    cfg = get_config("full_44KHz")
    assert cfg.context and cfg.decimate_lowering == "dilate"
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

    def up(p, skips, cur, mix):
        for i in range(cfg.num_layers):
            cur = learned_interp_x2(cur, p[f"interp_{i}"]["weights"], True)
            cur = crop_and_concat(skips[-i - 1], cur)
            cur = leaky_relu(conv(cur, p[f"up_{i}"]))
        cur = crop_and_concat(mix, cur)
        out, acc = {}, None
        for name in cfg.source_names[:-1]:
            y = jnp.tanh(conv(cur, p[f"out_{name}"]))
            out[name] = y
            acc = y if acc is None else acc + y
        out[cfg.source_names[-1]] = audio_clip(crop(mix, acc.shape[1]) - acc,
                                               False)
        return out

    full = jax.jit(lambda p, x: apply_waveunet(p, cfg, x, training=False))
    down_j = jax.jit(down)
    up_j = jax.jit(up)

    def down_sum(p, mix):
        # scalar-checksum output so 8 pipelined timing dispatches don't retain
        # ~3.6 GB of skip tensors each (HBM OOM); all convs still computed.
        skips, cur = down(p, mix)
        return sum(jnp.sum(s) for s in skips) + jnp.sum(cur)

    down_sum_j = jax.jit(down_sum)

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, in_len, cfg.num_channels)).astype(np.float32))
    x = jax.device_put(x)

    # Parity gate: composed must equal production forward.
    skips, cur = jax.block_until_ready(down_j(params, x))
    got = jax.block_until_ready(up_j(params, skips, cur, x))
    want = jax.block_until_ready(full(params, x))
    # Tolerance: structural drift gives O(1) errors on these tanh-bounded
    # outputs; TPU fp32 (MXU-emulated) reassociates differently between the
    # two compilations, measured ~3e-3 worst-case through 25 layers.
    max_err = 0.0
    for k in want:
        err = float(jnp.max(jnp.abs(got[k] - want[k])))
        max_err = max(max_err, err)
        assert err <= 0.02, (k, err)

    def timed(fn, *args, K=8):
        jax.block_until_ready(fn(*args))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(K)]
            jax.block_until_ready(outs[-1])
            dt = (time.perf_counter() - t0) / K
            best = dt if best is None else min(best, dt)
        return best * 1e3

    rec = {
        "frames": frames, "batch": batch, "in_len": in_len,
        "out_len": out_len,
        "platform": jax.devices()[0].platform,
        "compose_max_err": round(max_err, 6),
        "full_ms": round(timed(full, params, x), 3),
        "down_ms": round(timed(down_sum_j, params, x), 3),
        "up_ms": round(timed(up_j, params, skips, cur, x), 3),
    }
    rec["audio_s_per_s"] = round(batch * out_len / sr / (rec["full_ms"] / 1e3),
                                 1)
    print(json.dumps(rec))
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
