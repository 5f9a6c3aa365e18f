"""Benchmark the im2col [C, L] Pallas conv kernel vs XLA on the real chip.

Production shapes: the full_44KHz down path (12 layers, widths 15, Cin
2..264 doubling batch halving length). Whole-graph timings, pipelined
dispatches (best-of), matching tools/perf_probe.py discipline.

Usage: python tools/pallas_im2col_bench.py [out.jsonl]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args):
    jax = sys.modules["jax"]
    jax.block_until_ready(fn(*args))  # compile
    best = None
    K = 8
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(K)]
        jax.block_until_ready(outs[-1])
        dt = (time.perf_counter() - t0) / K
        best = dt if best is None else min(best, dt)
    return best


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pallas_im2col.jsonl"
    import jax
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    import jax.numpy as jnp
    from waveunet_tpu.ops.pallas.conv1d_im2col import conv1d_lrelu_im2col
    from waveunet_tpu.config import get_config
    from waveunet_tpu.ops import shapes

    cfg = get_config("full_44KHz")
    in_len, _ = shapes.get_padding(cfg, cfg.num_frames)
    B = 16
    rng = np.random.default_rng(0)

    # Single-layer head-to-head on every down-path shape.
    dn = jax.lax.conv_dimension_numbers((1, 1, 1), (1, 1, 1),
                                        ("NWC", "WIO", "NWC"))

    def xla_layer(x_lc, w, b):
        y = jax.lax.conv_general_dilated(
            x_lc, w, (1,), "VALID", dimension_numbers=dn,
            preferred_element_type=jnp.float32) + b
        return jnp.maximum(0.2 * y, y)

    xla_jit = jax.jit(xla_layer)
    results = []
    L = in_len
    cin = cfg.num_channels
    for i in range(cfg.num_layers):
        cout = cfg.num_initial_filters * (i + 1)
        w = (0.1 * rng.standard_normal((cfg.filter_size, cin, cout))
             ).astype(np.float32)
        b = (0.1 * rng.standard_normal(cout)).astype(np.float32)
        x_lc = jnp.asarray(rng.standard_normal((B, L, cin)).astype(np.float32))
        x_cl = jnp.transpose(x_lc, (0, 2, 1))
        wj, bj = jnp.asarray(w), jnp.asarray(b)

        t_xla = timeit(xla_jit, x_lc, wj, bj)
        try:
            t_pl = timeit(conv1d_lrelu_im2col, x_cl, wj, bj)
            err = float(jnp.max(jnp.abs(
                jnp.transpose(conv1d_lrelu_im2col(x_cl, wj, bj), (0, 2, 1))
                - xla_jit(x_lc, wj, bj))))
        except Exception as e:
            t_pl, err = None, None
            results.append({"layer": i, "L": L, "cin": cin, "cout": cout,
                            "xla_ms": round(t_xla * 1e3, 3),
                            "pallas_error": str(e)[-300:]})
            print(results[-1])
            L = (L - cfg.filter_size + 1 - 1) // 2 + 1
            cin = cout
            continue
        rec = {"layer": i, "L": L, "cin": cin, "cout": cout,
               "xla_ms": round(t_xla * 1e3, 3),
               "pallas_ms": round(t_pl * 1e3, 3),
               "speedup": round(t_xla / t_pl, 3),
               "max_err": err}
        results.append(rec)
        print(rec, flush=True)
        L = (L - cfg.filter_size + 1 - 1) // 2 + 1
        cin = cout

    with open(out_path, "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
