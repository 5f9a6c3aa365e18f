"""Pallas TPU kernel experiment: single-matmul im2col conv1d in [C, L] layout.

Round-1's tap-accumulation kernel (conv1d_fused.py) loses to XLA because each
of its K matmuls contracts over a tiny Cin (2..288) — the MXU runs
latency-bound per tap. The im2col formulation contracts over K*Cin (30..4320)
in ONE matmul per tile, but in the natural [L, C] layout building the
[tile, K*Cin] patch matrix needs a *lane*-dim concat of shifted slices, which
Mosaic rejects ("result/input offset mismatch on non-concat dimension").

This variant pre-transposes to [C, L] (channels on sublanes, time on lanes):

    rhs  = concat_k( x[:, k : k+tile] , axis=0 )   # [K*Cin, tile]  (SUBLANE concat)
    y    = W2 @ rhs + bias                          # [Cout, tile]  (one MXU matmul)

with W2[o, k*Cin + c] = w[k, c, o]. The shifted slices are value-level lane
slices of one haloed load; the concat now rides the sublane dim, which Mosaic
accepts. LeakyReLU fuses into the epilogue.

Measured results live in KERNELS.md; correctness is pinned in
tests/test_pallas.py against the jnp oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, o_ref, *, taps: int, alpha: float,
            tile_l: int):
    xv = x_ref[0]  # [Cin, tile_l + halo]
    rhs = jnp.concatenate([xv[:, k:k + tile_l] for k in range(taps)], axis=0)
    acc = jnp.dot(w_ref[...], rhs, preferred_element_type=jnp.float32)
    y = acc + b_ref[...]
    o_ref[0] = jnp.maximum(alpha * y, y).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("alpha", "tile_l", "interpret"))
def conv1d_lrelu_im2col(x, w, b, alpha: float = 0.2, tile_l: int = 512,
                        interpret: bool = False):
    """Fused valid conv1d + LeakyReLU, channel-major.

    x [B, Cin, L], w [K, Cin, Cout], b [Cout] -> [B, Cout, L - K + 1].
    """
    B, Cin, L = x.shape
    K, _, Cout = w.shape
    L_out = L - K + 1
    assert L_out >= 1, "input shorter than filter"
    assert tile_l % 128 == 0, "tile_l must be lane-aligned"
    n_tiles = -(-L_out // tile_l)
    # lane-dim block sizes must stay 128-aligned: round the K-1 halo up
    halo = -(-(K - 1) // 128) * 128
    target_len = n_tiles * tile_l + halo
    if target_len > L:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, target_len - L)))

    # W2[o, k*Cin + c] = w[k, c, o]
    w2 = jnp.transpose(w, (2, 0, 1)).reshape(Cout, K * Cin)

    out = pl.pallas_call(
        functools.partial(_kernel, taps=K, alpha=alpha, tile_l=tile_l),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(Cin),
                          pl.Element(tile_l + halo)),
                         lambda bi, ti: (bi, 0, ti * tile_l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, K * Cin), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Cout, tile_l), lambda bi, ti: (bi, 0, ti),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Cout, n_tiles * tile_l), x.dtype),
        interpret=interpret,
    )(x, w2, b.reshape(-1, 1))
    return out[:, :, :L_out]
