"""Pallas TPU kernel: fused valid conv1d + bias + LeakyReLU.

The Wave-U-Net hot op is a width-K 1-D convolution over [B, L, C] followed by
LeakyReLU (`/root/reference/Models/UnetAudioSeparator.py:98,123`). Expressed as
a tap-accumulation of K shifted matmuls

    y[b, t, :] = leaky_relu( sum_k x[b, t+k, :] @ W[k] + bias )

each tap is an MXU matmul of shape [TILE_L, Cin] x [Cin, Cout], accumulated in
fp32; the bias + activation fuse into the epilogue so the full-length
pre-activation never round-trips HBM.

Grid: (B, L_out / TILE_L). Input windows overlap by a K-1 halo, which blocked
BlockSpec striding cannot express — the time dimension uses ``pl.Element``
(element-offset) indexing instead, so program (bi, ti) sees rows
[ti*TILE_L, ti*TILE_L + TILE_L + K - 1). Tap shifts are *value-level* slices
(lane dim untouched), sidestepping Mosaic's 128-lane memref-slice alignment
rule. The filter [K, Cin, Cout] and bias ride in VMEM via broadcast specs
(largest real case ≈ 5 MB, well within VMEM next to the tiles).

Benchmarked head-to-head against XLA's native conv lowering (tests/test_pallas.py
has the correctness gate); the model uses whichever `use_pallas` selects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, o_ref, *, taps: int, alpha: float,
            tile_l: int):
    xv = x_ref[0]  # [tile_l + taps - 1, Cin]
    acc = jnp.dot(xv[0:tile_l, :], w_ref[0],
                  preferred_element_type=jnp.float32)
    for k in range(1, taps):
        acc += jnp.dot(xv[k:k + tile_l, :], w_ref[k],
                       preferred_element_type=jnp.float32)
    y = acc + b_ref[0, :]
    o_ref[0] = jnp.maximum(alpha * y, y).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("alpha", "tile_l", "interpret"))
def conv1d_lrelu_pallas(x, w, b, alpha: float = 0.2, tile_l: int = 512,
                        interpret: bool = False):
    """Fused valid conv1d + LeakyReLU. x [B, L, Cin], w [K, Cin, Cout], b [Cout].

    Returns [B, L - K + 1, Cout]. The final partial tile is handled by padding
    the input and trimming the output.
    """
    B, L, Cin = x.shape
    K, _, Cout = w.shape
    L_out = L - K + 1
    assert L_out >= 1, "input shorter than filter"
    assert tile_l % 8 == 0, "tile_l must be sublane-aligned"
    n_tiles = -(-L_out // tile_l)
    # Mosaic wants the block's time dim divisible by 8: round the K-1 halo up
    # (the kernel simply never reads the extra rows).
    halo = -(-(K - 1) // 8) * 8
    target_len = n_tiles * tile_l + halo
    if target_len > L:
        x = jnp.pad(x, ((0, 0), (0, target_len - L), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, taps=K, alpha=alpha, tile_l=tile_l),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(tile_l + halo),
                          pl.Element(Cin)),
                         lambda bi, ti: (bi, ti * tile_l, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Cin, Cout), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_l, Cout), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * tile_l, Cout), x.dtype),
        interpret=interpret,
    )(x, w, b.reshape(1, -1))
    return out[:, :L_out, :]
