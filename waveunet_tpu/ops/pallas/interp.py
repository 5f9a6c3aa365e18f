"""Pallas TPU kernel: learned x2 interpolation (interleaved write).

Implements the reference's learned upsampling (`InterpolationLayer.py:4-40`) as
a single bandwidth-optimal pass: read x once, write the 2x-interleaved output

    out[2i]   = x[i]
    out[2i+1] = sigmoid(w) * x[i] + (1 - sigmoid(w)) * x[i+1]

instead of the reference's 2FxF diag-matmul + transpose + gather chain. The
interleave is expressed as a [TILE, 2, C] store (reshaped view of the output
tile), which keeps the lane dimension (C) contiguous.

Forward only; the op is closed under jnp (stack/reshape) for autodiff, so the
training path uses `waveunet_tpu.ops.upsample.learned_interp_x2` and this
kernel serves inference (`use_pallas=True`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, o_ref, *, tile: int):
    xv = x_ref[0]  # [tile + 8, C] (halo rounded to sublane alignment)
    w = jax.nn.sigmoid(w_ref[0, :])
    cur = xv[:tile, :]
    nxt = xv[1:tile + 1, :]
    mids = w * cur + (1.0 - w) * nxt
    # interleave: [tile, 2, C] -> write as one [2*tile, C] tile; cast back
    # (sigmoid promotes bf16 inputs to fp32 and the store dtype must match)
    o_ref[0] = jnp.stack([cur, mids], axis=1).reshape(2 * tile, -1).astype(
        o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("context", "tile", "interpret"))
def learned_interp_pallas(x, weights, context: bool, tile: int = 512,
                          interpret: bool = False):
    """x [B, n, C], weights [C] -> [B, 2n-1, C] (context) / [B, 2n, C].

    The tail elements (last original sample; the `sigmoid(w) * x[-1]` final
    interpolant in same-padding mode) are appended outside the kernel.
    """
    B, n, C = x.shape
    assert tile % 8 == 0
    n_in = n - 1  # pairs
    n_tiles = max(1, -(-n_in // tile))
    target = n_tiles * tile + 8  # +1 halo rounded to sublane alignment
    xp = jnp.pad(x, ((0, 0), (0, target - n), (0, 0))) if target > n else x

    out = pl.pallas_call(
        functools.partial(_kernel, tile=tile),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(tile + 8), pl.Element(C)),
                         lambda bi, ti: (bi, ti * tile, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * tile, C), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2 * n_tiles * tile, C), x.dtype),
        interpret=interpret,
    )(xp, weights.reshape(1, -1))

    body = out[:, :2 * n_in, :]
    if context:
        return jnp.concatenate([body, x[:, -1:, :]], axis=1)
    w = jax.nn.sigmoid(weights).reshape(1, 1, -1).astype(x.dtype)
    last_pair = jnp.concatenate([x[:, -1:, :], w * x[:, -1:, :]], axis=1)
    return jnp.concatenate([body, last_pair], axis=1)
