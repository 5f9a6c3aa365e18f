"""Convolution wrappers and parameter initialisation.

Thin, layout-explicit wrappers around ``jax.lax`` convolutions. On TPU these lower
straight onto the MXU (1-D convs become implicit matmuls over the channel dims);
elementwise activations fuse into the conv epilogue, so the reference's
conv -> LeakyReLU -> decimate chain (`/root/reference/Models/UnetAudioSeparator.py:98-100`)
needs no hand scheduling in the common case (a Pallas variant lives in
``waveunet_tpu.ops.pallas`` for the cases where it wins).

Layouts match TF so converted reference checkpoints drop straight in:
  conv1d kernel:  [width, in_ch, out_ch]   (tf.layers.conv1d)
  conv2d kernel:  [h, w, in_ch, out_ch]    (tf.layers.conv2d)
  conv2d_transpose kernel: [h, w, out_ch, in_ch] (tf.layers.conv2d_transpose)

Initialisation replicates TF1 defaults: glorot-uniform kernels, zero biases.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_DN_1D = jax.lax.conv_dimension_numbers((1, 1, 1), (1, 1, 1), ("NWC", "WIO", "NWC"))
_DN_2D = jax.lax.conv_dimension_numbers(
    (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def glorot_uniform(rng, shape, dtype=jnp.float32):
    """TF-default glorot_uniform: fan_in/fan_out over the last two dims, scaled by
    receptive field size — identical to ``tf.glorot_uniform_initializer``."""
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_in = shape[-2] * receptive
    fan_out = shape[-1] * receptive
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(rng, shape, dtype, minval=-limit, maxval=limit)


def conv1d_init(rng, width: int, in_ch: int, out_ch: int, dtype=jnp.float32):
    return {
        "kernel": glorot_uniform(rng, (width, in_ch, out_ch), dtype),
        "bias": jnp.zeros((out_ch,), dtype),
    }


def conv2d_init(rng, hw: Tuple[int, int], in_ch: int, out_ch: int,
                dtype=jnp.float32, transpose: bool = False):
    shape = (hw[0], hw[1], out_ch, in_ch) if transpose else (hw[0], hw[1], in_ch, out_ch)
    return {
        "kernel": glorot_uniform(rng, shape, dtype),
        "bias": jnp.zeros((out_ch,), dtype),
    }


# Config.conv_precision string -> lax.Precision (None defers to JAX's
# ambient default, i.e. jax.default_matmul_precision scopes still apply).
PRECISION = {None: None,
             "default": jax.lax.Precision.DEFAULT,
             "high": jax.lax.Precision.HIGH,
             "highest": jax.lax.Precision.HIGHEST}


def conv1d(x, params, *, padding="VALID", stride: int = 1,
           rhs_dilation: int = 1, compute_dtype=None, fp32_accum: bool = True,
           precision=None):
    """1-D convolution over [B, W, C] with a TF-layout kernel [w, in, out].

    ``padding`` is "VALID"/"SAME" or an explicit ``[(lo, hi)]`` pair (used by
    the dilated decimation lowering in ``models/waveunet.py``).

    ``compute_dtype`` casts inputs/kernel (e.g. bfloat16 for the MXU).
    ``fp32_accum`` accumulates in float32 via ``preferred_element_type`` —
    correct for inference, but its conv transpose rule rejects the fp32
    cotangent against a bf16 kernel, so differentiated (training) calls must
    pass ``fp32_accum=False`` (the conv then runs fully in ``compute_dtype``,
    which is what production bf16 training does anyway).

    ``precision`` is a ``jax.lax.Precision`` (or None = JAX default): the MXU
    is a bf16 unit, and for fp32 operands this selects the 1/3/6-pass bf16
    emulation (DEFAULT/HIGH/HIGHEST)."""
    k, b = params["kernel"], params["bias"]
    in_dtype = x.dtype
    pet = jnp.float32 if fp32_accum else None
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        k = k.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(stride,), padding=padding,
        rhs_dilation=(rhs_dilation,), dimension_numbers=_DN_1D,
        preferred_element_type=pet, precision=precision)
    y = y.astype(jnp.float32) + b.astype(jnp.float32)
    return y.astype(in_dtype)


def conv2d(x, params, *, stride: Tuple[int, int] = (1, 1), padding: str = "SAME",
           compute_dtype=None, precision=None):
    """2-D convolution over [B, H, W, C] with TF-layout kernel [h, w, in, out]."""
    k, b = params["kernel"], params["bias"]
    in_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        k = k.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=stride, padding=padding,
        dimension_numbers=_DN_2D, preferred_element_type=jnp.float32,
        precision=precision)
    y = y + b.astype(y.dtype)
    return y.astype(in_dtype)


def conv2d_transpose(x, params, *, stride: Tuple[int, int] = (2, 2),
                     padding: str = "SAME", compute_dtype=None,
                     precision=None):
    """2-D transposed convolution matching ``tf.layers.conv2d_transpose``.

    TF defines conv-transpose as the gradient of the forward conv, with kernel
    layout [h, w, out_ch, in_ch]; ``transpose_kernel=True`` reproduces that
    (spatially flipped kernel, swapped I/O dims).
    """
    k, b = params["kernel"], params["bias"]
    in_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        k = k.astype(compute_dtype)
    # TF kernel layout is [h, w, out, in]; with transpose_kernel=True jax swaps
    # the I/O axes itself, so label the dims "HWIO" (I at the out_ch position).
    y = jax.lax.conv_transpose(
        x, k, strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True, preferred_element_type=jnp.float32,
        precision=precision)
    y = y + b.astype(y.dtype)
    return y.astype(in_dtype)
