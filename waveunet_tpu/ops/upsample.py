"""x2 temporal upsampling: bilinear (both TF1 flavours) and learned interpolation.

The reference upsamples feature maps with either
  * ``tf.image.resize_bilinear(..., align_corners=True)`` to 2n-1 samples when
    ``context=True`` (`/root/reference/Models/UnetAudioSeparator.py:115`),
  * legacy TF1 ``tf.image.resize_bilinear`` (align_corners=False, no half-pixel
    offset) to 2n samples otherwise (`UnetAudioSeparator.py:117`), or
  * a learned per-feature convex interpolation
    (`/root/reference/Models/InterpolationLayer.py:4-40`).

For a x2 upsample all three reduce to "keep originals at even indices, insert a
convex combination of neighbours at odd indices", which we implement as a
stack+reshape interleave — a layout-friendly XLA pattern (no gathers, no diag-matmul
like the reference's 2FxF construction).

Bilinear x2 closed forms (derived from the TF1 sampling grids):
  align_corners=True,  out=2n-1: out[2i] = x[i]; out[2i+1] = (x[i]+x[i+1])/2
  align_corners=False, out=2n  : same, plus out[2n-1] = x[n-1]  (edge clamp)
"""

from __future__ import annotations

import jax.numpy as jnp


def _interleave(evens, odds):
    """[B,n,C],[B,n,C] -> [B,2n,C] with evens at 0,2,4,... and odds at 1,3,5,..."""
    b, n, c = evens.shape
    return jnp.stack([evens, odds], axis=2).reshape(b, 2 * n, c)


def bilinear_x2(x, context: bool):
    """Bilinear x2 upsample of [B, n, C] -> [B, 2n-1, C] (context) or [B, 2n, C]."""
    mids = 0.5 * (x[:, :-1, :] + x[:, 1:, :])
    if context:
        # out length 2n-1: originals interleaved with n-1 midpoints.
        out = _interleave(x[:, :-1, :], mids)
        return jnp.concatenate([out, x[:, -1:, :]], axis=1)
    # out length 2n: last odd sample clamps to the final original (TF1 legacy grid).
    odds = jnp.concatenate([mids, x[:, -1:, :]], axis=1)
    return _interleave(x, odds)


def learned_interp_x2(x, weights, context: bool):
    """Learned x2 interpolation of [B, n, C] with per-feature weights [C].

    ``out[2i] = x[i]``, ``out[2i+1] = sigmoid(w) * x[i] + (1 - sigmoid(w)) * x[i+1]``
    (`InterpolationLayer.py:19-23`). In the non-context ("same") case the reference's
    width-2 SAME conv zero-pads on the right, so the final interpolant is
    ``sigmoid(w) * x[n-1]`` (`InterpolationLayer.py:23,32`); output length is 2n.
    In the context ("valid") case output length is 2n-1.
    """
    return _learned_interp_x2(x, _sigmoid(weights), context)


def _sigmoid(w):
    return 1.0 / (1.0 + jnp.exp(-w))


def _learned_interp_x2(x, w, context: bool):
    w = w.reshape(1, 1, -1).astype(x.dtype)
    mids = w * x[:, :-1, :] + (1.0 - w) * x[:, 1:, :]
    if context:
        out = _interleave(x[:, :-1, :], mids)
        return jnp.concatenate([out, x[:, -1:, :]], axis=1)
    last = w * x[:, -1:, :]  # right zero-pad of the SAME conv
    odds = jnp.concatenate([mids, last], axis=1)
    return _interleave(x, odds)
