"""Elementwise / cropping primitives in jnp.

JAX counterparts of the reference's `Utils.py` free functions (crop `:104`,
crop_and_concat `:11`, LeakyReLU `:79`, AudioClip `:82`, pad_freqs `:44`).
All shapes are static so everything jit-compiles to fused XLA ops.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def leaky_relu(x, alpha: float = 0.2):
    """max(alpha*x, x) — `/root/reference/Utils.py:79-80`."""
    return jnp.maximum(alpha * x, x)


def audio_clip(x, training: bool):
    """Identity when training, clip to [-1, 1] at inference — `Utils.py:82-92`."""
    if training:
        return x
    return jnp.clip(x, -1.0, 1.0)


def crop(x, target_len: int):
    """Centre-crop a [batch, width, channels] tensor along width — `Utils.py:104-123`.

    If the difference is odd, crops one more sample from the end (diff // 2 at the
    start, diff - diff // 2 at the end), matching the reference exactly.
    """
    diff = x.shape[1] - target_len
    if diff < 0:
        raise ValueError(f"cannot crop {x.shape[1]} to larger {target_len}")
    if diff == 0:
        return x
    start = diff // 2
    return x[:, start:start + target_len, :]


def crop_and_concat(skip, x):
    """Centre-crop `skip` along width to x's width, concat on channel axis.

    Mirrors `Utils.py:11-24` (x1 is cropped to x2's shape, then concat(x1, x2)).
    """
    if x is None:
        return skip
    skip = crop(skip, x.shape[1])
    return jnp.concatenate([skip, x], axis=2)


def pad_freqs(x, target_freqs: int, axis: int = 1, value: float = 0.0):
    """Zero-pad the frequency axis up to `target_freqs` — `Utils.py:44-77`.

    Even difference pads symmetrically; odd difference puts the extra bin at the end.
    """
    diff = target_freqs - x.shape[axis]
    if diff < 0:
        raise ValueError("target smaller than input freq axis")
    if diff == 0:
        return x
    lo, hi = (diff // 2, diff // 2) if diff % 2 == 0 else (diff // 2, diff // 2 + 1)
    pads = [(0, 0)] * x.ndim
    pads[axis] = (lo, hi)
    return jnp.pad(x, pads, mode="constant", constant_values=value)
