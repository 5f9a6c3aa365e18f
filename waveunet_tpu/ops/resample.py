"""Polyphase sample-rate conversion (host-side scipy + device-side jnp).

Replaces the reference's librosa kaiser_best resampling (`Utils.py:94-95`). We use a
Kaiser-windowed sinc polyphase filter whose parameters (64 zero crossings,
beta=14.77, rolloff .9475) mirror resampy's "kaiser_best", so results are
numerically very close to librosa's default without depending on it.

Host path: ``scipy.signal.upfirdn`` (C-speed polyphase) with exact group-delay
compensation. Device path: the same polyphase expressed as an input-dilated,
output-strided XLA convolution (``resample_jnp``) for keeping e.g. museval-rate
conversion off the host at pod scale.
"""

from __future__ import annotations

import math
from fractions import Fraction
from functools import lru_cache

import numpy as np
from scipy.signal import upfirdn


_ZEROS = 64          # zero crossings per side (resampy kaiser_best: 64)
_BETA = 14.769656459379492
_ROLLOFF = 0.9475937167399596


@lru_cache(maxsize=32)
def _kaiser_filter(p: int, q: int):
    """Lowpass prototype on the up-by-p grid. DC gain p (interpolation gain)."""
    cutoff = _ROLLOFF / max(1.0, q / p)  # relative to output Nyquist on up-grid
    half = int(math.ceil(_ZEROS * p / cutoff)) * 1
    n = np.arange(-half, half + 1, dtype=np.float64)
    taps = (cutoff / p) * np.sinc((cutoff / p) * n)
    taps *= np.kaiser(len(n), _BETA)
    taps *= p / taps.sum()  # exact DC gain p so unit signals stay unit
    return taps, half


def _resample_plan(n_in: int, orig_sr: int, new_sr: int):
    frac = Fraction(new_sr, orig_sr)
    p, q = frac.numerator, frac.denominator
    taps, half = _kaiser_filter(p, q)
    n_out = int(math.ceil(n_in * new_sr / orig_sr))
    # Prepend c zero input samples so the group delay (half taps on the up-grid)
    # lands on an exact output stride: (half + c*p) % q == 0.
    c = (-half * pow(p, -1, q)) % q if q > 1 else 0
    start = (half + c * p) // q
    return p, q, taps, half, c, start, n_out


def resample(audio: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Resample (frames[, channels]) audio; output length ceil(n*new/orig).

    Uses the native C++ polyphase kernel when built (identical taps/math);
    falls back to scipy's upfirdn otherwise.
    """
    if orig_sr <= 0 or new_sr <= 0:
        # negative rates otherwise sail through Fraction() and return
        # garbage; zero divides inside the filter design (found by fuzzing)
        raise ValueError(f"sample rates must be positive, got "
                         f"{orig_sr} -> {new_sr}")
    if orig_sr == new_sr:
        return np.asarray(audio, np.float32)

    from waveunet_tpu.runtime import native
    if native.available():
        n_in = np.asarray(audio).shape[0]
        p, q, taps, half, _, _, n_out = _resample_plan(n_in, orig_sr, new_sr)
        return native.resample_poly(np.asarray(audio, np.float32), taps,
                                    half, p, q, n_out)

    x = np.asarray(audio, np.float64)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    p, q, taps, half, c, start, n_out = _resample_plan(x.shape[0], orig_sr, new_sr)
    if c:
        x = np.concatenate([np.zeros((c, x.shape[1])), x], axis=0)
    # Zero-pad the tail so upfirdn produces the full output range.
    tail = int(math.ceil((half + q) / p)) + 1
    x = np.concatenate([x, np.zeros((tail, x.shape[1]))], axis=0)
    y = upfirdn(taps, x, up=p, down=q, axis=0)
    y = y[start:start + n_out]
    out = y.astype(np.float32)
    if squeeze:
        out = out[:, 0]
    return out


def resample_jnp(audio, orig_sr: int, new_sr: int):
    """Device-side polyphase resample of [frames, channels] via dilated conv.

    Identical math to :func:`resample`: the up-by-p stage is ``lhs_dilation=p``,
    the down-by-q stage is ``window_strides=q``; the Kaiser tap bank is the conv
    kernel (MXU-friendly once batched over channels).
    """
    import jax
    import jax.numpy as jnp

    if orig_sr <= 0 or new_sr <= 0:
        raise ValueError(f"sample rates must be positive, got "
                         f"{orig_sr} -> {new_sr}")

    if orig_sr == new_sr:
        return audio
    n_in = audio.shape[0]
    p, q, taps, half, c, start, n_out = _resample_plan(n_in, orig_sr, new_sr)
    k = jnp.asarray(taps[::-1].copy(), jnp.float32)[:, None, None]  # conv flips
    x = jnp.asarray(audio, jnp.float32).T[:, :, None]  # [C, n, 1] (batch=C)
    # y[m] = sum_t taps[t] * up(x)[m*q + start*q? ...]; emulate upfirdn alignment:
    # upfirdn output j corresponds to correlation of taps with dilated x at j*q.
    # lax conv computes cross-correlation of x with flipped kernel == convolution.
    # Host path PREPENDS c zero samples (group-delay compensation) before
    # upfirdn; in conv-padding terms those are c*p extra dilated-input
    # positions on the LEFT, i.e. pad_lo grows by +c*p (a sign flip here
    # time-shifted every rate pair with c != 0 — round-2 review finding;
    # tests/test_resample.py now fuzzes pairs with c > 0).
    pad_lo = len(taps) - 1 + c * p
    pad_hi = start * q + n_out * q + len(taps)
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(q,), padding=[(pad_lo, pad_hi)],
        lhs_dilation=(p,), dimension_numbers=("NWC", "WIO", "NWC"))
    y = y[:, start:start + n_out, 0].T
    return y
