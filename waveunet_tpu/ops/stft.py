"""STFT / iSTFT with TF-compatible semantics, plus Griffin-Lim.

The spectrogram U-Net consumes ``tf.contrib.signal.stft(frame=1024, hop=768,
hann periodic, no centering)`` and reconstructs with ``inverse_stft`` using the
least-squares synthesis window from ``inverse_stft_window_fn``
(`/root/reference/Models/UnetSpectrogramSeparator.py:28-29,49-54,100-106`).
This module reproduces that math in jnp (XLA FFT on TPU):

  frames   = 1 + (N - frame_len) // hop          (tail dropped, no padding)
  X[f]     = rfft(hann_periodic * x[f*hop : f*hop+frame_len])
  istft    = overlap-add of irfft(X) * w_syn,  w_syn = w / Σ_k w²[n - k*hop]

Griffin-Lim phase recovery (`/root/reference/Utils.py:125-173`) is provided for
magnitude-only reconstruction parity.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

FRAME_LEN = 1024
HOP = 768


def hann_periodic(n: int, dtype=jnp.float32):
    """Periodic Hann window (TF default for STFT)."""
    k = np.arange(n)
    return jnp.asarray(0.5 - 0.5 * np.cos(2.0 * np.pi * k / n), dtype)


def num_frames(n_samples: int, frame_len: int = FRAME_LEN, hop: int = HOP) -> int:
    if n_samples < frame_len:
        return 0
    return 1 + (n_samples - frame_len) // hop


def frame_signal(x, frame_len: int = FRAME_LEN, hop: int = HOP):
    """[..., N] -> [..., F, frame_len] of hop-strided frames (static shapes).

    Implemented as hop-aligned strips (pad -> reshape -> slice -> concat)
    instead of an index-matrix gather: frame f is the concatenation of
    ``ceil(frame_len/hop)`` consecutive hop blocks starting at block f. TPU
    gathers serialise; the strip form measured 4.3 ms -> ~0 for U7's
    [8, 128, 1024] framing (tools/u7_stage_probe.py).
    """
    f = num_frames(x.shape[-1], frame_len, hop)
    if f == 0:
        return jnp.zeros(x.shape[:-1] + (0, frame_len), x.dtype)
    s_count = -(-frame_len // hop)
    pad_to = hop * (f + s_count - 1)
    if x.shape[-1] < pad_to:
        pads = [(0, 0)] * (x.ndim - 1) + [(0, pad_to - x.shape[-1])]
        x = jnp.pad(x, pads)
    blocks = x[..., :pad_to].reshape(x.shape[:-1] + (f + s_count - 1, hop))
    strips = []
    for s in range(s_count):
        w = min(hop, frame_len - s * hop)
        strips.append(blocks[..., s:s + f, :w])
    return jnp.concatenate(strips, axis=-1) if len(strips) > 1 else strips[0]


def stft(x, frame_len: int = FRAME_LEN, hop: int = HOP,
         fft_len: Optional[int] = None):
    """[..., N] real -> [..., F, fft_len//2+1] complex."""
    fft_len = fft_len or frame_len
    frames = frame_signal(x, frame_len, hop)
    w = hann_periodic(frame_len, frames.dtype)
    return jnp.fft.rfft(frames * w, n=fft_len, axis=-1)


def stft_magnitude(x, frame_len: int = FRAME_LEN, hop: int = HOP):
    return jnp.abs(stft(x, frame_len, hop))


def _synthesis_window(frame_len: int, hop: int) -> np.ndarray:
    """TF ``inverse_stft_window_fn``: forward window divided by the sum of its
    squared overlaps at period ``hop`` (exact least-squares OLA inverse)."""
    k = np.arange(frame_len)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / frame_len)
    denom = np.zeros(frame_len)
    max_shift = frame_len // hop + 1
    for m in range(-max_shift, max_shift + 1):
        idx = k - m * hop
        ok = (idx >= 0) & (idx < frame_len)
        denom[ok] += w[idx[ok]] ** 2
    out = np.divide(w, denom, out=np.zeros_like(w), where=denom > 1e-30)
    return out


def istft(spec, frame_len: int = FRAME_LEN, hop: int = HOP,
          fft_len: Optional[int] = None):
    """[..., F, bins] complex -> [..., hop*(F-1)+frame_len] real overlap-add."""
    fft_len = fft_len or frame_len
    frames = jnp.fft.irfft(spec, n=fft_len, axis=-1)[..., :frame_len]
    w_syn = jnp.asarray(_synthesis_window(frame_len, hop), frames.dtype)
    frames = frames * w_syn
    f = spec.shape[-2]
    out_len = hop * (f - 1) + frame_len
    # Overlap-add as hop-aligned strips (reshape -> pad -> sum) instead of a
    # scatter-add: strip s of every frame lands at offset s*hop of its hop
    # block, and with frame_len <= s_count*hop only strips of DIFFERENT s
    # ever overlap. TPU scatters serialise; this form measured 5.5 ms -> ~0
    # for U7's [8, 128, 1024] OLA (tools/u7_stage_probe.py).
    s_count = -(-frame_len // hop)
    lead = frames.shape[:-2]
    out = jnp.zeros(lead + (out_len,), frames.dtype)
    for s in range(s_count):
        w = min(hop, frame_len - s * hop)
        strip = frames[..., s * hop:s * hop + w]
        if w < hop:
            pads = [(0, 0)] * (strip.ndim - 1) + [(0, hop - w)]
            strip = jnp.pad(strip, pads)
        flat = strip.reshape(lead + (f * hop,))
        end = s * hop + f * hop
        if end > out_len:
            flat = flat[..., :out_len - s * hop]
            end = out_len
        pads = [(0, 0)] * (flat.ndim - 1) + [(s * hop, out_len - end)]
        out = out + jnp.pad(flat, pads)
    return out


def griffin_lim(magnitude: np.ndarray, frame_len: int = FRAME_LEN,
                hop: int = HOP, iterations: int = 10,
                init_phase: Optional[np.ndarray] = None,
                length: Optional[int] = None,
                seed: int = 0) -> np.ndarray:
    """Griffin-Lim phase recovery from a magnitude spectrogram [F, bins]
    (mirrors `/root/reference/Utils.py:148-173`). Runs the jnp STFT/iSTFT pair
    under jit; returns host audio."""
    mag = jnp.asarray(magnitude, jnp.float32)
    if init_phase is not None:
        spec = mag * jnp.exp(1j * jnp.asarray(init_phase))
    else:
        rng = np.random.default_rng(seed)
        phase = rng.uniform(-np.pi, np.pi, magnitude.shape)
        spec = mag * jnp.exp(1j * jnp.asarray(phase))

    @jax.jit
    def one_round(spec):
        audio = istft(spec, frame_len, hop)
        re = stft(audio, frame_len, hop)
        f = min(re.shape[-2], mag.shape[-2])
        re = re[..., :f, :]
        return mag[..., :f, :] * jnp.exp(1j * jnp.angle(re))

    for _ in range(max(iterations - 1, 0)):
        spec = one_round(spec)
    audio = np.asarray(istft(spec, frame_len, hop))
    if length is not None:
        if audio.shape[-1] < length:
            audio = np.pad(audio, [(0, length - audio.shape[-1])])
        audio = audio[..., :length]
    return audio
