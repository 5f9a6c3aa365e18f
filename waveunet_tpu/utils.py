"""Migration shim: the reference's ``Utils`` surface, mapped to this framework.

Users porting scripts from f90/Wave-U-Net import helpers from a flat
``Utils`` module (`/root/reference/Utils.py`); this module exposes the same
capabilities under their familiar names, implemented by the TPU-native ops:

  crop, crop_and_concat, LeakyReLU, AudioClip, pad_freqs   -> ops.primitives
  resample, load                                           -> ops.resample / data.audio_io
  spectrogramToAudioFile (Griffin-Lim)                     -> ops.stft.griffin_lim
  getNumParams                                             -> models.waveunet.num_params
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from waveunet_tpu.data.audio_io import load  # noqa: F401  (same contract)
from waveunet_tpu.models.waveunet import num_params as getNumParams  # noqa: F401
from waveunet_tpu.ops.primitives import (  # noqa: F401
    crop_and_concat,
    pad_freqs,
)
from waveunet_tpu.ops.primitives import audio_clip as AudioClip  # noqa: F401
from waveunet_tpu.ops.primitives import crop as _crop
from waveunet_tpu.ops.primitives import leaky_relu as LeakyReLU  # noqa: F401
from waveunet_tpu.ops.resample import resample  # noqa: F401
from waveunet_tpu.ops.stft import griffin_lim


def crop(tensor, target_shape, match_feature_dim=True):
    """Centre-crop along the width axis; accepts a full target shape like the
    reference (`Utils.py:104-123`) or a plain target length."""
    target_len = target_shape[1] if hasattr(target_shape, "__len__") \
        else int(target_shape)
    return _crop(tensor, target_len)


def spectrogramToAudioFile(magnitude: np.ndarray, fftWindowSize: int = 1024,
                           hopSize: int = 768, phaseIterations: int = 10,
                           phase: Optional[np.ndarray] = None,
                           length: Optional[int] = None) -> np.ndarray:
    """Magnitude (+optional initial phase) -> audio via Griffin-Lim
    (`/root/reference/Utils.py:125-146` semantics).

    Accepts BOTH orientations: the reference/librosa convention
    ``[bins, frames]`` (what ported scripts pass) and this framework's
    ``[frames, bins]`` — detected by which axis equals ``fftWindowSize//2+1``
    (a silent wrong-orientation pass-through produced garbage audio,
    round-2 review finding)."""
    bins = fftWindowSize // 2 + 1
    if magnitude.shape[0] == bins and magnitude.shape[-1] != bins:
        magnitude = np.asarray(magnitude).T
        phase = None if phase is None else np.asarray(phase).T
    elif magnitude.shape[-1] != bins:
        raise ValueError(
            f"magnitude shape {magnitude.shape} has no axis of "
            f"{bins} = fftWindowSize//2+1 frequency bins")
    elif magnitude.shape[0] == bins:
        import warnings

        warnings.warn(
            f"square {magnitude.shape} spectrogram is ambiguous; assuming "
            f"[frames, bins] — transpose explicitly if it is the reference's "
            f"[bins, frames] orientation", stacklevel=2)
    if phase is not None and phaseIterations == 0:
        import jax.numpy as jnp

        from waveunet_tpu.ops.stft import istft
        spec = magnitude * np.exp(1j * phase)
        audio = np.asarray(istft(jnp.asarray(spec), fftWindowSize, hopSize))
        if length is not None:
            audio = audio[..., :length]
        return audio
    return griffin_lim(magnitude, fftWindowSize, hopSize,
                       iterations=phaseIterations, init_phase=phase,
                       length=length)
