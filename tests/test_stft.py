"""STFT/iSTFT tests: frame math, perfect reconstruction, TF-parity oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from waveunet_tpu.ops import stft as S


def test_num_frames():
    assert S.num_frames(1024) == 1
    assert S.num_frames(1023) == 0
    assert S.num_frames(768 * 127 + 1024) == 128
    assert S.num_frames(768 * 127 + 1024 + 767) == 128


def test_stft_shapes():
    x = jnp.zeros((2, 768 * 15 + 1024))
    spec = S.stft(x)
    assert spec.shape == (2, 16, 513)


def test_reconstruction_roundtrip(rng):
    """iSTFT(STFT(x)) == x in the fully-overlapped interior (least-squares
    window pair)."""
    n = 768 * 20 + 1024
    x = rng.standard_normal((1, n)).astype(np.float32)
    spec = S.stft(jnp.asarray(x))
    y = np.asarray(S.istft(spec))
    assert y.shape[-1] == n
    # Interior (one frame in from each edge) must reconstruct exactly.
    m = slice(1024, n - 1024)
    np.testing.assert_allclose(y[0, m], x[0, m], atol=1e-4)


def test_tf_parity_oracle():
    """Parity with tf.signal.stft / inverse_stft (TF2 ships the same kernels
    TF1.8's contrib.signal used). Golden arrays precomputed by TF on this
    machine (tests/golden/stft_tf.npz; regenerate with an isolated TF process —
    importing TF in-process fights the TPU tunnel)."""
    import os
    path = os.path.join(os.path.dirname(__file__), "golden", "stft_tf.npz")
    if not os.path.exists(path):
        pytest.skip("golden STFT fixture missing")
    z = np.load(path)
    x, tf_spec, tf_audio = z["x"], z["spec"], z["audio"]

    spec = np.asarray(S.stft(jnp.asarray(x)))
    np.testing.assert_allclose(spec, tf_spec, atol=2e-3)

    audio = np.asarray(S.istft(jnp.asarray(tf_spec)))
    np.testing.assert_allclose(audio, tf_audio, atol=2e-4)


def test_griffin_lim_recovers_tone():
    sr = 8192
    t = np.arange(768 * 10 + 1024) / sr
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    mag = np.abs(np.asarray(S.stft(jnp.asarray(x[None]))))[0]
    y = S.griffin_lim(mag, iterations=30, length=len(x))
    # Compare magnitudes of reconstruction (phase is arbitrary up to shift).
    mag_y = np.abs(np.asarray(S.stft(jnp.asarray(y[None]))))[0]
    err = np.linalg.norm(mag_y - mag) / np.linalg.norm(mag)
    assert err < 0.15, err


def test_shim_accepts_reference_orientation():
    """Utils.spectrogramToAudioFile must accept the reference/librosa
    [bins, frames] orientation ported scripts pass (round-2 review: the
    silent wrong-orientation pass-through produced garbage audio)."""
    from waveunet_tpu import utils

    sr = 8192
    t = np.arange(768 * 6 + 1024) / sr
    x = 0.4 * np.sin(2 * np.pi * 330.0 * t).astype(np.float32)
    spec = np.asarray(S.stft(jnp.asarray(x[None])))[0]  # [frames, bins]
    mag, phase = np.abs(spec), np.angle(spec)

    ours = utils.spectrogramToAudioFile(mag, phaseIterations=0, phase=phase)
    ref_orient = utils.spectrogramToAudioFile(mag.T, phaseIterations=0,
                                              phase=phase.T)
    np.testing.assert_allclose(ref_orient, ours, atol=1e-6)
    with pytest.raises(ValueError, match="frequency bins"):
        utils.spectrogramToAudioFile(mag[:, :-1])  # no axis == bins
