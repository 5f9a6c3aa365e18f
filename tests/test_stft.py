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


def test_strip_framing_and_ola_match_naive_oracles():
    """The hop-strip reshape forms of frame_signal / the iSTFT overlap-add
    (round-2 TPU gather/scatter removal) against naive index-matrix oracles,
    across hop<frame (multi-strip), hop==frame, and hop>frame (gap) combos."""
    rng = np.random.default_rng(0)
    for fl, hop in ((1024, 768), (8, 4), (8, 8), (8, 3), (6, 8), (16, 5),
                    (7, 7)):
        for n in (fl, fl + 1, fl + hop - 1, fl + 5 * hop + 3, 3 * fl + 2):
            x = rng.standard_normal((2, n)).astype(np.float32)
            F = S.num_frames(n, fl, hop)
            idx = np.arange(F)[:, None] * hop + np.arange(fl)[None, :]
            want = (x[..., idx] if F else
                    np.zeros((2, 0, fl), np.float32))
            got = np.asarray(S.frame_signal(jnp.asarray(x), fl, hop))
            np.testing.assert_array_equal(got, want, err_msg=f"{fl}/{hop}/{n}")
            if F == 0:
                continue
            frames = rng.standard_normal((2, F, fl)).astype(np.float32)
            w_syn = S._synthesis_window(fl, hop).astype(np.float32)
            out_len = hop * (F - 1) + fl
            want_o = np.zeros((2, out_len), np.float32)
            for f_ in range(F):
                want_o[:, f_ * hop:f_ * hop + fl] += frames[:, f_] * w_syn
            spec = jnp.fft.rfft(jnp.asarray(frames), n=fl, axis=-1)
            got_o = np.asarray(S.istft(spec, fl, hop))
            np.testing.assert_allclose(got_o, want_o, atol=2e-4,
                                       err_msg=f"{fl}/{hop}/{n}")
