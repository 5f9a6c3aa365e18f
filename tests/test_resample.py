"""Resampler tests: tone preservation, length contract, host/device agreement."""

import numpy as np
import pytest

from waveunet_tpu.ops.resample import resample, resample_jnp


def _tone(sr, seconds, freq):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


@pytest.mark.parametrize("orig,new", [(44100, 22050), (22050, 44100),
                                      (44100, 8192)])
def test_tone_preserved(orig, new):
    x = _tone(orig, 0.5, 440.0)
    y = resample(x, orig, new)
    assert y.shape[0] == int(np.ceil(x.shape[0] * new / orig))
    # Compare against an analytically resampled tone away from the edges.
    t = np.arange(y.shape[0]) / new
    want = np.sin(2 * np.pi * 440.0 * t)
    m = slice(200, -200)
    err = np.max(np.abs(y[m] - want[m]))
    assert err < 5e-3, err


def test_identity():
    x = _tone(22050, 0.1, 100.0)
    np.testing.assert_array_equal(resample(x, 22050, 22050), x)


def test_multichannel_shape():
    x = np.stack([_tone(44100, 0.2, 440.0), _tone(44100, 0.2, 880.0)], axis=1)
    y = resample(x, 44100, 22050)
    assert y.ndim == 2 and y.shape[1] == 2


def test_dc_gain():
    x = np.ones(4096, np.float32)
    y = resample(x, 44100, 22050)
    assert abs(np.mean(y[500:-500]) - 1.0) < 1e-3


def test_device_matches_host():
    x = _tone(22050, 0.2, 330.0)[:, None]
    y_host = resample(x, 22050, 44100)
    y_dev = np.asarray(resample_jnp(x, 22050, 44100))
    assert y_dev.shape == y_host.shape
    # fp32 device accumulation vs fp64 host accumulation over ~270 taps.
    np.testing.assert_allclose(y_dev, y_host, atol=2e-3)


def test_device_matches_host_nonzero_group_delay():
    """Rate pairs whose polyphase plan has c > 0 group-delay compensation —
    the device path's conv padding must account for the host path's
    c prepended zeros (+c*p on pad_lo; a sign flip here time-shifts the
    whole output, round-2 review finding). 22050->44100 has c == 0 and
    cannot see it."""
    from waveunet_tpu.ops.resample import _resample_plan

    rng = np.random.default_rng(7)
    for orig, new in ((48000, 44100), (44100, 8192), (8192, 44100), (2, 3)):
        assert _resample_plan(4096, orig, new)[4] > 0  # c > 0: covering pair
        x = rng.standard_normal((4096, 2)).astype(np.float32)
        y_host = resample(x, orig, new)
        y_dev = np.asarray(resample_jnp(x, orig, new))
        assert y_dev.shape == y_host.shape
        np.testing.assert_allclose(y_dev, y_host, atol=2e-3,
                                   err_msg=f"{orig}->{new}")


def test_resample_rejects_nonpositive_rates():
    """Negative rates otherwise sail through Fraction() and return garbage;
    zero divides inside the filter design (found by fuzzing)."""
    import pytest

    from waveunet_tpu.ops.resample import resample, resample_jnp

    a = np.zeros((10, 1), np.float32)
    for fn in (resample, resample_jnp):
        for orig, new in [(0, 8000), (8000, 0), (-1, 8000), (8000, -5)]:
            with pytest.raises(ValueError, match="positive"):
                fn(a, orig, new)
