"""Native C++ host-ops tests: build, and parity vs the numpy/scipy paths."""

import numpy as np
import pytest

from waveunet_tpu.runtime import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native lib unavailable (no g++?)")
    return True


def test_decode_pcm16(lib_ok, rng):
    raw = rng.integers(-32768, 32768, size=1000).astype(np.int16)
    got = native.decode_pcm16(raw)
    np.testing.assert_allclose(got, raw.astype(np.float32) / 32768.0)


def test_quantize_int16(lib_ok, rng):
    x = np.clip(rng.standard_normal(5000) * 0.7, -1.5, 1.5).astype(np.float32)
    got = native.quantize_int16(x)
    want = np.round(np.clip(x, -1, 1) * 32767.0).astype(np.int16)
    # round-half differences allowed at exact .5 boundaries only
    assert np.max(np.abs(got.astype(np.int32) - want.astype(np.int32))) <= 1
    mism = np.mean(got != want)
    assert mism < 0.001


def test_gather_windows(lib_ok, rng):
    x = rng.standard_normal((500, 2)).astype(np.float32)
    starts = np.array([0, 10, 480], np.int64)
    got = native.gather_windows(x, starts, 20)
    assert got.shape == (3, 20, 2)
    np.testing.assert_array_equal(got[1], x[10:30])
    np.testing.assert_array_equal(got[2], x[480:500])


@pytest.mark.parametrize("orig,new", [(44100, 22050), (22050, 44100),
                                      (44100, 8192)])
def test_native_resample_matches_scipy(lib_ok, rng, orig, new):
    from waveunet_tpu.ops.resample import _resample_plan

    x = (0.5 * rng.standard_normal((4000, 2))).astype(np.float32)
    p, q, taps, half, c, start, n_out = _resample_plan(x.shape[0], orig, new)
    got = native.resample_poly(x, taps, half, p, q, n_out)

    # scipy oracle (the pre-native implementation)
    import math
    from scipy.signal import upfirdn
    xx = np.asarray(x, np.float64)
    if c:
        xx = np.concatenate([np.zeros((c, 2)), xx])
    tail = int(math.ceil((half + q) / p)) + 1
    xx = np.concatenate([xx, np.zeros((tail, 2))])
    want = upfirdn(taps, xx, up=p, down=q, axis=0)[start:start + n_out]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)
