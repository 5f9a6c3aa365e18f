"""Primitive-op tests vs numpy oracles (crop/concat/upsample/activations/conv)."""

import numpy as np
import jax.numpy as jnp
import pytest

from waveunet_tpu.ops import primitives as P
from waveunet_tpu.ops import upsample as U
from waveunet_tpu.ops.conv import conv1d, conv1d_init
import jax


def test_leaky_relu():
    x = np.array([-2.0, -0.5, 0.0, 1.0, 3.0], np.float32)
    got = np.asarray(P.leaky_relu(jnp.asarray(x)))
    np.testing.assert_allclose(got, np.maximum(0.2 * x, x))


def test_audio_clip():
    x = jnp.asarray([-2.0, 0.5, 2.0])
    np.testing.assert_allclose(np.asarray(P.audio_clip(x, True)), [-2.0, 0.5, 2.0])
    np.testing.assert_allclose(np.asarray(P.audio_clip(x, False)), [-1.0, 0.5, 1.0])


def test_crop_even_and_odd():
    x = jnp.arange(10, dtype=jnp.float32).reshape(1, 10, 1)
    # even diff: crop 2 -> [1..8]
    np.testing.assert_array_equal(
        np.asarray(P.crop(x, 8))[0, :, 0], np.arange(1, 9))
    # odd diff 3: start = 1, end-crop 2 -> [1..7]  (`Utils.py:116-123`)
    np.testing.assert_array_equal(
        np.asarray(P.crop(x, 7))[0, :, 0], np.arange(1, 8))
    with pytest.raises(ValueError):
        P.crop(x, 11)


def test_crop_and_concat():
    skip = jnp.ones((2, 10, 3))
    cur = jnp.zeros((2, 6, 2))
    out = P.crop_and_concat(skip, cur)
    assert out.shape == (2, 6, 5)
    np.testing.assert_array_equal(np.asarray(out[..., :3]), 1.0)
    np.testing.assert_array_equal(np.asarray(out[..., 3:]), 0.0)


def test_pad_freqs():
    x = jnp.ones((2, 5, 4, 1))
    got = P.pad_freqs(x, 8, axis=2, value=0.5)
    assert got.shape == (2, 5, 8, 1)
    np.testing.assert_array_equal(np.asarray(got[:, :, :2]), 0.5)
    np.testing.assert_array_equal(np.asarray(got[:, :, 2:6]), 1.0)
    # odd diff pads extra at the end
    got = P.pad_freqs(jnp.ones((2, 5, 4, 1)), 7, axis=2)
    assert got.shape[2] == 7
    np.testing.assert_array_equal(np.asarray(got[:, :, 0]), 0.0)
    np.testing.assert_array_equal(np.asarray(got[:, :, 5:]), 0.0)


# --- bilinear upsampling oracles -------------------------------------------

def _tf1_resize_bilinear_1d(x, out_len, align_corners):
    """Numpy oracle of TF1 legacy resize_bilinear on the width axis of [B,W,C]."""
    b, w, c = x.shape
    if align_corners:
        scale = (w - 1) / (out_len - 1)
    else:
        scale = w / out_len
    out = np.empty((b, out_len, c), x.dtype)
    for o in range(out_len):
        src = o * scale
        lo = int(np.floor(src))
        lo = min(lo, w - 1)
        hi = min(lo + 1, w - 1)
        frac = src - lo
        out[:, o, :] = (1 - frac) * x[:, lo, :] + frac * x[:, hi, :]
    return out


@pytest.mark.parametrize("n", [2, 3, 7, 16])
def test_bilinear_context(rng, n):
    x = rng.standard_normal((2, n, 5)).astype(np.float32)
    want = _tf1_resize_bilinear_1d(x, 2 * n - 1, align_corners=True)
    got = np.asarray(U.bilinear_x2(jnp.asarray(x), context=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("n", [2, 3, 7, 16])
def test_bilinear_no_context(rng, n):
    x = rng.standard_normal((2, n, 5)).astype(np.float32)
    want = _tf1_resize_bilinear_1d(x, 2 * n, align_corners=False)
    got = np.asarray(U.bilinear_x2(jnp.asarray(x), context=False))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


# --- learned interpolation oracle (`InterpolationLayer.py:4-40`) -------------

def _learned_interp_oracle(x, w_raw, context):
    b, n, c = x.shape
    w = 1.0 / (1.0 + np.exp(-w_raw))
    out_len = 2 * n - 1 if context else 2 * n
    out = np.zeros((b, out_len, c), x.dtype)
    for o in range(out_len):
        if o % 2 == 0:
            out[:, o] = x[:, o // 2]
        else:
            i = o // 2
            right = x[:, i + 1] if i + 1 < n else np.zeros_like(x[:, 0])
            out[:, o] = w * x[:, i] + (1 - w) * right
    return out


@pytest.mark.parametrize("context", [True, False])
@pytest.mark.parametrize("n", [2, 5, 9])
def test_learned_interp(rng, context, n):
    x = rng.standard_normal((2, n, 4)).astype(np.float32)
    w = rng.standard_normal(4).astype(np.float32)
    want = _learned_interp_oracle(x, w, context)
    got = np.asarray(U.learned_interp_x2(jnp.asarray(x), jnp.asarray(w), context))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


# --- conv1d vs numpy oracle ---------------------------------------------------

def _conv1d_oracle(x, k, b, padding):
    bsz, w, cin = x.shape
    kw, _, cout = k.shape
    if padding == "SAME":
        pad_total = kw - 1
        lo = pad_total // 2
        x = np.pad(x, [(0, 0), (lo, pad_total - lo), (0, 0)])
        w = x.shape[1]
    out_w = w - kw + 1
    out = np.zeros((bsz, out_w, cout), np.float32)
    for t in range(kw):
        out += np.einsum("bwc,cd->bwd", x[:, t:t + out_w, :], k[t])
    return out + b


@pytest.mark.parametrize("padding", ["VALID", "SAME"])
def test_conv1d(rng, padding):
    x = rng.standard_normal((2, 32, 3)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    p = conv1d_init(key, 5, 3, 7)
    got = np.asarray(conv1d(jnp.asarray(x), p, padding=padding))
    want = _conv1d_oracle(x, np.asarray(p["kernel"]), np.asarray(p["bias"]), padding)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_utils_migration_shim(rng):
    """The reference-style Utils surface maps onto the TPU-native ops."""
    import jax.numpy as jnp
    from waveunet_tpu import utils as U

    x = jnp.asarray(rng.standard_normal((1, 10, 2)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(U.crop(x, [1, 6, 2])),
                                  np.asarray(x[:, 2:8, :]))
    np.testing.assert_allclose(np.asarray(U.LeakyReLU(x)),
                               np.maximum(0.2 * np.asarray(x), np.asarray(x)))
    y = U.AudioClip(jnp.asarray([2.0, -3.0]), training=False)
    np.testing.assert_array_equal(np.asarray(y), [1.0, -1.0])
    r = U.resample(np.ones(1000, np.float32), 22050, 44100)
    assert r.shape[0] == 2000
