"""TF-parity tests for the 2-D ops used by the spectrogram U-Net.

Goldens in tests/golden/spectro_ops_tf.npz were computed by tf.nn.conv2d /
conv2d_transpose / batch_normalization in an isolated TF process, covering
exactly the primitives the reference's U7 model relies on
(`UnetSpectrogramSeparator.py:70,79,86` + `tf.contrib.layers.batch_norm`).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from waveunet_tpu.models.spectrogram_unet import _bn_apply
from waveunet_tpu.ops.conv import conv2d, conv2d_transpose

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                       "spectro_ops_tf.npz")


@pytest.fixture(scope="module")
def z():
    if not os.path.exists(_GOLDEN):
        pytest.skip("spectro golden fixture missing")
    return np.load(_GOLDEN)


def test_conv2d_stride2_same(z):
    got = conv2d(jnp.asarray(z["x"]),
                 {"kernel": jnp.asarray(z["k"]), "bias": jnp.asarray(z["b"])},
                 stride=(2, 2), padding="SAME")
    np.testing.assert_allclose(np.asarray(got), z["y_conv"], atol=2e-5)


def test_conv2d_transpose_stride2_same(z):
    got = conv2d_transpose(
        jnp.asarray(z["x"]),
        {"kernel": jnp.asarray(z["kt"]), "bias": jnp.asarray(z["bt"])},
        stride=(2, 2), padding="SAME")
    assert got.shape == z["y_tr"].shape
    np.testing.assert_allclose(np.asarray(got), z["y_tr"], atol=2e-5)


def test_batch_norm_eval_mode(z):
    stats = {"mean": jnp.asarray(z["mean"]), "var": jnp.asarray(z["var"])}
    got, new_stats = _bn_apply(jnp.asarray(z["x"]), jnp.asarray(z["beta"]),
                               stats, training=False)
    np.testing.assert_allclose(np.asarray(got), z["y_bn"], atol=2e-5)
    np.testing.assert_array_equal(np.asarray(new_stats["mean"]), z["mean"])


def test_batch_norm_train_mode_stats(z):
    x = jnp.asarray(z["x"])
    stats = {"mean": jnp.zeros(x.shape[-1]), "var": jnp.ones(x.shape[-1])}
    got, new_stats = _bn_apply(x, jnp.zeros(x.shape[-1]), stats, training=True)
    # normalized output has ~zero mean / unit variance per channel
    m = np.asarray(got).mean(axis=(0, 1, 2))
    v = np.asarray(got).var(axis=(0, 1, 2))
    np.testing.assert_allclose(m, 0.0, atol=1e-5)
    np.testing.assert_allclose(v, 1.0, atol=2e-3)
    # moving stats move by (1 - 0.999) toward the batch moments
    batch_mean = np.asarray(x).mean(axis=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(new_stats["mean"]),
                               0.001 * batch_mean, rtol=1e-4)
