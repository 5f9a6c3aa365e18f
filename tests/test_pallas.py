"""Pallas kernel correctness tests (interpret mode on CPU; the same kernels are
compile-verified on real TPU — measurements in waveunet_tpu/ops/pallas/KERNELS.md)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waveunet_tpu.ops.conv import conv1d, conv1d_init
from waveunet_tpu.ops.pallas.conv1d_fused import conv1d_lrelu_pallas
from waveunet_tpu.ops.pallas.interp import learned_interp_pallas
from waveunet_tpu.ops.primitives import leaky_relu
from waveunet_tpu.ops.upsample import learned_interp_x2


@pytest.mark.parametrize("K,cin,cout", [(15, 8, 16), (5, 24, 24), (1, 26, 2)])
def test_conv1d_lrelu_kernel(rng, K, cin, cout):
    x = jnp.asarray(rng.standard_normal((2, 300, cin)).astype(np.float32))
    w = jnp.asarray((0.1 * rng.standard_normal((K, cin, cout))).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    got = conv1d_lrelu_pallas(x, w, b, tile_l=64, interpret=True)
    want = leaky_relu(conv1d(x, {"kernel": w, "bias": b}, padding="VALID"))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("context", [True, False])
def test_learned_interp_kernel(rng, context):
    x = jnp.asarray(rng.standard_normal((2, 100, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    got = learned_interp_pallas(x, w, context, tile=32, interpret=True)
    want = learned_interp_x2(x, w, context)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_model_with_pallas_flag_matches(rng):
    """use_pallas=True (interpret on CPU) must reproduce the XLA forward."""
    from waveunet_tpu.config import get_config
    from waveunet_tpu.models.waveunet import apply_waveunet, init_waveunet
    from waveunet_tpu.ops import shapes

    # interpret mode is engaged implicitly off-TPU? No — kernels compile via
    # Mosaic only on TPU; on CPU pallas_call falls back to interpret only if
    # requested. Monkeypatch the kernels' interpret default via partials:
    import waveunet_tpu.models.waveunet as wu_mod
    import waveunet_tpu.ops.pallas.conv1d_fused as cf
    import waveunet_tpu.ops.pallas.interp as ip

    orig_conv, orig_interp = cf.conv1d_lrelu_pallas, ip.learned_interp_pallas

    def conv_i(x, w, b, **kw):
        kw["interpret"] = True
        return orig_conv(x, w, b, **kw)

    def interp_i(x, w, ctx, **kw):
        kw["interpret"] = True
        return orig_interp(x, w, ctx, **kw)

    cf.conv1d_lrelu_pallas = conv_i
    ip.learned_interp_pallas = interp_i
    try:
        cfg = get_config("full", num_layers=3, num_frames=256,
                         num_initial_filters=8)
        inp, _ = shapes.get_padding(cfg, cfg.num_frames)
        params = init_waveunet(jax.random.PRNGKey(0), cfg)
        mix = jnp.asarray(
            (0.1 * rng.standard_normal((1, inp, 2))).astype(np.float32))
        base = apply_waveunet(params, cfg, mix, training=False)
        fast = apply_waveunet(params, cfg.replace(use_pallas=True), mix,
                              training=False)
        for s in cfg.source_names:
            np.testing.assert_allclose(np.asarray(fast[s]),
                                       np.asarray(base[s]), atol=3e-5)
    finally:
        cf.conv1d_lrelu_pallas = orig_conv
        ip.learned_interp_pallas = orig_interp


def test_im2col_kernel_interpret_correct(rng):
    """[C, L]-layout im2col conv kernel: math pinned in interpret mode.

    The kernel is Mosaic-blocked on real TPU (tpu.concatenate cannot merge
    lane-shifted operands — see KERNELS.md round-2 entry) but the formulation
    is kept correct so a future Mosaic can pick it straight up."""
    import jax.numpy as jnp
    from waveunet_tpu.ops.pallas.conv1d_im2col import conv1d_lrelu_im2col

    B, Cin, Cout, K, L = 2, 24, 48, 15, 1500
    x = rng.standard_normal((B, Cin, L)).astype(np.float32)
    w = (0.1 * rng.standard_normal((K, Cin, Cout))).astype(np.float32)
    b = (0.1 * rng.standard_normal(Cout)).astype(np.float32)
    y = conv1d_lrelu_im2col(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                            interpret=True)
    xt = np.transpose(x, (0, 2, 1))
    dn = jax.lax.conv_dimension_numbers((1, 1, 1), (1, 1, 1),
                                        ("NWC", "WIO", "NWC"))
    ref = jax.lax.conv_general_dilated(xt, w, (1,), "VALID",
                                       dimension_numbers=dn) + b
    ref = np.maximum(0.2 * np.asarray(ref), np.asarray(ref))
    ref = np.transpose(ref, (0, 2, 1))
    assert y.shape == ref.shape
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-5)
