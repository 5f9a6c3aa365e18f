"""Wave-U-Net model tests: shapes, param counts, variant behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waveunet_tpu.config import get_config
from waveunet_tpu.models import waveunet as wu
from waveunet_tpu.ops import shapes


def _tiny(preset, **kw):
    """Shrink a preset to a fast test size (4 layers, small frames)."""
    return get_config(preset, num_layers=4, num_frames=512, **kw)


@pytest.mark.parametrize("preset", ["baseline", "baseline_diff"])
def test_same_padding_shapes(preset):
    cfg = _tiny(preset)
    inp, out = shapes.get_padding(cfg, cfg.num_frames)
    params = wu.init_waveunet(jax.random.PRNGKey(0), cfg)
    mix = jnp.zeros((2, inp, cfg.num_channels))
    y = wu.apply_waveunet(params, cfg, mix, training=True)
    assert set(y) == set(cfg.source_names)
    for v in y.values():
        assert v.shape == (2, out, cfg.num_channels)


@pytest.mark.parametrize("preset", ["baseline_context", "full"])
def test_context_shapes(preset):
    cfg = _tiny(preset)
    inp, out = shapes.get_padding(cfg, cfg.num_frames)
    params = wu.init_waveunet(jax.random.PRNGKey(0), cfg)
    mix = jnp.zeros((1, inp, cfg.num_channels))
    y = wu.apply_waveunet(params, cfg, mix, training=False)
    for v in y.values():
        assert v.shape == (1, out, cfg.num_channels)


def test_param_count_matches_reference():
    """All published Wave-U-Net variants are ~10.2-10.3M params (SURVEY.md §2)."""
    for preset, lo, hi in [("baseline", 10.0e6, 10.4e6),
                           ("full", 10.0e6, 10.4e6)]:
        cfg = get_config(preset)
        params = wu.init_waveunet(jax.random.PRNGKey(0), cfg)
        n = wu.num_params(params)
        assert lo < n < hi, (preset, n)


def test_difference_output_sums_to_mix(rng):
    """Difference output: sum of all sources == centre-cropped mix (training mode,
    no clipping) — `OutputLayer.py:11-23`."""
    cfg = _tiny("baseline_diff")
    inp, out = shapes.get_padding(cfg, cfg.num_frames)
    params = wu.init_waveunet(jax.random.PRNGKey(1), cfg)
    mix = jnp.asarray(rng.standard_normal((2, inp, 1)).astype(np.float32))
    y = wu.apply_waveunet(params, cfg, mix, training=True)
    total = sum(y.values())
    np.testing.assert_allclose(np.asarray(total), np.asarray(mix), rtol=1e-5,
                               atol=1e-5)


def test_difference_clips_at_inference(rng):
    cfg = _tiny("baseline_diff", output_activation="linear")
    inp, _ = shapes.get_padding(cfg, cfg.num_frames)
    params = wu.init_waveunet(jax.random.PRNGKey(1), cfg)
    mix = jnp.asarray(10.0 * rng.standard_normal((1, inp, 1)).astype(np.float32))
    y = wu.apply_waveunet(params, cfg, mix, training=False)
    for v in y.values():
        assert float(jnp.max(jnp.abs(v))) <= 1.0 + 1e-6


def test_tanh_bounds(rng):
    cfg = _tiny("baseline")
    inp, _ = shapes.get_padding(cfg, cfg.num_frames)
    params = wu.init_waveunet(jax.random.PRNGKey(2), cfg)
    mix = jnp.asarray(rng.standard_normal((1, inp, 1)).astype(np.float32))
    y = wu.apply_waveunet(params, cfg, mix, training=True)
    for v in y.values():
        assert float(jnp.max(jnp.abs(v))) <= 1.0


def test_jit_compiles():
    cfg = _tiny("baseline_context")
    inp, out = shapes.get_padding(cfg, cfg.num_frames)
    params = wu.init_waveunet(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def fwd(p, x):
        return wu.apply_waveunet(p, cfg, x, training=False)

    y = fwd(params, jnp.zeros((1, inp, cfg.num_channels)))
    assert y[cfg.source_names[0]].shape == (1, out, cfg.num_channels)


def test_grad_flows():
    cfg = _tiny("full")  # learned upsampling included
    inp, out = shapes.get_padding(cfg, cfg.num_frames)
    params = wu.init_waveunet(jax.random.PRNGKey(0), cfg)
    # NB: must be non-constant input — a spatially constant feature map makes the
    # learned-interp weight gradient identically zero (w*x + (1-w)*x == x).
    mix = jax.random.normal(jax.random.PRNGKey(3), (1, inp, cfg.num_channels)) * 0.1
    target = jnp.zeros((1, out, cfg.num_channels))

    def loss(p):
        y = wu.apply_waveunet(p, cfg, mix, training=True)
        return sum(jnp.mean((y[n] - target) ** 2) for n in cfg.source_names)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    # at least one nonzero grad per layer family
    assert any(float(jnp.max(jnp.abs(x))) > 0 for x in flat)
    assert float(jnp.max(jnp.abs(g["interp_0"]["weights"]))) > 0


def test_bf16_forward_parity_and_train_grad():
    """bf16 compute path: inference output error vs fp32 <= -45 dB (measured
    -50.7/-56.1 dB on a 6-layer full_44KHz variant; bf16's 8-bit mantissa over
    ~25 convs bounds it well above the -96 dB PCM16 floor but far below
    audibility), and the differentiated bf16 conv path produces finite
    gradients (the fp32-accumulation transpose rule rejects mixed dtypes —
    ops/conv.py:conv1d fp32_accum)."""
    import numpy as np
    from waveunet_tpu.ops import shapes as _shapes

    cfg = get_config("full_44KHz", num_layers=6, num_frames=4096,
                     num_initial_filters=16)
    in_len, out_len = _shapes.get_padding(cfg, cfg.num_frames)
    params = wu.init_waveunet(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray((0.3 * np.random.default_rng(0).standard_normal(
        (2, in_len, cfg.num_channels))).astype(np.float32))
    y32 = wu.apply_waveunet(params, cfg, x, training=False)
    yb = wu.apply_waveunet(params, cfg.replace(compute_dtype="bfloat16"), x,
                           training=False)
    for s in cfg.source_names:
        a, b = np.asarray(y32[s]), np.asarray(yb[s])
        err_db = 10 * np.log10(np.sum((a - b) ** 2) / np.sum(a ** 2))
        assert err_db <= -45.0, (s, err_db)

    # training path differentiates in pure bf16
    from waveunet_tpu.train.step import make_train_step
    bcfg = get_config("full_44KHz", num_layers=3, num_frames=512,
                      num_initial_filters=8, compute_dtype="bfloat16",
                      batch_size=2)
    b_in, b_out = _shapes.get_padding(bcfg, bcfg.num_frames)
    bparams = wu.init_waveunet(jax.random.PRNGKey(0), bcfg)
    init_opt, step = make_train_step(bcfg, 1e-4)
    rng = np.random.default_rng(0)
    batch = {s: jnp.asarray(rng.standard_normal(
        (2, b_out, 2)).astype(np.float32)) for s in bcfg.source_names}
    batch["mix"] = jnp.asarray(rng.standard_normal(
        (2, b_in, 2)).astype(np.float32))
    p, _, _, loss = step(bparams, {}, init_opt(bparams), batch,
                         jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree_util.tree_leaves(p))


@pytest.mark.parametrize("kw", [
    # context (valid convs), learned upsampling, difference — flagship shape
    dict(preset="full", num_layers=3, num_frames=512, num_initial_filters=8),
    # same-padding, odd intermediate lengths (100 -> 50 -> 25)
    dict(preset="baseline", num_layers=2, num_frames=100,
         num_initial_filters=6),
    # same-padding deeper, even lengths
    dict(preset="baseline_diff", num_layers=3, num_frames=512,
         num_initial_filters=8),
    # EVEN filter widths: SAME-mode pads are asymmetric (2*lo, 2*hi) —
    # symmetric pads would sample the odd decimation phase (round-2 review)
    dict(preset="baseline", num_layers=2, num_frames=100, filter_size=16,
         merge_filter_size=6, num_initial_filters=6),
    dict(preset="baseline_diff", num_layers=3, num_frames=512, filter_size=4,
         num_initial_filters=8),
    # context mode with an even merge width — the shape walk stays
    # self-consistent here (even filter_size in context mode does not; see
    # test_shapes.py::test_context_even_width_raises)
    dict(preset="full", num_layers=3, num_frames=512, merge_filter_size=6,
         num_initial_filters=8),
])
def test_decimate_lowering_parity(kw, rng):
    """decimate_lowering="dilate" (stride-2 + dilation-2 conv, the default)
    is bit-compatible with the literal strided-slice formulation of the
    reference (`UnetAudioSeparator.py:100`) in BOTH padding modes, including
    odd intermediate lengths, for forward AND gradients."""
    kw = dict(kw)
    cfg = get_config(kw.pop("preset"), **kw)
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    params = wu.init_waveunet(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray((0.3 * rng.standard_normal(
        (2, in_len, cfg.num_channels))).astype(np.float32))

    y_dil = wu.apply_waveunet(params, cfg.replace(decimate_lowering="dilate"),
                              x, training=False)
    y_sli = wu.apply_waveunet(params, cfg.replace(decimate_lowering="slice"),
                              x, training=False)
    for s in cfg.source_names:
        np.testing.assert_allclose(np.asarray(y_dil[s]), np.asarray(y_sli[s]),
                                   atol=1e-6, err_msg=s)

    # gradient parity (training path differentiates through the dilated conv)
    tgt = {s: jnp.asarray((0.1 * rng.standard_normal(
        (2, out_len, cfg.num_channels))).astype(np.float32))
        for s in cfg.source_names}

    def loss(p, lowering):
        out = wu.apply_waveunet(p, cfg.replace(decimate_lowering=lowering),
                                x, training=True)
        return sum(jnp.mean(jnp.square(out[s] - tgt[s]))
                   for s in cfg.source_names)

    g_dil = jax.grad(lambda p: loss(p, "dilate"))(params)
    g_sli = jax.grad(lambda p: loss(p, "slice"))(params)
    paths_a, leaves_a = zip(*[(jax.tree_util.keystr(k), v) for k, v in
                              jax.tree_util.tree_leaves_with_path(g_dil)])
    paths_b, leaves_b = zip(*[(jax.tree_util.keystr(k), v) for k, v in
                              jax.tree_util.tree_leaves_with_path(g_sli)])
    assert paths_a == paths_b
    for pth, va, vb in zip(paths_a, leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=2e-6,
                                   err_msg=pth)


@pytest.mark.parametrize("prec", ["default", "high", "highest"])
def test_conv_precision_forward_parity(prec, rng):
    """conv_precision selects the MXU bf16 pass count; on the CPU backend all
    settings are true fp32, so outputs must be IDENTICAL to the unset
    default — the knob may only change device lowering, never graph math."""
    cfg0 = _tiny("full", infer_num_frames=None)
    cfgp = cfg0.replace(conv_precision=prec)
    params = wu.init_waveunet(jax.random.PRNGKey(3), cfg0)
    in_len, _ = shapes.get_padding(cfg0, cfg0.num_frames)
    x = jnp.asarray(rng.standard_normal((2, in_len, 2)).astype(np.float32))
    want = wu.apply_waveunet(params, cfg0, x, training=False)
    got = wu.apply_waveunet(params, cfgp, x, training=False)
    for name in cfg0.source_names:
        np.testing.assert_array_equal(np.asarray(got[name]),
                                      np.asarray(want[name]), err_msg=name)
