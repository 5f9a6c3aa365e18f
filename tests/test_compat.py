"""Checkpoint-compatibility tests: TF zoo-layout checkpoint -> pytree -> forward
parity against a TF-computed golden output.

Fixtures under tests/golden/waveunet_tf/ are produced by gen_waveunet_tf.py,
which builds the reference network math in TF with the zoo's exact variable
naming, so this test validates BOTH the name/layout mapping and the model
forward bit-for-bit (within fp32 conv tolerance).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waveunet_tpu.compat.tf_checkpoint import load_tf_waveunet, tf_var_prefix
from waveunet_tpu.config import get_config
from waveunet_tpu.models.waveunet import apply_waveunet

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "waveunet_tf")

_CASES = {
    "context_learned_diff_stereo": dict(
        preset="full", num_layers=3, num_frames=512, num_initial_filters=8),
    "same_linear_direct_mono": dict(
        preset="baseline", num_layers=3, num_frames=512,
        num_initial_filters=8),
    # the full M5-HighSR production architecture (12 layers, 10.2M params)
    "full_44khz_production": dict(preset="full_44KHz"),
    # even conv widths, SAME mode (dilate lowering's asymmetric pads vs TF)
    "same_evenfilter_mono": dict(
        preset="baseline", num_layers=3, num_frames=512, filter_size=16,
        merge_filter_size=6, num_initial_filters=6),
}


def test_name_mapping():
    cfg = get_config("full", num_layers=3)
    assert tf_var_prefix(cfg, "down_0") == "separator/conv1d"
    assert tf_var_prefix(cfg, "down_2") == "separator/conv1d_2"
    assert tf_var_prefix(cfg, "bottleneck") == "separator/conv1d_3"
    assert tf_var_prefix(cfg, "up_0") == "separator/conv1d_4"
    assert tf_var_prefix(cfg, "up_2") == "separator/conv1d_6"
    assert tf_var_prefix(cfg, "interp_1") == "separator/interp_1"
    # voice difference output: only the first source has a conv
    assert tf_var_prefix(cfg, "out_accompaniment") == "separator/conv1d_7"


@pytest.mark.parametrize("case", sorted(_CASES))
def test_tf_checkpoint_forward_parity(case):
    npz = os.path.join(_GOLDEN, f"{case}.npz")
    ckpt = os.path.join(_GOLDEN, case, "model.ckpt")
    if not os.path.exists(npz):
        pytest.skip("golden fixtures missing; run tests/golden/gen_waveunet_tf.py")
    kw = dict(_CASES[case])
    cfg = get_config(kw.pop("preset"), **kw)

    params = load_tf_waveunet(ckpt, cfg)
    z = np.load(npz)
    mix = jnp.asarray(z["mix"])
    out = apply_waveunet(params, cfg, mix, training=False)
    for name in cfg.source_names:
        want = z[f"out_{name}"]
        got = np.asarray(out[name])
        assert got.shape == want.shape, (name, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"{case}/{name}")


def test_missing_variable_raises(tmp_path):
    cfg = get_config("baseline", num_layers=3, num_initial_filters=8)
    with pytest.raises((RuntimeError, KeyError)):
        load_tf_waveunet(str(tmp_path / "nonexistent.ckpt"), cfg,
                         arrays={})


def test_tf_spectrogram_checkpoint_parity():
    """U7 spectrogram checkpoint conversion + inference-mode forward parity vs
    the TF golden (conv2d/transpose/BN/STFT/mask/iSTFT chain end to end)."""
    from waveunet_tpu.compat.tf_checkpoint import load_tf_spectrogram
    from waveunet_tpu.models.spectrogram_unet import apply_spectrogram_unet

    gdir = os.path.join(os.path.dirname(__file__), "golden", "spectro_tf")
    npz = os.path.join(gdir, "golden.npz")
    if not os.path.exists(npz):
        pytest.skip("spectro golden missing; run tests/golden/gen_spectro_tf.py")
    cfg = get_config("unet_spectrogram", num_layers=3,
                     num_frames=768 * 15 + 1024, batch_size=1,
                     num_initial_filters=8)
    params, state = load_tf_spectrogram(os.path.join(gdir, "model.ckpt"), cfg)
    z = np.load(npz)
    out, _ = apply_spectrogram_unet(params, cfg, jnp.asarray(z["mix"]),
                                    training=False, state=state)
    for name in cfg.source_names:
        got = np.asarray(out[name])
        want = z[f"out_{name}"]
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-5, err_msg=name)
