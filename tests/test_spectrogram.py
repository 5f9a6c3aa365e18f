"""Spectrogram U-Net (U7/U7a) tests on a shrunken config."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waveunet_tpu.config import get_config
from waveunet_tpu.models.spectrogram_unet import (apply_spectrogram_unet,
                                                  init_spectrogram_unet)

# 3 layers; 16 time frames (768*15+1024 samples) x 512 freqs halve cleanly.
_CFG = get_config("unet_spectrogram", num_layers=3,
                  num_frames=768 * 15 + 1024, batch_size=1)


@pytest.fixture(scope="module")
def model():
    params, state = init_spectrogram_unet(jax.random.PRNGKey(0), _CFG)
    return params, state


def test_audio_output_shapes(model, rng):
    params, state = model
    mix = jnp.asarray(rng.standard_normal(
        (1, _CFG.num_frames, 1)).astype(np.float32))
    out, new_state = apply_spectrogram_unet(params, _CFG, mix, training=False,
                                            state=state)
    assert set(out) == {"accompaniment", "vocals"}
    for v in out.values():
        assert v.shape == (1, _CFG.num_frames, 1)  # hop*(F-1)+frame == input
    # eval mode must not touch moving stats
    for k in state:
        np.testing.assert_array_equal(np.asarray(new_state[k]["mean"]),
                                      np.asarray(state[k]["mean"]))


def test_magnitude_output_and_mask_range(model, rng):
    params, state = model
    mix = jnp.asarray(rng.standard_normal(
        (1, _CFG.num_frames, 1)).astype(np.float32))
    mags, _ = apply_spectrogram_unet(params, _CFG, mix, training=False,
                                     state=state, return_spectrogram=True)
    from waveunet_tpu.ops.stft import stft_magnitude
    mix_mag = np.asarray(stft_magnitude(mix[..., 0]))
    for v in mags.values():
        assert v.shape == (1, 16, 513)
        # mask in (0,1): source magnitude cannot exceed mixture magnitude
        assert np.all(np.asarray(v) <= mix_mag + 1e-5)
        assert np.all(np.asarray(v) >= 0)


def test_training_updates_bn_stats(model, rng):
    params, state = model
    mix = jnp.asarray(rng.standard_normal(
        (2, _CFG.num_frames, 1)).astype(np.float32))
    _, new_state = apply_spectrogram_unet(params, _CFG, mix, training=True,
                                          state=state,
                                          rng=jax.random.PRNGKey(1))
    moved = any(
        float(jnp.max(jnp.abs(new_state[k]["mean"] - state[k]["mean"]))) > 0
        for k in state)
    assert moved


def test_grad_flows_through_stft(model, rng):
    params, state = model
    mix = jnp.asarray(rng.standard_normal(
        (1, _CFG.num_frames, 1)).astype(np.float32))
    target = jnp.zeros_like(mix)

    def loss(p):
        out, _ = apply_spectrogram_unet(p, _CFG, mix, training=True,
                                        state=state,
                                        rng=jax.random.PRNGKey(0))
        return sum(jnp.mean(jnp.square(out[n] - target))
                   for n in _CFG.source_names)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    assert any(float(jnp.max(jnp.abs(x))) > 0 for x in leaves)


def test_stereo_config_rejected():
    cfg = get_config("unet_spectrogram", mono_downmix=False)
    with pytest.raises(NotImplementedError):
        init_spectrogram_unet(jax.random.PRNGKey(0), cfg)


def test_framing_slack_rejected():
    """Windows with STFT framing slack would stitch periodic silence into the
    output (samples past hop*(F-1)+1024 are never analysed) — get_padding
    must reject them (round-2 review finding)."""
    from waveunet_tpu.ops import shapes

    cfg = get_config("unet_spectrogram", num_layers=3)
    with pytest.raises(ValueError, match="framing slack"):
        shapes.get_padding(cfg, 768 * 15 + 1024 + 500)


def test_separate_file_carries_model_state(model, tmp_path, rng):
    """cli predict's path: separate_file must thread the BN state through to
    the Separator (dropping it crashed spectrogram predict — round-2
    review finding)."""
    from waveunet_tpu.data.audio_io import write_wav
    from waveunet_tpu.infer.engine import separate_file

    params, state = model
    sr = _CFG.expected_sr
    n = _CFG.num_frames + 777
    audio = (0.2 * np.sin(2 * np.pi * 220 * np.arange(n) / sr)
             ).astype(np.float32)[:, None]
    src = tmp_path / "in.wav"
    write_wav(str(src), audio, sr)
    written = separate_file(_CFG, params, str(src),
                            output_path=str(tmp_path / "out"),
                            model_state=state)
    assert set(written) == set(_CFG.source_names)
    from waveunet_tpu.data.audio_io import load
    for p in written.values():
        est, esr = load(p, sr=None, mono=False)
        assert esr == sr and est.shape[0] == n and np.isfinite(est).all()


def test_bf16_compute_parity(model, rng):
    """Opt-in bf16 conv compute (inference only) stays close to fp32.
    Measured on v5e: no speed or output difference at all — XLA:TPU already
    lowers these fp32 convs through bf16 passes (DESIGN.md §1) — so the
    default stays fp32; this pins that the opt-in path works."""
    params, state = model
    cfg16 = _CFG.replace(compute_dtype="bfloat16")
    x = jnp.asarray(0.1 * rng.standard_normal(
        (1, _CFG.num_frames, 1)).astype(np.float32))
    a, _ = apply_spectrogram_unet(params, _CFG, x, training=False,
                                  state=state)
    b, _ = apply_spectrogram_unet(params, cfg16, x, training=False,
                                  state=state)
    for k in a:
        err = float(jnp.max(jnp.abs(a[k] - b[k])))
        assert err < 5e-3, (k, err)
