"""Shape-algebra tests: get_padding exactness + forward round-trip.

Golden values derive from the reference formulas (`UnetAudioSeparator.py:34-83`);
SURVEY.md §3.5 documents the canonical context-model walk: desired 16384 =>
input 147443 / output 16389.
"""

import pytest

from waveunet_tpu.config import get_config, preset_names
from waveunet_tpu.ops import shapes


def test_no_context_passthrough():
    cfg = get_config("baseline")
    assert shapes.get_padding(cfg, 16384) == (16384, 16384)
    assert shapes.context_pad(cfg, 16384) == 0


def test_context_golden_16384():
    # SURVEY.md §3.5: 12 layers, filters 15/5/1, desired 16384.
    cfg = get_config("baseline_context")
    inp, out = shapes.get_padding(cfg, 16384)
    assert (inp, out) == (147443, 16389)


def test_context_output_at_least_desired():
    for name in preset_names():
        cfg = get_config(name)
        if cfg.network != "unet":
            continue
        inp, out = shapes.get_padding(cfg, cfg.num_frames)
        assert out >= cfg.num_frames
        assert inp >= out
        # Reference asserts even total padding (`Test.py:25`).
        assert (inp - out) % 2 == 0, name


@pytest.mark.parametrize("preset", [
    "baseline_context", "full", "full_44KHz", "full_multi_instrument",
    "baseline_context_smallfilter_deep", "baseline_comparison",
])
def test_forward_roundtrip_context(preset):
    """get_padding's inverse walk must agree with a forward length simulation."""
    cfg = get_config(preset)
    inp, out = shapes.get_padding(cfg, cfg.num_frames)
    assert shapes.forward_output_len(cfg, inp) == out


def test_forward_roundtrip_same_padding():
    cfg = get_config("baseline")
    assert shapes.forward_output_len(cfg, 16384) == 16384


@pytest.mark.parametrize("frames", [4000, 8192, 16384, 44100, 100000])
def test_roundtrip_many_sizes(frames):
    cfg = get_config("baseline_context")
    inp, out = shapes.get_padding(cfg, frames)
    assert out >= frames
    assert shapes.forward_output_len(cfg, inp) == out


def test_primitive_identities():
    assert shapes.decimate_out(101) == 51
    assert shapes.decimate_out(100) == 50
    assert shapes.down_out(100, 15, True) == 86
    assert shapes.down_out(100, 15, False) == 100
    assert shapes.upsample_out(50, True) == 99
    assert shapes.upsample_out(50, False) == 100


def test_too_small_output_raises():
    # With merge_filter_size=5 the output->bottleneck walk converges to 5, so
    # even num_frames=1 is representable; the small-filter config (merge 1)
    # genuinely underflows the reference's x >= 2 assert.
    cfg = get_config("baseline_context_smallfilter_deep")
    with pytest.raises(ValueError):
        shapes.get_padding(cfg, 1)


def test_roundtrip_fuzz_random_architectures():
    """get_padding's inverse walk agrees with forward simulation for random
    (layers, filter sizes, frames) combinations, not just the presets."""
    import numpy as np
    rng = np.random.default_rng(1234)
    checked = 0
    for _ in range(60):
        cfg = get_config(
            "baseline_context",
            num_layers=int(rng.integers(2, 13)),
            filter_size=int(rng.integers(2, 22)),
            merge_filter_size=int(rng.integers(1, 12)),
            output_filter_size=int(rng.integers(1, 6)),
        )
        frames = int(rng.integers(64, 50000))
        try:
            inp, out = shapes.get_padding(cfg, frames)
        except ValueError:
            # architecture can't produce this output size, or the config is
            # outside the walk's domain (even widths flipping intermediate
            # parities — rejected by get_padding's consistency gate)
            continue
        # NB: `out >= frames` is NOT an invariant of the reference math — for
        # even merge filters the ceil'd backward walk can land slightly below
        # the desired frames (e.g. L=2, merge=10, 1718 -> 1715). num_frames is
        # documented as "DESIRED" (`Config.py:27`); the binding contract is
        # only that the forward pass reproduces get_padding's output length.
        assert shapes.forward_output_len(cfg, inp) == out
        checked += 1
    # Most draws must still be valid (even-width draws are the ones the
    # consistency gate may reject).
    assert checked > 25


def test_same_padding_divisibility_validated():
    """Same-padding (context=False) needs num_frames % 2^layers == 0 — the
    reference asserts this at graph build (`UnetAudioSeparator.py:121`); we
    surface it as an upfront config error."""
    cfg = get_config("baseline", num_layers=4)
    with pytest.raises(ValueError, match="divisible"):
        shapes.get_padding(cfg, 921)
    assert shapes.get_padding(cfg, 928) == (928, 928)
    # spectrogram configs pass through untouched
    u7 = get_config("unet_spectrogram")
    assert shapes.get_padding(u7, u7.num_frames)[0] == u7.num_frames


def test_spectrogram_frame_divisibility_validated():
    u7 = get_config("unet_spectrogram")  # 6 layers, 128 frames: valid
    assert shapes.get_padding(u7, u7.num_frames) == (u7.num_frames,
                                                     u7.num_frames)
    with pytest.raises(ValueError, match="STFT frames"):
        shapes.get_padding(u7, 768 * 100 + 1024)  # 101 frames, not /64


def test_auto_infer_frames():
    from waveunet_tpu.config import get_config
    from waveunet_tpu.ops.shapes import auto_infer_frames, get_padding

    cfg = get_config("full_44KHz")
    frames = auto_infer_frames(cfg)
    assert frames == 65536  # the measured/tuned window (DESIGN.md)
    in_len, out_len = get_padding(cfg, frames)
    assert in_len / out_len <= 3.0
    # half the window would exceed the overlap bound
    i2, o2 = get_padding(cfg, frames // 2)
    assert i2 / o2 > 3.0
    # non-context models pass through
    ncfg = get_config("baseline")
    assert auto_infer_frames(ncfg) == ncfg.num_frames


def test_engine_accepts_auto_window():
    import jax
    from waveunet_tpu.config import get_config
    from waveunet_tpu.infer.engine import Separator
    from waveunet_tpu.models.waveunet import init_waveunet
    from waveunet_tpu.ops.shapes import auto_infer_frames, get_padding

    cfg = get_config("baseline_context", num_layers=3, num_frames=256,
                     infer_num_frames=-1)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    sep = Separator(cfg, params)
    want_in, want_out = get_padding(cfg, auto_infer_frames(cfg))
    assert (sep.in_len, sep.out_len) == (want_in, want_out)


def test_context_even_width_raises():
    """Even conv widths flip intermediate parities, taking the config outside
    the reference's inverse shape walk (which models decimation as 2m-1,
    `UnetAudioSeparator.py:70`); get_padding's consistency gate must reject
    them instead of returning shapes the network contradicts."""
    import pytest

    from waveunet_tpu.config import get_config
    from waveunet_tpu.ops.shapes import forward_output_len, get_padding

    for kw in (dict(filter_size=16), dict(filter_size=4),
               dict(filter_size=5, merge_filter_size=6)):
        cfg = get_config("full", num_layers=3, num_frames=512,
                         num_initial_filters=8, **kw)
        with pytest.raises(ValueError, match="shape algebra"):
            get_padding(cfg, 512)

    # ...but self-consistent even-width combos stay allowed
    cfg = get_config("full", num_layers=3, num_frames=512,
                     num_initial_filters=8, merge_filter_size=6)
    in_len, out_len = get_padding(cfg, 512)
    assert forward_output_len(cfg, in_len) == out_len
