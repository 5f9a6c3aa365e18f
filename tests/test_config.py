"""Config system tests: presets, overrides, derived fields, round-trips."""

import json

import pytest

from waveunet_tpu.config import Config, config_from_cli, get_config, preset_names


def test_all_presets_construct():
    assert len(preset_names()) == 11
    for name in preset_names():
        cfg = get_config(name)
        assert cfg.num_sources == len(cfg.source_names)


def test_derived_fields():
    cfg = get_config("full_multi_instrument")
    assert cfg.source_names == ("bass", "drums", "other", "vocals")
    assert cfg.num_sources == 4
    assert cfg.num_channels == 2
    cfg = get_config("baseline")
    assert cfg.source_names == ("accompaniment", "vocals")
    assert cfg.num_channels == 1


def test_preset_values_match_reference():
    """Spot-check preset deltas against `/root/reference/Config.py:52-161`."""
    full = get_config("full_44KHz")
    assert (full.output_type, full.context, full.upsampling,
            full.mono_downmix, full.expected_sr) == (
        "difference", True, "learned", False, 44100)
    comp = get_config("baseline_comparison")
    assert (comp.batch_size, comp.num_frames, comp.expected_sr,
            comp.num_initial_filters) == (4, 768 * 127 + 1024, 8192, 34)
    u7a = get_config("unet_spectrogram_l1")
    assert u7a.network == "unet_spectrogram" and not u7a.raw_audio_loss
    deep = get_config("baseline_context_smallfilter_deep")
    assert (deep.num_layers, deep.filter_size, deep.merge_filter_size,
            deep.duration) == (14, 5, 1, 7)


def test_cli_grammar():
    cfg = config_from_cli(["baseline_diff", "batch_size=4",
                           "expected_sr=8192", "augmentation=false"])
    assert cfg.output_type == "difference"
    assert cfg.batch_size == 4 and cfg.expected_sr == 8192
    assert cfg.augmentation is False


def test_json_roundtrip():
    cfg = get_config("full", batch_size=3)
    d = json.loads(cfg.to_json())
    cfg2 = Config.from_dict(d)
    assert cfg2 == cfg


def test_invalid_values_rejected():
    with pytest.raises(NotImplementedError):
        get_config("baseline", task="karaoke")
    with pytest.raises(NotImplementedError):
        get_config("baseline", output_type="both")
    from waveunet_tpu.config import ConfigError
    with pytest.raises(ConfigError, match="unknown preset"):
        get_config("nonexistent")
    with pytest.raises(ConfigError, match="bad config override"):
        get_config("baseline", not_a_real_key=1)
    with pytest.raises(NotImplementedError):
        get_config("baseline", conv_precision="bfloat16")  # not a Precision
    for ok in (None, "default", "high", "highest"):
        assert get_config("baseline", conv_precision=ok).conv_precision == ok


def test_nonpositive_core_fields_rejected():
    """Zero/negative core numerics pass the same-padding shape algebra and
    only explode far downstream (empty batches, zero-width convs,
    Fraction(sr, 0) in the resampler) — they must be rejected at config
    time. Sentinel-valued fields keep their special values."""
    from waveunet_tpu.config import Config, ConfigError

    for field in ("num_layers", "num_frames", "filter_size",
                  "merge_filter_size", "output_filter_size",
                  "num_initial_filters", "batch_size", "expected_sr",
                  "epoch_it", "infer_batch"):
        # through the override surface: the typed ConfigError the CLI
        # prints as a one-line message
        with pytest.raises(ConfigError, match=field):
            get_config("baseline", **{field: 0})
    with pytest.raises(ConfigError, match="num_layers"):
        get_config("baseline", num_layers=-1)
    # direct construction keeps the plain ValueError
    with pytest.raises(ValueError, match="batch_size"):
        Config(batch_size=0)
    # documented sentinels still construct
    assert get_config("baseline", scan_chunk=0).scan_chunk == 0
    assert get_config("baseline", keep_checkpoints=0).keep_checkpoints == 0
    assert get_config("baseline", infer_num_frames=-1).infer_num_frames == -1
    assert get_config("baseline", infer_num_frames=None).infer_num_frames is None
