"""Inference engine tests: window math, stitching parity with a naive serial
loop (the reference's semantics), file-level separation end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waveunet_tpu.config import get_config
from waveunet_tpu.infer.engine import Separator, window_positions
from waveunet_tpu.models.waveunet import apply_waveunet, init_waveunet
from waveunet_tpu.ops import shapes


def frame_windows(padded, positions, in_len):
    """Test helper (formerly production code — framing moved on-device):
    gather [n_win, in_len, ch] windows from context-padded audio."""
    view = np.lib.stride_tricks.sliding_window_view(padded, in_len, axis=0)
    wins = view[positions]                      # [n_win, ch, in_len]
    return np.ascontiguousarray(np.transpose(wins, (0, 2, 1)))


def test_window_positions_right_aligned():
    pos = window_positions(1000, 300)
    np.testing.assert_array_equal(pos, [0, 300, 600, 700])
    pos = window_positions(900, 300)
    np.testing.assert_array_equal(pos, [0, 300, 600])


def test_frame_windows(rng):
    x = rng.standard_normal((50, 2)).astype(np.float32)
    padded = np.pad(x, [(5, 5), (0, 0)])
    pos = window_positions(50, 10)
    wins = frame_windows(padded, pos, 20)
    assert wins.shape == (5, 20, 2)
    np.testing.assert_array_equal(wins[1], padded[10:30])


@pytest.mark.parametrize("preset", ["baseline", "baseline_context"])
def test_stitching_matches_serial_reference_loop(rng, preset):
    """Batched sweep must produce byte-identical output to the reference's
    serial per-window loop (`Evaluate.py:125-139`).

    infer_num_frames=None pins the reference's inference window (the Config
    default -1 auto-tunes a larger window, which is quality-equivalent but
    changes decimation phases, so it cannot be byte-compared to this oracle).
    """
    cfg = get_config(preset, num_layers=3, num_frames=256, infer_batch=4,
                     infer_num_frames=None)
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    n = out_len * 5 + 17  # non-multiple => right-aligned last window
    audio = (0.1 * rng.standard_normal((n, 1))).astype(np.float32)

    sep = Separator(cfg, params)
    got = sep.separate(audio, cfg.expected_sr)

    # Naive serial oracle with identical semantics.
    pad = (in_len - out_len) // 2
    padded = np.pad(audio, [(pad, pad), (0, 0)])
    preds = {s: np.zeros_like(audio) for s in cfg.source_names}
    for p0 in range(0, n, out_len):
        if p0 + out_len > n:
            p0 = n - out_len
        part = padded[p0:p0 + in_len][None]
        out = apply_waveunet(params, cfg, jnp.asarray(part), training=False)
        for s in cfg.source_names:
            preds[s][p0:p0 + out_len] = np.asarray(out[s][0])

    for s in cfg.source_names:
        np.testing.assert_allclose(got[s], preds[s], atol=1e-5)


def test_short_song_padding(rng):
    cfg = get_config("baseline", num_layers=3, num_frames=256, infer_batch=2)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    sep = Separator(cfg, params)
    n = 100  # far shorter than the network input
    audio = (0.1 * rng.standard_normal((n, 1))).astype(np.float32)
    got = sep.separate(audio, cfg.expected_sr)
    for v in got.values():
        assert v.shape == (n, 1)


def test_stereo_duplication(rng):
    cfg = get_config("baseline_stereo", num_layers=3, num_frames=256)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    sep = Separator(cfg, params)
    audio = (0.1 * rng.standard_normal((3000, 1))).astype(np.float32)  # mono in
    got = sep.separate(audio, cfg.expected_sr)
    for v in got.values():
        assert v.shape[1] == 2  # model is stereo; mono input duplicated


def test_separate_file_end_to_end(tmp_path, rng):
    from waveunet_tpu.data.audio_io import load, write_wav
    from waveunet_tpu.infer.engine import separate_file

    cfg = get_config("baseline", num_layers=3, num_frames=256)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    n = 5000
    audio = np.clip(0.3 * rng.standard_normal((n, 1)), -1, 1).astype(np.float32)
    src = str(tmp_path / "mix.wav")
    write_wav(src, audio, cfg.expected_sr)
    written = separate_file(cfg, params, src, output_path=str(tmp_path / "out"))
    assert set(written) == set(cfg.source_names)
    for p in written.values():
        y, sr = load(p, sr=None, mono=False)
        assert sr == cfg.expected_sr
        assert y.shape[0] == n


def test_spectrogram_stitching_matches_serial_loop(rng):
    """U7 through the engine == naive serial per-window loop (mask/iSTFT path)."""
    from waveunet_tpu.models.spectrogram_unet import (apply_spectrogram_unet,
                                                      init_spectrogram_unet)

    cfg = get_config("unet_spectrogram", num_layers=3,
                     num_frames=768 * 15 + 1024, infer_batch=3)
    params, state = init_spectrogram_unet(jax.random.PRNGKey(0), cfg)
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    n = out_len * 3 + 123
    audio = (0.2 * rng.standard_normal((n, 1))).astype(np.float32)

    got = Separator(cfg, params, model_state=state).separate(
        audio, cfg.expected_sr)

    preds = {s: np.zeros_like(audio) for s in cfg.source_names}
    for p0 in range(0, n, out_len):
        if p0 + out_len > n:
            p0 = n - out_len
        part = audio[p0:p0 + in_len]
        if part.shape[0] < in_len:  # same-padding net: pad==0, tail window
            part = np.pad(part, [(0, in_len - part.shape[0]), (0, 0)])
        out, _ = apply_spectrogram_unet(params, cfg, jnp.asarray(part[None]),
                                        training=False, state=state)
        for s in cfg.source_names:
            y = np.asarray(out[s][0])
            if y.shape[0] < out_len:
                y = np.pad(y, [(0, out_len - y.shape[0]), (0, 0)])
            preds[s][p0:p0 + out_len] = y

    for s in cfg.source_names:
        np.testing.assert_allclose(got[s], preds[s], atol=1e-4, err_msg=s)


def test_infer_num_frames_override(rng):
    """A larger inference window still produces valid full-length output (not
    bit-identical to the training-window sweep — decimation phases differ —
    but the same shape/energy scale) and in/out lengths follow get_padding."""
    cfg = get_config("baseline_context", num_layers=3, num_frames=256,
                     infer_num_frames=None)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    big = cfg.replace(infer_num_frames=1024, infer_batch=2)
    sep_small = Separator(cfg, params)
    sep_big = Separator(big, params)
    assert (sep_big.in_len, sep_big.out_len) == shapes.get_padding(big, 1024)
    assert sep_big.out_len > sep_small.out_len

    n = 5000
    audio = (0.1 * rng.standard_normal((n, 1))).astype(np.float32)
    a = sep_small.separate(audio, cfg.expected_sr)
    b = sep_big.separate(audio, cfg.expected_sr)
    for s in cfg.source_names:
        assert a[s].shape == b[s].shape == (n, 1)
        assert np.all(np.isfinite(b[s]))
        # same model, same signal: comparable output energy
        ra = float(np.sqrt((a[s] ** 2).mean()))
        rb = float(np.sqrt((b[s] ** 2).mean()))
        assert 0.2 < (rb + 1e-9) / (ra + 1e-9) < 5.0


def test_auto_window_interior_invariance(rng):
    """The -1 auto-window default (`Config.infer_num_frames`) is
    quality-equivalent to the reference's training-window sweep: on a
    shift-invariant (constant) signal, where decimation phase cannot matter,
    the stitched outputs agree to fp tolerance over the song interior (edge
    samples see the zero context pad at differing phases)."""
    cfg_auto = get_config("baseline_context", num_layers=3, num_frames=256,
                          infer_batch=2)
    cfg_ref = cfg_auto.replace(infer_num_frames=None)
    params = init_waveunet(jax.random.PRNGKey(0), cfg_auto)
    sep_auto = Separator(cfg_auto, params)
    sep_ref = Separator(cfg_ref, params)
    assert sep_auto.out_len > sep_ref.out_len  # the default really retunes
    n = 5000
    audio = np.full((n, 1), 0.3, np.float32)
    a = sep_auto.separate(audio, cfg_auto.expected_sr)
    b = sep_ref.separate(audio, cfg_ref.expected_sr)
    pad = max(sep_auto.pad, sep_ref.pad)
    for s in cfg_auto.source_names:
        np.testing.assert_allclose(a[s][pad:n - pad], b[s][pad:n - pad],
                                   atol=1e-5, err_msg=s)


def test_bundled_reference_wav_end_to_end(tmp_path, bundled_wav):
    """Separate the WAV that ships with the reference repo (SURVEY.md §4's
    suggested fixture): full file -> per-source WAVs, correct length/sr."""
    from waveunet_tpu.data.audio_io import load
    from waveunet_tpu.infer.engine import separate_file

    cfg = get_config("baseline", num_layers=4, num_frames=4096)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    written = separate_file(cfg, params, bundled_wav,
                            output_path=str(tmp_path))
    mix, sr = load(bundled_wav, sr=None, mono=False)
    assert sr == cfg.expected_sr == 22050
    for name, p in written.items():
        y, ysr = load(p, sr=None, mono=False)
        assert ysr == sr and y.shape == mix.shape
        assert np.all(np.abs(y) <= 1.0)


def test_slab_mode_matches_song_mode(rng):
    """Pipelined per-chunk slab H2D produces exactly the song-mode output
    (same windows, same program shapes -> bitwise on CPU)."""
    cfg = get_config("baseline_context", num_layers=3, num_frames=256,
                     infer_batch=4)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    _, out_len = shapes.get_padding(cfg, cfg.num_frames)
    audio = (0.1 * rng.standard_normal((out_len * 13 + 31, 1))
             ).astype(np.float32)
    song = Separator(cfg, params, h2d_mode="song").separate(
        audio, cfg.expected_sr)
    slabs = Separator(cfg, params, h2d_mode="slabs").separate(
        audio, cfg.expected_sr)
    for s in cfg.source_names:
        np.testing.assert_array_equal(slabs[s], song[s], err_msg=s)


def test_slab_mode_matches_song_mode_int16_wire(rng):
    cfg = get_config("baseline_context", num_layers=3, num_frames=256,
                     infer_batch=4, infer_wire_dtype="int16")
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    _, out_len = shapes.get_padding(cfg, cfg.num_frames)
    audio = (0.1 * rng.standard_normal((out_len * 9 + 7, 1))
             ).astype(np.float32)
    song = Separator(cfg, params, h2d_mode="song").separate(
        audio, cfg.expected_sr)
    slabs = Separator(cfg, params, h2d_mode="slabs").separate(
        audio, cfg.expected_sr)
    for s in cfg.source_names:
        np.testing.assert_array_equal(slabs[s], song[s], err_msg=s)


def test_precompile_covers_chunk_programs(rng):
    """precompile() exercises every pow2 chunk size in both H2D modes; a
    following separate() of an awkward window count introduces no new
    program shapes (asserted via the engine's own dispatch path)."""
    cfg = get_config("baseline_context", num_layers=3, num_frames=256,
                     infer_batch=4)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    sep = Separator(cfg, params)
    _, out_len = shapes.get_padding(cfg, cfg.num_frames)
    n = sep.precompile(max_song_s=(Separator._LEN_BUCKET - 2 * sep.pad - 1)
                       / cfg.expected_sr)
    # 1 bucket x (1,2,4) song-mode + (1,2,4) slab-mode
    assert n == 6
    audio = (0.1 * rng.standard_normal((out_len * 7 + 5, 1))
             ).astype(np.float32)  # 7 windows -> chunks of 4, 2, 1
    out = sep.separate(audio, cfg.expected_sr)
    assert out[cfg.source_names[0]].shape[0] == audio.shape[0]


@pytest.mark.parametrize("preset,kw", [
    # learned interpolation + difference output + stereo (M5 family)
    ("full", dict(num_layers=3, num_frames=256, num_initial_filters=6)),
    # 4 sources, linear upsampling, stereo (M6 family)
    ("full_multi_instrument",
     dict(num_layers=3, num_frames=256, num_initial_filters=6)),
    # small merge filter, deeper (smallfilter_deep family, scaled down)
    ("baseline_context_smallfilter_deep",
     dict(num_layers=4, num_frames=256, num_initial_filters=6)),
])
def test_stitching_matches_serial_all_families(rng, preset, kw):
    """Differential sweep vs the serial reference loop across the remaining
    architecture families, at pathological song lengths: exactly one window,
    one-sample overhang, and shorter than the network input (extra-pad
    path)."""
    # infer_num_frames=None pins the oracle's training window (the -1 auto
    # default retunes the window; quality-equal, not byte-comparable)
    cfg = get_config(preset, infer_batch=4, infer_num_frames=None, **kw)
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    ch = cfg.num_channels
    sep = Separator(cfg, params)
    pad = (in_len - out_len) // 2

    for n in (out_len, out_len + 1, 3 * out_len + 7, max(1, out_len - 5)):
        audio = (0.1 * rng.standard_normal((n, ch))).astype(np.float32)
        got = sep.separate(audio, cfg.expected_sr)

        # serial oracle, incl. the short-song zero-pad (`Evaluate.py:107-111`)
        a = audio
        if a.shape[0] < in_len:
            a = np.pad(a, [(0, in_len - a.shape[0]), (0, 0)])
        m = a.shape[0]
        padded = np.pad(a, [(pad, pad), (0, 0)])
        preds = {s: np.zeros((m, ch), np.float32) for s in cfg.source_names}
        for p0 in range(0, m, out_len):
            if p0 + out_len > m:
                p0 = m - out_len
            part = padded[p0:p0 + in_len][None]
            out = apply_waveunet(params, cfg, jnp.asarray(part),
                                 training=False)
            for s in cfg.source_names:
                preds[s][p0:p0 + out_len] = np.asarray(out[s][0])

        for s in cfg.source_names:
            np.testing.assert_allclose(got[s], preds[s][:n], atol=1e-5,
                                       err_msg=f"{preset} n={n} {s}")


@pytest.mark.parametrize("wire,n_win", [
    ("float32", 13), ("int16", 13),
    # sub-batch song: fewer windows than one device batch, so the engine
    # runs one exact-size chunk instead of the pow2 split tail (the regime
    # the U7 bench row and the big-window probe points hit; the 41-window
    # flagship headline keeps the pow2 [16,16,8,1] schedule)
    ("int16", 3),
])
def test_resident_sweep_matches_host_stitch(rng, wire, n_win):
    """The single-program device-resident sweep (bench.py's
    tunnel-independent engine headline path) produces the production
    host-stitched output: same pow2 chunk schedule (except the sub-batch
    song case, which runs one exact chunk — engine.py resident_sweep
    docstring), same wire round-trip, same overlap semantics, difference
    source included."""
    # difference output: the host-reconstruction path is covered too
    cfg = get_config("baseline", num_layers=3, num_frames=256, infer_batch=4,
                     infer_num_frames=None, infer_wire_dtype=wire,
                     output_type="difference")
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)

    sep = Separator(cfg, params)
    pad = (in_len - out_len) // 2
    # 13 windows: three full batches + a 1 tail, right-aligned last;
    # 3 windows: no full batch — the single exact-3 chunk path
    n = out_len * (n_win - 1) + 31
    audio = (0.1 * rng.standard_normal((n, 1))).astype(np.float32)
    host = sep.separate(audio, cfg.expected_sr)

    padded = np.pad(audio, [(pad, pad), (0, 0)])
    if wire == "int16":
        from waveunet_tpu.runtime import native
        padded = native.quantize_int16(padded)
    fn, positions = sep.resident_sweep(n)
    assert positions.shape[0] == n_win
    out, checksum = fn(params, jnp.asarray(padded))
    assert np.isfinite(float(checksum))
    for s in cfg.source_names:
        # int16 wire: the host path reconstructs the difference source from
        # the ORIGINAL float mix, the device path from the wire-quantised
        # mix — up to 1 LSB (3.05e-5) apart, inside the PCM16 output floor
        # either way (engine.py difference-output note).
        tol = 4e-5 if (wire == "int16"
                       and s == cfg.source_names[-1]) else 2e-6
        np.testing.assert_allclose(np.asarray(out[s]), host[s], atol=tol,
                                   err_msg=s)


@pytest.mark.parametrize("wire", ["float32", "int16"])
def test_nonfinite_model_output_not_laundered(rng, wire, tmp_path):
    """A diverged model (NaN output) must surface as NaN on BOTH wire
    dtypes — the int16 cast otherwise launders NaN into finite garbage PCM
    (round-5 review finding). write_wav then rejects it loudly."""
    from waveunet_tpu.data.audio_io import write_wav

    cfg = get_config("baseline", num_layers=3, num_frames=256, infer_batch=2,
                     infer_num_frames=None, infer_wire_dtype=wire)
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)

    def nan_forward(p, x):
        v = jnp.full((x.shape[0], out_len, cfg.num_channels), jnp.nan)
        return {s: v for s in cfg.source_names}

    sep = Separator(cfg, params, forward_fn=nan_forward)
    audio = (0.1 * rng.standard_normal((out_len * 3, 1))).astype(np.float32)
    out = sep.separate(audio, cfg.expected_sr)
    for s in cfg.source_names:
        assert np.isnan(out[s]).all(), (wire, s)
        with pytest.raises(ValueError, match="non-finite"):
            write_wav(str(tmp_path / f"{s}.wav"), out[s], cfg.expected_sr)


def test_resident_sweep_chunk_sizes_override(rng):
    """The explicit chunk_sizes override (tools/engine_probe.py's pow2split
    A/B) matches the production schedule's output for any covering schedule
    (to fp reduction-order noise — conv batch size changes the summation
    order, ~1e-8), and rejects schedules that under-cover the windows."""
    cfg = get_config("baseline", num_layers=3, num_frames=256, infer_batch=4,
                     infer_num_frames=None, output_type="difference")
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    sep = Separator(cfg, params)
    pad = (in_len - out_len) // 2
    n = out_len * 2 + 17  # 3 windows
    audio = (0.1 * rng.standard_normal((n, 1))).astype(np.float32)
    padded = jnp.asarray(np.pad(audio, [(pad, pad), (0, 0)]))

    prod_fn, _ = sep.resident_sweep(n)  # production: single exact [3] chunk
    base, _ = prod_fn(params, padded)
    for sizes in ([2, 1], [4]):  # forced pow2 split / padded over-cover
        alt_fn, _ = sep.resident_sweep(n, chunk_sizes=sizes)
        out, _ = alt_fn(params, padded)
        for s in cfg.source_names:
            np.testing.assert_allclose(np.asarray(out[s]),
                                       np.asarray(base[s]), atol=1e-6,
                                       err_msg=f"{sizes} {s}")
    with pytest.raises(ValueError, match="cover"):
        sep.resident_sweep(n, chunk_sizes=[2])


def test_resident_sweep_too_short_raises(rng):
    cfg = get_config("baseline", num_layers=3, num_frames=256,
                     infer_num_frames=None)
    _, out_len = shapes.get_padding(cfg, cfg.num_frames)
    sep = Separator(cfg, init_waveunet(jax.random.PRNGKey(0), cfg))
    with pytest.raises(ValueError, match="shorter than one output window"):
        sep.resident_sweep(out_len - 1)


def test_resident_sweep_spectrogram_family(rng):
    """bench.py's U7 family row drives resident_sweep with the spectrogram
    forward (BN state, mask/iSTFT, no difference reconstruction) — pin that
    path against the production host-stitched output."""
    from waveunet_tpu.models.spectrogram_unet import init_spectrogram_unet

    cfg = get_config("unet_spectrogram", num_layers=3,
                     num_frames=768 * 15 + 1024, infer_batch=2,
                     infer_num_frames=None, num_initial_filters=4)
    params, state = init_spectrogram_unet(jax.random.PRNGKey(0), cfg)
    sep = Separator(cfg, params, model_state=state)
    n = sep.out_len * 2 + 917  # 3 windows: full batch + right-aligned tail
    audio = (0.1 * rng.standard_normal((n, 1))).astype(np.float32)
    host = sep.separate(audio, cfg.expected_sr)

    padded = np.pad(audio, [(sep.pad, sep.pad), (0, 0)])
    fn, positions = sep.resident_sweep(n)
    assert positions.shape[0] == 3
    out, checksum = fn(params, jnp.asarray(padded))
    assert np.isfinite(float(checksum))
    for s in cfg.source_names:
        np.testing.assert_allclose(np.asarray(out[s]), host[s], atol=2e-6,
                                   err_msg=s)
