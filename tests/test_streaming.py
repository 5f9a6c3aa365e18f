"""Streaming separation tests: chunked pushes match offline separation."""

import numpy as np
import jax
import pytest

from waveunet_tpu.config import get_config
from waveunet_tpu.infer.engine import Separator
from waveunet_tpu.infer.streaming import StreamingSeparator
from waveunet_tpu.models.waveunet import init_waveunet


@pytest.fixture(scope="module")
def setup():
    # infer_num_frames=None: the stream runs at the training window, so the
    # offline oracle must too (the -1 auto default picks a larger window
    # whose decimation phases differ — quality-equal, not byte-equal).
    cfg = get_config("baseline_context", num_layers=3, num_frames=256,
                     infer_num_frames=None)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    n = 2000
    rng = np.random.default_rng(1337)  # module-local (rng fixture is per-test)
    audio = (0.1 * rng.standard_normal((n, 1))).astype(np.float32)
    return cfg, params, audio


@pytest.mark.parametrize("chunk_size", [37, 256, 999])
def test_stream_matches_offline(setup, chunk_size):
    cfg, params, audio = setup
    offline = Separator(cfg, params).separate(audio, cfg.expected_sr)

    stream = StreamingSeparator(cfg, params)
    got = {s: [] for s in cfg.source_names}
    for i in range(0, audio.shape[0], chunk_size):
        out = stream.push(audio[i:i + chunk_size])
        for s, v in out.items():
            got[s].append(v)
    out = stream.flush()
    for s, v in out.items():
        got[s].append(v)
    got = {s: np.concatenate(v) for s, v in got.items()}

    # the offline engine right-aligns its FINAL window into future context and
    # overwrites [n - out_len, n); a stream cannot see that future, so exact
    # equality holds for everything before that region.
    n_cmp = audio.shape[0] - stream.out_len
    for s in cfg.source_names:
        assert got[s].shape[0] == audio.shape[0]
        np.testing.assert_allclose(got[s][:n_cmp], offline[s][:n_cmp],
                                   atol=1e-5, err_msg=s)


def test_stream_incremental_availability(setup):
    cfg, params, audio = setup
    stream = StreamingSeparator(cfg, params)
    # pushing less than one full window yields nothing
    out = stream.push(audio[:stream.out_len // 2])
    assert out[cfg.source_names[0]].shape[0] == 0
    # after enough samples for one window, exactly out_len samples emerge
    need = stream.in_len - stream.pad - stream.out_len // 2
    out = stream.push(audio[stream.out_len // 2:stream.out_len // 2 + need])
    assert out[cfg.source_names[0]].shape[0] == stream.out_len


def test_stream_reset(setup):
    cfg, params, audio = setup
    stream = StreamingSeparator(cfg, params)
    stream.push(audio[:500])
    stream.reset()
    out = stream.push(audio[:10])
    assert out[cfg.source_names[0]].shape[0] == 0
    assert stream.latency_samples == stream.out_len + stream.pad


@pytest.mark.parametrize("batch_windows", [2, 4, 8])
def test_batched_stream_bit_matches_serial(setup, batch_windows):
    """Batched window sweeps (one jitted dispatch for up to N windows) must
    produce what the serial batch-1 stream produces. Not bit-exact: XLA
    selects different conv tilings per batch size (measured max diff 2.6e-8
    on CPU), so parity is asserted at 1e-6."""
    cfg, params, audio = setup
    serial = StreamingSeparator(cfg, params, batch_windows=1)
    batched = StreamingSeparator(cfg, params, batch_windows=batch_windows)

    got_s = {s: [] for s in cfg.source_names}
    got_b = {s: [] for s in cfg.source_names}
    for i in range(0, audio.shape[0], 777):
        for stream, got in ((serial, got_s), (batched, got_b)):
            out = stream.push(audio[i:i + 777])
            for s, v in out.items():
                got[s].append(v)
    for stream, got in ((serial, got_s), (batched, got_b)):
        for s, v in stream.flush().items():
            got[s].append(v)
    for s in cfg.source_names:
        a = np.concatenate(got_s[s])
        b = np.concatenate(got_b[s])
        assert a.shape == b.shape == (audio.shape[0], cfg.num_channels)
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=s)


def test_batched_stream_batches_dispatches(setup):
    """A burst containing many complete windows is swept in batched drains
    (pow2-bucketed window counts), not one dispatch per window."""
    cfg, params, audio = setup
    stream = StreamingSeparator(cfg, params, batch_windows=4)
    calls = []
    real = stream._drain_k
    stream._drain_k = (lambda p, buf, k:
                       (calls.append(k) or real(p, buf, k=k)))
    stream.push(audio)  # 2000 samples -> several complete windows
    stream.flush()
    assert max(calls) > 1, f"expected batched dispatches, got {calls}"
    assert all(k in (1, 2, 4) for k in calls), calls


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_stream_fuzz_random_chunks(setup, seed):
    """Randomised chunk-size sequences (1..3x max_piece, incl. size-1 pushes)
    drive the device ring buffer through every append/drain interleaving;
    output must equal offline separation wherever full context exists."""
    cfg, params, audio = setup
    stream = StreamingSeparator(cfg, params, batch_windows=3)
    rng = np.random.default_rng(seed)
    offline = Separator(cfg, params).separate(audio, cfg.expected_sr)

    got = {s: [] for s in cfg.source_names}
    i = 0
    while i < audio.shape[0]:
        n = int(rng.integers(1, 3 * stream._max_piece))
        out = stream.push(audio[i:i + n])
        for s, v in out.items():
            got[s].append(v)
        i += n
    for s, v in stream.flush().items():
        got[s].append(v)
    got = {s: np.concatenate(v) for s, v in got.items()}

    n_cmp = audio.shape[0] - stream.out_len
    for s in cfg.source_names:
        assert got[s].shape[0] == audio.shape[0]
        np.testing.assert_allclose(got[s][:n_cmp], offline[s][:n_cmp],
                                   atol=1e-5, err_msg=s)


def test_stream_matches_offline_learned_stereo():
    """Streaming parity on the learned-interp difference stereo family (the
    module fixture covers bilinear mono only)."""
    cfg = get_config("full", num_layers=3, num_frames=256,
                     num_initial_filters=6, infer_num_frames=None)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    audio = (0.1 * rng.standard_normal((1500, 2))).astype(np.float32)
    offline = Separator(cfg, params).separate(audio, cfg.expected_sr)

    stream = StreamingSeparator(cfg, params, batch_windows=2)
    got = {s: [] for s in cfg.source_names}
    for i in range(0, audio.shape[0], 211):
        for s, v in stream.push(audio[i:i + 211]).items():
            got[s].append(v)
    for s, v in stream.flush().items():
        got[s].append(v)
    # exclude the offline engine's right-aligned final window (future context
    # a stream cannot see) — same bound as test_stream_matches_offline
    n_cmp = audio.shape[0] - stream.out_len
    for s in cfg.source_names:
        out = np.concatenate(got[s])
        assert out.shape[0] == audio.shape[0]
        np.testing.assert_allclose(out[:n_cmp], offline[s][:n_cmp],
                                   atol=1e-5, err_msg=s)


@pytest.mark.parametrize("batch_windows", [1, 4])
def test_stream_spectrogram_matches_offline(rng, batch_windows):
    """The U7 spectrogram family streams through the same ring (round-3
    extension; zero context pad — windows tile) and matches the offline
    engine on every sample the stream can see without future context."""
    from waveunet_tpu.models.spectrogram_unet import init_spectrogram_unet

    cfg = get_config("unet_spectrogram", num_layers=3,
                     num_frames=768 * 15 + 1024, infer_batch=2,
                     infer_num_frames=None)
    params, state = init_spectrogram_unet(jax.random.PRNGKey(0), cfg)
    offline = Separator(cfg, params, model_state=state)
    n = int(offline.out_len * 2.6)
    audio = (0.2 * rng.standard_normal((n, 1))).astype(np.float32)
    want = offline.separate(audio, cfg.expected_sr)

    stream = StreamingSeparator(cfg, params, batch_windows=batch_windows,
                                model_state=state)
    assert stream.pad == 0  # context-free family: windows tile exactly
    got = {s: [] for s in cfg.source_names}
    for i in range(0, n, 1111):
        for s, v in stream.push(audio[i:i + 1111]).items():
            got[s].append(v)
    for s, v in stream.flush().items():
        got[s].append(v)
    got = {s: np.concatenate(v) for s, v in got.items()}

    # offline right-aligns its final (partial) window into real signal and
    # overwrites [n - out_len, n); the stream cannot see that future — and
    # for the STFT family the re-phased overlap differs through the whole
    # right-aligned window, so exact parity holds before it
    n_cmp = n - stream.out_len
    for s in cfg.source_names:
        assert got[s].shape[0] == n
        assert np.all(np.isfinite(got[s]))
        np.testing.assert_allclose(got[s][:n_cmp], want[s][:n_cmp],
                                   atol=1e-5, err_msg=s)


def test_stream_nonfinite_output_not_laundered(setup):
    """Streaming's int16 drain shares the offline engine's non-finite
    sentinel contract: NaN params (a diverged model) must surface as NaN
    chunks, not be laundered into finite garbage by the int16 cast."""
    cfg, params, audio = setup
    cfg16 = cfg.replace(infer_wire_dtype="int16")
    bad = jax.tree.map(lambda a: np.full_like(a, np.nan), params)
    stream = StreamingSeparator(cfg16, bad)
    outs = [stream.push(audio[:512]), stream.flush()]
    for out in outs:
        for s in cfg.source_names:
            if out[s].size:
                assert np.isnan(out[s]).all(), s
    assert sum(o[cfg.source_names[0]].shape[0] for o in outs) == 512
