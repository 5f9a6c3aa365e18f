"""BSS-Eval + aggregation + harness tests (property-based sanity oracles)."""

import json
import os

import numpy as np
import pytest

from waveunet_tpu.eval.aggregate import compute_mean_metrics, write_track_json
from waveunet_tpu.eval.bsseval import bss_eval_framewise, bss_eval_window


def _two_sources(rng, n=8000, c=1):
    s1 = rng.standard_normal((n, c)).astype(np.float64) * 0.3
    s2 = rng.standard_normal((n, c)).astype(np.float64) * 0.3
    return np.stack([s1, s2])


def test_perfect_estimate_high_sdr(rng):
    refs = _two_sources(rng)
    res = bss_eval_window(refs, refs.copy(), filter_len=64)
    assert np.all(res["SDR"] > 100)  # essentially perfect
    assert np.all(res["SAR"] > 60)


def test_noise_at_minus20db(rng):
    refs = _two_sources(rng)
    noise = rng.standard_normal(refs.shape) * 0.03  # -20 dB rel to 0.3
    ests = refs + noise
    res = bss_eval_window(refs, ests, filter_len=64)
    # SDR == 10log10(||s||^2/||e-s||^2) exactly
    want = 10 * np.log10((refs[0] ** 2).sum() / (noise[0] ** 2).sum())
    np.testing.assert_allclose(res["SDR"][0], want, atol=0.2)


def test_interference_reflected_in_sir(rng):
    refs = _two_sources(rng)
    # estimate of source 0 contaminated by source 1 at -10 dB
    ests = refs.copy()
    ests[0] += 0.1 * refs[1] / np.std(refs[1]) * np.std(refs[0])
    res = bss_eval_window(refs, ests, filter_len=64)
    assert res["SIR"][0] < 30  # finite interference
    assert res["SIR"][1] > res["SIR"][0]  # source 1 estimate is clean
    # artifacts stay low: contamination lives in the source subspace
    assert res["SAR"][0] > 40


def test_filtered_estimate_high_sar(rng):
    """A short-delay echo of the reference is 'spatial distortion', not
    artifact: SAR must stay high, plain SDR low."""
    refs = _two_sources(rng)
    ests = refs.copy()
    ests[0] = 0.8 * refs[0] + 0.5 * np.roll(refs[0], 5, axis=0)
    res = bss_eval_window(refs, ests, filter_len=64)
    # np.roll wraps 5 samples that a causal filter cannot model, capping SAR.
    assert res["SAR"][0] > 25
    assert res["SIR"][0] > 40  # no cross-source interference introduced
    assert res["SDR"][0] < 15
    assert res["ISR"][0] < 10  # filtering shows up as spatial distortion


@pytest.mark.filterwarnings("ignore::scipy.linalg.LinAlgWarning")
def test_silent_reference_nan(rng):
    refs = _two_sources(rng)
    refs[1] = 0.0
    res = bss_eval_window(refs, refs.copy(), filter_len=32)
    assert np.isnan(res["SDR"][1])
    assert not np.isnan(res["SDR"][0]) and res["SDR"][0] > 100


def test_framewise_shapes(rng):
    refs = _two_sources(rng, n=4000)
    res = bss_eval_framewise(refs, refs.copy(), rate=1000, filter_len=32)
    assert res["SDR"].shape == (2, 4)


def test_json_roundtrip_and_aggregate(tmp_path, rng):
    metrics = {"vocals": {"SDR": np.array([3.0, 4.0, np.nan]),
                          "ISR": np.array([10.0, 11.0, np.nan]),
                          "SIR": np.array([8.0, 9.0, np.nan]),
                          "SAR": np.array([7.0, 6.0, np.nan])},
               "accompaniment": {"SDR": np.array([11.0, 12.0, 13.0]),
                                 "ISR": np.array([20.0, 21.0, 22.0]),
                                 "SIR": np.array([18.0, 19.0, 20.0]),
                                 "SAR": np.array([17.0, 16.0, 15.0])}}
    write_track_json(str(tmp_path / "song.json"), "song", metrics)
    stats = compute_mean_metrics(str(tmp_path))
    assert len(stats) == 2
    med, mad, mean, sd = stats[0]  # vocals written first
    np.testing.assert_allclose(med, 3.5)
    np.testing.assert_allclose(mean, 3.5)


@pytest.mark.parametrize("payload", [
    "{", "null", "[]", '"str"',
    '{"targets": ["not-a-dict"]}',
    '{"targets": [{"name": "vocals", "frames": [{"metrics": {"SDR": "x"}}]}]}',
])
def test_aggregate_malformed_json_names_the_file(tmp_path, payload):
    """A stray/corrupt JSON in the results folder (aborted run, foreign tool)
    must raise a ValueError naming the file, not a bare AttributeError from
    deep inside the walk (found by fuzzing)."""
    (tmp_path / "bad.json").write_text(payload)
    with pytest.raises(ValueError, match="bad.json"):
        compute_mean_metrics(str(tmp_path))


def test_aggregate_tolerates_missing_sections(tmp_path):
    """Absent/null targets/frames/metrics sections are treated as empty —
    same leniency as the existing targets default."""
    (tmp_path / "a.json").write_text('{"targets": null}')
    (tmp_path / "b.json").write_text(
        '{"targets": [{"name": "vocals", "frames": null}]}')
    (tmp_path / "c.json").write_text(
        '{"targets": [{"name": "vocals", '
        '"frames": [{"metrics": {"SDR": 2.0}}, {"metrics": null}]}]}')
    stats, names = compute_mean_metrics(str(tmp_path), return_names=True)
    assert names == ["vocals"]
    med = stats[0][0]
    np.testing.assert_allclose(med, 2.0)  # null metrics frame -> NaN


def test_harness_on_synthetic_track(tmp_path, rng):
    """End-to-end: WAV-layout dataset dir -> evaluate_musdb with an untrained
    tiny model produces JSONs + aggregate stats."""
    import jax

    from waveunet_tpu.config import get_config
    from waveunet_tpu.data.audio_io import write_wav
    from waveunet_tpu.eval.harness import evaluate_musdb
    from waveunet_tpu.models.waveunet import init_waveunet

    sr = 8192
    n = sr * 3
    cfg = get_config("baseline", num_layers=3, num_frames=1024,
                     expected_sr=sr, musdb_path=str(tmp_path / "db"))
    d = tmp_path / "db" / "test" / "song1"
    d.mkdir(parents=True)
    t = np.arange(n) / sr
    vocals = (0.3 * np.sin(2 * np.pi * 440 * t))[:, None].astype(np.float32)
    acc = (0.3 * np.sin(2 * np.pi * 220 * t))[:, None].astype(np.float32)
    write_wav(str(d / "vocals.wav"), vocals, sr)
    write_wav(str(d / "accompaniment.wav"), acc, sr)
    write_wav(str(d / "mixture.wav"), vocals + acc, sr)

    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    stats = evaluate_musdb(cfg, params, subset="test",
                           output_path=str(tmp_path / "est"), max_tracks=1,
                           win_s=1.0)
    assert len(stats) == 2
    json_files = os.listdir(tmp_path / "est" / "test")
    assert "song1.json" in json_files
    # estimates written too
    assert (tmp_path / "est" / "song1" / "vocals.wav").exists()


def test_violin_plot(tmp_path):
    metrics = {"vocals": {k: np.array([1.0, 2.0]) for k in
                          ("SDR", "ISR", "SIR", "SAR")},
               "accompaniment": {k: np.array([5.0, 6.0]) for k in
                                 ("SDR", "ISR", "SIR", "SAR")}}
    write_track_json(str(tmp_path / "song.json"), "song", metrics)
    from waveunet_tpu.eval.plot import draw_violin_sdr
    out = draw_violin_sdr(str(tmp_path), str(tmp_path / "violin.png"))
    assert os.path.exists(out)


def test_harness_multi_instrument(tmp_path, rng):
    """4-stem WAV-layout dataset through the multi_instrument eval targets."""
    import jax

    from waveunet_tpu.config import get_config
    from waveunet_tpu.data.audio_io import write_wav
    from waveunet_tpu.eval.harness import evaluate_musdb
    from waveunet_tpu.models.waveunet import init_waveunet

    sr = 8192
    n = sr * 2
    cfg = get_config("full_multi_instrument", num_layers=3, num_frames=1024,
                     num_initial_filters=8, expected_sr=sr,
                     musdb_path=str(tmp_path / "db"))
    d = tmp_path / "db" / "test" / "songM"
    d.mkdir(parents=True)
    t = np.arange(n) / sr
    stems = {}
    for j, s in enumerate(("bass", "drums", "other", "vocals")):
        sig = (0.2 * np.sin(2 * np.pi * (100 + 120 * j) * t)).astype(np.float32)
        stems[s] = np.tile(sig[:, None], (1, 2))
        write_wav(str(d / f"{s}.wav"), stems[s], sr)
    write_wav(str(d / "mixture.wav"), sum(stems.values()), sr)

    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    stats = evaluate_musdb(cfg, params, subset="test",
                           output_path=str(tmp_path / "est"), max_tracks=1)
    assert len(stats) == 4  # vocals, drums, bass, other


def test_spectrogram_figure(tmp_path, bundled_wav):
    from waveunet_tpu.eval.plot import draw_spectrogram
    out = draw_spectrogram(bundled_wav, str(tmp_path / "spec.png"))
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_harness_resume_skips_scored_tracks(tmp_path, rng, capsys):
    """Re-running evaluate_musdb skips tracks whose JSON already exists."""
    import jax

    from waveunet_tpu.config import get_config
    from waveunet_tpu.data.audio_io import write_wav
    from waveunet_tpu.eval.harness import evaluate_musdb
    from waveunet_tpu.models.waveunet import init_waveunet

    sr = 8192
    n = sr * 2
    cfg = get_config("baseline", num_layers=3, num_frames=1024,
                     expected_sr=sr, musdb_path=str(tmp_path / "db"))
    d = tmp_path / "db" / "test" / "songR"
    d.mkdir(parents=True)
    t = np.arange(n) / sr
    v = (0.3 * np.sin(2 * np.pi * 440 * t))[:, None].astype(np.float32)
    a = (0.3 * np.sin(2 * np.pi * 220 * t))[:, None].astype(np.float32)
    write_wav(str(d / "vocals.wav"), v, sr)
    write_wav(str(d / "accompaniment.wav"), a, sr)
    write_wav(str(d / "mixture.wav"), v + a, sr)

    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    evaluate_musdb(cfg, params, subset="test",
                   output_path=str(tmp_path / "est"), max_tracks=1)
    capsys.readouterr()
    stats = evaluate_musdb(cfg, params, subset="test",
                           output_path=str(tmp_path / "est"), max_tracks=1)
    out = capsys.readouterr().out
    assert "Skipping songR" in out
    assert len(stats) == 2  # aggregation still sees the existing JSON


def test_aggregate_pools_by_name_not_position(tmp_path):
    """Tracks with different target sets/orders must pool by NAME; the first
    JSON having fewer targets used to IndexError and order differences
    cross-contaminated sources (round-2 review finding)."""
    one = {"vocals": {k: np.array([1.0, 3.0]) for k in
                      ("SDR", "ISR", "SIR", "SAR")}}
    two = {"accompaniment": {k: np.array([10.0]) for k in
                             ("SDR", "ISR", "SIR", "SAR")},
           "vocals": {k: np.array([5.0]) for k in
                      ("SDR", "ISR", "SIR", "SAR")}}
    write_track_json(str(tmp_path / "a.json"), "a", one)  # sorts first
    write_track_json(str(tmp_path / "b.json"), "b", two)
    stats, names = compute_mean_metrics(str(tmp_path), return_names=True)
    by_name = dict(zip(names, stats))
    assert set(names) == {"vocals", "accompaniment"}
    np.testing.assert_allclose(by_name["vocals"][2], 3.0)  # mean(1, 3, 5)
    np.testing.assert_allclose(by_name["accompaniment"][2], 10.0)


def test_separate_track_stereo_model_mono_track():
    """A stereo model (mono_downmix=False) fed a mono track returns
    channel-duplicated estimates; separate_track must downmix them back to
    the track's channel count so scoring shapes line up (round-2 review)."""
    from waveunet_tpu.config import get_config
    from waveunet_tpu.eval.harness import separate_track

    cfg = get_config("baseline_stereo", num_layers=2, num_frames=256)

    class FakeSep:
        def separate(self, mix, rate):
            assert mix.shape[1] == 1  # the engine itself tiles internally
            return {s: np.tile(0.5 * mix, [1, 2])
                    for s in cfg.source_names}

    n = cfg.expected_sr // 4
    mix = np.linspace(-0.5, 0.5, n, dtype=np.float32)[:, None]
    out = separate_track(FakeSep(), cfg, mix, cfg.expected_sr)
    for s, est in out.items():
        assert est.shape == mix.shape, s
        np.testing.assert_allclose(est, 0.5 * mix, atol=1e-6)


def test_harness_multi_instrument_tpu_bss(tmp_path, rng):
    """The device-batched scorer handles the 4-source multi_instrument task
    through the full harness (host-path agreement pinned separately in
    test_bsseval_tpu)."""
    import jax

    from waveunet_tpu.config import get_config
    from waveunet_tpu.data.audio_io import write_wav
    from waveunet_tpu.eval.harness import evaluate_musdb
    from waveunet_tpu.models.waveunet import init_waveunet

    sr = 8192
    n = sr * 2
    cfg = get_config("full_multi_instrument", num_layers=3, num_frames=1024,
                     num_initial_filters=8, expected_sr=sr,
                     musdb_path=str(tmp_path / "db"))
    d = tmp_path / "db" / "test" / "songM"
    d.mkdir(parents=True)
    t = np.arange(n) / sr
    stems = {}
    for j, s in enumerate(("bass", "drums", "other", "vocals")):
        sig = (0.2 * np.sin(2 * np.pi * (100 + 120 * j) * t)).astype(np.float32)
        stems[s] = np.tile(sig[:, None], (1, 2))
        write_wav(str(d / f"{s}.wav"), stems[s], sr)
    write_wav(str(d / "mixture.wav"), sum(stems.values()), sr)

    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    stats = evaluate_musdb(cfg, params, subset="test",
                           output_path=str(tmp_path / "est"), max_tracks=1,
                           tpu_bss=True)
    assert len(stats) == 4
    for med, mad, mean, sd in stats:
        assert np.isfinite(med) and np.isfinite(mean)


def test_harness_survives_broken_scoring_pool(tmp_path, rng, monkeypatch,
                                              capsys):
    """A scoring-worker crash poisons a ProcessPoolExecutor: every later
    submit raises BrokenProcessPool. The harness must fall back to inline
    scoring and finish the dataset (round-3 review finding)."""
    import concurrent.futures
    import jax

    from waveunet_tpu.config import get_config
    from waveunet_tpu.data.audio_io import write_wav
    from waveunet_tpu.eval.harness import evaluate_musdb
    from waveunet_tpu.models.waveunet import init_waveunet

    class PoisonedPool:
        """submit always raises, like an executor whose worker died."""

        def __init__(self, *a, **kw):
            pass

        def submit(self, *a, **kw):
            raise concurrent.futures.process.BrokenProcessPool(
                "worker died (simulated)")

        def shutdown(self, *a, **kw):
            pass

    monkeypatch.setattr(concurrent.futures, "ProcessPoolExecutor",
                        PoisonedPool)

    sr = 8192
    n = sr * 2
    cfg = get_config("baseline", num_layers=3, num_frames=1024,
                     expected_sr=sr, musdb_path=str(tmp_path / "db"))
    t = np.arange(n) / sr
    for song in ("songA", "songB"):
        d = tmp_path / "db" / "test" / song
        d.mkdir(parents=True)
        vocals = (0.3 * np.sin(2 * np.pi * 440 * t))[:, None].astype(
            np.float32)
        acc = (0.3 * np.sin(2 * np.pi * 220 * t))[:, None].astype(np.float32)
        write_wav(str(d / "vocals.wav"), vocals, sr)
        write_wav(str(d / "accompaniment.wav"), acc, sr)
        write_wav(str(d / "mixture.wav"), vocals + acc, sr)

    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    stats = evaluate_musdb(cfg, params, subset="test",
                           output_path=str(tmp_path / "est"))
    assert len(stats) == 2
    got = set(os.listdir(tmp_path / "est" / "test"))
    assert {"songA.json", "songB.json"} <= got  # both tracks still scored
    assert "scoring pool broken" in capsys.readouterr().out


def test_harness_track_sharding(tmp_path, rng, capsys):
    """shard_index/shard_count stride the sorted track enumeration: shards
    score disjoint tracks (non-owned tracks skipped BEFORE decode), their
    union covers the subset, max_tracks bounds the GLOBAL enumeration, and
    aggregate=False defers the table to the caller (the pod wiring)."""
    import jax

    from waveunet_tpu.config import get_config
    from waveunet_tpu.data.audio_io import write_wav
    from waveunet_tpu.eval.harness import aggregate_and_print, evaluate_musdb
    from waveunet_tpu.models.waveunet import init_waveunet

    sr = 8192
    n = sr * 2
    cfg = get_config("baseline", num_layers=3, num_frames=1024,
                     expected_sr=sr, musdb_path=str(tmp_path / "db"))
    t = np.arange(n) / sr
    songs = ["songA", "songB", "songC"]
    for i, song in enumerate(songs):
        d = tmp_path / "db" / "test" / song
        d.mkdir(parents=True)
        v = (0.3 * np.sin(2 * np.pi * (300 + 40 * i) * t))[:, None]
        a = (0.3 * np.sin(2 * np.pi * (150 + 20 * i) * t))[:, None]
        write_wav(str(d / "vocals.wav"), v.astype(np.float32), sr)
        write_wav(str(d / "accompaniment.wav"), a.astype(np.float32), sr)
        write_wav(str(d / "mixture.wav"), (v + a).astype(np.float32), sr)

    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    res_dir = tmp_path / "est" / "test"

    # shard 0 of 2 owns positions 0, 2 -> songA, songC
    out0 = evaluate_musdb(cfg, params, subset="test",
                          output_path=str(tmp_path / "est"),
                          shard_index=0, shard_count=2, aggregate=False)
    assert out0 is None  # per-shard aggregation deferred
    assert set(os.listdir(res_dir)) == {"songA.json", "songC.json"}
    text = capsys.readouterr().out
    assert "Skipping songB (shard 1/2's track)" in text
    assert ": SDR median" not in text  # no per-shard aggregate table

    # shard 1 of 2 owns position 1 -> songB; union now covers the subset
    evaluate_musdb(cfg, params, subset="test",
                   output_path=str(tmp_path / "est"),
                   shard_index=1, shard_count=2, aggregate=False)
    assert set(os.listdir(res_dir)) == {f"{s}.json" for s in songs}
    capsys.readouterr()

    # the caller-side aggregation sees every shard's results
    stats = aggregate_and_print(str(res_dir))
    assert len(stats) == 2
    assert ": SDR median" in capsys.readouterr().out

    # max_tracks bounds the GLOBAL enumeration: with max_tracks=1 only
    # position 0 is considered, so shard 1 of 2 scores nothing even with an
    # empty results dir.
    for f in os.listdir(res_dir):
        os.remove(os.path.join(res_dir, f))
    evaluate_musdb(cfg, params, subset="test",
                   output_path=str(tmp_path / "est"), max_tracks=1,
                   shard_index=1, shard_count=2, aggregate=False)
    assert os.listdir(res_dir) == []


def test_self_check_separator(rng):
    """museval `mus.test` parity (`Evaluate.py:158`): a conforming engine
    passes; one returning wrong source names / shapes fails loudly."""
    import jax

    from waveunet_tpu.config import get_config
    from waveunet_tpu.eval.harness import self_check_separator
    from waveunet_tpu.infer.engine import Separator
    from waveunet_tpu.models.waveunet import apply_waveunet, init_waveunet

    cfg = get_config("baseline", num_layers=3, num_frames=1024,
                     expected_sr=8192)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    self_check_separator(cfg, Separator(cfg, params))  # must not raise

    def bad_forward(p, x):  # drops a source and mangles the other's name
        out = apply_waveunet(p, cfg, x, training=False)
        return {"not_a_source": out[cfg.source_names[0]]}

    bad = Separator(cfg, params, forward_fn=bad_forward)
    with pytest.raises(RuntimeError, match="self-check failed"):
        self_check_separator(cfg, bad)
