"""Data pipeline tests on synthetic sine-mix fixtures (no MUSDB needed)."""

import os

import numpy as np
import pytest

from waveunet_tpu.config import get_config
from waveunet_tpu.data import cache, sampler
from waveunet_tpu.data.audio_io import load, write_wav
from waveunet_tpu.data.pipeline import BatchPipeline


def _synthetic_dataset(tmp_path, cfg, n_songs=3, seconds=4.0):
    """Write sine-mix WAV 'songs' + build the npz cache for all partitions."""
    rng = np.random.default_rng(0)
    pad = 10
    for part in ("train", "valid", "test"):
        samples = []
        for i in range(n_songs):
            n = int(cfg.expected_sr * seconds)
            t = np.arange(n) / cfg.expected_sr
            tracks = {}
            mix = np.zeros((n, cfg.num_channels), np.float32)
            for name in cfg.source_names:
                f = rng.uniform(100, 1000)
                sig = 0.3 * np.sin(2 * np.pi * f * t).astype(np.float32)
                sig = np.tile(sig[:, None], (1, cfg.num_channels))
                tracks[name] = sig
                mix += sig
            tracks["mix"] = mix
            d = tmp_path / part
            d.mkdir(exist_ok=True, parents=True)
            paths = {}
            for k, v in tracks.items():
                p = str(d / f"s{i}_{k}.wav")
                write_wav(p, v, cfg.expected_sr, subtype="FLOAT")
                paths[k] = p
            samples.append(paths)
        cache.preprocess_partition(cfg, part, samples, pad_frames=pad)
    return pad


@pytest.fixture()
def cfg(tmp_path):
    return get_config("baseline", data_path=str(tmp_path / "cache"),
                      num_frames=1024, batch_size=4,
                      num_snippets_per_track=8, cache_size=32)


def test_wav_roundtrip(tmp_path):
    x = np.clip(np.random.default_rng(0).standard_normal((1000, 2)) * 0.5,
                -0.999, 0.999).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 22050, subtype="FLOAT")
    y, sr = load(p, sr=None, mono=False)
    assert sr == 22050
    np.testing.assert_allclose(y, x, atol=1e-6)

    write_wav(p, x, 22050, subtype="PCM_16")
    y, _ = load(p, sr=None, mono=False)
    # write scales by 32767 (rounded), read divides by 32768: ~2 LSB worst case
    np.testing.assert_allclose(y, x, atol=2.0 / 32768)


def test_cache_and_padding(tmp_path, cfg):
    pad = _synthetic_dataset(tmp_path / "wavs", cfg)
    songs = cache.list_songs(cfg, "train")
    assert len(songs) == 3
    tracks = cache.load_song(songs[0])
    assert set(tracks) == {"accompaniment", "vocals", "mix"}
    n = tracks["mix"].shape[0]
    # context padding applied on both ends
    np.testing.assert_array_equal(tracks["mix"][:pad], 0.0)
    np.testing.assert_array_equal(tracks["mix"][-pad:], 0.0)
    assert n == int(cfg.expected_sr * 4.0) + 2 * pad


def test_snippet_positions():
    rng = np.random.default_rng(0)
    pos = sampler.random_snippet_positions(rng, 1000, 100, 50)
    assert pos.min() >= 0 and pos.max() < 900
    pos = sampler.sequential_snippet_positions(1000, 300, 100)
    np.testing.assert_array_equal(pos, np.arange(0, 700, 100))


def test_random_amplify_consistency():
    rng = np.random.default_rng(0)
    s = {"a": np.ones((4, 10, 1), np.float32),
         "b": 2 * np.ones((4, 10, 1), np.float32)}
    out = sampler.random_amplify(s, rng, ["a", "b"])
    np.testing.assert_allclose(out["mix"], out["a"] + out["b"], rtol=1e-6)
    assert np.all(out["a"] >= 0.7 - 1e-6) and np.all(out["a"] <= 1.0 + 1e-6)


def test_train_batches(tmp_path, cfg):
    _synthetic_dataset(tmp_path / "wavs", cfg)
    in_len = out_len = cfg.num_frames  # same-padding model
    pipe = BatchPipeline(cfg, "train", in_len, out_len, seed=1)
    it = pipe.train_batches()
    for _ in range(3):
        b = next(it)
        assert set(b) == {"accompaniment", "vocals", "mix"}
        for v in b.values():
            assert v.shape == (4, in_len, 1)
        # augmentation preserves mix = sum(sources)
        np.testing.assert_allclose(b["mix"], b["accompaniment"] + b["vocals"],
                                   atol=1e-5)


def test_eval_batches_deterministic(tmp_path, cfg):
    _synthetic_dataset(tmp_path / "wavs", cfg)
    in_len = out_len = cfg.num_frames
    pipe = BatchPipeline(cfg, "valid", in_len, out_len, seed=1)
    b1 = list(pipe.eval_batches())
    b2 = list(BatchPipeline(cfg, "valid", in_len, out_len,
                            seed=2).eval_batches())
    assert len(b1) == len(b2) > 0
    np.testing.assert_array_equal(b1[0]["mix"], b2[0]["mix"])


def test_target_crop(tmp_path):
    cfg = get_config("baseline_context", data_path=str(tmp_path / "cache"),
                     num_frames=1024, batch_size=2, num_snippets_per_track=4,
                     cache_size=8, num_layers=4)
    from waveunet_tpu.ops import shapes
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    _synthetic_dataset(tmp_path / "wavs", cfg, seconds=2.0)
    pipe = BatchPipeline(cfg, "train", in_len, out_len, seed=0)
    b = next(pipe.train_batches())
    assert b["mix"].shape[1] == in_len
    assert b["vocals"].shape[1] == out_len


def test_host_sharding(tmp_path, cfg):
    _synthetic_dataset(tmp_path / "wavs", cfg)
    p0 = BatchPipeline(cfg, "train", 1024, 1024, host_id=0, num_hosts=2)
    p1 = BatchPipeline(cfg, "train", 1024, 1024, host_id=1, num_hosts=2)
    assert set(p0.paths).isdisjoint(p1.paths)
    assert len(p0.paths) + len(p1.paths) == 3


def test_device_bank_semantics(tmp_path, cfg):
    """Device-resident sampler: shapes, mix==sum(sources), augment range,
    target crop, determinism per key."""
    import jax
    import jax.numpy as jnp
    from waveunet_tpu.data.device_cache import DeviceBank

    _synthetic_dataset(tmp_path / "wavs", cfg)
    in_len = out_len = cfg.num_frames
    bank = DeviceBank(cfg, "train", in_len, out_len, batch_size=4)
    it = bank.batches(jax.random.PRNGKey(0))
    b = next(it)
    assert b["mix"].shape == (4, in_len, 1)
    assert b["vocals"].shape == (4, out_len, 1)
    np.testing.assert_allclose(np.asarray(b["mix"]),
                               np.asarray(b["vocals"] + b["accompaniment"]),
                               atol=1e-4)
    # determinism: same key -> same batch
    b2 = next(DeviceBank(cfg, "train", in_len, out_len,
                         batch_size=4).batches(jax.random.PRNGKey(0)))
    np.testing.assert_allclose(np.asarray(b["mix"]), np.asarray(b2["mix"]))


def test_device_bank_target_crop(tmp_path):
    import jax
    from waveunet_tpu.data.device_cache import DeviceBank
    from waveunet_tpu.ops import shapes as S

    cfg = get_config("baseline_context", data_path=str(tmp_path / "cache"),
                     num_frames=1024, batch_size=2, num_layers=4)
    in_len, out_len = S.get_padding(cfg, cfg.num_frames)
    _synthetic_dataset(tmp_path / "wavs", cfg, seconds=2.0)
    bank = DeviceBank(cfg, "train", in_len, out_len, batch_size=2)
    b = next(bank.batches(jax.random.PRNGKey(1)))
    assert b["mix"].shape[1] == in_len
    assert b["vocals"].shape[1] == out_len


def test_device_bank_skips_corrupt_shard(tmp_path, cfg, capsys):
    """A cache shard that rotted on disk after preparation (partial write,
    bit flips) is skipped with a warning naming the file — the bank builds
    from the surviving songs instead of dying inside zipfile internals
    (mirrors the host pipeline's corrupt-skip; found by fuzzing)."""
    import glob

    import jax
    from waveunet_tpu.data import cache
    from waveunet_tpu.data.device_cache import DeviceBank

    _synthetic_dataset(tmp_path / "wavs", cfg)
    cache.prepare_dataset(cfg, 0)
    shards = sorted(glob.glob(os.path.join(
        cache.partition_dir(cfg, "train"), "*.npz")))
    assert len(shards) >= 2
    with open(shards[0], "r+b") as f:  # clobber the zip central directory
        f.seek(0, 2)
        end = f.tell()
        f.seek(max(0, end - 64))
        f.write(b"\x00" * min(64, end))
    with pytest.raises(ValueError, match="corrupt cache shard"):
        cache.load_song(shards[0])
    bank = DeviceBank(cfg, "train", cfg.num_frames, cfg.num_frames,
                      batch_size=2)
    b = next(bank.batches(jax.random.PRNGKey(0)))
    assert b["mix"].shape[0] == 2
    assert "skipping" in capsys.readouterr().out


def test_device_bank_budget(tmp_path, cfg):
    from waveunet_tpu.data.device_cache import DeviceBank

    _synthetic_dataset(tmp_path / "wavs", cfg)
    with pytest.raises(ValueError):
        DeviceBank(cfg, "train", cfg.num_frames, cfg.num_frames,
                   max_bytes=10)


def test_device_bank_multi_instrument(tmp_path):
    import jax
    from waveunet_tpu.data.device_cache import DeviceBank

    cfg = get_config("full_multi_instrument", data_path=str(tmp_path / "cache"),
                     num_frames=512, num_layers=3, batch_size=2)
    from waveunet_tpu.ops import shapes as S
    in_len, out_len = S.get_padding(cfg, cfg.num_frames)
    _synthetic_dataset(tmp_path / "wavs", cfg, seconds=2.0)
    bank = DeviceBank(cfg, "train", in_len, out_len, batch_size=2)
    b = next(bank.batches(jax.random.PRNGKey(0)))
    assert set(b) == {"bass", "drums", "other", "vocals", "mix"}
    # mix (at input length) equals the sum of (augmented) sources (cropped to
    # the output window) over the aligned centre region
    pad = (in_len - out_len) // 2
    total = sum(np.asarray(b[s]) for s in cfg.source_names)
    mix_inner = np.asarray(b["mix"])[:, pad:pad + out_len]
    np.testing.assert_allclose(total, mix_inner, atol=1e-4)


def test_pipeline_empty_host_slice_raises(tmp_path, cfg):
    """A pod host whose song slice is empty must fail fast at construction —
    an empty slice deadlocks the pod at the first collective (round-2
    review finding)."""
    _synthetic_dataset(tmp_path / "wavs", cfg)
    n_songs = len(cache.list_songs(cfg, "train"))
    with pytest.raises(ValueError, match="empty song slice"):
        BatchPipeline(cfg, "train", 1024, 1024,
                      host_id=n_songs, num_hosts=n_songs + 1)


def test_pipeline_prefetch_propagates_errors():
    """Worker exceptions must surface in the consumer, not read as clean
    end-of-data (round-2 review finding)."""
    from waveunet_tpu.data.pipeline import BatchPipeline

    def boom():
        yield 1
        raise RuntimeError("pipeline exploded")

    it = BatchPipeline.prefetched(None, boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="pipeline exploded"):
        list(it)


def test_latest_checkpoint_ignores_orbax_tmp(tmp_path):
    """Crashed orbax saves leave step_X.orbax-checkpoint-tmp-<ts> dirs that
    sort AFTER the finalized step_X and must never win resume (round-2
    review finding)."""
    from waveunet_tpu.train.checkpoint import latest_checkpoint

    d = tmp_path / "exp"
    (d / "step_0000000100").mkdir(parents=True)
    (d / "step_0000000200").mkdir()
    (d / "step_0000000200.orbax-checkpoint-tmp-1234567").mkdir()
    got = latest_checkpoint(str(tmp_path), "exp")
    assert got is not None and got.endswith("step_0000000200")


def test_is_prepared_requires_completion_marker(tmp_path):
    """A bare cache directory (crashed partial preprocess) must not count as
    prepared; the per-partition meta.json is the completion marker."""
    from waveunet_tpu.config import get_config
    from waveunet_tpu.data import cache as c

    cfg = get_config("baseline", data_path=str(tmp_path))
    assert not c.is_prepared(cfg)
    os.makedirs(c.cache_dir(cfg))  # bare dir: previously counted as prepared
    assert not c.is_prepared(cfg)
    import json as _json
    for p in ("train", "valid", "test"):
        os.makedirs(c.partition_dir(cfg, p), exist_ok=True)
        with open(os.path.join(c.partition_dir(cfg, p), "meta.json"), "w") as f:
            _json.dump({}, f)
    assert c.is_prepared(cfg)


def test_wav_odd_data_chunk_before_fmt(tmp_path):
    """RIFF pads odd-sized chunks with one byte; an odd data chunk placed
    before fmt must still parse (round-2 review finding)."""
    import struct as st

    from waveunet_tpu.data.audio_io import load

    samples = np.array([1000, -1000, 32767], "<i2")  # 3 mono s16 samples
    data = samples.tobytes()  # 6 bytes... make it odd via 8-bit? use 3 bytes
    data = bytes([128, 255, 0])  # 3 bytes of u8 PCM -> odd chunk
    fmt = st.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (st.pack("<4sI", b"data", len(data)) + data + b"\x00"
            + st.pack("<4sI", b"fmt ", len(fmt)) + fmt)
    blob = st.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    p = tmp_path / "odd.wav"
    p.write_bytes(blob)
    audio, sr = load(str(p), sr=None, mono=False)
    assert sr == 8000 and audio.shape == (3, 1)
    np.testing.assert_allclose(audio[:, 0], (np.array([128, 255, 0]) - 128) / 128.0)


def test_wav_write_nonfinite_raises(tmp_path):
    """NaN/Inf audio must fail loudly: np.round(nan)->int16 writes garbage
    PCM silently, and a diverged model shipping corrupt WAVs is worse than
    an error (found by fuzzing)."""
    from waveunet_tpu.data.audio_io import write_wav

    for val in (np.nan, np.inf, -np.inf):
        with pytest.raises(ValueError, match="non-finite"):
            write_wav(str(tmp_path / "x.wav"),
                      np.full((10, 1), val, np.float32), 8000)
    # finite extremes still write fine (clipped)
    write_wav(str(tmp_path / "ok.wav"),
              np.full((10, 1), 1e30, np.float32), 8000)


def test_wav_malformed_inputs_raise_valueerror(tmp_path):
    """`predict input_path=` accepts arbitrary user files: every malformed
    WAV must surface as a clean ValueError, never a bare ZeroDivisionError
    (channels=0 / sample-rate=0 headers) or struct.error (truncated
    headers) — found by fuzzing the reader (round 4)."""
    import struct as st

    from waveunet_tpu.data.audio_io import load

    def wav(n_ch=1, sr=8000, bits=16, data=b"\x00\x00" * 10, fmt_len=16):
        fmt = st.pack("<HHIIHH", 1, n_ch, sr, sr * n_ch * bits // 8,
                      max(n_ch * bits // 8, 1), bits)[:fmt_len]
        body = (b"fmt " + st.pack("<I", len(fmt)) + fmt
                + b"data" + st.pack("<I", len(data)) + data)
        return b"RIFF" + st.pack("<I", 4 + len(body)) + b"WAVE" + body

    cases = {
        "zero_channels.wav": wav(n_ch=0),
        "zero_sr.wav": wav(sr=0),
        "empty.wav": b"",
        "tiny.wav": b"RIFF",
        "short_fmt.wav": wav(fmt_len=8),
    }
    for name, blob in cases.items():
        p = tmp_path / name
        p.write_bytes(blob)
        with pytest.raises(ValueError):
            # sr= exercises the resample path a zero-rate header would
            # crash with Fraction(22050, 0)
            load(str(p), sr=22050)


def test_device_bank_set_batch(tmp_path, cfg):
    """Round-2 fine-tuning reuses the round-1 bank: set_batch must re-point
    the sampler without touching the (expensive-to-upload) bank arrays."""
    from waveunet_tpu.data.device_cache import DeviceBank

    _synthetic_dataset(tmp_path / "wavs", cfg)
    import jax
    bank = DeviceBank(cfg, "train", 1024, 1024, batch_size=2)
    arr0 = bank.arrays[0]
    b = next(bank.batches(jax.random.PRNGKey(0)))
    assert b["mix"].shape[0] == 2
    bank.set_batch(4)
    assert bank.arrays[0] is arr0  # same device buffer, no re-upload
    b = next(bank.batches(jax.random.PRNGKey(0)))
    assert b["mix"].shape[0] == 4


def test_num_val_songs_knob(tmp_path):
    """prepare_dataset's validation split respects cfg.num_val_songs (the
    reference's hardcoded 25 nearly drains small custom datasets) and never
    takes the last train song."""
    from waveunet_tpu.data.audio_io import write_wav
    from waveunet_tpu.ops import shapes

    cfg = get_config("baseline", num_layers=3, num_frames=1024,
                     expected_sr=8192, num_val_songs=2,
                     musdb_path=str(tmp_path / "db"),
                     data_path=str(tmp_path / "c"))
    sr = cfg.expected_sr
    for part, names in (("train", ("a", "b", "c")), ("test", ("t",))):
        for name in names:
            d = tmp_path / "db" / part / name
            d.mkdir(parents=True)
            n = sr * 2
            t = np.arange(n) / sr
            v = (0.3 * np.sin(2 * np.pi * 440 * t))[:, None].astype(np.float32)
            a = (0.3 * np.sin(2 * np.pi * 220 * t))[:, None].astype(np.float32)
            write_wav(str(d / "vocals.wav"), v, sr)
            write_wav(str(d / "accompaniment.wav"), a, sr)
            write_wav(str(d / "mixture.wav"), v + a, sr)
    cache.prepare_dataset(cfg, shapes.context_pad(cfg, cfg.num_frames))
    assert len(cache.list_songs(cfg, "train")) == 1
    assert len(cache.list_songs(cfg, "valid")) == 2
    assert len(cache.list_songs(cfg, "test")) == 1
    # a huge request still leaves one train song
    cfg9 = cfg.replace(num_val_songs=99, data_path=str(tmp_path / "c9"))
    cache.prepare_dataset(cfg9, shapes.context_pad(cfg9, cfg9.num_frames))
    assert len(cache.list_songs(cfg9, "train")) == 1
    assert len(cache.list_songs(cfg9, "valid")) == 2
    # a negative request is a config error, not an opaque numpy crash
    with pytest.raises(ValueError, match="num_val_songs"):
        cfg.replace(num_val_songs=-1)


def _write_ccmixter_fixture(tmp_path, sr, n_tracks=2, seconds=2.0,
                            write_audio=True):
    """Schema-true CCMixter manifest (mirrors `/root/reference/CCMixter.xml`:
    database > trackList > track > instrumentList > instrument with
    relativeFilepath/instrumentName fields) + the referenced WAVs. One extra
    track is missing its Voice stem and must be filtered out by the ingest."""
    db = tmp_path / "ccmix"
    tracks_xml = []
    n = int(sr * seconds)
    t = np.arange(n) / sr

    def inst(rel, name):
        return (f"<instrument><relativeFilepath>{rel}</relativeFilepath>"
                f"<audioFormat>wav</audioFormat><sampleRate>{sr}</sampleRate>"
                f"<length>{seconds}</length><numChannels>1</numChannels>"
                f"<instrumentChannel>3</instrumentChannel>"
                f"<instrumentName>{name}</instrumentName>"
                f"<hasEffects>true</hasEffects>"
                f"<multipleVoices>true</multipleVoices></instrument>")

    for i in range(n_tracks):
        d = db / f"artist_{i}"
        insts = []
        for stem, name, f0 in (("source-02", "Voice", 440.0 + 10 * i),
                               ("source-01", "Instrumental", 220.0 + 10 * i),
                               ("mix", "Mix", 0.0)):
            rel = f"artist_{i}/{stem}.wav"
            insts.append(inst(rel, name))
            if write_audio:
                d.mkdir(parents=True, exist_ok=True)
                if name == "Mix":
                    v = 0.3 * (np.sin(2 * np.pi * (440.0 + 10 * i) * t)
                               + np.sin(2 * np.pi * (220.0 + 10 * i) * t))
                else:
                    v = 0.3 * np.sin(2 * np.pi * f0 * t)
                write_wav(str(db / rel), v[:, None].astype(np.float32), sr)
        tracks_xml.append("<track><title>t%d</title><artist>a%d</artist>"
                          "<performer>a%d</performer><instrumentList>%s"
                          "</instrumentList></track>"
                          % (i, i, i, "".join(insts)))
    # incomplete track: Mix + Instrumental only -> must be skipped
    tracks_xml.append("<track><title>bad</title><instrumentList>"
                      + inst("bad/mix.wav", "Mix")
                      + inst("bad/source-01.wav", "Instrumental")
                      + "</instrumentList></track>")
    xml = (f"<database><databaseName>CCMixter</databaseName>"
           f"<databaseFolderPath>{db}</databaseFolderPath>"
           f"<trackList>{''.join(tracks_xml)}</trackList></database>")
    xml_path = tmp_path / "CCMixter.xml"
    xml_path.write_text(xml)
    return str(xml_path), str(db)


def test_get_ccmixter_parses_and_filters(tmp_path):
    """Path assembly (databaseFolderPath + relativeFilepath) and the
    Voice/Mix/Instrumental completeness filter (`Datasets.py:279-295`)."""
    from waveunet_tpu.data.ingest import get_ccmixter

    xml_path, db = _write_ccmixter_fixture(tmp_path, sr=8192,
                                           write_audio=False)
    samples = get_ccmixter(xml_path)
    assert len(samples) == 2  # the Voice-less track is dropped
    for i, s in enumerate(samples):
        assert set(s) == {"mix", "accompaniment", "vocals"}
        assert s["vocals"] == os.path.join(db, f"artist_{i}/source-02.wav")
        assert s["accompaniment"] == os.path.join(
            db, f"artist_{i}/source-01.wav")
        assert s["mix"] == os.path.join(db, f"artist_{i}/mix.wav")


def test_prepare_dataset_voice_appends_ccmixter(tmp_path):
    """The voice task's cache-miss branch appends the CCMixter tracks to the
    TRAIN partition only (`Datasets.py:151-155` semantics)."""
    from waveunet_tpu.ops import shapes

    sr = 8192
    xml_path, _ = _write_ccmixter_fixture(tmp_path, sr=sr)
    cfg = get_config("baseline", num_layers=3, num_frames=1024,
                     expected_sr=sr, num_val_songs=1,
                     musdb_path=str(tmp_path / "db"),
                     data_path=str(tmp_path / "c"),
                     ccmixter_xml=xml_path)
    assert cfg.task == "voice"
    for part, names in (("train", ("a", "b")), ("test", ("t",))):
        for name in names:
            d = tmp_path / "db" / part / name
            d.mkdir(parents=True)
            n = sr * 2
            t = np.arange(n) / sr
            v = (0.3 * np.sin(2 * np.pi * 440 * t))[:, None].astype(np.float32)
            a = (0.3 * np.sin(2 * np.pi * 220 * t))[:, None].astype(np.float32)
            write_wav(str(d / "vocals.wav"), v, sr)
            write_wav(str(d / "accompaniment.wav"), a, sr)
            write_wav(str(d / "mixture.wav"), v + a, sr)
    cache.prepare_dataset(cfg, shapes.context_pad(cfg, cfg.num_frames))
    # 2 musdb train - 1 val + 2 ccmixter
    assert len(cache.list_songs(cfg, "train")) == 3
    assert len(cache.list_songs(cfg, "valid")) == 1
    assert len(cache.list_songs(cfg, "test")) == 1
    # the ccmixter audio really flows: every cached train song decodes with
    # all voice-task keys present
    for p in cache.list_songs(cfg, "train"):
        tracks = cache.load_song(p)
        assert {"mix", "vocals", "accompaniment"} <= set(tracks)
        assert tracks["mix"].shape[0] > 0


def test_device_bank_stored_mix_when_augmentation_off(tmp_path):
    """With augmentation OFF the bank must serve the STORED mixture (which
    may be clipped / non-additive), not a re-sum of the sources — the host
    pipeline and the reference (`Datasets.py:203-204` maps random_amplify
    only when augmenting) both serve the record's mix (whole-package review
    finding). The fixture's mix is deliberately 0.9 while the sources sum
    to 0.8: a re-sum is detectable at every interior sample."""
    import jax
    from waveunet_tpu.data.device_cache import DeviceBank

    cfg = get_config("baseline", data_path=str(tmp_path / "cache"),
                     num_frames=1024, batch_size=4, augmentation=False)
    n = 8192
    d = tmp_path / "wavs"
    d.mkdir()
    samples = []
    for i in range(2):
        paths = {}
        for name, val in (("vocals", 0.4), ("accompaniment", 0.4),
                          ("mix", 0.9)):
            p = str(d / f"s{i}_{name}.wav")
            write_wav(p, np.full((n, 1), val, np.float32), cfg.expected_sr,
                      subtype="FLOAT")
            paths[name] = p
        samples.append(paths)
    cache.preprocess_partition(cfg, "train", samples, pad_frames=10)

    bank = DeviceBank(cfg, "train", cfg.num_frames, cfg.num_frames,
                      batch_size=4)
    b = next(bank.batches(jax.random.PRNGKey(0)))
    mix = np.asarray(b["mix"])
    # every sample is either context-pad zero or the STORED 0.9 — a source
    # re-sum would read 0.8 everywhere
    assert np.all((np.abs(mix) < 1e-4) | (np.abs(mix - 0.9) < 1e-3)), (
        mix.min(), mix.max())
    assert np.any(np.abs(mix - 0.9) < 1e-3)
    # sources still come through as targets
    np.testing.assert_allclose(
        np.asarray(b["vocals"])[np.abs(np.asarray(b["vocals"])) > 1e-4],
        0.4, atol=1e-3)


def test_device_bank_resynthesises_mix_when_augmenting(tmp_path):
    """With augmentation ON (production default) the mix is the re-sum of
    the ATTENUATED sources — the stored mixture must be ignored (and not
    uploaded: the bank carries only source rows)."""
    import jax
    from waveunet_tpu.data.device_cache import DeviceBank

    cfg = get_config("baseline", data_path=str(tmp_path / "cache"),
                     num_frames=1024, batch_size=4, augmentation=True)
    n = 8192
    d = tmp_path / "wavs"
    d.mkdir()
    paths = {}
    for name, val in (("vocals", 0.4), ("accompaniment", 0.4), ("mix", 0.9)):
        p = str(d / f"s_{name}.wav")
        write_wav(p, np.full((n, 1), val, np.float32), cfg.expected_sr,
                  subtype="FLOAT")
        paths[name] = p
    cache.preprocess_partition(cfg, "train", [paths], pad_frames=0)

    bank = DeviceBank(cfg, "train", cfg.num_frames, cfg.num_frames,
                      batch_size=4)
    assert bank._bank.shape[0] == cfg.num_sources  # no mix row uploaded
    b = next(bank.batches(jax.random.PRNGKey(0)))
    np.testing.assert_allclose(
        np.asarray(b["mix"]),
        np.asarray(b["vocals"]) + np.asarray(b["accompaniment"]), atol=1e-4)


def test_bank_int32_position_guard():
    """Snippet positions are int32: a bank over 2^31-1 cumulative samples
    must fail loudly at build (numpy 1.x would silently wrap the start
    table negative and train on wrong windows)."""
    from waveunet_tpu.data.device_cache import _check_int32_addressable

    _check_int32_addressable(2 ** 31 - 1, "device bank")  # fits
    with pytest.raises(ValueError, match="int32"):
        _check_int32_addressable(2 ** 31, "device bank")
