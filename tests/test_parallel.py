"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waveunet_tpu.config import get_config
from waveunet_tpu.infer.engine import Separator
from waveunet_tpu.models.waveunet import init_waveunet
from waveunet_tpu.ops import shapes
from waveunet_tpu.parallel.mesh import batch_sharded, make_mesh, replicated
from waveunet_tpu.train.step import make_eval_step, make_train_step


def _require_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def test_make_mesh():
    _require_8()
    mesh = make_mesh()
    assert mesh.size == 8 and mesh.axis_names == ("data",)


def test_sharded_train_step_matches_single_device(rng):
    """One DP step on the 8-device mesh == the same step on one device."""
    _require_8()
    cfg = get_config("baseline", num_layers=2, num_frames=128,
                     num_initial_filters=8, batch_size=8)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    srcs = {s: (0.2 * rng.standard_normal((8, out_len, 1))).astype(np.float32)
            for s in cfg.source_names}
    batch = {k: jnp.asarray(v) for k, v in srcs.items()}
    batch["mix"] = jnp.asarray(sum(srcs.values()))

    # train steps donate their param/opt buffers: give each call its own copy
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    init_opt, step1 = make_train_step(cfg, 1e-4)
    p1, s1, o1, l1 = step1(copy(params), {}, init_opt(params), batch,
                           jax.random.PRNGKey(0))

    mesh = make_mesh()
    init_opt, step8 = make_train_step(cfg, 1e-4, mesh=mesh)
    p8, s8, o8, l8 = step8(copy(params), {}, init_opt(params), batch,
                           jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    for k in p1:
        np.testing.assert_allclose(np.asarray(p1[k]["kernel"]),
                                   np.asarray(p8[k]["kernel"]),
                                   rtol=1e-4, atol=1e-6)


def test_sharded_eval_step(rng):
    _require_8()
    cfg = get_config("baseline", num_layers=2, num_frames=128,
                     num_initial_filters=8)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh()
    ev = make_eval_step(cfg, mesh=mesh)
    srcs = {s: (0.2 * rng.standard_normal((8, 128, 1))).astype(np.float32)
            for s in cfg.source_names}
    batch = {k: jnp.asarray(v) for k, v in srcs.items()}
    batch["mix"] = jnp.asarray(sum(srcs.values()))
    assert np.isfinite(float(ev(params, {}, batch)))


def test_mesh_separator_matches_single_device(rng):
    """Window-parallel inference over the mesh == single-device result."""
    _require_8()
    cfg = get_config("baseline_context", num_layers=3, num_frames=256,
                     infer_batch=2)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    _, out_len = shapes.get_padding(cfg, cfg.num_frames)
    audio = (0.1 * rng.standard_normal((out_len * 7 + 13, 1))
             ).astype(np.float32)

    single = Separator(cfg, params).separate(audio, cfg.expected_sr)
    mesh = make_mesh()
    multi = Separator(cfg, params, mesh=mesh).separate(audio, cfg.expected_sr)
    for s in cfg.source_names:
        np.testing.assert_allclose(multi[s], single[s], atol=1e-5)


def test_pod_helpers_single_host(tmp_path, rng):
    """Pod glue degrades gracefully to one host: full batch slice, global
    assembly matches local arrays."""
    from waveunet_tpu.parallel import distributed as D

    assert D.initialize() == 0
    assert D.local_batch_slice(8) == slice(0, 8)

    _require_8()
    mesh = make_mesh()
    local = {"mix": rng.standard_normal((8, 16, 1)).astype(np.float32)}
    glob = D.global_batch_from_local(mesh, local)
    assert glob["mix"].shape == (8, 16, 1)
    np.testing.assert_allclose(np.asarray(glob["mix"]), local["mix"])


def test_pod_two_processes(tmp_path):
    """REAL 2-process pod: jax.distributed over a localhost coordinator, gloo
    CPU collectives, 2 hosts x 2 devices. Each host feeds its disjoint
    pipeline shard; the sharded eval loss must (a) agree across hosts and
    (b) equal the single-process loss over the concatenated host shards."""
    import json
    import socket
    import subprocess
    import sys

    from tests.test_integration import _make_cache
    from waveunet_tpu.models.waveunet import init_waveunet
    from waveunet_tpu.data.pipeline import BatchPipeline

    cfg_kw = dict(preset="baseline", num_layers=2, num_frames=256,
                  num_initial_filters=4, batch_size=4,
                  num_snippets_per_track=4, cache_size=8,
                  data_path=str(tmp_path / "cache"))
    cfg = get_config(**{k: v for k, v in cfg_kw.items() if k != "preset"})
    _make_cache(tmp_path, cfg, n_songs=4)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "helpers",
                          "pod_worker.py")
    env = dict(os.environ)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port), json.dumps(cfg_kw)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
        results.append(json.loads(out.decode().strip().splitlines()[-1]))

    by_pid = {r["pid"]: r for r in results}
    assert set(by_pid) == {0, 1}
    for r in results:
        assert r["procs"] == 2 and r["devices"] == 4
        assert r["local_rows"] == 2
    assert by_pid[0]["slice"] == [0, 2] and by_pid[1]["slice"] == [2, 4]
    # hosts read DISJOINT song subsets
    assert by_pid[0]["digest"] != by_pid[1]["digest"]
    # the jitted loss is a cross-process collective: all hosts see one value
    assert by_pid[0]["loss"] == by_pid[1]["loss"]
    # the TRAIN step's gradient all-reduce ran across processes: both hosts
    # hold the same finite loss and identical replicated post-update params
    assert by_pid[0]["train_loss"] == by_pid[1]["train_loss"]
    assert np.isfinite(by_pid[0]["train_loss"])
    assert by_pid[0]["param_digest"] == by_pid[1]["param_digest"]
    # the device-SHARDED bank round-robins 4 songs over the 4 global devices
    # (2 per process), and the pod scanned epoch reproduces the eager
    # sample+step loop's losses, identically on every host
    assert sorted(r["sharded_local_songs"] for r in results) == [2, 2]
    for r in results:
        np.testing.assert_allclose(r["scanned_losses"], r["eager_losses"],
                                   rtol=1e-5)
        assert all(np.isfinite(v) for v in r["scanned_losses"])
    assert by_pid[0]["scanned_losses"] == by_pid[1]["scanned_losses"]

    # single-process oracle: concat the two host shards, eval on one device
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    halves = [next(BatchPipeline(cfg, "valid", in_len, out_len,
                                 batch_size=2, host_id=h, num_hosts=2,
                                 seed=0).eval_batches()) for h in (0, 1)]
    glob = {k: np.concatenate([halves[0][k], halves[1][k]]) for k in halves[0]}
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    loss_1p = float(make_eval_step(cfg)(params, {},
                                        {k: jnp.asarray(v)
                                         for k, v in glob.items()}))
    np.testing.assert_allclose(by_pid[0]["loss"], loss_1p, rtol=1e-5)


def test_pod_two_process_cli_train(tmp_path):
    """The pod path as a PRODUCT surface: two processes each run the real
    `cli train` command (coordinator=/num_processes=/process_id= options),
    sharing a coordinator over gloo. Both must converge with IDENTICAL
    validation/test losses (every loss is a cross-process collective), train
    from per-host device banks over disjoint song subsets, and only process 0
    writes checkpoints/metrics. The terminal final_eval is track-sharded:
    every process scores a disjoint stride of the test tracks on its local
    devices, then process 0 aggregates the shared results dir."""
    import json
    import re
    import socket
    import subprocess
    import sys

    from tests.test_integration import _make_cache

    cfg_kw = dict(num_layers=2, num_frames=256, num_initial_filters=4,
                  batch_size=4, epoch_it=2, num_snippets_per_track=4,
                  cache_size=8, worse_epochs=1,
                  data_path=str(tmp_path / "cache"),
                  musdb_path=str(tmp_path / "db"),
                  estimates_path=str(tmp_path / "est"))
    cfg = get_config("baseline", **cfg_kw)
    _make_cache(tmp_path, cfg, n_songs=4)

    # two musdb-layout test tracks for final_eval: the pod eval strides the
    # sorted enumeration across processes (songP -> shard 0, songQ -> shard 1)
    from waveunet_tpu.data.audio_io import write_wav
    n = cfg.expected_sr * 2
    t = np.arange(n) / cfg.expected_sr
    for song, f0, f1 in (("songP", 440.0, 220.0), ("songQ", 330.0, 110.0)):
        d = tmp_path / "db" / "test" / song
        d.mkdir(parents=True)
        voc = (0.3 * np.sin(2 * np.pi * f0 * t))[:, None].astype(np.float32)
        acc = (0.3 * np.sin(2 * np.pi * f1 * t))[:, None].astype(np.float32)
        write_wav(str(d / "vocals.wav"), voc, cfg.expected_sr)
        write_wav(str(d / "accompaniment.wav"), acc, cfg.expected_sr)
        write_wav(str(d / "mixture.wav"), voc + acc, cfg.expected_sr)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    args = (["train", "baseline"]
            + [f"{k}={v}" for k, v in cfg_kw.items()]
            + [f"model_base_dir={tmp_path / 'ckpts'}",
               f"log_dir={tmp_path / 'logs'}",
               "experiment_id=podtrain", "max_epochs=1",
               "final_eval=1", "max_tracks=2"])
    worker = os.path.join(os.path.dirname(__file__), "helpers",
                          "pod_train_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port), json.dumps(args)],
        env=dict(os.environ), stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, (err.decode()[-3000:], out.decode()[-1000:])
        outs.append(out.decode())

    # the device-SHARDED bank engages (scan_epoch default): the cache's 4
    # train songs round-robin over the 4 global devices — 2 per process's
    # local HBM, summing to the full partition — and the whole-epoch
    # lax.scan runs across processes (no eager per-step pod loop)
    banks = [re.search(r"device-sharded bank: (\d+) songs", o) for o in outs]
    assert all(banks), outs
    assert sorted(int(m.group(1)) for m in banks) == [2, 2]

    # identical loss trajectories: validation lines + final test loss
    def losses(o):
        vals = re.findall(r"Validation (?:improved .* -> |worsened to )"
                          r"([0-9.eE+-]+|inf)", o)
        final = re.search(r"Best model: (.*); test loss ([0-9.eE+-]+)", o)
        assert vals and final, o[-2000:]
        return [float(v) for v in vals], final.group(1), float(final.group(2))

    (v0, best0, t0), (v1, best1, t1) = losses(outs[0]), losses(outs[1])
    assert v0 == v1 and t0 == t1 and best0 == best1
    assert all(np.isfinite(v) for v in v0) and np.isfinite(t0)
    # 1 epoch x 2 rounds ran
    assert len(v0) == 2

    # only process 0 wrote checkpoints + metrics; best_path exists
    assert os.path.isdir(best0), best0
    assert os.path.exists(tmp_path / "logs" / "podtrain" / "metrics.jsonl")
    assert os.path.exists(tmp_path / "ckpts" / "podtrain" / "best.txt")

    # final_eval is track-sharded: each process scored its stride of the
    # sorted track list on LOCAL devices (songP -> shard 0, songQ -> shard 1),
    # both JSONs landed in the shared results dir, and only process 0 printed
    # the aggregate table (after the terminal barrier, over BOTH shards'
    # results).
    for i, song in enumerate(("songP", "songQ")):
        assert f"Separating {song}" in outs[i], outs[i][-1500:]
        assert f"{song} median SDR" in outs[i], outs[i][-1500:]
        assert os.path.exists(tmp_path / "est" / "test" / f"{song}.json")
    assert "Skipping songQ (shard 1/2's track)" in outs[0], outs[0][-1500:]
    assert "Skipping songP (shard 0/2's track)" in outs[1], outs[1][-1500:]
    # aggregate table ("<src>: SDR median ...") comes from process 0 only
    assert "SDR median" in outs[0], outs[0][-1500:]
    assert ": SDR median" not in outs[1], outs[1][-1500:]


def test_pod_two_process_cli_evaluate(tmp_path):
    """`cli evaluate` under the same pod grammar as `train`: two processes
    score a disjoint track shard each on their local devices (random-init
    params — the surface under test is the sharded wiring, not quality) and
    process 0 prints the aggregate table over both shards' JSONs."""
    import json
    import socket
    import subprocess
    import sys

    from waveunet_tpu.data.audio_io import write_wav

    cfg_kw = dict(num_layers=2, num_frames=256, num_initial_filters=4,
                  musdb_path=str(tmp_path / "db"),
                  estimates_path=str(tmp_path / "est"))
    cfg = get_config("baseline", **cfg_kw)
    n = cfg.expected_sr * 2
    t = np.arange(n) / cfg.expected_sr
    for song, f0, f1 in (("songP", 440.0, 220.0), ("songQ", 330.0, 110.0)):
        d = tmp_path / "db" / "test" / song
        d.mkdir(parents=True)
        voc = (0.3 * np.sin(2 * np.pi * f0 * t))[:, None].astype(np.float32)
        acc = (0.3 * np.sin(2 * np.pi * f1 * t))[:, None].astype(np.float32)
        write_wav(str(d / "vocals.wav"), voc, cfg.expected_sr)
        write_wav(str(d / "accompaniment.wav"), acc, cfg.expected_sr)
        write_wav(str(d / "mixture.wav"), voc + acc, cfg.expected_sr)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    args = (["evaluate", "baseline", "random_init=1"]
            + [f"{k}={v}" for k, v in cfg_kw.items()])
    worker = os.path.join(os.path.dirname(__file__), "helpers",
                          "pod_train_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port), json.dumps(args)],
        env=dict(os.environ), stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, (err.decode()[-3000:], out.decode()[-1000:])
        outs.append(out.decode())

    for i, song in enumerate(("songP", "songQ")):
        assert f"pod test eval: scoring track shard {i}/2" in outs[i], \
            outs[i][-1500:]
        assert f"Separating {song}" in outs[i], outs[i][-1500:]
        assert os.path.exists(tmp_path / "est" / "test" / f"{song}.json")
    # aggregate table printed by process 0 only, over BOTH shards
    assert ": SDR median" in outs[0], outs[0][-1500:]
    assert ": SDR median" not in outs[1], outs[1][-1500:]


def _synthetic_tracks(cfg, n_songs, min_len, rng, constant=None):
    """n_songs track dicts; ``constant`` makes source j of song i the flat
    value (i+1)*(j+1)/100 (provenance-checkable after int16 round-trip)."""
    tracks = []
    for i in range(n_songs):
        n = min_len + 300 + 41 * i
        t = {}
        for j, s in enumerate(cfg.source_names):
            if constant:
                t[s] = np.full((n, cfg.num_channels),
                               (i + 1) * (j + 1) / 100, np.float32)
            else:
                t[s] = (0.2 * rng.standard_normal((n, cfg.num_channels))
                        ).astype(np.float32)
        t["mix"] = np.zeros((n, cfg.num_channels), np.float32)
        tracks.append(t)
    return tracks


def test_sharded_bank_scanned_matches_eager(rng):
    """The pod scanned epoch (shard_map sampler inside the whole-epoch
    lax.scan over the device-sharded bank) reproduces the eager
    sample+step loop exactly — per-chunk dispatches bit-match the
    monolithic scan, and donated buffers thread through."""
    _require_8()
    from waveunet_tpu.data.device_cache import ShardedBank
    from waveunet_tpu.models.waveunet import init_waveunet
    from waveunet_tpu.train.step import make_scanned_epoch, make_train_step

    cfg = get_config("baseline", num_layers=2, num_frames=256,
                     num_initial_filters=4, batch_size=8, epoch_it=4)
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    mesh = make_mesh()
    bank = ShardedBank.from_tracks(
        cfg, in_len, out_len, mesh,
        _synthetic_tracks(cfg, 8, in_len, rng), batch_size=cfg.batch_size)
    assert bank.local_songs == 8 and bank.n_local_devices == 8

    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    init_opt, step8 = make_train_step(cfg, 1e-4, mesh=mesh)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731
    kd, ks = jax.random.PRNGKey(5), jax.random.PRNGKey(6)

    p, o = copy(params), init_opt(copy(params))
    eager_losses = []
    it = bank.batches(kd)
    for i in range(cfg.epoch_it):
        p, _, o, l = step8(p, {}, o, next(it), jax.random.fold_in(ks, i))
        eager_losses.append(float(l))

    efn = make_scanned_epoch(cfg, 1e-4, cfg.epoch_it, bank.sample_raw,
                             mesh=mesh, bank_shardings=bank.shardings,
                             presharded_batch=True)
    p2, _, _, ls = efn(copy(params), {}, init_opt(copy(params)),
                       *bank.arrays, kd, ks, 0)
    np.testing.assert_allclose(np.asarray(ls), eager_losses, rtol=1e-5)
    for k in p:
        np.testing.assert_allclose(np.asarray(p2[k]["kernel"]),
                                   np.asarray(p[k]["kernel"]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)

    # chunked dispatches are BIT-exact vs the monolithic scan (absolute-index
    # key folds + sequential carry)
    efn2 = make_scanned_epoch(cfg, 1e-4, cfg.epoch_it, bank.sample_raw,
                              mesh=mesh, chunk=3,
                              bank_shardings=bank.shardings,
                              presharded_batch=True)
    _, _, _, ls2 = efn2(copy(params), {}, init_opt(copy(params)),
                        *bank.arrays, kd, ks, 0)
    np.testing.assert_array_equal(np.asarray(ls2), np.asarray(ls))


def test_sharded_bank_device_song_provenance(rng):
    """Each device's rows of the global batch come ONLY from its round-robin
    song shard, and the zero padding (to the global max shard size) is
    never sampled."""
    _require_8()
    from waveunet_tpu.data.device_cache import ShardedBank

    cfg = get_config("baseline", num_layers=2, num_frames=256,
                     num_initial_filters=4, batch_size=16,
                     augmentation=False)
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    mesh = make_mesh()
    n_songs = 12  # uneven: devices 0-3 get 2 songs, 4-7 get 1 (+ padding)
    tracks = _synthetic_tracks(cfg, n_songs, in_len, rng, constant=True)
    bank = ShardedBank.from_tracks(cfg, in_len, out_len, mesh, tracks,
                                   batch_size=cfg.batch_size)
    b_local = cfg.batch_size // 8
    src0 = cfg.source_names[0]
    for trial in range(4):
        batch = bank._sample(*bank.arrays,
                             jax.random.fold_in(jax.random.PRNGKey(3), trial))
        vals = np.asarray(batch[src0])  # [B, out_len, C], flat per row
        for d in range(8):
            allowed = np.asarray([(i + 1) / 100
                                  for i in range(d, n_songs, 8)])
            for r in range(d * b_local, (d + 1) * b_local):
                row = np.unique(vals[r])
                assert row.size == 1, "window crossed a song boundary/padding"
                assert np.isclose(row[0], allowed, atol=1e-4).any(), \
                    (d, r, row[0], allowed)


def test_sharded_bank_too_few_songs_raises(rng):
    """Fewer usable songs than devices is a consistent ValueError (the
    driver falls back to the per-host eager bank)."""
    _require_8()
    from waveunet_tpu.data.device_cache import ShardedBank

    cfg = get_config("baseline", num_layers=2, num_frames=256,
                     num_initial_filters=4, batch_size=8)
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    with pytest.raises(ValueError, match="song per device"):
        ShardedBank.from_tracks(cfg, in_len, out_len, make_mesh(),
                                _synthetic_tracks(cfg, 5, in_len, rng),
                                batch_size=8)


def test_scanned_epoch_on_mesh_matches_single_device(tmp_path):
    """The whole-epoch lax.scan with in-scan data-sharded batches produces
    the same training trajectory as its single-device counterpart."""
    _require_8()
    from tests.test_integration import _make_cache
    from waveunet_tpu.data.device_cache import DeviceBank
    from waveunet_tpu.models.waveunet import init_waveunet
    from waveunet_tpu.train.step import make_scanned_epoch, make_train_step

    cfg = get_config("baseline", num_layers=2, num_frames=256,
                     num_initial_filters=4, batch_size=8, epoch_it=4,
                     data_path=str(tmp_path / "cache"))
    _make_cache(tmp_path, cfg)
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    bank = DeviceBank(cfg, "train", in_len, out_len)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    init_opt, _ = make_train_step(cfg, 1e-4)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    keys = (jax.random.PRNGKey(5), jax.random.PRNGKey(6))

    e1 = make_scanned_epoch(cfg, 1e-4, cfg.epoch_it, bank.sample_raw)
    p1, _, _, l1 = e1(copy(params), {}, init_opt(copy(params)), bank._bank,
                      bank._starts, bank._valids, keys[0], keys[1], 0)

    mesh = make_mesh()
    e8 = make_scanned_epoch(cfg, 1e-4, cfg.epoch_it, bank.sample_raw,
                            mesh=mesh)
    p8, _, _, l8 = e8(copy(params), {}, init_opt(copy(params)), bank._bank,
                      bank._starts, bank._valids, keys[0], keys[1], 0)

    np.testing.assert_allclose(np.asarray(l8), np.asarray(l1), rtol=1e-5)
    for k in p1:
        np.testing.assert_allclose(np.asarray(p8[k]["kernel"]),
                                   np.asarray(p1[k]["kernel"]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_sharded_bank_stored_mix_when_augmentation_off(rng):
    """The device-sharded pod bank follows the same augmentation-off
    semantics as DeviceBank: the STORED (possibly non-additive) mixture row
    is served, not a source re-sum (whole-package review finding)."""
    _require_8()
    from waveunet_tpu.data.device_cache import ShardedBank

    cfg = get_config("baseline", num_layers=2, num_frames=256,
                     num_initial_filters=4, batch_size=8,
                     augmentation=False)
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    tracks = _synthetic_tracks(cfg, 8, in_len, rng, constant=True)
    for t in tracks:
        t["mix"] = np.full_like(t["mix"], 0.9)  # != sum(sources)
    mesh = make_mesh()
    bank = ShardedBank.from_tracks(cfg, in_len, out_len, mesh, tracks,
                                   batch_size=cfg.batch_size)
    b = next(bank.batches(jax.random.PRNGKey(0)))
    np.testing.assert_allclose(np.asarray(b["mix"]), 0.9, atol=1e-3)
    # sources are still the per-song constants, untouched by any augment
    v = np.asarray(b["vocals"])
    assert np.all(v > 0.0) and np.all(v < 0.2)
