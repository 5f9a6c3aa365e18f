"""Device-resident validation (EvalBank): parity with the host eval pipeline.

The zero-host-byte validation sweep must reproduce the host path's
`Test.py:73-79` semantics exactly: same strided windows (hop = output_len),
same song order, same drop-remainder batching, same running-mean accumulation.
"""

import numpy as np
import jax
import pytest

from waveunet_tpu.config import get_config
from waveunet_tpu.data import cache
from waveunet_tpu.data.device_cache import EvalBank
from waveunet_tpu.data.pipeline import BatchPipeline
from waveunet_tpu.models.waveunet import init_waveunet
from waveunet_tpu.ops import shapes
from waveunet_tpu.train.loop import evaluate
from waveunet_tpu.train.step import make_eval_step


def _cfg(tmp_path, **kw):
    kw.setdefault("batch_size", 2)
    return get_config("baseline", num_layers=3, num_frames=256,
                      num_initial_filters=6,
                      data_path=str(tmp_path / "cache"), **kw)


def _make_cache(tmp_path, cfg, n_songs=3, seconds=0.8, amp=0.2,
                subtype="PCM_16", clip_mix=False):
    """Synthetic per-partition song cache. amp<=0.2 keeps |sample|<0.5 so the
    int16 bank round-trip error stays at the documented <=1 LSB."""
    from waveunet_tpu.data.audio_io import write_wav

    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    pad = (in_len - out_len) // 2
    for part in ("train", "valid", "test"):
        samples = []
        for i in range(n_songs):
            # varying lengths: exercises cross-song batch boundaries and the
            # drop-remainder tail
            n = int(cfg.expected_sr * seconds) + 731 * i
            t = np.arange(n) / cfg.expected_sr
            tracks, mix = {}, 0
            for j, name in enumerate(cfg.source_names):
                f = 180.0 * (j + 1) + 40 * i
                sig = (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)
                sig = np.tile(sig[:, None], (1, cfg.num_channels))
                tracks[name] = sig
                mix = mix + sig
            # the stored mixture is NOT necessarily the sum of sources
            # (the reference clips it, `Datasets.py:260-261`): eval must
            # consume the stored track, not re-sum
            tracks["mix"] = np.clip(mix, -0.25, 0.25) if clip_mix else mix
            d = tmp_path / "wav" / part
            d.mkdir(parents=True, exist_ok=True)
            paths = {}
            for k, v in tracks.items():
                p = str(d / f"s{i}_{k}.wav")
                write_wav(p, v, cfg.expected_sr, subtype=subtype)
                paths[k] = p
            samples.append(paths)
        cache.preprocess_partition(cfg, part, samples, pad_frames=pad)


def _host_loss(cfg, params, in_len, out_len):
    pipe = BatchPipeline(cfg, "valid", in_len, out_len, seed=cfg.seed)
    return evaluate(cfg, params, {}, make_eval_step(cfg),
                    pipe.eval_batches())


def test_eval_bank_fp32_matches_host_pipeline(tmp_path):
    cfg = _cfg(tmp_path)
    _make_cache(tmp_path, cfg, subtype="FLOAT")
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)

    bank = EvalBank(cfg, "valid", in_len, out_len, dtype="float32")
    got = bank.evaluate(params, {})
    want = _host_loss(cfg, params, in_len, out_len)
    # identical windows/batches/accumulation; only XLA fusion differs
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # batch count matches the host drop-remainder composition
    n_host = sum(1 for _ in BatchPipeline(cfg, "valid", in_len, out_len,
                                          seed=0).eval_batches())
    assert bank.n_batches == n_host > 1


def test_eval_bank_chunked_sweep_matches_monolithic(tmp_path):
    """scan_chunk cuts the eval sweep into several dispatches (the runtime
    crashes on single long programs — config.scan_chunk docs); the chunked
    sweep must be bit-identical to the one-program sweep."""
    cfg = _cfg(tmp_path)
    _make_cache(tmp_path, cfg, subtype="FLOAT")
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)

    bank = EvalBank(cfg, "valid", in_len, out_len, dtype="float32")
    assert bank.n_batches >= 3
    mono = bank.evaluate(params, {})
    # chunk of 4*1 = 4... force tiny chunks incl. a remainder dispatch
    bank.cfg = cfg.replace(scan_chunk=1)
    bank._sweep = None  # rebuild programs under the new plan
    plan = bank._chunk_plan()
    assert len(plan) > 1 and plan[-1][0] <= 4
    chunked = bank.evaluate(params, {})
    assert chunked == mono


def test_eval_bank_uses_stored_mixture(tmp_path):
    """A clipped stored mixture must flow into the eval loss (re-summing the
    sources would silently score a different input)."""
    cfg = _cfg(tmp_path)
    _make_cache(tmp_path, cfg, subtype="FLOAT", clip_mix=True)
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    bank = EvalBank(cfg, "valid", in_len, out_len, dtype="float32")
    got = bank.evaluate(params, {})
    want = _host_loss(cfg, params, in_len, out_len)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_eval_bank_int16_close(tmp_path):
    """int16 bank (the HBM-budget default) tracks the fp32 loss to the <=1 LSB
    quantisation bound."""
    cfg = _cfg(tmp_path)
    _make_cache(tmp_path, cfg, subtype="PCM_16")
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    f32 = EvalBank(cfg, "valid", in_len, out_len, dtype="float32")
    i16 = EvalBank(cfg, "valid", in_len, out_len, dtype="int16")
    a, b = f32.evaluate(params, {}), i16.evaluate(params, {})
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-8)


def test_eval_bank_set_batch_rechunks(tmp_path):
    """Round-2 batch doubling re-chunks the window list without rebuilding
    the bank, matching the host pipeline at the new batch size."""
    cfg = _cfg(tmp_path)
    _make_cache(tmp_path, cfg, subtype="FLOAT")
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    bank = EvalBank(cfg, "valid", in_len, out_len, dtype="float32")
    arr0 = bank._bank
    bank.set_batch(4)
    assert bank._bank is arr0  # no re-upload
    got = bank.evaluate(params, {})
    cfg4 = cfg.replace(batch_size=4)
    want = _host_loss(cfg4, params, in_len, out_len)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_eval_bank_mesh_matches_single_device(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from waveunet_tpu.parallel.mesh import make_mesh

    cfg = _cfg(tmp_path, batch_size=8)
    _make_cache(tmp_path, cfg, n_songs=4, seconds=1.2, subtype="FLOAT")
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    bank = EvalBank(cfg, "valid", in_len, out_len, dtype="float32")
    single = bank.evaluate(params, {})
    bank.set_batch(8)  # reset cached sweep, then shard over the mesh
    sharded = bank.evaluate(params, {}, mesh=make_mesh())
    np.testing.assert_allclose(sharded, single, rtol=1e-5)


def test_optimise_device_validation_end_to_end(tmp_path):
    """The driver's validation rides the EvalBank when device_data is on, and
    the run completes with finite losses."""
    from waveunet_tpu.train.loop import optimise

    cfg = _cfg(tmp_path, epoch_it=2, num_snippets_per_track=4, cache_size=8,
               worse_epochs=1, model_base_dir=str(tmp_path / "ckpts"),
               log_dir=str(tmp_path / "logs"))
    _make_cache(tmp_path, cfg)
    best_path, test_loss = optimise(cfg, experiment_id="devval",
                                    max_epochs_per_round=1)
    assert np.isfinite(test_loss)
    assert best_path


def test_eval_bank_host_sharded_loss_sums(tmp_path):
    """Pod validation path: per-host song shards' (sum, count) pairs compose
    to the full-bank mean, and an over-sharded (empty) host shard contributes
    weight 0 instead of raising."""
    cfg = _cfg(tmp_path, batch_size=1)
    _make_cache(tmp_path, cfg, n_songs=3, subtype="FLOAT")
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)

    full = EvalBank(cfg, "valid", in_len, out_len, dtype="float32")
    want = full.evaluate(params, {})

    sums, counts, shard_windows = 0.0, 0, 0
    for h in range(2):
        b = EvalBank(cfg, "valid", in_len, out_len, dtype="float32",
                     host_id=h, num_hosts=2)
        s, c = b.loss_sums(params, {})
        sums += s
        counts += c
        shard_windows += b.n_windows
    # the shards partition the window set exactly (batch=1: no remainder)
    assert shard_windows == full.n_windows
    np.testing.assert_allclose(sums / counts, want, rtol=1e-6)

    # single-process pod_weighted_mean reduces to sum/count
    from waveunet_tpu.parallel.distributed import pod_weighted_mean
    np.testing.assert_allclose(pod_weighted_mean(sums, counts),
                               sums / counts, rtol=1e-6)

    # more hosts than eval songs: legal empty shard, weight 0
    empty = EvalBank(cfg, "valid", in_len, out_len, dtype="float32",
                     host_id=5, num_hosts=6)
    assert empty.loss_sums(params, {}) == (0.0, 0)
    assert empty.n_windows == 0 and empty.nbytes() == 0
    assert empty.evaluate(params, {}) == float("inf")


def test_pod_host_evaluate_single_process(tmp_path):
    """The host-pipeline pod fallback on one process: (sum, count) over this
    host's shard equals the plain host evaluate, and pod_weighted_mean turns
    it into the same mean."""
    from waveunet_tpu.parallel.distributed import pod_weighted_mean
    from waveunet_tpu.train.loop import _pod_host_evaluate

    cfg = _cfg(tmp_path, batch_size=2)
    _make_cache(tmp_path, cfg, subtype="FLOAT")
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    s, c = _pod_host_evaluate(cfg, params, {}, "valid", in_len, out_len)
    assert c > 0
    want = _host_loss(cfg, params, in_len, out_len)
    np.testing.assert_allclose(pod_weighted_mean(s, c), want, rtol=1e-6)


def test_pod_weighted_mean_preserves_f64():
    """The allgather wires (sum, count) as f64 bit patterns: a sum whose
    low bits vanish in float32 must come back exact (thousands of eval
    batches otherwise inject ~1e-4 relative rounding noise into the
    validation mean, enough to flip adjacent-epoch early-stop decisions)."""
    from waveunet_tpu.parallel.distributed import pod_weighted_mean

    s = 1.0 + 2.0 ** -30  # == 1.0 after a float32 round-trip
    assert np.float32(s) == np.float32(1.0)
    assert pod_weighted_mean(s, 1) == s


def test_pod_host_evaluate_empty_vs_real_errors(tmp_path, monkeypatch):
    """Only an EmptyShardError counts as a legitimate weight-0 shard; any
    other ValueError (bad batch split, config errors) must raise — a pod
    that silently turns a config error into inf validation every epoch
    trains to worse_epochs and exits 0 with no model."""
    from waveunet_tpu.data.pipeline import EmptyShardError
    from waveunet_tpu.parallel import distributed as D
    from waveunet_tpu.train.loop import _pod_host_evaluate

    cfg = _cfg(tmp_path, batch_size=2)
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)

    assert issubclass(EmptyShardError, ValueError)

    def empty(*a, **k):
        raise EmptyShardError("no songs for this host")

    monkeypatch.setattr(D, "make_pod_pipeline", empty)
    assert _pod_host_evaluate(cfg, params, {}, "valid",
                              in_len, out_len) == (0.0, 0)

    def boom(*a, **k):
        raise ValueError("batch_size must divide evenly across hosts")

    monkeypatch.setattr(D, "make_pod_pipeline", boom)
    with pytest.raises(ValueError, match="divide evenly"):
        _pod_host_evaluate(cfg, params, {}, "valid", in_len, out_len)
