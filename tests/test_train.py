"""Training tests: loss math, overfit smoke, checkpoint round-trip, resume."""

import numpy as np
import os
import jax
import jax.numpy as jnp
import pytest

from waveunet_tpu.config import get_config
from waveunet_tpu.models.waveunet import init_waveunet
from waveunet_tpu.ops import shapes
from waveunet_tpu.train import checkpoint as ckpt
from waveunet_tpu.train.step import make_eval_step, make_loss_fn, make_train_step


def _batch(cfg, rng, n=2):
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    srcs = {name: (0.2 * rng.standard_normal((n, out_len, cfg.num_channels))
                   ).astype(np.float32) for name in cfg.source_names}
    # mix = sum of sources, context-padded to the input window
    pad = (in_len - out_len) // 2
    mix = sum(srcs.values())
    mix = np.pad(mix, [(0, 0), (pad, pad), (0, 0)])
    batch = {k: jnp.asarray(v) for k, v in srcs.items()}
    batch["mix"] = jnp.asarray(mix)
    return batch


def test_loss_is_mean_mse_over_sources(rng):
    cfg = get_config("baseline", num_layers=3, num_frames=256)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, rng)
    loss_fn = make_loss_fn(cfg, training=True)
    loss, _ = loss_fn(params, {}, batch, None)
    # manual check
    from waveunet_tpu.models.waveunet import apply_waveunet
    est = apply_waveunet(params, cfg, batch["mix"], training=True)
    want = np.mean([np.mean((np.asarray(est[s]) - np.asarray(batch[s])) ** 2)
                    for s in cfg.source_names])
    np.testing.assert_allclose(float(loss), want, rtol=1e-6)


def test_overfit_tiny():
    """A few Adam steps on one fixed batch must reduce the loss sharply.

    Uses a private rng: the shared session fixture's stream shifts whenever
    tests are added, which made this threshold assertion order-dependent.
    """
    cfg = get_config("baseline", num_layers=2, num_frames=128,
                     num_initial_filters=8)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    init_opt, step = make_train_step(cfg, 1e-3)
    opt_state = init_opt(params)
    batch = _batch(cfg, np.random.default_rng(42), n=4)
    rng_key = jax.random.PRNGKey(0)
    losses = []
    state = {}
    for i in range(100):
        params, state, opt_state, loss = step(params, state, opt_state, batch,
                                              rng_key)
        losses.append(float(loss))
    assert losses[-1] < 0.3 * losses[0], (losses[0], losses[-1])


def test_eval_step_matches_loss(rng):
    cfg = get_config("baseline", num_layers=2, num_frames=128,
                     num_initial_filters=8)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, rng)
    ev = make_eval_step(cfg)
    loss = float(ev(params, {}, batch))
    assert np.isfinite(loss) and loss > 0


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = get_config("baseline", num_layers=2, num_frames=128,
                     num_initial_filters=8)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    init_opt, _ = make_train_step(cfg, cfg.init_sup_sep_lr)
    state = {"params": params, "model_state": {},
             "opt_state": init_opt(params), "step": 42}
    path = ckpt.save_checkpoint(str(tmp_path / "ck"), "exp1", 42, state)
    restored = ckpt.restore_checkpoint(path)
    assert int(restored["step"]) == 42
    for k in params:
        np.testing.assert_array_equal(np.asarray(restored["params"][k]["kernel"]),
                                      np.asarray(params[k]["kernel"]))
    assert ckpt.latest_checkpoint(str(tmp_path / "ck"), "exp1") == path


def test_async_checkpoint_matches_sync(tmp_path):
    """Background-writer saves must land bit-identical to sync saves, apply
    the retention policy, honour protect, and re-raise write errors through
    wait_for_saves (the train loop's single-process path, loop.py)."""
    base = str(tmp_path / "ck")
    state = {"step": 7, "w": np.arange(12, dtype=np.float32).reshape(3, 4)}
    sync_path = ckpt.save_checkpoint(base, "sync", 7, state)
    paths = []
    for s in range(4):
        paths.append(ckpt.save_checkpoint_async(
            base, "async", s, dict(state, step=s),
            prune_keep=2, protect=(paths[0] if paths else None,)))
    ckpt.wait_for_saves()
    # newest 2 kept + the protected step_0
    left = sorted(os.listdir(tmp_path / "ck" / "async"))
    assert left == [os.path.basename(p) for p in (paths[0],) + tuple(paths[2:])]
    got = ckpt.restore_checkpoint(paths[3])
    ref = ckpt.restore_checkpoint(sync_path)
    np.testing.assert_array_equal(np.asarray(got["w"]), np.asarray(ref["w"]))
    assert int(got["step"]) == 3
    # a failing write surfaces at the join, not silently
    target = ckpt.save_checkpoint_async(base, "boom", 0, state)
    os.makedirs(target, exist_ok=True)  # collide: orbax refuses to rename
    with open(os.path.join(target, "occupied"), "w") as f:
        f.write("x")
    try:
        ckpt.wait_for_saves()
    except Exception:
        pass
    else:  # orbax force=True may clobber instead — either way no deadlock
        assert os.path.isdir(target)


def test_spectrogram_train_step(rng):
    """One train step of the spectrogram net updates params + BN stats."""
    cfg = get_config("unet_spectrogram", num_layers=3,
                     num_frames=768 * 15 + 1024, batch_size=1)
    from waveunet_tpu.models.spectrogram_unet import init_spectrogram_unet
    params, mstate = init_spectrogram_unet(jax.random.PRNGKey(0), cfg)
    init_opt, step = make_train_step(cfg, 1e-4)
    opt_state = init_opt(params)
    n = cfg.num_frames
    srcs = {s: (0.1 * rng.standard_normal((1, n, 1))).astype(np.float32)
            for s in cfg.source_names}
    batch = {k: jnp.asarray(v) for k, v in srcs.items()}
    batch["mix"] = jnp.asarray(sum(srcs.values()))
    k = f"{cfg.source_names[0]}/down_0_bn"
    mean_before = np.asarray(mstate[k]["mean"]).copy()  # step donates buffers
    p2, s2, opt_state, loss = step(params, mstate, opt_state, batch,
                                   jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert float(np.max(np.abs(np.asarray(s2[k]["mean"]) - mean_before))) > 0


def test_remat_matches_plain_grads(rng):
    """jax.checkpoint rematerialisation must not change loss or gradients."""
    from waveunet_tpu.train.step import make_loss_fn

    base = get_config("baseline", num_layers=2, num_frames=128,
                      num_initial_filters=8)
    params = init_waveunet(jax.random.PRNGKey(0), base)
    batch = _batch(base, rng)

    def grads(cfg):
        loss_fn = make_loss_fn(cfg, training=True)
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, {}, batch, None)
        return float(l), g

    l0, g0 = grads(base)
    l1, g1 = grads(base.replace(remat=True))
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    for k in g0:
        np.testing.assert_allclose(np.asarray(g0[k]["kernel"]),
                                   np.asarray(g1[k]["kernel"]),
                                   rtol=1e-5, atol=1e-7)


def test_checkpoint_retention(tmp_path):
    from waveunet_tpu.train.checkpoint import (latest_checkpoint,
                                               prune_checkpoints,
                                               save_checkpoint)

    base = str(tmp_path / "ck")
    paths = [save_checkpoint(base, "e", s, {"step": s}) for s in range(5)]
    # keep=0: no pruning (reference parity)
    prune_checkpoints(base, "e", 0)
    assert len(os.listdir(tmp_path / "ck" / "e")) == 5
    # keep 2 newest, protect an old one (the "best" model)
    prune_checkpoints(base, "e", 2, protect=(paths[1],))
    left = sorted(os.listdir(tmp_path / "ck" / "e"))
    assert len(left) == 3
    assert os.path.basename(paths[1]) in left
    assert latest_checkpoint(base, "e") == paths[4]


def test_adam_slots_carry_across_round_boundary():
    """Round 2 (doubled batch, lr 1e-5) continues from round-1 Adam slots —
    the reference restores ALL variables, incl. Adam moments and beta-power
    accumulators, when it rebuilds the graph for the fine-tune round
    (`Training.py:92-96,131-137`). The same opt_state pytree must thread
    straight into a step_fn built at the new lr."""
    import optax

    cfg = get_config("baseline", num_layers=2, num_frames=128,
                     num_initial_filters=8)
    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    init_opt, step1 = make_train_step(cfg, 1e-4)
    opt_state = init_opt(params)
    batch = _batch(cfg, np.random.default_rng(7), n=2)
    key = jax.random.PRNGKey(0)
    mstate = {}
    for _ in range(3):
        params, mstate, opt_state, _ = step1(params, mstate, opt_state,
                                             batch, key)

    adam = next(s for s in jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
        if isinstance(x := s, optax.ScaleByAdamState))
    assert int(adam.count) == 3
    mu_before = jax.tree_util.tree_map(np.asarray, adam.mu)

    # round boundary: new step_fn at the fine-tune lr consumes the SAME state
    _, step2 = make_train_step(
        cfg.replace(batch_size=cfg.batch_size * 2, init_sup_sep_lr=1e-5), 1e-5)
    params, mstate, opt_state, loss = step2(params, mstate, opt_state,
                                            batch, key)
    adam2 = next(s for s in jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
        if isinstance(s, optax.ScaleByAdamState))
    # count continued (4), moments evolved from the carried values, not zeros
    assert int(adam2.count) == 4
    mu_after = jax.tree_util.tree_map(np.asarray, adam2.mu)
    l0 = jax.tree_util.tree_leaves(mu_before)[0]
    l1 = jax.tree_util.tree_leaves(mu_after)[0]
    assert np.any(l0 != 0) and not np.allclose(l0, l1)
    assert np.isfinite(float(loss))


def test_optimise_preserves_opt_state_across_rounds(tmp_path, monkeypatch):
    """Wiring check: loop.optimise must never re-initialise optimiser slots
    after init_state/restore (round boundaries included)."""
    from waveunet_tpu.train import loop as loop_mod

    calls = {"init": 0}
    real = loop_mod.make_train_step

    def counting(cfg, lr, mesh=None):
        init_opt, step = real(cfg, lr, mesh=mesh)

        def counted_init(p):
            calls["init"] += 1
            return init_opt(p)
        return counted_init, step

    monkeypatch.setattr(loop_mod, "make_train_step", counting)
    from tests.test_integration import _make_cache
    cfg = get_config("baseline", num_layers=2, num_frames=256,
                     num_initial_filters=4, batch_size=2, epoch_it=2,
                     num_snippets_per_track=4, cache_size=8, worse_epochs=1,
                     data_path=str(tmp_path / "cache"),
                     model_base_dir=str(tmp_path / "ckpt"),
                     log_dir=str(tmp_path / "logs"))
    _make_cache(tmp_path, cfg)
    loop_mod.optimise(cfg, experiment_id="slots", max_epochs_per_round=1)
    # exactly one init: the one inside init_state()
    assert calls["init"] == 1


def test_scanned_epoch_matches_eager_loop(tmp_path):
    """One lax.scan epoch over the device bank == the eager per-step loop
    with aligned key conventions (same batches, same step rngs)."""
    from tests.test_integration import _make_cache
    from waveunet_tpu.data.device_cache import DeviceBank
    from waveunet_tpu.train.step import make_scanned_epoch, make_train_step

    cfg = get_config("baseline", num_layers=2, num_frames=256,
                     num_initial_filters=4, batch_size=2, epoch_it=5,
                     data_path=str(tmp_path / "cache"))
    _make_cache(tmp_path, cfg)
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    bank = DeviceBank(cfg, "train", in_len, out_len)

    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    init_opt, step_fn = make_train_step(cfg, 1e-4)
    data_key = jax.random.PRNGKey(123)
    step_rng = jax.random.PRNGKey(7)

    # eager: sample + step per iteration with the scan's key convention
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    p_e, ms_e, opt_e = copy(params), {}, init_opt(params)
    eager_losses = []
    for i in range(cfg.epoch_it):
        batch = bank._sample(bank._bank, bank._starts, bank._valids,
                             jax.random.fold_in(data_key, i))
        p_e, ms_e, opt_e, loss = step_fn(p_e, ms_e, opt_e, batch,
                                         jax.random.fold_in(step_rng, i))
        eager_losses.append(float(loss))

    epoch_fn = make_scanned_epoch(cfg, 1e-4, cfg.epoch_it, bank.sample_raw)
    p_s, ms_s, opt_s, losses = epoch_fn(
        copy(params), {}, init_opt(params), bank._bank, bank._starts,
        bank._valids, data_key, step_rng, 0)

    np.testing.assert_allclose(np.asarray(losses), eager_losses, rtol=1e-5)
    for k in p_e:
        np.testing.assert_allclose(np.asarray(p_s[k]["kernel"]),
                                   np.asarray(p_e[k]["kernel"]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_chunked_scanned_epoch_matches_monolithic(tmp_path):
    """chunk=N cuts the scanned epoch into several dispatches of the same
    compiled program; both RNG streams fold on the absolute step index, so
    the result must be BIT-IDENTICAL to the single-program scan (the chunking
    exists only to bound per-program device time — config.scan_chunk docs)."""
    from tests.test_integration import _make_cache
    from waveunet_tpu.data.device_cache import DeviceBank
    from waveunet_tpu.train.step import make_scanned_epoch, make_train_step

    cfg = get_config("baseline", num_layers=2, num_frames=256,
                     num_initial_filters=4, batch_size=2, epoch_it=5,
                     data_path=str(tmp_path / "cache"))
    _make_cache(tmp_path, cfg)
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    bank = DeviceBank(cfg, "train", in_len, out_len)

    params = init_waveunet(jax.random.PRNGKey(0), cfg)
    init_opt, _ = make_train_step(cfg, 1e-4)
    data_key = jax.random.PRNGKey(123)
    step_rng = jax.random.PRNGKey(7)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    outs = []
    for chunk in (None, 2):  # 2 -> chunks of [2, 2, 1] incl. remainder
        fn = make_scanned_epoch(cfg, 1e-4, cfg.epoch_it, bank.sample_raw,
                                chunk=chunk)
        outs.append(fn(copy(params), {}, init_opt(params), bank._bank,
                       bank._starts, bank._valids, data_key, step_rng, 0))
    (p_m, _, opt_m, l_m), (p_c, _, opt_c, l_c) = outs
    np.testing.assert_array_equal(np.asarray(l_m), np.asarray(l_c))
    for k in p_m:
        np.testing.assert_array_equal(np.asarray(p_m[k]["kernel"]),
                                      np.asarray(p_c[k]["kernel"]), err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        opt_m, opt_c)


def test_optimise_scanned_vs_loop(tmp_path):
    """optimise() end-to-end with scan_epoch on and off is the SAME training
    run: the eager bank iterator folds its data key from the absolute step
    (device_cache.DeviceBank.batches ``start=``), so the sample stream
    matches the scanned epoch's fold_in(data_key, step) in round 2 as well —
    a scan_epoch=0/1 toggle must not change what the model trains on
    (whole-package review finding: the streams diverged after round 1)."""
    from tests.test_integration import _make_cache
    from waveunet_tpu.train import loop as loop_mod

    results = {}
    for scan in (True, False):
        base = tmp_path / ("scan" if scan else "loop")
        cfg = get_config("baseline", num_layers=2, num_frames=256,
                         num_initial_filters=4, batch_size=2, epoch_it=3,
                         num_snippets_per_track=4, cache_size=8,
                         worse_epochs=1, scan_epoch=scan,
                         data_path=str(base / "cache"),
                         model_base_dir=str(base / "ckpt"),
                         log_dir=str(base / "logs"))
        _make_cache(base, cfg)
        # 2 epochs/round so round 2 runs from a nonzero absolute step — the
        # regime where a 0-based eager fold used to diverge from the scan
        best, test_loss = loop_mod.optimise(cfg, experiment_id="s",
                                            max_epochs_per_round=2)
        assert np.isfinite(test_loss)
        assert best and os.path.exists(best)
        results[scan] = (os.path.basename(best), test_loss)
    # identical sample + rng streams -> same best-checkpoint step and (up to
    # scan-vs-eager compilation noise) the same test loss
    assert results[True][0] == results[False][0]
    np.testing.assert_allclose(results[True][1], results[False][1],
                               rtol=1e-4)


def test_bank_batches_start_matches_fold(tmp_path):
    """batches(start=K) draws fold_in(key, K), K+1, ... — the alignment
    contract the driver relies on for round-2/resume stream continuity."""
    from tests.test_integration import _make_cache
    from waveunet_tpu.data.device_cache import DeviceBank

    cfg = get_config("baseline", num_layers=2, num_frames=256,
                     num_initial_filters=4, batch_size=2,
                     data_path=str(tmp_path / "cache"))
    _make_cache(tmp_path, cfg)
    in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
    bank = DeviceBank(cfg, "train", in_len, out_len)
    key = jax.random.PRNGKey(11)
    it = bank.batches(key, start=5)
    for i in (5, 6):
        want = bank._sample(bank._bank, bank._starts, bank._valids,
                            jax.random.fold_in(key, i))
        got = next(it)
        np.testing.assert_array_equal(np.asarray(got["mix"]),
                                      np.asarray(want["mix"]))


def test_after_saves_ordering(tmp_path):
    """after_saves side effects observe a fully-written checkpoint: the
    best.txt marker must never name a step dir whose background orbax write
    is still in flight (a concurrent `checkpoint=best` reader would resolve
    a dangling path)."""
    base = str(tmp_path / "ck")
    state = {"w": np.arange(6, dtype=np.float32)}
    observed = {}

    # inline when nothing is pending
    ckpt.after_saves(lambda: observed.setdefault("inline", True))
    assert observed == {"inline": True}

    path = ckpt.save_checkpoint_async(base, "exp", 1, state)

    def marker():
        # runs in the writer thread strictly after the step-1 write landed
        observed["dir_existed"] = os.path.isdir(path)
        with open(os.path.join(base, "exp", "best.txt"), "w") as f:
            f.write(path + "\n")

    ckpt.after_saves(marker)
    ckpt.wait_for_saves()
    assert observed["dir_existed"] is True
    assert open(os.path.join(base, "exp", "best.txt")).read().strip() == path
