"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

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
