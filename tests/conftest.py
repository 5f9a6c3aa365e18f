"""Test harness config: force an 8-device virtual CPU platform for every test.

Multi-chip sharding paths (Mesh/pjit/shard_map) are validated on virtual CPU
devices; the real TPU is exercised by bench.py / the driver's compile checks.
Must set the env vars before the first jax import anywhere in the process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env pre-sets axon (real TPU); override.
# FORCE the 8-device count, replacing any pre-existing value — inheriting a
# stale count (e.g. =2 from a pod experiment) silently skips every
# _require_8() sharding test while the suite still reports green.
import re  # noqa: E402

flags = os.environ.get("XLA_FLAGS", "")
flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# A pytest entry-point plugin may import jax before this file sets the env
# vars above; jax.config.update still works any time before backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture()
def rng():
    # Function-scoped: a session-scoped shared Generator made each test's
    # data depend on which tests ran before it (failures unreproducible
    # under `pytest -k`); a fresh seeded Generator per test is equally
    # deterministic without the cross-test coupling.
    return np.random.default_rng(1337)


@pytest.fixture(scope="session")
def bundled_wav():
    path = ("/root/reference/musb_005_angela thomas wade_audio_model_without_"
            "context_cut_28234samples_61002samples_93770samples_126538.wav")
    if not os.path.exists(path):
        pytest.skip("bundled reference WAV not available")
    return path
