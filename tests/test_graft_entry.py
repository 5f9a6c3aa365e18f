"""Driver-contract tests for __graft_entry__ (entry compile + multichip dryrun)."""

import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, "/root/repo")


def test_entry_compiles_small():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    params, mix = args
    assert mix.shape[0] == 1
    for v in out.values():
        assert v.shape[0] == 1 and np.all(np.isfinite(np.asarray(v)))


def test_dryrun_multichip_4():
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    import __graft_entry__ as g
    g.dryrun_multichip(4)
