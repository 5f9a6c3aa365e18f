"""Device-batched BSS-Eval vs the host fp64 path: <0.01 dB agreement.

The TPU path (eval/bsseval_tpu.py) shares no solver code with the host path
(fp32 Cholesky + refinement + quadratic-form energies vs fp64 LU + explicit
time-domain projections), so agreement pins both the math and the fp32
accuracy claim. Runs on the CPU backend here; the program is identical on TPU.
"""

import numpy as np
import pytest

from waveunet_tpu.eval.bsseval import bss_eval_framewise
from waveunet_tpu.eval.bsseval_tpu import bss_eval_framewise_tpu


def _mix_case(rng, S, n, C, correlated=True):
    refs = rng.standard_normal((S, n, C))
    if correlated:
        common = rng.standard_normal((1, n, C))
        refs = 0.6 * refs + 0.8 * common
    ests = np.empty_like(refs)
    for j in range(S):
        ests[j] = 0.9 * np.roll(refs[j], (j * 3) % 5, axis=0)
        ests[j] += 0.2 * refs[(j + 1) % S]
        ests[j] += 0.05 * rng.standard_normal((n, C))
    return refs.astype(np.float32), ests.astype(np.float32)


def _assert_close(host, dev, atol_db=0.01):
    for k in ("SDR", "ISR", "SIR", "SAR"):
        h, d = host[k], dev[k]
        assert h.shape == d.shape
        both_nan = np.isnan(h) & np.isnan(d)
        np.testing.assert_allclose(d[~both_nan], h[~both_nan], atol=atol_db,
                                   rtol=1e-4, err_msg=k)


@pytest.mark.parametrize("C", [1, 2])
def test_tpu_matches_host_small(C):
    rate = 512
    rng = np.random.default_rng(100 + C)
    refs, ests = _mix_case(rng, S=2, n=3 * rate + 100, C=C)
    host = bss_eval_framewise(refs, ests, rate=rate, filter_len=64)
    dev = bss_eval_framewise_tpu(refs, ests, rate=rate, filter_len=64)
    _assert_close(host, dev)


def test_tpu_matches_host_production_filter():
    """L=512 (museval default), 1 s windows at a reduced rate that still keeps
    the system overdetermined (win=4096 > S*C*L=2048)."""
    rate = 4096
    rng = np.random.default_rng(7)
    refs, ests = _mix_case(rng, S=2, n=2 * rate + 512, C=1)
    host = bss_eval_framewise(refs, ests, rate=rate, filter_len=512)
    dev = bss_eval_framewise_tpu(refs, ests, rate=rate, filter_len=512)
    _assert_close(host, dev)


@pytest.mark.filterwarnings("ignore::scipy.linalg.LinAlgWarning")
def test_tpu_silent_reference_nan():
    rate = 512
    rng = np.random.default_rng(5)
    refs, ests = _mix_case(rng, S=2, n=2 * rate, C=1)
    refs[1] = 0.0
    dev = bss_eval_framewise_tpu(refs, ests, rate=rate, filter_len=32)
    host = bss_eval_framewise(refs, ests, rate=rate, filter_len=32)
    assert np.all(np.isnan(dev["SDR"][1]))
    # the non-silent source still matches through the ridged (singular) Gram
    for k in ("SDR", "ISR", "SAR"):
        np.testing.assert_allclose(dev[k][0], host[k][0], atol=0.01,
                                   rtol=1e-4, err_msg=k)


def test_tpu_three_sources_stereo():
    rate = 1024
    rng = np.random.default_rng(11)
    refs, ests = _mix_case(rng, S=3, n=2 * rate + 64, C=2)
    host = bss_eval_framewise(refs, ests, rate=rate, filter_len=32)
    dev = bss_eval_framewise_tpu(refs, ests, rate=rate, filter_len=32)
    _assert_close(host, dev)


def test_tpu_bsseval_on_mesh_matches_single_device():
    """Window-parallel metric scoring over the 8-device mesh == one device."""
    import jax
    from waveunet_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rate = 512
    rng = np.random.default_rng(3)
    refs, ests = _mix_case(rng, S=2, n=9 * rate + 40, C=1)
    single = bss_eval_framewise_tpu(refs, ests, rate=rate, filter_len=32,
                                    window_batch=8)
    mesh = make_mesh()
    multi = bss_eval_framewise_tpu(refs, ests, rate=rate, filter_len=32,
                                   window_batch=8, mesh=mesh)
    for k in ("SDR", "ISR", "SIR", "SAR"):
        np.testing.assert_allclose(multi[k], single[k], atol=1e-3, rtol=1e-4,
                                    err_msg=k)


@pytest.mark.filterwarnings("ignore::scipy.linalg.LinAlgWarning")
def test_tpu_silent_estimate_nonfinite_matches_host():
    """A silent ESTIMATE makes several metric denominators exactly zero; the
    device path must reproduce the host's inf/nan semantics instead of
    clamping to finite dB (round-2 review finding)."""
    rate = 512
    rng = np.random.default_rng(6)
    refs, ests = _mix_case(rng, S=2, n=2 * rate, C=1)
    ests[1] = 0.0
    dev = bss_eval_framewise_tpu(refs, ests, rate=rate, filter_len=32)
    host = bss_eval_framewise(refs, ests, rate=rate, filter_len=32)
    for k in ("SDR", "ISR", "SIR", "SAR"):
        h, d = host[k][1], dev[k][1]
        np.testing.assert_array_equal(np.isnan(h), np.isnan(d), err_msg=k)
        np.testing.assert_array_equal(np.isposinf(h), np.isposinf(d),
                                      err_msg=k)
        np.testing.assert_array_equal(np.isneginf(h), np.isneginf(d),
                                      err_msg=k)
        fin = np.isfinite(h)
        np.testing.assert_allclose(d[fin], h[fin], atol=0.01, rtol=1e-4,
                                   err_msg=k)
    _assert_close({k: host[k][:1] for k in host},
                  {k: dev[k][:1] for k in dev})
