"""Full-precision (fp64) device BSS-Eval: parity with the host fp64 scorer.

The fp64 device kernel (`eval/bsseval_tpu64.py`) is the HOST algorithm
(`eval/bsseval.bss_eval_window`) with exact-matmul correlation assembly and
quadratic-form energies — no FFTs (TPU XLA has no f64 FFT), no time-domain
projections. These tests pin:

  * machine-level parity with the host on well-conditioned windows
    (any assembly);
  * machine-level parity with the host's "exact" assembly on the bundled
    REAL-MUSIC fixtures — including the near-singular windows
    (cond(G) 1e14-1e18 measured) where fp32 was off by dB and where the
    host's own FFT-vs-exact assembly ambiguity reaches 27 dB (the metric is
    assembly-defined there; SDR is solve-free and exact under every scheme);
  * the degenerate-window semantics (silent reference -> NaN row, silent
    OTHER source -> min-norm behavior matching the host's lstsq fallback).

Runs on CPU (native f64); the kernel is platform-generic XLA.
"""

import os

import numpy as np
import pytest

import jax

from waveunet_tpu.eval.bsseval import (FILTER_LEN, bss_eval_framewise,
                                       bss_eval_window)
from waveunet_tpu.eval.bsseval_tpu64 import bss_eval_framewise_tpu64

_EXAMPLES = "/root/reference/audio_examples"
_SONG = os.path.join(_EXAMPLES, "Cristina Vane - So Easy")


def _maxdiff(a, b):
    # Matching NaNs (degenerate-window semantics) count as equal; a
    # ONE-SIDED NaN must fail loudly — np.nanmax would silently skip it,
    # letting a device-NaN-where-host-finite regression pass.
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    if not np.array_equal(np.isnan(a), np.isnan(b)):
        return float("inf")
    d = np.abs(a - b)
    d[np.isnan(a)] = 0.0
    return float(np.max(d)) if d.size else 0.0


def _mix_case(rng, S, n, C):
    refs = rng.standard_normal((S, n, C)).astype(np.float64) * 0.1
    leak = 0.03 * np.roll(refs, 1, axis=0)
    ests = refs + 0.02 * rng.standard_normal((S, n, C)) + leak
    return refs, ests


def test_corr_and_gram_match_explicit_shift_matrix():
    """Structural oracle: build M (columns = L-shifted zero-padded refs)
    explicitly and check the tiled-matmul assembly gives G == M^T M and
    D == M^T e exactly (fp64)."""
    import jax.numpy as jnp
    from waveunet_tpu.eval.bsseval_tpu64 import _build_gram, _corr

    rng = np.random.default_rng(7)
    K, n, L = 3, 300, 17
    refs = rng.standard_normal((K, n))
    n_out = n + L - 1
    M = np.zeros((n_out, K * L))
    for i in range(K):
        for a in range(L):
            M[a:a + n, i * L + a] = refs[i]

    with jax.enable_x64(True):
        rpos = np.asarray(_corr(jnp.asarray(refs), jnp.asarray(refs), L))
        G = np.asarray(_build_gram(jnp.asarray(rpos), L))
        np.testing.assert_allclose(G, M.T @ M, rtol=0, atol=1e-10)

        e = rng.standard_normal((2, n))  # 2 "channels" of an estimate
        D = np.asarray(_corr(jnp.asarray(refs), jnp.asarray(e), L))
        # D[i, c, a] = sum_t e_c[t] refs_i[t - a] = (M^T e_pad)[(i, a), c]
        e_pad = np.zeros((2, n_out))
        e_pad[:, :n] = e
        want = (M.T @ e_pad.T)  # [K*L, 2]
        got = D.transpose(0, 2, 1).reshape(K * L, 2)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)


def test_f64_matches_host_well_conditioned():
    rng = np.random.default_rng(0)
    refs, ests = _mix_case(rng, 2, 4000, 2)
    host = bss_eval_window(refs, ests, filter_len=64)
    dev = bss_eval_framewise_tpu64(refs, ests, rate=4000, filter_len=64,
                                   window_batch=2)
    for k in host:
        assert _maxdiff(host[k], dev[k][:, 0]) < 1e-9, k


def test_f64_matches_host_exact_assembly_production_filter():
    """Full L=512 at a production-ish window: the two implementations run
    the same algorithm, so even at high cond they must agree tightly."""
    rng = np.random.default_rng(1)
    refs, ests = _mix_case(rng, 2, 8192, 2)
    host = bss_eval_window(refs, ests, assembly="exact")
    dev = bss_eval_framewise_tpu64(refs, ests, rate=8192, window_batch=1)
    for k in host:
        assert _maxdiff(host[k], dev[k][:, 0]) < 1e-6, k


def test_f64_silent_reference_nan_row():
    rng = np.random.default_rng(2)
    refs, ests = _mix_case(rng, 2, 3000, 1)
    refs[1] = 0.0
    dev = bss_eval_framewise_tpu64(refs, ests, rate=3000, filter_len=32)
    host = bss_eval_window(refs, ests, filter_len=32)
    for k in dev:
        assert np.all(np.isnan(dev[k][1])), k
        # source 0 unaffected: the silent source's Gram block is patched to
        # reproduce the host's min-norm (zero) coefficients there. A
        # denominator at the rounding floor (here: no interference space
        # left) makes the dB value solver-noise — museval included — so
        # compare capped at +250 dB ("effectively infinite" either way).
        h = np.minimum(host[k][:1], 250.0)
        d = np.minimum(dev[k][:1, 0], 250.0)
        assert _maxdiff(h, d) < 1e-9, k


def test_f64_three_sources_one_silent_matches_host():
    """A silent OTHER source makes the shared Gram exactly singular: the
    host falls through Cholesky -> LU -> min-norm lstsq; the device kernel's
    zero-diagonal patch must reproduce those scores for the live sources."""
    rng = np.random.default_rng(3)
    refs, ests = _mix_case(rng, 3, 3000, 1)
    refs[2] = 0.0
    ests[2] = 0.0
    host = bss_eval_window(refs, ests, filter_len=32, assembly="exact")
    dev = bss_eval_framewise_tpu64(refs, ests, rate=3000, filter_len=32)
    for k in host:
        assert _maxdiff(host[k][:2], dev[k][:2, 0]) < 1e-6, k


def test_host_exact_assembly_equals_fft_when_well_conditioned():
    rng = np.random.default_rng(4)
    refs, ests = _mix_case(rng, 2, 4000, 2)
    a = bss_eval_window(refs, ests, filter_len=64, assembly="fft")
    b = bss_eval_window(refs, ests, filter_len=64, assembly="exact")
    for k in a:
        assert _maxdiff(a[k], b[k]) < 1e-6, k


@pytest.mark.skipif(not os.path.isdir(_SONG),
                    reason="reference audio_examples unavailable")
def test_f64_real_music_matches_host_exact_assembly():
    """THE round-3 precision closure: on the real-music windows where fp32
    was off by 0.1-3 dB (and catastrophically >5 dB on 2/12), the fp64
    device kernel matches the host fp64 algorithm (exact assembly) to
    <1e-3 dB on EVERY window and metric. The residual FFT-vs-exact assembly
    ambiguity of the host itself (up to ~27 dB on cond ~1e16 windows,
    measured) is a property of the METRIC at this conditioning, not of the
    device path — SDR, the reference's headline metric, is identical under
    every scheme."""
    from waveunet_tpu.data import mp3
    if not mp3.available():
        pytest.skip("libmpg123 unavailable")
    from waveunet_tpu.data.audio_io import load

    refs = np.stack([
        load(os.path.join(_SONG, "vocals_true.mp3"), sr=None,
             mono=False)[0],
        load(os.path.join(_SONG, "accompaniment_true.mp3"), sr=None,
             mono=False)[0]])
    ests = np.stack([
        load(os.path.join(_SONG, "vocals_estimate.mp3"), sr=None,
             mono=False)[0],
        load(os.path.join(_SONG, "accompaniment_estimate.mp3"), sr=None,
             mono=False)[0]])
    sr = 22050
    a, b = 8 * sr, 12 * sr  # 4 windows incl. the cond ~1e15 class
    refs, ests = refs[:, a:b], ests[:, a:b]

    host = bss_eval_framewise(refs, ests, sr, assembly="exact")
    dev = bss_eval_framewise_tpu64(refs, ests, sr, window_batch=2)
    for k in host:
        assert _maxdiff(host[k], dev[k]) < 1e-3, (k, host[k], dev[k])
    # and SDR agrees with the FFT-assembly host bit-tightly (solve-free)
    host_fft = bss_eval_framewise(refs, ests, sr)
    assert _maxdiff(host_fft["SDR"], dev["SDR"]) < 1e-9
