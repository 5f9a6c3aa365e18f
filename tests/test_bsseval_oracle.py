"""Independent oracle for the BSS-Eval v4 implementation.

`waveunet_tpu/eval/bsseval.py` computes the projections via FFT
cross-correlations + block-Toeplitz Gram solves (fast path). A convention
error there (sign, lag direction, padding) would silently bias every SDR the
framework reports — and museval (the reference's metric code,
`/root/reference/Evaluate.py:71`) is not installed here to cross-check.

This suite implements the metrics a second, deliberately naive way: explicitly
materialise the [n+L-1, S*C*L] shifted-reference design matrix, solve ordinary
least squares with `numpy.linalg.lstsq`, and form the projections by direct
matmul. The two paths share no code beyond numpy; agreement to ~1e-6 dB on
randomized windows (mono + stereo, correlated sources, silent references,
L in {8, 64, 512}) pins the fast path's conventions.
"""

import numpy as np
import pytest

from waveunet_tpu.eval.bsseval import bss_eval_framewise, bss_eval_window


def naive_bss_window(references, estimates, filter_len):
    """Brute-force BSS-Eval v4 window metrics via explicit shifted-reference
    least squares. references/estimates: [S, n, C]."""
    S, n, C = references.shape
    L = filter_len
    refs_flat = references.transpose(0, 2, 1).reshape(S * C, n).astype(
        np.float64)
    n_out = n + L - 1

    # M[t, i*L + lag] = refs_flat[i, t - lag]
    M = np.zeros((n_out, S * C * L))
    for i in range(S * C):
        for lag in range(L):
            M[lag:lag + n, i * L + lag] = refs_flat[i]

    out = {k: np.full(S, np.nan) for k in ("SDR", "ISR", "SIR", "SAR")}
    ref_energy = (references.astype(np.float64) ** 2).sum(axis=(1, 2))
    if not np.any(ref_energy > 0):
        return out

    def db(num, den):
        if den <= 0:
            return np.inf if num > 0 else np.nan
        if num <= 0:
            return -np.inf
        return 10.0 * np.log10(num / den)

    for j in range(S):
        if ref_energy[j] == 0:
            continue
        est = estimates[j].T.astype(np.float64)  # [C, n]
        e_pad = np.zeros((C, n_out))
        e_pad[:, :n] = est

        coeff_all = np.linalg.lstsq(M, e_pad.T, rcond=None)[0]
        proj_all = (M @ coeff_all).T

        cols = np.concatenate([
            np.arange((j * C + c) * L, (j * C + c + 1) * L)
            for c in range(C)])
        Mj = M[:, cols]
        coeff_j = np.linalg.lstsq(Mj, e_pad.T, rcond=None)[0]
        proj_j = (Mj @ coeff_j).T

        s_pad = np.zeros((C, n_out))
        s_pad[:, :n] = references[j].T

        e_spat = proj_j - s_pad
        e_interf = proj_all - proj_j
        e_artif = e_pad - proj_all

        s2 = float((s_pad ** 2).sum())
        out["SDR"][j] = db(s2, float(((e_pad - s_pad) ** 2).sum()))
        out["ISR"][j] = db(s2, float((e_spat ** 2).sum()))
        out["SIR"][j] = db(float(((s_pad + e_spat) ** 2).sum()),
                           float((e_interf ** 2).sum()))
        out["SAR"][j] = db(float(((s_pad + e_spat + e_interf) ** 2).sum()),
                           float((e_artif ** 2).sum()))
    return out


def _assert_metrics_close(fast, naive, atol_db=1e-5, cap_db=150.0):
    """Compare metrics; values beyond cap_db mean the corresponding residual
    energy is ~0 at fp64 precision (e.g. an estimate lying exactly in the
    projection span), where the exact dB is numerical noise — both
    implementations must agree that the residual vanished, not on the noise."""
    for k in ("SDR", "ISR", "SIR", "SAR"):
        f, nv = fast[k], naive[k]
        assert f.shape == nv.shape
        both_nan = np.isnan(f) & np.isnan(nv)
        f, nv = np.minimum(f[~both_nan], cap_db), np.minimum(nv[~both_nan],
                                                             cap_db)
        np.testing.assert_allclose(f, nv, atol=atol_db, rtol=1e-6, err_msg=k)


def _mix_case(rng, S, n, C, correlated=False):
    refs = rng.standard_normal((S, n, C))
    if correlated:
        # sources share a common component -> cross-terms in the Gram matter
        common = rng.standard_normal((1, n, C))
        refs = 0.6 * refs + 0.8 * common
    # estimates: filtered refs + bleed + noise (all errors nonzero)
    ests = np.empty_like(refs)
    for j in range(S):
        shift = (j * 3) % 5
        ests[j] = 0.9 * np.roll(refs[j], shift, axis=0)
        ests[j] += 0.2 * refs[(j + 1) % S] + 0.05 * rng.standard_normal(
            (n, C))
    return refs, ests


@pytest.mark.parametrize("L", [8, 64])
@pytest.mark.parametrize("C", [1, 2])
@pytest.mark.parametrize("correlated", [False, True])
def test_fast_matches_naive(L, C, correlated):
    rng = np.random.default_rng(1000 + L + C)
    refs, ests = _mix_case(rng, S=2, n=256, C=C, correlated=correlated)
    fast = bss_eval_window(refs, ests, filter_len=L)
    naive = naive_bss_window(refs, ests, filter_len=L)
    _assert_metrics_close(fast, naive)


def test_fast_matches_naive_production_filter_len():
    """L=512 — the museval v4 default used for all reported numbers.

    n must exceed S*C*L (here 2048) or the shifted-reference span covers the
    whole window and all residuals vanish (museval windows are 1 s = 44100
    samples, far above this)."""
    rng = np.random.default_rng(7)
    refs, ests = _mix_case(rng, S=2, n=4096, C=2, correlated=True)
    fast = bss_eval_window(refs, ests, filter_len=512)
    naive = naive_bss_window(refs, ests, filter_len=512)
    # larger system -> slightly looser numerical agreement
    _assert_metrics_close(fast, naive, atol_db=1e-4)


def test_fast_matches_naive_three_sources():
    rng = np.random.default_rng(11)
    refs, ests = _mix_case(rng, S=3, n=200, C=1)
    fast = bss_eval_window(refs, ests, filter_len=16)
    naive = naive_bss_window(refs, ests, filter_len=16)
    _assert_metrics_close(fast, naive)


def test_silent_reference_matches_naive():
    """One silent reference: its metrics are NaN; the other source's
    projections go through a singular Gram (min-norm path) in both
    implementations and must still agree."""
    rng = np.random.default_rng(5)
    refs, ests = _mix_case(rng, S=2, n=256, C=1)
    refs[1] = 0.0
    fast = bss_eval_window(refs, ests, filter_len=8)
    naive = naive_bss_window(refs, ests, filter_len=8)
    assert np.isnan(fast["SDR"][1]) and np.isnan(naive["SDR"][1])
    _assert_metrics_close(fast, naive, atol_db=1e-4)


def test_framewise_matches_naive_per_window():
    """bss_eval_framewise == naive metrics applied to each 1 s window."""
    rate = 128
    rng = np.random.default_rng(21)
    refs, ests = _mix_case(rng, S=2, n=3 * rate + 40, C=1)
    fast = bss_eval_framewise(refs, ests, rate=rate, filter_len=8)
    starts = range(0, refs.shape[1] - rate + 1, rate)
    for fi, st in enumerate(starts):
        sl = slice(st, st + rate)
        naive = naive_bss_window(refs[:, sl], ests[:, sl], filter_len=8)
        for k in ("SDR", "ISR", "SIR", "SAR"):
            np.testing.assert_allclose(fast[k][:, fi], naive[k], atol=1e-5,
                                       rtol=1e-6, err_msg=f"{k}@{fi}")


def test_perfect_estimate_sdr_inf():
    rng = np.random.default_rng(3)
    refs = rng.standard_normal((2, 256, 1))
    fast = bss_eval_window(refs, refs.copy(), filter_len=8)
    naive = naive_bss_window(refs, refs.copy(), filter_len=8)
    assert np.all(np.isinf(fast["SDR"])) and np.all(np.isinf(naive["SDR"]))
