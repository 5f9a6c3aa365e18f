"""Device-batched BSS-Eval v4: fp32 Gram solves + iterative refinement.

The host path (`eval/bsseval.py`) factorises one [S*C*L]^2 fp64 Gram per
1-second window on 1 CPU — the dominant cost of a full-dataset eval (hours
for MUSDB50). This path moves the math onto the accelerator:

  * every window's reference/estimate FFTs, Gram assembly (lag-gathered
    block-Toeplitz), Cholesky factorisation, and solves are BATCHED over
    windows with ``vmap`` — one jitted program per track-length bucket;
  * fp32 Cholesky + ``refine_iters`` rounds of residual refinement
    (A += solve(D - G @ A)) recovers near-fp64 solution quality;
  * a relative ridge (1e-9 * mean diag) keeps silent/degenerate Grams
    factorisable — silent blocks have zero columns, so the ridge-induced
    coefficients multiply zero signal and leave projections untouched;
  * NO time-domain projections are materialised: every metric energy is a
    quadratic form in (G, D, A),

      ||proj||^2          = A^T G A
      <proj_all, proj_j>  = A_all^T G[:, rows_j] A_j
      <proj_j, s_(j,c)>   = A_j^T G[rows_j, col0_(j,c)]   (s is lag-0 ref)
      ||e - proj_all||^2  = e^T e - 2 A^T D + A^T G A

    so the whole window evaluates as a handful of batched matmuls.

Accuracy: validated against the host fp64 path to <0.01 dB in
tests/test_bsseval_tpu.py (the quadratic-form cancellation costs ~2 of fp32's
7 digits; fine for the <= 30 dB SDRs real separators produce — beyond ~50 dB
the host path is authoritative). Opt-in via ``evaluate_musdb(tpu_bss=True)``.
"""

from __future__ import annotations

import functools
from typing import Dict

import numpy as np

FILTER_LEN = 512


def _nfft_for(n: int) -> int:
    nfft = 1
    while nfft < 2 * n:
        nfft *= 2
    return nfft


@functools.lru_cache(maxsize=8)
def _lag_index(L: int, nfft: int):
    a = np.arange(L)
    return ((a[None, :] - a[:, None]) % nfft).astype(np.int32)  # [a, b] -> b-a


def _window_kernel(refs, ests, L: int, nfft: int, refine_iters: int):
    """Metrics for one window batch element.

    refs: [S, n, C] float32, ests: [S, n, C] float32. Returns [4, S] metrics.
    Runs under jit+vmap (static L, nfft).
    """
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl

    S, n, C = refs.shape
    KC = S * C
    refs_flat = refs.transpose(0, 2, 1).reshape(KC, n)

    RF = jnp.fft.rfft(refs_flat, nfft, axis=1)                    # [KC, F]
    # pairwise lag correlations r[i, j, tau] = sum_t refs_j[t] refs_i[t+tau]
    r = jnp.fft.irfft(RF[:, None, :] * jnp.conj(RF[None, :, :]),
                      nfft, axis=2)                               # [KC, KC, nfft]
    lag = jnp.asarray(_lag_index(L, nfft))                        # [a, b] = b-a
    # G[(i, a), (j, b)] = sum_t refs_i[t-a] refs_j[t-b] = r_ij[b - a]
    G = r[:, :, lag]                                              # [i, j, a, b]
    G = G.transpose(0, 2, 1, 3).reshape(KC * L, KC * L)

    # cross vectors D[(i, lag), (j_est, c)] = sum_t est_{j,c}[t] refs_i[t-lag]
    ests_flat = ests.transpose(0, 2, 1).reshape(S * C, n)         # [SC, n]
    EF = jnp.fft.rfft(ests_flat, nfft, axis=1)
    d = jnp.fft.irfft(EF[None, :, :] * jnp.conj(RF[:, None, :]),
                      nfft, axis=2)[:, :, :L]                     # [KC, SC, L]
    D = d.transpose(0, 2, 1).reshape(KC * L, S * C)

    ridge = 1e-9 * jnp.mean(jnp.diagonal(G)) + 1e-30
    eye = jnp.eye(KC * L, dtype=G.dtype)
    cho = jsl.cho_factor(G + ridge * eye, lower=True)

    def refined(choX, GX, rhs):
        A = jsl.cho_solve(choX, rhs)
        for _ in range(refine_iters):
            A = A + jsl.cho_solve(choX, rhs - GX @ A)
        return A

    A_all_full = refined(cho, G, D)                               # [KC*L, S*C]

    # per-source sub-systems (block of source j across its channels)
    G4 = G.reshape(S, C * L, S, C * L)
    D3 = D.reshape(S, C * L, S * C)
    eye_j = jnp.eye(C * L, dtype=G.dtype)

    ref_energy = jnp.sum(refs.astype(jnp.float32) ** 2, axis=(1, 2))  # [S]

    def per_source(j):
        Gj = G4[j, :, j, :]                                       # [C*L, C*L]
        choj = jsl.cho_factor(Gj + ridge * eye_j, lower=True)
        Dj = D3[j, :, :]                                          # [C*L, S*C]
        # estimate j's channels occupy columns j*C .. j*C+C
        Dj_est = jnp.take(Dj, j * C + jnp.arange(C), axis=1)      # [C*L, C]
        Aj = refined(choj, Gj, Dj_est)

        Dall_est = jnp.take(D, j * C + jnp.arange(C), axis=1)     # [KC*L, C]
        Aall = jnp.take(A_all_full, j * C + jnp.arange(C), axis=1)

        e2 = jnp.sum(ests[j] ** 2)
        s2 = ref_energy[j]

        # ||proj_all||^2 and <proj_all, e>
        pa2 = jnp.sum(Aall * (G @ Aall))
        pa_e = jnp.sum(Aall * Dall_est)
        # ||proj_j||^2
        pj2 = jnp.sum(Aj * (Gj @ Aj))
        # <proj_all, proj_j>: A_all^T G[:, rows_j] A_j
        G_cols_j = G.reshape(KC * L, S, C * L)[:, j, :]           # [KC*L, C*L]
        pa_pj = jnp.sum((G_cols_j.T @ Aall) * Aj)
        # <proj_j, s>: s_(j,c') is the lag-0 shifted ref = column (c'*L) of
        # the j-block, per channel c'
        col0 = Gj[:, jnp.arange(C) * L]                           # [C*L, C]
        pj_s = jnp.sum(Aj * col0)                                 # sum over c'
        # <s, e> time-domain: refs_j . ests_j
        s_e = jnp.sum(refs[j] * ests[j])

        e_art2 = e2 - 2.0 * pa_e + pa2                  # ||e - proj_all||^2
        e_int2 = pa2 - 2.0 * pa_pj + pj2                # ||proj_all - proj_j||^2
        e_spa2 = pj2 - 2.0 * pj_s + s2                  # ||proj_j - s||^2
        e_tot2 = e2 - 2.0 * s_e + s2                    # ||e - s||^2

        def db(num, den):
            return 10.0 * jnp.log10(jnp.maximum(num, 1e-30)
                                    / jnp.maximum(den, 1e-30))

        sdr = db(s2, e_tot2)
        isr = db(s2, e_spa2)
        sir = db(pj2, e_int2)
        sar = db(pa2, e_art2)
        valid = ref_energy[j] > 0
        nan = jnp.float32(jnp.nan)
        return jnp.where(valid, jnp.stack([sdr, isr, sir, sar]), nan)

    import jax
    out = jax.vmap(per_source)(jnp.arange(S))                     # [S, 4]
    return out.T                                                  # [4, S]


def bss_eval_framewise_tpu(references: np.ndarray, estimates: np.ndarray,
                           rate: int, win_s: float = 1.0, hop_s: float = 1.0,
                           filter_len: int = FILTER_LEN,
                           refine_iters: int = 2,
                           window_batch: int = 8) -> Dict[str, np.ndarray]:
    """Device-batched framewise metrics; same contract as
    ``bsseval.bss_eval_framewise``. references/estimates: [S, n, C]."""
    import jax
    import jax.numpy as jnp

    S, n, C = references.shape
    win = int(win_s * rate)
    hop = int(hop_s * rate)
    starts = np.arange(0, max(n - win + 1, 1), hop)
    nfft = _nfft_for(win)

    kern = jax.jit(jax.vmap(functools.partial(
        _window_kernel, L=filter_len, nfft=nfft,
        refine_iters=refine_iters)))

    out = {k: np.full((S, len(starts)), np.nan)
           for k in ("SDR", "ISR", "SIR", "SAR")}
    refs32 = references.astype(np.float32)
    ests32 = estimates.astype(np.float32)
    names = ("SDR", "ISR", "SIR", "SAR")
    for b0 in range(0, len(starts), window_batch):
        chunk = starts[b0:b0 + window_batch]
        rb, eb = [], []
        for st in chunk:
            sl = slice(st, st + win)
            rw = refs32[:, sl]
            ew = ests32[:, sl]
            if rw.shape[1] < win:  # tail window: zero-pad (host path slices)
                padn = win - rw.shape[1]
                rw = np.pad(rw, [(0, 0), (0, padn), (0, 0)])
                ew = np.pad(ew, [(0, 0), (0, padn), (0, 0)])
            rb.append(rw)
            eb.append(ew)
        pad_b = window_batch - len(rb)
        if pad_b:  # fixed batch shape: one compile total
            rb += [rb[-1]] * pad_b
            eb += [eb[-1]] * pad_b
        res = np.asarray(kern(jnp.asarray(np.stack(rb)),
                              jnp.asarray(np.stack(eb))))  # [B, 4, S]
        for bi, st_i in enumerate(range(b0, b0 + len(chunk))):
            for mi, k in enumerate(names):
                out[k][:, st_i] = res[bi, mi]
    return out
