"""Device-batched BSS-Eval v4: fp32 Gram solves + iterative refinement.

The host path (`eval/bsseval.py`) factorises one [S*C*L]^2 fp64 Gram per
1-second window on 1 CPU — the dominant cost of a full-dataset eval (hours
for MUSDB50). This path moves the math onto the accelerator:

  * every window's reference/estimate FFTs, Gram assembly (lag-gathered
    block-Toeplitz), Cholesky factorisation, and solves are BATCHED over
    windows with ``vmap`` — one jitted program per track-length bucket;
  * fp32 Cholesky + ``refine_iters`` rounds of residual refinement
    (A += solve(D - G @ A)) recovers near-fp64 solution quality;
  * a relative ridge (1e-5 * mean diag — real-music Grams are near-singular
    and fp32 Cholesky NaNs below that) keeps degenerate Grams factorisable;
    silent blocks have zero columns, so ridge-induced coefficients multiply
    zero signal and leave projections untouched;
  * metric energies come from TIME-DOMAIN projection signals (per-reference
    L-tap FFT filtering, exactly the host path's formulas). Coefficient-space
    quadratic forms were tried first and are a trap: they are
    full-cond(G)-sensitive to the fp32 Gram noise (0.2-0.5 dB SIR/SAR bias on
    real music that no amount of refinement removes), while the projection
    signal is only sqrt(cond)-sensitive.

Accuracy vs the host fp64 path (tests/test_bsseval_tpu.py,
tests/test_mp3_fixtures.py), per metric:

  * SDR — exact (time-domain energies only; no solve involved);
  * ISR — <0.01 dB synthetic, <0.03 dB real music;
  * SIR/SAR — <0.01 dB on well-conditioned windows; on real music the Gram is
    often NUMERICALLY SINGULAR (measured cond ~1e11 on the bundled fixtures —
    the host path's own fp64 Cholesky fails there and falls back to LU), so
    the projection split is regularization-defined: ridge (here) vs LU pivot
    noise (host) differ by up to ~0.5 dB per window. Neither answer is more
    correct; for publication-grade SIR/SAR keep the default host path.

Measured on the v5e chip (1 s stereo 2-source windows, L=512): 20 ms/window
device compute vs 460 ms/window host fp64 (23x); end-to-end on this
environment's slow host tunnel 2.6x (the ~2.8 MB/window H2D dominates — on
attached hardware the compute ratio is what remains). Through the full
evaluate_musdb harness (separation + scoring pipelined): 3x60 s synthetic
tracks in 42 s vs 127 s host — 3.0x wall-clock, identical aggregates.

Opt-in via ``evaluate_musdb(tpu_bss=True)``.
"""

from __future__ import annotations

import functools
from typing import Dict

import numpy as np

from waveunet_tpu.eval.bsseval import FILTER_LEN, _nfft_for  # noqa: E402


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

    # fp32 Cholesky needs cond(G + ridge*I) within ~1/eps_f32: real-music
    # Grams are near-singular (1e-9 relative ridge NaNs out); 1e-5 relative
    # keeps the factor finite, and refinement against the TRUE G (ridged
    # factor as preconditioner, contraction factor ridge/(ridge+mu)) removes
    # the ridge bias in every energetic direction.
    ridge = 1e-5 * jnp.mean(jnp.diagonal(G)) + 1e-30
    eye = jnp.eye(KC * L, dtype=G.dtype)
    cho = jsl.cho_factor(G + ridge * eye, lower=True)

    def refined(choX, GX, rhs):
        A = jsl.cho_solve(choX, rhs)
        r = rhs - GX @ A
        for _ in range(refine_iters):
            A = A + jsl.cho_solve(choX, r)
            r = rhs - GX @ A
        return A, r

    # per-source sub-systems (block of source j across its channels)
    G4 = G.reshape(S, C * L, S, C * L)
    eye_j = jnp.eye(C * L, dtype=G.dtype)

    ref_energy = jnp.sum(refs.astype(jnp.float32) ** 2, axis=(1, 2))  # [S]

    n_out = n + L - 1

    # fp32 ACCURACY STRATEGY (the naive transcription of the host path is a
    # trap at this precision): every least-squares RHS below is a RESIDUAL
    # signal, never the raw estimate. Projecting e directly and subtracting
    # (proj_all - proj_j etc.) leaves errors relative to ||e|| that dwarf the
    # small interference/artifact energies (measured 0.2-1.3 dB SIR/SAR bias
    # on real music — refinement-proof, because it comes from the fp32
    # Gram/correlation noise through cond(G)). Instead use the projector
    # identities  P_j s = s  (s is exactly representable: lag-0 coefficients)
    # and  P_all P_j = P_j :
    #     e_spat   = P_j(e) - s        = P_j(e - s)
    #     e_interf = P_all(e) - P_j(e) = P_all(e - P_j(e))
    #     e_artif  = e - P_all(e)      = r_j - P_all(r_j)
    # so each projection error is relative to an already-small residual.

    def cross(RF_sub, x):
        """M^T x for an arbitrary signal x [C, m]: correlation of x with
        every L-shifted reference. Returns [k*L, C]."""
        XF = jnp.fft.rfft(x, nfft, axis=1)                        # [C, F]
        d = jnp.fft.irfft(XF[None, :, :] * jnp.conj(RF_sub[:, None, :]),
                          nfft, axis=2)[:, :, :L]                 # [k, C, L]
        return d.transpose(0, 2, 1).reshape(-1, C)

    def project(RF_sub, coeffs):
        """Apply per-reference L-tap filters and sum: the projection signal.
        RF_sub [k, F], coeffs [k*L, C] -> [C, n_out]."""
        k = RF_sub.shape[0]
        h = coeffs.reshape(k, L, C).transpose(0, 2, 1)            # [k, C, L]
        HF = jnp.fft.rfft(h, nfft, axis=2)
        seg = jnp.fft.irfft(HF * RF_sub[:, None, :], nfft, axis=2)
        return jnp.sum(seg, axis=0)[:, :n_out]                    # [C, n_out]

    def per_source(j):
        Gj = G4[j, :, j, :]                                       # [C*L, C*L]
        choj = jsl.cho_factor(Gj + ridge * eye_j, lower=True)
        RF_j = jax.lax.dynamic_slice(RF, (j * C, 0), (C, RF.shape[1]))

        s2 = ref_energy[j]
        s_pad = jnp.zeros((C, n_out)).at[:, :n].set(refs[j].T)
        e_pad = jnp.zeros((C, n_out)).at[:, :n].set(ests[j].T)

        # e_spat = P_j(e - s)
        r_s = e_pad - s_pad
        A1, _ = refined(choj, Gj, cross(RF_j, r_s))
        e_spat = project(RF_j, A1)

        # e_interf = P_all(e - P_j(e)),   e - P_j(e) = r_s - e_spat
        r_j = r_s - e_spat
        A2, _ = refined(cho, G, cross(RF, r_j))
        e_interf = project(RF, A2)

        e_artif = r_j - e_interf

        e_spa2 = jnp.sum(e_spat ** 2)
        e_int2 = jnp.sum(e_interf ** 2)
        e_art2 = jnp.sum(e_artif ** 2)
        e_tot2 = jnp.sum(r_s ** 2)
        pj2 = jnp.sum((s_pad + e_spat) ** 2)
        pa2 = jnp.sum((s_pad + e_spat + e_interf) ** 2)

        def db(num, den):
            # den == 0 -> +inf, num == 0 -> -inf, 0/0 -> nan — the host
            # path's `_db` semantics; clamping instead returned huge finite
            # dB that leaked into nanmean/nanstd aggregates (round-2 review
            # finding).
            return 10.0 * jnp.log10(num / den)

        sdr = db(s2, e_tot2)
        isr = db(s2, e_spa2)
        # An exactly-silent estimate window (zero-padded tail, hard-gated
        # output) gives the host path exact zeros (its least-squares RHS is
        # the raw estimate): SIR = SAR = 0/0 = nan. The residual-RHS device
        # formulation leaves ~1e-12-relative fp32 residue instead, so match
        # the host's exact-zero semantics explicitly for that window.
        nan = jnp.float32(jnp.nan)
        silent_est = jnp.sum(e_pad ** 2) == 0.0
        sir = jnp.where(silent_est, nan, db(pj2, e_int2))
        sar = jnp.where(silent_est, nan, db(pa2, e_art2))
        valid = ref_energy[j] > 0
        return jnp.where(valid, jnp.stack([sdr, isr, sir, sar]), nan)

    import jax
    out = jax.vmap(per_source)(jnp.arange(S))                     # [S, 4]
    return out.T                                                  # [4, S]


@functools.lru_cache(maxsize=16)
def _get_kernel(filter_len: int, nfft: int, refine_iters: int, mesh):
    """One jitted window kernel per (L, nfft, refine, mesh) — rebuilt wrappers
    would discard JAX's executable cache between tracks of a dataset eval."""
    import jax

    vkern = jax.vmap(functools.partial(
        _window_kernel, L=filter_len, nfft=nfft, refine_iters=refine_iters))
    if mesh is None:
        return jax.jit(vkern)
    from jax.sharding import NamedSharding, PartitionSpec as P
    data = NamedSharding(mesh, P(mesh.axis_names))
    return jax.jit(vkern, in_shardings=(data, data), out_shardings=data)


def bss_eval_framewise_tpu(references: np.ndarray, estimates: np.ndarray,
                           rate: int, win_s: float = 1.0, hop_s: float = 1.0,
                           filter_len: int = FILTER_LEN,
                           refine_iters: int = 2,
                           window_batch: int = 8,
                           mesh=None) -> Dict[str, np.ndarray]:
    """Device-batched framewise metrics; same contract as
    ``bsseval.bss_eval_framewise``. references/estimates: [S, n, C].

    With ``mesh``, windows shard over the data axis (window parallelism,
    identical to the inference engine's layout): each chip factorises and
    projects its own windows — metric throughput scales linearly because
    windows are embarrassingly parallel. ``window_batch`` should be a
    multiple of the mesh size (it is padded to a full batch regardless).
    """
    import jax
    import jax.numpy as jnp

    S, n, C = references.shape
    win = int(win_s * rate)
    hop = int(hop_s * rate)
    starts = np.arange(0, max(n - win + 1, 1), hop)
    nfft = _nfft_for(win)

    if mesh is not None:
        # the sharded window axis must divide evenly over the mesh
        window_batch = -(-window_batch // mesh.size) * mesh.size
    kern = _get_kernel(filter_len, nfft, refine_iters, mesh)

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
