"""Gated parity tests against optional external packages (museval, librosa).

Neither package is installed in the offline build environment, so these skip
cleanly here — but any future environment that has them gets the parity
claims checked for free (round-2 VERDICT item 7):

  * ``eval/bsseval.py`` + ``eval/bsseval_tpu.py`` reproduce museval v4's
    framewise bss_eval (the reference's scoring, `Evaluate.py:71`);
  * ``ops/resample.py`` mirrors librosa/resampy ``kaiser_best``
    (`Utils.py:94-95`).
"""

import numpy as np
import pytest


def _well_conditioned_pair(rng, sr=4000, seconds=3, S=2, C=2):
    """Reference/estimate stacks whose per-window Grams are well-conditioned:
    broadband noise beds under distinct tones keep every shifted-reference
    direction energetic, so fp64 implementations must agree tightly and the
    fp32 device path stays inside its documented well-conditioned contract."""
    n = sr * seconds
    t = np.arange(n) / sr
    refs, ests = [], []
    for j in range(S):
        tone = 0.3 * np.sin(2 * np.pi * (220 * (j + 1)) * t)
        bed = 0.05 * rng.standard_normal(n)
        ref = np.stack([tone + bed, np.roll(tone, 7) + bed], axis=1)[:, :C]
        leak = 0.1 * np.sin(2 * np.pi * (220 * (2 - j)) * t)
        est = ref * 0.9 + np.stack([leak, leak], axis=1)[:, :C] \
            + 0.02 * rng.standard_normal((n, C))
        refs.append(ref.astype(np.float32))
        ests.append(est.astype(np.float32))
    return np.stack(refs), np.stack(ests), sr


def _museval_framewise(refs, ests, rate):
    import museval.metrics as mm

    sdr, isr, sir, sar, _ = mm.bss_eval(
        refs, ests, window=rate, hop=rate,
        framewise_filters=False, bsseval_sources_version=False)
    return {"SDR": sdr, "ISR": isr, "SIR": sir, "SAR": sar}


def test_builtin_bsseval_matches_museval(rng):
    pytest.importorskip("museval")
    from waveunet_tpu.eval.bsseval import bss_eval_framewise

    refs, ests, sr = _well_conditioned_pair(rng)
    want = _museval_framewise(refs, ests, sr)
    got = bss_eval_framewise(refs, ests, rate=sr)
    for k in ("SDR", "ISR", "SIR", "SAR"):
        np.testing.assert_allclose(got[k], want[k], atol=1e-3, err_msg=k)


def test_tpu_bsseval_matches_museval(rng):
    pytest.importorskip("museval")
    from waveunet_tpu.eval.bsseval_tpu import bss_eval_framewise_tpu

    refs, ests, sr = _well_conditioned_pair(rng)
    want = _museval_framewise(refs, ests, sr)
    got = bss_eval_framewise_tpu(refs, ests, rate=sr, window_batch=4)
    # fp32 device path on well-conditioned windows: documented <0.01 dB for
    # the solve-backed metrics; SDR is energy-exact
    np.testing.assert_allclose(got["SDR"], want["SDR"], atol=1e-4)
    for k in ("ISR", "SIR", "SAR"):
        np.testing.assert_allclose(got[k], want[k], atol=0.05, err_msg=k)


@pytest.mark.parametrize("orig_sr,new_sr", [(44100, 22050), (22050, 44100),
                                            (44100, 8192)])
def test_resample_matches_librosa_kaiser_best(rng, orig_sr, new_sr):
    pytest.importorskip("librosa")
    import librosa

    from waveunet_tpu.ops.resample import resample

    n = orig_sr  # 1 s
    t = np.arange(n) / orig_sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.1 * rng.standard_normal(n)).astype(np.float32)[:, None]
    ours = resample(x, orig_sr, new_sr)[:, 0]
    theirs = librosa.resample(y=x[:, 0].astype(np.float64), orig_sr=orig_sr,
                              target_sr=new_sr, res_type="kaiser_best")
    m = min(len(ours), len(theirs))
    # identical prototype parameters (64 zeros, beta 14.77, rolloff .9475);
    # implementations differ only in edge handling — compare the interior
    pad = 256
    np.testing.assert_allclose(ours[pad:m - pad], theirs[pad:m - pad],
                               atol=5e-4)
