"""Spectrogram U-Net baseline (U7/U7a, Jansson et al. 2017) — TPU-native.

Feature-parity rebuild of `/root/reference/Models/UnetSpectrogramSeparator.py:7-108`:
  * STFT front-end frame 1024 / hop 768, periodic Hann (`:28-29,49-54`)
  * log1p-magnitude input, last frequency bin dropped so freqs are 2^k (`:59-60`)
  * one independent 2-D U-Net **per source** (`:63`):
      - 6x [conv2d 5x5 stride 2 SAME + batch-norm(beta only) + LeakyReLU] (`:68-74`)
      - 5x [conv2d_transpose 5x5 stride 2 SAME + BN + ReLU + skip-concat
            + dropout(0.5) on the first 3] (`:77-83`)
      - sigmoid mask via a final transposed conv, last freq bin re-padded
        with 0.5 (`:86-88`)
  * source magnitude = mask * mixture magnitude (`:91`), iSTFT with the
    mixture phase (`:100-106`), or raw magnitudes when ``return_spectrogram``
    (L1-mag loss path, `:94-95`)

Mono-only / 2-source-only, as asserted by the reference (`:24-25,53`).

Batch-norm matches ``tf.contrib.layers.batch_norm`` defaults: decay 0.999,
eps 0.001, center only (no scale/gamma), moving stats updated in training and
used at eval. State is threaded functionally: apply returns (outputs, new_state).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from waveunet_tpu.config import Config
from waveunet_tpu.ops.conv import (PRECISION, conv2d, conv2d_init,
                                   conv2d_transpose)
from waveunet_tpu.ops.primitives import leaky_relu, pad_freqs
from waveunet_tpu.ops.stft import istft, stft

_BN_MOMENTUM = 0.999
_BN_EPS = 0.001


def _bn_apply(x, beta, stats, training: bool):
    """Centre-only batch norm. Returns (y, new_stats)."""
    if training:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        new_stats = {
            "mean": _BN_MOMENTUM * stats["mean"] + (1 - _BN_MOMENTUM) * mean,
            "var": _BN_MOMENTUM * stats["var"] + (1 - _BN_MOMENTUM) * var,
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    y = (x - mean) * jax.lax.rsqrt(var + _BN_EPS) + beta
    return y, new_stats


def init_spectrogram_unet(rng, cfg: Config, dtype=jnp.float32
                          ) -> Tuple[Dict, Dict]:
    """Returns (params, state). One U-Net per source."""
    if not cfg.mono_downmix or cfg.num_sources != 2:
        raise NotImplementedError(
            "spectrogram U-Net supports mono 2-source configs only "
            "(reference asserts, UnetSpectrogramSeparator.py:24-25)")
    params: Dict = {}
    state: Dict = {}
    L = cfg.num_layers
    keys = jax.random.split(rng, cfg.num_sources * (2 * L + 1))
    ki = iter(range(len(keys)))
    for s in cfg.source_names:
        in_ch = 1
        for i in range(L):
            out_ch = cfg.num_initial_filters * (2 ** i)
            params[f"{s}/down_{i}"] = conv2d_init(keys[next(ki)], (5, 5),
                                                  in_ch, out_ch, dtype)
            params[f"{s}/down_{i}_bn"] = {"beta": jnp.zeros((out_ch,), dtype)}
            state[f"{s}/down_{i}_bn"] = {"mean": jnp.zeros((out_ch,), dtype),
                                         "var": jnp.ones((out_ch,), dtype)}
            in_ch = out_ch
        for i in range(L - 1):
            out_ch = cfg.num_initial_filters * (2 ** (L - i - 2))
            params[f"{s}/up_{i}"] = conv2d_init(keys[next(ki)], (5, 5),
                                                in_ch, out_ch, dtype,
                                                transpose=True)
            params[f"{s}/up_{i}_bn"] = {"beta": jnp.zeros((out_ch,), dtype)}
            state[f"{s}/up_{i}_bn"] = {"mean": jnp.zeros((out_ch,), dtype),
                                       "var": jnp.ones((out_ch,), dtype)}
            # after BN: concat with skip (same channel count) -> channels double
            in_ch = out_ch + cfg.num_initial_filters * (2 ** (L - i - 2))
        params[f"{s}/mask"] = conv2d_init(keys[next(ki)], (5, 5), in_ch, 1,
                                          dtype, transpose=True)
    return params, state


def apply_spectrogram_unet(params: Dict, cfg: Config, mix: jnp.ndarray,
                           training: bool, state: Dict,
                           return_spectrogram: bool = False,
                           rng: Optional[jax.Array] = None
                           ) -> Tuple[Dict[str, jnp.ndarray], Dict]:
    """mix [B, N, 1] -> ({source: audio [B, M, 1]} or magnitudes), new_state."""
    assert mix.shape[2] == 1, "spectrogram model is mono-only"
    L = cfg.num_layers
    # Opt-in bf16 conv compute (Config.compute_dtype): unlike the time-domain
    # net (layout-bound at 2-288 channels, measured no gain — DESIGN.md §1),
    # U7's 5x5 convs reach 512 channels. STFT/iSTFT and the mask/BN math
    # stay fp32. Inference only: conv2d's fp32 accumulation has no transpose
    # rule for bf16 kernels (same limit as ops/conv.py:conv1d fp32_accum).
    cdtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
              and not training else None)
    prec = PRECISION[cfg.conv_precision]
    spec = stft(mix[..., 0])                      # [B, F, 513]
    mix_mag = jnp.abs(spec)
    x0 = jnp.log1p(mix_mag)[..., None][:, :, :-1, :]  # [B, F, 512, 1]

    new_state: Dict = {}
    mags: Dict[str, jnp.ndarray] = {}
    masks: Dict[str, jnp.ndarray] = {}
    if training and rng is None:
        rng = jax.random.PRNGKey(0)
    for s in cfg.source_names:
        cur = x0
        skips = []
        for i in range(L):
            assert cur.shape[1] % 2 == 0 and cur.shape[2] % 2 == 0, (
                f"spectrogram dims must halve cleanly, got {cur.shape}")
            cur = conv2d(cur, params[f"{s}/down_{i}"], stride=(2, 2),
                         compute_dtype=cdtype, precision=prec)
            cur, new_state[f"{s}/down_{i}_bn"] = _bn_apply(
                cur, params[f"{s}/down_{i}_bn"]["beta"],
                state[f"{s}/down_{i}_bn"], training)
            cur = leaky_relu(cur)
            if i < L - 1:
                skips.append(cur)
        for i in range(L - 1):
            cur = conv2d_transpose(cur, params[f"{s}/up_{i}"], stride=(2, 2),
                                   compute_dtype=cdtype, precision=prec)
            cur, new_state[f"{s}/up_{i}_bn"] = _bn_apply(
                cur, params[f"{s}/up_{i}_bn"]["beta"],
                state[f"{s}/up_{i}_bn"], training)
            cur = jax.nn.relu(cur)
            cur = jnp.concatenate([skips[-i - 1], cur], axis=3)
            if i < 3 and training:  # dropout(0.5) on first 3 up layers (`:82-83`)
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 0.5, cur.shape)
                cur = jnp.where(keep, cur / 0.5, 0.0)
        mask = jax.nn.sigmoid(
            conv2d_transpose(cur, params[f"{s}/mask"], stride=(2, 2),
                             compute_dtype=cdtype, precision=prec))
        mask = pad_freqs(mask, mix_mag.shape[2], axis=2, value=0.5)[..., 0]
        masks[s] = mask
        mags[s] = mix_mag * mask

    if return_spectrogram:
        return mags, new_state

    audio_out = {}
    for s in cfg.source_names:
        # Mixture-phase reconstruction (`:100-106`): the reference computes
        # mag_s * exp(i*angle(spec)); since mag_s = mask * |spec| this is
        # algebraically mask * spec — same result without the per-bin
        # angle/complex-exp transcendentals (exact where spec == 0 too:
        # both forms give 0).
        src_spec = masks[s] * spec
        audio = istft(src_spec)
        audio_out[s] = audio[..., None]
    return audio_out, new_state
