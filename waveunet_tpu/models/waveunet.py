"""Time-domain Wave-U-Net separator — TPU-native functional implementation.

Capability-parity reimplementation of the reference's ``UnetAudioSeparator``
(`/root/reference/Models/UnetAudioSeparator.py:9-144`) as a pure function over an
explicit parameter pytree:

  * down path: ``num_layers`` x [conv1d(filter_size, LeakyReLU) -> skip -> x[::2]]
    (`:97-100`), bottleneck conv (`:102`)
  * up path: ``num_layers`` x [x2 upsample (learned / bilinear, `:110-117`)
    -> crop-and-concat skip (`:122`) -> conv1d(merge_filter_size, LeakyReLU) (`:123`)]
  * final concat with (cropped) input (`:127`), then direct or difference output
    (`/root/reference/Models/OutputLayer.py:5-23`) with tanh or linear+clip
    activation (`UnetAudioSeparator.py:131-134`).

Design notes (TPU-first):
  * No module framework — params are a flat dict pytree, trivially shardable with
    ``jax.sharding`` and trivially mappable from TF checkpoints.
  * All shapes static; the whole forward jit-compiles into one XLA program where
    LeakyReLU and bias adds fuse into the conv epilogues (MXU-bound).
  * Decimation lowers (by default) into the next conv as stride-2 + dilation-2
    instead of a strided slice — bit-exact, and it avoids XLA's devectorised
    lowering of convs that consume long strided rows (``Config.decimate_lowering``,
    DESIGN.md §1); a fused Pallas down-block exists in ``waveunet_tpu.ops.pallas``
    for benchmarking.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from waveunet_tpu.config import Config
from waveunet_tpu.ops import shapes
from waveunet_tpu.ops.conv import PRECISION, conv1d, conv1d_init
from waveunet_tpu.ops.primitives import audio_clip, crop, crop_and_concat, leaky_relu
from waveunet_tpu.ops.upsample import bilinear_x2, learned_interp_x2

Params = Dict[str, Dict[str, jnp.ndarray]]


def _down_channels(cfg: Config, i: int) -> int:
    # 24 * (i + 1) with num_initial_filters=24 (`UnetAudioSeparator.py:98`).
    return cfg.num_initial_filters + cfg.num_initial_filters * i


def init_waveunet(rng, cfg: Config, dtype=jnp.float32) -> Params:
    """Initialise the parameter pytree (glorot-uniform kernels, zero biases)."""
    params: Params = {}
    n_keys = 2 * cfg.num_layers + 2 + cfg.num_sources + cfg.num_layers
    keys = jax.random.split(rng, n_keys)
    ki = iter(range(n_keys))

    in_ch = cfg.num_channels
    for i in range(cfg.num_layers):
        out_ch = _down_channels(cfg, i)
        params[f"down_{i}"] = conv1d_init(keys[next(ki)], cfg.filter_size, in_ch,
                                          out_ch, dtype)
        in_ch = out_ch

    bott_ch = _down_channels(cfg, cfg.num_layers)
    params["bottleneck"] = conv1d_init(keys[next(ki)], cfg.filter_size, in_ch,
                                       bott_ch, dtype)

    cur_ch = bott_ch
    for i in range(cfg.num_layers):
        if cfg.upsampling == "learned":
            # Per-feature convex weights, unconstrained pre-sigmoid
            # (`InterpolationLayer.py:19-20`). TF1 default glorot_uniform on a
            # rank-1 [C] variable uses fan_in = fan_out = C => limit sqrt(3/C).
            lim = float(jnp.sqrt(3.0 / cur_ch))
            params[f"interp_{i}"] = {
                "weights": jax.random.uniform(
                    keys[next(ki)], (cur_ch,), dtype, minval=-lim, maxval=lim),
            }
        skip_ch = _down_channels(cfg, cfg.num_layers - i - 1)
        out_ch = skip_ch
        params[f"up_{i}"] = conv1d_init(keys[next(ki)], cfg.merge_filter_size,
                                        skip_ch + cur_ch, out_ch, dtype)
        cur_ch = out_ch

    final_ch = cur_ch + cfg.num_channels  # concat with input (`:127`)
    n_out_convs = (cfg.num_sources if cfg.output_type == "direct"
                   else cfg.num_sources - 1)
    for s in range(n_out_convs):
        name = cfg.source_names[s]
        params[f"out_{name}"] = conv1d_init(keys[next(ki)], cfg.output_filter_size,
                                            final_ch, cfg.num_channels, dtype)
    return params


def num_params(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def apply_waveunet(params: Params, cfg: Config, mix: jnp.ndarray,
                   training: bool) -> Dict[str, jnp.ndarray]:
    """Forward pass: mixture [B, in_len, C] -> {source: [B, out_len, C]}."""
    padding = "VALID" if cfg.context else "SAME"
    cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    prec = PRECISION[cfg.conv_precision]
    # Opt-in Pallas kernels (inference-only forward). Measured on v5e they are
    # currently slightly behind XLA's native conv lowering (see
    # waveunet_tpu/ops/pallas/KERNELS.md) — default stays False.
    use_pallas = cfg.use_pallas and cfg.context and not training

    # Decimation lowering: the reference decimates the conv output with a
    # strided slice (`:100`), so every down conv below layer 0 consumes a
    # strided view. XLA's conv lowering devectorises on long strided rows;
    # folding the slice into the next conv as stride-2 + dilation-2 is
    # bit-exact (out[i] = sum_t x[2i+2t]·k[t] == conv(x[::2])[i], identical
    # output length for odd and even L) and measured +15% whole-forward at
    # the 131072-frame window, +45% at 262144 on v5e (tools/conv_cliff_probe*).
    # (num_layers == 0 has no decimation to fold into the bottleneck conv.)
    use_dilate = (cfg.decimate_lowering == "dilate" and not use_pallas
                  and cfg.num_layers > 0)

    def conv(x, p, *, stride=1, dil=1):
        # fp32 accumulation at inference; differentiated bf16 convs must run
        # fully in bf16 (see ops/conv.py:conv1d on the transpose-rule limit).
        pad = padding
        if dil > 1 and padding == "SAME":
            # Explicit pads reproducing SAME-conv-of-decimated-signal: the
            # SAME pads of the half-rate conv (lo = (w-1)//2, hi = w-1-lo),
            # doubled into full-rate coordinates. For odd w both are w-1;
            # for even w the asymmetry matters (2*lo == w-2, 2*hi == w) —
            # symmetric (w-1, w-1) pads would sample the odd decimation
            # phase x[1::2] instead.
            w = p["kernel"].shape[0]
            lo = (w - 1) // 2
            pad = [(2 * lo, 2 * (w - 1 - lo))]
        return conv1d(x, p, padding=pad, stride=stride, rhs_dilation=dil,
                      compute_dtype=cdtype, fp32_accum=not training,
                      precision=prec)

    def conv_act(x, p):
        if use_pallas:
            from waveunet_tpu.ops.pallas.conv1d_fused import conv1d_lrelu_pallas
            return conv1d_lrelu_pallas(x, p["kernel"], p["bias"])
        return leaky_relu(conv(x, p))

    def conv_act_dec(x, p):
        # decimating conv: consumes the previous layer's full-rate output
        # and produces conv(x[::2]) directly (see use_dilate above).
        return leaky_relu(conv(x, p, stride=2, dil=2))

    if cfg.remat and training:
        # Recompute conv activations in the backward pass instead of storing
        # them: O(depth) activation-memory reduction for long windows.
        conv_act = jax.checkpoint(conv_act)
        conv_act_dec = jax.checkpoint(conv_act_dec)

    skips: List[jnp.ndarray] = []
    cur = mix
    for i in range(cfg.num_layers):
        f = conv_act_dec if (use_dilate and i > 0) else conv_act
        cur = f(cur, params[f"down_{i}"])
        skips.append(cur)
        if not use_dilate:
            cur = cur[:, ::2, :]  # decimate (`:100`)

    cur = (conv_act_dec if use_dilate else conv_act)(cur, params["bottleneck"])

    for i in range(cfg.num_layers):
        if cfg.upsampling == "learned":
            if use_pallas:
                from waveunet_tpu.ops.pallas.interp import learned_interp_pallas
                cur = learned_interp_pallas(
                    cur, params[f"interp_{i}"]["weights"], cfg.context)
            else:
                cur = learned_interp_x2(cur, params[f"interp_{i}"]["weights"],
                                        cfg.context)
        else:
            cur = bilinear_x2(cur, cfg.context)
        skip = skips[-i - 1]
        if not cfg.context and skip.shape[1] != cur.shape[1]:
            raise ValueError(
                f"same-padding skip mismatch at layer {i}: "
                f"{skip.shape[1]} vs {cur.shape[1]}")
        cur = crop_and_concat(skip, cur)
        cur = conv_act(cur, params[f"up_{i}"])

    cur = crop_and_concat(mix, cur)

    if cfg.output_activation == "tanh":
        def out_act(x):
            return jnp.tanh(x)
    else:  # linear: clip at inference only (`Utils.py:82-92`)
        def out_act(x):
            return audio_clip(x, training)

    out: Dict[str, jnp.ndarray] = {}
    if cfg.output_type == "direct":
        for name in cfg.source_names:
            out[name] = out_act(conv(cur, params[f"out_{name}"]))
    else:  # difference (`OutputLayer.py:11-23`)
        acc = None
        for name in cfg.source_names[:-1]:
            y = out_act(conv(cur, params[f"out_{name}"]))
            out[name] = y
            acc = y if acc is None else acc + y
        cropped_mix = crop(mix, acc.shape[1])
        last = audio_clip(cropped_mix - acc, training)
        out[cfg.source_names[-1]] = last
    return out


def io_shapes(cfg: Config):
    """(input_len, output_len) for the configured desired ``num_frames``."""
    return shapes.get_padding(cfg, cfg.num_frames)
