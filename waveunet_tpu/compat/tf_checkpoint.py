"""TF Saver-V2 checkpoint -> JAX pytree converter for the pretrained zoo.

The reference distributes pretrained models as TF1 Saver V2 checkpoints
(`/root/reference/Training.py:98,113`, zoo at `README.md:106-111`). Variables are
created in a fixed order inside ``variable_scope("separator")`` by
``tf.layers.conv1d`` auto-naming (`Models/UnetAudioSeparator.py:92-142`):

  down conv i (0..L-1)   -> separator/conv1d[_i]/kernel|bias      (i=0 has no suffix)
  bottleneck             -> separator/conv1d_L/...
  learned interp level i -> separator/interp_i                    (InterpolationLayer.py:19)
  up conv i (0..L-1)     -> separator/conv1d_{L+1+i}/...
  output conv j          -> separator/conv1d_{2L+1+j}/...         (K convs for
                            "direct", K-1 for "difference" outputs)

TF's conv1d kernel layout [width, in_ch, out_ch] matches ours exactly
(`waveunet_tpu/ops/conv.py`), so conversion is pure renaming.

Reading the checkpoint uses ``tf.train.load_checkpoint`` in an **isolated
subprocess** (importing TF in-process fights the TPU tunnel) that dumps to a
sidecar ``.npz``; the converter then maps names. Both families convert:
``load_tf_waveunet`` for the time-domain net and ``load_tf_spectrogram`` for
the U7/U7a spectrogram net (per-source ``separator_var_<k>`` scopes with
conv2d/conv2d_transpose/batch_normalization variables,
`Models/UnetSpectrogramSeparator.py:40-106`).
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
from typing import Dict

import numpy as np

from waveunet_tpu.config import Config

_READER_SCRIPT = r"""
import os, sys
os.environ["CUDA_VISIBLE_DEVICES"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import tensorflow as tf
ckpt, out = sys.argv[1], sys.argv[2]
reader = tf.train.load_checkpoint(ckpt)
shapes = reader.get_variable_to_shape_map()
arrays = {}
for name in shapes:
    arrays[name.replace("/", "|")] = reader.get_tensor(name)
np.savez(out, **arrays)
print("ok", len(arrays))
"""


def read_tf_checkpoint(ckpt_path: str) -> Dict[str, np.ndarray]:
    """Read every variable of a TF checkpoint via an isolated subprocess."""
    with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
        out = f.name
    try:
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        res = subprocess.run(
            [sys.executable, "-c", _READER_SCRIPT, ckpt_path, out],
            capture_output=True, env=env, timeout=600)
        if res.returncode != 0:
            raise RuntimeError(
                f"TF checkpoint read failed: {res.stderr.decode()[-2000:]}")
        with np.load(out) as z:
            return {k.replace("|", "/"): z[k] for k in z.files}
    finally:
        os.unlink(out)


def tf_var_prefix(cfg: Config, param_key: str) -> str:
    """Map one of our param-tree keys to its TF variable prefix."""
    L = cfg.num_layers

    def conv(n: int) -> str:
        return "separator/conv1d" if n == 0 else f"separator/conv1d_{n}"

    if param_key.startswith("down_"):
        return conv(int(param_key.split("_")[1]))
    if param_key == "bottleneck":
        return conv(L)
    if param_key.startswith("interp_"):
        return f"separator/interp_{int(param_key.split('_')[1])}"
    if param_key.startswith("up_"):
        return conv(L + 1 + int(param_key.split("_")[1]))
    if param_key.startswith("out_"):
        name = param_key[len("out_"):]
        j = list(cfg.source_names).index(name)
        return conv(2 * L + 1 + j)
    raise KeyError(f"unknown param key {param_key!r}")


def tf_spectro_var_prefix(cfg: Config, key: str) -> str:
    """Map a spectrogram-net param/state key to its TF variable prefix.

    The reference builds one U-Net per source inside ``variable_scope
    ("separator")`` (`UnetSpectrogramSeparator.py:63-86`); tf.layers auto-names
    continue across the source loop, so per source s (0-based), with L layers:

      down conv i        -> separator/conv2d_{s*L + i}
      down BN i          -> separator/BatchNorm_{s*(2L-1) + i}
      up transpose i     -> separator/conv2d_transpose_{s*L + i}
      up BN i            -> separator/BatchNorm_{s*(2L-1) + L + i}
      mask transpose     -> separator/conv2d_transpose_{s*L + L - 1}

    (the unsuffixed first name is index 0). BN variables are beta /
    moving_mean / moving_variance (scale=False: no gamma).
    """
    L = cfg.num_layers
    src, rest = key.split("/", 1)
    s = list(cfg.source_names).index(src)

    def nm(base: str, n: int) -> str:
        return f"separator/{base}" if n == 0 else f"separator/{base}_{n}"

    if rest.startswith("down_"):
        i = int(rest[len("down_"):].split("_")[0])
        if rest.endswith("_bn"):
            return nm("BatchNorm", s * (2 * L - 1) + i)
        return nm("conv2d", s * L + i)
    if rest.startswith("up_"):
        i = int(rest[len("up_"):].split("_")[0])
        if rest.endswith("_bn"):
            return nm("BatchNorm", s * (2 * L - 1) + L + i)
        return nm("conv2d_transpose", s * L + i)
    if rest == "mask":
        return nm("conv2d_transpose", s * L + L - 1)
    raise KeyError(f"unknown spectrogram param key {key!r}")


def load_tf_spectrogram(ckpt_path: str, cfg: Config,
                        arrays: Dict[str, np.ndarray] = None):
    """Convert a spectrogram-U-Net (U7/U7a) TF checkpoint -> (params, state)."""
    import jax
    import jax.numpy as jnp

    from waveunet_tpu.models.spectrogram_unet import init_spectrogram_unet

    if arrays is None:
        arrays = read_tf_checkpoint(ckpt_path)
    t_params, t_state = init_spectrogram_unet(jax.random.PRNGKey(0), cfg)

    def fetch(name, like):
        src = arrays.get(name)
        if src is None:
            raise KeyError(f"missing TF variable {name}")
        if src.shape != like.shape:
            raise ValueError(f"{name}: shape {src.shape} != {like.shape}")
        return jnp.asarray(src, jnp.float32)

    params, state = {}, {}
    for key, leaf in t_params.items():
        prefix = tf_spectro_var_prefix(cfg, key)
        if key.endswith("_bn"):
            params[key] = {"beta": fetch(prefix + "/beta", leaf["beta"])}
        else:
            params[key] = {
                "kernel": fetch(prefix + "/weights"
                                if prefix + "/weights" in arrays
                                else prefix + "/kernel", leaf["kernel"]),
                "bias": fetch(prefix + "/biases"
                              if prefix + "/biases" in arrays
                              else prefix + "/bias", leaf["bias"]),
            }
    for key, leaf in t_state.items():
        prefix = tf_spectro_var_prefix(cfg, key)
        state[key] = {
            "mean": fetch(prefix + "/moving_mean", leaf["mean"]),
            "var": fetch(prefix + "/moving_variance", leaf["var"]),
        }
    return params, state


def load_tf_waveunet(ckpt_path: str, cfg: Config,
                     arrays: Dict[str, np.ndarray] = None):
    """Convert a reference Wave-U-Net checkpoint into our parameter pytree."""
    import jax.numpy as jnp

    if cfg.network != "unet":
        raise NotImplementedError(
            "use load_tf_spectrogram for unet_spectrogram configs")
    if arrays is None:
        arrays = read_tf_checkpoint(ckpt_path)

    from waveunet_tpu.models.waveunet import init_waveunet
    import jax
    template = init_waveunet(jax.random.PRNGKey(0), cfg)

    params = {}
    for key, leaf in template.items():
        prefix = tf_var_prefix(cfg, key)
        if key.startswith("interp_"):
            src = arrays.get(prefix)
            if src is None:
                raise KeyError(f"missing TF variable {prefix} for {key}")
            if src.shape != leaf["weights"].shape:
                raise ValueError(f"{prefix}: shape {src.shape} != "
                                 f"{leaf['weights'].shape}")
            params[key] = {"weights": jnp.asarray(src, jnp.float32)}
        else:
            k = arrays.get(prefix + "/kernel")
            b = arrays.get(prefix + "/bias")
            if k is None or b is None:
                raise KeyError(f"missing TF variables under {prefix} for {key}")
            if k.shape != leaf["kernel"].shape:
                raise ValueError(f"{prefix}/kernel: shape {k.shape} != "
                                 f"{leaf['kernel'].shape}")
            params[key] = {"kernel": jnp.asarray(k, jnp.float32),
                           "bias": jnp.asarray(b, jnp.float32)}
    return params
