"""waveunet_tpu — a TPU-native (JAX/XLA/Pallas) audio source-separation framework.

Feature-parity rebuild of f90/Wave-U-Net (time-domain Wave-U-Net + spectrogram
U-Net baseline, MUSDB pipeline, training/eval/prediction drivers), redesigned for
TPU: functional models over param pytrees, jit/shard_map execution over device
meshes, batched window-parallel inference, host-side numpy data pipeline.
"""

from waveunet_tpu.config import Config, config_from_cli, get_config, preset_names

__version__ = "0.1.0"

__all__ = [
    "Config",
    "config_from_cli",
    "get_config",
    "preset_names",
    "__version__",
]


def __getattr__(name):
    """Lazy top-level API (avoids importing jax for config-only use):
    Separator, StreamingSeparator, separate_file, optimise, evaluate_musdb."""
    if name == "Separator":
        from waveunet_tpu.infer.engine import Separator
        return Separator
    if name == "StreamingSeparator":
        from waveunet_tpu.infer.streaming import StreamingSeparator
        return StreamingSeparator
    if name == "separate_file":
        from waveunet_tpu.infer.engine import separate_file
        return separate_file
    if name == "optimise":
        from waveunet_tpu.train.loop import optimise
        return optimise
    if name == "evaluate_musdb":
        from waveunet_tpu.eval.harness import evaluate_musdb
        return evaluate_musdb
    raise AttributeError(f"module 'waveunet_tpu' has no attribute {name!r}")
