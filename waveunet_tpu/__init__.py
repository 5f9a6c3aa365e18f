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
