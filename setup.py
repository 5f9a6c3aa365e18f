"""Package setup: pure-Python package + optional C++ host-ops library.

The native library (waveunet_tpu/runtime/host_ops.cc) builds lazily at first
use via g++ (see runtime/native.py), so no build step is required here; this
setup exists for `pip install -e .` ergonomics and console entry points.
"""

from setuptools import find_packages, setup

setup(
    name="waveunet_tpu",
    version="0.1.0",
    description=("TPU-native audio source separation framework "
                 "(Wave-U-Net + spectrogram U-Net, JAX/XLA/Pallas)"),
    packages=find_packages(include=["waveunet_tpu", "waveunet_tpu.*"]),
    package_data={"waveunet_tpu.runtime": ["host_ops.cc"]},
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "scipy", "optax", "orbax-checkpoint"],
    extras_require={
        "data": ["musdb", "museval"],
        "viz": ["matplotlib", "tensorboardX"],
    },
    entry_points={
        "console_scripts": ["waveunet-tpu=waveunet_tpu.cli:main"],
    },
)
