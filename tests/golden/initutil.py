"""Shared deterministic weight/input generators for the golden scripts.

gen_waveunet_tf.py, gen_waveunet_ref.py, and gen_spectro_tf.py must draw
IDENTICAL values for the same (shape, seed) — the ref-vs-recreation equality
tests (tests/test_compat_ref.py) compare goldens across generators at 1e-6.
Keeping one copy here prevents the three previously duplicated definitions
from drifting (round-2 review finding).
"""

import numpy as np


def glorot(shape, seed):
    rng = np.random.default_rng(seed)
    fan_in = np.prod(shape[:-1])
    fan_out = shape[-1] * (np.prod(shape[:-2]) if len(shape) > 2 else 1)
    lim = np.sqrt(6.0 / (fan_in + fan_out))
    return rng.uniform(-lim, lim, size=shape).astype(np.float32)


def rnd(shape, seed, scale=0.1):
    return (scale * np.random.default_rng(seed).standard_normal(shape)
            ).astype(np.float32)
