"""Snippet extraction, augmentation, and target cropping (host-side numpy).

Numpy counterparts of the reference's tf.data stages:
  * random snippets per song at uniform positions  (`Datasets.py:16-19`)
  * deterministic eval snippets, hop = output size (`Datasets.py:21-25`)
  * random source attenuation + mix re-synthesis   (`Utils.py:26-36`)
  * centre-crop of targets to the output window    (`Utils.py:38-42`)
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def random_snippet_positions(rng: np.random.Generator, length: int,
                             input_len: int, n: int) -> np.ndarray:
    """Uniform random starts in [0, length - input_len) (`Datasets.py:18`)."""
    hi = length - input_len
    if hi <= 0:
        return np.zeros((n,), np.int64)
    return rng.integers(0, hi, size=n, dtype=np.int64)


def sequential_snippet_positions(length: int, input_len: int,
                                 output_len: int) -> np.ndarray:
    """Strided starts with hop = output_len (`Datasets.py:23`)."""
    return np.arange(0, max(length - input_len, 1), output_len, dtype=np.int64)


def extract_snippets(tracks: Dict[str, np.ndarray], positions: np.ndarray,
                     input_len: int) -> Dict[str, np.ndarray]:
    """Gather [n, input_len, ch] windows for every key (native C++ memcpy
    kernel when built, strided-view fallback otherwise)."""
    from waveunet_tpu.runtime import native

    return {key: native.gather_windows(audio, positions, input_len)
            for key, audio in tracks.items()}


def random_amplify(sample: Dict[str, np.ndarray], rng: np.random.Generator,
                   source_names: Sequence[str]) -> Dict[str, np.ndarray]:
    """Scale each source by U(0.7, 1.0) and re-sum the mix (`Utils.py:26-36`).

    Operates on batched snippets [n, len, ch]; each snippet draws its own scale
    per source (the reference draws per-sample since it maps over single
    examples).
    """
    n = sample[source_names[0]].shape[0]
    out = {}
    mix = None
    for key in source_names:
        scale = rng.uniform(0.7, 1.0, size=(n, 1, 1)).astype(np.float32)
        scaled = sample[key] * scale
        out[key] = scaled
        mix = scaled if mix is None else mix + scaled
    out["mix"] = mix
    return out


def crop_targets(sample: Dict[str, np.ndarray], pad_frames: int,
                 source_names: Sequence[str]) -> Dict[str, np.ndarray]:
    """Crop each source (not the mix) by pad_frames on both ends (`Utils.py:38-42`)."""
    if pad_frames <= 0:
        return sample
    out = dict(sample)
    for key in source_names:
        out[key] = sample[key][:, pad_frames:-pad_frames, :]
    return out
