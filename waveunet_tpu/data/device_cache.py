"""Device-resident training data: the whole source bank lives in HBM.

The reference streams TFRecord snippets host->device every step
(`Datasets.py:188-214`); on TPU that per-step host transfer is pure overhead —
at MUSDB scale the *entire* preprocessed dataset fits in one chip's HBM as
int16 (2 sources x 150 songs x 4 min x 44.1 kHz x stereo ≈ 12 GB; mono/22 kHz
configs are 4-8x smaller). This module keeps the per-source waveform banks on
device and runs the reference's sampling semantics as a jitted program:

  * uniform random song visit + uniform random snippet position
    (`Datasets.py:16-19` semantics, flattened: position uniform over each
    song's valid range, song chosen uniformly)
  * per-snippet random source attenuation U(0.7, 1.0) + mix re-synthesis
    (`Utils.py:26-36`)
  * centre-crop of targets to the output window (`Utils.py:38-42`)

A training step then needs ZERO host->device bytes (the PRNG key folds from the
step index). Mix windows are gathered at input length; the mix is synthesised
on device from the (augmented) sources, exactly like the reference's pipeline.

For data-parallel meshes the bank is replicated by default (it is read-only);
podscale variants can shard songs per host and sample locally.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from waveunet_tpu.config import Config
from waveunet_tpu.data import cache


def build_sampler(cfg: Config, input_len: int, output_len: int, batch: int,
                  augment: Optional[bool] = None):
    """Traceable sampler over (bank, starts, valids, key) -> batch dict.

    Shared by :class:`DeviceBank` and the driver's multi-chip dry run
    (``__graft_entry__.py``), so the production sampling semantics are
    validated by the same code they run with. Snippet positions draw with
    ``jax.random.randint`` — an earlier float32 ``frac * valid`` formulation
    quantised to even offsets on songs > 2^24 samples (round-2 review).
    """
    S = cfg.num_sources
    pad = (input_len - output_len) // 2
    do_augment = cfg.augmentation if augment is None else augment

    def sample(bank, starts, valids, key):
        k_song, k_pos, k_amp = jax.random.split(key, 3)
        song = jax.random.randint(k_song, (batch,), 0, starts.shape[0])
        # valid == 0 (song exactly input_len long) still admits position 0.
        pos = starts[song] + jax.random.randint(
            k_pos, (batch,), 0, jnp.maximum(valids[song], 1))

        def gather(p):
            # [S, input_len, C] window across every source at position p
            return jax.lax.dynamic_slice(
                bank, (0, p, 0), (S, input_len, bank.shape[2]))

        wins = jax.vmap(gather)(pos).astype(jnp.float32) / 32767.0
        if do_augment:
            scale = jax.random.uniform(k_amp, (batch, S, 1, 1), minval=0.7,
                                       maxval=1.0)
            wins = wins * scale
        mix = jnp.sum(wins, axis=1)  # [batch, input_len, C]
        targets = wins[:, :, pad:pad + output_len, :] if pad > 0 else wins
        out = {name: targets[:, i] for i, name in
               enumerate(cfg.source_names)}
        out["mix"] = mix
        return out

    return sample


class DeviceBank:
    """Concatenated per-source audio bank on device + song position table."""

    def __init__(self, cfg: Config, partition: str, input_len: int,
                 output_len: int, max_songs: Optional[int] = None,
                 batch_size: Optional[int] = None,
                 max_bytes: Optional[int] = None):
        self.cfg = cfg
        self.input_len = input_len
        self.output_len = output_len
        self.pad = (input_len - output_len) // 2
        self.batch = batch_size or cfg.batch_size

        paths = cache.list_songs(cfg, partition)
        if max_songs is not None:
            paths = paths[:max_songs]
        if not paths:
            raise FileNotFoundError(f"no cached songs for {partition!r}")

        chunks: List[np.ndarray] = []
        starts, valids = [], []
        offset = 0
        for p in paths:
            tracks = cache.load_song(p)
            length = tracks["mix"].shape[0]
            if length < input_len:
                continue
            src = np.stack([tracks[s] for s in cfg.source_names])  # [S, n, C]
            q = np.clip(src, -1.0, 1.0)
            chunks.append(np.round(q * 32767.0).astype(np.int16))
            starts.append(offset)
            valids.append(length - input_len)  # max start position (exclusive)
            offset += length
        if not chunks:
            raise ValueError("no song long enough for the input window")
        if len(starts) < len(paths):
            print(f"WARNING: device bank dropped {len(paths) - len(starts)} "
                  f"of {len(paths)} songs shorter than the "
                  f"{input_len}-sample network input")
        bank = np.concatenate(chunks, axis=1)  # [S, total, C]
        if max_bytes is not None and bank.nbytes > max_bytes:
            raise ValueError(
                f"device bank {bank.nbytes / 1e9:.1f} GB exceeds the "
                f"{max_bytes / 1e9:.1f} GB HBM budget")
        self.n_songs = len(starts)
        self._bank = jnp.asarray(bank)
        self._starts = jnp.asarray(np.asarray(starts, np.int32))
        self._valids = jnp.asarray(np.asarray(valids, np.int32))
        # raw (traceable) sampler — composable inside larger jitted programs
        # (the scanned-epoch path scans it together with the train step)
        self.sample_raw = self._build_sampler()
        self._sample = jax.jit(self.sample_raw)

    def set_batch(self, batch: int) -> None:
        """Re-point the samplers at a new batch size. The bank arrays are
        reused — rebuilding the bank for a fine-tune round's batch change
        would re-upload the multi-GB int16 bank over the host link."""
        self.batch = batch
        self.sample_raw = self._build_sampler()
        self._sample = jax.jit(self.sample_raw)

    def nbytes(self) -> int:
        return int(self._bank.size) * 2

    @property
    def arrays(self):
        """(bank, starts, valids) device arrays — the sampler's inputs."""
        return self._bank, self._starts, self._valids

    def _build_sampler(self):
        return build_sampler(self.cfg, self.input_len, self.output_len,
                             self.batch)

    def batches(self, base_key=None):
        """Endless iterator of device-resident training batches."""
        key = base_key if base_key is not None else jax.random.PRNGKey(
            self.cfg.seed)
        i = 0
        while True:
            yield self._sample(self._bank, self._starts, self._valids,
                               jax.random.fold_in(key, i))
            i += 1
