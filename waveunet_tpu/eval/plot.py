"""Paper figures: SDR violin plot and spectrogram rendering.

Matplotlib counterparts of `/root/reference/Plot.py:11-60`:
  * ``draw_violin_sdr``: violin plot of framewise vocal/accompaniment SDR from a
    folder of per-track evaluation JSONs (`Plot.py:11-29`).
  * ``draw_spectrogram``: log-magnitude STFT image of a WAV file (`Plot.py:31-59`).
Both save to files (headless-safe, Agg backend).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from waveunet_tpu.eval.aggregate import compute_mean_metrics  # noqa: E402


def draw_violin_sdr(json_folder: str, out_path: str = "sdr_violin.pdf",
                    names=None):
    """Violin plot of the segment-wise SDR distributions per source.

    Labels come from the JSONs' own target names unless ``names`` overrides
    them (a fixed positional default mislabels sources — the harness writes
    vocals first, the reference's museval JSONs accompaniment first)."""
    data, json_names = compute_mean_metrics(json_folder,
                                            compute_averages=False,
                                            metric="SDR", return_names=True)
    data = [d[~np.isnan(d)] for d in data]
    if not data:
        raise ValueError(f"no evaluation JSONs in {json_folder}")
    if names is None:
        names = [n.capitalize() for n in json_names]
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.violinplot(data, showmedians=True)
    ax.set_xticks(np.arange(1, len(data) + 1))
    ax.set_xticklabels(list(names)[:len(data)])
    ax.set_ylabel("SDR (dB)")
    ax.yaxis.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def draw_spectrogram(wav_path: str, out_path: Optional[str] = None,
                     frame_len: int = 512, hop: int = 256):
    """Log-magnitude spectrogram figure of an audio file."""
    import jax.numpy as jnp

    from waveunet_tpu.data.audio_io import load
    from waveunet_tpu.ops.stft import stft

    audio, sr = load(wav_path, sr=None, mono=True)
    spec = np.asarray(jnp.abs(stft(jnp.asarray(audio[:, 0])[None],
                                   frame_len, hop)))[0]
    fig, ax = plt.subplots(figsize=(8, 4))
    eps = 1e-8
    img = 20 * np.log10(spec.T + eps)
    ax.imshow(img, origin="lower", aspect="auto",
              extent=[0, audio.shape[0] / sr, 0, sr / 2 / 1000],
              cmap="magma", vmin=img.max() - 90, vmax=img.max())
    ax.set_xlabel("time (s)")
    ax.set_ylabel("frequency (kHz)")
    fig.tight_layout()
    out_path = out_path or os.path.splitext(wav_path)[0] + "_spec.png"
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
