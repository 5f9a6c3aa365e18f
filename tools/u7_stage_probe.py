"""Stage-split timing for the U7 spectrogram model on the real chip:
STFT front-end vs per-source 2-D U-Nets vs iSTFT reconstruction.

SUPERSEDED for absolute numbers by tools/engine_probe.py: this probe
syncs via block_until_ready, which the axon client has been observed
returning from WITHOUT syncing (CLAUDE.md hazard), so treat its absolute
ms as suspect — the round-2 relative verdict it established (gather/
scatter framing was 2/3 of the forward; strip-form reshapes fixed it)
stands, but the trustworthy value-fetch-synced stage economics live in
engine_probe's records (.probes/u7_engine.jsonl).

Motivation: ops/stft.py frames with an index-matrix gather and overlap-adds
with a scatter-add — both patterns TPUs handle poorly. If they are a
meaningful share of U7's forward, both have pure reshape/pad formulations
(frame 1024 = hop 768 + 256 ⇒ only adjacent frames overlap).

Usage: python tools/u7_stage_probe.py <batch> [out.jsonl]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1])
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/u7_stage.jsonl"

    import jax
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from waveunet_tpu.config import get_config
    from waveunet_tpu.models.spectrogram_unet import (apply_spectrogram_unet,
                                                      init_spectrogram_unet)
    from waveunet_tpu.ops import stft as stft_mod

    cfg = get_config("unet_spectrogram")
    params, state = init_spectrogram_unet(jax.random.PRNGKey(0), cfg)
    n = cfg.num_frames
    sr = cfg.expected_sr

    full = jax.jit(lambda p, x: apply_spectrogram_unet(
        p, cfg, x, training=False, state=state)[0])
    mags_only = jax.jit(lambda p, x: apply_spectrogram_unet(
        p, cfg, x, training=False, state=state, return_spectrogram=True)[0])
    stft_j = jax.jit(lambda x: stft_mod.stft(x[..., 0]))
    istft_j = jax.jit(lambda s: stft_mod.istft(s))

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, n, 1)).astype(np.float32) * 0.1)
    spec = jax.block_until_ready(stft_j(x))

    def timed(fn, *args, K=8):
        jax.block_until_ready(fn(*args))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(K)]
            jax.block_until_ready(outs[-1])
            dt = (time.perf_counter() - t0) / K
            best = dt if best is None else min(best, dt)
        return best * 1e3

    rec = {
        "batch": batch, "num_frames": n,
        "platform": jax.devices()[0].platform,
        "full_ms": round(timed(full, params, x), 3),
        "mags_only_ms": round(timed(mags_only, params, x), 3),
        "stft_ms": round(timed(stft_j, x), 3),
        "istft_ms": round(timed(istft_j, spec), 3),
    }
    rec["audio_s_per_s"] = round(batch * n / sr / (rec["full_ms"] / 1e3), 1)
    print(json.dumps(rec))
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
