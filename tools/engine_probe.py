"""Localise a family's resident-engine gap on the real chip.

Born as the U7 probe: bench.py round 5 measured the U7 resident engine at
~5.7k audio-s/s while tools/u7_stage_probe.py had recorded a ~13.9k
audio-s/s bare-forward roof. That older probe syncs via
``block_until_ready`` which has been OBSERVED RETURNING WITHOUT SYNCING over
the axon tunnel (CLAUDE.md), so before chasing "engine overhead" this probe
re-measures every stage with the trustworthy VALUE-fetch sync (the jitted fn
returns a checksum scalar; float() on the last pipelined call bounds the
batch). It localised the gap to the pow2 split tail serialising two
dispatch-floor sub-forwards inside one program — the sub-batch exact-chunk
rule in `Separator.resident_sweep` — and now works for any preset so the
same engine-vs-forward-floor question can be asked of every family bench.py
reports:

  fwd_bN      bare batched forward at each batch size the 60 s sweep uses
              (batches larger than n_win are padded with repeats of the
              last position so the timed program really is batch N)
  resident    the exact bench.py resident_sweep program (production
              chunk schedule)
  pow2split   resident variant forced onto _chunk_sizes' pow2 split tail
              via the explicit chunk_sizes override (for sub-batch songs
              this is the pre-round-5 schedule; identical to `resident`
              when the song already runs the pow2 schedule)
  nostitch    forward sweep + checksum only (stitch/dequant/difference cut)

Usage: python tools/engine_probe.py [preset] [out.jsonl]
       preset defaults to unet_spectrogram; out defaults to
       .probes/engine_<preset>.jsonl (.probes/u7_engine.jsonl for U7,
       keeping the round-5 artifact's history in one file).
Bench-matched infer settings per family: U7 batch 8, waveunet families
window 65536 @ batch 16 (bench.py's rows).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:]]
    preset = args[0] if args and not args[0].endswith(".jsonl") \
        else "unet_spectrogram"
    default_out = (".probes/u7_engine.jsonl"
                   if preset == "unet_spectrogram"
                   else f".probes/engine_{preset}.jsonl")
    out_path = next((a for a in args if a.endswith(".jsonl")), default_out)

    import jax
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from tools.benchutil import (best_pipelined_s, make_bench_song,
                                 resident_rtf, stage_resident_song)
    from waveunet_tpu.config import get_config
    from waveunet_tpu.infer.engine import Separator, window_positions

    seconds = 60.0
    if preset == "unet_spectrogram":
        cfg = get_config(preset, infer_batch=8, infer_wire_dtype="int16")
    else:  # bench.py's waveunet-family row settings
        cfg = get_config(preset, infer_num_frames=65536, infer_batch=16,
                         infer_wire_dtype="int16")
    if cfg.network == "unet_spectrogram":
        from waveunet_tpu.models.spectrogram_unet import init_spectrogram_unet
        params, state = init_spectrogram_unet(jax.random.PRNGKey(0), cfg)
        sep = Separator(cfg, params, model_state=state)
    else:
        from waveunet_tpu.models.waveunet import init_waveunet
        params = init_waveunet(jax.random.PRNGKey(0), cfg)
        sep = Separator(cfg, params)
    song = make_bench_song(cfg.expected_sr, seconds)
    if cfg.mono_downmix:  # stage the downmixed song, as separate() would
        song = song[:, :1]
    song_dev = stage_resident_song(sep, song)
    n_total = len(song)
    positions = window_positions(n_total, sep.out_len).astype(np.int32)
    n_win = int(positions.shape[0])
    pow2_sizes = sep._chunk_sizes(n_win)
    prod_sizes = sep.resident_chunk_sizes(n_win)  # the engine's own rule
    rec = {"preset": preset, "platform": jax.devices()[0].platform,
           "n_win": n_win, "chunks": prod_sizes, "pow2_chunks": pow2_sizes,
           "out_len": sep.out_len}

    # bare batched forward at each batch size, value-fetch synced
    def fwd_checksum(b):
        pos_np = np.full((b,), positions[-1], np.int32)
        pos_np[:min(b, n_win)] = positions[:b]
        pos = jnp.asarray(pos_np)

        def fn(p, song):
            outs = sep._fwd(p, song, pos)
            return sum(jnp.sum(v.astype(jnp.float32)) for v in outs.values())
        jit_fn = jax.jit(fn)
        float(jit_fn(params, song_dev))  # compile + warm
        return best_pipelined_s(lambda: jit_fn(params, song_dev))

    for b in sorted({1, 4, n_win, cfg.infer_batch}):
        s = fwd_checksum(b)
        rec[f"fwd_b{b}_ms"] = round(s * 1e3, 2)
        rec[f"fwd_b{b}_audio_s_per_s"] = round(b * sep.out_len
                                               / cfg.expected_sr / s, 1)

    # the exact bench resident program
    res_fn, _ = sep.resident_sweep(n_total)
    rtf = resident_rtf(res_fn, params, song_dev, seconds)
    rec["resident_audio_s_per_s"] = round(rtf, 1)
    rec["resident_ms"] = round(seconds / rtf * 1e3, 2)

    # pow2-split variant via the explicit chunk_sizes override (the A/B the
    # sub-batch exact-chunk rule rests on; a no-op A/B when prod == pow2)
    if pow2_sizes != prod_sizes:
        pow2_fn, _ = sep.resident_sweep(n_total, chunk_sizes=pow2_sizes)
        rtf2 = resident_rtf(pow2_fn, params, song_dev, seconds)
        rec["pow2split_audio_s_per_s"] = round(rtf2, 1)
        rec["pow2split_ms"] = round(seconds / rtf2 * 1e3, 2)

    # forward sweep only (production chunk schedule, no stitch/diff/dequant)
    sizes = prod_sizes
    pos_pad = np.full((sum(sizes),), positions[-1], np.int32)
    pos_pad[:n_win] = positions

    def nostitch(p, song):
        total = jnp.float32(0)
        off = 0
        for k in sizes:
            pos = jnp.asarray(pos_pad[off:off + k])
            outs = sep._fwd(p, song, pos)
            total = total + sum(jnp.sum(v.astype(jnp.float32))
                                for v in outs.values())
            off += k
        return total
    ns_fn = jax.jit(nostitch)
    float(ns_fn(params, song_dev))
    s = best_pipelined_s(lambda: ns_fn(params, song_dev))
    rec["nostitch_ms"] = round(s * 1e3, 2)
    rec["nostitch_audio_s_per_s"] = round(seconds / s, 1)

    print(json.dumps(rec))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
