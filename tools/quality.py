"""Trained-quality artifact: train THROUGH the real driver, score with the
in-repo BSS-Eval v4, emit the SDR table.

Real MUSDB18 and the pretrained zoo are absent in this offline environment
(BASELINE.md), so quality-side completeness is demonstrated on the soak's
synthetic-but-learnable dataset (production-shaped: stereo 44.1 kHz,
minutes-long songs, MUSDB WAV layout). Both tasks are covered: the voice
task (harmonic vocals + chord-pad accompaniment, `--preset full_44KHz`)
and the 4-source multi_instrument task (bass/drums/other/vocals,
`--preset full_multi_instrument`, M6) — the task and all run paths are
derived from the preset. Steps:

  1. synthesize the dataset (reuses tools/soak.py's generator),
  2. `cli train <preset> ... worse_epochs=N` — the REAL product loop, run to
     early-stop convergence (2 rounds, fine-tune batch x2 / lr 1e-5), with
     `checkpoint=auto` so an interrupted run resumes,
  3. `cli evaluate <preset> checkpoint=best` — full harness scoring the
     early-stop driver's best-validation checkpoint, host-fp64 BSS-Eval v4
     (museval-parity scoring, `eval/bsseval.py`),
  4. score the MIXTURE-AS-ESTIMATE baseline on the same tracks (the no-op
     separator: est_s = mix for every source) for the delta column,
  5. write the table to stdout + a JSON artifact (default
     `docs/quality_synth.json`) whose numbers BASELINE.md quotes.

The reference's equivalent is `Training.py` -> `Evaluate.py` -> the
README.md:102 SDR table; `make quality` runs this end to end.

Usage:
    python tools/quality.py                  # full run (~30-60 min on axon)
    python tools/quality.py --fresh          # wipe .quality first
    python tools/quality.py --skip-train     # rescore an existing run
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_streamed(cmd, t0):
    import soak
    soak.run_streamed(cmd, t0)


def mixture_baseline(cfg, db: str, results_dir: str):
    """Score est_s = mixture for every source: the no-separation floor the
    trained model's SDR is read against (input SDR)."""
    from waveunet_tpu.eval.harness import _score_and_write, iter_tracks

    os.makedirs(results_dir, exist_ok=True)
    for name, mix, rate, targets in iter_tracks(db, "test"):
        preds = {s: mix for s in targets}
        _score_and_write(cfg, name, mix.shape[0], rate, targets, preds,
                         results_dir, None, win_s=1.0)


def aggregate(results_dir: str):
    from waveunet_tpu.eval.aggregate import compute_mean_metrics

    out = {}
    for metric in ("SDR", "ISR", "SIR", "SAR"):
        stats, names = compute_mean_metrics(results_dir, metric=metric,
                                            return_names=True)
        for n, (median, mad, mean, sd) in zip(names, stats):
            out.setdefault(n, {})[metric] = {
                "median": round(float(median), 2),
                "MAD": round(float(mad), 2),
                "mean": round(float(mean), 2),
                "SD": round(float(sd), 2)}
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.path.join(REPO, ".quality"))
    ap.add_argument("--train-songs", type=int, default=12)
    ap.add_argument("--test-songs", type=int, default=4)
    ap.add_argument("--num-val-songs", type=int, default=2)
    ap.add_argument("--seconds", type=int, default=60)
    ap.add_argument("--epoch-it", type=int, default=500)
    ap.add_argument("--worse-epochs", type=int, default=3)
    ap.add_argument("--max-epochs", type=int, default=None,
                    help="safety cap per round (default: none — run to "
                         "early stop, the production regime)")
    ap.add_argument("--preset", default="full_44KHz")
    ap.add_argument("--out", default=None,
                    help="artifact path (default docs/quality_synth.json, "
                         "or quality_synth_multi.json for the "
                         "multi_instrument task)")
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("extra", nargs="*", help="extra key=value CLI fragments")
    args = ap.parse_args()

    from waveunet_tpu.config import get_config
    task = get_config(args.preset).task
    # dataset layout depends only on the task (stem set); run dirs must be
    # unique per preset so e.g. full_44KHz and unet_spectrogram (both voice)
    # don't clobber each other's checkpoints/estimates.
    db_sfx = "_multi" if task == "multi_instrument" else ""
    sfx = {"full_44KHz": "", "full_multi_instrument": "_multi"}.get(
        args.preset, "_" + args.preset)
    if args.out is None:
        args.out = os.path.join(REPO, "docs", f"quality_synth{sfx}.json")

    if args.fresh and os.path.isdir(args.root):
        shutil.rmtree(args.root)
    db = os.path.join(args.root, f"db{db_sfx}")
    if not os.path.isdir(db):
        import soak
        print(f"Synthesizing quality dataset at {db} ({task}) ...")
        soak.build_db(db, 44100, args.train_songs, args.test_songs,
                      args.seconds, task=task)

    common = [args.preset,
              f"musdb_path={db}",
              f"data_path={os.path.join(args.root, 'cache' + sfx)}",
              f"model_base_dir={os.path.join(args.root, 'ckpts' + sfx)}",
              f"log_dir={os.path.join(args.root, 'logs' + sfx)}",
              f"estimates_path={os.path.join(args.root, 'estimates' + sfx)}",
              f"num_val_songs={args.num_val_songs}",
              f"experiment_id=quality{sfx}"]
    t0 = time.time()
    train_wall = None
    if not args.skip_train:
        t_train = time.time()
        run_streamed([sys.executable, "-m", "waveunet_tpu.cli", "train"]
                     + common
                     + [f"epoch_it={args.epoch_it}",
                        f"worse_epochs={args.worse_epochs}",
                        "checkpoint=auto"]
                     + ([f"max_epochs={args.max_epochs}"]
                        if args.max_epochs else [])
                     + list(args.extra), t0)
        train_wall = round(time.time() - t_train, 1)

    results = os.path.join(args.root, "estimates" + sfx, "test")
    # checkpoint=best: score the early-stop driver's best-validation model
    # (best.txt), not the newest step dir — the newest sat through
    # worse_epochs regressions by construction (reference Training.py:161).
    # extra fragments apply to scoring too: architecture overrides must
    # match the checkpoint just trained with them, and scoring knobs
    # (platform=cpu, tpu_bss=1, infer window) belong to this stage.
    run_streamed([sys.executable, "-m", "waveunet_tpu.cli", "evaluate"]
                 + common + ["checkpoint=best"] + list(args.extra), t0)

    print("Scoring the mixture-as-estimate baseline ...", flush=True)
    cfg = get_config(args.preset, musdb_path=db)
    base_dir = os.path.join(args.root, "baseline_mixture" + sfx)
    mixture_baseline(cfg, db, base_dir)

    model_stats = aggregate(results)
    base_stats = aggregate(base_dir)
    table = {
        "dataset": {"kind": "synthetic (tools/soak.py generator)",
                    "train_songs": args.train_songs,
                    "valid_songs": args.num_val_songs,
                    "test_songs": args.test_songs,
                    "song_seconds": args.seconds, "sr": 44100,
                    "channels": 2},
        "preset": args.preset,
        "task": task,
        "regime": {"epoch_it": args.epoch_it,
                   "worse_epochs": args.worse_epochs,
                   "max_epochs_per_round": args.max_epochs,
                   "rounds": 2, "train_wall_s": train_wall},
        "scoring": "in-repo BSS-Eval v4, host fp64, 1 s windows "
                   "(eval/bsseval.py)",
        "model": model_stats,
        "mixture_baseline": base_stats,
        "delta_sdr_median": {
            s: round(model_stats[s]["SDR"]["median"]
                     - base_stats[s]["SDR"]["median"], 2)
            for s in model_stats if s in base_stats},
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(table, f, indent=1)

    print("\n== Quality table (SDR median dB, model vs mixture baseline) ==")
    for s in model_stats:
        m = model_stats[s]["SDR"]["median"]
        b = base_stats.get(s, {}).get("SDR", {}).get("median")
        print(f"  {s}: {m:+.2f} (mixture {b:+.2f}, "
              f"delta {table['delta_sdr_median'][s]:+.2f})")
    print(f"artifact: {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
