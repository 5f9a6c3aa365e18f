"""One-command zoo-parity run: pretrained TF checkpoint -> convert ->
evaluate on MUSDB18 -> aggregate -> compare to the published table.

This is the headline SDR-parity run that the offline build environment
cannot execute (no MUSDB18, no downloaded zoo — BASELINE.md "environment-
bound gaps"). `make parity` runs it the moment the two artifacts appear:

  1. MUSDB18 at --musdb, either as the decoded-WAV layout
     (train|test/<song>/{mixture,vocals,...}.wav) or the native .mp4 stems
     via the musdb package (data/ingest.py handles both),
  2. the reference's pretrained zoo at --zoo, laid out exactly as its
     checkpoints/README.md prescribes: <zoo>/<preset>/<preset>-<step>
     (e.g. checkpoints/full_44KHz/full_44KHz-236118,
     `/root/reference/Predict.py:10`).

For each preset the newest TF checkpoint is located and handed straight to
`cli evaluate checkpoint=<path>` — the CLI converts TF Saver-V2 -> pytree
inline (compat/tf_checkpoint.py; parity of the conversion itself is pinned
by tests/test_compat_ref.py at atol 2e-5) — then the full 50-track test-set
evaluation runs through the TPU engine with in-repo BSS-Eval v4 (host fp64,
museval-parity; the gated tests/test_external_parity.py pins the scorer
against live museval whenever that package is installed).

The final table prints this framework's median/mean SDR next to the
reference's published numbers (README.md:102: M5-HighSR vocals 4.95 median /
1.01 mean, accompaniment 11.16 / 12.87) and writes docs/parity.json.

Usage:
    make parity MUSDB=/path/to/musdb18 [ZOO=/path/to/checkpoints]
    python tools/parity.py --musdb /path/to/musdb18 --zoo checkpoints \
        [--presets full_44KHz,baseline_stereo,full_multi_instrument]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Published aggregates for the zoo models (reference README.md:102; the
# paper's Table 3 reports the same regime for M4/M6 but the README only
# quotes M5-HighSR — leave the others as measured-only rows).
PUBLISHED = {
    "full_44KHz": {
        "vocals": {"median": 4.95, "mean": 1.01},
        "accompaniment": {"median": 11.16, "mean": 12.87},
    },
}

# Zoo archive folders shipped by the reference (README.md "Downloading our
# pretrained models"): one per preset name.
DEFAULT_PRESETS = ("full_44KHz", "baseline_stereo", "full_multi_instrument")


def find_tf_checkpoint(zoo: str, preset: str):
    """Newest `<zoo>/<preset>/<preset>-<step>` TF Saver-V2 checkpoint."""
    pat = os.path.join(zoo, preset, f"{preset}-*.index")
    best, best_step = None, -1
    for idx in glob.glob(pat):
        m = re.search(r"-(\d+)\.index$", idx)
        if m and int(m.group(1)) > best_step:
            best, best_step = idx[: -len(".index")], int(m.group(1))
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--musdb", required=True, help="MUSDB18 root")
    ap.add_argument("--zoo", default=os.path.join(REPO, "checkpoints"),
                    help="pretrained-zoo root (reference checkpoints/ layout)")
    ap.add_argument("--presets", default=",".join(DEFAULT_PRESETS))
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "parity.json"))
    ap.add_argument("--estimates", default=os.path.join(REPO, ".parity"))
    ap.add_argument("--max-tracks", type=int, default=None,
                    help="bound the test set (smoke runs)")
    ap.add_argument("--extra", action="append", default=[],
                    help="extra key=value fragment appended to every "
                         "`cli evaluate` call (repeatable) — e.g. "
                         "--extra tpu_bss=1, --extra platform=cpu for a "
                         "host-CPU smoke run, --extra infer_num_frames=16384")
    args = ap.parse_args()

    if not os.path.isdir(args.musdb):
        print(f"error: MUSDB18 not found at {args.musdb!r} — this run needs "
              "the real dataset (offline builds pin parity via "
              "tests/test_compat_ref.py goldens instead)", file=sys.stderr)
        return 2

    presets = [p.strip() for p in args.presets.split(",") if p.strip()]
    runs = []
    for preset in presets:
        ckpt = find_tf_checkpoint(args.zoo, preset)
        if ckpt is None:
            print(f"skip {preset}: no TF checkpoint under "
                  f"{os.path.join(args.zoo, preset)!r}")
            continue
        runs.append((preset, ckpt))
    if not runs:
        print(f"error: no zoo checkpoints found under {args.zoo!r} — unzip "
              "the reference's models.zip there (checkpoints/README.md)",
              file=sys.stderr)
        return 2

    from waveunet_tpu.eval.aggregate import compute_mean_metrics

    table = {}
    t0 = time.time()
    for preset, ckpt in runs:
        est = os.path.join(args.estimates, preset)
        cmd = [sys.executable, "-m", "waveunet_tpu.cli", "evaluate", preset,
               f"musdb_path={args.musdb}", f"checkpoint={ckpt}",
               f"estimates_path={est}"]
        if args.max_tracks:
            cmd.append(f"max_tracks={args.max_tracks}")
        cmd.extend(args.extra)
        print("+ " + " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True, cwd=REPO)

        stats, names = compute_mean_metrics(os.path.join(est, "test"),
                                            metric="SDR", return_names=True)
        row = {}
        for n, (median, mad, mean, sd) in zip(names, stats):
            row[n] = {"median": round(float(median), 2),
                      "mean": round(float(mean), 2),
                      "MAD": round(float(mad), 2),
                      "SD": round(float(sd), 2)}
        table[preset] = {"checkpoint": ckpt, "measured": row,
                         "published": PUBLISHED.get(preset)}

    out = {"musdb": args.musdb, "zoo": args.zoo,
           "scoring": "in-repo BSS-Eval v4, host fp64, 1 s windows",
           "wall_s": round(time.time() - t0, 1), "results": table}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)

    print("\n== Zoo parity (SDR dB, measured vs published) ==")
    for preset, r in table.items():
        print(f" {preset}:")
        for src, m in r["measured"].items():
            pub = (r["published"] or {}).get(src)
            ref = (f"  published {pub['median']:+.2f} / {pub['mean']:+.2f}"
                   if pub else "  (no published aggregate)")
            print(f"   {src}: median {m['median']:+.2f} mean {m['mean']:+.2f}"
                  + ref)
    print(f"artifact: {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
