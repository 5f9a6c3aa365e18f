"""MUSDB evaluation harness: TPU inference -> BSS-Eval v4 -> JSON -> aggregate.

Replaces `produce_musdb_source_estimates` + `predict`
(`/root/reference/Evaluate.py:16-80,147-159`): iterate MUSDB test tracks, run the
batched window-parallel separation engine per track, resample estimates back to
the native rate, evaluate SDR/ISR/SIR/SAR framewise, and write per-track JSONs
compatible with the reference's aggregation (`Evaluate.py:195-231`).

Tracks come either from the ``musdb`` package (stems layout, if installed) or a
decoded-WAV directory layout ``<root>/{train,test}/<song>/{mixture,...}.wav``.
The reference rebuilt the whole TF graph per track (`Evaluate.py:41-57,77-78`);
here one jitted engine instance serves every track.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from waveunet_tpu.config import Config
from waveunet_tpu.data.audio_io import load, write_wav
from waveunet_tpu.eval.aggregate import compute_mean_metrics, write_track_json
from waveunet_tpu.eval.bsseval import bss_eval_framewise
from waveunet_tpu.infer.engine import Separator
from waveunet_tpu.ops.resample import resample

_EVAL_TARGETS = {
    "voice": ("vocals", "accompaniment"),
    "multi_instrument": ("vocals", "drums", "bass", "other"),
}


def iter_tracks(musdb_path: str, subset: str, skip=None
                ) -> Iterator[Tuple[str, np.ndarray, int, Dict[str, np.ndarray]]]:
    """Yields (name, mixture [n, ch], rate, {target: [n, ch]}).

    ``skip(name) -> bool`` short-circuits BEFORE any audio decode and yields
    ``(name, None, None, None)`` — resuming a mostly-complete dataset eval
    must not pay minutes of WAV/mp3 decode per already-scored track."""
    part_dir = os.path.join(musdb_path, subset)
    if os.path.isdir(part_dir):  # decoded-WAV layout
        for song in sorted(os.listdir(part_dir)):
            d = os.path.join(part_dir, song)
            mix_p = os.path.join(d, "mixture.wav")
            if not os.path.isfile(mix_p):
                continue
            if skip is not None and skip(song):
                yield song, None, None, None
                continue
            mix, sr = load(mix_p, sr=None, mono=False)
            targets = {}
            for t in ("vocals", "drums", "bass", "other", "accompaniment"):
                p = os.path.join(d, f"{t}.wav")
                if os.path.isfile(p):
                    targets[t] = load(p, sr=None, mono=False)[0]
            if ("accompaniment" not in targets
                    and {"drums", "bass", "other"} <= set(targets)):
                targets["accompaniment"] = np.clip(
                    targets["drums"] + targets["bass"] + targets["other"],
                    -1.0, 1.0)
            yield song, mix, sr, targets
        return

    import musdb  # type: ignore  # stems layout fallback

    mus = musdb.DB(root=musdb_path, subsets=[subset])
    for track in mus.tracks:
        if skip is not None and skip(track.name):
            yield track.name, None, None, None
            continue
        targets = {name: tgt.audio for name, tgt in track.targets.items()}
        yield track.name, track.audio, track.rate, targets


def separate_track(sep: Separator, cfg: Config, mix: np.ndarray, rate: int
                   ) -> Dict[str, np.ndarray]:
    """Separate + resample back + re-tile channels (`Evaluate.py:61-67`)."""
    preds = sep.separate(mix, rate)
    out = {}
    for name, est in preds.items():
        est = resample(est, cfg.expected_sr, rate)[:mix.shape[0]]
        if est.shape[0] < mix.shape[0]:
            est = np.pad(est, [(0, mix.shape[0] - est.shape[0]), (0, 0)])
        if cfg.mono_downmix and mix.shape[1] > 1:
            est = np.tile(est, [1, mix.shape[1]])
        elif est.shape[1] > mix.shape[1]:
            # Stereo model fed a mono track: the engine channel-duplicated
            # the input (`Evaluate.py:98-102`), so downmix the estimate back
            # to the track's channel count — otherwise scoring stacks
            # [S, n, 1] references against [S, n, 2] estimates and crashes
            # (round-2 review finding; the reference never hit this because
            # MUSDB is all-stereo).
            est = np.mean(est, axis=1, keepdims=True)
        out[name] = est
    return out


def _bss_eval(refs: np.ndarray, ests: np.ndarray, rate: int, win_s: float,
              tpu_bss=False, mesh=None) -> Dict[str, np.ndarray]:
    """Framewise metrics: the ``museval`` package when installed (exact parity
    with the reference's scoring, `Evaluate.py:71`), else the built-in
    BSS-Eval v4 implementation. ``tpu_bss`` selects the device path:
    truthy/"fp32" = the batched fp32+refinement kernel (eval/bsseval_tpu.py:
    SDR exact, catastrophic windows auto-routed to host fp64 by the
    ridge-sensitivity gate, SIR/SAR within its documented fp32 contract —
    fastest, for monitoring/ablations); "f64" = the full-precision XLA-f64
    kernel (eval/bsseval_tpu64.py: the host fp64 algorithm with exact-matmul
    assembly — matches the host's exact-assembly scores to <1e-3 dB on every
    real-music fixture window, incl. the near-singular ones where fp32 is
    off by dB)."""
    if isinstance(tpu_bss, str) and tpu_bss == "f64":
        from waveunet_tpu.eval.bsseval_tpu64 import bss_eval_framewise_tpu64
        return bss_eval_framewise_tpu64(refs, ests, rate, win_s=win_s,
                                        hop_s=win_s)
    if tpu_bss:
        from waveunet_tpu.eval.bsseval_tpu import bss_eval_framewise_tpu
        wb = 8 if mesh is None else max(8, mesh.size)
        return bss_eval_framewise_tpu(refs, ests, rate, win_s=win_s,
                                      hop_s=win_s, window_batch=wb, mesh=mesh)
    try:
        import museval.metrics as mm  # type: ignore

        sdr, isr, sir, sar, _ = mm.bss_eval(
            refs, ests, window=int(win_s * rate), hop=int(win_s * rate),
            framewise_filters=False, bsseval_sources_version=False)
        return {"SDR": sdr, "ISR": isr, "SIR": sir, "SAR": sar}
    except ImportError:
        return bss_eval_framewise(refs, ests, rate, win_s=win_s, hop_s=win_s)


def evaluate_track(cfg: Config, name: str, mix: np.ndarray, rate: int,
                   targets: Dict[str, np.ndarray], sep: Separator,
                   results_dir: Optional[str] = None,
                   estimates_dir: Optional[str] = None,
                   win_s: float = 1.0, tpu_bss: bool = False
                   ) -> Dict[str, Dict[str, np.ndarray]]:
    """Separate + score one track synchronously (single-track convenience)."""
    preds = separate_track(sep, cfg, mix, rate)
    return _score_and_write(cfg, name, mix.shape[0], rate, targets, preds,
                            results_dir, estimates_dir, win_s, tpu_bss)


def _score_and_write(cfg, name, mix_len, rate, targets, preds, results_dir,
                     estimates_dir, win_s, tpu_bss=False, mesh=None):
    eval_names = [s for s in _EVAL_TARGETS[cfg.task]
                  if s in preds and s in targets]

    def fit(x):
        # Targets can disagree with the mixture length by a codec frame
        # (trimmed stems); estimates are already mixture-length. Align all
        # references too, or np.stack crashes and drops the track.
        x = x[:mix_len]
        if x.shape[0] < mix_len:
            x = np.pad(x, [(0, mix_len - x.shape[0]), (0, 0)])
        return x

    refs = np.stack([fit(targets[s]) for s in eval_names])
    ests = np.stack([preds[s] for s in eval_names])
    res = _bss_eval(refs, ests, rate, win_s, tpu_bss, mesh)
    per_target = {s: {k: res[k][i] for k in res}
                  for i, s in enumerate(eval_names)}
    if results_dir is not None:
        write_track_json(os.path.join(results_dir, f"{name}.json"), name,
                         per_target, win=win_s, hop=win_s)
    if estimates_dir is not None:
        d = os.path.join(estimates_dir, name)
        os.makedirs(d, exist_ok=True)
        for s, est in preds.items():
            write_wav(os.path.join(d, f"{s}.wav"), est, rate)
    med = {s: float(np.nanmedian(m["SDR"])) for s, m in per_target.items()}
    print(f"  {name} median SDR: {med}")
    return per_target


def aggregate_and_print(results_dir: str):
    """Aggregate every per-track JSON under ``results_dir`` and print the
    reference's summary table (`Evaluate.py:195-231` statistics)."""
    stats, names = compute_mean_metrics(results_dir, return_names=True)
    for name, (median, mad, mean, sd) in zip(names, stats):
        print(f"{name}: SDR median {median:.2f} (MAD {mad:.2f}) "
              f"mean {mean:.2f} (SD {sd:.2f})")
    return stats


def self_check_separator(cfg: Config, sep: Separator, seconds: float = 2.0
                         ) -> None:
    """Estimates-contract self-check — the reference asserts museval's
    ``mus.test(predict_fun)`` before every dataset run
    (`/root/reference/Evaluate.py:158`); this is its engine-level equivalent.
    Separates a tiny random track and validates the output contract (source
    names, shapes, dtype, finiteness, peak) so a wiring bug fails in seconds
    instead of after the first multi-minute track. Raises RuntimeError."""
    rng = np.random.default_rng(0)
    n = int(seconds * cfg.expected_sr)
    audio = (0.1 * rng.standard_normal((n, 2))).astype(np.float32)
    preds = sep.separate(audio, cfg.expected_sr)
    problems = []
    if set(preds) != set(cfg.source_names):
        problems.append(f"source names {sorted(preds)} != "
                        f"{sorted(cfg.source_names)}")
    for name, est in preds.items():
        if est.shape != (n, cfg.num_channels):
            problems.append(f"{name}: shape {est.shape} != "
                            f"({n}, {cfg.num_channels})")
        if est.dtype != np.float32:
            problems.append(f"{name}: dtype {est.dtype} != float32")
        if not np.isfinite(est).all():
            problems.append(f"{name}: non-finite samples")
        elif np.abs(est).max() > 1.0 + 1e-6:
            problems.append(f"{name}: peak {np.abs(est).max():.3f} > 1")
    if problems:
        raise RuntimeError("separator self-check failed: "
                           + "; ".join(problems))


def evaluate_musdb(cfg: Config, params, model_state=None, mesh=None,
                   subset: str = "test", output_path: str = "estimates",
                   max_tracks: Optional[int] = None, win_s: float = 1.0,
                   tpu_bss: bool = False,
                   scoring_workers: Optional[int] = None,
                   shard_index: int = 0, shard_count: int = 1,
                   aggregate: bool = True, self_check: bool = True):
    """Full-dataset evaluation; prints the aggregate table at the end.

    Pipelined: while the BSS-Eval scoring of track i runs in workers, the
    TPU already separates track i+1 — scoring overlaps the device work (the
    reference rebuilt a TF graph per track and did everything serially,
    `Evaluate.py:41-57,156-159`).

    The default scores on the host in fp64 (museval-parity); scoring is
    embarrassingly parallel numpy, so it fans out over a
    ``scoring_workers``-process pool (default: cores capped at 8 — enough to
    clear the round-2 single-scorer-thread bottleneck while bounding host
    memory to ~(workers+1) resident tracks). ``tpu_bss=True`` opts into the
    device-batched fp32 path (eval/bsseval_tpu.py) — SDR exact, catastrophic
    windows auto-routed to host by its ridge-sensitivity gate, but SIR/SAR
    carry up to ~dB-scale fp32 error on ill-conditioned real-music windows
    (measured; see that module's accuracy contract) — right for monitoring
    and ablations, not for publication tables. Device scoring shares the
    chip with separation, so it runs in ONE in-process thread.

    Pod scale: ``shard_index``/``shard_count`` stride the subset's tracks
    (position in the deterministic sorted enumeration, mod ``shard_count``)
    so N processes each score a disjoint shard on their LOCAL devices with
    no cross-process collectives — JSON/WAV outputs are per-track files on
    the shared FS, so shards never collide. ``max_tracks`` bounds the
    GLOBAL enumeration (every shard counts all tracks), so shards agree on
    the cut. The caller barriers afterwards and aggregates once via
    :func:`aggregate_and_print` (``aggregate=False`` skips the per-shard
    table; see ``cli.py train final_eval=1`` for the pod wiring).
    """
    import multiprocessing as mp
    from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

    sep = Separator(cfg, params, model_state=model_state, mesh=mesh)
    if self_check:
        # `mus.test(predict_fun)` parity: fail on contract bugs in seconds,
        # not after the first track (costs one tiny-bucket compile when the
        # XLA cache is cold; pass self_check=False to skip).
        self_check_separator(cfg, sep)
    results_dir = os.path.join(output_path, subset)
    os.makedirs(results_dir, exist_ok=True)

    if tpu_bss:
        # device scoring must stay in-process (it shares the accelerator)
        pool = ThreadPoolExecutor(max_workers=1)
        cap = 2
    else:
        # Every outstanding task holds full-track multi-source audio
        # (~0.5-1 GB for a 4-min 44.1 kHz stereo 4-source track between the
        # args tuple and its pickled in-flight copy), so the worker default
        # is capped at 8 — host RSS stays bounded at ~(workers+1) tracks
        # regardless of core count. Pass scoring_workers to raise it on
        # hosts with the memory to match.
        workers = scoring_workers or min(os.cpu_count() or 1, 8)
        # spawn, not fork: the parent holds live XLA runtime threads
        pool = ProcessPoolExecutor(max_workers=workers,
                                   mp_context=mp.get_context("spawn"))
        cap = workers + 1

    errors = []
    pending = []  # (args, future); bounded — each task holds full-track audio
    pool_broken = False  # one dead worker breaks a ProcessPoolExecutor

    def _submit(args):
        # A worker crash (BrokenProcessPool) poisons the executor: every
        # later submit raises. Score inline from then on instead of
        # aborting the remaining dataset mid-eval.
        nonlocal pool_broken
        if not pool_broken:
            try:
                pending.append((args, pool.submit(_score_and_write, *args)))
                return
            except Exception as e:
                pool_broken = True
                print(f"scoring pool broken ({e}); "
                      f"scoring remaining tracks in-process")
        _score_inline(args)

    def _score_inline(args):
        try:
            _score_and_write(*args)
        except Exception as e:  # surface at the end, keep scoring
            errors.append((args[1], e))

    def _drain(limit):
        while len(pending) > limit:
            args, fut = pending.pop(0)
            try:
                fut.result()
                continue
            except Exception as e:
                # A worker crash (e.g. spawn cannot re-import a REPL/stdin
                # __main__) loses the whole pool batch — rescore inline so
                # one environment quirk doesn't zero out the dataset eval.
                print(f"scoring worker failed for {args[1]} ({e}); "
                      f"rescoring in-process")
            _score_inline(args)

    # Idempotent resume: a full-dataset eval takes hours (scoring-bound);
    # already-scored tracks are skipped like the reference's idempotent
    # ingest (`Datasets.py:233-245`) — BEFORE their audio is decoded.
    # Delete the JSON to re-evaluate. Shard ownership is decided here too,
    # from the track's position in the enumeration (iter_tracks yields every
    # track exactly once, in deterministic order, calling ``skip`` for each).
    def _scored(name):
        return os.path.exists(os.path.join(results_dir, f"{name}.json"))

    skip_state = {"i": -1, "why": ""}

    def _skip(name):
        skip_state["i"] += 1
        if skip_state["i"] % shard_count != shard_index:
            skip_state["why"] = (
                f"shard {skip_state['i'] % shard_count}/{shard_count}'s track")
            return True
        if _scored(name):
            skip_state["why"] = "already evaluated"
            return True
        return False

    count = 0
    for name, mix, rate, targets in iter_tracks(cfg.musdb_path, subset,
                                                skip=_skip):
        if mix is None:
            print(f"Skipping {name} ({skip_state['why']})")
            count += 1
            if max_tracks is not None and count >= max_tracks:
                break
            continue
        print(f"Separating {name}...")
        preds = separate_track(sep, cfg, mix, rate)
        args = (cfg, name, mix.shape[0], rate, targets, preds, results_dir,
                output_path, win_s, tpu_bss, mesh if tpu_bss else None)
        _submit(args)
        _drain(cap)
        count += 1
        if max_tracks is not None and count >= max_tracks:
            break
    _drain(0)
    pool.shutdown()
    for name, e in errors:
        print(f"WARNING: scoring failed for {name}: {e}")

    if not aggregate:
        return None  # pod shard: the caller barriers, then aggregates once
    return aggregate_and_print(results_dir)
