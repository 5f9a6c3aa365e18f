"""Command-line entry points.

Replaces the reference's sacred CLI (`python Training.py with cfg.<name> k=v`,
`/root/reference/Training.py:152-166`, `Predict.py:14-17`) with explicit
subcommands sharing the same preset + override grammar:

  python -m waveunet_tpu.cli train full_44KHz [key=value ...]
  python -m waveunet_tpu.cli predict full_44KHz input_path=mix.wav \
      [checkpoint=path] [output_path=dir]
  python -m waveunet_tpu.cli evaluate full_44KHz checkpoint=path \
      [subset=test] [output_path=dir]
  python -m waveunet_tpu.cli prepare-data full_44KHz   # MUSDB -> npz cache
  python -m waveunet_tpu.cli presets                   # list named configs
  python -m waveunet_tpu.cli figures results_dir=<dir> # SDR violin / spectrogram

Any command accepts ``platform=cpu|tpu|...`` to pin the jax backend
in-process (reliable even where an accelerator plugin ignores
``JAX_PLATFORMS``) — e.g. smoke-test a config on the host CPU while the
accelerator is busy.
"""

from __future__ import annotations

import os
import sys
from typing import Dict, List, Tuple

import numpy as np


def _setup_jax():
    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         os.pardir, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    return jax


def _apply_platform(argv: List[str]) -> List[str]:
    """Honor a leading-anywhere ``platform=cpu|tpu|...`` CLI fragment.

    Some accelerator plugins claim the default backend regardless of the
    ``JAX_PLATFORMS`` environment variable, so an env var is not a reliable
    way to run this CLI on the host CPU (smoke tests, CI, machines whose
    accelerator is busy). ``jax.config.update("jax_platforms", ...)`` before
    first device use IS reliable; this consumes the fragment and applies it.
    """
    rest = []
    for a in argv:
        if a.startswith("platform="):
            import jax
            jax.config.update("jax_platforms", a.split("=", 1)[1])
        else:
            rest.append(a)
    return rest


def _split_args(args: List[str]) -> Tuple[List[str], Dict[str, str]]:
    """Split CLI fragments into config fragments and CLI-local options."""
    cli_keys = {"input_path", "output_path", "checkpoint", "subset",
                "experiment_id", "max_epochs", "win_s", "max_tracks",
                "final_eval", "tpu_bss", "chunk_ms", "batch_windows",
                "max_song_s", "coordinator", "num_processes", "process_id",
                "random_init", "results_dir", "self_check"}
    cfg_frags, opts = [], {}
    for a in args:
        if "=" in a:
            k, v = a.split("=", 1)
            if k in cli_keys:
                opts[k] = v
                continue
        cfg_frags.append(a)
    return cfg_frags, opts


def cmd_presets(_args):
    from waveunet_tpu.config import get_config, preset_names
    for name in preset_names():
        cfg = get_config(name)
        print(f"{name:36s} net={cfg.network:16s} sr={cfg.expected_sr:6d} "
              f"ch={cfg.num_channels} ctx={int(cfg.context)} "
              f"out={cfg.output_type}")


def cmd_train(args):
    jax = _setup_jax()
    from waveunet_tpu.config import config_from_cli
    from waveunet_tpu.data import cache
    from waveunet_tpu.ops import shapes
    from waveunet_tpu.parallel.mesh import make_mesh
    from waveunet_tpu.train.loop import optimise

    cfg_frags, opts = _split_args(args)
    cfg = config_from_cli(cfg_frags)
    _maybe_init_pod(jax, opts)
    if not cache.is_prepared(cfg):
        if jax.process_count() > 1 and jax.process_index() != 0:
            # One preparer; the rest poll for the completion marker — with a
            # deadline, so a process-0 crash mid-prepare fails the pod fast
            # instead of hanging the other processes forever (the
            # jax.distributed barrier never fires for a process stuck here).
            import time as _time
            limit = float(os.environ.get("WAVEUNET_PREPARE_TIMEOUT_S", 7200))
            print("waiting for process 0 to prepare the dataset cache "
                  f"(timeout {limit:.0f}s)...")
            t0 = _time.monotonic()
            while not cache.is_prepared(cfg):
                if _time.monotonic() - t0 > limit:
                    print("error: dataset cache not prepared within "
                          f"{limit:.0f}s — did process 0 die? "
                          "(WAVEUNET_PREPARE_TIMEOUT_S overrides)",
                          file=sys.stderr)
                    sys.exit(3)
                _time.sleep(2.0)
        else:
            pad = shapes.context_pad(cfg, cfg.num_frames)
            print("Preparing dataset cache...")
            cache.prepare_dataset(cfg, pad)
    n_dev = jax.device_count()
    if jax.process_count() > 1:
        if cfg.batch_size % n_dev:
            print(f"error: batch_size {cfg.batch_size} must divide across "
                  f"{n_dev} pod devices", file=sys.stderr)
            sys.exit(2)
        mesh = make_mesh()
    elif n_dev > 1 and cfg.batch_size % n_dev == 0:
        mesh = make_mesh()
    else:
        if n_dev > 1:
            print(f"WARNING: batch_size {cfg.batch_size} not divisible by "
                  f"{n_dev} devices; training on one device")
        mesh = None
    max_ep = int(opts["max_epochs"]) if "max_epochs" in opts else None
    resume = opts.get("checkpoint")
    if resume == "auto":  # crash-resume from the newest checkpoint, if any
        # Same resolution as predict/evaluate: without an experiment_id scan
        # every experiment for the newest step dir (latest_checkpoint("")
        # would look for step_* dirs directly under model_base_dir — never a
        # match — and silently start fresh even when checkpoints exist).
        resume = _resolve_auto_checkpoint(cfg, opts.get("experiment_id", ""))
        print(f"auto-resume: {resume or 'no checkpoint found, fresh start'}")
    path, test_loss = optimise(cfg, experiment_id=opts.get("experiment_id"),
                               mesh=mesh, resume_path=resume,
                               max_epochs_per_round=max_ep)
    print(f"Best model: {path}; test loss {test_loss}")
    # Terminal full-dataset SDR eval with the best model — the reference's run()
    # ends by producing MUSDB source estimates (`Training.py:161-166`). Opt-in
    # here (final_eval=1) since a full BSS-Eval pass can dominate wall-clock.
    if opts.get("final_eval", "0").lower() in ("1", "true", "musdb") and path:
        _dataset_eval(jax, cfg, opts, path, subset="test",
                      output_path=cfg.estimates_path)


def _maybe_init_pod(jax, opts):
    """Multi-host (pod) bring-up BEFORE any device use: after initialize(),
    jax.devices() spans every process and global meshes work. One command
    per host, e.g.

        cli train full_44KHz coordinator=host0:1234 num_processes=4 \\
            process_id=<i> experiment_id=run1

    (on GCE TPU pods, plain ``cli train ...`` autodetects instead). No-op
    without the coordinator=/num_processes= options."""
    if "coordinator" not in opts and "num_processes" not in opts:
        return
    from waveunet_tpu.parallel import distributed as D
    pid = D.initialize(
        coordinator_address=opts.get("coordinator"),
        num_processes=(int(opts["num_processes"])
                       if "num_processes" in opts else None),
        process_id=(int(opts["process_id"])
                    if "process_id" in opts else None))
    print(f"pod process {pid}/{jax.process_count()} up; "
          f"{jax.device_count()} global devices")


def _dataset_eval(jax, cfg, opts, checkpoint, subset, output_path):
    """Full-dataset eval shared by ``train final_eval=1`` and ``evaluate``.

    Single process: one window-parallel engine over all devices, aggregate
    table printed directly. Pod: the dataset eval is a per-track host loop
    with shared-FS writes — it must not steer GLOBAL collectives (desync ->
    hang) — so each process scores a disjoint stride of tracks on its LOCAL
    devices only (per-track JSON/WAV outputs never collide), all meet at
    the terminal barrier (exiting early instead trips the coordination
    service's SHUTDOWN BARRIER: one process's atexit shutdown times out
    waiting for a still-evaluating peer; observed in the 2-process test),
    and process 0 aggregates the shared results dir once."""
    from waveunet_tpu.eval.harness import aggregate_and_print, evaluate_musdb
    from waveunet_tpu.parallel.mesh import make_mesh

    pod = jax.process_count() > 1
    shard_index, shard_count = 0, 1
    if pod:
        shard_index = jax.process_index()
        shard_count = jax.process_count()
        local = jax.local_devices()
        mesh = (make_mesh(devices=local) if len(local) > 1 else None)
        print(f"pod {subset} eval: scoring track shard "
              f"{shard_index}/{shard_count} on {len(local)} local device(s)")
    else:
        mesh = make_mesh() if len(jax.devices()) > 1 else None
    # EVERY process restores: orbax restore is a collective in a pod
    # (sync_global_processes inside Checkpointer.restore) — a
    # process-0-only call desyncs against the terminal barrier below.
    params, model_state = _load_params(cfg, checkpoint,
                                       opts.get("experiment_id", ""),
                                       allow_random=_random_ok(opts))
    evaluate_musdb(cfg, params, model_state=model_state, mesh=mesh,
                   subset=subset, output_path=output_path,
                   max_tracks=(int(opts["max_tracks"])
                               if "max_tracks" in opts else None),
                   win_s=float(opts.get("win_s", 1.0)),
                   tpu_bss=_parse_tpu_bss(opts),
                   shard_index=shard_index, shard_count=shard_count,
                   aggregate=not pod,
                   self_check=opts.get("self_check", "1").lower()
                   not in ("0", "false"))
    if pod:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("waveunet_dataset_eval")
        if jax.process_index() == 0:
            aggregate_and_print(os.path.join(output_path, subset))


def _random_ok(opts):
    return opts.get("random_init", "0").lower() in ("1", "true")


def _parse_tpu_bss(opts):
    """tpu_bss=0|1|f64: off, the fast fp32 device scorer, or the
    full-precision XLA-f64 device scorer (eval/bsseval_tpu64.py)."""
    v = opts.get("tpu_bss", "0").lower()
    if v == "f64":
        return "f64"
    return v in ("1", "true", "fp32")


def _load_params(cfg, checkpoint, experiment_id="", allow_random=False):
    """Resolve weights for an inference/eval surface.

    ``checkpoint=None`` is an ERROR unless ``allow_random`` — separating or
    scoring with random weights masquerades as a catastrophically bad model
    (the reference always predicts from a concrete checkpoint,
    `/root/reference/Predict.py:10`). ``random_init=1`` on the CLI is the
    explicit escape hatch (harness tests, architecture smoke runs); profile/
    warmup default to it since compiled programs don't depend on weight
    values.
    """
    import jax
    from waveunet_tpu.train import checkpoint as ckpt
    from waveunet_tpu.train.loop import init_state

    if checkpoint in ("auto", "best"):
        # auto: newest step dir under model_base_dir/<experiment_id>;
        # without an experiment_id, the newest step dir across ALL
        # experiments (mtime order). best: the checkpoint the early-stop
        # driver recorded as best-validation (best.txt) — with early
        # stopping the NEWEST checkpoint is by construction worse than the
        # best one (it sat through `worse_epochs` regressions), so `best`
        # is what evaluate/predict after a training run normally want
        # (matching the reference, which tests `best_model_path`,
        # `Training.py:88-90,161`). Unlike the None case below, a dangling
        # auto/best is an ERROR — silently scoring random weights because
        # of a typo'd path would be worse.
        mode = checkpoint
        checkpoint = (_resolve_auto_checkpoint(cfg, experiment_id)
                      if mode == "auto"
                      else _resolve_best_checkpoint(cfg, experiment_id))
        if checkpoint is None:
            print(f"error: checkpoint={mode} found nothing under "
                  f"{cfg.model_base_dir!r}"
                  + (f" for experiment_id={experiment_id!r}"
                     if experiment_id else ""), file=sys.stderr)
            sys.exit(2)
        print(f"checkpoint={mode} -> {checkpoint}")
    if checkpoint is None:
        if not allow_random:
            print("error: no checkpoint given — pass checkpoint=<path>, "
                  "checkpoint=auto, or random_init=1 to deliberately run "
                  "with random weights", file=sys.stderr)
            sys.exit(2)
        print("WARNING: no checkpoint given; using random initialisation")
        st = init_state(cfg)
        return st.params, st.model_state
    if checkpoint.endswith(".ckpt") or os.path.isfile(checkpoint + ".index"):
        # TF-format checkpoint from the reference zoo -> convert.
        if cfg.network == "unet":
            from waveunet_tpu.compat.tf_checkpoint import load_tf_waveunet
            return load_tf_waveunet(checkpoint, cfg), {}
        from waveunet_tpu.compat.tf_checkpoint import load_tf_spectrogram
        return load_tf_spectrogram(checkpoint, cfg)
    restored = ckpt.restore_checkpoint(checkpoint)
    return restored["params"], restored.get("model_state", {})


def _resolve_auto_checkpoint(cfg, experiment_id):
    from waveunet_tpu.train.checkpoint import latest_checkpoint

    if experiment_id:
        return latest_checkpoint(cfg.model_base_dir, experiment_id)
    if not os.path.isdir(cfg.model_base_dir):
        return None
    best, best_mtime = None, -1.0
    for exp in os.listdir(cfg.model_base_dir):
        path = latest_checkpoint(cfg.model_base_dir, exp)
        if path is not None:
            mtime = os.path.getmtime(path)
            if mtime > best_mtime:
                best, best_mtime = path, mtime
    return best


def _resolve_best_checkpoint(cfg, experiment_id):
    """The best-validation checkpoint the train driver recorded in
    <experiment>/best.txt; without an experiment_id, the newest best.txt
    across experiments. None if the marker or the checkpoint it names is
    gone (e.g. pruned with keep_checkpoints and no protection — cannot
    happen through the driver, which always protects best_path)."""
    def read_marker(exp):
        marker = os.path.join(cfg.model_base_dir, str(exp), "best.txt")
        if not os.path.isfile(marker):
            return None
        with open(marker) as f:
            path = f.read().strip()
        return path if path and os.path.isdir(path) else None

    if experiment_id:
        return read_marker(experiment_id)
    if not os.path.isdir(cfg.model_base_dir):
        return None
    # Pick the NEWEST marker by mtime, then resolve it. If the newest
    # experiment's best checkpoint is gone, that is an error (None -> the
    # caller exits loudly) — silently falling back to an OLDER experiment's
    # model would score the wrong weights without a word.
    newest, newest_mtime = None, -1.0
    for exp in os.listdir(cfg.model_base_dir):
        marker = os.path.join(cfg.model_base_dir, exp, "best.txt")
        if os.path.isfile(marker):
            mtime = os.path.getmtime(marker)
            if mtime > newest_mtime:
                newest, newest_mtime = exp, mtime
    return read_marker(newest) if newest is not None else None


def _resolve_zoo_tf_checkpoint(cfg, preset: str):
    """`Predict.py:10` convenience: the reference defaults its model path to
    the downloaded zoo's conventional TF layout
    ``checkpoints/<preset>/<preset>-<step>``. With no ``checkpoint=`` given,
    predict falls back to the highest-step TF checkpoint under
    ``<model_base_dir>/<preset>/`` when one exists (None otherwise — the
    fail-fast no-checkpoint error stays for everyone without a zoo)."""
    d = os.path.join(cfg.model_base_dir, preset)
    if not os.path.isdir(d):
        return None
    best = None
    for f in os.listdir(d):
        if f.endswith(".index") and "-" in f:
            stem = f[:-len(".index")]
            try:
                step = int(stem.rsplit("-", 1)[1])
            except ValueError:
                continue
            if best is None or step > best[0]:
                best = (step, os.path.join(d, stem))
    return best[1] if best else None


def cmd_predict(args):
    _setup_jax()
    import jax
    from waveunet_tpu.config import config_from_cli
    from waveunet_tpu.infer.engine import separate_file
    from waveunet_tpu.parallel.mesh import make_mesh

    cfg_frags, opts = _split_args(args)
    cfg = config_from_cli(cfg_frags)
    if "input_path" not in opts:
        print("predict requires input_path=<audio file>", file=sys.stderr)
        sys.exit(2)
    checkpoint = opts.get("checkpoint")
    if checkpoint is None and not _random_ok(opts):
        preset = next((a for a in cfg_frags if "=" not in a), "baseline")
        zoo = _resolve_zoo_tf_checkpoint(cfg, preset)
        if zoo is not None:
            print(f"no checkpoint given; using zoo checkpoint {zoo} "
                  f"(reference Predict.py default)")
            checkpoint = zoo
    params, model_state = _load_params(cfg, checkpoint,
                                       opts.get("experiment_id", ""),
                                       allow_random=_random_ok(opts))
    mesh = make_mesh() if len(jax.devices()) > 1 else None
    written = separate_file(cfg, params, opts["input_path"],
                            output_path=opts.get("output_path"), mesh=mesh,
                            model_state=model_state)
    for name, p in written.items():
        print(f"{name}: {p}")


def cmd_evaluate(args):
    _setup_jax()
    import jax
    from waveunet_tpu.config import config_from_cli

    cfg_frags, opts = _split_args(args)
    cfg = config_from_cli(cfg_frags)
    # Same pod grammar as `train`: run one `evaluate` per host with
    # coordinator=/num_processes=/process_id= and the test set is scored
    # track-sharded across hosts (process 0 prints the aggregate table).
    _maybe_init_pod(jax, opts)
    _dataset_eval(jax, cfg, opts, opts.get("checkpoint"),
                  subset=opts.get("subset", "test"),
                  output_path=opts.get("output_path", cfg.estimates_path))


def cmd_prepare_data(args):
    from waveunet_tpu.config import config_from_cli
    from waveunet_tpu.data import cache
    from waveunet_tpu.ops import shapes

    cfg_frags, _ = _split_args(args)
    cfg = config_from_cli(cfg_frags)
    cache.prepare_dataset(cfg, shapes.context_pad(cfg, cfg.num_frames))
    print(f"Cache ready at {cache.cache_dir(cfg)}")


def cmd_profile(args):
    """Capture a jax.profiler trace (xprof/TensorBoard-compatible) of one
    full-song separation — the tracing/profiling subsystem the reference
    lacked (SURVEY.md §5)."""
    _setup_jax()
    import jax
    from waveunet_tpu.config import config_from_cli
    from waveunet_tpu.infer.engine import Separator

    cfg_frags, opts = _split_args(args)
    cfg = config_from_cli(cfg_frags)
    params, model_state = _load_params(cfg, opts.get("checkpoint"),
                                       opts.get("experiment_id", ""),
                                       allow_random=True)
    sep = Separator(cfg, params, model_state=model_state)
    sr = cfg.expected_sr
    seconds = 30.0
    t = np.arange(int(seconds * sr)) / sr
    song = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[:, None]
    if cfg.num_channels == 2:
        song = np.tile(song, [1, 2])
    sep.separate(song, sr)  # compile outside the trace
    out_dir = opts.get("output_path", os.path.join(cfg.log_dir, "profile"))
    with jax.profiler.trace(out_dir):
        sep.separate(song, sr)
    print(f"trace written to {out_dir} (view with TensorBoard/xprof)")


def cmd_warmup(args):
    """Precompile the inference programs for a preset (all standard length
    buckets) into the persistent XLA cache, so serving cold-starts are fast."""
    _setup_jax()
    from waveunet_tpu.config import config_from_cli
    from waveunet_tpu.infer.engine import Separator

    cfg_frags, opts = _split_args(args)
    cfg = config_from_cli(cfg_frags)
    params, model_state = _load_params(cfg, opts.get("checkpoint"),
                                       opts.get("experiment_id", ""),
                                       allow_random=True)
    sep = Separator(cfg, params, model_state=model_state)
    # every (length bucket x pow2 chunk size x H2D mode) program a real song
    # can hit — split-tail batching means tails come in pow2 sizes, not just
    # the full batch
    n = sep.precompile(max_song_s=float(opts.get("max_song_s", 6 * 60.0)),
                       progress=lambda s: print(s, flush=True))
    print(f"warmup complete; {n} programs exercised and persisted to the "
          f"XLA cache")


def cmd_stream(args):
    """Simulate real-time serving: feed an audio file through the streaming
    separator in fixed-size chunks, write stems, report throughput/latency.

      stream <preset> input_path=<audio> [chunk_ms=500] [batch_windows=8]
             [checkpoint=...] [output_path=dir]
    """
    _setup_jax()
    import time

    from waveunet_tpu.config import config_from_cli
    from waveunet_tpu.data.audio_io import load, write_wav
    from waveunet_tpu.infer.streaming import StreamingSeparator

    cfg_frags, opts = _split_args(args)
    cfg = config_from_cli(cfg_frags)
    if "input_path" not in opts:
        print("stream requires input_path=<audio file>", file=sys.stderr)
        sys.exit(2)
    params, model_state = _load_params(cfg, opts.get("checkpoint"),
                                       opts.get("experiment_id", ""),
                                       allow_random=_random_ok(opts))
    audio, _sr = load(opts["input_path"], sr=cfg.expected_sr,
                      mono=cfg.mono_downmix)
    if not cfg.mono_downmix and audio.shape[1] == 1:
        audio = np.tile(audio, [1, 2])
    chunk = max(1, int(float(opts.get("chunk_ms", "500"))
                       * cfg.expected_sr / 1000))
    stream = StreamingSeparator(cfg, params,
                                batch_windows=int(opts.get("batch_windows",
                                                           "8")),
                                model_state=model_state)
    # Warm up every jit program the timed run can hit — the append buckets
    # for the chunk size AND the shorter final piece, the drain-k transient
    # buckets, and a flush — WITHOUT replaying the whole song (that would
    # double the command's wall-clock; the program set is O(1), not O(n)).
    # First compiles cost minutes on the remote compiler and would swamp the
    # reported throughput. (A flush whose ring state buckets differently
    # from the warm flush may still compile one program inside the timed
    # region — rare, pow2-bucketed.)
    warm_pushes = (stream.latency_samples // chunk + 2
                   + stream.batch * stream.out_len // max(chunk, 1))
    warm = np.zeros((chunk, audio.shape[1]), np.float32)
    for _ in range(warm_pushes):
        stream.push(warm)
    tail = audio.shape[0] % chunk
    if tail:
        stream.push(np.zeros((tail, audio.shape[1]), np.float32))
    stream.flush()
    stream.reset()
    outs = {s: [] for s in cfg.source_names}
    t0 = time.perf_counter()
    for i in range(0, audio.shape[0], chunk):
        for s, v in stream.push(audio[i:i + chunk]).items():
            outs[s].append(v)
    for s, v in stream.flush().items():
        outs[s].append(v)
    dt = time.perf_counter() - t0
    seconds = audio.shape[0] / cfg.expected_sr
    print(f"streamed {seconds:.1f} s in {dt:.2f} s "
          f"({seconds / dt:.1f} audio-s/s warm; algorithmic latency "
          f"{stream.latency_samples / cfg.expected_sr * 1000:.0f} ms)")
    folder, fname = os.path.split(opts["input_path"])
    out_dir = opts.get("output_path") or folder or "."
    os.makedirs(out_dir, exist_ok=True)
    for s, v in outs.items():
        path = os.path.join(out_dir, f"{fname}_{s}_stream.wav")
        write_wav(path, np.concatenate(v), cfg.expected_sr)
        print(f"{s}: {path}")


def cmd_convert_checkpoint(args):
    """Convert a reference TF Saver-V2 checkpoint into an Orbax checkpoint:
    convert-checkpoint <preset> checkpoint=<tf ckpt> output_path=<dir>."""
    _setup_jax()
    from waveunet_tpu.config import config_from_cli
    from waveunet_tpu.train import checkpoint as ckpt

    cfg_frags, opts = _split_args(args)
    cfg = config_from_cli(cfg_frags)
    if "checkpoint" not in opts:
        print("convert-checkpoint requires checkpoint=<tf ckpt path>",
              file=sys.stderr)
        sys.exit(2)
    if cfg.network == "unet":
        from waveunet_tpu.compat.tf_checkpoint import load_tf_waveunet
        params, model_state = load_tf_waveunet(opts["checkpoint"], cfg), {}
    else:
        from waveunet_tpu.compat.tf_checkpoint import load_tf_spectrogram
        params, model_state = load_tf_spectrogram(opts["checkpoint"], cfg)
    out_dir = opts.get("output_path", cfg.model_base_dir)
    from waveunet_tpu.train.step import make_train_step
    init_opt, _ = make_train_step(cfg, cfg.init_sup_sep_lr)
    path = ckpt.save_checkpoint(out_dir, "converted", 0, {
        "params": params, "model_state": model_state,
        "opt_state": init_opt(params), "step": 0})
    print(f"converted checkpoint written to {path}")


def cmd_figures(args):
    """Paper figures (`/root/reference/Plot.py`):
    figures results_dir=<eval JSON dir> [output_path=out.pdf]  -> SDR violin
    figures input_path=<audio file> [output_path=out.png]      -> spectrogram
    """
    cfg_frags, opts = _split_args(args)
    if cfg_frags:
        print(f"figures: unknown arguments {cfg_frags} (takes results_dir=, "
              "input_path=, output_path=)", file=sys.stderr)
        sys.exit(2)
    wrote = []
    if "results_dir" in opts:
        from waveunet_tpu.eval.plot import draw_violin_sdr
        wrote.append(draw_violin_sdr(
            opts["results_dir"],
            out_path=opts.get("output_path", "sdr_violin.pdf")))
    if "input_path" in opts:
        _setup_jax()  # draw_spectrogram dispatches an STFT
        from waveunet_tpu.eval.plot import draw_spectrogram
        out = opts.get("output_path") if "results_dir" not in opts else None
        wrote.append(draw_spectrogram(opts["input_path"], out_path=out))
    if not wrote:
        print("figures requires results_dir=<eval JSON dir> (SDR violin) "
              "and/or input_path=<audio file> (spectrogram)", file=sys.stderr)
        sys.exit(2)
    for p in wrote:
        print(f"figure written to {p}")


_COMMANDS = {
    "train": cmd_train,
    "warmup": cmd_warmup,
    "convert-checkpoint": cmd_convert_checkpoint,
    "predict": cmd_predict,
    "stream": cmd_stream,
    "evaluate": cmd_evaluate,
    "prepare-data": cmd_prepare_data,
    "presets": cmd_presets,
    "profile": cmd_profile,
    "figures": cmd_figures,
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in _COMMANDS:
        print(__doc__)
        sys.exit(0 if argv and argv[0] in ("-h", "--help") else 2)
    from waveunet_tpu.config import ConfigError
    try:
        _COMMANDS[argv[0]](_apply_platform(argv[1:]))
    except ConfigError as e:
        # unknown preset / bad override: show the message, not a traceback
        # (catching broad KeyError here masked real bugs as config errors)
        print(f"error: {e}", file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    main()
