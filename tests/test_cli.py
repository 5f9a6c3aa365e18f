"""CLI integration tests: every subcommand driven through ``cli.main`` on
tiny configs — the user surface the reference exposed via sacred
(`/root/reference/Training.py:152-166`, `Predict.py:14-17`). The pod variant
of ``train`` is covered separately by
tests/test_parallel.py::test_pod_two_process_cli_train (real 2-process run).
"""

import json
import os

import numpy as np
import pytest

from waveunet_tpu import cli
from waveunet_tpu.config import get_config
from waveunet_tpu.data.audio_io import load, write_wav

_SR = 8192
_CFG_ARGS = ["num_layers=2", "num_frames=256", "num_initial_filters=4",
             f"expected_sr={_SR}", "batch_size=4", "epoch_it=2",
             "num_snippets_per_track=4", "cache_size=8", "worse_epochs=1"]


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    """One shared environment: synthetic cache + musdb-layout db + a
    checkpoint trained through the REAL `cli train` command."""
    from tests.test_integration import _make_cache

    root = tmp_path_factory.mktemp("cli")
    kw = dict(num_layers=2, num_frames=256, num_initial_filters=4,
              expected_sr=_SR, batch_size=4, epoch_it=2,
              num_snippets_per_track=4, cache_size=8, worse_epochs=1,
              data_path=str(root / "cache"), musdb_path=str(root / "db"))
    cfg = get_config("baseline", **kw)
    _make_cache(root, cfg, n_songs=3)

    d = root / "db" / "test" / "songC"
    d.mkdir(parents=True)
    n = _SR * 2
    t = np.arange(n) / _SR
    voc = (0.3 * np.sin(2 * np.pi * 440 * t))[:, None].astype(np.float32)
    acc = (0.3 * np.sin(2 * np.pi * 220 * t))[:, None].astype(np.float32)
    write_wav(str(d / "vocals.wav"), voc, _SR)
    write_wav(str(d / "accompaniment.wav"), acc, _SR)
    write_wav(str(d / "mixture.wav"), np.clip(voc + acc, -1, 1), _SR)

    args = (_CFG_ARGS
            + [f"data_path={root / 'cache'}", f"musdb_path={root / 'db'}",
               f"model_base_dir={root / 'ckpts'}", f"log_dir={root / 'logs'}"])
    cli.main(["train", "baseline"] + args
             + ["experiment_id=clitest", "max_epochs=1"])
    best = open(root / "ckpts" / "clitest" / "best.txt").read().strip()
    assert os.path.isdir(best)
    return {"root": root, "args": args, "best": best}


def test_presets_lists_all(capsys):
    cli.main(["presets"])
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 11  # the reference's 11 named configs
    assert any(ln.startswith("full_44KHz") for ln in lines)


def test_no_command_exits_2():
    with pytest.raises(SystemExit) as e:
        cli.main([])
    assert e.value.code == 2


def test_unknown_preset_is_config_error(capsys):
    with pytest.raises(SystemExit) as e:
        cli.main(["train", "nonesuch_preset"])
    assert e.value.code == 2
    assert "error:" in capsys.readouterr().err


def test_predict_requires_input_path():
    with pytest.raises(SystemExit) as e:
        cli.main(["predict", "baseline"])
    assert e.value.code == 2


def test_train_wrote_checkpoint_and_metrics(cli_env):
    root = cli_env["root"]
    assert os.path.exists(root / "logs" / "clitest" / "metrics.jsonl")
    assert os.path.exists(root / "logs" / "clitest" / "config.json")


def test_predict_cli(cli_env, tmp_path):
    root = cli_env["root"]
    mix = str(root / "db" / "test" / "songC" / "mixture.wav")
    cli.main(["predict", "baseline"] + cli_env["args"]
             + [f"input_path={mix}", f"checkpoint={cli_env['best']}",
                f"output_path={tmp_path}"])
    n = load(mix, sr=None, mono=False)[0].shape[0]
    for s in ("vocals", "accompaniment"):
        y, sr = load(str(tmp_path / f"mixture.wav_{s}.wav"), sr=None,
                     mono=False)
        assert sr == _SR and y.shape[0] == n


def test_predict_cli_checkpoint_auto(cli_env, tmp_path, capsys):
    """checkpoint=auto resolves the newest trained step dir — with an
    experiment_id, and without one (newest across all experiments)."""
    root = cli_env["root"]
    mix = str(root / "db" / "test" / "songC" / "mixture.wav")
    for extra in (["experiment_id=clitest"], []):
        cli.main(["predict", "baseline"] + cli_env["args"]
                 + [f"input_path={mix}", "checkpoint=auto",
                    f"output_path={tmp_path}"] + extra)
        out = capsys.readouterr().out
        assert "checkpoint=auto -> " in out
        assert str(root / "ckpts" / "clitest") in out
    n = load(mix, sr=None, mono=False)[0].shape[0]
    y, sr = load(str(tmp_path / "mixture.wav_vocals.wav"), sr=None,
                 mono=False)
    assert sr == _SR and y.shape[0] == n


def test_predict_checkpoint_auto_empty_is_error(cli_env, tmp_path):
    """A dangling checkpoint=auto must error out, not separate with random
    weights."""
    root = cli_env["root"]
    mix = str(root / "db" / "test" / "songC" / "mixture.wav")
    with pytest.raises(SystemExit) as e:
        cli.main(["predict", "baseline"] + cli_env["args"]
                 + [f"input_path={mix}", "checkpoint=auto",
                    f"model_base_dir={tmp_path / 'nothing'}"])
    assert e.value.code == 2


def test_predict_cli_checkpoint_best(cli_env, tmp_path, capsys):
    """checkpoint=best resolves the best-validation checkpoint the train
    driver recorded in best.txt — NOT the newest step dir: with early
    stopping the newest sat through worse_epochs validation regressions
    (the reference tests best_model_path, Training.py:88-90,161). A
    dangling best (no best.txt) is an error like a dangling auto."""
    root = cli_env["root"]
    mix = str(root / "db" / "test" / "songC" / "mixture.wav")
    for extra in (["experiment_id=clitest"], []):
        cli.main(["predict", "baseline"] + cli_env["args"]
                 + [f"input_path={mix}", "checkpoint=best",
                    f"output_path={tmp_path}"] + extra)
        out = capsys.readouterr().out
        assert f"checkpoint=best -> {cli_env['best']}" in out
    with pytest.raises(SystemExit) as e:
        cli.main(["predict", "baseline"] + cli_env["args"]
                 + [f"input_path={mix}", "checkpoint=best",
                    f"model_base_dir={tmp_path / 'nothing'}"])
    assert e.value.code == 2


def test_no_checkpoint_is_error_unless_random_init(cli_env, tmp_path, capsys):
    """predict/evaluate/stream with NO checkpoint must fail fast (scoring
    random weights masquerades as a catastrophically bad model); random_init=1
    is the explicit escape hatch."""
    root = cli_env["root"]
    mix = str(root / "db" / "test" / "songC" / "mixture.wav")
    for cmd, extra in (("predict", [f"input_path={mix}"]),
                       ("evaluate", ["subset=test"]),
                       ("stream", [f"input_path={mix}"])):
        with pytest.raises(SystemExit) as e:
            cli.main([cmd, "baseline"] + cli_env["args"] + extra
                     + [f"output_path={tmp_path}"])
        assert e.value.code == 2
        assert "no checkpoint given" in capsys.readouterr().err
    # escape hatch: separates (badly) but runs
    cli.main(["predict", "baseline"] + cli_env["args"]
             + [f"input_path={mix}", "random_init=1",
                f"output_path={tmp_path}"])
    assert "WARNING: no checkpoint" in capsys.readouterr().out


def test_evaluate_cli(cli_env, tmp_path):
    cli.main(["evaluate", "baseline"] + cli_env["args"]
             + [f"checkpoint={cli_env['best']}", "subset=test",
                f"output_path={tmp_path}", "max_tracks=1"])
    p = tmp_path / "test" / "songC.json"
    assert p.exists()
    rec = json.loads(open(p).read())
    names = {t["name"] for t in rec["targets"]}
    assert names == {"vocals", "accompaniment"}


def test_stream_cli(cli_env, tmp_path):
    root = cli_env["root"]
    mix = str(root / "db" / "test" / "songC" / "mixture.wav")
    cli.main(["stream", "baseline"] + cli_env["args"]
             + [f"input_path={mix}", f"checkpoint={cli_env['best']}",
                "chunk_ms=100", "batch_windows=2",
                f"output_path={tmp_path}"])
    n = load(mix, sr=None, mono=False)[0].shape[0]
    for s in ("vocals", "accompaniment"):
        y, sr = load(str(tmp_path / f"mixture.wav_{s}_stream.wav"), sr=None,
                     mono=False)
        assert sr == _SR and y.shape[0] == n


def test_warmup_cli(cli_env, capsys):
    cli.main(["warmup", "baseline"] + cli_env["args"]
             + [f"checkpoint={cli_env['best']}", "max_song_s=2"])
    assert "warmup complete" in capsys.readouterr().out


def test_profile_cli(cli_env, tmp_path):
    cli.main(["profile", "baseline"] + cli_env["args"]
             + [f"checkpoint={cli_env['best']}", f"output_path={tmp_path}"])
    # a jax.profiler trace directory with at least one event file
    found = [os.path.join(dp, f) for dp, _, fs in os.walk(tmp_path)
             for f in fs]
    assert found, "profiler trace wrote no files"


def test_prepare_data_cli(tmp_path, capsys):
    from tests.test_integration import _make_cache

    kw = dict(num_layers=2, num_frames=256, num_initial_filters=4,
              expected_sr=_SR, batch_size=4, epoch_it=2,
              num_snippets_per_track=4, cache_size=8, worse_epochs=1,
              data_path=str(tmp_path / "cache2"),
              musdb_path=str(tmp_path / "db"))
    cfg = get_config("baseline", **kw)
    # _make_cache prepares data_path; prepare-data must rebuild into cache2
    _make_cache(tmp_path, cfg, n_songs=2)
    cli.main(["prepare-data", "baseline"] + _CFG_ARGS
             + [f"data_path={tmp_path / 'cache2'}",
                f"musdb_path={tmp_path / 'db'}"])
    assert "Cache ready" in capsys.readouterr().out


def test_convert_checkpoint_cli(tmp_path, capsys):
    """TF zoo checkpoint -> orbax via the CLI, then predict with it."""
    golden = os.path.join(os.path.dirname(__file__), "golden", "waveunet_tf",
                          "same_linear_direct_mono", "model.ckpt")
    if not os.path.exists(golden + ".index"):
        pytest.skip("golden TF checkpoint missing")
    conv_args = ["num_layers=3", "num_frames=512", "num_initial_filters=8"]
    cli.main(["convert-checkpoint", "baseline"] + conv_args
             + [f"checkpoint={golden}", f"output_path={tmp_path}"])
    out = capsys.readouterr().out
    assert "converted checkpoint written to" in out
    conv = out.strip().splitlines()[-1].split("written to ")[-1]

    sr = get_config("baseline").expected_sr
    mix = (0.1 * np.random.default_rng(0).standard_normal((sr, 1))
           ).astype(np.float32)
    src = str(tmp_path / "m.wav")
    write_wav(src, mix, sr)
    cli.main(["predict", "baseline"] + conv_args
             + [f"input_path={src}", f"checkpoint={conv}",
                f"output_path={tmp_path / 'out'}"])
    y, ysr = load(str(tmp_path / "out" / "m.wav_vocals.wav"), sr=None,
                  mono=False)
    assert ysr == sr and y.shape[0] == mix.shape[0]


def test_platform_fragment_is_consumed(cli_env, tmp_path, capsys):
    """``platform=cpu`` pins the jax backend in-process (env vars are not
    reliable when an accelerator plugin claims the default backend) and must
    be consumed before config parsing — it is not a Config key."""
    import jax

    mix = os.path.join(cli_env["root"], "db", "test", "songC", "mixture.wav")
    cli.main(["predict", "baseline", "platform=cpu"] + cli_env["args"]
             + [f"input_path={mix}", f"checkpoint={cli_env['best']}",
                f"output_path={tmp_path}"])
    assert jax.config.jax_platforms == "cpu"
    assert os.path.exists(os.path.join(tmp_path, "mixture.wav_vocals.wav"))


def test_checkpoint_best_dangling_newest_is_error(cli_env, tmp_path):
    """When the NEWEST experiment's best.txt names a checkpoint dir that is
    gone, checkpoint=best must error — silently falling back to an OLDER
    experiment's best would score the wrong model without a word."""
    import shutil
    import time as _time

    root = cli_env["root"]
    mix = str(root / "db" / "test" / "songC" / "mixture.wav")
    base = tmp_path / "ckpts2"
    # older experiment: a VALID best (copy the trained one)
    old = base / "older"
    old.mkdir(parents=True)
    kept = old / os.path.basename(cli_env["best"])
    shutil.copytree(cli_env["best"], kept)
    (old / "best.txt").write_text(str(kept) + "\n")
    _time.sleep(0.05)
    # newest experiment: best.txt names a pruned/removed dir
    new = base / "newer"
    new.mkdir()
    (new / "best.txt").write_text(str(new / "step_0000000099") + "\n")
    os.utime(new / "best.txt")  # strictly newer marker

    with pytest.raises(SystemExit) as e:
        cli.main(["predict", "baseline"] + cli_env["args"]
                 + [f"input_path={mix}", "checkpoint=best",
                    f"model_base_dir={base}", f"output_path={tmp_path}"])
    assert e.value.code == 2


def test_figures_cli(cli_env, tmp_path, capsys):
    """`cli figures` renders the reference Plot.py surfaces: SDR violin from
    an eval-results dir and a spectrogram from an audio file."""
    cli.main(["evaluate", "baseline"] + cli_env["args"]
             + [f"checkpoint={cli_env['best']}", "subset=test",
                f"output_path={tmp_path}", "max_tracks=1"])
    mix = str(cli_env["root"] / "db" / "test" / "songC" / "mixture.wav")
    violin = tmp_path / "sdr.png"
    cli.main(["figures", f"results_dir={tmp_path / 'test'}",
              f"output_path={violin}", f"input_path={mix}"])
    out = capsys.readouterr().out
    assert violin.exists() and violin.stat().st_size > 0
    spec = mix.rsplit(".", 1)[0] + "_spec.png"
    assert os.path.exists(spec) and "figure written" in out

    with pytest.raises(SystemExit) as e:
        cli.main(["figures"])
    assert e.value.code == 2

    # Typo'd/unknown key=value fragments must error, not be silently dropped
    # (outputpath= instead of output_path= would otherwise write to the
    # default location with exit 0).
    with pytest.raises(SystemExit) as e:
        cli.main(["figures", f"results_dir={tmp_path / 'test'}",
                  f"outputpath={violin}"])
    assert e.value.code == 2


def test_train_checkpoint_auto_resumes_across_experiments(cli_env, tmp_path,
                                                          capsys):
    """`train checkpoint=auto` WITHOUT experiment_id must find the newest
    checkpoint across all experiments (it used to look for step dirs
    directly under model_base_dir — never a match — and silently start
    fresh; whole-package review finding)."""
    args = [a for a in cli_env["args"]
            if not (a.startswith("model_base_dir=")
                    or a.startswith("log_dir="))]
    args += [f"model_base_dir={tmp_path / 'ckpts'}",
             f"log_dir={tmp_path / 'logs'}"]
    cli.main(["train", "baseline"] + args
             + ["experiment_id=first", "max_epochs=1"])
    capsys.readouterr()
    cli.main(["train", "baseline"] + args
             + ["checkpoint=auto", "max_epochs=1"])
    out = capsys.readouterr().out
    assert "auto-resume: " in out
    assert "fresh start" not in out
    assert os.path.join("ckpts", "first") in out.split(
        "auto-resume: ", 1)[1].splitlines()[0]


def test_zoo_checkpoint_resolver(tmp_path):
    """Predict.py:10 parity: with no checkpoint=, predict falls back to the
    highest-step zoo-layout TF checkpoint under model_base_dir/<preset>/."""
    cfg = get_config("full_44KHz", model_base_dir=str(tmp_path))
    assert cli._resolve_zoo_tf_checkpoint(cfg, "full_44KHz") is None
    d = tmp_path / "full_44KHz"
    d.mkdir()
    for step in (1000, 236118, 5):
        (d / f"full_44KHz-{step}.index").touch()
        (d / f"full_44KHz-{step}.data-00000-of-00001").touch()
    (d / "checkpoint").touch()           # TF bookkeeping file — ignored
    (d / "full_44KHz-bad.index").touch()  # non-integer step — ignored
    got = cli._resolve_zoo_tf_checkpoint(cfg, "full_44KHz")
    assert got == str(d / "full_44KHz-236118")


def test_predict_zoo_default_end_to_end(tmp_path, capsys):
    """predict with NO checkpoint= separates via the zoo TF checkpoint under
    model_base_dir/<preset>/ (Predict.py:10's default) — and an explicit
    ``random_init=0`` behaves like the flag being absent (it previously
    disabled the fallback and then hard-errored)."""
    import shutil

    golden = os.path.join(os.path.dirname(__file__), "golden", "waveunet_tf",
                          "same_linear_direct_mono", "model.ckpt")
    if not os.path.exists(golden + ".index"):
        pytest.skip("golden TF checkpoint missing")
    zoo = tmp_path / "zoo" / "baseline"
    zoo.mkdir(parents=True)
    shutil.copy(golden + ".index", zoo / "baseline-1000.index")
    shutil.copy(golden + ".data-00000-of-00001",
                zoo / "baseline-1000.data-00000-of-00001")

    conv_args = ["num_layers=3", "num_frames=512", "num_initial_filters=8"]
    sr = get_config("baseline").expected_sr
    mix = (0.1 * np.random.default_rng(0).standard_normal((sr, 1))
           ).astype(np.float32)
    src = str(tmp_path / "m.wav")
    write_wav(src, mix, sr)
    for extra in ([], ["random_init=0"]):
        out_dir = tmp_path / ("out_ri0" if extra else "out")
        cli.main(["predict", "baseline"] + conv_args + extra
                 + [f"input_path={src}",
                    f"model_base_dir={tmp_path / 'zoo'}",
                    f"output_path={out_dir}"])
        assert "using zoo checkpoint" in capsys.readouterr().out
        y, ysr = load(str(out_dir / "m.wav_vocals.wav"), sr=None, mono=False)
        assert ysr == sr and y.shape[0] == mix.shape[0]
