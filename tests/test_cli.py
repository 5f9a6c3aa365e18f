"""CLI surface tests (subprocess, CPU): presets, prepare-data, train, predict."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_ENV_SNIPPET = (
    "import jax; jax.config.update('jax_platforms', 'cpu'); "
    "import waveunet_tpu.cli as c; c.main({argv!r})")


def _run_cli(argv, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    code = _ENV_SNIPPET.format(argv=argv)
    return subprocess.run([sys.executable, "-c", code], cwd=cwd,
                          capture_output=True, text=True, timeout=500, env=env)


def test_presets_cmd(tmp_path):
    r = _run_cli(["presets"], str(tmp_path))
    assert r.returncode == 0
    assert "full_44KHz" in r.stdout and "unet_spectrogram" in r.stdout


def test_prepare_train_predict_workflow(tmp_path):
    """The user workflow end to end through the CLI: prepare-data on a WAV
    dataset, train one epoch, predict a file with the written checkpoint."""
    from waveunet_tpu.data.audio_io import write_wav

    sr = 8192
    db = tmp_path / "db"
    for part in ("train", "test"):
        for i in range(2):
            d = db / part / f"s{i}"
            d.mkdir(parents=True)
            n = sr * 2
            t = np.arange(n) / sr
            v = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[:, None]
            a = (0.3 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)[:, None]
            write_wav(str(d / "vocals.wav"), v, sr)
            write_wav(str(d / "accompaniment.wav"), a, sr)
            write_wav(str(d / "mixture.wav"), v + a, sr)

    common = ["baseline", "num_layers=2", "num_frames=256",
              "num_initial_filters=4", "expected_sr=8192", "batch_size=2",
              "epoch_it=3", "num_snippets_per_track=4", "cache_size=8",
              "worse_epochs=1", f"musdb_path={db}",
              f"data_path={tmp_path / 'cache'}",
              f"model_base_dir={tmp_path / 'ckpts'}",
              f"log_dir={tmp_path / 'logs'}"]

    r = _run_cli(["prepare-data"] + common, str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "cache").exists()

    r = _run_cli(["train"] + common + ["max_epochs=1",
                                       "experiment_id=clitest"], str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Best model" in r.stdout
    ckpts = os.listdir(tmp_path / "ckpts" / "clitest")
    assert any(c.startswith("step_") for c in ckpts)
    best = sorted(ckpts)[-1]

    mix_path = tmp_path / "mix.wav"
    t = np.arange(sr) / sr
    write_wav(str(mix_path),
              (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)[:, None],
              sr)
    r = _run_cli(["predict"] + common + [
        f"input_path={mix_path}",
        f"checkpoint={tmp_path / 'ckpts' / 'clitest' / best}",
        f"output_path={tmp_path / 'out'}"], str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "out" / "mix.wav_vocals.wav").exists()
    assert (tmp_path / "out" / "mix.wav_accompaniment.wav").exists()


def test_warmup_and_profile_cmds(tmp_path):
    """warmup + profile subcommands run end to end on a tiny config."""
    common = ["baseline", "num_layers=2", "num_frames=256",
              "num_initial_filters=4", "expected_sr=8192",
              f"log_dir={tmp_path / 'logs'}"]
    r = _run_cli(["warmup"] + common, str(tmp_path))
    assert r.returncode == 0, r.stderr[-1500:]
    assert "warmup complete" in r.stdout

    r = _run_cli(["profile"] + common
                 + [f"output_path={tmp_path / 'prof'}"], str(tmp_path))
    assert r.returncode == 0, r.stderr[-1500:]
    assert (tmp_path / "prof").exists()


def test_stream_cmd(tmp_path):
    """The serving surface through the CLI: chunked streaming separation of a
    WAV writes one stem per source at full input length."""
    from waveunet_tpu.data.audio_io import load, write_wav

    sr = 22050
    n = sr * 2
    t = np.arange(n) / sr
    mix = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)[:, None]
    src = tmp_path / "song.wav"
    write_wav(str(src), mix, sr)

    r = _run_cli(["stream", "baseline", "num_layers=3", "num_frames=1024",
                  "num_initial_filters=8", f"input_path={src}",
                  "chunk_ms=250", "batch_windows=4",
                  f"output_path={tmp_path}"], str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "audio-s/s" in r.stdout and "latency" in r.stdout
    for s in ("vocals", "accompaniment"):
        out, osr = load(str(tmp_path / f"song.wav_{s}_stream.wav"), sr=None,
                        mono=False)
        assert osr == sr and out.shape[0] == n


def test_warmup_cmd(tmp_path):
    """warmup precompiles every chunk program (pow2 tails x H2D modes)."""
    r = _run_cli(["warmup", "baseline", "num_layers=2", "num_frames=256",
                  "num_initial_filters=4", "infer_batch=4", "max_song_s=5"],
                 str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "programs exercised" in r.stdout
