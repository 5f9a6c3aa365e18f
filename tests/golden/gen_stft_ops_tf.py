"""Golden-fixture generator for stft_tf.npz and spectro_ops_tf.npz.

These two fixtures previously existed only as committed binaries ("computed
in an isolated TF process") with no checked-in generator — unregenerable if
the framing constants or the fixture files changed (round-2 review finding).

Reuses the EXISTING npz inputs when present (so regeneration reproduces the
committed outputs exactly and doubles as a verification run — any output
mismatch against the stored arrays is reported); draws fresh seeded inputs
otherwise. Run manually in an isolated process (TF in-process fights the
TPU tunnel):

    python tests/golden/gen_stft_ops_tf.py
"""

import os
import sys

os.environ["CUDA_VISIBLE_DEVICES"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"  # pin: auto-select would grab the axon TPU

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from initutil import glorot, rnd  # noqa: E402

import tensorflow as tf  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
FRAME, HOP = 1024, 768


def _load_inputs(path, keys):
    if os.path.exists(path):
        z = np.load(path)
        return {k: z[k] for k in keys}, {k: z[k] for k in z.files
                                         if k not in keys}
    return None, None


def _report(name, old, new, atol=0.0):
    if old is None:
        return
    err = float(np.max(np.abs(np.asarray(new) - old)))
    status = "OK" if err <= atol else "MISMATCH"
    print(f"  {name}: max |new - stored| = {err:.2e} [{status}]")


def gen_stft():
    path = os.path.join(HERE, "stft_tf.npz")
    inputs, stored = _load_inputs(path, ["x"])
    x = inputs["x"] if inputs else rnd((2, 6400), seed=11, scale=0.5)

    # Reference semantics: frame 1024 / hop 768, periodic Hann, no centering
    # (`UnetSpectrogramSeparator.py:49-54`); inverse uses the least-squares
    # synthesis window (`:100-106`).
    spec = tf.signal.stft(tf.constant(x), frame_length=FRAME, frame_step=HOP,
                          fft_length=FRAME)
    audio = tf.signal.inverse_stft(
        spec, frame_length=FRAME, frame_step=HOP, fft_length=FRAME,
        window_fn=tf.signal.inverse_stft_window_fn(HOP))
    spec, audio = spec.numpy(), audio.numpy()
    if stored:
        _report("spec", stored.get("spec"), spec, atol=1e-5)
        _report("audio", stored.get("audio"), audio, atol=1e-6)
    np.savez(path, x=x, spec=spec, audio=audio)
    print(f"wrote {path}")


def gen_spectro_ops():
    path = os.path.join(HERE, "spectro_ops_tf.npz")
    in_keys = ["x", "k", "b", "kt", "bt", "beta", "mean", "var"]
    inputs, stored = _load_inputs(path, in_keys)
    if inputs is None:
        inputs = {
            "x": rnd((2, 16, 32, 6), seed=21),
            "k": glorot((5, 5, 6, 12), seed=22),
            "b": rnd((12,), seed=23),
            "kt": glorot((5, 5, 10, 6), seed=24),  # TF layout [h, w, out, in]
            "bt": rnd((10,), seed=25),
            "beta": rnd((6,), seed=26),
            "mean": rnd((6,), seed=27),
            "var": np.abs(rnd((6,), seed=28)) + 0.5,
        }
    x = tf.constant(inputs["x"])

    # The exact primitives the reference's U7 relies on
    # (`UnetSpectrogramSeparator.py:70,79,86` + tf.contrib.layers.batch_norm
    # eval-mode normalisation with eps 0.001, center only).
    y_conv = tf.nn.conv2d(x, inputs["k"], strides=[1, 2, 2, 1],
                          padding="SAME") + inputs["b"]
    b_, h, w, _ = inputs["x"].shape
    out_ch = inputs["kt"].shape[2]
    y_tr = tf.nn.conv2d_transpose(
        x, inputs["kt"], output_shape=[b_, 2 * h, 2 * w, out_ch],
        strides=[1, 2, 2, 1], padding="SAME") + inputs["bt"]
    y_bn = tf.nn.batch_normalization(x, inputs["mean"], inputs["var"],
                                     inputs["beta"], None, 0.001)
    y_conv, y_tr, y_bn = y_conv.numpy(), y_tr.numpy(), y_bn.numpy()
    if stored:
        _report("y_conv", stored.get("y_conv"), y_conv, atol=1e-6)
        _report("y_tr", stored.get("y_tr"), y_tr, atol=1e-6)
        _report("y_bn", stored.get("y_bn"), y_bn, atol=1e-6)
    np.savez(path, **inputs, y_conv=y_conv, y_tr=y_tr, y_bn=y_bn)
    print(f"wrote {path}")


if __name__ == "__main__":
    gen_stft()
    gen_spectro_ops()
