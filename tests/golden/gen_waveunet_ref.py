"""Golden generator that EXECUTES the reference's own model code.

Unlike gen_waveunet_tf.py (a TF re-creation of the reference forward, which
could in principle validate its own transcription errors), this script imports
`/root/reference/Models/UnetAudioSeparator.py`, `InterpolationLayer.py`,
`OutputLayer.py` and `Utils.py` **as-is** and runs their graph under
`tf.compat.v1`. The only things we provide are:

  * TF1 *framework* APIs removed in TF 2.21 / Keras 3 (`tf.layers.conv1d`,
    `tf.layers.conv2d[_transpose]`, `tf.layers.dropout`,
    `tf.contrib.layers.batch_norm`, `tf.contrib.signal.*`,
    `tf.image.resize_bilinear`, `tf.get_variable`, `tf.variable_scope`,
    `tf.diag`, `tf.angle`, `tf.log1p`), shimmed with their TF1-documented
    semantics (uniquified default-named variable scopes, kernel/bias variable
    layout) so checkpoint naming matches the published zoo; and
  * a `librosa` stub (reference `Utils.py:3` imports it at module scope but the
    forward path never calls it).

All *model logic* — layer ordering, shape algebra, the interpolation
diag-matmul + transpose/gather interleave, crop math, output layers — runs
from the reference's own source. Weights are overwritten post-init with the
SAME deterministic scheme as gen_waveunet_tf.py / gen_spectro_tf.py, so the
goldens here are directly comparable with the re-created ones (any mismatch
means the re-creation was wrong).

Outputs: tests/golden/waveunet_ref/<case>.npz + <case>/model.ckpt and
tests/golden/spectro_ref/golden.npz + model.ckpt.

Run manually to (re)generate:   python tests/golden/gen_waveunet_ref.py
"""

import os
import sys
import types

os.environ["CUDA_VISIBLE_DEVICES"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"  # pin: auto-select would grab the axon TPU

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from waveunet_tpu.config import get_config  # noqa: E402
from waveunet_tpu.ops import shapes  # noqa: E402

import tensorflow as tf  # noqa: E402

v1 = tf.compat.v1
v1.disable_eager_execution()

REF = os.environ.get("WAVEUNET_REFERENCE", "/root/reference")
OUT_WAVE = os.path.join(os.path.dirname(__file__), "waveunet_ref")
OUT_SPEC = os.path.join(os.path.dirname(__file__), "spectro_ref")


# --------------------------------------------------------------------------
# TF1 framework-API shims (semantics per the TF 1.x documentation; variable
# naming = uniquified default-named scope with kernel/bias, matching the
# reference checkpoint zoo layout described in compat/tf_checkpoint.py).
# --------------------------------------------------------------------------

def _layers_conv1d(inputs, filters, kernel_size, strides=1, activation=None,
                   padding="valid", **_kw):
    with v1.variable_scope(None, default_name="conv1d"):
        cin = int(inputs.shape[-1])
        k = v1.get_variable("kernel",
                            shape=[int(kernel_size), cin, int(filters)],
                            dtype=tf.float32)
        b = v1.get_variable("bias", shape=[int(filters)], dtype=tf.float32,
                            initializer=v1.zeros_initializer())
        y = tf.nn.conv1d(inputs, k, stride=int(strides),
                         padding=padding.upper())
        y = tf.nn.bias_add(y, b)
        return activation(y) if activation is not None else y


def _layers_conv2d(inputs, filters, kernel_size, strides=(1, 1),
                   activation=None, padding="valid", **_kw):
    with v1.variable_scope(None, default_name="conv2d"):
        cin = int(inputs.shape[-1])
        kh, kw = int(kernel_size[0]), int(kernel_size[1])
        k = v1.get_variable("kernel", shape=[kh, kw, cin, int(filters)],
                            dtype=tf.float32)
        b = v1.get_variable("bias", shape=[int(filters)], dtype=tf.float32,
                            initializer=v1.zeros_initializer())
        y = tf.nn.conv2d(inputs, k,
                         strides=[1, int(strides[0]), int(strides[1]), 1],
                         padding=padding.upper())
        y = tf.nn.bias_add(y, b)
        return activation(y) if activation is not None else y


def _layers_conv2d_transpose(inputs, filters, kernel_size, strides=(1, 1),
                             activation=None, padding="valid", **_kw):
    with v1.variable_scope(None, default_name="conv2d_transpose"):
        cin = int(inputs.shape[-1])
        kh, kw = int(kernel_size[0]), int(kernel_size[1])
        sh, sw = int(strides[0]), int(strides[1])
        k = v1.get_variable("kernel", shape=[kh, kw, int(filters), cin],
                            dtype=tf.float32)
        b = v1.get_variable("bias", shape=[int(filters)], dtype=tf.float32,
                            initializer=v1.zeros_initializer())
        n, h, w = (int(inputs.shape[0]), int(inputs.shape[1]),
                   int(inputs.shape[2]))
        if padding.upper() != "SAME":
            raise NotImplementedError("shim supports SAME only")
        y = tf.nn.conv2d_transpose(
            inputs, k, output_shape=[n, h * sh, w * sw, int(filters)],
            strides=[1, sh, sw, 1], padding="SAME")
        y = tf.nn.bias_add(y, b)
        return activation(y) if activation is not None else y


def _layers_dropout(inputs, rate=0.5, training=False, **_kw):
    if not training:
        return inputs
    return tf.nn.dropout(inputs, rate=rate)


def _contrib_batch_norm(inputs, activation_fn=None, is_training=True,
                        decay=0.999, epsilon=0.001, **_kw):
    # Inference path of tf.contrib.layers.batch_norm defaults
    # (center=True, scale=False): y = (x - mu)/sqrt(var+eps) + beta.
    if is_training:
        raise NotImplementedError("golden generation runs inference mode only")
    with v1.variable_scope(None, default_name="BatchNorm"):
        c = int(inputs.shape[-1])
        beta = v1.get_variable("beta", shape=[c], dtype=tf.float32,
                               initializer=v1.zeros_initializer())
        mean = v1.get_variable("moving_mean", shape=[c], dtype=tf.float32,
                               initializer=v1.zeros_initializer(),
                               trainable=False)
        var = v1.get_variable("moving_variance", shape=[c], dtype=tf.float32,
                              initializer=v1.ones_initializer(),
                              trainable=False)
        y = tf.nn.batch_normalization(inputs, mean, var, offset=beta,
                                      scale=None, variance_epsilon=epsilon)
        return activation_fn(y) if activation_fn is not None else y


def install_tf1_shims():
    tf.layers = types.SimpleNamespace(
        conv1d=_layers_conv1d, conv2d=_layers_conv2d,
        conv2d_transpose=_layers_conv2d_transpose, dropout=_layers_dropout)
    tf.get_variable = v1.get_variable
    tf.variable_scope = v1.variable_scope
    tf.trainable_variables = v1.trainable_variables
    tf.diag = v1.diag
    tf.angle = tf.math.angle
    tf.log1p = tf.math.log1p
    tf.image.resize_bilinear = v1.image.resize_bilinear
    tf.contrib = types.SimpleNamespace(
        signal=types.SimpleNamespace(
            stft=tf.signal.stft,
            inverse_stft=tf.signal.inverse_stft,
            inverse_stft_window_fn=tf.signal.inverse_stft_window_fn),
        layers=types.SimpleNamespace(batch_norm=_contrib_batch_norm))

    # `from tensorflow.contrib.signal.python.ops import window_ops`
    # (UnetSpectrogramSeparator.py:5) — pre-seed sys.modules for the dotted
    # import chain; window_ops.hann_window == tf.signal.hann_window.
    window_ops = types.ModuleType("tensorflow.contrib.signal.python.ops")
    window_ops.hann_window = tf.signal.hann_window
    chain = {}
    for name in ("tensorflow.contrib", "tensorflow.contrib.signal",
                 "tensorflow.contrib.signal.python"):
        chain[name] = types.ModuleType(name)
    chain["tensorflow.contrib"].signal = chain["tensorflow.contrib.signal"]
    chain["tensorflow.contrib.signal"].python = (
        chain["tensorflow.contrib.signal.python"])
    chain["tensorflow.contrib.signal.python"].ops = window_ops
    window_ops.window_ops = window_ops
    sys.modules.update(chain)
    sys.modules["tensorflow.contrib.signal.python.ops"] = window_ops

    if "librosa" not in sys.modules:  # Utils.py:3 imports it; never called
        sys.modules["librosa"] = types.ModuleType("librosa")


# --------------------------------------------------------------------------
# Deterministic weight assignment — identical scheme to gen_waveunet_tf.py /
# gen_spectro_tf.py so goldens are cross-comparable.
# --------------------------------------------------------------------------

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from initutil import glorot, rnd  # noqa: E402  (shared across generators)


def assign_waveunet_weights(sess, seed0=7):
    """Creation-order assignment matching gen_waveunet_tf.py: kernels and
    interp weights get glorot(seed++) (seed incremented before use), biases
    get zeros."""
    seed = seed0
    for var in v1.global_variables():
        shape = [int(d) for d in var.shape]
        if var.op.name.endswith("/kernel") or "/interp_" in var.op.name:
            seed += 1
            sess.run(var.assign(glorot(shape, seed)))
        elif var.op.name.endswith("/bias"):
            sess.run(var.assign(np.zeros(shape, np.float32)))
        else:
            raise RuntimeError(f"unexpected variable {var.op.name}")


def assign_spectro_weights(sess, seed0=100):
    """Creation-order assignment matching gen_spectro_tf.py's var()/bn()."""
    seed = seed0
    for var in v1.global_variables():
        shape = [int(d) for d in var.shape]
        if var.op.name.endswith("/moving_variance"):
            sess.run(var.assign(1.0 + rnd(shape, seed + 7919, 0.1)))
            seed += 1
        else:
            seed += 1
            sess.run(var.assign(rnd(shape, seed, 0.1)))


# --------------------------------------------------------------------------

CASES = {
    "context_learned_diff_stereo": dict(
        preset="full", num_layers=3, num_frames=512, num_initial_filters=8),
    "same_linear_direct_mono": dict(
        preset="baseline", num_layers=3, num_frames=512,
        num_initial_filters=8),
    "full_44khz_production": dict(preset="full_44KHz", batch=1),
    # the 14-layer small-filter M7 architecture (Config.py:101-110)
    "smallfilter_deep_14": dict(preset="baseline_context_smallfilter_deep",
                                batch=1),
    # M6: 4 sources (bass/drums/other/vocals), difference output -> 3 output
    # convs + reconstructed last source (Config.py:112-122, OutputLayer.py:11)
    "multi_instrument_4src": dict(preset="full_multi_instrument", num_layers=3,
                                  num_frames=512, num_initial_filters=8),
    # even conv widths, SAME mode: the reference's own graph is the oracle
    # for the dilate lowering's asymmetric pads
    "same_evenfilter_mono": dict(
        preset="baseline", num_layers=3, num_frames=512, filter_size=16,
        merge_filter_size=6, num_initial_filters=6),
}


def model_config_dict(cfg):
    """Reference model_config keys consumed by UnetAudioSeparator.__init__
    (`UnetAudioSeparator.py:15-32`)."""
    return {
        "num_layers": cfg.num_layers,
        "num_initial_filters": cfg.num_initial_filters,
        "filter_size": cfg.filter_size,
        "merge_filter_size": cfg.merge_filter_size,
        "input_filter_size": cfg.input_filter_size,
        "output_filter_size": cfg.output_filter_size,
        "upsampling": cfg.upsampling,
        "output_type": cfg.output_type,
        "context": cfg.context,
        "source_names": list(cfg.source_names),
        "mono_downmix": cfg.mono_downmix,
        "output_activation": cfg.output_activation,
    }


def gen_waveunet():
    import Models.UnetAudioSeparator

    os.makedirs(OUT_WAVE, exist_ok=True)
    for case, kw in CASES.items():
        kw = dict(kw)
        preset = kw.pop("preset")
        batch = kw.pop("batch", 2)
        cfg = get_config(preset, **kw)

        sep = Models.UnetAudioSeparator.UnetAudioSeparator(
            model_config_dict(cfg))
        in_sh, out_sh = sep.get_padding(
            np.array([batch, cfg.num_frames, cfg.num_channels]))
        ours = shapes.get_padding(cfg, cfg.num_frames)
        assert (int(in_sh[1]), int(out_sh[1])) == ours, (
            case, in_sh, out_sh, ours)

        rng = np.random.default_rng(42)
        mix_np = (0.4 * rng.standard_normal(
            (batch, int(in_sh[1]), cfg.num_channels))).astype(np.float32)

        v1.reset_default_graph()
        mix = v1.placeholder(tf.float32, mix_np.shape)
        outs = sep.get_output(mix, training=False, return_spectrogram=False,
                              reuse=False)
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            assign_waveunet_weights(sess)
            res = sess.run(outs, feed_dict={mix: mix_np})
            ckpt_dir = os.path.join(OUT_WAVE, case)
            os.makedirs(ckpt_dir, exist_ok=True)
            v1.train.Saver().save(sess, os.path.join(ckpt_dir, "model.ckpt"))
        np.savez(os.path.join(OUT_WAVE, f"{case}.npz"), mix=mix_np,
                 **{f"out_{k}": v for k, v in res.items()})
        print(f"[ref] {case}: in {mix_np.shape} -> "
              f"{ {k: v.shape for k, v in res.items()} }")


def gen_spectrogram():
    import Models.UnetSpectrogramSeparator

    os.makedirs(OUT_SPEC, exist_ok=True)
    cfg = get_config("unet_spectrogram", num_layers=3,
                     num_frames=768 * 15 + 1024, batch_size=1,
                     num_initial_filters=8)
    sep = Models.UnetSpectrogramSeparator.UnetSpectrogramSeparator(
        model_config_dict(cfg))
    rng = np.random.default_rng(3)
    mix_np = (0.3 * rng.standard_normal(
        (1, cfg.num_frames, 1))).astype(np.float32)

    v1.reset_default_graph()
    mix = v1.placeholder(tf.float32, mix_np.shape)
    outs = sep.get_output(mix, training=False, return_spectrogram=False,
                          reuse=False)
    # U7a's L1-magnitude loss consumes the return_spectrogram branch
    # (`UnetSpectrogramSeparator.py:94-95`, `Training.py:55-62`); same
    # variables (reuse=True), second head.
    mags = sep.get_output(mix, training=False, return_spectrogram=True,
                          reuse=True)
    with v1.Session() as sess:
        sess.run(v1.global_variables_initializer())
        assign_spectro_weights(sess)
        res = sess.run(outs, feed_dict={mix: mix_np})
        res_m = sess.run(mags, feed_dict={mix: mix_np})
        v1.train.Saver().save(sess, os.path.join(OUT_SPEC, "model.ckpt"))
    np.savez(os.path.join(OUT_SPEC, "golden.npz"), mix=mix_np,
             **{f"out_{k}": v for k, v in res.items()},
             **{f"mag_{k}": v for k, v in res_m.items()})
    print("[ref] spectro golden:", {k: v.shape for k, v in res.items()},
          {k: v.shape for k, v in res_m.items()})


def main():
    install_tf1_shims()
    sys.path.insert(0, REF)
    gen_waveunet()
    gen_spectrogram()


if __name__ == "__main__":
    main()
