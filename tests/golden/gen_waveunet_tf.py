"""Golden-fixture generator: a TF re-creation of the reference Wave-U-Net forward.

Builds (in TF 2.x compat.v1, CPU, isolated process) a Wave-U-Net with variables
named exactly like the reference's checkpoint zoo layout
(see waveunet_tpu/compat/tf_checkpoint.py), runs it on a fixed random input in
inference mode, and writes:
  * a TF Saver-V2 checkpoint  (tests/golden/waveunet_tf/<case>/model.ckpt)
  * input + per-source golden outputs (tests/golden/waveunet_tf/<case>.npz)

The forward math follows the reference spec (`Models/UnetAudioSeparator.py:85-144`,
`Models/InterpolationLayer.py:4-40`, `Models/OutputLayer.py:5-23`, `Utils.py`):
conv1d+LeakyReLU / decimate / bilinear-or-learned x2 upsample / crop_and_concat /
direct-or-difference output with tanh or clip. Run manually to (re)generate:

    python tests/golden/gen_waveunet_tf.py
"""

import os
import sys

os.environ["CUDA_VISIBLE_DEVICES"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"  # pin: auto-select would grab the axon TPU

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from waveunet_tpu.config import get_config  # noqa: E402
from waveunet_tpu.ops import shapes  # noqa: E402

import tensorflow as tf  # noqa: E402

v1 = tf.compat.v1
v1.disable_eager_execution()

OUT_DIR = os.path.join(os.path.dirname(__file__), "waveunet_tf")

CASES = {
    # exercises: valid convs, learned interp, difference output, stereo
    "context_learned_diff_stereo": dict(
        preset="full", num_layers=3, num_frames=512, num_initial_filters=8),
    # exercises: same padding, bilinear 2n upsample, direct tanh output, mono
    "same_linear_direct_mono": dict(
        preset="baseline", num_layers=3, num_frames=512,
        num_initial_filters=8),
    # production scale: the full M5-HighSR architecture (12 layers, 24 init
    # filters, 16384-frame window -> input 147443) at batch 1
    "full_44khz_production": dict(preset="full_44KHz", batch=1),
    # EVEN conv widths in SAME mode: pins the dilate decimation lowering's
    # asymmetric (2*lo, 2*hi) pads against TF's own SAME conv + [::2] slice
    "same_evenfilter_mono": dict(
        preset="baseline", num_layers=3, num_frames=512, filter_size=16,
        merge_filter_size=6, num_initial_filters=6),
}


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from initutil import glorot  # noqa: E402  (shared with gen_waveunet_ref.py)


def build(cfg, mix, seed0=7):
    """TF graph of the reference forward (inference mode). Returns out dict."""
    L = cfg.num_layers
    pad = "VALID" if cfg.context else "SAME"
    counter = [0]
    seed = [seed0]

    def conv1d(x, n_out, width, act):
        n = counter[0]
        counter[0] += 1
        name = "separator/conv1d" if n == 0 else f"separator/conv1d_{n}"
        cin = int(x.shape[-1])
        seed[0] += 1
        k = v1.get_variable(name + "/kernel",
                            initializer=glorot([width, cin, n_out], seed[0]))
        b = v1.get_variable(name + "/bias",
                            initializer=np.zeros([n_out], np.float32))
        y = tf.nn.conv1d(x, k, stride=1, padding=pad) + b
        return act(y) if act else y

    def lrelu(x):
        return tf.maximum(0.2 * x, x)

    def crop_to(x, n):
        diff = int(x.shape[1]) - n
        if diff == 0:
            return x
        lo = diff // 2
        return x[:, lo:lo + n, :]

    skips = []
    cur = mix
    for i in range(L):
        cur = conv1d(cur, cfg.num_initial_filters * (i + 1), cfg.filter_size,
                     lrelu)
        skips.append(cur)
        cur = cur[:, ::2, :]
    cur = conv1d(cur, cfg.num_initial_filters * (L + 1), cfg.filter_size, lrelu)

    for i in range(L):
        n = int(cur.shape[1])
        if cfg.upsampling == "learned":
            f = int(cur.shape[-1])
            seed[0] += 1
            w = v1.get_variable(f"separator/interp_{i}",
                                initializer=glorot([f], seed[0]))
            ws = tf.sigmoid(w)
            mids = ws * cur[:, :-1, :] + (1.0 - ws) * cur[:, 1:, :]
            if cfg.context:  # valid: 2n-1
                inter = tf.reshape(
                    tf.stack([cur[:, :-1, :], mids], axis=2),
                    [tf.shape(cur)[0], 2 * (n - 1), f])
                cur = tf.concat([inter, cur[:, -1:, :]], axis=1)
            else:  # same: 2n, last interpolant pairs with zero pad
                odds = tf.concat([mids, ws * cur[:, -1:, :]], axis=1)
                cur = tf.reshape(tf.stack([cur, odds], axis=2),
                                 [tf.shape(cur)[0], 2 * n, f])
        else:
            x4 = tf.expand_dims(cur, axis=1)
            if cfg.context:
                up = v1.image.resize_bilinear(x4, [1, 2 * n - 1],
                                              align_corners=True)
            else:
                up = v1.image.resize_bilinear(x4, [1, 2 * n])
            cur = tf.squeeze(up, axis=1)
        skip = skips[-i - 1]
        cur = tf.concat([crop_to(skip, int(cur.shape[1])), cur], axis=2)
        cur = conv1d(cur, cfg.num_initial_filters * (L - i),
                     cfg.merge_filter_size, lrelu)

    cur = tf.concat([crop_to(mix, int(cur.shape[1])), cur], axis=2)

    def out_act(x):
        if cfg.output_activation == "tanh":
            return tf.tanh(x)
        return tf.clip_by_value(x, -1.0, 1.0)  # inference-mode AudioClip

    outputs = {}
    if cfg.output_type == "direct":
        for name in cfg.source_names:
            outputs[name] = conv1d(cur, cfg.num_channels,
                                   cfg.output_filter_size, out_act)
    else:
        acc = None
        for name in cfg.source_names[:-1]:
            y = conv1d(cur, cfg.num_channels, cfg.output_filter_size, out_act)
            outputs[name] = y
            acc = y if acc is None else acc + y
        last = crop_to(mix, int(acc.shape[1])) - acc
        outputs[cfg.source_names[-1]] = tf.clip_by_value(last, -1.0, 1.0)
    return outputs


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    for case, kw in CASES.items():
        kw = dict(kw)  # keep CASES reusable (kw.pop mutated the module dict)
        preset = kw.pop("preset")
        batch = kw.pop("batch", 2)
        cfg = get_config(preset, **kw)
        in_len, out_len = shapes.get_padding(cfg, cfg.num_frames)
        rng = np.random.default_rng(42)
        mix_np = (0.4 * rng.standard_normal(
            (batch, in_len, cfg.num_channels))).astype(np.float32)

        v1.reset_default_graph()
        mix = v1.placeholder(tf.float32, mix_np.shape)
        outs = build(cfg, mix)
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            res = sess.run(outs, feed_dict={mix: mix_np})
            ckpt_dir = os.path.join(OUT_DIR, case)
            os.makedirs(ckpt_dir, exist_ok=True)
            v1.train.Saver().save(sess, os.path.join(ckpt_dir, "model.ckpt"))
        np.savez(os.path.join(OUT_DIR, f"{case}.npz"), mix=mix_np,
                 **{f"out_{k}": v for k, v in res.items()})
        print(f"{case}: in {mix_np.shape} -> "
              f"{ {k: v.shape for k, v in res.items()} }")


if __name__ == "__main__":
    main()
