"""Golden generator: TF re-creation of the reference spectrogram U-Net forward.

Builds the U7 architecture (`UnetSpectrogramSeparator.py:40-108`) in TF with the
reference checkpoint's variable naming (tf.layers/contrib auto-names: conv2d_N,
conv2d_transpose_N, BatchNorm_N with beta/moving_mean/moving_variance), runs an
inference-mode forward (BN uses moving stats), and writes checkpoint + golden
audio outputs. Run: python tests/golden/gen_spectro_tf.py
"""

import os
import sys

os.environ["CUDA_VISIBLE_DEVICES"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"  # pin: auto-select would grab the axon TPU

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from waveunet_tpu.config import get_config  # noqa: E402

import tensorflow as tf  # noqa: E402

v1 = tf.compat.v1
v1.disable_eager_execution()

OUT_DIR = os.path.join(os.path.dirname(__file__), "spectro_tf")
L = 3
CFG = get_config("unet_spectrogram", num_layers=L,
                 num_frames=768 * 15 + 1024, batch_size=1,
                 num_initial_filters=8)


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from initutil import rnd  # noqa: E402  (shared across generators)


def build(mix):
    counters = {"conv2d": 0, "conv2d_transpose": 0, "BatchNorm": 0}
    seed = [100]

    def nm(base):
        n = counters[base]
        counters[base] += 1
        return (f"separator/{base}" if n == 0 else f"separator/{base}_{n}")

    def var(name, shape, scale=0.1):
        seed[0] += 1
        return v1.get_variable(name, initializer=rnd(shape, seed[0], scale))

    def conv2d(x, out_ch):
        name = nm("conv2d")
        k = var(name + "/kernel", [5, 5, int(x.shape[-1]), out_ch])
        b = var(name + "/bias", [out_ch])
        return tf.nn.conv2d(x, k, strides=[1, 2, 2, 1], padding="SAME") + b

    def conv2d_t(x, out_ch):
        name = nm("conv2d_transpose")
        k = var(name + "/kernel", [5, 5, out_ch, int(x.shape[-1])])
        b = var(name + "/bias", [out_ch])
        shp = [int(x.shape[0]), int(x.shape[1]) * 2, int(x.shape[2]) * 2,
               out_ch]
        return tf.nn.conv2d_transpose(x, k, output_shape=shp,
                                      strides=[1, 2, 2, 1],
                                      padding="SAME") + b

    def bn(x, act):
        name = nm("BatchNorm")
        c = int(x.shape[-1])
        beta = var(name + "/beta", [c])
        mean = var(name + "/moving_mean", [c])
        variance = v1.get_variable(
            name + "/moving_variance",
            initializer=(1.0 + rnd([c], seed[0] + 7919, 0.1)))
        seed[0] += 1
        y = tf.nn.batch_normalization(x, mean, variance, offset=beta,
                                      scale=None, variance_epsilon=0.001)
        return act(y)

    window = tf.signal.hann_window
    stfts = tf.signal.stft(tf.squeeze(mix, 2), frame_length=1024,
                           frame_step=768, fft_length=1024, window_fn=window)
    mix_mag = tf.abs(stfts)
    mix_angle = tf.math.angle(stfts)
    x0 = tf.math.log1p(mix_mag)[..., None][:, :, :-1, :]

    out = {}
    for s in CFG.source_names:
        cur = x0
        skips = []
        for i in range(L):
            cur = conv2d(cur, CFG.num_initial_filters * (2 ** i))
            cur = bn(cur, lambda y: tf.maximum(0.2 * y, y))
            if i < L - 1:
                skips.append(cur)
        for i in range(L - 1):
            cur = conv2d_t(cur, CFG.num_initial_filters * (2 ** (L - i - 2)))
            cur = bn(cur, tf.nn.relu)
            cur = tf.concat([skips[-i - 1], cur], axis=3)
            # dropout inactive at inference
        mask = tf.sigmoid(conv2d_t(cur, 1))
        mask = tf.pad(mask, [(0, 0), (0, 0), (0, 1), (0, 0)],
                      constant_values=0.5)
        mask = tf.squeeze(mask, 3)
        src_mag = mix_mag * mask
        stft_est = tf.multiply(tf.complex(src_mag, 0.0),
                               tf.exp(tf.complex(0.0, mix_angle)))
        inv_win = tf.signal.inverse_stft_window_fn(768,
                                                   forward_window_fn=window)
        audio = tf.signal.inverse_stft(stft_est, 1024, 768, 1024,
                                       window_fn=inv_win)
        out[s] = audio[..., None]
    return out


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    rng = np.random.default_rng(3)
    mix_np = (0.3 * rng.standard_normal(
        (1, CFG.num_frames, 1))).astype(np.float32)
    v1.reset_default_graph()
    mix = v1.placeholder(tf.float32, mix_np.shape)
    outs = build(mix)
    with v1.Session() as sess:
        sess.run(v1.global_variables_initializer())
        res = sess.run(outs, feed_dict={mix: mix_np})
        v1.train.Saver().save(sess, os.path.join(OUT_DIR, "model.ckpt"))
    np.savez(os.path.join(OUT_DIR, "golden.npz"), mix=mix_np,
             **{f"out_{k}": v for k, v in res.items()})
    print("spectro golden:", {k: v.shape for k, v in res.items()})


if __name__ == "__main__":
    main()
