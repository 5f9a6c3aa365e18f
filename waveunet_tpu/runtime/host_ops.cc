// Native host-side data ops for the waveunet_tpu pipeline.
//
// The reference's native muscle lives in third-party C libraries (libsndfile
// decode, librosa/scipy resampling — SURVEY.md §C21); this file is the
// first-party C++ equivalent for the host side of the TPU pipeline:
//
//   * wav_decode_pcm16 : PCM16 WAV payload -> float32 interleaved frames
//   * quantize_int16   : float32 -> int16 wire format for H2D transfers
//   * resample_poly    : Kaiser-windowed polyphase SRC (taps supplied by the
//                        Python side so host/device filters stay identical)
//   * gather_windows   : strided snippet/window extraction into a batch buffer
//
// Compiled as a plain shared library (no Python headers) and bound with
// ctypes (waveunet_tpu/runtime/native.py). All buffers are caller-allocated.

#include <cstdint>
#include <cstring>
#include <cmath>

extern "C" {

// PCM16 little-endian interleaved -> float32 in [-1, 1). Returns frame count.
long wav_decode_pcm16(const int16_t* src, long n_samples, float* dst) {
  constexpr float kScale = 1.0f / 32768.0f;
  for (long i = 0; i < n_samples; ++i) dst[i] = src[i] * kScale;
  return n_samples;
}

// float32 -> int16 with clipping and round-half-away (matches numpy round +
// clip used on the wire path closely enough for PCM-derived audio).
void quantize_int16(const float* src, long n, int16_t* dst) {
  for (long i = 0; i < n; ++i) {
    float v = src[i];
    if (v > 1.0f) v = 1.0f;
    if (v < -1.0f) v = -1.0f;
    float s = v * 32767.0f;
    dst[i] = (int16_t)(s >= 0.0f ? s + 0.5f : s - 0.5f);
  }
}

// Polyphase resampling: y[m] = sum_k taps[m*q - k*p + half] * x[k], evaluated
// per output sample over the contributing input range. x is [n_in, ch]
// interleaved; y is [n_out, ch] interleaved (caller sizes it as
// ceil(n_in * p / q) frames). Matches waveunet_tpu.ops.resample exactly when
// given the same taps/half.
void resample_poly(const float* x, long n_in, int ch, const double* taps,
                   long n_taps, long half, long p, long q, float* y,
                   long n_out) {
  for (long m = 0; m < n_out; ++m) {
    const long mq = m * q;
    // contributing k: taps index t = mq - k*p + half in [0, n_taps)
    long k_lo = (mq + half - (n_taps - 1) + p - 1) / p;  // ceil
    if (k_lo < 0) k_lo = 0;
    long k_hi = (mq + half) / p;  // floor
    if (k_hi >= n_in) k_hi = n_in - 1;
    for (int c = 0; c < ch; ++c) {
      double acc = 0.0;
      for (long k = k_lo; k <= k_hi; ++k) {
        const long t = mq - k * p + half;
        acc += taps[t] * (double)x[k * ch + c];
      }
      y[m * ch + c] = (float)acc;
    }
  }
}

// Gather fixed-length windows at given start frames from [n, ch] interleaved
// audio into a [n_win, win_len, ch] batch buffer.
void gather_windows(const float* x, long n, int ch, const long* starts,
                    long n_win, long win_len, float* out) {
  const long row_bytes = (long)win_len * ch * (long)sizeof(float);
  for (long w = 0; w < n_win; ++w) {
    const long s = starts[w];
    std::memcpy(out + w * win_len * ch, x + s * ch, row_bytes);
  }
  (void)n;
}

}  // extern "C"
