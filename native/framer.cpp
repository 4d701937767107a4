// Native audio feature frontend for the streaming runtime.
//
// The reference framework consumes pre-computed feature frames and leaves
// feature extraction to "librosa (optional)" (reference
// __init__.py:432-454); its streaming processor's host-side loop is pure
// Python. For production serving the hot host-side path — raw PCM in,
// batched log-mel frames out — should not pay interpreter overhead, so
// this small C++ library implements it natively:
//
//   * lock-free single-producer/single-consumer sample ring buffer,
//   * pre-emphasis + Hann window framing,
//   * radix-2 iterative FFT (no external deps),
//   * mel filterbank projection + log compression.
//
// Exposed through a minimal C ABI consumed from Python via ctypes
// (pytorch_hmm_tpu/native.py). No Python.h dependency.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr float kPi = 3.14159265358979323846f;

struct Complex {
  float re;
  float im;
};

// Precomputed twiddle tables, one per FFT stage (table lookup instead
// of the serial w = w*wl recurrence: the inner butterflies become
// independent and auto-vectorize under -ffast-math).
struct FftPlan {
  std::vector<std::vector<Complex>> tw;  // tw[s][k], stage len = 2<<s
  explicit FftPlan(size_t n) {
    for (size_t len = 2; len <= n; len <<= 1) {
      std::vector<Complex> t(len / 2);
      const float ang = -2.0f * kPi / static_cast<float>(len);
      for (size_t k = 0; k < len / 2; ++k) {
        t[k] = {std::cos(ang * k), std::sin(ang * k)};
      }
      tw.push_back(std::move(t));
    }
  }
};

// In-place iterative radix-2 Cooley-Tukey FFT. n must be a power of two.
void fft(std::vector<Complex>& a, const FftPlan& plan) {
  const size_t n = a.size();
  // Bit-reversal permutation.
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  size_t stage = 0;
  for (size_t len = 2; len <= n; len <<= 1, ++stage) {
    const Complex* t = plan.tw[stage].data();
    for (size_t i = 0; i < n; i += len) {
      Complex* lo = &a[i];
      Complex* hi = &a[i + len / 2];
      for (size_t k = 0; k < len / 2; ++k) {
        const Complex u = lo[k];
        const Complex v{hi[k].re * t[k].re - hi[k].im * t[k].im,
                        hi[k].re * t[k].im + hi[k].im * t[k].re};
        lo[k] = {u.re + v.re, u.im + v.im};
        hi[k] = {u.re - v.re, u.im - v.im};
      }
    }
  }
}

float hz_to_mel(float hz) { return 2595.0f * std::log10(1.0f + hz / 700.0f); }
float mel_to_hz(float mel) {
  return 700.0f * (std::pow(10.0f, mel / 2595.0f) - 1.0f);
}

struct Framer {
  int sample_rate;
  int n_fft;       // power of two
  int frame_len;   // analysis window (<= n_fft)
  int hop;
  int n_mels;
  float preemph;

  // Classic lock-free SPSC ring: head/tail are MONOTONIC counters
  // (ring index = counter % capacity). The producer owns head, the
  // consumer owns tail; each side only LOADS the other's counter, with
  // acquire/release ordering so the sample writes are visible before
  // the head bump (and reads complete before the tail bump). ctypes
  // releases the GIL during foreign calls, so push from an audio thread
  // and pop from the processing thread may genuinely race.
  std::vector<float> ring;              // sample ring buffer
  std::atomic<uint64_t> head{0};        // write counter (producer-owned)
  std::atomic<uint64_t> tail{0};        // read counter (consumer-owned)
  float prev_sample = 0.0f;   // pre-emphasis carry (consumer-owned)

  std::vector<float> window;          // Hann, frame_len
  std::vector<float> mel_weights;     // (n_mels, n_fft/2+1) row-major
  std::vector<int> mel_lo;            // first nonzero bin per mel band
  std::vector<int> mel_hi;            // one past the last nonzero bin
  std::vector<Complex> fft_buf;       // n_fft/2 packed complex samples
  std::vector<Complex> untangle_tw;   // e^{-2pi i k / n_fft}, k<=n_fft/4
  std::vector<float> power_buf;       // n_fft/2+1, per-frame scratch
  FftPlan fft_plan;

  Framer(int sr, int nfft, int flen, int h, int nm, float pre,
         size_t capacity)
      : sample_rate(sr),
        n_fft(nfft),
        frame_len(flen),
        hop(h),
        n_mels(nm),
        preemph(pre),
        ring(capacity),
        window(flen),
        fft_buf(nfft / 2),
        untangle_tw(nfft / 4 + 1),
        power_buf(static_cast<size_t>(nfft) / 2 + 1),
        fft_plan(static_cast<size_t>(nfft) / 2) {
    for (int k = 0; k <= n_fft / 4; ++k) {
      const float ang = -2.0f * kPi * k / n_fft;
      untangle_tw[k] = {std::cos(ang), std::sin(ang)};
    }
    for (int i = 0; i < flen; ++i) {
      window[i] =
          0.5f - 0.5f * std::cos(2.0f * kPi * i / (flen - 1));
    }
    build_mel();
  }

  void build_mel() {
    const int n_bins = n_fft / 2 + 1;
    mel_weights.assign(static_cast<size_t>(n_mels) * n_bins, 0.0f);
    const float fmin = 0.0f;
    const float fmax = sample_rate / 2.0f;
    const float mmin = hz_to_mel(fmin), mmax = hz_to_mel(fmax);
    std::vector<float> centers(n_mels + 2);
    for (int m = 0; m < n_mels + 2; ++m) {
      centers[m] =
          mel_to_hz(mmin + (mmax - mmin) * m / (n_mels + 1));
    }
    for (int m = 0; m < n_mels; ++m) {
      const float lo = centers[m], mid = centers[m + 1], hi = centers[m + 2];
      for (int b = 0; b < n_bins; ++b) {
        const float f = b * static_cast<float>(sample_rate) / n_fft;
        float w = 0.0f;
        if (f > lo && f < mid) w = (f - lo) / (mid - lo);
        else if (f >= mid && f < hi) w = (hi - f) / (hi - mid);
        mel_weights[static_cast<size_t>(m) * n_bins + b] = w;
      }
      // Nonzero band range (triangular filters are sparse: ~n_bins/n_mels
      // active bins per band, so the per-frame mel loop touches ~2 x
      // n_bins MACs total instead of n_mels x n_bins).
      int first = 0;
      while (first < n_bins &&
             mel_weights[static_cast<size_t>(m) * n_bins + first] == 0.0f)
        ++first;
      int last = n_bins;
      while (last > first &&
             mel_weights[static_cast<size_t>(m) * n_bins + last - 1] ==
                 0.0f)
        --last;
      mel_lo.push_back(first);
      mel_hi.push_back(last);
    }
  }

  size_t capacity() const { return ring.size(); }

  // Consumer-side view (exact); producer-side free_space is conservative
  // (the consumer can only make more room, never less).
  size_t available() const {
    return static_cast<size_t>(head.load(std::memory_order_acquire) -
                               tail.load(std::memory_order_acquire));
  }

  size_t push(const float* samples, size_t n) {
    const uint64_t h = head.load(std::memory_order_relaxed);
    const uint64_t t = tail.load(std::memory_order_acquire);
    const size_t free_space = capacity() - static_cast<size_t>(h - t);
    const size_t take = n < free_space ? n : free_space;
    for (size_t i = 0; i < take; ++i) {
      ring[static_cast<size_t>((h + i) % capacity())] = samples[i];
    }
    head.store(h + take, std::memory_order_release);
    return take;
  }

  bool frame_ready() const {
    return available() >= static_cast<size_t>(frame_len);
  }

  // Extract one log-mel frame into out[n_mels]; consumes `hop` samples.
  bool pop_frame(float* out) {
    const uint64_t t = tail.load(std::memory_order_relaxed);
    const uint64_t h = head.load(std::memory_order_acquire);
    if (static_cast<size_t>(h - t) < static_cast<size_t>(frame_len)) {
      return false;
    }
    // Gather frame_len samples (non-destructive beyond hop), packing
    // even samples into re and odd into im: a real n_fft-point
    // transform becomes ONE n_fft/2-point complex FFT plus an
    // untangling pass (halves the butterfly work).
    const int half = n_fft / 2;
    for (int i = 0; i < half; ++i) fft_buf[i] = {0.0f, 0.0f};
    float prev = prev_sample;
    for (int i = 0; i < frame_len; ++i) {
      const float s = ring[static_cast<size_t>((t + i) % capacity())];
      const float e = (s - preemph * prev) * window[i];
      prev = s;
      if (i & 1) fft_buf[i >> 1].im = e;
      else       fft_buf[i >> 1].re = e;
    }
    // Pre-emphasis carry advances by `hop` samples.
    prev_sample =
        hop >= 1 ? ring[static_cast<size_t>((t + hop - 1) % capacity())]
                 : prev_sample;
    fft(fft_buf, fft_plan);
    const int n_bins = n_fft / 2 + 1;
    // Untangle Z[k] = FFT(even + i*odd) into the real spectrum's power:
    // E[k] = (Z[k] + conj(Z[-k]))/2, O[k] = (Z[k] - conj(Z[-k]))/(2i),
    // X[k] = E[k] + w^k O[k], power_buf[k] = |X[k]|^2. Symmetry gives
    // X[half - k] from the same pair, so one sweep fills all bins.
    {
      const Complex z0 = fft_buf[0];
      const float x0 = z0.re + z0.im;      // X[0] (real)
      const float xh = z0.re - z0.im;      // X[half] would be E0-O0 ...
      power_buf[0] = x0 * x0;
      // X at Nyquist of the FULL transform (bin half = n_fft/2):
      power_buf[half] = xh * xh;
      for (int k = 1; k <= half / 2; ++k) {
        const Complex a = fft_buf[k];
        const Complex b = fft_buf[half - k];  // Z[-k] index
        const float er = 0.5f * (a.re + b.re);
        const float ei = 0.5f * (a.im - b.im);
        const float orr = 0.5f * (a.im + b.im);   // O[k].re
        const float oi = -0.5f * (a.re - b.re);   // O[k].im
        const Complex w = untangle_tw[k];
        const float wr = w.re * orr - w.im * oi;
        const float wi = w.re * oi + w.im * orr;
        const float xr = er + wr, xi = ei + wi;
        power_buf[k] = xr * xr + xi * xi;
        // X[half - k] = conj(E[k]) + w^{half-k} O'[...]: use the real-
        // input symmetry X[n_fft - m] = conj(X[m]) on the m = half + k
        // bin via E,O of index half-k: equivalently
        // X[half - k] = E'[k] - i-twiddle pair:
        if (k != half - k) {
          const float xr2 = er - wr, xi2 = -ei + wi;
          power_buf[half - k] = xr2 * xr2 + xi2 * xi2;
        }
      }
    }
    for (int m = 0; m < n_mels; ++m) {
      float acc = 1e-10f;
      const float* w = &mel_weights[static_cast<size_t>(m) * n_bins];
      for (int b = mel_lo[m]; b < mel_hi[m]; ++b) {
        acc += w[b] * power_buf[b];
      }
      out[m] = std::log(acc);
    }
    tail.store(t + hop, std::memory_order_release);
    return true;
  }
};

}  // namespace

extern "C" {

void* framer_create(int sample_rate, int n_fft, int frame_len, int hop,
                    int n_mels, float preemph, int capacity) {
  if (n_fft <= 0 || (n_fft & (n_fft - 1)) != 0) return nullptr;
  if (frame_len > n_fft || hop <= 0 || n_mels <= 0) return nullptr;
  return new Framer(sample_rate, n_fft, frame_len, hop, n_mels, preemph,
                    static_cast<size_t>(capacity));
}

void framer_destroy(void* h) { delete static_cast<Framer*>(h); }

// Returns number of samples accepted (may be < n when the ring is full).
int64_t framer_push(void* h, const float* samples, int64_t n) {
  return static_cast<int64_t>(
      static_cast<Framer*>(h)->push(samples, static_cast<size_t>(n)));
}

// Pops up to max_frames log-mel frames into out (max_frames, n_mels).
// Returns the number of frames produced.
int64_t framer_pop(void* h, float* out, int64_t max_frames) {
  Framer* f = static_cast<Framer*>(h);
  int64_t produced = 0;
  while (produced < max_frames && f->pop_frame(out + produced * f->n_mels)) {
    ++produced;
  }
  return produced;
}

int64_t framer_available_samples(void* h) {
  return static_cast<int64_t>(static_cast<Framer*>(h)->available());
}

int framer_n_mels(void* h) { return static_cast<Framer*>(h)->n_mels; }

}  // extern "C"
