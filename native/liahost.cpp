// liahost — native host-side runtime for the LIA-TPU framework.
//
// TPU-native counterpart of the reference's C/C++ host pieces: the CXL NUMA
// allocator (lia/cxl/numa_alloc.c) and the weight pre-/re-packing machinery in
// csrc/cpu (TPPGEMM weight blocking, WOQ packing in
// csrc/cpu/jit/cpu/kernels/LinearWoqPacked.cpp). On a TPU-VM there is no NUMA
// tiering to manage — the host-side hot spots are instead:
//   * synthesizing dummy weights at 30B..175B scale (FlexGen-style generator,
//     examples/.../utils/opt-weight-gen.py) — single-threaded numpy is minutes;
//   * f32→bf16 casting when ingesting checkpoints;
//   * weight-only INT8/INT4 quantization (group-wise symmetric) at load time;
//   * wide multi-threaded memcpy into staging buffers for host→HBM streaming.
// All loops are OpenMP-parallel and vectorize under -O3 -march=native.
//
// Exposed via a plain C ABI consumed by ctypes (lia_tpu/native/__init__.py).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// bf16 helpers
// ---------------------------------------------------------------------------

static inline uint16_t f32_to_bf16(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  // round-to-nearest-even on the truncated mantissa
  uint32_t rounding = 0x7FFF + ((x >> 16) & 1);
  return static_cast<uint16_t>((x + rounding) >> 16);
}

void cast_f32_to_bf16(const float* src, uint16_t* dst, int64_t n) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) dst[i] = f32_to_bf16(src[i]);
}

// ---------------------------------------------------------------------------
// Fast normal(0, scale) dummy weights straight into bf16.
// xoshiro256** per-thread streams + Box-Muller; quality is ample for
// dummy-weight benchmarking (parity: opt-weight-gen.py random checkpoints).
// ---------------------------------------------------------------------------

struct Xo256 {
  uint64_t s[4];
  static inline uint64_t rotl(uint64_t x, int k) { return (x << k) | (x >> (64 - k)); }
  explicit Xo256(uint64_t seed) {
    // splitmix64 init
    for (int i = 0; i < 4; ++i) {
      seed += 0x9E3779B97f4A7C15ULL;
      uint64_t z = seed;
      z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
      z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
      s[i] = z ^ (z >> 31);
    }
  }
  inline uint64_t next() {
    uint64_t result = rotl(s[1] * 5, 7) * 9;
    uint64_t t = s[1] << 17;
    s[2] ^= s[0]; s[3] ^= s[1]; s[1] ^= s[2]; s[0] ^= s[3];
    s[2] ^= t; s[3] = rotl(s[3], 45);
    return result;
  }
  inline float uniform() {  // (0, 1]
    return static_cast<float>((next() >> 11) + 1) * 0x1.0p-53f;
  }
};

void randn_bf16(uint16_t* dst, int64_t n, uint64_t seed, float scale) {
#pragma omp parallel
  {
#if defined(_OPENMP)
    int tid = omp_get_thread_num();
    int nth = omp_get_num_threads();
#else
    int tid = 0, nth = 1;
#endif
    int64_t chunk = (n + nth - 1) / nth;
    int64_t lo = tid * chunk, hi = std::min(n, lo + chunk);
    Xo256 rng(seed * 0x9E3779B97f4A7C15ULL + tid + 1);
    for (int64_t i = lo; i + 1 < hi; i += 2) {
      float u1 = rng.uniform(), u2 = rng.uniform();
      float r = std::sqrt(-2.0f * std::log(u1)) * scale;
      float a = 6.28318530718f * u2;
      dst[i] = f32_to_bf16(r * std::cos(a));
      dst[i + 1] = f32_to_bf16(r * std::sin(a));
    }
    if (((hi - lo) & 1) && hi > lo) {
      float u1 = rng.uniform(), u2 = rng.uniform();
      dst[hi - 1] = f32_to_bf16(std::sqrt(-2.0f * std::log(u1)) * scale *
                                std::cos(6.28318530718f * u2));
    }
  }
}

// Dummy weights straight into group-quantized INT8 — lets 30B/175B dummy models
// materialize directly in their quantized form with no f32 transient. Values are
// uniform int8 (8 per RNG call); scales are set so the dequantized std equals
// `scale` (uniform[-127,127] has std 127/sqrt(3)). Distribution shape is
// irrelevant for dummy-weight benchmarking; magnitude realism is what matters.
void randn_int8(int8_t* q, float* scales, int64_t rows, int64_t cols,
                int64_t group, uint64_t seed, float scale) {
  int64_t ngroups = rows / group;
  int64_t n = rows * cols;
  float s_val = scale * 1.7320508f / 127.0f;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < ngroups * cols; ++i) scales[i] = s_val;
#pragma omp parallel
  {
#if defined(_OPENMP)
    int tid = omp_get_thread_num();
    int nth = omp_get_num_threads();
#else
    int tid = 0, nth = 1;
#endif
    int64_t chunk = ((n + nth - 1) / nth + 7) & ~int64_t(7);
    int64_t lo = tid * chunk, hi = std::min(n, lo + chunk);
    Xo256 rng(seed * 0x9E3779B97f4A7C15ULL + tid + 1);
    int64_t i = lo;
    for (; i + 8 <= hi; i += 8) {
      uint64_t bits = rng.next();
      for (int b = 0; b < 8; ++b) {
        int v = static_cast<int>((bits >> (8 * b)) & 0xFF) - 128;
        q[i + b] = static_cast<int8_t>(v == -128 ? -127 : v);
      }
    }
    for (; i < hi; ++i) {
      int v = static_cast<int>(rng.next() & 0xFF) - 128;
      q[i] = static_cast<int8_t>(v == -128 ? -127 : v);
    }
  }
}

// Dummy weights straight into packed-int4 form (two uniform nibbles per byte).
void randn_int4(uint8_t* packed, float* scales, int64_t rows, int64_t cols,
                int64_t group, uint64_t seed, float scale) {
  int64_t ngroups = rows / group;
  int64_t n = (rows / 2) * cols;  // packed bytes
  // uniform nibbles in [-7,7] biased to [1,15]: std of uniform{-7..7} = sqrt(56/3)
  float s_val = scale / 4.3205f;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < ngroups * cols; ++i) scales[i] = s_val;
#pragma omp parallel
  {
#if defined(_OPENMP)
    int tid = omp_get_thread_num();
    int nth = omp_get_num_threads();
#else
    int tid = 0, nth = 1;
#endif
    int64_t chunk = ((n + nth - 1) / nth + 7) & ~int64_t(7);
    int64_t lo = tid * chunk, hi = std::min(n, lo + chunk);
    Xo256 rng(seed * 0x9E3779B97f4A7C15ULL + tid + 1);
    int64_t i = lo;
    auto nib = [](uint32_t bits) -> uint8_t {
      // value in [0,14] -> biased nibble [1,15] (centered at 8 => q-8 in [-7,7])
      return static_cast<uint8_t>((bits % 15) + 1);
    };
    for (; i + 8 <= hi; i += 8) {
      uint64_t b = rng.next();
      for (int k = 0; k < 8; ++k) {
        uint32_t byte_bits = static_cast<uint32_t>((b >> (8 * k)) & 0xFF);
        packed[i + k] = static_cast<uint8_t>(nib(byte_bits & 0xF) |
                                             (nib(byte_bits >> 4) << 4));
      }
    }
    for (; i < hi; ++i) {
      uint32_t b = static_cast<uint32_t>(rng.next() & 0xFF);
      packed[i] = static_cast<uint8_t>(nib(b & 0xF) | (nib(b >> 4) << 4));
    }
  }
}

// ---------------------------------------------------------------------------
// Group-wise symmetric INT8/INT4 quantization (WOQ load-time path).
// w: [rows, cols] f32 (row = input channel). scales: [rows/group, cols].
// ---------------------------------------------------------------------------

void quantize_int8(const float* w, int8_t* q, float* scales,
                   int64_t rows, int64_t cols, int64_t group) {
  int64_t ngroups = rows / group;
#pragma omp parallel for schedule(static)
  for (int64_t gc = 0; gc < ngroups * cols; ++gc) {
    int64_t g = gc / cols, c = gc % cols;
    float amax = 0.f;
    for (int64_t r = g * group; r < (g + 1) * group; ++r)
      amax = std::max(amax, std::fabs(w[r * cols + c]));
    float s = std::max(amax / 127.0f, 1e-8f);
    scales[g * cols + c] = s;
    float inv = 1.0f / s;
    for (int64_t r = g * group; r < (g + 1) * group; ++r) {
      float qv = std::nearbyint(w[r * cols + c] * inv);
      q[r * cols + c] = static_cast<int8_t>(std::max(-128.0f, std::min(127.0f, qv)));
    }
  }
}

// INT4: biased nibbles packed two-per-byte with a HALF-SPLIT per group —
// byte r of group G holds (lo=row r, hi=row r+group/2), so unpacking is a
// concat, not an interleave. packed: [rows/2, cols].
// GLOBAL half-split packing: byte r holds (lo = row r, hi = row rows/2 + r).
// Matches quant.quantize_weight / the two-matmul Pallas dequant kernel.
void quantize_int4(const float* w, uint8_t* packed, float* scales,
                   int64_t rows, int64_t cols, int64_t group) {
  int64_t ngroups = rows / group;
  int64_t half = rows / 2;
#pragma omp parallel for schedule(static)
  for (int64_t gc = 0; gc < ngroups * cols; ++gc) {
    int64_t g = gc / cols, c = gc % cols;
    float amax = 0.f;
    for (int64_t r = g * group; r < (g + 1) * group; ++r)
      amax = std::max(amax, std::fabs(w[r * cols + c]));
    float s = std::max(amax / 7.0f, 1e-8f);
    scales[g * cols + c] = s;
  }
#pragma omp parallel for schedule(static)
  for (int64_t rc = 0; rc < half * cols; ++rc) {
    int64_t r = rc / cols, c = rc % cols;
    auto nib = [&](int64_t rr) -> uint8_t {
      float inv = 1.0f / scales[(rr / group) * cols + c];
      float qv = std::nearbyint(w[rr * cols + c] * inv);
      qv = std::max(-8.0f, std::min(7.0f, qv));
      return static_cast<uint8_t>(static_cast<int>(qv) + 8);
    };
    packed[r * cols + c] =
        static_cast<uint8_t>(nib(r) & 0xF) |
        static_cast<uint8_t>(nib(half + r) << 4);
  }
}

// ---------------------------------------------------------------------------
// Wide multi-threaded memcpy (staging-buffer fills for host→HBM streaming).
// ---------------------------------------------------------------------------

void memcpy_mt(void* dst, const void* src, int64_t n) {
  const int64_t CHUNK = 8 << 20;
  int64_t nchunks = (n + CHUNK - 1) / CHUNK;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < nchunks; ++i) {
    int64_t off = i * CHUNK;
    std::memcpy(static_cast<char*>(dst) + off,
                static_cast<const char*>(src) + off,
                std::min(CHUNK, n - off));
  }
}

int liahost_version() { return 1; }

}  // extern "C"
