// Native host-side weight quantization (TPU-native analog of the reference's
// CPU-side load-time quantization, ref: fastdm/utils/quantization.py called
// from QLinear.weight_loading_and_quant).
//
// Why native: checkpoint tensors arrive as bf16/f32 on the host; quantizing
// BEFORE the host->device transfer cuts tunnel traffic 2-4x for a 12B model,
// and the per-output-channel absmax/round/colsum loop is memory-bound C++
// that threads trivially. Exposed via a plain C ABI for ctypes (no pybind11
// in this image).
//
// Layout contract: checkpoint Linear weights are row-major (out, in) = (n, k).
// Per-output-channel symmetric int8 quantization reduces over k, i.e. over
// each contiguous row: scale[n] = absmax(row)/127, q = round(w/scale),
// colsum[n] = sum_k q (the azp_adj of doc/introduction.md:38-42).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

inline float bf16_to_f32(uint16_t v) {
    uint32_t bits = static_cast<uint32_t>(v) << 16;
    float out;
    std::memcpy(&out, &bits, sizeof(out));
    return out;
}

inline uint16_t f32_to_bf16(float f) {
    uint32_t bits;
    std::memcpy(&bits, &f, sizeof(bits));
    // round-to-nearest-even on the truncated mantissa
    uint32_t lsb = (bits >> 16) & 1u;
    bits += 0x7fffu + lsb;
    return static_cast<uint16_t>(bits >> 16);
}

template <typename Load>
void quantize_rows(Load load, int64_t n, int64_t k, int8_t* q, float* scale,
                   int32_t* colsum, int nthreads) {
    nthreads = std::max(1, nthreads);
    std::vector<std::thread> pool;
    std::atomic<int64_t>* cursor = new std::atomic<int64_t>(0);
    auto work = [&]() {
        for (;;) {
            int64_t row = cursor->fetch_add(1);
            if (row >= n) break;
            const int64_t off = row * k;
            float amax = 1e-12f;
            for (int64_t i = 0; i < k; ++i) {
                amax = std::max(amax, std::fabs(load(off + i)));
            }
            const float s = amax / 127.0f;
            const float inv = 1.0f / s;
            int32_t sum = 0;
            int8_t* qr = q + off;
            for (int64_t i = 0; i < k; ++i) {
                float v = load(off + i) * inv;
                int32_t r = static_cast<int32_t>(std::lrintf(v));
                r = std::min(127, std::max(-128, r));
                qr[i] = static_cast<int8_t>(r);
                sum += r;
            }
            scale[row] = s;
            colsum[row] = sum;
        }
    };
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(work);
    for (auto& th : pool) th.join();
    delete cursor;
}

}  // namespace

extern "C" {

// w: (n, k) row-major bf16 (as uint16). Outputs: q (n, k) int8, scale (n,)
// f32, colsum (n,) int32.
void quantize_int8_percol_bf16(const uint16_t* w, int64_t n, int64_t k,
                               int8_t* q, float* scale, int32_t* colsum,
                               int nthreads) {
    quantize_rows([w](int64_t i) { return bf16_to_f32(w[i]); }, n, k, q, scale,
                  colsum, nthreads);
}

void quantize_int8_percol_f32(const float* w, int64_t n, int64_t k, int8_t* q,
                              float* scale, int32_t* colsum, int nthreads) {
    quantize_rows([w](int64_t i) { return w[i]; }, n, k, q, scale, colsum,
                  nthreads);
}

// fp8 e4m3fn per-output-channel quantization; out as raw uint8 bit pattern.
void quantize_fp8_percol_bf16(const uint16_t* w, int64_t n, int64_t k,
                              uint8_t* q, float* scale, int nthreads) {
    nthreads = std::max(1, nthreads);
    std::vector<std::thread> pool;
    std::atomic<int64_t>* cursor = new std::atomic<int64_t>(0);
    auto work = [&]() {
        for (;;) {
            int64_t row = cursor->fetch_add(1);
            if (row >= n) break;
            const int64_t off = row * k;
            float amax = 1e-12f;
            for (int64_t i = 0; i < k; ++i)
                amax = std::max(amax, std::fabs(bf16_to_f32(w[off + i])));
            const float s = amax / 448.0f;
            const float inv = 1.0f / s;
            for (int64_t i = 0; i < k; ++i) {
                float v = bf16_to_f32(w[off + i]) * inv;
                v = std::min(448.0f, std::max(-448.0f, v));
                // e4m3fn encode: sign, exponent bias 7, 3 mantissa bits
                uint32_t bits;
                std::memcpy(&bits, &v, sizeof(bits));
                uint8_t sign = (bits >> 24) & 0x80u;
                int32_t exp = static_cast<int32_t>((bits >> 23) & 0xffu) - 127;
                uint32_t man = bits & 0x7fffffu;
                uint8_t out;
                if (v == 0.0f || exp < -9) {
                    out = sign;  // zero / underflow
                } else if (exp < -6) {
                    // subnormal e4m3: value = man * 2^-9
                    int shift = -6 - exp;
                    uint32_t m = (man | 0x800000u) >> (20 + shift);
                    out = sign | static_cast<uint8_t>(m & 0x7u);
                } else {
                    uint32_t m = man >> 20;           // top 3 bits
                    uint32_t round = (man >> 19) & 1; // round-to-nearest
                    m += round;
                    int32_t e = exp + 7;
                    if (m == 8) { m = 0; e += 1; }
                    if (e >= 16) { e = 15; m = 6; }   // clamp to 448 (e4m3fn max)
                    out = sign | static_cast<uint8_t>((e << 3) | (m & 0x7u));
                }
                q[off + i] = out;
            }
            scale[row] = s;
        }
    };
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(work);
    for (auto& th : pool) th.join();
    delete cursor;
}

// bf16 -> f32 bulk convert (checkpoint readers)
void bf16_to_f32_buf(const uint16_t* in, float* out, int64_t count, int nthreads) {
    nthreads = std::max(1, nthreads);
    std::vector<std::thread> pool;
    int64_t chunk = (count + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; ++t) {
        int64_t lo = t * chunk, hi = std::min(count, lo + chunk);
        pool.emplace_back([=]() {
            for (int64_t i = lo; i < hi; ++i) out[i] = bf16_to_f32(in[i]);
        });
    }
    for (auto& th : pool) th.join();
}

}  // extern "C"
