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
//
// All entry points return 0 on success, 1 if any input value was NaN/Inf —
// corrupted checkpoints must FAIL the load (the Python wrapper raises), not
// launder the corruption into plausible in-range weights.

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

template <typename Load>
int quantize_rows(Load load, int64_t n, int64_t k, int8_t* q, float* scale,
                  int32_t* colsum, int nthreads) {
    nthreads = std::max(1, nthreads);
    std::vector<std::thread> pool;
    std::atomic<int64_t> cursor(0);
    std::atomic<int> bad(0);
    auto work = [&]() {
        for (;;) {
            int64_t row = cursor.fetch_add(1);
            if (row >= n) break;
            const int64_t off = row * k;
            float amax = 1e-12f;
            for (int64_t i = 0; i < k; ++i) {
                float v = load(off + i);
                if (!std::isfinite(v)) { bad.store(1); }
                amax = std::max(amax, std::fabs(v));
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
    return bad.load();
}

// e4m3fn encode with ROUND-TO-NEAREST-EVEN everywhere (normal, subnormal,
// and the underflow boundary) — bit-matching ml_dtypes' astype(float8_e4m3fn)
// so the native load path and the jnp fallback produce identical weights.
// Input must be pre-clamped to [-448, 448] and finite.
inline uint8_t f32_to_e4m3fn(float v) {
    uint32_t bits;
    std::memcpy(&bits, &v, sizeof(bits));
    uint8_t sign = (bits >> 24) & 0x80u;
    int32_t exp = static_cast<int32_t>((bits >> 23) & 0xffu) - 127;
    uint32_t man = bits & 0x7fffffu;
    if (v == 0.0f || exp < -10) {
        return sign;  // underflow below half the smallest subnormal ulp
    }
    if (exp < -6) {
        // subnormal e4m3: value = m * 2^-9, m in [0, 7]; RNE on the
        // shifted-out significand bits (shift can reach 24 at exp = -10,
        // where only the round bit survives — exact 2^-10 ties to even 0)
        int sh = 20 + (-6 - exp);  // 21..24
        uint32_t full = man | 0x800000u;
        uint32_t m = full >> sh;
        uint32_t rem = full & ((1u << sh) - 1u);
        uint32_t half = 1u << (sh - 1);
        if (rem > half || (rem == half && (m & 1u))) m += 1;
        if (m >= 8) return sign | 0x08u;  // rounds up into the normal range
        return sign | static_cast<uint8_t>(m);
    }
    uint32_t m = man >> 20;               // top 3 mantissa bits
    uint32_t rem = man & 0xfffffu;        // dropped 20 bits
    if (rem > 0x80000u || (rem == 0x80000u && (m & 1u))) m += 1;
    int32_t e = exp + 7;
    if (m == 8) { m = 0; e += 1; }
    if (e >= 16) { e = 15; m = 6; }       // clamp to 448 (e4m3fn max)
    return sign | static_cast<uint8_t>((e << 3) | (m & 0x7u));
}

}  // namespace

extern "C" {

// w: (n, k) row-major bf16 (as uint16). Outputs: q (n, k) int8, scale (n,)
// f32, colsum (n,) int32. Returns 0 ok / 1 nonfinite input.
int quantize_int8_percol_bf16(const uint16_t* w, int64_t n, int64_t k,
                              int8_t* q, float* scale, int32_t* colsum,
                              int nthreads) {
    return quantize_rows([w](int64_t i) { return bf16_to_f32(w[i]); }, n, k, q,
                         scale, colsum, nthreads);
}

int quantize_int8_percol_f32(const float* w, int64_t n, int64_t k, int8_t* q,
                             float* scale, int32_t* colsum, int nthreads) {
    return quantize_rows([w](int64_t i) { return w[i]; }, n, k, q, scale,
                         colsum, nthreads);
}

// fp8 e4m3fn per-output-channel quantization; out as raw uint8 bit pattern.
// Returns 0 ok / 1 nonfinite input.
int quantize_fp8_percol_bf16(const uint16_t* w, int64_t n, int64_t k,
                             uint8_t* q, float* scale, int nthreads) {
    nthreads = std::max(1, nthreads);
    std::vector<std::thread> pool;
    std::atomic<int64_t> cursor(0);
    std::atomic<int> bad(0);
    auto work = [&]() {
        for (;;) {
            int64_t row = cursor.fetch_add(1);
            if (row >= n) break;
            const int64_t off = row * k;
            float amax = 1e-12f;
            for (int64_t i = 0; i < k; ++i) {
                float v = bf16_to_f32(w[off + i]);
                if (!std::isfinite(v)) { bad.store(1); }
                amax = std::max(amax, std::fabs(v));
            }
            const float s = amax / 448.0f;
            const float inv = 1.0f / s;
            for (int64_t i = 0; i < k; ++i) {
                float v = bf16_to_f32(w[off + i]) * inv;
                v = std::min(448.0f, std::max(-448.0f, v));
                q[off + i] = f32_to_e4m3fn(v);
            }
            scale[row] = s;
        }
    };
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(work);
    for (auto& th : pool) th.join();
    return bad.load();
}

// bf16 -> f32 bulk convert (checkpoint readers)
void bf16_to_f32_buf(const uint16_t* in, float* out, int64_t count, int nthreads) {
    nthreads = std::max(1, nthreads);
    std::vector<std::thread> pool;
    int64_t chunk = (count + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; ++t) {
        int64_t lo = t * chunk, hi = std::min(count, lo + chunk);
        if (lo >= hi) break;
        pool.emplace_back([=]() {
            for (int64_t i = lo; i < hi; ++i) out[i] = bf16_to_f32(in[i]);
        });
    }
    for (auto& th : pool) th.join();
}

}  // extern "C"
