// Shared hex-grid quantization math (IEEE f32, no FMA contraction).
//
// Mirrors core/hex.py + core/metadata.py bit-for-bit: same operation
// order, same saturating i32 casts (Rust `as i32` semantics). Any change
// here must be applied to the NumPy and jnp paths too (CLAUDE.md
// invariant #2); parity is enforced by tests/test_native.py and the
// runtime self-check in point_cloud_tpu/native/__init__.py.
//
// Reference formulas: point-converter/src/hex.rs:18-85 (offset/axial hex
// grid, Charles-Chambers quantization), metadata.rs:91-112 (cell grid).

#ifndef PC_HEX_H_
#define PC_HEX_H_

#include <cmath>
#include <cstdint>

namespace pchex {

constexpr float kSqrt3 = 1.73205080757f;

inline int32_t sat_i32(float v) {
    // Rust `as i32`: NaN -> 0, saturate at the type bounds. Must match
    // core/hex.py _np_saturating_i32 exactly (same bound constants).
    if (std::isnan(v)) return 0;
    if (v >= 2147483648.0f) return INT32_MAX;
    if (v <= -2147483904.0f) return INT32_MIN;
    return static_cast<int32_t>(v);  // in-range: exact (floored inputs)
}

inline int32_t cell_coord(float p, float cell_size) {
    // floor(pos / cell_size) (core/metadata.py cell_index)
    return sat_i32(std::floor(p / cell_size));
}

struct HexResult {
    int32_t sub[3];  // offset-coordinate hex slot index
    float dist;      // f32 squared distance to the slot center
};

inline HexResult hex_quantize(float px, float py, float pz, float radius) {
    HexResult r_out;
    // axial_from_world (core/hex.py, same f32 op order)
    const float inv_qx = radius * kSqrt3;   // divisor for x
    const float neg_qy = -radius * kSqrt3;  // divisor for y
    const float half_sqrt3 = kSqrt3 / 2.0f;

    const float x = px / inv_qx;
    const float y = py / neg_qy;
    const float t = kSqrt3 * y + 1.0f;
    const float temp1 = std::floor(t + x);
    const float temp2 = t - x;
    const float temp3 = 2.0f * x + 1.0f;
    const float qf = (temp1 + temp3) / 3.0f;
    const float rf = (temp1 + temp2) / 3.0f;
    const int32_t q = sat_i32(std::floor(qf));
    const int32_t r = -sat_i32(std::floor(rf));
    const int32_t h = sat_i32(std::trunc(pz / radius));

    // axial -> offset (hex.rs:45-51; operands even so / == floor-div)
    const int64_t xq = static_cast<int64_t>(q) +
                       ((static_cast<int64_t>(r) -
                         (static_cast<int64_t>(r) & 1)) / 2);
    r_out.sub[0] = static_cast<int32_t>(xq);
    r_out.sub[1] = r;
    r_out.sub[2] = h;

    // offset -> axial -> world center (core/hex.py offset_to_world)
    const int64_t q2 = xq - ((static_cast<int64_t>(r) -
                              (static_cast<int64_t>(r) & 1)) / 2);
    const float qc = static_cast<float>(q2);
    const float rc = static_cast<float>(r);
    const float hc = static_cast<float>(h);
    const float cx = radius * (kSqrt3 * qc + half_sqrt3 * rc);
    const float cy = radius * 3.0f / 2.0f * rc;
    const float cz = hc * radius;

    const float dx = px - cx;
    const float dy = py - cy;
    const float dz = pz - cz;
    r_out.dist = (dx * dx + dy * dy) + dz * dz;
    return r_out;
}

}  // namespace pchex

// --- SIMD batch quantization (SSE2) ---------------------------------
//
// Bitwise-identical to the scalar path: divps/mulps/addps/subps are
// IEEE-correct per lane, roundps(floor) matches std::floor, and
// cvttps2dq's out-of-range sentinel (INT32_MIN) is fixed up to the Rust
// `as i32` saturation the scalar sat_i32 implements. Enabled on x86-64;
// other targets fall back to the scalar loop.

#if defined(__SSE4_1__)
#define PC_HEX_SIMD 1
#include <smmintrin.h>

namespace pchex {

// Rust `as i32` over 4 lanes: NaN -> 0, saturate at the type bounds
inline __m128i sat_i32x4(__m128 v) {
    const __m128i raw = _mm_cvttps_epi32(v);  // out-of-range -> INT32_MIN
    const __m128 nan_mask = _mm_cmpunord_ps(v, v);
    const __m128 hi_mask = _mm_cmpge_ps(v, _mm_set1_ps(2147483648.0f));
    const __m128i with_hi = _mm_blendv_epi8(
        raw, _mm_set1_epi32(INT32_MAX), _mm_castps_si128(hi_mask));
    return _mm_andnot_si128(_mm_castps_si128(nan_mask), with_hi);
    // low saturation: cvttps2dq already yields INT32_MIN for v <= -2^31
    // and the scalar path's threshold (-2147483904) floors to the same
}

// floor(p / size) for 4 lanes
inline __m128i cell_coord_x4(__m128 p, __m128 size) {
    return sat_i32x4(
        _mm_round_ps(_mm_div_ps(p, size),
                     _MM_FROUND_TO_NEG_INF | _MM_FROUND_NO_EXC));
}

struct HexResultX4 {
    int32_t sub0[4], sub1[4], sub2[4];
    float dist[4];
};

inline void hex_quantize_x4(const float* px, const float* py,
                            const float* pz, float radius,
                            HexResultX4* out) {
    const __m128 sqrt3 = _mm_set1_ps(kSqrt3);
    const __m128 rad = _mm_set1_ps(radius);
    const __m128 inv_qx = _mm_mul_ps(rad, sqrt3);
    const __m128 neg_qy = _mm_sub_ps(_mm_setzero_ps(), inv_qx);
    const __m128 one = _mm_set1_ps(1.0f);
    const __m128 three = _mm_set1_ps(3.0f);

    const __m128 vx = _mm_loadu_ps(px);
    const __m128 vy = _mm_loadu_ps(py);
    const __m128 vz = _mm_loadu_ps(pz);

    const __m128 x = _mm_div_ps(vx, inv_qx);
    const __m128 y = _mm_div_ps(vy, neg_qy);
    const __m128 t = _mm_add_ps(_mm_mul_ps(sqrt3, y), one);
    const __m128 temp1 = _mm_round_ps(
        _mm_add_ps(t, x), _MM_FROUND_TO_NEG_INF | _MM_FROUND_NO_EXC);
    const __m128 temp2 = _mm_sub_ps(t, x);
    const __m128 temp3 = _mm_add_ps(_mm_add_ps(x, x), one);
    const __m128 qf = _mm_div_ps(_mm_add_ps(temp1, temp3), three);
    const __m128 rf = _mm_div_ps(_mm_add_ps(temp1, temp2), three);
    const __m128i q = sat_i32x4(_mm_round_ps(
        qf, _MM_FROUND_TO_NEG_INF | _MM_FROUND_NO_EXC));
    const __m128i r = _mm_sub_epi32(_mm_setzero_si128(),
                                    sat_i32x4(_mm_round_ps(
                                        rf, _MM_FROUND_TO_NEG_INF |
                                                _MM_FROUND_NO_EXC)));
    const __m128i hh = sat_i32x4(_mm_round_ps(
        _mm_div_ps(vz, rad), _MM_FROUND_TO_ZERO | _MM_FROUND_NO_EXC));

    // axial -> offset: xq = q + (r - (r & 1)) / 2; operands even so an
    // arithmetic shift implements the floor division exactly
    const __m128i r_even = _mm_sub_epi32(r, _mm_and_si128(r, _mm_set1_epi32(1)));
    const __m128i half = _mm_srai_epi32(r_even, 1);
    const __m128i xq = _mm_add_epi32(q, half);

    // offset -> world center uses q2 = xq - half = q (exact roundtrip)
    const __m128 qc = _mm_cvtepi32_ps(q);
    const __m128 rc = _mm_cvtepi32_ps(r);
    const __m128 hc = _mm_cvtepi32_ps(hh);
    const __m128 half_sqrt3 = _mm_set1_ps(kSqrt3 / 2.0f);
    const __m128 cx = _mm_mul_ps(
        rad, _mm_add_ps(_mm_mul_ps(sqrt3, qc), _mm_mul_ps(half_sqrt3, rc)));
    const __m128 cy =
        _mm_mul_ps(_mm_mul_ps(rad, _mm_set1_ps(1.5f)), rc);
    const __m128 cz = _mm_mul_ps(hc, rad);

    const __m128 dx = _mm_sub_ps(vx, cx);
    const __m128 dy = _mm_sub_ps(vy, cy);
    const __m128 dz = _mm_sub_ps(vz, cz);
    const __m128 dist = _mm_add_ps(
        _mm_add_ps(_mm_mul_ps(dx, dx), _mm_mul_ps(dy, dy)),
        _mm_mul_ps(dz, dz));

    _mm_storeu_si128(reinterpret_cast<__m128i*>(out->sub0), xq);
    _mm_storeu_si128(reinterpret_cast<__m128i*>(out->sub1), r);
    _mm_storeu_si128(reinterpret_cast<__m128i*>(out->sub2), hh);
    _mm_storeu_ps(out->dist, dist);
}

}  // namespace pchex
#endif  // PC_HEX_SIMD

#endif  // PC_HEX_H_
