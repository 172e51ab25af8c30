// Exact OpenCV BGR2GRAY recipe, shared by the preprocessing runtime
// (ysmr_native.cpp) and the libav exact-decode module (avdec.cpp):
//     gray = (B*3735 + G*19235 + R*9798 + 2^14) >> 15
// (verified bit-exact vs cv2.cvtColor in tests/test_preprocess.py; the
// reference converts every decoded frame this way, track_eval.py:181).
#ifndef YSMR_GRAY_RECIPE_H
#define YSMR_GRAY_RECIPE_H

#include <cstdint>

#if defined(__AVX512BW__) && defined(__AVX512VBMI__)
#include <immintrin.h>
#define YSMR_GRAY_AVX512 1
#endif

namespace ysmr_gray {

#ifdef YSMR_GRAY_AVX512
// BGR deinterleave tables: plane byte j comes from global byte 3j+c across
// three 64-byte registers. lo covers global bytes 0..127 via
// permutex2var(z0, ., z1); hi covers 64..191 via permutex2var(z1, ., z2)
// (index v selects global byte 64+v); blend switches at the lane where
// 3j+c crosses 128.
struct DeinterleaveTables {
    __m512i idx_lo[3], idx_hi[3];
    __mmask64 take_hi[3];
    DeinterleaveTables() {
        alignas(64) uint8_t lo[64], hi[64];
        for (int c = 0; c < 3; ++c) {
            uint64_t k = 0;
            for (int j = 0; j < 64; ++j) {
                int g = 3 * j + c;
                lo[j] = static_cast<uint8_t>(g < 128 ? g : 0);
                hi[j] = static_cast<uint8_t>(g >= 128 ? g - 64 : 0);
                if (g >= 128) k |= (1ull << j);
            }
            idx_lo[c] = _mm512_load_si512(lo);
            idx_hi[c] = _mm512_load_si512(hi);
            take_hi[c] = k;
        }
    }
};
#endif  // YSMR_GRAY_AVX512

// exact OpenCV BGR2GRAY: (B*3735 + G*19235 + R*9798 + 2^14) >> 15
inline void bgr_to_gray(const uint8_t* img, int64_t n, uint8_t* out) {
    int64_t i = 0;
#ifdef YSMR_GRAY_AVX512
    static const DeinterleaveTables T;
    const __m512i wB = _mm512_set1_epi32(3735);
    const __m512i wG = _mm512_set1_epi32(19235);
    const __m512i wR = _mm512_set1_epi32(9798);
    const __m512i rnd = _mm512_set1_epi32(1 << 14);
    for (; i + 64 <= n; i += 64) {
        const uint8_t* p = img + 3 * i;
        __m512i z0 = _mm512_loadu_si512(p);
        __m512i z1 = _mm512_loadu_si512(p + 64);
        __m512i z2 = _mm512_loadu_si512(p + 128);
        __m512i plane[3];
        for (int c = 0; c < 3; ++c) {
            __m512i lo = _mm512_permutex2var_epi8(z0, T.idx_lo[c], z1);
            __m512i hi = _mm512_permutex2var_epi8(z1, T.idx_hi[c], z2);
            plane[c] = _mm512_mask_blend_epi8(T.take_hi[c], lo, hi);
        }
        for (int k = 0; k < 4; ++k) {
            __m512i b = _mm512_cvtepu8_epi32(
                _mm512_extracti32x4_epi32(plane[0], k));
            __m512i g = _mm512_cvtepu8_epi32(
                _mm512_extracti32x4_epi32(plane[1], k));
            __m512i r = _mm512_cvtepu8_epi32(
                _mm512_extracti32x4_epi32(plane[2], k));
            __m512i acc = _mm512_add_epi32(
                _mm512_add_epi32(_mm512_mullo_epi32(b, wB),
                                 _mm512_mullo_epi32(g, wG)),
                _mm512_add_epi32(_mm512_mullo_epi32(r, wR), rnd));
            __m128i g8 = _mm512_cvtepi32_epi8(_mm512_srli_epi32(acc, 15));
            _mm_storeu_si128(reinterpret_cast<__m128i*>(out + i + 16 * k), g8);
        }
    }
#endif  // YSMR_GRAY_AVX512
    for (; i < n; ++i) {
        const uint8_t* p = img + i * 3;
        out[i] = static_cast<uint8_t>(
            (p[0] * 3735 + p[1] * 19235 + p[2] * 9798 + (1 << 14)) >> 15);
    }
}

}  // namespace ysmr_gray

#endif  // YSMR_GRAY_RECIPE_H
