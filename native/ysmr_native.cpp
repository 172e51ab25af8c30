// ysmr_tpu native runtime components.
//
// 1. format_rows: vectorised CSV row formatting for the _list.csv hot path
//    (replaces per-row Python string building, reference helper_file.py:
//    1456-1475). Doubles are rendered with shortest round-trip form via
//    std::to_chars, matching Python's repr() output for the same values.
// 2. min_area_rect_batch: exact convex hull (monotone chain) + rotating
//    calipers over packed per-detection candidate points — host-side exact
//    oracle for the device angle-sweep kernel (ops/labeling.py) and the
//    high-precision path for offline analysis.
//
// Build: make -C native  (produces libysmr_native.so; loaded via ctypes)

#include <algorithm>
#include <charconv>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <new>
#include <vector>

#include "gray_recipe.h"

#if defined(__AVX512BW__) && defined(__AVX512VBMI__)
#include <immintrin.h>
#define YSMR_AVX512 1
#endif

#ifdef YSMR_WITH_JPEG
#include <csetjmp>
#include <jpeglib.h>

namespace {
struct JpegErrorMgr {
    jpeg_error_mgr pub;
    jmp_buf setjmp_buffer;
};
void ysmr_jpeg_error_exit(j_common_ptr cinfo) {
    longjmp(reinterpret_cast<JpegErrorMgr*>(cinfo->err)->setjmp_buffer, 1);
}
}  // namespace
#endif  // YSMR_WITH_JPEG

extern "C" {

// ---------------------------------------------------------------------------
// CSV row formatting
// ---------------------------------------------------------------------------

static inline char* write_double(char* p, double v) {
    // Python repr() semantics: shortest round-trip digits, positional
    // notation for 1e-4 <= |v| < 1e16 and scientific (two-digit exponent)
    // outside it, integral values with a trailing .0, signed zero kept.
    // std::to_chars with an explicit chars_format produces the shortest
    // representation IN THAT FORMAT, which is exactly Python's rule — the
    // format-free overload would switch to scientific whenever shorter
    // (e.g. 1e-04 instead of 0.0001).
    if (v == 0.0) {
        if (std::signbit(v)) *p++ = '-';
        *p++ = '0';
        *p++ = '.';
        *p++ = '0';
        return p;
    }
    double a = std::fabs(v);
    if (a < 1e16 && v == static_cast<int64_t>(v)) {
        auto r = std::to_chars(p, p + 24, static_cast<int64_t>(v));
        p = r.ptr;
        *p++ = '.';
        *p++ = '0';
        return p;
    }
    auto fmt = (a >= 1e-4 && a < 1e16) ? std::chars_format::fixed
                                       : std::chars_format::scientific;
    auto r = std::to_chars(p, p + 40, v, fmt);
    return r.ptr;
}

// Returns number of bytes written to out (caller allocates generously:
// n * 160 bytes is always sufficient).
int64_t format_rows(const int64_t* track_id, const int64_t* frame,
                    const double* x, const double* y, const double* w,
                    const double* h, const double* deg, const double* lum,
                    int64_t n, char* out) {
    char* p = out;
    for (int64_t i = 0; i < n; ++i) {
        auto r1 = std::to_chars(p, p + 20, track_id[i]);
        p = r1.ptr;
        *p++ = ',';
        auto r2 = std::to_chars(p, p + 20, frame[i]);
        p = r2.ptr;
        *p++ = ',';
        p = write_double(p, x[i]);
        *p++ = ',';
        p = write_double(p, y[i]);
        *p++ = ',';
        p = write_double(p, w[i]);
        *p++ = ',';
        p = write_double(p, h[i]);
        *p++ = ',';
        p = write_double(p, deg[i]);
        if (lum != nullptr) {
            *p++ = ',';
            p = write_double(p, lum[i]);
        }
        *p++ = '\n';
    }
    return p - out;
}

// ---------------------------------------------------------------------------
// Generic typed-column CSV table formatting (the _selected_data /
// _statistics / _analysed artifacts). pandas.DataFrame.to_csv spends
// seconds per million rows in per-chunk object conversion; this renders the
// same bytes (verified in tests/test_csv_io.py) in one pass.
//
// Column types: 0 = int64, 1 = float64 (NaN -> empty field like pandas'
// na_rep; single-column frames with NaN must use pandas — it quotes a
// fully-empty row), 2 = bool as uint8 ('True'/'False'), 4 = float16 passed
// as raw uint16 bits (shortest round-trip at half precision — numpy's str),
// 5 = fixed-width UTF-8 bytes (NUL-padded; caller guarantees no characters
// that pandas would quote).
// ---------------------------------------------------------------------------

static inline char* write_half(char* p, uint16_t bits) {
    _Float16 h;
    std::memcpy(&h, &bits, 2);
    float f = static_cast<float>(h);
    if (std::isnan(f)) {
        return p;  // pandas' na_rep: empty field
    }
    double d = f;
    if (d == static_cast<int64_t>(d) && std::fabs(d) < 1e15) {
        auto r = std::to_chars(p, p + 24, static_cast<int64_t>(d));
        p = r.ptr;
        *p++ = '.';
        *p++ = '0';
        return p;
    }
    // fewest digits that survive a decimal round trip at half precision;
    // %g's fixed/scientific switch matches numpy's str() for the half range
    for (int prec = 1; prec <= 6; ++prec) {
        char buf[40];
        int len = std::snprintf(buf, sizeof buf, "%.*g", prec, d);
        if (static_cast<_Float16>(std::strtof(buf, nullptr)) == h) {
            std::memcpy(p, buf, static_cast<size_t>(len));
            return p + len;
        }
    }
    auto r = std::to_chars(p, p + 32, f);  // unreachable fallback
    return r.ptr;
}

int64_t format_table(int64_t n_rows, int64_t n_cols, const int32_t* col_types,
                     const int64_t* col_widths, const void** cols, char* out) {
    char* p = out;
    for (int64_t i = 0; i < n_rows; ++i) {
        for (int64_t c = 0; c < n_cols; ++c) {
            if (c) *p++ = ',';
            switch (col_types[c]) {
                case 0: {
                    auto r = std::to_chars(
                        p, p + 21, static_cast<const int64_t*>(cols[c])[i]);
                    p = r.ptr;
                    break;
                }
                case 1: {
                    double v = static_cast<const double*>(cols[c])[i];
                    if (!std::isnan(v)) {  // pandas' na_rep: empty field
                        p = write_double(p, v);
                    }
                    break;
                }
                case 2: {
                    if (static_cast<const uint8_t*>(cols[c])[i]) {
                        std::memcpy(p, "True", 4);
                        p += 4;
                    } else {
                        std::memcpy(p, "False", 5);
                        p += 5;
                    }
                    break;
                }
                case 4:
                    p = write_half(p, static_cast<const uint16_t*>(cols[c])[i]);
                    break;
                case 5: {
                    int64_t w = col_widths[c];
                    const char* s = static_cast<const char*>(cols[c]) + i * w;
                    int64_t len = 0;
                    while (len < w && s[len]) ++len;
                    std::memcpy(p, s, static_cast<size_t>(len));
                    p += len;
                    break;
                }
            }
        }
        *p++ = '\n';
    }
    return p - out;
}

// ---------------------------------------------------------------------------
// Exact minAreaRect: monotone-chain hull + rotating calipers
// ---------------------------------------------------------------------------

struct Pt { double x, y; };

static inline double cross(const Pt& o, const Pt& a, const Pt& b) {
    return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

static int convex_hull(std::vector<Pt>& pts, std::vector<Pt>& hull) {
    std::sort(pts.begin(), pts.end(), [](const Pt& a, const Pt& b) {
        return a.x < b.x || (a.x == b.x && a.y < b.y);
    });
    pts.erase(std::unique(pts.begin(), pts.end(), [](const Pt& a, const Pt& b) {
        return a.x == b.x && a.y == b.y;
    }), pts.end());
    int n = static_cast<int>(pts.size());
    if (n <= 2) {
        hull = pts;
        return n;
    }
    hull.assign(2 * n, Pt{0, 0});
    int k = 0;
    for (int i = 0; i < n; ++i) {  // lower
        while (k >= 2 && cross(hull[k - 2], hull[k - 1], pts[i]) <= 0) --k;
        hull[k++] = pts[i];
    }
    for (int i = n - 2, t = k + 1; i >= 0; --i) {  // upper
        while (k >= t && cross(hull[k - 2], hull[k - 1], pts[i]) <= 0) --k;
        hull[k++] = pts[i];
    }
    hull.resize(k - 1);
    return k - 1;
}

// For each detection d: candidate points pts[d * max_pts .. ] with validity
// mask; outputs (cx, cy, w, h, angle_deg) per detection.
void min_area_rect_batch(const float* pts_xy, const uint8_t* valid,
                         int64_t n_det, int64_t max_pts, float* out5) {
    std::vector<Pt> pts;
    std::vector<Pt> hull;
    for (int64_t d = 0; d < n_det; ++d) {
        pts.clear();
        for (int64_t i = 0; i < max_pts; ++i) {
            if (valid[d * max_pts + i]) {
                pts.push_back(Pt{pts_xy[(d * max_pts + i) * 2],
                                 pts_xy[(d * max_pts + i) * 2 + 1]});
            }
        }
        float* o = out5 + d * 5;
        if (pts.empty()) {
            o[0] = o[1] = o[2] = o[3] = o[4] = 0.f;
            continue;
        }
        int k = convex_hull(pts, hull);
        if (k == 1) {
            o[0] = static_cast<float>(hull[0].x);
            o[1] = static_cast<float>(hull[0].y);
            o[2] = o[3] = o[4] = 0.f;
            continue;
        }
        double best_area = 1e300;
        double bcx = 0, bcy = 0, bw = 0, bh = 0, bang = 0;
        for (int e = 0; e < k; ++e) {
            const Pt& a = hull[e];
            const Pt& b = hull[(e + 1) % k];
            double ex = b.x - a.x, ey = b.y - a.y;
            double len = std::hypot(ex, ey);
            if (len < 1e-12) continue;
            double ux = ex / len, uy = ey / len;   // edge direction
            double vx = -uy, vy = ux;              // normal
            double minu = 1e300, maxu = -1e300, minv = 1e300, maxv = -1e300;
            for (int i = 0; i < k; ++i) {
                double pu = hull[i].x * ux + hull[i].y * uy;
                double pv = hull[i].x * vx + hull[i].y * vy;
                minu = std::min(minu, pu); maxu = std::max(maxu, pu);
                minv = std::min(minv, pv); maxv = std::max(maxv, pv);
            }
            double area = (maxu - minu) * (maxv - minv);
            if (area < best_area) {
                best_area = area;
                bw = maxu - minu;
                bh = maxv - minv;
                double cu = 0.5 * (minu + maxu), cv = 0.5 * (minv + maxv);
                bcx = cu * ux + cv * vx;
                bcy = cu * uy + cv * vy;
                bang = std::atan2(uy, ux);
            }
        }
        // cv2's classic representation: angle in [-90, 0), w = the extent
        // along the angle's direction (matches ops/labeling.min_area_rect).
        // Each 90-degree reduction step swaps which extent lies along the
        // reported angle, so track the step parity.
        double deg = bang * 180.0 / M_PI;
        double steps = std::floor(deg / 90.0);
        double rem = deg - 90.0 * steps;          // in [0, 90)
        bool swapped = std::fmod(std::fabs(steps), 2.0) >= 1.0;
        double w_at_rem = swapped ? bh : bw;      // extent along rem
        double h_at_rem = swapped ? bw : bh;
        o[0] = static_cast<float>(bcx);
        o[1] = static_cast<float>(bcy);
        o[2] = static_cast<float>(h_at_rem);      // cv2: w along (rem - 90)
        o[3] = static_cast<float>(w_at_rem);
        o[4] = static_cast<float>(rem - 90.0);
    }
}

// ---------------------------------------------------------------------------
// Foreground pixel extraction (bandwidth-constrained transfer mode)
// ---------------------------------------------------------------------------

// Scan a thresholded mask (and optional marker mask) once; emit (x, y) of
// foreground pixels plus a marker flag. Returns the number of foreground
// pixels found (may exceed max_out; only max_out entries are written).
int64_t extract_fg_pixels(const uint8_t* mask, const uint8_t* markers,
                          int64_t h, int64_t w, int16_t* xs, int16_t* ys,
                          uint8_t* flags, int64_t max_out) {
    int64_t count = 0;
    for (int64_t y = 0; y < h; ++y) {
        const uint8_t* row = mask + y * w;
        const uint8_t* mrow = markers ? markers + y * w : nullptr;
        int64_t x = 0;
        // fast skip over 8 zero bytes at a time
        while (x + 8 <= w) {
            uint64_t v;
            std::memcpy(&v, row + x, 8);
            if (v == 0) { x += 8; continue; }
            for (int64_t k = x; k < x + 8; ++k) {
                if (row[k]) {
                    if (count < max_out) {
                        xs[count] = static_cast<int16_t>(k);
                        ys[count] = static_cast<int16_t>(y);
                        flags[count] = mrow ? (mrow[k] ? 1 : 0) : 0;
                    }
                    ++count;
                }
            }
            x += 8;
        }
        for (; x < w; ++x) {
            if (row[x]) {
                if (count < max_out) {
                    xs[count] = static_cast<int16_t>(x);
                    ys[count] = static_cast<int16_t>(y);
                    flags[count] = mrow ? (mrow[x] ? 1 : 0) : 0;
                }
                ++count;
            }
        }
    }
    return count;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Full host preprocessing: BGR -> gray -> blur -> threshold(s) -> extraction
// ---------------------------------------------------------------------------
//
// Bit-exact with the verified OpenCV recipes (see ysmr_tpu/ops/preprocess.py):
//   gray  = (B*3735 + G*19235 + R*9798 + 2^14) >> 15
//   blur3 = separable [64,128,64] fixed point, reflect-101, (acc+2^15)>>16
//   adaptive mean = float32 separable 11-tap Gaussian, replicate border,
//                   nearbyintf (round half to even, ties do not occur)
//   rule: BINARY  src - mean + ceil(C)  > 0
//         BINARY_INV src - mean + floor(C) <= 0
// State for the two-stage mean mode (stats first, threshold after the host
// updates its moving average) is kept in thread-local buffers — one decoder
// thread per video.

namespace {

thread_local std::vector<uint8_t> tl_gray;
thread_local std::vector<uint8_t> tl_blur;
// adaptive mean is a convex combination of u8 values -> fits u8 exactly
thread_local std::vector<uint8_t> tl_mean;
thread_local int64_t tl_h = 0, tl_w = 0;

// exact OpenCV BGR2GRAY (AVX-512 VBMI deinterleave + scalar tail): shared
// with avdec.cpp via gray_recipe.h

const float kGauss11[11] = {
    0.0088122292925622882f,
    0.027143577143479373f,
    0.065114056599382686f,
    0.12164907301380962f,
    0.1769983568313557f,
    0.20056541423882085f,
    0.1769983568313557f,
    0.12164907301380962f,
    0.065114056599382686f,
    0.027143577143479373f,
    0.0088122292925622882f
};

}  // namespace

namespace {

// float32 separable 11-tap on the blurred image (the reference thresholds
// the blurred image and computes the adaptive mean from it,
// track_eval.py:189-208). Horizontal taps run over a replicate-padded float
// row; 11 such rows live in a ring consumed by the row-wise vertical pass.
//
// Layout: ring rows are padded to a 16-float stride from a 64-byte-aligned
// base, and the pad row is 64-byte aligned too, so every vertical-pass load
// and every k=0 horizontal load hits a single cache line. The horizontal
// tap loop forms its 10 shifted vectors with valignd from 5 aligned loads
// (same f32 values, same FMA order — bit-identical) instead of 11
// overlapping unaligned loads, 10 of which split cache lines; measured
// ~25 % faster on the 1228-wide bench frames.
struct MeanRing {
    std::vector<float> ring;   // 16-row ring (output y consumes y-5..y+8)
    std::vector<float> padrow;
    float* ringp = nullptr;    // 64B-aligned base into ring
    float* pr = nullptr;       // 64B-aligned base into padrow
    int64_t w = 0;
    int64_t stride = 0;        // ring row stride (w rounded up to 16)
    int64_t next_h = 0;        // first row not yet h-passed
    int64_t img_h = 0;

    float* slot(int64_t y) { return ringp + (y & 15) * stride; }

    void hpass_upto(int64_t yy) {
        if (yy >= img_h) yy = img_h - 1;
        while (next_h <= yy) hpass(next_h++);
    }

    void hpass(int64_t y) {
        const uint8_t* row = tl_blur.data() + y * w;
        float* trow = slot(y);
        int64_t x = 0;
#ifdef YSMR_AVX512
        for (; x + 16 <= w; x += 16) {
            __m512 v = _mm512_cvtepi32_ps(_mm512_cvtepu8_epi32(
                _mm_loadu_si128(reinterpret_cast<const __m128i*>(row + x))));
            _mm512_storeu_ps(pr + x + 5, v);
        }
#endif
        for (; x < w; ++x) pr[x + 5] = row[x];
        for (int k = 0; k < 5; ++k) {
            pr[k] = row[0];
            pr[w + 5 + k] = row[w - 1];
        }
        x = 0;
#ifdef YSMR_AVX512
        // 4 outputs per iteration from 5 aligned loads; the shifted tap
        // vectors come from valignd (a pure lane rotate: identical values,
        // identical accumulation order as the scalar recipe)
        for (; x + 64 <= w; x += 64) {
            __m512 v0 = _mm512_load_ps(pr + x);
            __m512 v1 = _mm512_load_ps(pr + x + 16);
            __m512 v2 = _mm512_load_ps(pr + x + 32);
            __m512 v3 = _mm512_load_ps(pr + x + 48);
            __m512 v4 = _mm512_load_ps(pr + x + 64);
            __m512 a0 = _mm512_mul_ps(v0, _mm512_set1_ps(kGauss11[0]));
            __m512 a1 = _mm512_mul_ps(v1, _mm512_set1_ps(kGauss11[0]));
            __m512 a2 = _mm512_mul_ps(v2, _mm512_set1_ps(kGauss11[0]));
            __m512 a3 = _mm512_mul_ps(v3, _mm512_set1_ps(kGauss11[0]));
#define YSMR_HTAP(K)                                                         \
            {                                                                \
                const __m512 wk = _mm512_set1_ps(kGauss11[K]);               \
                a0 = _mm512_fmadd_ps(_mm512_castsi512_ps(_mm512_alignr_epi32(\
                    _mm512_castps_si512(v1), _mm512_castps_si512(v0), K)),   \
                    wk, a0);                                                 \
                a1 = _mm512_fmadd_ps(_mm512_castsi512_ps(_mm512_alignr_epi32(\
                    _mm512_castps_si512(v2), _mm512_castps_si512(v1), K)),   \
                    wk, a1);                                                 \
                a2 = _mm512_fmadd_ps(_mm512_castsi512_ps(_mm512_alignr_epi32(\
                    _mm512_castps_si512(v3), _mm512_castps_si512(v2), K)),   \
                    wk, a2);                                                 \
                a3 = _mm512_fmadd_ps(_mm512_castsi512_ps(_mm512_alignr_epi32(\
                    _mm512_castps_si512(v4), _mm512_castps_si512(v3), K)),   \
                    wk, a3);                                                 \
            }
            YSMR_HTAP(1) YSMR_HTAP(2) YSMR_HTAP(3) YSMR_HTAP(4) YSMR_HTAP(5)
            YSMR_HTAP(6) YSMR_HTAP(7) YSMR_HTAP(8) YSMR_HTAP(9) YSMR_HTAP(10)
#undef YSMR_HTAP
            _mm512_store_ps(trow + x, a0);
            _mm512_store_ps(trow + x + 16, a1);
            _mm512_store_ps(trow + x + 32, a2);
            _mm512_store_ps(trow + x + 48, a3);
        }
        for (; x + 16 <= w; x += 16) {
            __m512 acc = _mm512_mul_ps(_mm512_loadu_ps(pr + x),
                                       _mm512_set1_ps(kGauss11[0]));
            for (int k = 1; k < 11; ++k) {
                acc = _mm512_fmadd_ps(_mm512_loadu_ps(pr + x + k),
                                      _mm512_set1_ps(kGauss11[k]), acc);
            }
            _mm512_storeu_ps(trow + x, acc);
        }
#endif
        for (; x < w; ++x) {
            float acc = 0.0f;
            for (int k = 0; k < 11; ++k) acc += pr[x + k] * kGauss11[k];
            trow[x] = acc;
        }
    }

    void start(int64_t height, int64_t width) {
        w = width;
        img_h = height;
        next_h = 0;
        stride = (w + 15) & ~int64_t(15);
        ring.resize(16 * stride + 16);
        // the 4-wide tap block's last v4 load covers pr[w .. w+15] (x = w-64
        // at most), so padrow needs w + 16 readable floats past pr; only
        // pr[0 .. w+9] is ever written, so keep the tail pad zeroed
        padrow.resize(w + 16 + 16);
        std::fill(padrow.begin(), padrow.end(), 0.0f);
        ringp = reinterpret_cast<float*>(
            (reinterpret_cast<uintptr_t>(ring.data()) + 63) & ~uintptr_t(63));
        pr = reinterpret_cast<float*>(
            (reinterpret_cast<uintptr_t>(padrow.data()) + 63) & ~uintptr_t(63));
        hpass_upto(5);
    }

    // mean row y (u8, rint nearest-even) into out; call with increasing y
    void mean_row(int64_t h, int64_t y, uint8_t* out) {
        hpass_upto(y + 5);
        const float* rows[11];
        for (int k = 0; k < 11; ++k) {
            int64_t yy = y + k - 5;
            if (yy < 0) yy = 0;
            if (yy >= h) yy = h - 1;
            rows[k] = slot(yy);
        }
        int64_t x = 0;
#ifdef YSMR_AVX512
        // vcvtps2dq rounds to nearest-even — same as nearbyintf under the
        // default rounding mode
        for (; x + 16 <= w; x += 16) {
            __m512 acc = _mm512_mul_ps(_mm512_loadu_ps(rows[0] + x),
                                       _mm512_set1_ps(kGauss11[0]));
            for (int k = 1; k < 11; ++k) {
                acc = _mm512_fmadd_ps(_mm512_loadu_ps(rows[k] + x),
                                      _mm512_set1_ps(kGauss11[k]), acc);
            }
            __m128i v8 = _mm512_cvtepi32_epi8(_mm512_cvtps_epi32(acc));
            _mm_storeu_si128(reinterpret_cast<__m128i*>(out + x), v8);
        }
#endif
        for (; x < w; ++x) {
            float acc = 0.0f;
            for (int k = 0; k < 11; ++k) acc += rows[k][x] * kGauss11[k];
            out[x] = static_cast<uint8_t>(static_cast<int32_t>(nearbyintf(acc)));
        }
    }

    // 4 consecutive INTERIOR output rows (y >= 5 and y + 8 < h): the 14
    // source rows are loaded once per x-chunk and feed all four
    // accumulators, cutting the vertical pass's L2 read amplification from
    // 11x to 3.5x. Identical per-row accumulation order -> bit-equal to
    // mean_row.
    void mean_rows4(int64_t h, int64_t y, uint8_t* out, int64_t out_stride) {
        hpass_upto(y + 8);
        const float* rows[14];
        for (int k = 0; k < 14; ++k) rows[k] = slot(y - 5 + k);
        int64_t x = 0;
#ifdef YSMR_AVX512
        for (; x + 16 <= w; x += 16) {
            __m512 r[14];
            for (int k = 0; k < 14; ++k) r[k] = _mm512_loadu_ps(rows[k] + x);
            __m512 a0 = _mm512_mul_ps(r[0], _mm512_set1_ps(kGauss11[0]));
            __m512 a1 = _mm512_mul_ps(r[1], _mm512_set1_ps(kGauss11[0]));
            __m512 a2 = _mm512_mul_ps(r[2], _mm512_set1_ps(kGauss11[0]));
            __m512 a3 = _mm512_mul_ps(r[3], _mm512_set1_ps(kGauss11[0]));
            for (int k = 1; k < 11; ++k) {
                const __m512 wk = _mm512_set1_ps(kGauss11[k]);
                a0 = _mm512_fmadd_ps(r[k], wk, a0);
                a1 = _mm512_fmadd_ps(r[k + 1], wk, a1);
                a2 = _mm512_fmadd_ps(r[k + 2], wk, a2);
                a3 = _mm512_fmadd_ps(r[k + 3], wk, a3);
            }
            _mm_storeu_si128(reinterpret_cast<__m128i*>(out + x),
                             _mm512_cvtepi32_epi8(_mm512_cvtps_epi32(a0)));
            _mm_storeu_si128(reinterpret_cast<__m128i*>(out + out_stride + x),
                             _mm512_cvtepi32_epi8(_mm512_cvtps_epi32(a1)));
            _mm_storeu_si128(reinterpret_cast<__m128i*>(out + 2 * out_stride + x),
                             _mm512_cvtepi32_epi8(_mm512_cvtps_epi32(a2)));
            _mm_storeu_si128(reinterpret_cast<__m128i*>(out + 3 * out_stride + x),
                             _mm512_cvtepi32_epi8(_mm512_cvtps_epi32(a3)));
        }
#endif
        for (; x < w; ++x) {
            for (int j = 0; j < 4; ++j) {
                float acc = 0.0f;
                for (int k = 0; k < 11; ++k) acc += rows[j + k][x] * kGauss11[k];
                out[j * out_stride + x] =
                    static_cast<uint8_t>(static_cast<int32_t>(nearbyintf(acc)));
            }
        }
    }
};

// Fused adaptive mean + threshold + extraction (threshold modes 0/1):
// computes the 11-tap f32 vertical pass from the MeanRing and compares
// src - mean against the C offsets while the mean is still in registers,
// compress-storing the packed uint32 wire directly. Bit-identical to
// stage1(need_mean=1) + preprocess_stage2_packed — same hpass/vpass
// accumulation order, vcvtps2dq rounding, and integer compare rule — but
// the tl_mean plane write (1.1 MB/frame) and stage 2's full-plane re-read
// (2.3 MB/frame + a third per-pixel pass) disappear. Output stays in
// raster order via tiny per-row staging buffers (foreground is sparse, so
// the staging copy is count-proportional).
int64_t fused_mean_threshold_packed(int64_t h, int64_t w, int mode, int white,
                                    double c_mask, double c_marker,
                                    uint32_t* out, int64_t max_out) {
    static thread_local MeanRing ring;
    ring.start(h, w);
    const int32_t im = white ? -static_cast<int32_t>(std::ceil(c_mask))
                             : -static_cast<int32_t>(std::floor(c_mask));
    const int32_t ik = white ? -static_cast<int32_t>(std::ceil(c_marker))
                             : -static_cast<int32_t>(std::floor(c_marker));
    static thread_local std::vector<uint32_t> stage;
    stage.resize(4 * w);
    int64_t count = 0;
    auto flush = [&](const uint32_t* src, int64_t n) {
        if (count < max_out) {
            const int64_t take = std::min(n, max_out - count);
            std::memcpy(out + count, src,
                        static_cast<size_t>(take) * sizeof(uint32_t));
        }
        count += n;
    };
    // scalar mean+threshold for vector tails / non-AVX builds; appends to a
    // staging row so the in-row emission order stays x-ascending
    auto scalar_px = [&](const float* const* rows, int64_t y, int64_t x,
                         uint32_t* st, int64_t& n) {
        float acc = 0.0f;
        for (int k = 0; k < 11; ++k) acc += rows[k][x] * kGauss11[k];
        const int32_t mean = static_cast<int32_t>(nearbyintf(acc));
        const int32_t d = static_cast<int32_t>(tl_blur[y * w + x]) - mean;
        const bool in_mask = white ? (d > im) : (d <= im);
        if (!in_mask) return;
        const bool mk = (mode == 1) && (white ? (d > ik) : (d <= ik));
        st[n++] = static_cast<uint32_t>(y * w + x) | (mk ? 0x80000000u : 0u);
    };
#ifdef YSMR_AVX512
    const __m512i vim = _mm512_set1_epi32(im);
    const __m512i vik = _mm512_set1_epi32(ik);
    const __m512i iota = _mm512_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10,
                                           11, 12, 13, 14, 15);
    const __m512i topbit = _mm512_set1_epi32(static_cast<int32_t>(0x80000000));
    // threshold 16 mean values (i32, pre-u8-pack — identical integers) and
    // compress-store the surviving packed entries into the staging row
    auto emit16 = [&](__m512i mi, int64_t y, int64_t x, uint32_t* st,
                      int64_t& n) {
        const __m512i src = _mm512_cvtepu8_epi32(_mm_loadu_si128(
            reinterpret_cast<const __m128i*>(tl_blur.data() + y * w + x)));
        const __m512i d = _mm512_sub_epi32(src, mi);
        const __mmask16 msk = white ? _mm512_cmpgt_epi32_mask(d, vim)
                                    : _mm512_cmple_epi32_mask(d, vim);
        if (!msk) return;
        __mmask16 mk = 0;
        if (mode == 1) {
            mk = white ? _mm512_cmpgt_epi32_mask(d, vik)
                       : _mm512_cmple_epi32_mask(d, vik);
        }
        __m512i val = _mm512_add_epi32(
            _mm512_set1_epi32(static_cast<int32_t>(y * w + x)), iota);
        val = _mm512_mask_or_epi32(val, mk, val, topbit);
        _mm512_mask_compressstoreu_epi32(st + n, msk, val);
        n += __builtin_popcount(static_cast<unsigned>(msk));
    };
#endif
    // border rows (vertical clamp) one at a time, same row set as mean_row
    auto fused_row = [&](int64_t y) {
        ring.hpass_upto(y + 5);
        const float* rows[11];
        for (int k = 0; k < 11; ++k) {
            int64_t yy = y + k - 5;
            if (yy < 0) yy = 0;
            if (yy >= h) yy = h - 1;
            rows[k] = ring.slot(yy);
        }
        uint32_t* st = stage.data();
        int64_t n = 0;
        int64_t x = 0;
#ifdef YSMR_AVX512
        for (; x + 16 <= w; x += 16) {
            __m512 acc = _mm512_mul_ps(_mm512_loadu_ps(rows[0] + x),
                                       _mm512_set1_ps(kGauss11[0]));
            for (int k = 1; k < 11; ++k) {
                acc = _mm512_fmadd_ps(_mm512_loadu_ps(rows[k] + x),
                                      _mm512_set1_ps(kGauss11[k]), acc);
            }
            emit16(_mm512_cvtps_epi32(acc), y, x, st, n);
        }
#endif
        for (; x < w; ++x) scalar_px(rows, y, x, st, n);
        flush(st, n);
    };
    int64_t y = 0;
    for (; y < std::min<int64_t>(5, h); ++y) fused_row(y);
    for (; y + 3 < h && y + 8 < h; y += 4) {
        // interior 4-row block, same 14-row reuse as mean_rows4
        ring.hpass_upto(y + 8);
        const float* rows[14];
        for (int k = 0; k < 14; ++k) rows[k] = ring.slot(y - 5 + k);
        uint32_t* st[4];
        int64_t n[4] = {0, 0, 0, 0};
        for (int j = 0; j < 4; ++j) st[j] = stage.data() + j * w;
        int64_t x = 0;
#ifdef YSMR_AVX512
        for (; x + 16 <= w; x += 16) {
            __m512 r[14];
            for (int k = 0; k < 14; ++k) r[k] = _mm512_loadu_ps(rows[k] + x);
            __m512 a0 = _mm512_mul_ps(r[0], _mm512_set1_ps(kGauss11[0]));
            __m512 a1 = _mm512_mul_ps(r[1], _mm512_set1_ps(kGauss11[0]));
            __m512 a2 = _mm512_mul_ps(r[2], _mm512_set1_ps(kGauss11[0]));
            __m512 a3 = _mm512_mul_ps(r[3], _mm512_set1_ps(kGauss11[0]));
            for (int k = 1; k < 11; ++k) {
                const __m512 wk = _mm512_set1_ps(kGauss11[k]);
                a0 = _mm512_fmadd_ps(r[k], wk, a0);
                a1 = _mm512_fmadd_ps(r[k + 1], wk, a1);
                a2 = _mm512_fmadd_ps(r[k + 2], wk, a2);
                a3 = _mm512_fmadd_ps(r[k + 3], wk, a3);
            }
            emit16(_mm512_cvtps_epi32(a0), y, x, st[0], n[0]);
            emit16(_mm512_cvtps_epi32(a1), y + 1, x, st[1], n[1]);
            emit16(_mm512_cvtps_epi32(a2), y + 2, x, st[2], n[2]);
            emit16(_mm512_cvtps_epi32(a3), y + 3, x, st[3], n[3]);
        }
#endif
        for (; x < w; ++x) {
            for (int j = 0; j < 4; ++j) {
                scalar_px(rows + j, y + j, x, st[j], n[j]);
            }
        }
        for (int j = 0; j < 4; ++j) flush(st[j], n[j]);
    }
    for (; y < h; ++y) fused_row(y);
    return count;
}

// blur3 (+ adaptive mean) from the already-filled tl_gray buffer.
void stage1_from_gray(int64_t h, int64_t w, int need_adaptive_mean,
                      double* out_stats) {
    if (out_stats != nullptr) {
        int64_t total = 0;
        int64_t sumsq = 0;
        for (int64_t i = 0; i < h * w; ++i) {
            total += tl_gray[i];
            sumsq += static_cast<int64_t>(tl_gray[i]) * tl_gray[i];
        }
        out_stats[0] = static_cast<double>(total);
        out_stats[1] = static_cast<double>(sumsq);
    }
    // blur3: separable [64,128,64], reflect-101 borders. Horizontal u16
    // accumulator rows (max 255*256 fits u16) live in a 3-row ring so the
    // full-image tmp plane (and its DRAM round trip) disappears.
    {
        static thread_local std::vector<uint16_t> ring3;
        ring3.resize(3 * w);
        auto hpass = [&](int64_t y, uint16_t* trow) {
            const uint8_t* row = tl_gray.data() + y * w;
            trow[0] = static_cast<uint16_t>(
                row[1] * 64 + row[0] * 128 + row[1] * 64);
            int64_t x = 1;
#ifdef YSMR_AVX512
            // 64*(a + c + 2b) over 32 u16 lanes; max 64*1020 fits u16
            for (; x + 32 <= w - 1; x += 32) {
                __m512i a = _mm512_cvtepu8_epi16(_mm256_loadu_si256(
                    reinterpret_cast<const __m256i*>(row + x - 1)));
                __m512i b = _mm512_cvtepu8_epi16(_mm256_loadu_si256(
                    reinterpret_cast<const __m256i*>(row + x)));
                __m512i c = _mm512_cvtepu8_epi16(_mm256_loadu_si256(
                    reinterpret_cast<const __m256i*>(row + x + 1)));
                __m512i s = _mm512_add_epi16(_mm512_add_epi16(a, c),
                                             _mm512_slli_epi16(b, 1));
                _mm512_storeu_si512(trow + x, _mm512_slli_epi16(s, 6));
            }
#endif
            for (; x < w - 1; ++x) {
                trow[x] = static_cast<uint16_t>(
                    row[x - 1] * 64 + row[x] * 128 + row[x + 1] * 64);
            }
            trow[w - 1] = static_cast<uint16_t>(
                row[w - 2] * 64 + row[w - 1] * 128 + row[w - 2] * 64);
        };
        auto slot = [&](int64_t y) { return ring3.data() + (y % 3) * w; };
        hpass(0, slot(0));
        if (h > 1) hpass(1, slot(1));
        for (int64_t y = 0; y < h; ++y) {
            int64_t yu = y == 0 ? 1 : y - 1;
            int64_t yd = y == h - 1 ? h - 2 : y + 1;
            if (yd == y + 1 && y + 1 >= 2) hpass(y + 1, slot(y + 1));
            const uint16_t* ru = slot(yu);
            const uint16_t* rm = slot(y);
            const uint16_t* rd = slot(yd);
            uint8_t* out = tl_blur.data() + y * w;
            int64_t x = 0;
#ifdef YSMR_AVX512
            // ((ru + rd) << 6) + (rm << 7) + 2^15 >> 16 in u32 lanes
            // (max 255*256*256 + 2^15 < 2^32)
            const __m512i rnd16 = _mm512_set1_epi32(1 << 15);
            for (; x + 16 <= w; x += 16) {
                __m512i u = _mm512_cvtepu16_epi32(_mm256_loadu_si256(
                    reinterpret_cast<const __m256i*>(ru + x)));
                __m512i m = _mm512_cvtepu16_epi32(_mm256_loadu_si256(
                    reinterpret_cast<const __m256i*>(rm + x)));
                __m512i d = _mm512_cvtepu16_epi32(_mm256_loadu_si256(
                    reinterpret_cast<const __m256i*>(rd + x)));
                __m512i acc = _mm512_add_epi32(
                    _mm512_add_epi32(_mm512_slli_epi32(_mm512_add_epi32(u, d), 6),
                                     _mm512_slli_epi32(m, 7)),
                    rnd16);
                __m128i v8 = _mm512_cvtepi32_epi8(_mm512_srli_epi32(acc, 16));
                _mm_storeu_si128(reinterpret_cast<__m128i*>(out + x), v8);
            }
#endif
            for (; x < w; ++x) {
                out[x] = static_cast<uint8_t>(
                    (static_cast<uint32_t>(ru[x]) * 64 +
                     static_cast<uint32_t>(rm[x]) * 128 +
                     static_cast<uint32_t>(rd[x]) * 64 + (1u << 15)) >> 16);
            }
        }
    }
    if (need_adaptive_mean) {
        // plane-wise on purpose: a row-wise threshold fusion was measured
        // slower (store-to-load forwarding stalls on the just-written mean
        // row); the 1.1 MB plane stays in LLC between the stages
        tl_mean.resize(h * w);
        static thread_local MeanRing ring;
        ring.start(h, w);
        int64_t y = 0;
        for (; y < std::min<int64_t>(5, h); ++y) {
            ring.mean_row(h, y, tl_mean.data() + y * w);
        }
        for (; y + 3 < h && y + 8 < h; y += 4) {
            ring.mean_rows4(h, y, tl_mean.data() + y * w, w);
        }
        for (; y < h; ++y) {
            ring.mean_row(h, y, tl_mean.data() + y * w);
        }
    }
}


}  // namespace

extern "C" {

// Stage 1: BGR (or gray) -> gray -> blur3 (+ adaptive mean when needed).
// Returns gray integer sums for meanStdDev parity via out_stats[0..1]:
// sum, sum of squares (as double) when out_stats != nullptr.
void preprocess_stage1(const uint8_t* img, int64_t h, int64_t w,
                       int channels, int need_adaptive_mean,
                       double* out_stats) {
    tl_h = h; tl_w = w;
    tl_gray.resize(h * w);
    tl_blur.resize(h * w);
    if (channels == 3) {
        ysmr_gray::bgr_to_gray(img, h * w, tl_gray.data());
    } else {
        std::memcpy(tl_gray.data(), img, h * w);
    }
    stage1_from_gray(h, w, need_adaptive_mean, out_stats);
}

// Entry points for the libav exact-decode module (avdec.cpp): the decoder
// writes the gray plane straight into this thread's stage-1 buffer (no
// intermediate BGR image on the Python side), then stage 1 runs from it.
uint8_t* stage1_acquire_gray(int64_t h, int64_t w) {
    if (h <= 0 || w <= 0 || h * w > (int64_t(1) << 28)) return nullptr;
    try {
        tl_gray.resize(h * w);
        tl_blur.resize(h * w);
    } catch (const std::bad_alloc&) {
        return nullptr;
    }
    tl_h = h; tl_w = w;
    return tl_gray.data();
}

void stage1_run_from_gray(int64_t h, int64_t w, int need_adaptive_mean,
                          double* out_stats) {
    stage1_from_gray(h, w, need_adaptive_mean, out_stats);
}

#ifdef YSMR_WITH_JPEG
// Fused JPEG decode (grayscale) + stage 1: libjpeg decodes luma scanlines
// straight into the thread's gray buffer — no intermediate image object,
// no extra copies. Returns 0 on success, writing the frame dims to
// out_dims[0..1]; nonzero on decode failure (caller falls back to the
// cv2 path). The JPEG must carry its Huffman tables (cv2/FFmpeg MJPG
// writers do; some camera MJPG streams omit them — those fall back).
int64_t decode_jpeg_gray_stage1(const uint8_t* jpg, int64_t len,
                                int need_adaptive_mean, double* out_stats,
                                int64_t* out_dims) {
    jpeg_decompress_struct cinfo;
    JpegErrorMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = ysmr_jpeg_error_exit;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, jpg, static_cast<unsigned long>(len));
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_GRAYSCALE;
    jpeg_start_decompress(&cinfo);
    const int64_t h = cinfo.output_height;
    const int64_t w = cinfo.output_width;
    // header dims are untrusted input: cap the allocation (256 Mpx) and keep
    // std::bad_alloc from unwinding through this extern "C" boundary
    if (h <= 0 || w <= 0 || h * w > (int64_t(1) << 28)) {
        jpeg_destroy_decompress(&cinfo);
        return 2;
    }
    tl_h = h; tl_w = w;
    try {
        tl_gray.resize(h * w);
        tl_blur.resize(h * w);
    } catch (const std::bad_alloc&) {
        jpeg_destroy_decompress(&cinfo);
        return 3;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row = tl_gray.data() +
                       static_cast<int64_t>(cinfo.output_scanline) * w;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    out_dims[0] = h;
    out_dims[1] = w;
    stage1_from_gray(h, w, need_adaptive_mean, out_stats);
    return 0;
}
#endif  // YSMR_WITH_JPEG

// Stage 2: threshold + foreground extraction from the stage-1 buffers.
// mode: 0 = single adaptive, 1 = adaptive double, 2 = global (mean) threshold
// white: THRESH_BINARY when nonzero, else THRESH_BINARY_INV
// c_mask / c_marker: the C offsets as the reference passes them
// global_thresh: integer threshold for mode 2
int64_t preprocess_stage2(int mode, int white, double c_mask, double c_marker,
                          int64_t global_thresh, int16_t* xs, int16_t* ys,
                          uint8_t* flags, int64_t max_out) {
    const int64_t h = tl_h, w = tl_w;
    int64_t count = 0;
    const int32_t im = white ? -static_cast<int32_t>(std::ceil(c_mask))
                             : -static_cast<int32_t>(std::floor(c_mask));
    const int32_t ik = white ? -static_cast<int32_t>(std::ceil(c_marker))
                             : -static_cast<int32_t>(std::floor(c_marker));
#ifdef YSMR_AVX512
    // s16 compares in mask registers; foreground is sparse, so only the
    // set bits of each 64-pixel block pay the scalar emission cost.
    const int32_t thr = mode == 2
        ? static_cast<int32_t>(std::min<int64_t>(
              std::max<int64_t>(global_thresh, -32768), 32767))
        : im;
    const __m512i vthr = _mm512_set1_epi16(static_cast<int16_t>(thr));
    const __m512i vik = _mm512_set1_epi16(static_cast<int16_t>(ik));
    for (int64_t y = 0; y < h; ++y) {
        const uint8_t* b = tl_blur.data() + y * w;
        const uint8_t* m = (mode != 2) ? tl_mean.data() + y * w : nullptr;
        for (int64_t x0 = 0; x0 < w; x0 += 64) {
            const int rem = static_cast<int>(std::min<int64_t>(64, w - x0));
            const __mmask64 ld = rem == 64 ? ~0ull : ((1ull << rem) - 1);
            __m512i bv = _mm512_maskz_loadu_epi8(ld, b + x0);
            __m512i dl, dh;
            if (mode == 2) {
                dl = _mm512_cvtepu8_epi16(_mm512_castsi512_si256(bv));
                dh = _mm512_cvtepu8_epi16(_mm512_extracti64x4_epi64(bv, 1));
            } else {
                __m512i mv = _mm512_maskz_loadu_epi8(ld, m + x0);
                dl = _mm512_sub_epi16(
                    _mm512_cvtepu8_epi16(_mm512_castsi512_si256(bv)),
                    _mm512_cvtepu8_epi16(_mm512_castsi512_si256(mv)));
                dh = _mm512_sub_epi16(
                    _mm512_cvtepu8_epi16(_mm512_extracti64x4_epi64(bv, 1)),
                    _mm512_cvtepu8_epi16(_mm512_extracti64x4_epi64(mv, 1)));
            }
            uint64_t in_mask, mk = 0;
            if (white) {
                in_mask = static_cast<uint64_t>(
                              _mm512_cmpgt_epi16_mask(dl, vthr)) |
                          (static_cast<uint64_t>(
                               _mm512_cmpgt_epi16_mask(dh, vthr)) << 32);
                if (mode == 1) {
                    mk = static_cast<uint64_t>(
                             _mm512_cmpgt_epi16_mask(dl, vik)) |
                         (static_cast<uint64_t>(
                              _mm512_cmpgt_epi16_mask(dh, vik)) << 32);
                }
            } else {
                in_mask = static_cast<uint64_t>(
                              _mm512_cmp_epi16_mask(dl, vthr, _MM_CMPINT_LE)) |
                          (static_cast<uint64_t>(_mm512_cmp_epi16_mask(
                               dh, vthr, _MM_CMPINT_LE)) << 32);
                if (mode == 1) {
                    mk = static_cast<uint64_t>(
                             _mm512_cmp_epi16_mask(dl, vik, _MM_CMPINT_LE)) |
                         (static_cast<uint64_t>(_mm512_cmp_epi16_mask(
                              dh, vik, _MM_CMPINT_LE)) << 32);
                }
            }
            in_mask &= ld;
            while (in_mask) {
                const int bit = __builtin_ctzll(in_mask);
                in_mask &= in_mask - 1;
                if (count < max_out) {
                    xs[count] = static_cast<int16_t>(x0 + bit);
                    ys[count] = static_cast<int16_t>(y);
                    flags[count] = static_cast<uint8_t>((mk >> bit) & 1);
                }
                ++count;
            }
        }
    }
    return count;
#else
    for (int64_t y = 0; y < h; ++y) {
        const uint8_t* b = tl_blur.data() + y * w;
        const uint8_t* m = (mode != 2) ? tl_mean.data() + y * w : nullptr;
        for (int64_t x = 0; x < w; ++x) {
            bool in_mask, in_marker = false;
            if (mode == 2) {
                in_mask = white ? (b[x] > global_thresh)
                                : (b[x] <= global_thresh);
            } else {
                int32_t d = static_cast<int32_t>(b[x]) - m[x];
                in_mask = white ? (d > im) : (d <= im);
                if (mode == 1 && in_mask) {
                    in_marker = white ? (d > ik) : (d <= ik);
                }
            }
            if (in_mask) {
                if (count < max_out) {
                    xs[count] = static_cast<int16_t>(x);
                    ys[count] = static_cast<int16_t>(y);
                    flags[count] = static_cast<uint8_t>(in_marker ? 1 : 0);
                }
                ++count;
            }
        }
    }
    return count;
#endif
}

// Packed-wire variant of stage 2: one uint32 per foreground pixel,
// bits 0..30 = linear index (y*w + x), bit 31 = marker membership.
// Halves nothing on its own vs (x16,y16,m8) — it saves 20 % of the wire
// and collapses three arrays into one for stacking/transfer.
int64_t preprocess_stage2_packed(int mode, int white, double c_mask,
                                 double c_marker, int64_t global_thresh,
                                 uint32_t* out, int64_t max_out) {
    const int64_t w = tl_w;
    static thread_local std::vector<int16_t> xs_v, ys_v;
    static thread_local std::vector<uint8_t> fl_v;
    if (static_cast<int64_t>(xs_v.size()) < max_out) {
        xs_v.resize(max_out);
        ys_v.resize(max_out);
        fl_v.resize(max_out);
    }
    int64_t count = preprocess_stage2(mode, white, c_mask, c_marker,
                                      global_thresh, xs_v.data(), ys_v.data(),
                                      fl_v.data(), max_out);
    const int64_t n = std::min(count, max_out);
    for (int64_t i = 0; i < n; ++i) {
        out[i] = static_cast<uint32_t>(
                     static_cast<int64_t>(ys_v[i]) * w + xs_v[i]) |
                 (fl_v[i] ? 0x80000000u : 0u);
    }
    return count;
}

// Fused stage 2 for the adaptive modes (0/1): adaptive mean + threshold +
// extraction in one pass over tl_blur (stage 1 must have run with
// need_adaptive_mean=0 — tl_mean is never materialized). Bit-identical
// output to stage1(need_mean=1) + preprocess_stage2_packed; returns the
// total foreground count (writes clamped to max_out), or -1 for an
// unsupported mode.
int64_t preprocess_stage2_fused(int mode, int white, double c_mask,
                                double c_marker, uint32_t* out,
                                int64_t max_out) {
    if (mode != 0 && mode != 1) return -1;
    return fused_mean_threshold_packed(tl_h, tl_w, mode, white, c_mask,
                                       c_marker, out, max_out);
}

// Grayscale values at given pixels from the stage-1 gray buffer (luminosity).
void gray_at_pixels(const int16_t* xs, const int16_t* ys, int64_t n,
                    int16_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        out[i] = tl_gray[static_cast<int64_t>(ys[i]) * tl_w + xs[i]];
    }
}

}  // extern "C"

extern "C" {

// Run-length-encode a packed foreground-pixel wire (batch form).
//
// The pixel wire ships one uint32 per foreground pixel; at dense scenes
// that is the dominant host->device transfer (e.g. ~100k px/frame =
// 6.5 MB per 16-frame batch at ~32 MB/s). Foreground pixels come in
// raster order and blobs are horizontal runs, so run-length encoding cuts
// the wire ~4-5x; the device expands runs back to the identical pixel
// table with vector scans (detect_from_pixels).
//
// packed:     [t, f] uint32 raster-order pixels (bits 0..30 = y*w+x,
//             bit 31 = marker)
// counts:     [t] int32 valid pixels per frame
// out_runs:   [t, r] uint32 — bits 0..25 start lin, bit 26 marker,
//             bits 27..31 length (1..31); runs break on non-consecutive
//             lin, marker change, or length 31
// out_counts: [t] int32 runs per frame
//
// Returns the max runs in any frame (the caller picks the transfer
// bucket), -1 if any frame needs more than r runs, or -2 if a linear
// index does not fit the 26-bit start field (caller falls back to the
// pixel wire in both cases).
int64_t encode_runs_batch(const uint32_t* packed, const int32_t* counts,
                          int64_t t, int64_t f, uint32_t* out_runs,
                          int64_t r, int32_t* out_counts, int64_t w) {
    int64_t max_runs = 0;
    for (int64_t ti = 0; ti < t; ++ti) {
        const uint32_t* pp = packed + ti * f;
        uint32_t* orow = out_runs + ti * r;
        int64_t n = counts[ti] < f ? counts[ti] : f;
        if (n < 0) n = 0;
        int64_t nr = 0;
        int64_t i = 0;
        while (i < n) {
            uint32_t lin = pp[i] & 0x7fffffffu;
            if (lin >= (1u << 26)) return -2;
            uint32_t marker = pp[i] >> 31;
            // runs never cross a row boundary (w > 0): the device run-graph
            // CC needs per-row intervals, and the split costs nothing (a
            // wrap is a new run either way for any consumer)
            int64_t cap = 31;
            if (w > 0) {
                int64_t room = w - static_cast<int64_t>(lin) % w;
                if (room < cap) cap = room;
            }
            int64_t len = 1;
            while (len < cap && i + len < n) {
                uint32_t q = pp[i + len];
                if ((q & 0x7fffffffu) != lin + static_cast<uint32_t>(len) ||
                    (q >> 31) != marker)
                    break;
                ++len;
            }
            if (nr >= r) return -1;
            orow[nr++] = lin | (marker << 26) |
                         (static_cast<uint32_t>(len) << 27);
            i += len;
        }
        out_counts[ti] = static_cast<int32_t>(nr);
        if (nr > max_runs) max_runs = nr;
    }
    return max_runs;
}

// Expand per-RUN detection indices to the per-pixel wire-order table
// (host-rect mode with the runs det readback): each run's det index
// repeats for its length field (bits 27..31); pixels beyond the frame's
// runs are -1. Exact by the encode_runs_batch contract — the encoder
// consumed the packed pixels in order, so repeating by length reproduces
// the wire-order per-pixel table the device used to ship whole. The
// Python/numpy version of this loop (np.repeat per frame) cost
// ~1-2 ms/frame of the dense-exact det_readback budget.
void expand_run_det(const uint32_t* runs, const int32_t* run_counts,
                    const int16_t* det_run, int64_t t, int64_t rs,
                    int64_t ds, int64_t f, int16_t* out) {
    for (int64_t ti = 0; ti < t; ++ti) {
        const uint32_t* rr = runs + ti * rs;
        const int16_t* dr = det_run + ti * ds;
        int16_t* orow = out + ti * f;
        int64_t n = run_counts[ti];
        if (n > rs) n = rs;
        if (n > ds) n = ds;
        if (n < 0) n = 0;
        int64_t pos = 0;
        for (int64_t k = 0; k < n; ++k) {
            int64_t len = rr[k] >> 27;
            int16_t d = dr[k];
            if (len > f - pos) len = f - pos;
            for (int64_t j = 0; j < len; ++j) orow[pos + j] = d;
            pos += len;
        }
        for (; pos < f; ++pos) orow[pos] = -1;
    }
}

}  // extern "C"
