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
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// CSV row formatting
// ---------------------------------------------------------------------------

static inline char* write_double(char* p, double v) {
    // shortest round-trip representation; integral values get a trailing .0
    // to match Python's str(float)
    if (v == static_cast<int64_t>(v) && std::fabs(v) < 1e15) {
        auto r = std::to_chars(p, p + 24, static_cast<int64_t>(v));
        p = r.ptr;
        *p++ = '.';
        *p++ = '0';
        return p;
    }
    auto r = std::to_chars(p, p + 32, v);
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
        double ang = std::fmod(bang * 180.0 / M_PI, 90.0);
        if (ang < 0) ang += 90.0;
        o[0] = static_cast<float>(bcx);
        o[1] = static_cast<float>(bcy);
        o[2] = static_cast<float>(bw);
        o[3] = static_cast<float>(bh);
        o[4] = static_cast<float>(ang);
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
