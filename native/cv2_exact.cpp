// Bit-exact replica of cv2.minAreaRect(findContours(...)) measurements.
//
// Native port of ysmr_tpu/ops/cv2_exact.py (the readable reference
// implementation; see its docstring for the algorithm provenance — the
// float32 caliper arithmetic was reconstructed from the disassembly of this
// cv2 build's cv::minAreaRect and fuzz-verified to the last bit).
//
// Replicates the reference pipeline's per-detection measurement
// (/root/reference/ysmr/track_eval.py:273,287): Moore border following with
// Jacob's stopping criterion + CHAIN_APPROX_SIMPLE corner compression, cv2's
// convexHull ordering (pointer sort, Sklansky chains, collinear clamp,
// monotone-index-cycle rotation), and the f32 rotating calipers.
//
// This TU must be compiled WITHOUT fp contraction (-ffp-contract=off): a
// fused multiply-add anywhere in the caliper arithmetic changes the rounding
// and breaks bit parity with cv2's SSE2 scalar code.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// direction coding: 0=E 1=NE 2=N 3=NW 4=W 5=SW 6=S 7=SE (y down)
const int DX[8] = {1, 1, 0, -1, -1, -1, 0, 1};
const int DY[8] = {0, -1, -1, -1, 0, 1, 1, 1};

struct Pt {
    int x, y;
    bool operator==(const Pt& o) const { return x == o.x && y == o.y; }
};

// ---------------------------------------------------------------------------
// contour: Moore border following + CHAIN_APPROX_SIMPLE
// ---------------------------------------------------------------------------

// mask: row-major lh x lw bitmap (1 byte/px), (sy,sx) = raster-first pixel.
// Appends the SIMPLE-compressed contour to out.
void trace_contour(const uint8_t* mask, int lh, int lw, int sy, int sx,
                   std::vector<Pt>& raw, std::vector<Pt>& out) {
    raw.clear();
    out.clear();
    auto fg = [&](int y, int x) -> bool {
        return y >= 0 && y < lh && x >= 0 && x < lw && mask[y * lw + x] != 0;
    };
    int first_d = -1;
    for (int k = 0; k < 8; ++k) {
        int d = (4 + k) & 7;
        if (fg(sy + DY[d], sx + DX[d])) { first_d = d; break; }
    }
    if (first_d < 0) {
        out.push_back({sx, sy});
        return;
    }
    raw.push_back({sx, sy});
    int y = sy + DY[first_d], x = sx + DX[first_d];
    int move_d = first_d;
    for (;;) {
        if (y == sy && x == sx) {
            int back = (move_d + 4) & 7;
            int nd = first_d;
            for (int k = 1; k <= 8; ++k) {
                int d = (back + k) & 7;
                if (fg(y + DY[d], x + DX[d])) { nd = d; break; }
            }
            if (nd == first_d) break;
            raw.push_back({x, y});
            move_d = nd;
            y += DY[nd];
            x += DX[nd];
            continue;
        }
        raw.push_back({x, y});
        int back = (move_d + 4) & 7;
        int nd = -1;
        for (int k = 1; k <= 8; ++k) {
            int d = (back + k) & 7;
            if (fg(y + DY[d], x + DX[d])) { nd = d; break; }
        }
        move_d = nd;
        y += DY[nd];
        x += DX[nd];
    }
    int n = static_cast<int>(raw.size());
    if (n <= 2) {
        out = raw;
        return;
    }
    for (int i = 0; i < n; ++i) {
        const Pt& p = raw[i];
        const Pt& q = raw[(i + 1) % n];
        const Pt& r = raw[(i + n - 1) % n];
        if (p.x - r.x != q.x - p.x || p.y - r.y != q.y - p.y)
            out.push_back(p);
    }
}

// ---------------------------------------------------------------------------
// convexHull: cv2 ordering semantics for int points
// ---------------------------------------------------------------------------

inline int sign64(int64_t v) { return v > 0 ? 1 : (v < 0 ? -1 : 0); }

// One Sklansky chain over the sorted view sp at positions
// base + k*stepdir... we emulate OpenCV's pointer arithmetic: at(i) is
// sp[off0 + i], valid for the forward (off0=0) and reverse (off0=total-1)
// views used by the four chains.
int sklansky(const Pt* sp, int off0, int start, int end, int* stack,
             int nsign, int sign2) {
    int incr = end > start ? 1 : -1;
    int pprev = start, pcur = start + incr, pnext = start + 2 * incr;
    if (start == end || sp[off0 + start] == sp[off0 + end]) {
        stack[0] = start;
        return 1;
    }
    int stacksize = 3;
    stack[0] = pprev;
    stack[1] = pcur;
    stack[2] = pnext;
    end += incr;
    while (pnext != end) {
        int cury = sp[off0 + pcur].y;
        int by = sp[off0 + pnext].y - cury;
        if (sign64(by) != nsign) {
            int64_t ax = sp[off0 + pcur].x - sp[off0 + pprev].x;
            int64_t bx = sp[off0 + pnext].x - sp[off0 + pcur].x;
            int64_t ay = cury - sp[off0 + pprev].y;
            int64_t convexity = ay * bx - ax * static_cast<int64_t>(by);
            if (sign64(convexity) == sign2 && (ax != 0 || ay != 0)) {
                pprev = pcur;
                pcur = pnext;
                pnext += incr;
                stack[stacksize] = pnext;
                ++stacksize;
            } else if (pprev == start) {
                pcur = pnext;
                stack[1] = pcur;
                pnext += incr;
                stack[2] = pnext;
            } else {
                stack[stacksize - 2] = pnext;
                pcur = pprev;
                pprev = stack[stacksize - 4];
                --stacksize;
            }
        } else {
            pnext += incr;
            stack[stacksize - 1] = pnext;
        }
    }
    return stacksize - 1;
}

struct HullScratch {
    std::vector<int> order;       // sorted positions -> original index
    std::vector<Pt> sp;           // sorted points
    std::vector<int> tl, tr, bl, br, outbuf, rotbuf;
};

// Returns hull as original-index list (cv2 rotation included) in out.
void convex_hull_cv(const Pt* pts, int total, bool clockwise,
                    HullScratch& s, std::vector<int>& out) {
    out.clear();
    if (total == 0) return;
    s.order.resize(total);
    for (int i = 0; i < total; ++i) s.order[i] = i;
    std::sort(s.order.begin(), s.order.end(), [&](int a, int b) {
        if (pts[a].x != pts[b].x) return pts[a].x < pts[b].x;
        if (pts[a].y != pts[b].y) return pts[a].y < pts[b].y;
        return a < b;
    });
    s.sp.resize(total);
    for (int i = 0; i < total; ++i) s.sp[i] = pts[s.order[i]];
    const Pt* sp = s.sp.data();
    int miny_ind = 0, maxy_ind = 0;
    for (int i = 1; i < total; ++i) {
        int y = sp[i].y;
        if (sp[miny_ind].y > y) miny_ind = i;
        if (sp[maxy_ind].y < y) maxy_ind = i;
    }
    if (sp[0] == sp[total - 1]) {
        out.push_back(s.order[0]);
        return;
    }
    s.tl.resize(total + 2);
    s.tr.resize(total + 2);
    s.bl.resize(total + 2);
    s.br.resize(total + 2);
    int tl_count = sklansky(sp, 0, 0, maxy_ind, s.tl.data(), -1, 1);
    int tr_count = sklansky(sp, total - 1, 0, maxy_ind - total + 1,
                            s.tr.data(), -1, -1);
    const int* tl_stack = s.tl.data();
    const int* tr_stack = s.tr.data();
    int tl_base = 0, tr_base = total - 1;
    if (!clockwise) {
        std::swap(tl_stack, tr_stack);
        std::swap(tl_count, tr_count);
        std::swap(tl_base, tr_base);
    }
    std::vector<int>& nout = s.outbuf;
    nout.clear();
    for (int i = 0; i < tl_count - 1; ++i)
        nout.push_back(tl_base + tl_stack[i]);
    for (int i = tr_count - 1; i > 0; --i)
        nout.push_back(tr_base + tr_stack[i]);
    int stop_idx = tr_count > 2 ? tr_base + tr_stack[1]
                 : (tl_count > 2 ? tl_base + tl_stack[tl_count - 2] : -1);

    int bl_count = sklansky(sp, 0, 0, miny_ind, s.bl.data(), 1, -1);
    int br_count = sklansky(sp, total - 1, 0, miny_ind - total + 1,
                            s.br.data(), 1, 1);
    const int* bl_stack = s.bl.data();
    const int* br_stack = s.br.data();
    int bl_base = 0, br_base = total - 1;
    if (clockwise) {
        std::swap(bl_stack, br_stack);
        std::swap(bl_count, br_count);
        std::swap(bl_base, br_base);
    }
    if (stop_idx >= 0) {
        int check_idx = bl_count > 2 ? bl_base + bl_stack[1]
                      : (bl_count + br_count > 2
                         ? br_base + br_stack[2 - bl_count] : -1);
        if (check_idx == stop_idx ||
            (check_idx >= 0 && sp[check_idx] == sp[stop_idx])) {
            bl_count = std::min(bl_count, 2);
            br_count = std::min(br_count, 2);
        }
    }
    for (int i = 0; i < bl_count - 1; ++i)
        nout.push_back(bl_base + bl_stack[i]);
    for (int i = br_count - 1; i > 0; --i)
        nout.push_back(br_base + br_stack[i]);

    int n = static_cast<int>(nout.size());
    for (int i = 0; i < n; ++i) nout[i] = s.order[nout[i]];
    if (n >= 3) {
        // rotate a monotone index cycle to its min/max original index
        // (OpenCV issue 13954 normalization)
        int min_idx = 0, max_idx = 0, lt = 0;
        for (int i = 1; i < n; ++i) {
            int idx = nout[i];
            lt += nout[i - 1] < idx;
            if (nout[min_idx] > idx) min_idx = i;
            if (nout[max_idx] < idx) max_idx = i;
        }
        int mmdist = std::abs(max_idx - min_idx);
        if ((mmdist == 1 || mmdist == n - 1) && (lt <= 1 || lt >= n - 2)) {
            bool ascending = (max_idx + 1) % n == min_idx;
            int i0 = ascending ? min_idx : max_idx;
            if (i0 > 0) {
                std::vector<int>& rot = s.rotbuf;
                rot.clear();
                int j = i0;
                bool ok = true;
                for (int i = 0; i < n; ++i) {
                    int curr = nout[j];
                    rot.push_back(curr);
                    int next_j = j + 1 < n ? j + 1 : 0;
                    if (i < n - 1 && (ascending != (curr < nout[next_j]))) {
                        ok = false;
                        break;
                    }
                    j = next_j;
                }
                if (ok) nout = rot;
            }
        }
    }
    out = nout;
}

// ---------------------------------------------------------------------------
// rotating calipers: cv2 5.0 float32 arithmetic
// ---------------------------------------------------------------------------

struct Rect5 {
    float cx, cy, w, h, angle;
};

// P: hull points (float32-exact integer values) in hull order, n > 2.
Rect5 calipers_cv(const Pt* hull, int n, std::vector<float>& vbuf) {
    vbuf.resize(static_cast<size_t>(n) * 3);
    float* vx = vbuf.data();
    float* vy = vx + n;
    float* ivl = vy + n;
    int left = 0, right = 0, top = 0, bottom = 0;
    float pt0x = static_cast<float>(hull[0].x);
    float pt0y = static_cast<float>(hull[0].y);
    float left_x = pt0x, right_x = pt0x, top_y = pt0y, bottom_y = pt0y;
    for (int i = 0; i < n; ++i) {
        if (pt0x < left_x) { left_x = pt0x; left = i; }
        if (pt0x > right_x) { right_x = pt0x; right = i; }
        if (pt0y > top_y) { top_y = pt0y; top = i; }
        if (pt0y < bottom_y) { bottom_y = pt0y; bottom = i; }
        int ni = i + 1 < n ? i + 1 : 0;
        float ptx = static_cast<float>(hull[ni].x);
        float pty = static_cast<float>(hull[ni].y);
        float dxf = ptx - pt0x;
        float dyf = pty - pt0y;
        vx[i] = dxf;
        vy[i] = dyf;
        ivl[i] = static_cast<float>(
            1.0 / std::sqrt(static_cast<double>(dxf) * dxf +
                            static_cast<double>(dyf) * dyf));
        pt0x = ptx;
        pt0y = pty;
    }
    int seq[4] = {bottom, right, top, left};
    float minarea = 3.4028234663852886e38f;
    int buf_l = 0, buf_b = 0;
    float buf_a = 0.f, buf_bb = 0.f, buf_w = 0.f, buf_h = 0.f;
    for (int k = 0; k < n; ++k) {
        float e0x = vx[seq[0]], e0y = vy[seq[0]];
        float e1x = vx[seq[1]], e1y = vy[seq[1]];
        float e2x = vx[seq[2]], e2y = vy[seq[2]];
        float e3x = vx[seq[3]], e3y = vy[seq[3]];
        float t1 = (-e1x) * e0x - e1y * e0y;
        float cx_, cy_;
        int main_e;
        if (t1 < 0.f) {
            cx_ = e1y; cy_ = -e1x; main_e = 1;
        } else {
            cx_ = e0x; cy_ = e0y; main_e = 0;
        }
        float t2 = (-e2y) * cx_ + e2x * cy_;
        if (t2 < 0.f) {
            cx_ = -e2x; cy_ = -e2y; main_e = 2;
        }
        float t3 = cx_ * e3x + cy_ * e3y;
        if (t3 < 0.f) main_e = 3;
        int idx = seq[main_e];
        float iv = ivl[idx];
        float lx = vx[idx] * iv;
        float ly = vy[idx] * iv;
        float a, b;
        switch (main_e) {
            case 0: a = lx; b = ly; break;
            case 1: a = ly; b = -lx; break;
            case 2: a = -lx; b = -ly; break;
            default: a = -ly; b = lx; break;
        }
        seq[main_e] = seq[main_e] + 1 == n ? 0 : seq[main_e] + 1;
        float dx = static_cast<float>(hull[seq[1]].x) -
                   static_cast<float>(hull[seq[3]].x);
        float dy = static_cast<float>(hull[seq[1]].y) -
                   static_cast<float>(hull[seq[3]].y);
        float width = dx * a + dy * b;
        float dx2 = static_cast<float>(hull[seq[2]].x) -
                    static_cast<float>(hull[seq[0]].x);
        float dy2 = static_cast<float>(hull[seq[2]].y) -
                    static_cast<float>(hull[seq[0]].y);
        float height = dy2 * a - dx2 * b;
        float area = width * height;
        if (area <= minarea) {
            minarea = area;
            buf_l = seq[3];
            buf_b = seq[0];
            buf_a = a;
            buf_bb = b;
            buf_w = width;
            buf_h = height;
        }
    }
    float a = buf_a, b = buf_bb, nb = -b;
    float c1 = static_cast<float>(hull[buf_l].x) * a +
               static_cast<float>(hull[buf_l].y) * b;
    float c2 = static_cast<float>(hull[buf_b].x) * nb +
               static_cast<float>(hull[buf_b].y) * a;
    float det = a * a - nb * b;
    float idet = 1.0f / det;
    float px = (c1 * a - c2 * b) * idet;
    float py = (c2 * a - c1 * nb) * idet;
    float o1x = a * buf_w, o1y = b * buf_w;
    float o2x = nb * buf_h, o2y = a * buf_h;
    Rect5 r;
    r.cx = (o1x + o2x) * 0.5f + px;
    r.cy = (o1y + o2y) * 0.5f + py;
    float sz_w = static_cast<float>(
        std::sqrt(static_cast<double>(o2x) * o2x +
                  static_cast<double>(o2y) * o2y));
    float sz_h = static_cast<float>(
        std::sqrt(static_cast<double>(o1x) * o1x +
                  static_cast<double>(o1y) * o1y));
    if (o1x == 0.f && o1y > 0.f) {
        r.w = sz_h;
        r.h = sz_w;
        r.angle = -90.0f;
    } else {
        r.w = sz_w;
        r.h = sz_h;
        r.angle = static_cast<float>(
            std::atan2(static_cast<double>(o1x),
                       static_cast<double>(o1y)) * (-180.0) / 3.141592653589793);
    }
    return r;
}

Rect5 min_area_rect_cv(const Pt* pts, int total, HullScratch& s,
                       std::vector<int>& hullidx, std::vector<Pt>& hullpts,
                       std::vector<float>& vbuf) {
    convex_hull_cv(pts, total, /*clockwise=*/false, s, hullidx);
    int n = static_cast<int>(hullidx.size());
    hullpts.resize(n);
    for (int i = 0; i < n; ++i) hullpts[i] = pts[hullidx[i]];
    Rect5 r;
    if (n > 2) return calipers_cv(hullpts.data(), n, vbuf);
    if (n == 1) {
        r.cx = static_cast<float>(hullpts[0].x);
        r.cy = static_cast<float>(hullpts[0].y);
        r.w = 0.f;
        r.h = 0.f;
        r.angle = -90.0f;
        return r;
    }
    float x0 = static_cast<float>(hullpts[0].x);
    float y0 = static_cast<float>(hullpts[0].y);
    float x1 = static_cast<float>(hullpts[1].x);
    float y1 = static_cast<float>(hullpts[1].y);
    r.cx = (x0 + x1) * 0.5f;
    r.cy = (y0 + y1) * 0.5f;
    float dx = x0 - x1;
    float dy = y0 - y1;
    float ln = static_cast<float>(
        std::sqrt(static_cast<double>(dx) * dx +
                  static_cast<double>(dy) * dy));
    if (dx == 0.f) {
        r.w = ln; r.h = 0.f; r.angle = -90.0f;
    } else if (dy < 0.f) {
        r.w = ln; r.h = 0.f;
        r.angle = static_cast<float>(
            std::atan2(static_cast<double>(dy),
                       static_cast<double>(dx)) * 180.0 / 3.141592653589793);
    } else if (dy == 0.f) {
        r.w = 0.f; r.h = ln; r.angle = -90.0f;
    } else {
        r.w = 0.f; r.h = ln;
        r.angle = static_cast<float>(
            std::atan2(static_cast<double>(dx),
                       static_cast<double>(dy)) * (-180.0) / 3.141592653589793);
    }
    return r;
}

struct FrameScratch {
    std::vector<int> det_count, det_off, det_fill;
    std::vector<int> px_x, px_y;      // per-det bucketed coords
    std::vector<int> bbox;            // per-det x0,y0,x1,y1
    std::vector<uint8_t> bitmap;
    std::vector<Pt> raw, cont;
    HullScratch hs;
    std::vector<int> hullidx;
    std::vector<Pt> hullpts;
    std::vector<float> vbuf;
};

}  // namespace

extern "C" {

// Bit-exact cv2 rect measurements for a batch of frames.
//
// px_packed: [t, f] uint32, bits 0..30 = y*w + x (raster order per frame);
//            only entries with det_idx >= 0 are used
// counts:    [t] int32 valid pixels per frame
// det_idx:   [t, f] int16 detection index per pixel (-1 = background /
//            dropped), indices < max_det
// out:       [t, max_det, 5] float32 (cx, cy, w, h, angle) — cv2 convention
// out_valid: [t, max_det] uint8
//
// Returns 0 on success, -1 on allocation failure.
int cv2_rects_batch(const uint32_t* px_packed, const int32_t* counts,
                    const int16_t* det_idx, int t, int f, int w, int max_det,
                    float* out, uint8_t* out_valid) {
    try {
        FrameScratch s;
        s.det_count.resize(max_det);
        s.det_off.resize(max_det + 1);
        s.det_fill.resize(max_det);
        s.bbox.resize(static_cast<size_t>(max_det) * 4);
        for (int ti = 0; ti < t; ++ti) {
            const uint32_t* pp = px_packed + static_cast<size_t>(ti) * f;
            const int16_t* di = det_idx + static_cast<size_t>(ti) * f;
            float* orow = out + static_cast<size_t>(ti) * max_det * 5;
            uint8_t* ovalid = out_valid + static_cast<size_t>(ti) * max_det;
            std::memset(ovalid, 0, max_det);
            std::memset(orow, 0, sizeof(float) * max_det * 5);
            int n = counts[ti];
            if (n > f) n = f;
            std::fill(s.det_count.begin(), s.det_count.end(), 0);
            for (int i = 0; i < n; ++i) {
                int d = di[i];
                if (d >= 0 && d < max_det) ++s.det_count[d];
            }
            int total = 0;
            for (int d = 0; d < max_det; ++d) {
                s.det_off[d] = total;
                total += s.det_count[d];
                s.det_fill[d] = s.det_off[d];
            }
            s.det_off[max_det] = total;
            s.px_x.resize(total);
            s.px_y.resize(total);
            for (int i = 0; i < n; ++i) {
                int d = di[i];
                if (d < 0 || d >= max_det) continue;
                uint32_t lin = pp[i] & 0x7fffffffu;
                int k = s.det_fill[d]++;
                s.px_x[k] = static_cast<int>(lin % static_cast<uint32_t>(w));
                s.px_y[k] = static_cast<int>(lin / static_cast<uint32_t>(w));
            }
            for (int d = 0; d < max_det; ++d) {
                int lo = s.det_off[d], hi = s.det_off[d + 1];
                if (lo == hi) continue;
                int x0 = s.px_x[lo], x1 = s.px_x[lo];
                int y0 = s.px_y[lo], y1 = s.px_y[lo];
                for (int i = lo + 1; i < hi; ++i) {
                    x0 = std::min(x0, s.px_x[i]);
                    x1 = std::max(x1, s.px_x[i]);
                    y0 = std::min(y0, s.px_y[i]);
                    y1 = std::max(y1, s.px_y[i]);
                }
                int lw = x1 - x0 + 1, lh = y1 - y0 + 1;
                s.bitmap.assign(static_cast<size_t>(lw) * lh, 0);
                for (int i = lo; i < hi; ++i)
                    s.bitmap[static_cast<size_t>(s.px_y[i] - y0) * lw +
                             (s.px_x[i] - x0)] = 1;
                // raster-first pixel: pixels arrive in raster order, so the
                // first bucketed pixel is it
                int sy = s.px_y[lo] - y0, sx = s.px_x[lo] - x0;
                trace_contour(s.bitmap.data(), lh, lw, sy, sx, s.raw, s.cont);
                for (auto& p : s.cont) { p.x += x0; p.y += y0; }
                Rect5 r = min_area_rect_cv(
                    s.cont.data(), static_cast<int>(s.cont.size()), s.hs,
                    s.hullidx, s.hullpts, s.vbuf);
                float* o = orow + static_cast<size_t>(d) * 5;
                o[0] = r.cx;
                o[1] = r.cy;
                o[2] = r.w;
                o[3] = r.h;
                o[4] = r.angle;
                ovalid[d] = 1;
            }
        }
        return 0;
    } catch (...) {
        return -1;
    }
}

// Single point-set entry (tests): pts_xy int32 [n,2] -> out float32 [5].
int cv2_min_area_rect_single(const int32_t* pts_xy, int n, float* out) {
    try {
        std::vector<Pt> pts(n);
        for (int i = 0; i < n; ++i) pts[i] = {pts_xy[2 * i], pts_xy[2 * i + 1]};
        HullScratch hs;
        std::vector<int> hullidx;
        std::vector<Pt> hullpts;
        std::vector<float> vbuf;
        Rect5 r = min_area_rect_cv(pts.data(), n, hs, hullidx, hullpts, vbuf);
        out[0] = r.cx;
        out[1] = r.cy;
        out[2] = r.w;
        out[3] = r.h;
        out[4] = r.angle;
        return 0;
    } catch (...) {
        return -1;
    }
}

}  // extern "C"
