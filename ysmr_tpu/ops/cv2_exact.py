#!/usr/bin/env python3
"""Bit-exact replica of the reference's per-component rectangle measurement.

The reference measures every detection with
``cv2.minAreaRect(contour)`` on contours from
``cv2.findContours(thresh, RETR_EXTERNAL, CHAIN_APPROX_SIMPLE)``
(``/root/reference/ysmr/track_eval.py:273,287``).  cv2's rectangle CENTER
carries ~3e-4 px of float32 rounding noise from its caliper arithmetic, and
the GSFF mixture weights amplify those measurement differences ~200x at mode
transitions — reproducing the center bit-for-bit is the only way to reproduce
the reference's TRACK_ID numbering exactly (see STATUS.md).

This module replicates the full chain so its output equals cv2's to the last
bit, verified by fuzz tests against the installed cv2 (tests/test_cv2_exact.py):

1. ``trace_contour`` — Moore border following with Jacob's stopping criterion
   (8-connectivity outer border, counterclockwise in image coords, starting
   at the component's raster-first pixel) + CHAIN_APPROX_SIMPLE compression
   (keep direction-change corners of the cyclic chain).
2. ``convex_hull_cv`` — cv2.convexHull semantics for int points: pointers
   sorted by (x, y, position), Sklansky chains, the collinear-degeneracy
   clamp, and the monotone-index-cycle rotation normalization (OpenCV issue
   13954).  The output ROTATION depends on the input order, which is why the
   contour sequence itself must be replicated.
3. ``calipers_cv`` — the float32 rotating-calipers arithmetic of this cv2
   build (reconstructed from the disassembly of cv::minAreaRect and verified
   bit-for-bit): edge selection by exact integer cross/dot sign chains, base
   normalization lead*f32(1/sqrt(float64(dx^2+dy^2))), float32 support dot
   products, area replace on <=, center from an f32 line intersection, sizes
   (|out2|, |out1|) via float64 hypot rounded once, angle
   f32(atan2(out1.x, out1.y) * -180 / pi) in float64 rounded once, and the
   special cases (vertical base, 1- and 2-point hulls).

The production path runs the same algorithm in native C++
(``native/ysmr_native.cpp cv2_rects_batch``); this module is the readable
reference implementation the native code is tested against.

Known deviation (pre-existing, pipeline-level): RETR_EXTERNAL omits
components nested inside another component's hole; the device labeler finds
them.  Bacteria scenes have no nested components.
"""

import numpy as np

f32 = np.float32
f64 = np.float64

# direction coding: 0=E 1=NE 2=N 3=NW 4=W 5=SW 6=S 7=SE (y down)
_DX = (1, 1, 0, -1, -1, -1, 0, 1)
_DY = (0, -1, -1, -1, 0, 1, 1, 1)


def trace_contour(mask, sy, sx):
    """CHAIN_APPROX_SIMPLE outer border of the component containing (sy,sx).

    :param mask: 2D array, nonzero = foreground (only the one component's
        pixels may be set in the traced neighbourhood)
    :param sy, sx: the component's raster-first pixel
    :return: list of (x, y) — cv2.findContours point sequence
    """
    h, w = mask.shape

    def fg(y, x):
        return 0 <= y < h and 0 <= x < w and mask[y, x] != 0

    first_d = -1
    for k in range(8):
        d = (4 + k) % 8
        if fg(sy + _DY[d], sx + _DX[d]):
            first_d = d
            break
    if first_d < 0:
        return [(sx, sy)]

    pts = [(sx, sy)]
    y, x = sy + _DY[first_d], sx + _DX[first_d]
    move_d = first_d
    while True:
        if (y, x) == (sy, sx):
            back = (move_d + 4) % 8
            nd = first_d
            for k in range(1, 9):
                d = (back + k) % 8
                if fg(y + _DY[d], x + _DX[d]):
                    nd = d
                    break
            if nd == first_d:
                break
            pts.append((x, y))
            move_d = nd
            y, x = y + _DY[nd], x + _DX[nd]
            continue
        pts.append((x, y))
        back = (move_d + 4) % 8
        nd = -1
        for k in range(1, 9):
            d = (back + k) % 8
            if fg(y + _DY[d], x + _DX[d]):
                nd = d
                break
        move_d = nd
        y, x = y + _DY[nd], x + _DX[nd]

    # CHAIN_APPROX_SIMPLE: keep points whose arrival and departure directions
    # differ (run endpoints of the cyclic chain)
    n = len(pts)
    if n <= 2:
        return pts
    out = []
    for i in range(n):
        p = pts[i]
        q = pts[(i + 1) % n]
        r = pts[i - 1]
        if (p[0] - r[0], p[1] - r[1]) != (q[0] - p[0], q[1] - p[1]):
            out.append(p)
    return out


def _sign(v):
    return 1 if v > 0 else (-1 if v < 0 else 0)


def _sklansky(at, start, end, stack, nsign, sign2):
    """One Sklansky chain over the pointer array view ``at`` (callable)."""
    incr = 1 if end > start else -1
    pprev, pcur, pnext = start, start + incr, start + 2 * incr
    if start == end or at(start) == at(end):
        stack[0] = start
        return 1
    stacksize = 3
    stack[0] = pprev
    stack[1] = pcur
    stack[2] = pnext
    end += incr
    while pnext != end:
        cury = at(pcur)[1]
        by = at(pnext)[1] - cury
        if _sign(by) != nsign:
            ax = at(pcur)[0] - at(pprev)[0]
            bx = at(pnext)[0] - at(pcur)[0]
            ay = cury - at(pprev)[1]
            convexity = ay * bx - ax * by
            if _sign(convexity) == sign2 and (ax != 0 or ay != 0):
                pprev = pcur
                pcur = pnext
                pnext += incr
                stack[stacksize] = pnext
                stacksize += 1
            else:
                if pprev == start:
                    pcur = pnext
                    stack[1] = pcur
                    pnext += incr
                    stack[2] = pnext
                else:
                    stack[stacksize - 2] = pnext
                    pcur = pprev
                    pprev = stack[stacksize - 4]
                    stacksize -= 1
        else:
            pnext += incr
            stack[stacksize - 1] = pnext
    return stacksize - 1


def convex_hull_cv(pts, clockwise=False):
    """cv2.convexHull(int points) — returns indices into ``pts`` in cv2's
    output order (including its input-order-dependent rotation)."""
    total = len(pts)
    if total == 0:
        return []
    order = sorted(range(total), key=lambda i: (pts[i][0], pts[i][1], i))
    sp = [tuple(pts[i]) for i in order]
    miny_ind = 0
    maxy_ind = 0
    for i in range(1, total):
        y = sp[i][1]
        if sp[miny_ind][1] > y:
            miny_ind = i
        if sp[maxy_ind][1] < y:
            maxy_ind = i
    if sp[0] == sp[total - 1]:
        return [order[0]]

    def fwd(i):
        return sp[i]

    def rev(i):
        return sp[total - 1 + i]

    scratch = [0] * (total + 2)
    tl = list(scratch)
    tl_count = _sklansky(fwd, 0, maxy_ind, tl, -1, 1)
    tr = list(scratch)
    tr_count = _sklansky(rev, 0, maxy_ind - total + 1, tr, -1, -1)
    tl_stack, tr_stack = tl, tr
    tl_base, tr_base = 0, total - 1
    if not clockwise:
        tl_stack, tr_stack = tr_stack, tl_stack
        tl_count, tr_count = tr_count, tl_count
        tl_base, tr_base = tr_base, tl_base
    nout = []
    for i in range(tl_count - 1):
        nout.append(tl_base + tl_stack[i])
    for i in range(tr_count - 1, 0, -1):
        nout.append(tr_base + tr_stack[i])
    stop_idx = (tr_base + tr_stack[1]) if tr_count > 2 else \
        ((tl_base + tl_stack[tl_count - 2]) if tl_count > 2 else -1)

    bl = list(scratch)
    bl_count = _sklansky(fwd, 0, miny_ind, bl, 1, -1)
    br = list(scratch)
    br_count = _sklansky(rev, 0, miny_ind - total + 1, br, 1, 1)
    bl_stack, br_stack = bl, br
    bl_base, br_base = 0, total - 1
    if clockwise:
        bl_stack, br_stack = br_stack, bl_stack
        bl_count, br_count = br_count, bl_count
        bl_base, br_base = br_base, bl_base
    if stop_idx >= 0:
        check_idx = (bl_base + bl_stack[1]) if bl_count > 2 else \
            ((br_base + br_stack[2 - bl_count]) if bl_count + br_count > 2
             else -1)
        if check_idx == stop_idx or (check_idx >= 0 and
                                     sp[check_idx] == sp[stop_idx]):
            # all points on one line: bottom is the mirrored top
            bl_count = min(bl_count, 2)
            br_count = min(br_count, 2)
    for i in range(bl_count - 1):
        nout.append(bl_base + bl_stack[i])
    for i in range(br_count - 1, 0, -1):
        nout.append(br_base + br_stack[i])

    nout = [order[i] for i in nout]
    n = len(nout)
    if n >= 3:
        # rotate a monotone index cycle to start at its min (ascending) or
        # max (descending) original index — OpenCV issue 13954 robustness
        min_idx = 0
        max_idx = 0
        lt = 0
        for i in range(1, n):
            idx = nout[i]
            lt += nout[i - 1] < idx
            if nout[min_idx] > idx:
                min_idx = i
            if nout[max_idx] < idx:
                max_idx = i
        mmdist = abs(max_idx - min_idx)
        if (mmdist == 1 or mmdist == n - 1) and (lt <= 1 or lt >= n - 2):
            ascending = (max_idx + 1) % n == min_idx
            i0 = min_idx if ascending else max_idx
            if i0 > 0:
                j = i0
                rotated = []
                ok = True
                for i in range(n):
                    curr_idx = nout[j]
                    rotated.append(curr_idx)
                    next_j = j + 1 if j + 1 < n else 0
                    if i < n - 1 and (ascending != (curr_idx < nout[next_j])):
                        ok = False
                        break
                    j = next_j
                if ok:
                    nout = rotated
    return nout


def calipers_cv(P):
    """cv2 5.0 rotating calipers on an (n,2) float32 hull (n > 2) in
    convexHull(clockwise=False) order. Returns ((cx,cy),(w,h),angle)."""
    n = len(P)
    vect = np.empty((n, 2), np.float32)
    inv_len = np.empty(n, np.float32)
    left = right = top = bottom = 0
    pt0x, pt0y = P[0, 0], P[0, 1]
    left_x = right_x = pt0x
    top_y = bottom_y = pt0y
    for i in range(n):
        if pt0x < left_x:
            left_x = pt0x; left = i
        if pt0x > right_x:
            right_x = pt0x; right = i
        if pt0y > top_y:
            top_y = pt0y; top = i
        if pt0y < bottom_y:
            bottom_y = pt0y; bottom = i
        ptx, pty = P[(i + 1) % n, 0], P[(i + 1) % n, 1]
        dxf = f32(ptx - pt0x)
        dyf = f32(pty - pt0y)
        vect[i, 0] = dxf
        vect[i, 1] = dyf
        inv_len[i] = f32(1.0 / np.sqrt(f64(dxf) * f64(dxf) +
                                       f64(dyf) * f64(dyf)))
        pt0x, pt0y = ptx, pty

    seq = [bottom, right, top, left]
    minarea = np.finfo(np.float32).max
    buf = None
    for _ in range(n):
        e0 = vect[seq[0]]; e1 = vect[seq[1]]
        e2 = vect[seq[2]]; e3 = vect[seq[3]]
        t1 = f32(f32(f32(-e1[0]) * e0[0]) - f32(e1[1] * e0[1]))
        if t1 < 0:
            cand = (e1[1], f32(-e1[0])); main = 1
        else:
            cand = (e0[0], e0[1]); main = 0
        t2 = f32(f32(f32(-e2[1]) * cand[0]) + f32(e2[0] * cand[1]))
        if t2 < 0:
            cand = (f32(-e2[0]), f32(-e2[1])); main = 2
        t3 = f32(f32(cand[0] * e3[0]) + f32(cand[1] * e3[1]))
        if t3 < 0:
            main = 3
        idx = seq[main]
        ivl = inv_len[idx]
        lx = f32(vect[idx, 0] * ivl)
        ly = f32(vect[idx, 1] * ivl)
        if main == 0:
            a, b = lx, ly
        elif main == 1:
            a, b = ly, f32(-lx)
        elif main == 2:
            a, b = f32(-lx), f32(-ly)
        else:
            a, b = f32(-ly), lx
        seq[main] = (seq[main] + 1) % n

        dx = f32(P[seq[1], 0] - P[seq[3], 0])
        dy = f32(P[seq[1], 1] - P[seq[3], 1])
        width = f32(f32(dx * a) + f32(dy * b))
        dx2 = f32(P[seq[2], 0] - P[seq[0], 0])
        dy2 = f32(P[seq[2], 1] - P[seq[0], 1])
        height = f32(f32(dy2 * a) - f32(dx2 * b))
        area = f32(width * height)
        if area <= minarea:
            minarea = area
            buf = (seq[3], seq[0], a, b, width, height)

    il, ib, a, b, w_, h_ = buf
    nb = f32(-b)
    c1 = f32(f32(P[il, 0] * a) + f32(P[il, 1] * b))
    c2 = f32(f32(P[ib, 0] * nb) + f32(P[ib, 1] * a))
    det = f32(f32(a * a) - f32(nb * b))
    idet = f32(f32(1.0) / det)
    px = f32(f32(f32(c1 * a) - f32(c2 * b)) * idet)
    py = f32(f32(f32(c2 * a) - f32(c1 * nb)) * idet)
    o1x = f32(a * w_); o1y = f32(b * w_)
    o2x = f32(nb * h_); o2y = f32(a * h_)
    cx = f32(f32(f32(o1x + o2x) * f32(0.5)) + px)
    cy = f32(f32(f32(o1y + o2y) * f32(0.5)) + py)
    sz_w = f32(np.sqrt(f64(o2x) * f64(o2x) + f64(o2y) * f64(o2y)))
    sz_h = f32(np.sqrt(f64(o1x) * f64(o1x) + f64(o1y) * f64(o1y)))
    if o1x == 0 and o1y > 0:
        return (cx, cy), (sz_h, sz_w), f32(-90.0)
    ang = f32(np.arctan2(f64(o1x), f64(o1y)) * (-180.0) / np.pi)
    return (cx, cy), (sz_w, sz_h), ang


def min_area_rect_cv(contour_pts):
    """cv2.minAreaRect on an int contour point sequence, bit-exact."""
    idx = convex_hull_cv(contour_pts, clockwise=False)
    hull = np.asarray([contour_pts[i] for i in idx], np.float32)
    n = len(hull)
    if n > 2:
        return calipers_cv(hull)
    if n == 1:
        return ((hull[0, 0], hull[0, 1]), (f32(0), f32(0)), f32(-90.0))
    cx = f32(f32(hull[0, 0] + hull[1, 0]) * f32(0.5))
    cy = f32(f32(hull[0, 1] + hull[1, 1]) * f32(0.5))
    dx = f32(hull[0, 0] - hull[1, 0])
    dy = f32(hull[0, 1] - hull[1, 1])
    ln = f32(np.sqrt(f64(dx) * f64(dx) + f64(dy) * f64(dy)))
    if dx == 0:
        return ((cx, cy), (ln, f32(0)), f32(-90.0))
    if dy < 0:
        return ((cx, cy), (ln, f32(0)),
                f32(np.arctan2(f64(dy), f64(dx)) * 180.0 / np.pi))
    if dy == 0:
        return ((cx, cy), (f32(0), ln), f32(-90.0))
    return ((cx, cy), (f32(0), ln),
            f32(np.arctan2(f64(dx), f64(dy)) * (-180.0) / np.pi))


def rect_from_component_pixels(xs, ys):
    """The reference's measurement for one component given its pixel set.

    Rasterizes the pixels into a local bitmap, traces the contour the way
    cv2.findContours does, and measures it with the bit-exact minAreaRect.
    :param xs, ys: integer pixel coordinates (any order)
    :return: ((cx, cy), (w, h), angle_deg) as float32 scalars
    """
    xs = np.asarray(xs, np.int64)
    ys = np.asarray(ys, np.int64)
    x0 = int(xs.min())
    y0 = int(ys.min())
    lw = int(xs.max()) - x0 + 1
    lh = int(ys.max()) - y0 + 1
    mask = np.zeros((lh, lw), np.uint8)
    mask[ys - y0, xs - x0] = 1
    order = np.lexsort((xs, ys))
    sy = int(ys[order[0]]) - y0
    sx = int(xs[order[0]]) - x0
    cont = trace_contour(mask, sy, sx)
    pts = [(x + x0, y + y0) for (x, y) in cont]
    return min_area_rect_cv(pts)
