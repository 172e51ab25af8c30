"""Bit-exact cv2.minAreaRect CENTERS on device, without the caliper loop.

The reference measures every component with ``cv2.minAreaRect(contour)``
(``/root/reference/ysmr/track_eval.py:287``) whose center carries ~3e-4 px
of float32 rounding noise from OpenCV's incremental rotating-calipers
arithmetic.  The device tracker feeds on centers, and that noise — absent
from our exact integer-arithmetic rects (``labeling._min_area_rect_exact``)
— is what flips near-tie greedy assignments at GSFF mode transitions and
permutes a handful of TRACK_IDs at dense scale (2893 vs 2899 tracks on the
3000-rod clip).  This module reproduces cv2's f32 center BIT-EXACTLY as a
vectorized, static-shaped device computation, so the device tracker can see
the same measurement stream as the reference without host rects.

How the sequential caliper collapses into closed form (all verified by
fuzzing against the pure-Python replica ``ops/cv2_exact.py``, which is
itself fuzzed against OpenCV — see tests/test_cv2_centers.py):

* cv2's hull (``convexHull(int pts, clockwise=False)`` on the traced
  contour) equals the strict-corner envelopes of the per-row x-extremes,
  output in reverse-contour order: starting just after the top-left pixel,
  DOWN the right envelope, across the bottom, UP the left envelope, with
  the top-left (contour-start) vertex LAST.
* The caliper's rotation decisions (t1/t2/t3) are cross products of
  integer edge vectors — exact in f32 — so the edge visiting order is a
  pure sort by (canonical in-quadrant angle, caliper index).  Within one
  caliper the visit order equals the cycle order, so the support vertices
  of every caliper at the moment edge E wins are index arithmetic: the
  caliper that consumed E sits at E's far endpoint, every other caliper r
  sits ``count(edges of r visited before E)`` steps past its initial
  (first-occurrence extreme) vertex.
* Only the area comparison is f32-noisy, and it is replicated literally:
  ``area = f32(width*height)`` per edge with replace-on-<= (the
  last-visited minimal edge wins).
* ``inv_len = f32(1/sqrt(f64(dx^2+dy^2)))`` is the one double-precision
  rounding; dx^2+dy^2 is a small exact integer, so a precomputed table
  indexed by it reproduces the f64 rounding without f64 on device.

Known limits (``ok`` returns False and callers fall back to the exact
center): components taller than the row-table budget, wider than the
f32-key collision bound (2^23 / max_bh^2 px), or with more hull corners
than fit the slot tables.  Self-touching contours (1-px-wide pinches) make
cv2's own hull quirky and irreproducible from row extremes; fuzzing puts
the residual at ~0.1% of DEGENERATE shapes (≈1 in 7200 random blobs),
which the parity tests bound.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['inv_sqrt_table', 'cv2_centers_from_tables']


def inv_sqrt_table(max_w, max_h):
    """Host-built f32 table t[v] = f32(1/sqrt(f64(v))) for v in [0, N).

    v = dx^2 + dy^2 of an integer hull edge: dx bounded by the component
    width (<= frame width), dy by the row-table height. t[0] is unused
    (a hull edge has nonzero length); keep it finite.
    """
    n = int(max_w) ** 2 + int(max_h) ** 2 + 1
    v = np.arange(n, dtype=np.float64)
    v[0] = 1.0
    return jnp.asarray((1.0 / np.sqrt(v)).astype(np.float32))


def _strict_corner_masks(xl, row_valid, *, side):
    """Strict hull-corner mask of the per-row envelope points (x, row).

    A point i is a strict corner of the RIGHT envelope (maximal x) iff
    min_{j<i} slope(j,i) > max_{k>i} slope(i,k); of the LEFT envelope
    (minimal x) iff max_{j<i} slope(j,i) < min_{k>i} slope(i,k).  Slopes
    are (xl_k - xl_i)/(k - i): with |dx| < 2^23/R^2 the f32 quotient is a
    collision-free order key for the distinct rationals (spacing >= 1/R^2,
    quotient error < |dx| * 2^-23), so f32 min/max reductions decide the
    comparisons exactly.  Row-span endpoints come out True automatically
    (empty-side reductions are +-inf).

    :param xl: (D, R) int32 envelope x per row (component-local)
    :param row_valid: (D, R) bool, contiguous from row 0
    :param side: 'right' or 'left'
    :return: (D, R) bool strict-corner mask
    """
    d, r = xl.shape
    rows = jnp.arange(r, dtype=jnp.int32)
    dyw = rows[None, :] - rows[:, None]                       # (R, R) j - i
    dx = xl[:, None, :] - xl[:, :, None]                      # (D, i, j)
    pair_ok = (row_valid[:, None, :] & row_valid[:, :, None] &
               (dyw != 0)[None])
    slope = dx.astype(jnp.float32) / dyw.astype(jnp.float32)[None]
    big = jnp.float32(3.0e38)
    after = (dyw > 0)[None] & pair_ok                         # k > i
    before = (dyw < 0)[None] & pair_ok                        # j < i
    if side == 'right':
        lo = jnp.min(jnp.where(before, slope, big), axis=2)   # min_{j<i}
        hi = jnp.max(jnp.where(after, slope, -big), axis=2)   # max_{k>i}
        corner = lo > hi
    else:
        lo = jnp.max(jnp.where(before, slope, -big), axis=2)
        hi = jnp.min(jnp.where(after, slope, big), axis=2)
        corner = lo < hi
    return corner & row_valid


def _dot2(x1, y1, x2, y2, one):
    """f32(x1*y1) + f32(x2*y2) with BOTH products rounded separately.

    XLA contracts ``a*b + c*d`` into fma(a, b, round(c*d)) — measured on
    the CPU backend at ~26% of random samples differing from the
    two-rounding result; neither ``optimization_barrier`` nor bitcast
    round-trips survive to code emission. The sound fix: multiply each
    product by ``one`` — a value that is always 1.0 at runtime but that
    the compiler cannot prove constant. The inner multiplies then feed a
    MULTIPLY (never contractible), and if the outer multiply contracts
    into the add, fma(p, 1.0, q) == round(p + q) — the exact two-rounding
    semantics either way. Verified exhaustive-random in
    tests/test_cv2_centers.py.
    """
    return (x1 * y1) * one + (x2 * y2) * one


def _next_valid(valid):
    """(D, K) bool -> (D, K) int32: for each slot, the next valid slot
    cyclically after it (self excluded); garbage where no valid slot."""
    d, k = valid.shape
    idx = jnp.arange(k, dtype=jnp.int32)
    big = jnp.int32(2 * k)
    t = jnp.where(valid, idx[None, :], big)
    # suffix min of t excluding self
    suf = jnp.flip(jax.lax.cummin(jnp.flip(t, axis=1), axis=1), axis=1)
    nxt = jnp.concatenate([suf[:, 1:], jnp.full((d, 1), big, jnp.int32)],
                          axis=1)
    first = jnp.min(t, axis=1, keepdims=True)                 # wrap target
    return jnp.where(nxt >= big, first, nxt).astype(jnp.int32)


@partial(jax.jit, static_argnames=('max_bh',))
def cv2_centers_from_tables(row_min_x, row_max_x, row_valid, min_y,
                            isq_table, *, max_bh):
    """cv2.minAreaRect centers (f32, bit-exact) from row-extreme tables.

    :param row_min_x, row_max_x: (D, R) int32 absolute x extremes per row
    :param row_valid: (D, R) bool (True on the component's bbox rows)
    :param min_y: (D,) int32 absolute top row
    :param isq_table: 1-D f32 table from :func:`inv_sqrt_table`
    :param max_bh: R (static)
    :return: (cx, cy, ok) — (D,) f32 centers and a bool mask; where ok is
        False the center is NOT cv2-exact (caller falls back)
    """
    d, r = row_min_x.shape
    assert r == max_bh
    big = jnp.int32(1 << 30)
    rows_i = jnp.arange(r, dtype=jnp.int32)
    # runtime 1.0 the compiler cannot prove constant (see _dot2): min_y is
    # int32 input, so |min_y[0]| + 2 >= 2 always and never NaN
    one = jnp.minimum(jnp.float32(1.0),
                      jnp.abs(min_y[0]).astype(jnp.float32) +
                      jnp.float32(2.0))

    valid_any = jnp.any(row_valid, axis=1)
    # heights: row_valid is a contiguous prefix for genuine components
    h = jnp.sum(row_valid.astype(jnp.int32), axis=1)
    contiguous = jnp.all(row_valid == (rows_i[None, :] < h[:, None]), axis=1)

    x0 = jnp.min(jnp.where(row_valid, row_min_x, big), axis=1)
    xmax = jnp.max(jnp.where(row_valid, row_max_x, -big), axis=1)
    width = xmax - x0
    # f32 slope keys are collision-free only below this width (see
    # _strict_corner_masks); wider components fall back
    w_ok = width < (1 << 23) // max(r * r, 1)

    xl_min = jnp.where(row_valid, row_min_x - x0[:, None], 0)
    xl_max = jnp.where(row_valid, row_max_x - x0[:, None], 0)

    corn_r = _strict_corner_masks(xl_max, row_valid, side='right')
    corn_l = _strict_corner_masks(xl_min, row_valid, side='left')
    # seam dedup: single-pixel top row keeps only its LEFT copy (the
    # top-left vertex must be the cycle's last), single-pixel bottom row
    # keeps only its RIGHT copy
    top_single = xl_min[:, 0] == xl_max[:, 0]
    corn_r = corn_r.at[:, 0].set(corn_r[:, 0] & ~top_single)
    last = jnp.clip(h - 1, 0, r - 1)
    bot_single = (jnp.take_along_axis(xl_min, last[:, None], axis=1)
                  == jnp.take_along_axis(xl_max, last[:, None], axis=1))[:, 0]
    corn_l_last = jnp.take_along_axis(corn_l, last[:, None], axis=1)[:, 0]
    corn_l = corn_l.at[jnp.arange(d), last].set(corn_l_last & ~bot_single)

    # vertex slots in CYCLE ORDER: right corners rows 0..R-1, then left
    # corners rows R-1..0 (down the right side, up the left side; the
    # top-left vertex lands in the final slot)
    k = 2 * r
    vx = jnp.concatenate([xl_max, jnp.flip(xl_min, axis=1)], axis=1)
    vy = jnp.concatenate([jnp.broadcast_to(rows_i, (d, r)),
                          jnp.broadcast_to(jnp.flip(rows_i), (d, r))], axis=1)
    vvalid = jnp.concatenate([corn_r, jnp.flip(corn_l, axis=1)], axis=1)
    n = jnp.sum(vvalid.astype(jnp.int32), axis=1)

    # ---- n <= 2 degenerate branches (single point / line component) ----
    # the two cycle corners are exactly min_area_rect_cv's 2-point hull;
    # its center is the f32 midpoint (order-independent)
    slots = jnp.arange(k, dtype=jnp.int32)
    t = jnp.where(vvalid, slots[None, :], jnp.int32(2 * k))
    s_first = jnp.argmin(t, axis=1)
    # second valid slot: mask out the first
    t2 = t.at[jnp.arange(d), s_first].set(jnp.int32(2 * k))
    s_second = jnp.argmin(t2, axis=1)
    gx = lambda s: jnp.take_along_axis(vx, s[:, None], axis=1)[:, 0]
    gy = lambda s: jnp.take_along_axis(vy, s[:, None], axis=1)[:, 0]
    p0x = (gx(s_first) + x0).astype(jnp.float32)
    p0y = (gy(s_first) + min_y).astype(jnp.float32)
    p1x = (gx(s_second) + x0).astype(jnp.float32)
    p1y = (gy(s_second) + min_y).astype(jnp.float32)
    mid_cx = (p0x + p1x) * jnp.float32(0.5)
    mid_cy = (p0y + p1y) * jnp.float32(0.5)
    deg_cx = jnp.where(n == 1, p0x, mid_cx)
    deg_cy = jnp.where(n == 1, p0y, mid_cy)

    # ---- edges (per valid vertex: to the next valid vertex cyclically) --
    nxt = _next_valid(vvalid)
    ex = jnp.take_along_axis(vx, nxt, axis=1)
    ey = jnp.take_along_axis(vy, nxt, axis=1)
    dx = ex - vx                                             # int, exact
    dy = ey - vy
    evalid = vvalid & (n[:, None] > 2)

    # ---- initial caliper positions: first-occurrence extremes ----------
    # (cv2 scans hull[0..n-1] with strict replacement; our slot order IS
    # the hull order, so argmax of the boolean picks the first hit)
    ymax = jnp.max(jnp.where(vvalid, vy, -big), axis=1)
    xvmax = jnp.max(jnp.where(vvalid, vx, -big), axis=1)
    xvmin = jnp.min(jnp.where(vvalid, vx, big), axis=1)
    def first_slot(cond):
        return jnp.argmax(cond, axis=1).astype(jnp.int32)
    bot0 = first_slot(vvalid & (vy == 0))
    right0 = first_slot(vvalid & (vx == xvmax[:, None]))
    top0 = first_slot(vvalid & (vy == ymax[:, None]))
    left0 = first_slot(vvalid & (vx == xvmin[:, None]))
    seq0 = jnp.stack([bot0, right0, top0, left0], axis=1)    # (D, 4)

    # ---- arcs: edge at slot s belongs to caliper q when s lies in the
    # cyclic span [seq0[q], seq0[q+1]) starting from bot0. With duplicate
    # extremes (e.g. left0 == bot0 on a thin diagonal) the raw cyclic
    # offsets are non-monotone: a later caliper whose start coincides with
    # an earlier position must read as the END of the walk, not position 0
    # — unwrap to a monotone sequence first (the sequential caliper walk's
    # semantics: empty arcs claim no edges, earlier q wins starts).
    rel_s = (slots[None, :] - bot0[:, None]) % k             # (D, K)
    rel_q = (seq0 - bot0[:, None]) % k                       # (D, 4)
    r1 = rel_q[:, 1]
    r2 = rel_q[:, 2] + jnp.where(rel_q[:, 2] < r1, k, 0)
    r3 = rel_q[:, 3] + k * jnp.where(
        rel_q[:, 3] >= r2, 0, jnp.where(rel_q[:, 3] + k >= r2, 1, 2))
    rel_mono = jnp.stack([jnp.zeros_like(r1), r1, r2, r3], axis=1)
    arc = (jnp.sum((rel_mono[:, :, None] <=
                    rel_s[:, None, :]).astype(jnp.int32),
                   axis=1) - 1).astype(jnp.int32)            # (D, K) in 0..3

    # ---- canonical in-quadrant directions & visit order ----------------
    # R(-90): (x, y) -> (y, -x), applied arc times
    cdx = jnp.select([arc == 0, arc == 1, arc == 2], [dx, dy, -dx], -dy)
    cdy = jnp.select([arc == 0, arc == 1, arc == 2], [dy, -dx, -dy], dx)
    tan_key = cdy.astype(jnp.float32) / cdx.astype(jnp.float32)
    inf = jnp.float32(np.inf)
    tan_key = jnp.where(evalid, tan_key, inf)
    # stable two-key sort (tan, then caliper index); carry the slot id
    sort_arc = jnp.where(evalid, arc, 4)
    s_tan, s_arc, s_slot = jax.lax.sort(
        (tan_key, sort_arc, jnp.broadcast_to(slots, (d, k))), num_keys=2)
    # visit rank per slot (scatter the sorted position back)
    pos = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32), (d, k))
    rank = jnp.zeros((d, k), jnp.int32).at[
        jnp.arange(d)[:, None], s_slot].set(pos)

    # prefix counts per caliper in visit order: how many arc-q edges were
    # consumed strictly before sorted position p
    pref = []
    for q in range(4):
        is_q = (s_arc == q).astype(jnp.int32)
        c = jnp.cumsum(is_q, axis=1) - is_q                  # exclusive
        pref.append(c)
    pref = jnp.stack(pref, axis=1)                           # (D, 4, K) by pos
    # back to slot order: counts for the edge at slot s
    cnt = jnp.zeros((d, 4, k), jnp.int32).at[
        jnp.arange(d)[:, None, None],
        jnp.arange(4)[None, :, None],
        s_slot[:, None, :]].set(pref)                        # (D, 4, slot)

    # ---- supports: advance cnt valid vertices from seq0[q] -------------
    cyc_pos = jnp.cumsum(vvalid.astype(jnp.int32), axis=1) - \
        vvalid.astype(jnp.int32)                             # rank among valid
    # slot of the j-th valid vertex: sort slots by (invalid, cyc_pos)
    slot_at = jnp.argsort(jnp.where(vvalid, cyc_pos, big), axis=1)\
        .astype(jnp.int32)                                   # (D, K)
    seq0_pos = jnp.take_along_axis(cyc_pos, seq0, axis=1)    # (D, 4)
    n_safe = jnp.maximum(n, 1)[:, None, None]
    adv_pos = (seq0_pos[:, :, None] + cnt) % n_safe          # (D, 4, slot)
    sup_slot = jnp.take_along_axis(
        slot_at[:, None, :].repeat(4, axis=1), adv_pos, axis=2)
    # the consuming caliper sits at E's far endpoint
    arc_oh = arc[:, None, :] == jnp.arange(4)[None, :, None]
    sup_slot = jnp.where(arc_oh, nxt[:, None, :], sup_slot)  # (D, 4, slot)

    sup_x = jnp.take_along_axis(vx[:, None, :].repeat(4, axis=1),
                                sup_slot, axis=2)            # local ints
    sup_y = jnp.take_along_axis(vy[:, None, :].repeat(4, axis=1),
                                sup_slot, axis=2)

    # ---- per-edge f32 caliper arithmetic (cv2's exact op order) --------
    vlen2 = (dx * dx + dy * dy).astype(jnp.int32)
    tab_n = isq_table.shape[0]
    vlen_ok = (vlen2 < tab_n) | ~evalid
    iv = isq_table[jnp.clip(vlen2, 0, tab_n - 1)]
    dxf = dx.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    lx = dxf * iv
    ly = dyf * iv
    a = jnp.select([arc == 0, arc == 1, arc == 2], [lx, ly, -lx], -ly)
    b = jnp.select([arc == 0, arc == 1, arc == 2], [ly, -lx, -ly], lx)
    # support differences are exact integers in f32
    wdx = (sup_x[:, 1] - sup_x[:, 3]).astype(jnp.float32)
    wdy = (sup_y[:, 1] - sup_y[:, 3]).astype(jnp.float32)
    rwidth = _dot2(wdx, a, wdy, b, one)
    hdx = (sup_x[:, 2] - sup_x[:, 0]).astype(jnp.float32)
    hdy = (sup_y[:, 2] - sup_y[:, 0]).astype(jnp.float32)
    rheight = _dot2(hdy, a, -hdx, b, one)
    area = rwidth * rheight
    area = jnp.where(evalid, area, jnp.float32(np.inf))

    # winner: minimal f32 area, ties to the LAST visited (replace-on-<=)
    min_area = jnp.min(area, axis=1, keepdims=True)
    tie_rank = jnp.where(area == min_area, rank, -1)
    win = jnp.argmax(tie_rank, axis=1)                       # (D,) slot

    g = lambda arr: jnp.take_along_axis(arr, win[:, None], axis=1)[:, 0]
    g4 = lambda arr: jnp.take_along_axis(
        arr, win[:, None, None].repeat(4, axis=1), axis=2)[:, :, 0]
    wa = g(a)
    wb = g(b)
    wsx = g4(sup_x)
    wsy = g4(sup_y)
    wwidth = g(rwidth)
    wheight = g(rheight)

    # absolute support coordinates (cv2 computes on absolute hull points)
    x0f = x0.astype(jnp.float32)
    y0f = min_y.astype(jnp.float32)
    lxx = wsx[:, 3].astype(jnp.float32) + x0f
    lyy = wsy[:, 3].astype(jnp.float32) + y0f
    bxx = wsx[:, 0].astype(jnp.float32) + x0f
    byy = wsy[:, 0].astype(jnp.float32) + y0f
    nb = -wb
    c1 = _dot2(lxx, wa, lyy, wb, one)
    c2 = _dot2(bxx, nb, byy, wa, one)
    det = _dot2(wa, wa, -nb, wb, one)
    idet = jnp.float32(1.0) / det
    px = _dot2(c1, wa, -c2, wb, one) * idet
    py = _dot2(c2, wa, -c1, nb, one) * idet
    # o1 + o2 must see ROUNDED products too (same contraction hazard)
    osx = _dot2(wa, wwidth, nb, wheight, one)     # o1x + o2x
    osy = _dot2(wb, wwidth, wa, wheight, one)     # o1y + o2y
    cal_cx = osx * jnp.float32(0.5) + px
    cal_cy = osy * jnp.float32(0.5) + py

    cx = jnp.where(n <= 2, deg_cx, cal_cx)
    cy = jnp.where(n <= 2, deg_cy, cal_cy)
    ok = (valid_any & contiguous & w_ok & (h <= r) &
          jnp.all(vlen_ok, axis=1))
    return cx, cy, ok
