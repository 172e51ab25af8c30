#!/usr/bin/env python3
"""Pallas kernel: hull-edge candidate slopes for min_area_rect.

The XLA closed form of the hull-chain membership test
(ops/labeling._hull_edge_angles) builds a (D, R, R) pairwise slope tensor
per chain; at production capacities (D=512 components, R=96 rows, batched
over 64 frames) that is ~150 ms of HBM traffic per detect step — the
single largest device cost in the pipeline. This kernel computes the same
quantities with a sequential row loop whose carries stay in VMEM:

- layout is lane-tiled over components (arrays are (R, D) with D on lanes,
  mirroring ops/pallas_sweep.py), so the k-th row is a legal dynamic
  sublane read;
- one fori_loop over the R rows updates, for BOTH chains at once, the
  running min outgoing slope, max incoming slope, and the (dx, dy) of the
  current best outgoing edge. The pairwise slope s(i, k) is symmetric in
  (i, k), so a single column per iteration serves the "outgoing" update of
  rows below k and the "incoming" update of rows above k;
- ties on the outgoing slope replace the stored edge as k ascends, which
  selects the FARTHEST collinear endpoint — exactly the j_star rule of the
  XLA version (collinear integer pairs produce bit-identical f32 quotients,
  so the <= tie test is exact);
- the arctan2/mod angle finishing stays outside the kernel on the (D, R)
  results, bit-identical to the XLA path.

HBM traffic is one read of the (R, D) row-extreme tables plus one write of
six (R, D) outputs — no R^2 tensor ever exists.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38


def _make_kernel(r):
    def kernel(xl_ref, xr_ref, y_ref, v_ref,
               dxl_ref, dyl_ref, el_ref, dxr_ref, dyr_ref, er_ref,
               cl_ref, cr_ref):
        xl = xl_ref[0]
        xr = xr_ref[0]
        y = y_ref[0]
        v = v_ref[0] > 0
        big = jnp.float32(_BIG)
        zero = jnp.zeros_like(xl)

        def body(k, state):
            (omin_l, imax_l, dxe_l, dye_l,
             omin_r, imax_r, dxe_r, dye_r) = state
            xlk = xl_ref[0, pl.ds(k, 1), :]
            xrk = xr_ref[0, pl.ds(k, 1), :]
            yk = y_ref[0, pl.ds(k, 1), :]
            vk = v_ref[0, pl.ds(k, 1), :] > 0
            dy = yk - y                      # (R, D); >0 iff row < k
            pairv = vk & v & (dy != 0.0)
            dy_safe = jnp.where(dy != 0.0, dy, 1.0)
            below = dy > 0.0
            above = dy < 0.0

            dxl = xlk - xl
            col_l = dxl / dy_safe            # left chain: sgn = +1
            updo = pairv & below & (col_l <= omin_l)
            omin_l = jnp.where(updo, col_l, omin_l)
            dxe_l = jnp.where(updo, dxl, dxe_l)
            dye_l = jnp.where(updo, dy, dye_l)
            imax_l = jnp.where(pairv & above, jnp.maximum(imax_l, col_l),
                               imax_l)

            dxr = xrk - xr
            col_r = -dxr / dy_safe           # right chain: sgn = -1
            updo = pairv & below & (col_r <= omin_r)
            omin_r = jnp.where(updo, col_r, omin_r)
            dxe_r = jnp.where(updo, dxr, dxe_r)
            dye_r = jnp.where(updo, dy, dye_r)
            imax_r = jnp.where(pairv & above, jnp.maximum(imax_r, col_r),
                               imax_r)
            return (omin_l, imax_l, dxe_l, dye_l,
                    omin_r, imax_r, dxe_r, dye_r)

        state = (zero + big, zero - big, zero, zero,
                 zero + big, zero - big, zero, zero)
        (omin_l, imax_l, dxe_l, dye_l,
         omin_r, imax_r, dxe_r, dye_r) = jax.lax.fori_loop(0, r, body, state)

        el = v & (omin_l >= imax_l) & (omin_l < big)
        er = v & (omin_r >= imax_r) & (omin_r < big)
        dxl_ref[0] = dxe_l
        dyl_ref[0] = dye_l
        el_ref[0] = el.astype(jnp.float32)
        dxr_ref[0] = dxe_r
        dyr_ref[0] = dye_r
        er_ref[0] = er.astype(jnp.float32)
        # STRICT chain corners (collinear mid-points excluded): the cv2
        # hull vertex set consumed by ops/cv2_centers. Chain endpoints come
        # out True automatically (empty-side extrema stay at +-big).
        cl_ref[0] = (v & (omin_l > imax_l)).astype(jnp.float32)
        cr_ref[0] = (v & (omin_r > imax_r)).astype(jnp.float32)

    return kernel


@partial(jax.jit, static_argnames=('interpret',))
def hull_edge_vectors(row_min_x, row_max_x, row_valid, abs_y,
                      interpret=False):
    """Outgoing hull-edge vectors per row-extreme point, both chains.

    :param row_min_x, row_max_x: (D, R) int32 per-row x extremes
        (garbage big values where invalid)
    :param row_valid: (D, R) bool
    :param abs_y: (D, R) int32 absolute row coordinates (strictly
        increasing along R)
    :return: (dx_l, dy_l, edge_l, dx_r, dy_r, edge_r) — (D, R) float32
        edge vectors of the outgoing left/right chain edge and (D, R) bool
        "this point is a chain vertex with an outgoing edge" flags
    """
    d, r = row_min_x.shape
    tile = 128
    dp = -(-d // tile) * tile
    rp = -(-r // 8) * 8

    def pad_rd(a):  # (D, R) -> (1, Rp, Dp) float32
        out = jnp.zeros((rp, dp), jnp.float32)
        return out.at[:r, :d].set(a.T.astype(jnp.float32))[None]

    spec = pl.BlockSpec((1, rp, tile), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_kernel(r),
        grid=(dp // tile,),
        in_specs=[spec] * 4,
        out_specs=(spec,) * 8,
        out_shape=(jax.ShapeDtypeStruct((1, rp, dp), jnp.float32),) * 8,
        interpret=interpret,
    )(pad_rd(row_min_x), pad_rd(row_max_x), pad_rd(abs_y),
      pad_rd(row_valid))
    dxl, dyl, el, dxr, dyr, er, cl, cr = (o[0, :r, :d].T for o in outs)
    return dxl, dyl, el > 0, dxr, dyr, er > 0, cl > 0, cr > 0
