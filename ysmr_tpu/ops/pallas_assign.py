#!/usr/bin/env python3
"""Pallas kernel: fused per-row nearest-detection search for the tracker.

The XLA tracker step materialises the full (R, C) distance matrix
(ops/assignment.pairwise_distances) and reduces it twice (min + argmin) —
at dense-scene capacities that is a gigabyte of HBM traffic per frame
(16k x 16k x 4 B). Greedy matching only ever consumes the per-row
(min distance, argmin column), so this kernel streams the distance
computation with rows on sublanes and detections on lanes:

- a grid step owns a (ROW_TILE, 1) column of track coordinates and one
  (1, 128) detection chunk; the (ROW_TILE, 128) distance block exists only
  in registers;
- running per-(row, lane) minima and their chunk index live in VMEM
  scratch, updated with purely elementwise ops (no per-chunk reductions);
  the single lane-reduction to (min, argmin) happens once per row block
  after the last chunk;
- tie semantics match jnp.argmin exactly: strict < keeps the earliest
  chunk per lane, and the final reduction takes the smallest detection
  index among minimal lanes. Invalid rows/columns yield (BIG, 0).

Bit-equality with the XLA formulation is asserted in
tests/test_pallas_assign.py and was verified on the real chip at 16k x 16k.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ysmr_tpu.ops.assignment import BIG as _ASG_BIG

# plain python float: a jnp scalar would be a captured constant in the kernel
BIG = float(_ASG_BIG)

_ROW_TILE = 1024
_LANES = 128
_SUPER = 4  # det chunks folded per grid step (scratch traffic / _SUPER)


def _make_kernel(k_dims, n_chunks):
    def kernel(*refs):
        o_refs = refs[:k_dims]
        ovm_ref = refs[k_dims]
        d_refs = refs[k_dims + 1:2 * k_dims + 1]
        dvm_ref = refs[2 * k_dims + 1]
        min_ref, cand_ref = refs[2 * k_dims + 2:2 * k_dims + 4]
        lane_min, lane_j = refs[2 * k_dims + 4:]

        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            lane_min[...] = jnp.full(lane_min.shape, BIG, jnp.float32)
            lane_j[...] = jnp.zeros(lane_j.shape, jnp.int32)

        ov = ovm_ref[...] > 0                      # (T, 1)
        # _SUPER sub-chunks reduce in registers; scratch is touched once
        best_d = None
        best_s = None
        for s in range(_SUPER):
            sl = pl.ds(s * _LANES, _LANES)
            ok = ov & (dvm_ref[:, sl] > 0)         # (T, 1) & (1, L) -> (T, L)
            d2 = None
            for c in range(k_dims):
                diff = o_refs[c][...] - d_refs[c][:, sl]
                sq = diff * diff
                d2 = sq if d2 is None else d2 + sq
            d = jnp.where(ok, jnp.sqrt(d2), BIG)
            if best_d is None:
                best_d = d
                best_s = jnp.zeros(d.shape, jnp.int32)
            else:
                take = d < best_d                  # strict: earliest wins ties
                best_d = jnp.where(take, d, best_d)
                best_s = jnp.where(take, s, best_s)
        cur = lane_min[...]
        upd = best_d < cur
        lane_min[...] = jnp.where(upd, best_d, cur)
        lane_j[...] = jnp.where(upd, j * _SUPER + best_s, lane_j[...])

        @pl.when(j == n_chunks - 1)
        def _():
            vals = lane_min[...]                   # (T, L)
            m = jnp.min(vals, axis=1, keepdims=True)
            idx = lane_j[...] * _LANES + jax.lax.broadcasted_iota(
                jnp.int32, vals.shape, 1)  # lane_j holds j*_SUPER+s
            first = jnp.min(jnp.where(vals == m, idx, jnp.int32(2 ** 30)),
                            axis=1, keepdims=True)
            min_ref[...] = m
            # all-BIG rows (invalid row / no valid det): argmin = 0 like XLA
            cand_ref[...] = jnp.where(m < BIG, first, 0)

    return kernel


@partial(jax.jit, static_argnames=('interpret',))
def row_min_argmin(obj_xy, obj_valid, det_xy, det_valid, interpret=False):
    """Per-row minimum distance and its first-minimal column.

    Equivalent to ``m = pairwise_distances(...); (jnp.min(m, 1),
    jnp.argmin(m, 1))`` without materialising the matrix.

    :param obj_xy: (R, K) float32, K in (2, 3)
    :param det_xy: (C, K) float32
    :return: (row_min (R,) float32 — BIG where the row is invalid or no
        valid detection exists; cand_col (R,) int32 — 0 in that case)
    """
    r, k_dims = obj_xy.shape
    c = det_xy.shape[0]
    rp = -(-r // _ROW_TILE) * _ROW_TILE
    step_c = _LANES * _SUPER
    cp = -(-c // step_c) * step_c

    def pad_col(a):  # (R,) -> (rp, 1)
        out = jnp.zeros((rp,), jnp.float32)
        return out.at[:r].set(a.astype(jnp.float32)).reshape(rp, 1)

    def pad_row(a):  # (C,) -> (1, cp)
        out = jnp.zeros((cp,), jnp.float32)
        return out.at[:c].set(a.astype(jnp.float32)).reshape(1, cp)

    obj_cols = tuple(pad_col(obj_xy[:, i]) for i in range(k_dims))
    ovm = pad_col(obj_valid)
    det_rows = tuple(pad_row(det_xy[:, i]) for i in range(k_dims))
    dvm = pad_row(det_valid)

    n_chunks = cp // step_c
    grid = (rp // _ROW_TILE, n_chunks)
    col_spec = pl.BlockSpec((_ROW_TILE, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, step_c), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)

    kernel = _make_kernel(k_dims, n_chunks)
    row_min, cand = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[col_spec] * k_dims + [col_spec] +
                 [row_spec] * k_dims + [row_spec],
        out_specs=(col_spec,
                   pl.BlockSpec((_ROW_TILE, 1), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((rp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((rp, 1), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((_ROW_TILE, _LANES), jnp.float32),
                        pltpu.VMEM((_ROW_TILE, _LANES), jnp.int32)],
        interpret=interpret,
    )(*obj_cols, ovm, *det_rows, dvm)
    return row_min.reshape(rp)[:r], cand.reshape(rp)[:r]
