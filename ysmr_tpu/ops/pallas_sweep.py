#!/usr/bin/env python3
"""Pallas kernel: rotated-extent sweep for min_area_rect.

The XLA formulation of the angle sweep (ops/labeling.py _sweep_extents /
fine_extents) builds (D, K, P) projection tensors — batched over frames that
is hundreds of MB of HBM traffic per detect step at dense-scene capacities
(D=8k components, K~100 angles, P=2*max_bh hull candidates). This kernel
keeps everything in VMEM:

- layout is lane-tiled over components: points (P, D), angles/outputs (K, D),
  so every read is a full row with a static sublane index (P and K are small
  static constants; the point loop fully unrolls);
- validity is resolved OUTSIDE the kernel: invalid candidate slots are
  pre-filled with a valid point of the same component, which leaves extents
  unchanged and removes all per-point masking from the inner loop (the
  kernel is VPU-instruction-bound: 8 instructions per point instead of ~14);
  all-invalid components get (+big, -big) extents applied after the call;
- HBM traffic is one read of the candidate table + one write of the (K, D)
  extent tables.

Numerically within fma-rounding of the XLA sweep (asserted in
tests/test_pallas_sweep.py); downstream ties use relative epsilons far above
ulp noise.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38


def _make_kernel(n_pts, k):
    def kernel(px_ref, py_ref, cos_ref, sin_ref,
               minu_ref, maxu_ref, minv_ref, maxv_ref):
        cos = cos_ref[0]
        sin = sin_ref[0]
        x = px_ref[0, 0, :][None, :]
        y = py_ref[0, 0, :][None, :]
        minu = maxu = x * cos + y * sin
        minv = maxv = y * cos - x * sin
        for p in range(1, n_pts):  # static unroll: all indices are slices
            x = px_ref[0, p, :][None, :]
            y = py_ref[0, p, :][None, :]
            pu = x * cos + y * sin
            pv = y * cos - x * sin
            minu = jnp.minimum(minu, pu)
            maxu = jnp.maximum(maxu, pu)
            minv = jnp.minimum(minv, pv)
            maxv = jnp.maximum(maxv, pv)
        minu_ref[0] = minu
        maxu_ref[0] = maxu
        minv_ref[0] = minv
        maxv_ref[0] = maxv

    return kernel


@partial(jax.jit, static_argnames=('interpret',))
def sweep_extents(pts, valid, cos, sin, interpret=False):
    """Extents of candidate points along per-component directions.

    :param pts: (D, P, 2) float32 candidate points
    :param valid: (D, P) bool
    :param cos, sin: (D, K) float32 direction cosines per component
    :return: (min_u, max_u, min_v, max_v), each (D, K) float32; components
        with no valid points yield (+big, -big) extents like the XLA path
    """
    d, n_pts = valid.shape
    k = cos.shape[1]
    tile = 128
    dp = -(-d // tile) * tile
    kp = max(8, -(-k // 8) * 8)

    # replace invalid slots with the component's first valid point — extents
    # over duplicated valid points are identical, and the kernel then needs
    # no masking at all
    first = jnp.argmax(valid, axis=1)
    fill = pts[jnp.arange(d), first]              # (D, 2)
    pts_f = jnp.where(valid[..., None], pts, fill[:, None, :])

    def pad_pd(a):  # (D, P) -> (1, P, Dp)
        out = jnp.zeros((n_pts, dp), jnp.float32)
        return out.at[:, :d].set(a.T.astype(jnp.float32))[None]

    def pad_kd(a):  # (D, K) -> (1, Kp, Dp)
        out = jnp.zeros((kp, dp), jnp.float32)
        return out.at[:k, :d].set(a.T.astype(jnp.float32))[None]

    kernel = _make_kernel(n_pts, kp)
    in_spec_p = pl.BlockSpec((1, n_pts, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, kp, tile), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(dp // tile,),
        in_specs=[in_spec_p, in_spec_p, spec_k, spec_k],
        out_specs=(spec_k,) * 4,
        out_shape=(jax.ShapeDtypeStruct((1, kp, dp), jnp.float32),) * 4,
        interpret=interpret,
    )(pad_pd(pts_f[..., 0]), pad_pd(pts_f[..., 1]), pad_kd(cos), pad_kd(sin))
    minu, maxu, minv, maxv = (o[0, :k, :d].T for o in outs)
    none_valid = ~jnp.any(valid, axis=1, keepdims=True)  # (D, 1)
    big = jnp.float32(_BIG)
    return (jnp.where(none_valid, big, minu),
            jnp.where(none_valid, -big, maxu),
            jnp.where(none_valid, big, minv),
            jnp.where(none_valid, -big, maxv))
