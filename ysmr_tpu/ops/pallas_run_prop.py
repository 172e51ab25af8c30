#!/usr/bin/env python3
"""Fused Pallas kernel for the run-graph CC min-label fixpoint.

``run_cc.propagate_min`` iterates tiny (T, R) table ops under a
``lax.while_loop``; at bacteria scale every XLA op in the step is
launch-overhead-bound on this chip (~9 ms/batch/step, ~59% of the whole
device detect budget — see STATUS.md round-3 kernel table). This kernel
runs the ENTIRE fixpoint — shifted chain mins, the four window-endpoint
relaxations, path halving, and the convergence check — inside one
``pallas_call`` with the tables resident in VMEM, so each extra step costs
vector work only (~µs) instead of kernel launches.

Workload being replaced: the reference labels blobs per frame inside its
Python frame loop (/root/reference/ysmr/track_eval.py:273-283, via
cv2.findContours); here labeling is min-label propagation over compact run
tables (see ops/run_cc.py module docstring for the exact edge set).

Design notes (tpu):
- Tables are laid out per frame as (S, 128) int32 tiles (S = R/128); the
  grid iterates frames, so Mosaic double-buffers the HBM->VMEM block
  copies across programs while the previous frame converges.
- Mosaic's dynamic gather (``jnp.take_along_axis``) only gathers along
  lanes within a 128-wide row (measured: width 256+ fails to compile).
  An R-wide gather therefore decomposes into per-source-row passes of the
  native 128-lane gather.
- The gather targets are NEAR-DIAGONAL: a run's window endpoints live
  within two rows of runs (|Δindex| ≲ 2·runs-per-row ≈ 6..40 across
  bench/dense scales) and path-halving targets stay inside the blob's own
  run span. So the kernel first does ``2·diag+1`` cheap diagonal passes
  (``pltpu.roll`` of the label tile by δ sublanes + lane gather + select)
  and runs the generic all-S-source-rows loop ONLY if some element's
  source row is farther than ``diag`` (a per-frame scalar test; for the
  step-invariant window planes it is hoisted out of the fixpoint loop).
- Invalid window endpoints point at the run ITSELF instead of carrying a
  validity mask: ``min(lab, lab[self])`` is the identity, which deletes
  four mask planes and their selects from the hot loop.
- The same-row chain relaxation keeps the shift+mask form (two
  ``pltpu.roll`` + lane-127/0 fixups) — a shift is two vector ops while a
  gather costs a pass loop. ``chain_hops`` relaxes several chain hops per
  gather round: chain hops are ~10x cheaper than a gather round, and long
  same-row chains (31-pixel wire splits) otherwise dominate the step
  count.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: plain int so kernels don't capture a device constant
_BIG = 1 << 28


def _gather_generic(lab_ref, g, l, res, done_upto, s):
    """All-source-rows gather passes for |source - dest| > done_upto.

    ``res`` already holds values for the near-diagonal elements; only
    elements whose source row is farther than ``done_upto`` from their
    destination row still need filling (their mask in ``need``).
    """
    m = g.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 0) % s
    need = jnp.abs(g - row) > done_upto

    def body(gg, res):
        src = jnp.broadcast_to(lab_ref[pl.ds(gg, 1), :], g.shape)
        v = jnp.take_along_axis(src, l, axis=1)
        return jnp.where(need & (g == gg), v, res)

    return jax.lax.fori_loop(0, s, body, res)


def _gather_diag(lab, g, l, s, diag):
    """Near-diagonal gather: lab.flat[idx] where source row is within
    ``diag`` of the destination row (mod s for stacked planes); other
    elements keep their self value (idx semantics guarantee self-min is a
    no-op, so a later generic pass can overwrite them).
    """
    m = g.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 0) % s
    delta = g - row
    res = None
    for d in range(-diag, diag + 1):
        rolled = pltpu.roll(lab, (-d) % s, 0) if d else lab
        if m != s:
            rolled = jnp.broadcast_to(rolled[None], (m // s, s, 128)
                                      ).reshape(m, 128)
        v = jnp.take_along_axis(rolled, l, axis=1)
        res = v if res is None else jnp.where(delta == d, v, res)
    return jnp.where(jnp.abs(delta) <= diag, res, 0), delta


def _prop_kernel(init_ref, idxw_ref, link_ref, linkl_ref, out_ref,
                 lab_ref, chg_ref, *, s, max_iters, diag, chain_hops):
    lab_ref[:] = init_ref[0]
    chg_ref[0] = jnp.int32(1)
    link = link_ref[0] != 0
    linkl = linkl_ref[0] != 0
    idxw = idxw_ref[0].reshape(4 * s, 128)
    g4 = idxw >> 7
    l4 = idxw & 127
    lane = jax.lax.broadcasted_iota(jnp.int32, (s, 128), 1)
    last_lane = lane == 127
    first_lane = lane == 0
    r = s * 128
    use_diag = s > 2 * diag + 1
    if use_diag:
        roww = jax.lax.broadcasted_iota(jnp.int32, (4 * s, 128), 0) % s
        win_far = jnp.any(jnp.abs(g4 - roww) > diag)
    else:
        win_far = jnp.bool_(True)

    def chain_relax(lab):
        ln = pltpu.roll(lab, 127, 1)
        lnr = pltpu.roll(pltpu.roll(lab, s - 1, 0), 127, 1)
        nxt = jnp.where(last_lane, lnr, ln)
        lp = pltpu.roll(lab, 1, 1)
        lpr = pltpu.roll(pltpu.roll(lab, 1, 0), 1, 1)
        prv = jnp.where(first_lane, lpr, lp)
        return jnp.minimum(lab, jnp.minimum(
            jnp.where(link, nxt, _BIG), jnp.where(linkl, prv, _BIG)))

    def body(_it, _c):
        @pl.when(chg_ref[0] != 0)
        def _():
            old = lab_ref[:]
            lab = old
            for _ in range(chain_hops):
                lab = chain_relax(lab)
            lab_ref[:] = lab
            # window-endpoint relaxation (4 index planes, one gather set)
            if use_diag:
                v4, _ = _gather_diag(lab, g4, l4, s, diag)

                @pl.when(win_far)
                def _():
                    vfull = _gather_generic(lab_ref, g4, l4, v4, diag, s)
                    lab_ref[:] = jnp.minimum(
                        lab, vfull.reshape(4, s, 128).min(axis=0))

                @pl.when(jnp.logical_not(win_far))
                def _():
                    lab_ref[:] = jnp.minimum(
                        lab, v4.reshape(4, s, 128).min(axis=0))
            else:
                v4 = _gather_generic(lab_ref, g4, l4,
                                     jnp.zeros((4 * s, 128), jnp.int32),
                                     -1, s)
                lab_ref[:] = jnp.minimum(lab, v4.reshape(4, s, 128
                                                         ).min(axis=0))
            lab = lab_ref[:]
            # path halving: lab mod R names a run inside my own component
            tgt = jnp.where(lab >= r, lab - r, lab)
            gp = tgt >> 7
            lp_ = tgt & 127
            if use_diag:
                jmp, delta = _gather_diag(lab, gp, lp_, s, diag)
                path_far = jnp.any(jnp.abs(delta) > diag)

                @pl.when(path_far)
                def _():
                    jfull = _gather_generic(lab_ref, gp, lp_, jmp, diag, s)
                    new = jnp.minimum(lab, jfull)
                    chg_ref[0] = jnp.any(new != old).astype(jnp.int32)
                    lab_ref[:] = new

                @pl.when(jnp.logical_not(path_far))
                def _():
                    new = jnp.minimum(lab, jmp)
                    chg_ref[0] = jnp.any(new != old).astype(jnp.int32)
                    lab_ref[:] = new
            else:
                jmp = _gather_generic(lab_ref, gp, lp_,
                                      jnp.zeros((s, 128), jnp.int32), -1, s)
                new = jnp.minimum(lab, jmp)
                chg_ref[0] = jnp.any(new != old).astype(jnp.int32)
                lab_ref[:] = new

        return _c

    jax.lax.fori_loop(0, max_iters, body, None)
    out_ref[0] = lab_ref[:]


@partial(jax.jit, static_argnames=('max_iters', 'diag', 'chain_hops',
                                   'interpret'))
def propagate_min_fused(init, win, link, *, max_iters=64, diag=1,
                        chain_hops=2, interpret=False):
    """Drop-in fused replacement for ``run_cc.propagate_min``.

    Same contract: (T, R) int32 initial labels -> converged min labels over
    the run graph defined by ``win`` (window endpoints) and ``link`` (chain
    edges). R is padded to a multiple of 128 internally; padded slots are
    isolated self-components and are sliced off the output.
    """
    t, r = init.shape
    rp = max(128, -(-r // 128) * 128)
    s = rp // 128
    pad = rp - r
    iota = jnp.broadcast_to(jnp.arange(rp, dtype=jnp.int32)[None, :], (t, rp))

    def pad_to(a, fill):
        if pad == 0:
            return a
        return jnp.concatenate(
            [a, jnp.full((t, pad), fill, a.dtype)], axis=1)

    init_p = jnp.concatenate([init, iota[:, r:]], axis=1) if pad else init
    planes = []
    for idx_k, ok_k in (('lo_up', 'ok_up'), ('hi_up', 'ok_up'),
                        ('lo_dn', 'ok_dn'), ('hi_dn', 'ok_dn')):
        v = jnp.where(win[ok_k], jnp.clip(win[idx_k], 0, r - 1),
                      iota[:, :r])
        planes.append(pad_to(v, 0))
    idxw = jnp.stack(planes, axis=1)  # (T, 4, RP)
    if pad:
        idxw = idxw.at[:, :, r:].set(iota[:, r:][:, None, :])
    link_p = pad_to(link.astype(jnp.int32), 0)
    link_l = jnp.concatenate(
        [jnp.zeros((t, 1), jnp.int32), link_p[:, :-1]], axis=1)

    out = pl.pallas_call(
        partial(_prop_kernel, s=s, max_iters=max_iters, diag=diag,
                chain_hops=chain_hops),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, s, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, s, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, s, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((s, 128), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(init_p.reshape(t, s, 128), idxw.reshape(t, 4, s, 128),
      link_p.reshape(t, s, 128), link_l.reshape(t, s, 128))
    return out.reshape(t, rp)[:, :r]
