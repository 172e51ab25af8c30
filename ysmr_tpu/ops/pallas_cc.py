#!/usr/bin/env python3
"""Fused Pallas kernel: rasterize -> connected components -> label gather.

The XLA formulation of the pixels-mode detect path (pipeline/detect_pixels.py)
round-trips full label images through HBM per frame (scatter, stencil
while-loop, gather — each a separate HBM pass). This kernel keeps the whole
frame resident in VMEM: per frame it

1. rasterizes the foreground pixel list into a VMEM label buffer (label =
   original linear pixel index, background = sentinel),
2. runs min-label stencil propagation to convergence with a VPU
   shifted-minimum loop (4- or 8-connectivity) entirely in VMEM,
3. for double-threshold mode, marks the component roots that contain marker
   pixels, derives per-pixel keep flags, re-rasterizes the kept set, and runs
   the 8-connectivity pass,
4. reads the final labels back at the foreground pixel positions.

TPU addressing notes: per-pixel data lives in SMEM (scalar reads/writes with
dynamic indices are legal there), while the image buffer is laid out as
(hp*wp/128, 128) in VMEM — a dynamic *sublane* index is legal, so a pixel
scatter is a (1,128) read-modify-write with a lane one-hot, and a gather is a
(1,128) read plus lane-select reduction. The stencil pass reshapes the same
buffer to (hp, wp) (free: both are row-major with wp % 128 == 0).

HBM traffic per frame is just the pixel lists (~100 KB) instead of several
full-image passes (~40 MB). Label values are identical to
ops.labeling.label_components (minimum ORIGINAL linear index per component),
so downstream compaction/statistics are shared with the XLA path and the two
paths are asserted equal in tests/test_pallas_cc.py.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SENTINEL = 2 ** 30  # python int (a jnp constant would be a captured const)

#: propagation steps between convergence tests in the while-loop kernels
#: (the test is a full-plane reduction costing about one propagation step;
#: extra steps past the fixed point are idempotent). Module-level so tests
#: and benchmarks can bisect compile/runtime behaviour.
_CHECK_EVERY = 8


def _pad_dims(h, w):
    # at least one padding row/column: the stencil uses circular rolls, and
    # the sentinel-filled pad ring keeps opposite image edges from touching
    hp = ((h + 8) // 8) * 8
    wp = ((w + 128) // 128) * 128
    return hp, wp


def _stencil_converge(lab, connectivity, max_iters, check_every=None):
    """Min-label propagation to convergence on a VMEM-resident (hp, wp) array.

    The convergence test is itself a full-array reduction pass costing about
    as much as one propagation step (measured on-chip), so it runs only every
    ``check_every`` steps: extra steps after the true fixed point are
    idempotent (min-propagation), and skipping most of the reductions is a
    net win at bacteria-scale convergence (~10-15 steps; interleaved A/B at
    bench shapes: 48.3 -> 42.2 ms/64-frame batch going from 1 to 8).
    """
    if check_every is None:
        check_every = _CHECK_EVERY
    is_fg = lab < _SENTINEL
    hp, wp = lab.shape

    def prop(lab):
        # pltpu.roll requires non-negative shifts; size-1 == -1 (circular)
        if connectivity == 8:
            # separable 3x3 min: vertical min of horizontal mins covers the
            # full 8-neighbourhood with 4 rolls instead of 8 — exact for
            # 8-connectivity because every pixel of the 3x3 block is itself
            # an 8-neighbour (background holds the sentinel, so paths
            # "through" it contribute nothing)
            hmin = jnp.minimum(lab, jnp.minimum(pltpu.roll(lab, 1, 1),
                                                pltpu.roll(lab, wp - 1, 1)))
            m = jnp.minimum(pltpu.roll(hmin, 1, 0),
                            pltpu.roll(hmin, hp - 1, 0))
            m = jnp.minimum(m, hmin)
        else:
            up = pltpu.roll(lab, 1, 0)
            down = pltpu.roll(lab, hp - 1, 0)
            left = pltpu.roll(lab, 1, 1)
            right = pltpu.roll(lab, wp - 1, 1)
            m = jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))
        return jnp.where(is_fg, jnp.minimum(lab, m), _SENTINEL)

    def one_round(state):
        lab, _, it = state
        new = lab
        for _ in range(check_every - 1):
            new = prop(new)
        last = prop(new)
        return last, jnp.any(last != new), it + check_every

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    lab, _, _ = jax.lax.while_loop(cond, one_round,
                                   (lab, jnp.any(is_fg), jnp.int32(0)))
    return lab


def _make_kernel(h, w, f, double_threshold, max_iters):
    hp, wp = _pad_dims(h, w)
    nrows = hp * wp // 128

    def kernel(lin_ref, flags_ref, lab_out_ref, keep_out_ref, lab_buf, aux_buf):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def buf_addr(lin):
            """original lin (y*w + x) -> padded buffer (row, lane).

            The row is clamped: some call sites evaluate buf_read on garbage
            (e.g. the keep pass reads the stashed root of *invalid* pixels
            whose result is discarded by a jnp.where) and an out-of-bounds
            VMEM access is a hardware fault, not a Python error.
            """
            lin = jnp.clip(lin, 0, h * w - 1)
            y = lin // w
            x = lin - y * w
            p = y * wp + x
            return p // 128, p - (p // 128) * 128

        def buf_write(buf, lin, value):
            row, lane = buf_addr(lin)
            cur = buf[pl.ds(row, 1), :]
            buf[pl.ds(row, 1), :] = jnp.where(lanes == lane, value, cur)

        def buf_read(buf, lin):
            row, lane = buf_addr(lin)
            return jnp.sum(jnp.where(lanes == lane, buf[pl.ds(row, 1), :], 0))

        def clear(buf, fill):
            buf[:, :] = jnp.full((nrows, 128), fill, jnp.int32)

        def stencil(connectivity):
            arr = lab_buf[:, :].reshape(hp, wp)
            arr = _stencil_converge(arr, connectivity, max_iters)
            lab_buf[:, :] = arr.reshape(nrows, 128)

        def raster(i, use_keep):
            fl = flags_ref[0, 0, i]
            ok = (fl & 1) > 0
            if use_keep:
                ok = ok & (keep_out_ref[0, 0, i] > 0)

            @pl.when(ok)
            def _():
                lin = lin_ref[0, 0, i]
                buf_write(lab_buf, lin, lin)
            return 0

        # ---- phase A: rasterize + first labeling ----
        clear(lab_buf, _SENTINEL)
        jax.lax.fori_loop(0, f, lambda i, c: raster(i, False), 0)
        stencil(4 if double_threshold else 8)

        if double_threshold:
            clear(aux_buf, 0)

            def mark(i, c):
                fl = flags_ref[0, 0, i]

                @pl.when((fl & 1) > 0)
                def _():
                    root = buf_read(lab_buf, lin_ref[0, 0, i])
                    lab_out_ref[0, 0, i] = root  # stash comp4 root label

                    @pl.when((fl & 2) > 0)
                    def _():
                        buf_write(aux_buf, root, 1)
                return 0

            jax.lax.fori_loop(0, f, mark, 0)

            def keep(i, c):
                fl = flags_ref[0, 0, i]
                kept = jnp.where((fl & 1) > 0,
                                 buf_read(aux_buf, lab_out_ref[0, 0, i]), 0)
                keep_out_ref[0, 0, i] = kept
                return 0

            jax.lax.fori_loop(0, f, keep, 0)

            # ---- phase B: re-rasterize kept pixels, 8-conn labeling ----
            clear(lab_buf, _SENTINEL)
            jax.lax.fori_loop(0, f, lambda i, c: raster(i, True), 0)
            stencil(8)
        else:
            def keep_all(i, c):
                keep_out_ref[0, 0, i] = flags_ref[0, 0, i] & 1
                return 0
            jax.lax.fori_loop(0, f, keep_all, 0)

        def readback(i, c):
            kept = keep_out_ref[0, 0, i] > 0
            lab_out_ref[0, 0, i] = jnp.where(
                kept, buf_read(lab_buf, lin_ref[0, 0, i]), jnp.int32(-1))
            return 0

        jax.lax.fori_loop(0, f, readback, 0)

    return kernel, hp, wp


def _label_frame_kernel(h, w, connectivity, max_iters, check_every=None):
    hp, wp = _pad_dims(h, w)

    def kernel(mask_ref, lab_ref):
        mask = mask_ref[0]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
        in_img = (row_ids < h) & (col_ids < w) & mask
        lin = row_ids * w + col_ids  # ORIGINAL linear index (matches XLA path)
        lab = jnp.where(in_img, lin, _SENTINEL)
        lab = _stencil_converge(lab, connectivity, max_iters, check_every)
        lab_ref[0] = jnp.where(in_img, lab, h * w)

    return kernel, hp, wp


@partial(jax.jit, static_argnames=('connectivity', 'max_iters', 'interpret'))
def label_components_whole_frame(mask, connectivity=8, max_iters=64,
                                 interpret=False):
    """Batched connected-components labeling with the frame resident in VMEM.

    Vectorised counterpart of ops.labeling.label_components (identical label
    semantics: minimum linear index per component, h*w for background): the
    min-label stencil iterates entirely in VMEM, so HBM traffic is one mask
    read plus one label write per frame instead of two full label images per
    stencil iteration.

    :param mask: (T, H, W) bool
    :return: (T, H, W) int32 labels
    """
    t, h, w = mask.shape
    kernel, hp, wp = _label_frame_kernel(h, w, connectivity, max_iters)
    mask_p = jnp.zeros((t, hp, wp), bool).at[:, :h, :w].set(mask)
    labels = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, hp, wp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(mask_p)
    return labels[:, :h, :w]


def _reconstruct_kernel(hp, wp, max_iters, check_every=None):
    if check_every is None:
        check_every = _CHECK_EVERY

    def kernel(mask_ref, marker_ref, out_ref):
        m = mask_ref[0]
        k = marker_ref[0] & m

        def grow(k):
            spread = k | pltpu.roll(k, 1, 0) | pltpu.roll(k, hp - 1, 0) | \
                pltpu.roll(k, 1, 1) | pltpu.roll(k, wp - 1, 1)
            return spread & m

        # convergence (a full-plane reduction) is only tested every
        # check_every dilation steps — extra steps past the fixed point are
        # idempotent and most reduction passes are saved
        def one_round(state):
            k, _, it = state
            for _ in range(check_every - 1):
                k = grow(k)
            last = grow(k)
            return last, jnp.any(last != k), it + check_every

        def cond(state):
            _, changed, it = state
            return jnp.logical_and(changed, it < max_iters)

        k, _, _ = jax.lax.while_loop(cond, one_round,
                                     (k, True, jnp.int32(0)))
        out_ref[0] = k

    return kernel


@partial(jax.jit, static_argnames=('max_iters', 'interpret'))
def binary_reconstruct(mask, marker, max_iters=64, interpret=False):
    """Morphological reconstruction of ``marker`` under ``mask`` (4-conn).

    scipy.ndimage.binary_propagation semantics (the reference's
    double-threshold keep rule, track_eval.py:211-214): a pixel survives iff
    it is 4-connected to a marker pixel within the mask. Implemented
    BIT-PACKED — 32 frames share one int32 plane, so a whole 64-frame batch
    propagates in two plane passes per iteration instead of 64. This
    replaces an entire min-label labeling phase (plus its sort) on the
    Pallas detect path.

    :param mask: (T, H, W) bool
    :param marker: (T, H, W) bool
    :return: (T, H, W) bool kept pixels
    """
    t, h, w = mask.shape
    hp, wp = _pad_dims(h, w)
    g = -(-t // 32)
    tp = g * 32

    def pack(arr):
        # unrolled OR chain: XLA fuses it into ONE pass over the bool
        # planes (a broadcast-multiply + sum(axis) materialises a 32x
        # uint32 intermediate instead — measured ~20x slower)
        arr_p = jnp.zeros((tp, hp, wp), bool).at[:t, :h, :w].set(arr)
        planes = arr_p.reshape(g, 32, hp, wp)
        word = planes[:, 0].astype(jnp.uint32)
        for b in range(1, 32):
            word = word | (planes[:, b].astype(jnp.uint32) << b)
        return word.astype(jnp.int32)

    packed = pl.pallas_call(
        _reconstruct_kernel(hp, wp, max_iters),
        grid=(g,),
        in_specs=[pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, hp, wp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pack(mask), pack(marker))

    word = packed.astype(jnp.uint32)
    frames = [((word >> b) & 1).astype(bool) for b in range(32)]
    unpacked = jnp.stack(frames, axis=1)
    return unpacked.reshape(tp, hp, wp)[:t, :h, :w]


@partial(jax.jit, static_argnames=('h', 'w', 'double_threshold', 'max_iters',
                                   'interpret'))
def cc_labels_at_pixels(px_x, px_y, px_valid, px_marker, *, h, w,
                        double_threshold, max_iters=64, interpret=False):
    """Component labels at foreground pixels, fully fused in Pallas.

    :param px_x, px_y: (T, F) int32 pixel coordinates (raster order)
    :param px_valid, px_marker: (T, F) bool
    :return: (lab_fg (T, F) int32 — min-linear-index component label, -1 for
              dropped/invalid pixels; keep (T, F) bool — pixel survives the
              marker reconstruction)
    """
    t, f = px_x.shape
    lin = (jnp.clip(px_y, 0, h - 1) * w + jnp.clip(px_x, 0, w - 1)).astype(jnp.int32)
    flags = (px_valid.astype(jnp.int32) |
             (px_marker.astype(jnp.int32) << 1)).astype(jnp.int32)
    kernel, hp, wp = _make_kernel(h, w, f, double_threshold, max_iters)
    # SMEM blocks must match the trailing array dims; give the per-frame
    # lists a (t, 1, f) layout so each program's block is exactly (1, 1, f)
    smem_spec = pl.BlockSpec((1, 1, f), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    lab_fg, keep = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[smem_spec, smem_spec],
        out_specs=(smem_spec, smem_spec),
        out_shape=(
            jax.ShapeDtypeStruct((t, 1, f), jnp.int32),
            jax.ShapeDtypeStruct((t, 1, f), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((hp * wp // 128, 128), jnp.int32),
            pltpu.VMEM((hp * wp // 128, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lin.reshape(t, 1, f), flags.reshape(t, 1, f))
    return lab_fg.reshape(t, f), keep.reshape(t, f) > 0
