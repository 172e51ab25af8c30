"""Native float64 host tracker (native/tracker64.cpp) vs the ACTUAL
reference CentroidTracker + GaussianSumFIR on identical detection streams.

The native tracker exists to make TRACK_ID numbering and positions
reference-identical: it must reproduce the reference's float64 arithmetic
to ~1e-12 (ids, registration order, ageing, coasting self-feedback and all)."""

import sys

import numpy as np
import pytest

REFERENCE_PATH = '/root/reference'


def _reference_tracker(fps, use_gsff, dims=2):
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        from ysmr.tracker import CentroidTracker
    except Exception:
        pytest.skip('reference implementation not available')
    return CentroidTracker(max_disappeared=fps, fps=fps, n_min=0,
                           n_max=int(fps), n_f=3, use_gsff=use_gsff)


def _native_tracker(fps, use_gsff, dims=2):
    from ysmr_tpu import native
    from ysmr_tpu.ops import gsff as gsff_ops
    if not native.available():
        pytest.skip('native library not built')
    params = gsff_ops.GSFFParams(fps=fps, n_min=0, n_max=int(fps), n_f=3) \
        if use_gsff else None
    return native.Tracker64(dims=dims, max_disappeared=float(fps),
                            gsff_params=params)


def _random_stream(rng, n_frames=90, max_det=12, dims=2, drop_every=7):
    """Wandering objects with appearing/disappearing detections; float32
    rect values (as the cv2-exact measurement chain produces)."""
    n_obj = max_det
    pos = rng.uniform(20, 400, (n_obj, 2))
    vel = rng.uniform(-1.5, 1.5, (n_obj, 2))
    frames = []
    for t in range(n_frames):
        rects = np.zeros((max_det, 5), np.float32)
        valid = np.zeros((max_det,), bool)
        lum = np.zeros((max_det,), np.float32)
        k = 0
        for i in range(n_obj):
            # objects drop out periodically (forces coasting + re-matching)
            if (t + i) % drop_every == 0:
                continue
            if t > 60 and i >= n_obj - 2:
                continue  # two objects die near the end (deregistration)
            p = pos[i] + vel[i] * t
            rects[k] = [np.float32(p[0]), np.float32(p[1]),
                        np.float32(3 + i % 4), np.float32(2 + i % 3),
                        np.float32(-5.0 * (i + 1) % 90)]
            lum[k] = np.float32(0.5 + 0.01 * i)
            valid[k] = True
            k += 1
        frames.append((rects, valid, lum))
    return frames


def _run_reference(ct, frames, dims=2):
    rows = []
    for t, (rects, valid, lum) in enumerate(frames):
        dets = []
        for c in range(len(valid)):
            if not valid[c]:
                continue
            coords = (float(rects[c, 0]), float(rects[c, 1]))
            if dims == 3:
                coords = coords + (float(lum[c]),)
            dets.append((coords, (float(rects[c, 2]), float(rects[c, 3]),
                                  float(rects[c, 4]))))
        objects, wh = ct.update(dets)
        for oid, centroid in objects.items():
            w, h, deg = wh[oid][0], wh[oid][1], wh[oid][2]
            rows.append((t, int(oid), float(centroid[0]), float(centroid[1]),
                         float(w), float(h), float(deg)))
    rows.sort(key=lambda r: (r[0], r[1]))
    return rows


@pytest.mark.parametrize('use_gsff', [True, False])
def test_matches_reference_stream(use_gsff):
    rng = np.random.default_rng(3)
    frames = _random_stream(rng)
    ref = _reference_tracker(30.0, use_gsff)
    nat = _native_tracker(30.0, use_gsff)
    ref_rows = _run_reference(ref, frames)

    rects = np.stack([f[0] for f in frames])
    valid = np.stack([f[1] for f in frames])
    out = nat.update_batch(rects, valid, frame0=0)

    assert len(ref_rows) == len(out['TRACK_ID'])
    ids = [int(i) for i in out['TRACK_ID']]
    ts = [int(t) for t in out['POSITION_T']]
    assert ids == [r[1] for r in ref_rows]
    assert ts == [r[0] for r in ref_rows]
    for col, idx, tol in (('POSITION_X', 2, 1e-9), ('POSITION_Y', 3, 1e-9),
                          ('WIDTH', 4, 0.0), ('HEIGHT', 5, 0.0),
                          ('DEGREES_ANGLE', 6, 0.0)):
        ref_col = np.array([r[idx] for r in ref_rows])
        np.testing.assert_allclose(out[col], ref_col, atol=tol, rtol=0,
                                   err_msg=col)
    assert nat.next_id == ref.nextObjectID


def test_matches_reference_with_empty_frames():
    """Empty frames age every track and still run the GSFF coast loop."""
    rng = np.random.default_rng(11)
    frames = _random_stream(rng, n_frames=70, max_det=6, drop_every=5)
    # blank out a run of frames entirely (shorter than the 1 s grace)
    for t in range(30, 50):
        frames[t][1][:] = False
    ref = _reference_tracker(30.0, True)
    nat = _native_tracker(30.0, True)
    ref_rows = _run_reference(ref, frames)
    rects = np.stack([f[0] for f in frames])
    valid = np.stack([f[1] for f in frames])
    out = nat.update_batch(rects, valid, frame0=0)
    assert len(ref_rows) == len(out['TRACK_ID'])
    assert [int(i) for i in out['TRACK_ID']] == [r[1] for r in ref_rows]
    np.testing.assert_allclose(out['POSITION_X'],
                               [r[2] for r in ref_rows], atol=1e-9, rtol=0)
    np.testing.assert_allclose(out['POSITION_Y'],
                               [r[3] for r in ref_rows], atol=1e-9, rtol=0)


def test_batch_split_invariance():
    """Feeding the same stream in one batch or many must be identical
    (state carries across update_batch calls)."""
    rng = np.random.default_rng(7)
    frames = _random_stream(rng, n_frames=60, max_det=8)
    rects = np.stack([f[0] for f in frames])
    valid = np.stack([f[1] for f in frames])
    one = _native_tracker(30.0, True).update_batch(rects, valid, frame0=0)
    nat = _native_tracker(30.0, True)
    parts = []
    for s in range(0, 60, 13):
        parts.append(nat.update_batch(rects[s:s + 13], valid[s:s + 13],
                                      frame0=s))
    for col in one:
        merged = np.concatenate([p[col] for p in parts])
        # per-batch outputs are (frame, id)-sorted; frames are batch-ordered
        np.testing.assert_array_equal(one[col], merged, err_msg=col)


def test_luminosity_dims3_no_gsff():
    """dims=3 distance includes the ILLUMINATION component (reference
    tracker semantics; the reference's GSFF cannot take 3-D input, so this
    mode runs unfiltered)."""
    rng = np.random.default_rng(5)
    frames = _random_stream(rng, n_frames=40, max_det=5)
    ref = _reference_tracker(30.0, False)
    nat = _native_tracker(30.0, False, dims=3)
    # reference rows with 3-D centroids
    rows = []
    for t, (rects, valid, lum) in enumerate(frames):
        dets = [((float(rects[c, 0]), float(rects[c, 1]), float(lum[c])),
                 (float(rects[c, 2]), float(rects[c, 3]), float(rects[c, 4])))
                for c in range(len(valid)) if valid[c]]
        objects, wh = ref.update(dets)
        for oid, centroid in objects.items():
            rows.append((t, int(oid), float(centroid[0]), float(centroid[1]),
                         float(centroid[2]) if len(centroid) > 2 else 0.0))
    rows.sort(key=lambda r: (r[0], r[1]))
    rects = np.stack([f[0] for f in frames])
    valid = np.stack([f[1] for f in frames])
    lum = np.stack([f[2] for f in frames])
    out = nat.update_batch(rects, valid, frame0=0, lum=lum)
    assert [int(i) for i in out['TRACK_ID']] == [r[1] for r in rows]
    np.testing.assert_allclose(out['POSITION_X'], [r[2] for r in rows],
                               atol=0, rtol=0)
    np.testing.assert_allclose(out['ILLUMINATION'], [r[4] for r in rows],
                               atol=0, rtol=0)


def test_cpython_set_order_replication():
    """The reference registers new objects in the iteration order of
    ``set(range(n)).difference(used_cols)`` — CPython hash-slot order, not
    ascending. The native replication must match CPython exactly."""
    import ctypes

    from ysmr_tpu import native
    if not native.available():
        pytest.skip('native library not built')
    lib = native._load()
    lib.cpython_set_order_probe.restype = None
    lib.cpython_set_order_probe.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    rng = np.random.default_rng(123)
    for _ in range(2000):
        n_cols = int(rng.integers(1, 600))
        k = int(rng.integers(1, min(n_cols, 80) + 1))
        cand = np.sort(rng.choice(n_cols, size=k, replace=False)).astype(np.int64)
        used = set(range(n_cols)) - set(int(x) for x in cand)
        expect = list(set(range(n_cols)).difference(used))
        out = np.empty(k, np.int64)
        lib.cpython_set_order_probe(
            cand.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), k,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        assert list(out) == expect, (n_cols, cand.tolist())


def test_registration_burst_order_matches_reference():
    """Many existing tracks plus bursts of new detections at high column
    indices: registration order must follow the reference's set-iteration
    order (ids depend on it once unmatched column indices exceed the hash
    table size)."""
    rng = np.random.default_rng(21)
    n_frames, max_det = 60, 160
    pos = rng.uniform(20, 1000, (max_det, 2))
    vel = rng.uniform(-1.0, 1.0, (max_det, 2))
    frames = []
    for t in range(n_frames):
        rects = np.zeros((max_det, 5), np.float32)
        valid = np.zeros((max_det,), bool)
        # population grows in bursts of ~25 every 10 frames
        n_vis = min(40 + 25 * (t // 10), max_det)
        k = 0
        for i in range(n_vis):
            if (t + i) % 11 == 0:
                continue  # churn: holes force unmatched rows/cols
            p = pos[i] + vel[i] * t
            rects[k] = [np.float32(p[0]), np.float32(p[1]),
                        np.float32(4.0), np.float32(2.0), np.float32(-90.0)]
            valid[k] = True
            k += 1
        frames.append((rects, valid, np.zeros(max_det, np.float32)))
    ref = _reference_tracker(30.0, True)
    nat = _native_tracker(30.0, True)
    ref_rows = _run_reference(ref, frames)
    rects = np.stack([f[0] for f in frames])
    valid = np.stack([f[1] for f in frames])
    out = nat.update_batch(rects, valid, frame0=0)
    assert len(ref_rows) == len(out['TRACK_ID'])
    assert [int(i) for i in out['TRACK_ID']] == [r[1] for r in ref_rows]
    np.testing.assert_allclose(out['POSITION_X'], [r[2] for r in ref_rows],
                               atol=1e-9, rtol=0)
    np.testing.assert_allclose(out['POSITION_Y'], [r[3] for r in ref_rows],
                               atol=1e-9, rtol=0)
