"""Device-tracker TRACK_ID parity with the reference's registration order.

The reference registers unmatched detections by iterating
``set(range(n_det)).difference(used_cols)`` (reference tracker.py:192-217) —
CPython's small-int hash-table slot order, which deviates from ascending
when few unmatched columns carry large indices (e.g. {33, 41, 46} iterate
as table slots, not sorted). The device scan registers in ascending column
order and ``ReferenceOrderRenumberer`` rewrites ids at readback by replaying
each frame's registrations through the real CPython set machinery
(pipeline/tracker.py). These tests drive both trackers with identical
streams engineered to wrap the hash table and assert id-level equality.
"""

import sys

import numpy as np
import pytest

REFERENCE_PATH = '/root/reference'


def _reference_tracker(fps, use_gsff):
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        from ysmr.tracker import CentroidTracker
    except Exception:
        pytest.skip('reference implementation not available')
    return CentroidTracker(max_disappeared=fps, fps=fps, n_min=0,
                           n_max=int(fps), n_f=3, use_gsff=use_gsff)


def _burst_stream(rng, n_frames=60, max_det=48, n_base=40):
    """Many persistent objects plus small bursts of appearances placed at
    HIGH detection columns — the configuration whose set-difference
    iteration deviates from ascending (few unmatched cols, large values).
    """
    pos = rng.uniform(50, 900, (max_det, 2))
    # well-separated objects so greedy matching is unambiguous
    pos[:, 0] += np.arange(max_det) * 60.0
    vel = rng.uniform(-0.8, 0.8, (max_det, 2))
    born = np.zeros(max_det, np.int64)
    # objects beyond the base population appear in bursts of 2-4
    extra = np.arange(n_base, max_det)
    t = 4
    i = 0
    while i < len(extra):
        burst = min(int(rng.integers(2, 5)), len(extra) - i)
        born[extra[i:i + burst]] = t
        t += int(rng.integers(3, 7))
        i += burst
    # a couple of base objects vanish for good mid-run (deregistration)
    dies = np.full(max_det, np.iinfo(np.int64).max)
    dies[rng.choice(n_base, 3, replace=False)] = n_frames // 2
    frames = []
    for tt in range(n_frames):
        alive = np.nonzero((born <= tt) & (tt < dies))[0]
        # fully shuffled column order: new registrations land on scattered
        # column indices, e.g. {7, 40} — which iterate as hash-table slots
        # (40 % 8 = 0 before 7 % 8 = 7), NOT ascending
        order = alive.copy()
        rng.shuffle(order)
        rects = np.zeros((max_det, 5), np.float32)
        valid = np.zeros((max_det,), bool)
        for c, i_obj in enumerate(order):
            p = pos[i_obj] + vel[i_obj] * tt
            rects[c] = [np.float32(p[0]), np.float32(p[1]),
                        np.float32(3 + i_obj % 4), np.float32(2 + i_obj % 3),
                        np.float32(-5.0 * (i_obj + 1) % 90)]
            valid[c] = True
        frames.append((rects, valid))
    return frames


def _run_reference(ct, frames):
    """(frame, id) -> (x, y) via the reference tracker."""
    out = {}
    for t, (rects, valid) in enumerate(frames):
        dets = [((float(rects[c, 0]), float(rects[c, 1])),
                 (float(rects[c, 2]), float(rects[c, 3]),
                  float(rects[c, 4])))
                for c in range(len(valid)) if valid[c]]
        objects, _ = ct.update(dets)
        for oid, centroid in objects.items():
            out[(t, int(oid))] = (float(centroid[0]), float(centroid[1]))
    return out


def _run_device(frames, fps, use_gsff, batch=16, via_packed=False):
    from ysmr_tpu.ops import gsff as gsff_ops
    from ysmr_tpu.pipeline import tracker as trk
    from ysmr_tpu.pipeline.track_bacteria import (_flight_rows,
                                                  _host_rows_from_packed)

    max_det = frames[0][0].shape[0]
    kwargs = dict(max_disappeared=float(fps), use_gsff=use_gsff)
    if use_gsff:
        params = gsff_ops.GSFFParams(fps=fps, n_min=0, n_max=int(fps), n_f=3)
        state = trk.init_tracker_state(256, dims=2, use_gsff=True,
                                       gsff_params=params)
        kwargs.update(gsff_gains=params.gains, gsff_n_i=params.n_i_arr,
                      gsff_n_f=params.n_f, gsff_n_i0=params.n_i[0])
    else:
        state = trk.init_tracker_state(256, dims=2)
    renum = trk.ReferenceOrderRenumberer()
    out = {}
    for start in range(0, len(frames), batch):
        chunk = frames[start:start + batch]
        t_len = len(chunk)
        xy = np.zeros((t_len, max_det, 2), np.float32)
        info = np.zeros((t_len, max_det, 3), np.float32)
        valid = np.zeros((t_len, max_det), bool)
        for t, (rects, v) in enumerate(chunk):
            xy[t] = rects[:, :2]
            info[t] = rects[:, 2:5]
            valid[t] = v
        state, em = trk.run_tracker_scan(state, xy, info, valid, **kwargs)
        fv = np.ones(t_len, bool)
        if via_packed:
            packed = trk.compact_emissions_device(
                em, np.asarray(valid.sum(1), np.int32), bucket=128)
            packed = np.asarray(packed)
            rows = _host_rows_from_packed(packed, packed[:, 0, 0], 2,
                                          start, fv, renumberer=renum)
        else:
            rows = _flight_rows(
                (em, start, fv, np.asarray(valid.sum(1), np.int32), None),
                renumberer=renum)
        if rows is None:
            continue
        for i in range(len(rows['TRACK_ID'])):
            out[(int(rows['POSITION_T'][i]), int(rows['TRACK_ID'][i]))] = (
                rows['POSITION_X'][i], rows['POSITION_Y'][i])
    return out


@pytest.mark.parametrize('seed', [0, 1, 2])
@pytest.mark.parametrize('via_packed', [False, True])
def test_registration_order_parity_no_gsff(seed, via_packed):
    rng = np.random.default_rng(seed)
    frames = _burst_stream(rng)
    ref = _run_reference(_reference_tracker(30, use_gsff=False), frames)
    ours = _run_device(frames, 30, use_gsff=False, via_packed=via_packed)
    assert set(ours) == set(ref)
    for key in ref:
        assert abs(ours[key][0] - ref[key][0]) < 1e-3, key
        assert abs(ours[key][1] - ref[key][1]) < 1e-3, key


def test_registration_order_parity_gsff():
    rng = np.random.default_rng(3)
    frames = _burst_stream(rng, n_frames=45)
    ref = _run_reference(_reference_tracker(30, use_gsff=True), frames)
    ours = _run_device(frames, 30, use_gsff=True)
    assert set(ours) == set(ref)
    for key in ref:
        assert abs(ours[key][0] - ref[key][0]) < 5e-2, key
        assert abs(ours[key][1] - ref[key][1]) < 5e-2, key


def test_stream_actually_permutes_order():
    """Guard that the synthetic stream really exercises non-ascending
    set iteration — otherwise the parity tests prove nothing."""
    rng = np.random.default_rng(0)
    frames = _burst_stream(rng)
    ct = _reference_tracker(30, use_gsff=False)
    deviated = False
    prev_ids = set()
    for t, (rects, valid) in enumerate(frames):
        n = int(valid.sum())
        dets = [((float(rects[c, 0]), float(rects[c, 1])), (0.0, 0.0, 0.0))
                for c in range(len(valid)) if valid[c]]
        objects, _ = ct.update(dets)
        new = [oid for oid in objects if oid not in prev_ids]
        if new and t > 0:
            # the columns the new ids took, in id order
            cols = []
            for oid in sorted(new):
                c = np.flatnonzero(
                    (rects[:n, 0] == objects[oid][0]) &
                    (rects[:n, 1] == objects[oid][1]))
                if len(c) == 1:
                    cols.append(int(c[0]))
            if cols != sorted(cols):
                deviated = True
        prev_ids = set(objects)
    assert deviated, 'stream never permuted the registration order'


def test_renumberer_survives_capacity_drops():
    """With fewer slots than objects, registrations are dropped (ids get
    gaps); the renumberer must stay consistent — no crashes, no id
    collisions, monotone per-frame id blocks."""
    from ysmr_tpu.pipeline import tracker as trk
    from ysmr_tpu.pipeline.track_bacteria import _flight_rows

    rng = np.random.default_rng(7)
    frames = _burst_stream(rng, n_frames=30, max_det=24, n_base=16)
    state = trk.init_tracker_state(12, dims=2)  # fewer slots than objects
    renum = trk.ReferenceOrderRenumberer()
    seen = {}
    max_det = frames[0][0].shape[0]
    for start in range(0, len(frames), 8):
        chunk = frames[start:start + 8]
        t_len = len(chunk)
        xy = np.zeros((t_len, max_det, 2), np.float32)
        info = np.zeros((t_len, max_det, 3), np.float32)
        valid = np.zeros((t_len, max_det), bool)
        for t, (rects, v) in enumerate(chunk):
            xy[t] = rects[:, :2]
            info[t] = rects[:, 2:5]
            valid[t] = v
        state, em = trk.run_tracker_scan(state, xy, info, valid,
                                         max_disappeared=3.0, use_gsff=False)
        rows = _flight_rows(
            (em, start, np.ones(t_len, bool),
             np.asarray(valid.sum(1), np.int32), None), renumberer=renum)
        if rows is None:
            continue
        for i in range(len(rows['TRACK_ID'])):
            key = (int(rows['POSITION_T'][i]), int(rows['TRACK_ID'][i]))
            # one row per (frame, id): renumbering must stay a bijection
            assert key not in seen, key
            seen[key] = True
    assert int(np.asarray(state['dropped_registrations'])) > 0, \
        'stream never dropped a registration; the test exercises nothing'
