"""Tracker-scan parity vs the reference CentroidTracker on identical inputs."""

import sys

import numpy as np
import pytest

from ysmr_tpu.ops import gsff as gsff_ops
from ysmr_tpu.pipeline import tracker as trk

REFERENCE_PATH = '/root/reference'


def _reference_tracker(fps=30.0, use_gsff=False):
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        from ysmr.tracker import CentroidTracker
    except Exception:
        pytest.skip('reference implementation not available')
    return CentroidTracker(max_disappeared=fps, fps=fps, n_min=0, n_max=30,
                           n_f=3, use_gsff=use_gsff)


def _run_reference(frames, fps=30.0, use_gsff=False):
    """frames: list of per-frame detection lists [((x, y), (w, h, deg)), ...]."""
    ct = _reference_tracker(fps=fps, use_gsff=use_gsff)
    rows = []
    for t, dets in enumerate(frames):
        rects = [(tuple(xy), tuple(whd)) for xy, whd in dets]
        objects, whd = ct.update(rects)
        for oid, centroid in objects.items():
            w, h, d = whd[oid]
            rows.append((t, oid, float(centroid[0]), float(centroid[1]),
                         float(w), float(h), float(d)))
    return rows


def _run_ours(frames, fps=30.0, use_gsff=False, max_slots=32, max_det=8):
    t_len = len(frames)
    det_xy = np.zeros((t_len, max_det, 2), np.float32)
    det_info = np.zeros((t_len, max_det, 3), np.float32)
    det_valid = np.zeros((t_len, max_det), bool)
    for t, dets in enumerate(frames):
        for j, (xy, whd) in enumerate(dets):
            det_xy[t, j] = xy
            det_info[t, j] = whd
            det_valid[t, j] = True
    kwargs = dict(max_disappeared=float(fps), use_gsff=use_gsff)
    if use_gsff:
        params = gsff_ops.GSFFParams(fps=fps, n_min=0, n_max=30, n_f=3)
        state = trk.init_tracker_state(max_slots, dims=2, use_gsff=True,
                                       gsff_params=params)
        kwargs.update(gsff_gains=params.gains, gsff_n_i=params.n_i_arr,
                      gsff_n_f=params.n_f, gsff_n_i0=params.n_i[0])
    else:
        state = trk.init_tracker_state(max_slots, dims=2)
    state, em = trk.run_tracker_scan(state, det_xy, det_info, det_valid, **kwargs)
    mask = np.asarray(em['mask'])
    ids = np.asarray(em['ids'])
    pos = np.asarray(em['pos'])
    info = np.asarray(em['info'])
    rows = []
    for t in range(t_len):
        live = np.nonzero(mask[t])[0]
        live = live[np.argsort(ids[t][live])]
        for s in live:
            rows.append((t, int(ids[t, s]), float(pos[t, s, 0]), float(pos[t, s, 1]),
                         float(info[t, s, 0]), float(info[t, s, 1]),
                         float(info[t, s, 2])))
    return rows


def _assert_rows_match(ours, ref, tol=1e-3):
    assert len(ours) == len(ref), (len(ours), len(ref))
    for a, b in zip(ours, ref):
        assert a[0] == b[0] and a[1] == b[1], (a, b)
        assert np.allclose(a[2:], b[2:], atol=tol), (a, b)


def _drifting_scene(rng, n_frames=60, fps=30.0):
    """Objects appear, drift, occlude, and vanish."""
    frames = []
    base = rng.uniform(50, 400, (5, 2))
    vel = rng.uniform(-3, 3, (5, 2))
    for t in range(n_frames):
        dets = []
        for i in range(5):
            # object 3 vanishes frames 20-28 (within grace), object 4 for good
            if i == 3 and 20 <= t < 29:
                continue
            if i == 4 and t >= 35:
                continue
            p = base[i] + vel[i] * t + rng.normal(0, 0.3, 2)
            dets.append(((float(p[0]), float(p[1])),
                         (4.0 + i, 2.0, float(10 * i))))
        # a new object appears at frame 40
        if t >= 40:
            dets.append(((500.0 + 2.0 * t, 100.0), (5.0, 2.5, 45.0)))
        frames.append(dets)
    return frames


def test_parity_no_gsff_drifting(rng):
    frames = _drifting_scene(rng)
    _assert_rows_match(_run_ours(frames), _run_reference(frames))


def test_parity_no_gsff_empty_frames(rng):
    frames = _drifting_scene(rng, n_frames=20)
    frames[5] = []
    frames[6] = []
    _assert_rows_match(_run_ours(frames), _run_reference(frames))


def test_parity_no_gsff_dereg_after_grace(rng):
    # all objects vanish; after max_disappeared frames they are dropped
    fps = 5.0  # short grace for test speed
    frames = [[((10.0, 10.0), (3.0, 2.0, 0.0)), ((50.0, 50.0), (4.0, 2.0, 0.0))]]
    frames += [[] for _ in range(10)]
    frames += [[((12.0, 11.0), (3.0, 2.0, 0.0))]]
    ours = _run_ours(frames, fps=fps)
    ref = _run_reference(frames, fps=fps)
    _assert_rows_match(ours, ref)
    # the reappearing detection must have a NEW id (old ones deregistered)
    last_ids = {r[1] for r in ours if r[0] == len(frames) - 1}
    assert last_ids == {2}


def test_parity_no_gsff_contested(rng):
    # two objects converge on one detection: nearest wins, loser is skipped
    frames = []
    for t in range(12):
        a = (100.0 - 4.0 * t, 100.0)
        b = (140.0 - 7.0 * t, 100.0)
        frames.append([(a, (4.0, 2.0, 0.0)), (b, (4.0, 2.0, 10.0))])
    for t in range(6):
        frames.append([((52.0 + t, 100.0), (4.0, 2.0, 20.0))])
    _assert_rows_match(_run_ours(frames), _run_reference(frames))


def test_parity_gsff_drifting(rng):
    frames = _drifting_scene(rng, n_frames=70)
    ours = _run_ours(frames, use_gsff=True)
    ref = _run_reference(frames, use_gsff=True)
    # float32 GSFF drifts sub-0.05 px from the float64 reference near mode
    # transitions; identity structure (frame, id) must match exactly
    _assert_rows_match(ours, ref, tol=0.05)


def test_parity_gsff_with_disappearance(rng):
    fps = 8.0
    frames = []
    for t in range(40):
        dets = []
        if not (15 <= t < 20):  # object blinks out within grace
            dets.append(((100.0 + 3.0 * t, 50.0), (4.0, 2.0, 0.0)))
        dets.append(((300.0, 200.0 + 2.0 * t), (3.0, 3.0, 90.0)))
        frames.append(dets)
    ours = _run_ours(frames, fps=fps, use_gsff=True)
    ref = _run_reference(frames, fps=fps, use_gsff=True)
    _assert_rows_match(ours, ref, tol=5e-3)


def test_compact_emissions_device_roundtrip():
    """Single-buffer emissions compaction (compact_emissions_device): live
    slots packed to the front in slot order, counts/n_components in the
    int32 head row, float payloads bit-exact through the int32 bitcast
    (small ids bitcast to f32 would be denormals, which XLA data movement
    may flush to zero — the buffer is int32 for exactly that reason)."""
    import jax.numpy as jnp
    from ysmr_tpu.pipeline import tracker as trk
    from ysmr_tpu.pipeline.track_bacteria import (_compact_emissions,
                                                  _flight_rows)
    rng = np.random.default_rng(7)
    for dims in (2, 3):
        t_len, s = 5, 256
        em = {
            'mask': jnp.asarray(rng.random((t_len, s)) < 0.3),
            'ids': jnp.asarray(
                rng.integers(0, 10000, (t_len, s), dtype=np.int32)),
            'pos': jnp.asarray(
                rng.normal(size=(t_len, s, dims)).astype(np.float32)),
            'info': jnp.asarray(
                rng.normal(size=(t_len, s, 3)).astype(np.float32)),
            'det_col': jnp.asarray(
                rng.integers(-1, 64, (t_len, s), dtype=np.int32)),
            'n_det': jnp.asarray(
                rng.integers(0, 99, (t_len,), dtype=np.int32)),
        }
        ncomp = jnp.asarray(rng.integers(0, 99, (t_len,), dtype=np.int32))
        fv = np.ones(t_len, bool)
        fv[-1] = False
        ref_rows = _compact_emissions(em, 10, fv)
        # bucket 32 forces the overflow fallback to the padded arrays
        for bucket in (128, 32):
            packed = trk.compact_emissions_device(em, ncomp, bucket=bucket)
            pnp = np.asarray(packed)
            assert (pnp[:, 0, 0] == np.asarray(em['mask']).sum(1)).all()
            assert (pnp[:, 0, 1] == np.asarray(ncomp)).all()
            rows = _flight_rows(
                ({'packed': packed, 'k': dims, 'padded': em}, 10, fv,
                 None, None))
            for key in ref_rows:
                assert np.array_equal(ref_rows[key], rows[key]), (
                    dims, bucket, key)


def test_compact_readback_setting_same_rows(tmp_path):
    """'compact emissions readback' produces the identical _list.csv rows
    as the padded readback (device-tracker path)."""
    import os
    import pandas as pd
    from ysmr_tpu.pipeline.track_bacteria import track_bacteria
    from tests.test_e2e_parity import make_synthetic_video, _make_settings
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=45)
    out = {}
    for flag in (False, True):
        d = str(tmp_path / 'cr{}'.format(flag))
        os.makedirs(d)
        s = _make_settings(tmp_path, **{
            'cv2 exact rects': False,
            'compact emissions readback': flag,
        })
        res = track_bacteria(video, settings=dict(s), result_folder=d)
        assert res is not None
        out[flag] = res[0]
    pd.testing.assert_frame_equal(out[False], out[True])
