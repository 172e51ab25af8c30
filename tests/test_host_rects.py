"""Pipeline-level tests of the host cv2-bit-exact rect measurement mode
('cv2 exact rects', pipeline/track_bacteria.py): the tracker runs one batch
behind detection on measurements produced by native/cv2_exact.cpp from the
host-side wire pixels (reference chain: track_eval.py:285-304)."""

import os
import sys

import cv2
import numpy as np
import pytest

from tests.test_e2e_parity import REFERENCE_PATH, _make_settings

pytestmark = pytest.mark.e2e


def _growing_clip(path, n_frames=96, w=384, h=288, fps=30, base_bugs=8,
                  extra_bugs=150, grow_at=48):
    """Few blobs first, many later: the per-batch detection-slot bucket
    (trk_d, starts at 128) must upgrade mid-run without disturbing the
    carried tracker state. Blobs sit on a well-separated grid with small
    drift so nearest-neighbour assignments are never knife-edge (tie flips
    would test float noise, not the bucket upgrade)."""
    rng = np.random.default_rng(5)
    n_total = base_bugs + extra_bugs
    gx, gy = np.meshgrid(np.arange(16, w - 16, 20), np.arange(16, h - 16, 20))
    grid = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(float)
    assert len(grid) >= n_total
    pos = grid[rng.permutation(len(grid))[:n_total]]
    vel = rng.uniform(-0.1, 0.1, (n_total, 2))
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'MJPG'), fps,
                             (w, h))
    assert writer.isOpened()
    for t in range(n_frames):
        frame = rng.normal(40, 4, (h, w)).clip(0, 255).astype(np.uint8)
        n_vis = base_bugs if t < grow_at else n_total
        for i in range(n_vis):
            p = pos[i] + vel[i] * t
            cv2.ellipse(frame, (int(round(p[0])), int(round(p[1]))),
                        (3, 2), float(37.0 * i % 180), 0, 360, 200, -1)
        writer.write(cv2.cvtColor(frame, cv2.COLOR_GRAY2BGR))
    writer.release()
    return path


def _reference_rows(video, settings, result_folder):
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        import ysmr.track_eval as ref_te
    except Exception:
        pytest.skip('reference implementation not available')
    ref_te.violin_plot = lambda **kwargs: None
    res = ref_te.track_bacteria(video, settings=dict(settings),
                                result_folder=result_folder)
    assert res is not None
    return res[0]


def test_bucket_upgrade_matches_reference(tmp_path):
    """Mid-run trk_d upgrade (8 -> 158 objects at frame 48, crossing the
    128-slot bucket) keeps exact id/measurement parity with the reference."""
    from ysmr_tpu import native
    from ysmr_tpu.pipeline.track_bacteria import track_bacteria
    if not native.available():
        pytest.skip('native library not built')
    video = _growing_clip(str(tmp_path / 'grow.avi'))
    settings = _make_settings(tmp_path, **{'max detections per frame': 256,
                                           'max track slots': 512})
    rd, od = str(tmp_path / 'r'), str(tmp_path / 'o')
    os.makedirs(rd)
    os.makedirs(od)
    ldf_r = _reference_rows(video, settings, rd)
    res = track_bacteria(video, settings=dict(settings), result_folder=od)
    assert res is not None
    ldf_o = res[0]
    assert ldf_o.shape[0] == ldf_r.shape[0]
    assert ldf_o['TRACK_ID'].tolist() == ldf_r['TRACK_ID'].tolist()
    assert ldf_o['POSITION_T'].tolist() == ldf_r['POSITION_T'].tolist()
    np.testing.assert_allclose(ldf_o['POSITION_X'], ldf_r['POSITION_X'],
                               atol=1e-9)
    np.testing.assert_allclose(ldf_o['POSITION_Y'], ldf_r['POSITION_Y'],
                               atol=1e-9)
    for col in ('WIDTH', 'HEIGHT', 'DEGREES_ANGLE'):
        np.testing.assert_allclose(ldf_o[col], ldf_r[col], atol=1e-12,
                                   err_msg=col)


def test_overflow_smoke(tmp_path):
    """max_det far below the object count: extra components drop (with the
    check_overflow warning), the run completes, and no frame carries more
    than max_det rows."""
    from ysmr_tpu import native
    from ysmr_tpu.pipeline.track_bacteria import track_bacteria
    if not native.available():
        pytest.skip('native library not built')
    from tests.test_e2e_parity import make_synthetic_video
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=48)
    settings = _make_settings(tmp_path, **{'max detections per frame': 4,
                                           'max track slots': 64})
    od = str(tmp_path / 'o')
    os.makedirs(od)
    res = track_bacteria(video, settings=dict(settings), result_folder=od)
    assert res is not None
    df = res[0]
    assert df.groupby('POSITION_T').size().max() <= 4
    # the warning text itself goes through the queue logging chain, whose
    # stream handlers outlive pytest's per-test capture — not asserted here


def test_opt_out_flag_uses_device_rects(tmp_path):
    """'cv2 exact rects' False keeps the device measurement path: the run
    completes with the same track/row counts as the host-rect run (exact
    id numbering may differ by design)."""
    from ysmr_tpu.pipeline.track_bacteria import track_bacteria
    from tests.test_e2e_parity import make_synthetic_video
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=60)
    base = _make_settings(tmp_path)
    out = {}
    for flag in (True, False):
        d = str(tmp_path / 'o{}'.format(flag))
        os.makedirs(d)
        s = dict(base)
        s['cv2 exact rects'] = flag
        res = track_bacteria(video, settings=s, result_folder=d)
        assert res is not None
        out[flag] = res[0]
    assert out[True].shape[0] == out[False].shape[0]
    assert out[True]['TRACK_ID'].nunique() == out[False]['TRACK_ID'].nunique()
    # centres agree across the two measurement chains to well under a
    # pixel (cv2's ~3e-4 px caliper noise can be amplified ~200x by the
    # filter weights at mode transitions — 0.1 px bounds that worst case)
    np.testing.assert_allclose(out[True]['POSITION_X'],
                               out[False]['POSITION_X'], atol=0.1)
    np.testing.assert_allclose(out[True]['POSITION_Y'],
                               out[False]['POSITION_Y'], atol=0.1)


def test_capacity_gate_disables_host_rects(tmp_path, monkeypatch):
    """Dense-scene capacities auto-disable host-rect mode: the host
    tracker's serial float64 cdist is O(slots x dets) and the per-detection
    contour trace runs on the single host core, so above 1024
    detections/frame the device tracker keeps the frame budget
    (track_bacteria.py capacity gate)."""
    from ysmr_tpu import native as native_mod
    from ysmr_tpu.pipeline.track_bacteria import track_bacteria
    from tests.test_e2e_parity import make_synthetic_video
    if not native_mod.available():
        pytest.skip('native library not built')
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=30)
    calls = {'n': 0}
    real = native_mod.cv2_rects_batch

    def counting(*args, **kwargs):
        calls['n'] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(native_mod, 'cv2_rects_batch', counting)
    for max_det, expect_host in ((512, True), (2048, False)):
        calls['n'] = 0
        d = str(tmp_path / 'gate{}'.format(max_det))
        os.makedirs(d)
        settings = _make_settings(tmp_path, **{
            'max detections per frame': max_det,
            'max track slots': 4096,
        })
        res = track_bacteria(video, settings=dict(settings), result_folder=d)
        assert res is not None
        assert (calls['n'] > 0) == expect_host
