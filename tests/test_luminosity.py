"""Reference-exact rotated-rect luminosity (ILLUMINATION).

The reference computes mean gray over the filled rotated rectangle
(np.intp(cv2.boxPoints) -> cv2.fillPoly -> cv2.mean / 100,
track_eval.py:290-300). ops/luminosity.py must reproduce the pixel set and
the mean exactly given the same rectangle parameters.
"""

import cv2
import numpy as np
import pytest


def _cv2_lum(gray, cx, cy, w, h, ang):
    box = np.intp(cv2.boxPoints(((cx, cy), (w, h), ang)))
    mask = np.zeros(gray.shape, np.uint8)
    cv2.fillPoly(mask, [box], 255)
    return cv2.mean(gray, mask)[0] / 100.0


def test_box_points_int_matches_cv2():
    from ysmr_tpu.ops.luminosity import box_points_int
    rng = np.random.default_rng(0)
    for _ in range(200):
        cx, cy = rng.uniform(5, 120, 2)
        w, h = rng.uniform(0.5, 30, 2)
        ang = rng.uniform(-180, 180)
        ref = np.intp(cv2.boxPoints(((np.float32(cx), np.float32(cy)),
                                     (np.float32(w), np.float32(h)),
                                     np.float32(ang))))
        ours = np.asarray(box_points_int(
            np.float32(cx), np.float32(cy), np.float32(w), np.float32(h),
            np.float32(ang)))
        # same corner set (cv2 orders from its own first vertex)
        assert sorted(map(tuple, ours.tolist())) == \
            sorted(map(tuple, ref.tolist())), (cx, cy, w, h, ang)


def test_rect_mean_matches_cv2_exactly():
    """Interior rectangles: pixel-exact fillPoly set, means equal to f32."""
    from ysmr_tpu.ops.luminosity import rect_mean_luminosity
    rng = np.random.default_rng(1)
    H, W = 120, 160
    gray = rng.integers(0, 256, (H, W), np.uint8)
    n = 64
    cx = rng.uniform(25, W - 25, n).astype(np.float32)
    cy = rng.uniform(25, H - 25, n).astype(np.float32)
    w = rng.uniform(0.5, 16, n).astype(np.float32)
    h = rng.uniform(0.5, 16, n).astype(np.float32)
    ang = rng.uniform(-180, 180, n).astype(np.float32)
    valid = np.ones(n, bool)
    ours = np.asarray(rect_mean_luminosity(gray.astype(np.int32), cx, cy, w,
                                           h, ang, valid, win=48))
    ref = np.array([_cv2_lum(gray, cx[i], cy[i], w[i], h[i], ang[i])
                    for i in range(n)])
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6)


def test_rect_mean_invalid_and_degenerate():
    from ysmr_tpu.ops.luminosity import rect_mean_luminosity
    gray = np.full((40, 40), 150, np.int32)
    cx = np.array([20.0, 20.0], np.float32)
    cy = np.array([20.0, 20.0], np.float32)
    w = np.array([0.0, 4.0], np.float32)
    h = np.array([0.0, 2.0], np.float32)
    ang = np.zeros(2, np.float32)
    out = np.asarray(rect_mean_luminosity(gray, cx, cy, w, h, ang,
                                          np.array([True, False]), win=32))
    # degenerate rect still covers its single pixel (fillPoly draws it)
    assert out[0] == pytest.approx(1.5)
    assert out[1] == 0.0  # invalid detections emit 0


@pytest.mark.e2e
def test_e2e_luminosity_parity(tmp_path):
    """Full pipeline vs the reference with luminosity enabled: ILLUMINATION
    per row within tolerance (rect parameters differ by the f32 sweep's
    ~1e-3 px, which can flip a truncated corner on knife-edge values).

    GSFF is disabled here because the REFERENCE crashes on luminosity+GSFF:
    its filter bank hard-codes 2-D measurements (gsff.py:155-177) while the
    luminosity tracker feeds 3-D centroids. Our build filters x/y and
    carries luminosity through, so the combination works — but parity can
    only be tested on configurations the reference can run.
    """
    import sys
    from tests.test_e2e_parity import (_make_settings, make_synthetic_video,
                                       REFERENCE_PATH)
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=60,
                                 seed=5)
    settings = _make_settings(
        tmp_path, **{'include luminosity in tracking calculation': True,
                     'disable gsff': True,
                     'minimal length in seconds': 1.0,
                     'limit track length to x seconds': 1.5})
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        import ysmr.track_eval as ref_te
    except Exception:
        pytest.skip('reference implementation not available')
    import os
    ref_dir = str(tmp_path / 'ref')
    our_dir = str(tmp_path / 'ours')
    os.makedirs(ref_dir)
    os.makedirs(our_dir)
    ref_res = ref_te.track_bacteria(video, settings=dict(settings),
                                    result_folder=ref_dir)
    assert ref_res is not None
    from ysmr_tpu.pipeline.track_bacteria import track_bacteria
    our_res = track_bacteria(video, settings=dict(settings),
                             result_folder=our_dir)
    assert our_res is not None
    ldf_r, ldf_o = ref_res[0], our_res[0]

    # Reference quirk: the final sorted _list.csv LOSES the ILLUMINATION
    # column (sort_list -> get_data reads only the 7 canonical columns,
    # helper_file.py:880-890, then save_df_to_csv rewrites the file), so
    # the value itself never survives to a reference artifact. What IS
    # observable from the reference is the tracker behaviour under the
    # 3-D distance metric — assignments must match row for row:
    assert 'ILLUMINATION' not in ldf_r.columns  # documents the quirk
    assert ldf_o.shape[0] == ldf_r.shape[0]
    assert ldf_o['TRACK_ID'].tolist() == ldf_r['TRACK_ID'].tolist()
    assert ldf_o['POSITION_T'].tolist() == ldf_r['POSITION_T'].tolist()
    np.testing.assert_allclose(ldf_o['POSITION_X'], ldf_r['POSITION_X'],
                               atol=0.08)

    # Our artifact keeps the column; every row's value must equal the
    # reference recipe (boxPoints/fillPoly/mean on the true gray frame)
    # computed from that row's own rect parameters.
    assert 'ILLUMINATION' in ldf_o.columns
    cap = cv2.VideoCapture(video)
    grays = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        grays.append(cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY))
    cap.release()
    checked = 0
    for row in ldf_o.itertuples():
        if row.WIDTH == 0 and row.HEIGHT == 0:
            continue  # disappeared-but-alive rows carry zeroed side info
        expect = _cv2_lum(grays[int(row.POSITION_T)],
                          np.float32(row.POSITION_X),
                          np.float32(row.POSITION_Y),
                          np.float32(row.WIDTH), np.float32(row.HEIGHT),
                          np.float32(row.DEGREES_ANGLE))
        assert row.ILLUMINATION == pytest.approx(expect, abs=1e-5), row
        checked += 1
    assert checked > 100
