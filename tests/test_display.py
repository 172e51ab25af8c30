"""Live display ('display video analysis', pipeline/display.py).

Reference behavior (track_eval.py:306-363): per-frame window with blue
detection boxes, green track IDs/centroids, FPS overlay; 'q' interrupts the
run with read-error semantics. Headless hosts must run normally with a
warning (cv2's Qt backend would otherwise SIGABRT the process).
"""

import numpy as np
import pytest

from tests.test_e2e_parity import make_synthetic_video


def _dummy_settings():
    return {'debugging': True}


def test_headless_display_disables(monkeypatch):
    from ysmr_tpu.pipeline.display import LiveDisplay
    monkeypatch.delenv('DISPLAY', raising=False)
    monkeypatch.delenv('WAYLAND_DISPLAY', raising=False)
    disp = LiveDisplay('clip.avi', _dummy_settings(), 48, 64)
    assert not disp.enabled


def _fake_batch(b=2, d=4, s=8):
    det = {
        'det_xy': np.tile(np.array([[10.0, 12.0]]), (b, d, 1)),
        'det_info': np.tile(np.array([[6.0, 3.0, 30.0]]), (b, d, 1)),
        'det_valid': np.zeros((b, d), bool),
    }
    det['det_valid'][:, :2] = True
    emis = {
        'mask': np.zeros((b, s), bool),
        'ids': np.zeros((b, s), np.int32),
        'pos': np.zeros((b, s, 2), np.float32),
    }
    emis['mask'][:, 0] = True
    emis['ids'][:, 0] = 7
    emis['pos'][:, 0] = (10.0, 12.0)
    frames = np.zeros((b, 48, 64, 3), np.uint8)
    return frames, det, emis


def test_show_batch_draws_and_q_interrupts(monkeypatch):
    import cv2
    from ysmr_tpu.pipeline import display as disp_mod
    monkeypatch.setenv('DISPLAY', ':0')
    shown = []
    monkeypatch.setattr(cv2, 'imshow', lambda name, img: shown.append(
        (name, img.copy())))
    keys = iter([255, ord('q')])
    monkeypatch.setattr(cv2, 'waitKey', lambda ms: next(keys))
    monkeypatch.setattr(cv2, 'destroyAllWindows', lambda: None)
    disp = disp_mod.LiveDisplay('clip.avi', {'debugging': False}, 48, 64)
    assert disp.enabled
    frames, det, emis = _fake_batch()
    disp.show_batch(frames, 2, det, emis, fps=42.0)
    assert disp.interrupted
    # both frames shown before the 'q' landed on the second
    names = [n for n, _ in shown]
    assert names == ['clip.avi unfiltered possible detections'] * 2
    # the drawn frame is no longer all-black (boxes/ids/fps were drawn)
    assert shown[0][1].any()


def test_show_batch_mask_windows_packed(monkeypatch):
    import cv2
    from ysmr_tpu.pipeline import display as disp_mod
    monkeypatch.setenv('DISPLAY', ':0')
    shown = []
    monkeypatch.setattr(cv2, 'imshow', lambda name, img: shown.append(name))
    monkeypatch.setattr(cv2, 'waitKey', lambda ms: 255)
    disp = disp_mod.LiveDisplay('clip.avi', {'debugging': True}, 48, 64)
    frames, det, emis = _fake_batch(b=1)
    # packed wire: pixel (x=5, y=3) plain + (x=6, y=3) marker
    det['px_packed'] = np.array([[3 * 64 + 5, (3 * 64 + 6) | (1 << 31)]],
                                np.uint32)
    det['count'] = np.array([2])
    disp.show_batch(frames, 1, det, emis, fps=1.0)
    # marker pixels present -> the foreground preview is labelled as the
    # pre-propagation set (see display._show_masks)
    assert 'threshold (pre-propagation)' in shown
    assert 'Adaptive double threshold markers' in shown


def test_track_bacteria_headless_display_matches_plain(tmp_path, monkeypatch):
    """With no GUI, 'display video analysis' must not change results."""
    import pandas as pd
    from tests.test_e2e_parity import _make_settings
    from ysmr_tpu.pipeline.track_bacteria import track_bacteria
    monkeypatch.delenv('DISPLAY', raising=False)
    monkeypatch.delenv('WAYLAND_DISPLAY', raising=False)
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=40)
    s_plain = _make_settings(tmp_path)
    out_a = tmp_path / 'plain'
    out_a.mkdir()
    res_a = track_bacteria(video, settings=s_plain, result_folder=str(out_a))
    assert res_a is not None
    s_disp = _make_settings(tmp_path)
    s_disp['display video analysis'] = True
    out_b = tmp_path / 'disp'
    out_b.mkdir()
    res_b = track_bacteria(video, settings=s_disp, result_folder=str(out_b))
    assert res_b is not None
    pd.testing.assert_frame_equal(res_a[0], res_b[0])


def test_track_bacteria_display_fake_gui_and_interrupt(tmp_path, monkeypatch):
    """Full pipeline with a monkeypatched GUI: every frame is previewed, and
    'q' interrupts with read-error semantics (reference track_eval.py:361-363:
    returns None, no _list.csv kept for the interrupted run)."""
    import cv2
    from tests.test_e2e_parity import _make_settings
    from ysmr_tpu.pipeline.track_bacteria import track_bacteria
    monkeypatch.setenv('DISPLAY', ':0')
    shown = []
    monkeypatch.setattr(cv2, 'imshow', lambda name, img: shown.append(name))
    monkeypatch.setattr(cv2, 'waitKey', lambda ms: 255)
    monkeypatch.setattr(cv2, 'destroyAllWindows', lambda: None)
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=40)
    settings = _make_settings(tmp_path)
    settings['display video analysis'] = True
    out_a = tmp_path / 'gui'
    out_a.mkdir()
    res = track_bacteria(video, settings=settings, result_folder=str(out_a))
    assert res is not None
    main = [n for n in shown if 'unfiltered possible detections' in n]
    assert len(main) == 40  # every frame previewed

    # now interrupt on the very first displayed frame
    shown.clear()
    monkeypatch.setattr(cv2, 'waitKey', lambda ms: ord('q'))
    out_b = tmp_path / 'gui_q'
    out_b.mkdir()
    res = track_bacteria(video, settings=settings, result_folder=str(out_b))
    assert res is None
