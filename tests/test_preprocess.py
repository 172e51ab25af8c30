"""Bit-exactness tests of the preprocessing ops against OpenCV."""

import cv2
import numpy as np
import pytest

from ysmr_tpu.ops import preprocess as pp


@pytest.fixture
def frames(rng):
    return rng.integers(0, 256, (3, 61, 83, 3), dtype=np.uint8)


def test_bgr_to_gray_exact(frames):
    ours = np.asarray(pp.bgr_to_gray(frames))
    for i, f in enumerate(frames):
        ref = cv2.cvtColor(f, cv2.COLOR_BGR2GRAY)
        assert np.array_equal(ours[i].astype(np.uint8), ref)


def test_blur3_exact(frames):
    gray = np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2GRAY) for f in frames])
    ours = np.asarray(pp.blur3(gray.astype(np.int32)))
    for i in range(len(frames)):
        ref = cv2.GaussianBlur(gray[i], (3, 3), 0)
        assert np.array_equal(ours[i].astype(np.uint8), ref)


def test_gaussian_kernel_matches_cv2():
    ref = cv2.getGaussianKernel(11, 0, ktype=cv2.CV_32F).ravel()
    assert np.allclose(pp._K11_F32, ref, atol=1e-7)


@pytest.mark.parametrize('c_offset', [-7.0, -5.0, -2.5, 0.0, 3.0, 5.0, 7.5])
@pytest.mark.parametrize('white', [True, False])
def test_adaptive_threshold_exact(rng, c_offset, white):
    img = rng.integers(0, 256, (61, 83), dtype=np.uint8)
    ttype = cv2.THRESH_BINARY if white else cv2.THRESH_BINARY_INV
    ref = cv2.adaptiveThreshold(img, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
                                ttype, 11, c_offset) > 0
    ours = np.asarray(pp.adaptive_threshold(img.astype(np.int32), c_offset, white))
    assert np.array_equal(ours, ref)


def test_adaptive_threshold_exact_fullsize(rng):
    img = rng.integers(0, 256, (922, 1228), dtype=np.uint8)
    ref = cv2.adaptiveThreshold(img, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
                                cv2.THRESH_BINARY, 11, -5.0) > 0
    ours = np.asarray(pp.adaptive_threshold(img.astype(np.int32), -5.0, True))
    assert np.array_equal(ours, ref)


def test_mean_std_exact(rng):
    img = rng.integers(0, 256, (2, 97, 113), dtype=np.uint8)
    total, hi, lo = pp.frame_mean_std_sums(img.astype(np.int32))
    mean, std = pp.combine_mean_std(97 * 113, np.asarray(total),
                                    np.asarray(hi), np.asarray(lo))
    for i in range(2):
        m_ref, s_ref = cv2.meanStdDev(img[i])
        assert mean[i] == pytest.approx(m_ref.item(), abs=1e-9)
        assert std[i] == pytest.approx(s_ref.item(), abs=1e-9)


def test_moving_average_threshold_semantics():
    """Mirror of track_eval.py:221-253: 5 s moving window, int() truncation."""
    mat = pp.MovingAverageThreshold(fps=2, offset=5, white_on_dark=True)
    # window max length = 10; feed 12 frames
    means = np.linspace(100, 122, 12)
    stds = np.full(12, 3.0)
    got = mat.update_batch(means, stds)
    # replicate naively
    window = []
    want = []
    for m, s in zip(means, stds):
        window.append(m + s + 5)
        want.append(int(sum(window) / len(window)))
        if len(window) > 10:
            del window[0]
    assert got.tolist() == want


def test_global_threshold_matches_cv2(rng):
    img = rng.integers(0, 256, (61, 83), dtype=np.uint8)
    for white, ttype in [(True, cv2.THRESH_BINARY), (False, cv2.THRESH_BINARY_INV)]:
        for t in [-3, 0, 100, 254]:
            ref = cv2.threshold(img, t, 255, ttype)[1] > 0
            ours = np.asarray(pp.global_threshold(img.astype(np.int32), t, white))
            assert np.array_equal(ours, ref), (white, t)


def test_detect_mode_mapping():
    assert pp.detect_mode_from_settings({'adaptive double threshold': 2.0}) \
        == 'adaptive_double'
    assert pp.detect_mode_from_settings({'adaptive double threshold': 0.0}) == 'adaptive'
    assert pp.detect_mode_from_settings({'adaptive double threshold': -1.0}) == 'mean'


def test_resolve_detection_rule_dark_degeneration():
    """Dark-mode double threshold degenerates to a single threshold at the
    marker offset (reference track_eval.py:125-131 + :200-208 with scipy
    binary_propagation keeping input pixels); bright mode is unchanged."""
    from ysmr_tpu.ops.preprocess import resolve_detection_rule
    base = {'adaptive double threshold': 2.0,
            'threshold offset for detection': 5,
            'white bacteria on dark background': True}
    assert resolve_detection_rule(base) == ('adaptive_double', 5)
    dark = dict(base, **{'white bacteria on dark background': False})
    # effective offset -5; marker C = -(-5 + 2) = 3 is weaker than mask C=5
    assert resolve_detection_rule(dark) == ('adaptive', -3)
    # fractional delta that does not move the integer floor keeps the
    # subset interpretation
    dark_frac = dict(dark, **{'adaptive double threshold': 0.4,
                              'threshold offset for detection': 5.5})
    mode, off = resolve_detection_rule(dark_frac)
    assert mode == 'adaptive_double'
    # single and mean modes pass through
    single = dict(base, **{'adaptive double threshold': 0.0})
    assert resolve_detection_rule(single) == ('adaptive', 5)
    mean = dict(base, **{'adaptive double threshold': -1.0})
    assert resolve_detection_rule(mean) == ('mean', 5)
