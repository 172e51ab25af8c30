"""Fused Pallas CC kernel vs the XLA labeling path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax

from ysmr_tpu.ops import labeling as lb
from ysmr_tpu.ops.pallas_cc import cc_labels_at_pixels


def _random_pixel_scene(rng, h=96, w=256, f=512, n_blobs=8):
    import cv2
    img = np.zeros((h, w), np.uint8)
    markers = np.zeros((h, w), np.uint8)
    for k in range(n_blobs):
        c = (int(rng.integers(8, w - 8)), int(rng.integers(8, h - 8)))
        cv2.ellipse(img, c, (4, 2), int(rng.integers(0, 180)), 0, 360, 255, -1)
        if k % 2 == 0:
            markers[c[1], c[0]] = 255
    markers &= img
    ys, xs = np.nonzero(img)
    n = min(len(ys), f)
    px_x = np.zeros((1, f), np.int32)
    px_y = np.zeros((1, f), np.int32)
    valid = np.zeros((1, f), bool)
    marker = np.zeros((1, f), bool)
    px_x[0, :n] = xs[:n]
    px_y[0, :n] = ys[:n]
    valid[0, :n] = True
    marker[0, :n] = markers[ys[:n], xs[:n]] > 0
    return img > 0, markers > 0, px_x, px_y, valid, marker


@pytest.mark.parametrize('double', [False, True])
def test_pallas_cc_matches_xla_labeling(rng, double):
    h, w, f = 96, 256, 512
    mask, markers, px_x, px_y, valid, marker = _random_pixel_scene(rng, h, w, f)
    lab_fg, keep = cc_labels_at_pixels(
        px_x, px_y, valid, marker, h=h, w=w, double_threshold=double,
        max_iters=64, interpret=True)
    lab_fg = np.asarray(lab_fg)[0]
    keep = np.asarray(keep)[0]

    # XLA reference: same mask -> propagate markers (if double) -> cc8
    if double:
        kept_mask = np.asarray(lb.propagate_markers(mask, markers & mask))
    else:
        kept_mask = mask
    labels = np.asarray(lb.label_components(kept_mask, connectivity=8))
    v = np.asarray(valid)[0]
    for i in np.nonzero(v)[0]:
        x, y = int(px_x[0, i]), int(px_y[0, i])
        if kept_mask[y, x]:
            assert keep[i], (i, x, y)
            assert lab_fg[i] == labels[y, x], (i, x, y)
        else:
            assert not keep[i]
            assert lab_fg[i] == -1


def test_binary_reconstruct_matches_scipy(rng):
    """Bit-packed binary propagation == scipy.ndimage.binary_propagation
    (the reference's double-threshold keep rule), incl. a 33-frame batch
    that spans two bit planes and an all-background frame."""
    from scipy.ndimage import binary_propagation
    from ysmr_tpu.ops.pallas_cc import binary_reconstruct
    t, h, w = 33, 60, 150
    mask = np.zeros((t, h, w), bool)
    marker = np.zeros((t, h, w), bool)
    for i in range(t - 1):
        m, k, *_ = _random_pixel_scene(rng, h, w)
        mask[i], marker[i] = m, k & m
    got = np.asarray(binary_reconstruct(mask, marker, max_iters=64,
                                        interpret=True))
    for i in range(t):
        want = binary_propagation(marker[i], mask=mask[i])
        assert np.array_equal(got[i], want), i


def test_whole_frame_labeling_matches_xla(rng):
    from ysmr_tpu.ops.pallas_cc import label_components_whole_frame
    import tests.test_labeling as TL
    masks = np.stack([TL._random_blobs(np.random.default_rng(s), h=96, w=128)
                      for s in range(3)])
    for conn in (4, 8):
        got = np.asarray(label_components_whole_frame(
            masks, connectivity=conn, max_iters=64, interpret=True))
        for i in range(3):
            want = np.asarray(lb.label_components(masks[i], connectivity=conn,
                                                  max_iters=64))
            assert np.array_equal(got[i], want), (conn, i)
