"""Fast MJPG grayscale decode path (io/video.py MjpgAviDemuxer).

The fast path demuxes the AVI and decodes JPEG luma directly; it must agree
with the exact path (VideoCapture BGR + bit-exact BGR2GRAY) to +-2 gray
levels per pixel, and produce the same tracks on clean synthetic scenes.
"""

import os

import numpy as np
import pytest

from tests.test_e2e_parity import make_synthetic_video


def test_demuxer_frames_match_videocapture(tmp_path):
    import cv2
    from ysmr_tpu.io.video import MjpgAviDemuxer
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=24)
    demux = MjpgAviDemuxer(video)
    cap = cv2.VideoCapture(video)
    n = 0
    try:
        while True:
            ok, bgr = cap.read()
            if not ok:
                break
            b, g, r = [bgr[:, :, k].astype(np.int64) for k in range(3)]
            exact = ((b * 3735 + g * 19235 + r * 9798 + (1 << 14)) >> 15)
            fast = demux.read_gray(n)
            assert fast.shape == exact.shape
            delta = np.abs(fast.astype(int) - exact)
            assert delta.max() <= 2, delta.max()
            n += 1
    finally:
        cap.release()
        demux.close()
    assert len(demux) == n == 24


def test_fast_mode_reader_yields_gray_tables(tmp_path):
    from ysmr_tpu.config import default_config_dict, get_configs
    from ysmr_tpu.io.preproc import HostPreprocessor
    from ysmr_tpu.io.video import BatchedVideoReader
    import configparser
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=16)
    parser = configparser.ConfigParser(allow_no_value=True)
    for section, values in default_config_dict().items():
        parser[section] = {k: str(v) for k, v in values.items()}
    ini = str(tmp_path / 't.ini')
    with open(ini, 'w') as f:
        parser.write(f)
    settings = get_configs(ini)
    pre = HostPreprocessor(settings, 30.0, max_fg=4096)
    reader = BatchedVideoReader(video, batch_size=8, preprocess=pre,
                                decode_mode='fast')
    assert reader._demux is not None
    total = 0
    for batch in reader:
        total += batch['count']
        frames = batch['frames']
        key = 'px_packed' if 'px_packed' in frames else 'px_x'
        assert frames[key].shape == (8, 4096)
    assert total == 16


def test_fast_mode_same_tracks_as_exact(tmp_path):
    """On a clean high-contrast scene the +-2 gray delta changes nothing."""
    import pandas as pd
    from tests.test_e2e_parity import _make_settings
    from ysmr_tpu.pipeline.track_bacteria import track_bacteria
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=40)
    results = {}
    for mode in ('exact', 'fast'):
        folder = str(tmp_path / mode)
        os.makedirs(folder)
        settings = _make_settings(tmp_path, **{'decode mode': mode})
        res = track_bacteria(video, settings=settings, result_folder=folder)
        assert res is not None, mode
        results[mode] = res[0]
    exact, fast = results['exact'], results['fast']
    assert exact['TRACK_ID'].nunique() == fast['TRACK_ID'].nunique()
    assert len(exact) == len(fast)
    np.testing.assert_allclose(fast['POSITION_X'], exact['POSITION_X'],
                               atol=0.25)
    np.testing.assert_allclose(fast['POSITION_Y'], exact['POSITION_Y'],
                               atol=0.25)


def test_fast_mode_falls_back_for_truncated_avi(tmp_path):
    """A file with fewer readable chunks than the header claims is refused
    by the demuxer gate and decoded via the exact path instead."""
    from ysmr_tpu.io.video import BatchedVideoReader
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=24)
    data = open(video, 'rb').read()
    cut = str(tmp_path / 'cut.avi')
    open(cut, 'wb').write(data[:int(len(data) * 0.6)])
    reader = BatchedVideoReader(cut, batch_size=4, preprocess=lambda f: {
        'count': 0, 'px_x': np.zeros(4, np.int16)}, decode_mode='fast')
    # either the demuxer found every frame the (truncated) header claims,
    # or it is disabled — never a crash, never silently short reads
    if reader._demux is not None:
        assert len(reader._demux) >= reader.frame_count


def test_native_jpeg_decode_rejects_hostile_dims(tmp_path):
    """A JPEG whose header claims absurd dimensions must fail cleanly (the
    dims cap / bad_alloc guard), not kill the process."""
    from ysmr_tpu import native
    from ysmr_tpu.io.video import MjpgAviDemuxer
    if native._load() is None or \
            not hasattr(native._load(), 'decode_jpeg_gray_stage1'):
        pytest.skip('native jpeg decode unavailable')
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=2)
    demux = MjpgAviDemuxer(video)
    chunk = np.array(demux.chunk(0))
    demux.close()
    # sanity: the pristine chunk decodes
    assert native.decode_jpeg_gray_stage1(chunk, need_mean=False) is not None
    # patch the SOF0 height/width to 65535x65535 (>256 Mpx cap)
    bad = chunk.copy()
    i = 0
    patched = False
    while i + 9 < len(bad):
        if bad[i] == 0xFF and bad[i + 1] in (0xC0, 0xC1, 0xC2):
            bad[i + 5:i + 9] = [0xFF, 0xFF, 0xFF, 0xFF]  # height, width
            patched = True
            break
        i += 1
    assert patched, 'no SOF marker found'
    assert native.decode_jpeg_gray_stage1(bad, need_mean=False) is None


def test_demuxer_rejects_non_avi(tmp_path):
    from ysmr_tpu.io.video import MjpgAviDemuxer, VideoReadError
    bad = str(tmp_path / 'not.avi')
    open(bad, 'wb').write(b'RIFF....WAVEdata' + b'\0' * 64)
    with pytest.raises(VideoReadError):
        MjpgAviDemuxer(bad)


def test_fast_mode_falls_back_for_non_mjpg(tmp_path):
    """Non-MJPG input silently uses the exact decoder."""
    import cv2
    from ysmr_tpu.io.video import BatchedVideoReader
    video = str(tmp_path / 'raw.avi')
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*'FFV1'), 30,
                             (64, 48))
    if not writer.isOpened():  # codec unavailable: nothing to test
        pytest.skip('FFV1 encoder unavailable')
    for _ in range(8):
        writer.write(np.zeros((48, 64, 3), np.uint8))
    writer.release()
    reader = BatchedVideoReader(video, batch_size=4, preprocess=lambda f: {
        'count': 0, 'px_x': np.zeros(4, np.int16)}, decode_mode='fast')
    assert reader._demux is None
