"""Exact libav fused decode (native/avdec.cpp + io/video.py).

The exact decode mode must stay bit-identical to the reference's decode
chain (cv2.VideoCapture: libavcodec MJPEG -> libswscale BGR24,
track_eval.py:156-181). The avdec module runs those libraries directly on
the demuxed JPEG chunks and fuses the exact BGR2GRAY recipe; a first-frame
self-check guards against a mismatching system ffmpeg. These tests assert
byte-identity of every decoded frame and of the produced pixel tables, and
that the self-check falls back to cv2 cleanly.
"""

import configparser

import numpy as np
import pytest

from tests.test_e2e_parity import make_synthetic_video


def _settings(tmp_path, extra=None):
    from ysmr_tpu.config import default_config_dict, get_configs
    parser = configparser.ConfigParser(allow_no_value=True)
    for section, values in default_config_dict().items():
        parser[section] = {k: str(v) for k, v in values.items()}
    ini = str(tmp_path / 't.ini')
    with open(ini, 'w') as f:
        parser.write(f)
    settings = get_configs(ini)
    if extra:
        settings.update(extra)
    return settings


def _reader(video, settings, force_cv2=False, **kwargs):
    from ysmr_tpu.io.preproc import HostPreprocessor
    from ysmr_tpu.io.video import BatchedVideoReader
    pre = HostPreprocessor(settings, 30.0, max_fg=4096)
    if force_cv2:
        pre.supports_exact_fused = lambda: False
    return BatchedVideoReader(video, batch_size=8, preprocess=pre,
                              decode_mode='exact', threaded=False, **kwargs)


def _avdec_or_skip():
    from ysmr_tpu import native
    if not native.avdec_available():
        pytest.skip('avdec module not built')
    return native


def test_avdec_frames_byte_identical_to_videocapture(tmp_path):
    import cv2
    native = _avdec_or_skip()
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
            ours = native.avdec_decode_bgr(demux.chunk(n))
            assert ours is not None
            assert np.array_equal(ours, bgr), 'frame {} differs'.format(n)
            n += 1
    finally:
        cap.release()
        demux.close()
    assert n == 24


def test_exact_fused_reader_batches_byte_identical(tmp_path):
    _avdec_or_skip()
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=20)
    settings = _settings(tmp_path)
    fused = _reader(video, settings)
    assert fused._exact_fused, 'self-check should pass on this system'
    plain = _reader(video, settings, force_cv2=True)
    assert not plain._exact_fused
    batches_a = list(fused)
    batches_b = list(plain)
    assert len(batches_a) == len(batches_b) > 0
    for a, b in zip(batches_a, batches_b):
        assert a['start'] == b['start'] and a['count'] == b['count']
        assert set(a['frames']) == set(b['frames'])
        for key in a['frames']:
            assert np.array_equal(a['frames'][key], b['frames'][key]), key


def test_exact_fused_mean_mode_matches_cv2_path(tmp_path):
    # the mean-threshold mode orders stats-before-threshold across the
    # frame; the fused path must preserve that (process_jpeg_exact
    # want_stats flow)
    _avdec_or_skip()
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=12)
    # adaptive double threshold < 0 selects the global mean-threshold mode
    # (track_eval.py:185-253)
    settings = _settings(tmp_path, {'adaptive double threshold': -1})
    fused = _reader(video, settings)
    plain = _reader(video, settings, force_cv2=True)
    if not fused._exact_fused:
        pytest.skip('fused path inactive for this configuration')
    for a, b in zip(fused, plain):
        for key in a['frames']:
            assert np.array_equal(a['frames'][key], b['frames'][key]), key


def make_color_video(path, n_frames=12, w=384, h=288):
    """Clip with real color content (chroma takes many values), forcing the
    gray-content LUT fast path to decline every frame."""
    import cv2
    rng = np.random.default_rng(3)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'MJPG'), 30,
                             (w, h))
    assert writer.isOpened()
    for t in range(n_frames):
        frame = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        cv2.circle(frame, (w // 2 + t, h // 2), 40, (255, 64, 0), -1)
        writer.write(frame)
    writer.release()
    return path


def test_gray_content_lut_fast_path_engages(tmp_path):
    # gray MJPG content decodes to <=2-valued chroma planes; after the
    # runtime proof (native/avdec.cpp prove_gray_identity) frames must skip
    # swscale via the LUT path and still be byte-exact (the byte-identity
    # tests above run the same reader, so exactness is already covered —
    # this asserts the fast path actually engaged)
    native = _avdec_or_skip()
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=16)
    settings = _settings(tmp_path)
    before, _ = native.avdec_gray_fast_stats()
    before_jdec = native.avdec_jdec_frames()
    reader = _reader(video, settings)
    if not reader._exact_fused:
        pytest.skip('fused path inactive on this system')
    total = sum(batch['count'] for batch in reader)
    after, status = native.avdec_gray_fast_stats()
    assert total == 16
    assert status == 1, 'LUT identity should be provable on this system'
    # every fused frame takes a gray fast path: the avcodec+LUT route or
    # the first-party jdec decoder (which fuses the same LUT); the
    # self-check frame always exercises the LUT route
    served_lut = after - before
    served_jdec = native.avdec_jdec_frames() - before_jdec
    assert served_lut >= 1
    assert served_lut + served_jdec >= 16


def test_color_content_declines_lut_and_stays_exact(tmp_path):
    native = _avdec_or_skip()
    video = make_color_video(str(tmp_path / 'color.avi'))
    settings = _settings(tmp_path)
    before, _ = native.avdec_gray_fast_stats()
    fused = _reader(video, settings)
    plain = _reader(video, settings, force_cv2=True)
    if not fused._exact_fused:
        pytest.skip('fused path inactive on this system')
    for a, b in zip(fused, plain):
        for key in a['frames']:
            assert np.array_equal(a['frames'][key], b['frames'][key]), key
    after, _ = native.avdec_gray_fast_stats()
    assert after == before, 'color frames must take the full swscale path'


def test_self_check_failure_falls_back_to_cv2(tmp_path, monkeypatch):
    native = _avdec_or_skip()
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=12)
    settings = _settings(tmp_path)

    def bad_decode(_chunk):
        return np.zeros((4, 4, 3), np.uint8)

    monkeypatch.setattr(native, 'avdec_decode_bgr', bad_decode)
    reader = _reader(video, settings)
    assert not reader._exact_fused
    assert reader._demux is None
    total = 0
    for batch in reader:
        total += batch['count']
    assert total == 12


def test_per_frame_fallback_decode_matches_cap(tmp_path):
    # a frame the fused path declines mid-run must come out of the
    # full-BGR avdec fallback, never libjpeg (which is not bit-exact)
    import cv2
    _avdec_or_skip()
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=6)
    settings = _settings(tmp_path)
    reader = _reader(video, settings)
    if not reader._exact_fused:
        pytest.skip('fused path inactive')
    frame = reader._decode_chunk_frame(3)
    cap = cv2.VideoCapture(video)
    for _ in range(4):
        ok, ref = cap.read()
    cap.release()
    assert ok and np.array_equal(frame, ref)


def test_jdec_first_party_decoder_engages_and_is_exact(tmp_path):
    # the first-party MJPEG decoder (native/avdec.cpp jdec block) must
    # serve gray-content frames once its preconditions arm — proven gray
    # LUT + located idct_put — and remain byte-identical to the cv2 path
    # (the batch comparison below covers the produced pixel tables)
    native = _avdec_or_skip()
    av = native._load_avdec()
    if not getattr(av, '_has_jdec', False):
        pytest.skip('jdec entry points absent in this build')
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=16)
    settings = _settings(tmp_path)
    before = native.avdec_jdec_frames()
    fused = _reader(video, settings)
    plain = _reader(video, settings, force_cv2=True)
    if not fused._exact_fused:
        pytest.skip('fused path inactive on this system')
    for a, b in zip(fused, plain):
        for key in a['frames']:
            assert np.array_equal(a['frames'][key], b['frames'][key]), key
    after = native.avdec_jdec_frames()
    if native._jdec_disabled:
        pytest.fail('jdec kill switch tripped: first-serve byte-compare '
                    'vs the avcodec path failed')
    # the LUT proof arms during the self-check frame, so every fused
    # frame after it is jdec-eligible (first serve + verification frame
    # included); allow slack only for the self-check frame itself
    assert after - before >= 15


def test_jdec_declines_color_content(tmp_path):
    native = _avdec_or_skip()
    av = native._load_avdec()
    if not getattr(av, '_has_jdec', False):
        pytest.skip('jdec entry points absent in this build')
    video = make_color_video(str(tmp_path / 'color.avi'))
    settings = _settings(tmp_path)
    before = native.avdec_jdec_frames()
    fused = _reader(video, settings)
    plain = _reader(video, settings, force_cv2=True)
    if not fused._exact_fused:
        pytest.skip('fused path inactive on this system')
    for a, b in zip(fused, plain):
        for key in a['frames']:
            assert np.array_equal(a['frames'][key], b['frames'][key]), key
    assert native.avdec_jdec_frames() == before, \
        'color frames must decline jdec (no proven gray LUT applies)'


def test_jdec_kill_switch_on_mismatch(tmp_path, monkeypatch):
    # if jdec's first served frame ever disagreed with the avcodec path,
    # the process-wide kill switch must trip and the output must still be
    # exact via the fallback
    native = _avdec_or_skip()
    av = native._load_avdec()
    if not getattr(av, '_has_jdec', False):
        pytest.skip('jdec entry points absent in this build')
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=8)
    settings = _settings(tmp_path)
    monkeypatch.setattr(native, '_jdec_verified', set())
    monkeypatch.setattr(native, '_jdec_disabled', False)
    real = native.avdec_decode_gray

    def corrupted(chunk):
        out = real(chunk)
        if out is not None:
            out = out.copy()
            out[0, 0] ^= 1
        return out

    # patch only after construction: the reader's own self-check also
    # calls avdec_decode_gray and must see the real output
    fused = _reader(video, settings)
    if not fused._exact_fused:
        pytest.skip('fused path inactive on this system')
    monkeypatch.setattr(native, 'avdec_decode_gray', corrupted)
    list(fused)
    assert native._jdec_disabled, \
        'a first-serve mismatch must trip the kill switch'
