"""Striped (multi-threaded) decode must be byte-identical to sequential.

``BatchedVideoReader(decode_threads=N)`` interleaves whole batches over N
worker threads (io/video.py), each with its own capture / the shared mmap
demuxer. There is no reference equivalent (the reference decodes one frame
at a time inside its Python loop, track_eval.py:156-366); the contract here
is internal: identical batches, counts, and error semantics vs the
sequential path, for every decode mode.
"""

import configparser

import numpy as np
import pytest

from tests.test_e2e_parity import make_synthetic_video


def _settings(tmp_path):
    from ysmr_tpu.config import default_config_dict, get_configs
    parser = configparser.ConfigParser(allow_no_value=True)
    for section, values in default_config_dict().items():
        parser[section] = {k: str(v) for k, v in values.items()}
    ini = str(tmp_path / 't.ini')
    with open(ini, 'w') as f:
        parser.write(f)
    return get_configs(ini)


def _collect(reader):
    out = []
    for batch in reader:
        out.append((batch['start'], batch['count'], batch['frames']))
    return out


def _assert_batches_equal(seq, par):
    assert len(seq) == len(par)
    for (s0, c0, f0), (s1, c1, f1) in zip(seq, par):
        assert s0 == s1 and c0 == c1
        if isinstance(f0, dict):
            assert sorted(f0) == sorted(f1)
            for key in f0:
                np.testing.assert_array_equal(f0[key], f1[key], err_msg=key)
        else:
            np.testing.assert_array_equal(f0, f1)


@pytest.mark.parametrize('batch_size', [8, 16])
def test_striped_exact_frames_identical(tmp_path, batch_size):
    from ysmr_tpu.io.video import BatchedVideoReader
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=30)
    seq = _collect(BatchedVideoReader(video, batch_size=batch_size))
    reader = BatchedVideoReader(video, batch_size=batch_size, decode_threads=3)
    assert reader._n_stripes == min(3, -(-30 // batch_size))
    par = _collect(reader)
    _assert_batches_equal(seq, par)
    assert reader.frames_read == 30
    assert not reader.error_during_read


def test_striped_exact_pixels_identical(tmp_path):
    from ysmr_tpu.io.preproc import HostPreprocessor
    from ysmr_tpu.io.video import BatchedVideoReader
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=25)
    settings = _settings(tmp_path)
    seq = _collect(BatchedVideoReader(
        video, batch_size=8, preprocess=HostPreprocessor(settings, 30.0)))
    reader = BatchedVideoReader(
        video, batch_size=8, preprocess=HostPreprocessor(settings, 30.0),
        decode_threads=4)
    assert reader._n_stripes == 4
    par = _collect(reader)
    _assert_batches_equal(seq, par)
    assert reader.frames_read == 25


def test_striped_fast_demux_identical(tmp_path):
    from ysmr_tpu.io.preproc import HostPreprocessor
    from ysmr_tpu.io.video import BatchedVideoReader
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=25)
    settings = _settings(tmp_path)
    seq_reader = BatchedVideoReader(
        video, batch_size=8, preprocess=HostPreprocessor(settings, 30.0),
        decode_mode='fast')
    assert seq_reader._demux is not None
    seq = _collect(seq_reader)
    reader = BatchedVideoReader(
        video, batch_size=8, preprocess=HostPreprocessor(settings, 30.0),
        decode_mode='fast', decode_threads=3)
    assert reader._demux is not None and reader._n_stripes == 3
    par = _collect(reader)
    _assert_batches_equal(seq, par)
    assert reader.frames_read == 25


def test_striped_gates_off_for_mean_mode(tmp_path):
    from ysmr_tpu.io.preproc import HostPreprocessor
    from ysmr_tpu.io.video import BatchedVideoReader
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=10)
    settings = _settings(tmp_path)
    # mean mode keeps a frame-ordered moving average -> must stay sequential
    settings['adaptive double threshold'] = -1.0
    pre = HostPreprocessor(settings, 30.0)
    assert pre.threshold_state is not None
    reader = BatchedVideoReader(video, batch_size=8, preprocess=pre,
                                decode_threads=4)
    assert reader._n_stripes == 1


def test_striped_gates_off_for_non_mjpg(tmp_path):
    import cv2
    from ysmr_tpu.io.video import BatchedVideoReader
    video = str(tmp_path / 'clip_ffv1.avi')
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*'FFV1'), 30,
                             (64, 48))
    if not writer.isOpened():
        pytest.skip('FFV1 encoder unavailable')
    rng = np.random.default_rng(0)
    for _ in range(12):
        writer.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
    writer.release()
    reader = BatchedVideoReader(video, batch_size=4, decode_threads=3)
    assert reader._n_stripes == 1


def test_striped_short_header_eof(tmp_path):
    """Header frame count overstating the stream ends cleanly (EOF, no error),
    with the same frames as the sequential path."""
    from ysmr_tpu.io.video import BatchedVideoReader
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=21)
    reader = BatchedVideoReader(video, batch_size=4, decode_threads=3)
    assert reader._n_stripes == 3
    reader._total_frames = None  # set inside _iter_striped
    batches = _collect(reader)
    # pretend the header claimed more frames than exist: re-run with a lying
    # frame_count; workers past EOF must produce clean EOF, not an error
    reader2 = BatchedVideoReader(video, batch_size=4, decode_threads=3)
    reader2.frame_count = 33
    reader2._n_stripes = 3
    batches2 = _collect(reader2)
    _assert_batches_equal(batches, batches2)
    assert reader2.frames_read == 21
    assert not reader2.error_during_read


def test_striped_long_header_tail_read(tmp_path):
    """Header frame count UNDER-reporting the stream: the tail worker keeps
    reading past the claimed count, so striped output still matches the
    sequential path (which reads until cap.read() fails) frame for frame."""
    from ysmr_tpu.io.video import BatchedVideoReader
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=23)
    seq = _collect(BatchedVideoReader(video, batch_size=4))
    reader = BatchedVideoReader(video, batch_size=4, decode_threads=3)
    reader.frame_count = 13  # lie: 10 trailing frames beyond the header
    batches = _collect(reader)
    _assert_batches_equal(seq, batches)
    assert reader.frames_read == 23
    assert not reader.error_during_read


def test_striped_truncated_demux_chunk_raises(tmp_path):
    """A mid-stream undecodable MJPG chunk surfaces as VideoReadError from the
    striped fast path, matching sequential semantics."""
    from ysmr_tpu.io.preproc import HostPreprocessor
    from ysmr_tpu.io.video import BatchedVideoReader, VideoReadError
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=16)
    settings = _settings(tmp_path)
    reader = BatchedVideoReader(
        video, batch_size=4, preprocess=HostPreprocessor(settings, 30.0),
        decode_mode='fast', decode_threads=3)
    assert reader._demux is not None and reader._n_stripes == 3
    # corrupt frame 6's JPEG entropy data through the demuxer's own offsets
    start, size = reader._demux.offsets[6]
    with open(video, 'r+b') as f:
        f.seek(start + 2)
        f.write(b'\x00' * min(64, size - 2))
    # reopen so the mmap sees the corruption
    reader = BatchedVideoReader(
        video, batch_size=4, preprocess=HostPreprocessor(settings, 30.0),
        decode_mode='fast', decode_threads=3)
    got = []
    with pytest.raises(VideoReadError):
        for batch in reader:
            got.append(batch['start'])
    assert reader.error_during_read
    assert got == [0]  # batch 0 (frames 0-3) was delivered before the error
