#!/usr/bin/env python3
"""Host video decode feeding device-resident frame batches.

The reference reads one frame at a time inside its Python hot loop
(track_eval.py:156-366, ``cap.read()`` per iteration). Here decode runs on a
background thread producing fixed-size frame batches through a bounded queue,
so host decode overlaps device compute (double/triple buffering); the TPU
never waits on the decoder once the pipeline is warm.

Decoding itself uses OpenCV's C++ videoio (FFmpeg underneath) — the same
native decode path as the reference — but batched and threaded. cv2 releases
the GIL inside ``cap.read``, so a Python thread is a true overlap.
"""

import logging
import queue
import threading

import cv2
import numpy as np


class VideoReadError(RuntimeError):
    pass


class MjpgAviDemuxer:
    """Raw JPEG frame chunks from an MJPG-in-AVI file (RIFF scan).

    The default decode path (cv2.VideoCapture, FFmpeg) decodes every JPEG to
    full-resolution BGR and then the pipeline reduces it to grayscale. For
    the default grayscale color filter that round trip is wasted work: JPEG
    luma IS the grayscale channel. Demuxing the AVI ourselves and handing
    each JPEG to ``cv2.imdecode(..., IMREAD_GRAYSCALE)`` lets libjpeg skip
    the chroma IDCTs and the YCbCr->BGR->gray conversions entirely
    (measured: 3.9 + 0.3 ms/frame -> 2.9 ms/frame at 1228x922).

    Gray values differ from the exact BGR-roundtrip recipe by at most +-2
    (systematic +-1 from the dropped double rounding); the adaptive
    threshold modes compare src against a local mean of the same data, so
    the shared bias cancels and detections are unchanged in practice. The
    'exact' decode mode remains the default for bit-parity work.
    """

    def __init__(self, path):
        import mmap
        self.path = path
        self._file = open(path, 'rb')
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        mm = self._mm
        if mm[0:4] != b'RIFF' or mm[8:12] != b'AVI ':
            raise VideoReadError('Not an AVI file: {}'.format(path))
        movi = mm.find(b'movi')
        if movi < 0:
            raise VideoReadError('No movi list in {}'.format(path))
        self.offsets = []  # (start, size) of each JPEG chunk
        pos = movi + 4
        end = len(mm)
        while pos + 8 <= end:
            ckid = mm[pos:pos + 4]
            if ckid == b'idx1':
                break
            size = int.from_bytes(mm[pos + 4:pos + 8], 'little')
            if pos + 8 + size > end:
                break  # truncated chunk
            # stream 00 (the first/video stream) only: a second stream's
            # 'NNdc'/'NNdb' chunks would otherwise misalign frame indices
            if ckid[:2] == b'00' and ckid[2:4] in (b'dc', b'db') and size > 0:
                self.offsets.append((pos + 8, size))
            pos += 8 + size + (size & 1)

    def __len__(self):
        return len(self.offsets)

    def chunk(self, index):
        """Raw JPEG bytes of frame ``index`` (zero-copy mmap view)."""
        start, size = self.offsets[index]
        return np.frombuffer(self._mm, np.uint8, count=size, offset=start)

    def read_gray(self, index):
        """Decode frame ``index`` directly to grayscale (H, W) uint8."""
        return cv2.imdecode(self.chunk(index), cv2.IMREAD_GRAYSCALE)

    def close(self):
        try:
            self._mm.close()
            self._file.close()
        except Exception:
            pass


class BatchedVideoReader:
    """Iterate fixed-size (padded) frame batches from a video file.

    Yields dicts with ``frames`` (B, H, W, 3) uint8 BGR, ``start`` (global
    index of first frame), and ``count`` (valid frames in this batch; the
    remainder is zero-padded). The final short batch is padded so every
    device step sees identical shapes (no recompilation).
    """

    def __init__(self, video_path, batch_size=16, prefetch=3, color_filter=None,
                 preprocess=None, decode_mode='exact'):
        self.logger = logging.getLogger('ysmr').getChild(__name__)
        self.path = video_path
        self.batch_size = batch_size
        self.prefetch = prefetch
        self.color_filter = color_filter
        self.preprocess = preprocess
        cap = cv2.VideoCapture(video_path)
        if not cap.isOpened():
            raise VideoReadError('Cannot open file {}'.format(video_path))
        self.frame_count = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.fps = cap.get(cv2.CAP_PROP_FPS)
        self.width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        fourcc = int(cap.get(cv2.CAP_PROP_FOURCC)) & 0xFFFFFFFF
        fourcc = fourcc.to_bytes(4, 'little')
        self._demux = None
        # fast mode applies only on the preprocessed (grayscale) path: the
        # frames path ships BGR to the device, so there is nothing to skip
        if decode_mode == 'fast' and preprocess is not None and \
                (color_filter is None or color_filter == cv2.COLOR_BGR2GRAY) \
                and fourcc in (b'MJPG', b'mjpg'):
            try:
                demux = MjpgAviDemuxer(video_path)
                if len(demux) >= self.frame_count > 0 or self.frame_count <= 0:
                    self._demux = demux
                    if self.frame_count <= 0:
                        self.frame_count = len(demux)
                else:
                    demux.close()
            except (VideoReadError, OSError, ValueError) as err:
                self.logger.debug('Fast MJPG demux unavailable for %s (%s); '
                                  'using exact decode.', video_path, err)
        if self._demux is not None:
            cap.release()
            self.logger.debug('Fast MJPG grayscale decode active for %s',
                              video_path)
        self._cap = cap
        self._queue = queue.Queue(maxsize=prefetch)
        self._thread = None
        self.frames_read = 0
        self.error_during_read = False
        self.read_stopped_early = False

    def _stack_batch(self, batch):
        if self.preprocess is None:
            if len(batch) == self.batch_size:
                return np.stack(batch)
            arr = np.zeros((self.batch_size,) + batch[0].shape, np.uint8)
            arr[:len(batch)] = np.stack(batch)
            return arr
        # preprocessed pixel tables: stack each field, zero-pad short batches
        keys = batch[0].keys()
        out = {}
        for key in keys:
            if key == 'count':
                counts = np.zeros(self.batch_size, np.int32)
                counts[:len(batch)] = [b['count'] for b in batch]
                out['count'] = counts
            else:
                first = batch[0][key]
                arr = np.zeros((self.batch_size,) + first.shape, first.dtype)
                for i, b in enumerate(batch):
                    arr[i] = b[key]
                out[key] = arr
        return out

    def _decode_loop(self):
        cap = self._cap
        batch = []
        start = 0
        idx = 0
        # fused native decode+preprocess: libjpeg writes luma straight into
        # the C++ preprocessing buffers (no intermediate image object)
        fused = (self._demux is not None and self.preprocess is not None and
                 callable(getattr(self.preprocess, 'process_jpeg', None)))
        try:
            while True:
                if self._demux is not None:
                    if idx >= len(self._demux):
                        break
                    if fused:
                        entry = self.preprocess.process_jpeg(
                            self._demux.chunk(idx))
                        if entry is not None:
                            batch.append(entry)
                            idx += 1
                            if len(batch) == self.batch_size:
                                self._queue.put(('batch',
                                                 self._stack_batch(batch),
                                                 start, len(batch)))
                                batch = []
                                start = idx
                            continue
                        # native jpeg path unavailable for this frame:
                        # fall through to cv2.imdecode
                    frame = self._demux.read_gray(idx)
                    if frame is None:
                        # a mid-stream chunk that fails to decode is an
                        # error, not EOF (the chunk scan bounded the list)
                        raise VideoReadError(
                            'Undecodable MJPG chunk {} in {}'.format(
                                idx, self.path))
                    ret = True
                else:
                    ret, frame = cap.read()
                if not ret:
                    break
                if self.preprocess is None and self.color_filter is not None and \
                        self.color_filter != cv2.COLOR_BGR2GRAY and frame.ndim == 3:
                    # non-default colour filters convert on host (rare path);
                    # result is re-expanded so the device sees one layout
                    gray = cv2.cvtColor(frame, self.color_filter)
                    if gray.ndim == 2:
                        frame = np.repeat(gray[..., None], 3, axis=2)
                batch.append(frame if self.preprocess is None
                             else self.preprocess(frame))
                idx += 1
                if len(batch) == self.batch_size:
                    self._queue.put(('batch', self._stack_batch(batch),
                                     start, len(batch)))
                    batch = []
                    start = idx
            if batch:
                self._queue.put(('batch', self._stack_batch(batch),
                                 start, len(batch)))
            self._queue.put(('done', None, idx, 0))
        except Exception as exc:  # surfaced on the consumer side
            self._queue.put(('error', exc, idx, 0))
        finally:
            if self._demux is not None:
                self._demux.close()
            else:
                cap.release()

    def __iter__(self):
        self._thread = threading.Thread(target=self._decode_loop, daemon=True)
        self._thread.start()
        while True:
            kind, payload, start, count = self._queue.get()
            if kind == 'done':
                self.frames_read = start
                return
            if kind == 'error':
                self.frames_read = start
                self.error_during_read = True
                raise VideoReadError(str(payload))
            yield {'frames': payload, 'start': start, 'count': count}


def open_video_writer(path, fourcc, fps, width, height):
    """cv2.VideoWriter with the codec settings of the reference
    (track_eval.py:1400-1405)."""
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*fourcc), fps,
                             (width, height))
    if not writer.isOpened():
        raise VideoReadError('Cannot open video writer for {}'.format(path))
    return writer
