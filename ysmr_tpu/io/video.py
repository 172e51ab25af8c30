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


class BatchedVideoReader:
    """Iterate fixed-size (padded) frame batches from a video file.

    Yields dicts with ``frames`` (B, H, W, 3) uint8 BGR, ``start`` (global
    index of first frame), and ``count`` (valid frames in this batch; the
    remainder is zero-padded). The final short batch is padded so every
    device step sees identical shapes (no recompilation).
    """

    def __init__(self, video_path, batch_size=16, prefetch=3, color_filter=None,
                 preprocess=None):
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
        try:
            while True:
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
