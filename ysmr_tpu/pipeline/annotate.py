#!/usr/bin/env python3
"""annotate_video(): overlay track ids/centroids/state colours on the video.

Capability parity with the reference (track_eval.py:1321-1472): re-reads the
source video, draws per-frame track id and centroid coloured by state (green
motile, orange immotile, white turning point), optionally filters to a
motility-phenotype subtype, and writes a codec-configurable output video or
displays it live. Host-side by design — drawing and encoding stay on CPU.
"""

import logging
import os
from time import sleep

import cv2
import numpy as np
import pandas as pd

from ysmr_tpu.config import get_configs
from ysmr_tpu.utils.csv_io import get_data
from ysmr_tpu.utils.files import create_results_folder
from ysmr_tpu.utils.logging_utils import get_loggers


def annotate_video(video_path, df, output_save=True, settings=None,
                   result_folder=None, select_subtype=None, **_):
    """Annotate ``video_path`` with positions/properties from ``df``.

    :param select_subtype: optional phenotype filter (index or name from
        ['immotile', 'twitching', 'motile'])
    :return: None
    """
    logger = logging.getLogger('ysmr').getChild(__name__)
    settings = get_configs(settings)
    if settings is None:
        return None
    get_loggers(log_level=settings['log_level'],
                logfile_name=settings['log file path'],
                short_stream_output=settings['shorten displayed logging output'],
                short_file_output=settings['shorten logfile logging output'],
                log_to_file=settings['log to file'])
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        logger.exception('Cannot open file %s', video_path)
        return None
    if not result_folder:
        result_folder = create_results_folder(video_path)
    if not isinstance(df, pd.DataFrame):
        if settings['verbose']:
            logger.debug('Handing string to get_data %s', df)
        dtype = {
            'TRACK_ID': np.int64,
            'POSITION_T': np.int64,
            'POSITION_X': np.float64,
            'POSITION_Y': np.float64,
            'motility_phenotype': object,
            'moving': np.int8,
            'turn_points': np.int8,
        }
        df = get_data(df, dtype=dtype)
        if df is None:
            return None

    frame_count = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    frame_height = int(cap.get(4))
    frame_width = int(cap.get(3))
    curr_frame = 0
    fps_of_file = cap.get(cv2.CAP_PROP_FPS)
    if not fps_of_file or fps_of_file <= 0:
        if settings['frames per second'] <= 0:
            logger.critical('User defined fps unacceptable: %s',
                            settings['frames per second'])
            return None
        fps_of_file = settings['frames per second']
    filename = os.path.splitext(os.path.basename(video_path))[0]
    if select_subtype is None:
        output_video_name = os.path.join(result_folder, '{}_annotated_output{}'.format(
            filename, settings['save video file extension']))
    else:
        if isinstance(select_subtype, int):
            select_subtype = ['immotile', 'twitching', 'motile'][select_subtype]
        output_video_name = os.path.join(
            result_folder, '{}_subtype_{}_annotated_output{}'.format(
                select_subtype, filename, settings['save video file extension']))
    out = None
    if output_save:
        out = cv2.VideoWriter(
            output_video_name,
            cv2.VideoWriter_fourcc(*'{}'.format(settings['save video fourcc codec'])),
            fps_of_file, (frame_width, frame_height))

    # index rows by frame once instead of filtering the frame loop each time
    frames_groups = dict(tuple(df.groupby('POSITION_T')))
    while True:
        if not output_save:
            sleep(1 / fps_of_file)
        ret, frame = cap.read()
        if not ret and (frame_count == curr_frame + 1 or frame_count == curr_frame) \
                and frame_count >= settings['minimal frame count']:
            logger.debug('Frames from file %s read.', os.path.basename(video_path))
            break
        elif not ret:
            logger.critical('Error during cap.read() with file %s', video_path)
            break
        curr_boxes = frames_groups.get(curr_frame)
        if curr_boxes is not None and select_subtype is not None:
            curr_boxes = curr_boxes[curr_boxes['motility_phenotype'] == select_subtype]
        if curr_boxes is not None:
            for _, row in curr_boxes.iterrows():
                curr_color = (0, 255, 0)
                size_circle = 0
                line_thickness_text = 0
                if row['moving'] == 0:
                    curr_color = (15, 165, 253)
                elif row['turn_points'] == 1:
                    curr_color = (255, 255, 255)
                    size_circle = 1
                    line_thickness_text = 1
                text = '{}'.format(int(row['TRACK_ID']))
                cv2.putText(frame, text,
                            (int(row['POSITION_X']) - 10, int(row['POSITION_Y']) - 10),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.3, curr_color,
                            line_thickness_text)
                cv2.circle(frame,
                           (int(row['POSITION_X']), int(row['POSITION_Y'])),
                           size_circle, curr_color, -1)
        if output_save:
            out.write(frame)
        else:
            cv2.putText(frame, '{:>6}'.format(curr_frame), (20, 20),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.7, (220, 220, 60), 1)
            title = filename if select_subtype is None else \
                '{} {}'.format(filename, select_subtype)
            cv2.imshow(title, frame)
            if cv2.waitKey(1) & 0xFF == ord('q'):
                logger.error('Processing file interrupted by user: %s', video_path)
                break
        curr_frame += 1
    if output_save:
        out.release()
        logger.debug('Output video file: %s', output_video_name)
    else:
        cv2.destroyAllWindows()
    cap.release()
    return None
