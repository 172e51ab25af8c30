#!/usr/bin/env python3
"""Orchestration: ysmr() batch entry point and analyse() per-file pipeline.

Mirrors the reference's main.py: ``analyse`` (main.py:32-172) dispatches on
file type (video -> track_bacteria; then metadata sidecar, select_tracks,
evaluate_tracks, optional annotate_video) with skip logic for
already-processed files; ``ysmr`` (main.py:175-331) loads settings, starts
the multiprocess logging listener, selects files (Tk dialog in interactive
sessions), confirms with the user, dispatches per-file serially or over an
``mp.Pool``, collects failures per path, collates statistics to xlsx, and
optionally shuts the machine down.

Device note: each worker process initialises its own JAX backend. For
multi-file throughput on a single chip, serial dispatch with the pipelined
track_bacteria is usually faster than process parallelism; process pools
remain available for CPU-bound stages, matching the reference's behaviour.
"""

import logging
import multiprocessing as mp
import os
from datetime import datetime
from time import sleep

from ysmr_tpu.config import get_configs
from ysmr_tpu.pipeline.annotate import annotate_video
from ysmr_tpu.pipeline.evaluate import evaluate_tracks
from ysmr_tpu.pipeline.select import select_tracks
from ysmr_tpu.pipeline.track_bacteria import track_bacteria
from ysmr_tpu.utils.csv_io import collate_results_csv_to_xlsx
from ysmr_tpu.utils.files import (create_results_folder, elapsed_time, get_any_paths,
                                  metadata_file)
from ysmr_tpu.utils.logging_utils import (check_logfile, get_loggers, log_infos,
                                          logging_configurer, logging_listener,
                                          shutdown, stop_logging_queue)

__all__ = ['analyse', 'ysmr']


def analyse(path, settings=None, result_folder=None, return_df=False, **kwargs):
    """Run the appropriate pipeline stages for one file (video or .csv).

    :param kwargs: saved to the _meta.json sidecar
    :return: df (or True) on success, None on error
    """
    t_one = datetime.now()
    settings = get_configs(settings)
    if settings is None:
        return None
    get_loggers(log_level=settings['log_level'],
                logfile_name=settings['log file path'],
                short_stream_output=settings['shorten displayed logging output'],
                short_file_output=settings['shorten logfile logging output'],
                log_to_file=settings['log to file'],
                settings=settings)
    logger = logging.getLogger('ysmr').getChild(__name__)
    return_value = None
    if result_folder is None:
        result_folder = create_results_folder(path)
    elif not os.path.isdir(result_folder):
        os.makedirs(result_folder, exist_ok=True)
    logger.debug('Starting process. PID: %s Result folder: %s',
                 os.getpid(), result_folder)
    plots_eval = any([
        settings['store generated statistical .csv file'],
        settings['store final analysed .csv file'],
        settings['save large plots'],
        settings['save rose plot'],
        settings['save time violin plot'],
        settings['save acr violin plot'],
        settings['save length violin plot'],
        settings['save turning point violin plot'],
        settings['save speed violin plot'],
        settings['save angle distribution plot / bins'],
        settings['collate results csv to xlsx'],
        settings['save video'],
    ])
    df, csv_file = None, None
    # allow explicit metadata for .csv restarts (merged via the _meta.json
    # sidecar; explicit kwargs win over file contents)
    fps = kwargs.pop('fps', None)
    f_height = kwargs.pop('frame_height', None)
    f_width = kwargs.pop('frame_width', None)

    while True:  # so we can break on error
        finished_files = ['_analysed.csv', '_statistics.csv', '_annotated_output.']
        if any(file_ext in path for file_ext in finished_files):
            logger.warning('File already evaluated. File: %s', path)
            return_value = None
            break
        if '.csv' not in path:
            if settings['verbose']:
                logging.debug('File ends not in .csv, file is assumed to be a video.')
            track_result = track_bacteria(video_path=path, settings=settings,
                                          result_folder=result_folder)
            if track_result is None:
                logger.warning('Error during video analysis of file %s.', path)
                return_value = None
                break
            (df, fps, f_height, f_width, csv_file) = track_result
            return_value = df
        meta_data = metadata_file(
            path=os.path.join(result_folder, os.path.basename(path)),
            additional_search_paths=path,
            verbose=settings['verbose'],
            fps=fps, frame_height=f_height, frame_width=f_width, **kwargs)
        if settings['debugging']:
            for key, value in meta_data.items():
                logger.debug('%s: %s', key, value)
        if 'selected_data.csv' not in path and \
                (plots_eval or settings['store processed .csv file']):
            df = select_tracks(path_to_file=path, df=df,
                               results_directory=result_folder,
                               settings=settings, **meta_data)
            if df is None:
                logger.warning('Error during video analysis of file %s.', path)
                return_value = None
                break
            return_value = df
        if plots_eval:
            return_value = evaluate_tracks(path_to_file=path,
                                           results_directory=result_folder,
                                           df=df, settings=settings, **meta_data)
            if settings['save video'] and '.csv' not in path:
                annotate_video(video_path=path, df=return_value[0],
                               settings=settings, result_folder=result_folder)
            elif settings['save video'] and '.csv' in path:
                logger.warning(
                    "'save video' setting is enabled but .csv file was provided. "
                    'Video can only be annotated when ysmr() is given a video as '
                    'an argument. Optionally use annotate_video() directly.')
        elif 'selected_data.csv' in path:
            logger.warning('No evaluation set to True in settings. '
                           'Did not evaluate %s', path)
        break

    if settings['delete .csv file after analysis'] and csv_file:
        try:
            os.remove(csv_file)
        except FileNotFoundError:
            pass
        except Exception as ex:
            logger.exception('An exception of type %s occurred. Arguments: %r',
                             type(ex).__name__, ex.args)
    if return_value is not None:
        end_string = 'Finished with'
        if not return_df:
            return_value = True
    else:
        end_string = 'Error during'
    logger.info('%s process. PID: %s, elapsed time: %s',
                end_string, os.getpid(), elapsed_time(t_one))
    return return_value


def ysmr(paths=None, settings=None, result_folder=None, multiprocess=False):
    """Analyse provided video file(s); see reference main.py:175-331.

    :return: list of (path, result) tuples, or None on abort
    """
    t_one = datetime.now()
    settings = get_configs(settings)
    if settings is None:
        print('Fatal error in retrieving tracking.ini')
        return None
    paths_failed = []
    paths_finished = []
    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]

    settings['log file path'] = check_logfile(path=settings['log file path'])

    if not settings['debugging']:
        settings['logging_queue'] = mp.Manager().Queue(-1)
        listener = mp.Process(target=logging_listener, args=(settings,))
        listener.start()
        logging_configurer(settings)
    else:
        listener = None

    get_loggers(log_level=settings['log_level'],
                logfile_name=settings['log file path'],
                short_stream_output=settings['shorten displayed logging output'],
                short_file_output=settings['shorten logfile logging output'],
                log_to_file=settings['log to file'],
                settings=settings)
    logger = logging.getLogger('ysmr').getChild(__name__)
    filler_for_logger = log_infos(settings=settings)

    if settings['debugging']:
        result_folder = create_results_folder(path=settings['path to test video'])
        path = os.path.expanduser(settings['path to test video']) if paths is None \
            else paths[0]
        if not os.path.isfile(path):
            logger.critical('Path to test video may not exist, attempting anyway: %s',
                            path)
        else:
            logger.info('Path: %s', path)
        return analyse(path=path, settings=settings, result_folder=result_folder)

    if settings['select files']:
        if not paths:
            paths = get_any_paths(rename=True, settings=settings)
        if not paths:
            logger.critical('No files selected.')
            stop_logging_queue(logger, settings)
            listener.join()
            return None
    else:
        if not paths:
            paths = [settings['path to test video']]
            logger.info('Test video path selected')
    paths = [os.path.expanduser(path) for path in paths]
    for path in paths:
        logger.debug(path)
    logger.info('Total number of files: %s', len(paths))

    while settings['user input']:
        logger.debug('Waiting for user input.')
        sleep(.1)
        event = input('Continue? (Y/N): ')
        if 0 < len(event) < 4:
            if event[0].lower() == 'n':
                logger.info('Process aborted.\n')
                stop_logging_queue(logger, settings)
                listener.join()
                return None
            elif event[0].lower() == 'y':
                logger.debug('User agreed.')
                break
    results = {}
    if result_folder is None:
        result_folder = create_results_folder(paths[0])
    if not os.path.isdir(result_folder):
        os.makedirs(result_folder, exist_ok=True)

    if multiprocess:
        # spawn, not fork: the parent may have initialised JAX (XLA runtime
        # threads do not survive fork); maxtasksperchild=1 keeps the
        # reference's per-video worker isolation (main.py:283). Note that on
        # a host with one shared accelerator, per-video device parallelism
        # belongs to the sharded path (parallel/sharding.py) — pool workers
        # on such hosts fall back to their own backends.
        pool = mp.get_context('spawn').Pool(maxtasksperchild=1)
        for path in paths:
            results[path] = pool.apply_async(analyse, args=(path, settings,
                                                            result_folder))
        pool.close()
        pool.join()
    else:
        for path in paths:
            results[path] = analyse(path=path, settings=settings,
                                    result_folder=result_folder)
    for path, item in results.items():
        try:
            result = item.get() if multiprocess else item
            if result is None:
                paths_failed.append(path)
                paths_finished.append((path, None))
            else:
                paths_finished.append((path, item))
        except (FileNotFoundError, PermissionError):
            logger.critical('The file could not be found or opened: %s', path)
        except Exception as exc:
            logger.critical('An exception of type %s occurred with path %s.',
                            type(exc).__name__, path)
            for line in str(exc.args).splitlines():
                logger.critical('%s', line)
            logger.exception(exc)
            paths_failed.append(path)
            paths_finished.append((path, None))
            continue
    if paths_failed:
        logger.critical('Failed to analyse %s of %s file(s):',
                        len(paths_failed), len(paths))
        for path in paths_failed:
            logger.critical('%s', path)
    else:
        logger.info('Finished with all files.')
    if settings['collate results csv to xlsx']:
        try:
            collate_results_csv_to_xlsx(path=result_folder, save_path=result_folder)
        finally:
            pass

    if settings['shut down after analysis']:
        shutdown()
    logger.info('Elapsed time: %s\n%s\n', elapsed_time(t_one), filler_for_logger)
    stop_logging_queue(logger, settings)
    if listener is not None:
        listener.join()
    return paths_finished


if __name__ == '__main__':
    ysmr()
