#!/usr/bin/env python3
"""Multiprocess-safe queue logging, logfile rotation, and startup banner.

Capability parity with the reference logging subsystem (helper_file.py:318-361
``check_logfile``, :922-1011 ``get_loggers``/``log_formats``, :1014-1128
``log_infos``, :1131-1215 queue configurers/listener, :1577-1601
``stop_logging_queue``): a namespaced ``'ysmr'`` logger fed through a queue so
it stays safe under multiprocessing, long/short line formats, size-based
``.log.1``..``.log.9`` rotation, and a banner explaining the format.
"""

import logging
import logging.handlers
import os
import subprocess
import sys
from logging.handlers import QueueHandler, QueueListener
from queue import Queue
from time import sleep

import numpy as np


def log_formats():
    """Long and short logging formats (reference helper_file.py:993-1011)."""
    long_format = ('{asctime:}\t{funcName:15.15}\t{lineno:>4}\t'
                   '{levelname:8.8}\t{process:>5}:\t{message}')
    short_format = '{asctime:}\t{levelname:8.8}\t{process:>5}:\t{message}'
    return long_format, short_format


def logfile_padding(logfile, iteration=0):
    """Pad a logfile with an empty line if it does not end on one."""
    with open(logfile, 'r+') as file:
        line = ''
        for line in file:
            pass
        if line:
            if line not in {'\n', '\r', '\r\n'}:
                file.write('\n')
            else:
                return
        else:
            return
    if iteration < 2:
        logfile_padding(logfile, iteration=iteration + 1)


def check_logfile(path, max_size=2 ** 20):
    """Size-based rollover of the logfile, keeping .log.1 .. .log.9.

    Reference semantics (helper_file.py:318-361): below ``max_size`` the file
    is only newline-padded; above it, numbered siblings shift up (9 deleted)
    and the current file becomes ``.1``.
    """
    from ysmr_tpu.utils.files import find_paths
    file_size = os.path.getsize(path) if os.path.isfile(path) else 0
    if file_size < max_size:
        if 0 < file_size:
            logfile_padding(path)
        return path
    base_path, file_name = os.path.split(path)
    old_paths = find_paths(base_path=base_path or '.',
                           extension='{}.*'.format(file_name), recursive=False)
    if old_paths:
        old_paths = [p for p in old_paths if p[-1].isdigit()]
        old_paths = sorted(old_paths, reverse=True, key=lambda x: int(x[-1]))
        counts = [int(p[-1]) for p in old_paths]
        if old_paths and counts[-1] > 1:
            pass  # gap below; renames unnecessary
        elif old_paths:
            max_idx = [1]
            max_idx.extend([s - t for s, t in zip(counts[:-1], counts[1:])])
            max_idx = int(np.array(max_idx).argmax())
            for old_count, old_path in zip(counts[max_idx:], old_paths[max_idx:]):
                try:
                    if old_count == 9:
                        os.remove(old_path)
                    else:
                        new_path = '{}{}'.format(old_path[:-1], old_count + 1)
                        if not os.path.isfile(new_path):
                            os.rename(old_path, new_path)
                except (FileNotFoundError, FileExistsError, PermissionError):
                    pass
    try:
        os.rename(path, '{}.1'.format(path))
    except (FileNotFoundError, FileExistsError, PermissionError):
        pass
    return path


def get_loggers(log_level=logging.DEBUG, logfile_name='./logfile.log',
                short_stream_output=False, short_file_output=False,
                log_to_file=False, settings=None):
    """Set up the 'ysmr' logger with queue-based handlers (idempotent).

    If ``settings`` carries a ``logging_queue`` (multiprocess mode), attach a
    QueueHandler targeting it instead — the dedicated listener process then
    owns the real handlers (reference helper_file.py:922-990).
    """
    if isinstance(settings, dict) and 'logging_queue' in settings:
        logging_configurer(settings)
        return

    logger = logging.getLogger('ysmr')
    logger.propagate = False
    long_format, short_format = log_formats()
    logging.basicConfig(format=long_format, style='{')

    queue_handler = None
    for handler in logger.handlers:
        if isinstance(handler, QueueHandler):
            queue_handler = handler
            break
    if isinstance(queue_handler, QueueHandler):
        return
    long_formatter = logging.Formatter(long_format, style='{')
    short_formatter = logging.Formatter(short_format, style='{')
    logger.setLevel(log_level)
    log_queue = Queue(-1)
    queue_handler = QueueHandler(log_queue)
    logger.addHandler(queue_handler)
    stream_handler = logging.StreamHandler(sys.stdout)
    stream_handler.setLevel(log_level)
    stream_handler.setFormatter(short_formatter if short_stream_output else long_formatter)
    handlers = [stream_handler]
    if log_to_file:
        file_handler = logging.FileHandler(filename=logfile_name, mode='a')
        file_handler.setLevel(log_level)
        file_handler.setFormatter(short_formatter if short_file_output else long_formatter)
        handlers.append(file_handler)
    listener = QueueListener(log_queue, *handlers)
    listener.start()
    # keep a reference for stop_logging_queue()
    logger._ysmr_queue_listener = listener


def logging_configurer(settings):
    """Attach a QueueHandler for the multiprocess logging queue."""
    root = logging.getLogger('ysmr')
    if not len(root.handlers):
        handler = logging.handlers.QueueHandler(settings['logging_queue'])
        root.addHandler(handler)
        root.setLevel(settings['log_level'])


def logging_listener_configurer(settings):
    """Configure real handlers inside the listener process."""
    root = logging.getLogger('ysmr')
    root.propagate = False
    long_format, short_format = log_formats()
    long_formatter = logging.Formatter(long_format, style='{')
    short_formatter = logging.Formatter(short_format, style='{')
    stream_handler = logging.StreamHandler(sys.stdout)
    stream_handler.setFormatter(
        short_formatter if settings['shorten logfile logging output'] else long_formatter)
    stream_handler.setLevel(settings['log_level'])
    root.addHandler(stream_handler)
    if settings['log to file']:
        file_handler = logging.FileHandler(filename=settings['log file path'], mode='a')
        file_handler.setFormatter(
            short_formatter if settings['shorten displayed logging output'] else long_formatter)
        file_handler.setLevel(settings['log_level'])
        root.addHandler(file_handler)


def logging_listener(settings):
    """Consume log records from the multiprocess queue; stop on None sentinel."""
    queue = settings['logging_queue']
    logging_listener_configurer(settings)
    while True:
        try:
            record = queue.get()
            if record is None:
                break
            logging.getLogger(record.name).handle(record)
        except Exception:
            import traceback
            print('Problem:', file=sys.stderr)
            traceback.print_exc(file=sys.stderr)
            try:
                with open(file=settings['log file path'], mode='w+') as file:
                    traceback.print_exc(file=file)
            except (FileNotFoundError, PermissionError):
                pass
            break


def stop_logging_queue(logger=None, settings=None):
    """Send the None sentinel and stop any in-process QueueListener."""
    if isinstance(settings, dict) and 'logging_queue' in settings:
        try:
            settings['logging_queue'].put(None, True, 5)
        except Exception:
            try:
                settings['logging_queue'].put_nowait(None)
            except Exception:
                pass
    ysmr_logger = logging.getLogger('ysmr')
    listener = getattr(ysmr_logger, '_ysmr_queue_listener', None)
    if listener is not None:
        try:
            listener.stop()
        except (AttributeError, TypeError, RuntimeError):
            pass
        ysmr_logger._ysmr_queue_listener = None
    sleep(.1)


def log_infos(settings):
    """Startup banner + settings-derived warnings (helper_file.py:1014-1128)."""
    logger = logging.getLogger('ysmr').getChild(__name__)
    long_format, short_format = log_formats()
    if (settings['shorten displayed logging output'] and settings['log to file']) \
            or settings['shorten logfile logging output']:
        format_for_logging = short_format
    else:
        format_for_logging = long_format
    explain = format_for_logging.format(**{
        'asctime': 'YYYY-MM-DD HH:MM:SS,mmm',
        'name': 'logger name',
        'funcName': 'function name',
        'filename': 'file name',
        'lineno': 'lNr',
        'levelname': 'level',
        'process': 'PID',
        'message': 'Message (lNr: line number, PID: Process ID)',
    })
    filler = '\t'.join('#' * len(i) for i in explain.split('\t'))
    logger.info('Explanation\n{0}\n{1}\n{0}'.format(filler, explain))

    if settings['shut down after analysis']:
        logger.warning('Shutting down PC after files have been processed')
    if settings['debugging']:
        logger.warning('Test settings enabled')
    if not settings['rename previous result .csv']:
        logger.warning('Old .csv result lists will be overwritten')
    if settings['delete .csv file after analysis']:
        logger.warning('Generated .csv files will be deleted after analysis')
    if settings['select files'] and settings['debugging']:
        logger.warning('Manually selecting files disabled due to debugging')
    if settings['perc_motile_warning']:
        for warning in settings['perc_motile_warning']:
            logger.warning(warning)

    logger.info('Settings file location: %s',
                os.path.abspath(settings['tracking_ini_filepath']))
    if settings['log to file']:
        logger.info('Logfile location: %s', os.path.abspath(settings['log file path']))
    if settings['verbose']:
        logger.info('Verbose enabled, logging set to debug.')
    else:
        logger.info('Log level set to %s',
                    settings['set logging level (debug/info/warning/critical)'])
    if settings['display video analysis']:
        logger.info('Displaying videos')
    if settings['adaptive double threshold'] > 0:
        logger.info('Using adaptive double threshold: initial threshold offset: %s; '
                    'threshold offset for markers: %s',
                    settings['threshold offset for detection'],
                    settings['adaptive double threshold'] +
                    settings['threshold offset for detection'])
    elif settings['adaptive double threshold'] == 0:
        logger.info('Using single adaptive threshold, offset: %s',
                    settings['threshold offset for detection'])
    else:
        logger.info('Using average gray value based thresholding. Offset: %s',
                    settings['threshold offset for detection'])
    if settings['disable gsff']:
        logger.info('GSFF disabled.')
    else:
        max_horizon = settings['maximum horizon size']
        logger.info('GSFF settings: number: %s, minimum: %s, maximum: %s',
                    settings['number of LSFFs'], settings['minimum horizon size'],
                    'FPS will be used.' if max_horizon is None else max_horizon)
    if settings['save video']:
        logger.info('Saving detection video files')
    if settings['include luminosity in tracking calculation']:
        logger.info('Use average luminosity for distance calculation enabled - '
                    'processing time per video may increase notably')
    if settings['limit track length to x seconds']:
        limit_string = 'Maximal track length for evaluation set to {} s'.format(
            settings['limit track length to x seconds'])
        if settings['limit track length exactly']:
            limit_string += ' exactly. Tracks off by any frames will be discarded.'
        logger.info(limit_string)
    else:
        logger.info('Full track length will be used in evaluation')
    if not settings['maximal recursion depth']:
        logger.info('Tracks will not be split on error as \'maximal recursion depth\' '
                    'is set to 0. This could severely reduce the number of viable tracks.')

    logger.debug('White bacteria on dark background set to %s',
                 settings['white bacteria on dark background'])
    logger.debug('List save length set to %s entries', settings['list save length interval'])
    logger.debug('Pixel/micrometre: %s', settings['pixel per micrometre'])
    if settings['verbose']:
        logger.debug('tracking.ini settings:')
        for key in settings:
            logger.debug('%s: %s', key, settings[key])
    return filler


def shutdown(seconds=60):
    """Attempt to power off the machine (reference helper_file.py:1604-1642)."""
    logger = logging.getLogger('ysmr').getChild(__name__)
    if os.name == 'nt':
        try:
            response = subprocess.run('shutdown -f -s -t {}'.format(seconds),
                                      stderr=subprocess.PIPE)
            response.check_returncode()
            logger.warning('Shutting down in %s s (shutdown -a to abort)', seconds)
        except (OSError, FileNotFoundError, subprocess.CalledProcessError) as err:
            logger.exception('Error during shutdown: %s', err)
        return
    for cmd in ('systemctl poweroff', 'sudo shutdown -h +1'):
        try:
            response = subprocess.run(cmd.split(), stderr=subprocess.PIPE)
            try:
                response.check_returncode()
            except AttributeError:
                pass
            logger.warning('Calling %r on system.', cmd)
            return
        except (OSError, FileNotFoundError, subprocess.CalledProcessError):
            continue
    logger.error('Could not shut down the system.')
