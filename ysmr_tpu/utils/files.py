#!/usr/bin/env python3
"""File discovery, results folders, and the _meta.json sidecar.

Capability parity with the reference (helper_file.py:377-436 results folders /
creation dates, :439-516 ``find_paths``, :519-583 ``get_any_paths``,
:1239-1333 ``make_dir``/``metadata_file``): dated ``YYMMDD_Results/`` folders,
recursive file discovery with age filters, an optional Tk file dialog, and the
``_meta.json`` sidecar that carries fps/frame dimensions between pipeline
stages so each stage can restart from CSV alone.
"""

import json
import logging
import os
import platform
from datetime import datetime
from glob import glob
from time import localtime, strftime

import numpy as np


def make_dir(new_directory):
    """Create a directory tree; silently succeed if it already exists."""
    if os.path.isdir(new_directory):
        return
    if os.path.isfile(new_directory):
        raise OSError('A file with the same name as the desired dir, '
                      '\'{}\', already exists.'.format(new_directory))
    os.makedirs(new_directory, exist_ok=True)


def create_results_folder(path):
    """Create a dated result folder next to ``path`` (YYMMDD_Results/)."""
    logger = logging.getLogger('ysmr').getChild(__name__)
    dir_form = '{}_Results/'.format(str(strftime('%y%m%d', localtime())))
    if isinstance(path, (str, os.PathLike)):
        pass
    elif isinstance(path, (list, tuple)):
        path = path[0]
    else:
        path = './'
        logger.critical('Could not access base path in path to files; '
                        'results folder created in %s', os.path.abspath(path))
    directory = os.path.abspath(os.path.join(os.path.dirname(path), dir_form))
    if not os.path.exists(directory):
        try:
            make_dir(directory)
            logger.info('Results folder: %s', directory)
        except OSError as makedir_error:
            logger.exception(makedir_error)
            logger.warning('Unable to create %s, directory changed to %s',
                           directory, os.path.abspath('./'))
            directory = './'
    return directory


def creation_date(path_to_file):
    """Seconds since the file was created (or last modified on Linux)."""
    if not os.path.isfile(path_to_file):
        return None
    now = datetime.now()
    if platform.system() == 'Windows':
        then = os.path.getctime(path_to_file)
    else:
        stat = os.stat(path_to_file)
        then = getattr(stat, 'st_birthtime', stat.st_mtime)
    return (now - datetime.fromtimestamp(then)).total_seconds()


def elapsed_time(time_one):
    """Time difference between ``time_one`` and now."""
    logger = logging.getLogger('ysmr').getChild(__name__)
    try:
        return datetime.now() - time_one
    except (ValueError, TypeError) as val_error:
        logger.exception(val_error)
        return None


def find_paths(base_path, extension, minimal_age=0, maximal_age=np.inf, recursive=True):
    """Find files under ``base_path`` matching ``extension`` within an age window."""
    logger = logging.getLogger('ysmr').getChild(__name__)
    if not os.path.exists(base_path):
        logger.warning('Path could not be found: %s', base_path)
        return None
    if base_path[-1] != '/':
        base_path = '{}/'.format(base_path)
    pattern = ('{}**/*{}' if recursive else '{}*{}').format(base_path, extension)
    out_files = []
    for file in glob(pattern, recursive=recursive):
        file = file.replace(os.sep, '/')
        age = creation_date(file)
        if age is None:
            continue
        if age >= 0 or (age < 0 and minimal_age < 0):
            if maximal_age >= age >= minimal_age or (age < 0 and minimal_age < 0):
                out_files.append(file)
        else:
            logger.warning('The file appears to be %.2f seconds from the future '
                           'and was thus not selected. File: %s', abs(age), file)
    return out_files


def get_any_paths(prev_dir=None, rename=False, file_types=None, settings=None):
    """Ask the user for files via a Tk dialog (interactive sessions only).

    Reference behaviour (helper_file.py:519-583); returns None in headless
    environments where tkinter cannot open a display.
    """
    logger = logging.getLogger('ysmr').getChild(__name__)
    from ysmr_tpu.config import get_configs
    settings = get_configs(settings)
    try:
        import tkinter.filedialog as filedialog
        from tkinter import Tk
    except ImportError:
        logger.exception('Cannot import tkinter; files have to be specified manually.')
        return None
    import configparser
    parser = configparser.ConfigParser(allow_no_value=True)
    if settings:
        parser.read(settings['tracking_ini_filepath'])
    if prev_dir is None:
        try:
            prev_dir = parser['HOUSEKEEPING'].get('previous directory', fallback='./')
        except (configparser.Error, KeyError):
            prev_dir = './'
    if file_types is None:
        file_types = [('all files', '.*'), ('csv', '.csv'), ('avi', '.avi'),
                      ('mkv', '.mkv'), ('mov', '.mov'), ('mp4', '.mp4')]
    try:
        root = Tk()
        root.overrideredirect(1)
        root.withdraw()
        paths = filedialog.askopenfilenames(
            title='Choose files. ', filetypes=file_types,
            defaultextension=file_types[0][1], multiple=True, initialdir=prev_dir)
    except Exception as ex:
        logger.exception('An exception of type %s occurred. Arguments: %r',
                         type(ex).__name__, ex.args)
        return None
    if paths and rename and settings:
        curr_path = os.path.dirname(paths[0])
        try:
            parser.set('HOUSEKEEPING', 'previous directory', curr_path)
            with open(settings['tracking_ini_filepath'], 'w') as configfile:
                parser.write(configfile)
            logger.debug('Previous directory set to %s', curr_path)
        except Exception:
            pass
    return paths


def metadata_file(path=None, verbose=False, additional_search_paths=None, **kwargs):
    """Read/update the per-input ``_meta.json`` sidecar.

    Searches the file's folder, its parent, and any additional paths; strips
    None values; new kwargs win over file contents (helper_file.py:1267-1333).
    """
    logger = logging.getLogger('ysmr').getChild(__name__)
    internal_ext = ['_analysed.csv', '_list.csv', '_selected_data.csv', '_statistics.csv']
    meta_ext = '_meta.json'
    meta_data = {}

    path_parent, file_name = os.path.split(path)
    path_parent = os.path.join(os.path.dirname(path_parent), file_name)
    search_paths = [path, path_parent]
    if additional_search_paths:
        if isinstance(additional_search_paths, (str, os.PathLike)):
            search_paths.append(additional_search_paths)
        else:
            search_paths.extend(additional_search_paths)

    mod_search_paths = []
    for curr_path in search_paths:
        for ext in internal_ext:
            if ext in curr_path[-len(ext):]:
                curr_path = '{}.dummy'.format(curr_path[:-len(ext)])
                break
        if meta_ext not in curr_path[-len(meta_ext):]:
            curr_path = '{}{}'.format(os.path.splitext(curr_path)[0], meta_ext)
        mod_search_paths.append(curr_path)
    save_path = mod_search_paths[0]

    for curr_path in mod_search_paths:
        if verbose:
            logger.debug('Searching for meta file in path: %s', curr_path)
        try:
            with open(curr_path, 'r') as file:
                unfiltered = json.load(file)
            meta_data.update({k: v for k, v in unfiltered.items() if v is not None})
            save_path = curr_path
            break
        except (FileNotFoundError, PermissionError, ValueError):
            pass

    filtered_kwargs = {k: v for k, v in kwargs.items() if v is not None}
    if filtered_kwargs:
        meta_data.update(filtered_kwargs)
        try:
            with open(save_path, 'w+') as file:
                json.dump(meta_data, file)
        except (PermissionError, FileNotFoundError) as ex:
            logger.exception(ex)
    return meta_data
