"""Utility subpackage: logging, file handling, CSV/XLSX interchange."""

from ysmr_tpu.utils.csv_io import (bytes_to_human_readable, collate_results_csv_to_xlsx,
                                   different_tracks, get_data, save_df_to_csv, save_list,
                                   sort_list)
from ysmr_tpu.utils.files import (create_results_folder, creation_date, elapsed_time,
                                  find_paths, get_any_paths, make_dir, metadata_file)
from ysmr_tpu.utils.logging_utils import (check_logfile, get_loggers, log_formats, log_infos,
                                          logging_configurer, logging_listener,
                                          logging_listener_configurer, stop_logging_queue)

__all__ = [
    'bytes_to_human_readable', 'collate_results_csv_to_xlsx', 'different_tracks',
    'get_data', 'save_df_to_csv', 'save_list', 'sort_list',
    'create_results_folder', 'creation_date', 'elapsed_time', 'find_paths',
    'get_any_paths', 'make_dir', 'metadata_file',
    'check_logfile', 'get_loggers', 'log_formats', 'log_infos', 'logging_configurer',
    'logging_listener', 'logging_listener_configurer', 'stop_logging_queue',
]
