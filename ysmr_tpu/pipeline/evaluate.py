#!/usr/bin/env python3
"""evaluate_tracks(): per-track statistics, phenotypes, and plots.

Mirrors the reference's evaluation stage (track_eval.py:846-1318) column for
column: deltas with per-track-start resets, px->um conversion, motile flag
via double median filtering, n-frame displacement angles and turning points
via grouped local extrema, phenotype classification, the twelve-column
statistics frame, category splitting for the violin plots, and the
``_statistics.csv`` / ``_analysed.csv`` artifacts.

Two reference quirks are replicated deliberately (they affect numeric
parity):

* ``argrelextrema_groupby``'s de-duplication loop iterates
  ``range(-1, -(shift_range+1))`` — an empty range (helper_file.py:59), so no
  de-duplication ever happens; only the ``argrelextrema(>=, order=10)`` mask
  applies.
* the turning-point segment id of the data frame's final row is never
  assigned (the loop at track_eval.py:991-992 writes ``loc[start:stop-1]``),
  leaving it at 0.
"""

import logging
import os
from time import strftime, strptime

import numpy as np
import pandas as pd
from scipy.signal import argrelextrema, medfilt


from ysmr_tpu.config import get_configs
from ysmr_tpu.utils.csv_io import different_tracks, get_data, save_df_to_csv


def _max_pairwise_distance_per_track(df):
    """Per-track point-set diameter — the value of the reference's
    ``groupby.apply(lambda l: pdist(zip(x, y)).max())`` (track_eval.py:1034)
    without the per-group Python object churn (zip/list/apply cost ~2.2 s at
    4k tracks; this runs in ~0.4 s).

    Equality with pdist().max(): the squared distances use the same
    subtract-square-add float64 ops, and sqrt is monotonic and correctly
    rounded, so ``sqrt(max(d2)) == max(sqrt(d2))`` exactly. For long tracks
    the candidate set is first reduced to its convex hull (the diameter's
    endpoints are hull vertices); degenerate inputs fall back to the full
    set.
    """
    ids = df['TRACK_ID'].to_numpy()
    starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
    stops = np.r_[starts[1:], ids.size]
    x = df['x_norm'].to_numpy(dtype=np.float64)
    y = df['y_norm'].to_numpy(dtype=np.float64)
    out = np.empty(starts.size)
    for k in range(starts.size):
        xs = x[starts[k]:stops[k]]
        ys = y[starts[k]:stops[k]]
        if xs.size > 64:
            try:
                from scipy.spatial import ConvexHull
                v = ConvexHull(np.column_stack([xs, ys])).vertices
                xs, ys = xs[v], ys[v]
            except Exception:  # collinear/degenerate: brute-force the set
                pass
        d2 = np.square(xs[:, None] - xs[None, :]) + \
            np.square(ys[:, None] - ys[None, :])
        out[k] = np.sqrt(d2.max())
    return pd.Series(out, index=pd.Index(ids[starts], name='TRACK_ID'))


def argrelextrema_groupby(group, comparator=np.greater_equal, order=10,
                          shift_range=4, fill_value=0):
    """Grouped local extrema with the reference's (inert) de-dup semantics
    (helper_file.py:39-68)."""
    values = group.to_numpy()
    result = np.zeros(group.shape[0], dtype=np.int8)
    np.put(result, argrelextrema(values, comparator, order=order)[0], 1)
    # reference's shift-based de-duplication loop iterates an empty range and
    # is intentionally not reproduced as active code
    result = np.where(result == 1, values, fill_value)
    return pd.Series(result, index=group.index)


def evaluate_tracks(path_to_file, results_directory, df=None, settings=None,
                    fps=None, **_):
    """Calculate per-track statistics from a selected-tracks frame.

    :return: (analysed df, statistics df) or None
    """
    logger = logging.getLogger('ysmr').getChild(__name__)
    settings = get_configs(settings)
    if settings is None:
        logger.critical('Settings missing; cannot evaluate.')
        return None
    if fps is None or fps <= 0 or settings['force tracking.ini fps settings']:
        if settings['frames per second'] > 0:
            fps = settings['frames per second']
        else:
            logger.critical('Unusable fps value (<= 0); aborting evaluation.')
            return None
    file_name = os.path.splitext(os.path.basename(path_to_file))[0]
    if not isinstance(df, pd.DataFrame):
        if settings['verbose']:
            logger.debug('Loading selected tracks from %s', path_to_file)
        df = get_data(path_to_file)
    if df is None:
        logger.critical('Selected-track table could not be read: %s', path_to_file)
        return None
    diff_tracks_start, track_change = different_tracks(df)
    px_to_micrometre = settings['pixel per micrometre']

    # plot title: the reference's convention — strip the _selected_data
    # suffix, turn underscores into spaces, and render a leading
    # yymmddHHMMSS capture timestamp as a human date (track_eval.py:430-445)
    title = file_name.removesuffix('_selected_data').replace('_', ' ')
    stamp = title[:12]
    if len(stamp) == 12 and stamp.isdigit():
        try:
            pretty = strftime("%d. %m. '%y,", strptime(stamp, '%y%m%d%H%M%S'))
        except ValueError:
            pass
        else:
            title = '{} {}'.format(pretty, title[12:])
    plot_title_name = title
    save_path = os.path.join(results_directory, file_name) + '_{}{}'

    if settings['verbose']:
        logger.debug('Computing per-row deltas and travelled distance')
    df['x_delta'] = df['POSITION_X'].diff()
    df['y_delta'] = df['POSITION_Y'].diff()
    df['t_delta'] = df['POSITION_T'].diff()
    df.loc[diff_tracks_start, ['x_delta', 'y_delta']] = 0
    df.loc[diff_tracks_start, ['t_delta']] = 1
    for letter in ['x', 'y', 't']:
        item = '{}_delta'.format(letter)
        if df[item].isnull().any():
            logger.critical('NaN remained in %s after clean-up at row(s) %s '
                            '(track start rows: %s)', item,
                            np.where(df[item].isnull())[0], diff_tracks_start)

    df['t_norm'] = df['POSITION_T'].sub(
        df.groupby('TRACK_ID')['POSITION_T'].transform('first')).astype(np.int32)
    if any(df['t_norm'] < 0):
        logger.critical('Negative POSITION_T values; cannot evaluate %s',
                        path_to_file)
        return None

    df['WIDTH'] = df['WIDTH'] / px_to_micrometre
    df['HEIGHT'] = df['HEIGHT'] / px_to_micrometre
    df['area'] = df['WIDTH'] * df['HEIGHT']
    df['bac_length'] = np.where(df['WIDTH'] >= df['HEIGHT'], df['WIDTH'],
                                df['HEIGHT']).astype(np.float16)

    if settings['verbose']:
        logger.debug('Computing the per-track statistics table')
    df['travelled_dist'] = np.sqrt(np.square(df['x_delta']) +
                                   np.square(df['y_delta'])) / px_to_micrometre
    df['moving'] = df['travelled_dist'] / df['t_delta']
    df['moving'] = np.where(df['moving'] > 10 ** -3, 1, 0).astype(np.int8)
    if int(round(fps, 0)) & 1 == 0:
        max_kernel = int(round(fps, 0)) + 1
    else:
        max_kernel = int(round(fps, 0))
    for kernel_size in [3, max_kernel]:
        df['moving'] = df.groupby('TRACK_ID')['moving'].transform(
            medfilt, kernel_size=kernel_size)

    angle_diff = settings['compare angle between n frames']
    x_diff_angle = df.groupby('TRACK_ID')['POSITION_X'].diff(angle_diff)
    y_diff_angle = df.groupby('TRACK_ID')['POSITION_Y'].diff(angle_diff)
    df['angle_diff'] = np.arctan2(x_diff_angle, y_diff_angle)  # rad

    if settings['save angle distribution plot / bins']:
        from ysmr_tpu.plot_functions import angle_distribution_plot
        angle_distribution_plot(
            df=df, bins_number=settings['save angle distribution plot / bins'],
            plot_title_name=plot_title_name,
            save_path=save_path.format('angle_histogram', '.png'))
    min_angle = settings['minimal angle in degrees for turning point']
    df['angle_diff'] = np.degrees(df['angle_diff'])
    df['angle_diff'] = abs(df.groupby('TRACK_ID')['angle_diff'].diff().fillna(0))
    df['angle_diff'] = np.where(360 - df['angle_diff'] <= df['angle_diff'],
                                360 - df['angle_diff'],
                                df['angle_diff']).astype(np.int32)
    df['turn_points'] = np.where(
        (df['angle_diff'] > min_angle) & (df['moving'] == 1),
        df['angle_diff'], 0).astype(np.int32)

    df['x_norm'] = (df['POSITION_X'].sub(
        df.groupby('TRACK_ID')['POSITION_X'].transform('first'))) / px_to_micrometre
    df['y_norm'] = (df['POSITION_Y'].sub(
        df.groupby('TRACK_ID')['POSITION_Y'].transform('first'))) / px_to_micrometre

    df['turn_points'] = df.groupby('TRACK_ID')['turn_points'].transform(
        argrelextrema_groupby)
    df['turn_points'] = np.where(df['turn_points'] == 0, 0, 1).astype(np.int8)
    df.loc[diff_tracks_start, ['turn_points']] = 1
    tp_start, _ = different_tracks(df, column='turn_points')
    tp_start = tp_start[::2]
    tp_start.append(int(df.index.max()))
    df['bac_average_size'] = df.groupby('TRACK_ID')['bac_length'].transform('mean')
    # unique id per turning-point segment; the final row keeps id 0 (see
    # module docstring on replicated reference quirks)
    tp_ids = np.zeros(df.shape[0], dtype=np.uint64)
    for i, (start, stop) in enumerate(zip(tp_start[:-1], tp_start[1:])):
        tp_ids[start:stop] = i
    tp_ids[-1] = 0
    df['tp_of_tracks'] = tp_ids
    df['tp_of_tracks'] = np.where(df['moving'] == 0, np.nan, df['tp_of_tracks'])
    df['tp_dist'] = df.groupby('tp_of_tracks')['travelled_dist'].transform('sum')

    seconds_difference_list = [10]
    if 0 < settings['minimal length in seconds'] / 2 < 10:
        seconds_difference_list.append(settings['minimal length in seconds'] / 2)
    if 0 < settings['limit track length to x seconds'] / 2 < 10:
        seconds_difference_list.append(settings['limit track length to x seconds'] / 2)
    seconds_difference = min(seconds_difference_list)
    df['x_fps_diff'] = df.groupby('TRACK_ID')['x_norm'].diff(
        int(round(fps * seconds_difference, 0)))
    df['y_fps_diff'] = df.groupby('TRACK_ID')['y_norm'].diff(
        int(round(fps * seconds_difference, 0)))
    df['pdist_series_max'] = np.sqrt(np.square(df['x_fps_diff']) +
                                     np.square(df['y_fps_diff']))
    df['pdist_series_max'] = df.groupby('TRACK_ID')['pdist_series_max'].transform('max')
    df['pdist_series_max'] = df['pdist_series_max'] / df['bac_average_size']
    df['tp_dist_by_size_max'] = df.groupby('TRACK_ID')['tp_dist'].transform('max') / \
        df['bac_average_size']

    # Phenotypes: 2 motile, 1 twitching, 0 immotile (track_eval.py:1013-1026)
    df['motility_phenotype'] = np.zeros(df.shape[0], dtype=np.int8)
    df['motility_phenotype'] = np.where(
        (df['pdist_series_max'] > 1.5) & (df['tp_dist_by_size_max'] > 5),
        2, df['motility_phenotype'])
    df['motility_phenotype'] = np.where(
        (df['pdist_series_max'] > 1.5) & (df['tp_dist_by_size_max'] <= 5),
        1, df['motility_phenotype'])
    motility_categories = [0, 1, 2]

    pdist_series = _max_pairwise_distance_per_track(df)
    time_series = df.groupby('TRACK_ID')['t_norm'].agg('last')
    median_speed = pd.Series(
        df.groupby(['TRACK_ID', df.index // fps])['travelled_dist'].sum()
        .groupby(level=0).median(),
        index=time_series.index)
    motile_total_series = df.groupby('TRACK_ID')['moving'].agg('sum')
    motile_series = motile_total_series / (time_series + 1) * 100
    time_series = (time_series + 1) / fps
    dist_series = df.groupby('TRACK_ID')['travelled_dist'].agg('sum')
    acr_series = np.sqrt(
        np.square(df.groupby('TRACK_ID')['x_norm'].agg('last')) +
        np.square(df.groupby('TRACK_ID')['y_norm'].agg('last')))
    speed_series = pd.Series(
        np.where(motile_total_series != 0, dist_series / time_series, 0),
        index=time_series.index)
    acr_series = pd.Series(
        np.where(dist_series != 0, acr_series / dist_series, 0),
        index=time_series.index)

    # remove turning points from immotile tracks; re-seed track starts
    df['turn_points'] = np.where(df['motility_phenotype'] != 0,
                                 df['turn_points'], 0)
    df.loc[diff_tracks_start, ['turn_points']] = 1

    turn_per_s_series = (df.groupby('TRACK_ID')['turn_points'].agg('sum') - 1) * fps
    turn_per_s_series = pd.Series(
        np.where(motile_total_series != 0,
                 turn_per_s_series / motile_total_series, 0),
        index=time_series.index)

    bac_length_series = pd.Series(df.groupby('TRACK_ID')['bac_length'].agg('mean'))
    displ_bac_series = pd.Series(
        np.where(bac_length_series != 0, pdist_series / bac_length_series, 0),
        index=time_series.index)
    track_id = df.groupby('TRACK_ID')['TRACK_ID'].agg('last')
    mot_phenotype = df.groupby('TRACK_ID')['motility_phenotype'].agg('last')

    name_of_columns = [
        'Turn Points (TP/s)',            # 0
        'Distance (µm)',                 # 1
        'Speed (µm/s)',                  # 2
        'Time (s)',                      # 3
        'Displacement (µm)',             # 4
        'Perc. Motile',                  # 5
        'Arc-Chord Ratio',               # 6
        'Bacteria Length',               # 7
        'Displacement divided by length',  # 8
        'Motility Phenotype',            # 9
        'TRACK_ID',                      # 10
        'Median Speed',                  # 11
    ]
    df_stats = pd.concat([
        turn_per_s_series, dist_series, speed_series, time_series, pdist_series,
        motile_series, acr_series, bac_length_series, displ_bac_series,
        mot_phenotype, track_id, median_speed,
    ], keys=name_of_columns, axis=1)

    if settings['store generated statistical .csv file']:
        save_df_to_csv(df=df_stats, save_path=save_path.format('statistics', '.csv'))

    nonmotile = df_stats['Motility Phenotype'].where(
        df_stats['Motility Phenotype'] == motility_categories[0]).count() / df_stats.shape[0]
    twitching = df_stats['Motility Phenotype'].where(
        df_stats['Motility Phenotype'] == motility_categories[1]).count() / df_stats.shape[0]
    motile = df_stats['Motility Phenotype'].where(
        df_stats['Motility Phenotype'] == motility_categories[2]).count() / df_stats.shape[0]
    logger.info('Nonmotile: %.2f%%, twitching: %.2f%%, motile: %.2f%%',
                100 * nonmotile, 100 * twitching, 100 * motile)
    q1_time, q2_time, q3_time = np.quantile(df_stats[name_of_columns[3]],
                                            (0.25, 0.5, 0.75))
    logger.debug('Time duration of selected tracks min: %.3f, max: %.3f, '
                 'Quantiles (25/50/75%%): %.3f, %.3f, %.3f',
                 min(df_stats[name_of_columns[3]]), max(df_stats[name_of_columns[3]]),
                 q1_time, q2_time, q3_time)

    # category split for violin plots (track_eval.py:1152-1214)
    cut_off = settings['split results by (Turn Points / Distance / Speed / Time / '
                       'Displacement / perc. motile)']
    cut_off_parameter = None
    for name in name_of_columns:
        if cut_off.lower() in name.lower():
            cut_off_parameter = name
            break
    if not cut_off_parameter:
        logger.warning("'split results by parameter' could not be assigned, "
                       "reverted to 'perc. motile'.")
        cut_off_parameter = name_of_columns[5]
    cut_off_list = settings['split violin plots on']
    if cut_off_parameter == name_of_columns[9]:
        cut_off_list = motility_categories
    name_all_categories = 'All'
    if cut_off_parameter == name_of_columns[5]:
        cut_off_precursor = [(a, b, '{:.1f}% - {:.1f}%'.format(a, b))
                             for a, b in zip(cut_off_list[:-1], cut_off_list[1:])]
    elif cut_off_parameter == name_of_columns[9]:
        cut_off_precursor = [(0, 0.001, 'Immotile'), (1, 1.001, 'Twitching'),
                             (2, 2.001, 'Motile')]
    else:
        cut_off_precursor = [(a, b, '{:.2f} - {:.2f}'.format(a, b))
                             for a, b in zip(cut_off_list[:-1], cut_off_list[1:])]
    cut_off_list = [(-np.inf, np.inf, name_all_categories)]
    cut_off_list.extend(cut_off_precursor)

    cut_off_category = 'Categories ({})'.format(cut_off_parameter)
    df_stats[cut_off_category] = name_all_categories
    df_stats_seaborne = df_stats.copy()
    df_stats_seaborne[cut_off_category] = np.nan
    for index_cut_off, (low, high, category) in enumerate(cut_off_list):
        if category == name_all_categories:
            continue
        df_stats_seaborne[cut_off_category] = np.where(
            (low <= df_stats[cut_off_parameter]) & (high > df_stats[cut_off_parameter]),
            index_cut_off, df_stats_seaborne[cut_off_category])
    df_stats_seaborne.dropna(subset=[cut_off_category], inplace=True)
    df_stats_seaborne[cut_off_category] = df_stats_seaborne[cut_off_category].replace(
        {value: key for key, value in
         zip([i for (_, _, i) in cut_off_list[1:]], range(1, len(cut_off_list)))})
    df_stats_seaborne = pd.concat([df_stats, df_stats_seaborne], ignore_index=True)
    categories = {key: value for key, value in
                  zip([i for (_, _, i) in cut_off_list], range(0, len(cut_off_list)))}
    df_stats_seaborne = df_stats_seaborne.iloc[
        df_stats_seaborne[cut_off_category].map(categories).sort_values().index]

    if settings['save large plots'] or settings['save rose plot']:
        from ysmr_tpu.plot_functions import large_xy_plot, rose_graph
        distance_min = df_stats[name_of_columns[1]].min()
        distance_max = df_stats[name_of_columns[1]].max()
        df['distance_colour'] = df.groupby('TRACK_ID')['travelled_dist'] \
            .transform('sum') - distance_min
        df['distance_colour'] = df['distance_colour'] / df['distance_colour'].max()
        if settings['save large plots']:
            large_xy_plot(df=df, plot_title_name=plot_title_name,
                          save_path=save_path.format('Bac_Run_Overview', '.png'),
                          dist_min=distance_min, dist_max=distance_max,
                          px_to_micrometre=px_to_micrometre)
        if settings['save rose plot']:
            rose_graph(df=df, plot_title_name=plot_title_name,
                       save_path=save_path.format('rose_graph', '.png'),
                       dist_min=distance_min, dist_max=distance_max)

    violin_plots = []
    if settings['save turning point violin plot']:
        violin_plots.append((name_of_columns[0], 'turning_points',
                             settings['turning point violin plot min'],
                             settings['turning point violin plot max']))
    if settings['save length violin plot']:
        violin_plots.append((name_of_columns[1], 'distance',
                             settings['length violin plot min'],
                             settings['length violin plot max']))
    if settings['save speed violin plot']:
        violin_plots.append((name_of_columns[2], 'speed',
                             settings['speed violin plot min'],
                             settings['speed violin plot max']))
    if settings['save time violin plot']:
        violin_plots.append((name_of_columns[3], 'time_plot',
                             settings['time violin plot min'],
                             settings['time violin plot max']))
    if settings['save displacement violin plot']:
        violin_plots.append((name_of_columns[4], 'displacement',
                             settings['displacement violin plot min'],
                             settings['displacement violin plot max']))
    if settings['save percent motile plot']:
        violin_plots.append((name_of_columns[5], 'perc_motile',
                             settings['percent motile plot min'],
                             settings['percent motile plot max']))
    if settings['save acr violin plot']:
        violin_plots.append((name_of_columns[6], 'arc-chord_ratio',
                             settings['acr violin plot min'],
                             settings['acr violin plot max']))
    violin_plots.append((name_of_columns[11], 'Median_speed', None, None))

    from ysmr_tpu.plot_functions import violin_plot
    for category, plot_name, y_min, y_max in violin_plots:
        violin_plot(df=df_stats_seaborne,
                    save_path=save_path.format(plot_name, '.png'),
                    cut_off_category=cut_off_category, category=category,
                    cut_off_list=cut_off_list, verbose=settings['verbose'],
                    y_min=y_min, y_max=y_max, plot_title_name=plot_title_name)

    df_passed_columns = [
        'TRACK_ID', 'POSITION_T', 'POSITION_X', 'POSITION_Y', 'WIDTH', 'HEIGHT',
        'DEGREES_ANGLE', 'angle_diff', 'moving', 'turn_points', 'tp_of_tracks',
        'travelled_dist', 'motility_phenotype']
    df = df.loc[:, df_passed_columns]
    if settings['store final analysed .csv file']:
        save_df_to_csv(df=df, save_path=save_path.format('analysed', '.csv'))

    logging.info('Done evaluating file %s', file_name)
    return df, df_stats
