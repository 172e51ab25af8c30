#!/usr/bin/env python3
"""Plot outputs: polar angle histogram, XY overview, rose plot, violin plots.

Capability parity with the reference's plot_functions.py (:29-370): the same
four figure types, file naming, figure sizes, viridis distance colouring with
a colour bar, and per-violin median/mean/count text boxes. Written against
current matplotlib/seaborn APIs (the reference targets deprecated ones, e.g.
the removed 'seaborn-whitegrid' style and seaborn's old ``scale``/``bw``
violin kwargs).
"""

import logging

import matplotlib
matplotlib.use('Agg')  # headless by default; annotate/display paths use cv2
import matplotlib as mpl  # noqa: E402
import matplotlib.gridspec as gridspec  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

__all__ = ['angle_distribution_plot', 'large_xy_plot', 'rose_graph', 'violin_plot']

_FIG_W, _FIG_H = 11.6929133858, 8.2677165354  # A4 landscape in inches


def angle_distribution_plot(df, bins_number, plot_title_name, save_path, dpi=300):
    """Polar histogram of n-frame displacement angles for motile tracks.

    Only data points of tracks with > 70 % average motility contribute
    (reference plot_functions.py:29-90).
    """
    logger = logging.getLogger('ysmr').getChild(__name__)
    angle_radians = df['angle_diff']
    groups = df.groupby('TRACK_ID')['moving']
    min_average = np.repeat(groups.mean().to_numpy(), groups.count().to_numpy())
    moving_mask = np.where(min_average > 0.7, df['moving'], 0).astype(bool)
    if not moving_mask.sum():
        logger.warning('Cannot create angle distribution plot as there are no '
                       'motile tracks.')
        return
    angles = angle_radians[np.array(moving_mask)]
    bins = np.linspace(-np.pi, np.pi, bins_number + 1)
    hist_array, _ = np.histogram(angles, bins)
    plt.figure(figsize=(_FIG_W, _FIG_H))
    ax = plt.subplot(1, 1, 1, projection='polar')
    ax.set_theta_zero_location('N')
    ax.set_theta_direction(-1)
    width = 2 * np.pi / bins_number
    bars = ax.bar(bins[:bins_number], hist_array, width=width, bottom=0.0,
                  edgecolor='k')
    for bar in bars:
        bar.set_alpha(0.5)
    plt.title('{} Data points: {}'.format(plot_title_name, moving_mask.sum()))
    plt.savefig(save_path, dpi=dpi)
    logger.debug('Saving figure %s', save_path)
    plt.close()


def _colour_bar(ax, dist_min, dist_max):
    """Viridis-reversed distance colour bar on the given axis."""
    norm = mpl.colors.Normalize(vmin=dist_min, vmax=dist_max)
    cb = mpl.colorbar.Colorbar(ax, mpl.cm.ScalarMappable(norm=norm,
                                                         cmap=plt.cm.viridis_r))
    cb.set_label('µm')
    return ax


def _scatter_grouped(axis, grouped, x_col, y_col):
    for name, group in grouped:
        axis.scatter(group[x_col], group[y_col], marker='.', label=name,
                     c=plt.cm.viridis_r(group.distance_colour), s=1, lw=0)


def large_xy_plot(df, plot_title_name, save_path, px_to_micrometre=1,
                  dist_min=0, dist_max=None, dpi=300):
    """All tracks' raw XY paths coloured by travelled distance
    (reference plot_functions.py:109-188)."""
    logger = logging.getLogger('ysmr').getChild(__name__)
    f = plt.figure()
    f.set_size_inches(_FIG_W, _FIG_H)
    plt.rcParams['axes.axisbelow'] = True
    gs = gridspec.GridSpec(1, 100, figure=f)
    gs.update(left=0.05, right=0.95, hspace=0.05, wspace=0.05)
    if not dist_max:
        dist_max = df.get('travelled_dist', df.get('distance_colour')).max()
    large_plot = plt.subplot(gs[0, :-2])
    dist_bar = plt.subplot(gs[0, -2:])
    firsts = df.groupby('TRACK_ID')[['POSITION_X', 'POSITION_Y']].transform('first')
    large_plot.scatter(firsts.POSITION_X / px_to_micrometre,
                       firsts.POSITION_Y / px_to_micrometre,
                       marker='o', color='black', s=1, lw=0)
    scaled = df.loc[:, ['TRACK_ID', 'distance_colour']].copy()
    scaled['POSITION_X'] = df['POSITION_X'] / px_to_micrometre
    scaled['POSITION_Y'] = df['POSITION_Y'] / px_to_micrometre
    grouped = scaled.sort_values(['distance_colour'], ascending=False).groupby(
        'TRACK_ID', sort=False)[['POSITION_X', 'POSITION_Y', 'distance_colour']]
    _scatter_grouped(large_plot, grouped, 'POSITION_X', 'POSITION_Y')
    _colour_bar(dist_bar, dist_min, dist_max)
    large_plot.set_xlabel('µm')
    large_plot.set_ylabel('µm')
    large_plot.set_aspect('equal')
    large_plot.grid(True)
    large_plot.set_title('{}'.format(plot_title_name))
    plt.savefig(save_path, dpi=dpi)
    logger.debug('Saving figure %s', save_path)
    plt.close()


def rose_graph(df, plot_title_name, save_path, dist_min=0, dist_max=None, dpi=300):
    """All tracks re-origined at (0, 0), coloured by travelled distance
    (reference plot_functions.py:191-257)."""
    logger = logging.getLogger('ysmr').getChild(__name__)
    if not dist_max:
        dist_max = df.get('travelled_dist', df.get('distance_colour')).max()
    f = plt.figure()
    f.set_size_inches(_FIG_W, _FIG_H)
    plt.rcParams['axes.axisbelow'] = True
    gs = gridspec.GridSpec(1, 100, figure=f)
    gs.update(left=0.05, right=0.95, hspace=0.05, wspace=0.05)
    rose_plot = plt.subplot(gs[0, :-2])
    dist_bar = plt.subplot(gs[0, -2:])
    grouped = df.loc[:, ['TRACK_ID', 'distance_colour', 'x_norm', 'y_norm']] \
        .sort_values(['distance_colour'], ascending=False) \
        .groupby('TRACK_ID', sort=False)[['x_norm', 'y_norm', 'distance_colour']]
    _scatter_grouped(rose_plot, grouped, 'x_norm', 'y_norm')
    rose_plot.set_aspect('equal')
    rose_plot.grid(True)
    rose_plot.set_title('{}'.format(plot_title_name))
    _colour_bar(dist_bar, dist_min, dist_max)
    plt.savefig(save_path, dpi=dpi)
    logger.debug('Saving figure %s', save_path)
    plt.close()


def violin_plot(df, save_path, category, cut_off_category, cut_off_list,
                plot_title_name='\n\n', axis=None, dpi=300, verbose=False,
                y_min=None, y_max=None):
    """Seaborn violin plot split by category with per-violin text boxes
    (reference plot_functions.py:260-370)."""
    import seaborn as sns
    if y_min is False:
        y_min = None
    if y_max is False:
        y_max = None
    logger = logging.getLogger('ysmr').getChild(__name__)
    med, small = 8, 6
    plt.rcParams.update({
        'axes.titlesize': med, 'legend.fontsize': med, 'axes.labelsize': small,
        'xtick.labelsize': med, 'ytick.labelsize': med, 'figure.titlesize': med})
    for style in ('seaborn-v0_8-whitegrid', 'seaborn-whitegrid'):
        try:
            plt.style.use(style)
            break
        except OSError:
            continue
    save_fig = False
    if axis is None:
        fig = plt.figure()
        fig.set_size_inches(_FIG_W / 2, _FIG_H / 2)
        axis = fig.add_subplot(111)
        save_fig = True
    plt.rcParams['axes.axisbelow'] = True
    axis.grid(axis='y', which='major', alpha=0.80)
    try:
        sns.violinplot(y=df[category], x=df[cut_off_category], orient='v', cut=0,
                       ax=axis, density_norm='count', width=0.95, linewidth=1,
                       bw_method=.2)
    except TypeError:  # older seaborn keyword set
        sns.violinplot(y=df[category], x=df[cut_off_category], orient='v', cut=0,
                       ax=axis, scale='count', width=0.95, linewidth=1, bw=.2)
    axis.set(ylim=(y_min, y_max))
    sns.despine(ax=axis, offset=0)
    axis.set_title('{}\n\n'.format(plot_title_name))
    text_boxes = []
    all_entries = sum(df[cut_off_category] == cut_off_list[0][2])
    if all_entries == 0:
        all_entries = df.shape[0]
    for idx_textbox in range(len(cut_off_list)):
        curr_category = cut_off_list[idx_textbox][2]
        curr_entries = sum(df[cut_off_category] == curr_category)
        df_subset = df.loc[df[cut_off_category] == curr_category, category]
        median = df_subset.median()
        average = df_subset.mean()
        if np.isnan(median):
            continue
        curr_percentage = '{:.1%}'.format(curr_entries / all_entries) \
            if all_entries > 0 else 'error'
        text_boxes.append((curr_category, curr_entries, curr_percentage,
                           median, average))
    for idx_textbox, (curr_category, curr_entries, curr_percentage, qm, avg) in \
            enumerate(text_boxes):
        axis.text(idx_textbox / len(text_boxes) + 0.015, 1.005,
                  '{}: {} ({})\nMedian: {:.2f}\nAverage:  {:.2f}'.format(
                      curr_category, curr_entries, curr_percentage, qm, avg),
                  transform=axis.transAxes, size=small)
    if save_fig:
        plt.savefig(save_path, dpi=dpi)
        if verbose:
            logger.debug('Saving figure %s', save_path)
        plt.close()
        return None
    return axis
