"""Randomized selection/evaluation parity vs the reference implementation.

The e2e tests exercise select/evaluate on clean synthetic videos; here the
stages get adversarial random track tables — holes, zero-area (disappeared)
rows, area spikes, short fragments, off-screen coordinates — fed IDENTICALLY
to the reference's select_tracks/evaluate_tracks and ours, comparing the
surviving rows exactly and the statistics numerically. Skips when the
reference is absent.
"""

import os
import sys

import numpy as np
import pandas as pd
import pytest

REFERENCE_PATH = '/root/reference'

FPS = 30.0
F_H, F_W = 288, 384


def _reference_stages():
    if not os.path.isdir(REFERENCE_PATH):
        pytest.skip('reference implementation not available')
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        import ysmr.track_eval as ref_te
    except Exception:
        pytest.skip('reference implementation not importable')
    ref_te.violin_plot = lambda **kwargs: None  # crashes on new matplotlib
    return ref_te.select_tracks, ref_te.evaluate_tracks


def _settings(tmp_path):
    from ysmr_tpu.config import create_configs, get_configs
    ini = str(tmp_path / 'tracking.ini')
    create_configs(ini, open_editor=False)
    settings = get_configs(ini)
    settings.update({
        'verbose': False, 'log to file': False,
        'display video analysis': False,
        'minimal length in seconds': 1.0,
        'limit track length to x seconds': 2.0,
        'extreme area outliers upper end in px*px': 400,
        'save angle distribution plot / bins': 0,
        'save large plots': False, 'save rose plot': False,
        'save time violin plot': False, 'save acr violin plot': False,
        'save length violin plot': False,
        'save turning point violin plot': False,
        'save speed violin plot': False,
        'save displacement violin plot': False,
        'save percent motile plot': False,
        'store processed .csv file': True,
        'store generated statistical .csv file': True,
        'store final analysed .csv file': True,
    })
    return settings


def _random_track_table(rng, n_tracks=24):
    """Adversarial tracker output: the canonical 7-column frame."""
    rows = []
    for tid in range(n_tracks):
        start = int(rng.integers(0, 40))
        # mostly healthy long tracks with a tail of short/defective ones
        length = int(rng.integers(40, 140)) if tid % 4 else \
            int(rng.integers(3, 25))
        x = float(rng.uniform(20, F_W - 20))
        y = float(rng.uniform(20, F_H - 20))
        vx, vy = rng.uniform(-0.8, 0.8, 2)
        for i in range(length):
            t = start + i
            w = float(rng.normal(9.0, 0.6))
            h = float(rng.normal(4.0, 0.3))
            if rng.random() < 0.01:
                w = h = 0.0       # disappeared-but-alive row (area == 0)
            if rng.random() < 0.01:
                w *= 9.0          # area spike
            jump = 40.0 if rng.random() < 0.005 else 0.0  # distance outlier
            rows.append((tid, t, x + vx * i + jump + rng.normal(0, 0.3),
                         y + vy * i + rng.normal(0, 0.3), w, h,
                         float(rng.uniform(0, 90))))
    df = pd.DataFrame(rows, columns=['TRACK_ID', 'POSITION_T', 'POSITION_X',
                                     'POSITION_Y', 'WIDTH', 'HEIGHT',
                                     'DEGREES_ANGLE'])
    df = df.astype({'TRACK_ID': np.uint32, 'POSITION_T': np.uint32})
    df.sort_values(by=['TRACK_ID', 'POSITION_T'], inplace=True, kind='stable')
    df.reset_index(drop=True, inplace=True)
    return df


@pytest.mark.e2e
@pytest.mark.parametrize('seed', [11, 29])
def test_select_parity_on_random_tables(tmp_path, seed):
    ref_select, _ = _reference_stages()
    from ysmr_tpu.pipeline.select import select_tracks
    settings = _settings(tmp_path)
    df = _random_track_table(np.random.default_rng(seed))
    ref_dir = tmp_path / 'ref'
    our_dir = tmp_path / 'ours'
    ref_dir.mkdir()
    our_dir.mkdir()
    ref = ref_select(path_to_file='rand.csv', df=df.copy(),
                     results_directory=str(ref_dir), fps=FPS,
                     frame_height=F_H, frame_width=F_W,
                     settings=dict(settings))
    ours = select_tracks(path_to_file='rand.csv', df=df.copy(),
                         results_directory=str(our_dir), fps=FPS,
                         frame_height=F_H, frame_width=F_W,
                         settings=dict(settings))
    assert ref is not None and ours is not None
    assert sorted(ours['TRACK_ID'].unique()) == sorted(ref['TRACK_ID'].unique())
    assert len(ours) == len(ref)
    for col in ['TRACK_ID', 'POSITION_T', 'POSITION_X', 'POSITION_Y',
                'WIDTH', 'HEIGHT', 'DEGREES_ANGLE']:
        np.testing.assert_array_equal(ours[col].to_numpy(),
                                      ref[col].to_numpy(), err_msg=col)


@pytest.mark.e2e
def test_evaluate_parity_on_random_tables(tmp_path):
    ref_select, ref_eval = _reference_stages()
    from ysmr_tpu.pipeline.evaluate import evaluate_tracks
    settings = _settings(tmp_path)
    df = _random_track_table(np.random.default_rng(5))
    ref_dir = tmp_path / 'ref'
    our_dir = tmp_path / 'ours'
    ref_dir.mkdir()
    our_dir.mkdir()
    sel = ref_select(path_to_file='rand.csv', df=df.copy(),
                     results_directory=str(ref_dir), fps=FPS,
                     frame_height=F_H, frame_width=F_W,
                     settings=dict(settings))
    assert sel is not None and len(sel)
    ref_out = ref_eval(path_to_file='rand.csv',
                       results_directory=str(ref_dir), df=sel.copy(),
                       settings=dict(settings), fps=FPS)
    our_out = evaluate_tracks(path_to_file='rand.csv',
                              results_directory=str(our_dir), df=sel.copy(),
                              settings=dict(settings), fps=FPS)
    assert ref_out is not None and our_out is not None
    ref_stats, our_stats = ref_out[1], our_out[1]
    assert len(our_stats) == len(ref_stats)
    assert list(our_stats.columns) == list(ref_stats.columns)
    for col in ref_stats.columns:
        a = our_stats[col].to_numpy()
        b = ref_stats[col].to_numpy()
        if a.dtype.kind in 'fi' and b.dtype.kind in 'fi':
            np.testing.assert_allclose(a.astype(float), b.astype(float),
                                       rtol=1e-6, atol=1e-6, err_msg=col)
        else:
            np.testing.assert_array_equal(a, b, err_msg=col)


def test_select_exact_length_limit_semantics(tmp_path):
    """'limit track length exactly' (track_eval.py:783-791, era semantics):
    a track whose frames include start + limit - 1 is truncated exactly
    there; a track with a hole at that frame is dropped. The reference
    cannot be compared directly on modern pandas (its all-NaN idxmax now
    raises where it used to return NaN -> skip)."""
    from ysmr_tpu.pipeline.select import select_tracks
    settings = _settings(tmp_path)
    settings['limit track length exactly'] = True
    settings['minimal length in seconds'] = 1.0
    settings['limit track length to x seconds'] = 2.0  # 60 frames at 30 fps
    rows = []
    for tid, hole_at_limit in [(0, False), (1, True)]:
        for t in range(100):
            if hole_at_limit and t == 59:  # start + limit - 1
                continue
            rows.append((tid, t, 100.0 + tid * 50 + 0.3 * t, 100.0,
                         6.0, 3.0, 45.0))
    import pandas as pd
    df = pd.DataFrame(rows, columns=['TRACK_ID', 'POSITION_T', 'POSITION_X',
                                     'POSITION_Y', 'WIDTH', 'HEIGHT',
                                     'DEGREES_ANGLE'])
    out = select_tracks(path_to_file='exact.csv', df=df,
                        results_directory=str(tmp_path), fps=FPS,
                        frame_height=F_H, frame_width=F_W, settings=settings)
    assert out is not None
    assert sorted(out['TRACK_ID'].unique()) == [0]
    t0 = out[out['TRACK_ID'] == 0]['POSITION_T']
    assert t0.max() == 59 and len(t0) == 60
