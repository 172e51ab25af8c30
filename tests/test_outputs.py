"""Artifact tests: plots, annotated video, statistics CSVs, luminosity path."""

import os

import numpy as np
import pandas as pd
import pytest


def _tracks_df(rng, n_tracks=6, n_frames=90):
    rows = []
    for tid in range(n_tracks):
        x, y = rng.uniform(50, 250, 2)
        vx, vy = (0.0, 0.0) if tid < 2 else rng.uniform(-1.5, 1.5, 2)
        for t in range(n_frames):
            rows.append((tid, t, x + vx * t + rng.normal(0, 0.1),
                         y + vy * t + rng.normal(0, 0.1),
                         6.0 + 0.1 * tid, 3.0, 45.0))
    return pd.DataFrame(rows, columns=['TRACK_ID', 'POSITION_T', 'POSITION_X',
                                       'POSITION_Y', 'WIDTH', 'HEIGHT',
                                       'DEGREES_ANGLE'])


def test_evaluate_writes_all_artifacts(tmp_path, rng, tmp_ini):
    from ysmr_tpu.config import get_configs
    from ysmr_tpu.pipeline.evaluate import evaluate_tracks
    settings = get_configs(tmp_ini)
    settings.update({'verbose': False, 'log to file': False,
                     'minimal length in seconds': 2.0,
                     'limit track length to x seconds': 3.0,
                     'save angle distribution plot / bins': 18})
    df = _tracks_df(rng)
    out = evaluate_tracks(path_to_file=str(tmp_path / 'vid_selected_data.csv'),
                          results_directory=str(tmp_path), df=df,
                          settings=settings, fps=30.0)
    assert out is not None
    analysed, stats = out
    assert stats.shape[0] == 6
    expected = ['vid_selected_data_statistics.csv',
                'vid_selected_data_analysed.csv',
                'vid_selected_data_angle_histogram.png',
                'vid_selected_data_Bac_Run_Overview.png',
                'vid_selected_data_rose_graph.png',
                'vid_selected_data_speed.png',
                'vid_selected_data_Median_speed.png',
                'vid_selected_data_perc_motile.png']
    for name in expected:
        assert os.path.isfile(str(tmp_path / name)), name
    # statistics CSV columns in the reference order
    cols = pd.read_csv(str(tmp_path / 'vid_selected_data_statistics.csv')).columns
    for col in ['Turn Points (TP/s)', 'Distance (µm)', 'Speed (µm/s)', 'Time (s)',
                'Displacement (µm)', 'Perc. Motile', 'Arc-Chord Ratio',
                'Bacteria Length', 'Displacement divided by length',
                'Motility Phenotype', 'TRACK_ID', 'Median Speed']:
        assert col in cols, col


def test_annotate_video_writes_file(tmp_path, rng, tmp_ini):
    import cv2
    from ysmr_tpu.config import get_configs
    from ysmr_tpu.pipeline.annotate import annotate_video
    settings = get_configs(tmp_ini)
    settings.update({'log to file': False, 'minimal frame count': 5,
                     'save video fourcc codec': 'MJPG',
                     'save video file extension': '.avi'})
    video = str(tmp_path / 'clip.avi')
    wtr = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*'MJPG'), 30, (160, 120))
    for _ in range(10):
        wtr.write(np.zeros((120, 160, 3), np.uint8))
    wtr.release()
    df = pd.DataFrame({
        'TRACK_ID': [0] * 10, 'POSITION_T': list(range(10)),
        'POSITION_X': np.linspace(20, 100, 10),
        'POSITION_Y': np.linspace(20, 80, 10),
        'moving': [1] * 10, 'turn_points': [0] * 5 + [1] + [0] * 4,
        'motility_phenotype': ['motile'] * 10,
    })
    annotate_video(video, df, output_save=True, settings=settings,
                   result_folder=str(tmp_path))
    out = str(tmp_path / 'clip_annotated_output.avi')
    assert os.path.isfile(out) and os.path.getsize(out) > 0
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 10
    cap.release()

    # phenotype subtype filter (reference track_eval.py:1357-1363): by
    # index or name, with the subtype-tagged output file name; a filter
    # matching nothing warns and writes no file
    annotate_video(video, df, output_save=True, settings=settings,
                   result_folder=str(tmp_path), select_subtype=2)
    sub = str(tmp_path / 'motile_subtype_clip_annotated_output.avi')
    assert os.path.isfile(sub) and os.path.getsize(sub) > 0
    cap = cv2.VideoCapture(sub)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 10
    cap.release()
    assert annotate_video(video, df, output_save=True, settings=settings,
                          result_folder=str(tmp_path),
                          select_subtype='twitching') is None
    assert not os.path.isfile(
        str(tmp_path / 'twitching_subtype_clip_annotated_output.avi'))


def test_pixels_luminosity_matches_frames(rng):
    """Luminosity mode: component gray means must match across transfer modes."""
    from ysmr_tpu.io.preproc import HostPreprocessor
    from ysmr_tpu.pipeline import detect as det
    from ysmr_tpu.pipeline.detect_pixels import detect_from_pixels
    from tests.test_detect_pixels import _blob_frames, _settings
    settings = _settings(2.0, lum=True)
    frames = _blob_frames(rng)
    t, h, w, _ = frames.shape
    config = det.DetectorConfig(settings, 30.0)
    assert config.include_luminosity
    frame_valid = np.ones(t, bool)
    ref = det.detect_batch(frames, frame_valid, config)
    prep = HostPreprocessor(settings, 30.0, max_fg=4096)
    batches = [prep(f) for f in frames]
    got = detect_from_pixels(
        np.stack([b['px_x'] for b in batches]),
        np.stack([b['px_y'] for b in batches]),
        np.array([b['count'] for b in batches], np.int32),
        np.stack([b['px_marker'] for b in batches]),
        frame_valid, h=h, w=w, double_threshold=True,
        max_det=config.max_det, max_bh=config.max_bh, cc_iters=config.cc_iters,
        include_luminosity=True,
        gray_frames=np.stack([b['gray'] for b in batches]))
    assert np.array_equal(np.asarray(got['det_valid']), np.asarray(ref['det_valid']))
    np.testing.assert_allclose(np.asarray(got['det_xy']), np.asarray(ref['det_xy']),
                               atol=1e-4)


def test_track_bacteria_luminosity_end_to_end(tmp_path):
    """Full luminosity pipeline: ILLUMINATION column written, values in the
    reference's scale (gray/100; exact filled-rotated-rect mean of
    track_eval.py:290-300 — see ops/luminosity.py), tracking unaffected."""
    import pandas as pd
    from tests.test_e2e_parity import _make_settings, make_synthetic_video
    from ysmr_tpu.pipeline.track_bacteria import track_bacteria
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=40)
    base = _make_settings(tmp_path)
    out_a = tmp_path / 'plain'
    out_a.mkdir()
    res_plain = track_bacteria(video, settings=base, result_folder=str(out_a))
    assert res_plain is not None
    lum = _make_settings(tmp_path)
    lum['include luminosity in tracking calculation'] = True
    out_b = tmp_path / 'lum'
    out_b.mkdir()
    res = track_bacteria(video, settings=lum, result_folder=str(out_b))
    assert res is not None
    df, fps, fh, fw, csv = res
    # both the returned frame and the CSV artifact keep ILLUMINATION
    # (the REFERENCE loses it in its final sort/rewrite — get_data usecols,
    # helper_file.py:880-890 — a quirk, not a contract; MIGRATION.md §7)
    assert list(df.columns) == ['TRACK_ID', 'POSITION_T', 'POSITION_X',
                                'POSITION_Y', 'WIDTH', 'HEIGHT',
                                'DEGREES_ANGLE', 'ILLUMINATION']
    on_disk = pd.read_csv(csv)
    assert 'ILLUMINATION' in on_disk.columns
    on_screen = on_disk[on_disk['WIDTH'] > 0]  # missing-object rows are zero
    vals = on_screen['ILLUMINATION'].to_numpy(dtype=float)
    assert (vals > 0.3).all() and (vals < 2.56).all()
    # luminosity is a weak extra distance dimension — same scene, very
    # similar track population
    n_plain = res_plain[0]['TRACK_ID'].nunique()
    n_lum = df['TRACK_ID'].nunique()
    assert abs(n_plain - n_lum) <= max(2, n_plain // 10)


def test_jax_profiler_trace_written(tmp_path):
    """'jax profiler dir' writes a device-level trace of the tracking run
    (SURVEY.md section 5: the reference only has a per-frame fps timer)."""
    import os
    from tests.test_e2e_parity import _make_settings, make_synthetic_video
    from ysmr_tpu.pipeline.track_bacteria import track_bacteria
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=40)
    settings = _make_settings(tmp_path)
    trace_dir = str(tmp_path / 'trace')
    settings['jax profiler dir'] = trace_dir
    out = tmp_path / 'out'
    out.mkdir()
    res = track_bacteria(video, settings=settings, result_folder=str(out))
    assert res is not None
    found = []
    for root, _dirs, files in os.walk(trace_dir):
        found.extend(files)
    assert found, 'no profiler trace files written'


def test_track_bacteria_deterministic(tmp_path):
    """Two identical runs produce byte-identical _list.csv artifacts (decode
    threading, device compute, and the final sort are all deterministic)."""
    from tests.test_e2e_parity import _make_settings, make_synthetic_video
    from ysmr_tpu.pipeline.track_bacteria import track_bacteria
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=40)
    outs = []
    for tag in ('r1', 'r2'):
        settings = _make_settings(tmp_path)
        folder = tmp_path / tag
        folder.mkdir()
        res = track_bacteria(video, settings=settings,
                             result_folder=str(folder))
        assert res is not None
        outs.append(open(res[4], 'rb').read())
    assert outs[0] == outs[1]


def test_compact_readback_pipeline_parity(tmp_path):
    """The opt-in 'compact emissions readback' (device-side slot packing,
    one small d2h fetch per batch) must be invisible in the artifacts: same
    rows as the default padded readback. Device-tracker mode ('cv2 exact
    rects' off) so the emissions path is the one under test."""
    from tests.test_e2e_parity import _make_settings, make_synthetic_video
    from ysmr_tpu.pipeline.track_bacteria import track_bacteria
    video = make_synthetic_video(str(tmp_path / 'clip.avi'), n_frames=40)
    out = {}
    for compact in (False, True):
        settings = _make_settings(tmp_path, **{
            'cv2 exact rects': False,
            'compact emissions readback': compact})
        folder = tmp_path / ('compact' if compact else 'padded')
        folder.mkdir()
        res = track_bacteria(video, settings=settings,
                             result_folder=str(folder))
        assert res is not None
        out[compact] = res[0]
    pd.testing.assert_frame_equal(out[False], out[True])


def test_jax_profiler_stops_on_zero_track_return(tmp_path):
    """The zero-tracks early return must stop the profiler too; a leaked
    trace would make the next run's start_trace raise."""
    import cv2
    import numpy as np
    from tests.test_e2e_parity import _make_settings
    from ysmr_tpu.pipeline.track_bacteria import track_bacteria
    video = str(tmp_path / 'blank.avi')
    wtr = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*'MJPG'), 30,
                          (160, 120))
    for _ in range(40):
        wtr.write(np.full((120, 160, 3), 40, np.uint8))
    wtr.release()
    settings = _make_settings(tmp_path)
    settings['jax profiler dir'] = str(tmp_path / 'trace')
    for tag in ('r1', 'r2'):
        out = tmp_path / tag
        out.mkdir()
        res = track_bacteria(video, settings=settings,
                             result_folder=str(out))
        assert res is None  # nothing tracked, clean early return both times
