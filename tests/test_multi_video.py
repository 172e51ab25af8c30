"""Sharded multi-video pipeline: per-video parity with solo runs on the
8-device virtual CPU mesh, uneven video counts/lengths, and the ysmr()
dispatch branch ('shard videos across devices')."""

import os

import numpy as np
import pandas as pd
import pytest

from tests.test_e2e_parity import _make_settings, make_synthetic_video


def _small_clip_settings(tmp_path, **overrides):
    settings = _make_settings(tmp_path)
    settings.update({
        'minimal length in seconds': 1.0,
        'limit track length to x seconds': 1.5,
        'frame batch size': 8,
        'max detections per frame': 32,
        'max track slots': 64,
        # identical compute path for solo vs sharded comparison: the sharded
        # mode ships raw frames to the device (frames path)
        'transfer mode': 'frames',
    })
    settings.update(overrides)
    return settings


def _clips(tmp_path, lengths=(48, 40, 36), w=192, h=144):
    paths = []
    for i, n in enumerate(lengths):
        paths.append(make_synthetic_video(
            str(tmp_path / 'clip{}.avi'.format(i)), n_frames=n, w=w, h=h,
            seed=20 + i, n_bugs=6))
    return paths


@pytest.mark.e2e
def test_sharded_matches_solo(tmp_path):
    """Three videos of uneven length through the sharded runner vs solo
    track_bacteria: identical track ids/frames, positions to f32 noise."""
    from ysmr_tpu.parallel.multi_video import track_videos_sharded
    from ysmr_tpu.pipeline.track_bacteria import track_bacteria

    videos = _clips(tmp_path)
    settings = _small_clip_settings(tmp_path)
    solo_dir = str(tmp_path / 'solo')
    shard_dir = str(tmp_path / 'shard')
    os.makedirs(solo_dir)
    os.makedirs(shard_dir)

    solo = {}
    for video in videos:
        res = track_bacteria(video, settings=dict(settings),
                             result_folder=solo_dir)
        assert res is not None, video
        solo[video] = res

    sharded = track_videos_sharded(videos, settings=dict(settings),
                                   result_folder=shard_dir)
    for video in videos:
        assert sharded[video] is not None, video
        df_s, fps_s, h_s, w_s, csv_s = sharded[video]
        df_o, fps_o, h_o, w_o, _ = solo[video]
        assert (fps_s, h_s, w_s) == (fps_o, h_o, w_o)
        assert os.path.isfile(csv_s)
        assert df_s.shape[0] == df_o.shape[0], video
        assert df_s['TRACK_ID'].tolist() == df_o['TRACK_ID'].tolist()
        assert df_s['POSITION_T'].tolist() == df_o['POSITION_T'].tolist()
        for col in ('POSITION_X', 'POSITION_Y', 'WIDTH', 'HEIGHT',
                    'DEGREES_ANGLE'):
            np.testing.assert_allclose(df_s[col], df_o[col], atol=1e-4,
                                       err_msg='{} {}'.format(video, col))
        # the _list.csv artifact itself round-trips to the same rows
        csv_df = pd.read_csv(csv_s)
        assert csv_df.shape[0] == df_s.shape[0]


@pytest.mark.e2e
def test_ysmr_sharded_dispatch(tmp_path):
    """ysmr() with 'shard videos across devices': full artifact chain for
    every video, one shared device-mesh stage-1 pass."""
    from ysmr_tpu.main import ysmr

    videos = _clips(tmp_path, lengths=(44, 38))
    settings = _small_clip_settings(
        tmp_path, **{'shard videos across devices': True,
                     'collate results csv to xlsx': True})
    result_folder = str(tmp_path / 'results')
    os.makedirs(result_folder)
    finished = ysmr(paths=videos, settings=settings,
                    result_folder=result_folder, multiprocess=False)
    assert finished is not None and len(finished) == 2
    assert all(res is not None for _, res in finished)
    for stem in ('clip0', 'clip1'):
        for suffix in ('_list.csv', '_selected_data.csv', '_statistics.csv',
                       '_analysed.csv', '_meta.json'):
            path = os.path.join(result_folder, stem + suffix)
            assert os.path.isfile(path), path
    import glob
    assert glob.glob(os.path.join(result_folder,
                                  '*_collated_statistics.xlsx'))
