"""Multi-device mesh tests (8 virtual CPU devices via conftest XLA flags)."""

import os

import numpy as np
import pytest

import jax


needs_devices = pytest.mark.skipif(jax.device_count() < 4,
                                   reason='needs >= 4 devices')


@needs_devices
def test_sharded_greedy_matches_single_device(rng):
    from ysmr_tpu.ops import assignment as asg
    from ysmr_tpu.parallel import sharding as shd
    mesh = shd.make_mesh(4)
    r, c = 64, 48
    obj_xy = rng.uniform(0, 500, (r, 2)).astype(np.float32)
    det_xy = rng.uniform(0, 500, (c, 2)).astype(np.float32)
    obj_valid = rng.random(r) < 0.9
    det_valid = rng.random(c) < 0.9
    d = asg.pairwise_distances(obj_xy, obj_valid, det_xy, det_valid)
    want = asg.greedy_assign(d, obj_valid, det_valid)
    got = shd.sharded_greedy_assign(mesh, shd.shard_videos(mesh, obj_xy),
                                    obj_valid, det_xy, det_valid)
    assert np.asarray(got['row_to_col']).tolist() == \
        np.asarray(want['row_to_col']).tolist()
    assert np.asarray(got['col_matched']).tolist() == \
        np.asarray(want['col_matched']).tolist()


@needs_devices
def test_multi_video_detect_track_matches_serial(rng):
    """Each sharded video must produce the same emissions as a solo run."""
    from ysmr_tpu.ops import preprocess as pp
    from ysmr_tpu.parallel import sharding as shd
    from ysmr_tpu.pipeline import detect as det
    from ysmr_tpu.pipeline import tracker as trk
    import jax.numpy as jnp

    mesh = shd.make_mesh(4)
    v, t, h, w = 4, 3, 64, 96
    max_slots = 16
    frames = rng.integers(0, 50, (v, t, h, w, 3), dtype=np.uint8)
    # paint one bright blob per video at distinct positions
    for i in range(v):
        for k in range(t):
            y0, x0 = 10 + 6 * i, 20 + 4 * k
            frames[i, k, y0:y0 + 4, x0:x0 + 6] = 220

    dkw = dict(mode='adaptive_double', white_on_dark=True, offset=5,
               double_delta=2.0, max_det=16, max_bh=16, cc_iters=32,
               include_luminosity=False)
    tkw = dict(max_disappeared=30.0, use_gsff=False)

    state0 = trk.init_tracker_state(max_slots, dims=2)
    state = jax.tree_util.tree_map(lambda x: jnp.stack([x] * v), state0)
    frame_valid = np.ones((v, t), bool)
    new_state, em = shd.multi_video_detect_track(
        mesh, shd.shard_videos(mesh, frames), frame_valid,
        detect_kwargs=dkw, tracker_state=state, tracker_kwargs=tkw)
    em_mask = np.asarray(em['mask'])
    em_pos = np.asarray(em['pos'])

    for i in range(v):
        gray = pp.bgr_to_gray(frames[i])
        blurred = pp.blur3(gray)
        tables = det.detect_from_blurred(
            gray, blurred, np.ones(t, bool), np.zeros(t, np.int32), **dkw)
        st, em_i = trk.run_tracker_scan(
            trk.init_tracker_state(max_slots, dims=2), tables['det_xy'],
            tables['det_info'], tables['det_valid'], **tkw)
        assert np.array_equal(em_mask[i], np.asarray(em_i['mask']))
        np.testing.assert_allclose(em_pos[i], np.asarray(em_i['pos']), atol=1e-5)

    # multi-host/DCN shape: the same videos over a 2-axis (hosts, chips)
    # mesh — the video batch shards over the flattened product, per-video
    # results identical to the 1-axis mesh
    mesh2 = shd.make_mesh(4, hosts=2)
    assert mesh2.axis_names == ('hosts', 'videos')
    state2 = jax.tree_util.tree_map(lambda x: jnp.stack([x] * v), state0)
    _, em2 = shd.multi_video_detect_track(
        mesh2, shd.shard_videos(mesh2, frames), frame_valid,
        detect_kwargs=dkw, tracker_state=state2, tracker_kwargs=tkw)
    assert np.array_equal(np.asarray(em2['mask']), em_mask)
    np.testing.assert_allclose(np.asarray(em2['pos']), em_pos, atol=1e-6)


@needs_devices
def test_sharded_greedy_on_two_axis_mesh(rng):
    """Dense-scene row sharding over the (hosts, chips) mesh: identical to
    the single-device matcher (collectives reduce over both axes)."""
    from ysmr_tpu.ops import assignment as asg
    from ysmr_tpu.parallel import sharding as shd
    mesh = shd.make_mesh(4, hosts=2)
    r, c = 64, 48
    obj_xy = rng.uniform(0, 500, (r, 2)).astype(np.float32)
    det_xy = rng.uniform(0, 500, (c, 2)).astype(np.float32)
    obj_valid = rng.random(r) < 0.9
    det_valid = rng.random(c) < 0.9
    d = asg.pairwise_distances(obj_xy, obj_valid, det_xy, det_valid)
    want = asg.greedy_assign(d, obj_valid, det_valid)
    got = shd.sharded_greedy_assign(mesh, shd.shard_videos(mesh, obj_xy),
                                    obj_valid, det_xy, det_valid)
    assert np.asarray(got['row_to_col']).tolist() == \
        np.asarray(want['row_to_col']).tolist()


@needs_devices
def test_tracker_scan_sharded_assign_matches(rng):
    """run_tracker_scan(assign_mesh=...) must emit exactly what the
    single-device matcher emits — same ids, positions, det columns — on a
    dense multi-frame stream with appearing/vanishing detections."""
    from ysmr_tpu.parallel import sharding as shd
    from ysmr_tpu.pipeline import tracker as trk

    mesh = shd.make_mesh(4, axis='slots')
    t_len, c, s = 6, 96, 128
    xy = rng.uniform(0, 800, (t_len, c, 2)).astype(np.float32)
    # frame-to-frame coherent motion so matching is non-trivial
    xy[1:] = xy[:1] + np.cumsum(
        rng.normal(0, 1.0, (t_len - 1, c, 2)), axis=0).astype(np.float32)
    info = rng.uniform(1, 5, (t_len, c, 3)).astype(np.float32)
    valid = rng.random((t_len, c)) < 0.8
    kwargs = dict(max_disappeared=3.0, use_gsff=False)

    s0 = trk.init_tracker_state(s, dims=2)
    ref_state, ref_em = trk.run_tracker_scan(s0, xy, info, valid, **kwargs)
    got_state, got_em = trk.run_tracker_scan(s0, xy, info, valid,
                                             assign_mesh=mesh, **kwargs)
    for key in ('mask', 'ids', 'det_col', 'n_det'):
        np.testing.assert_array_equal(np.asarray(ref_em[key]),
                                      np.asarray(got_em[key]), err_msg=key)
    np.testing.assert_array_equal(np.asarray(ref_em['pos']),
                                  np.asarray(got_em['pos']))
    np.testing.assert_array_equal(np.asarray(ref_state['ids']),
                                  np.asarray(got_state['ids']))


@needs_devices
@pytest.mark.e2e
def test_track_bacteria_sharded_assign_e2e(tmp_path):
    """The '[TPU SETTINGS] shard dense assignment across devices' key must
    route the pipeline's device tracker through sharded_greedy_assign
    (threshold forced to 0 here) and produce rows identical to the
    single-device run."""
    from tests.test_e2e_parity import _make_settings, make_synthetic_video
    from ysmr_tpu.pipeline.track_bacteria import track_bacteria

    clip = make_synthetic_video(str(tmp_path / 'dense.avi'), n_frames=32,
                                w=192, h=144, seed=5, n_bugs=10)
    base = _make_settings(tmp_path)
    base.update({
        'minimal length in seconds': 0.5,
        'frame batch size': 8,
        'max detections per frame': 32,
        'max track slots': 64,
        'transfer mode': 'pixels',
        # device tracker (the sharded matcher lives there), not tracker64
        'cv2 exact rects': False,
    })
    ref_dir = str(tmp_path / 'ref')
    shard_dir = str(tmp_path / 'shard')
    os.makedirs(ref_dir)
    os.makedirs(shard_dir)
    ref = track_bacteria(clip, settings=dict(base), result_folder=ref_dir)
    assert ref is not None
    sharded_settings = dict(base)
    sharded_settings.update({
        'shard dense assignment across devices': True,
        'dense assignment shard threshold': 0,
    })
    got = track_bacteria(clip, settings=sharded_settings,
                         result_folder=shard_dir)
    assert got is not None
    df_ref, df_got = ref[0], got[0]
    assert df_got.shape[0] == df_ref.shape[0]
    for col in ('TRACK_ID', 'POSITION_T'):
        assert df_got[col].tolist() == df_ref[col].tolist(), col
    for col in ('POSITION_X', 'POSITION_Y', 'WIDTH', 'HEIGHT',
                'DEGREES_ANGLE'):
        np.testing.assert_array_equal(df_got[col], df_ref[col], err_msg=col)
