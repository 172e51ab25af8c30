"""Real multi-process mesh: two spawned CPU-backend processes form a global
8-device mesh via ``jax.distributed`` (parallel/sharding.init_distributed)
and run one sharded multi-video detect+track step whose per-video outputs
must equal a solo single-process run.

This crosses an actual process boundary (the DCN shape of SURVEY.md
section 5's "Distributed communication backend") — the in-process
``hosts=`` axis tests in test_sharding.py only partition local devices.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

V, T, H, W = 8, 2, 16, 16
MAX_DET, MAX_SLOTS, OFFSET = 16, 16, 5.0


def _synthetic_batch(rng):
    """(V, T, H, W, 3) uint8 frames with one bright blob per video."""
    frames = rng.integers(30, 50, (V, T, H, W, 3), dtype=np.uint8)
    for v in range(V):
        x, y = 3 + (v * 2) % 10, 4 + v % 8
        frames[v, :, y:y + 3, x:x + 3, :] = 220
    return frames, np.ones((V, T), bool)


def _solo_reference(frames, valid):
    """The same step on this process's local 8-device virtual mesh."""
    import jax
    from ysmr_tpu.parallel import sharding as shd
    from ysmr_tpu.pipeline import tracker as trk
    mesh = shd.make_mesh()
    state0 = trk.init_tracker_state(MAX_SLOTS, dims=2)
    state = jax.tree_util.tree_map(
        lambda x: np.stack([np.asarray(x)] * V), state0)
    step = shd.make_multi_video_step(
        mesh,
        detect_kwargs=dict(mode='adaptive_double', white_on_dark=True,
                           offset=OFFSET, double_delta=2.0, max_det=MAX_DET,
                           max_bh=8, cc_iters=8, include_luminosity=False,
                           lum_win=3),
        tracker_kwargs=dict(max_disappeared=30.0, use_gsff=False),
        emit_counts=True)
    _, emissions = step(shd.shard_videos(mesh, frames),
                        shd.shard_videos(mesh, valid), state)
    return {k: np.asarray(v) for k, v in emissions.items()}


@pytest.mark.e2e
def test_two_process_mesh_matches_solo(tmp_path, rng):
    frames, valid = _synthetic_batch(rng)
    emissions = _solo_reference(frames, valid)

    ref_path = str(tmp_path / 'ref.npz')
    np.savez(ref_path, frames=frames, valid=valid, max_det=MAX_DET,
             max_slots=MAX_SLOTS, offset=OFFSET,
             **{'em_' + k: emissions[k]
                for k in ('mask', 'ids', 'pos', 'n_components')})

    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]

    child = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         'dist_mesh_child.py')
    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   JAX_PLATFORMS='cpu',
                   YSMR_DIST_COORDINATOR='127.0.0.1:{}'.format(port),
                   YSMR_DIST_NPROCS='2',
                   YSMR_DIST_PROCESS_ID=str(pid))
        env.pop('XLA_FLAGS', None)  # the child pins 4 local devices itself
        procs.append(subprocess.Popen(
            [sys.executable, child, ref_path], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    try:
        for p in procs:
            outs.append(p.communicate(timeout=540))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail('distributed mesh children timed out')
    for p, (out, err) in zip(procs, outs):
        if p.returncode == 3:
            pytest.fail('sharded outputs diverged from solo:\n' + err[-2000:])
        if p.returncode != 0:
            # environment forbids the coordination service (no localhost
            # networking / gRPC): record the reason as a skip, per SURVEY
            # section 5 test strategy
            lowered = (out + err).lower()
            if any(tok in lowered for tok in
                   ('failed to connect', 'deadline exceeded', 'unavailable',
                    'permission denied', 'coordination')):
                pytest.skip('jax.distributed unavailable here: '
                            + err.strip().splitlines()[-1][:200])
            pytest.fail('child rc={}:\n{}'.format(p.returncode, err[-2000:]))
