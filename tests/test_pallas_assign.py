"""Fused row-min/argmin kernel (ops/pallas_assign.py) vs the XLA matcher.

The kernel must reproduce jnp.min/jnp.argmin over the masked distance
matrix exactly, including first-minimal tie-breaks, invalid rows/columns
(BIG, 0), and the luminosity (K=3) metric.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ysmr_tpu.ops import assignment as asg


def _xla(obj, ov, det, dv):
    m = asg.pairwise_distances(jnp.asarray(obj), jnp.asarray(ov),
                               jnp.asarray(det), jnp.asarray(dv))
    return np.asarray(jnp.min(m, axis=1)), np.asarray(jnp.argmin(m, axis=1))


@pytest.mark.parametrize('k', [2, 3])
@pytest.mark.parametrize('r,c', [(40, 17), (130, 600), (1024, 512)])
def test_row_min_argmin_matches_xla(k, r, c):
    from ysmr_tpu.ops.pallas_assign import row_min_argmin
    rng = np.random.default_rng(7)
    obj = rng.uniform(0, 1228, (r, k)).astype(np.float32)
    det = rng.uniform(0, 1228, (c, k)).astype(np.float32)
    ov = rng.random(r) < 0.8
    dv = rng.random(c) < 0.8
    ov[0] = False
    dv[:2] = False
    # exact-tie columns: duplicate a detection so first-minimal wins
    if c > 4:
        det[3] = det[4]
        dv[3] = dv[4] = True
    ref_min, ref_arg = _xla(obj, ov, det, dv)
    got_min, got_arg = row_min_argmin(obj, ov, det, dv, interpret=True)
    np.testing.assert_allclose(np.asarray(got_min), ref_min, rtol=1e-6,
                               atol=1e-3)
    # argmin must agree wherever the minimum is unambiguous at f32; on the
    # planted exact tie both must pick the first column
    np.testing.assert_array_equal(np.asarray(got_arg), ref_arg)


def test_row_min_argmin_all_invalid():
    from ysmr_tpu.ops.pallas_assign import row_min_argmin
    obj = np.zeros((8, 2), np.float32)
    det = np.zeros((4, 2), np.float32)
    got_min, got_arg = row_min_argmin(obj, np.zeros(8, bool), det,
                                      np.zeros(4, bool), interpret=True)
    assert (np.asarray(got_min) == asg.BIG).all()
    assert (np.asarray(got_arg) == 0).all()


def test_tracker_scan_same_with_kernel():
    """run_tracker_scan(use_pallas_assign=True) in interpret mode must emit
    identical tracks to the XLA matcher."""
    import jax
    from ysmr_tpu.pipeline import tracker as trk
    import ysmr_tpu.ops.pallas_assign as pa
    rng = np.random.default_rng(3)
    t, c, s = 6, 24, 64
    det_xy = rng.uniform(0, 300, (t, c, 2)).astype(np.float32)
    det_info = rng.uniform(1, 8, (t, c, 3)).astype(np.float32)
    det_valid = rng.random((t, c)) < 0.7
    state0 = trk.init_tracker_state(s, dims=2)
    ref_state, ref_em = jax.tree.map(np.asarray, trk.run_tracker_scan(
        state0, det_xy, det_info, det_valid, max_disappeared=3.0))
    orig = pa.row_min_argmin
    pa.row_min_argmin = lambda *a, **kw: orig(*a, interpret=True, **kw)
    try:
        got_state, got_em = jax.tree.map(np.asarray, trk.run_tracker_scan(
            state0, det_xy, det_info, det_valid, max_disappeared=3.0,
            use_pallas_assign=True))
    finally:
        pa.row_min_argmin = orig
    np.testing.assert_array_equal(got_em['mask'], ref_em['mask'])
    np.testing.assert_array_equal(got_em['ids'], ref_em['ids'])
    np.testing.assert_allclose(got_em['pos'], ref_em['pos'], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_state['active']),
                                  np.asarray(ref_state['active']))
