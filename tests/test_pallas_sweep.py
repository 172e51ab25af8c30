"""Pallas rotated-extent sweep (ops/pallas_sweep.py) vs the XLA formulation.

The kernel must be numerically identical to the XLA sweep in
ops/labeling.py (same fma arithmetic), including all-invalid components
(+big/-big extents) and padding tails.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _xla_sweep(pts, valid, cos, sin):
    cos = cos[:, :, None]
    sin = sin[:, :, None]
    px = pts[..., 0][:, None, :]
    py = pts[..., 1][:, None, :]
    pu = px * cos + py * sin
    pv = -px * sin + py * cos
    big = jnp.float32(3.0e38)
    vm = valid[:, None, :]
    return (jnp.min(jnp.where(vm, pu, big), axis=-1),
            jnp.max(jnp.where(vm, pu, -big), axis=-1),
            jnp.min(jnp.where(vm, pv, big), axis=-1),
            jnp.max(jnp.where(vm, pv, -big), axis=-1))


@pytest.mark.parametrize('d,p,k', [(40, 12, 7), (130, 32, 96), (8, 2, 1)])
def test_sweep_extents_matches_xla(d, p, k):
    from ysmr_tpu.ops.pallas_sweep import sweep_extents
    rng = np.random.default_rng(42)
    pts = rng.uniform(-50, 900, (d, p, 2)).astype(np.float32)
    valid = rng.random((d, p)) < 0.7
    valid[0] = False  # an all-invalid component
    if d > 1:
        valid[1] = True
    ang = rng.uniform(0, np.pi / 2, (d, k)).astype(np.float32)
    cos, sin = np.cos(ang), np.sin(ang)
    ref = _xla_sweep(jnp.asarray(pts), jnp.asarray(valid),
                     jnp.asarray(cos), jnp.asarray(sin))
    got = sweep_extents(pts, valid, cos, sin, interpret=True)
    for r, g, name in zip(ref, got, ('min_u', 'max_u', 'min_v', 'max_v')):
        # ulp-level fma rounding may differ between backends; downstream tie
        # logic uses relative epsilons far above this
        np.testing.assert_allclose(np.asarray(r), np.asarray(g), rtol=1e-6,
                                   atol=1e-3, err_msg=name)


def test_min_area_rect_same_with_either_sweep():
    """min_area_rect must agree between the XLA sweep and the Pallas sweep
    (interpret mode on CPU) on realistic hull tables."""
    from ysmr_tpu.ops import labeling as lb
    rng = np.random.default_rng(3)
    d, bh = 33, 8
    row_valid = np.zeros((d, bh), bool)
    row_valid[:, :4] = True
    min_x = rng.integers(0, 40, (d, bh)).astype(np.float32)
    max_x = min_x + rng.integers(0, 9, (d, bh))
    ys = np.tile(np.arange(bh, dtype=np.float32), (d, 1)) + \
        rng.integers(0, 100, (d, 1))
    pts = np.stack([np.concatenate([min_x, max_x], 1),
                    np.concatenate([ys, ys], 1)], axis=-1).astype(np.float32)
    pv = np.concatenate([row_valid, row_valid], 1)
    ref = lb.min_area_rect(jnp.asarray(pts), jnp.asarray(pv))
    old = lb._SWEEP_OVERRIDE
    try:
        lb._SWEEP_OVERRIDE = True
        lb.min_area_rect.clear_cache()
        import ysmr_tpu.ops.pallas_sweep as ps
        orig = ps.sweep_extents
        ps.sweep_extents = lambda *a, **kw: orig(*a, interpret=True, **kw)
        try:
            got = lb.min_area_rect(jnp.asarray(pts), jnp.asarray(pv))
        finally:
            ps.sweep_extents = orig
    finally:
        lb._SWEEP_OVERRIDE = old
        lb.min_area_rect.clear_cache()
    for key in ('cx', 'cy', 'w', 'h', 'angle_deg'):
        np.testing.assert_allclose(np.asarray(ref[key]), np.asarray(got[key]),
                                   rtol=1e-5, atol=1e-4, err_msg=key)
