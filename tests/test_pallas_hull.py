"""Pallas hull-edge kernel (ops/pallas_hull.py) vs the XLA slope matrix.

The VMEM row-loop kernel must be BIT-identical to the XLA closed form in
ops/labeling._hull_edge_angles: both compute the same correctly-rounded f32
pairwise slope quotients, the same min/max reductions, and share the angle
finishing, so exact equality (not allclose) is asserted — including empty
components, single-row components, collinear runs, and padding tails.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ysmr_tpu.ops.labeling import (_hull_edge_angles,
                                   _edge_vector_finish,
                                   _hull_edge_angles_chain)
from ysmr_tpu.ops.pallas_hull import hull_edge_vectors


def _random_tables(rng, d, r, empty_frac=0.15):
    n_rows = rng.integers(1, r + 1, size=d)
    valid = (np.arange(r)[None, :] < n_rows[:, None])
    empty = rng.random(d) < empty_frac
    valid[empty] = False
    min_y = np.where(empty, 1 << 30,
                     rng.integers(0, 900, size=d)).astype(np.int64)
    abs_y = (min_y[:, None] + np.arange(r)).astype(np.int32)
    cx = rng.integers(0, 1200, size=(d, 1))
    half = rng.integers(0, 30, size=(d, r))
    jitter = rng.integers(-5, 6, size=(d, r))
    row_min = (cx + jitter - half).astype(np.int32)
    row_max = np.maximum(row_min, (cx + jitter + half).astype(np.int32))
    big = 1 << 30
    return (np.where(valid, row_min, big).astype(np.int32),
            np.where(valid, row_max, -big).astype(np.int32),
            valid, abs_y)


def _pallas_angles(row_min, row_max, valid, abs_y):
    r = row_min.shape[1]
    dxl, dyl, el, dxr, dyr, er, cl, cr = hull_edge_vectors(
        jnp.asarray(row_min), jnp.asarray(row_max), jnp.asarray(valid),
        jnp.asarray(abs_y), interpret=True)
    _, _, la, lv = _edge_vector_finish(dxl, dyl, el, r)
    _, _, ra, rv = _edge_vector_finish(dxr, dyr, er, r)
    return (np.asarray(jnp.concatenate([la, ra], axis=1)),
            np.asarray(jnp.concatenate([lv, rv], axis=1)))


@pytest.mark.parametrize('d,r,seed', [(40, 24, 0), (130, 16, 1), (5, 8, 2)])
def test_hull_kernel_bit_identical_to_xla(d, r, seed):
    rng = np.random.default_rng(seed)
    row_min, row_max, valid, abs_y = _random_tables(rng, d, r)
    a_ref, v_ref = _hull_edge_angles(jnp.asarray(row_min),
                                     jnp.asarray(row_max),
                                     jnp.asarray(valid), jnp.asarray(abs_y))
    a_p, v_p = _pallas_angles(row_min, row_max, valid, abs_y)
    assert np.array_equal(np.asarray(a_ref), a_p)
    assert np.array_equal(np.asarray(v_ref), v_p)


def test_hull_kernel_collinear_runs():
    """Perfectly collinear chains: the kernel's ascending-k <= tie rule must
    pick the same (farthest) edge endpoints as the XLA j_star rule, and the
    angle SET must also match the sequential monotone-chain oracle."""
    r = 12
    valid = np.ones((3, r), bool)
    abs_y = np.tile(np.arange(r, dtype=np.int32), (3, 1)) + 7
    # comp 0: straight vertical strip; comp 1: constant slope 2; comp 2: two
    # collinear segments meeting at a vertex
    row_min = np.stack([
        np.full(r, 100, np.int32),
        (100 + 2 * np.arange(r)).astype(np.int32),
        np.where(np.arange(r) < 6, 100 + 3 * np.arange(r),
                 118 - np.arange(r)).astype(np.int32),
    ])
    row_max = row_min + 5
    a_ref, v_ref = _hull_edge_angles(jnp.asarray(row_min),
                                     jnp.asarray(row_max),
                                     jnp.asarray(valid), jnp.asarray(abs_y))
    a_p, v_p = _pallas_angles(row_min, row_max, valid, abs_y)
    assert np.array_equal(np.asarray(a_ref), a_p)
    assert np.array_equal(np.asarray(v_ref), v_p)
    a_c, v_c = _hull_edge_angles_chain(jnp.asarray(row_min),
                                       jnp.asarray(row_max),
                                       jnp.asarray(valid),
                                       jnp.asarray(abs_y))
    for comp in range(3):
        s_new = np.unique(np.round(a_p[comp][v_p[comp]], 5))
        s_chain = np.unique(np.round(np.asarray(a_c)[comp]
                                     [np.asarray(v_c)[comp]], 5))
        assert np.array_equal(s_new, s_chain)


def test_xla_closed_form_matches_chain_oracle():
    """The vectorised membership test must yield the same candidate-angle
    SET as the sequential monotone chain (the original oracle)."""
    rng = np.random.default_rng(7)
    d, r = 48, 20
    row_min, row_max, valid, abs_y = _random_tables(rng, d, r, empty_frac=0.1)
    a_n, v_n = _hull_edge_angles(jnp.asarray(row_min), jnp.asarray(row_max),
                                 jnp.asarray(valid), jnp.asarray(abs_y))
    a_c, v_c = _hull_edge_angles_chain(jnp.asarray(row_min),
                                       jnp.asarray(row_max),
                                       jnp.asarray(valid),
                                       jnp.asarray(abs_y))
    a_n, v_n, a_c, v_c = map(np.asarray, (a_n, v_n, a_c, v_c))
    for comp in range(d):
        s_new = np.unique(np.round(a_n[comp][v_n[comp]], 5))
        s_chain = np.unique(np.round(a_c[comp][v_c[comp]], 5))
        assert np.array_equal(s_new, s_chain), comp
