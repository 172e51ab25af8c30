"""GSFF filter-bank parity vs the reference implementation and the paper's
closed-form equations (gsff.py:111-153)."""

import sys

import numpy as np
import pytest

from ysmr_tpu.ops import gsff as g

REFERENCE_PATH = '/root/reference'


def _reference_gsff(fps=30.0, n_min=0, n_max=30, n_f=3):
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        from ysmr.gsff import GaussianSumFIR
    except Exception:
        pytest.skip('reference implementation not available')
    return GaussianSumFIR(delta_t=1.0 / fps, n_min=n_min, n_max=n_max, n_f=n_f,
                          likelihood_minimum=10 ** -20,
                          inv_cov=np.linalg.inv(np.eye(2)), x_hat_array_length=2)


def test_n_i_defaults():
    assert g.generate_n_i(0, 30, 3) == [10, 20, 30]
    assert g.generate_n_i(5, 35, 3) == [15, 25, 35]


def test_gain_properties():
    # The LS gain estimates the state ONE STEP AHEAD of the window's last
    # measurement (l_bar = h_bar @ A^-N, gsff.py:147): a constant-position
    # window recovers that position with zero velocity; a constant-velocity
    # window recovers position + v*dt.
    dt = 1 / 30.0
    for n in (10, 20, 30):
        gain = g.compute_lsf_gain(n, delta_time=dt)
        assert gain.shape == (4, 2 * n)
        pos = np.array([7.0, -3.0])
        window = np.tile(pos, n)
        state = gain @ window
        assert np.allclose(state[:2], pos, atol=1e-8)
        assert np.allclose(state[2:], 0.0, atol=1e-6)
        # constant velocity: window is oldest-first, current time = 0
        v = np.array([30.0, -15.0])  # px/s
        ts = (np.arange(n) - (n - 1)) * dt
        window = np.concatenate([pos + v * t for t in ts])
        state = gain @ window
        assert np.allclose(state[:2], pos + v * dt, atol=1e-6)
        assert np.allclose(state[2:], v, atol=1e-4)


def _run_reference(ref, measurements):
    """Drive the reference exactly as tracker.py:219-227 does."""
    settings = {}
    correct_out, predict_out = [], []
    for m in measurements:
        corrected, settings = ref.correct(measurement=np.asarray(m, float), **settings)
        correct_out.append(np.array(corrected, float))
        predicted, settings = ref.predict(**settings)
        predict_out.append(np.array(predicted, float))
    return np.array(correct_out), np.array(predict_out)


def _run_ours(params, measurements, slots=4, slot=1):
    state = g.init_state(params, slots)
    reg = np.zeros(slots, bool)
    reg[slot] = True
    state = g.register_slots(state, params, reg, np.tile(measurements[0], (slots, 1)))
    active = reg
    correct_out, predict_out = [], []
    for m in measurements:
        meas = np.zeros((slots, 2), np.float32)
        meas[slot] = m
        state, corrected, predicted = g.step(params, state, meas, active)
        correct_out.append(np.asarray(corrected)[slot])
        predict_out.append(np.asarray(predicted)[slot])
    return np.array(correct_out), np.array(predict_out)


def test_parity_vs_reference_noisy_track(rng):
    fps = 30.0
    ref = _reference_gsff(fps=fps)
    params = g.GSFFParams(fps=fps, n_min=0, n_max=30, n_f=3)
    # noisy constant-velocity trajectory, 70 frames: crosses both mode
    # transitions (len 20 and 30)
    t = np.arange(70)[:, None] / fps
    truth = np.array([100.0, 200.0]) + t * np.array([45.0, -30.0])
    meas = truth + rng.normal(0, 0.8, truth.shape)
    ref_c, ref_p = _run_reference(ref, meas)
    our_c, our_p = _run_ours(params, meas.astype(np.float32))
    # float32 vs the reference's float64: weight sensitivity near mode
    # transitions leaves sub-0.05 px drift, two orders below the measurement
    # noise; the bulk of frames must agree to ~1e-3 px
    err_c = np.abs(our_c - ref_c)
    err_p = np.abs(our_p - ref_p)
    assert np.median(err_c) < 2e-3, np.median(err_c)
    assert err_c.max() < 0.05, err_c.max()
    assert err_p.max() < 0.05, err_p.max()


def test_parity_vs_reference_erratic_track(rng):
    """Direction reversals exercise the likelihood re-weighting."""
    fps = 30.0
    ref = _reference_gsff(fps=fps)
    params = g.GSFFParams(fps=fps)
    steps = rng.choice([-4.0, 0.0, 4.0], size=(90, 2))
    meas = np.cumsum(steps, axis=0) + 500.0
    ref_c, ref_p = _run_reference(ref, meas)
    our_c, our_p = _run_ours(params, meas.astype(np.float32))
    # chaotic motion drives likelihoods through many orders of magnitude; the
    # multiplicative weight chain amplifies float32-vs-float64 rounding, so
    # parity here is tolerance-based (median must stay tight, worst case
    # bounded well under the measurement step size)
    err_c = np.abs(our_c - ref_c)
    err_p = np.abs(our_p - ref_p)
    assert np.median(err_c) < 5e-3, np.median(err_c)
    assert err_c.max() < 0.35, err_c.max()
    assert err_p.max() < 0.35, err_p.max()


def test_parity_large_jump(rng):
    """Jumps > 10 px drive likelihoods to the 1e-20 floor on all filters."""
    fps = 30.0
    ref = _reference_gsff(fps=fps)
    params = g.GSFFParams(fps=fps)
    meas = np.full((40, 2), 50.0)
    meas[20:] = 400.0  # teleport
    ref_c, ref_p = _run_reference(ref, meas)
    our_c, our_p = _run_ours(params, meas.astype(np.float32))
    assert np.allclose(our_c, ref_c, atol=5e-3, rtol=1e-4), np.abs(our_c - ref_c).max()
    assert np.allclose(our_p, ref_p, atol=5e-3, rtol=1e-4)


def test_independent_slots(rng):
    """Slots must not interact; inactive slots must not change."""
    params = g.GSFFParams(fps=30.0)
    meas = (rng.normal(0, 1, (30, 2)) + 100).astype(np.float32)
    c1, p1 = _run_ours(params, meas, slots=8, slot=2)
    c2, p2 = _run_ours(params, meas, slots=3, slot=0)
    assert np.allclose(c1, c2, atol=1e-5)
    assert np.allclose(p1, p2, atol=1e-5)


def test_coasting_self_feedback_parity(rng):
    """Disappeared-but-alive tracks feed their own prediction back as the
    measurement (tracker.py:219-227). This closed loop amplifies rounding
    exponentially, which is why the filter runs in double-single arithmetic:
    in plain float32 the coast drifts ~0.02 px/frame off the reference's
    float64 trajectory (enough to flip near-tie greedy assignments); in DS
    it must stay within ~0.02 px over a full 30-frame grace period."""
    fps = 30.0
    ref = _reference_gsff(fps=fps)
    params = g.GSFFParams(fps=fps)
    t = np.arange(70)[:, None] / fps
    truth = np.array([100.0, 200.0]) + t * np.array([45.0, -30.0])
    meas = (truth + rng.normal(0, 0.8, truth.shape)).astype(np.float32)

    settings = {}
    refp = []
    for i in range(70):
        m64 = np.asarray(meas[i] if i < 40 else refp[-1], float)
        _, settings = ref.correct(measurement=m64, **settings)
        p, settings = ref.predict(**settings)
        refp.append(np.array(p))
    refp = np.array(refp)

    slots, slot = 4, 1
    state = g.init_state(params, slots)
    reg = np.zeros(slots, bool)
    reg[slot] = True
    state = g.register_slots(state, params, reg, np.tile(meas[0], (slots, 1)))
    ourp = []
    pred_hi = None
    for i in range(70):
        mm = np.zeros((slots, 2), np.float32)
        mlo = np.zeros((slots, 2), np.float32)
        if i < 40:
            mm[slot] = meas[i]
        else:  # coast: hi half from the stored position, lo from pred_lo
            mm[slot] = pred_hi
            mlo[slot] = np.asarray(state['pred_lo'])[slot]
        state, _, p = g.step(params, state, mm, reg, measurements_lo=mlo)
        pred_hi = np.asarray(p)[slot]
        ourp.append(pred_hi)
    err = np.abs(np.array(ourp) - refp)
    assert err[:40].max() < 5e-3, err[:40].max()      # measurement-driven
    assert err.max() < 0.02, err.max()                # incl. 30-frame coast
