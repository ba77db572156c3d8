"""Fixed-lag marginalization of the sliding window (SURVEY.md §7
"Incrementality → windowed re-solve": "marginalization of planes
exiting the window via Schur-based prior, or simply a fixed-lag
smoother with priors on the oldest pose" — the latter is what
``pipeline.slam`` implements; the reference's iSAM keeps the whole
trajectory instead, SURVEY.md §3.3).

The scheme under test (`pipeline.slam._marginalize_oldest`): when the
window slides, the exiting keyframe's pose-chain information (slot-0
prior + exiting odometry factor) is Schur-eliminated into a 6-DOF
Gaussian prior on the new oldest pose, at the current BA estimate.
Design findings baked into these tests:

- On a pure odometry chain the marginalized window must be *exact*:
  its MAP equals dead reckoning, which equals the full-batch MAP.
- On the observed corridor it must match a full-batch (no-slide) solve
  within tolerance and never do worse than round-2's plain dropping
  (hard gauge-fix of the oldest pose).
- The prior's information must genuinely compose (weaken) down the
  chain — it must not stay pinned at the init anchor's strength.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pop_up_slam_tpu.pipeline.slam as SL
from pop_up_slam_tpu.geometry import se3
from pop_up_slam_tpu.io import synthetic
from pop_up_slam_tpu.pipeline import FrameDetections, slam_init, slam_step


def _corridor_inputs(seed, n, max_det=5, sigma_t=0.02, sigma_r=0.005):
    world = synthetic.corridor_world()
    gt_R, gt_t = synthetic.corridor_trajectory(n, sway=0.3)
    Rrel, trel = synthetic.noisy_odometry(
        gt_R, gt_t, jax.random.PRNGKey(seed), sigma_t=sigma_t, sigma_r=sigma_r
    )
    obs_keys = jax.random.split(jax.random.PRNGKey(seed + 100), n)
    obs = jax.vmap(
        lambda R, t, k: synthetic.observe_frame(
            world, R, t, key=k, max_det=max_det
        )
    )(gt_R, gt_t, obs_keys)
    return gt_R, gt_t, Rrel, trel, obs


def _run(scfg, gt_R, gt_t, Rrel, trel, obs, det_valid=None):
    n = gt_t.shape[0]
    state = slam_init(scfg, gt_R[0], gt_t[0])
    step = jax.jit(lambda s, d, oR, ot: slam_step(s, d, oR, ot, scfg))
    est = [np.asarray(gt_t[0])]
    for i in range(1, n):
        valid = obs.valid[i] if det_valid is None else det_valid(i)
        det = FrameDetections(
            obs.planes_c[i], obs.centroid_c[i], obs.endpoints_c[i], valid
        )
        state, (R, t) = step(state, det, Rrel[i - 1], trel[i - 1])
        est.append(np.asarray(t))
    err = np.linalg.norm(np.stack(est) - np.asarray(gt_t), axis=1)
    return np.sqrt((err ** 2).mean()), state


def test_odometry_only_exact_dead_reckoning():
    """With no plane observations, the marginalized sliding window's MAP
    is exactly dead reckoning (= the full-batch MAP of an odometry
    chain).  This pins down the prior-chain composition: any bias in
    the folded prior (mean shift, info mis-accounting) breaks it."""
    n, D = 20, 5
    scfg = SL.SlamConfig(window_size=4, max_landmarks=16, max_det=D,
                         kf_trans=0.0, kf_rot=0.0, gn_iters=5,
                         marginalize=True)
    gt_R, gt_t, Rrel, trel, _ = _corridor_inputs(0, n)
    state = slam_init(scfg, gt_R[0], gt_t[0])
    step = jax.jit(lambda s, d, oR, ot: slam_step(s, d, oR, ot, scfg))
    det = FrameDetections(
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0, 0.0]), (D, 4)),
        jnp.zeros((D, 3)), jnp.zeros((D, 2, 3)), jnp.zeros((D,), bool),
    )
    dr_R, dr_t = gt_R[0], gt_t[0]
    for i in range(1, n):
        state, (R, t) = step(state, det, Rrel[i - 1], trel[i - 1])
        dr_R, dr_t = se3.se3_compose(dr_R, dr_t, Rrel[i - 1], trel[i - 1])
        np.testing.assert_allclose(
            np.asarray(t), np.asarray(dr_t), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(R), np.asarray(dr_R), atol=1e-4
        )


def test_prior_info_composes_down_the_chain():
    """After several slides the slot-0 prior must be the (much weaker)
    composed odometry-chain marginal, not the 1e3 init anchor."""
    n = 24
    scfg = SL.SlamConfig(window_size=4, max_landmarks=32, max_det=5,
                         kf_trans=0.0, kf_rot=0.0, gn_iters=3,
                         marginalize=True)
    gt_R, gt_t, Rrel, trel, obs = _corridor_inputs(0, n)
    _, state = _run(scfg, gt_R, gt_t, Rrel, trel, obs)
    sq = np.asarray(state.mprior_sqrt)
    assert np.isfinite(sq).all()
    # info = sqrt^T sqrt; translation diag of the init anchor is 1e6.
    info = sq.T @ sq
    trans_info = np.diag(info)[:3]
    assert trans_info.max() < 1e5, trans_info
    # but it must stay at least the configured conditioning floor
    assert trans_info.min() >= scfg.marg_info_floor * 0.99


@pytest.mark.slow
def test_matches_full_batch_and_beats_nothing_lost():
    """Long corridor (6x the window length): the marginalized fixed-lag
    window must (a) stay within tolerance of a full-batch (no-slide)
    solve and (b) never be worse than round-2's plain dropping."""
    n, W = 36, 6
    ates = {}
    for name, ws, marg in (
        ("marg", W, True),
        ("drop", W, False),
        ("batch", n + 1, True),   # window never fills -> no slide
    ):
        scfg = SL.SlamConfig(window_size=ws, max_landmarks=48, max_det=5,
                             kf_trans=0.0, kf_rot=0.0, gn_iters=3,
                             marginalize=marg)
        gt_R, gt_t, Rrel, trel, obs = _corridor_inputs(1, n)
        ates[name], _ = _run(scfg, gt_R, gt_t, Rrel, trel, obs)
    # fixed-lag vs full batch: within 5 cm on a ~7 m corridor
    assert ates["marg"] <= ates["batch"] + 0.05, ates
    # and no regression vs plain dropping
    assert ates["marg"] <= ates["drop"] + 5e-3, ates


@pytest.mark.slow
def test_observation_outage_stays_finite_and_recovers():
    """Observation outage mid-sequence: the prior chain weakens through
    the gap (composed covariance grows), stays numerically healthy
    (no NaN from the near-singular reduced system — the f32 failure
    mode the info floor exists for), and the run completes with a
    sane ATE."""
    n = 40
    scfg = SL.SlamConfig(window_size=4, max_landmarks=32, max_det=5,
                         kf_trans=0.0, kf_rot=0.0, gn_iters=3,
                         marginalize=True)
    gt_R, gt_t, Rrel, trel, obs = _corridor_inputs(3, n)
    ate, state = _run(
        scfg, gt_R, gt_t, Rrel, trel, obs,
        det_valid=lambda i: obs.valid[i] & (not 12 <= i < 24),
    )
    assert np.isfinite(ate)
    assert np.isfinite(np.asarray(state.mprior_sqrt)).all()
    assert ate < 0.5, ate
