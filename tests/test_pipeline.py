"""End-to-end SLAM engine tests on the synthetic corridor/room
(SURVEY.md §4 item 2; BASELINE configs 2-3): real data association (no
oracle), sliding window, landmark creation — ATE must collapse well
below the odometry-only drift.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pop_up_slam_tpu.evaluation import ate_rmse
from pop_up_slam_tpu.geometry import se3
from pop_up_slam_tpu.io import synthetic
from pop_up_slam_tpu.pipeline import (
    FrameDetections,
    SlamConfig,
    slam_init,
    slam_step,
)

N_FRAMES = 40


def run_sequence(world, gt_R, gt_t, cfg, sigma_t=0.02, sigma_r=0.005,
                 noise_plane=0.0, seed=0):
    key = jax.random.PRNGKey(seed)
    k_odom, k_obs = jax.random.split(key)
    n = gt_R.shape[0]

    Rrel, trel = synthetic.noisy_odometry(
        gt_R, gt_t, k_odom, sigma_t=sigma_t, sigma_r=sigma_r
    )
    obs_keys = jax.random.split(k_obs, n)
    obs = jax.vmap(
        lambda R, t, k: synthetic.observe_frame(
            world, R, t, key=k, max_det=cfg.max_det,
            noise_plane=noise_plane,
        )
    )(gt_R, gt_t, obs_keys)

    state = slam_init(cfg, gt_R[0], gt_t[0])
    step = jax.jit(lambda s, d, oR, ot: slam_step(s, d, oR, ot, cfg))

    est = [np.asarray(gt_t[0])]
    for i in range(1, n):
        det = FrameDetections(
            planes_c=obs.planes_c[i],
            centroid_c=obs.centroid_c[i],
            endpoints_c=obs.endpoints_c[i],
            valid=obs.valid[i],
        )
        state, (R, t) = step(state, det, Rrel[i - 1], trel[i - 1])
        est.append(np.asarray(t))
    return state, np.stack(est), (Rrel, trel)


def odometry_only(gt_R, gt_t, Rrel, trel):
    Rs, ts = [np.asarray(gt_R[0])], [np.asarray(gt_t[0])]
    for k in range(Rrel.shape[0]):
        Rn, tn = se3.se3_compose(
            jnp.asarray(Rs[-1]), jnp.asarray(ts[-1]), Rrel[k], trel[k]
        )
        Rs.append(np.asarray(Rn))
        ts.append(np.asarray(tn))
    return np.stack(ts)


@pytest.mark.slow
class TestCorridorSlam:
    def test_corridor_reduces_drift(self):
        cfg = SlamConfig(window_size=6, max_landmarks=32, max_det=9,
                         kf_trans=0.3, gn_iters=3)
        world = synthetic.corridor_world()
        gt_R, gt_t = synthetic.corridor_trajectory(N_FRAMES, sway=0.3)
        state, est, (Rrel, trel) = run_sequence(
            world, gt_R, gt_t, cfg, sigma_t=0.02, sigma_r=0.005
        )
        odo = odometry_only(gt_R, gt_t, Rrel, trel)
        ate_odo, _, _ = ate_rmse(np.asarray(gt_t), odo)
        ate_slam, _, _ = ate_rmse(np.asarray(gt_t), est)
        assert ate_slam < ate_odo * 0.7, (ate_odo, ate_slam)
        assert ate_slam < 0.08, ate_slam
        # landmark count should be small: 3 walls + ground (+ maybe a
        # few duplicates from imperfect association)
        n_lm = int(np.asarray(state.window.lm_valid).sum())
        assert 4 <= n_lm <= 10, n_lm

    def test_room_orbit(self):
        cfg = SlamConfig(window_size=6, max_landmarks=32, max_det=9,
                         kf_trans=0.2, kf_rot=0.12, gn_iters=3)
        world = synthetic.room_world()
        gt_R, gt_t = synthetic.orbit_trajectory(N_FRAMES)
        state, est, (Rrel, trel) = run_sequence(
            world, gt_R, gt_t, cfg, sigma_t=0.015, sigma_r=0.004, seed=4
        )
        ate_slam, _, _ = ate_rmse(np.asarray(gt_t), est)
        assert ate_slam < 0.12, ate_slam

    def test_zero_noise_zero_drift(self):
        cfg = SlamConfig(window_size=6, max_landmarks=32, max_det=9,
                         kf_trans=0.3, gn_iters=2)
        world = synthetic.corridor_world()
        gt_R, gt_t = synthetic.corridor_trajectory(N_FRAMES, sway=0.3)
        _, est, _ = run_sequence(world, gt_R, gt_t, cfg,
                                 sigma_t=0.0, sigma_r=0.0)
        err = np.abs(est - np.asarray(gt_t)).max()
        assert err < 1e-2, err
