"""Full-trajectory smoothing (pipeline/smoothing.py).

The VERDICT-r4 parity gap: the incremental trajectory is
filtering-only — poses freeze when they leave the window.  Smoothing
re-solves the whole keyframe graph, so on a loop-closing orbit (walls
re-observed after drift accumulates) the smoothed ATE must beat the
incremental ATE.  Also: mesh-sharded smoothing (keyframe blocks, the
SP analog) must match the single-device batch solve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pop_up_slam_tpu.evaluation import ate_rmse
from pop_up_slam_tpu.io import synthetic
from pop_up_slam_tpu.pipeline import (
    FrameDetections,
    SlamConfig,
    slam_init,
    slam_step,
)
from pop_up_slam_tpu.pipeline.smoothing import (
    TrajectoryRecorder,
    emit_frames,
    smooth_trajectory,
)

slow = pytest.mark.slow

N_FRAMES = 120


def _run_with_recorder(cfg, sigma_t=0.05, sigma_r=0.012,
                       noise_plane=0.01, seed=5):
    world = synthetic.room_world()
    gt_R, gt_t = synthetic.orbit_trajectory(N_FRAMES)
    key = jax.random.PRNGKey(seed)
    k_odom, k_obs = jax.random.split(key)
    Rrel, trel = synthetic.noisy_odometry(
        gt_R, gt_t, k_odom, sigma_t=sigma_t, sigma_r=sigma_r
    )
    obs = jax.vmap(
        lambda R, t, k: synthetic.observe_frame(
            world, R, t, key=k, max_det=cfg.max_det,
            noise_plane=noise_plane,
        )
    )(gt_R, gt_t, jax.random.split(k_obs, N_FRAMES))

    state = slam_init(cfg, gt_R[0], gt_t[0])
    rec = TrajectoryRecorder(cfg, gt_R[0], gt_t[0])
    step = jax.jit(lambda s, d, oR, ot: slam_step(s, d, oR, ot, cfg))
    est_t = [np.asarray(gt_t[0])]
    for i in range(1, N_FRAMES):
        det = FrameDetections(
            planes_c=obs.planes_c[i], centroid_c=obs.centroid_c[i],
            endpoints_c=obs.endpoints_c[i], valid=obs.valid[i],
        )
        state, (R, t) = step(state, det, Rrel[i - 1], trel[i - 1])
        rec.record(state)
        est_t.append(np.asarray(t))
    return state, rec, np.asarray(gt_t), np.stack(est_t)


def _cfg():
    return SlamConfig(window_size=6, max_landmarks=48, max_det=9,
                      kf_trans=0.2, kf_rot=0.12, gn_iters=3)


@pytest.fixture(scope="module")
def orbit_run():
    return _run_with_recorder(_cfg())


def test_recorder_consistency(orbit_run):
    state, rec, gt_t, est_t = orbit_run
    assert rec.n_kf == int(state.n_kf)
    assert len(rec.kf_R) == rec.n_kf
    assert len(rec.odom_R) == rec.n_kf - 1
    assert len(rec.frame_kf) == N_FRAMES - 1
    # re-emitting frames off the *unsmoothed* keyframes must reproduce
    # the filtering trajectory for the frames still anchored to the
    # current window (the recorder refreshes those)
    fR, ft = emit_frames(rec, np.stack(rec.kf_R), np.stack(rec.kf_t))
    np.testing.assert_allclose(ft[-1], est_t[-1], atol=1e-4)


def test_recorder_snapshot_roundtrip(orbit_run):
    _, rec, _, _ = orbit_run
    snap = rec.snapshot()
    rec2 = TrajectoryRecorder.restore(_cfg(), snap)
    assert rec2.n_kf == rec.n_kf
    np.testing.assert_array_equal(np.stack(rec2.kf_R), np.stack(rec.kf_R))
    np.testing.assert_array_equal(
        np.asarray(rec2.frame_kf), np.asarray(rec.frame_kf)
    )
    fR1, ft1 = emit_frames(rec, np.stack(rec.kf_R), np.stack(rec.kf_t))
    fR2, ft2 = emit_frames(rec2, np.stack(rec2.kf_R), np.stack(rec2.kf_t))
    np.testing.assert_allclose(ft2, ft1, atol=0)


def test_smoothing_beats_filtering(orbit_run):
    state, rec, gt_t, est_t = orbit_run
    ate_filter, _, _ = ate_rmse(gt_t, est_t)

    kf_R, kf_t, stats = smooth_trajectory(rec, state, _cfg(), iters=8)
    fR, ft = emit_frames(rec, kf_R, kf_t)
    ft = np.concatenate([est_t[:1], ft], axis=0)
    ate_smooth, _, _ = ate_rmse(gt_t, ft)

    costs = np.asarray(stats.cost_history)
    assert costs[-1] <= costs[0] * 1.001
    # the whole point: later corrections reach the early history.
    # On this drift-dominated orbit (full revolution, walls out of
    # view for ~20 keyframes between observations) the measured gain
    # is ~20% (0.223 -> 0.177); gate at 5% for seed robustness.
    assert ate_smooth < ate_filter * 0.95, (ate_filter, ate_smooth)


@slow
def test_smoothing_mesh_matches_single_device(orbit_run):
    from jax.sharding import Mesh

    state, rec, _, _ = orbit_run
    kf_R1, kf_t1, _ = smooth_trajectory(rec, state, _cfg(), iters=4)
    mesh = Mesh(np.array(jax.devices()[:4]), ("d",))
    kf_R2, kf_t2, _ = smooth_trajectory(
        rec, state, _cfg(), iters=4, mesh=mesh
    )
    np.testing.assert_allclose(kf_t2, kf_t1, atol=5e-4)
    np.testing.assert_allclose(kf_R2, kf_R1, atol=5e-4)
