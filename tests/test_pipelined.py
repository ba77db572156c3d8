"""Pipelined front/back-end execution (PP analog, SURVEY.md §2.2):
non-stale mode must be bit-identical to the sequential loop; stale
(overlapped) mode must stay accurate; two-device placement must work."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pop_up_slam_tpu.geometry import se3
from pop_up_slam_tpu.geometry.camera import Intrinsics
from pop_up_slam_tpu.io import synthetic
from pop_up_slam_tpu.pipeline import (
    SlamConfig,
    current_pose,
    detections_from_popup,
    run_pipelined,
    slam_init,
    slam_step,
)
from pop_up_slam_tpu.popup import popup as pp
from pop_up_slam_tpu.evaluation import ate_rmse

H, W = 96, 128
N = 10


@pytest.fixture(scope="module")
def scene():
    K = Intrinsics.create(64.0, 64.0, 64.0, 48.0)
    pcfg = pp.PopupConfig(min_cols=6, smooth_radius=3, nms_radius=5)
    scfg = SlamConfig(max_det=pcfg.max_segments + 1, kf_trans=0.05,
                      kf_rot=0.05)
    world = synthetic.corridor_world()
    Rs, ts = synthetic.corridor_trajectory(N + 1, sway=0.2)
    labels, _ = jax.jit(jax.vmap(
        lambda R_, t_: synthetic.render_frame(K, R_, t_, world, H, W)
    ))(Rs, ts)
    masks = labels == synthetic.LABEL_GROUND
    oR, ot = se3.se3_between(Rs[:-1], ts[:-1], Rs[1:], ts[1:])
    return K, pcfg, scfg, Rs, ts, masks, oR, ot


def _sequential(scene):
    K, pcfg, scfg, Rs, ts, masks, oR, ot = scene
    state = slam_init(scfg, Rs[0], ts[0])

    @jax.jit
    def step(state, mask, odom_R, odom_t):
        pred_R, pred_t = current_pose(state)
        res = pp.pop_up(K, mask, pred_R, pred_t, pcfg)
        det = detections_from_popup(res, pred_R, pred_t, scfg.max_det)
        return slam_step(state, det, odom_R, odom_t, scfg)

    poses = []
    for i in range(N):
        state, (R, t) = step(state, masks[i + 1], oR[i], ot[i])
        poses.append(np.asarray(t))
    return np.stack(poses)


def _pipelined(scene, stale, fe_device=None, be_device=None):
    K, pcfg, scfg, Rs, ts, masks, oR, ot = scene
    state = slam_init(scfg, Rs[0], ts[0])
    frames = ((masks[i + 1], oR[i], ot[i]) for i in range(N))
    out = [
        np.asarray(t) for (_, t) in run_pipelined(
            state, frames, K, pcfg, scfg,
            fe_device=fe_device, be_device=be_device,
            stale_prediction=stale,
        )
    ]
    return np.stack(out)


def test_non_stale_matches_sequential(scene):
    seq = _sequential(scene)
    pipe = _pipelined(scene, stale=False)
    np.testing.assert_allclose(pipe, seq, atol=1e-5)


def test_stale_overlapped_stays_accurate(scene):
    _, _, _, Rs, ts, _, _, _ = scene
    gt = np.asarray(ts[1:])
    seq = _sequential(scene)
    pipe = _pipelined(scene, stale=True)
    ate_seq, _, _ = ate_rmse(gt, seq)
    ate_pipe, _, _ = ate_rmse(gt, pipe)
    assert np.isfinite(pipe).all()
    # The stale prediction may differ slightly but must not blow up.
    assert ate_pipe < max(2.0 * ate_seq, 0.05), (ate_seq, ate_pipe)


def test_two_device_placement(scene):
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    d0, d1 = jax.devices()[:2]
    seq = _sequential(scene)
    pipe = _pipelined(scene, stale=False, fe_device=d0, be_device=d1)
    np.testing.assert_allclose(pipe, seq, atol=1e-5)
