"""Chunked offline runner == per-frame loop (pipeline/offline.py)."""

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
    run_sequence_chunked,
    slam_init,
    slam_step,
)
from pop_up_slam_tpu.popup import popup as pp

H, W = 96, 128
N = 11  # deliberately not a multiple of the chunk size


@pytest.fixture(scope="module")
def sequence():
    K = Intrinsics.create(64.0, 64.0, 64.0, 48.0)
    world = synthetic.corridor_world()
    Rs, ts = synthetic.corridor_trajectory(N + 1)
    labels, _ = jax.jit(
        jax.vmap(lambda R_, t_: synthetic.render_frame(K, R_, t_, world, H, W))
    )(Rs, ts)
    masks = labels[1:] == synthetic.LABEL_GROUND
    oR, ot = se3.se3_between(Rs[:-1], ts[:-1], Rs[1:], ts[1:])
    return K, Rs, ts, masks, oR, ot


def _cfgs():
    pcfg = pp.PopupConfig(min_cols=4, smooth_radius=2, nms_radius=3)
    scfg = SlamConfig(max_det=pcfg.max_segments + 1, kf_trans=0.05,
                      kf_rot=0.02, window_size=4, max_landmarks=16,
                      gn_iters=2)
    return pcfg, scfg


def test_chunked_matches_per_frame(sequence):
    K, Rs, ts, masks, oR, ot = sequence
    pcfg, scfg = _cfgs()

    # --- per-frame reference loop ---
    @jax.jit
    def step(state, mask, a, b):
        pR, pt = current_pose(state)
        res = pp.pop_up(K, mask, pR, pt, pcfg)
        det = detections_from_popup(res, pR, pt, scfg.max_det)
        return slam_step(state, det, a, b, scfg)

    state = slam_init(scfg, Rs[0], ts[0])
    ref_R, ref_t = [], []
    for i in range(N):
        state, (R, t) = step(state, masks[i], oR[i], ot[i])
        ref_R.append(np.asarray(R))
        ref_t.append(np.asarray(t))

    # --- chunked (chunk=4 over 11 frames: 2 full chunks + tail of 3) ---
    state_c = slam_init(scfg, Rs[0], ts[0])
    state_c, (Rc, tc) = run_sequence_chunked(
        state_c, masks, oR, ot, K, pcfg, scfg, chunk=4, donate=False
    )
    assert Rc.shape == (N, 3, 3) and tc.shape == (N, 3)
    np.testing.assert_allclose(np.asarray(Rc), np.stack(ref_R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), np.stack(ref_t), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state_c.n_kf), np.asarray(state.n_kf)
    )


def test_chunked_poses_follow_trajectory(sequence):
    K, Rs, ts, masks, oR, ot = sequence
    pcfg, scfg = _cfgs()
    state = slam_init(scfg, Rs[0], ts[0])
    _, (Rc, tc) = run_sequence_chunked(
        state, masks, oR, ot, K, pcfg, scfg, chunk=8, donate=False
    )
    # Noise-free odometry: estimates stay finite and near the truth.
    # (At this tiny 96x128 resolution the popped plane fits are coarse,
    # so the BA pulls the pose by a few tens of cm — the exactness
    # guarantee is test_chunked_matches_per_frame; this is a sanity
    # bound.)
    assert np.isfinite(np.asarray(Rc)).all()
    err = np.linalg.norm(np.asarray(tc) - np.asarray(ts[1:]), axis=-1)
    assert float(err.max()) < 1.0, err
