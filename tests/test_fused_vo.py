"""Depth fusion in the monocular pipeline (paper §V analog; VERDICT
round-2 item 7): the per-pixel inverse-depth filter is wired into the
plane-VO frame loop — popped-up plane depth is fused each frame and
forward-warped through the estimated motion.
"""

import jax
import numpy as np
import pytest

from pop_up_slam_tpu.geometry.camera import Intrinsics
from pop_up_slam_tpu.io import synthetic
from pop_up_slam_tpu.pipeline import (
    SlamConfig,
    fused_vo_init,
    make_chunked_fused_vo_runner,
    slam_init,
)
from pop_up_slam_tpu.popup import popup as pp

H, W = 120, 160


@pytest.fixture(scope="module")
def corridor():
    n = 10
    K = Intrinsics.create(80.0, 80.0, 80.0, 60.0)
    world = synthetic.corridor_world()
    Rs, ts = synthetic.corridor_trajectory(n)
    labels, depth_gt = jax.jit(jax.vmap(
        lambda R_, t_: synthetic.render_frame(K, R_, t_, world, H, W)
    ))(Rs, ts)
    masks = labels == synthetic.LABEL_GROUND
    return K, Rs, ts, masks, np.asarray(depth_gt)


def test_fused_depth_tracks_groundtruth(corridor):
    """Running the fused pipeline yields dense depth whose error against
    the rendered ground truth is small where the filter is valid, and
    the filter accumulates coverage over frames."""
    K, Rs, ts, masks, depth_gt = corridor
    pcfg = pp.PopupConfig(min_cols=6, smooth_radius=2, nms_radius=4)
    scfg = SlamConfig(max_det=pcfg.max_segments + 1,
                      kf_trans=0.05, kf_rot=0.05,
                      window_size=4, max_landmarks=32, gn_iters=2)
    fs = fused_vo_init(slam_init(scfg, Rs[0], ts[0]), scfg.max_det, H, W)
    run = make_chunked_fused_vo_runner(K, pcfg, scfg, donate=False)
    fs, ((R, t), fused) = run(fs, masks[1:])
    fused = np.asarray(fused)
    valid = np.asarray(fs.filt.valid)
    assert np.isfinite(fused).all()
    # filter must actually have fused something by the last frame
    assert valid.mean() > 0.3, valid.mean()

    gt_last = depth_gt[-1]
    near = (gt_last < 12.0) & valid
    rel = np.abs(fused[-1][near] - gt_last[near]) / gt_last[near]
    assert np.median(rel) < 0.15, np.median(rel)


def test_fusion_reduces_noise_vs_single_frame(corridor):
    """Temporal fusion of several noisy plane-depth observations must not
    be worse than the last single-frame observation alone (Bayesian
    product shrinks variance; the gate rejects gross outliers)."""
    K, Rs, ts, masks, depth_gt = corridor
    from pop_up_slam_tpu.fusion import fuse_observation, init_from_popup

    rng = np.random.default_rng(0)
    gt = depth_gt[-1]
    flt = init_from_popup(
        jax.numpy.asarray(gt * (1 + 0.05 * rng.normal(size=gt.shape)))
    )
    for _ in range(6):
        obs = init_from_popup(
            jax.numpy.asarray(gt * (1 + 0.05 * rng.normal(size=gt.shape)))
        )
        flt = fuse_observation(flt, obs.inv_mu, obs.var)
    fused_depth = 1.0 / np.clip(np.asarray(flt.inv_mu), 1e-3, None)
    single = gt * (1 + 0.05 * rng.normal(size=gt.shape))
    m = (gt < 12.0) & np.asarray(flt.valid)
    err_fused = np.abs(fused_depth[m] - gt[m]) / gt[m]
    err_single = np.abs(single[m] - gt[m]) / gt[m]
    assert np.median(err_fused) < np.median(err_single), (
        np.median(err_fused), np.median(err_single))
