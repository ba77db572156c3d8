"""Fully monocular pipeline: mask -> pop-up -> plane VO -> SLAM.

No ground-truth odometry is consumed anywhere; the relative motion
measurements come from frame-to-frame plane alignment.  This is the
TPU-native answer to the reference's reliance on external odometry /
LSD-SLAM pose priors (paper §V; SURVEY.md §7 hard part #3).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pop_up_slam_tpu.evaluation import ate_rmse
from pop_up_slam_tpu.geometry.camera import Intrinsics
from pop_up_slam_tpu.io import synthetic
from pop_up_slam_tpu.pipeline import (
    SlamConfig,
    make_chunked_vo_runner,
    make_vo_frame_fn,
    slam_init,
    vo_init,
)
from pop_up_slam_tpu.popup import popup as pp

H, W = 240, 320


def _setup(n):
    K = Intrinsics.create(160.0, 160.0, 160.0, 120.0)
    world = synthetic.corridor_world()
    Rs, ts = synthetic.corridor_trajectory(n)
    labels = jax.jit(jax.vmap(
        lambda R_, t_: synthetic.render_frame(K, R_, t_, world, H, W)[0]
    ))(Rs, ts)
    masks = labels == synthetic.LABEL_GROUND
    return K, Rs, ts, masks


class TestMonocularPipeline:
    def test_corridor_ate(self):
        n = 32
        K, Rs, ts, masks = _setup(n)
        pcfg = pp.PopupConfig()
        scfg = SlamConfig(max_det=pcfg.max_segments + 1,
                          kf_trans=0.05, kf_rot=0.05)
        vs = vo_init(slam_init(scfg, Rs[0], ts[0]), scfg.max_det)
        run = make_chunked_vo_runner(K, pcfg, scfg, donate=False)
        est_t = [np.asarray(ts[0])]
        for c in range(1, n, 8):  # chunks of 8 frames
            vs, (R, t) = run(vs, masks[c:c + 8])
            est_t.extend(np.asarray(t))
        est = np.stack(est_t)
        ate, _, _ = ate_rmse(np.asarray(ts[:len(est)]), est)
        assert ate < 0.15, ate

    def test_chunked_matches_per_frame(self):
        n = 9
        K, Rs, ts, masks = _setup(n)
        pcfg = pp.PopupConfig()
        scfg = SlamConfig(max_det=pcfg.max_segments + 1,
                          kf_trans=0.05, kf_rot=0.05)

        frame = jax.jit(make_vo_frame_fn(K, pcfg, scfg))
        vs = vo_init(slam_init(scfg, Rs[0], ts[0]), scfg.max_det)
        ref = []
        for k in range(1, n):
            vs, (R, t) = frame(vs, masks[k])
            ref.append(np.asarray(t))

        vs2 = vo_init(slam_init(scfg, Rs[0], ts[0]), scfg.max_det)
        run = make_chunked_vo_runner(K, pcfg, scfg, donate=False)
        vs2, (Rc, tc) = run(vs2, masks[1:n])
        np.testing.assert_allclose(np.asarray(tc), np.stack(ref),
                                   rtol=0, atol=1e-5)
