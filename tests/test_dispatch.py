"""Production dispatch of the Pallas kernels (VERDICT round-2 item 2).

The BASELINE north-star names the Schur-GEMM, fused-Cholesky, analytic
plane-Jacobian and depth-render kernels as *the* TPU-native compute
path; these tests pin down that the production configuration actually
selects them (on TPU backends) and that forcing them on (interpret
mode on CPU) is numerically equivalent to the jnp reference inside the
real ``slam_step``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pop_up_slam_tpu.popup import popup as pp
from pop_up_slam_tpu.solver.schur import make_solve_fn, solve_schur


def test_make_solve_fn_dispatch():
    from pop_up_slam_tpu.ops.schur_pallas import schur_reduce_pallas

    assert make_solve_fn("off") is solve_schur
    assert make_solve_fn("on") is schur_reduce_pallas
    # this suite runs on CPU: auto must pick the jnp path here and the
    # Pallas path iff the backend is TPU
    expected = (
        schur_reduce_pallas
        if jax.default_backend() == "tpu" else solve_schur
    )
    assert make_solve_fn("auto") is expected
    with pytest.raises(ValueError):
        make_solve_fn("yes")


def test_default_config_uses_analytic_and_auto():
    from pop_up_slam_tpu.pipeline.slam import SlamConfig

    cfg = SlamConfig()
    assert cfg.analytic_planes is True
    assert cfg.pallas == "auto"
    assert cfg.marginalize is True


def test_slam_step_pallas_on_matches_off():
    """One keyframe update through the full engine with the Pallas
    reduced-system solver forced on (interpret mode on CPU) must match
    the jnp solver to fp tolerance."""
    from pop_up_slam_tpu.io import synthetic
    from pop_up_slam_tpu.pipeline import (
        FrameDetections, slam_init, slam_step,
    )
    from pop_up_slam_tpu.pipeline.slam import SlamConfig

    world = synthetic.corridor_world()
    gt_R, gt_t = synthetic.corridor_trajectory(6, sway=0.3)
    Rrel, trel = synthetic.noisy_odometry(
        gt_R, gt_t, jax.random.PRNGKey(0), sigma_t=0.02, sigma_r=0.005
    )
    keys = jax.random.split(jax.random.PRNGKey(1), 6)
    obs = jax.vmap(
        lambda R, t, k: synthetic.observe_frame(
            world, R, t, key=k, max_det=5
        )
    )(gt_R, gt_t, keys)

    outs = {}
    for mode in ("on", "off"):
        scfg = SlamConfig(window_size=4, max_landmarks=16, max_det=5,
                          kf_trans=0.0, kf_rot=0.0, gn_iters=2,
                          pallas=mode)
        state = slam_init(scfg, gt_R[0], gt_t[0])
        traj = []
        for i in range(1, 6):
            det = FrameDetections(obs.planes_c[i], obs.centroid_c[i],
                                  obs.endpoints_c[i], obs.valid[i])
            state, (R, t) = slam_step(state, det, Rrel[i - 1],
                                      trel[i - 1], scfg)
            traj.append(np.asarray(t))
        outs[mode] = np.stack(traj)
    np.testing.assert_allclose(outs["on"], outs["off"], atol=5e-4)


def test_render_depth_dispatch_equivalence(no_debug_nans):
    """render_depth(pallas='on') (interpret mode here) == the jnp path.

    The kernel's masked invalid-wall lanes produce intermediate NaNs
    that never reach the output (verified bit-identical to the jnp
    path); the NaN checker flags intermediates under interpret mode,
    hence the opt-out fixture."""
    from pop_up_slam_tpu.geometry.camera import Intrinsics
    from pop_up_slam_tpu.io import synthetic

    H, W = 48, 64
    K = Intrinsics.create(32.0, 32.0, 32.0, 24.0)
    world = synthetic.corridor_world()
    Rs, ts = synthetic.corridor_trajectory(2)
    labels, _ = synthetic.render_frame(K, Rs[1], ts[1], world, H, W)
    mask = labels == synthetic.LABEL_GROUND
    pcfg = pp.PopupConfig(min_cols=4, smooth_radius=2, nms_radius=3)
    res = pp.pop_up(K, mask, Rs[1], ts[1], pcfg)

    d_off = pp.render_depth(K, res, mask, Rs[1], ts[1], pallas="off")
    d_on = pp.render_depth(K, res, mask, Rs[1], ts[1], pallas="on")
    np.testing.assert_allclose(np.asarray(d_on), np.asarray(d_off),
                               rtol=1e-4, atol=1e-3)
    with pytest.raises(ValueError):
        pp.render_depth(K, res, mask, Rs[1], ts[1], pallas="maybe")
