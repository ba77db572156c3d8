"""Fused GN kernel (ops/fused_gn.py) vs the reference gn_solve path.

The fused body must reproduce ``gn_solve(analytic_planes=True)`` —
same linearization, Schur elimination, gauge masking, sanitization and
retractions — to f32 tolerance, in three regimes:

- gauge by a fixed pose (the corridor problem's convention),
- gauge by a strong pose prior (the production marginalize-mode
  convention, exercising the prior-factor lane),
- IRLS robust kernels on.

The pure-jnp body IS the Pallas kernel body, so these CPU tests cover
the kernel's math; the Pallas lowering itself is additionally checked
in interpret mode on a small case, and on real TPU by the bench.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pop_up_slam_tpu.factors.graph import PosePriors
from pop_up_slam_tpu.factors.robust import RobustConfig, RobustKernel
from pop_up_slam_tpu.io.problems import build_corridor_problem
from pop_up_slam_tpu.ops.fused_gn import fused_gn_solve, fused_gn_supported
from pop_up_slam_tpu.solver import gn_solve

slow = pytest.mark.slow


def _problem(prior_gauge=False):
    window, factors, gt_R, gt_t = build_corridor_problem(
        noise_odom_t=0.05, noise_odom_r=0.02, noise_plane=0.02,
        lm_perturb=0.05, seed=3,
    )
    if prior_gauge:
        # production convention: slot 0 free, anchored by a strong prior
        window = window._replace(
            pose_fixed=jnp.zeros_like(window.pose_fixed)
        )
        pr = PosePriors(
            idx=jnp.zeros((1,), jnp.int32),
            R=window.R[0][None],
            t=window.t[0][None],
            sqrt_info=(1e2 * jnp.eye(6))[None],
            valid=jnp.ones((1,), bool),
        )
        factors = factors._replace(priors=pr)
    return window, factors


def _compare(window, factors, robust=None, iters=3, atol=5e-3):
    w_ref, stats = gn_solve(
        window, factors, iters=iters, damping=1e-5,
        analytic_planes=True, robust=robust,
    )
    w_fus, costs = fused_gn_solve(
        window, factors, iters=iters, damping=1e-5,
        robust=robust, use_pallas=False,
    )
    np.testing.assert_allclose(w_fus.t, w_ref.t, atol=atol)
    np.testing.assert_allclose(w_fus.R, w_ref.R, atol=atol)
    np.testing.assert_allclose(w_fus.planes, w_ref.planes, atol=atol)
    # cost series: same objective at each linearization point
    np.testing.assert_allclose(
        costs, stats.cost_history[:iters], rtol=5e-3, atol=1e-2
    )
    return w_fus


def test_supported_shapes():
    assert fused_gn_supported(8, 64, 72, 7, 1)     # production window
    assert fused_gn_supported(6, 9, 36, 5, 1)      # corridor tests
    assert not fused_gn_supported(32, 64, 72, 7, 1)   # 6W > 128
    assert not fused_gn_supported(8, 128, 72, 7, 1)   # 3L > 256


def test_fused_matches_gn_fixed_gauge():
    window, factors = _problem(prior_gauge=False)
    _compare(window, factors)


def test_fused_matches_gn_prior_gauge():
    window, factors = _problem(prior_gauge=True)
    _compare(window, factors)


def test_fused_matches_gn_robust():
    window, factors = _problem(prior_gauge=True)
    robust = RobustConfig(
        odom=RobustKernel("huber", 2.0),
        plane=RobustKernel("cauchy", 3.0),
        prior=RobustKernel("none", 1.0),
    )
    _compare(window, factors, robust=robust)


def test_fused_descends():
    window, factors = _problem(prior_gauge=True)
    _, costs = fused_gn_solve(
        window, factors, iters=4, damping=1e-5, use_pallas=False
    )
    costs = np.asarray(costs)
    assert costs[-1] < costs[0]


def test_slam_step_fused_matches_reference():
    """Full slam_step trajectories with the fused BA vs the per-op GN
    path (fused='on' runs the identical pure-jnp kernel body on CPU)."""
    from pop_up_slam_tpu.io import synthetic
    from pop_up_slam_tpu.pipeline import (
        FrameDetections, SlamConfig, slam_init, slam_step,
    )

    def run(cfg):
        world = synthetic.corridor_world()
        gt_R, gt_t = synthetic.corridor_trajectory(16, sway=0.3)
        key = jax.random.PRNGKey(0)
        k_odom, k_obs = jax.random.split(key)
        Rrel, trel = synthetic.noisy_odometry(
            gt_R, gt_t, k_odom, sigma_t=0.02, sigma_r=0.005
        )
        obs = jax.vmap(
            lambda R, t, k: synthetic.observe_frame(
                world, R, t, key=k, max_det=cfg.max_det
            )
        )(gt_R, gt_t, jax.random.split(k_obs, 16))
        state = slam_init(cfg, gt_R[0], gt_t[0])
        step = jax.jit(lambda s, d, oR, ot: slam_step(s, d, oR, ot, cfg))
        ts = []
        for i in range(1, 16):
            det = FrameDetections(
                planes_c=obs.planes_c[i], centroid_c=obs.centroid_c[i],
                endpoints_c=obs.endpoints_c[i], valid=obs.valid[i],
            )
            state, (R, t) = step(state, det, Rrel[i - 1], trel[i - 1])
            ts.append(np.asarray(t))
        return np.stack(ts)

    base = dict(window_size=4, max_landmarks=16, max_det=5,
                kf_trans=0.2, gn_iters=2)
    t_ref = run(SlamConfig(fused="off", **base))
    t_fus = run(SlamConfig(fused="on", **base))
    # identical pipeline, only the BA implementation differs: the two
    # trajectories must agree to solver fp tolerance
    np.testing.assert_allclose(t_fus, t_ref, atol=5e-3)


@slow
def test_fused_pallas_interpret_matches_body():
    window, factors = _problem(prior_gauge=True)
    w_body, c_body = fused_gn_solve(
        window, factors, iters=1, damping=1e-5, use_pallas=False
    )
    w_pal, c_pal = fused_gn_solve(
        window, factors, iters=1, damping=1e-5,
        use_pallas=True, interpret=True,
    )
    # interpret mode reassociates the MXU accumulations -> ~1e-5-level
    # f32 noise on O(1) quantities
    np.testing.assert_allclose(w_pal.t, w_body.t, atol=2e-4)
    np.testing.assert_allclose(w_pal.R, w_body.R, atol=2e-5)
    np.testing.assert_allclose(w_pal.planes, w_body.planes, atol=2e-5)
    np.testing.assert_allclose(c_pal, c_body, rtol=1e-4)
