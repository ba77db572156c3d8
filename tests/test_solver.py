"""Factor-graph + Schur solver tests (SURVEY.md §4 items 1-2).

- residual conventions (zero at ground truth),
- Schur solve == dense full solve on a random system,
- synthetic corridor: ATE -> 0 under zero noise, improves under noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pop_up_slam_tpu.geometry import se3, plane
from pop_up_slam_tpu.factors import (
    Window, OdomFactors, PlaneFactors, PosePriors,
    odom_residual, plane_residual, linearize, total_cost,
)
from pop_up_slam_tpu.factors.graph import Factors
from pop_up_slam_tpu.solver import solve_schur, solve_dense, gn_solve, lm_solve, inv3x3
from pop_up_slam_tpu.io import synthetic
from pop_up_slam_tpu.evaluation import ate_rmse

W = 6          # window size
MAXW = 8       # max walls in the synthetic world
L = MAXW + 1   # landmark slots (walls + ground)
MAX_DET = 6
CAP_PF = W * MAX_DET


from pop_up_slam_tpu.io.problems import (
    build_corridor_problem as _build_corridor_problem,
)


def build_corridor_problem(noise_odom_t=0.0, noise_odom_r=0.0, noise_plane=0.0,
                           seed=0, lm_perturb=0.0):
    """Oracle-associated corridor problem at this module's sizes.

    The implementation lives in pop_up_slam_tpu.io.problems (shared
    with __graft_entry__ / scripts); this wrapper pins the historical
    test-suite dimensions."""
    return _build_corridor_problem(
        noise_odom_t=noise_odom_t, noise_odom_r=noise_odom_r,
        noise_plane=noise_plane, seed=seed, lm_perturb=lm_perturb,
        window=W, max_walls=MAXW, max_det=MAX_DET,
    )


class TestResiduals:
    def test_odom_zero_at_truth(self):
        xi_a = jnp.array([0.1, 0.2, 0.3, 0.1, -0.2, 0.3])
        xi_b = jnp.array([-0.5, 1.0, 0.2, 0.4, 0.1, -0.6])
        Ra, ta = se3.se3_exp(xi_a)
        Rb, tb = se3.se3_exp(xi_b)
        Rm, tm = se3.se3_between(Ra, ta, Rb, tb)
        r = odom_residual(Ra, ta, Rb, tb, Rm, tm, jnp.eye(6))
        np.testing.assert_allclose(r, jnp.zeros(6), atol=1e-5)

    def test_plane_zero_at_truth(self):
        xi = jnp.array([0.5, -0.2, 1.0, 0.3, -1.2, 0.8])
        R_wc, t_wc = se3.se3_exp(xi)
        pi_w = plane.normalize(jnp.array([0.1, 0.9, -0.3, 2.0]))
        R_cw, t_cw = se3.se3_inverse(R_wc, t_wc)
        pi_c = plane.transform(pi_w, R_cw, t_cw)
        r = plane_residual(R_wc, t_wc, pi_w, pi_c, jnp.eye(3))
        np.testing.assert_allclose(r, jnp.zeros(3), atol=1e-5)

    def test_plane_residual_antipodal_measurement(self):
        xi = jnp.array([0.5, -0.2, 1.0, 0.3, -1.2, 0.8])
        R_wc, t_wc = se3.se3_exp(xi)
        pi_w = plane.normalize(jnp.array([0.1, 0.9, -0.3, 2.0]))
        R_cw, t_cw = se3.se3_inverse(R_wc, t_wc)
        pi_c = plane.transform(pi_w, R_cw, t_cw)
        r = plane_residual(R_wc, t_wc, pi_w, -pi_c, jnp.eye(3))
        np.testing.assert_allclose(r, jnp.zeros(3), atol=1e-5)


class TestSchur:
    def test_schur_matches_dense(self):
        window, factors, _, _ = build_corridor_problem(
            noise_odom_t=0.05, noise_odom_r=0.02, noise_plane=0.02, lm_perturb=0.05
        )
        lin = linearize(window, factors)
        sol = solve_schur(lin, window, damping=1e-5)
        dxp_d, dxl_d = solve_dense(lin, window, damping=1e-5)
        # f32 steps are O(1); a whitened system with 1/sigma = 100 rows
        # resolves to ~1e-3 at best through two different solve paths.
        np.testing.assert_allclose(sol.dxp, dxp_d, atol=5e-3)
        np.testing.assert_allclose(sol.dxl, dxl_d, atol=5e-3)

    def test_inv3x3(self):
        key = jax.random.PRNGKey(3)
        A = jax.random.normal(key, (32, 3, 3))
        A = A @ jnp.swapaxes(A, -1, -2) + 0.5 * jnp.eye(3)
        Ainv = inv3x3(A)
        eye = jnp.broadcast_to(jnp.eye(3), A.shape)
        np.testing.assert_allclose(A @ Ainv, eye, atol=1e-4)


class TestCorridor:
    def test_zero_noise_stays_at_truth(self):
        window, factors, gt_R, gt_t = build_corridor_problem()
        w2, stats = gn_solve(window, factors, iters=3)
        err_t = np.abs(np.asarray(w2.t - gt_t)).max()
        assert err_t < 1e-3, f"drifted {err_t}"
        assert float(stats.cost_history[-1]) < 1e-6

    def test_noisy_odometry_corrected_by_planes(self):
        window, factors, gt_R, gt_t = build_corridor_problem(
            noise_odom_t=0.05, noise_odom_r=0.02, seed=1
        )
        ate_init, _, _ = ate_rmse(np.asarray(gt_t), np.asarray(window.t))
        w2, stats = gn_solve(window, factors, iters=5, damping=1e-6)
        ate_opt, _, _ = ate_rmse(np.asarray(gt_t), np.asarray(w2.t))
        # plane observations are noiseless -> optimization should pull the
        # trajectory well below the odometry-only error
        assert ate_opt < ate_init * 0.5, (ate_init, ate_opt)
        assert ate_opt < 0.02, ate_opt
        costs = np.asarray(stats.cost_history)
        assert costs[-1] < costs[0]

    def test_lm_matches_gn_on_easy_problem(self):
        window, factors, gt_R, gt_t = build_corridor_problem(
            noise_odom_t=0.05, noise_odom_r=0.02, seed=2
        )
        w_lm, stats = lm_solve(window, factors, iters=8)
        ate_lm, _, _ = ate_rmse(np.asarray(gt_t), np.asarray(w_lm.t))
        assert ate_lm < 0.02, ate_lm
        assert bool(stats.accepted.any())

    def test_jit_compiles_once_and_reruns(self):
        window, factors, _, _ = build_corridor_problem(seed=3)
        solver = jax.jit(lambda w, f: gn_solve(w, f, iters=2)[0])
        w1 = solver(window, factors)
        w2 = solver(w1, factors)
        assert np.isfinite(np.asarray(w2.t)).all()


class TestAnalyticPoseTerms:
    """Closed-form SE(3) between/prior Jacobians (round-4:
    geometry/se3.se3_right_jacobian_inv + adjoint) == jacfwd."""

    def test_odom_terms_match_jacfwd(self):
        from pop_up_slam_tpu.factors.graph import (
            _odom_terms, _odom_terms_analytic,
        )

        window, factors, _, _ = build_corridor_problem(
            noise_odom_t=0.05, noise_odom_r=0.02
        )
        r_a, Ji_a, Jj_a = _odom_terms_analytic(window, factors.odom)
        r_j, Ji_j, Jj_j = _odom_terms(window, factors.odom)
        np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_j),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(Ji_a), np.asarray(Ji_j),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(Jj_a), np.asarray(Jj_j),
                                   atol=2e-4)

    def test_prior_terms_match_jacfwd(self):
        from pop_up_slam_tpu.factors.graph import (
            _prior_terms, _prior_terms_analytic,
        )

        window, _, gt_R, gt_t = build_corridor_problem(noise_odom_t=0.05)
        priors = PosePriors(
            idx=jnp.array([0, 2], jnp.int32),
            R=gt_R[:2],
            t=gt_t[:2] + 0.1,
            sqrt_info=jnp.broadcast_to(10.0 * jnp.eye(6), (2, 6, 6)),
            valid=jnp.array([True, True]),
        )
        r_a, J_a = _prior_terms_analytic(window, priors)
        r_j, J_j = _prior_terms(window, priors)
        np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_j),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(J_a), np.asarray(J_j),
                                   atol=2e-4)

    def test_linearize_analytic_poses_matches(self):
        window, factors, _, _ = build_corridor_problem(
            noise_odom_t=0.05, noise_odom_r=0.02, noise_plane=0.02
        )
        lin_a = linearize(window, factors, analytic_poses=True)
        lin_j = linearize(window, factors, analytic_poses=False)
        for name in lin_a._fields:
            a, b = np.asarray(getattr(lin_a, name)), np.asarray(
                getattr(lin_j, name))
            np.testing.assert_allclose(
                a, b, rtol=1e-4, atol=2e-3, err_msg=name
            )
