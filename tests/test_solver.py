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


def build_corridor_problem(noise_odom_t=0.0, noise_odom_r=0.0, noise_plane=0.0,
                           seed=0, lm_perturb=0.0):
    """Oracle-associated corridor problem: returns (window_init, factors,
    gt_R, gt_t)."""
    key = jax.random.PRNGKey(seed)
    k_odom, k_obs, k_lm = jax.random.split(key, 3)
    world = synthetic.corridor_world(max_walls=MAXW)
    gt_R, gt_t = synthetic.corridor_trajectory(W, sway=0.3)

    obs_keys = jax.random.split(k_obs, W)
    obs = jax.vmap(
        lambda R, t, k: synthetic.observe_frame(
            world, R, t, key=k, max_det=MAX_DET, noise_plane=noise_plane
        )
    )(gt_R, gt_t, obs_keys)

    # Odometry factors between consecutive poses, whitened by the true
    # noise sigmas (floor at 0.01 to keep zero-noise cases bounded).
    Rrel, trel = synthetic.noisy_odometry(gt_R, gt_t, k_odom,
                                          sigma_t=noise_odom_t,
                                          sigma_r=noise_odom_r)
    st = max(noise_odom_t, 0.01)
    sr = max(noise_odom_r, 0.01)
    odom_sqrt = jnp.diag(jnp.array([1 / st] * 3 + [1 / sr] * 3, jnp.float32))
    odom = OdomFactors.empty(W - 1)._replace(
        i=jnp.arange(W - 1, dtype=jnp.int32),
        j=jnp.arange(1, W, dtype=jnp.int32),
        R_meas=Rrel, t_meas=trel,
        sqrt_info=jnp.broadcast_to(odom_sqrt, (W - 1, 6, 6)),
        valid=jnp.ones((W - 1,), bool),
    )

    # Plane factors with oracle association: wall k -> landmark k,
    # ground -> landmark L-1.
    pose_idx, lm_idx, pis, valid = [], [], [], []
    for f in range(W):
        for d in range(MAX_DET):
            v = bool(obs.valid[f, d])
            wid = int(obs.wall_id[f, d])
            lm = (L - 1) if wid == -2 else wid
            pose_idx.append(f)
            lm_idx.append(max(lm, 0))
            pis.append(np.asarray(obs.planes_c[f, d]))
            valid.append(v and wid != -1)
    sp = max(noise_plane, 0.01)
    pf = PlaneFactors.empty(CAP_PF)._replace(
        pose_idx=jnp.asarray(pose_idx, jnp.int32),
        lm_idx=jnp.asarray(lm_idx, jnp.int32),
        pi_meas=jnp.asarray(np.stack(pis)),
        sqrt_info=jnp.broadcast_to((1 / sp) * jnp.eye(3), (CAP_PF, 3, 3)),
        valid=jnp.asarray(valid),
    )

    # Initialization: integrate noisy odometry from gt pose 0.
    R0, t0 = gt_R[0], gt_t[0]
    Rs, ts = [R0], [t0]
    for k in range(W - 1):
        Rn, tn = se3.se3_compose(Rs[-1], ts[-1], Rrel[k], trel[k])
        Rs.append(Rn)
        ts.append(tn)
    R_init = jnp.stack(Rs)
    t_init = jnp.stack(ts)

    # Landmark init: gt planes (optionally perturbed).
    pis_w = world.planes()
    ground = jnp.array([0.0, 0.0, 1.0, 0.0])
    lms = jnp.concatenate([pis_w, ground[None]], axis=0)
    if lm_perturb > 0:
        lms = plane.retract(lms, lm_perturb * jax.random.normal(k_lm, (L, 3)))
    lm_valid = np.zeros((L,), bool)
    for f in range(W):
        for d in range(MAX_DET):
            if bool(pf.valid[f * MAX_DET + d]):
                lm_valid[int(pf.lm_idx[f * MAX_DET + d])] = True

    window = Window(
        R=R_init, t=t_init, planes=plane.normalize(lms),
        pose_valid=jnp.ones((W,), bool),
        pose_fixed=jnp.arange(W) == 0,
        lm_valid=jnp.asarray(lm_valid),
    )
    factors = Factors(odom=odom, planes=pf, priors=PosePriors.empty(1))
    return window, factors, gt_R, gt_t


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
