"""Solver extensions: robust kernels, Powell's dog-leg, covariance
recovery — the remaining iSAM-backend parity surface (SURVEY.md §2.1
"Vendored iSAM library": GN/LM/dog-leg batch solves, covariance
recovery, robust cost support)."""

import jax
import jax.numpy as jnp
import numpy as np

from pop_up_slam_tpu.factors import (
    RobustConfig,
    RobustKernel,
    linearize,
    total_cost,
)
from pop_up_slam_tpu.factors.robust import apply_weights, irls_weight, rho
from pop_up_slam_tpu.solver import (
    dogleg_solve,
    gn_solve,
    recover_marginals,
    solve_dense,
)
from pop_up_slam_tpu.evaluation import ate_rmse

from test_solver import build_corridor_problem


class TestRobustKernels:
    def test_none_is_identity(self):
        r = jnp.array([[0.5, -1.0, 2.0]])
        J = jnp.ones((1, 3, 6))
        rw, Jw, rho_s = apply_weights(RobustKernel("none"), r, J)
        np.testing.assert_allclose(rw, r)
        np.testing.assert_allclose(Jw, J)
        np.testing.assert_allclose(rho_s, jnp.sum(r * r, -1))

    def test_huber_weights(self):
        k = 1.0
        ker = RobustKernel("huber", k)
        s = jnp.array([0.25, 4.0])  # norms 0.5 (inlier), 2.0 (outlier)
        w = irls_weight(ker, s)
        np.testing.assert_allclose(w, [1.0, 0.5], atol=1e-6)
        # rho: quadratic inside, 2k|r| - k^2 outside
        np.testing.assert_allclose(rho(ker, s), [0.25, 3.0], atol=1e-6)

    def test_cauchy_weights(self):
        ker = RobustKernel("cauchy", 1.0)
        s = jnp.array([0.0, 1.0, 100.0])
        np.testing.assert_allclose(
            irls_weight(ker, s), [1.0, 0.5, 1 / 101.0], atol=1e-6
        )

    def test_zero_residual_padding_safe(self):
        """Masked (all-zero) factors must not produce NaN under any kernel."""
        r = jnp.zeros((4, 6))
        J = jnp.zeros((4, 6, 6))
        for kind in ("none", "huber", "cauchy"):
            rw, Jw, rho_s = apply_weights(RobustKernel(kind, 0.5), r, J)
            assert np.isfinite(np.asarray(rw)).all()
            assert np.isfinite(np.asarray(Jw)).all()
            np.testing.assert_allclose(rho_s, 0.0, atol=1e-12)

    def test_huber_downweights_outlier_factor(self):
        """A corrupted plane measurement pulls the GN solution; with a
        Huber kernel the pull is strongly reduced."""
        window, factors, gt_R, gt_t = build_corridor_problem(
            noise_odom_t=0.03, noise_odom_r=0.01, seed=5
        )
        # Corrupt one valid plane factor's measured distance massively.
        pi = np.array(factors.planes.pi_meas)
        valid = np.asarray(factors.planes.valid)
        bad = int(np.argmax(valid))
        pi[bad, 3] += 3.0
        factors = factors._replace(
            planes=factors.planes._replace(pi_meas=jnp.asarray(pi))
        )

        w_plain, _ = gn_solve(window, factors, iters=5)
        robust = RobustConfig(plane=RobustKernel("huber", 1.0))
        w_rob, _ = gn_solve_robust(window, factors, robust)

        ate_plain, _, _ = ate_rmse(np.asarray(gt_t), np.asarray(w_plain.t))
        ate_rob, _, _ = ate_rmse(np.asarray(gt_t), np.asarray(w_rob.t))
        assert ate_rob < ate_plain * 0.7, (ate_plain, ate_rob)


def gn_solve_robust(window, factors, robust, iters=5, damping=1e-6):
    """GN driver with robust linearization (thin local wrapper)."""
    from pop_up_slam_tpu.solver import apply_update, solve_schur

    def step(w, _):
        lin = linearize(w, factors, robust=robust)
        sol = solve_schur(lin, w, damping)
        return apply_update(w, sol.dxp, sol.dxl), lin.cost

    return jax.lax.scan(step, window, None, length=iters)


class TestDogleg:
    def test_converges_on_corridor(self):
        window, factors, gt_R, gt_t = build_corridor_problem(
            noise_odom_t=0.05, noise_odom_r=0.02, seed=7
        )
        w2, stats = dogleg_solve(window, factors, iters=12)
        ate, _, _ = ate_rmse(np.asarray(gt_t), np.asarray(w2.t))
        assert ate < 0.02, ate
        costs = np.asarray(stats.cost_history)
        assert costs[-1] < costs[0]
        assert bool(stats.accepted.any())

    def test_zero_noise_stays_at_truth(self):
        window, factors, gt_R, gt_t = build_corridor_problem()
        w2, stats = dogleg_solve(window, factors, iters=6)
        err_t = np.abs(np.asarray(w2.t - gt_t)).max()
        assert err_t < 1e-3, err_t

    def test_jit_compiles(self):
        window, factors, _, _ = build_corridor_problem(seed=8)
        f = jax.jit(lambda w: dogleg_solve(w, factors, iters=2)[0])
        w2 = f(window)
        assert np.isfinite(np.asarray(w2.t)).all()


class TestCovariance:
    def test_marginals_match_dense_inverse(self):
        window, factors, _, _ = build_corridor_problem(
            noise_odom_t=0.05, noise_odom_r=0.02, noise_plane=0.02,
            lm_perturb=0.05, seed=9,
        )
        lin = linearize(window, factors)
        marg = recover_marginals(lin, window, damping=1e-6)

        # Dense reference: invert the full masked H (same gauge handling
        # as solve_dense: fixed/invalid rows become identity).
        W = window.window_size
        L = window.max_landmarks
        n = 6 * W + 3 * L
        H = np.zeros((n, n))
        H[: 6 * W, : 6 * W] = np.asarray(
            lin.Hpp.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
        )
        Hpl = np.asarray(lin.Hpl.transpose(0, 2, 1, 3).reshape(6 * W, 3 * L))
        H[: 6 * W, 6 * W:] = Hpl
        H[6 * W:, : 6 * W] = Hpl.T
        for l in range(L):
            H[6 * W + 3 * l: 6 * W + 3 * l + 3,
              6 * W + 3 * l: 6 * W + 3 * l + 3] = np.asarray(lin.Hll[l])
        free_p = np.asarray(window.pose_valid & (~window.pose_fixed))
        mask = np.concatenate(
            [np.repeat(free_p, 6), np.repeat(np.asarray(window.lm_valid), 3)]
        ).astype(np.float64)
        H = H * mask[:, None] * mask[None, :]
        H += np.diag((1.0 - mask) + mask * 1e-6)
        C = np.linalg.inv(H)

        for w in range(W):
            want = C[6 * w: 6 * w + 6, 6 * w: 6 * w + 6] * free_p[w]
            np.testing.assert_allclose(
                np.asarray(marg.pose_cov[w]), want, atol=5e-3,
                err_msg=f"pose {w}",
            )
        lmv = np.asarray(window.lm_valid)
        for l in range(L):
            base = 6 * W + 3 * l
            want = C[base: base + 3, base: base + 3] * lmv[l]
            np.testing.assert_allclose(
                np.asarray(marg.plane_cov[l]), want, atol=5e-3,
                err_msg=f"landmark {l}",
            )

    def test_fixed_pose_zero_cov(self):
        window, factors, _, _ = build_corridor_problem(seed=10)
        lin = linearize(window, factors)
        marg = recover_marginals(lin, window)
        np.testing.assert_allclose(np.asarray(marg.pose_cov[0]), 0.0)

    def test_covariance_psd(self):
        window, factors, _, _ = build_corridor_problem(
            noise_odom_t=0.03, seed=11
        )
        lin = linearize(window, factors)
        marg = recover_marginals(lin, window, damping=1e-6)
        free = np.asarray(window.pose_valid & (~window.pose_fixed))
        for w in np.where(free)[0]:
            eig = np.linalg.eigvalsh(np.asarray(marg.pose_cov[w]))
            assert eig.min() > -1e-6, (w, eig)


class TestStepSanitization:
    """NaN/divergence guards (round-4): a window with a near-null joint
    direction can make the f32-formed Schur complement indefinite
    (formation roundoff ~eps32 * kappa * |H|), so jnp cholesky returns
    NaN.  The solve step must be rejected, never applied."""

    def _indefinite_lin(self):
        window, factors, _, _ = build_corridor_problem(
            noise_odom_t=0.03, noise_odom_r=0.01
        )
        lin = linearize(window, factors, analytic_planes=True)
        # Poison one diagonal pose block so S is indefinite.
        Hpp = lin.Hpp.at[2, 2].add(-1e6 * jnp.eye(6))
        return window, factors, lin._replace(Hpp=Hpp)

    def test_apply_update_rejects_nan_step(self):
        from pop_up_slam_tpu.solver.gauss_newton import apply_update
        from pop_up_slam_tpu.solver.schur import solve_schur

        # the suite runs with jax_debug_nans on, which would raise at
        # the (expected, guarded) NaN inside cholesky — disable locally
        prev = jax.config.jax_debug_nans
        jax.config.update("jax_debug_nans", False)
        try:
            window, _, lin_bad = self._indefinite_lin()
            sol = solve_schur(lin_bad, window, 1e-6)
            assert not np.isfinite(np.asarray(sol.dxp)).all()
            w2 = apply_update(window, sol.dxp, sol.dxl)
        finally:
            jax.config.update("jax_debug_nans", prev)
        np.testing.assert_array_equal(np.asarray(w2.t),
                                      np.asarray(window.t))
        assert np.isfinite(np.asarray(w2.planes)).all()

    def test_sanitize_rejects_divergent_step(self):
        from pop_up_slam_tpu.solver.gauss_newton import sanitize_step

        dxp = jnp.full((6, 6), 1e9)
        dxl = jnp.zeros((9, 3))
        dxp2, dxl2, ok = sanitize_step(dxp, dxl)
        assert not bool(ok)
        np.testing.assert_array_equal(np.asarray(dxp2), 0.0)

    def test_pallas_chol_skips_indefinite_directions(self):
        """Modified-Cholesky behavior: non-PD directions solve to 0,
        the PD subspace solves exactly."""
        from pop_up_slam_tpu.ops.cholesky_pallas import chol_solve_pallas

        S = jnp.diag(jnp.array([4.0, -1.0, 9.0], jnp.float32))
        b = jnp.array([8.0, 5.0, 27.0], jnp.float32)
        x = np.asarray(chol_solve_pallas(S, b, interpret=True))
        np.testing.assert_allclose(x, [2.0, 0.0, 3.0], atol=1e-5)


class TestSmallDenseHelpers:
    """Unrolled small-system helpers (solver/schur.py) vs numpy."""

    def test_chol_and_solve(self):
        from pop_up_slam_tpu.solver.schur import chol_small, cho_solve_small

        rng = np.random.default_rng(3)
        M = rng.normal(size=(6, 6)).astype(np.float32)
        A = M @ M.T + 6 * np.eye(6, dtype=np.float32)
        L = np.asarray(chol_small(jnp.asarray(A)))
        np.testing.assert_allclose(L @ L.T, A, atol=1e-4)
        B = rng.normal(size=(6, 3)).astype(np.float32)
        X = np.asarray(cho_solve_small(jnp.asarray(L), jnp.asarray(B)))
        np.testing.assert_allclose(A @ X, B, atol=1e-3)

    def test_spd_inv6_blocked(self):
        from pop_up_slam_tpu.solver.schur import spd_inv6_blocked

        rng = np.random.default_rng(4)
        M = rng.normal(size=(2, 6, 6)).astype(np.float32)
        A = M @ np.swapaxes(M, -1, -2) + 6 * np.eye(6, dtype=np.float32)
        Ai = np.asarray(spd_inv6_blocked(jnp.asarray(A)))
        np.testing.assert_allclose(
            Ai @ A, np.broadcast_to(np.eye(6), (2, 6, 6)), atol=1e-3
        )

    def test_jr_inv_approx_small_angle(self):
        from pop_up_slam_tpu.geometry import se3

        xi = jnp.asarray(
            np.random.default_rng(5).normal(0, 0.01, 6), jnp.float32
        )
        exact = np.asarray(se3.se3_right_jacobian_inv(xi))
        approx = np.asarray(se3.se3_right_jacobian_inv_approx(xi))
        assert np.abs(exact - approx).max() < 1e-4
