"""Kernel-layer tests: every op in pop_up_slam_tpu.ops must match its
pure-jnp reference implementation (SURVEY.md §4 item 1).  Pallas kernels
run in interpret mode on the CPU suite; the same code path compiles on
TPU (exercised by bench.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pop_up_slam_tpu.factors import graph
from pop_up_slam_tpu.factors.graph import (
    Factors,
    OdomFactors,
    PlaneFactors,
    PosePriors,
    Window,
)
from pop_up_slam_tpu.geometry import plane as plane_mod
from pop_up_slam_tpu.geometry import se3
from pop_up_slam_tpu import ops


def _random_problem(key, W=6, L=10, F=24):
    ks = jax.random.split(key, 8)
    R = se3.so3_exp(0.3 * jax.random.normal(ks[0], (W, 3)))
    t = jax.random.normal(ks[1], (W, 3))
    planes = plane_mod.normalize(jax.random.normal(ks[2], (L, 4)))
    window = Window(
        R=R,
        t=t,
        planes=planes,
        pose_valid=jnp.ones((W,), bool),
        pose_fixed=jnp.zeros((W,), bool).at[0].set(True),
        lm_valid=jnp.arange(L) < L - 2,
    )
    pose_idx = jax.random.randint(ks[3], (F,), 0, W)
    lm_idx = jax.random.randint(ks[4], (F,), 0, L - 2)
    # measured plane = true camera-frame plane + tangent noise
    R_cw, t_cw = se3.se3_inverse(R[pose_idx], t[pose_idx])
    pi_true_c = plane_mod.transform(planes[lm_idx], R_cw, t_cw)
    pi_meas = plane_mod.retract(
        pi_true_c, 0.05 * jax.random.normal(ks[5], (F, 3))
    )
    A = jnp.broadcast_to(
        jnp.diag(jnp.array([20.0, 20.0, 10.0])), (F, 3, 3)
    )
    valid = jax.random.uniform(ks[6], (F,)) < 0.85
    pf = PlaneFactors(
        pose_idx.astype(jnp.int32),
        lm_idx.astype(jnp.int32),
        pi_meas,
        A,
        valid,
    )
    return window, pf


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_plane_terms_analytic_matches_jacfwd(seed):
    window, pf = _random_problem(jax.random.PRNGKey(seed))
    r_ref, Jp_ref, Jl_ref = graph._plane_terms(window, pf)
    r, Jp, Jl = ops.plane_terms_analytic(window, pf)
    np.testing.assert_allclose(r, r_ref, atol=1e-5)
    np.testing.assert_allclose(Jp, Jp_ref, atol=2e-4)
    np.testing.assert_allclose(Jl, Jl_ref, atol=2e-4)


def test_plane_terms_pallas_matches_analytic():
    window, pf = _random_problem(jax.random.PRNGKey(3), F=37)
    r_ref, Jp_ref, Jl_ref = ops.plane_terms_analytic(window, pf)
    r, Jp, Jl = ops.plane_terms_pallas(window, pf, interpret=True)
    np.testing.assert_allclose(r, r_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(Jp, Jp_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(Jl, Jl_ref, rtol=1e-5, atol=1e-5)


def test_linearize_analytic_matches_default():
    """linearize() with the analytic plane path must assemble the same
    normal equations as the jacfwd path."""
    window, pf = _random_problem(jax.random.PRNGKey(4))
    W = window.window_size
    odom = OdomFactors.empty(4)
    Rr, tr = se3.se3_between(
        window.R[:4], window.t[:4], window.R[1:5], window.t[1:5]
    )
    odom = odom._replace(
        i=jnp.arange(4, dtype=jnp.int32),
        j=jnp.arange(1, 5, dtype=jnp.int32),
        R_meas=Rr,
        t_meas=tr,
        valid=jnp.ones((4,), bool),
    )
    priors = PosePriors.empty(1)._replace(
        idx=jnp.zeros((1,), jnp.int32),
        R=window.R[:1],
        t=window.t[:1],
        valid=jnp.ones((1,), bool),
    )
    factors = Factors(odom=odom, planes=pf, priors=priors)
    lin_ref = graph.linearize(window, factors)
    lin = graph.linearize(window, factors, analytic_planes=True)
    for a, b in zip(lin, lin_ref):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=2e-4)


# ---------------------------------------------------------------------------
# Schur + Cholesky kernels
# ---------------------------------------------------------------------------


def _random_spd_system(key, W=5, L=9):
    """A random Linearization with SPD structure (built from J^T J)."""
    window, pf = _random_problem(key, W=W, L=L, F=40)
    odom = OdomFactors.empty(W - 1)._replace(
        i=jnp.arange(W - 1, dtype=jnp.int32),
        j=jnp.arange(1, W, dtype=jnp.int32),
        R_meas=se3.so3_exp(0.1 * jax.random.normal(key, (W - 1, 3))),
        t_meas=jax.random.normal(key, (W - 1, 3)),
        valid=jnp.ones((W - 1,), bool),
    )
    priors = PosePriors.empty(1)._replace(
        idx=jnp.zeros((1,), jnp.int32),
        R=window.R[:1],
        t=window.t[:1],
        valid=jnp.ones((1,), bool),
    )
    factors = Factors(odom=odom, planes=pf, priors=priors)
    lin = graph.linearize(window, factors)
    return window, lin


def test_schur_reduce_pallas_matches_reference():
    from pop_up_slam_tpu.solver import schur as schur_mod

    window, lin = _random_spd_system(jax.random.PRNGKey(7))
    ref = schur_mod.solve_schur(lin, window, damping=1e-3)
    out = ops.schur_reduce_pallas(lin, window, damping=1e-3,
                                  interpret=True)
    np.testing.assert_allclose(out.S, ref.S, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(out.dxp, ref.dxp, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out.dxl, ref.dxl, rtol=1e-4, atol=1e-4)


def test_schur_reduce_pallas_tiled_path():
    """6W > 128 takes the tiled two-kernel path (the fused single-tile
    kernel covers production windows only) — must still match the
    reference solver."""
    from pop_up_slam_tpu.solver import schur as schur_mod

    window, lin = _random_spd_system(jax.random.PRNGKey(11), W=23, L=9)
    assert 6 * window.window_size > 128
    ref = schur_mod.solve_schur(lin, window, damping=1e-3)
    out = ops.schur_reduce_pallas(lin, window, damping=1e-3,
                                  interpret=True)
    # 138-dim f32 factorization: different accumulation orders give
    # ~1e-3 absolute differences on O(5) solution entries
    np.testing.assert_allclose(out.dxp, ref.dxp, rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(out.dxl, ref.dxl, rtol=1e-3, atol=5e-3)


@pytest.mark.parametrize("n", [12, 30, 64, 130])
def test_chol_solve_pallas(n):
    key = jax.random.PRNGKey(n)
    A = jax.random.normal(key, (n, n))
    S = A @ A.T + n * jnp.eye(n)
    b = jax.random.normal(jax.random.PRNGKey(n + 1), (n,))
    x = ops.chol_solve_pallas(S, b, interpret=True)
    x_ref = jnp.linalg.solve(S, b)
    np.testing.assert_allclose(x, x_ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Depth render kernel
# ---------------------------------------------------------------------------


def test_depth_render_pallas_matches_reference():
    from pop_up_slam_tpu.geometry.camera import Intrinsics
    from pop_up_slam_tpu.io import synthetic
    from pop_up_slam_tpu.popup import popup as pp

    H, W = 64, 128
    K = Intrinsics.create(64.0, 64.0, 64.0, 32.0)
    world = synthetic.corridor_world()
    R, t = synthetic.corridor_trajectory(3)
    labels, _ = synthetic.render_frame(K, R[1], t[1], world, H, W)
    mask = labels == synthetic.LABEL_GROUND
    cfg = pp.PopupConfig(min_cols=6, smooth_radius=3, nms_radius=5)
    res = pp.pop_up(K, mask, R[1], t[1], cfg)
    ref = pp.depth_from_popup(K, res, mask, R[1], t[1])
    out = ops.depth_render_pallas(K, res, mask, R[1], t[1],
                                  interpret=True)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)
