"""Distributed-solve tests on the virtual 8-device CPU mesh
(SURVEY.md §4 item 4): the factor-sharded Schur assembly must match the
single-device solver to fp tolerance for any mesh shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pop_up_slam_tpu.parallel import (
    distributed_gn_solve,
    make_mesh,
    pad_factors_for_sharding,
    sharded_linearize,
    sharded_popup,
)
from pop_up_slam_tpu.factors.graph import linearize
from pop_up_slam_tpu.solver import gn_solve

from test_solver import build_corridor_problem


@pytest.fixture(scope="module")
def problem():
    return build_corridor_problem(
        noise_odom_t=0.05, noise_odom_r=0.02, noise_plane=0.02, lm_perturb=0.05
    )


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_linearize_matches(problem, n_dev):
    window, factors, _, _ = problem
    mesh = make_mesh(n_dev)
    factors_p = pad_factors_for_sharding(factors, n_dev)
    lin_d = sharded_linearize(window, factors_p, mesh)
    lin_s = linearize(window, factors)
    # H entries reach ~1e4 (whitening 1/sigma = 100 squared); f32 psum
    # reduction order differs from the single-device sum, so compare
    # relative with an absolute floor.
    for a, b in zip(jax.tree.leaves(lin_d), jax.tree.leaves(lin_s)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-3
        )


def test_distributed_solve_matches_single_device(problem):
    window, factors, gt_R, gt_t = problem
    w_s, _ = gn_solve(window, factors, iters=3, damping=1e-6)
    for n_dev in (8,):
        mesh = make_mesh(n_dev)
        w_d, _ = distributed_gn_solve(window, factors, mesh, iters=3,
                                      damping=1e-6)
        np.testing.assert_allclose(
            np.asarray(w_d.t), np.asarray(w_s.t), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(w_d.planes), np.asarray(w_s.planes), atol=1e-3
        )


def test_sharded_popup_matches_vmap():
    from pop_up_slam_tpu.geometry.camera import Intrinsics
    from pop_up_slam_tpu.io import synthetic
    from pop_up_slam_tpu.popup import popup as pp

    K = Intrinsics.create(80.0, 80.0, 80.0, 60.0)
    world = synthetic.corridor_world()
    B = 8
    R, t = synthetic.corridor_trajectory(B)
    labels, _ = jax.vmap(
        lambda R_, t_: synthetic.render_frame(K, R_, t_, world, 120, 160)
    )(R, t)
    masks = labels == synthetic.LABEL_GROUND
    cfg = pp.PopupConfig(min_cols=6, smooth_radius=3, nms_radius=5)
    fn = lambda m, R_, t_: pp.pop_up(K, m, R_, t_, cfg)

    ref = jax.vmap(fn)(masks, R, t)
    mesh = make_mesh(8)
    out = sharded_popup(fn, masks, R, t, mesh)
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        )
