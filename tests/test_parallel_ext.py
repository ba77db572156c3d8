"""Map-block (landmark-sharded) and keyframe-block (pose-sharded)
distributed BA on the virtual 8-device CPU mesh — shard-invariance vs
the single-device solver (SURVEY.md §2.2 TP/SP analogs, §4 item 4)."""

import jax
import numpy as np
import pytest

from pop_up_slam_tpu.factors.graph import linearize
from pop_up_slam_tpu.parallel import (
    keyframe_sharded_gn_solve,
    keyframe_sharded_linearize,
    make_mesh,
    map_block_gn_solve,
    route_factors_by_keyframe,
)
from pop_up_slam_tpu.solver import gn_solve

from test_solver import build_corridor_problem

# These are the suite's heaviest compiles (whole-GN-loop shard_map
# programs on the 8-device CPU mesh, ~10 min each cold on this box);
# the fast dev tier is `-m "not slow"` (see pytest.ini).
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def problem():
    return build_corridor_problem(
        noise_odom_t=0.05, noise_odom_r=0.02, noise_plane=0.02,
        lm_perturb=0.05,
    )


@pytest.fixture(scope="module")
def single_device_solution(problem):
    window, factors, _, _ = problem
    w_s, stats = gn_solve(window, factors, iters=3, damping=1e-6)
    return w_s, stats


@pytest.mark.parametrize("n_dev", [2, 8])
def test_map_block_solve_matches(problem, single_device_solution, n_dev):
    window, factors, _, _ = problem
    w_s, stats_s = single_device_solution
    mesh = make_mesh(n_dev)
    w_d, stats_d = map_block_gn_solve(
        window, factors, mesh, iters=3, damping=1e-6
    )
    np.testing.assert_allclose(np.asarray(w_d.t), np.asarray(w_s.t),
                               atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(w_d.planes), np.asarray(w_s.planes), atol=2e-3
    )
    # Same cost trajectory (the collectives must not change the math).
    np.testing.assert_allclose(
        np.asarray(stats_d.cost_history[:-1]),
        np.asarray(stats_s.cost_history[:3]),
        rtol=1e-3,
    )


@pytest.mark.parametrize("n_dev", [2])
def test_keyframe_sharded_linearize_matches(problem, n_dev):
    window, factors, _, _ = problem
    mesh = make_mesh(n_dev)
    routed = route_factors_by_keyframe(
        factors, window.window_size, n_dev
    )
    lin_d = keyframe_sharded_linearize(window, routed, mesh)
    lin_s = linearize(window, factors)
    # H entries reach ~1e8 (tight whitening squared); f32 reduction
    # order differs across shards, so compare relative with a floor.
    for a, b in zip(jax.tree.leaves(lin_d), jax.tree.leaves(lin_s)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=5e-3
        )


@pytest.mark.parametrize("n_dev", [2])
def test_keyframe_sharded_solve_matches(problem, single_device_solution,
                                        n_dev):
    window, factors, _, _ = problem
    w_s, _ = single_device_solution
    mesh = make_mesh(n_dev)
    w_d, _ = keyframe_sharded_gn_solve(
        window, factors, mesh, iters=3, damping=1e-6
    )
    np.testing.assert_allclose(np.asarray(w_d.t), np.asarray(w_s.t),
                               atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(w_d.planes), np.asarray(w_s.planes), atol=2e-3
    )
