"""Windowed Gauss-Newton / Levenberg-Marquardt over poses + planes.

Replaces iSAM's incremental update/batch_optimization cycle (SURVEY.md
§3.3) with a fixed-iteration-count re-solve of the sliding window —
cheap on TPU because the whole loop is one jit-compiled ``lax.scan``
with static shapes.

Two drivers:

- :func:`gn_solve`  — K damped Gauss-Newton iterations (fixed damping).
- :func:`lm_solve`  — Levenberg-Marquardt with accept/reject and
  adaptive lambda, still fixed iteration count (rejected steps keep the
  state and raise lambda — branch-free via ``jnp.where``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..factors.graph import Factors, Window, linearize, total_cost
from ..geometry import se3, plane as plane_mod
from .schur import solve_schur


class SolveStats(NamedTuple):
    cost_history: jnp.ndarray   # (K+1,) cost before each iter + final
    step_norms: jnp.ndarray     # (K,)
    lambdas: jnp.ndarray        # (K,)
    accepted: jnp.ndarray       # (K,) bool (always True for GN)


def sanitize_step(dxp: jnp.ndarray, dxl: jnp.ndarray, max_norm: float = 1e3):
    """Zero a solve step that is non-finite or divergently large.

    A window with a near-null joint direction (e.g. a corridor segment
    whose along-axis motion is constrained only by the prior chain) can
    make the f32-formed Schur complement *indefinite* by the formation
    roundoff (~eps32 * kappa(Hll) * |H|, order 1e2 at SLAM scales):
    ``jnp.linalg.cholesky`` then returns NaN, and one NaN step would
    poison the whole window state forever.  The production-grade
    behavior is the one the reference's solver family has (iSAM refuses
    a failed factorization): keep the current (finite, warm-started)
    estimate and move on.  Returns (dxp, dxl, ok).
    """
    sq = jnp.sum(dxp * dxp) + jnp.sum(dxl * dxl)
    ok = jnp.isfinite(sq) & (sq < max_norm * max_norm)
    return (jnp.where(ok, dxp, 0.0), jnp.where(ok, dxl, 0.0), ok)


def apply_update(window: Window, dxp: jnp.ndarray, dxl: jnp.ndarray,
                 presanitized: bool = False) -> Window:
    """Retract pose and landmark updates onto the manifold.

    Non-finite / divergent steps are zeroed first (:func:`sanitize_step`)
    so every solver path — single-device and all sharded variants — is
    NaN-step-safe in one place.  Drivers that already sanitized (they
    need the sanitized step for norms) pass ``presanitized=True`` to
    skip the redundant second pass."""
    if not presanitized:
        dxp, dxl, _ = sanitize_step(dxp, dxl)
    R_new, t_new = se3.se3_retract(window.R, window.t, dxp)
    free = (window.pose_valid & (~window.pose_fixed))[:, None]
    R_new = jnp.where(free[..., None], R_new, window.R)
    t_new = jnp.where(free, t_new, window.t)
    planes_new = plane_mod.retract(window.planes, dxl)
    planes_new = jnp.where(window.lm_valid[:, None], planes_new, window.planes)
    return window._replace(R=R_new, t=t_new, planes=planes_new)


def gn_solve(
    window: Window,
    factors: Factors,
    iters: int = 5,
    damping: float = 1e-6,
    solve_fn=solve_schur,
    analytic_planes: bool = False,
    robust=None,
):
    """Fixed-iteration damped Gauss-Newton. Returns (window, SolveStats).

    ``analytic_planes`` / ``robust`` thread through to
    :func:`factors.graph.linearize` (closed-form plane Jacobians; IRLS
    robust kernels)."""

    def step(w, _):
        lin = linearize(w, factors, analytic_planes=analytic_planes,
                        robust=robust)
        sol = solve_fn(lin, w, damping)
        dxp, dxl, _ = sanitize_step(sol.dxp, sol.dxl)
        w2 = apply_update(w, dxp, dxl, presanitized=True)
        sn = jnp.sqrt(jnp.sum(dxp ** 2) + jnp.sum(dxl ** 2))
        return w2, (lin.cost, sn)

    window, (costs, step_norms) = jax.lax.scan(
        step, window, None, length=iters
    )
    final_cost = total_cost(window, factors, robust=robust)
    return window, SolveStats(
        cost_history=jnp.concatenate([costs, final_cost[None]]),
        step_norms=step_norms,
        lambdas=jnp.full((iters,), damping),
        accepted=jnp.ones((iters,), bool),
    )


def lm_solve(
    window: Window,
    factors: Factors,
    iters: int = 8,
    lam0: float = 1e-4,
    lam_up: float = 10.0,
    lam_down: float = 0.3,
    solve_fn=solve_schur,
    analytic_planes: bool = False,
    robust=None,
):
    """Levenberg-Marquardt with branch-free accept/reject."""

    def step(carry, _):
        w, lam, cost = carry
        lin = linearize(w, factors, analytic_planes=analytic_planes,
                        robust=robust)
        sol = solve_fn(lin, w, lam)
        w_try = apply_update(w, sol.dxp, sol.dxl)
        cost_try = total_cost(w_try, factors, robust=robust)
        accept = cost_try < cost
        w_next = jax.tree.map(
            lambda a, b: jnp.where(
                jnp.reshape(accept, (1,) * a.ndim), a, b
            ),
            w_try,
            w,
        )
        lam_next = jnp.where(accept, lam * lam_down, lam * lam_up)
        lam_next = jnp.clip(lam_next, 1e-9, 1e6)
        cost_next = jnp.where(accept, cost_try, cost)
        sn = jnp.sqrt(jnp.sum(sol.dxp ** 2) + jnp.sum(sol.dxl ** 2))
        return (w_next, lam_next, cost_next), (cost, sn, lam, accept)

    cost0 = total_cost(window, factors, robust=robust)
    (window, _, final_cost), (costs, step_norms, lambdas, accepted) = (
        jax.lax.scan(step, (window, jnp.asarray(lam0), cost0), None, length=iters)
    )
    return window, SolveStats(
        cost_history=jnp.concatenate([costs, final_cost[None]]),
        step_norms=step_norms,
        lambdas=lambdas,
        accepted=accepted,
    )
