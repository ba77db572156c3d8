"""Powell's dog-leg trust-region solver over poses + planes.

iSAM's batch optimizer offers Gauss-Newton, Levenberg-Marquardt and
Powell's dog-leg (SURVEY.md §2.1 "Vendored iSAM library": "batch
Gauss-Newton/LM/Powell's dog-leg batch solves").  This is the dog-leg
leg of that parity, TPU-style: a fixed-iteration ``lax.scan`` whose
accept/reject and trust-region update are branch-free ``jnp.where``
selects, with the Gauss-Newton subproblem solved by the same Schur
elimination as the GN/LM drivers.

Step selection (classical dog-leg on the blocked system):

- ``dx_gn``  : Schur-eliminated Gauss-Newton step.
- ``dx_sd``  : Cauchy point -alpha g, alpha = g^T g / g^T H g.
- if |dx_gn| <= Delta      -> dx_gn
- elif alpha |g| >= Delta  -> (Delta/|g|) * (-g)
- else                     -> dx_sd + beta (dx_gn - dx_sd),  |dx| = Delta

Trust radius: classic gain-ratio schedule (shrink x0.25 when rho < 0.25,
grow x2 when rho > 0.75 and the step hit the boundary).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..factors.graph import Factors, Linearization, Window, linearize, total_cost
from .gauss_newton import SolveStats, apply_update
from .schur import solve_schur


def _masks(window: Window):
    free_p = (window.pose_valid & (~window.pose_fixed)).astype(window.t.dtype)
    free_l = window.lm_valid.astype(window.t.dtype)
    return free_p, free_l


def _grad(lin: Linearization, window: Window):
    """Masked gradient g = (bp, bl) of 0.5||r||^2 (zero on fixed/invalid)."""
    free_p, free_l = _masks(window)
    return lin.bp * free_p[:, None], lin.bl * free_l[:, None]


def _hvp(lin: Linearization, window: Window, vp, vl):
    """Blocked Hessian-vector product (H v) with gauge masking."""
    free_p, free_l = _masks(window)
    vp = vp * free_p[:, None]
    vl = vl * free_l[:, None]
    hp = jnp.einsum("wvab,vb->wa", lin.Hpp, vp) + jnp.einsum(
        "wlab,lb->wa", lin.Hpl, vl
    )
    hl = jnp.einsum("wlab,wa->lb", lin.Hpl, vp) + jnp.einsum(
        "lab,lb->la", lin.Hll, vl
    )
    return hp * free_p[:, None], hl * free_l[:, None]


def _dot(ap, al, bp, bl):
    return jnp.sum(ap * bp) + jnp.sum(al * bl)


def _norm(ap, al):
    return jnp.sqrt(jnp.maximum(_dot(ap, al, ap, al), 1e-30))


def dogleg_solve(
    window: Window,
    factors: Factors,
    iters: int = 10,
    delta0: float = 1.0,
    delta_max: float = 100.0,
    solve_fn=solve_schur,
    robust=None,
    analytic_planes: bool = False,
):
    """Fixed-iteration Powell's dog-leg.  Returns (window, SolveStats).

    ``SolveStats.lambdas`` reports the trust radius per iteration."""

    def step(carry, _):
        w, delta, cost = carry
        lin = linearize(w, factors, analytic_planes=analytic_planes,
                        robust=robust)
        gp, gl = _grad(lin, w)

        # Gauss-Newton step (tiny damping only for numerical safety).
        sol = solve_fn(lin, w, 1e-9)
        gnp_, gnl = sol.dxp, sol.dxl
        gn_norm = _norm(gnp_, gnl)

        # Cauchy point: -alpha g.
        hp, hl = _hvp(lin, w, gp, gl)
        gTg = _dot(gp, gl, gp, gl)
        gHg = jnp.maximum(_dot(gp, gl, hp, hl), 1e-30)
        alpha = gTg / gHg
        sdp, sdl = -alpha * gp, -alpha * gl
        sd_norm = _norm(sdp, sdl)
        g_norm = jnp.sqrt(jnp.maximum(gTg, 1e-30))

        # Dog-leg interpolation beta: |sd + beta (gn - sd)| = delta.
        dp, dl = gnp_ - sdp, gnl - sdl
        a = jnp.maximum(_dot(dp, dl, dp, dl), 1e-30)
        b = 2.0 * _dot(sdp, sdl, dp, dl)
        c = _dot(sdp, sdl, sdp, sdl) - delta ** 2
        disc = jnp.maximum(b * b - 4 * a * c, 0.0)
        beta = (-b + jnp.sqrt(disc)) / (2 * a)
        beta = jnp.clip(beta, 0.0, 1.0)

        use_gn = gn_norm <= delta
        use_sc = (~use_gn) & (alpha * g_norm >= delta)
        scale_g = delta / g_norm
        dxp = jnp.where(
            use_gn, gnp_,
            jnp.where(use_sc, -scale_g * gp, sdp + beta * dp),
        )
        dxl = jnp.where(
            use_gn, gnl,
            jnp.where(use_sc, -scale_g * gl, sdl + beta * dl),
        )
        hit_boundary = ~use_gn

        # Gain ratio: actual vs model decrease m(0) - m(dx).
        hdp, hdl = _hvp(lin, w, dxp, dxl)
        model_dec = -(_dot(gp, gl, dxp, dxl) + 0.5 * _dot(dxp, dxl, hdp, hdl))
        w_try = apply_update(w, dxp, dxl)
        cost_try = total_cost(w_try, factors, robust=robust)
        actual_dec = cost - cost_try
        rho = actual_dec / jnp.maximum(model_dec, 1e-30)

        accept = (actual_dec > 0.0) & (model_dec > 0.0)
        w_next = jax.tree.map(
            lambda a_, b_: jnp.where(jnp.reshape(accept, (1,) * a_.ndim), a_, b_),
            w_try, w,
        )
        cost_next = jnp.where(accept, cost_try, cost)

        step_norm = _norm(dxp, dxl)
        delta_next = jnp.where(
            rho < 0.25, 0.25 * step_norm,
            jnp.where(
                (rho > 0.75) & hit_boundary,
                jnp.minimum(2.0 * delta, delta_max), delta,
            ),
        )
        delta_next = jnp.clip(delta_next, 1e-8, delta_max)
        return (w_next, delta_next, cost_next), (cost, step_norm, delta, accept)

    cost0 = total_cost(window, factors, robust=robust)
    (window, _, final_cost), (costs, step_norms, deltas, accepted) = (
        jax.lax.scan(
            step, (window, jnp.asarray(delta0), cost0), None, length=iters
        )
    )
    return window, SolveStats(
        cost_history=jnp.concatenate([costs, final_cost[None]]),
        step_norms=step_norms,
        lambdas=deltas,
        accepted=accepted,
    )
