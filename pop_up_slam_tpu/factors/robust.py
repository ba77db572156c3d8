"""Robust loss functions (IRLS reweighting) for factor residuals.

The reference's iSAM backend supports robust cost functions on factors
(SURVEY.md §2.1 "Vendored iSAM library" — Kaess et al., IJRR'12; the
plane-SLAM front-end gates data association geometrically, and robust
kernels catch what slips through).  TPU-native form: every factor's
whitened residual r is reweighted as sqrt(w(||r||^2)) * r with the
standard IRLS weight of the chosen kernel, applied identically to the
Jacobians — the Gauss-Newton normal equations of the reweighted problem
are exactly the robustified ones, with no data-dependent branching
(pure ``jnp.where``).

Kernels (rho is the robust cost at squared whitened norm s = ||r||^2,
w the IRLS weight):

- ``none``   : rho(s) = s,                                 w = 1
- ``huber``  : quadratic for ||r|| <= k, linear outside,   w = min(1, k/||r||)
- ``cauchy`` : rho(s) = k^2 log(1 + s/k^2),                w = 1/(1 + s/k^2)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

KINDS = ("none", "huber", "cauchy")


class RobustKernel(NamedTuple):
    """Static robust-kernel choice for one factor family.

    kind  : one of ``KINDS`` (python-static; selects the trace).
    scale : the kernel width k in whitened-residual units.
    """

    kind: str = "none"
    scale: float = 1.0


class RobustConfig(NamedTuple):
    """Per-factor-family robust kernels (odometry / plane / prior)."""

    odom: RobustKernel = RobustKernel()
    plane: RobustKernel = RobustKernel()
    prior: RobustKernel = RobustKernel()


def irls_weight(kernel: RobustKernel, sq_norm: jnp.ndarray) -> jnp.ndarray:
    """IRLS weight w(s) at squared whitened residual norm s (batched)."""
    if kernel.kind == "none":
        return jnp.ones_like(sq_norm)
    k = jnp.asarray(kernel.scale, sq_norm.dtype)
    if kernel.kind == "huber":
        nrm = jnp.sqrt(jnp.maximum(sq_norm, 1e-20))
        return jnp.minimum(1.0, k / nrm)
    if kernel.kind == "cauchy":
        return 1.0 / (1.0 + sq_norm / (k * k))
    raise ValueError(f"unknown robust kernel '{kernel.kind}'")


def rho(kernel: RobustKernel, sq_norm: jnp.ndarray) -> jnp.ndarray:
    """Robust cost rho(s) (batched) — replaces s in the total cost so LM
    accept/reject and GN both optimize the same robustified objective."""
    if kernel.kind == "none":
        return sq_norm
    k = jnp.asarray(kernel.scale, sq_norm.dtype)
    if kernel.kind == "huber":
        nrm = jnp.sqrt(jnp.maximum(sq_norm, 1e-20))
        quad = sq_norm
        lin = 2.0 * k * nrm - k * k
        return jnp.where(nrm <= k, quad, lin)
    if kernel.kind == "cauchy":
        return k * k * jnp.log1p(sq_norm / (k * k))
    raise ValueError(f"unknown robust kernel '{kernel.kind}'")


def apply_weights(kernel: RobustKernel, r: jnp.ndarray, *jacobians):
    """Scale residuals and Jacobians by sqrt(w): r (F, d), jacobians
    (F, d, ...).  Returns (r_weighted, *jacobians_weighted, rho_s)."""
    s = jnp.sum(r * r, axis=-1)
    w = irls_weight(kernel, s)
    sw = jnp.sqrt(w)
    out = [r * sw[:, None]]
    for J in jacobians:
        out.append(J * sw[:, None, None])
    out.append(rho(kernel, s))
    return tuple(out)
