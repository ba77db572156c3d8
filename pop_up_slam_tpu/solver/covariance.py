"""Marginal covariance recovery for poses and plane landmarks.

iSAM provides covariance recovery over the factor-graph estimate
(SURVEY.md §2.1 "Vendored iSAM library": "...batch solves, covariance
recovery"; used by the paper's data association gating in principle).
TPU-native form: the covariance comes from the same blocked Schur
structure the solver already builds — no sparse-factorization
back-solves.  With

    H = [[Hpp, Hpl], [Hpl^T, Hll]],   S = Hpp - Hpl Hll^-1 Hpl^T

the marginals of the (free) poses are the 6x6 diagonal blocks of S^-1,
and the landmark marginals follow from the block-inverse identity

    Cov_ll = Hll^-1 + Hll^-1 Hpl^T S^-1 Hpl Hll^-1   (diagonal blocks).

S is small (6W x 6W), so one dense inverse is cheap and exact.
Gauge-fixed / invalid blocks are masked to zero covariance.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..factors.graph import Linearization, Window
from .schur import inv3x3


class Marginals(NamedTuple):
    pose_cov: jnp.ndarray   # (W, 6, 6) — zero for fixed/invalid poses
    plane_cov: jnp.ndarray  # (L, 3, 3) — zero for invalid landmarks


def recover_marginals(
    lin: Linearization, window: Window, damping: float = 1e-9
) -> Marginals:
    """Pose and plane marginal covariances at the current linearization.

    Mirrors the masking semantics of ``solver.schur.solve_schur``:
    gauge-fixed poses act as perfectly-known anchors (their rows/cols
    leave the system; their own covariance is reported as zero).
    """
    W, L = lin.bp.shape[0], lin.bl.shape[0]
    dtype = lin.bp.dtype
    lam = jnp.asarray(damping, dtype)

    eye3 = jnp.eye(3, dtype=dtype)
    lm_mask = window.lm_valid
    Hll = jnp.where(lm_mask[:, None, None], lin.Hll + lam * eye3, eye3)
    Hll_inv = inv3x3(Hll)

    HplWinv = jnp.einsum("wlab,lbc->wlac", lin.Hpl, Hll_inv)
    S_blocks = lin.Hpp - jnp.einsum("wlac,vlbc->wvab", HplWinv, lin.Hpl)

    eye6 = jnp.eye(6, dtype=dtype)
    diag_ix = jnp.arange(W)
    S_blocks = S_blocks.at[diag_ix, diag_ix].add(lam * eye6)

    free = window.pose_valid & (~window.pose_fixed)
    pm = free.astype(dtype)
    S_blocks = S_blocks * pm[:, None, None, None] * pm[None, :, None, None]
    S_blocks = S_blocks.at[diag_ix, diag_ix].add(
        (1.0 - pm)[:, None, None] * eye6
    )

    S = S_blocks.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
    Sinv = jnp.linalg.inv(S)
    Sinv_blocks = Sinv.reshape(W, 6, W, 6).transpose(0, 2, 1, 3)

    pose_cov = Sinv_blocks[diag_ix, diag_ix] * pm[:, None, None]

    # Landmark marginals: Hll^-1 + Hll^-1 (sum_wv Hpl_w^T Sinv_wv Hpl_v) Hll^-1.
    # Couplings through gauge-fixed poses are exact knowledge and must
    # not inflate the landmark uncertainty: zero those Hpl rows (the
    # dense reference does the same by masking H's fixed rows/cols).
    Hpl_m = lin.Hpl * pm[:, None, None, None]
    M = jnp.einsum(
        "wlab,wvac,vlcd->lbd", Hpl_m, Sinv_blocks, Hpl_m
    )
    plane_cov = Hll_inv + jnp.einsum(
        "lab,lbc,lcd->lad", Hll_inv, M, Hll_inv
    )
    plane_cov = plane_cov * lm_mask[:, None, None].astype(dtype)
    return Marginals(pose_cov, plane_cov)
