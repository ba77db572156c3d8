"""Schur-complement reduction on the MXU (Pallas).

The reference eliminates nothing — iSAM factors the full sparse system
(SURVEY.md §3.3).  The TPU design (BASELINE north_star) eliminates the
block-diagonal plane landmarks in closed form and materializes the
reduced camera system with one blocked GEMM:

    S = Hpp - B G^T,   B = Hpl Hll^-1 (per-landmark 3x3 right-scaling),
                       G = Hpl

flattened to (6W x 3L) matrices.  The GEMM tiles onto the MXU via this
kernel; the tiny per-landmark 3x3 inverses and right-scalings stay in
jnp (they are VPU noise next to the GEMM).  The reduced solve runs in
the fused Cholesky kernel (:mod:`cholesky_pallas`).

Matches ``solver.schur.solve_schur`` bit-for-bit up to fp tolerance
(tests/test_ops.py) and is drop-in usable as the ``solve_fn`` of the
GN/LM drivers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..factors.graph import Linearization, Window
from ..solver.schur import SchurSolution, inv3x3
from .cholesky_pallas import chol_solve_body, chol_solve_pallas

_TILE = 128


def _schur_small_kernel(Hpp_ref, B_ref, G_ref, rhs_ref, pm_ref, lam_ref,
                        S_ref, x_ref, *, n_real: int):
    """Single-tile fused Schur + masked damping + Cholesky solve.

    For the production window (6W <= 128, 3L <= a few hundred) the whole
    reduced solve is ONE kernel: S is formed on the MXU straight into
    VMEM scratch, gauge/damping masks applied, and the factorize + two
    substitutions run in place — S never round-trips through HBM
    between stages, and there is a single kernel launch per GN
    iteration instead of two plus XLA glue.

    rhs_ref carries the already-masked right-hand side -(bp - B bl);
    pm_ref is the (1, n) free-pose mask; lam_ref a (1, 1) SMEM damping.
    """
    n = Hpp_ref.shape[0]
    f32 = jnp.float32
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    lam = lam_ref[0, 0]
    pm = pm_ref[:]                                        # (1, n)

    S = Hpp_ref[:] - jax.lax.dot_general(
        B_ref[:], G_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    diag = (row == col).astype(f32)                       # (n, n)
    S = S + lam * diag
    S = S * pm * pm.reshape(n, 1)
    S = S + (1.0 - pm) * diag
    S_ref[:] = S

    x_ref[:] = chol_solve_body(S, rhs_ref[:] * pm, n_real)


def _schur_gemm_kernel(Hpp_ref, B_ref, G_ref, S_ref):
    S_ref[:] = Hpp_ref[:] - jax.lax.dot_general(
        B_ref[:],
        G_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _schur_gemm(Hpp_flat, B, G, interpret: bool):
    """S = Hpp - B @ G^T, tiled (TILE x TILE) over the MXU."""
    R, C = B.shape
    Rp = -(-R // _TILE) * _TILE
    Cp = -(-C // _TILE) * _TILE
    Hpp_p = jnp.zeros((Rp, Rp), jnp.float32).at[:R, :R].set(Hpp_flat)
    B_p = jnp.zeros((Rp, Cp), jnp.float32).at[:R, :C].set(B)
    G_p = jnp.zeros((Rp, Cp), jnp.float32).at[:R, :C].set(G)

    grid = (Rp // _TILE, Rp // _TILE)
    S = pl.pallas_call(
        _schur_gemm_kernel,
        out_shape=jax.ShapeDtypeStruct((Rp, Rp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_TILE, _TILE),
                lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_TILE, Cp), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_TILE, Cp), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (_TILE, _TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(Hpp_p, B_p, G_p)
    return S[:R, :R]


@functools.partial(jax.jit, static_argnames=("interpret",))
def schur_reduce_pallas(
    lin: Linearization,
    window: Window,
    damping: float | jnp.ndarray = 1e-6,
    interpret: bool | None = None,
) -> SchurSolution:
    """Pallas-kerneled twin of ``solver.schur.solve_schur``.

    Same gauge/validity masking semantics; the S GEMM runs on the MXU
    and the reduced solve in the fused Cholesky kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    W, L = lin.bp.shape[0], lin.bl.shape[0]
    dtype = lin.bp.dtype
    lam = jnp.asarray(damping, jnp.float32)

    eye3 = jnp.eye(3, dtype=dtype)
    Hll = lin.Hll + lam * eye3
    lm_mask = window.lm_valid
    Hll = jnp.where(lm_mask[:, None, None], Hll, eye3)
    Hll_inv = inv3x3(Hll)

    # B = Hpl Hll^-1 (batched 3x3 right-scaling), flattened operands.
    Bw = jnp.einsum("wlab,lbc->wlac", lin.Hpl, Hll_inv)
    B = Bw.transpose(0, 2, 1, 3).reshape(6 * W, 3 * L).astype(jnp.float32)
    G = lin.Hpl.transpose(0, 2, 1, 3).reshape(6 * W, 3 * L).astype(
        jnp.float32
    )
    Hpp_flat = lin.Hpp.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W).astype(
        jnp.float32
    )
    free = window.pose_valid & (~window.pose_fixed)
    pm6 = jnp.repeat(free.astype(jnp.float32), 6)
    rp = lin.bp.reshape(-1) - (B @ lin.bl.reshape(-1).astype(jnp.float32))

    R = 6 * W
    if R <= _TILE:
        # Production window sizes: ONE fused kernel (Schur GEMM +
        # masked damping + Cholesky factorize/solve, all in VMEM).
        C = 3 * L
        Cp = -(-C // _TILE) * _TILE
        Hpp_p = jnp.zeros((_TILE, _TILE), jnp.float32)
        Hpp_p = Hpp_p.at[:R, :R].set(Hpp_flat)
        # padded diagonal is identity so the padded factorization rows
        # stay e_k even though the loop never visits them
        Hpp_p = Hpp_p.at[jnp.arange(R, _TILE), jnp.arange(R, _TILE)].set(1.0)
        B_p = jnp.zeros((_TILE, Cp), jnp.float32).at[:R, :C].set(B)
        G_p = jnp.zeros((_TILE, Cp), jnp.float32).at[:R, :C].set(G)
        rhs_p = jnp.zeros((1, _TILE), jnp.float32).at[0, :R].set(-rp)
        pm_p = jnp.zeros((1, _TILE), jnp.float32).at[0, :R].set(pm6)
        lam_in = lam.reshape(1, 1)

        S_p, x_p = pl.pallas_call(
            functools.partial(_schur_small_kernel, n_real=R),
            out_shape=(
                jax.ShapeDtypeStruct((_TILE, _TILE), jnp.float32),
                jax.ShapeDtypeStruct((1, _TILE), jnp.float32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(Hpp_p, B_p, G_p, rhs_p, pm_p, lam_in)
        S = S_p[:R, :R]
        dxp = x_p[0, :R].reshape(W, 6) * pm6.reshape(W, 6)
    else:
        S = _schur_gemm(Hpp_flat, B, G, interpret)
        # Damping + gauge masking (identical to solve_schur).
        S = S + lam * jnp.eye(6 * W, dtype=jnp.float32)
        S = S * pm6[:, None] * pm6[None, :]
        S = S + jnp.diag(1.0 - pm6)
        rp_m = rp * pm6
        dxp_flat = chol_solve_pallas(S, -rp_m, interpret=interpret)
        dxp = dxp_flat.reshape(W, 6) * pm6.reshape(W, 6)

    rhs = lin.bl + jnp.einsum("wlab,wa->lb", lin.Hpl, dxp.astype(dtype))
    dxl = -jnp.einsum("lab,lb->la", Hll_inv, rhs)
    dxl = dxl * lm_mask[:, None].astype(dtype)

    return SchurSolution(dxp.astype(dtype), dxl, S.astype(dtype))
