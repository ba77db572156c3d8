"""Fused blocked Cholesky factorize + solve as one Pallas kernel.

Replaces the reference's sparse QR/Cholesky of the reduced system
(iSAM ``SparseSystem``; SURVEY.md §2.1/§3.3 — reference mount empty,
algorithm per the iSAM IJRR'12 paper) for the TPU: the reduced camera
system S (6W x 6W, a few hundred at most) fits entirely in VMEM, so
factorization + forward/backward substitution run as ONE kernel launch
with zero HBM round-trips between the three stages — the fusion
``jnp.linalg.cholesky`` + two ``solve_triangular`` calls cannot give
(each is a separate XLA custom call through HBM).

Algorithm: right-looking unblocked Cholesky computing the *upper*
factor U (A = U^T U) row by row — row access is a dynamic sublane
slice, cheap on TPU, whereas column access would be a lane-dimension
gather.  The trailing-matrix rank-1 update and the forward solve are
full-width masked VPU ops; total work O(n^3) with n <= a few hundred.

:func:`chol_solve_inplace` is the kernel *body*, shared with the fused
small-window Schur kernel in :mod:`schur_pallas` (which forms S in VMEM
and factorizes it without ever writing S to HBM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def chol_solve_inplace(A_scr, U_scr, y_scr, x_ref, n_real: int):
    """Factorize A (preloaded in ``A_scr``) and solve for the rhs
    preloaded in ``y_scr``; the solution lands in ``x_ref``.

    Kernel-body helper: all arguments are VMEM refs of one lane-padded
    tile.  Loop bounds stop at ``n_real`` (the true system size): the
    padded tail is an identity diagonal with zero rhs, so its
    factorization rows are e_k and its solution entries are exactly the
    zeros ``x_ref`` starts with.
    """
    n = A_scr.shape[0]
    f32 = jnp.float32
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    colf = col.astype(f32)

    U_scr[:] = jnp.zeros((n, n), f32)

    def fact_step(k, _):
        row = A_scr[pl.ds(k, 1), :]                     # (1, n)
        kf = k.astype(f32)
        pivot = jnp.sum(jnp.where(col == k, row, 0.0))
        inv_sqrt = jax.lax.rsqrt(jnp.maximum(pivot, 1e-20))
        u = jnp.where(colf >= kf, row * inv_sqrt, 0.0)  # U[k, k:]
        U_scr[pl.ds(k, 1), :] = u

        # Trailing update A[k+1:, k+1:] -= u^T u (masked full-width).
        ut = u.reshape(n, 1)
        rowmask = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) > k
        A_scr[:] = A_scr[:] - jnp.where(
            rowmask & (col > k), ut * u, 0.0
        )

        # Fused forward solve U^T y = b: scale y_k, eliminate from the
        # rest of the row vector.
        yrow = y_scr[:]                                  # (1, n)
        yk = jnp.sum(jnp.where(col == k, yrow, 0.0)) * inv_sqrt
        y_scr[:] = jnp.where(
            col == k, yk, yrow - jnp.where(colf > kf, u * yk, 0.0)
        )
        return 0

    jax.lax.fori_loop(0, n_real, fact_step, 0)

    # Backward solve U x = y.
    x_ref[:] = jnp.zeros((1, n), f32)

    def back_step(i, _):
        k = n_real - 1 - i
        kf = k.astype(f32)
        u = U_scr[pl.ds(k, 1), :]                        # (1, n)
        ukk = jnp.sum(jnp.where(col == k, u, 0.0))
        yk = jnp.sum(jnp.where(col == k, y_scr[:], 0.0))
        dot = jnp.sum(jnp.where(colf > kf, u * x_ref[:], 0.0))
        xk = (yk - dot) / jnp.where(jnp.abs(ukk) < 1e-20, 1e-20, ukk)
        x_ref[:] = jnp.where(col == k, xk, x_ref[:])
        return 0

    jax.lax.fori_loop(0, n_real, back_step, 0)


def _chol_solve_kernel(S_ref, b_ref, x_ref, A_scr, U_scr, y_scr, *,
                       n_real: int):
    A_scr[:] = S_ref[:]
    y_scr[:] = b_ref[:]
    chol_solve_inplace(A_scr, U_scr, y_scr, x_ref, n_real)


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_solve_pallas(
    S: jnp.ndarray, b: jnp.ndarray, interpret: bool | None = None
) -> jnp.ndarray:
    """Solve S x = b for SPD S via one fused Pallas kernel.

    S: (n, n), b: (n,).  Pads n to a lane multiple; the padded diagonal
    is identity so the factorization stays SPD and padded solution
    entries are zero.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = S.shape[0]
    npad = -(-n // _LANE) * _LANE
    Sp = jnp.zeros((npad, npad), jnp.float32)
    Sp = Sp.at[:n, :n].set(S.astype(jnp.float32))
    Sp = Sp.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(1.0)
    bp = jnp.zeros((1, npad), jnp.float32).at[0, :n].set(
        b.astype(jnp.float32)
    )

    x = pl.pallas_call(
        functools.partial(_chol_solve_kernel, n_real=n),
        out_shape=jax.ShapeDtypeStruct((1, npad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((npad, npad), jnp.float32),
            pltpu.VMEM((npad, npad), jnp.float32),
            pltpu.VMEM((1, npad), jnp.float32),
        ],
        interpret=interpret,
    )(Sp, bp)
    return x[0, :n].astype(S.dtype)
