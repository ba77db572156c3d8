"""Fused blocked Cholesky factorize + solve as one Pallas kernel.

Replaces the reference's sparse QR/Cholesky of the reduced system
(iSAM ``SparseSystem``; SURVEY.md §2.1/§3.3 — reference mount empty,
algorithm per the iSAM IJRR'12 paper) for the TPU: the reduced camera
system S (6W x 6W, a few hundred at most) fits entirely in VMEM, so
factorization + forward/backward substitution run as ONE kernel launch
with zero HBM round-trips between the three stages — the fusion
``jnp.linalg.cholesky`` + two ``solve_triangular`` calls cannot give
(each is a separate XLA custom call through HBM).

Algorithm: right-looking **panel-blocked** Cholesky computing the
*upper* factor U (A = U^T U).  The true system size ``n_real`` is
static (the window is a compile-time shape), so the whole
factorization unrolls with static slices and compile-time masks — no
``fori_loop``, no dynamic-slice addressing:

- per 8-row panel, an in-register unrolled factorization of the panel
  rows (rank-1 updates confined to the panel),
- ONE MXU ``dot_general`` per panel for the trailing-matrix update
  (``A -= Up^T Up``; already-consumed rows are updated too — harmless,
  they are never read again — which removes every mask from the hot
  GEMM),
- the forward substitution fused into the panel sweep, the backward
  substitution panelized the same way (one wide masked mat-vec per
  panel + 8 short in-panel steps).

Versus the round-3 scalar-sequential version (48 ``fori_loop`` steps of
full-width rank-1 updates at W=8) this replaces O(n) serial VPU sweeps
over the full tile with O(n/8) MXU ops plus panel-local work.

:func:`chol_solve_body` is the kernel *body*, shared with the fused
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
_PANEL = 8


def chol_solve_body(A, y, n_real: int):
    """Factorize SPD ``A`` (n, n) and solve for rhs ``y`` (1, n), all as
    in-register values; returns x (1, n).

    Kernel-body helper shared with :mod:`schur_pallas`.  ``n_real`` (the
    true system size) is static, so every slice and mask below is
    compile-time — no ``fori_loop``, no dynamic addressing.  The padded
    tail [n_real, n) is never visited and its solution entries stay 0.
    """
    n = A.shape[0]
    f32 = jnp.float32
    # compile-time-known iotas (static comparisons against python ints;
    # numpy constants cannot be captured by a pallas kernel body)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    # Modified-Cholesky pivot floor: a pivot at/below ~roundoff of the
    # matrix scale means the direction is numerically unconstrained or
    # the f32-formed system is locally indefinite (possible for a Schur
    # complement formed in f32 even though the exact one is PSD).  Such
    # directions get U row e_g and solution 0 — the solve simply skips
    # them instead of emitting NaN/garbage that would poison the state.
    mdiag = jnp.max(jnp.where(rows == cols, A, -jnp.inf))
    thresh = 1e-7 * jnp.maximum(mdiag, 1.0)
    U_rows = []

    for kp in range(0, n_real, _PANEL):
        p_end = min(kp + _PANEL, n_real)
        p = p_end - kp
        Ap = A[kp:p_end, :]                            # (p, n) static slice
        prow = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        for i in range(p):
            g = kp + i
            row = Ap[i:i + 1, :]                       # (1, n)
            pivot = jnp.sum(jnp.where(cols == g, row, 0.0))
            good = pivot > thresh
            inv_sqrt = jnp.where(
                good, jax.lax.rsqrt(jnp.maximum(pivot, 1e-20)), 0.0
            )
            u = jnp.where(cols >= g, row * inv_sqrt, 0.0)   # U[g, g:]
            # skipped direction: identity row, solution entry -> 0
            u = jnp.where(good, u,
                          jnp.where(cols == g, 1.0, 0.0).astype(f32))
            U_rows.append(u)
            if i + 1 < p:
                # in-panel trailing rows j > i: Ap[j] -= U[g, g_j] * u.
                # U[g, g_j] = Ap[j, g] * inv_sqrt by symmetry of the
                # trailing matrix — a width-1 column slice, no transpose.
                m = Ap[:, g:g + 1] * inv_sqrt          # (p, 1) multipliers
                Ap = Ap - jnp.where(prow > i, m * u, 0.0)
            # fused forward solve U^T y = b
            yk = jnp.sum(jnp.where(cols == g, y, 0.0)) * inv_sqrt
            y = jnp.where(cols == g, yk,
                          y - jnp.where(cols > g, u * yk, 0.0))
        # trailing update below the panel: one MXU GEMM, unmasked —
        # rows <= p_end are already consumed, updating them is harmless
        Up = jnp.concatenate(U_rows[-p:], axis=0) if p > 1 else U_rows[-1]
        A = A - jax.lax.dot_general(
            Up, Up, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    # Backward solve U x = y: static per-row sweep (masked-sum scalar
    # extraction; the sequential chain is n_real VPU reduces).
    x = jnp.zeros((1, n), f32)
    for g in range(n_real - 1, -1, -1):
        u = U_rows[g]                                  # (1, n)
        ukk = jnp.sum(jnp.where(cols == g, u, 0.0))
        yk = jnp.sum(jnp.where(cols == g, y, 0.0))
        dot = jnp.sum(jnp.where(cols > g, u * x, 0.0))
        xk = (yk - dot) / jnp.where(jnp.abs(ukk) < 1e-20, 1e-20, ukk)
        x = jnp.where(cols == g, xk, x)
    return x


def chol_solve_inplace(A_scr, y_scr, x_ref, n_real: int):
    """Ref-based wrapper around :func:`chol_solve_body`."""
    x_ref[:] = chol_solve_body(A_scr[:], y_scr[:], n_real)


def _chol_solve_kernel(S_ref, b_ref, x_ref, *, n_real: int):
    x_ref[:] = chol_solve_body(S_ref[:], b_ref[:], n_real)


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
        interpret=interpret,
    )(Sp, bp)
    return x[0, :n].astype(S.dtype)
