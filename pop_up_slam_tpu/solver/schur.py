"""Schur-complement elimination of plane landmarks + reduced-system solve.

This is the TPU-native replacement for iSAM's incremental sparse QR
(SURVEY.md §3.3 / §7 "Schur structure is the kernel target"): with
H = [[Hpp, Hpl], [Hpl^T, Hll]] and Hll block-diagonal 3x3 per plane,
the landmarks are eliminated in closed form:

    S  = Hpp - Hpl Hll^-1 Hpl^T          (reduced camera system)
    rp = bp  - Hpl Hll^-1 bl
    S dxp = -rp ;   dxl = -Hll^-1 (bl + Hpl^T dxp)

Shapes are fixed (W poses x L landmarks); invalid/gauge-fixed blocks
are masked.  The batched 3x3 inverses use the closed-form adjugate.
The blocked-GEMM accumulation of S and the reduced-system Cholesky have
Pallas implementations in ``pop_up_slam_tpu.ops``; this module is the
reference path (pure jnp) they are tested against, and dispatches to
them when enabled.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..factors.graph import Linearization, Window


def inv3x3(A: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse via the adjugate. A: (..., 3, 3)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A00 = e * i - f * h
    A01 = c * h - b * i
    A02 = b * f - c * e
    A10 = f * g - d * i
    A11 = a * i - c * g
    A12 = c * d - a * f
    A20 = d * h - e * g
    A21 = b * g - a * h
    A22 = a * e - b * d
    det = a * A00 + b * A10 + c * A20
    safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A00, A01, A02], -1),
            jnp.stack([A10, A11, A12], -1),
            jnp.stack([A20, A21, A22], -1),
        ],
        -2,
    )
    return adj / safe[..., None, None]


class SchurSolution(NamedTuple):
    dxp: jnp.ndarray  # (W, 6) pose updates
    dxl: jnp.ndarray  # (L, 3) landmark updates
    S: jnp.ndarray    # (6W, 6W) reduced camera system (diagnostics/tests)


def solve_schur(
    lin: Linearization,
    window: Window,
    damping: float | jnp.ndarray = 1e-6,
) -> SchurSolution:
    """Eliminate landmarks, solve the reduced pose system, back-substitute.

    Gauge handling: rows/cols of gauge-fixed or invalid poses are masked
    out of S and replaced by identity diagonal (their update is 0); the
    same for invalid landmarks in Hll.
    """
    W, L = lin.bp.shape[0], lin.bl.shape[0]
    dtype = lin.bp.dtype
    lam = jnp.asarray(damping, dtype)

    # Landmark block inverses with damping; invalid landmarks -> identity.
    eye3 = jnp.eye(3, dtype=dtype)
    Hll = lin.Hll + lam * eye3
    lm_mask = window.lm_valid
    Hll = jnp.where(lm_mask[:, None, None], Hll, eye3)
    Hll_inv = inv3x3(Hll)

    # Schur complement: S = Hpp - Hpl Hll^-1 Hpl^T (blocked einsum — the
    # Pallas kernel computes the same contraction tile-wise in VMEM).
    HplWinv = jnp.einsum("wlab,lbc->wlac", lin.Hpl, Hll_inv)
    S_blocks = lin.Hpp - jnp.einsum("wlac,vlbc->wvab", HplWinv, lin.Hpl)
    rp = lin.bp - jnp.einsum("wlab,lb->wa", HplWinv, lin.bl)

    # Damping on the pose diagonal.
    eye6 = jnp.eye(6, dtype=dtype)
    diag_ix = jnp.arange(W)
    S_blocks = S_blocks.at[diag_ix, diag_ix].add(lam * eye6)

    # Mask gauge-fixed / invalid poses.
    free = window.pose_valid & (~window.pose_fixed)
    pm = free.astype(dtype)
    S_blocks = S_blocks * pm[:, None, None, None] * pm[None, :, None, None]
    S_blocks = S_blocks.at[diag_ix, diag_ix].add(
        (1.0 - pm)[:, None, None] * eye6
    )
    rp = rp * pm[:, None]

    # Dense solve of the reduced system via Cholesky.
    S = S_blocks.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
    rp_flat = rp.reshape(6 * W)
    chol = jnp.linalg.cholesky(S)
    y = jax.scipy.linalg.solve_triangular(chol, -rp_flat, lower=True)
    dxp_flat = jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)
    dxp = dxp_flat.reshape(W, 6) * pm[:, None]

    # Back-substitute landmarks: dxl = -Hll^-1 (bl + Hpl^T dxp).
    rhs = lin.bl + jnp.einsum("wlab,wa->lb", lin.Hpl, dxp)
    dxl = -jnp.einsum("lab,lb->la", Hll_inv, rhs)
    dxl = dxl * lm_mask[:, None].astype(dtype)

    return SchurSolution(dxp, dxl, S)


def spd_inv6_blocked(H: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Closed-form 6x6 SPD inverse via 3x3 block elimination.

    inv([[A, B], [B^T, D]]) built from two :func:`inv3x3` calls and a
    handful of 3x3 matmuls — an order of magnitude fewer dispatched ops
    than a substitution chain, which is what matters on a latency-bound
    TPU for the tiny systems in marginalization/covariance paths."""
    A = H[..., :3, :3]
    B = H[..., :3, 3:]
    D = H[..., 3:, 3:]
    Ai = inv3x3(A, eps)
    AiB = Ai @ B
    S = D - jnp.swapaxes(B, -1, -2) @ AiB
    Si = inv3x3(S, eps)
    TR = -AiB @ Si                       # top-right block
    TL = Ai - TR @ jnp.swapaxes(AiB, -1, -2)
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(TR, -1, -2), Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def chol_small(A: jnp.ndarray) -> jnp.ndarray:
    """Unrolled Cholesky of a small static SPD matrix (lower factor).

    ``jnp.linalg.cholesky`` lowers to an XLA custom-call with a While
    loop — tens of microseconds of launch/sequencing for a 6x6 on TPU.
    For the static tiny systems in marginalization and covariance
    recovery this fully-unrolled version fuses into the surrounding
    program.  A ~1e-12 pivot floor keeps padded/degenerate inputs
    finite (callers floor their own systems properly)."""
    import numpy as np

    n = A.shape[-1]
    # Right-looking, vectorized per column: n steps of (n,)-vector ops
    # (scalar-unrolled substitution is ~3x more sequential latency).
    L = jnp.zeros_like(A)
    for j in range(n):
        d = jnp.sqrt(jnp.maximum(A[..., j, j], 1e-12))
        col = jnp.where(
            np.arange(n) >= j, A[..., :, j] / d[..., None], 0.0
        )                                                  # (..., n)
        L = L.at[..., :, j].set(col)
        A = A - col[..., :, None] * col[..., None, :]
    return L


def cho_solve_small(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) X = B by substitution, vectorized over the RHS
    columns and the row dimension (n steps of (n, m) updates).

    L: (..., n, n) lower from :func:`chol_small`; B: (..., n, m)."""
    import numpy as np

    n = L.shape[-1]
    rows = np.arange(n)
    # forward: L Y = B
    Y = B
    for i in range(n):
        yi = Y[..., i, :] / L[..., i, i, None]
        upd = jnp.where((rows > i)[:, None], L[..., :, i, None] * yi[..., None, :], 0.0)
        Y = Y.at[..., i, :].set(yi) - upd
    # backward: L^T X = Y
    X = Y
    for i in range(n - 1, -1, -1):
        xi = X[..., i, :] / L[..., i, i, None]
        upd = jnp.where((rows < i)[:, None], L[..., i, :, None] * xi[..., None, :], 0.0)
        X = X.at[..., i, :].set(xi) - upd
    return X


# Pallas-Schur vs jnp auto-dispatch, calibrated round-5 on a v5e with
# the resident interleaved A/B harness (scripts/calibrate_dispatch.py,
# medians of 7, us per 2-iteration solve):
#
#     W   L   6W*3L |  jnp  pschur  fused
#     8   64   9216 |  432    442    282   <- fused takes this shape
#    12  128  27648 |  575    550     —
#    16  128  36864 |  541    569     —
#    16  256  73728 |  597    642     —
#    32  256 147456 |  870    955     —
#
# The kernel wins only in a narrow band: enough Schur-GEMM work
# (6W*3L >= ~16k) but a reduced system small enough (6W <= ~80) that
# the in-kernel panel factorization's serial substitution sweeps stay
# cheap; beyond that the XLA Cholesky custom call wins.  (The fused
# whole-iteration kernel, not this dispatch, owns the production
# window — see ops/fused_gn.py.)
PALLAS_CROSSOVER = 16384
PALLAS_MAX_N6 = 80


def make_solve_fn(pallas: str = "auto"):
    """Select the reduced-system solver implementation.

    ``pallas``:
      - ``"auto"``: on TPU backends, dispatch per problem size — the
        fused Pallas Schur+Cholesky kernel where it measures faster
        (interleaved A/B on a v5e chip: 1.05x at W=12/L=128 and larger,
        ~parity +-4% at W=8/L=64 where jnp's in-program path avoids the
        kernel-launch overhead), jnp below the crossover.  Pure jnp on
        non-TPU backends (CPU interpret-mode Pallas is correct but
        slow — tests exercise it explicitly).
      - ``"on"`` / ``"off"``: force one path.

    All paths are drop-in ``solve_fn``s for the GN/LM/dog-leg drivers
    and match to fp tolerance (tests/test_ops.py).  The (W, L) check
    happens at trace time (static shapes), so the dispatch costs
    nothing at runtime.
    """
    if pallas not in ("auto", "on", "off"):
        raise ValueError(f"pallas must be auto|on|off, got {pallas!r}")
    if pallas == "off" or (pallas == "auto"
                           and jax.default_backend() != "tpu"):
        return solve_schur
    from ..ops.schur_pallas import schur_reduce_pallas

    if pallas == "on":
        return schur_reduce_pallas

    # Empirical crossover: Schur GEMM work 6W * 3L (v5e measurements
    # above).  Below it the launch overhead eats the fusion win.
    def auto_fn(lin, window, damping=1e-6):
        W, L = lin.bp.shape[0], lin.bl.shape[0]
        if 6 * W * 3 * L >= PALLAS_CROSSOVER and 6 * W <= PALLAS_MAX_N6:
            return schur_reduce_pallas(lin, window, damping)
        return solve_schur(lin, window, damping)

    return auto_fn


def solve_dense(lin: Linearization, window: Window, damping=1e-6):
    """Reference: solve the full (6W + 3L) dense system without Schur.

    Used only in tests to validate the Schur path (SURVEY.md §4 item 1).
    """
    W, L = lin.bp.shape[0], lin.bl.shape[0]
    dtype = lin.bp.dtype
    n = 6 * W + 3 * L
    H = jnp.zeros((n, n), dtype)
    H = H.at[: 6 * W, : 6 * W].set(
        lin.Hpp.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
    )
    H = H.at[: 6 * W, 6 * W :].set(
        lin.Hpl.transpose(0, 2, 1, 3).reshape(6 * W, 3 * L)
    )
    H = H.at[6 * W :, : 6 * W].set(
        lin.Hpl.transpose(0, 2, 1, 3).reshape(6 * W, 3 * L).T
    )
    Hll = jax.scipy.linalg.block_diag(*[lin.Hll[i] for i in range(L)])
    H = H.at[6 * W :, 6 * W :].set(Hll)
    b = jnp.concatenate([lin.bp.reshape(-1), lin.bl.reshape(-1)])

    free_p = (window.pose_valid & (~window.pose_fixed))
    mask = jnp.concatenate(
        [
            jnp.repeat(free_p, 6),
            jnp.repeat(window.lm_valid, 3),
        ]
    ).astype(dtype)
    H = H * mask[:, None] * mask[None, :]
    H = H + jnp.diag((1.0 - mask) + mask * damping)
    b = b * mask
    dx = jnp.linalg.solve(H, -b)
    return dx[: 6 * W].reshape(W, 6), dx[6 * W :].reshape(L, 3)
