"""The whole Gauss-Newton iteration as ONE Pallas kernel.

Round-4 measurement: at the production window (W=8 poses, L=64
landmarks) a GN iteration is ~300 us of *latency* — hundreds of tiny
fused XLA subgraphs at ~1-1.5 us of launch/sequencing each — while its
useful arithmetic is ~1 MFLOP.  The reference's analog is iSAM's batch
relinearize + sparse factorize (SURVEY.md §3.3 — reference mount empty,
algorithm per the iSAM IJRR'12 paper), which is equally latency-bound
on CPU but has no launch costs to pay.  The TPU answer is to run the
entire iteration chain

    analytic linearize (odom + prior + plane factors)
      -> blocked normal equations (one-hot MXU assembly)
      -> Schur elimination of landmarks (MXU GEMMs)
      -> reduced Cholesky factorize + solve (in-register panel sweep)
      -> landmark back-substitution
      -> SE(3) / S^3 retraction

K times *inside a single kernel launch*: one dispatch per keyframe BA
instead of ~2K x 10^2 fused subgraphs.

Layout: structure-of-arrays.  Entities (poses / landmarks / factors)
live on the 128-wide lane axis; every matrix component is its own
(1, 128) row; all Lie/plane algebra is the lane-parallel component
math of :mod:`.soa_math`.  Dynamic factor->variable wiring becomes
one-hot matrices built in-kernel from iota-vs-index compares, so
gathers and scatter-adds are MXU matmuls:

- variable -> factor-lane gathers:   pose/plane rows @ one-hot
- stacked whitened Jacobian rows:    expansion matmuls (static iota
  patterns) so H = J^T J, Hpl = Jp^T Jl, b = r^T J are plain GEMMs
- per-landmark Hll^-1:               closed-form adjugate, lane-wise
- block-diagonal expansion of Hll^-1 for B = Hpl Hll^-1: two-sided
  static expansion matmuls
- the reduced solve:                 :func:`..ops.cholesky_pallas.
  chol_solve_body` (the round-4 panel-blocked factorize+solve) on the
  in-register S

The kernel body (:func:`fused_gn_iterations`) is PURE jnp on 2-D
arrays, so exactly the same code runs (a) inside the Pallas kernel on
TPU, (b) under Pallas interpret mode, and (c) as a plain XLA program
on CPU — which is how the tests pin it against the reference
``gn_solve`` path to f32 tolerance (tests/test_fused_gn.py).

Semantics: identical to ``solver.gauss_newton.gn_solve`` with
``analytic_poses=True, analytic_planes=True`` and a fixed damping —
same whitening, same IRLS robust kernels, same gauge/validity
masking, same step sanitization, same retractions.

Supported (static) shapes: 6W <= 128, 3L <= 256, plane factors
F <= 128, odom+prior factors <= 64, W + n_priors <= 128.  The
production window (8, 64, 72, 8) sits comfortably inside; larger
problems fall back to the jnp/Pallas Schur paths (solver/schur.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..factors.graph import Factors, Window
from ..factors.robust import RobustConfig
from ..geometry import plane as plane_mod
from . import soa_math as sm
from .cholesky_pallas import chol_solve_body

_LANE = 128
_N3 = 256          # padded 3L column space of Hpl / W_exp


def fused_gn_supported(W: int, L: int, F: int, O: int, P: int) -> bool:
    """Static shape gate for the fused kernel."""
    return (
        6 * W <= _LANE
        and 3 * L <= _N3
        and F <= _LANE
        and O + P <= 64
        and W + P <= _LANE
    )


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


# ---------------------------------------------------------------------------
# robust kernels, lane form (ports of factors.robust)
# ---------------------------------------------------------------------------


def _irls_w(kind: str, scale: float, sq):
    if kind == "none":
        return jnp.ones_like(sq)
    k = jnp.float32(scale)
    if kind == "huber":
        nrm = jnp.sqrt(jnp.maximum(sq, 1e-20))
        return jnp.minimum(1.0, k / nrm)
    if kind == "cauchy":
        return 1.0 / (1.0 + sq / (k * k))
    raise ValueError(kind)


def _rho(kind: str, scale: float, sq):
    if kind == "none":
        return sq
    k = jnp.float32(scale)
    if kind == "huber":
        nrm = jnp.sqrt(jnp.maximum(sq, 1e-20))
        return jnp.where(nrm <= k, sq, 2.0 * k * nrm - k * k)
    if kind == "cauchy":
        return k * k * jnp.log1p(sq / (k * k))
    raise ValueError(kind)


def _dot(a, b, dims=((1,), (0,))):
    """f32 MXU contraction (both in-kernel and in plain XLA)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _iota_eq(shape, fn):
    """f32 0/1 matrix M[r, c] = fn(r, c) from 2-D iotas."""
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return fn(r, c).astype(jnp.float32)


# ---------------------------------------------------------------------------
# the kernel body (pure jnp — runs in and out of Pallas)
# ---------------------------------------------------------------------------


def fused_gn_iterations(state0, pfac, ofac, pidx, cidx, masks, lam,
                        *, dims, iters, robust: RobustConfig):
    """K fused GN iterations.  All arrays f32/(int32) in the packed
    lane layout of :func:`_pack_inputs`; ``lam`` a scalar; ``dims`` the
    static (W, L, F, OP) true sizes.  Returns (state16, cost_row)."""
    W, L, F, OP = dims
    n6 = 6 * W
    RP = _pad8(3 * F)        # stacked plane-factor row count
    RO = _pad8(6 * OP)       # stacked pose-factor row count
    f32 = jnp.float32

    # ---- loop-invariant wiring (one-hots from factor indices) ----
    pose_idx_row = pidx[0:1, :]
    lm_idx_row = pidx[1:2, :]
    oi_row = pidx[2:3, :]
    oj_row = pidx[3:4, :]
    pose_col = cidx[:, 0:1]
    lm_col = cidx[:, 1:2]
    oi_col = cidx[:, 2:3]
    oj_col = cidx[:, 3:4]
    ispr_col = cidx[:, 4:5]

    row128 = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
    col128 = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
    I128 = (row128 == col128).astype(f32)

    POSE2PF = (row128 == pose_idx_row).astype(f32)   # [p, f]
    LM2PF = (row128 == lm_idx_row).astype(f32)       # [l, f]
    P2OI = (row128 == oi_row).astype(f32)            # [p, o]
    P2OJ = (row128 == oj_row).astype(f32)            # [p, o]
    PF2LM = (col128 == lm_col).astype(f32)           # [f, l]

    CB_POSE = [(col128 == 6 * pose_col + b).astype(f32) for b in range(6)]
    # prior lanes place no J_i block (the "i" side is the constant
    # prior mean, not a variable)
    not_prior = (ispr_col == 0)
    CB_OI = [((col128 == 6 * oi_col + b) & not_prior).astype(f32)
             for b in range(6)]
    CB_OJ = [(col128 == 6 * oj_col + b).astype(f32) for b in range(6)]

    colN3 = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _N3), 1)
    CB_LM = [(colN3 == 3 * lm_col + c).astype(f32) for c in range(3)]

    EXP_A = [_iota_eq((RP, _LANE), lambda r, c, a=a: r == 3 * c + a)
             for a in range(3)]
    EXP_AT = [_iota_eq((_LANE, RP), lambda r, c, a=a: c == 3 * r + a)
              for a in range(3)]
    EXP_OA = [_iota_eq((RO, _LANE), lambda r, c, a=a: r == 6 * c + a)
              for a in range(6)]
    EXP_OAT = [_iota_eq((_LANE, RO), lambda r, c, a=a: c == 6 * r + a)
               for a in range(6)]
    EB_LM = [_iota_eq((_N3, _LANE), lambda r, c, b=b: r == 3 * c + b)
             for b in range(3)]
    EC_LM = [_iota_eq((_LANE, _N3), lambda r, c, c3=c3: c == 3 * r + c3)
             for c3 in range(3)]
    SEL_POSE = [_iota_eq((_LANE, _LANE), lambda r, c, b=b: r == 6 * c + b)
                for b in range(6)]
    SEL_LM = [_iota_eq((_N3, _LANE), lambda r, c, c3=c3: r == 3 * c + c3)
              for c3 in range(3)]

    free_row = masks[0:1, :]
    lmv_row = masks[1:2, :]
    pm_row = masks[2:3, :]                            # (1, 128) pm6
    pm_col = _dot(I128, pm_row, dims=((1,), (1,)))    # (128, 1)
    lmv3_row = sum(_dot(lmv_row, EC_LM[c]) for c in range(3))  # (1, N3)

    # plane-factor measurement channels (constant across iterations)
    nm0 = [pfac[i:i + 1, :] for i in range(3)]
    dm0 = pfac[3:4, :]
    A3 = [[pfac[4 + 3 * i + j:5 + 3 * i + j, :] for j in range(3)]
          for i in range(3)]
    pvalid = pfac[13:14, :] > 0.5

    Rm = [[ofac[3 * i + j:3 * i + j + 1, :] for j in range(3)]
          for i in range(3)]
    tm = [ofac[9 + i:10 + i, :] for i in range(3)]
    A6 = [[ofac[12 + 6 * i + j:13 + 6 * i + j, :] for j in range(6)]
          for i in range(6)]
    ovalid = ofac[48:49, :] > 0.5
    isprior = ofac[49:50, :] > 0.5

    costcol = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
    cost_row = jnp.zeros((1, _LANE), f32)

    state = state0

    def wmask(cond, x):
        return jnp.where(cond, x, 0.0)

    for it in range(iters):
        pose_rows = state[0:12, :]
        plane_rows = state[12:16, :]

        # ---- gathers: variables -> factor lanes ----
        posePF = _dot(pose_rows, POSE2PF)             # (12, 128)
        piPF = _dot(plane_rows, LM2PF)                # (4, 128)
        poseI = _dot(pose_rows, P2OI)
        poseJ = _dot(pose_rows, P2OJ)

        # =========== plane factors (port of ops/plane_jacobians) ====
        R_wc = [[posePF[3 * i + j:3 * i + j + 1, :] for j in range(3)]
                for i in range(3)]
        t_wc = [posePF[9 + i:10 + i, :] for i in range(3)]
        R_cw = sm.mT(R_wc)
        t_cw = [-x for x in sm.mv(R_cw, t_wc)]

        n_w = [piPF[i:i + 1, :] for i in range(3)]
        d_w = piPF[3:4, :]
        nc = sm.mv(R_cw, n_w)
        dc = d_w - sm.vdot(t_cw, nc)

        # canonical sign of the predicted plane (plane.normalize chain)
        tol = 1e-6
        sgn = jnp.where(
            jnp.abs(dc) > tol,
            sm.signo(dc),
            jnp.where(
                jnp.abs(nc[2]) > tol,
                sm.signo(nc[2]),
                jnp.where(jnp.abs(nc[1]) > tol, sm.signo(nc[1]),
                          sm.signo(nc[0] + 1e-30)),
            ),
        )
        nc = [sgn * v for v in nc]
        dc = sgn * dc

        c = jnp.sqrt(jnp.maximum(sm.vdot(nc, nc), 1e-18))
        inv_c = 1.0 / c
        npred = [v * inv_c for v in nc]
        dpred = dc * inv_c

        s_al = sm.signo(sm.vdot(npred, nm0))
        nm = [s_al * v for v in nm0]
        dm = s_al * dm0
        Bc0, Bc1 = sm.normal_tangent_basis_cols_soa(nm)

        r_pl = [sm.vdot(Bc0, npred), sm.vdot(Bc1, npred), dpred - dm]

        hat_np = sm.hat3(npred)
        Jn0 = [sm.vdot(Bc0, [hat_np[i][j] for i in range(3)])
               for j in range(3)]
        Jn1 = [sm.vdot(Bc1, [hat_np[i][j] for i in range(3)])
               for j in range(3)]
        zero = jnp.zeros_like(dpred)
        Jp = [
            [zero, zero, zero, Jn0[0], Jn0[1], Jn0[2]],
            [zero, zero, zero, Jn1[0], Jn1[1], Jn1[2]],
            [npred[0], npred[1], npred[2], zero, zero, zero],
        ]

        B4 = sm.tangent_basis4_soa(n_w + [d_w])
        Nmat = [[B4[i][j] for j in range(3)] for i in range(3)]
        boff = [B4[3][j] for j in range(3)]
        dnc = [
            [sgn * sum(R_cw[i][k] * Nmat[k][j] for k in range(3))
             for j in range(3)]
            for i in range(3)
        ]
        ddc = [sgn * boff[j] - sum(dnc[i][j] * t_cw[i] for i in range(3))
               for j in range(3)]
        npdnc = [sum(npred[i] * dnc[i][j] for i in range(3))
                 for j in range(3)]
        dnp = [
            [(dnc[i][j] - npred[i] * npdnc[j]) * inv_c for j in range(3)]
            for i in range(3)
        ]
        ddp = [(ddc[j] - dpred * npdnc[j]) * inv_c for j in range(3)]
        Jl = [
            [sum(Bc0[i] * dnp[i][j] for i in range(3)) for j in range(3)],
            [sum(Bc1[i] * dnp[i][j] for i in range(3)) for j in range(3)],
            [ddp[0], ddp[1], ddp[2]],
        ]

        # whiten + validity mask (where, not multiply: padded lanes)
        r_pl = [wmask(pvalid, x) for x in sm.mv(A3, r_pl)]
        JpW = [[wmask(pvalid, x) for x in row] for row in sm.mmul(A3, Jp)]
        JlW = [[wmask(pvalid, x) for x in row] for row in sm.mmul(A3, Jl)]

        # IRLS robust weight (plane family) + cost
        sq_p = sm.vdot(r_pl, r_pl)
        k_pl = robust.plane
        cost_pl = jnp.sum(_rho(k_pl.kind, k_pl.scale, sq_p))
        if k_pl.kind != "none":
            sw = jnp.sqrt(_irls_w(k_pl.kind, k_pl.scale, sq_p))
            r_pl = [x * sw for x in r_pl]
            JpW = [[x * sw for x in row] for row in JpW]
            JlW = [[x * sw for x in row] for row in JlW]

        # =========== odom + prior factors (analytic SE(3) terms) ====
        Ri = [[poseI[3 * i + j:3 * i + j + 1, :] for j in range(3)]
              for i in range(3)]
        ti = [poseI[9 + i:10 + i, :] for i in range(3)]
        Rj = [[poseJ[3 * i + j:3 * i + j + 1, :] for j in range(3)]
              for i in range(3)]
        tj = [poseJ[9 + i:10 + i, :] for i in range(3)]

        R_rel, t_rel = sm.se3_between_soa(Ri, ti, Rj, tj)
        R_err, t_err = sm.se3_between_soa(Rm, tm, R_rel, t_rel)
        rho0, phi0 = sm.se3_log_soa(R_err, t_err)
        Jr_inv = sm.se3_right_jacobian_inv_soa(rho0, phi0)
        AJ = sm.mmul(A6, Jr_inv)
        R_ji, t_ji = sm.se3_between_soa(Rj, tj, Ri, ti)
        Ad = sm.se3_adjoint_soa(R_ji, t_ji)
        Ji6 = sm.mscale(sm.mmul(AJ, Ad), -1.0)
        Jj6 = AJ
        r_o = sm.mv(A6, rho0 + phi0)

        r_o = [wmask(ovalid, x) for x in r_o]
        Ji6 = [[wmask(ovalid, x) for x in row] for row in Ji6]
        Jj6 = [[wmask(ovalid, x) for x in row] for row in Jj6]

        sq_o = sm.vdot(r_o, r_o)
        k_od, k_pr = robust.odom, robust.prior
        rho_o = jnp.where(isprior, _rho(k_pr.kind, k_pr.scale, sq_o),
                          _rho(k_od.kind, k_od.scale, sq_o))
        cost_o = jnp.sum(rho_o)
        if k_od.kind != "none" or k_pr.kind != "none":
            sw = jnp.sqrt(jnp.where(
                isprior, _irls_w(k_pr.kind, k_pr.scale, sq_o),
                _irls_w(k_od.kind, k_od.scale, sq_o)))
            r_o = [x * sw for x in r_o]
            Ji6 = [[x * sw for x in row] for row in Ji6]
            Jj6 = [[x * sw for x in row] for row in Jj6]

        # =========== stacked whitened Jacobian rows (MXU) ===========
        # one transpose-dot moves all plane comps from lanes to
        # sublanes; column slices + one-hot placements build the rows
        CompP = jnp.concatenate(
            [JpW[a][b] for a in range(3) for b in range(6)]
            + [JlW[a][cc] for a in range(3) for cc in range(3)],
            axis=0,
        )                                               # (27, 128)
        CompTP = _dot(I128, CompP, dims=((1,), (1,)))   # (128, 27)

        Jp_rows = jnp.zeros((RP, _LANE), f32)
        Jl_rows = jnp.zeros((RP, _N3), f32)
        for a in range(3):
            blk = sum(
                CompTP[:, 6 * a + b:6 * a + b + 1] * CB_POSE[b]
                for b in range(6)
            )
            Jp_rows = Jp_rows + _dot(EXP_A[a], blk)
            blkL = sum(
                CompTP[:, 18 + 3 * a + cc:19 + 3 * a + cc] * CB_LM[cc]
                for cc in range(3)
            )
            Jl_rows = Jl_rows + _dot(EXP_A[a], blkL)
        r_rowP = sum(_dot(r_pl[a], EXP_AT[a]) for a in range(3))  # (1, RP)

        CompO = jnp.concatenate(
            [Ji6[a][b] for a in range(6) for b in range(6)]
            + [Jj6[a][b] for a in range(6) for b in range(6)],
            axis=0,
        )                                               # (72, 128)
        CompTO = _dot(I128, CompO, dims=((1,), (1,)))   # (128, 72)

        Jo_rows = jnp.zeros((RO, _LANE), f32)
        for a in range(6):
            blk = sum(
                CompTO[:, 6 * a + b:6 * a + b + 1] * CB_OI[b]
                + CompTO[:, 36 + 6 * a + b:37 + 6 * a + b] * CB_OJ[b]
                for b in range(6)
            )
            Jo_rows = Jo_rows + _dot(EXP_OA[a], blk)
        r_rowO = sum(_dot(r_o[a], EXP_OAT[a]) for a in range(6))  # (1, RO)

        # =========== normal equations + Schur + solve ===============
        Hpp = (_dot(Jp_rows, Jp_rows, dims=((0,), (0,)))
               + _dot(Jo_rows, Jo_rows, dims=((0,), (0,))))
        Hpl = _dot(Jp_rows, Jl_rows, dims=((0,), (0,)))  # (128, N3)
        bp_row = _dot(r_rowP, Jp_rows) + _dot(r_rowO, Jo_rows)
        bl_row = _dot(r_rowP, Jl_rows)                   # (1, N3)

        # per-landmark Hll (lane-wise products, one-hot aggregation)
        hll = jnp.concatenate(
            [sum(JlW[i][a] * JlW[i][b] for i in range(3))
             for a in range(3) for b in range(3)],
            axis=0,
        )                                                # (9, 128)
        HllL = _dot(hll, PF2LM)                          # (9, 128)
        lmv = lmv_row > 0.5
        Hd = [[HllL[3 * a + b:3 * a + b + 1, :]
               + (lam if a == b else 0.0) for b in range(3)]
              for a in range(3)]
        eye3 = sm.meye(3, HllL[0:1, :])
        Hd = [[jnp.where(lmv, Hd[a][b], eye3[a][b]) for b in range(3)]
              for a in range(3)]

        # closed-form adjugate inverse (solver.schur.inv3x3 semantics)
        a_, b_, c_ = Hd[0]
        d_, e_, f_ = Hd[1]
        g_, h_, i_ = Hd[2]
        A00 = e_ * i_ - f_ * h_
        A01 = c_ * h_ - b_ * i_
        A02 = b_ * f_ - c_ * e_
        A10 = f_ * g_ - d_ * i_
        A11 = a_ * i_ - c_ * g_
        A12 = c_ * d_ - a_ * f_
        A20 = d_ * h_ - e_ * g_
        A21 = b_ * g_ - a_ * h_
        A22 = a_ * e_ - b_ * d_
        det = a_ * A00 + b_ * A10 + c_ * A20
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        winv = [[A00 / det, A01 / det, A02 / det],
                [A10 / det, A11 / det, A12 / det],
                [A20 / det, A21 / det, A22 / det]]

        # block-diagonal expansion of Hll^-1 -> W_exp (N3, N3)
        CompL = jnp.concatenate(
            [winv[b][cc] for b in range(3) for cc in range(3)], axis=0
        )                                                # (9, 128)
        CompTL = _dot(I128, CompL, dims=((1,), (1,)))    # (128, 9)
        W_exp = jnp.zeros((_N3, _N3), f32)
        for b in range(3):
            Mb = sum(
                CompTL[:, 3 * b + cc:3 * b + cc + 1] * EC_LM[cc]
                for cc in range(3)
            )
            W_exp = W_exp + _dot(EB_LM[b], Mb)

        B = _dot(Hpl, W_exp)                             # (128, N3)
        S = Hpp - _dot(B, Hpl, dims=((1,), (1,)))
        rp_row = bp_row - _dot(bl_row, B, dims=((1,), (1,)))

        S = S + lam * I128
        S = S * pm_row * pm_col
        S = S + (1.0 - pm_row) * I128
        rhs_row = -rp_row * pm_row

        x_row = chol_solve_body(S, rhs_row, n6)
        dxp_row = x_row * pm_row

        tmp_row = _dot(dxp_row, Hpl)                     # (1, N3)
        dxl_row = -_dot(bl_row + tmp_row, W_exp) * lmv3_row

        # sanitize_step semantics (norm bound 1e3)
        sqn = jnp.sum(dxp_row * dxp_row) + jnp.sum(dxl_row * dxl_row)
        okf = jnp.where(jnp.isfinite(sqn) & (sqn < 1e6), 1.0, 0.0)
        dxp_row = dxp_row * okf
        dxl_row = dxl_row * okf

        # =========== retract ========================================
        dxp_c = [_dot(dxp_row, SEL_POSE[b]) for b in range(6)]  # 6x(1,128)
        Rd, td = sm.se3_exp_soa(dxp_c[0:3], dxp_c[3:6])
        Rp = [[pose_rows[3 * i + j:3 * i + j + 1, :] for j in range(3)]
              for i in range(3)]
        tp = [pose_rows[9 + i:10 + i, :] for i in range(3)]
        Rn, tn = sm.se3_compose_soa(Rp, tp, Rd, td)
        fr = free_row > 0.5
        Rn = sm.mwhere(fr, Rn, Rp)
        tn = sm.vwhere(fr, tn, tp)

        dxl_c = [_dot(dxl_row, SEL_LM[cc]) for cc in range(3)]
        pi_c = [plane_rows[i:i + 1, :] for i in range(4)]
        B4r = sm.tangent_basis4_soa(pi_c)
        pi_n = [
            pi_c[i] + sum(B4r[i][cc] * dxl_c[cc] for cc in range(3))
            for i in range(4)
        ]
        pi_n = sm.plane_normalize_soa(pi_n)
        pi_n = sm.vwhere(lmv, pi_n, pi_c)

        state = jnp.concatenate(
            [Rn[i][j] for i in range(3) for j in range(3)]
            + tn + pi_n,
            axis=0,
        )                                                # (16, 128)

        cost_it = 0.5 * (cost_pl + cost_o)
        cost_row = cost_row + jnp.where(costcol == it, cost_it, 0.0)

    return state, cost_row


# ---------------------------------------------------------------------------
# Pallas wrapper + packing
# ---------------------------------------------------------------------------


def _fused_kernel(state_ref, pfac_ref, ofac_ref, pidx_ref, cidx_ref,
                  masks_ref, lam_ref, out_state_ref, out_cost_ref,
                  *, dims, iters, robust):
    state, cost = fused_gn_iterations(
        state_ref[:], pfac_ref[:], ofac_ref[:], pidx_ref[:], cidx_ref[:],
        masks_ref[:], lam_ref[0, 0], dims=dims, iters=iters, robust=robust,
    )
    out_state_ref[:] = state
    out_cost_ref[:] = cost


def _pack_inputs(window: Window, factors: Factors):
    """Lane-layout packing of the window + factor data (cheap XLA)."""
    f32 = jnp.float32
    W, L = window.window_size, window.max_landmarks
    od, pf, pr = factors.odom, factors.planes, factors.priors
    F = pf.valid.shape[0]
    O = od.valid.shape[0]
    P = pr.valid.shape[0]

    state0 = jnp.zeros((16, _LANE), f32)
    state0 = state0.at[0:9, :W].set(window.R.reshape(W, 9).T)
    state0 = state0.at[0:9, W:W + P].set(pr.R.reshape(P, 9).T)
    state0 = state0.at[9:12, :W].set(window.t.T)
    state0 = state0.at[9:12, W:W + P].set(pr.t.T)
    state0 = state0.at[12:16, :L].set(window.planes.T.astype(f32))

    n_m, d_m = plane_mod.to_hessian_normal(pf.pi_meas)
    pfac = jnp.zeros((16, _LANE), f32)
    pfac = pfac.at[0:3, :F].set(n_m.T)
    pfac = pfac.at[3, :F].set(d_m)
    pfac = pfac.at[4:13, :F].set(pf.sqrt_info.reshape(F, 9).T)
    pfac = pfac.at[13, :F].set(pf.valid.astype(f32))

    eyeP = jnp.broadcast_to(jnp.eye(3, dtype=f32), (P, 3, 3))
    ofac = jnp.zeros((56, _LANE), f32)
    ofac = ofac.at[0:9, :O].set(od.R_meas.reshape(O, 9).T)
    ofac = ofac.at[0:9, O:O + P].set(eyeP.reshape(P, 9).T)
    ofac = ofac.at[9:12, :O].set(od.t_meas.T)
    ofac = ofac.at[12:48, :O].set(od.sqrt_info.reshape(O, 36).T)
    ofac = ofac.at[12:48, O:O + P].set(pr.sqrt_info.reshape(P, 36).T)
    ofac = ofac.at[48, :O].set(od.valid.astype(f32))
    ofac = ofac.at[48, O:O + P].set(pr.valid.astype(f32))
    ofac = ofac.at[49, O:O + P].set(1.0)

    pose_idx = jnp.clip(pf.pose_idx, 0, W - 1).astype(jnp.int32)
    lm_idx = jnp.clip(pf.lm_idx, 0, L - 1).astype(jnp.int32)
    oi = jnp.concatenate(
        [jnp.clip(od.i, 0, W - 1),
         W + jnp.arange(P, dtype=jnp.int32)]
    ).astype(jnp.int32)
    oj = jnp.concatenate(
        [jnp.clip(od.j, 0, W - 1), jnp.clip(pr.idx, 0, W - 1)]
    ).astype(jnp.int32)
    ispr = jnp.concatenate(
        [jnp.zeros((O,), jnp.int32), jnp.ones((P,), jnp.int32)]
    )

    pidx = jnp.zeros((8, _LANE), jnp.int32)
    pidx = pidx.at[0, :F].set(pose_idx)
    pidx = pidx.at[1, :F].set(lm_idx)
    pidx = pidx.at[2, :O + P].set(oi)
    pidx = pidx.at[3, :O + P].set(oj)

    cidx = jnp.zeros((_LANE, 8), jnp.int32)
    cidx = cidx.at[:F, 0].set(pose_idx)
    cidx = cidx.at[:F, 1].set(lm_idx)
    cidx = cidx.at[:O + P, 2].set(oi)
    cidx = cidx.at[:O + P, 3].set(oj)
    cidx = cidx.at[:O + P, 4].set(ispr)

    free = (window.pose_valid & (~window.pose_fixed)).astype(f32)
    masks = jnp.zeros((8, _LANE), f32)
    masks = masks.at[0, :W].set(free)
    masks = masks.at[1, :L].set(window.lm_valid.astype(f32))
    masks = masks.at[2, :6 * W].set(jnp.repeat(free, 6))

    dims = (W, L, F, O + P)
    return state0, pfac, ofac, pidx, cidx, masks, dims


def _unpack_window(window: Window, state16):
    W, L = window.window_size, window.max_landmarks
    R = state16[0:9, :W].T.reshape(W, 3, 3)
    t = state16[9:12, :W].T
    planes = state16[12:16, :L].T
    dtype = window.t.dtype
    return window._replace(
        R=R.astype(dtype), t=t.astype(dtype), planes=planes.astype(dtype)
    )


def fused_gn_solve(
    window: Window,
    factors: Factors,
    iters: int = 2,
    damping: float | jnp.ndarray = 1e-5,
    robust: RobustConfig | None = None,
    use_pallas: bool | None = None,
    interpret: bool | None = None,
):
    """Drop-in replacement for ``gn_solve`` at fused-supported shapes.

    Returns (window_opt, costs (iters,)) — ``costs[k]`` is the
    robustified objective at the k-th linearization point (the same
    series ``gn_solve``'s ``cost_history[:-1]`` reports).

    ``use_pallas=None`` auto-selects: the single-launch kernel on TPU,
    the identical pure-jnp body elsewhere (the body IS the kernel body,
    so CPU tests exercise the same code path XLA-compiled).
    """
    if robust is None:
        robust = RobustConfig()
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    state0, pfac, ofac, pidx, cidx, masks, dims = _pack_inputs(
        window, factors
    )
    lam = jnp.asarray(damping, jnp.float32)

    if use_pallas:
        state16, cost_row = pl.pallas_call(
            functools.partial(_fused_kernel, dims=dims, iters=iters,
                              robust=robust),
            out_shape=(
                jax.ShapeDtypeStruct((16, _LANE), jnp.float32),
                jax.ShapeDtypeStruct((1, _LANE), jnp.float32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
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
        )(state0, pfac, ofac, pidx, cidx, masks, lam.reshape(1, 1))
    else:
        state16, cost_row = fused_gn_iterations(
            state0, pfac, ofac, pidx, cidx, masks, lam,
            dims=dims, iters=iters, robust=robust,
        )

    return _unpack_window(window, state16), cost_row[0, :iters]
