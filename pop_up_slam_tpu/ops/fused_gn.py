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

**Even the input/output packing happens in-kernel** (round-5 rev 2):
the kernel takes the solver state and factor arrays in (entity, comp)
row-major 2-D form — free reshapes of the live buffers — and builds
the lane layout itself with iota-placed transpose matmuls
(``entity-sublane x comp-lane  @  iota-one-hot  ->  comp-row x
entity-lane``).  The first revision packed lanes with ~30 tiny XLA ops
before the launch, which measured ~100 us — half the solve time — on
the latency-bound chip; in-kernel packing collapses that to a handful
of sub-microsecond MXU ops inside the one launch.

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
from . import soa_math as sm
from .cholesky_pallas import chol_solve_body

_LANE = 128
_N3 = 256          # padded 3L column space of Hpl / W_exp
_OLANE = 64        # pose-factor (odom + prior) lane capacity


def fused_gn_supported(W: int, L: int, F: int, O: int, P: int) -> bool:
    """Static shape gate for the fused kernel."""
    return (
        6 * W <= _LANE
        and 3 * L <= _N3
        and F <= _LANE
        and O + P <= _OLANE
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


def _lane_eq(n: int, off: int, lanes: int = _LANE):
    """(n, lanes) placer: [r, lane] = (lane == off + r)."""
    return _iota_eq((n, lanes), lambda r, c: c == off + r)


def _dT(M, EQ):
    """(n, k) entity-major block -> (k, lanes) comp rows, entities
    placed on lanes by the iota one-hot ``EQ`` (n, lanes)."""
    return _dot(M, EQ, dims=((0,), (0,)))


def _rowT(I, row):
    """(1, lanes) row -> (lanes, 1) column via the identity dot."""
    return _dot(I, row, dims=((1,), (1,)))


# ---------------------------------------------------------------------------
# the kernel body (pure jnp — runs in and out of Pallas)
# ---------------------------------------------------------------------------


def fused_gn_iterations(
    R2, tW, PL,
    prR, prt, prA,
    pfpi, pfA,
    odR, odt, odA,
    BOOLS, IDX, MARG,
    lam, *, dims, iters, robust: RobustConfig,
    fuse_marg: bool = False, marg_static=None,
):
    """K fused GN iterations on raw (entity, comp) 2-D blocks.

    All lane packing happens here (in-kernel when wrapped by Pallas):
    iota-placed transpose matmuls move each block to comp-row x
    entity-lane layout.  ``BOOLS`` is the concatenated 0/1 column
    [pose_valid(W); pose_fixed(W); lm_valid(L); pf_valid(F);
    od_valid(O); prior_valid(P)]; ``IDX`` the concatenated int32
    column [pf_pose(F); pf_lm(F); od_i(O); od_j(O); prior_idx(P)]
    (out-of-range indices simply never match an iota placement, which
    is equivalent to the masked-out semantics).  ``lam`` a scalar;
    ``dims`` the static (W, L, F, O, P) true sizes.  Returns
    (out_pose (128, 12) rows = pose lanes, cols = [R row-major 9 |
    t 3]; out_plane (128, 4); cost_row (1, 128))."""
    W, L, F, O, P = dims
    OP = O + P
    n6 = 6 * W
    RP = _pad8(3 * F)        # stacked plane-factor row count
    RO = _pad8(6 * OP)       # stacked pose-factor row count
    f32 = jnp.float32

    # ---- in-kernel packing: entity blocks -> comp rows on lanes ----
    EQ_W = _lane_eq(W, 0)
    EQ_PW = _lane_eq(P, W)
    EQ_L = _lane_eq(L, 0)
    EQ_F = _lane_eq(F, 0)
    EQ_O = _lane_eq(O, 0)
    EQ_PO = _lane_eq(P, O)

    # slice the concatenated mask / index columns (static offsets)
    pval = BOOLS[0:W, :]
    pfix = BOOLS[W:2 * W, :]
    lmv = BOOLS[2 * W:2 * W + L, :]
    pfv = BOOLS[2 * W + L:2 * W + L + F, :]
    odv = BOOLS[2 * W + L + F:2 * W + L + F + O, :]
    prv = BOOLS[2 * W + L + F + O:2 * W + L + F + O + P, :]
    pfpose = IDX[0:F, :]
    pflm = IDX[F:2 * F, :]
    odi = IDX[2 * F:2 * F + O, :]
    odj = IDX[2 * F + O:2 * F + 2 * O, :]
    pridx = IDX[2 * F + 2 * O:2 * F + 2 * O + P, :]

    poseR = _dT(R2, EQ_W) + _dT(prR, EQ_PW)              # (9, 128)
    poset = _dT(tW, EQ_W) + _dT(prt, EQ_PW)              # (3, 128)
    planeT = _dT(PL, EQ_L)                               # (4, 128)
    state = jnp.concatenate([poseR, poset, planeT], axis=0)  # (16, 128)

    free_row = _dT(pval, EQ_W) * (1.0 - _dT(pfix, EQ_W))  # (1, 128)
    lmv_row = _dT(lmv, EQ_L)

    row128 = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
    col128 = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
    I128 = (row128 == col128).astype(f32)
    row128f = row128.astype(f32)
    col128f = col128.astype(f32)

    # pm6[c] = free[c // 6] for c < 6W
    M6 = _iota_eq(
        (_LANE, _LANE),
        lambda r, c: (c >= 6 * r) & (c < 6 * r + 6) & (c < 6 * W)
        & (r < W),
    )
    pm_row = _dot(free_row, M6)                           # (1, 128)
    pm_col = _rowT(I128, pm_row)                          # (128, 1)

    # plane-factor measurement channels (hessian-normal form)
    pimT = _dT(pfpi, EQ_F)                                # (4, 128)
    n_raw = [pimT[i:i + 1, :] for i in range(3)]
    nn = jnp.maximum(
        jnp.sqrt(sm.vdot(n_raw, n_raw)), 1e-9
    )                                                     # plane._EPS
    nm0 = [x / nn for x in n_raw]
    dm0 = pimT[3:4, :] / nn
    AT3 = _dT(pfA, EQ_F)                                  # (9, 128)
    A3 = [[AT3[3 * i + j:3 * i + j + 1, :] for j in range(3)]
          for i in range(3)]
    pvalid = _dT(pfv, EQ_F) > 0.5

    # odom + prior lanes
    prior_lane = jnp.sum(EQ_PO, axis=0, keepdims=True)    # (1, 128)
    RmT = _dT(odR, EQ_O)                                  # (9, 128)
    Rm = [[RmT[3 * i + j:3 * i + j + 1, :]
           + (prior_lane if i == j else 0.0) for j in range(3)]
          for i in range(3)]
    tmT = _dT(odt, EQ_O)
    tm = [tmT[i:i + 1, :] for i in range(3)]
    AT6 = _dT(odA, EQ_O) + _dT(prA, EQ_PO)                # (36, 128)
    A6 = [[AT6[6 * i + j:6 * i + j + 1, :] for j in range(6)]
          for i in range(6)]
    ovalid = (_dT(odv, EQ_O) + _dT(prv, EQ_PO)) > 0.5
    isprior = prior_lane > 0.5

    # ---- fused exiting-keyframe marginalization (pipeline/slam.py
    # _marginalize_oldest, computed in-kernel on a single "lane" of
    # (1,1) scalars — the host-side chain was ~85 us of serial tiny
    # ops per keyframe).  Folds the pre-roll slot-0 prior + exiting
    # odometry factor into a 6-DOF marginal sqrt-info; when the
    # window-full flag is set, the solve's prior lane uses the new
    # marginal (mean = pre-roll slot-1 pose), else the old prior.
    out_marg = jnp.zeros((8, _LANE), f32)
    if fuse_marg:
        adiag, eps_m, floor_m = marg_static
        g = lambda r, k: MARG[r:r + 1, k:k + 1]           # noqa: E731
        R0n = [[g(0, 3 * i + j) for j in range(3)] for i in range(3)]
        t0n = [g(0, 9 + i) for i in range(3)]
        R1n = [[g(1, 3 * i + j) for j in range(3)] for i in range(3)]
        t1n = [g(1, 9 + i) for i in range(3)]
        Rmn = [[g(2, 3 * i + j) for j in range(3)] for i in range(3)]
        tmn = [g(2, 9 + i) for i in range(3)]
        ov0 = g(3, 0)
        fullf = g(3, 1)
        prRo = [[g(4, 3 * i + j) for j in range(3)] for i in range(3)]
        prto = [g(4, 9 + i) for i in range(3)]
        prAo = [[g(5 + (6 * i + j) // 16, (6 * i + j) % 16)
                 for j in range(6)] for i in range(6)]

        A_o = [[jnp.full((1, 1), adiag[i], f32) if i == j
                else jnp.zeros((1, 1), f32) for j in range(6)]
               for i in range(6)]
        Rr, tr = sm.se3_between_soa(R0n, t0n, R1n, t1n)
        Re, te = sm.se3_between_soa(Rmn, tmn, Rr, tr)
        rh0, ph0 = sm.se3_log_soa(Re, te)
        AJm = sm.mmul(A_o, sm.se3_right_jacobian_inv_soa(rh0, ph0))
        R10, t10 = sm.se3_between_soa(R1n, t1n, R0n, t0n)
        Adm = sm.se3_adjoint_soa(R10, t10)
        ovb = ov0 > 0.5
        J0m = [[jnp.where(ovb, x, 0.0) for x in row]
               for row in sm.mscale(sm.mmul(AJm, Adm), -1.0)]
        J1m = [[jnp.where(ovb, x, 0.0) for x in row] for row in AJm]

        Rpe, tpe = sm.se3_between_soa(prRo, prto, R0n, t0n)
        rhp, php = sm.se3_log_soa(Rpe, tpe)
        Jqm = sm.mmul(prAo, sm.se3_right_jacobian_inv_soa(rhp, php))

        H00 = sm.madd(sm.mmul(sm.mT(J0m), J0m),
                      sm.mmul(sm.mT(Jqm), Jqm))
        H00 = [[H00[i][j] + (eps_m if i == j else 0.0)
                for j in range(6)] for i in range(6)]
        H01 = sm.mmul(sm.mT(J0m), J1m)
        H11 = sm.mmul(sm.mT(J1m), J1m)
        Hm = sm.msub(
            H11, sm.mmul(sm.mmul(sm.mT(H01), sm.spd_inv6_soa(H00)), H01)
        )
        Hm = [[0.5 * (Hm[i][j] + Hm[j][i])
               + (floor_m if i == j else 0.0)
               for j in range(6)] for i in range(6)]
        Lm = sm.chol_lower_soa(Hm, 6)
        sqrt_new = [[Lm[j][i] for j in range(6)] for i in range(6)]

        # selection by the (traced) window-full flag
        Asel = [[fullf * sqrt_new[i][j] + (1.0 - fullf) * prAo[i][j]
                 for j in range(6)] for i in range(6)]
        Rsel = [[fullf * R1n[i][j] + (1.0 - fullf) * prRo[i][j]
                 for j in range(3)] for i in range(3)]
        tsel = [fullf * t1n[i] + (1.0 - fullf) * prto[i]
                for i in range(3)]

        # override the prior lane(s): whitening + mean
        A6 = [[A6[i][j] * (1.0 - prior_lane) + Asel[i][j] * prior_lane
               for j in range(6)] for i in range(6)]
        laneW = jnp.sum(EQ_PW, axis=0, keepdims=True)      # (1, 128)
        poseR = jnp.concatenate(
            [poseR[3 * i + j:3 * i + j + 1, :] * (1.0 - laneW)
             + Rsel[i][j] * laneW
             for i in range(3) for j in range(3)], axis=0,
        )
        poset = jnp.concatenate(
            [poset[i:i + 1, :] * (1.0 - laneW) + tsel[i] * laneW
             for i in range(3)], axis=0,
        )
        state = jnp.concatenate([poseR, poset, planeT], axis=0)

        li = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
        onehot = [(li == j).astype(f32) for j in range(6)]
        out_marg = jnp.concatenate(
            [sum(sqrt_new[i][j] * onehot[j] for j in range(6))
             for i in range(6)]
            + [jnp.zeros((2, _LANE), f32)],
            axis=0,
        )

    # wiring (f32 index rows/cols — values < 2^24, exact)
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1).astype(f32)
    posef = _dT(pfpose.astype(f32), EQ_F)                 # (1, 128)
    lmf = _dT(pflm.astype(f32), EQ_F)
    oif = _dT(odi.astype(f32), EQ_O) \
        + prior_lane * (lane_f - float(O) + float(W))
    ojf = _dT(odj.astype(f32), EQ_O) \
        + _dT(pridx.astype(f32), EQ_PO)
    pose_col = _rowT(I128, posef)                         # (128, 1)
    lm_col = _rowT(I128, lmf)
    oi_col = _rowT(I128, oif)
    oj_col = _rowT(I128, ojf)
    notpr_col = 1.0 - _rowT(I128, prior_lane)

    POSE2PF = (row128f == posef).astype(f32)              # [p, f]
    LM2PF = (row128f == lmf).astype(f32)                  # [l, f]
    P2OI = (row128f == oif).astype(f32)                   # [p, o]
    P2OJ = (row128f == ojf).astype(f32)                   # [p, o]
    PF2LM = (col128f == lm_col).astype(f32)               # [f, l]

    CB_POSE = [(col128f == 6.0 * pose_col + b).astype(f32)
               for b in range(6)]
    # prior lanes place no J_i block (the "i" side is the constant
    # prior mean, not a variable)
    CB_OI = [((col128f == 6.0 * oi_col + b) * notpr_col).astype(f32)
             for b in range(6)]
    CB_OJ = [(col128f == 6.0 * oj_col + b).astype(f32) for b in range(6)]

    colN3 = jax.lax.broadcasted_iota(
        jnp.int32, (_LANE, _N3), 1
    ).astype(f32)
    CB_LM = [(colN3 == 3.0 * lm_col + c).astype(f32) for c in range(3)]

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

    lmv3_row = sum(_dot(lmv_row, EC_LM[c]) for c in range(3))  # (1, N3)

    costcol = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
    cost_row = jnp.zeros((1, _LANE), f32)

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
        lmvb = lmv_row > 0.5
        Hd = [[HllL[3 * a + b:3 * a + b + 1, :]
               + (lam if a == b else 0.0) for b in range(3)]
              for a in range(3)]
        eye3 = sm.meye(3, HllL[0:1, :])
        Hd = [[jnp.where(lmvb, Hd[a][b], eye3[a][b]) for b in range(3)]
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
        pi_n = sm.vwhere(lmvb, pi_n, pi_c)

        state = jnp.concatenate(
            [Rn[i][j] for i in range(3) for j in range(3)]
            + tn + pi_n,
            axis=0,
        )                                                # (16, 128)

        cost_it = 0.5 * (cost_pl + cost_o)
        cost_row = cost_row + jnp.where(costcol == it, cost_it, 0.0)

    # ---- in-kernel unpacking: comp rows -> entity-major blocks ----
    out_pose = _dot(I128, state[0:12, :], dims=((1,), (1,)))  # (128, 12)
    out_plane = _dot(I128, state[12:16, :], dims=((1,), (1,)))  # (128, 4)
    return out_pose, out_plane, cost_row, out_marg


# ---------------------------------------------------------------------------
# Pallas wrapper + packing
# ---------------------------------------------------------------------------


def _fused_kernel(R2, tW, PL, prR, prt, prA, pfpi, pfA,
                  odR, odt, odA, BOOLS, IDX, MARG,
                  lam_ref, out_pose_ref, out_plane_ref, out_cost_ref,
                  out_marg_ref, *, dims, iters, robust, fuse_marg,
                  marg_static):
    out_pose, out_plane, cost, out_marg = fused_gn_iterations(
        R2[:], tW[:], PL[:], prR[:], prt[:], prA[:], pfpi[:], pfA[:],
        odR[:], odt[:], odA[:], BOOLS[:], IDX[:], MARG[:],
        lam_ref[0, 0], dims=dims, iters=iters, robust=robust,
        fuse_marg=fuse_marg, marg_static=marg_static,
    )
    out_pose_ref[:] = out_pose
    out_plane_ref[:] = out_plane
    out_cost_ref[:] = cost
    out_marg_ref[:] = out_marg


def _pack_inputs(window: Window, factors: Factors):
    """Raw (entity, comp) 2-D views of the state + factor buffers.

    Reshapes only, plus ONE concatenated bool->f32 cast and ONE
    concatenated index column — the round-5 profile showed the
    original per-array packing (~30 tiny XLA ops) costing ~100 us on
    the latency-bound chip, half the fused solve; everything else now
    happens inside the kernel."""
    f32 = jnp.float32
    W, L = window.window_size, window.max_landmarks
    od, pf, pr = factors.odom, factors.planes, factors.priors
    F = pf.valid.shape[0]
    O = od.valid.shape[0]
    P = pr.valid.shape[0]

    bools = jnp.concatenate(
        [window.pose_valid, window.pose_fixed, window.lm_valid,
         pf.valid, od.valid, pr.valid]
    ).astype(f32).reshape(-1, 1)
    idx = jnp.concatenate(
        [pf.pose_idx, pf.lm_idx, od.i, od.j, pr.idx]
    ).astype(jnp.int32).reshape(-1, 1)

    args = (
        window.R.reshape(W, 9).astype(f32),
        window.t.astype(f32),
        window.planes.astype(f32),
        pr.R.reshape(P, 9).astype(f32),
        pr.t.astype(f32),
        pr.sqrt_info.reshape(P, 36).astype(f32),
        pf.pi_meas.astype(f32),
        pf.sqrt_info.reshape(F, 9).astype(f32),
        od.R_meas.reshape(O, 9).astype(f32),
        od.t_meas.astype(f32),
        od.sqrt_info.reshape(O, 36).astype(f32),
        bools,
        idx,
    )
    return args, (W, L, F, O, P)


def _unpack_window(window: Window, out_pose, out_plane):
    W, L = window.window_size, window.max_landmarks
    dtype = window.t.dtype
    return window._replace(
        R=out_pose[:W, :9].reshape(W, 3, 3).astype(dtype),
        t=out_pose[:W, 9:12].astype(dtype),
        planes=out_plane[:L, :].astype(dtype),
    )


def pack_marg(R0, t0, R1, t1, odom_R0, odom_t0, odom_valid0,
              mprior_R, mprior_t, mprior_sqrt, full):
    """Build the (8, 16) MARG block for the fused exiting-keyframe
    marginalization: pre-roll slot-0/slot-1 poses, the exiting odometry
    measurement, the OLD slot-0 prior, and the (traced) window-full
    flag that selects new-marginal vs old prior inside the kernel."""
    f32 = jnp.float32
    z4 = jnp.zeros((4,), f32)
    row0 = jnp.concatenate([R0.reshape(9), t0, z4]).astype(f32)
    row1 = jnp.concatenate([R1.reshape(9), t1, z4]).astype(f32)
    row2 = jnp.concatenate([odom_R0.reshape(9), odom_t0, z4]).astype(f32)
    row3 = jnp.zeros((16,), f32).at[0].set(
        odom_valid0.astype(f32)
    ).at[1].set(jnp.asarray(full, f32))
    row4 = jnp.concatenate([mprior_R.reshape(9), mprior_t, z4]).astype(f32)
    a = mprior_sqrt.reshape(36).astype(f32)
    row5 = a[0:16]
    row6 = a[16:32]
    row7 = jnp.concatenate([a[32:36], jnp.zeros((12,), f32)])
    return jnp.stack([row0, row1, row2, row3, row4, row5, row6, row7])


def fused_gn_solve(
    window: Window,
    factors: Factors,
    iters: int = 2,
    damping: float | jnp.ndarray = 1e-5,
    robust: RobustConfig | None = None,
    use_pallas: bool | None = None,
    interpret: bool | None = None,
    marg=None,
    marg_static=None,
):
    """Drop-in replacement for ``gn_solve`` at fused-supported shapes.

    Returns (window_opt, costs (iters,)) — ``costs[k]`` is the
    robustified objective at the k-th linearization point (the same
    series ``gn_solve``'s ``cost_history[:-1]`` reports).

    With ``marg`` (an (8, 16) block from :func:`pack_marg`) and
    ``marg_static`` ((adiag 6-tuple, eps, floor), static), the kernel
    additionally computes the exiting-keyframe marginal prior
    in-kernel, uses it for the prior lane when the window-full flag is
    set, and the return becomes (window_opt, costs, m_sqrt (6, 6)).
    Requires exactly one prior factor.

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
    fuse_marg = marg is not None
    if fuse_marg:
        assert factors.priors.valid.shape[0] == 1, (
            "fused marginalization needs exactly one prior factor"
        )
        assert marg_static is not None

    args, dims = _pack_inputs(window, factors)
    lam = jnp.asarray(damping, jnp.float32)
    MARG = marg if fuse_marg else jnp.zeros((8, 16), jnp.float32)

    if use_pallas:
        n_in = len(args) + 1
        out_pose, out_plane, cost_row, out_marg = pl.pallas_call(
            functools.partial(_fused_kernel, dims=dims, iters=iters,
                              robust=robust, fuse_marg=fuse_marg,
                              marg_static=marg_static),
            out_shape=(
                jax.ShapeDtypeStruct((_LANE, 12), jnp.float32),
                jax.ShapeDtypeStruct((_LANE, 4), jnp.float32),
                jax.ShapeDtypeStruct((1, _LANE), jnp.float32),
                jax.ShapeDtypeStruct((8, _LANE), jnp.float32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(*args, MARG, lam.reshape(1, 1))
    else:
        out_pose, out_plane, cost_row, out_marg = fused_gn_iterations(
            *args, MARG, lam, dims=dims, iters=iters, robust=robust,
            fuse_marg=fuse_marg, marg_static=marg_static,
        )

    w_opt = _unpack_window(window, out_pose, out_plane)
    costs = cost_row[0, :iters]
    if fuse_marg:
        return w_opt, costs, out_marg[:6, :6]
    return w_opt, costs
