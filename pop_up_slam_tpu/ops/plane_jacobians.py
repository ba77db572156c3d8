"""Analytic, factor-batched Jacobians of the pose-plane measurement.

The reference's iSAM plane factor evaluates Jacobians per factor with
either numeric differentiation or hand analytic Eigen code inside the
incremental QR loop (SURVEY.md §2.1 "Plane extensions to iSAM", §3.3 —
reference mount empty, algorithm per Kaess ICRA'15 / arXiv:1703.07334
§IV).  Here the whole factor batch is linearized at once in closed
form — no per-factor ``jacfwd`` tracing — and the same math is also
provided as a Pallas VPU kernel (:func:`plane_terms_pallas`) laid out
structure-of-arrays so every operation vectorizes over the factor
dimension.

Derivation (matches ``factors.graph.plane_residual`` exactly):

With pose retraction ``T' = T_wc e^xi``, ``xi = (rho, phi)``, the
camera-frame plane ``(n_c, d_c) = T'^{-T} pi_w`` linearizes as::

    n_c(phi) = n_c0 + hat(n_c0) phi        (first order)
    d_c(rho) = d_c0 + n_c0 . rho           (the phi terms cancel)

and with the S^3 landmark retraction ``pi_w' = pi_w + B4 delta``
(``B4`` the tangent basis, columns orthogonal to ``pi_w``)::

    dn_c/ddelta = R_cw N,   N = B4[:3, :]
    dd_c/ddelta = b - N^T R_cw^T t_cw,   b = B4[3, :]

The residual is the Hessian-normal local error
(``plane.hessian_local``): 2 tangent components of the predicted unit
normal in the basis at the (sign-aligned) measured normal + the signed
distance difference, whitened by ``sqrt_info``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import plane as plane_mod
from ..geometry import se3


def plane_terms_analytic(window, factors):
    """Closed-form residuals + Jacobians for all plane factors.

    Same signature/semantics as ``factors.graph._plane_terms``:
    returns (r (F,3), Jp (F,3,6), Jl (F,3,3)), zero where invalid.
    """
    R_wc = window.R[factors.pose_idx]          # (F, 3, 3)
    t_wc = window.t[factors.pose_idx]          # (F, 3)
    pi_w = window.planes[factors.lm_idx]       # (F, 4)
    pi_meas = factors.pi_meas                  # (F, 4)
    A = factors.sqrt_info                      # (F, 3, 3)
    valid = factors.valid

    R_cw = jnp.swapaxes(R_wc, -1, -2)
    t_cw = -(R_cw @ t_wc[..., None])[..., 0]

    n_w, d_w = pi_w[..., :3], pi_w[..., 3]
    n_c = (R_cw @ n_w[..., None])[..., 0]                      # (F, 3)
    d_c = d_w - jnp.sum(t_cw * n_c, axis=-1)                   # (F,)

    # Replicate plane.normalize's canonical sign fix on the predicted
    # plane (transform() applies it); derivatives treat it as constant.
    pred_unit = plane_mod.normalize(
        jnp.concatenate([n_c, d_c[..., None]], axis=-1)
    )
    raw = jnp.concatenate([n_c, d_c[..., None]], axis=-1)
    sgn = jnp.where(jnp.sum(pred_unit * raw, axis=-1) >= 0.0, 1.0, -1.0)
    n_c = sgn[..., None] * n_c
    d_c = sgn * d_c

    c = jnp.maximum(jnp.linalg.norm(n_c, axis=-1), 1e-9)       # (F,)
    n_p = n_c / c[..., None]
    d_p = d_c / c

    # Measured plane, sign-aligned to the prediction (hessian_local).
    n_m, d_m = plane_mod.to_hessian_normal(pi_meas)
    s = jnp.where(jnp.sum(n_p * n_m, axis=-1) >= 0.0, 1.0, -1.0)
    n_m = s[..., None] * n_m
    d_m = s * d_m
    B = plane_mod.normal_tangent_basis(n_m)                    # (F, 3, 2)
    Bt = jnp.swapaxes(B, -1, -2)                               # (F, 2, 3)

    # Residual.
    r_n = (Bt @ n_p[..., None])[..., 0]                        # (F, 2)
    r_d = d_p - d_m                                            # (F,)
    r = jnp.concatenate([r_n, r_d[..., None]], axis=-1)        # (F, 3)

    # --- pose Jacobian (3x6), tangent order (rho, phi) ---
    hat_np = se3.hat(n_p)                                      # (F, 3, 3)
    Jn_phi = Bt @ hat_np                                       # (F, 2, 3)
    zeros23 = jnp.zeros_like(Jn_phi)
    top = jnp.concatenate([zeros23, Jn_phi], axis=-1)          # (F, 2, 6)
    bot = jnp.concatenate(
        [n_p[..., None, :], jnp.zeros_like(n_p)[..., None, :]], axis=-1
    )                                                          # (F, 1, 6)
    Jp = jnp.concatenate([top, bot], axis=-2)                  # (F, 3, 6)

    # --- landmark Jacobian (3x3) ---
    B4 = plane_mod.tangent_basis(pi_w)                         # (F, 4, 3)
    N = B4[..., :3, :]
    b_off = B4[..., 3, :]                                      # (F, 3)
    RN = R_cw @ N                                              # (F, 3, 3)
    dn_c = sgn[..., None, None] * RN
    dd_c = sgn[..., None] * (
        b_off - (jnp.swapaxes(RN, -1, -2) @ t_cw[..., None])[..., 0]
    )
    proj = (
        jnp.broadcast_to(jnp.eye(3, dtype=n_p.dtype), hat_np.shape)
        - n_p[..., :, None] * n_p[..., None, :]
    )
    dn_p = (proj @ dn_c) / c[..., None, None]                  # (F, 3, 3)
    np_dnc = (n_p[..., None, :] @ dn_c)[..., 0, :]             # (F, 3)
    dd_p = dd_c / c[..., None] - d_p[..., None] * np_dnc / c[..., None]
    Jl = jnp.concatenate([Bt @ dn_p, dd_p[..., None, :]], axis=-2)

    # Whiten + mask (where, not multiply — padded factors can be NaN).
    r = (A @ r[..., None])[..., 0]
    Jp = A @ Jp
    Jl = A @ Jl
    v = valid[..., None]
    return (
        jnp.where(v, r, 0.0),
        jnp.where(v[..., None], Jp, 0.0),
        jnp.where(v[..., None], Jl, 0.0),
    )


# ---------------------------------------------------------------------------
# Pallas kernel: the same closed form, structure-of-arrays over factors.
# Every input/output channel is one (F,) lane-major row so the whole
# linearization is pure VPU element-wise work (BASELINE north_star:
# "plane-measurement Jacobians materialized batch-wise in Pallas").
# ---------------------------------------------------------------------------

_LANE = 128


def _hat_rows(n0, n1, n2):
    """Rows of hat([n0,n1,n2]) as a 3x3 nest of lane vectors."""
    z = jnp.zeros_like(n0)
    return (
        (z, -n2, n1),
        (n2, z, -n0),
        (-n1, n0, z),
    )


def _plane_kernel(in_ref, out_ref):
    """in_ref: (C_IN, F) channels; out_ref: (C_OUT, F).

    Channel layout (all f32):
      in:  0-8   R_cw row-major
           9-11  t_cw
           12-15 pi_w
           16-19 pi_meas (unit-normal form: n_m, d_m)
           20-24 B (meas tangent basis cols) is computed in-kernel? no:
                 20-25 B as 3x2 row-major (precomputed: depends on the
                 *sign-aligned* n_m, which needs n_p) — instead B is
                 computed in-kernel from n_m after sign alignment.
           20-28 sqrt_info row-major
           29    valid (0/1)
           30-41 B4 (pi_w tangent basis) row-major 4x3
      out: 0-2   r
           3-20  Jp row-major 3x6
           21-29 Jl row-major 3x3
    """
    f32 = jnp.float32

    def ch(i):
        return in_ref[i, :].astype(f32)

    R = [[ch(3 * i + j) for j in range(3)] for i in range(3)]   # R_cw
    t = [ch(9 + i) for i in range(3)]                            # t_cw
    piw = [ch(12 + i) for i in range(4)]
    nm = [ch(16 + i) for i in range(3)]
    dm = ch(19)
    A = [[ch(20 + 3 * i + j) for j in range(3)] for i in range(3)]
    valid = ch(29)
    B4 = [[ch(30 + 3 * i + j) for j in range(3)] for i in range(4)]

    # n_c = R_cw n_w ; d_c = d_w - t_cw . n_c
    nc = [sum(R[i][k] * piw[k] for k in range(3)) for i in range(3)]
    dc = piw[3] - sum(t[i] * nc[i] for i in range(3))

    # canonical sign of the predicted plane (plane.normalize):
    # s = sign(d) if |d|>tol else sign(nz) else sign(ny) else sign(nx)
    tol = 1e-6

    def signo(x):
        return jnp.where(x >= 0.0, 1.0, -1.0)

    sgn = jnp.where(
        jnp.abs(dc) > tol,
        signo(dc),
        jnp.where(
            jnp.abs(nc[2]) > tol,
            signo(nc[2]),
            jnp.where(
                jnp.abs(nc[1]) > tol, signo(nc[1]), signo(nc[0] + 1e-30)
            ),
        ),
    )
    nc = [sgn * v for v in nc]
    dc = sgn * dc

    c = jnp.sqrt(jnp.maximum(nc[0] ** 2 + nc[1] ** 2 + nc[2] ** 2, 1e-18))
    inv_c = 1.0 / c
    npred = [v * inv_c for v in nc]
    dpred = dc * inv_c

    # sign-align the measurement to the prediction
    s = signo(sum(npred[i] * nm[i] for i in range(3)))
    nm = [s * v for v in nm]
    dm = s * dm

    # tangent basis at nm: Householder dropping column k = argmax |nm_k|
    # (branch-free replication of plane.normal_tangent_basis)
    a0, a1, a2 = jnp.abs(nm[0]), jnp.abs(nm[1]), jnp.abs(nm[2])
    k0 = (a0 >= a1) & (a0 >= a2)
    k1 = (~k0) & (a1 >= a2)
    k2 = ~(k0 | k1)
    sk = signo(
        jnp.where(k0, nm[0], jnp.where(k1, nm[1], nm[2]))
    )
    ek = [k0.astype(f32), k1.astype(f32), k2.astype(f32)]
    v = [nm[i] - sk * ek[i] for i in range(3)]
    vv = jnp.maximum(v[0] ** 2 + v[1] ** 2 + v[2] ** 2, 1e-9)
    # H[i][j] = delta_ij - 2 v_i v_j / vv ; columns != k form the basis.
    H = [
        [
            (1.0 if i == j else 0.0) - 2.0 * v[i] * v[j] / vv
            for j in range(3)
        ]
        for i in range(3)
    ]
    # Kept columns in index order (matching jnp.argsort of the shifted
    # index trick in normal_tangent_basis): the two columns != k,
    # ascending.  col0 = 0 unless k==0 (then 1); col1 = 2 unless k==2
    # (then 1).
    Bcol0 = [jnp.where(k0, H[i][1], H[i][0]) for i in range(3)]
    Bcol1 = [jnp.where(k2, H[i][1], H[i][2]) for i in range(3)]

    # residual
    r0 = sum(Bcol0[i] * npred[i] for i in range(3))
    r1 = sum(Bcol1[i] * npred[i] for i in range(3))
    r2 = dpred - dm
    r = [r0, r1, r2]

    # pose Jacobian J (3x6) before whitening: rows 0,1 = B^T hat(npred)
    # in phi cols (3:6); row 2 = npred^T in rho cols (0:3).
    hat_np = _hat_rows(*npred)
    Jn0 = [
        sum(Bcol0[i] * hat_np[i][j] for i in range(3)) for j in range(3)
    ]
    Jn1 = [
        sum(Bcol1[i] * hat_np[i][j] for i in range(3)) for j in range(3)
    ]
    zero = jnp.zeros_like(r0)
    Jp = [
        [zero, zero, zero, Jn0[0], Jn0[1], Jn0[2]],
        [zero, zero, zero, Jn1[0], Jn1[1], Jn1[2]],
        [npred[0], npred[1], npred[2], zero, zero, zero],
    ]

    # landmark Jacobian (3x3): dn_c = sgn R_cw N, dd_c = sgn(b - N^T R^T t)
    Nmat = [[B4[i][j] for j in range(3)] for i in range(3)]
    boff = [B4[3][j] for j in range(3)]
    dnc = [
        [
            sgn * sum(R[i][k] * Nmat[k][j] for k in range(3))
            for j in range(3)
        ]
        for i in range(3)
    ]
    # N^T R^T t = (R N)^T t; reuse dnc/sgn: (dnc/sgn)^T t = dnc^T t * sgn
    ddc = [
        sgn * boff[j] - sum(dnc[i][j] * t[i] for i in range(3)) * 1.0
        for j in range(3)
    ]
    # NOTE: sgn*(N^T R^T t)_j = sum_i (sgn R N)[i][j] t_i = dnc^T t  ✓
    # projector (I - npred npred^T) applied to dnc, then / c
    npdnc = [sum(npred[i] * dnc[i][j] for i in range(3)) for j in range(3)]
    dnp = [
        [(dnc[i][j] - npred[i] * npdnc[j]) * inv_c for j in range(3)]
        for i in range(3)
    ]
    ddp = [(ddc[j] - dpred * npdnc[j]) * inv_c for j in range(3)]
    Jl = [
        [sum(Bcol0[i] * dnp[i][j] for i in range(3)) for j in range(3)],
        [sum(Bcol1[i] * dnp[i][j] for i in range(3)) for j in range(3)],
        [ddp[0], ddp[1], ddp[2]],
    ]

    # whiten by sqrt_info and mask by validity
    for i in range(3):
        out_ref[i, :] = valid * sum(A[i][k] * r[k] for k in range(3))
    for i in range(3):
        for j in range(6):
            out_ref[3 + 6 * i + j, :] = valid * sum(
                A[i][k] * Jp[k][j] for k in range(3)
            )
    for i in range(3):
        for j in range(3):
            out_ref[21 + 3 * i + j, :] = valid * sum(
                A[i][k] * Jl[k][j] for k in range(3)
            )


@functools.partial(jax.jit, static_argnames=("interpret",))
def plane_terms_pallas(window, factors, interpret: bool | None = None):
    """Pallas VPU kernel computing :func:`plane_terms_analytic`.

    Factors are laid out structure-of-arrays: 42 input channels x F
    lanes, 30 output channels x F lanes, F padded to 128.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    F = factors.pose_idx.shape[0]
    Fp = -(-F // _LANE) * _LANE

    R_wc = window.R[factors.pose_idx]
    t_wc = window.t[factors.pose_idx]
    pi_w = window.planes[factors.lm_idx]
    R_cw = jnp.swapaxes(R_wc, -1, -2)
    t_cw = -(R_cw @ t_wc[..., None])[..., 0]
    n_m, d_m = plane_mod.to_hessian_normal(factors.pi_meas)
    B4 = plane_mod.tangent_basis(pi_w)

    chans = jnp.concatenate(
        [
            R_cw.reshape(F, 9),
            t_cw,
            pi_w,
            n_m,
            d_m[:, None],
            factors.sqrt_info.reshape(F, 9),
            factors.valid.astype(jnp.float32)[:, None],
            B4.reshape(F, 12),
        ],
        axis=-1,
    ).T.astype(jnp.float32)                                    # (42, F)
    chans = jnp.pad(chans, ((0, 0), (0, Fp - F)))

    out = pl.pallas_call(
        _plane_kernel,
        out_shape=jax.ShapeDtypeStruct((30, Fp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(chans)

    out = out[:, :F].T
    r = out[:, :3]
    Jp = out[:, 3:21].reshape(F, 3, 6)
    Jl = out[:, 21:30].reshape(F, 3, 3)
    return r, Jp, Jl
