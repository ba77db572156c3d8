"""Fixed-capacity factor graph over SE(3) poses and plane landmarks.

TPU-native re-design of the reference's iSAM graph (SURVEY.md §2.1
"Vendored iSAM library" + "Plane extensions"; paper arXiv:1703.07334
§IV): instead of a dynamically-grown node/factor pointer graph with
incremental QR, the whole sliding window is a *fixed-shape pytree* —
capacity-padded arrays with validity masks — so one jit-compiled
linearize/solve handles every frame.

Factor types (mirroring iSAM's Pose3d_Pose3d_Factor, the plane
measurement factor, and the pose prior; SURVEY.md §3.2):

- ``OdomFactors``  : relative SE(3) measurement between two window poses.
- ``PlaneFactors`` : plane landmark observed in a camera frame; residual
  is the minimal 3-dim tangent difference on S^3.
- ``PosePriors``   : absolute pose priors (gauge fixing).

Residuals are whitened by per-factor square-root information matrices.
Jacobians are produced factor-batched via vmapped ``jax.jacfwd`` over
the local (tangent) perturbations — exact to machine precision, fully
fused by XLA; the Pallas analytic-Jacobian kernel in
``pop_up_slam_tpu.ops`` is the performance path and is tested against
this implementation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3, plane
from .robust import RobustConfig, apply_weights


class Window(NamedTuple):
    """The optimization state: a keyframe window + landmark store.

    R, t           : (W, 3, 3), (W, 3) world-from-camera poses.
    planes         : (L, 4) unit world-frame planes.
    pose_valid     : (W,) bool.
    pose_fixed     : (W,) bool — gauge-fixed poses get zero update.
    lm_valid       : (L,) bool.
    """

    R: jnp.ndarray
    t: jnp.ndarray
    planes: jnp.ndarray
    pose_valid: jnp.ndarray
    pose_fixed: jnp.ndarray
    lm_valid: jnp.ndarray

    @staticmethod
    def empty(window_size: int, max_landmarks: int) -> "Window":
        return Window(
            R=jnp.broadcast_to(jnp.eye(3), (window_size, 3, 3)),
            t=jnp.zeros((window_size, 3)),
            planes=jnp.broadcast_to(
                jnp.array([0.0, 0.0, 1.0, 0.0]), (max_landmarks, 4)
            ),
            pose_valid=jnp.zeros((window_size,), bool),
            pose_fixed=jnp.zeros((window_size,), bool),
            lm_valid=jnp.zeros((max_landmarks,), bool),
        )

    @property
    def window_size(self) -> int:
        return self.R.shape[0]

    @property
    def max_landmarks(self) -> int:
        return self.planes.shape[0]


class OdomFactors(NamedTuple):
    i: jnp.ndarray          # (O,) int32 — window index of the earlier pose
    j: jnp.ndarray          # (O,) int32
    R_meas: jnp.ndarray     # (O, 3, 3) measured T_i^-1 T_j rotation
    t_meas: jnp.ndarray     # (O, 3)
    sqrt_info: jnp.ndarray  # (O, 6, 6)
    valid: jnp.ndarray      # (O,) bool

    @staticmethod
    def empty(capacity: int) -> "OdomFactors":
        return OdomFactors(
            i=jnp.zeros((capacity,), jnp.int32),
            j=jnp.zeros((capacity,), jnp.int32),
            R_meas=jnp.broadcast_to(jnp.eye(3), (capacity, 3, 3)),
            t_meas=jnp.zeros((capacity, 3)),
            sqrt_info=jnp.broadcast_to(jnp.eye(6), (capacity, 6, 6)),
            valid=jnp.zeros((capacity,), bool),
        )


class PlaneFactors(NamedTuple):
    pose_idx: jnp.ndarray   # (F,) int32
    lm_idx: jnp.ndarray     # (F,) int32
    pi_meas: jnp.ndarray    # (F, 4) measured plane in the camera frame
    sqrt_info: jnp.ndarray  # (F, 3, 3)
    valid: jnp.ndarray      # (F,) bool

    @staticmethod
    def empty(capacity: int) -> "PlaneFactors":
        return PlaneFactors(
            pose_idx=jnp.zeros((capacity,), jnp.int32),
            lm_idx=jnp.zeros((capacity,), jnp.int32),
            pi_meas=jnp.broadcast_to(
                jnp.array([0.0, 0.0, 1.0, 0.0]), (capacity, 4)
            ),
            sqrt_info=jnp.broadcast_to(jnp.eye(3), (capacity, 3, 3)),
            valid=jnp.zeros((capacity,), bool),
        )


class PosePriors(NamedTuple):
    idx: jnp.ndarray        # (P,) int32
    R: jnp.ndarray          # (P, 3, 3)
    t: jnp.ndarray          # (P, 3)
    sqrt_info: jnp.ndarray  # (P, 6, 6)
    valid: jnp.ndarray      # (P,) bool

    @staticmethod
    def empty(capacity: int) -> "PosePriors":
        return PosePriors(
            idx=jnp.zeros((capacity,), jnp.int32),
            R=jnp.broadcast_to(jnp.eye(3), (capacity, 3, 3)),
            t=jnp.zeros((capacity, 3)),
            sqrt_info=jnp.broadcast_to(jnp.eye(6), (capacity, 6, 6)),
            valid=jnp.zeros((capacity,), bool),
        )


class Factors(NamedTuple):
    odom: OdomFactors
    planes: PlaneFactors
    priors: PosePriors


# ---------------------------------------------------------------------------
# Residuals (whitened) — each defined at a local perturbation so the same
# function yields both the residual (at zero) and the Jacobians (jacfwd at
# zero).
# ---------------------------------------------------------------------------


def odom_residual(Ri, ti, Rj, tj, R_meas, t_meas, sqrt_info,
                  xi_i=None, xi_j=None) -> jnp.ndarray:
    """Whitened 6-dim residual of a between-factor: log(meas^-1 (T_i e^xi_i)^-1 (T_j e^xi_j))."""
    if xi_i is not None:
        Ri, ti = se3.se3_retract(Ri, ti, xi_i)
    if xi_j is not None:
        Rj, tj = se3.se3_retract(Rj, tj, xi_j)
    R_rel, t_rel = se3.se3_between(Ri, ti, Rj, tj)
    R_err, t_err = se3.se3_between(R_meas, t_meas, R_rel, t_rel)
    r = se3.se3_log(R_err, t_err)
    return (sqrt_info @ r[..., None])[..., 0]


def plane_residual(R_wc, t_wc, pi_w, pi_meas_c, sqrt_info,
                   xi=None, delta=None) -> jnp.ndarray:
    """Whitened 3-dim residual of a plane observation.

    Predicted plane in the camera frame: T_cw^-T pi_w with
    T_wc <- T_wc e^xi and pi_w <- pi_w ⊞ delta.  The error is the
    Hessian-normal difference (2 normal-tangent radians + 1 metric
    distance, ``plane.hessian_local``) — NOT the S^3 chart, whose
    distance sensitivity collapses for far planes (see
    geometry/plane.py).  sqrt_info rows are therefore
    (1/sigma_angle, 1/sigma_angle, 1/sigma_dist).
    """
    if xi is not None:
        R_wc, t_wc = se3.se3_retract(R_wc, t_wc, xi)
    if delta is not None:
        pi_w = plane.retract(pi_w, delta)
    R_cw, t_cw = se3.se3_inverse(R_wc, t_wc)
    pred = plane.transform(pi_w, R_cw, t_cw)
    r = plane.hessian_local(pred, pi_meas_c)
    return (sqrt_info @ r[..., None])[..., 0]


def prior_residual(R, t, R_prior, t_prior, sqrt_info, xi=None) -> jnp.ndarray:
    """Whitened 6-dim residual of an absolute pose prior."""
    if xi is not None:
        R, t = se3.se3_retract(R, t, xi)
    R_err, t_err = se3.se3_between(R_prior, t_prior, R, t)
    r = se3.se3_log(R_err, t_err)
    return (sqrt_info @ r[..., None])[..., 0]


# ---------------------------------------------------------------------------
# Linearization: factor-batched residuals + Jacobians, assembled into the
# blocked normal equations H dx = -b with the (pose, landmark) structure
#   H = [[Hpp, Hpl], [Hpl^T, Hll]]
# ready for Schur elimination of the landmarks (SURVEY.md §7).
# ---------------------------------------------------------------------------


class Linearization(NamedTuple):
    Hpp: jnp.ndarray  # (W, W, 6, 6) — block (i, j)
    Hpl: jnp.ndarray  # (W, L, 6, 3)
    Hll: jnp.ndarray  # (L, 3, 3)
    bp: jnp.ndarray   # (W, 6)   — gradient J^T r pose part
    bl: jnp.ndarray   # (L, 3)
    cost: jnp.ndarray  # () scalar 0.5 * sum r^2


def _odom_terms(window: Window, f: OdomFactors):
    """Residuals + Jacobians for all odometry factors. Returns
    (r (O,6), Ji (O,6,6), Jj (O,6,6)) masked to zero where invalid."""

    def one(i, j, R_meas, t_meas, A, valid):
        Ri, ti = window.R[i], window.t[i]
        Rj, tj = window.R[j], window.t[j]

        def res(xi_i, xi_j):
            return odom_residual(Ri, ti, Rj, tj, R_meas, t_meas, A, xi_i, xi_j)

        z = jnp.zeros(6)
        r = res(z, z)
        Ji = jax.jacfwd(res, argnums=0)(z, z)
        Jj = jax.jacfwd(res, argnums=1)(z, z)
        # where-mask (not multiply): a padded factor linearized at the
        # identity can produce NaN Jacobians, and NaN * 0 == NaN.
        return (
            jnp.where(valid, r, 0.0),
            jnp.where(valid, Ji, 0.0),
            jnp.where(valid, Jj, 0.0),
        )

    return jax.vmap(one)(f.i, f.j, f.R_meas, f.t_meas, f.sqrt_info, f.valid)


def _odom_terms_analytic(window: Window, f: OdomFactors):
    """Closed-form twin of :func:`_odom_terms` (no jacfwd).

    With E = M^-1 T_i^-1 T_j and r0 = log(E), right-multiplicative
    perturbations give exactly

        d r / d xi_j =  A Jr^-1(r0)
        d r / d xi_i = -A Jr^-1(r0) Ad(T_j^-1 T_i)

    (E(xi_i) = E exp(-Ad_{T_j^-1 T_i} xi_i) by pushing exp(-xi_i)
    through T_i^-1 T_j).  Matches the jacfwd version to f32 precision
    (tests/test_geometry.py) at a fraction of the op count — and is
    the form a fused Pallas linearizer can evaluate (no jacfwd inside
    kernels)."""
    Ri, ti = window.R[f.i], window.t[f.i]
    Rj, tj = window.R[f.j], window.t[f.j]
    R_rel, t_rel = se3.se3_between(Ri, ti, Rj, tj)
    R_err, t_err = se3.se3_between(f.R_meas, f.t_meas, R_rel, t_rel)
    r0 = se3.se3_log(R_err, t_err)
    Jr_inv = se3.se3_right_jacobian_inv(r0)
    AJ = f.sqrt_info @ Jr_inv
    Jj = AJ
    R_ji, t_ji = se3.se3_between(Rj, tj, Ri, ti)
    Ji = -(AJ @ se3.se3_adjoint(R_ji, t_ji))
    r = (f.sqrt_info @ r0[..., None])[..., 0]
    v = f.valid
    return (
        jnp.where(v[:, None], r, 0.0),
        jnp.where(v[:, None, None], Ji, 0.0),
        jnp.where(v[:, None, None], Jj, 0.0),
    )


def _plane_terms(window: Window, f: PlaneFactors):
    """Residuals + Jacobians for all plane factors. Returns
    (r (F,3), Jp (F,3,6), Jl (F,3,3)) masked to zero where invalid."""

    def one(p, l, pi_meas, A, valid):
        R_wc, t_wc = window.R[p], window.t[p]
        pi_w = window.planes[l]

        def res(xi, delta):
            return plane_residual(R_wc, t_wc, pi_w, pi_meas, A, xi, delta)

        z6, z3 = jnp.zeros(6), jnp.zeros(3)
        r = res(z6, z3)
        Jp = jax.jacfwd(res, argnums=0)(z6, z3)
        Jl = jax.jacfwd(res, argnums=1)(z6, z3)
        return (
            jnp.where(valid, r, 0.0),
            jnp.where(valid, Jp, 0.0),
            jnp.where(valid, Jl, 0.0),
        )

    return jax.vmap(one)(f.pose_idx, f.lm_idx, f.pi_meas, f.sqrt_info, f.valid)


def _prior_terms(window: Window, f: PosePriors):
    def one(idx, Rp, tp, A, valid):
        R, t = window.R[idx], window.t[idx]

        def res(xi):
            return prior_residual(R, t, Rp, tp, A, xi)

        z = jnp.zeros(6)
        r = res(z)
        J = jax.jacfwd(res)(z)
        return jnp.where(valid, r, 0.0), jnp.where(valid, J, 0.0)

    return jax.vmap(one)(f.idx, f.R, f.t, f.sqrt_info, f.valid)


def _prior_terms_analytic(window: Window, f: PosePriors):
    """Closed-form twin of :func:`_prior_terms`:
    r = A log(P^-1 T exp(xi)) so dr/dxi = A Jr^-1(r0)."""
    R, t = window.R[f.idx], window.t[f.idx]
    R_err, t_err = se3.se3_between(f.R, f.t, R, t)
    r0 = se3.se3_log(R_err, t_err)
    J = f.sqrt_info @ se3.se3_right_jacobian_inv(r0)
    r = (f.sqrt_info @ r0[..., None])[..., 0]
    v = f.valid
    return jnp.where(v[:, None], r, 0.0), jnp.where(v[:, None, None], J, 0.0)


def linearize(
    window: Window,
    factors: Factors,
    analytic_planes: bool = False,
    robust: RobustConfig | None = None,
    analytic_poses: bool = True,
) -> Linearization:
    """Build the blocked Gauss-Newton normal equations for the window.

    All scatter-adds are dense-indexed ``.at[].add`` on fixed-shape
    buffers — XLA lowers them to efficient scatters; no dynamic shapes.

    ``analytic_planes=True`` evaluates the plane-factor Jacobians with
    the closed-form batched implementation in
    :mod:`pop_up_slam_tpu.ops.plane_jacobians` (no per-factor jacfwd);
    identical to machine precision (tests/test_ops.py).

    ``robust`` selects per-factor-family IRLS kernels
    (:mod:`pop_up_slam_tpu.factors.robust`); ``None`` is plain least
    squares.  The reported ``cost`` is the robustified objective
    0.5 * sum rho(||r||^2), consistent with :func:`total_cost`.

    ``analytic_poses=True`` (default) uses the closed-form SE(3)
    between/prior Jacobians (inverse right Jacobian + adjoint,
    geometry/se3.py) instead of per-factor jacfwd; identical to f32
    precision (tests/test_geometry.py) and cheaper on TPU.
    """
    if robust is None:
        robust = RobustConfig()
    W = window.window_size
    L = window.max_landmarks
    dtype = window.t.dtype

    Hpp = jnp.zeros((W, W, 6, 6), dtype)
    Hpl = jnp.zeros((W, L, 6, 3), dtype)
    Hll = jnp.zeros((L, 3, 3), dtype)
    bp = jnp.zeros((W, 6), dtype)
    bl = jnp.zeros((L, 3), dtype)
    cost = jnp.zeros((), dtype)

    # --- odometry ---
    odom_terms = _odom_terms_analytic if analytic_poses else _odom_terms
    r_o, Ji, Jj = odom_terms(window, factors.odom)
    r_o, Ji, Jj, rho_o = apply_weights(robust.odom, r_o, Ji, Jj)
    hii = jnp.einsum("fab,fac->fbc", Ji, Ji)
    hij = jnp.einsum("fab,fac->fbc", Ji, Jj)
    hjj = jnp.einsum("fab,fac->fbc", Jj, Jj)
    gi = jnp.einsum("fab,fa->fb", Ji, r_o)
    gj = jnp.einsum("fab,fa->fb", Jj, r_o)
    oi, oj = factors.odom.i, factors.odom.j
    Hpp = Hpp.at[oi, oi].add(hii)
    Hpp = Hpp.at[oi, oj].add(hij)
    Hpp = Hpp.at[oj, oi].add(jnp.swapaxes(hij, -1, -2))
    Hpp = Hpp.at[oj, oj].add(hjj)
    bp = bp.at[oi].add(gi)
    bp = bp.at[oj].add(gj)
    cost = cost + 0.5 * jnp.sum(rho_o)

    # --- plane observations ---
    if analytic_planes:
        from ..ops.plane_jacobians import plane_terms_analytic

        r_f, Jp, Jl = plane_terms_analytic(window, factors.planes)
    else:
        r_f, Jp, Jl = _plane_terms(window, factors.planes)
    r_f, Jp, Jl, rho_f = apply_weights(robust.plane, r_f, Jp, Jl)
    hpp = jnp.einsum("fab,fac->fbc", Jp, Jp)
    hpl = jnp.einsum("fab,fac->fbc", Jp, Jl)
    hll = jnp.einsum("fab,fac->fbc", Jl, Jl)
    gp = jnp.einsum("fab,fa->fb", Jp, r_f)
    gl = jnp.einsum("fab,fa->fb", Jl, r_f)
    pi_, li_ = factors.planes.pose_idx, factors.planes.lm_idx
    Hpp = Hpp.at[pi_, pi_].add(hpp)
    Hpl = Hpl.at[pi_, li_].add(hpl)
    Hll = Hll.at[li_].add(hll)
    bp = bp.at[pi_].add(gp)
    bl = bl.at[li_].add(gl)
    cost = cost + 0.5 * jnp.sum(rho_f)

    # --- priors ---
    prior_terms = _prior_terms_analytic if analytic_poses else _prior_terms
    r_p, Jq = prior_terms(window, factors.priors)
    r_p, Jq, rho_p = apply_weights(robust.prior, r_p, Jq)
    hqq = jnp.einsum("fab,fac->fbc", Jq, Jq)
    gq = jnp.einsum("fab,fa->fb", Jq, r_p)
    qi = factors.priors.idx
    Hpp = Hpp.at[qi, qi].add(hqq)
    bp = bp.at[qi].add(gq)
    cost = cost + 0.5 * jnp.sum(rho_p)

    return Linearization(Hpp, Hpl, Hll, bp, bl, cost)


def total_cost(
    window: Window, factors: Factors, robust: RobustConfig | None = None
) -> jnp.ndarray:
    """0.5 * sum rho(||r||^2) of whitened residuals (LM accept/reject).

    With ``robust=None`` this is the plain least-squares cost."""
    from .robust import rho as _rho

    if robust is None:
        robust = RobustConfig()
    r_o, _, _ = _odom_terms(window, factors.odom)
    r_f, _, _ = _plane_terms(window, factors.planes)
    r_p, _ = _prior_terms(window, factors.priors)
    return 0.5 * (
        jnp.sum(_rho(robust.odom, jnp.sum(r_o * r_o, -1)))
        + jnp.sum(_rho(robust.plane, jnp.sum(r_f * r_f, -1)))
        + jnp.sum(_rho(robust.prior, jnp.sum(r_p * r_p, -1)))
    )
