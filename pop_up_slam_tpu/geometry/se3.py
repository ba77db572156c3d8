"""SO(3)/SE(3) Lie-group operations, pure jax.

Conventions
-----------
- Rotations are 3x3 matrices ``R``; poses are ``(R, t)`` pairs acting on
  points as ``x_world = R @ x_local + t`` (i.e. pose = world-from-local,
  "T_wc" when the local frame is a camera).
- Tangent vectors are 6-vectors ``xi = (rho, phi)`` with translational
  part first, rotational part last; ``exp`` uses the SE(3) exponential
  with the V-matrix coupling.
- Everything is branch-free (jnp.where with safe denominators) so it is
  jit/vmap-safe and numerically stable near the identity.

Parity: the reference stack keeps SE(3) in Eigen inside iSAM
(``Pose3d_Node``; SURVEY.md §2.1 — reference mount empty, no file:line
available) — here poses are plain pytrees of jnp arrays so the whole
window can be vmapped and sharded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _safe_norm(x: jnp.ndarray) -> jnp.ndarray:
    """||x|| with a NaN-free derivative at x = 0.

    ``jnp.linalg.norm`` has d|x|/dx = x/|x| -> 0/0 = NaN at the origin;
    under ``jacfwd`` that NaN survives multiplication by a zero mask
    (NaN * 0 = NaN) and poisons the whole assembled Hessian whenever a
    padded/invalid factor is linearized at the identity.  Routing the
    zero case through a constant branch gives a 0 subgradient instead.
    """
    sq = jnp.sum(x * x, axis=-1)
    positive = sq > 0
    safe = jnp.where(positive, sq, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), 0.0)


def _hat_sq(phi: jnp.ndarray) -> jnp.ndarray:
    """Closed form K(phi)^2 = phi phi^T - |phi|^2 I.

    Avoids a 3x3 matmul: on this stack the default f32 matmul precision
    is reduced (bf16 passes) and geometry needs full f32 accuracy.
    """
    outer = phi[..., :, None] * phi[..., None, :]
    n2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), outer.shape)
    return outer - n2 * eye


def hat(phi: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: 3-vector -> skew-symmetric 3x3. Batched on leading dims."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(M: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat`."""
    return jnp.stack([M[..., 2, 1], M[..., 0, 2], M[..., 1, 0]], axis=-1)


# Small-angle handling.  These coefficient functions all have removable
# singularities at 0 whose "exact" forms lose catastrophically in
# float32 well before 1e-8: e.g. (x - sin x)/x^3 has absolute sin error
# ~eps_f32, so its relative error is ~6 eps_f32/x^2 — 100% wrong at
# x = 6e-4 — and jacfwd through the cancellation is far worse (this
# blew up the odometry Jacobians of near-exact between-factors to ~1e7,
# making the reduced camera system indefinite and the window NaN).
# Each function therefore switches to a Taylor series below
# _SMALL = 0.1, where the truncation error (next term ~x^6) is below
# f32 resolution, and uses cancellation-free exact forms above.
_SMALL = 0.1


def _sinc(x: jnp.ndarray) -> jnp.ndarray:
    """sin(x)/x, branch-free at 0 (no cancellation; guard divide only)."""
    x2 = x * x
    safe = jnp.where(jnp.abs(x) < _SMALL, 1.0, x)
    return jnp.where(
        jnp.abs(x) < _SMALL,
        1.0 - x2 / 6.0 + x2 * x2 / 120.0,
        jnp.sin(safe) / safe,
    )


def _cosc(x: jnp.ndarray) -> jnp.ndarray:
    """(1 - cos(x)) / x**2 == 0.5 * sinc(x/2)^2 — cancellation-free."""
    s = _sinc(0.5 * x)
    return 0.5 * s * s


def _sincc(x: jnp.ndarray) -> jnp.ndarray:
    """(x - sin(x)) / x**3, Taylor below _SMALL (f32 cancellation)."""
    x2 = x * x
    safe = jnp.where(jnp.abs(x) < _SMALL, 1.0, x)
    return jnp.where(
        jnp.abs(x) < _SMALL,
        1.0 / 6.0 - x2 / 120.0 + x2 * x2 / 5040.0,
        (safe - jnp.sin(safe)) / (safe * safe * safe),
    )


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula. phi: (..., 3) -> R: (..., 3, 3)."""
    theta = _safe_norm(phi)
    K = hat(phi)
    KK = _hat_sq(phi)
    a = _sinc(theta)[..., None, None]
    b = _cosc(theta)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a * K + b * KK


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map of SO(3), returns rotation vector (..., 3).

    Uses the quaternion route which is stable for angles near 0 and pi.
    """
    q = rotmat_to_quat(R)  # (w, x, y, z), w >= 0
    w = q[..., 0]
    v = q[..., 1:]
    vn = _safe_norm(v)
    # angle = 2*atan2(|v|, w); axis = v/|v|.  For small |v| (w ~ 1) use
    # the Taylor expansion 2/w - 2|v|^2/(3 w^3): the exact angle/|v|
    # quotient is fine in value there but its f32 jacfwd carries
    # ~eps/|v| cancellation noise.  (Near angle = pi it is w that is
    # small and |v| ~ 1, so the exact branch applies and is stable.)
    small = vn < 1e-3
    w_safe = jnp.maximum(w, _EPS)
    taylor = 2.0 / w_safe - 2.0 * vn * vn / (3.0 * w_safe**3)
    angle = 2.0 * jnp.arctan2(vn, w)
    exact = angle / jnp.maximum(vn, _EPS)
    scale = jnp.where(small, taylor, exact)
    return scale[..., None] * v


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), w >= 0. Branch-free.

    Shepperd's method evaluated on all four candidates and selected by
    argmax of the diagonal terms — vmap-safe.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions (unnormalized), one per dominant term.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0.0, -1.0, 1.0)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz], axis=-1),
        ],
        axis=-2,
    )


def se3_V(phi: jnp.ndarray) -> jnp.ndarray:
    """The SE(3) left-Jacobian-of-translation V(phi)."""
    theta = _safe_norm(phi)
    K = hat(phi)
    KK = _hat_sq(phi)
    b = _cosc(theta)[..., None, None]
    c = _sincc(theta)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b * K + c * KK


def se3_V_inv(phi: jnp.ndarray) -> jnp.ndarray:
    """Inverse of V(phi), closed form."""
    theta = _safe_norm(phi)
    K = hat(phi)
    KK = _hat_sq(phi)
    # coefficient for KK: (1/theta^2) * (1 - (theta/2) * cot(theta/2)).
    # The exact form is a catastrophic f32 cancellation below ~0.1 rad
    # (see the _SMALL note above) — Taylor there, exact beyond.  The
    # sin clamp only matters as |phi| -> 2*pi (sin(theta/2) -> 0+ and
    # cot diverges); so3_log/se3_log never produce theta > pi, but the
    # function is importable with arbitrary phi, so keep it finite.
    t2 = theta * theta
    safe = jnp.where(theta < _SMALL, 1.0, theta)
    half_s = 0.5 * safe
    cot_term = jnp.where(
        theta < _SMALL,
        1.0 / 12.0 + t2 / 720.0 + t2 * t2 / 30240.0,
        (1.0 - half_s * jnp.cos(half_s) / jnp.maximum(jnp.sin(half_s), _EPS))
        / (safe * safe),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - 0.5 * K + cot_term[..., None, None] * KK


def se3_exp(xi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SE(3) exp. xi = (rho, phi): (..., 6) -> (R (..., 3, 3), t (..., 3))."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = (se3_V(phi) @ rho[..., None])[..., 0]
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """SE(3) log -> (..., 6) = (rho, phi)."""
    phi = so3_log(R)
    rho = (se3_V_inv(phi) @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def _c2_coeff(theta: jnp.ndarray) -> jnp.ndarray:
    """(theta^2 + 2 cos theta - 2) / (2 theta^4), Taylor below _SMALL."""
    t2 = theta * theta
    safe = jnp.where(theta < _SMALL, 1.0, theta)
    return jnp.where(
        theta < _SMALL,
        1.0 / 24.0 - t2 / 720.0 + t2 * t2 / 40320.0,
        (safe * safe + 2.0 * jnp.cos(safe) - 2.0) / (2.0 * safe ** 4),
    )


def _c3_coeff(theta: jnp.ndarray) -> jnp.ndarray:
    """(2 theta - 3 sin theta + theta cos theta) / (2 theta^5), Taylor
    below _SMALL."""
    t2 = theta * theta
    safe = jnp.where(theta < _SMALL, 1.0, theta)
    return jnp.where(
        theta < _SMALL,
        1.0 / 120.0 - t2 / 2520.0 + t2 * t2 / 120960.0,
        (2.0 * safe - 3.0 * jnp.sin(safe) + safe * jnp.cos(safe))
        / (2.0 * safe ** 5),
    )


def se3_Q(rho: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """Barfoot's Q(xi) — the translation-rotation coupling block of the
    SE(3) left Jacobian (State Estimation for Robotics, eq. 7.86;
    translation-first xi = (rho, phi) as everywhere in this module).
    All coefficients carry the same f32 small-angle Taylor switches as
    the rest of the file (see the _SMALL analysis above)."""
    theta = _safe_norm(phi)
    rx = hat(rho)
    px = hat(phi)
    c1 = _sincc(theta)[..., None, None]
    c2 = _c2_coeff(theta)[..., None, None]
    c3 = _c3_coeff(theta)[..., None, None]
    pr = px @ rx
    rp = rx @ px
    prp = pr @ px
    return (
        0.5 * rx
        + c1 * (pr + rp + prp)
        + c2 * (px @ pr + rp @ px - 3.0 * prp)
        + c3 * (prp @ px + px @ pr @ px)
    )


def se3_left_jacobian_inv(xi: jnp.ndarray) -> jnp.ndarray:
    """Inverse SE(3) left Jacobian, (..., 6, 6) closed form:
    [[V^-1, -V^-1 Q V^-1], [0, V^-1]]."""
    rho, phi = xi[..., :3], xi[..., 3:]
    Vi = se3_V_inv(phi)
    Q = se3_Q(rho, phi)
    top_right = -Vi @ Q @ Vi
    z = jnp.zeros_like(Vi)
    top = jnp.concatenate([Vi, top_right], axis=-1)
    bot = jnp.concatenate([z, Vi], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_right_jacobian_inv(xi: jnp.ndarray) -> jnp.ndarray:
    """Inverse SE(3) right Jacobian: J_r^-1(xi) = J_l^-1(-xi).

    This is the exact derivative d log(E exp(eps)) / d eps at eps = 0
    with E = exp(xi) — the matrix every between/prior factor Jacobian
    is built from (factors/graph.py analytic pose terms)."""
    return se3_left_jacobian_inv(-xi)


def se3_right_jacobian_inv_approx(xi: jnp.ndarray) -> jnp.ndarray:
    """First-order J_r^-1(xi) ~= I + 0.5 ad(xi), error O(|xi|^2).

    For residual-of-measurement arguments (warm-started windows keep
    them at the 1e-2 scale) the quadratic error is ~1e-4 — far below
    the marginal-prior information floor — at a quarter of the exact
    form's op count.  ad(xi) = [[phi^, rho^], [0, phi^]]."""
    rho, phi = xi[..., :3], xi[..., 3:]
    px = hat(phi)
    rx = hat(rho)
    z = jnp.zeros_like(px)
    ad = jnp.concatenate([
        jnp.concatenate([px, rx], axis=-1),
        jnp.concatenate([z, px], axis=-1),
    ], axis=-2)
    eye = jnp.broadcast_to(jnp.eye(6, dtype=xi.dtype), ad.shape)
    return eye + 0.5 * ad


def se3_adjoint(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of (R, t): T exp(xi) T^-1 = exp(Ad_T xi), (..., 6, 6)
    with the translation-first (rho, phi) ordering:
    [[R, t^ R], [0, R]]."""
    tR = hat(t) @ R
    z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) o (Rb,tb): first apply b, then a."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def se3_between(Ra, ta, Rb, tb):
    """Relative pose a^-1 o b (the 'between' of iSAM's Pose3d_Pose3d_Factor)."""
    Ri, ti = se3_inverse(Ra, ta)
    return se3_compose(Ri, ti, Rb, tb)


def se3_apply(R, t, x):
    """Transform points x (..., 3) by pose (R, t)."""
    return (R @ x[..., None])[..., 0] + t


def se3_retract(R, t, xi):
    """Right-multiplicative retraction: (R,t) * exp(xi).

    Used by the GN/LM solver; local perturbations live in the body frame,
    matching the Jacobians in :mod:`pop_up_slam_tpu.factors`.
    """
    dR, dt = se3_exp(xi)
    return se3_compose(R, t, dR, dt)


def se3_matrix(R, t):
    """(R, t) -> 4x4 homogeneous matrix (batched)."""
    batch = R.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(T):
    return T[..., :3, :3], T[..., :3, 3]
