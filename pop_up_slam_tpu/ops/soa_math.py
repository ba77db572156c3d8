"""Structure-of-arrays (SoA) Lie-group / plane algebra for Pallas kernels.

TPU VPU lanes want the *entity* dimension (factors, poses, landmarks)
along the 128-wide lane axis and every matrix/vector *component* as its
own row — so a batch of 3x3 matrices is a 3x3 python nest of ``(1, F)``
arrays, and all algebra is plain elementwise arithmetic that vectorizes
perfectly with zero gathers, transposes, or reshapes inside the kernel.

This module is the component-form port of :mod:`..geometry.se3` and
:mod:`..geometry.plane` (same formulas, same f32 small-angle Taylor
switches — the scalar coefficient helpers are imported from se3 so the
numerics have a single source of truth).  Everything here is pure jnp
on arrays of ANY broadcastable shape: the functions run identically

- inside a Pallas kernel body on ``(1, 128)`` lane rows
  (:mod:`.fused_gn`), and
- in plain XLA / on CPU on ``(N,)`` batches, which is how the tests
  verify them against the AoS geometry via ``vmap``
  (tests/test_soa.py).

Representation conventions:

- vec3 / vec4 / vec6 : list of component arrays ``[x, y, z, ...]``.
- mat3 / mat6        : row-major nested lists ``[[a00, a01, ...], ...]``.

Parity: the reference keeps all of this in Eigen scalars inside iSAM
(SURVEY.md §2.1 — reference mount empty, no file:line available); the
SoA form is what lets an entire Gauss-Newton linearization run as one
TPU kernel launch instead of a chain of tiny fused subgraphs.
"""

from __future__ import annotations

import jax.numpy as jnp

# Single source of truth for the f32 small-angle switches (see the
# _SMALL analysis in geometry/se3.py).
from ..geometry.se3 import (  # noqa: F401
    _EPS,
    _SMALL,
    _c2_coeff,
    _c3_coeff,
    _cosc,
    _sinc,
    _sincc,
)

# ---------------------------------------------------------------------------
# generic small-matrix / vector helpers (component nests)
# ---------------------------------------------------------------------------


def vdot(a, b):
    return sum(x * y for x, y in zip(a, b))


def vadd(a, b):
    return [x + y for x, y in zip(a, b)]


def vsub(a, b):
    return [x - y for x, y in zip(a, b)]


def vscale(a, s):
    return [x * s for x in a]


def vwhere(c, a, b):
    return [jnp.where(c, x, y) for x, y in zip(a, b)]


def v3cross(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def vnorm_safe(a):
    """||a|| with a NaN-free derivative at 0 (port of se3._safe_norm)."""
    sq = vdot(a, a)
    positive = sq > 0
    return jnp.where(positive, jnp.sqrt(jnp.where(positive, sq, 1.0)), 0.0)


def mmul(A, B):
    n, k, m = len(A), len(B), len(B[0])
    return [
        [sum(A[i][p] * B[p][j] for p in range(k)) for j in range(m)]
        for i in range(n)
    ]


def mT(A):
    return [[A[j][i] for j in range(len(A))] for i in range(len(A[0]))]


def mv(A, x):
    return [vdot(row, x) for row in A]


def madd(A, B):
    return [vadd(ra, rb) for ra, rb in zip(A, B)]


def msub(A, B):
    return [vsub(ra, rb) for ra, rb in zip(A, B)]


def mscale(A, s):
    return [vscale(row, s) for row in A]


def mwhere(c, A, B):
    return [vwhere(c, ra, rb) for ra, rb in zip(A, B)]


def meye(n, like):
    one = jnp.ones_like(like)
    zero = jnp.zeros_like(like)
    return [[one if i == j else zero for j in range(n)] for i in range(n)]


def outer(a, b):
    return [[x * y for y in b] for x in a]


def hat3(v):
    z = jnp.zeros_like(v[0])
    return [
        [z, -v[2], v[1]],
        [v[2], z, -v[0]],
        [-v[1], v[0], z],
    ]


def hat3_sq(v):
    """Closed form hat(v)^2 = v v^T - |v|^2 I (se3._hat_sq)."""
    n2 = vdot(v, v)
    O = outer(v, v)
    return [
        [O[i][j] - (n2 if i == j else 0.0 * n2) for j in range(3)]
        for i in range(3)
    ]


def m6_from_blocks(A, B, C, D):
    """[[A, B], [C, D]] with 3x3 blocks -> 6x6 nest."""
    out = []
    for i in range(3):
        out.append(list(A[i]) + list(B[i]))
    for i in range(3):
        out.append(list(C[i]) + list(D[i]))
    return out


def m3zero(like):
    z = jnp.zeros_like(like)
    return [[z, z, z], [z, z, z], [z, z, z]]


def signo(x):
    """sign with sign(0) = +1 (the convention every chart here uses)."""
    return jnp.where(x >= 0.0, 1.0, -1.0)


# ---------------------------------------------------------------------------
# SO(3) / SE(3)  (ports of geometry/se3.py — identical formulas)
# ---------------------------------------------------------------------------


def atan2_pos(y, x):
    """atan2(y, x) for y >= 0, x >= 0 from Mosaic-supported primitives.

    Pallas TPU has no atan/atan2/asin lowering, so this builds the
    first-quadrant arctangent from sqrt + polynomial: reduce the
    argument to [0, 1] via the quadrant swap, halve it twice with
    atan(t) = 2 atan(t / (1 + sqrt(1 + t^2))) (maps [0,1] ->
    [0, 0.199]), then a 4-term odd Taylor whose truncation error
    (z^9/9 at z=0.199 -> 6e-8, x4 after unhalving) is below f32
    resolution.  Verified against jnp.arctan2 in tests/test_soa.py.
    """
    big = y > x
    num = jnp.where(big, x, y)
    den = jnp.where(big, y, x)
    t = num / jnp.maximum(den, 1e-30)
    u = t / (1.0 + jnp.sqrt(1.0 + t * t))
    z = u / (1.0 + jnp.sqrt(1.0 + u * u))
    z2 = z * z
    a = 4.0 * z * (
        1.0 + z2 * (-1.0 / 3.0 + z2 * (0.2 + z2 * (-1.0 / 7.0)))
    )
    return jnp.where(big, 0.5 * jnp.pi - a, a)


def so3_exp_soa(phi):
    """Rodrigues: I + sinc(t) K + cosc(t) KK."""
    theta = vnorm_safe(phi)
    a = _sinc(theta)
    b = _cosc(theta)
    K = hat3(phi)
    KK = hat3_sq(phi)
    eye = meye(3, phi[0])
    return [
        [eye[i][j] + a * K[i][j] + b * KK[i][j] for j in range(3)]
        for i in range(3)
    ]


def rotmat_to_quat_soa(R):
    """Shepperd's method, branch-free candidate selection (port of
    se3.rotmat_to_quat — same first-max-wins argmax semantics)."""
    m00, m01, m02 = R[0]
    m10, m11, m12 = R[1]
    m20, m21, m22 = R[2]
    tr = m00 + m11 + m22

    qw = [1.0 + tr, m21 - m12, m02 - m20, m10 - m01]
    qx = [m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20]
    qy = [m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21]
    qz = [m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22]

    c0 = (tr >= m00) & (tr >= m11) & (tr >= m22)
    c1 = (~c0) & (m00 >= m11) & (m00 >= m22)
    c2 = (~c0) & (~c1) & (m11 >= m22)
    q = [
        jnp.where(c0, qw[k], jnp.where(c1, qx[k], jnp.where(c2, qy[k], qz[k])))
        for k in range(4)
    ]
    nrm = jnp.sqrt(vdot(q, q))
    q = [x / nrm for x in q]
    s = signo(q[0])
    return [x * s for x in q]


def so3_log_soa(R):
    """Log map via the quaternion route (port of se3.so3_log)."""
    q = rotmat_to_quat_soa(R)
    w = q[0]
    v = q[1:]
    vn = vnorm_safe(v)
    small = vn < 1e-3
    w_safe = jnp.maximum(w, _EPS)
    taylor = 2.0 / w_safe - 2.0 * vn * vn / (3.0 * w_safe**3)
    # vn >= 0 by construction, w >= 0 by canonical quaternion sign
    angle = 2.0 * atan2_pos(vn, w)
    exact = angle / jnp.maximum(vn, _EPS)
    scale = jnp.where(small, taylor, exact)
    return [scale * x for x in v]


def se3_V_soa(phi):
    theta = vnorm_safe(phi)
    b = _cosc(theta)
    c = _sincc(theta)
    K = hat3(phi)
    KK = hat3_sq(phi)
    eye = meye(3, phi[0])
    return [
        [eye[i][j] + b * K[i][j] + c * KK[i][j] for j in range(3)]
        for i in range(3)
    ]


def _cot_term(theta):
    """(1 - (t/2) cot(t/2)) / t^2 with the se3.py Taylor switch."""
    t2 = theta * theta
    safe = jnp.where(theta < _SMALL, 1.0, theta)
    half_s = 0.5 * safe
    return jnp.where(
        theta < _SMALL,
        1.0 / 12.0 + t2 / 720.0 + t2 * t2 / 30240.0,
        (1.0 - half_s * jnp.cos(half_s) / jnp.maximum(jnp.sin(half_s), _EPS))
        / (safe * safe),
    )


def se3_V_inv_soa(phi):
    theta = vnorm_safe(phi)
    ct = _cot_term(theta)
    K = hat3(phi)
    KK = hat3_sq(phi)
    eye = meye(3, phi[0])
    return [
        [eye[i][j] - 0.5 * K[i][j] + ct * KK[i][j] for j in range(3)]
        for i in range(3)
    ]


def se3_Q_soa(rho, phi):
    """Barfoot's Q(xi) coupling block (port of se3.se3_Q)."""
    theta = vnorm_safe(phi)
    rx = hat3(rho)
    px = hat3(phi)
    c1 = _sincc(theta)
    c2 = _c2_coeff(theta)
    c3 = _c3_coeff(theta)
    pr = mmul(px, rx)
    rp = mmul(rx, px)
    prp = mmul(pr, px)
    ppr = mmul(px, pr)
    rpp = mmul(rp, px)
    prpp = mmul(prp, px)
    pprp = mmul(ppr, px)
    return [
        [
            0.5 * rx[i][j]
            + c1 * (pr[i][j] + rp[i][j] + prp[i][j])
            + c2 * (ppr[i][j] + rpp[i][j] - 3.0 * prp[i][j])
            + c3 * (prpp[i][j] + pprp[i][j])
            for j in range(3)
        ]
        for i in range(3)
    ]


def se3_right_jacobian_inv_soa(rho, phi):
    """J_r^-1(xi) = J_l^-1(-xi) = [[V^-1, -V^-1 Q V^-1], [0, V^-1]]
    evaluated at -xi (port of se3.se3_right_jacobian_inv)."""
    nrho = [-x for x in rho]
    nphi = [-x for x in phi]
    Vi = se3_V_inv_soa(nphi)
    Q = se3_Q_soa(nrho, nphi)
    TR = mscale(mmul(mmul(Vi, Q), Vi), -1.0)
    Z = m3zero(phi[0])
    return m6_from_blocks(Vi, TR, Z, Vi)


def se3_adjoint_soa(R, t):
    """Ad(R, t) = [[R, hat(t) R], [0, R]] (translation-first xi)."""
    tR = mmul(hat3(t), R)
    Z = m3zero(t[0])
    return m6_from_blocks(R, tR, Z, R)


def se3_log_soa(R, t):
    """(rho, phi) 6-vector as (rho_list, phi_list) pair of vec3."""
    phi = so3_log_soa(R)
    rho = mv(se3_V_inv_soa(phi), t)
    return rho, phi


def se3_exp_soa(rho, phi):
    R = so3_exp_soa(phi)
    t = mv(se3_V_soa(phi), rho)
    return R, t


def se3_compose_soa(Ra, ta, Rb, tb):
    return mmul(Ra, Rb), vadd(mv(Ra, tb), ta)


def se3_inverse_soa(R, t):
    Rt = mT(R)
    return Rt, [-x for x in mv(Rt, t)]


def se3_between_soa(Ra, ta, Rb, tb):
    Ri, ti = se3_inverse_soa(Ra, ta)
    return se3_compose_soa(Ri, ti, Rb, tb)


def inv3_soa(A):
    """Closed-form 3x3 inverse via the adjugate, |det| floored at 1e-12
    (parity with solver.schur.inv3x3)."""
    a, b, c = A[0]
    d, e, f = A[1]
    g, h, i = A[2]
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
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    return [[A00 / det, A01 / det, A02 / det],
            [A10 / det, A11 / det, A12 / det],
            [A20 / det, A21 / det, A22 / det]]


def spd_inv6_soa(H):
    """6x6 SPD inverse by 3x3 block elimination (parity with
    solver.schur.spd_inv6_blocked)."""
    A = [row[0:3] for row in H[0:3]]
    B = [row[3:6] for row in H[0:3]]
    D = [row[3:6] for row in H[3:6]]
    Ai = inv3_soa(A)
    AiB = mmul(Ai, B)
    S = msub(D, mmul(mT(B), AiB))
    Si = inv3_soa(S)
    TR = mscale(mmul(AiB, Si), -1.0)
    TL = msub(Ai, mmul(TR, mT(AiB)))
    return m6_from_blocks(TL, TR, mT(TR), Si)


def chol_lower_soa(A, n: int):
    """Right-looking Cholesky of an n x n SPD nest, pivots floored at
    1e-12 (parity with solver.schur.chol_small).  Returns lower L."""
    A = [row[:] for row in A]
    zero = jnp.zeros_like(A[0][0])
    L = [[zero for _ in range(n)] for _ in range(n)]
    for j in range(n):
        d = jnp.sqrt(jnp.maximum(A[j][j], 1e-12))
        col = [A[i][j] / d for i in range(n)]
        for i in range(j, n):
            L[i][j] = col[i]
        for i in range(j, n):
            for k in range(j, n):
                A[i][k] = A[i][k] - col[i] * col[k]
    return L


# ---------------------------------------------------------------------------
# Planes on S^3  (ports of geometry/plane.py)
# ---------------------------------------------------------------------------


def plane_normalize_soa(pi):
    """Unit 4-norm + canonical sign (port of plane.normalize: sign by d
    if |d| > 1e-6, else nz, else ny, else nx)."""
    nrm = jnp.maximum(jnp.sqrt(vdot(pi, pi)), 1e-9)
    p = [x / nrm for x in pi]
    nx, ny, nz, d = p
    tol = 1e-6
    s = jnp.where(
        jnp.abs(d) > tol,
        signo(d),
        jnp.where(
            jnp.abs(nz) > tol,
            signo(nz),
            jnp.where(jnp.abs(ny) > tol, signo(ny), signo(nx + 1e-30)),
        ),
    )
    return [x * s for x in p]


def tangent_basis4_soa(pi):
    """Orthonormal S^3 tangent basis, 4x3 nest (port of
    plane.tangent_basis: Householder mapping e_k -> pi, k = argmax |pi_k|
    first-max-wins; kept columns = the three != k in ascending order)."""
    a = [jnp.abs(x) for x in pi]
    c0 = (a[0] >= a[1]) & (a[0] >= a[2]) & (a[0] >= a[3])
    c1 = (~c0) & (a[1] >= a[2]) & (a[1] >= a[3])
    c2 = (~c0) & (~c1) & (a[2] >= a[3])
    c3 = ~(c0 | c1 | c2)
    cs = [c0, c1, c2, c3]
    pk = jnp.where(c0, pi[0], jnp.where(c1, pi[1], jnp.where(c2, pi[2], pi[3])))
    s = signo(pk)
    f32 = pi[0].dtype
    ek = [c.astype(f32) for c in cs]
    v = [pi[i] - s * ek[i] for i in range(4)]
    vv = jnp.maximum(vdot(v, v), 1e-9)
    H = [
        [(1.0 if i == j else 0.0) - 2.0 * v[i] * v[j] / vv for j in range(4)]
        for i in range(4)
    ]
    # kept column indices ascending, excluding k:
    #   k=0 -> (1,2,3); k=1 -> (0,2,3); k=2 -> (0,1,3); k=3 -> (0,1,2)
    B = []
    for i in range(4):
        col0 = jnp.where(c0, H[i][1], H[i][0])
        col1 = jnp.where(c2 | c3, H[i][1], H[i][2])
        col2 = jnp.where(c3, H[i][2], H[i][3])
        B.append([col0, col1, col2])
    return B


def normal_tangent_basis_cols_soa(n):
    """The two tangent columns of S^2 at unit normal n (port of
    plane.normal_tangent_basis; same scheme one dimension down).
    Returns (col0, col1), each a vec3."""
    a = [jnp.abs(x) for x in n]
    k0 = (a[0] >= a[1]) & (a[0] >= a[2])
    k1 = (~k0) & (a[1] >= a[2])
    k2 = ~(k0 | k1)
    sk = signo(jnp.where(k0, n[0], jnp.where(k1, n[1], n[2])))
    f32 = n[0].dtype
    ek = [k0.astype(f32), k1.astype(f32), k2.astype(f32)]
    v = [n[i] - sk * ek[i] for i in range(3)]
    vv = jnp.maximum(vdot(v, v), 1e-9)
    H = [
        [(1.0 if i == j else 0.0) - 2.0 * v[i] * v[j] / vv for j in range(3)]
        for i in range(3)
    ]
    col0 = [jnp.where(k0, H[i][1], H[i][0]) for i in range(3)]
    col1 = [jnp.where(k2, H[i][1], H[i][2]) for i in range(3)]
    return col0, col1
