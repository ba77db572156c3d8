"""Homogeneous plane landmarks on S^3 with a minimal 3-DOF chart.

A plane is the homogeneous 4-vector ``pi = (n, d)`` with ``n . p + d = 0``
for points ``p`` on the plane.  Following Kaess ICRA'15 ("Simultaneous
localization and mapping with infinite planes", the parametrization the
reference's plane-node extension to iSAM uses — SURVEY.md §2.1, paper
arXiv:1703.07334 §IV-A), the landmark state is the *unit* 4-vector
``pi / ||pi||_4`` on S^3 with antipodal sign fixed, and updates live in
the 3-dim tangent space via an orthonormal tangent basis.

All functions are branch-free and batched over leading dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def normalize(pi: jnp.ndarray) -> jnp.ndarray:
    """Scale to unit 4-norm and fix sign so the largest-|.| of (d, nz, ny, nx)
    is positive is NOT used — instead we fix sign by d >= 0 when |d| is
    significant, else by the first significant normal component.  Sign fixing
    keeps the antipodal ambiguity (pi ~ -pi) from flipping residuals."""
    pi = pi / jnp.maximum(jnp.linalg.norm(pi, axis=-1, keepdims=True), _EPS)
    # Branch-free canonical sign: use d if |d| > tol else fallback chain.
    d = pi[..., 3]
    nx, ny, nz = pi[..., 0], pi[..., 1], pi[..., 2]
    tol = 1e-6
    s = jnp.where(
        jnp.abs(d) > tol,
        jnp.sign(d),
        jnp.where(
            jnp.abs(nz) > tol,
            jnp.sign(nz),
            jnp.where(jnp.abs(ny) > tol, jnp.sign(ny), jnp.sign(nx + 1e-30)),
        ),
    )
    return pi * s[..., None]


def from_normal_distance(n: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Build unit plane from (unnormalized) normal and offset: n.p + d = 0."""
    return normalize(jnp.concatenate([n, d[..., None]], axis=-1))


def to_hessian_normal(pi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (unit normal n, signed distance d) with ||n||=1: n.p + d = 0."""
    n = pi[..., :3]
    nn = jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), _EPS)
    return n / nn, pi[..., 3] / nn[..., 0]


def tangent_basis(pi: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal basis B (..., 4, 3) of the tangent space of S^3 at pi.

    Built by Gram-Schmidt of the 4x4 identity against pi, dropping the
    column most parallel to pi — branch-free via a smooth weighting:
    we use the Householder reflector that maps e_k -> pi where
    k = argmax |pi_k|; the remaining 3 columns of the reflector form an
    orthonormal tangent basis.  argmax is computed branch-free.
    """
    # Householder: H = I - 2 v v^T / (v^T v), v = pi - s e_k, s = sign(pi_k)
    k = jnp.argmax(jnp.abs(pi), axis=-1)
    e_k = jax.nn.one_hot(k, 4, dtype=pi.dtype)
    s = jnp.take_along_axis(pi, k[..., None], axis=-1)[..., 0]
    s = jnp.where(s >= 0, 1.0, -1.0)
    v = pi - s[..., None] * e_k
    vv = jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), _EPS)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=pi.dtype), pi.shape + (4,))
    H = eye - 2.0 * v[..., :, None] * v[..., None, :] / vv[..., None]
    # Columns of H are orthonormal; column k is ±pi. Drop it, keep others.
    # Branch-free drop: gather the 3 column indices != k.
    all_idx = jnp.arange(4)
    # For each batch element, the kept indices are the 3 smallest of
    # (all_idx + 4 * (all_idx == k)) — pushes column k to the end.
    shifted = all_idx + 4 * (all_idx == k[..., None]).astype(all_idx.dtype)
    keep = jnp.argsort(shifted, axis=-1)[..., :3]  # (..., 3)
    B = jnp.take_along_axis(H, keep[..., None, :], axis=-1)  # (..., 4, 3)
    return B


def retract(pi: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """pi ⊞ delta: move along tangent basis then renormalize to S^3.

    ``delta`` is (..., 3).  This is the standard unit-sphere retraction;
    it agrees with the exponential map to second order.
    """
    B = tangent_basis(pi)
    return normalize(pi + (B @ delta[..., None])[..., 0])


def local(pi_ref: jnp.ndarray, pi: jnp.ndarray) -> jnp.ndarray:
    """Minimal 3-dim difference of pi w.r.t. pi_ref (inverse of retract to
    first order): project (±pi - pi_ref) onto the tangent basis at pi_ref,
    picking the sign of pi closest to pi_ref (antipodal handling)."""
    sign = jnp.where(jnp.sum(pi_ref * pi, axis=-1, keepdims=True) >= 0.0, 1.0, -1.0)
    d = sign * pi - pi_ref
    B = tangent_basis(pi_ref)
    return (jnp.swapaxes(B, -1, -2) @ d[..., None])[..., 0]


def normal_tangent_basis(n: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal basis B (..., 3, 2) of the tangent plane of S^2 at the
    unit normal n — Householder construction, branch-free (same scheme
    as :func:`tangent_basis` one dimension down).  Used by the
    Hessian-normal plane residual."""
    k = jnp.argmax(jnp.abs(n), axis=-1)
    e_k = jax.nn.one_hot(k, 3, dtype=n.dtype)
    s = jnp.take_along_axis(n, k[..., None], axis=-1)[..., 0]
    s = jnp.where(s >= 0, 1.0, -1.0)
    v = n - s[..., None] * e_k
    vv = jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), _EPS)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=n.dtype), n.shape + (3,))
    H = eye - 2.0 * v[..., :, None] * v[..., None, :] / vv[..., None]
    all_idx = jnp.arange(3)
    shifted = all_idx + 3 * (all_idx == k[..., None]).astype(all_idx.dtype)
    keep = jnp.argsort(shifted, axis=-1)[..., :2]
    return jnp.take_along_axis(H, keep[..., None, :], axis=-1)  # (..., 3, 2)


def hessian_local(pi_pred: jnp.ndarray, pi_meas: jnp.ndarray) -> jnp.ndarray:
    """Minimal 3-dim plane error in *metric* units: 2 normal-tangent
    components (radians, small-angle) + 1 signed-distance difference
    (meters), antipodal-invariant.

    The S^3 chart (:func:`local`) compresses distance errors of far
    planes by ~1/(1 + d^2), which destroys the along-corridor
    observability of distant walls (a 0.15 m error on a d=10 plane is
    ~0.0015 in S^3 tangent units).  SLAM factors therefore use this
    Hessian-normal residual; the S^3 chart remains the landmark *state*
    parametrization (retraction), following Kaess ICRA'15.
    """
    n_p, d_p = to_hessian_normal(pi_pred)
    n_m, d_m = to_hessian_normal(pi_meas)
    s = jnp.where(jnp.sum(n_p * n_m, axis=-1, keepdims=True) >= 0.0, 1.0, -1.0)
    n_m = s * n_m
    d_m = s[..., 0] * d_m
    B = normal_tangent_basis(n_m)
    r_n = jnp.einsum("...ij,...i->...j", B, n_p)   # (..., 2)
    r_d = d_p - d_m
    return jnp.concatenate([r_n, r_d[..., None]], axis=-1)


def transform(pi_w: jnp.ndarray, R_cw: jnp.ndarray, t_cw: jnp.ndarray) -> jnp.ndarray:
    """Transform a world plane into a frame c given the *world-from-c* pose?

    No: given the pose (R_cw, t_cw) mapping world points into frame c
    (x_c = R_cw x_w + t_cw), planes transform by the inverse-transpose:
        pi_c = T_cw^{-T} pi_w,  T_cw = [[R, t], [0, 1]]
        T^{-T} = [[R, 0], [t^T R ... ]] — concretely:
        n_c = R_cw n_w
        d_c = d_w - t_cw . (R_cw n_w)   (derived from n_w.x_w + d_w = 0)
    Returns a unit plane (renormalized, sign-fixed).
    """
    n_w = pi_w[..., :3]
    d_w = pi_w[..., 3]
    n_c = (R_cw @ n_w[..., None])[..., 0]
    d_c = d_w - jnp.sum(t_cw * n_c, axis=-1)
    return normalize(jnp.concatenate([n_c, d_c[..., None]], axis=-1))


def transform_to_world(pi_c: jnp.ndarray, R_wc: jnp.ndarray, t_wc: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`transform`: plane observed in frame c -> world,
    given the world-from-c pose (x_w = R_wc x_c + t_wc):
        n_w = R_wc n_c
        d_w = d_c - (-R_wc^T t_wc) . n_c ... derived directly:
        n_c . x_c + d_c = 0, x_c = R_wc^T (x_w - t_wc)
        => (R_wc n_c) . x_w + (d_c + n_w . t_wc) ... careful with signs:
        n_c^T R_wc^T x_w - n_c^T R_wc^T t_wc + d_c = 0
        => n_w = R_wc n_c, d_w = d_c - n_w . t_wc
    """
    n_c = pi_c[..., :3]
    d_c = pi_c[..., 3]
    n_w = (R_wc @ n_c[..., None])[..., 0]
    d_w = d_c - jnp.sum(t_wc * n_w, axis=-1)
    return normalize(jnp.concatenate([n_w, d_w[..., None]], axis=-1))


def point_to_plane_distance(pi: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Signed distance of points p (..., 3) to plane pi (..., 4)."""
    n, d = to_hessian_normal(pi)
    return jnp.sum(n * p, axis=-1) + d


def normal_angle(pi_a: jnp.ndarray, pi_b: jnp.ndarray) -> jnp.ndarray:
    """Unsigned angle between plane normals, antipodal-invariant (radians)."""
    na, _ = to_hessian_normal(pi_a)
    nb, _ = to_hessian_normal(pi_b)
    c = jnp.abs(jnp.sum(na * nb, axis=-1))
    return jnp.arccos(jnp.clip(c, 0.0, 1.0))
