"""Pinhole camera model: projection, ray casting, ray-plane intersection.

The pop-up front-end (paper arXiv:1703.07334 §III; reference component
``pop_up_wall/popup_plane`` per SURVEY.md §2.1) needs exactly three
camera operations, all implemented here as batched, jit-safe jax:

- back-project pixels to unit-depth rays,
- intersect rays with a plane (ground plane for the boundary pop-up,
  wall planes for depth recovery),
- project 3D points to pixels (for polygon-overlap association checks).

Frames: camera frame is the usual CV convention (+x right, +y down,
+z forward).  The world frame is gravity aligned with +z up and the
ground plane at z = 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Intrinsics(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @staticmethod
    def create(fx, fy, cx, cy, dtype=jnp.float32) -> "Intrinsics":
        return Intrinsics(
            jnp.asarray(fx, dtype), jnp.asarray(fy, dtype),
            jnp.asarray(cx, dtype), jnp.asarray(cy, dtype),
        )

    def matrix(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            -2,
        )


def pixel_rays(K: Intrinsics, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels (..., 2) -> unit-z rays (..., 3) in the camera frame."""
    x = (uv[..., 0] - K.cx) / K.fx
    y = (uv[..., 1] - K.cy) / K.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def project(K: Intrinsics, p_cam: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> pixels (..., 2). No validity check;
    callers mask on z > 0 themselves."""
    z = jnp.where(jnp.abs(p_cam[..., 2]) < eps, eps, p_cam[..., 2])
    u = K.fx * p_cam[..., 0] / z + K.cx
    v = K.fy * p_cam[..., 1] / z + K.cy
    return jnp.stack([u, v], axis=-1)


def ray_plane_depth(rays: jnp.ndarray, pi_cam: jnp.ndarray, eps: float = 1e-6):
    """Intersect rays (..., 3) with plane pi (..., 4), both in camera frame.

    Returns (depth_z, valid): for ray r, point = s * r with
    s = -d / (n . r); depth_z = s * r_z = s (rays have unit z).  valid is
    False where the ray is (near-)parallel to the plane or hits behind
    the camera.
    """
    n = pi_cam[..., :3]
    d = pi_cam[..., 3]
    denom = jnp.sum(n * rays, axis=-1)
    safe = jnp.where(jnp.abs(denom) < eps, eps, denom)
    s = -d / safe
    valid = (jnp.abs(denom) >= eps) & (s > 0)
    return s, valid


def backproject_to_world_plane(
    K: Intrinsics,
    uv: jnp.ndarray,
    R_wc: jnp.ndarray,
    t_wc: jnp.ndarray,
    pi_w: jnp.ndarray,
    eps: float = 1e-6,
):
    """Intersect pixel rays with a *world-frame* plane.

    This is the core "pop-up" operation (paper §III-B): the ground-wall
    boundary pixel is cast from the camera center through the pixel and
    intersected with the ground plane z=0 (pi_w = (0,0,1,0)).

    Returns (p_world (..., 3), valid).
    """
    r_cam = pixel_rays(K, uv)
    r_w = (R_wc @ r_cam[..., None])[..., 0]
    n = pi_w[..., :3]
    d = pi_w[..., 3]
    denom = jnp.sum(n * r_w, axis=-1)
    num = -(jnp.sum(n * t_wc, axis=-1) + d)
    safe = jnp.where(jnp.abs(denom) < eps, eps, denom)
    s = num / safe
    valid = (jnp.abs(denom) >= eps) & (s > eps)
    p = t_wc + s[..., None] * r_w
    return p, valid
