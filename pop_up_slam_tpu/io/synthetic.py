"""Synthetic plane-world generator: corridors/rooms with ground-truth.

Role (SURVEY.md §4 item 2; BASELINE config 2): a controlled world of
vertical wall segments on a flat ground plane, with

- a ground-truth camera trajectory,
- exact per-frame plane observations (+ optional noise),
- noisy odometry between consecutive frames,
- a rendered label/depth image per frame (ray-cast against the wall
  rectangles and ground plane) for testing the pop-up front-end and for
  training the learned segmentation model.

Everything is fixed-capacity (MAX_WALLS) and jit/vmap-safe.

World frame: +z up, ground plane z = 0.  Camera frame: CV convention
(+x right, +y down, +z forward); a camera "looking along horizontal
unit direction f" has R_wc columns (right, down, forward) =
([f_y, -f_x, 0], [0, 0, -1], [f_x, f_y, 0]).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3, plane, camera
from ..geometry.camera import Intrinsics


class WallWorld(NamedTuple):
    """Fixed-capacity set of vertical wall segments.

    p0, p1: (MAX_WALLS, 2) ground-line endpoints in world XY.
    height: (MAX_WALLS,) wall heights.
    valid:  (MAX_WALLS,) bool mask.
    """

    p0: jnp.ndarray
    p1: jnp.ndarray
    height: jnp.ndarray
    valid: jnp.ndarray

    @property
    def max_walls(self) -> int:
        return self.p0.shape[0]

    def planes(self) -> jnp.ndarray:
        """World-frame homogeneous plane per wall, (MAX_WALLS, 4), unit."""
        d = self.p1 - self.p0
        n = jnp.stack([d[:, 1], -d[:, 0], jnp.zeros_like(d[:, 0])], axis=-1)
        off = -jnp.sum(n * jnp.pad(self.p0, ((0, 0), (0, 1))), axis=-1)
        return plane.normalize(jnp.concatenate([n, off[:, None]], axis=-1))


def make_world(segments, heights=2.5, max_walls: int = 16) -> WallWorld:
    """Build a WallWorld from a python list of ((x0,y0),(x1,y1)) segments."""
    n = len(segments)
    assert n <= max_walls
    p0 = np.zeros((max_walls, 2), np.float32)
    p1 = np.zeros((max_walls, 2), np.float32)
    h = np.full((max_walls,), float(heights) if np.isscalar(heights) else 0.0, np.float32)
    if not np.isscalar(heights):
        h[:n] = np.asarray(heights, np.float32)
    v = np.zeros((max_walls,), bool)
    for i, (a, b) in enumerate(segments):
        p0[i] = a
        p1[i] = b
        v[i] = True
    # keep invalid walls far away & degenerate-free
    p0[n:] = 1e6
    p1[n:] = 1e6 + 1.0
    return WallWorld(jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(h), jnp.asarray(v))


def corridor_world(length: float = 10.0, width: float = 2.0, height: float = 2.5,
                   max_walls: int = 16) -> WallWorld:
    """A straight corridor along +y with an end wall (BASELINE config 2)."""
    hw = width / 2.0
    return make_world(
        [
            ((-hw, 0.0), (-hw, length)),        # left wall
            ((hw, 0.0), (hw, length)),          # right wall
            ((-hw, length), (hw, length)),      # end wall
        ],
        heights=height,
        max_walls=max_walls,
    )


def room_world(size: float = 6.0, height: float = 2.5, max_walls: int = 16) -> WallWorld:
    """A square room with an interior partition — more association pressure."""
    s = size / 2.0
    return make_world(
        [
            ((-s, -s), (s, -s)),
            ((s, -s), (s, s)),
            ((s, s), (-s, s)),
            ((-s, s), (-s, -s)),
            ((-s / 2, 0.0), (s / 2, 0.0)),
        ],
        heights=height,
        max_walls=max_walls,
    )


def look_along(direction_xy: jnp.ndarray) -> jnp.ndarray:
    """R_wc for a camera at horizontal forward direction (fx, fy)."""
    f = direction_xy / jnp.maximum(jnp.linalg.norm(direction_xy, axis=-1, keepdims=True), 1e-9)
    fx, fy = f[..., 0], f[..., 1]
    z = jnp.zeros_like(fx)
    right = jnp.stack([fy, -fx, z], axis=-1)
    down = jnp.stack([z, z, -jnp.ones_like(fx)], axis=-1)
    fwd = jnp.stack([fx, fy, z], axis=-1)
    return jnp.stack([right, down, fwd], axis=-1)  # columns


def corridor_trajectory(n_frames: int, length: float = 10.0, cam_height: float = 1.4,
                        sway: float = 0.0):
    """Straight walk down the corridor. Returns (R_wc, t_wc): (N,3,3), (N,3)."""
    ys = jnp.linspace(0.5, length - 1.5, n_frames)
    xs = sway * jnp.sin(ys * 2.0)
    t = jnp.stack([xs, ys, jnp.full_like(ys, cam_height)], axis=-1)
    d = jnp.stack([jnp.zeros_like(ys), jnp.ones_like(ys)], axis=-1)
    R = look_along(d)
    return R, t


def orbit_trajectory(n_frames: int, radius: float = 1.5, cam_height: float = 1.4):
    """Slow turn inside a room: position on a small circle, looking outward."""
    th = jnp.linspace(0.0, 1.5 * jnp.pi, n_frames)
    t = jnp.stack([radius * jnp.cos(th), radius * jnp.sin(th),
                   jnp.full_like(th, cam_height)], axis=-1)
    d = jnp.stack([jnp.cos(th), jnp.sin(th)], axis=-1)
    return look_along(d), t


# ---------------------------------------------------------------------------
# Ray-cast renderer (label + depth images)
# ---------------------------------------------------------------------------

LABEL_SKY = 0
LABEL_GROUND = 1
LABEL_WALL_BASE = 2  # wall i has label LABEL_WALL_BASE + i


def render_frame(K: Intrinsics, R_wc: jnp.ndarray, t_wc: jnp.ndarray,
                 world: WallWorld, h: int, w: int, max_depth: float = 50.0):
    """Ray-cast one frame. Returns (labels (h,w) int32, depth (h,w) f32).

    depth is the camera-frame z of the first hit (sky -> max_depth).
    Vectorized over pixels x walls; jit-safe, vmappable over frames.
    """
    uu, vv = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    uv = jnp.stack([uu, vv], axis=-1)  # (h, w, 2)
    rays_c = camera.pixel_rays(K, uv)  # unit-z rays
    rays_w = jnp.einsum("ij,hwj->hwi", R_wc, rays_c)

    # Ground: t_wc_z + s * ray_z = 0
    rz = rays_w[..., 2]
    safe_rz = jnp.where(jnp.abs(rz) < 1e-9, 1e-9, rz)
    s_ground = -t_wc[2] / safe_rz
    ground_ok = (s_ground > 1e-6) & (jnp.abs(rz) >= 1e-9)
    s_ground = jnp.where(ground_ok, s_ground, jnp.inf)

    # Walls: plane hit + inside rectangle test.
    pis = world.planes()  # (M, 4)
    n = pis[:, :3]  # (M, 3)
    d = pis[:, 3]
    denom = jnp.einsum("mi,hwi->hwm", n, rays_w)
    num = -(jnp.einsum("mi,i->m", n, t_wc) + d)  # (M,)
    safe_den = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    s_wall = num[None, None, :] / safe_den  # (h, w, M)
    hit = t_wc[None, None, None, :] + s_wall[..., None] * rays_w[:, :, None, :]
    # inside segment extent (project onto segment direction) and height range
    seg = world.p1 - world.p0  # (M, 2)
    seg_len2 = jnp.maximum(jnp.sum(seg * seg, axis=-1), 1e-12)
    rel = hit[..., :2] - world.p0[None, None, :, :]
    u_par = jnp.einsum("hwmi,mi->hwm", rel, seg) / seg_len2
    z_ok = (hit[..., 2] >= -1e-3) & (hit[..., 2] <= world.height[None, None, :] + 1e-3)
    wall_ok = (
        (s_wall > 1e-6)
        & (jnp.abs(denom) >= 1e-9)
        & (u_par >= 0.0) & (u_par <= 1.0)
        & z_ok
        & world.valid[None, None, :]
    )
    s_wall = jnp.where(wall_ok, s_wall, jnp.inf)
    best_wall = jnp.argmin(s_wall, axis=-1)  # (h, w)
    s_best_wall = jnp.min(s_wall, axis=-1)

    s_all = jnp.minimum(s_ground, s_best_wall)
    labels = jnp.where(
        jnp.isinf(s_all),
        LABEL_SKY,
        jnp.where(
            s_best_wall < s_ground,
            LABEL_WALL_BASE + best_wall,
            LABEL_GROUND,
        ),
    ).astype(jnp.int32)
    # camera-frame z depth = s * (z-component of camera-frame ray) = s (unit-z rays)
    depth = jnp.where(jnp.isinf(s_all), max_depth, s_all)
    return labels, depth


def render_rgb(labels: jnp.ndarray, key,
               floor_rgb=(0.30, 0.24, 0.20),
               wall_rgb=(0.82, 0.80, 0.75),
               sky_rgb=(0.95, 0.95, 0.97),
               wall_tint: float = 0.06,
               noise: float = 0.02) -> jnp.ndarray:
    """Colorize a label image into a plausible low-texture RGB frame.

    Matches the TUM structure-notexture look (dark floor, near-white
    walls): per-wall deterministic tints + pixel noise so the learned
    segmenter cannot shortcut on exact colors.  labels: (H, W) int32.
    Returns (H, W, 3) float32 in [0, 1].
    """
    H, W = labels.shape
    floor = jnp.asarray(floor_rgb)
    wall = jnp.asarray(wall_rgb)
    sky = jnp.asarray(sky_rgb)

    wall_idx = jnp.maximum(labels - LABEL_WALL_BASE, 0)
    tint_key, noise_key = jax.random.split(key)
    tints = wall_tint * (
        jax.random.uniform(tint_key, (64, 3)) - 0.5
    )
    wall_col = wall + tints[jnp.clip(wall_idx, 0, 63)]

    img = jnp.where(
        (labels == LABEL_GROUND)[..., None], floor,
        jnp.where((labels == LABEL_SKY)[..., None], sky, wall_col),
    )
    img = img + noise * jax.random.normal(noise_key, (H, W, 3))
    return jnp.clip(img, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Ground-truth plane observations + noisy odometry
# ---------------------------------------------------------------------------

class FrameObservations(NamedTuple):
    """Per-frame plane detections in the *camera* frame, fixed capacity.

    planes_c: (MAX_DET, 4) unit planes (camera frame).
    centroid_c: (MAX_DET, 3) a representative point on each plane
                (camera frame) for distance gating.
    endpoints_c: (MAX_DET, 2, 3) wall ground-line endpoints (camera frame)
                 for overlap gating.
    wall_id: (MAX_DET,) true world wall index (for test oracle; -1 ground).
    valid: (MAX_DET,) bool.
    """

    planes_c: jnp.ndarray
    centroid_c: jnp.ndarray
    endpoints_c: jnp.ndarray
    wall_id: jnp.ndarray
    valid: jnp.ndarray


def observe_frame(world: WallWorld, R_wc, t_wc, key=None,
                  max_det: int = 8, max_range: float = 12.0,
                  tan_half_fov: float = 1.1, znear: float = 0.2,
                  min_vis_len: float = 0.3, noise_plane: float = 0.0,
                  include_ground: bool = True) -> FrameObservations:
    """Simulate the pop-up front-end output for one pose (no rendering).

    A wall is observed if its ground-line segment, clipped to the
    camera's forward half-space (z > znear) and the horizontal FOV cone
    (|x| <= tan_half_fov * z), has at least ``min_vis_len`` visible
    length within ``max_range``.  The reported centroid/endpoints are
    those of the *clipped visible portion* — what an image-based
    front-end would actually see.  Observations are the wall planes in
    the camera frame, optionally perturbed in the 3-DOF tangent space.
    """
    R_cw, t_cw = se3.se3_inverse(R_wc, t_wc)
    M = world.max_walls

    e0_w = jnp.pad(world.p0, ((0, 0), (0, 1)))
    e1_w = jnp.pad(world.p1, ((0, 0), (0, 1)))
    a = se3.se3_apply(R_cw, t_cw, e0_w)          # (M, 3)
    b = se3.se3_apply(R_cw, t_cw, e1_w)

    # Clip the segment a->b to the intersection of three half-spaces:
    # z >= znear, x <= tan*z, -x <= tan*z — each is linear in the
    # parameter s of p(s) = a + s (b - a), so the visible part is an
    # interval [s_lo, s_hi] computed half-space by half-space.
    d = b - a

    def halfspace_interval(fa, fb, lo, hi):
        """f(s) = fa + s (fb - fa) >= 0 on [lo', hi'] intersect [lo, hi]."""
        df = fb - fa
        s_cross = -fa / jnp.where(jnp.abs(df) < 1e-12, 1e-12, df)
        # if df > 0: feasible s >= s_cross; if df < 0: s <= s_cross;
        # if df == 0: feasible everywhere (fa >= 0) or nowhere.
        new_lo = jnp.where(df > 0, jnp.maximum(lo, s_cross), lo)
        new_hi = jnp.where(df < 0, jnp.minimum(hi, s_cross), hi)
        infeasible = (jnp.abs(df) < 1e-12) & (fa < 0)
        new_hi = jnp.where(infeasible, new_lo - 1.0, new_hi)
        return new_lo, new_hi

    s_lo = jnp.zeros((M,))
    s_hi = jnp.ones((M,))
    # z >= znear
    s_lo, s_hi = halfspace_interval(a[:, 2] - znear, b[:, 2] - znear, s_lo, s_hi)
    # tan*z - x >= 0
    s_lo, s_hi = halfspace_interval(
        tan_half_fov * a[:, 2] - a[:, 0], tan_half_fov * b[:, 2] - b[:, 0],
        s_lo, s_hi,
    )
    # tan*z + x >= 0
    s_lo, s_hi = halfspace_interval(
        tan_half_fov * a[:, 2] + a[:, 0], tan_half_fov * b[:, 2] + b[:, 0],
        s_lo, s_hi,
    )
    pa = a + s_lo[:, None] * d                   # clipped visible endpoints
    pb = a + s_hi[:, None] * d
    vis_len = jnp.where(s_hi > s_lo, jnp.linalg.norm(pb - pa, axis=-1), 0.0)
    near_dist = jnp.minimum(
        jnp.linalg.norm(pa, axis=-1), jnp.linalg.norm(pb, axis=-1)
    )
    vis = world.valid & (vis_len >= min_vis_len) & (near_dist < max_range)

    # Range-clip the far end so reported extents stay local.
    too_far_b = jnp.linalg.norm(pb, axis=-1) > max_range
    pb = jnp.where(
        too_far_b[:, None],
        pa + (pb - pa) * (
            max_range / jnp.maximum(jnp.linalg.norm(pb - pa, axis=-1, keepdims=True), 1e-9)
        ),
        pb,
    )
    too_far_a = jnp.linalg.norm(pa, axis=-1) > max_range
    pa = jnp.where(
        too_far_a[:, None],
        pb + (pa - pb) * (
            max_range / jnp.maximum(jnp.linalg.norm(pa - pb, axis=-1, keepdims=True), 1e-9)
        ),
        pa,
    )
    mid_c = (pa + pb) / 2.0

    pis_w = world.planes()
    pis_c = plane.transform(pis_w, R_cw, t_cw)

    if noise_plane > 0.0 and key is not None:
        deltas = noise_plane * jax.random.normal(key, (M, 3))
        pis_c = plane.retract(pis_c, deltas)

    # Pack walls (+ ground as the last slot when enabled) into max_det slots,
    # visible-first ordering via argsort on ~vis.
    order = jnp.argsort(jnp.where(vis, 0, 1), stable=True)
    take = order[:max_det]
    planes_c = pis_c[take]
    centroid_c = mid_c[take]
    endpoints_c = jnp.stack([pa[take], pb[take]], axis=1)
    wall_id = jnp.where(vis[take], take, -1).astype(jnp.int32)
    valid = vis[take]

    if include_ground:
        ground_w = jnp.array([0.0, 0.0, 1.0, 0.0])
        ground_c = plane.transform(ground_w, R_cw, t_cw)
        gpt_w = t_wc * jnp.array([1.0, 1.0, 0.0]) + jnp.array([0.0, 0.0, 0.0])
        gpt_c = se3.se3_apply(R_cw, t_cw, gpt_w)
        planes_c = planes_c.at[-1].set(ground_c)
        centroid_c = centroid_c.at[-1].set(gpt_c)
        endpoints_c = endpoints_c.at[-1].set(jnp.stack([gpt_c, gpt_c]))
        wall_id = wall_id.at[-1].set(-2)  # ground marker
        valid = valid.at[-1].set(True)

    return FrameObservations(planes_c, centroid_c, endpoints_c, wall_id, valid)


def noisy_odometry(R_wc, t_wc, key, sigma_t: float = 0.0, sigma_r: float = 0.0):
    """Relative poses between consecutive frames with tangent-space noise.

    R_wc: (N,3,3), t_wc: (N,3). Returns (R_rel, t_rel): (N-1, 3, 3/3),
    where true_rel_i = T_i^{-1} T_{i+1} perturbed by exp(noise).
    """
    Ra, ta = R_wc[:-1], t_wc[:-1]
    Rb, tb = R_wc[1:], t_wc[1:]
    Rr, tr = se3.se3_between(Ra, ta, Rb, tb)
    n = Rr.shape[0]
    xi = jax.random.normal(key, (n, 6))
    xi = xi * jnp.concatenate([jnp.full((3,), sigma_t), jnp.full((3,), sigma_r)])
    dR, dt = se3.se3_exp(xi)
    return se3.se3_compose(Rr, tr, dR, dt)
