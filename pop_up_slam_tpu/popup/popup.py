"""Single-image "pop-up": ground-wall boundary -> 3D wall planes + depth.

TPU-native re-design of the reference's ``pop_up_wall/popup_plane``
(SURVEY.md §2.1, §3.4; paper arXiv:1703.07334 §III): the reference runs
OpenCV contour extraction + line-segment fitting + polygon ops on the
CPU; here the whole front-end is a fixed-shape, column-parallel jax
program:

1. **Boundary extraction** — for every image column, the topmost ground
   pixel is the ground-wall boundary sample (vectorized argmin, no
   contours).
2. **Inverse projection** — boundary pixels are cast onto the world
   ground plane z=0 given the camera pose prior (gravity-aligned
   orientation + height, exactly the paper's single-view assumption).
3. **Polyline segmentation** — corner detection on the smoothed world-
   space tangent direction with windowed non-max suppression; segment
   ids by cumulative sum of break flags (never data-dependent shapes,
   capacity ``max_segments`` with validity masks).
4. **Wall plane fitting** — per-segment total-least-squares line fit in
   world XY via masked segment-sums + closed-form 2x2 eigenvector; each
   line erects a vertical wall plane.
5. **Depth recovery** — every pixel gets the ray-plane depth of its
   column's wall (above the boundary) or the ground (below); the Pallas
   kernel in ``pop_up_slam_tpu.ops.depth_render`` is the TPU fast path
   for this step and is tested against this implementation.

Everything vmaps over a batch of frames (DP front-end sharding,
SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import camera as cam
from ..geometry import plane as plane_mod
from ..geometry import se3
from ..geometry.camera import Intrinsics


class PopupConfig(NamedTuple):
    max_segments: int = 8
    smooth_radius: int = 7          # columns, tangent estimation half-window
    corner_angle: float = 0.5       # rad, break threshold on direction change
    nms_radius: int = 9             # columns, corner non-max suppression
    range_jump: float = 0.6         # m, occlusion break threshold
    max_range: float = 15.0         # m, boundary points beyond are invalid
    min_cols: int = 12              # min columns for a valid wall segment
    wall_height: float = 2.5        # m, for output polygons only
    min_boundary_rows: int = 2      # min ground pixels per column
    # Ground-run boundary levels per column.  1 = the classic single
    # topmost-ground boundary.  >1 pops up a wall at the top of each of
    # the first `levels` ground runs (top-down): a doorway or an
    # occluding object splits a column's ground into several runs, each
    # with its own wall above it — the reference's general polyline
    # contours handle this case; this is the fixed-shape analog.
    levels: int = 1


class PopupPlanes(NamedTuple):
    """Fixed-capacity pop-up result for one frame.

    With B = cfg.levels boundary levels (1 by default) and
    S = B * cfg.max_segments total wall slots:

    planes_w     : (S, 4) world-frame wall planes (unit, canonical sign).
    planes_c     : (S, 4) the same planes in the camera frame.
    endpoints_w  : (S, 2, 3) ground-line endpoints (z=0) per wall.
    centroid_c   : (S, 3) camera-frame centroid of the boundary points.
    n_points     : (S,) int32 supporting boundary columns.
    valid        : (S,) bool.
    clipped      : (S, 2) bool — endpoint cut off by the view (the wall
                   extends beyond the visible ground junction).
    ground_c     : (4,) ground plane in the camera frame.
    boundary_v   : (W,) f32 boundary row per column (image v);
                   (B, W) when B > 1.
    boundary_ok  : (W,) bool; (B, W) when B > 1.
    seg_id       : (W,) int32 wall segment per column (-1 invalid);
                   flattened (B*W,) when B > 1 (level-major), with
                   level b's values offset by b * max_segments so they
                   index the flattened (B*S,) plane arrays directly.
    """

    planes_w: jnp.ndarray
    planes_c: jnp.ndarray
    endpoints_w: jnp.ndarray
    centroid_c: jnp.ndarray
    n_points: jnp.ndarray
    valid: jnp.ndarray
    clipped: jnp.ndarray
    ground_c: jnp.ndarray
    boundary_v: jnp.ndarray
    boundary_ok: jnp.ndarray
    seg_id: jnp.ndarray


GROUND_LABEL = 1  # matches io.synthetic.LABEL_GROUND; binary masks: 1=ground


def extract_boundary(ground_mask: jnp.ndarray, min_rows: int = 2,
                     noise_win: int = 8, noise_min: int = 6):
    """Per-column topmost *supported* ground pixel.

    ground_mask: (H, W) bool.  Returns (v_boundary (W,) f32, ok (W,) bool).

    Noise robustness (round-5 seg-noise gate): a raw topmost-pixel rule
    lets a single flipped pixel anywhere above the true boundary hijack
    the column — real CNN masks carry exactly that salt (paper §III-A).
    The boundary is therefore the topmost row whose ``noise_win``-row
    window below contains at least ``noise_min`` ground pixels (one
    ``reduce_window`` sum); columns where no row qualifies (degenerate
    slivers) fall back to the plain topmost pixel, so clean masks are
    bit-identical to the old rule.

    Perf note (measured, v5e): XLA fuses the reductions into a couple
    of passes over the mask at the per-op overhead floor (~30 us for
    480x640); a hand-written Pallas twin was tried in round 4 and lost
    by its ~12 us launch overhead — the only remaining lever here is
    fewer image passes, not a kernel.
    """
    H, W = ground_mask.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    big = jnp.int32(H + 1)
    v_top = jnp.min(jnp.where(ground_mask, rows, big), axis=0)
    count = jnp.sum(ground_mask, axis=0)
    ok = (count >= min_rows) & (v_top < H)

    # windowed support: sum of mask[v : v + noise_win] per column,
    # edge-padded so boundaries near the image bottom keep support
    mi = jnp.concatenate(
        [ground_mask,
         jnp.broadcast_to(ground_mask[-1:], (noise_win - 1, W))],
        axis=0,
    ).astype(jnp.int32)
    support = jax.lax.reduce_window(
        mi, 0, jax.lax.add, (noise_win, 1), (1, 1), "VALID"
    )                                                   # (H, W)
    supported = ground_mask & (support >= noise_min)
    v_rob = jnp.min(jnp.where(supported, rows, big), axis=0)
    v = jnp.where(v_rob < H, v_rob, v_top)
    return v.astype(jnp.float32), ok


def extract_boundaries(ground_mask: jnp.ndarray, min_rows: int = 2,
                       levels: int = 2):
    """Tops of the first ``levels`` ground runs per column, top-down.

    A "run" is a maximal vertical strip of consecutive ground pixels; a
    run top with at least ``min_rows`` consecutive ground pixels below
    it is a wall-ground boundary candidate (the wall stands above it).
    Returns (v (levels, W) f32 — row of each run top, image order;
    ok (levels, W) bool).  ``levels=1`` differs from
    :func:`extract_boundary` only in requiring *consecutive* (not
    total) ground rows.
    """
    H, W = ground_mask.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    above = jnp.pad(ground_mask[:-1], ((1, 0), (0, 0)))
    is_top = ground_mask & ~above
    # run_ok[v]: mask[v : v + min_rows] all ground (window-AND looking
    # down; bottom rows padded False so truncated runs fail the test).
    m = jnp.pad(ground_mask, ((0, max(min_rows - 1, 0)), (0, 0)))
    run_ok = jax.lax.reduce_window(
        m.astype(jnp.int32), 1, jax.lax.min,
        (max(min_rows, 1), 1), (1, 1), "VALID",
    ).astype(bool)
    top_ok = is_top & run_ok
    cand = jnp.where(top_ok, rows, jnp.int32(H + 1))
    v = jnp.sort(cand, axis=0)[:levels]                   # (levels, W)
    ok = v <= H - 1
    return v.astype(jnp.float32), ok


def _window_reduce_max(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x[None, :], jnp.array(-jnp.inf, x.dtype), jax.lax.max,
        (1, 2 * radius + 1), (1, 1), "SAME",
    )[0]


def _angle_diff(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = a - b
    return jnp.abs(jnp.arctan2(jnp.sin(d), jnp.cos(d)))


def segment_boundary(pts_w: jnp.ndarray, pt_ok: jnp.ndarray, cfg: PopupConfig):
    """Split the world-space boundary polyline into straight segments.

    pts_w: (W, 2) ground-plane XY per column; pt_ok: (W,) validity.
    Returns seg_id (W,) int32 in [-1, max_segments).
    """
    Wd = pts_w.shape[0]
    k = cfg.smooth_radius
    # Smoothed tangent via symmetric difference of box-filtered points.
    # Box sums by padded cumsum + two static slices (identical to the
    # zero-padded 'same' convolution, without lowering a conv op):
    # sum x[i-k..i+k] = P[i+2k+1] - P[i] with P = cumsum(pad(x, (k+1, k))).
    ok_f = pt_ok.astype(pts_w.dtype)

    def box_sum(x):
        P = jnp.cumsum(jnp.pad(x, (k + 1, k)))
        return P[2 * k + 1:] - P[:Wd]

    den = jnp.maximum(box_sum(ok_f), 1e-6)
    sx = box_sum(pts_w[:, 0] * ok_f) / den
    sy = box_sum(pts_w[:, 1] * ok_f) / den
    dx = jnp.roll(sx, -k) - jnp.roll(sx, k)
    dy = jnp.roll(sy, -k) - jnp.roll(sy, k)
    theta = jnp.arctan2(dy, dx)

    # Direction change across the window.
    dtheta = _angle_diff(jnp.roll(theta, -k), jnp.roll(theta, k))
    # Occlusion / range jumps between neighbor columns.
    step = jnp.linalg.norm(pts_w - jnp.roll(pts_w, 1, axis=0), axis=-1)
    jump = step > cfg.range_jump
    # Invalid -> valid transitions also start a new segment.
    prev_ok = jnp.roll(pt_ok, 1)
    fresh = pt_ok & (~prev_ok)

    # Corner = local max of dtheta above threshold (windowed NMS).
    local_max = dtheta >= _window_reduce_max(dtheta, cfg.nms_radius) - 1e-6
    corner = (dtheta > cfg.corner_angle) & local_max & pt_ok

    brk = (corner | jump | fresh) & pt_ok
    brk = brk.at[0].set(pt_ok[0])
    seg_raw = jnp.cumsum(brk.astype(jnp.int32)) - 1
    seg_id = jnp.where(pt_ok & (seg_raw >= 0) & (seg_raw < cfg.max_segments),
                       seg_raw, -1)
    return seg_id


def fit_wall_planes(pts_w: jnp.ndarray, seg_id: jnp.ndarray, cfg: PopupConfig,
                    pt_ok: jnp.ndarray | None = None):
    """Per-segment TLS line fit in world XY -> vertical wall planes.

    Returns (planes_w (S,4), endpoints_w (S,2,3), n_points (S,), valid (S,),
    clipped (S,2) bool) — ``clipped[s, k]`` is True when endpoint k
    (0 = the pmin end, 1 = the pmax end) of segment s abuts an image
    edge or a column with no visible ground boundary, i.e. the wall's
    ground junction is cut off by the view and the wall plausibly
    extends beyond the fitted extent (used by depth rendering).
    """
    S = cfg.max_segments
    Wd = pts_w.shape[0]

    # One-hot membership (S, Wd) instead of segment_sum/min/max:
    # scatters serialize on TPU, while the same reductions as one
    # masked matmul + masked reduces are a handful of MXU/VPU ops
    # (measured: fit_wall_planes 89 -> ~15 us inside the frame scan).
    member = seg_id[None, :] == jnp.arange(S, dtype=seg_id.dtype)[:, None]
    Mf = member.astype(pts_w.dtype)

    x, y = pts_w[:, 0], pts_w[:, 1]
    vals = jnp.stack([jnp.ones_like(x), x, y, x * x, y * y, x * y],
                     axis=-1)                              # (Wd, 6)
    sums = Mf @ vals                                       # (S, 6) one MXU op
    n, sx, sy, sxx, syy, sxy = (sums[:, k] for k in range(6))

    n_safe = jnp.maximum(n, 1.0)
    mx, my = sx / n_safe, sy / n_safe
    cxx = sxx / n_safe - mx * mx
    cyy = syy / n_safe - my * my
    cxy = sxy / n_safe - mx * my

    # Principal direction of the 2x2 covariance (closed form): the line
    # direction is the eigenvector of the larger eigenvalue.
    tr = cxx + cyy
    dlt = jnp.sqrt(jnp.maximum((cxx - cyy) ** 2 + 4 * cxy ** 2, 0.0))
    lam = 0.5 * (tr + dlt)
    # eigenvector: (cxy, lam - cxx) unless degenerate, then (lam - cyy, cxy)
    v1 = jnp.stack([cxy, lam - cxx], axis=-1)
    v2 = jnp.stack([lam - cyy, cxy], axis=-1)
    use2 = jnp.linalg.norm(v1, axis=-1) < 1e-9
    d = jnp.where(use2[:, None], v2, v1)
    dn = jnp.linalg.norm(d, axis=-1, keepdims=True)
    # fully degenerate (single point): fall back to x-direction
    d = jnp.where(dn < 1e-9, jnp.array([1.0, 0.0]), d / jnp.maximum(dn, 1e-9))

    # Vertical wall plane through (mx, my) with horizontal normal ⟂ d.
    nrm = jnp.stack([d[:, 1], -d[:, 0], jnp.zeros_like(d[:, 0])], axis=-1)
    off = -(nrm[:, 0] * mx + nrm[:, 1] * my)
    planes_w = plane_mod.normalize(
        jnp.concatenate([nrm, off[:, None]], axis=-1)
    )

    # Endpoints: min/max projection of the segment's points onto d.
    # Per-column direction via the one-hot matmul (no gather).
    d_cols = jnp.einsum("sw,sk->wk", Mf, d)                # (Wd, 2)
    proj = x * d_cols[:, 0] + y * d_cols[:, 1]
    big = jnp.array(1e9, pts_w.dtype)
    pmin = jnp.min(jnp.where(member, proj[None, :], big), axis=1)
    pmax = jnp.max(jnp.where(member, proj[None, :], -big), axis=1)
    # Empty buckets come back as the segment_min/max identities (+-inf);
    # pin them to the segment mean so every output lane stays finite
    # (jax_debug_nans otherwise falls back to a de-optimized re-run with
    # different numerics whenever a jit output carries NaN).
    mid_proj = mx * d[:, 0] + my * d[:, 1]
    empty = n < 0.5
    pmin = jnp.where(empty, mid_proj, pmin)
    pmax = jnp.where(empty, mid_proj, pmax)
    c = jnp.stack([mx, my], axis=-1)
    e0 = c + (pmin - mid_proj)[:, None] * d
    e1 = c + (pmax - mid_proj)[:, None] * d
    endpoints_w = jnp.stack(
        [jnp.pad(e0, ((0, 0), (0, 1))), jnp.pad(e1, ((0, 0), (0, 1)))], axis=1
    )

    # View-clipping detection per endpoint: find each segment's extreme
    # columns; an endpoint is clipped when the neighboring column is off
    # the image or has no visible ground boundary.
    cols = jnp.arange(Wd, dtype=jnp.int32)
    bigi = jnp.int32(Wd + 1)
    umin = jnp.min(jnp.where(member, cols[None, :], bigi), axis=1)
    umax = jnp.max(jnp.where(member, cols[None, :], -1), axis=1)
    if pt_ok is None:
        pt_ok = seg_id >= 0
    ok_pad = jnp.concatenate([jnp.zeros((1,), bool), pt_ok, jnp.zeros((1,), bool)])
    umin_c = jnp.clip(umin, 0, Wd - 1)
    umax_c = jnp.clip(umax, 0, Wd - 1)
    clip_left = ~ok_pad[umin_c]        # neighbor of umin is umin-1 -> index umin in padded
    clip_right = ~ok_pad[umax_c + 2]   # neighbor of umax is umax+1 -> index umax+2
    # Which projection endpoint does the left (umin) column correspond to?
    proj_at_umin = proj[umin_c]
    left_is_pmin = jnp.abs(proj_at_umin - pmin) <= jnp.abs(proj_at_umin - pmax)
    clip_pmin = jnp.where(left_is_pmin, clip_left, clip_right)
    clip_pmax = jnp.where(left_is_pmin, clip_right, clip_left)
    clipped = jnp.stack([clip_pmin, clip_pmax], axis=-1)

    valid = n >= cfg.min_cols
    return planes_w, endpoints_w, n.astype(jnp.int32), valid, clipped


def pop_up(
    K: Intrinsics,
    ground_mask: jnp.ndarray,
    R_wc: jnp.ndarray,
    t_wc: jnp.ndarray,
    cfg: PopupConfig = PopupConfig(),
) -> PopupPlanes:
    """Full single-image pop-up (BASELINE config 1; paper §III).

    ground_mask: (H, W) bool — True on ground pixels (from the learned
    or classical segmenter, or a dataset-provided mask).
    (R_wc, t_wc): pose prior — only gravity alignment and camera height
    matter for the single-view geometry, matching the paper.
    """
    H, Wd = ground_mask.shape
    if cfg.levels > 1:
        v_bs, b_oks = extract_boundaries(
            ground_mask, cfg.min_boundary_rows, cfg.levels
        )                                                  # (B, W)
    else:
        v_b1, b_ok1 = extract_boundary(ground_mask, cfg.min_boundary_rows)
        v_bs, b_oks = v_b1[None], b_ok1[None]

    R_cw, t_cw = se3.se3_inverse(R_wc, t_wc)
    ground_w = jnp.array([0.0, 0.0, 1.0, 0.0])
    ground_c = plane_mod.transform(ground_w, R_cw, t_cw)
    u = jnp.arange(Wd, dtype=jnp.float32)

    def level(v_b, b_ok):
        # The physical ground-wall junction lies between the last wall
        # pixel (v_b - 1) and the first ground pixel (v_b): sample the
        # boundary at v_b - 0.5.  Skipping this half-pixel correction
        # biases every boundary point toward the camera by
        # ~z^2/(2 fy h_cam) — ~0.5 m at 9 m range with fy=64 — which
        # drags the whole BA backward.
        uv = jnp.stack([u, v_b - 0.5], axis=-1)
        pts3, proj_ok = cam.backproject_to_world_plane(
            K, uv, R_wc, t_wc, ground_w
        )
        rng = jnp.linalg.norm(pts3 - t_wc, axis=-1)
        pt_ok = b_ok & proj_ok & (rng < cfg.max_range)
        pts_w = pts3[:, :2]

        seg_id = segment_boundary(pts_w, pt_ok, cfg)
        planes_w, endpoints_w, n_pts, valid, clipped = fit_wall_planes(
            pts_w, seg_id, cfg, pt_ok
        )
        planes_c = plane_mod.transform(planes_w, R_cw, t_cw)

        # Camera-frame centroid of each wall's boundary points
        # (one-hot matmul — same no-scatter rationale as
        # fit_wall_planes).
        S = cfg.max_segments
        pts_c = se3.se3_apply(R_cw, t_cw, pts3)
        Mf = (
            seg_id[None, :] == jnp.arange(S, dtype=seg_id.dtype)[:, None]
        ).astype(pts_c.dtype)
        csum = Mf @ pts_c
        centroid_c = csum / jnp.maximum(
            n_pts[:, None].astype(csum.dtype), 1.0
        )
        return (planes_w, planes_c, endpoints_w, centroid_c, n_pts,
                valid, clipped, seg_id)

    if cfg.levels > 1:
        outs = jax.vmap(level)(v_bs, b_oks)
        # Level b's seg_id values are local to that level's segment
        # slots; offset by b * max_segments so the flattened (B*W,)
        # seg_id indexes directly into the flattened (B*S,) plane
        # arrays (-1 stays -1).
        sid_lv = outs[7]
        lvl_off = (jnp.arange(cfg.levels, dtype=sid_lv.dtype)[:, None]
                   * cfg.max_segments)
        outs = outs[:7] + (jnp.where(sid_lv >= 0, sid_lv + lvl_off, -1),)
        flat = lambda x: x.reshape((-1,) + x.shape[2:])  # noqa: E731
        (planes_w, planes_c, endpoints_w, centroid_c, n_pts, valid,
         clipped, seg_id) = (flat(o) for o in outs)
        boundary_v, boundary_ok = v_bs, b_oks
    else:
        (planes_w, planes_c, endpoints_w, centroid_c, n_pts, valid,
         clipped, seg_id) = level(v_bs[0], b_oks[0])
        boundary_v, boundary_ok = v_bs[0], b_oks[0]

    return PopupPlanes(
        planes_w=planes_w,
        planes_c=planes_c,
        endpoints_w=endpoints_w,
        centroid_c=centroid_c,
        n_points=n_pts,
        valid=valid,
        clipped=clipped,
        ground_c=ground_c,
        boundary_v=boundary_v,
        boundary_ok=boundary_ok,
        seg_id=seg_id,
    )


def depth_from_popup(
    K: Intrinsics,
    res: PopupPlanes,
    ground_mask: jnp.ndarray,
    R_wc: jnp.ndarray,
    t_wc: jnp.ndarray,
    max_depth: float = 50.0,
    wall_height: float = 2.5,
    extent_pad: float = 0.5,
) -> jnp.ndarray:
    """Dense depth recovery from the popped-up plane model (paper §III's
    "and a dense depth map from one image"; BASELINE config 1).

    A z-buffer render of the popped-up world: every pixel ray is
    intersected with *all* valid wall planes; a hit counts if it lands
    within the wall's ground-line extent (padded) and height range, and
    the nearest hit wins.  Ground pixels (per the segmentation mask)
    take the ground-plane depth instead.  Rendering against all walls —
    rather than only the wall of the pixel's own column — matters at
    image edges, where a nearby wall fills the whole column and its
    ground junction is outside the view.  Pure jnp reference; the
    Pallas kernel ``ops.depth_render`` computes the same map tile-wise.
    """
    H, Wd = ground_mask.shape
    uu, vv = jnp.meshgrid(jnp.arange(Wd, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32))
    rays_c = cam.pixel_rays(K, jnp.stack([uu, vv], axis=-1))  # (H, W, 3)
    rays_w = jnp.einsum("ij,hwj->hwi", R_wc, rays_c)

    # Ground depth (camera-frame z == s because rays have unit z).
    s_g, ok_g = cam.ray_plane_depth(rays_c, res.ground_c)

    # Wall hits against every popped plane (world frame).
    n = res.planes_w[:, :3]                                   # (S, 3)
    d = res.planes_w[:, 3]
    denom = jnp.einsum("si,hwi->hws", n, rays_w)
    num = -(jnp.einsum("si,i->s", n, t_wc) + d)               # (S,)
    safe_den = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    s_w = num[None, None, :] / safe_den                       # (H, W, S)
    hit = t_wc[None, None, None, :] + s_w[..., None] * rays_w[:, :, None, :]

    # Extent test along each wall's ground line (+ height range).
    e0 = res.endpoints_w[:, 0, :2]                            # (S, 2)
    e1 = res.endpoints_w[:, 1, :2]
    seg = e1 - e0
    seg_len = jnp.sqrt(jnp.maximum(jnp.sum(seg * seg, axis=-1), 1e-12))
    d_unit = seg / seg_len[:, None]
    u_par = jnp.einsum(
        "hwsi,si->hws", hit[..., :2] - e0[None, None, :, :], d_unit
    )
    # View-clipped endpoints extend far beyond the fitted extent (the
    # wall's ground junction is outside the image, e.g. a nearby wall
    # filling the whole column height).
    far = jnp.asarray(max_depth, u_par.dtype)
    lo_pad = jnp.where(res.clipped[:, 0], far, extent_pad)    # (S,)
    hi_pad = jnp.where(res.clipped[:, 1], far, extent_pad)
    in_extent = (u_par >= -lo_pad[None, None, :]) & (
        u_par <= (seg_len + hi_pad)[None, None, :]
    )
    z_ok = (hit[..., 2] >= -0.1) & (hit[..., 2] <= wall_height + 0.1)
    wall_ok = (
        (s_w > 1e-6)
        & (jnp.abs(denom) >= 1e-9)
        & in_extent
        & z_ok
        & res.valid[None, None, :]
    )
    s_w = jnp.where(wall_ok, s_w, jnp.inf)
    s_wall = jnp.min(s_w, axis=-1)                            # (H, W)

    ground_px = ground_mask & ok_g
    depth = jnp.where(
        ground_px, s_g, jnp.where(jnp.isinf(s_wall), max_depth, s_wall)
    )
    return jnp.clip(depth, 0.0, max_depth)


def render_depth(
    K: Intrinsics,
    res: PopupPlanes,
    ground_mask: jnp.ndarray,
    R_wc: jnp.ndarray,
    t_wc: jnp.ndarray,
    max_depth: float = 50.0,
    wall_height: float = 2.5,
    extent_pad: float = 0.5,
    pallas: str = "auto",
) -> jnp.ndarray:
    """Backend-dispatching dense depth recovery.

    ``pallas="auto"`` renders through the tiled Pallas z-buffer kernel
    (:func:`pop_up_slam_tpu.ops.depth_render.depth_render_pallas`) on
    TPU backends and the pure-jnp reference elsewhere; ``"on"``/``"off"``
    force one path.  Both match to fp tolerance (tests/test_ops.py).
    """
    if pallas not in ("auto", "on", "off"):
        raise ValueError(f"pallas must be auto|on|off, got {pallas!r}")
    use = pallas == "on" or (
        pallas == "auto" and jax.default_backend() == "tpu"
    )
    if use:
        from ..ops.depth_render import depth_render_pallas

        return depth_render_pallas(
            K, res, ground_mask, R_wc, t_wc, max_depth=max_depth,
            wall_height=wall_height, extent_pad=extent_pad,
        )
    return depth_from_popup(
        K, res, ground_mask, R_wc, t_wc, max_depth=max_depth,
        wall_height=wall_height, extent_pad=extent_pad,
    )
