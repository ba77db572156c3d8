"""Semi-dense depth fusion with popped-up plane depth (paper §V analog).

The reference optionally fuses Pop-up plane depth with LSD-SLAM's
semi-dense depth filter: plane depth fixes the monocular scale
ambiguity and initializes/regularizes the per-pixel inverse-depth
estimates (SURVEY.md §2.1 "LSD-SLAM depth fusion (optional)"; paper
arXiv:1703.07334 §V).  LSD-SLAM itself is an external C++ system; the
TPU-native equivalent here is the *fusion filter* — the part the
reference contributes:

- a per-pixel **inverse-depth Gaussian filter** (mu, sigma^2, valid)
  kept in the current keyframe,
- **initialization from the pop-up** plane model (plane depth with a
  distance-scaled prior variance, exactly the paper's "initialize depth
  estimation" role),
- **scale alignment** of an external scale-ambiguous depth/inverse-depth
  map against plane depth (robust median-of-ratios — the paper's scale
  resolution),
- **Bayesian fusion** of new (stereo/temporal) observations with
  outlier gating, and
- **propagation** of the filter to the next keyframe through the
  estimated relative pose (forward warp with a z-buffer scatter-min,
  variance inflated by a motion term).

Everything is fixed-shape jnp over (H, W) maps and vmaps over frame
batches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Intrinsics, pixel_rays


class DepthFilter(NamedTuple):
    """Per-pixel inverse-depth Gaussian state in the current keyframe."""

    inv_mu: jnp.ndarray    # (H, W) inverse depth mean [1/m]
    var: jnp.ndarray       # (H, W) inverse-depth variance
    valid: jnp.ndarray     # (H, W) bool


def init_from_popup(
    depth: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    sigma0_rel: float = 0.05,
    max_depth: float = 40.0,
) -> DepthFilter:
    """Seed the filter from a popped-up plane depth map.

    The pop-up gives metrically-scaled depth from one view (paper §III);
    its uncertainty grows with range, so the inverse-depth prior std is
    ``sigma0_rel * inv_depth`` with a small floor.
    """
    d = jnp.clip(depth, 1e-3, max_depth)
    inv = 1.0 / d
    ok = (depth > 1e-3) & (depth < max_depth)
    if valid is not None:
        ok = ok & valid
    sig = jnp.maximum(sigma0_rel * inv, 1e-4)
    return DepthFilter(
        inv_mu=jnp.where(ok, inv, 0.0),
        var=jnp.where(ok, sig * sig, 1e6),
        valid=ok,
    )


def align_scale(
    ambiguous_inv_depth: jnp.ndarray,
    plane_depth: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Scale factor s such that s * ambiguous_inv_depth ≈ 1/plane_depth.

    Robust median of per-pixel ratios over pixels where both are valid —
    the monocular-scale resolution of paper §V.  Returns a scalar.
    """
    plane_inv = 1.0 / jnp.clip(plane_depth, 1e-3, 1e3)
    ok = (ambiguous_inv_depth > eps) & (plane_depth > 1e-3)
    if weight is not None:
        ok = ok & (weight > 0)
    ratio = plane_inv / jnp.maximum(ambiguous_inv_depth, eps)
    # masked median: send masked entries to NaN and use nanmedian
    ratio = jnp.where(ok, ratio, jnp.nan)
    return jnp.nanmedian(ratio)


def fuse_observation(
    flt: DepthFilter,
    obs_inv: jnp.ndarray,
    obs_var: jnp.ndarray,
    gate_sigma: float = 2.0,
) -> DepthFilter:
    """Bayesian product of the filter with a new inverse-depth map.

    Observations outside ``gate_sigma`` standard deviations (combined)
    of the prediction are rejected (outlier gate); pixels with no prior
    adopt the observation.
    """
    obs_ok = jnp.isfinite(obs_inv) & (obs_inv > 0) & (obs_var > 0)

    innov = obs_inv - flt.inv_mu
    s2 = flt.var + obs_var
    gate = innov * innov <= gate_sigma * gate_sigma * s2
    fuse = flt.valid & obs_ok & gate

    var_new = (flt.var * obs_var) / jnp.maximum(s2, 1e-12)
    mu_new = (flt.inv_mu * obs_var + obs_inv * flt.var) / jnp.maximum(
        s2, 1e-12
    )

    adopt = (~flt.valid) & obs_ok
    inv_mu = jnp.where(fuse, mu_new, jnp.where(adopt, obs_inv, flt.inv_mu))
    var = jnp.where(fuse, var_new, jnp.where(adopt, obs_var, flt.var))
    valid = flt.valid | adopt
    return DepthFilter(inv_mu, var, valid)


def propagate_to_frame(
    flt: DepthFilter,
    K: Intrinsics,
    R_rel: jnp.ndarray,
    t_rel: jnp.ndarray,
    motion_var: float = 1e-4,
    max_depth: float = 40.0,
) -> DepthFilter:
    """Warp the filter into the next keyframe (T_new_from_old = (R, t)^-1
    applied to points; here (R_rel, t_rel) is old-from-new camera
    motion, i.e. the odometry delta T_old^-1 T_new).

    Forward-splat with a z-buffer: each source pixel's 3D point is
    transformed into the new frame and scattered to its nearest pixel;
    nearer points win (scatter-min on depth).  Variance picks up a
    fixed motion-inflation term.  Pixels nobody lands on are invalid.
    """
    H, W = flt.inv_mu.shape
    uu, vv = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32)
    )
    rays = pixel_rays(K, jnp.stack([uu, vv], axis=-1))  # (H, W, 3), z=1
    depth = 1.0 / jnp.clip(flt.inv_mu, 1e-3, 1e3)
    pts_old = rays * depth[..., None]

    # new-from-old = (R_rel, t_rel)^-1
    R_no, t_no = se3.se3_inverse(R_rel, t_rel)
    pts_new = jnp.einsum("ij,hwj->hwi", R_no, pts_old) + t_no

    z = pts_new[..., 2]
    ok = flt.valid & (z > 1e-3) & (z < max_depth)
    u = K.fx * pts_new[..., 0] / jnp.maximum(z, 1e-6) + K.cx
    v = K.fy * pts_new[..., 1] / jnp.maximum(z, 1e-6) + K.cy
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    ok = ok & inb

    flat = jnp.where(ok, vi * W + ui, H * W)  # overflow bucket for drops
    zbuf = jnp.full((H * W + 1,), jnp.inf, z.dtype)
    zbuf = zbuf.at[flat.reshape(-1)].min(
        jnp.where(ok, z, jnp.inf).reshape(-1)
    )
    won = ok & (z <= zbuf[flat] + 1e-6)

    inv_new = jnp.zeros((H * W + 1,), flt.inv_mu.dtype)
    var_new = jnp.full((H * W + 1,), 1e6, flt.var.dtype)
    src_inv = jnp.where(won, 1.0 / jnp.maximum(z, 1e-6), 0.0)
    # Variance transport: inverse depth rescales by (d_old/d_new)^2
    # per the standard LSD-style propagation, plus motion inflation.
    scale2 = (depth * jnp.where(won, 1.0 / jnp.maximum(z, 1e-6), 0.0)) ** 2
    src_var = flt.var * scale2 * scale2 + motion_var
    inv_new = inv_new.at[jnp.where(won, flat, H * W).reshape(-1)].set(
        src_inv.reshape(-1)
    )
    var_new = var_new.at[jnp.where(won, flat, H * W).reshape(-1)].set(
        jnp.where(won, src_var, 1e6).reshape(-1)
    )
    landed = jnp.zeros((H * W + 1,), bool).at[
        jnp.where(won, flat, H * W).reshape(-1)
    ].set(won.reshape(-1))

    return DepthFilter(
        inv_mu=inv_new[: H * W].reshape(H, W),
        var=var_new[: H * W].reshape(H, W),
        valid=landed[: H * W].reshape(H, W),
    )
