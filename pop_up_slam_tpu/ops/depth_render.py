"""Dense depth rendering from the popped-up plane model (Pallas).

The per-pixel hot loop of SURVEY.md §3.4 ("depth(u,v) = ray-plane
intersection per pixel" — the reference does this on the CPU per
pixel inside ``popup_plane``; mount empty, algorithm per paper
arXiv:1703.07334 §III): for every pixel, intersect its ray with every
valid wall plane, gate hits by the wall's ground-line extent and height
range, z-buffer the nearest, and give ground pixels the ground-plane
depth.

The kernel tiles the image over rows; all per-wall parameters ride in
SMEM as scalars (the wall count is a small static capacity) so the
whole tile is pure VPU element-wise work.  Matches
``popup.depth_from_popup`` to fp tolerance (tests/test_ops.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry.camera import Intrinsics

_LANE = 128
_ROWT = 64  # rows per tile

# params layout (f32): 0-3 fx fy cx cy; 4-12 R_wc row-major; 13-15 t_wc;
# 16-19 ground_c; 20 max_depth; 21 wall_height; 22 H offset unused;
# then per wall s (S entries each): n (3), d, num, e0 (2), d_unit (2),
# seg_len, lo_pad, hi_pad, valid  -> 12 per wall.
_HDR = 22
_PER_WALL = 12


def _make_kernel(S: int, big: float):
    def kernel(p_ref, mask_ref, out_ref):
        i = pl.program_id(0)
        th, tw = mask_ref.shape
        fx, fy, cx, cy = p_ref[0], p_ref[1], p_ref[2], p_ref[3]
        R = [[p_ref[4 + 3 * a + b] for b in range(3)] for a in range(3)]
        t = [p_ref[13 + a] for a in range(3)]
        g = [p_ref[16 + a] for a in range(4)]
        max_depth = p_ref[20]
        wall_h = p_ref[21]

        v0 = (i * th).astype(jnp.float32)
        # Mosaic's tpu.iota is integer-only — build int32 and cast
        # (a float iota verifies on older lowerings but not current).
        vv = v0 + jax.lax.broadcasted_iota(
            jnp.int32, (th, tw), 0
        ).astype(jnp.float32)
        uu = jax.lax.broadcasted_iota(
            jnp.int32, (th, tw), 1
        ).astype(jnp.float32)

        rx = (uu - cx) / fx
        ry = (vv - cy) / fy
        # world-frame ray = R_wc @ (rx, ry, 1)
        rwx = R[0][0] * rx + R[0][1] * ry + R[0][2]
        rwy = R[1][0] * rx + R[1][1] * ry + R[1][2]
        rwz = R[2][0] * rx + R[2][1] * ry + R[2][2]

        # ground depth: s = -d / (n . ray_c), camera-frame plane
        den_g = g[0] * rx + g[1] * ry + g[2]
        safe_g = jnp.where(jnp.abs(den_g) < 1e-6, 1e-6, den_g)
        s_g = -g[3] / safe_g
        ok_g = (jnp.abs(den_g) >= 1e-6) & (s_g > 0)

        best = jnp.full((th, tw), big, jnp.float32)
        for s in range(S):
            o = _HDR + _PER_WALL * s
            nx, ny, nz = p_ref[o], p_ref[o + 1], p_ref[o + 2]
            num = p_ref[o + 4]
            e0x, e0y = p_ref[o + 5], p_ref[o + 6]
            dux, duy = p_ref[o + 7], p_ref[o + 8]
            seg_len = p_ref[o + 9]
            lo_pad = p_ref[o + 10]
            hi_pad = p_ref[o + 11]
            # valid flag folded into num? keep explicit via d slot sign —
            # use the plane's d slot (o+3) as the validity flag instead:
            valid = p_ref[o + 3]

            den = nx * rwx + ny * rwy + nz * rwz
            safe = jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
            sw = num / safe
            hx = t[0] + sw * rwx
            hy = t[1] + sw * rwy
            hz = t[2] + sw * rwz
            u_par = (hx - e0x) * dux + (hy - e0y) * duy
            ok = (
                (sw > 1e-6)
                & (jnp.abs(den) >= 1e-9)
                & (u_par >= -lo_pad)
                & (u_par <= seg_len + hi_pad)
                & (hz >= -0.1)
                & (hz <= wall_h + 0.1)
                & (valid > 0.5)
            )
            best = jnp.where(ok & (sw < best), sw, best)

        wall_depth = jnp.where(best >= big, max_depth, best)
        ground_px = (mask_ref[:] > 0.5) & ok_g
        depth = jnp.where(ground_px, s_g, wall_depth)
        out_ref[:] = jnp.clip(depth, 0.0, max_depth)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "max_depth", "wall_height",
                              "extent_pad")
)
def depth_render_pallas(
    K: Intrinsics,
    res,
    ground_mask: jnp.ndarray,
    R_wc: jnp.ndarray,
    t_wc: jnp.ndarray,
    max_depth: float = 50.0,
    wall_height: float = 2.5,
    extent_pad: float = 0.5,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Pallas twin of ``popup.depth_from_popup`` (same signature core)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W = ground_mask.shape
    S = res.planes_w.shape[0]
    Hp = -(-H // _ROWT) * _ROWT
    Wp = -(-W // _LANE) * _LANE

    n = res.planes_w[:, :3]
    d = res.planes_w[:, 3]
    num = -(n @ t_wc + d)
    e0 = res.endpoints_w[:, 0, :2]
    e1 = res.endpoints_w[:, 1, :2]
    seg = e1 - e0
    seg_len = jnp.sqrt(jnp.maximum(jnp.sum(seg * seg, axis=-1), 1e-12))
    d_unit = seg / seg_len[:, None]
    far = jnp.asarray(max_depth, jnp.float32)
    lo_pad = jnp.where(res.clipped[:, 0], far, extent_pad)
    hi_pad = jnp.where(res.clipped[:, 1], far, extent_pad)

    per_wall = jnp.concatenate(
        [
            n,
            res.valid.astype(jnp.float32)[:, None],  # validity in d slot
            num[:, None],
            e0,
            d_unit,
            seg_len[:, None],
            lo_pad[:, None],
            hi_pad[:, None],
        ],
        axis=-1,
    ).reshape(-1)

    params = jnp.concatenate(
        [
            jnp.stack([K.fx, K.fy, K.cx, K.cy]).astype(jnp.float32),
            R_wc.reshape(9).astype(jnp.float32),
            t_wc.astype(jnp.float32),
            res.ground_c.astype(jnp.float32),
            jnp.array([max_depth, wall_height], jnp.float32),
            per_wall.astype(jnp.float32),
        ]
    )

    mask_f = jnp.zeros((Hp, Wp), jnp.float32).at[:H, :W].set(
        ground_mask.astype(jnp.float32)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Hp // _ROWT,),
        in_specs=[
            pl.BlockSpec((_ROWT, Wp), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWT, Wp), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )

    depth = pl.pallas_call(
        _make_kernel(S, big=float(max_depth) * 1e6),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(params, mask_f)
    return depth[:H, :W]
