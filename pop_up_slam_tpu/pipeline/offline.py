"""Chunked high-throughput frame processing (offline / batch mode).

The interactive path dispatches one ``slam_step`` per frame; on a real
TPU every dispatch pays a fixed host->device round trip (~3.5 ms
through a tunneled chip — measured, see bench.py) that dwarfs the
~1 ms of on-device work per frame.  The reference has the same split:
its ROS node processes rosbag playback frame-by-frame over IPC
(SURVEY.md §3.2).  For offline sequence processing (evaluation runs,
dataset sweeps, serving batches of buffered frames) this module rolls
``chunk`` consecutive frames into ONE ``lax.scan`` inside a single jit
so the dispatch cost amortizes: the per-frame computation is *exactly*
the per-frame path (pop-up -> association -> windowed BA under
``lax.cond``), only the host round trips are removed.  Measured on a
v5e chip this is a ~4.4x end-to-end speedup (224 -> ~990 frames/s).

The SLAM state is donated between chunks, so the window buffers are
updated in place on device with no reallocation per chunk.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Intrinsics
from ..odometry import PlaneVOConfig, plane_vo_step
from ..popup import popup as pp
from .slam import (
    SlamConfig,
    SlamState,
    current_pose,
    detections_from_popup,
    slam_step,
)


def make_frame_fn(K: Intrinsics, pcfg: pp.PopupConfig, scfg: SlamConfig):
    """One full SLAM frame as a scan body: (state, (mask, odom_R, odom_t))
    -> (state, (R_wc, t_wc))."""

    def frame(state: SlamState, inp):
        mask, odom_R, odom_t = inp
        pred_R, pred_t = current_pose(state)
        res = pp.pop_up(K, mask, pred_R, pred_t, pcfg)
        det = detections_from_popup(res, pred_R, pred_t, scfg.max_det)
        state, (R, t) = slam_step(state, det, odom_R, odom_t, scfg)
        return state, (R, t)

    return frame


class VOState(NamedTuple):
    """Scan carry for the fully-monocular (plane-VO) frame loop."""

    slam: SlamState
    prev_planes: jnp.ndarray     # (D, 4) previous frame's camera planes
    prev_valid: jnp.ndarray      # (D,) bool
    prev_support: jnp.ndarray    # (D,) f32 boundary-column support
    prior_R: jnp.ndarray         # (3, 3) constant-velocity motion prior
    prior_t: jnp.ndarray         # (3,)


def vo_init(slam_state: SlamState, max_det: int) -> VOState:
    return VOState(
        slam=slam_state,
        prev_planes=jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0, 0.0]), (max_det, 4)
        ),
        prev_valid=jnp.zeros((max_det,), bool),
        prev_support=jnp.zeros((max_det,)),
        prior_R=jnp.eye(3),
        prior_t=jnp.zeros((3,)),
    )


def _vo_frame_core(vs: VOState, mask, K, pcfg, scfg, vcfg):
    """Shared fully-monocular frame step.  Returns the next VOState, the
    pose, and the auxiliaries (pop-up result, pop-up pose, VO estimate)
    the fused-depth variant builds on."""
    base_R, base_t = current_pose(vs.slam)
    # Pop-up at the constant-velocity-predicted pose (only gravity
    # alignment + height matter for the single-view geometry).
    pred_R, pred_t = se3.se3_compose(
        base_R, base_t, vs.prior_R, vs.prior_t
    )
    res = pp.pop_up(K, mask, pred_R, pred_t, pcfg)
    planes = jnp.concatenate([res.planes_c, res.ground_c[None]])
    pad = scfg.max_det - planes.shape[0]
    planes = jnp.concatenate(
        [planes, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0, 0.0]),
                                  (pad, 4))]
    ) if pad else planes
    valid = jnp.concatenate(
        [res.valid, jnp.ones((1,), bool), jnp.zeros((pad,), bool)]
    )
    # Observation support per detection: boundary columns per wall; the
    # ground gets the total valid-boundary column count (it is fit from
    # the whole mask and is always the best-observed plane).
    ground_sup = jnp.sum(res.boundary_ok).astype(jnp.float32)[None]
    support = jnp.concatenate(
        [res.n_points.astype(jnp.float32), ground_sup,
         jnp.zeros((pad,), jnp.float32)]
    ) if pad else jnp.concatenate(
        [res.n_points.astype(jnp.float32), ground_sup]
    )

    vo = plane_vo_step(
        vs.prev_planes, vs.prev_valid, planes, valid,
        vs.prior_R, vs.prior_t, vcfg,
        support_prev=vs.prev_support, support_cur=support,
    )
    det = detections_from_popup(res, pred_R, pred_t, scfg.max_det)
    slam, (R, t) = slam_step(vs.slam, det, vo.R, vo.t, scfg)
    vs_next = VOState(slam, planes, valid, support, vo.R, vo.t)
    return vs_next, (R, t), (res, pred_R, pred_t, vo)


def make_vo_frame_fn(
    K: Intrinsics,
    pcfg: pp.PopupConfig,
    scfg: SlamConfig,
    vcfg: PlaneVOConfig = PlaneVOConfig(),
):
    """Fully monocular frame step: mask -> pop-up -> plane-VO odometry ->
    SLAM.  No external odometry input of any kind — the relative motion
    measurement comes from frame-to-frame plane alignment
    (odometry/plane_vo.py), seeded by a constant-velocity prior.

    Scan body: (VOState, mask (H, W)) -> (VOState, (R_wc, t_wc)).
    """

    def frame(vs: VOState, mask):
        vs_next, pose, _ = _vo_frame_core(vs, mask, K, pcfg, scfg, vcfg)
        return vs_next, pose

    return frame


class FusedVOState(NamedTuple):
    """Monocular VO carry + the per-pixel inverse-depth fusion filter
    (paper §V analog — fusion/depth_fusion.py)."""

    vo: VOState
    filt: "jnp.ndarray"  # DepthFilter pytree


def fused_vo_init(slam_state: SlamState, max_det: int, height: int,
                  width: int) -> FusedVOState:
    from ..fusion import DepthFilter

    return FusedVOState(
        vo=vo_init(slam_state, max_det),
        filt=DepthFilter(
            inv_mu=jnp.zeros((height, width)),
            var=jnp.full((height, width), 1e6),
            valid=jnp.zeros((height, width), bool),
        ),
    )


def make_fused_vo_frame_fn(
    K: Intrinsics,
    pcfg: pp.PopupConfig,
    scfg: SlamConfig,
    vcfg: PlaneVOConfig = PlaneVOConfig(),
    sigma0_rel: float = 0.05,
    motion_var: float = 1e-4,
    max_depth: float = 40.0,
):
    """Monocular frame step with semi-dense depth fusion in the loop
    (the reference's LSD-SLAM fusion role, paper arXiv:1703.07334 §V;
    SURVEY.md §2.1 "LSD-SLAM depth fusion"): each frame's popped-up
    plane depth is fused into a per-pixel inverse-depth filter that is
    forward-warped through the estimated relative motion — the filter
    smooths single-frame pop-up noise and carries depth into regions
    the current frame's segmentation misses.

    Scan body: (FusedVOState, mask (H, W)) ->
               (FusedVOState, ((R_wc, t_wc), fused_depth (H, W))).
    """
    from ..fusion import fuse_observation, init_from_popup, propagate_to_frame

    def frame(fs: FusedVOState, mask):
        vs_next, (R, t), (res, pred_R, pred_t, vo) = _vo_frame_core(
            fs.vo, mask, K, pcfg, scfg, vcfg
        )
        plane_depth = pp.render_depth(
            K, res, mask, pred_R, pred_t, max_depth=max_depth
        )
        # warp yesterday's filter through the VO motion, then fuse
        # today's plane-depth observation
        flt = propagate_to_frame(fs.filt, K, vo.R, vo.t,
                                 motion_var=motion_var,
                                 max_depth=max_depth)
        obs = init_from_popup(plane_depth, sigma0_rel=sigma0_rel,
                              max_depth=max_depth)
        flt = fuse_observation(flt, obs.inv_mu, obs.var)
        fused_depth = jnp.where(
            flt.valid, 1.0 / jnp.clip(flt.inv_mu, 1e-3, 1e3), plane_depth
        )
        return FusedVOState(vs_next, flt), ((R, t), fused_depth)

    return frame


def make_chunked_fused_vo_runner(
    K: Intrinsics,
    pcfg: pp.PopupConfig,
    scfg: SlamConfig,
    vcfg: PlaneVOConfig = PlaneVOConfig(),
    donate: bool = True,
    **fusion_kwargs,
):
    """Jitted fused monocular runner over a chunk of masks:
    ``run(fs, masks (C, H, W)) ->
    (fs, ((R (C,3,3), t (C,3)), depth (C, H, W)))``."""
    frame = make_fused_vo_frame_fn(K, pcfg, scfg, vcfg, **fusion_kwargs)

    def run(fs, masks):
        return jax.lax.scan(frame, fs, masks)

    if donate:
        return jax.jit(run, donate_argnums=0)
    return jax.jit(run)


def make_chunked_vo_runner(
    K: Intrinsics,
    pcfg: pp.PopupConfig,
    scfg: SlamConfig,
    vcfg: PlaneVOConfig = PlaneVOConfig(),
    donate: bool = True,
):
    """Jitted monocular runner over a chunk of masks: ``run(vo_state,
    masks (C, H, W)) -> (vo_state, (R (C,3,3), t (C,3)))``."""
    frame = make_vo_frame_fn(K, pcfg, scfg, vcfg)

    def run(vs, masks):
        return jax.lax.scan(frame, vs, masks)

    if donate:
        return jax.jit(run, donate_argnums=0)
    return jax.jit(run)


def make_chunked_runner(
    K: Intrinsics,
    pcfg: pp.PopupConfig,
    scfg: SlamConfig,
    donate: bool = True,
):
    """Jitted runner over a chunk of frames.

    Returns ``run(state, masks (C,H,W), odom_R (C,3,3), odom_t (C,3))
    -> (state, (R (C,3,3), t (C,3)))``.  One compile per distinct chunk
    length C; the state is donated (updated in place on device) unless
    ``donate=False`` (needed when the caller reuses the input state,
    e.g. in tests).
    """
    frame = make_frame_fn(K, pcfg, scfg)

    def run(state, masks, odom_R, odom_t):
        return jax.lax.scan(frame, state, (masks, odom_R, odom_t))

    if donate:
        return jax.jit(run, donate_argnums=0)
    return jax.jit(run)


def run_sequence_with(
    make_runner,
    state: SlamState,
    masks: jnp.ndarray,
    odom_R: jnp.ndarray,
    odom_t: jnp.ndarray,
    K: Intrinsics,
    pcfg: pp.PopupConfig,
    scfg: SlamConfig,
    chunk: int = 16,
    donate: bool = True,
):
    """Shared chunk-loop driver for any chunk-runner factory.

    ``make_runner(K, pcfg, scfg, donate=...)`` must return a jitted
    ``run(state, masks (C,H,W), odom_R (C,3,3), odom_t (C,3))``.  One
    runner instance serves both the full chunks and the tail — jit
    recompiles once at the tail length within the same cache.  An
    empty sequence returns the state unchanged with (0,·)-shaped
    outputs.  Returns (state, (R (N,3,3), t (N,3))).
    """
    n = masks.shape[0]
    if n == 0:
        dtype = odom_t.dtype
        return state, (
            jnp.zeros((0, 3, 3), dtype), jnp.zeros((0, 3), dtype)
        )
    run = make_runner(K, pcfg, scfg, donate=donate)
    outs = []
    for start in range(0, n, chunk):
        sl = slice(start, min(start + chunk, n))
        state, out = run(state, masks[sl], odom_R[sl], odom_t[sl])
        outs.append(out)
    Rs = jnp.concatenate([o[0] for o in outs], axis=0)
    ts = jnp.concatenate([o[1] for o in outs], axis=0)
    return state, (Rs, ts)


def run_sequence_chunked(
    state: SlamState,
    masks: jnp.ndarray,
    odom_R: jnp.ndarray,
    odom_t: jnp.ndarray,
    K: Intrinsics,
    pcfg: pp.PopupConfig,
    scfg: SlamConfig,
    chunk: int = 16,
    donate: bool = True,
):
    """Run a whole sequence through the chunked runner.

    Chunks run through one compiled scan each (the tail recompiles at
    its own length), so results are bit-identical to the per-frame
    loop (tests/test_offline.py).  Returns (state, (R (N,3,3), t (N,3))).
    """
    return run_sequence_with(
        make_chunked_runner, state, masks, odom_R, odom_t,
        K, pcfg, scfg, chunk=chunk, donate=donate,
    )
