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
    prior_R: jnp.ndarray         # (3, 3) constant-velocity motion prior
    prior_t: jnp.ndarray         # (3,)


def vo_init(slam_state: SlamState, max_det: int) -> VOState:
    return VOState(
        slam=slam_state,
        prev_planes=jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0, 0.0]), (max_det, 4)
        ),
        prev_valid=jnp.zeros((max_det,), bool),
        prior_R=jnp.eye(3),
        prior_t=jnp.zeros((3,)),
    )


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

        vo = plane_vo_step(
            vs.prev_planes, vs.prev_valid, planes, valid,
            vs.prior_R, vs.prior_t, vcfg,
        )
        det = detections_from_popup(res, pred_R, pred_t, scfg.max_det)
        slam, (R, t) = slam_step(vs.slam, det, vo.R, vo.t, scfg)
        return VOState(slam, planes, valid, vo.R, vo.t), (R, t)

    return frame


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

    Full chunks go through one compiled scan; the tail (< chunk frames)
    runs through a second scan compiled at the tail length, so results
    are bit-identical to the per-frame loop (tests/test_offline.py).
    Returns (state, (R (N,3,3), t (N,3))).
    """
    n = masks.shape[0]
    n_full = n // chunk
    outs = []
    if n_full:
        run = make_chunked_runner(K, pcfg, scfg, donate=donate)
        for c in range(n_full):
            sl = slice(c * chunk, (c + 1) * chunk)
            state, out = run(state, masks[sl], odom_R[sl], odom_t[sl])
            outs.append(out)
    tail = n - n_full * chunk
    if tail:
        run_t = make_chunked_runner(K, pcfg, scfg, donate=donate)
        sl = slice(n_full * chunk, n)
        state, out = run_t(state, masks[sl], odom_R[sl], odom_t[sl])
        outs.append(out)
    Rs = jnp.concatenate([o[0] for o in outs], axis=0)
    ts = jnp.concatenate([o[1] for o in outs], axis=0)
    return state, (Rs, ts)
