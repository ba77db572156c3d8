"""Batched-front-end chunk runner: DP pop-up + sequential back-end.

The chunked runner (:mod:`pipeline.offline`) removes the per-frame
host->device round trip but still runs the pop-up *inside* the
sequential ``lax.scan`` — the image front-end of frame t+1 waits for
the BA of frame t even though they are independent.  This module
exploits the single-view geometry of the pop-up (paper
arXiv:1703.07334 §III; SURVEY.md §3.4): the *camera-frame* detections
(``planes_c``, ``centroid_c``, ``endpoints_c``) depend on the pose
prior only through gravity alignment and camera height — they are
invariant to the horizontal position and yaw that the windowed BA
refines.  So the front-end can run on **dead-reckoned** poses
(state pose ∘ cumulated odometry), batched with ``vmap`` across the
whole chunk, while only the cheap fixed-shape SLAM core
(association + window BA, :func:`pipeline.slam.slam_step`) stays in
the sequential scan.

This is the DP front-end / sequential back-end split of SURVEY.md
§2.2 realized *within one chip*: the (C, H, W) image work becomes one
large batched XLA program (VPU-friendly, no per-frame serialization)
instead of C dependent iterations.  With a sharded mesh the same
batch dimension is what ``parallel.distributed.sharded_popup``
spreads across chips.

Numerical note: the per-frame path (offline.make_frame_fn) pops frame
t up at the BA-refined pose of the *previous* frame — the current
frame's odometry is composed inside ``slam_step``, after the pop-up —
while this path pops up at the dead-reckoned pose *including* frame
t's odometry.  The two therefore differ by one odometry delta plus
whatever BA corrections accumulated inside the chunk.  Camera-frame
detections agree exactly when the poses share height and gravity
alignment, which the BA preserves up to its own correction of odometry
noise — tests/test_batched.py checks trajectory agreement on the
synthetic corridor.  Under *noisy* odometry the dead-reckoned pop-up
poses accumulate uncorrected height/gravity error across the chunk (no
BA feedback within a chunk), so larger ``chunk`` trades accuracy for
throughput; tests/test_batched.py bounds the error at the default
chunk length.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Intrinsics
from ..popup import popup as pp
from .slam import (
    SlamConfig,
    SlamState,
    current_pose,
    detections_from_popup,
    slam_step,
)


def dead_reckon(base_R: jnp.ndarray, base_t: jnp.ndarray,
                odom_R: jnp.ndarray, odom_t: jnp.ndarray):
    """Cumulative compose of a chunk of relative motions onto a base pose.

    Returns (R (C,3,3), t (C,3)) — the dead-reckoned pose *after* each
    relative measurement.
    """

    def step(carry, od):
        R, t = se3.se3_compose(carry[0], carry[1], od[0], od[1])
        return (R, t), (R, t)

    (_, _), (Rs, ts) = jax.lax.scan(step, (base_R, base_t), (odom_R, odom_t))
    return Rs, ts


def make_batched_runner(
    K: Intrinsics,
    pcfg: pp.PopupConfig,
    scfg: SlamConfig,
    donate: bool = True,
):
    """Jitted batched-front-end runner over a chunk of frames.

    Same signature as :func:`pipeline.offline.make_chunked_runner`:
    ``run(state, masks (C,H,W), odom_R (C,3,3), odom_t (C,3))
    -> (state, (R (C,3,3), t (C,3)))``.
    """

    def run(state: SlamState, masks, odom_R, odom_t):
        base_R, base_t = current_pose(state)
        dr_R, dr_t = dead_reckon(base_R, base_t, odom_R, odom_t)

        # --- DP front-end: every frame popped up at once ---
        res = jax.vmap(lambda m, R, t: pp.pop_up(K, m, R, t, pcfg))(
            masks, dr_R, dr_t
        )
        dets = jax.vmap(
            lambda r, R, t: detections_from_popup(r, R, t, scfg.max_det)
        )(res, dr_R, dr_t)

        # --- sequential back-end: association + windowed BA only ---
        def step(st, inp):
            det, oR, ot = inp
            return slam_step(st, det, oR, ot, scfg)

        return jax.lax.scan(step, state, (dets, odom_R, odom_t))

    if donate:
        return jax.jit(run, donate_argnums=0)
    return jax.jit(run)


def run_sequence_batched(
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
    """Run a whole sequence through the batched runner via the shared
    chunk-loop driver (offline.run_sequence_with).

    Accuracy note: within a chunk the front-end sees no BA feedback
    (module docstring), so with noisy odometry a larger ``chunk``
    trades accuracy for throughput — pick the chunk length to the
    odometry quality.
    """
    from .offline import run_sequence_with

    return run_sequence_with(
        make_batched_runner, state, masks, odom_R, odom_t,
        K, pcfg, scfg, chunk=chunk, donate=donate,
    )
