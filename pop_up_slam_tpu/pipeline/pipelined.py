"""Pipelined front-end/back-end execution (the PP analog).

SURVEY.md §2.2 "PP-analog (pipeline)": overlap extraction of frame t+1
with the BA of window t.  The reference gets this for free from ROS —
pop-up and iSAM run in the same callback but IO/deserialization happen
on other threads; here the SLAM loop is one Python process driving
accelerators, so the overlap is made explicit:

- the **front-end stage** (pop-up plane extraction on the segmentation
  mask) and the **back-end stage** (association + windowed BA) are
  jit-compiled separately;
- the driver dispatches the front-end for frame t+1 *before* consuming
  the back-end of frame t — XLA's async dispatch queues both device
  programs, so device compute of stage A(t+1) overlaps host work and,
  with two devices, runs truly concurrently with stage B(t);
- with ``fe_device``/``be_device`` set, the stages are placed on
  different chips and detections stream between them
  (``jax.device_put``), i.e. genuine two-stage pipeline parallelism.

The pipelined result is *bit-identical* to the sequential loop — the
schedule changes, the math does not (tests/test_pipelined.py).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import jax

from ..geometry.camera import Intrinsics
from .slam import (
    FrameDetections,
    SlamConfig,
    SlamState,
    current_pose,
    detections_from_popup,
    slam_step,
)
from ..popup import popup as pp


def make_stages(K: Intrinsics, pcfg: pp.PopupConfig, scfg: SlamConfig,
                fe_device=None, be_device=None):
    """Build the two jitted pipeline stages.

    front_end(state, mask)        -> FrameDetections   (pop-up)
    back_end(state, det, oR, ot)  -> (state, (R, t))   (assoc + BA)

    The front-end pops up at ``current_pose(state)`` — the same
    prediction the sequential runner uses (runners.tum_runner), so the
    pipelined schedule produces bit-identical trajectories.
    """

    def _front(state: SlamState, mask):
        pred_R, pred_t = current_pose(state)
        res = pp.pop_up(K, mask, pred_R, pred_t, pcfg)
        return detections_from_popup(res, pred_R, pred_t, scfg.max_det)

    def _back(state: SlamState, det: FrameDetections, odom_R, odom_t):
        return slam_step(state, det, odom_R, odom_t, scfg)

    front = jax.jit(_front, device=fe_device) if fe_device else jax.jit(_front)
    back = jax.jit(_back, device=be_device) if be_device else jax.jit(_back)
    return front, back


def run_pipelined(
    state: SlamState,
    frames: Iterable,                 # yields (mask, odom_R, odom_t)
    K: Intrinsics,
    pcfg: pp.PopupConfig,
    scfg: SlamConfig,
    fe_device=None,
    be_device=None,
    stale_prediction: bool = True,
) -> Iterator[tuple]:
    """Drive the two-stage pipeline; yields (R, t) per frame.

    ``stale_prediction=True`` (the real pipeline): the front-end of
    frame t+1 pops up at the pose prediction *before* frame t's BA has
    landed, so the two stages have no data dependency and overlap —
    the tracking/mapping-thread split of classic SLAM systems, with the
    same one-update-stale prediction.  The staleness only moves the
    pose prior of the pop-up; the camera-frame plane measurements are
    pose-invariant under yaw/translation error, so accuracy impact is
    limited to association gating (tests bound it).

    ``stale_prediction=False``: front(t+1) waits for back(t)'s state —
    bit-identical to the sequential runner, no overlap (useful as the
    equality baseline).
    """
    front, back = make_stages(K, pcfg, scfg, fe_device, be_device)

    def to_fe(s):
        return jax.device_put(s, fe_device) if fe_device is not None else s

    def to_be(d):
        return jax.device_put(d, be_device) if be_device is not None else d

    it = iter(frames)
    try:
        mask, oR, ot = next(it)
    except StopIteration:
        return
    det = front(to_fe(state), mask)              # warm the pipe
    pending = (det, oR, ot)

    for n_mask, n_oR, n_ot in it:
        det, oR, ot = pending
        if stale_prediction:
            # front(t+1) reads the PRE-back(t) state: independent of the
            # back-end dispatched below — XLA overlaps both programs.
            n_det = front(to_fe(state), n_mask)
            state, pose = back(state, to_be(det), oR, ot)
        else:
            state, pose = back(state, to_be(det), oR, ot)
            n_det = front(to_fe(state), n_mask)
        pending = (n_det, n_oR, n_ot)
        yield pose

    det, oR, ot = pending                        # drain the pipe
    state, pose = back(state, to_be(det), oR, ot)
    yield pose
