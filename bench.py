"""Benchmark: end-to-end plane-SLAM frames/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The pipeline measured is the full per-frame path (BASELINE metric
"frames/s at 1 chip"): segmentation mask -> pop-up plane extraction ->
data association -> sliding-window Gauss-Newton BA with Schur
elimination -> pose.  Every frame takes the keyframe path (worst case:
the BA solve runs each frame).

``vs_baseline``: the reference (shichaoy/pop_up_slam, ROS/C++/iSAM on
CPU) reports real-time-capable per-frame processing; the paper's timing
discussion puts pop-up + SLAM update at ~order tens of ms per frame
excluding CNN segmentation (SURVEY.md §6 — recalled, reference mount
empty).  We take 30 fps as the reference-equivalent throughput bound,
so vs_baseline = frames_per_s / 30.
"""

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_FPS = 30.0

H, W = 480, 640
N_WARMUP = 3
N_FRAMES = 30


def main():
    import pop_up_slam_tpu  # noqa: F401 — sets matmul precision
    from pop_up_slam_tpu.geometry import se3
    from pop_up_slam_tpu.geometry.camera import Intrinsics
    from pop_up_slam_tpu.io import synthetic
    from pop_up_slam_tpu.pipeline import (
        SlamConfig,
        current_pose,
        detections_from_popup,
        slam_init,
        slam_step,
    )
    from pop_up_slam_tpu.popup import popup as pp

    K = Intrinsics.create(320.0, 320.0, 320.0, 240.0)
    pcfg = pp.PopupConfig()
    # kf thresholds 0 => every frame is a keyframe: worst-case load.
    scfg = SlamConfig(max_det=pcfg.max_segments + 1, kf_trans=0.0,
                      kf_rot=0.0)

    @jax.jit
    def frame_step(state, ground_mask, odom_R, odom_t):
        pred_R, pred_t = current_pose(state)
        res = pp.pop_up(K, ground_mask, pred_R, pred_t, pcfg)
        det = detections_from_popup(res, pred_R, pred_t, scfg.max_det)
        state, (R, t) = slam_step(state, det, odom_R, odom_t, scfg)
        return state, (R, t)

    world = synthetic.corridor_world()
    n = N_WARMUP + N_FRAMES
    Rs, ts = synthetic.corridor_trajectory(n + 1)
    labels, _ = jax.jit(
        jax.vmap(lambda R_, t_: synthetic.render_frame(K, R_, t_, world, H, W))
    )(Rs, ts)
    masks = labels == synthetic.LABEL_GROUND
    oR, ot = se3.se3_between(Rs[:-1], ts[:-1], Rs[1:], ts[1:])
    masks, oR, ot = jax.device_put((masks, oR, ot))

    state = slam_init(scfg, Rs[0], ts[0])
    for i in range(N_WARMUP):
        state, out = frame_step(state, masks[i + 1], oR[i], ot[i])
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for i in range(N_WARMUP, n):
        state, out = frame_step(state, masks[i + 1], oR[i], ot[i])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = N_FRAMES / dt
    print(json.dumps({
        "metric": "slam_frames_per_s_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
