"""Benchmark: end-to-end plane-SLAM frames/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The pipeline measured is the full per-frame path (BASELINE metric
"frames/s at 1 chip"): segmentation mask -> pop-up plane extraction ->
data association -> sliding-window Gauss-Newton BA with Schur
elimination -> pose.  Every frame takes the keyframe path (worst case:
the full BA solve runs each frame).

Frames are processed through the chunked runner
(pop_up_slam_tpu.pipeline.offline): ``CHUNK`` consecutive frames per
dispatch inside one ``lax.scan``, state donated between chunks — the
per-frame computation is identical to the interactive path, only the
host->device round trip per frame (~3.5 ms through the tunneled chip,
3/4 of round 1's frame time) is amortized away.

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

REFERENCE_FPS = 30.0

H, W = 480, 640
CHUNK = 16
N_WARMUP_CHUNKS = 1
N_CHUNKS = 8


def main():
    import pop_up_slam_tpu  # noqa: F401 — sets matmul precision
    from pop_up_slam_tpu.geometry import se3
    from pop_up_slam_tpu.geometry.camera import Intrinsics
    from pop_up_slam_tpu.io import synthetic
    from pop_up_slam_tpu.pipeline import (
        SlamConfig,
        make_chunked_runner,
        slam_init,
    )
    from pop_up_slam_tpu.popup import popup as pp

    K = Intrinsics.create(320.0, 320.0, 320.0, 240.0)
    pcfg = pp.PopupConfig()
    # kf thresholds 0 => every frame is a keyframe: worst-case load.
    scfg = SlamConfig(max_det=pcfg.max_segments + 1, kf_trans=0.0,
                      kf_rot=0.0)

    world = synthetic.corridor_world()
    n = (N_WARMUP_CHUNKS + N_CHUNKS) * CHUNK
    Rs, ts = synthetic.corridor_trajectory(n + 1)
    labels, _ = jax.jit(
        jax.vmap(lambda R_, t_: synthetic.render_frame(K, R_, t_, world, H, W))
    )(Rs, ts)
    masks = labels[1:] == synthetic.LABEL_GROUND
    oR, ot = se3.se3_between(Rs[:-1], ts[:-1], Rs[1:], ts[1:])
    masks, oR, ot = jax.device_put((masks, oR, ot))
    jax.block_until_ready(masks)

    run = make_chunked_runner(K, pcfg, scfg, donate=True)
    mc = masks.reshape(-1, CHUNK, H, W)
    oc = oR.reshape(-1, CHUNK, 3, 3)
    tc = ot.reshape(-1, CHUNK, 3)

    state = slam_init(scfg, Rs[0], ts[0])
    for c in range(N_WARMUP_CHUNKS):
        state, out = run(state, mc[c], oc[c], tc[c])
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for c in range(N_WARMUP_CHUNKS, N_WARMUP_CHUNKS + N_CHUNKS):
        state, out = run(state, mc[c], oc[c], tc[c])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = N_CHUNKS * CHUNK / dt
    print(json.dumps({
        "metric": "slam_frames_per_s_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
