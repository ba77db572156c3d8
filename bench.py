"""Benchmark: end-to-end plane-SLAM frames/s + BA iters/s on one chip.

Prints ONE JSON line whose required keys are {"metric", "value",
"unit", "vs_baseline"} (the headline frames/s); the BASELINE.json
secondary metric "BA iters/s per chip" and the Pallas-vs-jnp solver
delta ride along as extra keys in the same object.

Headline: the full per-frame path (BASELINE metric "frames/s at
1 chip"): segmentation mask -> pop-up plane extraction -> data
association -> sliding-window Gauss-Newton BA with Schur elimination ->
pose.  Every frame takes the keyframe path (worst case: the full BA
solve runs each frame).  Frames are processed through the chunked
runner (pop_up_slam_tpu.pipeline.offline): ``CHUNK`` consecutive frames
per dispatch inside one ``lax.scan``, state donated between chunks —
the per-frame computation is identical to the interactive path, only
the host->device round trip per frame (~3.5 ms through the tunneled
chip) is amortized away.

BA iters/s: K Gauss-Newton iterations (linearize -> Schur -> blocked
Cholesky -> retract) on a representative populated window (W=8 poses,
L=64 landmark slots, the default SlamConfig) harvested from the
headline run's final state, using the production solver configuration
(analytic plane Jacobians; Pallas Schur+Cholesky on TPU via
make_solve_fn("auto")).  On TPU the jnp solver is also timed and the
speedup reported; on CPU the Pallas interpret mode is skipped (it is a
correctness path only, exercised by tests/test_ops.py).

``vs_baseline``: the reference (shichaoy/pop_up_slam, ROS/C++/iSAM on
CPU) reports real-time-capable per-frame processing; the paper's timing
discussion puts pop-up + SLAM update at ~order tens of ms per frame
excluding CNN segmentation (SURVEY.md §6 — recalled, reference mount
empty).  We take 30 fps as the reference-equivalent throughput bound,
so vs_baseline = frames_per_s / 30.
"""

import json
import os
import time

import jax

# Persistent XLA compile cache: the first jit of the chunked runner is
# ~30 s on a fresh process; cached it is near-free on every rerun.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE_FPS = 30.0

H, W = 480, 640
CHUNK = 16
N_WARMUP_CHUNKS = 1
N_CHUNKS = 8

BA_ITERS = 8          # GN iterations per timed solve call
BA_REPEATS = 20       # timed solve calls


def _time_solver(window, factors, scfg, pallas):
    """Time jitted gn_solve(iters=BA_ITERS) on a populated window."""
    from pop_up_slam_tpu.solver import gn_solve
    from pop_up_slam_tpu.solver.schur import make_solve_fn

    solve_fn = make_solve_fn(pallas)

    run = jax.jit(
        lambda w: gn_solve(
            w, factors, iters=BA_ITERS, damping=scfg.damping,
            solve_fn=solve_fn, analytic_planes=scfg.analytic_planes,
            robust=scfg.robust,
        )
    )
    out = run(window)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(BA_REPEATS):
        out = run(window)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return BA_REPEATS * BA_ITERS / dt


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
    from pop_up_slam_tpu.pipeline.slam import _build_factors
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

    # --- BA iters/s on the populated window from the run above ---
    window = state.window
    factors = _build_factors(state, scfg)
    on_tpu = jax.default_backend() == "tpu"
    ba_auto = _time_solver(window, factors, scfg, "auto")
    extra = {
        "ba_iters_per_s_1chip": round(ba_auto, 2),
        "ba_window": [window.window_size, window.max_landmarks],
        "ba_solver": "pallas" if on_tpu else "jnp",
    }
    if on_tpu:
        ba_jnp = _time_solver(window, factors, scfg, "off")
        extra["ba_iters_per_s_jnp"] = round(ba_jnp, 2)
        extra["pallas_solve_speedup"] = round(ba_auto / ba_jnp, 3)

    print(json.dumps({
        "metric": "slam_frames_per_s_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
        **extra,
    }))


if __name__ == "__main__":
    main()
