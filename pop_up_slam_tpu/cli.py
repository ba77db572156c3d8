"""CLI entry point: ``python -m pop_up_slam_tpu.cli run --config <preset>``.

The app layer replacing the reference's roslaunch files (SURVEY.md L4):
runs one of the five BASELINE presets end-to-end, prints per-frame
metrics and the final ATE summary, optionally writes a TUM-format
trajectory and a metrics JSONL.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _run_popup_demo(cfg, args):
    import jax
    import numpy as np

    from .geometry.camera import Intrinsics
    from .io import synthetic
    from .popup import popup as pp

    K = Intrinsics.create(320.0, 320.0, 320.0, 240.0)
    world = synthetic.corridor_world()
    R, t = synthetic.corridor_trajectory(1)
    labels, depth_gt = synthetic.render_frame(K, R[0], t[0], world,
                                             cfg.height, cfg.width)
    mask = labels == synthetic.LABEL_GROUND
    t0 = time.perf_counter()
    res = jax.jit(lambda m: pp.pop_up(K, m, R[0], t[0], cfg.popup))(mask)
    depth = pp.render_depth(K, res, mask, R[0], t[0])
    jax.block_until_ready(depth)
    dt = time.perf_counter() - t0
    gt = np.asarray(depth_gt)
    d = np.asarray(depth)
    m = gt < 40
    rel = np.abs(d[m] - gt[m]) / gt[m]
    print(json.dumps({
        "config": cfg.name,
        "n_wall_planes": int(np.asarray(res.valid).sum()),
        "depth_median_rel_err": float(np.median(rel)),
        "depth_p95_rel_err": float(np.percentile(rel, 95)),
        "wall_s_first_frame": round(dt, 3),
    }, indent=2))
    return 0


def _run_synthetic(cfg, args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .evaluation import ate_rmse
    from .io import synthetic
    from .pipeline import FrameDetections, slam_init, slam_step
    from .utils import MetricsLogger

    scfg = cfg.slam
    world = synthetic.corridor_world()
    gt_R, gt_t = synthetic.corridor_trajectory(cfg.n_frames, sway=0.3)
    key = jax.random.PRNGKey(cfg.seed)
    k_odom, k_obs = jax.random.split(key)
    Rrel, trel = synthetic.noisy_odometry(
        gt_R, gt_t, k_odom, sigma_t=cfg.odom_sigma_t,
        sigma_r=cfg.odom_sigma_r,
    )
    obs_keys = jax.random.split(k_obs, cfg.n_frames)
    obs = jax.vmap(
        lambda R, t, k: synthetic.observe_frame(
            world, R, t, key=k, max_det=scfg.max_det
        )
    )(gt_R, gt_t, obs_keys)

    state = slam_init(scfg, gt_R[0], gt_t[0])
    step = jax.jit(lambda s, d, oR, ot: slam_step(s, d, oR, ot, scfg))
    logger = MetricsLogger(cfg.metrics_path or None)

    est = [np.asarray(gt_t[0])]
    stamps = [0.0]
    t_start = time.perf_counter()
    for i in range(1, cfg.n_frames):
        det = FrameDetections(
            obs.planes_c[i], obs.centroid_c[i], obs.endpoints_c[i],
            obs.valid[i],
        )
        state, (R, t) = step(state, det, Rrel[i - 1], trel[i - 1])
        est.append(np.asarray(t))
        stamps.append(i / 30.0)
        logger.log(
            frame=i,
            n_kf=int(state.n_kf),
            n_landmarks=int(np.asarray(state.window.lm_valid).sum()),
        )
    wall = time.perf_counter() - t_start

    ate, _, _ = ate_rmse(np.asarray(gt_t), np.stack(est))
    summary = {
        "config": cfg.name,
        "frames": cfg.n_frames,
        "ate_rmse_m": round(float(ate), 4),
        "n_keyframes": int(state.n_kf),
        "n_landmarks": int(np.asarray(state.window.lm_valid).sum()),
        "frames_per_s": round((cfg.n_frames - 1) / wall, 2),
    }
    print(json.dumps(summary, indent=2))
    if cfg.out_trajectory:
        from .io import tum

        R_dummy = np.broadcast_to(np.eye(3), (len(est), 3, 3))
        tum.write_trajectory(cfg.out_trajectory, stamps, R_dummy,
                             np.stack(est))
    logger.close()
    return 0


def _run_distributed(cfg, args):
    """BASELINE configs 4-5: the production distributed runner
    (pipeline/sharded.py) over a rendered synthetic corridor stream —
    DP pop-up across the mesh + factor-sharded psum-assembled Schur BA
    per keyframe, one jit per block.  Uses every local device (or
    ``cfg.n_devices``); on a multi-host deployment the caller brings
    the mesh up with parallel.multihost first and the same path runs
    over the global mesh."""
    import jax
    import numpy as np

    from .evaluation import ate_rmse
    from .geometry import se3
    from .geometry.camera import Intrinsics
    from .io import synthetic
    from .parallel import make_mesh
    from .pipeline import run_sequence_sharded, slam_init
    from .utils import MetricsLogger

    scfg = cfg.slam
    n_dev = cfg.n_devices or len(jax.devices())
    mesh = make_mesh(n_dev)
    # Block = frames per dispatch; every device pops up block/n frames.
    block = max(n_dev, (16 // n_dev) * n_dev)

    H, W = cfg.height, cfg.width
    K = Intrinsics.create(0.5 * W, 0.5 * W, 0.5 * W, 0.5 * H)
    world = synthetic.corridor_world()
    n = (cfg.n_frames // block) * block + 1
    gt_R, gt_t = synthetic.corridor_trajectory(n)

    render = jax.jit(
        lambda R_, t_: synthetic.render_frame(K, R_, t_, world, H, W)[0]
    )
    masks = np.zeros((n - 1, H, W), bool)
    for i in range(n - 1):
        masks[i] = np.asarray(render(gt_R[i + 1], gt_t[i + 1])) == \
            synthetic.LABEL_GROUND
    key = jax.random.PRNGKey(cfg.seed)
    oR, ot = synthetic.noisy_odometry(
        gt_R, gt_t, key, sigma_t=cfg.odom_sigma_t, sigma_r=cfg.odom_sigma_r
    )

    state = slam_init(scfg, gt_R[0], gt_t[0])
    logger = MetricsLogger(cfg.metrics_path or None)
    t_start = time.perf_counter()
    state, (R_est, t_est) = run_sequence_sharded(
        state, masks, oR, ot, K, cfg.popup, scfg, mesh, block=block,
    )
    jax.block_until_ready(t_est)
    wall = time.perf_counter() - t_start

    t_np = np.asarray(t_est)
    ate, _, _ = ate_rmse(np.asarray(gt_t[1:len(t_np) + 1]), t_np)
    summary = {
        "config": cfg.name,
        "mode": "distributed",
        "n_devices": n_dev,
        "block": block,
        "frames": int(t_np.shape[0]),
        "ate_rmse_m": round(float(ate), 4),
        "n_keyframes": int(state.n_kf),
        "n_landmarks": int(np.asarray(state.window.lm_valid).sum()),
        "frames_per_s": round(t_np.shape[0] / wall, 2),
        "finite": bool(np.isfinite(t_np).all()),
    }
    print(json.dumps(summary, indent=2))
    if cfg.out_trajectory:
        from .io import tum

        tum.write_trajectory(
            cfg.out_trajectory,
            [i / 30.0 for i in range(t_np.shape[0])],
            np.asarray(R_est), t_np,
        )
    logger.close()
    return 0 if summary["finite"] else 1


def _run_tum(cfg, args):
    import os

    if not os.path.isdir(cfg.sequence_dir):
        print(
            f"TUM sequence not found at '{cfg.sequence_dir}'.\n"
            "Download rgbd_dataset_freiburg3_structure_notexture_far "
            "from the TUM RGB-D benchmark and point --sequence-dir at it.",
            file=sys.stderr,
        )
        return 2
    from .runners.tum_runner import run_tum_sequence

    summary = run_tum_sequence(
        cfg, odometry=args.odometry, smooth=not args.no_smooth
    )
    print(json.dumps(summary, indent=2))
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(prog="pop_up_slam_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    runp = sub.add_parser("run", help="run a preset end-to-end")
    runp.add_argument("--config", default="corridor",
                      help="preset: popup_demo|corridor|tum_fr3|"
                           "single_host|multi_host")
    runp.add_argument("--frames", type=int, default=0)
    runp.add_argument("--height", type=int, default=0)
    runp.add_argument("--width", type=int, default=0)
    runp.add_argument("--devices", type=int, default=0,
                      help="mesh size for distributed mode (0 = all)")
    runp.add_argument("--sequence-dir", default="")
    runp.add_argument("--out-trajectory", default="")
    runp.add_argument("--metrics", default="")
    runp.add_argument("--profile-dir", default="")
    runp.add_argument("--checkpoint", default="",
                      help="snapshot solver state to this .npz")
    runp.add_argument("--checkpoint-every", type=int, default=0,
                      help="also snapshot every N frames (0 = end only)")
    runp.add_argument("--resume", default="",
                      help="restore a --checkpoint snapshot and continue")
    runp.add_argument("--odometry", default="gt_perturb",
                      choices=["gt_perturb", "constant_velocity",
                               "plane_vo"],
                      help="pose-prior source for TUM runs "
                           "(plane_vo = fully monocular)")
    runp.add_argument("--no-smooth", action="store_true",
                      help="skip the final full-trajectory smoothing "
                           "(publish the filtering path)")
    args = parser.parse_args(argv)

    from .config import get_config

    overrides = {}
    if args.frames:
        overrides["n_frames"] = args.frames
    if args.height:
        overrides["height"] = args.height
    if args.width:
        overrides["width"] = args.width
    if args.devices:
        overrides["n_devices"] = args.devices
    if args.sequence_dir:
        overrides["sequence_dir"] = args.sequence_dir
    if args.out_trajectory:
        overrides["out_trajectory"] = args.out_trajectory
    if args.metrics:
        overrides["metrics_path"] = args.metrics
    if args.profile_dir:
        overrides["profile_dir"] = args.profile_dir
    if args.checkpoint:
        overrides["checkpoint_path"] = args.checkpoint
    if args.checkpoint_every:
        overrides["checkpoint_every"] = args.checkpoint_every
    if args.resume:
        overrides["resume"] = args.resume
    cfg = get_config(args.config, **overrides)

    if cfg.profile_dir:
        import jax

        jax.profiler.start_trace(cfg.profile_dir)
    try:
        if cfg.mode == "popup_demo":
            return _run_popup_demo(cfg, args)
        if cfg.mode == "synthetic":
            return _run_synthetic(cfg, args)
        if cfg.mode == "distributed":
            return _run_distributed(cfg, args)
        if cfg.mode == "tum":
            return _run_tum(cfg, args)
        raise SystemExit(f"unknown mode {cfg.mode}")
    finally:
        if cfg.profile_dir:
            import jax

            jax.profiler.stop_trace()


if __name__ == "__main__":
    sys.exit(main())
