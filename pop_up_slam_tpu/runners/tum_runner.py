"""TUM sequence runner: full monocular plane SLAM on real data
(BASELINE config 3; reference: the plane_slam ROS node driven by a TUM
rosbag, SURVEY.md §3.2).

Odometry source: TUM provides no wheel odometry, and the reference
leans on external odometry / LSD-SLAM for pose priors (paper
arXiv:1703.07334 §V; SURVEY.md §7 hard part #3).  Supported modes:

- ``gt_perturb`` (default): relative poses from ground truth with
  configurable noise — the controlled-baseline mode documented in
  SURVEY.md; ATE then measures how much the plane map corrects the
  injected drift.
- ``constant_velocity``: dead-reckoning prior from the previous
  relative estimate (no external signal).
- ``plane_vo``: fully monocular — relative motion from frame-to-frame
  plane alignment (odometry/plane_vo.py) seeded by a constant-velocity
  prior; no ground truth is consumed anywhere.

Segmentation source: precomputed masks in ``seg/`` when present,
otherwise the classical floor-color model.
"""

from __future__ import annotations

import time

import numpy as np


def _snapshot(carry_state, est_R, est_t, prev_rel, rec):
    """Checkpoint pytree: solver carry + trajectory so far + the
    constant-velocity cache + the smoothing recorder (SURVEY.md §5
    "Checkpoint / resume")."""
    return {
        "state": carry_state,
        "est_R": np.stack(est_R).astype(np.float32),
        "est_t": np.stack(est_t).astype(np.float32),
        "prev_R": np.asarray(prev_rel[0], np.float32),
        "prev_t": np.asarray(prev_rel[1], np.float32),
        "recorder": rec.snapshot(),
    }


def run_tum_sequence(cfg, odometry: str = "gt_perturb",
                     odom_sigma_t: float = 0.01,
                     odom_sigma_r: float = 0.003,
                     max_frames: int = 0,
                     smooth: bool = True):
    import jax
    import jax.numpy as jnp

    from ..evaluation import ate_rmse
    from ..geometry import se3
    from ..geometry.camera import Intrinsics
    from ..io import tum
    from ..models import classical_ground_mask
    from ..pipeline import (
        detections_from_popup,
        current_pose,
        slam_init,
        slam_step,
    )
    from ..popup import popup as pp
    from ..utils import MetricsLogger, StageTimer

    seq = tum.load_sequence(cfg.sequence_dir)
    K = Intrinsics.create(cfg.fx, cfg.fy, cfg.cx, cfg.cy)
    scfg = cfg.slam

    pairs, gt_R, gt_t = tum.gt_poses_at(seq, seq.rgb_stamps)
    frame_ids = [i for i, _ in pairs]
    if max_frames:
        frame_ids = frame_ids[:max_frames]
        gt_R, gt_t = gt_R[:len(frame_ids)], gt_t[:len(frame_ids)]
    n = len(frame_ids)
    if n < 2:
        raise RuntimeError("no gt-associated frames in sequence")

    rng = np.random.default_rng(cfg.seed)

    state = slam_init(scfg, jnp.asarray(gt_R[0], jnp.float32),
                      jnp.asarray(gt_t[0], jnp.float32))
    from ..pipeline.smoothing import TrajectoryRecorder

    rec = TrajectoryRecorder(scfg, gt_R[0], gt_t[0])

    @jax.jit
    def step(state, mask, oR, ot):
        pred_R, pred_t = current_pose(state)
        res = pp.pop_up(K, mask, pred_R, pred_t, cfg.popup)
        det = detections_from_popup(res, pred_R, pred_t, scfg.max_det)
        state, (R, t) = slam_step(state, det, oR, ot, scfg)
        return state, (R, t)

    if odometry == "plane_vo":
        from ..pipeline import make_vo_frame_fn, vo_init

        vo_frame = jax.jit(make_vo_frame_fn(K, cfg.popup, scfg))
        vo_state = vo_init(state, scfg.max_det)

    logger = MetricsLogger(cfg.metrics_path or None)
    timer = StageTimer()
    est_R = [gt_R[0]]
    est_t = [gt_t[0]]
    prev_rel = (np.eye(3), np.zeros(3))

    def carry():
        return vo_state if odometry == "plane_vo" else state

    start_k = 1
    ckpt = cfg.checkpoint_path or None
    if cfg.resume:
        from ..utils.checkpoint import load_state

        snap, meta = load_state(
            cfg.resume, _snapshot(carry(), est_R, est_t, prev_rel, rec)
        )
        if meta.get("odometry") != odometry:
            raise ValueError(
                f"snapshot was taken in odometry mode "
                f"{meta.get('odometry')!r}, resuming in {odometry!r}"
            )
        start_k = int(meta["next_k"])
        est_R = list(np.asarray(snap["est_R"]))
        est_t = list(np.asarray(snap["est_t"]))
        prev_rel = (np.asarray(snap["prev_R"]), np.asarray(snap["prev_t"]))
        if odometry == "plane_vo":
            vo_state = snap["state"]
            state = vo_state.slam
        else:
            state = snap["state"]
        rec = TrajectoryRecorder.restore(scfg, snap["recorder"])
        # keep the gt-perturbation noise stream aligned with an
        # uninterrupted run: replay the draws of the skipped frames
        for _ in range(start_k - 1):
            rng.normal(0, odom_sigma_t, 3)
            rng.normal(0, odom_sigma_r, 3)

    def maybe_checkpoint(k):
        if ckpt and cfg.checkpoint_every and k % cfg.checkpoint_every == 0:
            from ..utils.checkpoint import save_state

            save_state(ckpt,
                       _snapshot(carry(), est_R, est_t, prev_rel, rec),
                       meta={"next_k": k + 1, "odometry": odometry})

    # One jitted exp for the whole run — constructing jax.jit(...) per
    # frame would retrace every frame (round-3 VERDICT "weak" item 4).
    se3_exp_jit = jax.jit(se3.se3_exp)

    t_start = time.perf_counter()
    for k in range(start_k, n):
        i = frame_ids[k]
        timer.start("io")
        rgb = tum.load_image(seq, seq.rgb_files[i])
        if seq.seg_files and seq.seg_files[i]:
            mask = tum.load_image(seq, seq.seg_files[i]) > 127
            if mask.ndim == 3:
                mask = mask[..., 0]
        else:
            mask = np.asarray(
                classical_ground_mask(jnp.asarray(rgb))
            )
        timer.stop()

        if odometry == "plane_vo":
            timer.start("slam")
            vo_state, (R, t) = vo_frame(vo_state, jnp.asarray(mask))
            state = vo_state.slam
            jax.block_until_ready(t)
            timer.stop()
            R_np, t_np = np.asarray(R), np.asarray(t)
            est_R.append(R_np)
            est_t.append(t_np)
            rec.record(state)
            logger.log(frame=int(i), n_kf=int(state.n_kf))
            maybe_checkpoint(k)
            continue

        if odometry == "gt_perturb":
            Ra, ta = gt_R[k - 1], gt_t[k - 1]
            Rb, tb = gt_R[k], gt_t[k]
            Rrel = Ra.T @ Rb
            trel = Ra.T @ (tb - ta)
            xi = np.concatenate([
                rng.normal(0, odom_sigma_t, 3),
                rng.normal(0, odom_sigma_r, 3),
            ])
            dR, dt = jax.tree.map(
                np.asarray, se3_exp_jit(jnp.asarray(xi, jnp.float32))
            )
            Rrel, trel = Rrel @ dR, Rrel @ dt + trel
        elif odometry == "constant_velocity":
            Rrel, trel = prev_rel
        else:
            raise ValueError(odometry)

        timer.start("slam")
        state, (R, t) = step(
            state, jnp.asarray(mask),
            jnp.asarray(Rrel, jnp.float32), jnp.asarray(trel, jnp.float32),
        )
        jax.block_until_ready(t)
        timer.stop()

        R_np, t_np = np.asarray(R), np.asarray(t)
        prev_rel = (est_R[-1].T @ R_np, est_R[-1].T @ (t_np - est_t[-1]))
        est_R.append(R_np)
        est_t.append(t_np)
        rec.record(state)
        logger.log(frame=int(i), n_kf=int(state.n_kf))
        maybe_checkpoint(k)
    wall = time.perf_counter() - t_start

    if ckpt:
        from ..utils.checkpoint import save_state

        save_state(ckpt, _snapshot(carry(), est_R, est_t, prev_rel, rec),
                   meta={"next_k": n, "odometry": odometry})

    # Marginal covariance of the current keyframe pose (iSAM covariance
    # recovery parity — SURVEY.md §2.1; solver/covariance.py)
    from ..factors.graph import linearize as _linearize
    from ..pipeline.slam import _build_factors
    from ..solver import recover_marginals

    lin = _linearize(state.window, _build_factors(state, scfg))
    marg = recover_marginals(lin, state.window)
    cur = int(np.clip(np.asarray(state.n_kf) - 1, 0, scfg.window_size - 1))
    pose_cov = np.asarray(marg.pose_cov[cur])
    trans_std = float(np.sqrt(max(float(np.trace(pose_cov[:3, :3])), 0.0)))
    rot_std = float(np.sqrt(max(float(np.trace(pose_cov[3:, 3:])), 0.0)))

    ate_filter, _, _ = ate_rmse(gt_t[:n], np.stack(est_t))

    # Full-trajectory smoothing: batch GN over the whole keyframe
    # history (pipeline/smoothing.py) — the published path then
    # reflects all later corrections, matching the reference iSAM's
    # whole-trajectory re-optimization (SURVEY.md §2.1/§3.3).  The
    # incremental (filtering) ATE is reported alongside.
    out_R, out_t = np.stack(est_R), np.stack(est_t)
    ate = ate_filter
    if smooth and rec.n_kf >= 2:
        from ..pipeline.smoothing import emit_frames, smooth_trajectory

        timer.start("smooth")
        kf_R, kf_t, _ = smooth_trajectory(rec, state, scfg, iters=8,
                                          damping=scfg.damping)
        fR, ft = emit_frames(rec, kf_R, kf_t)
        out_R = np.concatenate([kf_R[:1], fR], axis=0)
        out_t = np.concatenate([kf_t[:1], ft], axis=0)
        timer.stop()
        ate, _, _ = ate_rmse(gt_t[:n], out_t)

    if cfg.out_trajectory:
        stamps = [float(seq.rgb_stamps[i]) for i in frame_ids]
        tum.write_trajectory(cfg.out_trajectory, stamps, out_R, out_t)
    logger.close()
    return {
        "config": cfg.name,
        "sequence": cfg.sequence_dir,
        "frames": n,
        "odometry": odometry,
        "smoothed": bool(smooth and rec.n_kf >= 2),
        "ate_rmse_m": round(float(ate), 4),
        "ate_filter_rmse_m": round(float(ate_filter), 4),
        "n_keyframes": int(state.n_kf),
        "lm_overflow": int(state.n_overflow),
        "frames_per_s": round((n - start_k) / max(wall, 1e-9), 2),
        "pose_trans_std_m": round(trans_std, 5),
        "pose_rot_std_rad": round(rot_std, 5),
        "stage_timing": timer.summary(),
    }
