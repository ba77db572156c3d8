"""Full-trajectory smoothing: batch GN over the whole keyframe history.

The reference's iSAM re-optimizes the *entire* trajectory at every
update, so its published path reflects all later corrections — a
landmark re-observed after drift fixes the whole history (SURVEY.md
§2.1 "Vendored iSAM", §3.3; reference mount empty, algorithm per the
iSAM IJRR'12 paper).  The TPU engine's sliding window deliberately
bounds the active problem (SURVEY.md §7), which makes the *incremental*
trajectory filtering-only: poses leaving the window freeze at whatever
the last in-window solve said (round-4 VERDICT "What's missing" #1).

This module closes that parity gap:

- :class:`TrajectoryRecorder` rides along any frame loop and keeps the
  keyframe history on the host: per-keyframe pose estimates (refreshed
  with the latest in-window BA result every keyframe), the keyframe
  odometry chain, each keyframe's plane measurements + landmark
  assignments, and each frame's (keyframe, relative-pose) anchor.
- :func:`smooth_trajectory` rebuilds the full pose-graph — all N
  keyframe poses + the persistent landmark map — as one fixed-shape
  Window/Factors problem and re-solves it with batch Gauss-Newton:
  single-device via ``gn_solve``, or keyframe-block-sharded across a
  mesh via ``parallel.keyframe_blocks.keyframe_sharded_gn_solve`` (the
  SP analog doing real work at trajectory scale, SURVEY.md §2.2).
- :func:`emit_frames` republishes every frame by composing its anchor
  keyframe's *smoothed* pose with the recorded relative transform.

Scale note: the batch problem materializes a dense (N, N, 6, 6) Hpp,
so smoothing is intended for N up to ~512 keyframes (37 MB reduced
Cholesky at 512) — TUM-sequence scale.  Longer missions should smooth
in overlapping segments (not yet needed by any supported dataset).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..factors.graph import (
    Factors,
    OdomFactors,
    PlaneFactors,
    PosePriors,
    Window,
)
from ..solver import gn_solve
from .slam import SlamConfig, _odom_sqrt_info, _plane_sqrt_info


class TrajectoryRecorder:
    """Host-side keyframe-history log for post-hoc smoothing.

    Call :meth:`record` once per processed frame with the post-step
    ``SlamState``; device pulls happen only on keyframes (plus one
    small ``acc`` pull per frame for the frame anchor).
    """

    def __init__(self, cfg: SlamConfig, R0, t0):
        self.W = cfg.window_size
        self.D = cfg.max_det
        self.kf_R = [np.asarray(R0, np.float32)]
        self.kf_t = [np.asarray(t0, np.float32)]
        self.odom_R: list = []      # measurement kf k-1 -> k
        self.odom_t: list = []
        self.pf_pi = [np.zeros((self.D, 4), np.float32)]
        self.pf_lm = [np.zeros((self.D,), np.int32)]
        self.pf_valid = [np.zeros((self.D,), bool)]
        # creation stamp of each factor's landmark at record time: a
        # slot recycled later (eviction/merge) carries a different
        # stamp, and the stale factor is dropped at smoothing time
        self.pf_stamp = [np.full((self.D,), -2, np.int32)]
        self.n_kf = 1
        self.frame_kf: list = []    # per frame: anchor kf index
        self.frame_relR: list = []  # pose = kf_pose o rel
        self.frame_relt: list = []

    def record(self, state) -> None:
        n_kf_new = int(state.n_kf)
        if n_kf_new > self.n_kf:
            # a keyframe was just inserted: pull its measurements and
            # refresh every in-window keyframe's pose estimate
            slot = min(n_kf_new - 1, self.W - 1)
            oslot = max(slot - 1, 0)
            self.odom_R.append(np.asarray(state.odom_R[oslot], np.float32))
            self.odom_t.append(np.asarray(state.odom_t[oslot], np.float32))
            self.pf_pi.append(np.asarray(state.pf_pi[slot], np.float32))
            lm = np.asarray(state.pf_lm[slot], np.int32)
            self.pf_lm.append(lm)
            self.pf_valid.append(np.asarray(state.pf_valid[slot], bool))
            created = np.asarray(state.store.created_kf, np.int32)
            self.pf_stamp.append(
                created[np.clip(lm, 0, created.shape[0] - 1)]
            )
            self.kf_R.append(np.asarray(state.window.R[slot], np.float32))
            self.kf_t.append(np.asarray(state.window.t[slot], np.float32))
            self.n_kf = n_kf_new
            self._refresh(state)
            rel_R, rel_t = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        else:
            rel_R = np.asarray(state.acc_R, np.float32)
            rel_t = np.asarray(state.acc_t, np.float32)
        self.frame_kf.append(self.n_kf - 1)
        self.frame_relR.append(rel_R)
        self.frame_relt.append(rel_t)

    def _refresh(self, state) -> None:
        """Overwrite the last min(n_kf, W) keyframe estimates with the
        current window's (post-BA) poses."""
        win_R = np.asarray(state.window.R, np.float32)
        win_t = np.asarray(state.window.t, np.float32)
        nw = min(self.n_kf, self.W)
        base = self.n_kf - nw
        for s in range(nw):
            self.kf_R[base + s] = win_R[s]
            self.kf_t[base + s] = win_t[s]

    # --- checkpoint support (fixed-leaf-count pytree) ---

    def snapshot(self) -> dict:
        return {
            "kf_R": np.stack(self.kf_R),
            "kf_t": np.stack(self.kf_t),
            "odom_R": (np.stack(self.odom_R) if self.odom_R
                       else np.zeros((0, 3, 3), np.float32)),
            "odom_t": (np.stack(self.odom_t) if self.odom_t
                       else np.zeros((0, 3), np.float32)),
            "pf_pi": np.stack(self.pf_pi),
            "pf_lm": np.stack(self.pf_lm),
            "pf_valid": np.stack(self.pf_valid),
            "pf_stamp": np.stack(self.pf_stamp),
            "frame_kf": np.asarray(self.frame_kf, np.int32),
            "frame_relR": (np.stack(self.frame_relR) if self.frame_relR
                           else np.zeros((0, 3, 3), np.float32)),
            "frame_relt": (np.stack(self.frame_relt) if self.frame_relt
                           else np.zeros((0, 3), np.float32)),
        }

    @classmethod
    def restore(cls, cfg: SlamConfig, snap: dict) -> "TrajectoryRecorder":
        rec = cls(cfg, np.asarray(snap["kf_R"])[0], np.asarray(snap["kf_t"])[0])
        rec.kf_R = list(np.asarray(snap["kf_R"], np.float32))
        rec.kf_t = list(np.asarray(snap["kf_t"], np.float32))
        rec.odom_R = list(np.asarray(snap["odom_R"], np.float32))
        rec.odom_t = list(np.asarray(snap["odom_t"], np.float32))
        rec.pf_pi = list(np.asarray(snap["pf_pi"], np.float32))
        rec.pf_lm = list(np.asarray(snap["pf_lm"], np.int32))
        rec.pf_valid = list(np.asarray(snap["pf_valid"], bool))
        rec.pf_stamp = list(np.asarray(snap["pf_stamp"], np.int32))
        rec.n_kf = len(rec.kf_R)
        rec.frame_kf = list(np.asarray(snap["frame_kf"], np.int32))
        rec.frame_relR = list(np.asarray(snap["frame_relR"], np.float32))
        rec.frame_relt = list(np.asarray(snap["frame_relt"], np.float32))
        return rec


def build_smoothing_problem(
    rec: TrajectoryRecorder,
    state,
    cfg: SlamConfig,
    pad_multiple: int = 8,
    anchor_info: float | None = None,
):
    """Assemble the full-trajectory Window/Factors from a recorder.

    Poses are initialized at the recorder's (filtering) estimates;
    landmarks at the final map estimates.  Gauge: a strong prior on
    keyframe 0 at its recorded pose (matching the engine's
    marginalize-mode anchor convention).  Returns (window, factors, N).
    """
    N = rec.n_kf
    D = rec.D
    NP = -(-N // pad_multiple) * pad_multiple
    L = state.window.max_landmarks
    f32 = jnp.float32

    R = np.broadcast_to(np.eye(3, dtype=np.float32), (NP, 3, 3)).copy()
    t = np.zeros((NP, 3), np.float32)
    R[:N] = np.stack(rec.kf_R)
    t[:N] = np.stack(rec.kf_t)
    window = Window(
        R=jnp.asarray(R), t=jnp.asarray(t),
        planes=state.window.planes.astype(f32),
        pose_valid=jnp.arange(NP) < N,
        pose_fixed=jnp.zeros((NP,), bool),
        lm_valid=state.window.lm_valid,
    )

    O = max(N - 1, 1)
    oR = np.broadcast_to(np.eye(3, dtype=np.float32), (O, 3, 3)).copy()
    ot = np.zeros((O, 3), np.float32)
    if rec.odom_R:
        oR[: N - 1] = np.stack(rec.odom_R)
        ot[: N - 1] = np.stack(rec.odom_t)
    odom = OdomFactors(
        i=jnp.arange(O, dtype=jnp.int32),
        j=jnp.arange(1, O + 1, dtype=jnp.int32),
        R_meas=jnp.asarray(oR), t_meas=jnp.asarray(ot),
        sqrt_info=jnp.broadcast_to(_odom_sqrt_info(cfg, f32), (O, 6, 6)),
        valid=jnp.arange(O) < N - 1,
    )

    F = N * D
    lm_idx = np.stack(rec.pf_lm).reshape(F)
    valid = np.stack(rec.pf_valid).reshape(F)
    # drop factors whose landmark slot was recycled (evicted/merged)
    # after the observation: the slot's creation stamp changed
    created_now = np.asarray(state.store.created_kf, np.int32)
    stamp = np.stack(rec.pf_stamp).reshape(F)
    fresh = created_now[np.clip(lm_idx, 0, L - 1)] == stamp
    pf = PlaneFactors(
        pose_idx=jnp.repeat(jnp.arange(N, dtype=jnp.int32), D),
        lm_idx=jnp.asarray(lm_idx, jnp.int32),
        pi_meas=jnp.asarray(np.stack(rec.pf_pi).reshape(F, 4)),
        sqrt_info=jnp.broadcast_to(_plane_sqrt_info(cfg, f32), (F, 3, 3)),
        valid=jnp.asarray(valid & fresh),
    )

    info = cfg.init_prior_info if anchor_info is None else anchor_info
    priors = PosePriors(
        idx=jnp.zeros((1,), jnp.int32),
        R=jnp.asarray(rec.kf_R[0])[None],
        t=jnp.asarray(rec.kf_t[0])[None],
        sqrt_info=(info * jnp.eye(6, dtype=f32))[None],
        valid=jnp.ones((1,), bool),
    )
    return window, Factors(odom=odom, planes=pf, priors=priors), N


def smooth_trajectory(
    rec: TrajectoryRecorder,
    state,
    cfg: SlamConfig,
    iters: int = 8,
    damping: float = 1e-5,
    mesh=None,
    axis: str = "d",
):
    """Batch-GN smooth the whole keyframe trajectory.

    Returns (kf_R (N,3,3), kf_t (N,3), stats).  With ``mesh`` the
    linearization runs keyframe-block-sharded with ring halo exchange
    (parallel/keyframe_blocks.py); otherwise single-device gn_solve.
    """
    pad = mesh.devices.size if mesh is not None else 8
    window, factors, N = build_smoothing_problem(
        rec, state, cfg, pad_multiple=pad
    )
    if mesh is not None:
        from ..parallel.keyframe_blocks import keyframe_sharded_gn_solve

        w_opt, stats = keyframe_sharded_gn_solve(
            window, factors, mesh, iters=iters, damping=damping, axis=axis
        )
    else:
        w_opt, stats = gn_solve(
            window, factors, iters=iters, damping=damping,
            analytic_planes=cfg.analytic_planes, robust=cfg.robust,
        )
    return np.asarray(w_opt.R[:N]), np.asarray(w_opt.t[:N]), stats


def emit_frames(rec: TrajectoryRecorder, kf_R, kf_t):
    """Re-publish the per-frame trajectory off the smoothed keyframes:
    frame pose = smoothed anchor keyframe pose o recorded relative."""
    Rs, ts = [], []
    for k, rR, rt in zip(rec.frame_kf, rec.frame_relR, rec.frame_relt):
        Rk, tk = kf_R[k], kf_t[k]
        Rs.append(Rk @ rR)
        ts.append(Rk @ rt + tk)
    return np.stack(Rs), np.stack(ts)
