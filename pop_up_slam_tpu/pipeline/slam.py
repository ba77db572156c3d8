"""The per-frame plane-SLAM engine: the TPU-native analog of the
reference's main ROS node loop (SURVEY.md §3.2; paper arXiv:1703.07334
§IV).

One jit-compiled :func:`slam_step` implements the whole per-frame
update on fixed-shape state:

1. accumulate odometry; predict the current pose,
2. transform the frame's plane detections into the world frame,
3. masked data association against the landmark store (assoc/),
4. insert unmatched detections as new landmarks (mapping/),
5. keyframe decision (translation/rotation thresholds) — on a
   keyframe: slide the window, record the odometry factor and the
   frame's plane factors, and re-solve the window with Gauss-Newton +
   Schur elimination (solver/),
6. update landmark extents / observation counts.

Where the reference grows an iSAM graph incrementally and calls
``slam.update()`` (incremental QR), this engine re-solves a fixed-lag
sliding window each keyframe — the whole step is one XLA program with
no data-dependent shapes; the keyframe branch runs under ``lax.cond``
so non-keyframes cost almost nothing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..assoc import AssocConfig, associate_detections
from ..factors.graph import (
    Factors,
    OdomFactors,
    PlaneFactors,
    PosePriors,
    Window,
)
from ..factors.robust import RobustConfig
from ..geometry import plane as plane_mod
from ..geometry import se3
from ..mapping import (
    LandmarkStore,
    evict_landmarks,
    insert_landmarks,
    merge_landmarks,
    update_extents,
)
from ..popup.popup import PopupPlanes
from ..solver import dogleg_solve, gn_solve, lm_solve
from ..solver.schur import make_solve_fn


class SlamConfig(NamedTuple):
    window_size: int = 8
    max_landmarks: int = 64
    max_det: int = 9              # wall detections + ground slot
    kf_trans: float = 0.25        # m — keyframe translation threshold
    kf_rot: float = 0.15          # rad — keyframe rotation threshold
    # GN iterations per keyframe re-solve.  The window is warm-started
    # (every pose/landmark was optimized last keyframe), so 2 iterations
    # reach the same ATE as 6 on the noisy corridor (mean err 0.1164 at
    # 2/3/4/6 vs 0.1184 at 1) — mirroring iSAM's sparing relinearization.
    gn_iters: int = 2
    damping: float = 1e-5
    odom_sigma_t: float = 0.03    # m
    odom_sigma_r: float = 0.01    # rad
    plane_sigma_n: float = 0.015  # rad — normal-direction noise
    plane_sigma_d: float = 0.02   # m — plane-distance noise
    min_obs_for_extent: int = 1
    assoc: AssocConfig = AssocConfig()
    # --- solver selection (iSAM parity: GN / LM / Powell's dog-leg,
    # SURVEY.md §2.1 "batch Gauss-Newton/LM/Powell's dog-leg") ---
    solver: str = "gn"            # gn | lm | dogleg
    # Closed-form plane-factor Jacobians (ops/plane_jacobians.py)
    # instead of per-factor jacfwd — identical to machine precision.
    analytic_planes: bool = True
    # Reduced-system solver: "auto" = Pallas Schur-GEMM + fused
    # Cholesky kernels on TPU, pure-jnp elsewhere (solver/schur.py).
    pallas: str = "auto"
    # Whole-GN-iteration fused Pallas kernel (ops/fused_gn.py): the
    # complete linearize -> Schur -> Cholesky -> retract chain for all
    # gn_iters in ONE kernel launch.  "auto" = on TPU when the window
    # shape fits (6W <= 128, 3L <= 256, plane factors <= 128) and the
    # solver is GN; "on" forces the fused path (pure-jnp body off-TPU —
    # used by equivalence tests); "off" keeps the per-op gn_solve.
    # Measured (v5e, W=8/L=64, 2 iters): 216 us/solve fused vs 389 jnp
    # vs 408 Pallas-Schur — 1.8x (scripts/bench_fused.py).
    fused: str = "auto"
    # IRLS robust kernels per factor family (factors/robust.py).
    robust: RobustConfig = RobustConfig()
    # Fold the exiting keyframe's factors into a Gaussian prior on the
    # new oldest pose when the window slides (SURVEY.md §7
    # "Incrementality → windowed re-solve"); False = drop (round-2
    # behavior: gauge-fix the oldest pose, discard its information).
    marginalize: bool = True
    init_prior_info: float = 1e3  # sqrt-info of the anchor pose prior
    marg_info_floor: float = 4.0  # min marginal info (f32 conditioning)
    # --- landmark lifecycle at capacity (round-4 VERDICT missing #2;
    # the reference's iSAM landmark set grows unboundedly) ---
    # Evict the least-observed out-of-window landmarks when a keyframe
    # needs more slots than are free; dropped-detection count is
    # tracked in SlamState.n_overflow.
    lm_evict: bool = True
    # Fold duplicate co-planar landmarks (gates = this fraction of the
    # association gates; extent overlap must be positive).  The merge
    # pass runs every merge_every-th keyframe under lax.cond —
    # duplicates are rare and fold within a few keyframes either way,
    # and the L x L gate matrix is dead weight on the other frames.
    lm_merge: bool = True
    merge_every: int = 4
    merge_gate_scale: float = 0.5
    merge_min_overlap: float = 0.0


class FrameDetections(NamedTuple):
    """Per-frame plane detections in the *camera* frame, fixed capacity D.

    planes_c    : (D, 4) unit planes.
    centroid_c  : (D, 3) representative on-plane point (distance gate).
    endpoints_c : (D, 2, 3) ground-line endpoints (overlap gate/extents).
    valid       : (D,) bool.
    """

    planes_c: jnp.ndarray
    centroid_c: jnp.ndarray
    endpoints_c: jnp.ndarray
    valid: jnp.ndarray


class SlamState(NamedTuple):
    window: Window               # W poses + L plane landmarks (+ masks)
    store: LandmarkStore         # L extents / counts
    pf_pi: jnp.ndarray           # (W, D, 4) plane measurements per slot
    pf_lm: jnp.ndarray           # (W, D) int32 landmark index
    pf_valid: jnp.ndarray        # (W, D) bool
    odom_R: jnp.ndarray          # (W-1, 3, 3) between-kf measurements
    odom_t: jnp.ndarray          # (W-1, 3)
    odom_valid: jnp.ndarray      # (W-1,) bool
    acc_R: jnp.ndarray           # accumulated odometry since last kf
    acc_t: jnp.ndarray
    n_kf: jnp.ndarray            # () int32 — total keyframes so far
    frame: jnp.ndarray           # () int32 — total frames so far
    mprior_R: jnp.ndarray        # (3, 3) Gaussian prior on window slot 0:
    mprior_t: jnp.ndarray        # (3,)   mean pose (anchor at init, the
    mprior_sqrt: jnp.ndarray     # (6, 6) marginal of exited kfs after)
    n_overflow: jnp.ndarray      # () int32 — detections dropped because
                                 # the landmark store stayed full even
                                 # after eviction (observability metric)


def detections_from_popup(
    res: PopupPlanes, R_wc: jnp.ndarray, t_wc: jnp.ndarray, max_det: int
) -> FrameDetections:
    """Pack a pop-up result (walls + the ground plane) into camera-frame
    FrameDetections, using the pose that produced the pop-up to express
    wall endpoints in the camera frame.  The last slot carries the
    ground plane; its centroid is the foot of the camera (closest
    ground point) and its endpoints are degenerate (the overlap gate
    disables itself for horizontal planes)."""
    S = res.planes_c.shape[0]
    assert max_det >= S + 1
    pad = max_det - (S + 1)
    R_cw, t_cw = se3.se3_inverse(R_wc, t_wc)

    ground_c = res.ground_c
    n, d = plane_mod.to_hessian_normal(ground_c)
    foot_c = -d[..., None] * n

    ep_c = se3.se3_apply(R_cw, t_cw, res.endpoints_w)

    planes = jnp.concatenate(
        [res.planes_c, ground_c[None], jnp.zeros((pad, 4), res.planes_c.dtype)]
    )
    centroids = jnp.concatenate(
        [res.centroid_c, foot_c[None], jnp.zeros((pad, 3), res.centroid_c.dtype)]
    )
    eps = jnp.concatenate(
        [ep_c, jnp.stack([foot_c, foot_c])[None], jnp.zeros((pad, 2, 3), ep_c.dtype)]
    )
    valid = jnp.concatenate(
        [res.valid, jnp.ones((1,), bool), jnp.zeros((pad,), bool)]
    )
    return FrameDetections(planes, centroids, eps, valid)


def slam_init(cfg: SlamConfig, R0: jnp.ndarray, t0: jnp.ndarray) -> SlamState:
    """Fresh state anchored at the initial pose.

    With ``cfg.marginalize`` the anchor is a strong Gaussian *prior* on
    slot 0 (so the slot stays free and later receives the marginal of
    exited keyframes); without it, slot 0 is hard gauge-fixed (the
    round-2 fixed-lag behavior)."""
    W, L, D = cfg.window_size, cfg.max_landmarks, cfg.max_det
    w0 = Window.empty(W, L)
    window = w0._replace(
        R=w0.R.at[0].set(R0),
        t=w0.t.at[0].set(t0),
        pose_valid=w0.pose_valid.at[0].set(True),
        pose_fixed=w0.pose_fixed.at[0].set(not cfg.marginalize),
    )
    return SlamState(
        window=window,
        store=LandmarkStore.empty(L),
        pf_pi=jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0, 0.0]), (W, D, 4)
        ),
        pf_lm=jnp.zeros((W, D), jnp.int32),
        pf_valid=jnp.zeros((W, D), bool),
        odom_R=jnp.broadcast_to(jnp.eye(3), (W - 1, 3, 3)),
        odom_t=jnp.zeros((W - 1, 3)),
        odom_valid=jnp.zeros((W - 1,), bool),
        acc_R=jnp.eye(3),
        acc_t=jnp.zeros((3,)),
        n_kf=jnp.asarray(1, jnp.int32),
        frame=jnp.asarray(0, jnp.int32),
        mprior_R=jnp.asarray(R0, jnp.float32),
        mprior_t=jnp.asarray(t0, jnp.float32),
        mprior_sqrt=cfg.init_prior_info * jnp.eye(6),
        n_overflow=jnp.asarray(0, jnp.int32),
    )


def current_pose(state: SlamState):
    """Predicted world-from-camera pose of the *current* frame: the last
    keyframe's optimized pose composed with accumulated odometry."""
    W = state.window.window_size
    slot = jnp.clip(state.n_kf - 1, 0, W - 1)
    R_kf = state.window.R[slot]
    t_kf = state.window.t[slot]
    return se3.se3_compose(R_kf, t_kf, state.acc_R, state.acc_t)


def _odom_sqrt_info(cfg: SlamConfig, dtype) -> jnp.ndarray:
    inv_t = 1.0 / cfg.odom_sigma_t
    inv_r = 1.0 / cfg.odom_sigma_r
    return jnp.diag(jnp.array([inv_t] * 3 + [inv_r] * 3, dtype))


def _plane_sqrt_info(cfg: SlamConfig, dtype) -> jnp.ndarray:
    return jnp.diag(
        jnp.array(
            [1.0 / cfg.plane_sigma_n, 1.0 / cfg.plane_sigma_n,
             1.0 / cfg.plane_sigma_d],
            dtype,
        )
    )


def _prior_factors(state: SlamState, cfg: SlamConfig) -> PosePriors:
    """The slot-0 Gaussian prior: anchor at init, then the marginal of
    every keyframe that has exited the window (cfg.marginalize)."""
    return PosePriors(
        idx=jnp.zeros((1,), jnp.int32),
        R=state.mprior_R[None],
        t=state.mprior_t[None],
        sqrt_info=state.mprior_sqrt[None],
        valid=jnp.full((1,), cfg.marginalize),
    )


def _build_factors(state: SlamState, cfg: SlamConfig) -> Factors:
    W, D = state.pf_valid.shape
    dtype = state.window.t.dtype

    odom = OdomFactors(
        i=jnp.arange(W - 1, dtype=jnp.int32),
        j=jnp.arange(1, W, dtype=jnp.int32),
        R_meas=state.odom_R,
        t_meas=state.odom_t,
        sqrt_info=jnp.broadcast_to(_odom_sqrt_info(cfg, dtype), (W - 1, 6, 6)),
        valid=state.odom_valid,
    )
    planes = PlaneFactors(
        pose_idx=jnp.repeat(jnp.arange(W, dtype=jnp.int32), D),
        lm_idx=state.pf_lm.reshape(-1),
        pi_meas=state.pf_pi.reshape(-1, 4),
        sqrt_info=jnp.broadcast_to(
            _plane_sqrt_info(cfg, dtype), (W * D, 3, 3)
        ),
        valid=state.pf_valid.reshape(-1),
    )
    return Factors(odom=odom, planes=planes,
                   priors=_prior_factors(state, cfg))


def _marginalize_oldest(state: SlamState, cfg: SlamConfig):
    """Schur-eliminate the exiting keyframe (window slot 0) into a 6-DOF
    Gaussian prior on slot 1 — the pose that becomes the new oldest
    after the roll (SURVEY.md §7 design principle 2; the reference's
    iSAM instead keeps the whole trajectory, §3.3).

    What is folded is the **pose chain only**: the current slot-0 prior
    and the exiting odometry factor 0->1, linearized at the current
    estimate and with p0 eliminated in closed form

        Hm = H11 - H10 H00^-1 H01 ,

    giving the prior information ``chol(Hm + floor I)^T`` at mean = the
    current BA estimate of p1.  Two deliberate, empirically-driven
    choices (see tests/test_marginalization.py):

    - Slot 0's *plane* observations are NOT folded.  Folding them with
      landmarks held fixed converts relative pose-landmark information
      into absolute pose information at stale landmark estimates — the
      classic fixed-linearization inconsistency — and measurably
      *degrades* ATE (the landmarks themselves remain in the map and
      keep carrying that information forward).
    - The prior mean is the current estimate, not the subset-gradient
      Newton shift -Hm^-1 bm: at a BA optimum the pose-chain subset's
      gradient is balanced by the (unfolded) plane factors, so shifting
      by the subset gradient alone injects a systematic bias.  For a
      pure odometry chain both choices are exact (b = 0 at the MAP).

    ``Hm`` is floored (+``marg_info_floor`` I) so the reduced camera
    system stays safely positive-definite in float32 — the weakest
    direction of a long marginal chain otherwise sinks to the Schur
    formation roundoff (~|S| * 2^-23) and Cholesky can fail.

    Robust kernels are intentionally NOT applied here: the folded chain
    is at (or near) its window MAP where IRLS weights are ~1, and an
    inlier odometry chain is exactly the case robust kernels leave
    untouched.
    """
    window = state.window
    dtype = window.t.dtype

    # Direct two-factor linearization (the slot-0 prior + the exiting
    # odometry factor 0->1) instead of the generic windowed `linearize`:
    # that would allocate and scatter the full (W, W, 6, 6) + plane
    # machinery to touch exactly three 6x6 blocks, and measurably drags
    # the per-keyframe step (~18% of frame time on a v5e chip).
    # Jacobians are the closed SE(3) forms (geometry/se3.py inverse
    # right Jacobian + adjoint; see factors/graph._odom_terms_analytic)
    # — the unbatched jacfwd chains used before cost ~100 us/frame of
    # pure tiny-op sequencing on a v5e.
    R0, t0 = window.R[0], window.t[0]
    R1, t1 = window.R[1], window.t[1]
    A_o = _odom_sqrt_info(cfg, dtype)

    # Exact closed-form Jr^-1 (not the first-order approximation): the
    # residual here is usually ~1e-2 (just-re-solved window) where the
    # approximation's O(|r|^2) error is negligible, but a rejected
    # solve (sanitize_step zeroing) or a plane-VO prior fallback can
    # leave a large residual, and the exact form costs only two extra
    # 6x6 products per keyframe (ADVICE r4).
    R_rel, t_rel = se3.se3_between(R0, t0, R1, t1)
    R_err, t_err = se3.se3_between(state.odom_R[0], state.odom_t[0],
                                   R_rel, t_rel)
    AJ = A_o @ se3.se3_right_jacobian_inv(
        se3.se3_log(R_err, t_err)
    )
    R_10, t_10 = se3.se3_between(R1, t1, R0, t0)
    o_valid = state.odom_valid[0]
    J0 = jnp.where(o_valid, -(AJ @ se3.se3_adjoint(R_10, t_10)), 0.0)
    J1 = jnp.where(o_valid, AJ, 0.0)

    R_pe, t_pe = se3.se3_between(state.mprior_R, state.mprior_t, R0, t0)
    Jq_full = state.mprior_sqrt @ se3.se3_right_jacobian_inv(
        se3.se3_log(R_pe, t_pe)
    )
    Jq = jnp.where(cfg.marginalize, Jq_full, 0.0)

    eye6 = jnp.eye(6, dtype=dtype)
    eps = jnp.asarray(1e-6, dtype)
    H00 = J0.T @ J0 + Jq.T @ Jq + eps * eye6
    H01 = J0.T @ J1
    H11 = J1.T @ J1

    # Blocked closed-form 6x6 inverse + one unrolled Cholesky
    # (solver/schur.py): the jnp.linalg custom calls cost ~100 us of
    # launch/While-loop sequencing per frame on a v5e for these tiny
    # systems, and substitution chains are latency-bound too.
    from ..solver.schur import chol_small, spd_inv6_blocked

    Hm = H11 - H01.T @ spd_inv6_blocked(H00) @ H01
    Hm = 0.5 * (Hm + Hm.T) + cfg.marg_info_floor * eye6
    sqrt = chol_small(Hm).T
    return window.R[1], window.t[1], sqrt


def _use_fused(cfg: SlamConfig) -> bool:
    """Trace-time choice of the fused whole-iteration GN kernel.

    ``analytic_planes`` is irrelevant to the fused path (it is always
    analytic in-kernel); the shape gate mirrors the production factor
    layout of :func:`_build_factors` (O = W-1 odometry + 1 prior +
    W*D plane factors)."""
    from ..ops.fused_gn import fused_gn_supported

    if cfg.fused == "off":
        return False
    ok = fused_gn_supported(
        cfg.window_size, cfg.max_landmarks,
        cfg.window_size * cfg.max_det, cfg.window_size - 1, 1,
    )
    if cfg.fused == "on":
        if not ok:
            raise ValueError(
                "fused='on' but the window shape is outside the fused "
                f"kernel's supported sizes ({cfg.window_size}, "
                f"{cfg.max_landmarks}, {cfg.window_size * cfg.max_det})"
            )
        return True
    return ok and jax.default_backend() == "tpu"


def _keyframe_update(state: SlamState, det: FrameDetections,
                     cfg: SlamConfig, solve_impl=None) -> SlamState:
    """Insert the current frame as a keyframe and re-solve the window.

    ``solve_impl(window, factors) -> window_opt`` overrides the whole
    windowed-BA stage when given — the hook the distributed runner
    (pipeline/sharded.py) uses to swap in a mesh-sharded solve without
    touching the association/window machinery."""
    W = cfg.window_size
    window, store = state.window, state.store

    # --- landmark merge: fold duplicate co-planar landmarks before
    # association so the frame matches against the deduplicated map
    # (every merge_every-th keyframe; lax.cond skips the L x L gate
    # matrix on the others) ---
    if cfg.lm_merge:
        def _do_merge(args):
            st, lmv, pflm = args
            st2, lmv2, remap, _ = merge_landmarks(
                st, window.planes, lmv,
                max_angle=cfg.assoc.max_angle * cfg.merge_gate_scale,
                max_dist=cfg.assoc.max_dist * cfg.merge_gate_scale,
                min_overlap=cfg.merge_min_overlap,
            )
            return st2, lmv2, remap[pflm]

        store, lm_valid_m, pf_lm_m = jax.lax.cond(
            state.n_kf % cfg.merge_every == 0,
            _do_merge,
            lambda args: args,
            (store, window.lm_valid, state.pf_lm),
        )
        window = window._replace(lm_valid=lm_valid_m)
        state = state._replace(
            window=window, store=store, pf_lm=pf_lm_m
        )

    pred_R, pred_t = current_pose(state)

    # --- detections -> world frame (at the predicted pose) ---
    planes_w = plane_mod.transform_to_world(det.planes_c, pred_R, pred_t)
    centroid_w = se3.se3_apply(pred_R, pred_t, det.centroid_c)
    endpoints_w = se3.se3_apply(pred_R, pred_t, det.endpoints_c)

    # --- data association ---
    assoc = associate_detections(
        planes_w, centroid_w, endpoints_w, det.valid,
        window.planes, store.endpoints_w, window.lm_valid,
        cfg.assoc,
    )

    # --- eviction: make room for this keyframe's new landmarks
    # (lax.cond: the ranking argsort only runs when slots are short) ---
    if cfg.lm_evict:
        need = assoc.is_new.sum().astype(jnp.int32)

        def _do_evict(args):
            st, lmv = args
            in_window = (
                jnp.zeros((cfg.max_landmarks + 1,), bool)
                .at[jnp.where(state.pf_valid, state.pf_lm,
                              cfg.max_landmarks)]
                .set(True)[: cfg.max_landmarks]
            )
            st2, evicted = evict_landmarks(st, in_window, need)
            return st2, lmv & (~evicted)

        store, lm_valid_e = jax.lax.cond(
            need > (~store.valid).sum(),
            _do_evict,
            lambda args: args,
            (store, window.lm_valid),
        )
        window = window._replace(lm_valid=lm_valid_e)

    # --- new landmark insertion ---
    store, new_slot = insert_landmarks(
        store, assoc.is_new, endpoints_w, state.n_kf
    )
    created = new_slot >= 0
    # Scatter with a sentinel index + mode='drop' for non-created
    # detections: a clipped duplicate index would let their no-op write
    # race with (and clobber) a real insert at the same slot.
    drop_new = jnp.where(created, new_slot, cfg.max_landmarks)
    lm_planes = window.planes.at[drop_new].set(planes_w, mode="drop")
    lm_valid = window.lm_valid.at[drop_new].set(True, mode="drop")
    window = window._replace(planes=lm_planes, lm_valid=lm_valid)
    safe_new = jnp.clip(new_slot, 0, cfg.max_landmarks - 1)

    matched = assoc.match_lm >= 0
    lm_idx = jnp.where(matched, assoc.match_lm, safe_new.astype(jnp.int32))
    factor_valid = det.valid & (matched | created)

    # --- extent / count update for matched landmarks ---
    store = update_extents(
        store, jnp.clip(assoc.match_lm, 0, cfg.max_landmarks - 1),
        endpoints_w, matched, window.planes,
    )

    # --- slide the window when full ---
    full = state.n_kf >= W
    use_fused_solver = (
        solve_impl is None and cfg.solver == "gn" and _use_fused(cfg)
    )
    fuse_marg = use_fused_solver and cfg.marginalize
    if cfg.marginalize and not fuse_marg:
        # Fold the exiting keyframe into a prior on the next-oldest pose
        # (computed from the pre-roll state; applied only when full).
        m_R, m_t, m_sqrt = _marginalize_oldest(state, cfg)
    elif fuse_marg:
        # The marginalization chain (~85 us of serial 6x6 tiny ops) runs
        # INSIDE the fused GN kernel; capture its pre-roll inputs here.
        from ..ops.fused_gn import pack_marg

        w0 = state.window
        marg_block = pack_marg(
            w0.R[0], w0.t[0], w0.R[1], w0.t[1],
            state.odom_R[0], state.odom_t[0], state.odom_valid[0],
            state.mprior_R, state.mprior_t, state.mprior_sqrt, full,
        )
        m_R, m_t = w0.R[1], w0.t[1]
        m_sqrt = None                 # kernel output, picked post-solve

    def rolled(w, o_R, o_t, o_v, p_pi, p_lm, p_v):
        w2 = w._replace(
            R=jnp.roll(w.R, -1, axis=0),
            t=jnp.roll(w.t, -1, axis=0),
            pose_valid=jnp.roll(w.pose_valid, -1, axis=0),
        )
        return (
            w2,
            jnp.roll(o_R, -1, axis=0), jnp.roll(o_t, -1, axis=0),
            jnp.roll(o_v, -1, axis=0).at[-1].set(False),
            jnp.roll(p_pi, -1, axis=0), jnp.roll(p_lm, -1, axis=0),
            jnp.roll(p_v, -1, axis=0).at[-1].set(False),
        )

    w_r, oR_r, ot_r, ov_r, pi_r, plm_r, pv_r = rolled(
        window, state.odom_R, state.odom_t, state.odom_valid,
        state.pf_pi, state.pf_lm, state.pf_valid,
    )

    def pick(a, b):
        return jax.tree.map(
            lambda x, y: jnp.where(
                jnp.reshape(full, (1,) * x.ndim), x, y
            ),
            a, b,
        )

    window = pick(w_r, window)
    odom_R = pick(oR_r, state.odom_R)
    odom_t = pick(ot_r, state.odom_t)
    odom_valid = pick(ov_r, state.odom_valid)
    pf_pi = pick(pi_r, state.pf_pi)
    pf_lm = pick(plm_r, state.pf_lm)
    pf_valid = pick(pv_r, state.pf_valid)
    if cfg.marginalize:
        mprior_R = pick(m_R, state.mprior_R)
        mprior_t = pick(m_t, state.mprior_t)
        mprior_sqrt = (pick(m_sqrt, state.mprior_sqrt)
                       if m_sqrt is not None else state.mprior_sqrt)
    else:
        mprior_R, mprior_t, mprior_sqrt = (
            state.mprior_R, state.mprior_t, state.mprior_sqrt
        )

    # --- write the new keyframe into its slot ---
    slot = jnp.clip(state.n_kf, 0, W - 1)     # after roll: W-1 when full
    window = window._replace(
        R=window.R.at[slot].set(pred_R),
        t=window.t.at[slot].set(pred_t),
        pose_valid=window.pose_valid.at[slot].set(True),
    )
    oslot = jnp.clip(slot - 1, 0, W - 2)
    odom_R = odom_R.at[oslot].set(state.acc_R)
    odom_t = odom_t.at[oslot].set(state.acc_t)
    odom_valid = odom_valid.at[oslot].set(True)

    pf_pi = pf_pi.at[slot].set(det.planes_c)
    pf_lm = pf_lm.at[slot].set(lm_idx)
    pf_valid = pf_valid.at[slot].set(factor_valid)

    state = state._replace(
        window=window, store=store,
        pf_pi=pf_pi, pf_lm=pf_lm, pf_valid=pf_valid,
        odom_R=odom_R, odom_t=odom_t, odom_valid=odom_valid,
        mprior_R=mprior_R, mprior_t=mprior_t, mprior_sqrt=mprior_sqrt,
        # detections that wanted a landmark but found none even after
        # eviction: surfaced so capacity pressure is never silent
        n_overflow=state.n_overflow
        + (assoc.is_new & (~created)).sum().astype(jnp.int32),
    )

    # --- windowed bundle adjustment ---
    factors = _build_factors(state, cfg)
    if solve_impl is not None:
        return state._replace(
            window=solve_impl(state.window, factors),
            acc_R=jnp.eye(3, dtype=state.acc_R.dtype),
            acc_t=jnp.zeros((3,), state.acc_t.dtype),
            n_kf=state.n_kf + 1,
        )
    solve_fn = make_solve_fn(cfg.pallas)
    if use_fused_solver:
        from ..ops.fused_gn import fused_gn_solve

        on_tpu = jax.default_backend() == "tpu"
        if fuse_marg:
            inv_t = 1.0 / cfg.odom_sigma_t
            inv_r = 1.0 / cfg.odom_sigma_r
            window_opt, _, m_sqrt_out = fused_gn_solve(
                state.window, factors, iters=cfg.gn_iters,
                damping=cfg.damping, robust=cfg.robust,
                use_pallas=on_tpu, marg=marg_block,
                marg_static=((inv_t,) * 3 + (inv_r,) * 3, 1e-6,
                             cfg.marg_info_floor),
            )
            state = state._replace(
                mprior_sqrt=pick(m_sqrt_out, state.mprior_sqrt)
            )
        else:
            window_opt, _ = fused_gn_solve(
                state.window, factors, iters=cfg.gn_iters,
                damping=cfg.damping, robust=cfg.robust,
                use_pallas=on_tpu,
            )
    elif cfg.solver == "gn":
        window_opt, _ = gn_solve(
            state.window, factors, iters=cfg.gn_iters,
            damping=cfg.damping, solve_fn=solve_fn,
            analytic_planes=cfg.analytic_planes, robust=cfg.robust,
        )
    elif cfg.solver == "lm":
        window_opt, _ = lm_solve(
            state.window, factors, iters=cfg.gn_iters,
            lam0=max(cfg.damping, 1e-6), solve_fn=solve_fn,
            analytic_planes=cfg.analytic_planes, robust=cfg.robust,
        )
    elif cfg.solver == "dogleg":
        window_opt, _ = dogleg_solve(
            state.window, factors, iters=cfg.gn_iters,
            solve_fn=solve_fn, robust=cfg.robust,
            analytic_planes=cfg.analytic_planes,
        )
    else:
        raise ValueError(f"unknown solver '{cfg.solver}'")

    return state._replace(
        window=window_opt,
        acc_R=jnp.eye(3, dtype=state.acc_R.dtype),
        acc_t=jnp.zeros((3,), state.acc_t.dtype),
        n_kf=state.n_kf + 1,
    )


def slam_step(
    state: SlamState,
    det: FrameDetections,
    odom_R: jnp.ndarray,
    odom_t: jnp.ndarray,
    cfg: SlamConfig,
    solve_impl=None,
):
    """Process one frame.  Returns (state, (R_wc, t_wc) current pose).

    ``odom_R/odom_t`` is the relative motion measurement from the
    previous frame (visual/wheel odometry or a constant-velocity
    prior's delta).  Keyframe work runs under ``lax.cond``.
    ``solve_impl`` optionally overrides the BA solve (see
    :func:`_keyframe_update`).
    """
    acc_R, acc_t = se3.se3_compose(state.acc_R, state.acc_t, odom_R, odom_t)
    state = state._replace(
        acc_R=acc_R, acc_t=acc_t, frame=state.frame + 1
    )

    dist = jnp.linalg.norm(acc_t)
    ang = jnp.linalg.norm(se3.so3_log(acc_R))
    is_kf = (dist > cfg.kf_trans) | (ang > cfg.kf_rot)

    state = jax.lax.cond(
        is_kf,
        lambda s: _keyframe_update(s, det, cfg, solve_impl),
        lambda s: s,
        state,
    )
    R, t = current_pose(state)
    return state, (R, t)
