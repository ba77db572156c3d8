"""Plane-based visual odometry: ego-motion from frame-to-frame plane
alignment.

The reference leans on external odometry or LSD-SLAM for pose priors
(paper arXiv:1703.07334 §V; SURVEY.md §7 "hard parts" #3 — TUM provides
no wheel odometry).  This module closes that gap natively: the popped-up
camera-frame planes of two consecutive frames are matched and aligned,
yielding the relative SE(3) motion — a fully monocular odometry source
built from the same plane primitives as the SLAM back-end.

Math.  With the relative pose (R, t) mapping current-frame points into
the previous frame (x_a = R x_b + t — the ``se3_between`` convention
used by the runner), a plane pi = (n, d) observed in both frames obeys

    n_a = R n_b
    d_a = d_b - n_a . t

so rotation is a Wahba problem over matched unit normals (solved in
closed form by SVD of the weighted outer-product matrix) and translation
is a 3x3 linear least squares over the distance offsets.  Indoor plane
sets are routinely degenerate — a corridor (ground + two parallel walls)
leaves the along-corridor translation unobservable; ground alone leaves
yaw free — so both solves are damped toward a motion prior (constant
velocity by default): the prior fills exactly the unobservable subspace
and is overridden by data everywhere else.

Everything is fixed-shape, branch-free, jit/vmap/scan-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..geometry import plane as plane_mod
from ..geometry import se3


class PlaneVOConfig(NamedTuple):
    max_angle: float = 0.35      # rad — normal-angle gate for matching
    max_dist: float = 1.2        # m — |d_a - d_b| gate on the first pass
    refine_dist: float = 0.3     # m — gate on refine passes (post-align)
    iters: int = 2               # match/align passes (ICP-style)
    lam_rot: float = 0.05        # prior damping weight, rotation (Wahba)
    lam_trans: float = 0.05     # prior damping weight, translation
    min_matches: int = 1         # below this, fall back to the prior


class PlaneVOResult(NamedTuple):
    R: jnp.ndarray               # (3, 3) relative rotation (a<-b)
    t: jnp.ndarray               # (3,)   relative translation
    n_matches: jnp.ndarray       # ()     int32 matched plane pairs
    used_prior: jnp.ndarray      # ()     bool — too few matches, prior kept


def match_planes(
    planes_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    planes_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    prior_R: jnp.ndarray,
    prior_t: jnp.ndarray,
    cfg: PlaneVOConfig = PlaneVOConfig(),
):
    """Gate + mutual-nearest matching of two camera-frame plane sets.

    planes_a/b: (D, 4) unit planes; valid_a/b: (D,) bool.  Frame b's
    planes are first warped into frame a through the motion prior so the
    gates measure *innovation*, not raw motion.  Returns
    (match_idx (D,) int32 — for each a-slot the matched b-slot or -1,
    weight (D,) f32 — min of the two planes' validity as 0/1).
    """
    # Warp b -> a via the prior: points x_a = R x_b + t, so plane
    # transform_to_world with (prior_R, prior_t) maps pi_b into frame a.
    pb_in_a = plane_mod.transform_to_world(planes_b, prior_R, prior_t)

    ang = plane_mod.normal_angle(planes_a[:, None, :], pb_in_a[None, :, :])
    na, da = plane_mod.to_hessian_normal(planes_a)
    nb, db = plane_mod.to_hessian_normal(pb_in_a)
    s = jnp.where(jnp.einsum("ak,bk->ab", na, nb) >= 0.0, 1.0, -1.0)
    dd = jnp.abs(da[:, None] - s * db[None, :])

    ok = (
        (ang < cfg.max_angle)
        & (dd < cfg.max_dist)
        & valid_a[:, None]
        & valid_b[None, :]
    )
    big = jnp.asarray(1e9, ang.dtype)
    score = jnp.where(ok, ang + dd, big)

    # Mutual nearest neighbour (one pass, fixed shape).
    best_b = jnp.argmin(score, axis=1)                     # (D,) per a
    best_a = jnp.argmin(score, axis=0)                     # (D,) per b
    mutual = best_a[best_b] == jnp.arange(score.shape[0])
    has = jnp.take_along_axis(score, best_b[:, None], axis=1)[:, 0] < big
    match = jnp.where(mutual & has, best_b, -1)
    weight = (match >= 0).astype(planes_a.dtype)
    return match, weight


def align_planes(
    planes_a: jnp.ndarray,
    planes_b: jnp.ndarray,
    weight: jnp.ndarray,
    prior_R: jnp.ndarray,
    prior_t: jnp.ndarray,
    lam_rot: float = 0.05,
    lam_trans: float = 0.05,
):
    """Closed-form weighted plane-to-plane SE(3) alignment with a prior.

    planes_a/b: (M, 4) matched camera-frame planes (row i of a matches
    row i of b); weight: (M,) >= 0 (zero rows are ignored).  Returns
    (R, t) with x_a = R x_b + t.

    Rotation: Wahba over normals — maximize sum_i w_i n_a_i . R n_b_i,
    solved by SVD of B = sum_i w_i n_a_i n_b_i^T + lam_rot * prior_R
    (the prior term is exact: with zero data weight the SVD returns
    prior_R).  Translation: n_a_i . t = d_b_i - d_a_i, solved by damped
    normal equations (A^T W A + lam I) t = A^T W r + lam t_prior.
    """
    na, da = plane_mod.to_hessian_normal(planes_a)
    nb, db = plane_mod.to_hessian_normal(planes_b)
    # Antipodal sign alignment per pair (after prior rotation warp).
    nb_w = (prior_R @ nb[..., None])[..., 0]
    s = jnp.where(jnp.sum(na * nb_w, axis=-1) >= 0.0, 1.0, -1.0)
    nb = s[:, None] * nb
    db = s * db

    w = weight[:, None]
    B = jnp.einsum("mi,mj->ij", na * w, nb) + lam_rot * prior_R
    U, _, Vt = jnp.linalg.svd(B)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], B.dtype)).at[2, 2].set(det)
    R = U @ D @ Vt

    # Translation: n_a . t = d_b - d_a per match (d measured in frame b
    # equals d in frame a shifted by the normal component of t).
    r = db - da
    A = na
    AtA = jnp.einsum("mi,mj->ij", A * w, A) + lam_trans * jnp.eye(3, dtype=A.dtype)
    Atb = jnp.einsum("mi,m->i", A * w, r)
    t = jnp.linalg.solve(AtA, Atb + lam_trans * prior_t)
    return R, t


def plane_vo_step(
    planes_prev: jnp.ndarray,
    valid_prev: jnp.ndarray,
    planes_cur: jnp.ndarray,
    valid_cur: jnp.ndarray,
    prior_R: jnp.ndarray,
    prior_t: jnp.ndarray,
    cfg: PlaneVOConfig = PlaneVOConfig(),
    support_prev: jnp.ndarray | None = None,
    support_cur: jnp.ndarray | None = None,
) -> PlaneVOResult:
    """One VO step: match previous-frame planes against current-frame
    planes (both in their own camera frames) and align, iterated
    ICP-style.  The first pass gates d-innovation at ``cfg.max_dist`` —
    wide, because against a cold (identity / constant-velocity) prior
    the innovation of the one plane that makes along-corridor motion
    observable IS the full frame-to-frame step; refine passes re-warp
    through the current estimate and tighten to ``cfg.refine_dist``.
    Damping always pulls toward the *original* prior so the unobservable
    subspace stays anchored.  Falls back to the prior when fewer than
    ``cfg.min_matches`` pairs survive the gates.

    ``support_prev``/``support_cur`` (optional, (D,) >= 0) weight each
    match by ``min`` of the two planes' observation support (boundary
    column counts), normalized to mean 1 over the matched set.  A
    glancing sliver of a wall about to leave the view has a noisy
    fitted distance; unweighted, one such sliver can inject its full d
    error into the translation along its normal — which, if that axis
    then becomes unobservable, the constant-velocity prior perpetuates
    into unbounded linear drift (seen on the room-orbit fixture).
    Support weighting crushes the sliver's vote by orders of magnitude
    while leaving well-observed geometry untouched."""
    R_est, t_est = prior_R, prior_t
    n = jnp.asarray(0, jnp.int32)
    for k in range(max(cfg.iters, 1)):
        gate = cfg.max_dist if k == 0 else cfg.refine_dist
        match, _ = match_planes(
            planes_prev, valid_prev, planes_cur, valid_cur,
            R_est, t_est, cfg._replace(max_dist=gate),
        )
        matched = match >= 0
        idx = jnp.clip(match, 0, planes_cur.shape[0] - 1)
        pb = planes_cur[idx]
        w = matched.astype(planes_prev.dtype)
        if support_prev is not None and support_cur is not None:
            sup = jnp.minimum(support_prev, support_cur[idx])
            w = w * sup
            w = w / jnp.maximum(
                jnp.sum(w) / jnp.maximum(jnp.sum(matched), 1), 1e-9
            )
        R_new, t_new = align_planes(
            planes_prev, pb, w, prior_R, prior_t, cfg.lam_rot,
            cfg.lam_trans,
        )
        n_new = jnp.sum(matched.astype(jnp.int32))
        # keep the previous pass's result if this pass lost all matches
        keep = n_new < cfg.min_matches
        R_est = jnp.where(keep, R_est, R_new)
        t_est = jnp.where(keep, t_est, t_new)
        # n tracks the match count of the *kept* estimate, so the
        # reported n_matches always describes the returned solution.
        n = jnp.where(keep, n, n_new)
    use_prior = n < cfg.min_matches
    R = jnp.where(use_prior, prior_R, R_est)
    t = jnp.where(use_prior, prior_t, t_est)
    return PlaneVOResult(R=R, t=t, n_matches=n, used_prior=use_prior)
