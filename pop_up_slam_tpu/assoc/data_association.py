"""Masked fixed-capacity plane data association.

TPU-native re-design of the reference's per-frame detection-to-landmark
matching (paper arXiv:1703.07334 §IV-C; SURVEY.md §3.2 "DATA
ASSOCIATION" hot loop #2).  The reference walks detections and
landmarks with pointer-chasing geometric tests; here the whole step is
one dense masked ``D x L`` score matrix plus a short greedy-assignment
``fori_loop`` — fully jit/vmap-safe, fixed shapes.

Gates (mirroring the reference's three checks):

1. **normal angle** between the detected plane and the landmark plane,
   both expressed in the world frame (antipodal-invariant),
2. **point-to-plane distance** of the detection's boundary centroid to
   the landmark plane,
3. **extent overlap** of the detection's ground-line segment with the
   landmark's accumulated ground-line extent, measured as 1-D overlap
   along the landmark line direction (the honest fixed-shape analog of
   the reference's projected-polygon-overlap test — wall polygons here
   are vertical rectangles over a ground line, so their overlap is the
   ground-line overlap).

Greedy mutual-best assignment: D iterations of masked argmin over the
score matrix, each claiming one (detection, landmark) pair — identical
result to the reference's sequential greedy matching but expressed as a
fixed-trip-count ``lax.fori_loop``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import plane as plane_mod

_BIG = 1e9


class AssocConfig(NamedTuple):
    max_angle: float = 0.35       # rad (~20 deg) normal-angle gate
    max_dist: float = 0.35        # m point-to-plane distance gate
    min_overlap: float = -2.0     # m 1-D extent gap gate: overlap > this
                                  # (negative allows small gaps: walls seen
                                  # in disjoint pieces of the same line)
    w_angle: float = 1.0          # score weight per rad
    w_dist: float = 1.0           # score weight per meter


class AssocResult(NamedTuple):
    """match_lm : (D,) int32 landmark index per detection, -1 = unmatched.
    is_new     : (D,) bool — valid detection with no landmark match
                 (candidate for landmark creation).
    scores     : (D, L) the gated score matrix (diagnostics/tests).
    """

    match_lm: jnp.ndarray
    is_new: jnp.ndarray
    scores: jnp.ndarray


def _segment_overlap_1d(a0, a1, b0, b1):
    """Signed overlap length of 1-D intervals [min,max] of (a0,a1),(b0,b1).

    Positive = overlap length, negative = gap size between the intervals.
    """
    alo, ahi = jnp.minimum(a0, a1), jnp.maximum(a0, a1)
    blo, bhi = jnp.minimum(b0, b1), jnp.maximum(b0, b1)
    return jnp.minimum(ahi, bhi) - jnp.maximum(alo, blo)


def landmark_scores(
    det_planes_w: jnp.ndarray,    # (D, 4) detected planes in *world* frame
    det_centroid_w: jnp.ndarray,  # (D, 3) boundary centroid per detection
    det_endpoints_w: jnp.ndarray, # (D, 2, 3) ground-line endpoints
    det_valid: jnp.ndarray,       # (D,) bool
    lm_planes_w: jnp.ndarray,     # (L, 4) landmark planes (world)
    lm_endpoints_w: jnp.ndarray,  # (L, 2, 3) accumulated landmark extent
    lm_valid: jnp.ndarray,        # (L,) bool
    cfg: AssocConfig = AssocConfig(),
):
    """Dense gated score matrix (D, L); _BIG where gated out."""
    ang = plane_mod.normal_angle(
        det_planes_w[:, None, :], lm_planes_w[None, :, :]
    )                                                       # (D, L)
    dist = jnp.abs(
        plane_mod.point_to_plane_distance(
            lm_planes_w[None, :, :], det_centroid_w[:, None, :]
        )
    )                                                       # (D, L)

    # 1-D extent overlap along the landmark's line direction.  The
    # landmark line direction is the in-plane horizontal direction
    # d = z_hat x n (landmark walls are near-vertical); for the ground
    # plane (n ~ z_hat) the overlap gate is disabled via the
    # degenerate-direction mask below.
    n = lm_planes_w[:, :3]
    d_line = jnp.stack([-n[:, 1], n[:, 0], jnp.zeros_like(n[:, 0])], axis=-1)
    d_norm = jnp.linalg.norm(d_line, axis=-1, keepdims=True)
    horiz_ok = d_norm[:, 0] > 1e-3                          # (L,)
    d_unit = d_line / jnp.maximum(d_norm, 1e-9)

    de = jnp.einsum("dei,li->dle", det_endpoints_w, d_unit)  # (D, L, 2)
    le = jnp.einsum("lei,li->le", lm_endpoints_w, d_unit)    # (L, 2)
    ovl = _segment_overlap_1d(
        de[..., 0], de[..., 1], le[None, :, 0], le[None, :, 1]
    )                                                       # (D, L)
    ovl_ok = (~horiz_ok[None, :]) | (ovl > cfg.min_overlap)

    ok = (
        det_valid[:, None]
        & lm_valid[None, :]
        & (ang < cfg.max_angle)
        & (dist < cfg.max_dist)
        & ovl_ok
    )
    score = cfg.w_angle * ang + cfg.w_dist * dist
    return jnp.where(ok, score, _BIG)


def associate_detections(
    det_planes_w: jnp.ndarray,
    det_centroid_w: jnp.ndarray,
    det_endpoints_w: jnp.ndarray,
    det_valid: jnp.ndarray,
    lm_planes_w: jnp.ndarray,
    lm_endpoints_w: jnp.ndarray,
    lm_valid: jnp.ndarray,
    cfg: AssocConfig = AssocConfig(),
) -> AssocResult:
    """Greedy globally-ordered assignment on the gated score matrix.

    D iterations; each claims the current best (d, l) pair and masks its
    row and column, reproducing the reference's greedy matching with a
    fixed trip count.
    """
    scores = landmark_scores(
        det_planes_w, det_centroid_w, det_endpoints_w, det_valid,
        lm_planes_w, lm_endpoints_w, lm_valid, cfg,
    )
    D, L = scores.shape

    def body(_, carry):
        s, match = carry
        flat = jnp.argmin(s)
        d, l = flat // L, flat % L
        best = s[d, l]
        take = best < _BIG
        match = jnp.where(
            take, match.at[d].set(l.astype(jnp.int32)), match
        )
        s = jnp.where(take, s.at[d, :].set(_BIG).at[:, l].set(_BIG), s)
        return s, match

    match0 = jnp.full((D,), -1, jnp.int32)
    # Unrolled (D is a small static capacity): a fori_loop lowers to a
    # While with per-trip sequencing overhead on the latency-bound
    # chip; unrolling lets XLA fuse the D argmin/mask steps freely.
    carry = (scores, match0)
    for _ in range(D):
        carry = body(0, carry)
    _, match_lm = carry
    is_new = det_valid & (match_lm < 0)
    return AssocResult(match_lm=match_lm, is_new=is_new, scores=scores)
