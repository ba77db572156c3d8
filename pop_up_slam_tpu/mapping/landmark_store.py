"""Fixed-capacity plane-landmark store.

TPU-native replacement for the reference's dynamically-grown landmark
set (iSAM plane nodes, SURVEY.md §2.1/§3.2): a capacity-``L`` struct of
arrays with a validity mask.  Slot allocation, extent accumulation and
observation counting are all branch-free masked ops so the whole store
lives inside the jit-compiled per-frame step.

The landmark *plane estimates* themselves are NOT stored here — they
live in ``factors.graph.Window.planes`` so the solver optimizes them in
place; the store holds the bookkeeping that is not part of the
optimization state (extents for association overlap gating, observation
counts, creation stamps).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class LandmarkStore(NamedTuple):
    """endpoints_w : (L, 2, 3) accumulated ground-line extent per landmark.
    n_obs       : (L,) int32 observation count.
    created_kf  : (L,) int32 keyframe index of creation (-1 = free).
    valid       : (L,) bool.
    """

    endpoints_w: jnp.ndarray
    n_obs: jnp.ndarray
    created_kf: jnp.ndarray
    valid: jnp.ndarray

    @staticmethod
    def empty(capacity: int) -> "LandmarkStore":
        return LandmarkStore(
            endpoints_w=jnp.zeros((capacity, 2, 3)),
            n_obs=jnp.zeros((capacity,), jnp.int32),
            created_kf=jnp.full((capacity,), -1, jnp.int32),
            valid=jnp.zeros((capacity,), bool),
        )

    @property
    def capacity(self) -> int:
        return self.n_obs.shape[0]


def insert_landmarks(
    store: LandmarkStore,
    new_mask: jnp.ndarray,       # (D,) bool — detections to insert
    det_endpoints_w: jnp.ndarray,  # (D, 2, 3)
    kf_index: jnp.ndarray,       # () int32
):
    """Allocate free slots for new detections.

    Returns (store, slot_idx (D,) int32) where slot_idx[d] is the
    allocated landmark slot for detection d (-1 if not inserted —
    either new_mask[d] is False or the store is full).  Pure masked
    scatter, no dynamic shapes: detection d gets the (rank-of-d)-th
    free slot, computed with cumsums.
    """
    L = store.capacity
    D = new_mask.shape[0]

    free = ~store.valid                                   # (L,)
    # free slots in order: free_rank[l] = #free slots before l
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - free.astype(jnp.int32)
    # rank of each inserting detection among inserting detections
    new_i = new_mask.astype(jnp.int32)
    det_rank = jnp.cumsum(new_i) - new_i                  # (D,)
    n_free = free.sum()

    # slot for detection d: the slot l with free & free_rank == det_rank[d]
    # (L, D) match matrix -> argmax gives the slot index.
    match = free[:, None] & (free_rank[:, None] == det_rank[None, :])
    slot = jnp.argmax(match, axis=0).astype(jnp.int32)    # (D,)
    ok = new_mask & (det_rank < n_free)
    slot_idx = jnp.where(ok, slot, -1)

    # Sentinel index + mode='drop' for non-inserting detections: with a
    # clipped duplicate index their no-op writes would clobber a real
    # insert landing on the same slot (scatter .set has last-write-wins
    # semantics on duplicates).
    drop_slot = jnp.where(ok, slot, L)
    store = store._replace(
        endpoints_w=store.endpoints_w.at[drop_slot].set(
            det_endpoints_w, mode="drop"
        ),
        n_obs=store.n_obs.at[drop_slot].add(1, mode="drop"),
        created_kf=store.created_kf.at[drop_slot].set(
            jnp.asarray(kf_index, jnp.int32), mode="drop"
        ),
        valid=store.valid.at[drop_slot].set(True, mode="drop"),
    )
    return store, slot_idx


def evict_landmarks(
    store: LandmarkStore,
    in_window: jnp.ndarray,      # (L,) bool — referenced by window factors
    need: jnp.ndarray,           # () int32 — slots wanted this keyframe
):
    """Free slots for incoming landmarks when the store is full.

    The reference's iSAM landmark set grows without bound (SURVEY.md
    §2.1); a fixed-capacity store must instead recycle.  Policy
    (round-4 VERDICT "What's missing" #2): when fewer than ``need``
    slots are free, evict the lowest-``n_obs`` valid landmarks that are
    NOT referenced by any current window factor (oldest ``created_kf``
    breaks ties) until the deficit is covered.  Branch-free: an argsort
    rank over an eviction key.  Returns (store, evicted (L,) bool).
    """
    L = store.capacity
    evictable = store.valid & (~in_window)
    # key: primary n_obs (fewer observations evicted first), secondary
    # created_kf (older first); non-evictable slots sort to the end.
    key = store.n_obs.astype(jnp.float32) * 1e6 + store.created_kf.astype(
        jnp.float32
    )
    key = jnp.where(evictable, key, jnp.inf)
    rank = jnp.argsort(jnp.argsort(key))
    n_free = (~store.valid).sum()
    deficit = jnp.clip(need - n_free, 0, L)
    evicted = evictable & (rank < deficit)
    store = store._replace(
        valid=store.valid & (~evicted),
        n_obs=jnp.where(evicted, 0, store.n_obs),
        created_kf=jnp.where(evicted, -1, store.created_kf),
    )
    return store, evicted


def merge_landmarks(
    store: LandmarkStore,
    lm_planes_w: jnp.ndarray,    # (L, 4) current landmark plane estimates
    lm_valid: jnp.ndarray,       # (L,) bool (window.lm_valid)
    max_angle: float,
    max_dist: float,
    min_overlap: float,
):
    """Fold duplicate co-planar landmarks into each other.

    Duplicates arise when view-dependent misses create a second
    landmark for an already-mapped wall; the reference's projected
    polygon overlap makes this rare but not impossible (paper §IV-C).
    A pair (a, b) merges — weaker b into stronger a — when both are
    wall-like (non-horizontal line direction), their normal angle,
    point-to-plane distance (b's extent midpoint to plane a), and 1-D
    extent overlap all pass the given gates, and a is strictly
    stronger (more observations; lower index breaks ties).  Chains are
    broken by only merging into targets that are not themselves
    merging this call; remaining duplicates fold on a later keyframe.

    Returns (store, lm_valid, remap (L,) int32, merged (L,) bool):
    ``remap[l]`` is l's post-merge identity (callers re-index their
    factor landmark indices through it).  The target keeps its own
    plane estimate; if several sources fold into one target in a
    single call, the extent union keeps the last one (extents re-grow
    on the next observation).
    """
    from ..geometry import plane as plane_mod

    L = store.capacity
    n, d = plane_mod.to_hessian_normal(lm_planes_w)          # (L,3),(L,)
    mid = store.endpoints_w.mean(axis=1)                     # (L, 3)

    cosang = jnp.abs(jnp.einsum("ac,bc->ab", n, n))          # (a, b)
    ang_ok = cosang >= jnp.cos(max_angle)
    dist = jnp.abs(jnp.einsum("ac,bc->ab", n, mid) + d[:, None])
    dist_ok = dist < max_dist

    d_line = jnp.stack(
        [-n[:, 1], n[:, 0], jnp.zeros_like(n[:, 0])], axis=-1
    )
    d_norm = jnp.linalg.norm(d_line, axis=-1, keepdims=True)
    wall_like = d_norm[:, 0] > 1e-3
    d_unit = d_line / jnp.maximum(d_norm, 1e-9)
    # endpoints of every landmark projected onto a's line direction
    proj = jnp.einsum("ac,bkc->abk", d_unit, store.endpoints_w)  # (a,b,2)
    lo = jnp.minimum(proj[..., 0], proj[..., 1])
    hi = jnp.maximum(proj[..., 0], proj[..., 1])
    diag = jnp.arange(L)
    own_lo = lo[diag, diag][:, None]
    own_hi = hi[diag, diag][:, None]
    ovl = jnp.minimum(own_hi, hi) - jnp.maximum(own_lo, lo)
    ovl_ok = ovl > min_overlap

    both = lm_valid[:, None] & lm_valid[None, :] & store.valid[:, None] \
        & store.valid[None, :]
    walls = wall_like[:, None] & wall_like[None, :]
    not_self = diag[:, None] != diag[None, :]
    # strength key: observations first, lower slot index breaks ties
    skey = store.n_obs * L + (L - 1 - diag)
    stronger = skey[:, None] > skey[None, :]
    elig = both & walls & not_self & ang_ok & dist_ok & ovl_ok & stronger

    score = jnp.where(elig, skey[:, None], -1)               # (a, b)
    tgt = jnp.argmax(score, axis=0).astype(jnp.int32)        # (b,)
    has = jnp.max(score, axis=0) >= 0
    merged = has & (~has[tgt])                               # break chains

    drop_tgt = jnp.where(merged, tgt, L)
    add_obs = jnp.where(merged, store.n_obs, 0)
    n_obs = store.n_obs.at[drop_tgt].add(add_obs, mode="drop")
    n_obs = jnp.where(merged, 0, n_obs)

    # extent union along the target's direction (last-write-wins on
    # multi-source targets — see docstring)
    cand = jnp.concatenate(
        [store.endpoints_w[jnp.clip(tgt, 0, L - 1)], store.endpoints_w],
        axis=1,
    )                                                        # (b, 4, 3)
    du_t = d_unit[jnp.clip(tgt, 0, L - 1)]                   # (b, 3)
    pr = jnp.einsum("bkc,bc->bk", cand, du_t)                # (b, 4)
    i_min = jnp.argmin(pr, axis=-1)
    i_max = jnp.argmax(pr, axis=-1)
    e_new = jnp.stack(
        [
            jnp.take_along_axis(
                cand, i_min[:, None, None].repeat(3, -1), axis=1
            )[:, 0],
            jnp.take_along_axis(
                cand, i_max[:, None, None].repeat(3, -1), axis=1
            )[:, 0],
        ],
        axis=1,
    )
    endpoints = store.endpoints_w.at[drop_tgt].set(e_new, mode="drop")

    store = store._replace(
        endpoints_w=endpoints,
        n_obs=n_obs,
        created_kf=jnp.where(merged, -1, store.created_kf),
        valid=store.valid & (~merged),
    )
    lm_valid = lm_valid & (~merged)
    remap = jnp.where(merged, tgt, diag.astype(jnp.int32))
    return store, lm_valid, remap, merged


def update_extents(
    store: LandmarkStore,
    lm_idx: jnp.ndarray,         # (D,) int32 matched landmark per detection
    det_endpoints_w: jnp.ndarray,  # (D, 2, 3)
    match_mask: jnp.ndarray,     # (D,) bool
    lm_planes_w: jnp.ndarray,    # (L, 4) current landmark plane estimates
):
    """Extend matched landmarks' ground-line extents by the observation.

    The union is taken along the landmark's current line direction
    d = z_hat x n (horizontal, in-plane); the new endpoints are the
    min/max-projection points among {old e0, old e1, det e0, det e1}.
    Near-horizontal landmarks (ground) keep their extent unchanged.
    Also increments observation counts.
    """
    L = store.capacity
    safe = jnp.clip(lm_idx, 0, L - 1)
    old = store.endpoints_w[safe]                         # (D, 2, 3)
    n = lm_planes_w[safe, :3]
    d_line = jnp.stack([-n[:, 1], n[:, 0], jnp.zeros_like(n[:, 0])], axis=-1)
    d_norm = jnp.linalg.norm(d_line, axis=-1, keepdims=True)
    horiz_ok = d_norm[:, 0] > 1e-3
    d_unit = d_line / jnp.maximum(d_norm, 1e-9)

    cand = jnp.concatenate([old, det_endpoints_w], axis=1)  # (D, 4, 3)
    proj = jnp.einsum("dki,di->dk", cand, d_unit)           # (D, 4)
    i_min = jnp.argmin(proj, axis=-1)
    i_max = jnp.argmax(proj, axis=-1)
    e_new = jnp.stack(
        [
            jnp.take_along_axis(cand, i_min[:, None, None].repeat(3, -1), axis=1)[:, 0],
            jnp.take_along_axis(cand, i_max[:, None, None].repeat(3, -1), axis=1)[:, 0],
        ],
        axis=1,
    )                                                       # (D, 2, 3)
    upd = match_mask & horiz_ok
    drop_idx = jnp.where(upd, safe, L)
    count_idx = jnp.where(match_mask, safe, L)
    store = store._replace(
        endpoints_w=store.endpoints_w.at[drop_idx].set(e_new, mode="drop"),
        n_obs=store.n_obs.at[count_idx].add(1, mode="drop"),
    )
    return store
