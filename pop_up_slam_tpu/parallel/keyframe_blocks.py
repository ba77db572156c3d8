"""Keyframe-block-partitioned linearization: poses sharded per device.

The SP/CP analog for SLAM (SURVEY.md §2.2 "keyframe-sequence
partitioning"): the trajectory is the "sequence"; each device owns a
contiguous block of keyframes, holds only its block's poses, and
evaluates every factor that *lands* on its block — odometry factors are
routed to the owner of their later pose, plane factors to the owner of
their observing pose.  Cross-boundary odometry factors need the last
pose of the left neighbor, which arrives by a single ring
``ppermute`` halo exchange (the "boundary pose duplication and
ring-style exchange" in SURVEY.md §2.2/§5).  Landmark planes are
replicated here — the dual of :mod:`map_blocks`, which shards landmarks
and replicates poses; a production multi-host deployment composes the
two over a 2-D mesh.

The assembled blocked system is psum'd to all devices (it is small:
the window), so the result is bit-identical in structure to
``factors.graph.linearize`` and matches it to fp tolerance
(tests/test_parallel_ext.py).

Cost note: the factor-routing helpers here run a *host-side numpy pass
per call* (fine for the one-shot dryrun/self-check/tests); a production
per-keyframe loop should keep factors owner-aligned on device instead
of re-routing each solve — see pipeline/sharded.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..factors.graph import (
    Factors,
    Linearization,
    OdomFactors,
    PlaneFactors,
    PosePriors,
    Window,
    _odom_terms,
    _plane_terms,
    _prior_terms,
)
from ..solver.gauss_newton import SolveStats, apply_update, sanitize_step
from ..solver.schur import solve_schur


class RoutedFactors(NamedTuple):
    """Host-routed factors: per-shard blocks with halo-local pose
    indices (slot 0 = left-neighbor boundary pose) plus the original
    global indices for scatter-back."""

    odom: OdomFactors         # i/j are halo-local
    odom_gi: jnp.ndarray      # (Oc,) global i
    odom_gj: jnp.ndarray      # (Oc,) global j
    planes: PlaneFactors      # pose_idx is halo-local; lm_idx global
    plane_gp: jnp.ndarray     # (Fc,) global pose idx
    priors: PosePriors        # idx is halo-local
    prior_gi: jnp.ndarray     # (Pc,) global idx


def route_factors_by_keyframe(
    factors: Factors, W: int, n_shards: int
) -> RoutedFactors:
    """Group factors by keyframe-block owner (host-side, static).

    Odometry factors must satisfy i >= owner_block_start - 1 (the halo
    covers exactly one boundary pose — a sliding-window odometry chain
    always does).
    """
    assert W % n_shards == 0, (W, n_shards)
    Wb = W // n_shards

    # --- odometry: owner = block of j ---
    od = factors.odom
    j_np = np.asarray(od.j)
    i_np = np.asarray(od.i)
    v_np = np.asarray(od.valid)
    owner = np.where(v_np, j_np // Wb, 0)
    for f in np.where(v_np)[0]:
        assert i_np[f] >= owner[f] * Wb - 1, (
            f"odom factor {f} spans more than one boundary "
            f"(i={i_np[f]}, j={j_np[f]}); keyframe sharding needs "
            "chain-structured odometry"
        )
    per = [np.where(owner == s)[0] for s in range(n_shards)]
    cap = max(1, max(len(ix) for ix in per))

    def pack(x, per, cap, fill=0):
        x = np.asarray(x)
        out = np.full((n_shards * cap,) + x.shape[1:], fill,
                      dtype=x.dtype)
        for s, ix in enumerate(per):
            out[s * cap: s * cap + len(ix)] = x[ix]
        return out

    def local_idx(g, per, cap):
        out = np.zeros((n_shards * cap,), np.int32)
        for s, ix in enumerate(per):
            out[s * cap: s * cap + len(ix)] = g[ix] - s * Wb + 1
        return out

    odom_local = OdomFactors(
        i=jnp.asarray(local_idx(i_np, per, cap)),
        j=jnp.asarray(local_idx(j_np, per, cap)),
        R_meas=jnp.asarray(pack(od.R_meas, per, cap)),
        t_meas=jnp.asarray(pack(od.t_meas, per, cap)),
        sqrt_info=jnp.asarray(pack(od.sqrt_info, per, cap)),
        valid=jnp.asarray(pack(od.valid, per, cap)),
    )
    odom_gi = jnp.asarray(pack(i_np, per, cap))
    odom_gj = jnp.asarray(pack(j_np, per, cap))

    # --- plane factors: owner = block of pose_idx ---
    pf = factors.planes
    p_np = np.asarray(pf.pose_idx)
    pv = np.asarray(pf.valid)
    owner_p = np.where(pv, p_np // Wb, 0)
    per_p = [np.where(owner_p == s)[0] for s in range(n_shards)]
    cap_p = max(1, max(len(ix) for ix in per_p))
    planes_local = PlaneFactors(
        pose_idx=jnp.asarray(local_idx(p_np, per_p, cap_p)),
        lm_idx=jnp.asarray(pack(pf.lm_idx, per_p, cap_p)),
        pi_meas=jnp.asarray(pack(pf.pi_meas, per_p, cap_p)),
        sqrt_info=jnp.asarray(pack(pf.sqrt_info, per_p, cap_p)),
        valid=jnp.asarray(pack(pf.valid, per_p, cap_p)),
    )
    plane_gp = jnp.asarray(pack(p_np, per_p, cap_p))

    # --- priors: owner = block of idx ---
    pr = factors.priors
    q_np = np.asarray(pr.idx)
    qv = np.asarray(pr.valid)
    owner_q = np.where(qv, q_np // Wb, 0)
    per_q = [np.where(owner_q == s)[0] for s in range(n_shards)]
    cap_q = max(1, max(len(ix) for ix in per_q))
    priors_local = PosePriors(
        idx=jnp.asarray(local_idx(q_np, per_q, cap_q)),
        R=jnp.asarray(pack(pr.R, per_q, cap_q)),
        t=jnp.asarray(pack(pr.t, per_q, cap_q)),
        sqrt_info=jnp.asarray(pack(pr.sqrt_info, per_q, cap_q)),
        valid=jnp.asarray(pack(pr.valid, per_q, cap_q)),
    )
    prior_gi = jnp.asarray(pack(q_np, per_q, cap_q))

    return RoutedFactors(
        odom=odom_local, odom_gi=odom_gi, odom_gj=odom_gj,
        planes=planes_local, plane_gp=plane_gp,
        priors=priors_local, prior_gi=prior_gi,
    )


def keyframe_sharded_linearize(
    window: Window,
    routed: RoutedFactors,
    mesh: Mesh,
    axis: str = "d",
) -> Linearization:
    """Linearize with poses sharded per keyframe block + halo exchange.

    ``routed`` comes from :func:`route_factors_by_keyframe` on the same
    mesh size.  Returns a replicated Linearization equal (fp tolerance)
    to ``linearize(window, factors)``.
    """
    n = mesh.devices.size
    W = window.window_size
    L = window.max_landmarks
    Wb = W // n

    win_spec = Window(
        R=P(axis), t=P(axis), planes=P(),
        pose_valid=P(axis), pose_fixed=P(axis), lm_valid=P(),
    )
    routed_spec = jax.tree.map(lambda _: P(axis), routed)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(win_spec, routed_spec), out_specs=P(),
    )
    def local(w, rf):
        dtype = w.t.dtype
        # Halo: receive the left neighbor's last pose (ring ppermute).
        perm = [(k, k + 1) for k in range(n - 1)]
        halo_R = jax.lax.ppermute(w.R[-1:], axis, perm)
        halo_t = jax.lax.ppermute(w.t[-1:], axis, perm)
        # Shard 0 has no left neighbor; its halo slot is never indexed
        # by a routed factor, but keep it finite.
        is0 = jax.lax.axis_index(axis) == 0
        halo_R = jnp.where(is0, jnp.eye(3, dtype=dtype)[None], halo_R)
        halo_t = jnp.where(is0, jnp.zeros((1, 3), dtype), halo_t)

        view = w._replace(
            R=jnp.concatenate([halo_R, w.R]),
            t=jnp.concatenate([halo_t, w.t]),
        )

        r_o, Ji, Jj = _odom_terms(view, rf.odom)
        r_f, Jp, Jl = _plane_terms(view, rf.planes)
        r_q, Jq = _prior_terms(view, rf.priors)

        Hpp = jnp.zeros((W, W, 6, 6), dtype)
        Hpl = jnp.zeros((W, L, 6, 3), dtype)
        Hll = jnp.zeros((L, 3, 3), dtype)
        bp = jnp.zeros((W, 6), dtype)
        bl = jnp.zeros((L, 3), dtype)

        oi, oj = rf.odom_gi, rf.odom_gj
        hij = jnp.einsum("fab,fac->fbc", Ji, Jj)
        Hpp = Hpp.at[oi, oi].add(jnp.einsum("fab,fac->fbc", Ji, Ji))
        Hpp = Hpp.at[oi, oj].add(hij)
        Hpp = Hpp.at[oj, oi].add(jnp.swapaxes(hij, -1, -2))
        Hpp = Hpp.at[oj, oj].add(jnp.einsum("fab,fac->fbc", Jj, Jj))
        bp = bp.at[oi].add(jnp.einsum("fab,fa->fb", Ji, r_o))
        bp = bp.at[oj].add(jnp.einsum("fab,fa->fb", Jj, r_o))

        pi_, li_ = rf.plane_gp, rf.planes.lm_idx
        Hpp = Hpp.at[pi_, pi_].add(jnp.einsum("fab,fac->fbc", Jp, Jp))
        Hpl = Hpl.at[pi_, li_].add(jnp.einsum("fab,fac->fbc", Jp, Jl))
        Hll = Hll.at[li_].add(jnp.einsum("fab,fac->fbc", Jl, Jl))
        bp = bp.at[pi_].add(jnp.einsum("fab,fa->fb", Jp, r_f))
        bl = bl.at[li_].add(jnp.einsum("fab,fa->fb", Jl, r_f))

        qi = rf.prior_gi
        Hpp = Hpp.at[qi, qi].add(jnp.einsum("fab,fac->fbc", Jq, Jq))
        bp = bp.at[qi].add(jnp.einsum("fab,fa->fb", Jq, r_q))

        cost = 0.5 * (
            jnp.sum(r_o * r_o) + jnp.sum(r_f * r_f) + jnp.sum(r_q * r_q)
        )
        lin = Linearization(Hpp, Hpl, Hll, bp, bl, cost)
        return jax.tree.map(lambda x: jax.lax.psum(x, axis), lin)

    return local(window, routed)


def keyframe_sharded_gn_solve(
    window: Window,
    factors: Factors,
    mesh: Mesh,
    iters: int = 5,
    damping: float = 1e-6,
    axis: str = "d",
):
    """Gauss-Newton over keyframe-sharded linearization (replicated
    reduced solve).  Matches ``solver.gn_solve`` to fp tolerance."""
    routed = route_factors_by_keyframe(factors, window.window_size,
                                       mesh.devices.size)

    def step(w, _):
        lin = keyframe_sharded_linearize(w, routed, mesh, axis)
        sol = solve_schur(lin, w, damping)
        dxp, dxl, _ = sanitize_step(sol.dxp, sol.dxl)
        w2 = apply_update(w, dxp, dxl, presanitized=True)
        sn = jnp.sqrt(jnp.sum(dxp ** 2) + jnp.sum(dxl ** 2))
        return w2, (lin.cost, sn)

    window, (costs, step_norms) = jax.lax.scan(
        step, window, None, length=iters
    )
    return window, SolveStats(
        cost_history=jnp.concatenate([costs, costs[-1:]]),
        step_norms=step_norms,
        lambdas=jnp.full((iters,), damping),
        accepted=jnp.ones((iters,), bool),
    )
