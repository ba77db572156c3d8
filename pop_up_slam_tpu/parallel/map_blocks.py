"""Map-block-partitioned distributed BA: landmarks sharded per device.

BASELINE north_star mandates that "keyframes and plane-landmark map
blocks are partitioned per host and the distributed BA solves via Schur
elimination with psum/all-gather collectives over ICI".  The
factor-sharded path in :mod:`distributed` splits *factors* arbitrarily
and reduces the full (W, L) system; this module is the stronger
map-block form: each device **owns a contiguous block of landmark
slots** and everything about them —

- the plane factors observing its landmarks (host-side routing),
- their landmark Hessian blocks Hll and gradient bl,
- the pose-landmark coupling Hpl restricted to its block,
- the Schur contribution  -Hpl_blk Hll_blk^-1 Hpl_blk^T,
- the back-substituted landmark updates and plane retraction.

Only the reduced camera system (6W x 6W) and the pose gradient are
psum'd across the mesh; landmark state never leaves its owner.  Per-
device memory for the landmark side scales as L/n — the actual point of
map-block partitioning.  Odometry/prior factors are pose-only and
cheap, so every device evaluates them identically (replicated) instead
of paying a collective.

The whole Gauss-Newton loop runs inside ONE ``shard_map`` region, so
XLA schedules the psum per iteration over ICI with no host round-trips.
Matches the single-device ``gn_solve`` to fp tolerance for any mesh
shape (tests/test_parallel_ext.py).

Cost note: ``partition_plane_factors`` routes factors to owner shards
with a *host-side numpy pass per call*.  That is fine for the one-shot
dryrun/self-check/eval uses here; a production per-keyframe loop should
route on-device (the sharded runner in pipeline/sharded.py keeps its
window layout owner-aligned instead, so it never re-routes per solve).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..factors.graph import (
    Factors,
    PlaneFactors,
    Window,
    _odom_terms,
    _plane_terms,
    _prior_terms,
)
from ..geometry import plane as plane_mod
from ..geometry import se3
from ..solver.gauss_newton import SolveStats
from ..solver.schur import inv3x3


def partition_plane_factors(
    planes: PlaneFactors, L: int, n_shards: int
) -> tuple[PlaneFactors, int]:
    """Host-side routing: group plane factors by landmark owner shard.

    Landmark slot l belongs to shard l // (L/n).  Returns a PlaneFactors
    whose leading axis is ordered [shard0 block | shard1 block | ...],
    each block padded to the max per-shard count (padding valid=False),
    with ``lm_idx`` rewritten to *local* (within-block) landmark
    indices.  Invalid factors are routed to shard 0 as padding.
    """
    assert L % n_shards == 0, (L, n_shards)
    Lb = L // n_shards
    lm = np.asarray(planes.lm_idx)
    valid = np.asarray(planes.valid)
    owner = np.where(valid, lm // Lb, 0)

    per_shard = [np.where(owner == s)[0] for s in range(n_shards)]
    cap = max(1, max(len(ix) for ix in per_shard))

    def gather_pad(x):
        x = np.asarray(x)
        out = np.zeros((n_shards * cap,) + x.shape[1:], x.dtype)
        for s, ix in enumerate(per_shard):
            out[s * cap: s * cap + len(ix)] = x[ix]
        return out

    new = PlaneFactors(
        pose_idx=jnp.asarray(gather_pad(planes.pose_idx)),
        lm_idx=jnp.asarray(gather_pad(np.where(valid, lm % Lb, 0))),
        pi_meas=jnp.asarray(gather_pad(planes.pi_meas)),
        sqrt_info=jnp.asarray(gather_pad(planes.sqrt_info)),
        valid=jnp.asarray(gather_pad(planes.valid)),
    )
    return new, cap


def _pad_landmarks(window: Window, L_new: int) -> Window:
    L = window.max_landmarks
    if L_new == L:
        return window
    pad = L_new - L
    return window._replace(
        planes=jnp.concatenate(
            [window.planes,
             jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0, 0.0],
                                        window.planes.dtype), (pad, 4))]
        ),
        lm_valid=jnp.concatenate(
            [window.lm_valid, jnp.zeros((pad,), bool)]
        ),
    )


def map_block_gn_solve(
    window: Window,
    factors: Factors,
    mesh: Mesh,
    iters: int = 5,
    damping: float = 1e-6,
    axis: str = "d",
):
    """Gauss-Newton with landmark map blocks owned per device.

    Returns (window, SolveStats) identical (to fp tolerance) to
    ``solver.gn_solve`` on the same problem.
    """
    n = mesh.devices.size
    L0 = window.max_landmarks
    Lp = -(-L0 // n) * n
    window_p = _pad_landmarks(window, Lp)
    planes_sh, _ = partition_plane_factors(factors.planes, Lp, n)
    odom, priors = factors.odom, factors.priors
    lam = jnp.asarray(damping, window.t.dtype)

    win_spec = Window(
        R=P(), t=P(), planes=P(axis),
        pose_valid=P(), pose_fixed=P(), lm_valid=P(axis),
    )
    pf_spec = jax.tree.map(lambda _: P(axis), planes_sh)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(win_spec, pf_spec),
        out_specs=(win_spec, (P(), P())),
    )
    def run(w, pf):
        W = w.R.shape[0]
        dtype = w.t.dtype
        eye3 = jnp.eye(3, dtype=dtype)
        eye6 = jnp.eye(6, dtype=dtype)
        diag_ix = jnp.arange(W)
        free = w.pose_valid & (~w.pose_fixed)
        pm = free.astype(dtype)

        def step(w, _):
            Lb = w.planes.shape[0]
            # --- local plane-factor linearization over the owned block
            r_f, Jp, Jl = _plane_terms(w, pf)
            pi_, li_ = pf.pose_idx, pf.lm_idx
            Hpp_f = jnp.zeros((W, W, 6, 6), dtype).at[pi_, pi_].add(
                jnp.einsum("fab,fac->fbc", Jp, Jp)
            )
            Hpl = jnp.zeros((W, Lb, 6, 3), dtype).at[pi_, li_].add(
                jnp.einsum("fab,fac->fbc", Jp, Jl)
            )
            Hll = jnp.zeros((Lb, 3, 3), dtype).at[li_].add(
                jnp.einsum("fab,fac->fbc", Jl, Jl)
            )
            bp_f = jnp.zeros((W, 6), dtype).at[pi_].add(
                jnp.einsum("fab,fa->fb", Jp, r_f)
            )
            bl = jnp.zeros((Lb, 3), dtype).at[li_].add(
                jnp.einsum("fab,fa->fb", Jl, r_f)
            )
            cost_f = 0.5 * jnp.sum(r_f * r_f)

            # --- replicated pose-only factors (identical on all shards)
            r_o, Ji, Jj = _odom_terms(w, odom)
            oi, oj = odom.i, odom.j
            Hpp_op = jnp.zeros((W, W, 6, 6), dtype)
            Hpp_op = Hpp_op.at[oi, oi].add(jnp.einsum("fab,fac->fbc", Ji, Ji))
            hij = jnp.einsum("fab,fac->fbc", Ji, Jj)
            Hpp_op = Hpp_op.at[oi, oj].add(hij)
            Hpp_op = Hpp_op.at[oj, oi].add(jnp.swapaxes(hij, -1, -2))
            Hpp_op = Hpp_op.at[oj, oj].add(jnp.einsum("fab,fac->fbc", Jj, Jj))
            bp_op = jnp.zeros((W, 6), dtype)
            bp_op = bp_op.at[oi].add(jnp.einsum("fab,fa->fb", Ji, r_o))
            bp_op = bp_op.at[oj].add(jnp.einsum("fab,fa->fb", Jj, r_o))
            r_q, Jq = _prior_terms(w, priors)
            qi = priors.idx
            Hpp_op = Hpp_op.at[qi, qi].add(jnp.einsum("fab,fac->fbc", Jq, Jq))
            bp_op = bp_op.at[qi].add(jnp.einsum("fab,fa->fb", Jq, r_q))
            cost_op = 0.5 * (jnp.sum(r_o * r_o) + jnp.sum(r_q * r_q))

            # --- local Schur contribution of the owned landmark block
            Hll_d = jnp.where(
                w.lm_valid[:, None, None], Hll + lam * eye3, eye3
            )
            Hll_inv = inv3x3(Hll_d)
            HplWinv = jnp.einsum("wlab,lbc->wlac", Hpl, Hll_inv)
            S_part = Hpp_f - jnp.einsum("wlac,vlbc->wvab", HplWinv, Hpl)
            rp_part = bp_f - jnp.einsum("wlab,lb->wa", HplWinv, bl)

            # --- the ONLY collectives: reduced camera system + cost
            S_blocks = jax.lax.psum(S_part, axis) + Hpp_op
            rp = jax.lax.psum(rp_part, axis) + bp_op
            cost = jax.lax.psum(cost_f, axis) + cost_op

            # --- replicated reduced solve (S is small)
            S_blocks = S_blocks.at[diag_ix, diag_ix].add(lam * eye6)
            S_blocks = (
                S_blocks * pm[:, None, None, None] * pm[None, :, None, None]
            )
            S_blocks = S_blocks.at[diag_ix, diag_ix].add(
                (1.0 - pm)[:, None, None] * eye6
            )
            rp = rp * pm[:, None]
            S = S_blocks.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
            chol = jnp.linalg.cholesky(S)
            y = jax.scipy.linalg.solve_triangular(
                chol, -rp.reshape(-1), lower=True
            )
            dxp = jax.scipy.linalg.solve_triangular(
                chol.T, y, lower=False
            ).reshape(W, 6) * pm[:, None]

            # --- local landmark back-substitution + retraction
            rhs = bl + jnp.einsum("wlab,wa->lb", Hpl, dxp)
            dxl = -jnp.einsum("lab,lb->la", Hll_inv, rhs)
            dxl = dxl * w.lm_valid[:, None].astype(dtype)

            # Step guard (solver.gauss_newton.sanitize_step semantics):
            # the squared norm must be psum'd so every shard takes the
            # same accept/reject decision — dxp is replicated, dxl is
            # sharded, and a per-shard verdict would fork the state.
            sq = jnp.sum(dxp * dxp) + jax.lax.psum(
                jnp.sum(dxl * dxl), axis
            )
            ok = jnp.isfinite(sq) & (sq < 1e6)
            dxp = jnp.where(ok, dxp, 0.0)
            dxl = jnp.where(ok, dxl, 0.0)

            R_new, t_new = se3.se3_retract(w.R, w.t, dxp)
            fr = free[:, None]
            w2 = w._replace(
                R=jnp.where(fr[..., None], R_new, w.R),
                t=jnp.where(fr, t_new, w.t),
                planes=jnp.where(
                    w.lm_valid[:, None],
                    plane_mod.retract(w.planes, dxl), w.planes,
                ),
            )
            sn = jnp.sqrt(
                jnp.sum(dxp ** 2) + jax.lax.psum(jnp.sum(dxl ** 2), axis)
            )
            return w2, (cost, sn)

        w_out, (costs, sns) = jax.lax.scan(step, w, None, length=iters)
        return w_out, (costs, sns)

    w_opt, (costs, step_norms) = run(window_p, planes_sh)
    if Lp != L0:
        w_opt = w_opt._replace(
            planes=w_opt.planes[:L0], lm_valid=w_opt.lm_valid[:L0]
        )
    return w_opt, SolveStats(
        cost_history=jnp.concatenate([costs, costs[-1:]]),
        step_norms=step_norms,
        lambdas=jnp.full((iters,), damping),
        accepted=jnp.ones((iters,), bool),
    )
