"""Distributed plane-SLAM: sharded Schur assembly + DP front-end.

The reference has no parallelism at all (single-process ROS node,
SURVEY.md §2.2); this module is the new TPU-native scaling layer
mandated by BASELINE configs 4-5:

- **DP over frames** (:func:`sharded_popup`): the pop-up front-end is
  embarrassingly parallel across frames — shard the frame batch over
  the mesh and vmap within each shard.
- **Factor-sharded Schur assembly** (:func:`sharded_linearize`): each
  device linearizes its shard of the (odometry / plane / prior) factor
  batch into local normal-equation contributions (Hpp, Hpl, Hll, bp,
  bl); one ``psum`` over the mesh axis reduces them to the replicated
  blocked system — collectives ride ICI, exactly the "Schur assembly =
  psum of per-shard reduced systems" design in BASELINE north_star.
  The reduced (6W x 6W) camera system is small, so the Cholesky solve
  runs replicated on every device (no communication).
- :func:`distributed_gn_solve`: fixed-iteration Gauss-Newton whose
  linearize step is the sharded version above — numerically identical
  (to fp tolerance) to the single-device solver, verified by the
  shard-invariance tests (SURVEY.md §4 item 4).

Everything is mesh-shape-generic: the same code runs on an 8-device
CPU simulation, a v5e-8 slice, or multi-host meshes (with
``jax.distributed.initialize`` handled by the caller).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..factors.graph import (
    Factors,
    Linearization,
    OdomFactors,
    PlaneFactors,
    PosePriors,
    Window,
    linearize,
)
from ..solver.gauss_newton import SolveStats, apply_update, sanitize_step
from ..solver.schur import solve_schur


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    """1-D device mesh over the first ``n_devices`` local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def _pad_batch(batch, empty_fn, n: int):
    cap = jax.tree.leaves(batch)[0].shape[0]
    pad = (-cap) % n
    if pad == 0:
        return batch
    filler = empty_fn(pad)
    return jax.tree.map(
        lambda a, b: jnp.concatenate([a, b.astype(a.dtype)]), batch, filler
    )


def pad_factors_for_sharding(factors: Factors, n_shards: int) -> Factors:
    """Pad every factor batch to a multiple of the mesh size.

    Padding entries come from each factor type's ``empty()`` —
    ``valid=False`` with *identity-valued* measurements (unit rotation,
    unit plane, identity sqrt-info).  Zero-filled padding is NOT safe:
    the masked linearize evaluates residual/Jacobian code on every
    entry and multiplies by the 0/1 validity weight afterwards, and
    jacfwd through ``so3_log``/plane normalization at an all-zero
    "rotation" or plane produces NaN — and ``0 * NaN`` is still NaN
    (this NaN'd the sharded runner on wall-free frames; the identity
    filler matches the invalid-slot convention used everywhere else).
    """
    return Factors(
        odom=_pad_batch(factors.odom, OdomFactors.empty, n_shards),
        planes=_pad_batch(factors.planes, PlaneFactors.empty, n_shards),
        priors=_pad_batch(factors.priors, PosePriors.empty, n_shards),
    )


def sharded_linearize(
    window: Window, factors: Factors, mesh: Mesh, axis: str = "d",
    analytic_planes: bool = False, robust=None,
) -> Linearization:
    """Each shard linearizes its slice of the factors; psum assembles.

    ``factors`` must already be padded to the mesh size
    (:func:`pad_factors_for_sharding`).  The window (poses+landmarks)
    is replicated; the returned Linearization is replicated.
    ``analytic_planes`` / ``robust`` thread through to
    :func:`factors.graph.linearize` exactly as in the single-device
    solver (IRLS weights are per-factor, so factor sharding commutes
    with them).
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), jax.tree.map(lambda _: P(axis), factors)),
        out_specs=P(),
    )
    def local(window_rep, factors_shard):
        lin = linearize(window_rep, factors_shard,
                        analytic_planes=analytic_planes, robust=robust)
        return jax.tree.map(lambda x: jax.lax.psum(x, axis), lin)

    return local(window, factors)


def distributed_gn_solve(
    window: Window,
    factors: Factors,
    mesh: Mesh,
    iters: int = 5,
    damping: float = 1e-6,
    axis: str = "d",
    analytic_planes: bool = False,
    robust=None,
):
    """Gauss-Newton with factor-sharded Schur assembly.

    Matches :func:`pop_up_slam_tpu.solver.gn_solve` to fp tolerance on
    any mesh shape (shard-invariance is a test gate).
    """
    factors = pad_factors_for_sharding(factors, mesh.devices.size)

    def step(w, _):
        lin = sharded_linearize(w, factors, mesh, axis,
                                analytic_planes=analytic_planes,
                                robust=robust)
        sol = solve_schur(lin, w, damping)
        dxp, dxl, _ = sanitize_step(sol.dxp, sol.dxl)
        w2 = apply_update(w, dxp, dxl, presanitized=True)
        sn = jnp.sqrt(jnp.sum(dxp ** 2) + jnp.sum(dxl ** 2))
        return w2, (lin.cost, sn)

    window, (costs, step_norms) = jax.lax.scan(step, window, None, length=iters)
    return window, SolveStats(
        cost_history=jnp.concatenate([costs, costs[-1:]]),
        step_norms=step_norms,
        lambdas=jnp.full((iters,), damping),
        accepted=jnp.ones((iters,), bool),
    )


def sharded_popup(
    popup_fn,
    masks: jnp.ndarray,      # (B, H, W) ground masks, B % mesh size == 0
    R_wc: jnp.ndarray,       # (B, 3, 3)
    t_wc: jnp.ndarray,       # (B, 3)
    mesh: Mesh,
    axis: str = "d",
):
    """DP front-end: shard the frame batch over the mesh and vmap the
    single-frame pop-up within each shard (SURVEY.md §2.2 "DP").

    ``popup_fn(mask, R, t) -> pytree`` is the single-frame front-end
    (typically a closure over Intrinsics + PopupConfig).
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    def local(m, R, t):
        return jax.vmap(popup_fn)(m, R, t)

    return local(masks, R_wc, t_wc)
