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

from ..factors.graph import Factors, Linearization, Window, linearize
from ..solver.gauss_newton import SolveStats, apply_update
from ..solver.schur import solve_schur


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    """1-D device mesh over the first ``n_devices`` local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def _pad_axis(x: jnp.ndarray, n: int) -> jnp.ndarray:
    cap = x.shape[0]
    pad = (-cap) % n
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])


def pad_factors_for_sharding(factors: Factors, n_shards: int) -> Factors:
    """Pad every factor batch to a multiple of the mesh size.

    Padding entries have ``valid=False`` so they contribute exactly
    zero to the assembled system (linearize masks them out).
    """
    return jax.tree.map(lambda x: _pad_axis(x, n_shards), factors)


def sharded_linearize(
    window: Window, factors: Factors, mesh: Mesh, axis: str = "d"
) -> Linearization:
    """Each shard linearizes its slice of the factors; psum assembles.

    ``factors`` must already be padded to the mesh size
    (:func:`pad_factors_for_sharding`).  The window (poses+landmarks)
    is replicated; the returned Linearization is replicated.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), jax.tree.map(lambda _: P(axis), factors)),
        out_specs=P(),
    )
    def local(window_rep, factors_shard):
        lin = linearize(window_rep, factors_shard)
        return jax.tree.map(lambda x: jax.lax.psum(x, axis), lin)

    return local(window, factors)


def distributed_gn_solve(
    window: Window,
    factors: Factors,
    mesh: Mesh,
    iters: int = 5,
    damping: float = 1e-6,
    axis: str = "d",
):
    """Gauss-Newton with factor-sharded Schur assembly.

    Matches :func:`pop_up_slam_tpu.solver.gn_solve` to fp tolerance on
    any mesh shape (shard-invariance is a test gate).
    """
    factors = pad_factors_for_sharding(factors, mesh.devices.size)

    def step(w, _):
        lin = sharded_linearize(w, factors, mesh, axis)
        sol = solve_schur(lin, w, damping)
        w2 = apply_update(w, sol.dxp, sol.dxl)
        sn = jnp.sqrt(jnp.sum(sol.dxp ** 2) + jnp.sum(sol.dxl ** 2))
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
