"""Multi-host runtime setup (SURVEY.md §5 "Distributed communication
backend"): `jax.distributed.initialize` + a host-aware mesh.

The reference's only "communication" is single-machine ROS pub/sub;
scaling across hosts is new design (BASELINE configs 4-5).  XLA
collectives are the backend — there is no NCCL/MPI layer to manage,
just process bring-up and mesh construction:

- :func:`init_distributed` wires one process per host to the
  coordinator (idempotent; no-op for single-process runs).
- :func:`make_host_mesh` builds a ("host", "chip") 2-D mesh so
  shardings can keep heavy collectives on intra-host ICI and only the
  small reduced-system psum crosses DCN; :func:`flat_mesh_axis`
  collapses it to the 1-D axis the solvers use when the distinction
  does not matter.

Tested cross-process by ``scripts/multihost_smoke.py`` (2 localhost
processes, CPU devices), which asserts the distributed solve matches
the single-process result — SURVEY.md §4 item 4.

**Failure model (SURVEY.md §5 "Failure detection / elastic recovery"):
the multi-host runtime is deliberately NON-ELASTIC.**  The process set
is fixed at :func:`init_distributed`; a host loss aborts the job (XLA
collectives over a fixed mesh cannot re-form), and recovery is
restart-from-checkpoint: every runner can snapshot its full solver
state (``utils/checkpoint.py``) and resume from keyframe k with a
bit-equal continuation (tests/test_tum_runner.py
``test_resume_matches_uninterrupted``).  In-job failure *detection* is
delegated to the launcher (the jax distributed runtime surfaces peer
loss as a fatal error); no in-band heartbeating is layered on top —
matching the reference's operational model (a crashed ROS node is
re-run from the rosbag) at multi-host scale.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the multi-process JAX runtime (idempotent).

    With no arguments, reads the standard env/cluster autodetection;
    explicit arguments support manual bring-up (e.g. the localhost
    smoke test).  Single-process callers can skip this entirely.
    """
    if num_processes is None and coordinator_address is None:
        return  # single-process / auto environments need no bring-up
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_host_mesh(axis_host: str = "host", axis_chip: str = "chip") -> Mesh:
    """(n_hosts, chips_per_host) mesh over all global devices.

    Devices are grouped by process so the chip axis stays on-host
    (ICI) and only the host axis crosses DCN.
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_proc = jax.process_count()
    per_host = len(devs) // n_proc
    grid = np.array(devs).reshape(n_proc, per_host)
    return Mesh(grid, (axis_host, axis_chip))


def flat_mesh_axis(axis: str = "d") -> Mesh:
    """1-D mesh over all global devices (process-grouped order)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), (axis,))
