"""2-process localhost multi-host smoke test (SURVEY.md §4 item 4).

Each process hosts 2 virtual CPU devices; the 4-device global mesh runs
the factor-sharded distributed Gauss-Newton solve on the synthetic
corridor problem and checks the final cost decreases and every process
agrees.  Launch (done by tests/test_multihost.py):

    _SMOKE_NPROC=2 _SMOKE_PROC=0 _SMOKE_PORT=<port> python scripts/multihost_smoke.py
    _SMOKE_NPROC=2 _SMOKE_PROC=1 _SMOKE_PORT=<port> python scripts/multihost_smoke.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
os.environ.pop("PYTHONPATH", None)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    nproc = int(os.environ["_SMOKE_NPROC"])
    proc = int(os.environ["_SMOKE_PROC"])
    port = int(os.environ["_SMOKE_PORT"])

    import jax

    from pop_up_slam_tpu.parallel.multihost import (
        flat_mesh_axis,
        init_distributed,
    )

    init_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=proc,
    )
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc, len(jax.devices())

    import numpy as np

    os.environ.setdefault("_POPUP_SLAM_TEST_REEXEC", "1")
    from pop_up_slam_tpu.io.problems import build_corridor_problem

    from pop_up_slam_tpu.parallel import distributed_gn_solve

    window, factors, _, _ = build_corridor_problem(
        noise_odom_t=0.03, noise_odom_r=0.01
    )
    mesh = flat_mesh_axis()
    w_opt, stats = distributed_gn_solve(
        window, factors, mesh, iters=2, damping=1e-6
    )
    # stats is replicated over the global mesh; each process reads its
    # local copy and checks the solve made progress — agreement across
    # processes is implied by replication (XLA would have failed the
    # collective otherwise).
    costs = np.asarray(stats.cost_history.addressable_data(0))
    assert costs[-1] <= costs[0] * 1.001, costs
    assert np.isfinite(np.asarray(w_opt.t.addressable_data(0))).all()
    print(f"SMOKE_OK proc={proc} cost {costs[0]:.4e} -> {costs[-1]:.4e}")


if __name__ == "__main__":
    main()
