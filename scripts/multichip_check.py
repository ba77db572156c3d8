"""Per-strategy multi-chip correctness report (VERDICT round-2 item 10).

Runs every parallel strategy on a virtual 8-device CPU mesh and writes
``MULTICHIP_SELF.json`` at the repo root: one entry per strategy with
pass/fail, the checked invariant, and the solve cost trace — so
multi-chip *correctness* coverage is machine-checkable each round
(frames/s on a CPU mesh is meaningless for perf and is not reported).

Strategies (SURVEY.md §2.2):
  dp_popup            — frame-sharded pop-up front-end vs vmap
  factor_sharded_ba   — factor-sharded Schur BA, psum assembly
  map_block_ba        — landmark-block (TP analog) Schur BA
  keyframe_sharded_ba — pose-sharded (SP analog) ring-halo BA

Usage:  python scripts/multichip_check.py   (forces JAX_PLATFORMS=cpu)
"""

import json
import os
import subprocess
import sys
import traceback

# A sitecustomize on PYTHONPATH can register a TPU PJRT plugin (and
# initialize jax) at interpreter startup — before this file runs, making
# in-process env edits too late (the 8-device flag silently no-ops and
# every check degenerates to 1 device).  Re-exec once with a scrubbed
# environment, exactly like tests/conftest.py.
if os.environ.get("_POPUP_SLAM_MCC_REEXEC") != "1":
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "PYTHONPATH": "",
        "_POPUP_SLAM_MCC_REEXEC": "1",
        "_POPUP_SLAM_TEST_REEXEC": "1",
    })
    ret = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env)
    sys.exit(ret.returncode)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/popup_slam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    import pop_up_slam_tpu  # noqa: F401
    from pop_up_slam_tpu.geometry.camera import Intrinsics
    from pop_up_slam_tpu.io import synthetic
    from pop_up_slam_tpu.parallel import (
        distributed_gn_solve,
        keyframe_sharded_gn_solve,
        make_mesh,
        map_block_gn_solve,
        sharded_popup,
    )
    from pop_up_slam_tpu.popup import popup as pp
    from pop_up_slam_tpu.io.problems import build_corridor_problem

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    results = {}

    def record(name, invariant, fn):
        try:
            detail = fn()
            results[name] = {"ok": True, "invariant": invariant,
                             **(detail or {})}
        except Exception as e:  # noqa: BLE001 — report, don't crash
            results[name] = {
                "ok": False, "invariant": invariant,
                "error": f"{type(e).__name__}: {e}",
                "trace": traceback.format_exc(limit=3),
            }

    # --- DP pop-up front-end ---
    H, W = 64, 96
    K = Intrinsics.create(48.0, 48.0, 48.0, 32.0)
    world = synthetic.corridor_world()
    R, t = synthetic.corridor_trajectory(n_dev)
    labels, _ = jax.vmap(
        lambda R_, t_: synthetic.render_frame(K, R_, t_, world, H, W)
    )(R, t)
    masks = labels == synthetic.LABEL_GROUND
    pcfg = pp.PopupConfig(min_cols=4, smooth_radius=2, nms_radius=3)
    fn = lambda m, R_, t_: pp.pop_up(K, m, R_, t_, pcfg)  # noqa: E731

    def check_dp():
        res_sh = jax.jit(
            lambda m, R_, t_: sharded_popup(fn, m, R_, t_, mesh)
        )(masks, R, t)
        res_vm = jax.jit(jax.vmap(fn))(masks, R, t)
        err = float(
            jnp.max(jnp.abs(res_sh.planes_w - res_vm.planes_w))
        )
        assert err < 1e-5, err
        return {"max_abs_err_vs_vmap": err}

    record("dp_popup", "sharded == vmap to 1e-5", check_dp)

    # --- BA strategies on the corridor problem ---
    window, factors, _, _ = build_corridor_problem(
        noise_odom_t=0.03, noise_odom_r=0.01
    )
    from pop_up_slam_tpu.solver import gn_solve

    w_ref, stats_ref = gn_solve(window, factors, iters=3, damping=1e-6)
    t_ref = np.asarray(w_ref.t)

    def make_check(solver):
        def check():
            w, stats = solver(window, factors, mesh, iters=3, damping=1e-6)
            err = float(np.abs(np.asarray(w.t) - t_ref).max())
            costs = [float(c) for c in np.asarray(stats.cost_history)]
            assert np.isfinite(np.asarray(w.t)).all()
            assert err < 5e-3, err
            assert costs[-1] <= costs[0] * 1.001, costs
            return {"max_abs_err_vs_1dev": err, "cost_trace": costs}
        return check

    record("factor_sharded_ba", "matches 1-device solve to 5e-3",
           make_check(distributed_gn_solve))
    record("map_block_ba", "matches 1-device solve to 5e-3",
           make_check(map_block_gn_solve))
    # keyframe sharding needs the window to divide evenly: use the
    # largest divisor of W that fits the device count as a submesh.
    kf_dev = max(
        (d for d in range(2, n_dev + 1) if window.window_size % d == 0),
        default=0,
    )
    if kf_dev:
        kf_mesh = make_mesh(kf_dev)
        record(
            "keyframe_sharded_ba",
            f"matches 1-device solve to 5e-3 ({kf_dev}-device submesh)",
            make_check(
                lambda w, f, _m, **kw: keyframe_sharded_gn_solve(
                    w, f, kf_mesh, **kw
                )
            ),
        )
    else:
        results["keyframe_sharded_ba"] = {
            "ok": None, "invariant": "matches 1-device solve to 5e-3",
            "skipped": f"window {window.window_size} has no divisor "
                       f"<= {n_dev}",
        }

    # --- production sharded runner: sharding cleanliness (round-4
    # VERDICT weak #3).  XLA prints "Involuntary full rematerialization"
    # to stderr when a scan-carry tensor enters with a sharding it must
    # all-gather away every step; the runner's explicit in/out
    # shardings must keep the carry replicated.  Run a small block in a
    # subprocess and grep its stderr.
    def check_runner_shardings():
        code = (
            "import jax, jax.numpy as jnp\n"
            "from pop_up_slam_tpu.geometry import se3\n"
            "from pop_up_slam_tpu.geometry.camera import Intrinsics\n"
            "from pop_up_slam_tpu.io import synthetic\n"
            "from pop_up_slam_tpu.parallel import make_mesh\n"
            "from pop_up_slam_tpu.pipeline import (SlamConfig,\n"
            "    make_sharded_runner, slam_init)\n"
            "from pop_up_slam_tpu.popup import popup as pp\n"
            "n = len(jax.devices()); mesh = make_mesh(n)\n"
            "H, W = 64, 96\n"
            "K = Intrinsics.create(48.0, 48.0, 48.0, 32.0)\n"
            "world = synthetic.corridor_world()\n"
            "R, t = synthetic.corridor_trajectory(n + 1)\n"
            "labels, _ = jax.vmap(lambda R_, t_:\n"
            "    synthetic.render_frame(K, R_, t_, world, H, W))(R, t)\n"
            "masks = labels[1:] == synthetic.LABEL_GROUND\n"
            "oR, ot = se3.se3_between(R[:-1], t[:-1], R[1:], t[1:])\n"
            "pcfg = pp.PopupConfig(min_cols=4, smooth_radius=2,\n"
            "                      nms_radius=3)\n"
            "scfg = SlamConfig(window_size=4, max_landmarks=16,\n"
            "                  max_det=pcfg.max_segments + 1,\n"
            "                  kf_trans=0.0, kf_rot=0.0)\n"
            "run = make_sharded_runner(K, pcfg, scfg, mesh,\n"
            "                          donate=False)\n"
            "state = slam_init(scfg, R[0], t[0])\n"
            "state, (Re, te) = run(state, masks, oR, ot)\n"
            "jax.block_until_ready(te)\n"
            "assert bool(jnp.isfinite(te).all())\n"
            "print('runner_ok')\n"
        )
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
            "PYTHONPATH": _REPO,
            "JAX_COMPILATION_CACHE_DIR": "/tmp/popup_slam_jax_cache",
        })
        p = subprocess.run(
            [sys.executable, "-c", code], env=env,
            capture_output=True, text=True, timeout=3000,
        )
        assert p.returncode == 0, p.stderr[-2000:]
        assert "runner_ok" in p.stdout, p.stdout
        bad = [ln for ln in p.stderr.splitlines()
               if "Involuntary full rematerialization" in ln]
        assert not bad, f"{len(bad)} rematerialization warnings: " \
                        f"{bad[0][:200]}"
        return {"remat_warnings": 0}

    record(
        "sharded_runner_shardings",
        "production runner emits zero 'Involuntary full "
        "rematerialization' warnings",
        check_runner_shardings,
    )

    out = {
        "n_devices": n_dev,
        "ref_cost_trace": [float(c) for c in
                           np.asarray(stats_ref.cost_history)],
        "strategies": results,
        "all_ok": all(v.get("ok") is not False for v in results.values()),
    }
    path = os.path.join(_REPO, "MULTICHIP_SELF.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v.get("ok") for k, v in results.items()}))
    sys.exit(0 if out["all_ok"] else 1)


if __name__ == "__main__":
    main()
