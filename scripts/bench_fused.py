"""TPU microbench: fused GN kernel vs the jnp / Pallas-Schur paths.

Run on the real chip (default env, axon backend).  Measures K GN
iterations per solver call inside one jitted ``lax.scan`` with the
window state as the carry (carry dependence prevents XLA hoisting the
body; round-4 microbench trap notes).  Interleaves A/B/C repeats and
reports medians — the tunneled chip is multi-tenant and single passes
swing +-25%.

Usage: python scripts/bench_fused.py [W L iters scan_len reps]
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pop_up_slam_tpu.factors.graph import PosePriors  # noqa: E402
from pop_up_slam_tpu.io.problems import build_corridor_problem  # noqa: E402
from pop_up_slam_tpu.ops.fused_gn import (  # noqa: E402
    fused_gn_solve,
    fused_gn_supported,
)
from pop_up_slam_tpu.solver import gn_solve  # noqa: E402
from pop_up_slam_tpu.solver.schur import make_solve_fn  # noqa: E402


def main():
    args = sys.argv[1:]
    W = int(args[0]) if len(args) > 0 else 8
    L_target = int(args[1]) if len(args) > 1 else 64
    iters = int(args[2]) if len(args) > 2 else 2
    scan_len = int(args[3]) if len(args) > 3 else 200
    reps = int(args[4]) if len(args) > 4 else 7

    max_det = 9
    window, factors, _, _ = build_corridor_problem(
        noise_odom_t=0.05, noise_odom_r=0.02, noise_plane=0.02,
        lm_perturb=0.05, seed=3, window=W, max_walls=L_target - 1,
        max_det=max_det,
    )
    # production gauge: free slot 0 + strong prior
    window = window._replace(pose_fixed=jnp.zeros_like(window.pose_fixed))
    pr = PosePriors(
        idx=jnp.zeros((1,), jnp.int32),
        R=window.R[0][None], t=window.t[0][None],
        sqrt_info=(1e2 * jnp.eye(6))[None],
        valid=jnp.ones((1,), bool),
    )
    factors = factors._replace(priors=pr)
    F = factors.planes.valid.shape[0]
    print(f"backend={jax.default_backend()} W={W} L={window.max_landmarks} "
          f"F={F} iters={iters} fused_ok="
          f"{fused_gn_supported(W, window.max_landmarks, F, W - 1, 1)}",
          flush=True)

    def make_scan(solver):
        def body(w, _):
            w2 = solver(w)
            return w2, jnp.float32(0)

        @jax.jit
        def run(w):
            w2, _ = jax.lax.scan(body, w, None, length=scan_len)
            return w2

        return run

    def fused(w):
        w2, _ = fused_gn_solve(w, factors, iters=iters, damping=1e-5)
        return w2

    def jnp_path(w):
        w2, _ = gn_solve(w, factors, iters=iters, damping=1e-5,
                         solve_fn=make_solve_fn("off"),
                         analytic_planes=True)
        return w2

    def pallas_schur(w):
        w2, _ = gn_solve(w, factors, iters=iters, damping=1e-5,
                         solve_fn=make_solve_fn("on"),
                         analytic_planes=True)
        return w2

    runners = {"fused": make_scan(fused), "jnp": make_scan(jnp_path),
               "pschur": make_scan(pallas_schur)}

    # compile + warm
    for name, run in runners.items():
        t0 = time.perf_counter()
        out = run(window)
        jax.block_until_ready(out)
        print(f"{name}: compiled+first in {time.perf_counter() - t0:.1f}s",
              flush=True)

    times = {k: [] for k in runners}
    for _ in range(reps):
        for name, run in runners.items():
            t0 = time.perf_counter()
            out = run(window)
            jax.block_until_ready(out)
            times[name].append(time.perf_counter() - t0)

    med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
    for name in runners:
        us = med[name] / scan_len * 1e6
        it_s = scan_len * iters / med[name]
        print(f"{name}: {us:8.1f} us/solve ({iters} it)  "
              f"{it_s:8.0f} it/s  (median of {reps})", flush=True)
    print(f"fused speedup vs jnp:    {med['jnp'] / med['fused']:.2f}x")
    print(f"fused speedup vs pschur: {med['pschur'] / med['fused']:.2f}x")


if __name__ == "__main__":
    main()
