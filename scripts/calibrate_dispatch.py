"""Calibrate the BA solver dispatch across window shapes (VERDICT-r4 #5).

For each (W, L) shape: time the jnp Schur path, the Pallas-Schur
kernel path, and (where supported) the fused whole-iteration kernel,
interleaved round-robin inside the same process with a resident
``lax.scan`` harness (carry-dependent, excludes per-call dispatch),
taking medians across repeats — the tunneled chip is multi-tenant and
single passes swing +-25% (round-4 microbench notes).

Prints one line per shape and a dispatch recommendation.  The chosen
constants live in solver/schur.py (PALLAS_CROSSOVER) and
ops/fused_gn.py (fused_gn_supported); re-run this after kernel changes.

Usage: python scripts/calibrate_dispatch.py [scan_len] [reps]
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

SHAPES = [(8, 64), (12, 128), (16, 128), (16, 256), (32, 256)]
ITERS = 2


def build(W, L):
    window, factors, _, _ = build_corridor_problem(
        noise_odom_t=0.05, noise_odom_r=0.02, noise_plane=0.02,
        lm_perturb=0.05, seed=3, window=W, max_walls=L - 1, max_det=6,
    )
    window = window._replace(pose_fixed=jnp.zeros_like(window.pose_fixed))
    pr = PosePriors(
        idx=jnp.zeros((1,), jnp.int32),
        R=window.R[0][None], t=window.t[0][None],
        sqrt_info=(1e2 * jnp.eye(6))[None],
        valid=jnp.ones((1,), bool),
    )
    return window, factors._replace(priors=pr)


def make_runner(window, factors, impl, scan_len):
    if impl == "fused":
        def solver(w):
            w2, _ = fused_gn_solve(w, factors, iters=ITERS, damping=1e-5)
            return w2
    else:
        fn = make_solve_fn(impl)

        def solver(w):
            w2, _ = gn_solve(w, factors, iters=ITERS, damping=1e-5,
                             solve_fn=fn, analytic_planes=True)
            return w2

    def body(w, _):
        return solver(w), jnp.float32(0)

    @jax.jit
    def run(w):
        w2, _ = jax.lax.scan(body, w, None, length=scan_len)
        return w2

    return run


def main():
    scan_len = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    print(f"backend={jax.default_backend()} iters={ITERS} "
          f"scan={scan_len} reps={reps}", flush=True)
    print(f"{'W':>3} {'L':>4} {'6W*3L':>7} | "
          f"{'jnp us':>8} {'pschur us':>9} {'fused us':>8} | winner")

    for W, L in SHAPES:
        window, factors = build(W, L)
        F = factors.planes.valid.shape[0]
        impls = ["off", "on"]
        if fused_gn_supported(W, L, F, W - 1, 1):
            impls.append("fused")
        runners = {}
        for impl in impls:
            runners[impl] = make_runner(window, factors, impl, scan_len)
            out = runners[impl](window)
            jax.block_until_ready(out)
        times = {k: [] for k in impls}
        for _ in range(reps):
            for impl in impls:
                t0 = time.perf_counter()
                out = runners[impl](window)
                jax.block_until_ready(out)
                times[impl].append(time.perf_counter() - t0)
        med = {k: sorted(v)[len(v) // 2] / scan_len * 1e6
               for k, v in times.items()}
        winner = min(med, key=med.get)
        label = {"off": "jnp", "on": "pschur", "fused": "fused"}
        print(f"{W:>3} {L:>4} {18 * W * L:>7} | "
              f"{med.get('off', float('nan')):8.1f} "
              f"{med.get('on', float('nan')):9.1f} "
              f"{med.get('fused', float('nan')):8.1f} | "
              f"{label[winner]}", flush=True)


if __name__ == "__main__":
    main()
