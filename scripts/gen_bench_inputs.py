"""Pre-render bench.py's input sequence to a committed .npz artifact.

Round-3 post-mortem (VERDICT.md "What's missing" item 1): the driver's
bench run timed out because the *input generation* step — a jitted vmap
of the synthetic ray-cast renderer over 145 frames at 480x640 — compiled
server-side through the tunneled TPU for ~4 minutes before a single
measurement ran.  Input data is not the system under test, so it has no
business on the compile path at all: this script renders the corridor
masks once, packs them to bits, and stores masks + exact odometry in
``bench_data/corridor_inputs.npz`` (committed to git, ~tens of KB after
compression — the masks are large smooth regions).  bench.py just loads
and unpacks with numpy.

Rendering happens one frame at a time under a single small jit so the
program stays cheap to compile on any backend (TPU or CPU).

Usage: python scripts/gen_bench_inputs.py
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

H, W = 480, 640
N_FRAMES = 144  # (1 warmup + 8 timed) chunks of 16 — must match bench.py


def main():
    import pop_up_slam_tpu  # noqa: F401 — sets matmul precision
    from pop_up_slam_tpu.geometry import se3
    from pop_up_slam_tpu.geometry.camera import Intrinsics
    from pop_up_slam_tpu.io import synthetic

    K = Intrinsics.create(320.0, 320.0, 320.0, 240.0)
    world = synthetic.corridor_world()
    Rs, ts = synthetic.corridor_trajectory(N_FRAMES + 1)

    render = jax.jit(
        lambda R_, t_: synthetic.render_frame(K, R_, t_, world, H, W)[0]
    )
    masks = np.zeros((N_FRAMES, H, W), bool)
    for i in range(N_FRAMES):
        labels = render(Rs[i + 1], ts[i + 1])
        masks[i] = np.asarray(labels) == synthetic.LABEL_GROUND
        if (i + 1) % 24 == 0:
            print(f"rendered {i + 1}/{N_FRAMES}", file=sys.stderr)

    oR, ot = se3.se3_between(Rs[:-1], ts[:-1], Rs[1:], ts[1:])

    out_dir = os.path.join(_REPO, "bench_data")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "corridor_inputs.npz")
    np.savez_compressed(
        path,
        masks_packed=np.packbits(masks, axis=-1),
        shape=np.array([N_FRAMES, H, W]),
        odom_R=np.asarray(oR, np.float32),
        odom_t=np.asarray(ot, np.float32),
        R0=np.asarray(Rs[0], np.float32),
        t0=np.asarray(ts[0], np.float32),
    )
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
