"""Train SegNetLite on synthetic renders and commit the weights.

Round-4 VERDICT "What's missing" #5: SegNetLite existed and
smoke-trained in tests, but no committed checkpoint or accuracy-grade
gate.  This script trains on a diverse synthetic set (corridor + room
worlds, randomized geometry and colors) and writes
``models_data/segnet_lite.npz`` (~1.5 MB), which
``models.load_pretrained_segnet`` loads and
tests/test_models.py::test_pretrained_checkpoint gates at IoU >= 0.9
on held-out frames.

Usage: python scripts/train_segnet.py [steps]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

jax.config.update("jax_compilation_cache_dir", "/tmp/popup_slam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pop_up_slam_tpu.geometry.camera import Intrinsics  # noqa: E402
from pop_up_slam_tpu.io import synthetic  # noqa: E402
from pop_up_slam_tpu.models import (  # noqa: E402
    create_train_state,
    predict_mask,
    train_step,
)

H, W = 96, 128
K = Intrinsics.create(64.0, 64.0, 64.0, 48.0)


def make_batch(key, n=8):
    """Random world + trajectory + colors -> (rgb (n,H,W,3), gt (n,H,W))."""
    k_world, k_traj, k_rgb, k_pick = jax.random.split(key, 4)
    pick = int(jax.random.randint(k_pick, (), 0, 3))
    rng = np.random.default_rng(int(jax.random.randint(k_world, (), 0, 1 << 30)))
    if pick == 0:
        world = synthetic.corridor_world(
            length=float(rng.uniform(6, 14)),
            width=float(rng.uniform(1.5, 3.0)),
        )
        R, t = synthetic.corridor_trajectory(
            n, length=10.0, sway=float(rng.uniform(0, 0.4))
        )
    elif pick == 1:
        world = synthetic.room_world(size=float(rng.uniform(4, 8)))
        R, t = synthetic.orbit_trajectory(n, radius=float(rng.uniform(1.0, 2.0)))
    else:
        world = synthetic.room_world(size=float(rng.uniform(5, 7)))
        R, t = synthetic.corridor_trajectory(n, length=4.0,
                                             sway=float(rng.uniform(0, 0.3)))
    labels, _ = jax.vmap(
        lambda R_, t_: synthetic.render_frame(K, R_, t_, world, H, W)
    )(R, t)
    rgb = jax.vmap(synthetic.render_rgb)(labels, jax.random.split(k_rgb, n))
    return rgb, labels == synthetic.LABEL_GROUND


def iou(pred, gt):
    pred, gt = np.asarray(pred), np.asarray(gt)
    union = (pred | gt).sum()
    return 1.0 if union == 0 else (pred & gt).sum() / union


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    key = jax.random.PRNGKey(0)
    model, params, tx, opt_state = create_train_state(
        key, lr=3e-3, image_hw=(H, W)
    )
    step = jax.jit(lambda p, o, x, y: train_step(model, p, tx, o, x, y))

    t0 = time.time()
    for it in range(steps):
        key, k = jax.random.split(key)
        rgb, gt = make_batch(k)
        params, opt_state, loss = step(params, opt_state, rgb, gt)
        if it % 50 == 0 or it == steps - 1:
            print(f"step {it:4d} loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # held-out eval
    ious = []
    for s in range(5):
        rgb, gt = make_batch(jax.random.PRNGKey(10_000 + s))
        ious.append(iou(predict_mask(model, params, rgb), gt))
    print(f"held-out IoU: {['%.3f' % v for v in ious]} "
          f"min {min(ious):.3f}")

    out_dir = os.path.join(_REPO, "models_data")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "segnet_lite.npz")
    from pop_up_slam_tpu.utils.checkpoint import save_state

    save_state(path, params, meta={"image_hw": [H, W], "steps": steps,
                                   "min_holdout_iou": float(min(ious))})
    print(f"saved {path} ({os.path.getsize(path) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
