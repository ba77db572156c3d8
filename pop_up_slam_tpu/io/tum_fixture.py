"""Synthesize a TUM-RGBD-format sequence directory from the corridor world.

The reference is driven by real TUM rosbags (SURVEY.md §3.2/§3.5);
its test strategy is "run on TUM sequences and compare ATE" (SURVEY.md
§4).  No TUM data ships with this repo, so this module renders the
synthetic corridor (io/synthetic.py) into an on-disk tree with the
exact TUM layout:

    root/
      rgb.txt   depth.txt   groundtruth.txt
      rgb/<stamp>.png       (8-bit RGB, low-texture corridor look)
      depth/<stamp>.png     (16-bit, 5000 counts/m — TUM convention)
      seg/<stamp>.png       (optional precomputed ground masks)

so `io.tum.load_sequence` + `runners.tum_runner.run_tum_sequence` run
the full real-data code path (index parsing, PNG decode, stamp
association, mask loading, trajectory writing, ATE) end-to-end without
network access.  PNGs go through the native C++ codec when built, PIL
otherwise.
"""

from __future__ import annotations

import os

import numpy as np


def _write_png(path: str, img: np.ndarray) -> None:
    from . import native_loader

    if native_loader.available():
        native_loader.encode_png(path, img)
        return
    from PIL import Image

    Image.fromarray(img).save(path)


def write_tum_fixture(
    root: str,
    n_frames: int = 24,
    height: int = 120,
    width: int = 160,
    fx: float = 120.0,
    fy: float = 120.0,
    seed: int = 0,
    write_seg: bool = True,
    write_depth: bool = True,
    fps: float = 30.0,
    gt_stamp_jitter: float = 0.004,
    scene: str = "corridor",
):
    """Render and write a TUM-format synthetic sequence.

    Returns a dict with the camera intrinsics and ground-truth poses
    (``R_wc`` (N,3,3), ``t_wc`` (N,3), ``stamps`` (N,)) for assertions.
    ``gt_stamp_jitter`` offsets groundtruth stamps from frame stamps so
    the nearest-stamp association path is actually exercised.

    ``scene``: ``"corridor"`` — the straight swaying corridor walk;
    ``"room_orbit"`` — a slow 1.5-pi turn inside the partitioned room
    (loopy trajectory: walls leave and re-enter view, the sliding
    window overflows many times over a long sequence — the monocular
    drift gate of tests/test_monocular_gate.py).
    """
    import jax

    from ..geometry.camera import Intrinsics
    from . import synthetic
    from .tum import rotmat_to_quat_np

    cx, cy = width / 2.0, height / 2.0
    K = Intrinsics.create(fx, fy, cx, cy)
    if scene == "corridor":
        world = synthetic.corridor_world()
        Rs, ts = synthetic.corridor_trajectory(n_frames, sway=0.3)
    elif scene == "room_orbit":
        # Plain square room (no interior partition — it would occlude
        # half the orbit at point-blank range) sized so the wall-ground
        # junction stays inside the image: wall distance 3.2-4.8 m from
        # a 0.8 m-radius orbit at 1.0 m camera height projects the
        # junction to v ~ cy + fy*1.0/3.2, well above the bottom edge.
        s = 4.0
        world = synthetic.make_world(
            [((-s, -s), (s, -s)), ((s, -s), (s, s)),
             ((s, s), (-s, s)), ((-s, s), (-s, -s))],
            heights=2.5,
        )
        Rs, ts = synthetic.orbit_trajectory(
            n_frames, radius=0.8, cam_height=1.0
        )
    else:
        raise ValueError(f"unknown scene {scene!r}")
    labels, depth = jax.jit(
        jax.vmap(
            lambda R, t: synthetic.render_frame(K, R, t, world, height, width)
        )
    )(Rs, ts)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_frames)
    rgb = jax.jit(jax.vmap(synthetic.render_rgb))(labels, keys)

    labels = np.asarray(labels)
    depth = np.asarray(depth)
    rgb8 = (np.asarray(rgb) * 255.0 + 0.5).astype(np.uint8)

    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    if write_depth:
        os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    if write_seg:
        os.makedirs(os.path.join(root, "seg"), exist_ok=True)

    stamps = 1000.0 + np.arange(n_frames) / fps
    rgb_lines, depth_lines = [], []
    for i, s in enumerate(stamps):
        name = f"{s:.6f}.png"
        _write_png(os.path.join(root, "rgb", name), rgb8[i])
        rgb_lines.append(f"{s:.6f} rgb/{name}")
        if write_depth:
            d16 = np.clip(depth[i] * 5000.0, 0, 65535).astype(np.uint16)
            _write_png(os.path.join(root, "depth", name), d16)
            depth_lines.append(f"{s:.6f} depth/{name}")
        if write_seg:
            mask = (
                (labels[i] == synthetic.LABEL_GROUND) * np.uint8(255)
            ).astype(np.uint8)
            _write_png(os.path.join(root, "seg", name), mask)

    def _index(path, header, lines):
        with open(os.path.join(root, path), "w") as f:
            f.write(f"# {header}\n# synthetic corridor fixture\n")
            f.write("\n".join(lines) + "\n")

    _index("rgb.txt", "color images", rgb_lines)
    if write_depth:
        _index("depth.txt", "depth maps", depth_lines)

    R_np, t_np = np.asarray(Rs), np.asarray(ts)
    q = rotmat_to_quat_np(R_np)
    gt_stamps = stamps + gt_stamp_jitter
    gt_lines = [
        f"{gs:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
        f"{qi[0]:.6f} {qi[1]:.6f} {qi[2]:.6f} {qi[3]:.6f}"
        for gs, t, qi in zip(gt_stamps, t_np, q)
    ]
    _index("groundtruth.txt", "ground truth trajectory", gt_lines)

    return {
        "fx": fx, "fy": fy, "cx": cx, "cy": cy,
        "height": height, "width": width,
        "R_wc": R_np, "t_wc": t_np, "stamps": stamps,
    }
