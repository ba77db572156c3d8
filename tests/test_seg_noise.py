"""Segmentation-noise robustness gate (round-4 VERDICT next-round #7).

The real TUM sequences arrive with CNN segmentation whose ground-wall
boundary is noisy (paper arXiv:1703.07334 §III-A discusses CNN noise
tolerance; reference mount empty).  This gate corrupts the fixture's
precomputed ground masks — boundary dilation, erosion, and random
pixel flips — and bounds the fully-monocular (plane-VO) ATE
degradation.  The measured noise→ATE table lives in PARITY.md.
"""

import os
import shutil

import numpy as np
import pytest

from pop_up_slam_tpu.config import get_config
from pop_up_slam_tpu.io.tum_fixture import write_tum_fixture
from pop_up_slam_tpu.popup.popup import PopupConfig
from pop_up_slam_tpu.runners.tum_runner import run_tum_sequence

N_FRAMES = 200


def _dilate(mask: np.ndarray, r: int) -> np.ndarray:
    """Binary dilation by a (2r+1)-square via padded shift-OR (no
    scipy; edge padding — np.roll would wrap the bottom ground rows to
    the image top and destroy the boundary)."""
    H, W = mask.shape
    p = np.pad(mask, r, mode="edge")
    out = np.zeros_like(mask)
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            out |= p[dy:dy + H, dx:dx + W]
    return out


def _erode(mask: np.ndarray, r: int) -> np.ndarray:
    return ~_dilate(~mask, r)


def _flip(mask: np.ndarray, frac: float, rng) -> np.ndarray:
    noise = rng.random(mask.shape) < frac
    return mask ^ noise


def _corrupt_fixture(src: str, dst: str, kind: str, seed: int = 0):
    """Copy a TUM fixture, corrupting every seg/ mask."""
    from PIL import Image

    shutil.copytree(src, dst)
    rng = np.random.default_rng(seed)
    seg_dir = os.path.join(dst, "seg")
    for name in sorted(os.listdir(seg_dir)):
        p = os.path.join(seg_dir, name)
        m = np.asarray(Image.open(p)) > 127
        if m.ndim == 3:
            m = m[..., 0]
        if kind == "dilate2":
            m2 = _dilate(m, 2)
        elif kind == "erode2":
            m2 = _erode(m, 2)
        elif kind == "flip2pct":
            m2 = _flip(m, 0.02, rng)
        else:
            raise ValueError(kind)
        Image.fromarray((m2 * 255).astype(np.uint8)).save(p)


@pytest.fixture(scope="module")
def orbit_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tum_orbit_noise"))
    meta = write_tum_fixture(root, n_frames=N_FRAMES, scene="room_orbit",
                             height=240, width=320, fx=240.0, fy=240.0)
    return root, meta


def _run(root, meta, tmp_path, tag):
    cfg = get_config("tum_fr3", sequence_dir=root,
                     fx=meta["fx"], fy=meta["fy"],
                     cx=meta["cx"], cy=meta["cy"],
                     height=meta["height"], width=meta["width"])
    slam = cfg.slam._replace(
        window_size=6, max_landmarks=32, kf_trans=0.05, kf_rot=0.05,
        gn_iters=3,
    )
    cfg = cfg._replace(
        slam=slam,
        popup=PopupConfig(min_cols=10, smooth_radius=4, nms_radius=6),
        out_trajectory=str(tmp_path / f"traj_{tag}.txt"),
    )
    return run_tum_sequence(cfg, odometry="plane_vo")


@pytest.mark.slow
def test_segmentation_noise_ate_gate(orbit_fixture, tmp_path):
    """Measured round-5 baseline on the 200-frame monocular orbit
    (medians of this fixture; PARITY.md table):

        clean     0.166 m   (n_kf  76)
        dilate2   0.573 m   (n_kf  94)   boundary shifted 2 px out
        erode2    0.764 m   (n_kf 100)   boundary shifted 2 px in
        flip2pct  2.43 m    (n_kf 163)   2% uniform salt — far beyond
                                         CNN-level noise; survival run

    Boundary-level corruption (the realistic CNN failure mode, paper
    §III-A) degrades ATE ~3-5x but keeps the system tracking; uniform
    2% salt used to KILL the front-end outright (0 keyframes, VO dead)
    until extract_boundary's windowed-support rule — the gate pins
    bounded-degradation + survival, with ~30% headroom on each row."""
    root, meta = orbit_fixture
    results = {"clean": _run(root, meta, tmp_path, "clean")}

    for kind in ("dilate2", "erode2", "flip2pct"):
        dst = str(tmp_path / f"fx_{kind}")
        _corrupt_fixture(root, dst, kind)
        results[kind] = _run(dst, meta, tmp_path, kind)

    ates = {k: s["ate_rmse_m"] for k, s in results.items()}
    print(f"seg-noise ATE table: {ates}")
    assert np.isfinite(list(ates.values())).all(), ates
    assert ates["clean"] < 0.25, ates
    # boundary-level noise: bounded accuracy degradation
    assert ates["dilate2"] < 1.0, ates
    assert ates["erode2"] < 1.0, ates
    # severe uniform salt: the system must keep tracking (survival)
    assert results["flip2pct"]["n_keyframes"] > 20, results["flip2pct"]
    assert ates["flip2pct"] < 4.0, ates
