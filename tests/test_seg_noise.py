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

N_FRAMES = 120


def _dilate(mask: np.ndarray, r: int) -> np.ndarray:
    """Binary dilation by a (2r+1)-square via shift-OR (no scipy)."""
    out = mask.copy()
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = np.roll(np.roll(mask, dy, axis=0), dx, axis=1)
            out |= shifted
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
    root, meta = orbit_fixture
    clean = _run(root, meta, tmp_path, "clean")
    ates = {"clean": clean["ate_rmse_m"]}

    for kind in ("dilate2", "erode2", "flip2pct"):
        dst = str(tmp_path / f"fx_{kind}")
        _corrupt_fixture(root, dst, kind)
        ates[kind] = _run(dst, meta, tmp_path, kind)["ate_rmse_m"]

    print(f"seg-noise ATE table: {ates}")
    assert np.isfinite(list(ates.values())).all(), ates
    # clean baseline on the 120-frame orbit (measured ~0.05-0.08 m);
    # corrupted runs must stay bounded — the popup's column smoothing +
    # NMS must absorb boundary-level noise without losing the map
    assert ates["clean"] < 0.20, ates
    for kind in ("dilate2", "erode2", "flip2pct"):
        assert ates[kind] < 0.40, (kind, ates)
