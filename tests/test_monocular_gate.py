"""Fully-monocular headline accuracy gate (round-3 VERDICT item 6).

A long loopy sequence — 200 frames orbiting inside the partitioned
room, sliding window overflowing ~constantly — run end-to-end through
the real-data TUM path with ``odometry="plane_vo"`` (no ground-truth
perturbation, no external odometry: the relative motion comes entirely
from frame-to-frame plane alignment).  The gate is an *absolute* ATE
bound, so marginalization + VO drift regressions fail the suite
instead of hiding behind the relative "<= constant-velocity" check in
tests/test_tum_runner.py.

The bound is calibrated against the measured baseline on this fixture
(see the assertion message) with ~2x headroom; the reference operates
monocularly on TUM sequences the same way (paper arXiv:1703.07334
SSI/SSV; SURVEY.md SS0 item 7 — reference mount empty, no file:line
possible).
"""

import numpy as np
import pytest

from pop_up_slam_tpu.config import get_config
from pop_up_slam_tpu.io.tum_fixture import write_tum_fixture
from pop_up_slam_tpu.popup.popup import PopupConfig
from pop_up_slam_tpu.runners.tum_runner import run_tum_sequence

N_FRAMES = 200
ATE_BOUND_M = 0.25  # hard gate; round-5 measured baseline 0.166 m


@pytest.fixture(scope="module")
def orbit_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tum_orbit"))
    meta = write_tum_fixture(root, n_frames=N_FRAMES, scene="room_orbit",
                             height=240, width=320, fx=240.0, fy=240.0)
    return root, meta


@pytest.mark.slow
def test_monocular_long_sequence_ate_gate(orbit_fixture, tmp_path):
    root, meta = orbit_fixture
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
        out_trajectory=str(tmp_path / "traj.txt"),
    )
    summary = run_tum_sequence(cfg, odometry="plane_vo")
    ate = summary["ate_rmse_m"]
    assert np.isfinite(ate), summary
    # window must have overflowed many times (marginalization in play)
    assert summary["n_keyframes"] > 4 * slam.window_size, summary
    assert ate < ATE_BOUND_M, (
        f"monocular ATE regressed: {ate:.3f} m >= {ATE_BOUND_M} m "
        f"(round-5 measured baseline 0.166 m on the 200-frame room orbit; "
        f"a round-4 note recorded 0.072 m, not reproducible on the current "
        f"pipeline — the hard gate is the contract); "
        f"summary={summary}"
    )
