"""End-to-end TUM pipeline tests on a synthetic TUM-format fixture
(VERDICT round-2 item 3; SURVEY.md §3.2/§3.5, §4 items 3+5).

The fixture (io/tum_fixture.py) renders the corridor world into a real
on-disk TUM tree — rgb/depth/seg PNGs + index files + groundtruth.txt —
so these tests drive the exact real-data code path of BASELINE config 3:
PNG decode -> stamp association -> mask load (or classical floor-color
segmentation) -> pop-up -> SLAM -> trajectory write -> ATE.
"""

import json
import os

import numpy as np
import pytest

from pop_up_slam_tpu.config import get_config
from pop_up_slam_tpu.io import tum
from pop_up_slam_tpu.io.tum_fixture import write_tum_fixture
from pop_up_slam_tpu.runners.tum_runner import run_tum_sequence

N_FRAMES = 20


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tum_fixture"))
    meta = write_tum_fixture(root, n_frames=N_FRAMES)
    return root, meta


def _cfg(root, meta, tmp_path, **slam_overrides):
    cfg = get_config("tum_fr3", sequence_dir=root,
                     fx=meta["fx"], fy=meta["fy"],
                     cx=meta["cx"], cy=meta["cy"],
                     height=meta["height"], width=meta["width"])
    from pop_up_slam_tpu.popup.popup import PopupConfig

    slam = cfg.slam._replace(
        window_size=4, max_landmarks=32, kf_trans=0.05, kf_rot=0.05,
        gn_iters=3, **slam_overrides,
    )
    return cfg._replace(
        slam=slam,
        popup=PopupConfig(min_cols=6, smooth_radius=2, nms_radius=4),
        out_trajectory=str(tmp_path / "traj.txt"),
        metrics_path=str(tmp_path / "metrics.jsonl"),
    )


def test_load_sequence_and_association(fixture_dir):
    root, meta = fixture_dir
    seq = tum.load_sequence(root)
    assert len(seq.rgb_files) == N_FRAMES
    assert len(seq.depth_files) == N_FRAMES
    assert seq.gt is not None and seq.gt.stamps.shape[0] == N_FRAMES
    assert seq.seg_files is not None
    assert all(s is not None for s in seq.seg_files)

    pairs, R, t = tum.gt_poses_at(seq, seq.rgb_stamps)
    assert len(pairs) == N_FRAMES   # jittered stamps still associate
    np.testing.assert_allclose(t, meta["t_wc"], atol=1e-5)

    img = tum.load_image(seq, seq.rgb_files[0])
    assert img.shape == (meta["height"], meta["width"], 3)
    d = tum.load_depth(seq, seq.depth_files[0])
    assert d.shape == (meta["height"], meta["width"])
    assert 0.5 < np.median(d[d < 12.0]) < 12.0


def test_gt_perturb_end_to_end(fixture_dir, tmp_path):
    root, meta = fixture_dir
    cfg = _cfg(root, meta, tmp_path)
    summary = run_tum_sequence(cfg, odometry="gt_perturb",
                               odom_sigma_t=0.01, odom_sigma_r=0.003)
    assert summary["frames"] == N_FRAMES
    ate = summary["ate_rmse_m"]
    assert np.isfinite(ate) and ate < 0.25, summary

    # trajectory written in TUM format and re-loadable
    traj = tum.read_trajectory(cfg.out_trajectory)
    assert traj.t.shape[0] == N_FRAMES

    # metrics JSONL written with per-frame records
    with open(cfg.metrics_path) as f:
        records = [json.loads(line) for line in f if line.strip()]
    assert len(records) == N_FRAMES - 1
    assert all("n_kf" in r for r in records)


def test_classical_segmentation_fallback(fixture_dir, tmp_path):
    """Without seg/, the floor-color model segments the rendered frames
    well enough for the run to complete with finite ATE."""
    root, meta = fixture_dir
    noseg = str(tmp_path / "noseg")
    write_tum_fixture(noseg, n_frames=10, write_seg=False)
    cfg = _cfg(noseg, meta, tmp_path)
    summary = run_tum_sequence(cfg, odometry="gt_perturb",
                               odom_sigma_t=0.005, odom_sigma_r=0.002)
    assert np.isfinite(summary["ate_rmse_m"]), summary


def test_checkpoint_roundtrip_state(fixture_dir, tmp_path):
    """SlamState round-trips through save_state/load_state bit-exactly
    (SURVEY.md §5 "Checkpoint / resume")."""
    import jax.numpy as jnp

    from pop_up_slam_tpu.pipeline import slam_init
    from pop_up_slam_tpu.pipeline.slam import SlamConfig
    from pop_up_slam_tpu.utils.checkpoint import load_state, save_state

    scfg = SlamConfig(window_size=4, max_landmarks=16, max_det=5)
    state = slam_init(scfg, jnp.eye(3), jnp.array([1.0, 2.0, 3.0]))
    path = str(tmp_path / "state.npz")
    save_state(path, state, meta={"frame": 7})
    restored, meta = load_state(path, slam_init(scfg, jnp.eye(3),
                                                jnp.zeros(3)))
    assert meta == {"frame": 7}
    import jax

    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_matches_uninterrupted(fixture_dir, tmp_path):
    """Interrupt mid-sequence, resume from the snapshot: the final
    trajectory and ATE must match the uninterrupted run."""
    root, meta = fixture_dir
    ck = str(tmp_path / "ck.npz")

    cfg_full = _cfg(root, meta, tmp_path)._replace(
        out_trajectory=str(tmp_path / "full.txt"), metrics_path="")
    full = run_tum_sequence(cfg_full, odometry="gt_perturb",
                            odom_sigma_t=0.01, odom_sigma_r=0.003)

    half = N_FRAMES // 2
    cfg_a = cfg_full._replace(out_trajectory="", checkpoint_path=ck,
                              checkpoint_every=half)
    run_tum_sequence(cfg_a, odometry="gt_perturb",
                     odom_sigma_t=0.01, odom_sigma_r=0.003,
                     max_frames=half + 1)

    cfg_b = cfg_full._replace(
        out_trajectory=str(tmp_path / "resumed.txt"), resume=ck)
    resumed = run_tum_sequence(cfg_b, odometry="gt_perturb",
                               odom_sigma_t=0.01, odom_sigma_r=0.003)

    tr_full = tum.read_trajectory(cfg_full.out_trajectory)
    tr_res = tum.read_trajectory(cfg_b.out_trajectory)
    np.testing.assert_allclose(tr_res.t, tr_full.t, atol=1e-4)
    assert abs(resumed["ate_rmse_m"] - full["ate_rmse_m"]) < 1e-3

    # resuming in a different odometry mode must be rejected
    with pytest.raises(ValueError):
        run_tum_sequence(cfg_b, odometry="constant_velocity")


@pytest.mark.slow
def test_constant_velocity_and_plane_vo(fixture_dir, tmp_path):
    """The two external-odometry-free modes complete with finite ATE,
    and fully-monocular plane-VO beats the constant-velocity prior
    (which has no image information at all)."""
    root, meta = fixture_dir
    cfg = _cfg(root, meta, tmp_path)
    cv = run_tum_sequence(cfg, odometry="constant_velocity")
    assert np.isfinite(cv["ate_rmse_m"]), cv
    vo = run_tum_sequence(cfg, odometry="plane_vo")
    assert np.isfinite(vo["ate_rmse_m"]), vo
    assert vo["ate_rmse_m"] <= cv["ate_rmse_m"] + 1e-6, (vo, cv)
