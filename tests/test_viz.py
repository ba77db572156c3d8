"""Visualization/export tests (SURVEY.md §2.1 "Visualization" — the
rviz-marker/cloud/path publishers become PLY + PNG exports)."""

import numpy as np

from pop_up_slam_tpu.viz import (
    depth_to_pointcloud,
    plane_map_to_meshes,
    plot_topdown,
    write_ply,
)
from pop_up_slam_tpu.geometry.camera import Intrinsics


def _demo_map():
    endpoints = np.zeros((4, 2, 3))
    endpoints[0] = [[0, 0, 0], [4, 0, 0]]
    endpoints[1] = [[4, 0, 0], [4, 3, 0]]
    endpoints[2] = [[0, 3, 0], [4, 3, 0]]
    valid = np.array([True, True, True, False])
    return endpoints, valid


def test_meshes_from_plane_map():
    endpoints, valid = _demo_map()
    verts, quads, colors = plane_map_to_meshes(endpoints, valid,
                                               wall_height=2.0)
    # 3 walls + 1 ground quad
    assert quads.shape == (4, 4)
    assert verts.shape[0] == 16
    assert colors.shape == (4, 3)
    # wall tops at z = 2
    assert np.isclose(verts[:, 2].max(), 2.0)


def test_write_ply_roundtrip(tmp_path):
    endpoints, valid = _demo_map()
    verts, quads, colors = plane_map_to_meshes(endpoints, valid)
    traj = np.array([[0.5, 1.0, 1.2], [1.0, 1.1, 1.2], [1.5, 1.3, 1.2]])
    cloud = np.random.default_rng(0).uniform(0, 3, (50, 3))
    p = str(tmp_path / "map.ply")
    write_ply(p, verts, quads, face_colors=colors, trajectory=traj,
              cloud=cloud)
    text = open(p).read()
    lines = text.splitlines()
    assert lines[0] == "ply"
    nv = int([l for l in lines if l.startswith("element vertex")][0].split()[-1])
    nf = int([l for l in lines if l.startswith("element face")][0].split()[-1])
    ne = int([l for l in lines if l.startswith("element edge")][0].split()[-1])
    assert nv == len(verts) + len(traj) + len(cloud)
    assert nf == len(quads)
    assert ne == len(traj) - 1
    body = lines[lines.index("end_header") + 1:]
    assert len([l for l in body if l.strip()]) == nv + nf + ne


def test_depth_to_pointcloud():
    K = Intrinsics.create(40.0, 40.0, 20.0, 16.0)
    depth = np.full((32, 40), 2.0)
    R = np.eye(3)
    t = np.array([1.0, 2.0, 3.0])
    pts = depth_to_pointcloud(depth, K, R, t, stride=8)
    assert pts.shape[1] == 3 and len(pts) > 0
    # all points at camera-frame z=2 -> world z = 3 + 2 = 5 with R=I
    np.testing.assert_allclose(pts[:, 2], 5.0, atol=1e-6)


def test_plot_topdown_writes_png(tmp_path):
    endpoints, valid = _demo_map()
    traj = np.array([[0.5, 1.0, 0], [1.0, 1.1, 0], [1.5, 1.3, 0]])
    p = str(tmp_path / "map.png")
    plot_topdown(p, endpoints, valid, trajectory=traj,
                 gt_trajectory=traj + 0.05)
    import os

    assert os.path.getsize(p) > 1000
