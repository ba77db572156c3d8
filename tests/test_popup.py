"""Pop-up front-end tests (SURVEY.md §4 item 3; BASELINE config 1).

Renders a synthetic corridor frame (ray-cast ground truth), runs the
pop-up on the ground mask, and checks recovered plane equations and the
dense depth map against the renderer.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pop_up_slam_tpu.geometry.camera import Intrinsics
from pop_up_slam_tpu.io import synthetic
from pop_up_slam_tpu.popup import popup as pp

K = Intrinsics.create(320.0, 320.0, 320.0, 240.0)
H, W = 480, 640


@pytest.fixture(scope="module")
def corridor_frame():
    world = synthetic.corridor_world()
    R, t = synthetic.corridor_trajectory(1)
    R0, t0 = R[0], t[0]
    labels, depth_gt = synthetic.render_frame(K, R0, t0, world, H, W)
    ground = labels == synthetic.LABEL_GROUND
    return world, R0, t0, labels, depth_gt, ground


class TestBoundary:
    def test_boundary_extraction(self, corridor_frame):
        _, _, _, labels, _, ground = corridor_frame
        v_b, ok = pp.extract_boundary(ground)
        v_b, ok = np.asarray(v_b), np.asarray(ok)
        lab = np.asarray(labels)
        # Wherever ok, the pixel at (v_b, u) is ground and the pixel just
        # above is not ground.
        for u in range(0, W, 37):
            if ok[u]:
                v = int(v_b[u])
                assert lab[v, u] == synthetic.LABEL_GROUND
                if v > 0:
                    assert lab[v - 1, u] != synthetic.LABEL_GROUND


class TestPopup:
    def test_recovers_corridor_planes(self, corridor_frame):
        world, R0, t0, _, _, ground = corridor_frame
        res = pp.pop_up(K, ground, R0, t0)
        valid = np.asarray(res.valid)
        assert valid.sum() == 3  # left, right, end walls
        gt = np.asarray(world.planes())[:3]
        est = np.asarray(res.planes_w)[valid]
        for e in est:
            err = min(
                min(np.linalg.norm(e - g), np.linalg.norm(e + g)) for g in gt
            )
            assert err < 0.03, (e, err)

    def test_camera_frame_consistency(self, corridor_frame):
        world, R0, t0, _, _, ground = corridor_frame
        res = pp.pop_up(K, ground, R0, t0)
        from pop_up_slam_tpu.geometry import plane as plane_mod, se3
        R_cw, t_cw = se3.se3_inverse(R0, t0)
        expect = plane_mod.transform(res.planes_w, R_cw, t_cw)
        np.testing.assert_allclose(
            np.asarray(res.planes_c), np.asarray(expect), atol=1e-5
        )

    def test_depth_recovery(self, corridor_frame):
        world, R0, t0, labels, depth_gt, ground = corridor_frame
        res = pp.pop_up(K, ground, R0, t0)
        d = pp.depth_from_popup(K, res, ground, R0, t0)
        d = np.asarray(d)
        gt = np.asarray(depth_gt)
        m = gt < 40.0  # exclude sky
        rel = np.abs(d[m] - gt[m]) / gt[m]
        assert np.median(rel) < 0.02, np.median(rel)
        assert np.percentile(rel, 95) < 0.05, np.percentile(rel, 95)

    def test_vmaps_over_frames(self, corridor_frame):
        world, _, _, _, _, _ = corridor_frame
        import jax

        R, t = synthetic.corridor_trajectory(3)
        K2 = Intrinsics.create(80.0, 80.0, 80.0, 60.0)  # scaled for 120x160
        labels, _ = jax.vmap(
            lambda R_, t_: synthetic.render_frame(K2, R_, t_, world, 120, 160)
        )(R, t)
        masks = labels == synthetic.LABEL_GROUND
        cfg = pp.PopupConfig(min_cols=6, smooth_radius=3, nms_radius=5)
        res = jax.vmap(lambda m, R_, t_: pp.pop_up(K2, m, R_, t_, cfg))(
            masks, R, t
        )
        assert res.planes_w.shape == (3, cfg.max_segments, 4)
        assert bool(res.valid.any())


class TestMultiLevel:
    """Multi-level boundaries (PopupConfig.levels > 1): a low obstacle
    splits a column's ground into two runs — the classic single-level
    boundary sees only the far run and misses the obstacle entirely."""

    def _world_with_obstacle(self):
        # corridor + a 0.4 m tall crate spanning the width at y = 4
        return synthetic.make_world(
            [
                ((-1.0, 0.0), (-1.0, 10.0)),       # left wall
                ((1.0, 0.0), (1.0, 10.0)),         # right wall
                ((-1.0, 10.0), (1.0, 10.0)),       # end wall
                ((-1.0, 4.0), (1.0, 4.0)),         # low obstacle
            ],
            heights=[2.5, 2.5, 2.5, 0.4],
        )

    def _frame(self):
        K2 = Intrinsics.create(160.0, 160.0, 160.0, 120.0)
        world = self._world_with_obstacle()
        R, t = synthetic.corridor_trajectory(1)
        labels, _ = synthetic.render_frame(K2, R[0], t[0], world, 240, 320)
        return K2, world, R[0], t[0], labels == synthetic.LABEL_GROUND

    def test_extract_boundaries_finds_two_runs(self):
        _, _, _, _, ground = self._frame()
        v, ok = pp.extract_boundaries(np.asarray(ground), 2, 2)
        v, ok = np.asarray(v), np.asarray(ok)
        mid = ground.shape[1] // 2
        # center columns see ground behind the obstacle AND in front
        assert ok[0, mid] and ok[1, mid]
        assert v[0, mid] < v[1, mid]

    def test_two_level_popup_recovers_obstacle_plane(self):
        K2, world, R0, t0, ground = self._frame()
        cfg1 = pp.PopupConfig(levels=1)
        cfg2 = pp.PopupConfig(levels=2)
        res1 = pp.pop_up(K2, ground, R0, t0, cfg1)
        res2 = pp.pop_up(K2, ground, R0, t0, cfg2)

        def best_err(res, gt_plane):
            est = np.asarray(res.planes_w)[np.asarray(res.valid)]
            if est.size == 0:
                return np.inf
            return min(
                min(np.linalg.norm(e - gt_plane), np.linalg.norm(e + gt_plane))
                for e in est
            )

        obstacle = np.asarray(world.planes())[3]
        end_wall = np.asarray(world.planes())[2]
        # two-level finds the obstacle front plane; single-level has no
        # boundary there (its closest valid plane is a spurious edge
        # segment several times farther off)
        assert best_err(res2, obstacle) < 0.05, best_err(res2, obstacle)
        assert best_err(res1, obstacle) > 2.0 * best_err(res2, obstacle)
        # both still find the end wall (the far run's boundary)
        assert best_err(res2, end_wall) < 0.05
        assert res2.planes_w.shape[0] == 2 * cfg2.max_segments
