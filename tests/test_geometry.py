"""Unit tests for the geometry core (SURVEY.md §4 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pop_up_slam_tpu.geometry import se3, plane, camera


def rand(key, *shape):
    return jax.random.normal(key, shape)


class TestSO3:
    def test_exp_log_roundtrip(self):
        keys = jax.random.split(jax.random.PRNGKey(0), 64)
        phi = jax.vmap(lambda k: jax.random.normal(k, (3,)))(keys)
        # log returns the wrapped representative with angle in [0, pi]:
        # compare through exp, and compare vectors only where |phi| < pi.
        R = se3.so3_exp(phi)
        phi2 = se3.so3_log(R)
        np.testing.assert_allclose(R, se3.so3_exp(phi2), atol=1e-4)
        small = np.linalg.norm(np.asarray(phi), axis=-1) < np.pi - 1e-3
        np.testing.assert_allclose(phi[small], phi2[small], atol=1e-4)

    def test_exp_small_angle(self):
        phi = jnp.array([1e-9, -1e-9, 1e-10])
        R = se3.so3_exp(phi)
        np.testing.assert_allclose(R, jnp.eye(3), atol=1e-6)
        assert np.all(np.isfinite(se3.so3_log(R)))

    def test_exp_is_rotation(self):
        phi = jnp.array([0.3, -1.2, 2.9])
        R = se3.so3_exp(phi)
        np.testing.assert_allclose(R @ R.T, jnp.eye(3), atol=1e-5)
        assert abs(float(jnp.linalg.det(R)) - 1.0) < 1e-5

    def test_near_pi_angle(self):
        axis = jnp.array([1.0, 0.0, 0.0])
        phi = axis * (np.pi - 1e-4)
        R = se3.so3_exp(phi)
        phi2 = se3.so3_log(R)
        np.testing.assert_allclose(phi, phi2, atol=1e-3)

    def test_quat_roundtrip(self):
        phi = jnp.array([[0.1, 0.2, 0.3], [2.0, -1.0, 0.5], [0.0, 0.0, 3.1]])
        R = se3.so3_exp(phi)
        q = se3.rotmat_to_quat(R)
        R2 = se3.quat_to_rotmat(q)
        np.testing.assert_allclose(R, R2, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jnp.array([[0.5, -0.2, 1.0, 0.3, -1.2, 0.8],
                        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
                        [1e-8, 2e-8, 0.0, 1e-9, 0.0, 0.0]])
        R, t = se3.se3_exp(xi)
        xi2 = se3.se3_log(R, t)
        np.testing.assert_allclose(xi, xi2, atol=1e-5)

    def test_compose_inverse(self):
        xi = jnp.array([0.5, -0.2, 1.0, 0.3, -1.2, 0.8])
        R, t = se3.se3_exp(xi)
        Ri, ti = se3.se3_inverse(R, t)
        Rc, tc = se3.se3_compose(R, t, Ri, ti)
        np.testing.assert_allclose(Rc, jnp.eye(3), atol=1e-6)
        np.testing.assert_allclose(tc, jnp.zeros(3), atol=1e-6)

    def test_between(self):
        xa = jnp.array([0.1, 0.2, 0.3, 0.1, -0.2, 0.3])
        xb = jnp.array([-0.5, 1.0, 0.2, 0.4, 0.1, -0.6])
        Ra, ta = se3.se3_exp(xa)
        Rb, tb = se3.se3_exp(xb)
        Rab, tab = se3.se3_between(Ra, ta, Rb, tb)
        Rb2, tb2 = se3.se3_compose(Ra, ta, Rab, tab)
        np.testing.assert_allclose(Rb, Rb2, atol=1e-6)
        np.testing.assert_allclose(tb, tb2, atol=1e-6)

    def test_retract_consistent_with_log(self):
        xi = jnp.array([0.1, 0.2, 0.3, 0.05, -0.1, 0.15])
        R0, t0 = se3.se3_exp(jnp.zeros(6))
        R1, t1 = se3.se3_retract(R0, t0, xi)
        np.testing.assert_allclose(se3.se3_log(R1, t1), xi, atol=1e-6)


class TestPlane:
    def test_normalize_unit(self):
        pi = plane.normalize(jnp.array([3.0, 0.0, 0.0, 4.0]))
        np.testing.assert_allclose(jnp.linalg.norm(pi), 1.0, atol=1e-6)

    def test_normalize_antipodal(self):
        pi = jnp.array([0.3, -0.5, 0.2, 0.7])
        a = plane.normalize(pi)
        b = plane.normalize(-pi)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_tangent_basis_orthonormal(self):
        keys = jax.random.split(jax.random.PRNGKey(1), 32)
        pis = plane.normalize(jax.vmap(lambda k: jax.random.normal(k, (4,)))(keys))
        B = plane.tangent_basis(pis)
        BtB = jnp.swapaxes(B, -1, -2) @ B
        np.testing.assert_allclose(BtB, jnp.broadcast_to(jnp.eye(3), BtB.shape), atol=1e-5)
        # tangent: B^T pi = 0
        proj = (jnp.swapaxes(B, -1, -2) @ pis[..., None])[..., 0]
        np.testing.assert_allclose(proj, jnp.zeros_like(proj), atol=1e-5)

    def test_retract_local_roundtrip(self):
        pi = plane.normalize(jnp.array([0.2, -0.8, 0.4, 1.5]))
        delta = jnp.array([0.01, -0.02, 0.015])
        pi2 = plane.retract(pi, delta)
        d2 = plane.local(pi, pi2)
        np.testing.assert_allclose(delta, d2, atol=1e-3)

    def test_local_antipodal(self):
        pi = plane.normalize(jnp.array([0.2, -0.8, 0.4, 1.5]))
        d = plane.local(pi, -pi)
        np.testing.assert_allclose(d, jnp.zeros(3), atol=1e-6)

    def test_transform_roundtrip(self):
        xi = jnp.array([0.5, -0.2, 1.0, 0.3, -1.2, 0.8])
        R_wc, t_wc = se3.se3_exp(xi)  # world-from-camera
        R_cw, t_cw = se3.se3_inverse(R_wc, t_wc)
        pi_w = plane.normalize(jnp.array([0.1, 0.9, -0.3, 2.0]))
        pi_c = plane.transform(pi_w, R_cw, t_cw)
        pi_w2 = plane.transform_to_world(pi_c, R_wc, t_wc)
        np.testing.assert_allclose(pi_w, pi_w2, atol=1e-5)

    def test_transform_preserves_incidence(self):
        # A point on the plane stays on the transformed plane.
        xi = jnp.array([0.5, -0.2, 1.0, 0.3, -1.2, 0.8])
        R_cw, t_cw = se3.se3_exp(xi)
        n = jnp.array([0.0, 0.0, 1.0])
        d = -2.0  # plane z = 2
        pi_w = plane.from_normal_distance(n, jnp.array(d))
        p_w = jnp.array([1.0, 5.0, 2.0])
        assert abs(float(plane.point_to_plane_distance(pi_w, p_w))) < 1e-6
        p_c = se3.se3_apply(R_cw, t_cw, p_w)
        pi_c = plane.transform(pi_w, R_cw, t_cw)
        assert abs(float(plane.point_to_plane_distance(pi_c, p_c))) < 1e-5

    def test_normal_angle(self):
        a = plane.from_normal_distance(jnp.array([1.0, 0.0, 0.0]), jnp.array(1.0))
        b = plane.from_normal_distance(jnp.array([0.0, 1.0, 0.0]), jnp.array(1.0))
        np.testing.assert_allclose(plane.normal_angle(a, b), np.pi / 2, atol=1e-6)
        np.testing.assert_allclose(plane.normal_angle(a, a), 0.0, atol=1e-3)


class TestCamera:
    K = camera.Intrinsics.create(525.0, 525.0, 319.5, 239.5)

    def test_project_backproject(self):
        uv = jnp.array([[100.0, 200.0], [319.5, 239.5], [600.0, 50.0]])
        rays = camera.pixel_rays(self.K, uv)
        depth = jnp.array([2.0, 1.0, 5.0])
        pts = rays * depth[:, None]
        uv2 = camera.project(self.K, pts)
        np.testing.assert_allclose(uv, uv2, atol=1e-4)

    def test_ray_plane_depth(self):
        # plane z = 3 in camera frame: (0,0,1,-3)
        pi = jnp.array([0.0, 0.0, 1.0, -3.0])
        uv = jnp.array([[319.5, 239.5]])
        rays = camera.pixel_rays(self.K, uv)
        s, valid = camera.ray_plane_depth(rays, pi)
        assert bool(valid[0])
        np.testing.assert_allclose(s[0], 3.0, atol=1e-5)

    def test_backproject_to_ground(self):
        # Camera at height 1.5 looking along +y world, world +z up.
        # R_wc maps camera axes (x right, y down, z forward) to world:
        # cam x -> world +x, cam y -> world -z, cam z -> world +y
        R_wc = jnp.array([[1.0, 0.0, 0.0],
                          [0.0, 0.0, 1.0],
                          [0.0, -1.0, 0.0]])
        t_wc = jnp.array([0.0, 0.0, 1.5])
        ground = jnp.array([0.0, 0.0, 1.0, 0.0])  # z=0
        # pixel below center looks downward-forward
        uv = jnp.array([[319.5, 400.0]])
        p, valid = camera.backproject_to_world_plane(self.K, uv, R_wc, t_wc, ground)
        assert bool(valid[0])
        np.testing.assert_allclose(p[0, 2], 0.0, atol=1e-5)
        assert float(p[0, 1]) > 0  # in front of the camera
