"""Depth-fusion filter tests (LSD-SLAM fusion analog, SURVEY.md §2.1
"LSD-SLAM depth fusion"; paper §V): scale alignment, Bayesian fusion,
keyframe propagation consistency on synthetic geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from pop_up_slam_tpu.fusion import (
    align_scale,
    fuse_observation,
    init_from_popup,
    propagate_to_frame,
)
from pop_up_slam_tpu.geometry import se3
from pop_up_slam_tpu.geometry.camera import Intrinsics


def _plane_depth(H, W, K, dist=3.0):
    """Depth of a frontal wall at z=dist (camera-frame)."""
    return jnp.full((H, W), dist)


class TestInitAndScale:
    def test_init_masks_invalid(self):
        depth = jnp.array([[2.0, 0.0], [50.0, 4.0]])
        flt = init_from_popup(depth, max_depth=40.0)
        assert bool(flt.valid[0, 0]) and bool(flt.valid[1, 1])
        assert not bool(flt.valid[0, 1]) and not bool(flt.valid[1, 0])
        np.testing.assert_allclose(flt.inv_mu[0, 0], 0.5, atol=1e-6)

    def test_align_scale_recovers_known_factor(self):
        key = jax.random.PRNGKey(0)
        H, W = 24, 32
        true_depth = 2.0 + jax.random.uniform(key, (H, W)) * 3.0
        s_true = 0.37
        # an "LSD" inverse-depth map off by the unknown scale
        ambiguous = (1.0 / true_depth) / s_true
        s = align_scale(ambiguous, true_depth)
        np.testing.assert_allclose(float(s), s_true, rtol=1e-3)

    def test_align_scale_robust_to_outliers(self):
        key = jax.random.PRNGKey(1)
        H, W = 24, 32
        true_depth = 2.0 + jax.random.uniform(key, (H, W)) * 3.0
        s_true = 1.8
        ambiguous = np.array((1.0 / true_depth) / s_true)
        ambiguous[:4, :] *= 40.0  # 1/6 of pixels corrupted
        s = align_scale(jnp.asarray(ambiguous), true_depth)
        np.testing.assert_allclose(float(s), s_true, rtol=0.05)


class TestFusion:
    def test_fusion_reduces_variance_and_error(self):
        key = jax.random.PRNGKey(2)
        H, W = 16, 20
        true_inv = 1.0 / (2.0 + jax.random.uniform(key, (H, W)) * 2.0)
        k1, k2 = jax.random.split(key)
        obs1 = true_inv + 0.02 * jax.random.normal(k1, (H, W))
        obs2 = true_inv + 0.02 * jax.random.normal(k2, (H, W))
        flt = init_from_popup(1.0 / obs1, sigma0_rel=0.1)
        var0 = np.asarray(flt.var).copy()
        flt = fuse_observation(flt, obs2, jnp.full((H, W), 4e-4))
        assert (np.asarray(flt.var) <= var0 + 1e-12).all()
        err = np.abs(np.asarray(flt.inv_mu - true_inv))
        err1 = np.abs(np.asarray(obs1 - true_inv))
        assert err.mean() < err1.mean()

    def test_outlier_gate_rejects(self):
        flt = init_from_popup(jnp.full((4, 4), 2.0), sigma0_rel=0.01)
        mu0 = np.asarray(flt.inv_mu).copy()
        # wildly inconsistent observation with tiny claimed variance
        flt2 = fuse_observation(
            flt, jnp.full((4, 4), 5.0), jnp.full((4, 4), 1e-6)
        )
        np.testing.assert_allclose(np.asarray(flt2.inv_mu), mu0, atol=1e-9)

    def test_adopt_where_no_prior(self):
        flt = init_from_popup(jnp.zeros((4, 4)))  # all invalid
        assert not bool(np.asarray(flt.valid).any())
        flt2 = fuse_observation(
            flt, jnp.full((4, 4), 0.5), jnp.full((4, 4), 1e-2)
        )
        assert bool(np.asarray(flt2.valid).all())
        np.testing.assert_allclose(np.asarray(flt2.inv_mu), 0.5)


class TestPropagation:
    def test_pure_z_translation_shifts_depth(self):
        """Moving 0.5 m toward a 3 m frontal wall leaves a 2.5 m wall."""
        H, W = 32, 40
        K = Intrinsics.create(40.0, 40.0, 20.0, 16.0)
        flt = init_from_popup(_plane_depth(H, W, K, 3.0))
        R_rel = jnp.eye(3)
        t_rel = jnp.array([0.0, 0.0, 0.5])  # camera moves forward
        flt2 = propagate_to_frame(flt, K, R_rel, t_rel)
        v = np.asarray(flt2.valid)
        assert v.mean() > 0.5  # central pixels covered
        d = 1.0 / np.asarray(flt2.inv_mu)[v]
        np.testing.assert_allclose(d, 2.5, atol=0.02)

    def test_identity_propagation_is_near_lossless(self):
        H, W = 24, 30
        K = Intrinsics.create(30.0, 30.0, 15.0, 12.0)
        depth = 2.0 + 0.5 * jnp.sin(
            jnp.arange(H * W, dtype=jnp.float32).reshape(H, W) / 37.0
        )
        flt = init_from_popup(depth)
        flt2 = propagate_to_frame(flt, K, jnp.eye(3), jnp.zeros(3))
        v = np.asarray(flt2.valid)
        assert v.mean() > 0.95
        np.testing.assert_allclose(
            np.asarray(flt2.inv_mu)[v], np.asarray(flt.inv_mu)[v],
            rtol=1e-4,
        )

    def test_jit_compiles(self):
        H, W = 16, 20
        K = Intrinsics.create(20.0, 20.0, 10.0, 8.0)
        flt = init_from_popup(_plane_depth(H, W, K, 3.0))
        f = jax.jit(lambda fl: propagate_to_frame(
            fl, K, jnp.eye(3), jnp.array([0.0, 0.0, 0.1])
        ))
        out = f(flt)
        assert np.isfinite(np.asarray(out.inv_mu)).all()
