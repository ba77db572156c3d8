"""Plane-alignment visual odometry (odometry/plane_vo.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pop_up_slam_tpu.geometry import plane as plane_mod
from pop_up_slam_tpu.geometry import se3
from pop_up_slam_tpu.odometry import (
    PlaneVOConfig,
    align_planes,
    match_planes,
    plane_vo_step,
)


def _room_planes():
    """Four walls + ground in world frame: a fully-constrained set."""
    return jnp.array(
        [
            [1.0, 0.0, 0.0, -3.0],
            [-1.0, 0.0, 0.0, -3.0],
            [0.0, 1.0, 0.0, -2.0],
            [0.0, -1.0, 0.0, -2.0],
            [0.0, 0.0, 1.0, 0.0],
        ]
    )


def _observe(planes_w, R_wc, t_wc):
    R_cw, t_cw = se3.se3_inverse(R_wc, t_wc)
    return plane_mod.transform(planes_w, R_cw, t_cw)


def _pose(xi):
    return se3.se3_exp(jnp.asarray(xi, jnp.float32))


class TestAlign:
    def test_exact_recovery_full_rank(self):
        planes_w = _room_planes()
        Ra, ta = _pose([0.1, -0.2, 1.4, 0.02, -0.01, 0.3])
        xi_rel = jnp.array([0.15, 0.05, -0.02, 0.03, -0.02, 0.08])
        dR, dt = se3.se3_exp(xi_rel)
        Rb, tb = se3.se3_compose(Ra, ta, dR, dt)

        pa = _observe(planes_w, Ra, ta)
        pb = _observe(planes_w, Rb, tb)
        w = jnp.ones((5,))
        R, t = align_planes(pa, pb, w, jnp.eye(3), jnp.zeros(3),
                            lam_rot=1e-6, lam_trans=1e-6)
        np.testing.assert_allclose(np.asarray(R), np.asarray(dR), atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), np.asarray(dt), atol=1e-4)

    def test_degenerate_uses_prior_in_nullspace(self):
        # Corridor: ground + two parallel walls -> translation along the
        # corridor (y) is unobservable; the prior must fill it.
        planes_w = jnp.array(
            [
                [1.0, 0.0, 0.0, -1.0],
                [-1.0, 0.0, 0.0, -1.0],
                [0.0, 0.0, 1.0, 0.0],
            ]
        )
        Ra, ta = jnp.eye(3), jnp.array([0.0, 0.0, 1.4])
        dR, dt = jnp.eye(3), jnp.array([0.02, 0.3, 0.01])
        Rb, tb = se3.se3_compose(Ra, ta, dR, dt)
        pa = _observe(planes_w, Ra, ta)
        pb = _observe(planes_w, Rb, tb)
        prior_t = jnp.array([0.0, 0.28, 0.0])  # const-velocity guess
        R, t = align_planes(pa, pb, jnp.ones((3,)), jnp.eye(3), prior_t,
                            lam_rot=0.05, lam_trans=0.05)
        t = np.asarray(t)
        # Observable axes come from the data; y from the prior.
        assert abs(t[0] - 0.02) < 5e-3
        assert abs(t[2] - 0.01) < 5e-3
        assert abs(t[1] - 0.28) < 1e-6

    def test_prior_only_when_no_weight(self):
        pa = _room_planes()
        prior_R, prior_t = _pose([0.1, 0.0, 0.0, 0.0, 0.05, 0.0])
        R, t = align_planes(pa, pa, jnp.zeros((5,)), prior_R, prior_t)
        np.testing.assert_allclose(np.asarray(R), np.asarray(prior_R),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(prior_t),
                                   atol=1e-5)


class TestMatch:
    def test_identity_match(self):
        planes_w = _room_planes()
        Ra, ta = _pose([0.0, 0.0, 1.4, 0.0, 0.0, 0.2])
        pa = _observe(planes_w, Ra, ta)
        valid = jnp.ones((5,), bool)
        match, w = match_planes(pa, valid, pa, valid, jnp.eye(3),
                                jnp.zeros(3))
        np.testing.assert_array_equal(np.asarray(match), np.arange(5))
        assert float(jnp.sum(w)) == 5.0

    def test_permuted_and_invalid(self):
        planes_w = _room_planes()
        pa = _observe(planes_w, jnp.eye(3), jnp.array([0.0, 0.0, 1.4]))
        perm = jnp.array([2, 0, 3, 4, 1])
        pb = pa[perm]
        valid_a = jnp.array([True, True, True, True, False])
        valid_b = jnp.ones((5,), bool)
        match, _ = match_planes(pa, valid_a, pb, valid_b, jnp.eye(3),
                                jnp.zeros(3))
        match = np.asarray(match)
        assert match[4] == -1
        inv = np.argsort(np.asarray(perm))
        np.testing.assert_array_equal(match[:4], inv[:4])


class TestVOStep:
    def test_jit_and_recovery(self):
        planes_w = _room_planes()
        Ra, ta = _pose([0.3, 0.1, 1.4, 0.0, 0.0, 0.1])
        dR, dt = _pose([0.1, 0.02, -0.01, 0.01, 0.02, -0.03])
        Rb, tb = se3.se3_compose(Ra, ta, dR, dt)
        pa = _observe(planes_w, Ra, ta)
        pb = _observe(planes_w, Rb, tb)
        valid = jnp.ones((5,), bool)
        step = jax.jit(plane_vo_step, static_argnums=(6,))
        out = step(pa, valid, pb, valid, jnp.eye(3), jnp.zeros(3),
                   PlaneVOConfig(lam_rot=1e-5, lam_trans=1e-5))
        assert int(out.n_matches) == 5
        assert not bool(out.used_prior)
        np.testing.assert_allclose(np.asarray(out.R), np.asarray(dR),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(dt),
                                   atol=1e-3)

    def test_fallback_to_prior(self):
        pa = _room_planes()
        valid = jnp.zeros((5,), bool)
        prior_R, prior_t = _pose([0.0, 0.1, 0.0, 0.02, 0.0, 0.0])
        out = plane_vo_step(pa, valid, pa, valid, prior_R, prior_t)
        assert bool(out.used_prior)
        np.testing.assert_allclose(np.asarray(out.R), np.asarray(prior_R),
                                   atol=1e-6)


class TestVODeadReckoning:
    """Integrate plane VO along a rendered synthetic trajectory: drift
    must stay small (fully monocular — no gt odometry anywhere)."""

    def test_corridor_sequence(self):
        from pop_up_slam_tpu.geometry.camera import Intrinsics
        from pop_up_slam_tpu.io import synthetic
        from pop_up_slam_tpu.popup import popup as pp

        K = Intrinsics.create(160.0, 160.0, 160.0, 120.0)
        H, W = 240, 320
        world = synthetic.corridor_world()
        n = 30
        Rs, ts = synthetic.corridor_trajectory(n)
        pcfg = pp.PopupConfig()

        @jax.jit
        def popup_planes(R, t, mask):
            res = pp.pop_up(K, mask, R, t, pcfg)
            # Append the ground plane as an extra detection slot.
            planes = jnp.concatenate([res.planes_c, res.ground_c[None]])
            valid = jnp.concatenate([res.valid, jnp.ones((1,), bool)])
            return planes, valid

        labels = jax.jit(jax.vmap(
            lambda R_, t_: synthetic.render_frame(K, R_, t_, world, H, W)[0]
        ))(Rs, ts)
        masks = labels == synthetic.LABEL_GROUND

        est_R, est_t = [np.asarray(Rs[0])], [np.asarray(ts[0])]
        prev = None
        prior_R, prior_t = jnp.eye(3), jnp.zeros(3)
        step = jax.jit(plane_vo_step)
        for k in range(n):
            # Pop-up at the *estimated* pose (gravity + height prior).
            pl, va = popup_planes(jnp.asarray(est_R[-1]),
                                  jnp.asarray(est_t[-1]), masks[k])
            if prev is not None:
                out = step(prev[0], prev[1], pl, va, prior_R, prior_t)
                R_new, t_new = se3.se3_compose(
                    jnp.asarray(est_R[-1]), jnp.asarray(est_t[-1]),
                    out.R, out.t,
                )
                est_R.append(np.asarray(R_new))
                est_t.append(np.asarray(t_new))
                prior_R, prior_t = out.R, out.t
            prev = (pl, va)

        err = np.linalg.norm(np.stack(est_t) - np.asarray(ts), axis=-1)
        assert err.max() < 0.35, err.max()
