"""Landmark lifecycle at capacity: eviction + merge (round-4 VERDICT
missing #2).

The reference's iSAM landmark set grows without bound; the
fixed-capacity store must recycle instead — evicting the
least-observed out-of-window landmarks when a keyframe needs slots,
folding duplicate co-planar landmarks, and surfacing any remaining
drops through the n_overflow counter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pop_up_slam_tpu.evaluation import ate_rmse
from pop_up_slam_tpu.geometry import plane as plane_mod
from pop_up_slam_tpu.io import synthetic
from pop_up_slam_tpu.mapping import (
    LandmarkStore,
    evict_landmarks,
    merge_landmarks,
)
from pop_up_slam_tpu.pipeline import (
    FrameDetections,
    SlamConfig,
    slam_init,
    slam_step,
)


class TestEvict:
    def _store(self, n_obs, valid, created=None):
        L = len(n_obs)
        st = LandmarkStore.empty(L)
        return st._replace(
            n_obs=jnp.asarray(n_obs, jnp.int32),
            valid=jnp.asarray(valid),
            created_kf=jnp.asarray(
                created if created is not None else range(L), jnp.int32
            ),
        )

    def test_evicts_lowest_nobs_out_of_window(self):
        st = self._store([5, 1, 3, 2], [True] * 4)
        in_window = jnp.asarray([False, False, True, False])
        st2, evicted = evict_landmarks(st, in_window, jnp.asarray(2))
        # need 2, none free: evict the two lowest-n_obs not in window
        np.testing.assert_array_equal(
            np.asarray(evicted), [False, True, False, True]
        )
        assert not bool(st2.valid[1]) and not bool(st2.valid[3])
        assert int(st2.n_obs[1]) == 0 and int(st2.created_kf[1]) == -1

    def test_no_eviction_when_free_slots_cover_need(self):
        st = self._store([5, 1, 3, 2], [True, True, False, False])
        _, evicted = evict_landmarks(
            st, jnp.zeros((4,), bool), jnp.asarray(2)
        )
        assert not bool(evicted.any())

    def test_in_window_protected(self):
        st = self._store([1, 1, 1, 1], [True] * 4)
        in_window = jnp.asarray([True, True, True, False])
        _, evicted = evict_landmarks(st, in_window, jnp.asarray(3))
        # only slot 3 is evictable even though 3 are needed
        np.testing.assert_array_equal(
            np.asarray(evicted), [False, False, False, True]
        )


class TestMerge:
    def test_duplicate_coplanar_folds_into_stronger(self):
        L = 6
        st = LandmarkStore.empty(L)
        # landmarks 0 and 2: same wall x=2 plane, overlapping extents
        eps = np.zeros((L, 2, 3), np.float32)
        eps[0] = [[2.0, 0.0, 0.0], [2.0, 3.0, 0.0]]
        eps[2] = [[2.0, 2.0, 0.0], [2.0, 5.0, 0.0]]
        eps[1] = [[0.0, 1.0, 0.0], [1.0, 1.0, 0.0]]   # different wall y=1
        st = st._replace(
            endpoints_w=jnp.asarray(eps),
            n_obs=jnp.asarray([7, 4, 2, 0, 0, 0], jnp.int32),
            created_kf=jnp.asarray([0, 1, 5, -1, -1, -1], jnp.int32),
            valid=jnp.asarray([True, True, True, False, False, False]),
        )
        planes = jnp.stack([
            plane_mod.normalize(jnp.array([1.0, 0.0, 0.0, -2.0])),
            plane_mod.normalize(jnp.array([0.0, 1.0, 0.0, -1.0])),
            plane_mod.normalize(jnp.array([1.0, 0.02, 0.0, -2.01])),
            jnp.array([0.0, 0.0, 1.0, 0.0]),
            jnp.array([0.0, 0.0, 1.0, 0.0]),
            jnp.array([0.0, 0.0, 1.0, 0.0]),
        ])
        lm_valid = st.valid
        st2, lmv2, remap, merged = merge_landmarks(
            st, planes, lm_valid, max_angle=0.2, max_dist=0.2,
            min_overlap=0.0,
        )
        np.testing.assert_array_equal(
            np.asarray(merged), [False, False, True, False, False, False]
        )
        assert int(remap[2]) == 0
        assert int(st2.n_obs[0]) == 9          # 7 + 2 folded
        assert not bool(st2.valid[2]) and not bool(lmv2[2])
        # merged extent spans the union along the wall line
        proj = np.asarray(st2.endpoints_w[0])[:, 1]
        assert proj.min() <= 0.0 + 1e-5 and proj.max() >= 5.0 - 1e-5

    def test_disjoint_walls_do_not_merge(self):
        L = 4
        st = LandmarkStore.empty(L)
        eps = np.zeros((L, 2, 3), np.float32)
        eps[0] = [[2.0, 0.0, 0.0], [2.0, 2.0, 0.0]]
        eps[1] = [[4.0, 0.0, 0.0], [4.0, 2.0, 0.0]]   # parallel, 2 m away
        st = st._replace(
            endpoints_w=jnp.asarray(eps),
            n_obs=jnp.asarray([3, 2, 0, 0], jnp.int32),
            valid=jnp.asarray([True, True, False, False]),
        )
        planes = jnp.stack([
            plane_mod.normalize(jnp.array([1.0, 0.0, 0.0, -2.0])),
            plane_mod.normalize(jnp.array([1.0, 0.0, 0.0, -4.0])),
            jnp.array([0.0, 0.0, 1.0, 0.0]),
            jnp.array([0.0, 0.0, 1.0, 0.0]),
        ])
        _, _, _, merged = merge_landmarks(
            st, planes, st.valid, max_angle=0.2, max_dist=0.2,
            min_overlap=0.0,
        )
        assert not bool(merged.any())


def _gallery_world(n_walls=14):
    """A long corridor of short offset wall niches: every ~1.5 m a new
    distinct wall appears, so far more than max_landmarks walls are
    seen over the run."""
    segs = []
    for k in range(n_walls):
        y = 1.0 + 1.5 * k
        x = 1.0 + 0.45 * (k % 3)
        side = -1.0 if k % 2 else 1.0
        segs.append(((side * x, y), (side * x, y + 1.4)))
    return synthetic.make_world(segs, heights=2.5, max_walls=16)


@pytest.mark.slow
def test_long_sequence_eviction_keeps_map_correct():
    """More distinct walls than landmark slots: eviction must keep the
    sliding map serving the window (no overflow drops) and the
    trajectory must stay odometry-corrected."""
    n_frames = 80
    cfg = SlamConfig(window_size=4, max_landmarks=8, max_det=6,
                     kf_trans=0.25, gn_iters=2)
    world = _gallery_world()
    length = 1.0 + 1.5 * 14
    gt_R, gt_t = synthetic.corridor_trajectory(n_frames, length=length)
    key = jax.random.PRNGKey(1)
    k_odom, k_obs = jax.random.split(key)
    Rrel, trel = synthetic.noisy_odometry(
        gt_R, gt_t, k_odom, sigma_t=0.02, sigma_r=0.004
    )
    obs = jax.vmap(
        lambda R, t, k: synthetic.observe_frame(
            world, R, t, key=k, max_det=cfg.max_det
        )
    )(gt_R, gt_t, jax.random.split(k_obs, n_frames))

    state = slam_init(cfg, gt_R[0], gt_t[0])
    step = jax.jit(lambda s, d, oR, ot: slam_step(s, d, oR, ot, cfg))
    est = [np.asarray(gt_t[0])]
    for i in range(1, n_frames):
        det = FrameDetections(
            planes_c=obs.planes_c[i], centroid_c=obs.centroid_c[i],
            endpoints_c=obs.endpoints_c[i], valid=obs.valid[i],
        )
        state, (R, t) = step(state, det, Rrel[i - 1], trel[i - 1])
        est.append(np.asarray(t))

    # > max_landmarks distinct walls appeared (14 walls + ground vs 8
    # slots); eviction must have recycled slots without ever dropping
    # a wanted detection
    assert int(state.n_overflow) == 0, int(state.n_overflow)
    ate, _, _ = ate_rmse(np.asarray(gt_t), np.stack(est))
    odo = 0.02 * np.sqrt(n_frames)  # rough odometry-drift scale
    assert ate < odo, (ate, odo)
    assert ate < 0.15, ate

    # the same run with eviction disabled must overflow
    cfg2 = cfg._replace(lm_evict=False)
    state2 = slam_init(cfg2, gt_R[0], gt_t[0])
    step2 = jax.jit(lambda s, d, oR, ot: slam_step(s, d, oR, ot, cfg2))
    for i in range(1, n_frames):
        det = FrameDetections(
            planes_c=obs.planes_c[i], centroid_c=obs.centroid_c[i],
            endpoints_c=obs.endpoints_c[i], valid=obs.valid[i],
        )
        state2, _ = step2(state2, det, Rrel[i - 1], trel[i - 1])
    assert int(state2.n_overflow) > 0
