"""Data-association tests (SURVEY.md §4 item 2, §7 hard part #1).

Constructed near-miss cases: the masked greedy matcher must reproduce
the reference's geometric gating (normal angle / plane distance /
extent overlap, paper arXiv:1703.07334 §IV-C) exactly.
"""

import jax.numpy as jnp
import numpy as np

from pop_up_slam_tpu.assoc import AssocConfig, associate_detections
from pop_up_slam_tpu.geometry import plane as plane_mod


def _wall(nx, ny, d):
    return plane_mod.normalize(jnp.array([nx, ny, 0.0, d], jnp.float32))


def _mk(planes, centroids, endpoints, valid):
    return (
        jnp.stack(planes),
        jnp.asarray(centroids, jnp.float32),
        jnp.asarray(endpoints, jnp.float32),
        jnp.asarray(valid),
    )


def _assoc(det, lm, cfg=AssocConfig()):
    """det = (planes, centroid, endpoints, valid); lm likewise — the
    landmark centroid is not used by the matcher."""
    return associate_detections(
        det[0], det[1], det[2], det[3], lm[0], lm[2], lm[3], cfg
    )


def test_exact_match():
    det = _mk(
        [_wall(1.0, 0.0, -1.0), _wall(0.0, 1.0, -2.0)],
        [[1.0, 0.5, 1.0], [0.5, 2.0, 1.0]],
        [[[1.0, 0.0, 0.0], [1.0, 1.0, 0.0]], [[0.0, 2.0, 0.0], [1.0, 2.0, 0.0]]],
        [True, True],
    )
    lm = _mk(
        [_wall(0.0, 1.0, -2.0), _wall(1.0, 0.0, -1.0)],
        [[0.5, 2.0, 0.0], [1.0, 0.5, 0.0]],
        [[[0.0, 2.0, 0.0], [1.0, 2.0, 0.0]], [[1.0, 0.0, 0.0], [1.0, 1.0, 0.0]]],
        [True, True],
    )
    r = _assoc(det, lm)
    assert r.match_lm.tolist() == [1, 0]
    assert not bool(r.is_new.any())


def test_angle_gate_rejects():
    # 45 deg rotated wall: outside the ~20 deg gate -> new landmark.
    det = _mk(
        [_wall(1.0, 1.0, -1.0)], [[1.0, 0.5, 0.0]],
        [[[1.0, 0.0, 0.0], [1.0, 1.0, 0.0]]], [True],
    )
    lm = _mk(
        [_wall(1.0, 0.0, -1.0)], [[1.0, 0.5, 0.0]],
        [[[1.0, 0.0, 0.0], [1.0, 1.0, 0.0]]], [True],
    )
    r = _assoc(det, lm)
    assert r.match_lm.tolist() == [-1]
    assert bool(r.is_new[0])


def test_distance_gate_rejects_parallel_offset_wall():
    # Parallel wall 1 m away (e.g. other side of a corridor).
    det = _mk(
        [_wall(1.0, 0.0, -2.0)], [[2.0, 0.5, 0.0]],
        [[[2.0, 0.0, 0.0], [2.0, 1.0, 0.0]]], [True],
    )
    lm = _mk(
        [_wall(1.0, 0.0, -1.0)], [[1.0, 0.5, 0.0]],
        [[[1.0, 0.0, 0.0], [1.0, 1.0, 0.0]]], [True],
    )
    r = _assoc(det, lm)
    assert r.match_lm.tolist() == [-1]


def test_overlap_gate_rejects_collinear_distant_segment():
    # Same infinite plane, but segments 5 m apart along the wall line:
    # the reference's polygon-overlap check keeps them distinct.
    det = _mk(
        [_wall(1.0, 0.0, -1.0)], [[1.0, 7.5, 0.0]],
        [[[1.0, 7.0, 0.0], [1.0, 8.0, 0.0]]], [True],
    )
    lm = _mk(
        [_wall(1.0, 0.0, -1.0)], [[1.0, 0.5, 0.0]],
        [[[1.0, 0.0, 0.0], [1.0, 1.0, 0.0]]], [True],
    )
    cfg = AssocConfig(min_overlap=-1.0)
    r = _assoc(det, lm, cfg)
    assert r.match_lm.tolist() == [-1]
    # with a permissive overlap gate it matches
    cfg2 = AssocConfig(min_overlap=-10.0)
    r2 = _assoc(det, lm, cfg2)
    assert r2.match_lm.tolist() == [0]


def test_greedy_uniqueness():
    # Two detections both near landmark 0; the closer one wins, the other
    # falls back to landmark 1 (slightly worse but within gates).
    det = _mk(
        [_wall(1.0, 0.0, -1.0), _wall(1.0, 0.0, -1.1)],
        [[1.0, 0.5, 0.0], [1.1, 0.5, 0.0]],
        [
            [[1.0, 0.0, 0.0], [1.0, 1.0, 0.0]],
            [[1.1, 0.0, 0.0], [1.1, 1.0, 0.0]],
        ],
        [True, True],
    )
    lm = _mk(
        [_wall(1.0, 0.0, -1.0), _wall(1.0, 0.0, -1.2)],
        [[1.0, 0.5, 0.0], [1.2, 0.5, 0.0]],
        [
            [[1.0, 0.0, 0.0], [1.0, 1.0, 0.0]],
            [[1.2, 0.0, 0.0], [1.2, 1.0, 0.0]],
        ],
        [True, True],
    )
    r = _assoc(det, lm)
    m = r.match_lm.tolist()
    assert m[0] == 0 and m[1] == 1
    assert sorted(m) == [0, 1]  # no double assignment


def test_invalid_masks():
    det = _mk(
        [_wall(1.0, 0.0, -1.0), _wall(1.0, 0.0, -1.0)],
        [[1.0, 0.5, 0.0]] * 2,
        [[[1.0, 0.0, 0.0], [1.0, 1.0, 0.0]]] * 2,
        [True, False],
    )
    lm = _mk(
        [_wall(1.0, 0.0, -1.0), _wall(1.0, 0.0, -1.0)],
        [[1.0, 0.5, 0.0]] * 2,
        [[[1.0, 0.0, 0.0], [1.0, 1.0, 0.0]]] * 2,
        [False, True],
    )
    r = _assoc(det, lm)
    assert r.match_lm.tolist() == [1, -1]
    assert not bool(r.is_new[1])  # invalid detection is not "new"


def test_ground_plane_association():
    # Horizontal planes have a degenerate line direction; the overlap
    # gate must disable itself and the ground still matches.
    ground = plane_mod.normalize(jnp.array([0.0, 0.0, 1.0, 0.0]))
    det = (
        ground[None], jnp.zeros((1, 3)),
        jnp.zeros((1, 2, 3)), jnp.ones((1,), bool),
    )
    lm = (
        ground[None], jnp.zeros((1, 3)),
        jnp.zeros((1, 2, 3)), jnp.ones((1,), bool),
    )
    r = _assoc(det, lm)
    assert r.match_lm.tolist() == [0]


def test_jit_and_vmap():
    import jax

    B, D, L = 3, 4, 8
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    dp = plane_mod.normalize(jax.random.normal(ks[0], (B, D, 4)))
    dc = jax.random.normal(ks[1], (B, D, 3))
    de = jax.random.normal(ks[2], (B, D, 2, 3))
    dv = jnp.ones((B, D), bool)
    lp = plane_mod.normalize(jax.random.normal(ks[3], (B, L, 4)))
    le = jax.random.normal(ks[4], (B, L, 2, 3))
    lv = jnp.ones((B, L), bool)
    f = jax.jit(jax.vmap(associate_detections))
    r = f(dp, dc, de, dv, lp, le, lv)
    assert r.match_lm.shape == (B, D)
    assert r.scores.shape == (B, D, L)
    # every match index is a valid landmark or -1
    m = np.asarray(r.match_lm)
    assert ((m >= -1) & (m < L)).all()
