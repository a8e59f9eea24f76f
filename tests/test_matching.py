"""Matching tests: exact MXU distances, epipolar predicates, thresholds."""

import numpy as np
import jax.numpy as jnp
import pytest


def test_distance_matrix_exact_vs_numpy():
    from ssrlcv_tpu.matching.distance import distance_matrix

    rng = np.random.default_rng(0)
    q = rng.integers(0, 256, (64, 128)).astype(np.uint8)
    t = rng.integers(0, 256, (96, 128)).astype(np.uint8)
    d = np.asarray(distance_matrix(jnp.asarray(q), jnp.asarray(t)))
    qi = q.astype(np.int64)
    ti = t.astype(np.int64)
    expect = ((qi[:, None, :] - ti[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(d, expect)


def test_best_target_masks_and_ties():
    from ssrlcv_tpu.matching.distance import best_target_chunked

    q = jnp.zeros((4, 128), jnp.uint8)
    t = jnp.zeros((8, 128), jnp.uint8)
    t = t.at[3].set(1)  # distance 128 for target 3, 0 for others
    t_valid = jnp.ones(8, bool).at[0].set(False)  # exclude target 0
    idx, dist = best_target_chunked(q, t, t_valid, chunk=4)
    # lowest valid index with min distance wins
    np.testing.assert_array_equal(np.asarray(idx), [1, 1, 1, 1])
    np.testing.assert_array_equal(np.asarray(dist), [0, 0, 0, 0])


def test_epipolar_segment_mask_matches_reference_predicate():
    from ssrlcv_tpu.matching.match import _epipolar_segment_mask

    rng = np.random.default_rng(1)
    p1 = rng.uniform(0, 1000, (16, 2)).astype(np.float32)
    p2 = rng.uniform(0, 1000, (16, 2)).astype(np.float32)
    t = rng.uniform(0, 1000, (64, 2)).astype(np.float32)
    eps = 30.0
    got = np.asarray(_epipolar_segment_mask(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(t), eps))

    # literal transliteration of matchFeaturesDoubleConstrained's test
    for i in range(16):
        a, b = p1[i], p2[i]
        left, right = (a, b) if a[0] < b[0] else (b, a)
        for j in range(64):
            x, y = t[j]
            if x < left[0] - eps or x > right[0] + eps:
                expect = False
            elif left[0] == right[0]:
                top, bottom = min(a[1], b[1]), max(a[1], b[1])
                expect = not (top - eps > y or bottom + eps < y)
            else:
                slope = (left[1] - right[1]) / (left[0] - right[0])
                y_line = slope * (x - left[0]) + left[1]
                expect = abs(y_line - y) <= eps
            assert got[i, j] == expect, (i, j)


def test_threshold_semantics():
    from ssrlcv_tpu.config import MatchParams
    from ssrlcv_tpu.matching.match import DMatches, _threshold

    idx = jnp.zeros(4, jnp.int32)
    dist = jnp.array([100.0, 39999.0, 40001.0, 500.0])
    qmask = jnp.array([True, True, True, True])
    params = MatchParams()  # absolute 200^2 = 40000
    dm = _threshold(idx, dist, qmask, params, None)
    np.testing.assert_array_equal(np.asarray(dm.valid), [True, True, False, True])

    # seeded: invalid if dist/seed > 0.36
    seed = jnp.array([1000.0, 200000.0, 200000.0, 1000.0])
    dm2 = _threshold(idx, dist, qmask, params, seed)
    np.testing.assert_array_equal(np.asarray(dm2.valid), [True, True, False, False])


def test_matchset_assembly():
    from ssrlcv_tpu.config import MatchParams
    from ssrlcv_tpu.core.types import FeatureSet
    from ssrlcv_tpu.matching.match import DMatches, matches_to_matchset

    q = FeatureSet.empty(4, parent=0)
    q = q.replace(loc=jnp.arange(8, dtype=jnp.float32).reshape(4, 2), mask=jnp.ones(4, bool))
    t = FeatureSet.empty(4, parent=1)
    t = t.replace(loc=100 + jnp.arange(8, dtype=jnp.float32).reshape(4, 2), mask=jnp.ones(4, bool))
    dm = DMatches(
        target_idx=jnp.array([2, 0, 1, 3], jnp.int32),
        distance=jnp.zeros(4),
        valid=jnp.array([True, False, True, True]),
    )
    ms = matches_to_matchset(dm, q, t, 0, 1)
    assert int(ms.count()) == 3
    locs = np.asarray(ms.kp_loc)
    np.testing.assert_array_equal(locs[0, 0], [0, 1])      # query kp
    np.testing.assert_array_equal(locs[0, 1], [104, 105])  # target kp idx 2
    np.testing.assert_array_equal(np.asarray(ms.kp_parent)[0], [0, 1])


@pytest.mark.slow
def test_end_to_end_match_triangulate(fixture_2view, cameras_2view):
    """Full SIFT -> seeded match -> triangulate on the fixture pair: the
    resulting cloud must lie on the golden cloud (median nearest-neighbour
    deviation < 10 m)."""
    from scipy.spatial import cKDTree

    from ssrlcv_tpu.config import MatchParams
    from ssrlcv_tpu.features.sift import generate_features
    from ssrlcv_tpu.geometry import bundles as B
    from ssrlcv_tpu.geometry import triangulation as T
    from ssrlcv_tpu.matching import match as M

    from ssrlcv_tpu.features.sift import features_from_refdata

    f0 = generate_features(fixture_2view["images"][0].pixels, image_id=0)
    f1 = generate_features(fixture_2view["images"][1].pixels, image_id=1)
    seed = features_from_refdata(fixture_2view["seed_features"])
    sd = M.seed_distances(f0, seed)
    params = MatchParams(epsilon=25.0, delta=5.0)
    dm = M.match_double_constrained(f0, f1, cameras_2view, 0, 1, params, seed_dist=sd)
    ms = M.matches_to_matchset(dm, f0, f1, 0, 1)
    # reference golden match count is 13534; ours must land within 2%
    n = int(ms.count())
    assert abs(n - 13534) < 0.02 * 13534, n

    pc, _ = T.two_view_triangulate(B.generate_bundles(ms, cameras_2view))
    mine = np.asarray(pc.points)[np.asarray(ms.mask)]
    ref = fixture_2view["points0"]
    d, _ = cKDTree(ref).query(mine)
    assert np.median(d) < 0.001, np.median(d)
    assert (d < 0.1).mean() > 0.99
