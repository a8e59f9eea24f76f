"""TPU-path parity: the fused Pallas matcher and the one-dispatch fused SIFT
program vs their chunked/unfused XLA twins, ON HARDWARE.

The default suite forces CPU (tests/conftest.py), where the Pallas kernel and
`_sift_fused` never run — these tests are the hardware gate VERDICT round 1
asked for.  Run them with:

    SSRLCV_TEST_PLATFORM=axon,cpu python -m pytest tests/test_tpu_parity.py -m tpu -q

Parity bars: matching indices+distances bit-identical (the distance is exact
integer arithmetic in f32 on both paths, and both tie-break to the lowest
target index); SIFT keypoints location/sigma/theta near-exact with the
descriptor compared at the reference's own distProtocol < 20 bar
(/root/reference/test/Pipeline.cu:33).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

on_accel = jax.devices()[0].platform not in ("cpu",)

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(not on_accel, reason="TPU-path parity needs hardware "
                       "(run with SSRLCV_TEST_PLATFORM=axon,cpu)"),
]


def _random_features(rng, n, cap, img_size=(1024, 1024)):
    from ssrlcv_tpu.core.types import FeatureSet

    desc = rng.integers(0, 256, size=(cap, 128)).astype(np.uint8)
    loc = rng.uniform(0, img_size[0], size=(cap, 2)).astype(np.float32)
    mask = np.zeros(cap, bool)
    mask[:n] = True
    return FeatureSet(
        parent=jnp.zeros((cap,), jnp.int32),
        loc=jnp.asarray(loc),
        sigma=jnp.ones((cap,), jnp.float32),
        theta=jnp.zeros((cap,), jnp.float32),
        descriptors=jnp.asarray(desc),
        mask=jnp.asarray(mask),
    )


def _assert_same_best(idx_p, dist_p, idx_x, dist_x):
    dist_p, dist_x = np.asarray(dist_p), np.asarray(dist_x)
    idx_p, idx_x = np.asarray(idx_p), np.asarray(idx_x)
    # the kernel encodes "no target passed" as >= 3e38; the XLA path as +inf
    fin = np.isfinite(dist_x) & (dist_p < 3e38)
    assert np.array_equal(np.isfinite(dist_x), dist_p < 3e38), "match/no-match sets differ"
    np.testing.assert_array_equal(idx_p[fin], idx_x[fin])
    np.testing.assert_array_equal(dist_p[fin], dist_x[fin])


def test_pallas_vs_chunked_brute_force():
    from ssrlcv_tpu.matching.distance import best_target_chunked
    from ssrlcv_tpu.matching.pallas_match import pallas_best_target

    rng = np.random.default_rng(7)
    # deliberately non-multiples of the kernel tiles (256/512)
    q = _random_features(rng, 1500, 1664)
    t = _random_features(rng, 2300, 2432)

    inf2 = jnp.full((q.capacity, 2), jnp.inf, jnp.float32)
    idx_p, dist_p = pallas_best_target(
        q.descriptors, t.descriptors, t.loc, inf2, inf2, jnp.float32(0.0), t.mask)
    idx_x, dist_x = best_target_chunked(q.descriptors, t.descriptors, t.mask)
    _assert_same_best(idx_p, dist_p, idx_x, dist_x)


def test_pallas_vs_chunked_constrained_segments():
    from ssrlcv_tpu.matching.distance import best_target_chunked
    from ssrlcv_tpu.matching.match import _epipolar_segment_mask
    from ssrlcv_tpu.matching.pallas_match import pallas_best_target

    rng = np.random.default_rng(11)
    q = _random_features(rng, 900, 1024)
    t = _random_features(rng, 1900, 2048)
    eps = 25.0
    # random epipolar segments crossing the image, incl. verticals
    p1 = rng.uniform(0, 1024, size=(q.capacity, 2)).astype(np.float32)
    p2 = rng.uniform(0, 1024, size=(q.capacity, 2)).astype(np.float32)
    p2[:64, 0] = p1[:64, 0]  # exercise the vertical-segment branch

    idx_p, dist_p = pallas_best_target(
        q.descriptors, t.descriptors, t.loc,
        jnp.asarray(p1), jnp.asarray(p2), jnp.float32(eps), t.mask)
    idx_x, dist_x = best_target_chunked(
        q.descriptors, t.descriptors, t.mask,
        mask_fn=lambda a, b: _epipolar_segment_mask(a, b, t.loc, eps),
        mask_aux=(jnp.asarray(p1), jnp.asarray(p2)),
    )
    _assert_same_best(idx_p, dist_p, idx_x, dist_x)


def test_pallas_seed_distance_parity(fixture_2view):
    """Fixture descriptors (real distribution, not uniform noise)."""
    from ssrlcv_tpu.features.sift import features_from_refdata
    from ssrlcv_tpu.matching.distance import min_distance
    from ssrlcv_tpu.matching.pallas_match import pallas_best_target

    seed = features_from_refdata(fixture_2view["seed_features"])
    inf2 = jnp.full((seed.capacity, 2), jnp.inf, jnp.float32)
    _, dist_p = pallas_best_target(
        seed.descriptors, seed.descriptors, seed.loc,
        inf2, inf2, jnp.float32(0.0), seed.mask)
    dist_x = min_distance(seed.descriptors, seed.descriptors, seed.mask)
    dist_p, dist_x = np.asarray(dist_p), np.asarray(dist_x)
    fin = np.isfinite(dist_x) & (dist_p < 3e38)
    np.testing.assert_array_equal(dist_p[fin], dist_x[fin])


def test_fused_sift_matches_unfused(fixture_2view):
    """_sift_fused (one device program; the TPU default) vs the per-octave
    host-looped path on the everest fixture image."""
    from ssrlcv_tpu.features.sift import generate_features

    px = fixture_2view["images"][0].pixels
    fs_fused = generate_features(px, image_id=0, fused=True)
    fs_unfused = generate_features(px, image_id=0, fused=False)

    n_f = int(np.asarray(fs_fused.mask).sum())
    n_u = int(np.asarray(fs_unfused.mask).sum())
    assert n_f == n_u, f"keypoint counts diverge: fused {n_f} vs unfused {n_u}"

    mf, mu = np.asarray(fs_fused.mask), np.asarray(fs_unfused.mask)
    loc_f, loc_u = np.asarray(fs_fused.loc)[mf], np.asarray(fs_unfused.loc)[mu]
    np.testing.assert_allclose(loc_f, loc_u, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(fs_fused.sigma)[mf], np.asarray(fs_unfused.sigma)[mu], rtol=1e-5)
    # theta wraps at 2*pi
    th = np.abs(np.asarray(fs_fused.theta)[mf] - np.asarray(fs_unfused.theta)[mu])
    assert np.all(np.minimum(th, 2 * np.pi - th) < 1e-4)
    d = (np.asarray(fs_fused.descriptors)[mf].astype(np.int64)
         - np.asarray(fs_unfused.descriptors)[mu].astype(np.int64))
    dist2 = np.sum(d * d, axis=1)
    assert np.all(dist2 < 20), (
        f"descriptor distProtocol >= 20 for {int((dist2 >= 20).sum())} keypoints "
        f"(max {int(dist2.max())})")
