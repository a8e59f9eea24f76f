"""Distributed-stage tests on the virtual 8-device CPU mesh: every sharded
stage must agree with its single-device twin (exact for integer-distance
matching; tight tolerance where float reduction order differs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssrlcv_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh24():
    assert jax.device_count() >= 8, "tests require the 8-device virtual mesh"
    return make_mesh(jax.devices()[:8], data=2, feat=4)


@pytest.fixture(scope="module")
def mesh81():
    return make_mesh(jax.devices()[:8], data=8, feat=1)


def _random_featureset(rng, n, parent):
    from ssrlcv_tpu.core.types import FeatureSet

    fs = FeatureSet.empty(n, parent=parent)
    live = n - 16
    return fs.replace(
        loc=jnp.asarray(rng.uniform(0, 1024, (n, 2)).astype(np.float32)),
        descriptors=jnp.asarray(rng.integers(0, 256, (n, 128)).astype(np.uint8)),
        mask=jnp.arange(n) < live,
    )


def test_sharded_best_target_exact(mesh24):
    from ssrlcv_tpu.matching.distance import best_target_chunked
    from ssrlcv_tpu.parallel.sharded import sharded_best_target

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 256, (256, 128)).astype(np.uint8))
    t = jnp.asarray(rng.integers(0, 256, (512, 128)).astype(np.uint8))
    tv = jnp.asarray(rng.random(512) > 0.1)

    ref_idx, ref_dist = best_target_chunked(q, t, tv, chunk=64)
    got_idx, got_dist = sharded_best_target(mesh24, q, t, tv)
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(ref_idx))
    np.testing.assert_array_equal(np.asarray(got_dist), np.asarray(ref_dist))


def test_sharded_best_target_tie_break(mesh81):
    """Duplicate descriptors across different feat shards: the lowest global
    index must win, as in the chunked path."""
    from ssrlcv_tpu.matching.distance import best_target_chunked
    from ssrlcv_tpu.parallel.sharded import sharded_best_target

    q = jnp.zeros((8, 128), jnp.uint8)
    t = jnp.ones((64, 128), jnp.uint8)
    t = t.at[13].set(0).at[45].set(0)  # two exact ties on different shards
    tv = jnp.ones(64, bool)
    ref_idx, ref_dist = best_target_chunked(q, t, tv, chunk=8)
    got_idx, got_dist = sharded_best_target(mesh81, q, t, tv)
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(ref_idx))
    np.testing.assert_array_equal(np.asarray(got_idx), 13)
    np.testing.assert_array_equal(np.asarray(got_dist), np.asarray(ref_dist))


def test_sharded_match_double_constrained_matches_single_device(
    mesh24, fixture_2view, cameras_2view
):
    """The pipeline's sharded matching twin returns bit-identical DMatches on
    golden-fixture-derived features."""
    from ssrlcv_tpu.config import MatchParams
    from ssrlcv_tpu.features.sift import features_from_refdata
    from ssrlcv_tpu.matching import match as M
    from ssrlcv_tpu.parallel.sharded import sharded_match_double_constrained

    seed = features_from_refdata(fixture_2view["seed_features"])
    # split the seed features into two fake image feature sets
    rng = np.random.default_rng(1)
    n = seed.capacity
    f0 = seed.replace(loc=jnp.asarray(rng.uniform(0, 1024, (n, 2)).astype(np.float32)))
    f1 = seed.replace(
        loc=jnp.asarray(rng.uniform(0, 1024, (n, 2)).astype(np.float32)),
        descriptors=jnp.roll(seed.descriptors, 7, axis=0),
    )
    params = MatchParams(epsilon=200.0, delta=5.0)
    sd = M.seed_distances(f0, seed)

    ref = M.match_double_constrained(f0, f1, cameras_2view, 0, 1, params, seed_dist=sd)
    got = sharded_match_double_constrained(
        mesh24, f0, f1, cameras_2view, 0, 1, params, seed_dist=sd
    )
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    v = np.asarray(ref.valid)
    np.testing.assert_array_equal(np.asarray(got.target_idx)[v], np.asarray(ref.target_idx)[v])
    np.testing.assert_array_equal(np.asarray(got.distance)[v], np.asarray(ref.distance)[v])


def test_sharded_match_brute_force(mesh81):
    from ssrlcv_tpu.config import MatchParams
    from ssrlcv_tpu.matching import match as M
    from ssrlcv_tpu.parallel.sharded import sharded_match_brute_force

    rng = np.random.default_rng(2)
    f0 = _random_featureset(rng, 256, 0)
    f1 = _random_featureset(rng, 384, 1)
    params = MatchParams()
    ref = M.match_brute_force(f0, f1, params)
    got = sharded_match_brute_force(mesh81, f0, f1, params)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    v = np.asarray(ref.valid)
    np.testing.assert_array_equal(np.asarray(got.target_idx)[v], np.asarray(ref.target_idx)[v])


def test_sharded_triangulate_matches_single_device(mesh81, matchset_2view, cameras_2view):
    from ssrlcv_tpu.geometry.bundles import generate_bundles
    from ssrlcv_tpu.geometry.triangulation import two_view_triangulate
    from ssrlcv_tpu.parallel.sharded import sharded_triangulate

    ref_pc, ref_err = two_view_triangulate(generate_bundles(matchset_2view, cameras_2view))
    got_pc, got_err = sharded_triangulate(mesh81, matchset_2view, cameras_2view)
    # per-point math is elementwise, but XLA fuses/vectorises differently
    # once partitioned => agree to float32 ulp noise
    np.testing.assert_allclose(
        np.asarray(got_pc.points), np.asarray(ref_pc.points), rtol=2e-6, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(got_pc.mask), np.asarray(ref_pc.mask))
    # total error reduction order differs across shards: tight tolerance
    np.testing.assert_allclose(float(got_err), float(ref_err), rtol=1e-4)


def test_sharded_ba_step_agrees_with_dense(mesh81, matchset_2view, cameras_2view):
    from ssrlcv_tpu.ba.two_view import _pack, make_objective
    from ssrlcv_tpu.parallel.sharded import _lm_solve, sharded_ba_step

    p0 = _pack(cameras_2view).reshape(-1)
    lam = 1e-3
    new_p, err = sharded_ba_step(mesh81, matchset_2view, cameras_2view, p0, lam)

    obj = make_objective(matchset_2view, cameras_2view)
    flat_obj = lambda p: obj(p.reshape(2, 6))
    g = jax.grad(flat_obj)(p0)
    H = jax.hessian(flat_obj)(p0)
    free = jnp.ones((2, 6)).at[0].set(0.0).reshape(-1)
    step = _lm_solve(H, g * free, jnp.asarray(lam), free)
    ref_p = p0 - step * free

    np.testing.assert_allclose(float(err), float(flat_obj(p0)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_p), np.asarray(ref_p), rtol=1e-4, atol=1e-7)
    # camera 0 stays pinned
    np.testing.assert_array_equal(np.asarray(new_p)[:6], np.asarray(p0)[:6])


def test_sharded_wrappers_do_not_retrace(mesh81, matchset_2view, cameras_2view):
    """VERDICT r4 #8: repeated sharded_triangulate / sharded_bundle_adjust
    calls must reuse one traced program per (mesh, shapes) instead of
    re-tracing a fresh closure every call."""
    from ssrlcv_tpu.parallel import sharded

    sharded.sharded_triangulate(mesh81, matchset_2view, cameras_2view)
    tri_jit = sharded._triangulate_jit(mesh81)
    n0 = tri_jit._cache_size()
    sharded.sharded_triangulate(mesh81, matchset_2view, cameras_2view)
    sharded.sharded_triangulate(mesh81, matchset_2view, cameras_2view)
    assert tri_jit._cache_size() == n0  # no new traces for repeated calls

    sharded.sharded_bundle_adjust(mesh81, matchset_2view, cameras_2view, iterations=2)
    ba_jit = sharded._ba_jit(mesh81, 2)
    n0 = ba_jit._cache_size()
    sharded.sharded_bundle_adjust(mesh81, matchset_2view, cameras_2view, iterations=2)
    assert ba_jit._cache_size() == n0
    # builder caches hit too (same object returned per key)
    assert sharded._triangulate_jit(mesh81) is tri_jit
    assert sharded._ba_jit(mesh81, 2) is ba_jit


def test_sharded_bundle_adjust_matches_lm(mesh81, matchset_2view, cameras_2view):
    """The distributed multi-iteration LM driver converges like the
    single-device lm mode (identical decisions, float-tolerance params)."""
    from ssrlcv_tpu.ba.two_view import bundle_adjust_two_view
    from ssrlcv_tpu.parallel.sharded import sharded_bundle_adjust

    ref = bundle_adjust_two_view(matchset_2view, cameras_2view, iterations=4, mode="lm")
    got = sharded_bundle_adjust(mesh81, matchset_2view, cameras_2view, iterations=4)

    np.testing.assert_allclose(
        float(got.initial_error), float(ref.initial_error), rtol=1e-6
    )
    # each LM iteration amplifies float32 reduction-order noise => 1e-3
    np.testing.assert_allclose(float(got.final_error), float(ref.final_error), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(got.cameras.cam_pos), np.asarray(ref.cameras.cam_pos),
        rtol=1e-3, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.cameras.cam_rot), np.asarray(ref.cameras.cam_rot),
        rtol=1e-3, atol=1e-5,
    )
    assert float(got.final_error) < float(got.initial_error)


def test_pipeline_runs_sharded_stages(fixture_2view, matchset_2view, cameras_2view, tmp_path):
    """run_pipeline with a mesh exercises the distributed matching /
    triangulation / BA paths end-to-end (features injected from fixtures to
    keep it fast)."""
    from ssrlcv_tpu.config import PipelineConfig
    from ssrlcv_tpu.features.sift import features_from_refdata
    from ssrlcv_tpu.pipeline import stages as S

    mesh = make_mesh(jax.devices()[:8], data=4, feat=2)
    config = PipelineConfig(output_dir=str(tmp_path), checkpoint_dir=None)
    state = S.PipelineState(config=config, images=fixture_2view["images"], mesh=mesh)
    state.cameras = cameras_2view
    seed = features_from_refdata(fixture_2view["seed_features"])
    f0 = seed.replace(loc=jnp.asarray(np.random.default_rng(3).uniform(0, 1024, (seed.capacity, 2)).astype(np.float32)))
    f1 = f0.replace(descriptors=jnp.roll(f0.descriptors, 3, axis=0))
    state.features = [f0, f1]
    state.seed_features = seed

    state = S.do_feature_matching(state)
    assert int(state.matches.count()) > 0
    state = S.do_triangulation(state)
    assert state.cloud is not None
    state = S.do_bundle_adjust(state)
    assert state.ba_error is not None


def test_sharded_pairwise_index_matches_10_image_strip(mesh24, cameras_2view):
    """The N-view pair sweep distributed over the 8-device mesh: all 45
    pairs of a 10-image synthetic strip, per-pair results identical to the
    serial path (VERDICT r3 #4)."""
    import jax.tree_util as jtu

    from ssrlcv_tpu.config import MatchParams
    from ssrlcv_tpu.core.types import Cameras
    from ssrlcv_tpu.matching.tracks import pairwise_index_matches

    rng = np.random.default_rng(7)
    n_img = 10
    feats = [_random_featureset(rng, 256, i) for i in range(n_img)]
    seed = _random_featureset(rng, 128, -1)
    # a 10-camera strip: jittered copies of the fixture pair's geometry
    reps = (n_img + 1) // 2
    cams = jtu.tree_map(lambda x: jnp.concatenate([x] * reps)[:n_img], cameras_2view)
    cams = cams.replace(
        cam_pos=cams.cam_pos + jnp.asarray(rng.normal(0, 0.5, (n_img, 3)).astype(np.float32)))

    for params in (MatchParams(mode="brute"),
                   MatchParams(mode="double", epsilon=200.0, delta=5.0)):
        ref = pairwise_index_matches(feats, cams, params, seed_features=seed)
        got = pairwise_index_matches(feats, cams, params, seed_features=seed,
                                     mesh=mesh24)
        assert set(ref.keys()) == set(got.keys())
        assert len(ref) == n_img * (n_img - 1) // 2
        for k in ref:
            np.testing.assert_array_equal(got[k], ref[k])


def test_sharded_generate_features_matches_single(mesh81):
    """Image-parallel SIFT on the mesh must reproduce generate_features
    (fused) exactly per image — same program, one image per device, with a
    non-multiple-of-device-count image list exercising the padding path."""
    from ssrlcv_tpu.config import SIFTParams
    from ssrlcv_tpu.features.sift import generate_features
    from ssrlcv_tpu.parallel.sharded import sharded_generate_features

    rng = np.random.default_rng(5)
    h = w = 96
    yy, xx = np.mgrid[0:h, 0:w]
    imgs = []
    for i in range(3):  # 3 images over 8 devices: padding + multi-image
        base = 128 + 100 * np.sin(xx / (4.0 + i)) * np.cos(yy / (6.0 - i))
        noise = rng.normal(0, 6, (h, w))
        imgs.append(np.clip(base + noise, 0, 255).astype(np.uint8))

    params = SIFTParams()
    px = jnp.stack([jnp.asarray(im) for im in imgs])
    feats, sat, ovf = sharded_generate_features(mesh81, px, [0, 1, 2], params)

    assert len(feats) == 3 and sat.shape[0] == 3 and ovf.shape[0] == 3
    total = 0
    for i, im in enumerate(imgs):
        ref = generate_features(im, params, image_id=i, fused=True)
        got = feats[i]
        np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(ref.mask))
        np.testing.assert_array_equal(np.asarray(got.loc), np.asarray(ref.loc))
        np.testing.assert_array_equal(np.asarray(got.sigma), np.asarray(ref.sigma))
        np.testing.assert_array_equal(np.asarray(got.theta), np.asarray(ref.theta))
        np.testing.assert_array_equal(
            np.asarray(got.descriptors), np.asarray(ref.descriptors))
        np.testing.assert_array_equal(np.asarray(got.parent), np.asarray(ref.parent))
        total += int(np.asarray(ref.mask).sum())
    assert total > 0, "synthetic images produced no keypoints — test is vacuous"
