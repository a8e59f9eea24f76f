"""Auxiliary subsystem tests: stereo, cloud ops, anatomy io, planar filter."""

import io

import numpy as np
import jax
import jax.numpy as jnp


def test_disparity_scan_matching_recovers_shift():
    from ssrlcv_tpu.geometry.stereo import disparity_scan_matching

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (64, 96)).astype(np.uint8)
    shift = 7
    # feature at query x appears at target x + shift (direction 'right')
    target = np.roll(base, shift, axis=1)
    disp, valid = disparity_scan_matching(
        jnp.asarray(base), jnp.asarray(target), max_disparity=16, window=5
    )
    d = np.asarray(disp)[np.asarray(valid)]
    assert (d == shift).mean() > 0.9, (d == shift).mean()


def test_stereo_depth_formulas():
    from ssrlcv_tpu.geometry.stereo import compute_stereo_focal, compute_stereo_scale

    loc0 = jnp.array([[10.0, 5.0]])
    loc1 = jnp.array([[6.0, 5.0]])
    p = compute_stereo_scale(loc0, loc1, scale=8.0)
    np.testing.assert_allclose(np.asarray(p)[0], [10.0, 5.0, 32.0])
    p2 = compute_stereo_focal(loc0, loc1, foc=2.0, baseline=8.0)
    np.testing.assert_allclose(np.asarray(p2)[0], [6.0, 5.0, 4.0])


def test_heat_map_endpoints():
    from ssrlcv_tpu.geometry.stereo import heat_map

    rgb = heat_map(np.array([0.0, 0.5, 1.0]))
    np.testing.assert_array_equal(rgb[0], [255, 0, 0])
    np.testing.assert_array_equal(rgb[2], [0, 0, 255])
    assert rgb[1][1] == 255


def test_cloud_ops_round_trip():
    from ssrlcv_tpu.geometry.cloud_ops import cloud_average, rotate_cloud, scale_cloud, translate_cloud

    pts = jnp.asarray(np.random.default_rng(1).normal(size=(32, 3)).astype(np.float32))
    out = translate_cloud(scale_cloud(pts, 2.0), jnp.array([1.0, 0, 0]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts) * 2 + [1, 0, 0], rtol=1e-6)
    rot = rotate_cloud(pts, jnp.array([0.0, 0.0, np.pi / 2]))
    np.testing.assert_allclose(np.asarray(rot)[:, 0], -np.asarray(pts)[:, 1], atol=1e-5)
    avg = cloud_average(pts, jnp.ones(32, bool))
    np.testing.assert_allclose(np.asarray(avg), np.asarray(pts).mean(0), atol=1e-5)


def test_anatomy_reader():
    from ssrlcv_tpu.io.anatomy import read_features, read_matches

    desc = " ".join(str(i % 256) for i in range(128))
    text = f"10.5 20.5 1.5 0.7 {desc}\n30.0 40.0 2.0 1.1 {desc}\n"
    f = read_features(io.StringIO(text))
    assert f["loc"].shape == (2, 2)
    np.testing.assert_allclose(f["loc"][0], [10.5, 20.5])
    assert f["values"][0][5] == 5

    m = read_matches(io.StringIO("1 2 3 4 5 6 7 8\n"))
    np.testing.assert_allclose(m["loc0"][0], [1, 2])
    np.testing.assert_allclose(m["loc1"][0], [5, 6])


def test_anatomy_real_scale_file(fixture_2view):
    """Anatomy reader against a checked-in real-distribution file
    (tests/data/anatomy_seed_features.txt: the golden seed-image feature
    dump re-encoded in the IPOL text format by io.anatomy.write_features —
    a genuine IPOL CLI output is not obtainable offline, so the writer +
    the reference's own golden descriptors stand in; parity is asserted
    against the .uty arrays bit-for-bit on the uchar descriptors)."""
    import os

    from ssrlcv_tpu.io.anatomy import read_features, write_features

    path = os.path.join(os.path.dirname(__file__), "data", "anatomy_seed_features.txt")
    f = read_features(path)
    gold = fixture_2view["seed_features"]
    n = f["loc"].shape[0]
    assert n == 2000
    np.testing.assert_allclose(f["loc"], gold["loc"][:n], atol=1e-5)
    np.testing.assert_allclose(f["sigma"], gold["sigma"][:n], rtol=1e-5)
    np.testing.assert_array_equal(f["values"], gold["values"][:n])
    # writer round-trip on the parsed arrays reproduces the file verbatim
    buf = io.StringIO()
    write_features(buf, f["loc"], f["sigma"], f["theta"], f["values"])
    with open(path) as fh:
        assert buf.getvalue() == fh.read()


def test_visualize_plane_estimation(tmp_path, cameras_2view, matchset_2view, fixture_2view):
    from ssrlcv_tpu.core.types import PointCloud
    from ssrlcv_tpu.geometry.cloud_ops import visualize_plane_estimation
    from ssrlcv_tpu.io.ply import read_ply

    pts = fixture_2view["points0"]
    cloud = PointCloud(
        points=jnp.asarray(pts),
        errors=jnp.zeros(len(pts), jnp.float32),
        mask=jnp.ones(len(pts), bool),
    )
    p = visualize_plane_estimation(cloud, cameras_2view, str(tmp_path / "plane.ply"), scale=200.0)
    d = read_ply(p)
    verts, faces = d["points"], d["faces"]
    side = 2 * (200 // 40)
    assert verts.shape == (side * side, 3)
    assert faces.shape == ((side - 1) ** 2, 4)  # quad encoding
    # every vertex satisfies the plane equation it was generated from
    n = np.cross(verts[1] - verts[0], verts[side] - verts[0])
    n = n / np.linalg.norm(n)
    d = np.abs((verts - verts[0]) @ n)
    assert d.max() < 1e-2


def test_exhaustive_overlap_skip(fixture_2view, cameras_2view):
    """ordered + estimated_overlap skips far-apart pairs:
    (j - i) * (1 - overlap) > 1 is dropped (MatchFactory.cu:927)."""
    from unittest import mock

    from ssrlcv_tpu.config import MatchParams
    from ssrlcv_tpu.features.sift import features_from_refdata
    from ssrlcv_tpu.matching import tracks as T

    seed = features_from_refdata(fixture_2view["seed_features"])
    feats = [seed] * 4
    calls = []

    def fake_match(q, t, cams, i, j, params, seed_dist=None, **kw):
        calls.append((int(i), int(j)))
        import jax.numpy as jnp
        from ssrlcv_tpu.matching.match import DMatches
        n = q.capacity
        return DMatches(jnp.zeros(n, jnp.int32), jnp.full(n, jnp.inf), jnp.zeros(n, bool))

    with mock.patch("ssrlcv_tpu.matching.match.match_double_constrained", fake_match):
        T.pairwise_index_matches(feats, cameras_2view, MatchParams(mode="double"),
                                 ordered=True, estimated_overlap=0.5)
    # (1 - 0.5) * gap <= 1 keeps only gap <= 2
    assert set(calls) == {(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)}
    calls.clear()
    with mock.patch("ssrlcv_tpu.matching.match.match_double_constrained", fake_match):
        T.pairwise_index_matches(feats, cameras_2view, MatchParams(mode="double"))
    assert len(calls) == 6  # unordered: all pairs


def test_planar_filter_drops_off_plane_track(fixture_2view, cameras_2view, matchset_2view):
    from ssrlcv_tpu.geometry import filters as F

    ms = F.planar_cutoff_filter(matchset_2view, cameras_2view, cutoff=50.0)
    kept = int(ms.count())
    total = int(matchset_2view.count())
    assert 0.5 * total < kept <= total


def test_reduce_bundle_set(matchset_2view):
    from ssrlcv_tpu.geometry import filters as F

    ms = F.reduce_bundle_set(matchset_2view, 0.1)
    assert abs(int(ms.count()) - int(matchset_2view.count()) // 10) <= 1


def test_debug_cloud_writers(tmp_path, fixture_2view, cameras_2view, matchset_2view):
    from ssrlcv_tpu.geometry import bundles as B
    from ssrlcv_tpu.geometry import cloud_ops as ops
    from ssrlcv_tpu.geometry import triangulation as T
    from ssrlcv_tpu.io import ply

    bd = B.generate_bundles(matchset_2view, cameras_2view)
    pc, _ = T.two_view_triangulate(bd)
    p1 = ops.save_debug_cloud(str(tmp_path / "debug"), pc, cameras_2view, bd)
    back = ply.read_ply(p1)
    assert back["colors"] is not None and len(back["points"]) > len(np.asarray(pc.points))
    p2 = ops.save_linear_error_cloud(str(tmp_path / "err"), pc)
    assert ply.read_ply(p2)["colors"] is not None


def test_sensitivity_sweeps(tmp_path, cameras_2view, matchset_2view):
    from ssrlcv_tpu.geometry.cloud_ops import generate_sensitivity_functions

    out = generate_sensitivity_functions(
        matchset_2view, cameras_2view, str(tmp_path),
        deltas=np.linspace(-1e-4, 1e-4, 5),
    )
    assert len(out) == 6
    rows = open(out["rot_x"]).read().strip().splitlines()
    assert rows[0] == "offset,linear_error"
    assert len(rows) == 6
    # error should be minimised near zero offset
    errs = [float(r.split(",")[1]) for r in rows[1:]]
    assert errs[2] <= max(errs)


def test_ba_noise_injection(cameras_2view, matchset_2view):
    from ssrlcv_tpu.geometry.cloud_ops import test_bundle_adjustment_noise

    clean, noisy, recovered = test_bundle_adjustment_noise(
        matchset_2view, cameras_2view, jax.random.PRNGKey(0),
        noise_rot=5e-5, noise_pos=0.005, iterations=15,
    )
    assert noisy > clean
    assert recovered < noisy
