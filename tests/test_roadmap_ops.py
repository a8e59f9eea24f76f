"""Tests for components beyond the minimum slice: FAST corners (reference
roadmap stub, implemented here), arbitrary bilinear rescale, grayscale->RGB,
and the octree wireframe PLY writer (io_fmt_ply equivalent)."""

import numpy as np
import pytest

import jax.numpy as jnp


def test_fast_detects_synthetic_corners():
    from ssrlcv_tpu.features.fast import detect_fast

    # bright 20x20 square on dark background: 4 strong corners
    img = np.zeros((64, 64), np.float32)
    img[20:40, 20:40] = 200.0
    locs, scores, mask = detect_fast(jnp.asarray(img), threshold=30.0, capacity=64)
    locs = np.asarray(locs)[np.asarray(mask)]
    assert len(locs) >= 4
    corners = np.array([[20, 20], [39, 20], [20, 39], [39, 39]], np.float32)
    for c in corners:
        d = np.min(np.linalg.norm(locs - c[None], axis=1))
        assert d <= 3.0, f"no FAST corner near {c} (nearest {d:.1f} px)"


def test_fast_flat_image_has_no_corners():
    from ssrlcv_tpu.features.fast import detect_fast

    img = jnp.full((64, 64), 100.0, jnp.float32)
    _, _, mask = detect_fast(img, threshold=20.0, capacity=64)
    assert int(np.asarray(mask).sum()) == 0


def test_scale_image_matches_upsample2x_and_identity():
    from ssrlcv_tpu.ops.image_ops import scale_image, upsample2x

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 255, (32, 24)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(scale_image(img, (64, 48))), np.asarray(upsample2x(img)), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(scale_image(img, (32, 24))), np.asarray(img), rtol=1e-6)


def test_to_rgb_replicates_channels():
    from ssrlcv_tpu.ops.image_ops import to_rgb

    img = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    rgb = np.asarray(to_rgb(img))
    assert rgb.shape == (3, 4, 3)
    for c in range(3):
        np.testing.assert_array_equal(rgb[..., c], np.asarray(img))


def test_octree_wireframe_and_edge_ply(tmp_path):
    from ssrlcv_tpu.io.ply import write_ply_edges
    from ssrlcv_tpu.mesh.octree import build_octree, octree_wireframe

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1, 1, (300, 3)).astype(np.float32))
    tree = build_octree(pts, jnp.ones(300, bool), depth=4)
    verts, edges = octree_wireframe(tree, level=1)
    # a fully occupied 2x2x2 lattice has 27 vertices and 54 unique edges
    assert verts.shape[1] == 3 and edges.shape[1] == 2
    assert edges.max() < len(verts)
    # every cube contributes axis-aligned unit edges of the cell size
    cell = (np.asarray(tree.bbox_max) - np.asarray(tree.bbox_min)) / 2
    ev = verts[edges[:, 0]] - verts[edges[:, 1]]
    lengths = np.abs(ev)
    for e in lengths:
        nz = e > 1e-6
        assert nz.sum() == 1  # axis-aligned
        np.testing.assert_allclose(e[nz], cell[nz], rtol=1e-4)

    p = write_ply_edges(str(tmp_path / "wire.ply"), verts, edges)
    raw = open(p, "rb").read()
    assert b"element edge" in raw
    header_end = raw.index(b"end_header\n") + len(b"end_header\n")
    body = raw[header_end:]
    assert len(body) == len(verts) * 12 + len(edges) * 8


def test_roadmap_stub_surface():
    from ssrlcv_tpu.features import roadmap

    with pytest.raises(NotImplementedError):
        roadmap.surf_feature_factory()

    pts = np.random.default_rng(1).uniform(0, 1, (50, 3))
    d, i = roadmap.kdtree(pts, pts[:5], k=3)
    assert d.shape == (5, 3)
    assert (i[:, 0] == np.arange(5)).all()  # nearest neighbour of a point is itself
