"""Octree / normals / isosurface / mesh post-processing tests."""

import numpy as np
import jax
import jax.numpy as jnp


def test_morton_keys_order_locality():
    from ssrlcv_tpu.mesh.octree import build_octree

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0, 1, (512, 3)).astype(np.float32))
    tree = build_octree(pts, jnp.ones(512, bool), depth=8)
    keys = np.asarray(tree.keys)
    assert (np.diff(keys.astype(np.int64)) >= 0).all()
    # successive points in Morton order should be spatially close on average
    p = np.asarray(tree.points)
    step = np.linalg.norm(np.diff(p, axis=0), axis=1)
    rand_step = np.linalg.norm(p[:-1] - p[::-1][:-1], axis=1)
    assert step.mean() < 0.5 * rand_step.mean()


def test_knn_window_approximates_exact():
    from ssrlcv_tpu.mesh.octree import build_octree, knn, knn_exact

    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(0, 1, (256, 3)).astype(np.float32))
    mask = jnp.ones(256, bool)
    tree = build_octree(pts, mask)
    idx, dist = knn(tree, k=4, window=64)
    eidx, edist = knn_exact(tree.points, tree.mask, k=4)
    # with a wide window the approximate distances should match exactly for
    # nearly all points
    close = np.isclose(np.asarray(dist), np.asarray(edist), atol=1e-5).all(axis=1)
    assert close.mean() > 0.75, close.mean()
    # and the approximation never reports a *smaller* distance than exact
    assert (np.asarray(dist) >= np.asarray(edist) - 1e-5).all()


def test_normals_on_plane():
    from ssrlcv_tpu.mesh.octree import build_octree, compute_normals

    rng = np.random.default_rng(2)
    xy = rng.uniform(0, 1, (400, 2)).astype(np.float32)
    pts = jnp.asarray(np.column_stack([xy, np.zeros(400, np.float32)]))
    tree = build_octree(pts, jnp.ones(400, bool))
    cams = jnp.asarray([[0.5, 0.5, 10.0]])
    normals = compute_normals(tree, cams, k=6, window=48)
    nz = np.asarray(normals)[:, 2]
    assert (nz > 0.99).mean() > 0.95  # camera-facing +z normals


def test_low_density_filter_drops_outlier():
    from ssrlcv_tpu.mesh.meshfactory import filter_by_neighbor_distance

    rng = np.random.default_rng(3)
    cluster = rng.normal(0, 0.1, (200, 3)).astype(np.float32)
    outlier = np.array([[50.0, 50.0, 50.0]], np.float32)
    pts = jnp.asarray(np.vstack([cluster, outlier]))
    mask = jnp.ones(201, bool)
    keep = filter_by_neighbor_distance(pts, mask, sigma=3.0, k=4, window=32)
    keep = np.asarray(keep)
    assert not keep[200]          # outlier dropped
    assert keep[:200].mean() > 0.95


def test_marching_tetrahedra_sphere():
    from ssrlcv_tpu.mesh.marching_cubes import compact_mesh, marching_tetrahedra

    res = 24
    ax = jnp.linspace(-1.2, 1.2, res)
    gx, gy, gz = jnp.meshgrid(ax, ax, ax, indexing="ij")
    field = 1.0 - jnp.sqrt(gx**2 + gy**2 + gz**2)  # inside sphere > 0
    spacing = jnp.full(3, float(ax[1] - ax[0]))
    tris, mask = marching_tetrahedra(field, jnp.full(3, -1.2), spacing)
    verts, faces = compact_mesh(np.asarray(tris), np.asarray(mask))
    assert len(faces) > 200
    r = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(r.mean(), 1.0, atol=0.05)
    assert r.std() < 0.05


def test_surface_reconstruction_plane():
    from ssrlcv_tpu.mesh.meshfactory import reconstruct_surface

    rng = np.random.default_rng(5)
    xy = rng.uniform(0, 1, (500, 2)).astype(np.float32)
    pts = jnp.asarray(np.column_stack([xy, 0.5 + 0.0 * xy[:, :1]]))
    mesh = reconstruct_surface(pts, jnp.ones(500, bool), jnp.asarray([[0.5, 0.5, 5.0]]), resolution=24, k=6)
    assert len(mesh.faces) > 50
    # reconstructed surface should hug z=0.5
    assert abs(float(np.mean(mesh.points[:, 2])) - 0.5) < 0.05


def test_cloud_difference_metric():
    from ssrlcv_tpu.mesh.meshfactory import average_cloud_difference

    a = np.zeros((10, 3), np.float32)
    b = np.ones((10, 3), np.float32)
    assert abs(average_cloud_difference(a, b) - np.sqrt(3)) < 1e-5
