import numpy as np
import jax.numpy as jnp

from ssrlcv_tpu.core import camera_math as cm


def test_rotation_round_trip():
    rng = np.random.default_rng(0)
    angles = jnp.array(rng.uniform(-1.2, 1.2, (16, 3)), jnp.float32)
    R = cm.rotation_matrix(angles)
    # orthonormal
    I = jnp.einsum("...ij,...kj->...ik", R, R)
    np.testing.assert_allclose(np.asarray(I), np.broadcast_to(np.eye(3), I.shape), atol=1e-5)
    back = cm.axis_rotations(R)
    np.testing.assert_allclose(np.asarray(back), np.asarray(angles), atol=1e-4)


def test_rotate_point_matches_matrix():
    rng = np.random.default_rng(1)
    angles = jnp.array(rng.uniform(-1, 1, (8, 3)), jnp.float32)
    pts = jnp.array(rng.normal(size=(8, 3)), jnp.float32)
    out = cm.rotate_point(pts, angles)
    R = cm.rotation_matrix(angles)
    expect = jnp.einsum("...ij,...j->...i", R, pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-6)


def test_rodrigues_matches_euler_z():
    angle = jnp.float32(0.7)
    p = jnp.array([1.0, 2.0, 3.0], jnp.float32)
    a = cm.rotate_point_arbitrary(p, jnp.array([0.0, 0.0, 1.0]), angle)
    b = cm.rotate_point(p, jnp.array([0.0, 0.0, 0.7]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_projection_projects_camera_ray_to_pixel():
    """A pixel lifted by pixel_to_ray must project back to itself."""
    cam_pos = jnp.array([0.0, 0.0, 0.0])
    cam_rot = jnp.array([0.3, -0.2, 0.1])
    foc = jnp.float32(0.16)
    fov = jnp.float32(0.199)
    size = jnp.array([1024, 1024], jnp.int32)
    dpix = cm.effective_dpix(foc, fov, size[0])
    dpix2 = jnp.stack([dpix, dpix])
    ecef = jnp.zeros(3)

    loc = jnp.array([[100.0, 200.0], [512.0, 512.0], [1000.0, 31.0]])
    vec, pnt = cm.pixel_to_ray(loc, cam_pos, cam_rot, foc, fov, size)
    world = pnt + 5.0 * vec  # arbitrary depth
    P = cm.projection_matrix(cam_pos, cam_rot, foc, dpix2, size, ecef)
    wh = jnp.concatenate([world, jnp.ones((3, 1))], axis=1)
    proj = jnp.einsum("ij,nj->ni", P, wh)
    pix = proj[:, :2] / proj[:, 2:3]
    np.testing.assert_allclose(np.asarray(pix), np.asarray(loc), atol=1e-2)


def test_epipolar_segment_contains_true_match(fixture_2view=None):
    """Synthetic: a world point seen by two cameras — the segment through the
    target image must pass near the target projection of the point."""
    cam_rot0 = jnp.array([0.0, 0.0, 0.0])
    cam_pos0 = jnp.array([0.0, 0.0, -6778.0])  # ~400km orbit looking at origin... simplified
    # place the cameras so rays from cam0 hit the Earth shell
    foc = jnp.float32(0.16)
    fov = jnp.float32(0.199)
    size = jnp.array([1024, 1024], jnp.int32)
    dpix = cm.effective_dpix(foc, fov, size[0])
    dpix2 = jnp.stack([dpix, dpix])
    ecef = jnp.array([0.0, 0.0, 0.0])
    # query camera at +z above Earth center, looking down -z: rotate x by pi
    q_rot = jnp.array([jnp.pi, 0.0, 0.0])
    q_pos = jnp.array([0.0, 0.0, 6778.0])
    t_rot = jnp.array([jnp.pi, 0.05, 0.0])
    t_pos = jnp.array([200.0, 0.0, 6770.0])
    P = cm.projection_matrix(t_pos, t_rot, foc, dpix2, size, ecef)

    loc = jnp.array([[512.0, 512.0]])
    p1, p2 = cm.epipolar_segment_endpoints(
        loc, q_pos, q_rot, foc, dpix2, size, ecef, P, delta=10.0
    )
    # true world point: intersection of query ray with a mid shell radius
    vec, pnt = cm.pixel_to_ray(loc, q_pos, q_rot, foc, fov, size)
    # find t where |pnt + t*vec| = 6371
    a = jnp.sum(vec * vec)
    b = 2 * jnp.sum(vec * pnt)
    c = jnp.sum(pnt * pnt) - 6371.0 ** 2
    t = (-b - jnp.sqrt(b * b - 4 * a * c)) / (2 * a)
    world = pnt + t * vec
    wh = jnp.concatenate([world, jnp.ones((1, 1))], axis=1)
    proj = jnp.einsum("ij,nj->ni", P, wh)
    pix = proj[:, :2] / proj[:, 2:3]
    d = cm.point_segment_distance_2d(pix, p1, p2)
    assert float(d[0]) < 2.0, float(d[0])
