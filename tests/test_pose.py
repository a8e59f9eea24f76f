"""Pose estimation tests: LM pose refinement + RANSAC F-matrix."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssrlcv_tpu.config import PoseParams
from ssrlcv_tpu.core import camera_math as cm
from ssrlcv_tpu.core.types import Cameras, MatchSet


def _synthetic_two_view(n=200, seed=0, rot_noise=0.0):
    """Two cameras looking at an Earth-like shell of points; returns exact
    projected matches and the camera rig."""
    rng = np.random.default_rng(seed)
    foc = 0.8593
    fov = 0.0418879
    size = np.array([1024, 1024], np.int32)
    dpix = float(cm.effective_dpix(jnp.float32(foc), jnp.float32(fov), jnp.int32(size[0])))

    cam_pos = np.array([[0.0, 0.0, 0.0], [-70.0, 3.0, 1.5]], np.float32)
    cam_rot = np.array(
        [[2.0568, 0.0222, -0.0420], [2.0539 + rot_noise, -0.0593, 0.1125]], np.float32
    )
    cams = Cameras(
        cam_pos=jnp.asarray(cam_pos),
        cam_rot=jnp.asarray(cam_rot),
        fov=jnp.full((2, 2), fov),
        foc=jnp.full((2,), foc),
        dpix=jnp.full((2, 2), dpix),
        size=jnp.asarray(np.stack([size, size])),
        ecef_offset=jnp.zeros((2, 3)),
        timestamp=jnp.zeros((2,), jnp.int32),
    )

    # world points: sample pixels in image 0, push along the ray
    loc0 = rng.uniform(200, 800, (n, 2)).astype(np.float32)
    vec, pnt = cm.pixel_to_ray(
        jnp.asarray(loc0), cams.cam_pos[0], cams.cam_rot[0], cams.foc[0],
        cams.fov[0, 0], cams.size[0],
    )
    depth = rng.uniform(380, 420, (n, 1)).astype(np.float32)
    world = np.asarray(pnt + depth * vec)

    # project into image 1
    P1 = cm.projection_matrix(
        cams.cam_pos[1], cams.cam_rot[1], cams.foc[1], cams.dpix[1],
        cams.size[1], cams.ecef_offset[1],
    )
    wh = jnp.concatenate([jnp.asarray(world), jnp.ones((n, 1))], axis=1)
    proj = jnp.einsum("ij,nj->ni", P1, wh)
    loc1 = np.asarray(proj[:, :2] / proj[:, 2:3])

    inside = ((loc1 > 5) & (loc1 < 1019)).all(axis=1)
    loc0, loc1 = loc0[inside], loc1[inside]
    n = len(loc0)
    kp_loc = np.stack([loc0, loc1], axis=1)
    ms = MatchSet(
        kp_loc=jnp.asarray(kp_loc),
        kp_parent=jnp.tile(jnp.array([0, 1], jnp.int32), (n, 1)),
        num_views=jnp.full((n,), 2, jnp.int32),
        mask=jnp.ones((n,), bool),
    )
    return ms, cams


def test_lm_pose_reduces_gap_on_perturbed_rig():
    from ssrlcv_tpu.ba.two_view import make_objective, _pack
    from ssrlcv_tpu.pose.lm import refine_relative_pose

    ms, cams_true = _synthetic_two_view(rot_noise=0.0)
    # perturb camera-1 rotation; matches were made with the TRUE rig
    cams_bad = cams_true.replace(
        cam_rot=cams_true.cam_rot.at[1].add(jnp.array([2e-4, -1e-4, 1.5e-4]))
    )
    obj = make_objective(ms, cams_true)
    err_bad = float(obj(_pack(cams_bad)))
    err_true = float(obj(_pack(cams_true)))
    assert err_bad > 5 * max(err_true, 1e-12)

    cams_fixed = refine_relative_pose(ms, cams_bad, PoseParams())
    err_fixed = float(obj(_pack(cams_fixed)))
    assert err_fixed < 0.5 * err_bad, (err_true, err_bad, err_fixed)


def test_ransac_finds_inlier_consensus():
    from ssrlcv_tpu.pose.ransac import estimate_pose_ransac

    ms, cams = _synthetic_two_view(n=300, seed=3)
    # corrupt 20% of matches
    rng = np.random.default_rng(4)
    loc = np.asarray(ms.kp_loc).copy()
    n = loc.shape[0]
    bad = rng.choice(n, n // 5, replace=False)
    loc[bad, 1] += rng.uniform(50, 200, (len(bad), 2))
    ms = ms.replace(kp_loc=jnp.asarray(loc))

    r = estimate_pose_ransac(ms, cams, jax.random.PRNGKey(0), num_candidates=512)
    frac = float(r.num_inliers) / n
    assert frac > 0.5, frac
    # corrupted matches should mostly be outliers
    inl = np.asarray(r.inliers)
    assert inl[bad].mean() < 0.3
    # R should be a proper rotation
    R = np.asarray(r.R)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    assert np.linalg.det(R) > 0.9
