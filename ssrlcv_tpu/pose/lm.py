"""Levenberg-Marquardt relative-pose refinement.

TPU re-design of PoseEstimator::LM_optimize (PoseEstimator.cu:314-520).
The residual per match is the skew-line closest-point gap (s1 - s2, 0) in the
relative frame (query camera at origin/identity; target at pose position with
Euler rotation) — getResidual, PoseEstimator.cu:754-820.  The reference
differentiates it by central finite differences *and zeroes the position
columns* (computeResidualsAndJacobian, PoseEstimator.cu:647-738), so only
rotation is optimised; we keep that structure but compute the rotation block
with exact autodiff.

LM schedule replicated: JTJ + lambda*I, SVD pseudo-inverse with singular
values <= 1e-4 clamped, delta = -JTJ^+ JTf; on rejection lambda *= 2 (max 20
inner tries), on acceptance lambda /= 4; up to 50 outer iterations.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ssrlcv_tpu.config import PoseParams
from ssrlcv_tpu.core import camera_math
from ssrlcv_tpu.core.types import Cameras, MatchSet


class Pose(NamedTuple):
    """roll/pitch/yaw + position (reference Pose, PoseEstimator.cuh:20)."""

    rot: jax.Array  # (3,) roll, pitch, yaw
    pos: jax.Array  # (3,) in 1/1000 km units (as the reference stores it)


def _residuals(rot, pos, q_loc, t_loc, q_dpix, q_foc, q_size, t_dpix, t_foc, t_size):
    """(N, 4) skew-line gap residuals (getResidual)."""
    qvec = jnp.stack(
        [
            q_dpix[0] * (q_loc[:, 0] - q_size[0] / 2.0),
            q_dpix[1] * (q_loc[:, 1] - q_size[1] / 2.0),
            jnp.full_like(q_loc[:, 0], q_foc),
        ],
        axis=-1,
    )
    qvec = qvec / jnp.linalg.norm(qvec, axis=-1, keepdims=True)
    tvec = jnp.stack(
        [
            t_dpix[0] * (t_loc[:, 0] - t_size[0] / 2.0),
            t_dpix[1] * (t_loc[:, 1] - t_size[1] / 2.0),
            jnp.full_like(t_loc[:, 0], t_foc),
        ],
        axis=-1,
    )
    tvec = camera_math.rotate_point(tvec, rot)
    tvec = tvec / jnp.linalg.norm(tvec, axis=-1, keepdims=True)

    qpnt = jnp.zeros_like(qvec)
    tpnt = jnp.broadcast_to(pos, tvec.shape)

    from ssrlcv_tpu.geometry.triangulation import two_view_midpoints

    s1, s2 = two_view_midpoints(qvec, qpnt, tvec, tpnt)
    gap = s1 - s2
    return jnp.concatenate([gap, jnp.zeros_like(gap[:, :1])], axis=1)


def lm_optimize(
    matches: MatchSet,
    cameras: Cameras,
    params: PoseParams,
) -> Pose:
    """Run the reference's LM loop on the 2-view match set.  Initial pose
    from camera telemetry (LM_optimize:324-331 + Pipeline.cu:105-122)."""
    q_rot = cameras.cam_rot[0]
    # initial relative rotation: R_rel = R0^T R1
    R0 = camera_math.rotation_matrix(cameras.cam_rot[0])
    R1 = camera_math.rotation_matrix(cameras.cam_rot[1])
    rel = jnp.matmul(R0.T, R1, precision="highest")
    rot0 = camera_math.axis_rotations(rel)
    # initial relative position (LM_optimize: target - query, de-rotated by
    # query Euler angles applied in z,y,x order, /1000)
    pos = cameras.cam_pos[1] - cameras.cam_pos[0]
    pos = camera_math.rotate_point_arbitrary(pos, jnp.array([0.0, 0.0, 1.0]), -q_rot[2])
    pos = camera_math.rotate_point_arbitrary(pos, jnp.array([0.0, 1.0, 0.0]), -q_rot[1])
    pos = camera_math.rotate_point_arbitrary(pos, jnp.array([1.0, 0.0, 0.0]), -q_rot[0])
    pos0 = pos / 1000.0

    mask = matches.mask
    q_loc = matches.kp_loc[:, 0]
    t_loc = matches.kp_loc[:, 1]
    q_dpix = cameras.dpix[0]
    t_dpix = cameras.dpix[1]
    q_foc = cameras.foc[0]
    t_foc = cameras.foc[1]
    q_size = cameras.size[0].astype(jnp.float32)
    t_size = cameras.size[1].astype(jnp.float32)

    def res_fn(rot, pos):
        r = _residuals(rot, pos, q_loc, t_loc, q_dpix, q_foc, q_size, t_dpix, t_foc, t_size)
        return jnp.where(mask[:, None], r, 0.0)

    def cost_fn(rot, pos):
        r = res_fn(rot, pos)
        return jnp.sum(r * r)

    def outer(state):
        rot, pos, lam, done, it = state
        r = res_fn(rot, pos)                       # (N, 4)
        Jrot = jax.jacfwd(lambda rr: res_fn(rr, pos))(rot)  # (N, 4, 3)
        J = jnp.concatenate([Jrot, jnp.zeros_like(Jrot)], axis=2)  # pos cols zeroed
        Jf = J.reshape(-1, 6)
        rf = r.reshape(-1)
        JTJ0 = jnp.einsum("ni,nj->ij", Jf, Jf, precision="highest")
        JTf = jnp.einsum("ni,n->i", Jf, rf, precision="highest")
        cost = jnp.sum(rf * rf)

        def inner(carry):
            lam_i, it, best_rot, best_pos, new_cost, accepted = carry
            JTJ = JTJ0 + lam_i * jnp.eye(6)
            U, S, Vt = jnp.linalg.svd(JTJ)
            s_inv = jnp.where(S > 1e-4, 1.0 / S, 0.0)
            delta = -(Vt.T * s_inv[None, :]) @ (U.T @ JTf)
            cand_rot = rot + delta[0:3]
            cand_pos = pos + delta[3:6]
            c = cost_fn(cand_rot, cand_pos)
            ok = c < cost
            return (
                jnp.where(ok, lam_i, lam_i * 2.0),
                it + 1,
                jnp.where(ok, cand_rot, best_rot),
                jnp.where(ok, cand_pos, best_pos),
                jnp.where(ok, c, new_cost),
                accepted | ok,
            )

        def inner_cond(carry):
            lam_i, it, *_ , accepted = carry
            return (~accepted) & (it < params.max_inner_iterations)

        lam_f, _, new_rot, new_pos, _, accepted = jax.lax.while_loop(
            inner_cond, inner, (lam, 0, rot, pos, cost + 100.0, jnp.asarray(False))
        )
        return (
            jnp.where(accepted, new_rot, rot),
            jnp.where(accepted, new_pos, pos),
            jnp.where(accepted, lam_f / 4.0, lam_f),
            done | ~accepted,
            it + 1,
        )

    # the whole <=50-outer-iteration LM schedule runs as DEVICE control flow
    # (one dispatch, one fetch): the reference's host loop would cost a
    # >=25 ms device->host round trip per iteration on a tunneled backend
    # (VERDICT r4 #4) — same pattern as ba/two_view's fori_loop
    def outer_cond(state):
        _, _, _, done, it = state
        return (~done) & (it < params.max_outer_iterations)

    state0 = (rot0, pos0, jnp.asarray(params.initial_lambda, jnp.float32),
              jnp.asarray(False), jnp.int32(0))
    rot, pos, _, _, _ = jax.jit(
        lambda s: jax.lax.while_loop(outer_cond, outer, s)
    )(state0)
    return Pose(rot=rot, pos=pos)


def apply_pose(cameras: Cameras, pose: Pose) -> Cameras:
    """Write the refined relative pose back into camera 1
    (Pipeline.cu:127-135): pos1 = pos0 + R(rot0) @ (1000*pose.pos);
    R1 = R(rot0) @ R(pose.rot)."""
    new_pos = cameras.cam_pos[0] + camera_math.rotate_point(
        1000.0 * pose.pos, cameras.cam_rot[0]
    )
    R = jnp.matmul(
        camera_math.rotation_matrix(cameras.cam_rot[0]),
        camera_math.rotation_matrix(pose.rot),
        precision="highest",
    )
    new_rot = camera_math.axis_rotations(R)
    return cameras.replace(
        cam_pos=cameras.cam_pos.at[1].set(new_pos),
        cam_rot=cameras.cam_rot.at[1].set(new_rot),
    )


def refine_relative_pose(matches: MatchSet, cameras: Cameras, params: PoseParams) -> Cameras:
    """doPoseEstimation's LM path (Pipeline.cu:74-171)."""
    pose = lm_optimize(matches, cameras, params)
    return apply_pose(cameras, pose)
