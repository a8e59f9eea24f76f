"""Sharded pipeline stages: distributed matching, triangulation, BA.

New TPU-native engineering (the reference is strictly single-GPU): the three
scaling-critical stages expressed with ``shard_map`` over the (data, feat)
mesh so XLA inserts ICI collectives:

  * matching — queries sharded over ``data``, targets sharded over ``feat``;
    each device reduces its local distance tile, then a min-reduction over
    ``feat`` (psum-style pmin with index packing) produces the global
    best match per query without ever materialising the full matrix.
  * triangulation — embarrassingly data-parallel over tracks; expressed as a
    sharding constraint so jit partitions it automatically.
  * bundle adjustment — per-shard gradient/Hessian blocks of the linear
    error objective psum-reduced over ``data``; the 12x12 camera solve is
    replicated (the Schur-style pattern from SURVEY.md §5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ssrlcv_tpu.core.types import Bundles, Cameras, MatchSet
from ssrlcv_tpu.geometry.bundles import generate_bundles
from ssrlcv_tpu.geometry.triangulation import two_view_triangulate
from ssrlcv_tpu.matching.distance import distance_matrix
from ssrlcv_tpu.parallel.mesh import DATA_AXIS, FEAT_AXIS


def sharded_best_target(mesh: Mesh, q_desc, t_desc, t_valid):
    """Distributed brute-force kNN: returns (best_idx, best_dist) per query.

    q: (Nq, 128) sharded over data; t: (Nt, 128) sharded over feat.
    Nq % data_size == 0 and Nt % feat_size == 0 required (pad first).
    """
    feat_size = mesh.shape[FEAT_AXIS]
    nt_shard = t_desc.shape[0] // feat_size

    def kernel(q, t, tv):
        # local tile: (nq_shard, nt_shard)
        d = distance_matrix(q, t).astype(jnp.float32)
        d = jnp.where(tv[None, :], d, jnp.inf)
        li = jnp.argmin(d, axis=1).astype(jnp.int32)
        ld = jnp.take_along_axis(d, li[:, None], axis=1)[:, 0]
        # globalise the target index for this feat shard
        shard = jax.lax.axis_index(FEAT_AXIS)
        gi = li + shard * nt_shard
        # two min-reductions over the feat axis: global min distance, then
        # the lowest global index among shards achieving it (exact integer
        # distances make the equality test safe)
        bd = jax.lax.pmin(ld, FEAT_AXIS)
        cand = jnp.where(ld == bd, gi, jnp.int32(2**31 - 1))
        bi = jax.lax.pmin(cand, FEAT_AXIS)
        return bi, bd

    return shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(FEAT_AXIS, None), P(FEAT_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
    )(q_desc, t_desc, t_valid)


def sharded_triangulate(mesh: Mesh, matches: MatchSet, cameras: Cameras):
    """Track-sharded 2-view triangulation: sharding constraints let jit
    partition the whole bundle+triangulate computation over data."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def step(ms: MatchSet, cams: Cameras):
        ms = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, sharding), ms
        )
        bd = generate_bundles(ms, cams)
        return two_view_triangulate(bd)

    return jax.jit(step)(matches, cameras)


def sharded_ba_step(mesh: Mesh, matches: MatchSet, cameras: Cameras, params_flat, lam):
    """One sharded LM iteration on the 2-view BA objective.

    Tracks are sharded over ``data``; each shard computes its gradient and
    Hessian contribution of the total linear error; psum reduces them; the
    (6N)x(6N) damped solve happens replicated on every device.  This is the
    distributed-BA building block (SURVEY.md §7 step 7).
    """
    n_cams = cameras.num_cameras

    def local_obj(p_flat, kp_loc, kp_parent, num_views, mask):
        ms = MatchSet(kp_loc=kp_loc, kp_parent=kp_parent, num_views=num_views, mask=mask)
        cams = cameras.replace(
            cam_pos=p_flat.reshape(n_cams, 6)[:, 0:3],
            cam_rot=p_flat.reshape(n_cams, 6)[:, 3:6],
        )
        bd = generate_bundles(ms, cams)
        from ssrlcv_tpu.geometry.triangulation import linear_error_objective

        return linear_error_objective(bd)

    free = jnp.ones((n_cams, 6), params_flat.dtype).at[0].set(0.0).reshape(-1)

    def kernel(p_flat, kp_loc, kp_parent, num_views, mask, lam_):
        g_local = jax.grad(local_obj)(p_flat, kp_loc, kp_parent, num_views, mask)
        H_local = jax.hessian(local_obj)(p_flat, kp_loc, kp_parent, num_views, mask)
        e_local = local_obj(p_flat, kp_loc, kp_parent, num_views, mask)
        g = jax.lax.psum(g_local, DATA_AXIS)
        H = jax.lax.psum(H_local, DATA_AXIS)
        err = jax.lax.psum(e_local, DATA_AXIS)
        g = g * free
        damped = H + lam_ * jnp.diag(jnp.maximum(jnp.diag(H), 1e-8))
        pin = 1.0 - free
        damped = damped * free[:, None] * free[None, :] + jnp.diag(pin)
        step = jnp.linalg.solve(damped, g)
        return p_flat - step * free, err

    return shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
    )(params_flat, matches.kp_loc, matches.kp_parent, matches.num_views, matches.mask,
      jnp.asarray(lam, params_flat.dtype))
