"""Worker for the 2-process jax.distributed smoke test (VERDICT r3 #6).

Run as: python tests/two_process_worker.py <process_id> <port>

Each of the 2 processes pins the CPU platform, forces 4 virtual local
devices, joins the jax.distributed cluster (the bring-up path of
ssrlcv_tpu.parallel.mesh.initialize_distributed), builds the global
(4, 2) mesh spanning both processes, and runs:

  * sharded_best_target — exact agreement with a local numpy oracle
  * sharded_bundle_adjust (1 LM iteration) — agreement with the dense
    single-process objective/gradient step computed locally

Exits non-zero on any mismatch; the parent test asserts both exit codes.
"""

import os
import sys


def main(pid: int, port: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from ssrlcv_tpu.parallel.mesh import (
        DATA_AXIS, FEAT_AXIS, initialize_distributed, make_mesh)

    initialize_distributed(
        coordinator=f"127.0.0.1:{port}", num_processes=2, process_id=pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 8, jax.device_count()

    mesh = make_mesh(jax.devices(), data=4, feat=2)
    from jax.experimental import multihost_utils

    from ssrlcv_tpu.parallel import sharded

    # --- distributed brute-force matching vs numpy oracle -----------------
    rng = np.random.default_rng(0)
    q = rng.integers(0, 256, (64, 128)).astype(np.uint8)
    t = rng.integers(0, 256, (128, 128)).astype(np.uint8)
    tv = rng.random(128) > 0.1

    qg = jax.device_put(q, NamedSharding(mesh, P(DATA_AXIS)))
    tg = jax.device_put(t, NamedSharding(mesh, P(FEAT_AXIS)))
    tvg = jax.device_put(tv, NamedSharding(mesh, P(FEAT_AXIS)))
    bi, bd = sharded.sharded_best_target(mesh, qg, tg, tvg)
    bi_np = np.asarray(multihost_utils.process_allgather(bi, tiled=True))
    bd_np = np.asarray(multihost_utils.process_allgather(bd, tiled=True))

    d = ((q.astype(np.int64)[:, None, :] - t.astype(np.int64)[None, :, :]) ** 2).sum(-1)
    d = np.where(tv[None, :], d, np.iinfo(np.int64).max).astype(np.float64)
    ref_idx = d.argmin(axis=1)  # first minimum — the kernel's tie-break
    ref_dist = d.min(axis=1)
    np.testing.assert_array_equal(bi_np, ref_idx)
    np.testing.assert_array_equal(bd_np, ref_dist)

    # --- distributed BA LM step vs the dense local objective --------------
    from ssrlcv_tpu.ba.two_view import _pack, make_objective
    from ssrlcv_tpu.core.types import Cameras, MatchSet
    from ssrlcv_tpu.parallel.sharded import _lm_solve

    n_cams, tracks = 2, 64
    cams = Cameras(
        cam_pos=np.asarray(rng.normal(0, 10, (n_cams, 3)), np.float32),
        cam_rot=np.asarray(rng.normal(0, 0.1, (n_cams, 3)), np.float32),
        fov=np.full((n_cams, 2), 0.0418879, np.float32),
        foc=np.full((n_cams,), 0.8593, np.float32),
        dpix=np.full((n_cams, 2), 3.515625e-05, np.float32),
        size=np.full((n_cams, 2), 1024, np.int32),
        ecef_offset=np.zeros((n_cams, 3), np.float32),
        timestamp=np.zeros((n_cams,), np.int32),
    )
    kp_loc = np.asarray(rng.uniform(100, 900, (tracks, 2, 2)), np.float32)
    ms_np = MatchSet(
        kp_loc=kp_loc,
        kp_parent=np.tile(np.array([0, 1], np.int32), (tracks, 1)),
        num_views=np.full((tracks,), 2, np.int32),
        mask=np.ones((tracks,), bool),
    )
    sh = NamedSharding(mesh, P(DATA_AXIS))
    ms_g = MatchSet(
        kp_loc=jax.device_put(ms_np.kp_loc, sh),
        kp_parent=jax.device_put(ms_np.kp_parent, sh),
        num_views=jax.device_put(ms_np.num_views, sh),
        mask=jax.device_put(ms_np.mask, sh),
    )
    # cameras stay replicated: uncommitted jnp leaves (identical values in
    # every process) close over the shard_map kernel as constants
    cams = jax.tree_util.tree_map(jnp.asarray, cams)
    p0 = _pack(cams).reshape(-1)
    lam = 1e-3
    new_p, err = sharded.sharded_ba_step(mesh, ms_g, cams, p0, lam)
    # P() outputs are replicated: every addressable shard holds the value
    new_p_np = np.asarray(new_p.addressable_shards[0].data)
    err_np = float(np.asarray(err.addressable_shards[0].data))

    # dense single-process reference on local arrays
    obj = make_objective(ms_np, cams)
    flat_obj = lambda p: obj(p.reshape(n_cams, 6))
    g = jax.grad(flat_obj)(p0)
    H = jax.hessian(flat_obj)(p0)
    free = jnp.ones((n_cams, 6)).at[0].set(0.0).reshape(-1)
    step = _lm_solve(H, g * free, jnp.asarray(lam), free)
    ref_p = np.asarray(p0 - step * free)

    np.testing.assert_allclose(err_np, float(flat_obj(p0)), rtol=1e-6)
    np.testing.assert_allclose(new_p_np.reshape(-1), ref_p, rtol=1e-4, atol=1e-7)

    print(f"worker {pid}: OK ({jax.process_count()} processes, "
          f"{jax.device_count()} global devices)")


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
