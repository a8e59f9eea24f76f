"""Micro-bench round 2: cutting the per-keypoint gather cost on TPU.

The SIFT orientation/descriptor hot op gathers (K, S, S) samples of
(gx, gy) from (B, H, W, 2).  Measured round 1: ~124M elem/s for the plain
multi-dim gather — the whole front end is gather-bound.  Candidates here:

  A. baseline multi-dim gather of (.., 2) pairs
  E. packed gather: gx/gy bitcast-packed into ONE f32 (2 x f16) -> half the
     gathered elements, unpack on the VPU
  F. row gather via lax.gather slice_sizes (1,1,128,1) on the packed image
     (aligned 128-lane rows), math done in the lane frame
  G. batched per-keypoint patch: row-gather an aligned (R, 128) patch per
     keypoint, then take_along_axis within it
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

B, H, W = 5, 2048, 2048
K, S = 16384, 33
WMAX = S // 2
LANES = 128

rng = np.random.default_rng(0)
grads = jnp.asarray(rng.standard_normal((B, H, W, 2), dtype=np.float32))
bi = jnp.asarray(rng.integers(1, B - 1, K), jnp.int32)
cy = jnp.asarray(rng.integers(WMAX + 1, H - WMAX - 1, K), jnp.int32)
cx = jnp.asarray(rng.integers(WMAX + 1, W - WMAX - 1, K), jnp.int32)
offs = jnp.arange(S, dtype=jnp.int32) - WMAX


def t(fn, *args, reps=5):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return dt, out


def pack(g):
    # (B, H, W, 2) f32 -> (B, H, W) f32 bit-carrying two f16
    h16 = g.astype(jnp.float16)
    u = h16.view(jnp.uint16).astype(jnp.uint32)
    packed = u[..., 0] | (u[..., 1] << 16)
    return packed.view(jnp.float32)


def unpack(p):
    u = p.view(jnp.uint32)
    lo = (u & 0xFFFF).astype(jnp.uint16).view(jnp.float16).astype(jnp.float32)
    hi = (u >> 16).astype(jnp.uint16).view(jnp.float16).astype(jnp.float32)
    return lo, hi


gpacked = jax.jit(pack)(grads)
jax.block_until_ready(gpacked)


def strat_a(grads, bi, cy, cx):
    yi = cy[:, None, None] + offs[None, :, None]
    xi = cx[:, None, None] + offs[None, None, :]
    return grads[bi[:, None, None], yi, xi]


def strat_e(gpacked, bi, cy, cx):
    yi = cy[:, None, None] + offs[None, :, None]
    xi = cx[:, None, None] + offs[None, None, :]
    p = gpacked[bi[:, None, None], yi, xi]
    gx, gy = unpack(p)
    return jnp.stack([gx, gy], axis=-1)


def _rows(gpacked, bi, cy, start):
    """(K, S, LANES) aligned rows from the packed (B, H, W) image."""
    yi = cy[:, None] + offs[None, :]                      # (K, S)
    starts = jnp.stack(
        [jnp.broadcast_to(bi[:, None], yi.shape), yi,
         jnp.broadcast_to(start[:, None], yi.shape)], axis=-1,
    ).reshape(-1, 3)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,),
        collapsed_slice_dims=(0, 1),
        start_index_map=(0, 1, 2),
    )
    out = jax.lax.gather(
        gpacked, starts, dn, slice_sizes=(1, 1, LANES),
        mode=jax.lax.GatherScatterMode.CLIP,
    )
    return out.reshape(K, S, LANES)


def strat_f(gpacked, bi, cy, cx):
    start = jnp.clip(cx - WMAX, 0, W - LANES)
    rows = _rows(gpacked, bi, cy, start)                  # (K, S, LANES)
    gx, gy = unpack(rows)
    # lane-frame dx for downstream masking (returned so it can't be DCE'd)
    dx = (jnp.arange(LANES, dtype=jnp.int32)[None, :] + start[:, None] - cx[:, None])
    return gx, gy, dx


def strat_g(gpacked, bi, cy, cx):
    start = jnp.clip(cx - WMAX, 0, W - LANES)
    rows = _rows(gpacked, bi, cy, start)                  # (K, S, LANES)
    # per-sample select inside the patch: lane = cx-start + dx  (S lanes/row)
    lane = (cx - start)[:, None] + (offs + WMAX)[None, :] - WMAX  # (K, S)
    flat = rows.reshape(K, S * LANES)
    idx = (jnp.arange(S, dtype=jnp.int32)[None, :, None] * LANES
           + lane[:, None, :])                            # (K, S, S): row y, col x
    p = jnp.take_along_axis(flat, idx.reshape(K, S * S), axis=1).reshape(K, S, S)
    gx, gy = unpack(p)
    return jnp.stack([gx, gy], axis=-1)


def strat_h(gpacked, bi, cy, cx):
    """Pallas double-buffered per-keypoint patch DMA: (S, 128) rows straight
    from HBM to VMEM keyed by scalar-prefetched indices, magnitude reduction
    in the lane frame (the candidate kernel shape for orientation+descriptor).
    8 keypoints per grid step (output sublane alignment)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # HBM DMA slice starts must be tile-aligned ((8, 128) for f32): align
    # row starts down to 8 and lane starts down to 128, fetch a larger patch
    SPA = ((S + 7) // 8) * 8 + 8   # aligned patch height covers any 8-offset
    LW = 256                       # 2 lane tiles cover any 128-offset window
    KB = 8                         # keypoints per grid step

    def kernel(bi_ref, y0_ref, x0_ref, hbm_ref, out_ref, patch, sem):
        g = pl.program_id(0)
        ng = pl.num_programs(0)

        def dma(slot, gidx, i):
            idx = gidx * KB + i
            y = pl.multiple_of(y0_ref[idx], 8)
            x = pl.multiple_of(x0_ref[idx], 128)
            return pltpu.make_async_copy(
                hbm_ref.at[bi_ref[idx], pl.ds(y, SPA), pl.ds(x, LW)],
                patch.at[slot, i],
                sem.at[slot, i],
            )

        @pl.when(g == 0)
        def _():
            for i in range(KB):
                dma(0, 0, i).start()

        @pl.when(g + 1 < ng)
        def _():
            for i in range(KB):
                dma((g + 1) % 2, g + 1, i).start()

        for i in range(KB):
            dma(g % 2, g, i).wait()
        # (production uses two plain f32 gx/gy planes — no f16 unpack, which
        # Mosaic cannot bitcast in-register anyway)
        p = patch[g % 2]  # (KB, SPA, LW)
        out_ref[:, :] = jnp.sum(jnp.abs(p), axis=1)[:, :LANES]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(K // KB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((KB, LANES), lambda g, *_: (g, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, KB, SPA, LW), jnp.float32),
            pltpu.SemaphoreType.DMA((2, KB)),
        ],
    )
    y0 = jnp.clip((cy - WMAX) & ~7, 0, H - SPA)
    x0 = jnp.clip((cx - LANES // 2) & ~127, 0, W - LW)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, LANES), jnp.float32),
    )(bi, y0, x0, gpacked)


def main():
    n_elem = K * S * S * 2
    dt, ref = t(strat_a, grads, bi, cy, cx)
    print(f"A multi-dim gather (f32 pairs):   {dt*1e3:8.1f} ms  {n_elem/dt/1e6:7.0f} Melem/s")
    dt, oute = t(strat_e, gpacked, bi, cy, cx)
    err = float(jnp.max(jnp.abs(oute - ref)))
    print(f"E packed-f16 gather:              {dt*1e3:8.1f} ms  {n_elem/dt/1e6:7.0f} Melem/s  maxerr={err:.2e}")
    dt, outf = t(strat_f, gpacked, bi, cy, cx)
    print(f"F aligned-row gather (lane frame):{dt*1e3:8.1f} ms  rows={K*S*LANES/dt/1e6:7.0f} Melem/s")
    dt, outg = t(strat_g, gpacked, bi, cy, cx)
    err = float(jnp.max(jnp.abs(outg - ref)))
    print(f"G patch + take_along_axis:        {dt*1e3:8.1f} ms  maxerr={err:.2e}")
    dt, outh = t(strat_h, gpacked, bi, cy, cx)
    bw = K * (((S + 7) // 8 * 8) + 8) * 256 * 4 / dt / 1e9
    print(f"H pallas patch DMA (lane frame):  {dt*1e3:8.1f} ms  {bw:7.1f} GB/s patch traffic")


if __name__ == "__main__":
    main()
