"""Pallas per-keypoint gradient-patch extraction.

The SIFT orientation/descriptor passes are gather-bound on TPU: XLA lowers
the (K, S, S) multi-dim gather of gradient samples to ~120 Melem/s, which
makes the front end 95% of pipeline wall clock (BENCH_r02).  This kernel
replaces the gather with per-keypoint DMA: for each keypoint an aligned
(SPA, LW) window of the gradient plane streams HBM -> VMEM double-buffered
(measured ~530 GB/s — ~150x the gather), and the passes then sample INSIDE
the patch with `take_along_axis` (~77 Gelem/s), keeping the sampled values
bit-identical to the global gather.

Alignment rules (Mosaic): HBM slice starts must land on the (8, 128) f32
tile grid, so row starts are aligned down to 8 and lane starts down to 128,
and the patch is padded (SPA covers the 8-row slack, LW = 256 covers the
128-lane slack for windows up to +-63 px).

Replaces the sampling of computeThetas (FeatureFactory.cu:1004) and
fillDescriptors (SIFT_FeatureFactory.cu:475) — the reference's one-warp /
one-block-per-keypoint designs — with DMA + vector compute.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KB = 8     # keypoints per grid step (output sublane alignment)
LW = 256   # patch lanes: 2 lane tiles cover any 128-aligned start offset


def patch_rows(w_max: int) -> int:
    """Sublane-aligned patch height covering a +-(w_max+1) window plus the
    up-to-7-row alignment slack."""
    return ((2 * (w_max + 1) + 1 + 7 + 7) // 8) * 8


def patches_supported(h: int, w: int, w_max: int) -> bool:
    """Patch extraction needs the plane to be at least one patch big and the
    window to fit the 256-lane patch."""
    return h >= patch_rows(w_max) and w >= LW and w_max + 1 <= LW // 4


def _extract_kernel(spa, y0_ref, x0_ref, gx_hbm, gy_hbm, outx_ref, outy_ref,
                    bufx, bufy, semx, semy):
    g = pl.program_id(0)
    ng = pl.num_programs(0)

    def dma(buf, sem, hbm, slot, gidx, i):
        idx = gidx * KB + i
        y = pl.multiple_of(y0_ref[idx], 8)
        x = pl.multiple_of(x0_ref[idx], 128)
        return pltpu.make_async_copy(
            hbm.at[pl.ds(y, spa), pl.ds(x, LW)], buf.at[slot, i], sem.at[slot, i]
        )

    def start_group(slot, gidx):
        for i in range(KB):
            dma(bufx, semx, gx_hbm, slot, gidx, i).start()
            dma(bufy, semy, gy_hbm, slot, gidx, i).start()

    @pl.when(g == 0)
    def _():
        start_group(0, 0)

    @pl.when(g + 1 < ng)
    def _():
        start_group((g + 1) % 2, g + 1)

    for i in range(KB):
        dma(bufx, semx, gx_hbm, g % 2, g, i).wait()
        dma(bufy, semy, gy_hbm, g % 2, g, i).wait()
    outx_ref[:] = bufx[g % 2]
    outy_ref[:] = bufy[g % 2]


@partial(jax.jit, static_argnames=("w_max", "interpret"))
def extract_patches(gx: jax.Array, gy: jax.Array, loc: jax.Array,
                    w_max: int, interpret: bool = False):
    """Per-keypoint aligned gradient patches.

    gx, gy: (H, W) f32 gradient planes; loc: (K, 2) float (x, y) keypoint
    locations (plane coordinates).  Returns (px, py, y0, x0) with
    px[k] = gx[y0[k]:y0[k]+SPA, x0[k]:x0[k]+LW] (and py likewise) — K is
    padded to a multiple of KB internally.
    """
    h, w = gx.shape
    spa = patch_rows(w_max)
    k = loc.shape[0]
    k_pad = ((k + KB - 1) // KB) * KB

    cx = jnp.round(loc[:, 0]).astype(jnp.int32)
    cy = jnp.round(loc[:, 1]).astype(jnp.int32)
    y0 = jnp.clip((cy - (w_max + 1)) & ~7, 0, h - spa)
    # aligning (cx - 64) down to 128 puts cx 64..191 lanes into the patch:
    # both margins cover +-(w_max+1) for any w_max <= 63
    x0 = jnp.clip((cx - 64) & ~127, 0, w - LW)
    y0 = jnp.pad(y0, (0, k_pad - k))
    x0 = jnp.pad(x0, (0, k_pad - k))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k_pad // KB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((KB, spa, LW), lambda g, *_: (g, 0, 0)),
            pl.BlockSpec((KB, spa, LW), lambda g, *_: (g, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, KB, spa, LW), jnp.float32),
            pltpu.VMEM((2, KB, spa, LW), jnp.float32),
            pltpu.SemaphoreType.DMA((2, KB)),
            pltpu.SemaphoreType.DMA((2, KB)),
        ],
    )
    px, py = pl.pallas_call(
        partial(_extract_kernel, spa),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((k_pad, spa, LW), jnp.float32),
            jax.ShapeDtypeStruct((k_pad, spa, LW), jnp.float32),
        ],
        interpret=interpret,
    )(y0, x0, gx, gy)
    # keep gx/gy patches SEPARATE: a trailing size-2 axis would become the
    # minor (lane) dimension on TPU and tile-pad 64x
    return px[:k], py[:k], y0[:k], x0[:k]


def sample_in_patches(px: jax.Array, py: jax.Array, y0: jax.Array,
                      x0: jax.Array, yi: jax.Array, xi: jax.Array):
    """Sample patches at global integer coords — bit-identical to
    grads[yi, xi, c] for coords inside the patch (guaranteed for in-window
    keypoints; border keypoints clip and are masked downstream).

    px, py: (K, SPA, LW) gx/gy patches; yi, xi: (K, ...) int32 (mutually
    broadcastable, e.g. (K, S, 1) x (K, 1, S)).  Returns (gx, gy) each
    shaped (K, ...).
    """
    yi, xi = jnp.broadcast_arrays(yi, xi)
    k, spa, lw = px.shape
    extra = yi.shape[1:]
    ri = jnp.clip(yi - y0.reshape((k,) + (1,) * len(extra)), 0, spa - 1)
    ci = jnp.clip(xi - x0.reshape((k,) + (1,) * len(extra)), 0, lw - 1)
    idx = (ri * lw + ci).reshape(k, -1)
    gx = jnp.take_along_axis(px.reshape(k, spa * lw), idx, axis=1)
    gy = jnp.take_along_axis(py.reshape(k, spa * lw), idx, axis=1)
    return gx.reshape((k,) + extra), gy.reshape((k,) + extra)
