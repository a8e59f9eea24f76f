"""Fused Pallas orientation-histogram kernel.

computeThetas (FeatureFactory.cu:1004-1114) assigns one warp per keypoint to
accumulate a 36-bin gradient-orientation histogram over an axis-aligned
window.  The XLA formulation gathers (K, S, S) samples at ~120 Melem/s —
the slowest op class on TPU.  This kernel instead DMAs each keypoint's
aligned gradient patch HBM->VMEM (measured ~530 GB/s) and reduces the
36 masked sums entirely in VMEM: the histogram never touches HBM and no
gather is issued.  The window test, Gaussian weighting, and bin assignment
are the exact per-sample arithmetic of the XLA path; only the f32 summation
order differs (tree-reduce over the patch instead of the S x S grid), which
is inside the cross-backend tolerance the golden gates already allow.

Peak finding / parabola interpolation stay in XLA (orientation.py) — they
are (K, 36)-sized and cheap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssrlcv_tpu.features.patches import KB, LW, patch_rows


def _atan(x):
    """Cephes atanf for x >= 0 (Mosaic has no atan2 primitive): range-reduce
    to [0, tan(pi/8)] then a degree-9 odd minimax polynomial (~1e-7 abs
    error — far inside the 10-degree orientation bin width)."""
    big = x > 2.414213562373095
    mid = (x > 0.4142135623730950) & (~big)
    safe = jnp.where(x == 0.0, 1.0, x)
    x1 = jnp.where(big, -1.0 / safe, jnp.where(mid, (x - 1.0) / (x + 1.0), x))
    yoff = jnp.where(big, jnp.float32(jnp.pi / 2),
                     jnp.where(mid, jnp.float32(jnp.pi / 4), jnp.float32(0.0)))
    z = x1 * x1
    y = ((((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1)
          * z - 3.33329491539e-1) * z * x1 + x1)
    return y + yoff


def _atan2(y, x):
    """Four-quadrant atan2 from _atan; only exercised where mag > 0 (zero
    gradients get zero weight)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    r = _atan(ay / jnp.where(ax == 0.0, 1.0, ax))
    r = jnp.where(ax == 0.0, jnp.float32(jnp.pi / 2), r)
    r = jnp.where(x < 0.0, jnp.float32(jnp.pi) - r, r)
    return jnp.where(y < 0.0, -r, r)


def _orient_kernel(spa, y0_ref, x0_ref, cx_ref, cy_ref, win_ref, denom_ref,
                   gx_hbm, gy_hbm, hist_ref, bufx, bufy, semx, semy):
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

    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    two_pi = jnp.float32(2.0 * jnp.pi)
    inv_rad10 = jnp.float32(18.0 / jnp.pi)
    rows = jax.lax.broadcasted_iota(jnp.int32, (spa, LW), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (spa, LW), 1)

    for i in range(KB):
        idx = g * KB + i
        dma(bufx, semx, gx_hbm, g % 2, g, i).wait()
        dma(bufy, semy, gy_hbm, g % 2, g, i).wait()
        pgx = bufx[g % 2, i]  # (spa, LW)
        pgy = bufy[g % 2, i]

        dx = (lanes - (cx_ref[idx] - x0_ref[idx])).astype(jnp.float32)
        dy = (rows - (cy_ref[idx] - y0_ref[idx])).astype(jnp.float32)
        w = win_ref[idx]
        in_win = jnp.where(jnp.abs(dx) <= w, one, zero) * jnp.where(
            jnp.abs(dy) <= w, one, zero)

        mag = jnp.sqrt(pgx * pgx + pgy * pgy)
        wgt = mag * jnp.exp(-(dx * dx + dy * dy) / denom_ref[idx]) * in_win
        ang = jnp.mod(_atan2(pgy, pgx) + two_pi, two_pi)
        binf = jnp.clip(jnp.floor(ang * inv_rad10), 0.0, 35.0)
        # scalar stores to VMEM are not allowed: broadcast each bin's sum
        # into its lane of a (1, 128) row and store the row
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.zeros((1, 128), jnp.float32)
        for b in range(36):
            s = jnp.sum(jnp.where(binf == jnp.float32(b), wgt, zero))
            row = row + jnp.where(lane128 == b, s, zero)
        hist_ref[i : i + 1, :] = row


@partial(jax.jit, static_argnames=("w_max", "lambda_o", "interpret"))
def orientation_histograms(gx, gy, loc, sigma, pixel_width,
                           w_max: int, lambda_o: float,
                           interpret: bool = False):
    """36-bin weighted orientation histograms for every keypoint.

    gx, gy: (H, W) f32 gradient planes of ONE DoG slice; loc: (K, 2) float
    plane coords; sigma: (K,).  Returns hist (K, 36) f32 — the same values
    (up to f32 reduction order) as the XLA _histogram_for_keypoints gather
    path, computed without any gather.

    pixel_width may be a scalar or a per-keypoint (K,) array — the latter
    lets one call serve keypoints from MULTIPLE octaves sampled off a
    vertically-stacked gradient canvas (the per-blur merged dispatch).
    """
    h, w = gx.shape
    spa = patch_rows(w_max)
    k = loc.shape[0]
    k_pad = ((k + KB - 1) // KB) * KB

    cx = jnp.round(loc[:, 0]).astype(jnp.int32)
    cy = jnp.round(loc[:, 1]).astype(jnp.int32)
    y0 = jnp.clip((cy - (w_max + 1)) & ~7, 0, h - spa)
    x0 = jnp.clip((cx - 64) & ~127, 0, w - LW)
    win = jnp.ceil(sigma * 3.0 * lambda_o / jnp.asarray(pixel_width, jnp.float32))
    denom = 2.0 * lambda_o * lambda_o * sigma * sigma

    def pad(x):
        return jnp.pad(x, (0, k_pad - k))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(k_pad // KB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((KB, 128), lambda g, *_: (g, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, KB, spa, LW), jnp.float32),
            pltpu.VMEM((2, KB, spa, LW), jnp.float32),
            pltpu.SemaphoreType.DMA((2, KB)),
            pltpu.SemaphoreType.DMA((2, KB)),
        ],
    )
    hist = pl.pallas_call(
        partial(_orient_kernel, spa),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k_pad, 128), jnp.float32),
        interpret=interpret,
    )(pad(y0), pad(x0), pad(cx), pad(cy),
      pad(win.astype(jnp.float32)), pad(denom.astype(jnp.float32)),
      gx, gy)
    return hist[:k, :36]
