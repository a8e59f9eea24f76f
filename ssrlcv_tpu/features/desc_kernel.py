"""Fused Pallas descriptor-histogram kernel.

fillDescriptors (SIFT_FeatureFactory.cu:475-549) gives each oriented
keypoint a 4x4-cell x 8-bin HOG over a rotated lattice; samples live at
round(R(theta) @ (dx, dy) + loc).  The XLA path gathers those (K, S^2)
rotated samples at ~120 Melem/s.  Here each keypoint's aligned gradient
patch is DMA'd HBM->VMEM and the rotated sampling runs IN VMEM as a
row-sweep: for each patch row, a 128-lane `take_along_axis` (the one gather
shape Mosaic supports) selects that row's samples and a mask accumulates
them — so sampled values are bit-identical to the XLA gather while never
leaving VMEM.

The kernel emits the RAW 128-bin histogram; the two-pass normalise + 0.2
clamp + uint8 quantisation stay in XLA (descriptor.py), identical to the
reference's epilogue (SIFT_FeatureFactory.cu:533-545).

Numerics vs the XLA path: sampling, window gates, trilinear weights and the
reference's quirks (window-width Gaussian, sign-preserving fmod, unwrapped
angular distance) are the same formulas; atan2 is the Cephes polynomial
(~1e-7) and per-bin sums reduce in tile order instead of lattice order —
both inside the golden-gate tolerances.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssrlcv_tpu.features.orient_kernel import _atan2
from ssrlcv_tpu.features.patches import KB, LW, patch_rows

# 4x4 descriptor cell centres in window-width units, flattened c = ny*4+nx
# (the reference's value index (ty*4+tx)*8+tz — descriptor.py:67-75)
_NX = np.arange(4, dtype=np.float64) * 0.5 - 0.75
_CELL_X = np.tile(_NX, 4)
_CELL_Y = np.repeat(_NX, 4)


def _lattice_tiles(w_max: int):
    """Static (T*8, 128) i32 dx/dy lattice covering the S^2 sample grid,
    padded with out-of-window sentinels (masked by the in-window gates)."""
    s = 2 * w_max + 1
    n = s * s
    t = -(-n // (8 * 128))
    tot = t * 8 * 128
    idx = np.arange(tot)
    dy = np.where(idx < n, idx // s - w_max, 10_000)
    dx = np.where(idx < n, idx % s - w_max, 10_000)
    return (dx.reshape(t * 8, 128).astype(np.int32),
            dy.reshape(t * 8, 128).astype(np.int32), t)


def _trunc_fmod(x, y):
    """C fmodf: x - trunc(x/y)*y (sign-preserving, like the reference's
    fmodf at SIFT_FeatureFactory.cu:508)."""
    q = x / y
    tq = jnp.where(q >= 0, jnp.floor(q), -jnp.floor(-q))
    return x - tq * y


def _interleave_tiles(gx, gy):
    """128-lane-tile interleave of the two gradient planes:
    out[:, 2k*128:(2k+1)*128] = gx tile k, out[:, (2k+1)*128:] = gy tile k —
    so one contiguous (spa, 512) DMA window starting at lane 2*x0 contains
    both planes' (spa, 256) aligned patches."""
    h, w = gx.shape
    t = jnp.stack([gx.reshape(h, w // 128, 128),
                   gy.reshape(h, w // 128, 128)], axis=2)
    return t.reshape(h, 2 * w)


def _desc_kernel(spa, t_tiles, y0_ref, x0_ref, lx_ref, ly_ref, ct_ref, st_ref,
                 win_ref, th_ref, dx_ref, dy_ref, gi_hbm, hist_ref,
                 buf, sem):
    g = pl.program_id(0)
    ng = pl.num_programs(0)
    rows32 = t_tiles * 8

    def dma(slot, gidx, i):
        # ONE contiguous 2-D DMA fetches BOTH gradient planes: gi_hbm is the
        # 128-lane-tile interleave [gx0 gy0 gx1 gy1 ...], so the (spa, 2*LW)
        # window starting at lane 2*x0 carries gx tiles at lanes 0/256 and
        # gy tiles at 128/384.  The kernel is DMA-issue-bound (~1.3 us per
        # start/wait pair), so halving the copy count beats any compute win.
        idx = gidx * KB + i
        y = pl.multiple_of(y0_ref[idx], 8)
        x2 = pl.multiple_of(2 * x0_ref[idx], 256)
        return pltpu.make_async_copy(
            gi_hbm.at[pl.ds(y, spa), pl.ds(x2, 2 * LW)],
            buf.at[slot, i], sem.at[slot, i]
        )

    def start_group(slot, gidx):
        for i in range(KB):
            dma(slot, gidx, i).start()

    @pl.when(g == 0)
    def _():
        start_group(0, 0)

    @pl.when(g + 1 < ng)
    def _():
        start_group((g + 1) % 2, g + 1)

    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    two_pi = jnp.float32(2.0 * jnp.pi)
    rad45 = jnp.float32(jnp.pi / 4.0)
    dxf = dx_ref[:].astype(jnp.float32)   # (32T', 128) lattice offsets
    dyf = dy_ref[:].astype(jnp.float32)

    # ---- phase A: per-keypoint sampling (DMA + in-VMEM row sweep) --------
    # Per-keypoint serial work is ONLY the irreducibly-per-patch part:
    # rotated coords + the row sweep.  Everything downstream runs stacked
    # across the KB keypoints of the grid step (phase B) — VERDICT r4 #1's
    # cross-keypoint vectorisation of the histogram body.
    sgx_l, sgy_l, cxs_l, cys_l, val_l = [], [], [], [], []
    ct_l, st_l, w_l, th_l = [], [], [], []
    for i in range(KB):
        idx = g * KB + i
        dma(g % 2, g, i).wait()

        ct = ct_ref[idx]
        st = st_ref[idx]
        # padded/masked keypoints carry win=0: clamp so 1/binw and the
        # Gaussian exponent stay finite (their outputs are masked downstream,
        # but NaN->uint8 casts in the epilogue would be implementation-defined)
        w = jnp.maximum(win_ref[idx], jnp.float32(1.0))
        lx = lx_ref[idx]
        ly = ly_ref[idx]
        x0 = x0_ref[idx]
        y0 = y0_ref[idx]

        # rotated sample offsets + validity (descriptor.py:83-89)
        cxs = dxf * ct - dyf * st
        cys = dxf * st + dyf * ct
        valid_s = (jnp.where(jnp.abs(dxf) <= w, one, zero)
                   * jnp.where(jnp.abs(dyf) <= w, one, zero)
                   * jnp.where(jnp.abs(cxs) <= w, one, zero)
                   * jnp.where(jnp.abs(cys) <= w, one, zero))

        # integer sample coords relative to the patch (round matches the
        # XLA path's jnp.round; all live keypoints pass the descriptor
        # border check so image clipping never fires for them)
        qx = jnp.clip(jnp.round(cxs + lx).astype(jnp.int32) - x0, 0, LW - 1)
        qy = jnp.clip(jnp.round(cys + ly).astype(jnp.int32) - y0, 0, spa - 1)
        qx_lo = jnp.clip(qx, 0, 127)
        qx_hi = jnp.clip(qx - 128, 0, 127)
        hi_sel = (qx >= 128).astype(jnp.float32)

        # row sweep: for each patch row, lane-gather the row at qx and
        # accumulate where qy == r — the in-VMEM replacement for the
        # (K, S2) HBM gather
        def rowg_body(rg, acc):
            sgx, sgy = acc
            # Mosaic constraints: dynamic sublane loads must be 8-aligned,
            # and lane slices of in-register vectors are invalid layouts —
            # so load aligned (8, 128) half-blocks from the ref, then
            # extract rows with static sublane slices
            r8 = pl.multiple_of(rg * 8, 8)
            blkx0 = buf[g % 2, i, pl.ds(r8, 8), pl.ds(0, 128)]
            blkx1 = buf[g % 2, i, pl.ds(r8, 8), pl.ds(256, 128)]
            blky0 = buf[g % 2, i, pl.ds(r8, 8), pl.ds(128, 128)]
            blky1 = buf[g % 2, i, pl.ds(r8, 8), pl.ds(384, 128)]
            for j in range(8):
                bx0 = jnp.broadcast_to(blkx0[j : j + 1, :], (rows32, 128))
                bx1 = jnp.broadcast_to(blkx1[j : j + 1, :], (rows32, 128))
                by0 = jnp.broadcast_to(blky0[j : j + 1, :], (rows32, 128))
                by1 = jnp.broadcast_to(blky1[j : j + 1, :], (rows32, 128))
                vx = ((one - hi_sel) * jnp.take_along_axis(bx0, qx_lo, axis=1)
                      + hi_sel * jnp.take_along_axis(bx1, qx_hi, axis=1))
                vy = ((one - hi_sel) * jnp.take_along_axis(by0, qx_lo, axis=1)
                      + hi_sel * jnp.take_along_axis(by1, qx_hi, axis=1))
                hit = jnp.where(qy == rg * 8 + j, one, zero)
                sgx = sgx + hit * vx
                sgy = sgy + hit * vy
            return (sgx, sgy)

        # bound the sweep to the 8-row blocks that can contain this
        # keypoint's samples: qy spans [round(ly)-y0 - (w+1), ... + (w+1)]
        # (rows outside have hit == 0, so skipping them is exact)
        cyp = jnp.round(ly).astype(jnp.int32) - y0
        wi = jnp.ceil(w).astype(jnp.int32)
        blk_lo = jnp.maximum((cyp - wi - 1) // 8, 0)
        blk_hi = jnp.minimum((cyp + wi + 1) // 8 + 1, spa // 8)
        sgx, sgy = jax.lax.fori_loop(
            blk_lo, blk_hi, rowg_body,
            (jnp.zeros((rows32, 128), jnp.float32),
             jnp.zeros((rows32, 128), jnp.float32)))

        sgx_l.append(sgx)
        sgy_l.append(sgy)
        cxs_l.append(cxs)
        cys_l.append(cys)
        val_l.append(valid_s)
        shape = (rows32, 128)
        ct_l.append(jnp.full(shape, ct))
        st_l.append(jnp.full(shape, st))
        w_l.append(jnp.full(shape, w))
        th_l.append(jnp.full(shape, th_ref[idx]))

    # ---- phase B: histogram body vectorised ACROSS the KB keypoints ------
    # All (KB*rows32, 128) elementwise math costs the same vector work as
    # the per-keypoint version, but the 16x8 bin reductions become ONE
    # segmented reduce per (cell, bin) over the whole stack instead of KB
    # scalar cross-lane reductions — the measured ~2.5 us/keypoint serial
    # floor was dominated by those 128 reductions per keypoint.
    sgx = jnp.concatenate(sgx_l)            # (KB*rows32, 128)
    sgy = jnp.concatenate(sgy_l)
    cxs = jnp.concatenate(cxs_l)
    cys = jnp.concatenate(cys_l)
    valid_s = jnp.concatenate(val_l)
    ct = jnp.concatenate(ct_l)
    st = jnp.concatenate(st_l)
    w = jnp.concatenate(w_l)
    th = jnp.concatenate(th_l)

    # per-sample weights — the reference quirks included: Gaussian over
    # the WINDOW width, theta-relative angle via sign-preserving fmod
    # (descriptor.py:94-117)
    mag = jnp.sqrt(sgx * sgx + sgy * sgy)
    wgt = mag * jnp.exp(-(cxs * cxs + cys * cys) / (2.0 * w * w)) * valid_s
    ang = _trunc_fmod(_atan2(sgy, sgx) - th + two_pi, two_pi)

    binw = w / 2.0
    inv_binw = 1.0 / binw
    # hoist the 8 angle-weight tiles out of the cell loop (they depend
    # only on the sample angle): 8 computations instead of 128, and the
    # weighted-magnitude product folds in once
    wangs = []
    for b in range(8):
        adist = jnp.abs(ang - jnp.float32(b) * rad45)
        wangs.append(jnp.where(adist < rad45, one - adist / rad45, zero) * wgt)

    # per-(cell, bin): ONE lane-reduction to a (KB*rows32, 1) column placed
    # into lane c*8+b of a row-stacked accumulator; the 16x8 per-keypoint
    # scalar reductions of the old body collapse into a single grouped
    # sublane reduction at the end (2-D layouts throughout — Mosaic rejects
    # 1-D reduction results)
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (KB * rows32, 128), 1)
    acc = jnp.zeros((KB * rows32, 128), jnp.float32)
    for c in range(16):
        hx0 = jnp.float32(_CELL_X[c]) * w
        hy0 = jnp.float32(_CELL_Y[c]) * w
        hx = hx0 * ct - hy0 * st
        hy = hx0 * st + hy0 * ct
        ddx = jnp.abs(hx - cxs)
        ddy = jnp.abs(hy - cys)
        in_cell = jnp.where(ddx <= binw, one, zero) * jnp.where(
            ddy <= binw, one, zero)
        sp = in_cell * (one - ddx * inv_binw) * (one - ddy * inv_binw)
        for b in range(8):
            s = jnp.sum(sp * wangs[b], axis=1, keepdims=True)  # (KB*rows32, 1)
            acc = acc + jnp.where(lane_n == (c * 8 + b), s, zero)
    hist_ref[:, :] = jnp.sum(acc.reshape(KB, rows32, 128), axis=1)


@partial(jax.jit, static_argnames=("w_max", "interpret"))
def descriptor_histograms(gx, gy, loc, theta, sigma, pixel_width,
                          lambda_d, w_max: int, interpret: bool = False):
    """Raw 4x4x8 descriptor histograms (K, 128) f32 for oriented keypoints.

    Same values (up to f32 reduction order + poly atan2) as the pre-
    normalisation einsum of descriptor.py's gather path.

    pixel_width may be a scalar or a per-keypoint (K,) array (the per-blur
    merged dispatch samples keypoints of all octaves off one canvas).
    """
    h, w = gx.shape
    spa = patch_rows(w_max)
    k = loc.shape[0]
    k_pad = ((k + KB - 1) // KB) * KB
    dx_np, dy_np, t_tiles = _lattice_tiles(w_max)

    cx = jnp.round(loc[:, 0]).astype(jnp.int32)
    cy = jnp.round(loc[:, 1]).astype(jnp.int32)
    y0 = jnp.clip((cy - (w_max + 1)) & ~7, 0, h - spa)
    x0 = jnp.clip((cx - 64) & ~127, 0, w - LW)
    win = jnp.ceil(sigma * lambda_d / jnp.asarray(pixel_width, jnp.float32))

    def pad(x):
        return jnp.pad(x, (0, k_pad - k))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(k_pad // KB,),
        in_specs=[
            pl.BlockSpec((t_tiles * 8, 128), lambda g, *_: (0, 0)),
            pl.BlockSpec((t_tiles * 8, 128), lambda g, *_: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((KB, 128), lambda g, *_: (g, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, KB, spa, 2 * LW), jnp.float32),
            pltpu.SemaphoreType.DMA((2, KB)),
        ],
    )
    hist = pl.pallas_call(
        partial(_desc_kernel, spa, t_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k_pad, 128), jnp.float32),
        interpret=interpret,
    )(pad(y0), pad(x0),
      pad(loc[:, 0].astype(jnp.float32)), pad(loc[:, 1].astype(jnp.float32)),
      pad(jnp.cos(theta).astype(jnp.float32)), pad(jnp.sin(theta).astype(jnp.float32)),
      pad(win.astype(jnp.float32)), pad(theta.astype(jnp.float32)),
      jnp.asarray(dx_np), jnp.asarray(dy_np), _interleave_tiles(gx, gy))
    return hist[:k, :]
