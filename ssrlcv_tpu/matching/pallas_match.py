"""Flagship Pallas kernel: fused brute-force descriptor matching.

The hot O(Nq*Nt) op of the whole pipeline (SURVEY.md §7 calls it out as the
flagship kernel).  A 2-D grid tiles (query, target); target tiles stream
HBM -> VMEM double-buffered by the Pallas pipeline while a VMEM scratch
carries the per-query running (best distance, best index) across the target
sweep:

  * the nibble-split exact distance matmul
    (||q-t||^2 = ||q||^2+||t||^2-2 q.t^T, every nibble product exact),
  * the epipolar segment predicate fused into the distance tile (no
    (Nq, Nt) mask ever exists anywhere),
  * first-minimum tie-break identical to the reference warp scan.

Compared to the chunked XLA path (matching/distance.py), the distance tile
never touches HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QUERY_TILE = 256
TARGET_TILE = 512
# int8 single-matmul kernel tiles.  With the per-tile y-band skip gate the
# sweet spot moves DOWN from 4096 (smaller tiles skip more): measured on
# v5e at bench shapes (32k x 36k real features, 65536 caps) kernel-only
# 4096: 47 ms (live 0.35) / 2048: 39 ms (live 0.24) / 1024: 40 ms (0.16) /
# 512: 45 ms (0.11, grid overhead wins) — all bit-identical outputs.
QUERY_TILE_I8 = 256
TARGET_TILE_I8 = 2048


def _match_kernel(nt_ref, eps_ref, q_hi_ref, q_lo_ref, t_hi_ref, t_lo_ref,
                  t_loc_ref, p1_ref, p2_ref,
                  idx_out_ref, dist_out_ref,
                  best_d_ref, best_i_ref):
    """Grid (q_tiles, t_tiles); scratch carries the running best."""
    ti = pl.program_id(1)
    num_t = pl.num_programs(1)
    nt_total = nt_ref[0]
    eps = eps_ref[0]

    @pl.when(ti == 0)
    def _():
        best_d_ref[:] = jnp.full_like(best_d_ref, jnp.inf)
        best_i_ref[:] = jnp.zeros_like(best_i_ref)

    qh = q_hi_ref[:].astype(jnp.float32)
    ql = q_lo_ref[:].astype(jnp.float32)
    qn = jnp.sum((16.0 * qh + ql) ** 2, axis=1, keepdims=True)  # (QT, 1)

    p1 = p1_ref[:]
    p2 = p2_ref[:]
    swap = p1[:, 0] >= p2[:, 0]
    left = jnp.where(swap[:, None], p2, p1)
    right = jnp.where(swap[:, None], p1, p2)
    vertical = left[:, 0] == right[:, 0]
    top = jnp.minimum(p1[:, 1], p2[:, 1])
    bottom = jnp.maximum(p1[:, 1], p2[:, 1])
    dxs = left[:, 0] - right[:, 0]
    slope = (left[:, 1] - right[:, 1]) / jnp.where(dxs == 0, 1.0, dxs)
    unconstrained = ~jnp.isfinite(p1[:, 0])

    th = t_hi_ref[:].astype(jnp.float32)
    tl = t_lo_ref[:].astype(jnp.float32)
    hh = jax.lax.dot_general(qh, th, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    hl = jax.lax.dot_general(qh, tl, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    lh = jax.lax.dot_general(ql, th, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ll = jax.lax.dot_general(ql, tl, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    cross = 256.0 * hh + 16.0 * (hl + lh) + ll
    tn = jnp.sum((16.0 * th + tl) ** 2, axis=1)[None, :]
    d = qn + tn - 2.0 * cross                                  # (QT, TT)

    # epipolar predicate (the reference's literal x-gate + vertical-line
    # distance test, MatchFactory.cu:1551-1567) as f32 0/1 gates.
    # t_loc arrives TRANSPOSED (2, TT) so tx/ty are lane-oriented rows —
    # extracting columns of a (TT, 2) block would force a sublane->lane
    # transpose relayout costing ~18 MB of VMEM scratch per gate.
    tx = t_loc_ref[0:1, :]
    ty = t_loc_ref[1:2, :]
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    in_x = jnp.where(tx >= (left[:, 0] - eps)[:, None], one, zero) * jnp.where(
        tx <= (right[:, 0] + eps)[:, None], one, zero
    )
    vert_ok = jnp.where((top - eps)[:, None] <= ty, one, zero) * jnp.where(
        (bottom + eps)[:, None] >= ty, one, zero
    )
    y_line = slope[:, None] * (tx - left[:, 0][:, None]) + left[:, 1][:, None]
    line_ok = jnp.where(jnp.abs(y_line - ty) <= eps, one, zero)
    gate = jnp.where(vertical[:, None], vert_ok, line_ok) * in_x
    gate = jnp.maximum(gate, jnp.where(unconstrained[:, None], one, zero))
    # Invalid targets carry t_loc=+inf; exclude them INDEPENDENTLY of the
    # epipolar gate — the unconstrained override above must not let
    # capacity-padding slots win the argmin (round-2 hardware bug).
    t_ok = jnp.where(jnp.isfinite(tx), one, zero)  # (1, TT)

    start = ti * TARGET_TILE
    lanes = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    in_bounds = jnp.where(start + lanes < nt_total, one, zero)
    big = jnp.float32(3.0e38)
    d = d + (one - gate * in_bounds * t_ok) * big

    tile_best = jnp.min(d, axis=1)
    # first-min tie-break without argmin: min over lane indices achieving it
    cand = jnp.where(d == tile_best[:, None], lanes, jnp.int32(2**30))
    tile_idx = start + jnp.min(cand, axis=1)

    improve = tile_best < best_d_ref[:]
    best_d_ref[:] = jnp.where(improve, tile_best, best_d_ref[:])
    best_i_ref[:] = jnp.where(improve, tile_idx, best_i_ref[:])

    @pl.when(ti == num_t - 1)
    def _():
        dist_out_ref[:, 0] = best_d_ref[:]
        idx_out_ref[:, 0] = best_i_ref[:]


def _match_kernel_i8(tt, eps_ref, qiv_ref, tiv_ref, q_ref, qn_ref, t_ref,
                     tn_ref, tg_ref, t_loc_ref, p1_ref, p2_ref,
                     idx_out_ref, dist_out_ref,
                     best_d_ref, best_i_ref):
    """int8 single-matmul variant (VERDICT r3 #5): descriptors arrive
    centred (u8 - 128 -> i8, distance-invariant) so ONE i8 x i8 -> i32 MXU
    matmul replaces the 4 nibble matmuls, and the squared norms arrive
    precomputed (qn (QT,1), tn (1,TT) i32) — exact integer distances, 8x
    fewer matmul passes and no in-kernel casts of the descriptor tiles.
    ``tg`` is the precomputed per-target validity row (valid mask AND
    in-bounds tail, (1, TT) f32 0/1) — the epilogue is the kernel's cost
    (VPU-bound, ~16 ops per candidate pair), so per-target predicates are
    hoisted out of it entirely.

    Tile skipping (VERDICT r4 #6, adapted): the per-query epipolar y-band
    [top - eps, bottom + eps] and the y-major feature order make whole
    (query-tile, target-tile) pairs provably empty — ``qiv`` (2, nQtiles)
    carries each query tile's y-band union, ``tiv`` (2, nTtiles) each target
    tile's y-range, and a tile pair with no overlap skips matmul + epilogue
    entirely (the running best is untouched, which is exact: every gate in
    the skipped tile would be 0).  Doing less work beats doing the same
    work faster — the reference scans all targets per query
    (MatchFactory.cu:1507-1597)."""
    qi = pl.program_id(0)
    ti = pl.program_id(1)
    num_t = pl.num_programs(1)
    eps = eps_ref[0]

    @pl.when(ti == 0)
    def _():
        best_d_ref[:] = jnp.full_like(best_d_ref, jnp.inf)
        best_i_ref[:] = jnp.zeros_like(best_i_ref)

    live = (qiv_ref[0, qi] <= tiv_ref[1, ti]) & (qiv_ref[1, qi] >= tiv_ref[0, ti])

    @pl.when(live)
    def _():
        cross = jax.lax.dot_general(
            q_ref[:], t_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)                   # (QT, TT) i32
        d = (qn_ref[:] + tn_ref[:] - 2 * cross).astype(jnp.float32)

        p1 = p1_ref[:]
        p2 = p2_ref[:]
        swap = p1[:, 0] >= p2[:, 0]
        left = jnp.where(swap[:, None], p2, p1)
        right = jnp.where(swap[:, None], p1, p2)
        vertical = left[:, 0] == right[:, 0]
        top = jnp.minimum(p1[:, 1], p2[:, 1])
        bottom = jnp.maximum(p1[:, 1], p2[:, 1])
        dxs = left[:, 0] - right[:, 0]
        slope = (left[:, 1] - right[:, 1]) / jnp.where(dxs == 0, 1.0, dxs)
        unconstrained = ~jnp.isfinite(p1[:, 0])

        tx = t_loc_ref[0:1, :]
        ty = t_loc_ref[1:2, :]
        one = jnp.float32(1.0)
        zero = jnp.float32(0.0)
        in_x = jnp.where(tx >= (left[:, 0] - eps)[:, None], one, zero) * jnp.where(
            tx <= (right[:, 0] + eps)[:, None], one, zero
        )
        vert_ok = jnp.where((top - eps)[:, None] <= ty, one, zero) * jnp.where(
            (bottom + eps)[:, None] >= ty, one, zero
        )
        y_line = slope[:, None] * (tx - left[:, 0][:, None]) + left[:, 1][:, None]
        line_ok = jnp.where(jnp.abs(y_line - ty) <= eps, one, zero)
        gate = jnp.where(vertical[:, None], vert_ok, line_ok) * in_x
        gate = jnp.maximum(gate, jnp.where(unconstrained[:, None], one, zero))

        start = ti * tt
        lanes = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        big = jnp.float32(3.0e38)
        d = d + (one - gate * tg_ref[:]) * big

        tile_best = jnp.min(d, axis=1)
        cand = jnp.where(d == tile_best[:, None], lanes, jnp.int32(2**30))
        tile_idx = start + jnp.min(cand, axis=1)

        improve = tile_best < best_d_ref[:]
        best_d_ref[:] = jnp.where(improve, tile_best, best_d_ref[:])
        best_i_ref[:] = jnp.where(improve, tile_idx, best_i_ref[:])

    @pl.when(ti == num_t - 1)
    def _():
        dist_out_ref[:, 0] = best_d_ref[:]
        idx_out_ref[:, 0] = best_i_ref[:]


@partial(jax.jit, static_argnames=("qt", "tt"))
def _match_call_i8(eps_arr, qiv, tiv, q8, qn, t8, tn, tg, tl, p1p, p2p,
                   qt=QUERY_TILE_I8, tt=TARGET_TILE_I8):
    """pallas_call wrapper for the int8 kernel on prepped inputs."""
    nq_pad = q8.shape[0]
    nt_pad = t8.shape[0]
    grid = (nq_pad // qt, nt_pad // tt)
    idx, dist = pl.pallas_call(
        partial(_match_kernel_i8, tt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # eps
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # qiv
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # tiv
            pl.BlockSpec((qt, 128), lambda i, j: (i, 0)),
            pl.BlockSpec((qt, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tt, 128), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tt), lambda i, j: (0, j)),
            pl.BlockSpec((1, tt), lambda i, j: (0, j)),
            pl.BlockSpec((2, tt), lambda i, j: (0, j)),
            pl.BlockSpec((qt, 2), lambda i, j: (i, 0)),
            pl.BlockSpec((qt, 2), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((qt, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((qt, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((nq_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((qt,), jnp.float32),
            pltpu.VMEM((qt,), jnp.int32),
        ],
    )(eps_arr, qiv, tiv, q8, qn, t8, tn, tg, tl, p1p, p2p)
    return idx, dist


@partial(jax.jit, static_argnames=("qt", "tt"))
def _match_prep_i8(q_desc, t_desc, t_loc, p1, p2, epsilon, t_valid,
                   qt=QUERY_TILE_I8, tt=TARGET_TILE_I8):
    """Centred-int8 prep: pad, shift by 128 (distance-invariant), squared
    norms, lane-oriented t_loc, per-tile epipolar y-band intervals."""
    nq = q_desc.shape[0]
    nt = t_desc.shape[0]
    nq_pad = ((nq + qt - 1) // qt) * qt
    nt_pad = ((nt + tt - 1) // tt) * tt

    qp = jnp.pad(q_desc, ((0, nq_pad - nq), (0, 0)))
    tp = jnp.pad(t_desc, ((0, nt_pad - nt), (0, 0)))
    tl = jnp.pad(t_loc, ((0, nt_pad - nt), (0, 0)))
    tv = jnp.pad(t_valid, (0, nt_pad - nt))
    tl = jnp.where(tv[:, None], tl, jnp.inf).T  # (2, nt_pad) lane-oriented
    p1p = jnp.pad(p1, ((0, nq_pad - nq), (0, 0)))
    p2p = jnp.pad(p2, ((0, nq_pad - nq), (0, 0)))

    q16 = qp.astype(jnp.int32) - 128
    t16 = tp.astype(jnp.int32) - 128
    q8 = q16.astype(jnp.int8)
    t8 = t16.astype(jnp.int8)
    qn = jnp.sum(q16 * q16, axis=1, keepdims=True).astype(jnp.int32)  # (Nq,1)
    tn = jnp.sum(t16 * t16, axis=1)[None, :].astype(jnp.int32)        # (1,Nt)
    # per-target validity row: valid mask AND real (non-padding) tail — the
    # kernel multiplies this once instead of re-deriving both per tile
    tg = (tv & (jnp.arange(nt_pad) < nt)).astype(jnp.float32)[None, :]

    # per-tile y-band intervals for the kernel's (qtile, ttile) skip gate.
    # The full gate accepts targets with tx up to eps OUTSIDE the segment's
    # x-range whose y tracks the EXTRAPOLATED line, i.e. up to |slope|*eps
    # beyond [top, bottom] — the conservative band is therefore
    # [top - eps*(1+|slope|), bottom + eps*(1+|slope|)] (for near-vertical
    # segments the band blows up and simply keeps every tile live, which is
    # correct; exactly-vertical segments use the plain [top-eps, bottom+eps]
    # vert_ok test).  +-inf when the query is unconstrained (p1x = inf);
    # padded queries / invalid targets contribute the neutral (+inf, -inf).
    unc = ~jnp.isfinite(p1[:, 0])
    dxs = jnp.abs(p1[:, 0] - p2[:, 0])
    dys = jnp.abs(p1[:, 1] - p2[:, 1])
    vertical = dxs == 0
    slope_abs = dys / jnp.where(vertical, 1.0, dxs)
    slack = jnp.where(vertical, epsilon, epsilon * (1.0 + slope_abs))
    q_lo = jnp.where(unc, -jnp.inf, jnp.minimum(p1[:, 1], p2[:, 1]) - slack)
    q_hi = jnp.where(unc, jnp.inf, jnp.maximum(p1[:, 1], p2[:, 1]) + slack)
    q_lo = jnp.pad(q_lo, (0, nq_pad - nq), constant_values=jnp.inf)
    q_hi = jnp.pad(q_hi, (0, nq_pad - nq), constant_values=-jnp.inf)
    qiv = jnp.stack([jnp.min(q_lo.reshape(-1, qt), axis=1),
                     jnp.max(q_hi.reshape(-1, qt), axis=1)])       # (2, nQt)
    ty = jnp.pad(jnp.where(t_valid, t_loc[:, 1], jnp.inf), (0, nt_pad - nt),
                 constant_values=jnp.inf)
    ty_hi = jnp.pad(jnp.where(t_valid, t_loc[:, 1], -jnp.inf), (0, nt_pad - nt),
                    constant_values=-jnp.inf)
    tiv = jnp.stack([jnp.min(ty.reshape(-1, tt), axis=1),
                     jnp.max(ty_hi.reshape(-1, tt), axis=1)])      # (2, nTt)

    return (jnp.asarray([epsilon], jnp.float32), qiv, tiv,
            q8, qn, t8, tn, tg, tl, p1p, p2p)


@jax.jit
def _match_call(nt_arr, eps_arr, q_hi, q_lo, t_hi, t_lo, tl, p1p, p2p):
    """The bare pallas_call on PREPPED (padded, nibble-split, transposed)
    inputs — exposed separately so scripts/bench_match_kernel.py can time
    the kernel alone (VERDICT r3 #5: kernel-only MFU, no XLA prep)."""
    nq_pad = q_hi.shape[0]
    nt_pad = t_hi.shape[0]
    grid = (nq_pad // QUERY_TILE, nt_pad // TARGET_TILE)
    idx, dist = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # nt_total
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # eps
            pl.BlockSpec((QUERY_TILE, 128), lambda i, j: (i, 0)),
            pl.BlockSpec((QUERY_TILE, 128), lambda i, j: (i, 0)),
            pl.BlockSpec((TARGET_TILE, 128), lambda i, j: (j, 0)),
            pl.BlockSpec((TARGET_TILE, 128), lambda i, j: (j, 0)),
            pl.BlockSpec((2, TARGET_TILE), lambda i, j: (0, j)),
            pl.BlockSpec((QUERY_TILE, 2), lambda i, j: (i, 0)),
            pl.BlockSpec((QUERY_TILE, 2), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((QUERY_TILE, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((QUERY_TILE, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((nq_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((QUERY_TILE,), jnp.float32),
            pltpu.VMEM((QUERY_TILE,), jnp.int32),
        ],
    )(nt_arr, eps_arr, q_hi, q_lo, t_hi, t_lo, tl, p1p, p2p)
    return idx, dist


@jax.jit
def _match_prep(q_desc, t_desc, t_loc, p1, p2, epsilon, t_valid):
    """Padding + nibble split + lane-oriented t_loc for _match_call."""
    nq = q_desc.shape[0]
    nt = t_desc.shape[0]
    nq_pad = ((nq + QUERY_TILE - 1) // QUERY_TILE) * QUERY_TILE
    nt_pad = ((nt + TARGET_TILE - 1) // TARGET_TILE) * TARGET_TILE

    qp = jnp.pad(q_desc, ((0, nq_pad - nq), (0, 0)))
    tp = jnp.pad(t_desc, ((0, nt_pad - nt), (0, 0)))
    tl = jnp.pad(t_loc, ((0, nt_pad - nt), (0, 0)))
    tv = jnp.pad(t_valid, (0, nt_pad - nt))
    tl = jnp.where(tv[:, None], tl, jnp.inf).T  # (2, nt_pad) lane-oriented
    p1p = jnp.pad(p1, ((0, nq_pad - nq), (0, 0)))
    p2p = jnp.pad(p2, ((0, nq_pad - nq), (0, 0)))

    q_hi = (qp >> 4).astype(jnp.int8)
    q_lo = (qp & 15).astype(jnp.int8)
    t_hi = (tp >> 4).astype(jnp.int8)
    t_lo = (tp & 15).astype(jnp.int8)
    return (jnp.asarray([nt], jnp.int32), jnp.asarray([epsilon], jnp.float32),
            q_hi, q_lo, t_hi, t_lo, tl, p1p, p2p)


@jax.jit
def pallas_best_target(q_desc, t_desc, t_loc, p1, p2, epsilon, t_valid):
    """Fused matching: returns (best_idx, best_dist) per query.

    p1/p2: (Nq, 2) epipolar segment endpoints; rows of +inf disable the
    constraint for that query (brute-force behaviour).  Invalid targets are
    excluded via location +inf (fails every gate) + the tail bound.
    Fully-masked queries return dist >= 3e38 (killed by the absolute
    threshold downstream).
    """
    nq = q_desc.shape[0]
    args = _match_prep_i8(q_desc, t_desc, t_loc, p1, p2, epsilon, t_valid)
    idx, dist = _match_call_i8(*args)
    return idx.reshape(-1)[:nq], dist.reshape(-1)[:nq]
