"""Micro-bench: strategies for per-keypoint patch gathers on TPU.

The orientation/descriptor hot op is g = grads[bi, yi, xi] with
(K, S, S) indices into (B, H, W, 2).  Candidates:

  A. multi-dim advanced-index gather (current)
  B. flat 1-D index gather from (B*H*W, 2)
  C. aligned-row gather: one (1,1,128,2) slice per (keypoint, row) via
     jax.lax.gather with contiguous minor slices, then lane select by
     batched one-hot matmul
  D. aligned-row gather, no lane select (mask in the 128-lane frame)
"""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax.numpy as jnp
import numpy as np

B, H, W = 5, 2048, 2048
K, S = 16384, 23
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


def strat_a(grads, bi, cy, cx):
    yi = cy[:, None, None] + offs[None, :, None]
    xi = cx[:, None, None] + offs[None, None, :]
    return grads[bi[:, None, None], yi, xi]


def strat_b(grads, bi, cy, cx):
    flat = grads.reshape(-1, 2)
    yi = cy[:, None, None] + offs[None, :, None]
    xi = cx[:, None, None] + offs[None, None, :]
    idx = (bi[:, None, None] * H + yi) * W + xi
    return flat[idx]


def _row_gather(grads, bi, cy, start):
    """(K, S, LANES, 2) of aligned rows starting at ``start`` (per keypoint)."""
    yi = cy[:, None] + offs[None, :]            # (K, S)
    starts = jnp.stack(
        [jnp.broadcast_to(bi[:, None], yi.shape), yi,
         jnp.broadcast_to(start[:, None], yi.shape),
         jnp.zeros_like(yi)], axis=-1,
    ).reshape(-1, 4)                            # (K*S, 4)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(0, 1),
        start_index_map=(0, 1, 2, 3),
    )
    out = jax.lax.gather(
        grads, starts, dn, slice_sizes=(1, 1, LANES, 2),
        mode=jax.lax.GatherScatterMode.CLIP,
    )                                           # (K*S, LANES, 2)
    return out.reshape(K, S, LANES, 2)


def strat_c_fixed(grads, bi, cy, cx):
    start = jnp.clip(cx - WMAX, 0, W - LANES)
    rows = _row_gather(grads, bi, cy, start)     # (K, S, LANES, 2)
    col = (cx - start)[:, None] + offs[None, :]  # (K, S)
    onehot = (jnp.arange(LANES, dtype=jnp.int32)[None, :, None] == col[:, None, :])
    sel = onehot.astype(jnp.float32)             # (K, LANES, S)
    r = rows.reshape(K, S, LANES * 2)
    # batched matmul over lanes: (K, S, LANES) x (K, LANES, S) per channel
    g0 = jnp.einsum("kyl,kls->kys", rows[..., 0], sel)
    g1 = jnp.einsum("kyl,kls->kys", rows[..., 1], sel)
    return jnp.stack([g0, g1], axis=-1)


def strat_d(grads, bi, cy, cx):
    start = jnp.clip(cx - WMAX, 0, W - LANES)
    rows = _row_gather(grads, bi, cy, start)     # (K, S, LANES, 2)
    return rows


def main():
    dt, ref = t(strat_a, grads, bi, cy, cx)
    print(f"A multi-dim gather:   {dt*1e3:8.1f} ms")
    dt, outb = t(strat_b, grads, bi, cy, cx)
    print(f"B flat 1-D gather:    {dt*1e3:8.1f} ms  match={bool(jnp.all(outb == ref))}")
    dt, outc = t(strat_c_fixed, grads, bi, cy, cx)
    print(f"C aligned+onehot:     {dt*1e3:8.1f} ms  match={bool(jnp.all(outc == ref))}")
    dt, outd = t(strat_d, grads, bi, cy, cx)
    print(f"D aligned rows only:  {dt*1e3:8.1f} ms  shape={outd.shape}")


if __name__ == "__main__":
    main()
