"""Per-phase SIFT wall-clock on real hardware: where do the ~9 s/image go?

Times each sub-stage of the unfused path (same compute as _sift_fused but
dispatchable piecewise) per octave, after a warmup pass.
"""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from ssrlcv_tpu.config import SIFTParams
from ssrlcv_tpu.features import scale_space as ss
from ssrlcv_tpu.features import sift as S
from ssrlcv_tpu.io import refdata

FIXTURE = "/root/reference/test/checkpoints/Pipeline2View"


def t(fn, *args, reps=1, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    fx = refdata.load_fixture_dir(FIXTURE, 2)
    px = jnp.asarray(fx["images"][0].pixels)
    params = SIFTParams()
    h, w = int(px.shape[0]), int(px.shape[1])

    dt, octaves = t(lambda p: ss.build_scale_space(p, params, h, w), px)
    print(f"scale_space(all octaves): {dt*1e3:9.1f} ms")

    total = {"detect": 0.0, "grads": 0.0, "compact": 0.0, "orient": 0.0, "desc": 0.0}
    for o, octave in enumerate(octaves):
        cap = S.octave_capacity(params, o, h, w)
        dt, kps = t(S._detect_octave, octave.dog_raw, octave.dog_norm, params, h, w, o, cap)
        total["detect"] += dt
        print(f"oct{o} detect (cap {cap:6d}): {dt*1e3:9.1f} ms")
        dt, grads = t(S._octave_gradients, octave.dog_norm)
        total["grads"] += dt
        print(f"oct{o} gradients:            {dt*1e3:9.1f} ms")
        pixel_width = float(2.0 ** (params.starting_octave + o))
        compact = jax.jit(S._device_compact, static_argnames=("capacity",))
        for b in S._describe_buckets(params):
            bcap = S._bucket_capacity(params, o, b, h, w)
            dt, kb = t(compact, kps, bcap, select=kps.blur == b)
            total["compact"] += dt
            w_o, w_d = S._bucket_windows(params, int(b))
            n = int(np.asarray(kb.mask).sum())
            # the jitted twin of what _sift_fused inlines per bucket
            dt, _ = t(S._describe_octave, grads, kb, params, o,
                      w_orient=w_o, w_desc=w_d)
            total["orient"] += dt
            print(f"oct{o} blur{b} (cap {bcap:5d}, n {n:5d}, w_o {w_o:2d}, w_d {w_d:2d}): "
                  f"orient+desc (jit) {dt*1e3:8.1f} ms")
    print("totals:", {k: f"{v*1e3:.0f} ms" for k, v in total.items()})

    # fused end-to-end for comparison
    dt, _ = t(lambda: S._sift_fused(px, params, h, w))
    print(f"_sift_fused e2e:          {dt*1e3:9.1f} ms")
    t0 = time.perf_counter()
    S.generate_features(px, image_id=0)
    print(f"generate_features (host agg incl.): {(time.perf_counter()-t0)*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
