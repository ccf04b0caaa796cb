#!/usr/bin/env python
"""Per-stage device timing of the benchmark frame (chained-loop method, see
raster/benchloop.py for why naive dispatch timing lies on the axon tunnel).

Stages:
  coverage   = chunk coverage kernels + segment-sum accumulate (+backdrop)
  composite  = bucketed painter scan + shading + blending (given entry_w)
  frame      = the whole pipeline (what bench.py reports)

Run from the repo root: python tools/profile_stages.py
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def main() -> None:
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    import vgtpu as vg
    from vgtpu.ops.composite import composite_bucketed_body
    from vgtpu.ops.coverage import entry_coverage_from_pools
    from vgtpu.scenes.demo_ui import draw_benchmark_frame

    ctx = vg.createContext()
    vg.begin(ctx, 0, 1920, 1080, 1.0)
    draw_benchmark_frame(ctx, 0.0)
    vg.end(ctx, background=(0.12, 0.12, 0.13, 1.0))
    plan = ctx.last_plan
    d = ctx.last_device_arrays
    th, tw = plan.tile_h, plan.tile_w
    ne = d["entry_backdrop"].shape[0]
    nt = plan.tile_entries.shape[0]
    bg = jnp.asarray(np.array([0.12, 0.12, 0.13, 1.0], np.float32))

    from vgtpu.raster.frame import composite_arrays, composite_dispatch, coverage_dispatch

    dd = composite_arrays(d)

    @functools.partial(jax.jit, static_argnames=("n",))
    def cov_loop(pools, backdrop, n):
        def body(i, eps):
            p = tuple((ce + eps, cent) for ce, cent in pools)
            w = coverage_dispatch(p, dd, ne, th, tw) + backdrop[:, :, None]
            return jnp.sum(w[:, 0, 0]) * 1e-9

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    entry_w0 = entry_coverage_from_pools(d["chunk_pools"], ne, th, tw) + d["entry_backdrop"][:, :, None]

    @functools.partial(jax.jit, static_argnames=("n",))
    def comp_loop(entry_w, n):
        def body(i, eps):
            fb = composite_dispatch(
                entry_w + eps, dd, bg,
                ntx=plan.ntx, tile_h=th, tile_w=tw, num_tiles=nt,
                bucket_flags=d["bucket_flags"],
            )
            return jnp.sum(fb[:, 0, 0, 3]) * 1e-9

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timeit(fn, *args):
        lo, hi = 3, 24
        float(np.asarray(fn(*args, n=lo)))
        float(np.asarray(fn(*args, n=hi)))
        t0 = time.perf_counter()
        float(np.asarray(fn(*args, n=lo)))
        t1 = time.perf_counter()
        float(np.asarray(fn(*args, n=hi)))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (hi - lo) * 1e3

    cov_ms = timeit(cov_loop, d["chunk_pools"], d["entry_backdrop"])
    comp_ms = timeit(comp_loop, entry_w0)

    from vgtpu.raster.benchloop import measure_device_ms_per_frame

    frame_ms = measure_device_ms_per_frame(plan, d, (0.12, 0.12, 0.13, 1.0))

    print(f"platform      : {jax.devices()[0].platform}")
    print(f"stats         : {plan.stats}")
    print(f"buckets       : {[(te.shape, fl) for te, ids, fl in plan.tile_buckets]}")
    print(f"coverage ms   : {cov_ms:.3f}")
    print(f"composite ms  : {comp_ms:.3f}")
    print(f"frame ms      : {frame_ms:.3f}")


if __name__ == "__main__":
    main()
