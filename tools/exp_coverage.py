#!/usr/bin/env python
"""Coverage-kernel experiments on the real benchmark chunk pools.

Times the production transposed-layout Pallas kernel against variants
(unroll factor, pool configurations) using the chained-loop method.
Run from the repo root: python tools/exp_coverage.py [pools...]
e.g. python tools/exp_coverage.py 2,6,24 2,4,8,24 2,4,8,16,32
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def fill_stats(plan):
    out = []
    for ce, cent in plan.chunk_pools:
        e = np.asarray(ce)
        real = (np.abs(e[:, :, 3] - e[:, :, 1]) > 1e-12).sum()
        out.append((e.shape[0], e.shape[1], real / max(e.size // 4, 1)))
    return out


def main() -> None:
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    import vgtpu as vg
    from vgtpu.raster.binning import bin_frame
    from vgtpu.scenes.demo_ui import draw_benchmark_frame

    pool_configs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
    if not pool_configs:
        pool_configs = [(2, 6, 24), (2, 4, 8, 24), (2, 4, 8, 16, 32), (4, 24)]

    ctx = vg.createContext()
    vg.begin(ctx, 0, 1920, 1080, 1.0)
    draw_benchmark_frame(ctx, 0.0)
    vg.end(ctx, background=(0.12, 0.12, 0.13, 1.0))
    ctx._finalize_ops()
    th, tw = ctx.cfg.tile_h, ctx.cfg.tile_w

    def timeit(fn, *args):
        lo, hi = 3, 24
        float(np.asarray(fn(*args, n=lo)))
        float(np.asarray(fn(*args, n=hi)))
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(fn(*args, n=lo)))
            t1 = time.perf_counter()
            float(np.asarray(fn(*args, n=hi)))
            t2 = time.perf_counter()
            best.append(((t2 - t1) - (t1 - t0)) / (hi - lo) * 1e3)
        return sorted(best)[1]

    from vgtpu.ops.coverage import build_cov_gather_map, cov_all_resolved

    # ---- unroll sweep on the default pools ----
    from vgtpu.ops.coverage_pallas import coverage_chunks_pallas_t_raw

    plan0 = bin_frame(ctx.ops, ctx.fb_width, ctx.fb_height, tile_h=th,
                      tile_w=tw, pools=(2, 6, 24))
    for pi, (ce, _cent) in enumerate(plan0.chunk_pools):
        ced = jax.device_put(ce)
        ch = ce.shape[1]
        for u in (1, 2, 3, 4, 6, 8, 12):
            if ch % u:
                continue

            @functools.partial(jax.jit, static_argnames=("n", "u"))
            def kloop(ced, n, u):
                def body(i, eps):
                    cov = coverage_chunks_pallas_t_raw(ced + eps, th, tw, unroll=u)
                    return jnp.sum(cov[:, 0]) * 1e-9

                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            ms = timeit(functools.partial(kloop, u=u), ced)
            print(f"pool[{pi}] shape={ce.shape} unroll={u}: {ms:.3f} ms", flush=True)

    for pools in pool_configs:
        plan = bin_frame(ctx.ops, ctx.fb_width, ctx.fb_height, tile_h=th,
                         tile_w=tw, pools=pools)
        m = build_cov_gather_map(plan.chunk_pools, plan.entry_backdrop.shape[0])
        dm = jax.device_put(m)
        pools_dev = jax.device_put(tuple(
            (ce, cent) for ce, cent in plan.chunk_pools))

        @functools.partial(jax.jit, static_argnames=("n",))
        def cov_loop(pd, dmm, n):
            def body(i, eps):
                p = tuple((ce + eps, cent) for ce, cent in pd)
                cov = cov_all_resolved(p, dmm, th, tw)
                return jnp.sum(cov[:, 0]) * 1e-9

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        ms = timeit(cov_loop, pools_dev, dm)
        fs = fill_stats(plan)
        slots = sum(n * c for n, c, _ in fs)
        fill = sum(n * c * f for n, c, f in fs) / max(slots, 1)
        extras = int((np.asarray(m["extra_chunk"]) < sum(
            len(ce) for ce, _ in plan.chunk_pools)).sum())
        print(f"pools={pools}  ms={ms:.3f}  slots={slots}  fill={fill:.2f}  "
              f"chunks={plan.stats['chunks']}  extras={extras}  "
              f"shapes={[(n, c) for n, c, _ in fs]}", flush=True)


if __name__ == "__main__":
    main()
