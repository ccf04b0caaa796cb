#!/usr/bin/env python
"""Attribute the cold frame's device_dispatch stage (VERDICT r05 #7).

Splits the first execute_plan into trace+lower / backend compile (persistent
cache hit or miss) / dispatch-call, using the AOT API on the REAL benchmark
plan in a fresh process.  The keepalive thread pays the attach concurrently.

Run: python tools/probe_dispatch_cold.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from bench import host_spin_ms, start_keepalive

    ka = start_keepalive()
    spin = host_spin_ms()
    import numpy as np
    import jax
    import jax.numpy as jnp

    import vgtpu as vg
    from vgtpu.scenes.demo_ui import draw_benchmark_frame

    t = {}
    t0 = time.perf_counter()
    ctx = vg.createContext()
    t["create_ctx"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    vg.begin(ctx, 0, 1920, 1080, 1.0)
    draw_benchmark_frame(ctx, 0.0)
    ctx._finalize_ops()
    t["record_finalize"] = time.perf_counter() - t0

    from vgtpu.raster.binning import bin_frame
    from vgtpu.raster.frame import (
        _frame_fn,
        _plan_statics,
        composite_arrays,
        plan_to_device,
    )

    t0 = time.perf_counter()
    plan = bin_frame(ctx.ops, 1920, 1080, tile_h=ctx.cfg.tile_h,
                     tile_w=ctx.cfg.tile_w, chunk=ctx.cfg.edges_per_chunk,
                     pools=ctx.cfg.chunk_pools,
                     depth_cap=ctx.cfg.max_ops_per_tile_cap)
    t["bin"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    ctx._fill_textures(plan)
    t["textures"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    d = plan_to_device(plan, profiler=ctx.profiler)
    t["upload_total"] = time.perf_counter() - t0
    t["upload_stages"] = {k: round(v, 1)
                         for k, v in ctx.profiler.times_ms.items()
                         if k.startswith("upload")}

    bg = jnp.asarray(np.asarray((0.12, 0.12, 0.13, 1.0), np.float32))
    args = (d["chunk_pools"], d["entry_backdrop"], composite_arrays(d), bg)
    kw = dict(_plan_statics(plan, d))
    t0 = time.perf_counter()
    lowered = _frame_fn.lower(*args, **kw)
    t["trace_lower"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t["backend_compile"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    img = compiled(*args)
    t["aot_call_enqueue"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(img[0, 0])
    t["first_fetch"] = time.perf_counter() - t0
    # the normal jit path AFTER the AOT warm: re-trace + jit-cache compile
    # (persistent cache now definitely warm) = what a second plan shape pays
    t0 = time.perf_counter()
    img2 = _frame_fn(*args, **kw)
    t["jit_path_warm_cache"] = time.perf_counter() - t0
    np.asarray(img2[0, 0])
    out = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in t.items()}
    out["host_spin_ms"] = round(spin, 1)
    out["attach_s"] = ka.get("attach_s")
    print(json.dumps(out), flush=True)
    ka["stop"].set()


if __name__ == "__main__":
    main()
