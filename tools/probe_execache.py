#!/usr/bin/env python
"""Validate + time the persisted-executable cache (raster/execache.py).

Pass 1 (fresh cache key or first run): populates; also renders via the
plain jit path and asserts pixel equality.  Pass 2 (second process): the
deserialize path — prints its cost vs the jit path's trace+compile.

Run twice: python tools/probe_execache.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from bench import start_keepalive

    ka = start_keepalive()
    import numpy as np

    import vgtpu as vg
    from vgtpu.scenes.demo_ui import draw_benchmark_frame

    ctx = vg.createContext()
    vg.begin(ctx, 0, 1920, 1080, 1.0)
    draw_benchmark_frame(ctx, 0.0)
    ctx._finalize_ops()
    from vgtpu.raster.binning import bin_frame
    from vgtpu.raster import execache
    from vgtpu.raster.frame import execute_plan, plan_to_device

    plan = bin_frame(ctx.ops, 1920, 1080, tile_h=ctx.cfg.tile_h,
                     tile_w=ctx.cfg.tile_w, chunk=ctx.cfg.edges_per_chunk,
                     pools=ctx.cfg.chunk_pools,
                     depth_cap=ctx.cfg.max_ops_per_tile_cap)
    ctx._fill_textures(plan)
    d = plan_to_device(plan)
    bg = (0.12, 0.12, 0.13, 1.0)

    t0 = time.perf_counter()
    img = execute_plan(plan, background=bg, device_arrays=d)
    t_dispatch = time.perf_counter() - t0
    t0 = time.perf_counter()
    a = np.asarray(img)
    t_fetch = time.perf_counter() - t0
    hit = bool(execache._loaded) and t_dispatch < 2.0

    # parity vs the plain jit path (same process)
    os.environ["VGTPU_NO_EXEC_CACHE"] = "1"
    t0 = time.perf_counter()
    img2 = execute_plan(plan, background=bg, device_arrays=d)
    t_jit = time.perf_counter() - t0
    b = np.asarray(img2)
    del os.environ["VGTPU_NO_EXEC_CACHE"]
    print(json.dumps({
        "dispatch_s": round(t_dispatch, 3),
        "first_fetch_s": round(t_fetch, 3),
        "jit_dispatch_s": round(t_jit, 3),
        "cache_entries": len(os.listdir(execache._cache_dir())),
        "loaded_via_cache_path": hit,
        "max_pixel_diff": float(np.abs(a - b).max()),
    }), flush=True)
    ka["stop"].set()


if __name__ == "__main__":
    main()
