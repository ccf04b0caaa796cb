#!/usr/bin/env python
"""Resolve-in-kernel supersample path: same-session TPU A/B + pixel check.

One process, one attach (CLAUDE.md measurement discipline): bake the
benchmark frame at ss in {2,4} with the resolve path ON and OFF
(VGTPU_NO_RESOLVE toggles at plan-build time), assert the images agree
(catches Mosaic-lowering-specific bugs interpret mode can't), then
interleave chained-loop measurements.  Also measures ss=1 (must be
unaffected — the path is gated off there)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from bench import host_spin_ms, start_keepalive

    ka = start_keepalive()
    import numpy as np
    import vgtpu as vg
    from vgtpu.raster.benchloop import measure_device_ms_per_frame
    from vgtpu.scenes.demo_ui import draw_benchmark_frame

    bg = (0.12, 0.12, 0.13, 1.0)
    ka["ready"].wait(timeout=3300)
    print(f"attach_s={ka['attach_s']}  host_spin={host_spin_ms():.1f}",
          flush=True)
    if ka["attach_s"] is None:
        sys.exit(1)

    def bake(ss, resolve):
        os.environ.pop("VGTPU_NO_RESOLVE", None)
        if not resolve:
            os.environ["VGTPU_NO_RESOLVE"] = "1"
        ctx = vg.createContext(vg.ContextConfig(coverage_supersample=ss))
        vg.begin(ctx, 0, 1920, 1080, 1.0)
        draw_benchmark_frame(ctx, 0.0)
        img = vg.end(ctx, background=bg)
        arr = np.asarray(img)
        os.environ.pop("VGTPU_NO_RESOLVE", None)
        has_res = ctx.last_device_arrays.get("res") is not None
        assert has_res == resolve, (ss, resolve, has_res)
        return ctx.last_plan, ctx.last_device_arrays, arr

    cases = []
    for ss in (1, 2, 4):
        plan_on, d_on, img_on = bake(ss, resolve=(ss > 1))
        cases.append((f"ss{ss}_res" if ss > 1 else "ss1", plan_on, d_on))
        if ss > 1:
            plan_off, d_off, img_off = bake(ss, resolve=False)
            cases.append((f"ss{ss}_base", plan_off, d_off))
            md = float(np.abs(img_on - img_off).max())
            print(f"# ss={ss} resolve-vs-base max|diff| = {md:.2e}",
                  flush=True)
            assert md < 3e-6, f"ss={ss} pixel mismatch {md}"
        print(f"# baked ss={ss}: pools="
              f"{[tuple(ce.shape) for ce, _ in plan_on.chunk_pools]}",
              flush=True)

    results = {name: [] for name, _p, _d in cases}
    for rep in range(3):
        for name, plan, d in cases:
            ms = measure_device_ms_per_frame(plan, d, bg,
                                             reps_hi=32, reps_lo=3)
            results[name].append(round(ms, 3))
            print(f"rep{rep} {name}: {ms:.3f} ms", flush=True)
    ka["stop"].set()
    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    print(json.dumps({"resolve_ab": results, "median": med,
                      "host_spin_ms": round(host_spin_ms(), 1)}), flush=True)


if __name__ == "__main__":
    main()
