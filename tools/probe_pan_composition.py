#!/usr/bin/env python
"""Where does the retained-pan device frame go?  (r05 close-out)

Chained pan loops for the benchmark scene WITH and WITHOUT its text/texture
content, at ss=1 and ss=2, against each scene's direct resident frame —
separates the per-frame sampling-resample + ct-plane rebuild (text scenes
only) from the raster pipeline proper.

Run: python tools/probe_pan_composition.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BG = (0.12, 0.12, 0.13, 1.0)


def main() -> None:
    from bench import start_keepalive

    ka = start_keepalive()
    import vgtpu as vg
    from vgtpu.raster.benchloop import measure_device_ms_per_frame
    from vgtpu.raster.retained import RetainedScene, measure_pan_ms_per_frame
    from vgtpu.scenes.demo_ui import draw_benchmark_frame
    from vgtpu.scenes.tiger import draw_tiger

    out = {}
    for ss in (1, 2):
        for name, draw in (
            ("full", lambda c: draw_benchmark_frame(c, 0.0)),
            ("tiger_only", lambda c: draw_tiger(c, 20, 60, 1.06)),
        ):
            ctx = vg.createContext(vg.ContextConfig(coverage_supersample=ss))
            vg.begin(ctx, 0, 1920, 1080, 1.0)
            draw(ctx)
            scene = RetainedScene.bake(ctx, background=BG)
            measure_pan_ms_per_frame(scene, reps_hi=4, reps_lo=2)  # warm
            pan = round(measure_pan_ms_per_frame(
                scene, reps_hi=32, reps_lo=2), 3)
            # direct resident frame of the same content for the floor
            ctx2 = vg.createContext(vg.ContextConfig(coverage_supersample=ss))
            vg.begin(ctx2, 0, 1920, 1080, 1.0)
            draw(ctx2)
            vg.end(ctx2, background=BG)
            direct = round(measure_device_ms_per_frame(
                ctx2.last_plan, ctx2.last_device_arrays, BG,
                reps_hi=32, reps_lo=2), 3)
            out[f"ss{ss}_{name}"] = {
                "pan_ms": pan, "direct_ms": direct,
                "textured": scene.samp_meta is not None,
            }
            print(json.dumps({f"ss{ss}_{name}": out[f"ss{ss}_{name}"]}),
                  flush=True)
    print(json.dumps({"pan_composition": out}), flush=True)
    ka["stop"].set()


if __name__ == "__main__":
    main()
