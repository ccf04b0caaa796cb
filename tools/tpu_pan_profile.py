#!/usr/bin/env python
"""Per-stage host-time attribution of the steady translated-pan frame and
the cached-app frame (bench.py pan/app diags) — what keeps pan_norm/app_norm
above the ~3x-frame replay target.

Stages are ctx.profiler's end() seams (fingerprint/finalize/layer/bin/
textures/upload/device_dispatch) plus the RECORD cost (command-list submit +
demo-UI re-emit), measured around the vg.begin..end span.  Host times are
throttle-normalized by bench.host_spin_ms (CLAUDE.md: ~5 ms unthrottled).
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
    import numpy as np
    import vgtpu as vg
    from vgtpu.scenes.demo_ui import draw_demo_ui
    from vgtpu.scenes.tiger import draw_tiger

    bg = (0.12, 0.12, 0.13, 1.0)
    spin0 = host_spin_ms()

    def scenario(translate: bool):
        ctx = vg.createContext()
        cl = vg.createCommandList(ctx, vg.CommandListFlags.Cacheable)
        vg.beginCommandList(ctx, cl)
        draw_tiger(ctx, 20, 60, 1.06)
        vg.endCommandList(ctx)

        def frame(k):
            t0 = time.perf_counter()
            vg.begin(ctx, 0, 1920, 1080, 1.0)
            vg.pushState(ctx)
            if translate:
                vg.transformTranslate(ctx, 2.5 * k, 2 * k)
            vg.submitCommandList(ctx, cl)
            t1 = time.perf_counter()
            vg.popState(ctx)
            draw_demo_ui(ctx, 0.3 + 0.05 * k)
            t2 = time.perf_counter()
            img = vg.end(ctx, background=bg)
            t3 = time.perf_counter()
            return img, (t1 - t0) * 1e3, (t2 - t1) * 1e3, (t3 - t2) * 1e3

        return ctx, frame

    ka["ready"].wait(timeout=3300)
    print(f"attach_s={ka['attach_s']}  host_spin={spin0:.1f}", flush=True)
    if ka["attach_s"] is None:
        sys.exit(1)

    out = {}
    for name, translate in (("pan", True), ("app", False)):
        ctx, frame = scenario(translate)
        img = None
        for k in range(4):
            img, *_ = frame(k)
            np.asarray(img[0, 0])
        ctx.profiler.times_ms.clear()
        ctx.profiler.frames = 0
        recs = []
        n = 10
        t0 = time.perf_counter()
        for k in range(n):
            img, t_sub, t_ui, t_end = frame(k + 4)
            recs.append((t_sub, t_ui, t_end))
        np.asarray(img[0, 0])        # one sync at the end (pipelined loop)
        wall = (time.perf_counter() - t0) * 1e3 / n
        stages = {k: round(v / n, 2) for k, v in ctx.profiler.times_ms.items()}
        rec = np.median(np.asarray(recs), axis=0)
        out[name] = {
            "wall_ms": round(wall, 2),
            "submit_ms": round(float(rec[0]), 2),
            "ui_record_ms": round(float(rec[1]), 2),
            "end_ms": round(float(rec[2]), 2),
            "end_stages": stages,
            "counters": dict(ctx.profiler.counters),
        }
        print(f"# {name}: {out[name]}", flush=True)
    ka["stop"].set()
    spin1 = host_spin_ms()
    out["host_spin_ms"] = [round(spin0, 1), round(spin1, 1)]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
