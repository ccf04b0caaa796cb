#!/usr/bin/env python
"""Same-session interleaved A/B of the fused vs two-dispatch pan loop.

Shape discipline: every timed frame re-renders the SAME five offsets with
an eps content perturbation (distinct fingerprint -> full pan path, same
padded bucket shapes -> no compiles inside the timing), after warming both
modes on exactly those shapes.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from bench import host_spin_ms, run_loop, start_keepalive

    ka = start_keepalive()
    import numpy as np
    import vgtpu as vg
    from vgtpu.scenes.demo_ui import draw_demo_ui
    from vgtpu.scenes.tiger import draw_tiger

    bg = (0.12, 0.12, 0.13, 1.0)
    ctx = vg.createContext()
    cl = vg.createCommandList(ctx, vg.CommandListFlags.Cacheable)
    vg.beginCommandList(ctx, cl)
    draw_tiger(ctx, 20, 60, 1.06)
    vg.endCommandList(ctx)

    def frame(k, eps=0.0):
        vg.begin(ctx, 0, 1920, 1080, 1.0)
        vg.pushState(ctx)
        vg.transformTranslate(ctx, 2.5 * k, 2 * k)
        vg.submitCommandList(ctx, cl)
        vg.popState(ctx)
        draw_demo_ui(ctx, 0.3 + 0.05 * k + eps)
        return vg.end(ctx, background=bg)

    ka["ready"].wait(timeout=1800)
    print(f"attach_s={ka['attach_s']}  host_spin={host_spin_ms():.1f}",
          flush=True)
    if ka["attach_s"] is None:
        sys.exit(1)

    wimg = None
    for k in range(9):        # build, replay, bake-request, then hits 3..8
        wimg = frame(k)
        np.asarray(wimg[0, 0])
    # warm the two-dispatch mode's compiles on the same shapes
    os.environ["VGTPU_PAN_NO_FUSE"] = "1"
    for k in range(4, 9):
        np.asarray(frame(k)[0, 0])
    os.environ.pop("VGTPU_PAN_NO_FUSE", None)

    results = {"fused": [], "two-dispatch": []}
    for rep in range(4):
        for mode in ("fused", "two-dispatch"):
            if mode == "two-dispatch":
                os.environ["VGTPU_PAN_NO_FUSE"] = "1"
            ms = run_loop(lambda k: frame(4 + k, eps=1e-4 * (rep + 1)), 5,
                          warm_img=wimg)
            os.environ.pop("VGTPU_PAN_NO_FUSE", None)
            results[mode].append(round(ms, 2))
    hits = ctx.profiler.counters.get("layer_cl_hits", 0)
    ka["stop"].set()
    med = {m: sorted(v)[len(v) // 2] for m, v in results.items()}
    print(json.dumps({"pan_ab": results, "median": med,
                      "layer_cl_hits": hits,
                      "host_spin_ms": round(host_spin_ms(), 1)}), flush=True)


if __name__ == "__main__":
    main()
