#!/usr/bin/env python
"""One-process TPU measurement batch (r05): anim-patch A/B, pan-overlay A/B
+ same-session app, ss=2 retained-pan resolve A/B, batch K edge sweep.

One process = one tunnel attach (per-process tax, CLAUDE.md); the keepalive
thread pays it while the host bakes.  Every A/B is interleaved in THIS
process — the only comparison the measurement discipline allows.

Usage: python tools/tpu_session_r5.py [anim|pan|ssr|sweep ...] (default all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BG = (0.12, 0.12, 0.13, 1.0)


def anim_ab() -> None:
    """Paint-patch path: ride-the-dispatch (r05) vs eager put+promote (r04),
    interleaved, with the redraw loop as the floor."""
    import numpy as np
    import vgtpu as vg
    from bench import run_loop
    from vgtpu.scenes.demo_ui import draw_benchmark_frame

    ctx = vg.createContext()

    def dyn(k):
        vg.begin(ctx, 0, 1920, 1080, 1.0)
        draw_benchmark_frame(ctx, 0.05 * (k + 1))
        return vg.end(ctx, background=BG)

    def overlay(k):
        vg.begin(ctx, 0, 1920, 1080, 1.0)
        draw_benchmark_frame(ctx, 0.0)
        vg.beginPath(ctx)
        vg.rect(ctx, 1800, 1000, 60, 40)
        vg.fillPath(ctx, vg.color4ub(50 + 17 * (k % 12), 120, 200, 180),
                    vg.FillFlags.ConvexAA)
        return vg.end(ctx, background=BG)

    wimg = None
    for k in range(5):
        wimg = dyn(k)
        np.asarray(wimg[0, 0])
    np.asarray(overlay(0)[0, 0])        # full bin with the overlay
    np.asarray(overlay(100)[0, 0])      # patch warm, NEW path
    os.environ["VGTPU_PATCH_PROMOTE"] = "1"
    np.asarray(overlay(101)[0, 0])      # patch warm, OLD path
    os.environ.pop("VGTPU_PATCH_PROMOTE", None)

    res = {"new": [], "old": [], "redraw": []}
    for rep in range(3):
        ms = run_loop(lambda k: overlay(1 + k + 20 * rep), 5, warm_img=wimg)
        res["new"].append(round(ms, 2))
        os.environ["VGTPU_PATCH_PROMOTE"] = "1"
        ms = run_loop(lambda k: overlay(8 + k + 20 * rep), 5, warm_img=wimg)
        os.environ.pop("VGTPU_PATCH_PROMOTE", None)
        res["old"].append(round(ms, 2))
        ms = run_loop(lambda _k: overlay(15 + 20 * rep), 5, warm_img=wimg)
        res["redraw"].append(round(ms, 2))
    hits = ctx.profiler.counters.get("memo_paint_hits", 0)
    print(json.dumps({"anim_ab": res, "paint_hits": hits}), flush=True)


def pan_ab() -> None:
    """Pan loop with/without the static-UI overlay layer, interleaved, plus
    the app pattern in the SAME session for the pan-vs-app comparison."""
    import numpy as np
    import vgtpu as vg
    from bench import run_loop
    from vgtpu.scenes.demo_ui import draw_demo_ui
    from vgtpu.scenes.tiger import draw_tiger

    ctx = vg.createContext()
    cl = vg.createCommandList(ctx, vg.CommandListFlags.Cacheable)
    vg.beginCommandList(ctx, cl)
    draw_tiger(ctx, 20, 60, 1.06)
    vg.endCommandList(ctx)

    def frame(k):
        vg.begin(ctx, 0, 1920, 1080, 1.0)
        vg.pushState(ctx)
        vg.transformTranslate(ctx, 2.5 * k, 2 * k)
        vg.submitCommandList(ctx, cl)
        vg.popState(ctx)
        draw_demo_ui(ctx, 0.3 + 0.05 * k)
        return vg.end(ctx, background=BG)

    wimg = None
    for k in range(7):                   # cache, bake, overlay-layer settle
        wimg = frame(k)
        np.asarray(wimg[0, 0])
    os.environ["VGTPU_PAN_NO_OVERLAY"] = "1"
    np.asarray(frame(7)[0, 0])           # warm the no-overlay signature
    os.environ.pop("VGTPU_PAN_NO_OVERLAY", None)
    np.asarray(frame(8)[0, 0])

    res = {"overlay": [], "no_overlay": []}
    for rep in range(3):
        ms = run_loop(lambda k: frame(9 + k + 30 * rep), 5, warm_img=wimg)
        res["overlay"].append(round(ms, 2))
        os.environ["VGTPU_PAN_NO_OVERLAY"] = "1"
        ms = run_loop(lambda k: frame(16 + k + 30 * rep), 5, warm_img=wimg)
        os.environ.pop("VGTPU_PAN_NO_OVERLAY", None)
        res["no_overlay"].append(round(ms, 2))
    pan_counters = {
        k: ctx.profiler.counters.get(k, 0)
        for k in ("layer_cl_hits", "layer_hits", "layer_prefix_ops",
                  "layer_bakes")}

    # app pattern, same session: static tiger list + dynamic UI
    ctx2 = vg.createContext()
    cl2 = vg.createCommandList(ctx2, vg.CommandListFlags.Cacheable)
    vg.beginCommandList(ctx2, cl2)
    draw_tiger(ctx2, 20, 60, 1.06)
    vg.endCommandList(ctx2)

    def app_frame(k):
        vg.begin(ctx2, 0, 1920, 1080, 1.0)
        vg.submitCommandList(ctx2, cl2)
        draw_demo_ui(ctx2, 0.3 + 0.05 * k + 1e-4)
        return vg.end(ctx2, background=BG)

    for k in range(6):
        np.asarray(app_frame(k)[0, 0])
    app = [round(run_loop(lambda k: app_frame(6 + k + 10 * r), 5,
                          warm_img=wimg), 2) for r in range(3)]
    print(json.dumps({"pan_ab": res, "app_ms": app,
                      "pan_counters": pan_counters}), flush=True)


def ssr_ab() -> None:
    """ss=2 retained-pan: per-entry resolve on/off (chained device loops,
    interleaved), plus the direct ss=2 frame number for context."""
    import numpy as np  # noqa: F401
    import vgtpu as vg
    from vgtpu.raster.retained import RetainedScene, measure_pan_ms_per_frame
    from vgtpu.scenes.demo_ui import draw_benchmark_frame

    ctx = vg.createContext(vg.ContextConfig(coverage_supersample=2))
    vg.begin(ctx, 0, 1920, 1080, 1.0)
    draw_benchmark_frame(ctx, 0.0)
    scene = RetainedScene.bake(ctx, background=BG)
    res = {"resolve": [], "raw": []}
    # warm both statics
    measure_pan_ms_per_frame(scene, reps_hi=4, reps_lo=2)
    os.environ["VGTPU_NO_RESOLVE"] = "1"
    measure_pan_ms_per_frame(scene, reps_hi=4, reps_lo=2)
    os.environ.pop("VGTPU_NO_RESOLVE", None)
    for _rep in range(3):
        res["resolve"].append(round(
            measure_pan_ms_per_frame(scene, reps_hi=32, reps_lo=2), 3))
        os.environ["VGTPU_NO_RESOLVE"] = "1"
        res["raw"].append(round(
            measure_pan_ms_per_frame(scene, reps_hi=32, reps_lo=2), 3))
        os.environ.pop("VGTPU_NO_RESOLVE", None)
    print(json.dumps({"ss2_pan_ab": res}), flush=True)


def sweep_edge() -> None:
    """Where does the flat K-curve end?  (VERDICT r04 #6)"""
    from bench import batch_sweep

    batch_sweep(ks=(16, 24, 32, 48, 64, 96))


def main() -> None:
    from bench import host_spin_ms, start_keepalive

    which = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["anim", "pan", "ssr", "sweep"]
    ka = start_keepalive()
    print(f"host_spin_ms={host_spin_ms():.1f}", flush=True)
    ka["ready"].wait(timeout=1800)
    print(f"attach_s={ka['attach_s']}", flush=True)
    if ka["attach_s"] is None:
        sys.exit(1)
    for name in which:
        t0 = time.perf_counter()
        try:
            {"anim": anim_ab, "pan": pan_ab, "ssr": ssr_ab,
             "sweep": sweep_edge}[name]()
        except Exception as e:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            print(f"# {name} failed: {e}", file=sys.stderr, flush=True)
        print(f"# {name} took {time.perf_counter() - t0:.0f} s", flush=True)
    ka["stop"].set()


if __name__ == "__main__":
    main()
