#!/usr/bin/env python
"""TPU session r5b: chunk-gather pan A/B (ss=1 + ss=2, chained device
loops) and the pan-vs-app LOOP measurement with shape-warm content cycling
(the r5a pan_ab rows were contaminated by in-loop recompiles: every rep's
fresh UI t values minted fresh padded bucket shapes).

Here the UI content cycles over 5 pre-warmed t values plus a per-rep
epsilon (the bench's dyn-loop trick): distinct fingerprints — the frame
memo never hits — but identical padded shapes, so no compiles land inside
the timed loops.

Usage: python tools/tpu_session_r5b.py [pandev|panloop ...] (default all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BG = (0.12, 0.12, 0.13, 1.0)


def pandev_ab() -> None:
    """Device-side pan frames (chained): chunk-gather vs legacy entry-gather
    at ss=1 and ss=2."""
    import vgtpu as vg
    from vgtpu.raster.retained import RetainedScene, measure_pan_ms_per_frame
    from vgtpu.scenes.demo_ui import draw_benchmark_frame

    out = {}
    for ss in (1, 2):
        ctx = vg.createContext(vg.ContextConfig(coverage_supersample=ss))
        vg.begin(ctx, 0, 1920, 1080, 1.0)
        draw_benchmark_frame(ctx, 0.0)
        scene = RetainedScene.bake(ctx, background=BG)
        res = {"chunk_gather": [], "legacy": []}
        measure_pan_ms_per_frame(scene, reps_hi=4, reps_lo=2)   # warm
        os.environ["VGTPU_PAN_NO_CHUNKGATHER"] = "1"
        measure_pan_ms_per_frame(scene, reps_hi=4, reps_lo=2)
        os.environ.pop("VGTPU_PAN_NO_CHUNKGATHER", None)
        for _rep in range(3):
            res["chunk_gather"].append(round(
                measure_pan_ms_per_frame(scene, reps_hi=32, reps_lo=2), 3))
            os.environ["VGTPU_PAN_NO_CHUNKGATHER"] = "1"
            res["legacy"].append(round(
                measure_pan_ms_per_frame(scene, reps_hi=32, reps_lo=2), 3))
            os.environ.pop("VGTPU_PAN_NO_CHUNKGATHER", None)
        out[f"ss{ss}"] = res
        print(json.dumps({"pandev_ab": {f"ss{ss}": res}}), flush=True)
    print(json.dumps({"pandev_ab_all": out}), flush=True)


def panloop_ab() -> None:
    """Pan loop (overlay on/off) + app loop, shape-warm content cycling."""
    import numpy as np
    import vgtpu as vg
    from bench import run_loop
    from vgtpu.scenes.demo_ui import draw_demo_ui
    from vgtpu.scenes.tiger import draw_tiger

    def ui_t(k, rep):
        # 5 warmed contents x tiny per-rep epsilon: same padded shapes,
        # fresh fingerprints
        return 0.3 + 0.05 * (k % 5) + 1e-4 * rep

    ctx = vg.createContext()
    cl = vg.createCommandList(ctx, vg.CommandListFlags.Cacheable)
    vg.beginCommandList(ctx, cl)
    draw_tiger(ctx, 20, 60, 1.06)
    vg.endCommandList(ctx)

    def frame(k, rep):
        vg.begin(ctx, 0, 1920, 1080, 1.0)
        vg.pushState(ctx)
        vg.transformTranslate(ctx, 2.5 * k, 2 * k)
        vg.submitCommandList(ctx, cl)
        vg.popState(ctx)
        draw_demo_ui(ctx, ui_t(k, rep))
        return vg.end(ctx, background=BG)

    wimg = None
    for k in range(10):                 # cache, bake, overlay, all 5 shapes
        wimg = frame(k, 0)
        np.asarray(wimg[0, 0])
    os.environ["VGTPU_PAN_NO_OVERLAY"] = "1"
    for k in range(10, 13):             # warm the no-overlay signature
        np.asarray(frame(k, 0)[0, 0])
    os.environ.pop("VGTPU_PAN_NO_OVERLAY", None)
    np.asarray(frame(13, 0)[0, 0])

    res = {"overlay": [], "no_overlay": []}
    kk = 14
    for rep in range(1, 4):
        ms = run_loop(lambda k: frame(kk + k, rep), 5, warm_img=wimg)
        kk += 5
        res["overlay"].append(round(ms, 2))
        os.environ["VGTPU_PAN_NO_OVERLAY"] = "1"
        ms = run_loop(lambda k: frame(kk + k, rep), 5, warm_img=wimg)
        kk += 5
        os.environ.pop("VGTPU_PAN_NO_OVERLAY", None)
        res["no_overlay"].append(round(ms, 2))
    pan_counters = {
        k: ctx.profiler.counters.get(k, 0)
        for k in ("layer_cl_hits", "layer_hits", "layer_prefix_ops",
                  "layer_bakes")}

    ctx2 = vg.createContext()
    cl2 = vg.createCommandList(ctx2, vg.CommandListFlags.Cacheable)
    vg.beginCommandList(ctx2, cl2)
    draw_tiger(ctx2, 20, 60, 1.06)
    vg.endCommandList(ctx2)

    def app_frame(k, rep):
        vg.begin(ctx2, 0, 1920, 1080, 1.0)
        vg.submitCommandList(ctx2, cl2)
        draw_demo_ui(ctx2, ui_t(k, rep) + 5e-5)
        return vg.end(ctx2, background=BG)

    for k in range(8):
        np.asarray(app_frame(k, 0)[0, 0])
    app = []
    kk = 8
    for rep in range(1, 4):
        app.append(round(run_loop(lambda k: app_frame(kk + k, rep), 5,
                                  warm_img=wimg), 2))
        kk += 5
    print(json.dumps({"panloop_ab": res, "app_ms": app,
                      "pan_counters": pan_counters}), flush=True)


def main() -> None:
    from bench import host_spin_ms, start_keepalive

    which = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["pandev", "panloop"]
    ka = start_keepalive()
    print(f"host_spin_ms={host_spin_ms():.1f}", flush=True)
    ka["ready"].wait(timeout=1800)
    print(f"attach_s={ka['attach_s']}", flush=True)
    if ka["attach_s"] is None:
        sys.exit(1)
    for name in which:
        t0 = time.perf_counter()
        try:
            {"pandev": pandev_ab, "panloop": panloop_ab}[name]()
        except Exception as e:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            print(f"# {name} failed: {e}", file=sys.stderr, flush=True)
        print(f"# {name} took {time.perf_counter() - t0:.0f} s", flush=True)
    ka["stop"].set()


if __name__ == "__main__":
    main()
