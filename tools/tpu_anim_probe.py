"""Round-5 TPU session probe: attribute the r04 anim regression + stage-split
pan/app steady frames (VERDICT r04 #1 and #3) in ONE process/attach.

Anim attribution: the paint-memo hit path costs anim_norm 19.5 ms vs
dynamic_norm 7.8 (BENCH_r04) — strictly less work costing 2.5x more.  This
probe interleaves loop variants that skip pieces of the patch machinery
(monkeypatched promote_resident; stale pixels are fine, we only time):
  full    = current path (pop-paint put + params+ct re-expansion)
  noct    = skip the bucket_cts re-expansion (params only)
  nopp    = skip both expansions (host patch + pop put only)
Each variant's signature is warmed OUTSIDE the timed loop.  Profiler stages
(patch.host/patch.put/patch.promote, added r05) split host-blocking time.

Run: cd /root/repo && timeout 900 python tools/tpu_anim_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
import vgtpu as vg
from vgtpu.scenes.demo_ui import draw_benchmark_frame, draw_demo_ui
from vgtpu.scenes.tiger import draw_tiger

BG = (0.12, 0.12, 0.13, 1.0)


def sync(img):
    np.asarray(img[0, 0])


def main():
    ka = bench.start_keepalive()
    ctx = vg.createContext()

    def dyn(k, eps=0.0):
        vg.begin(ctx, 0, 1920, 1080, 1.0)
        draw_benchmark_frame(ctx, 0.05 * (k + 1) + eps)
        return vg.end(ctx, background=BG)

    def overlay(k):
        vg.begin(ctx, 0, 1920, 1080, 1.0)
        draw_benchmark_frame(ctx, 0.0)
        vg.beginPath(ctx)
        vg.rect(ctx, 1800, 1000, 60, 40)
        vg.fillPath(ctx, vg.color4ub(50 + 17 * (k % 12), 120, 200, 180),
                    vg.FillFlags.ConvexAA)
        return vg.end(ctx, background=BG)

    def redraw(_k):
        vg.begin(ctx, 0, 1920, 1080, 1.0)
        draw_benchmark_frame(ctx, 0.0)
        return vg.end(ctx, background=BG)

    t0 = time.perf_counter()
    wimg = None
    for k in range(5):
        wimg = dyn(k)
        sync(wimg)
    sync(redraw(0))
    sync(overlay(0))      # full bin with overlay geometry
    sync(overlay(1))      # first paint hit: pays any patch-path compile
    if not ka["ready"].wait(timeout=600):
        print(json.dumps({"error": "tunnel attach never completed"}))
        return
    ka["stop"].set()
    print(f"# warm done {time.perf_counter()-t0:.1f}s attach={ka['attach_s']}",
          file=sys.stderr, flush=True)
    spin = bench.host_spin_ms()

    d = ctx.last_device_arrays
    import vgtpu.raster.frame as fr
    orig_promote = fr.promote_resident
    stash = {"params": d["bucket_params"], "cts": d["bucket_cts"]}

    def promote_noct(plan, dd):
        if dd.get("bucket_cts") is None:
            dd["bucket_cts"] = stash["cts"]
        orig_promote(plan, dd)

    def promote_nopp(plan, dd):
        if dd.get("bucket_cts") is None:
            dd["bucket_cts"] = stash["cts"]
        if dd.get("bucket_params") is None:
            dd["bucket_params"] = stash["params"]

    variants = {"full": orig_promote, "noct": promote_noct,
                "nopp": promote_nopp}
    # warm each variant's jit signature outside the timed loops
    for name, fn in variants.items():
        fr_promote_save = fr.promote_resident
        fr.promote_resident = fn
        # context imports promote_resident inside the function body from
        # vgtpu.raster.frame, so module-attr patching is enough
        sync(overlay(2 + list(variants).index(name)))
        fr.promote_resident = fr_promote_save

    res = {}
    for rnd in range(2):
        for name, fn in variants.items():
            fr.promote_resident = fn
            ms = bench.run_loop(lambda k: overlay(10 * rnd + k + 5), 5,
                                warm_img=wimg)
            res.setdefault("anim_" + name, []).append(round(ms, 2))
            fr.promote_resident = orig_promote
        res.setdefault("redraw", []).append(
            round(bench.run_loop(redraw, 5, warm_img=wimg), 2))

    # host-stage attribution of the FULL path
    ctx.profiler.reset()
    ms = bench.run_loop(lambda k: overlay(k + 60), 5, warm_img=wimg)
    rep = ctx.profiler.report()
    res["anim_full_staged_ms"] = round(ms, 2)
    res["anim_stages_ms_per_frame"] = {
        k: round(v, 2) for k, v in rep["ms_per_frame"].items() if v > 0.05}

    # micro: 20 pop-paint-sized device_puts (is device_put tunnel-blocking?)
    import jax
    pp = np.asarray(ctx.last_plan.pop["paint"]) if ctx.last_plan.pop else None
    if pp is not None:
        t = time.perf_counter()
        outs = [jax.device_put(pp) for _ in range(20)]
        res["put20_enqueue_ms"] = round((time.perf_counter() - t) * 1e3, 1)
        t = time.perf_counter()
        np.asarray(outs[-1])[0, 0]
        res["put20_drain_ms"] = round((time.perf_counter() - t) * 1e3, 1)
        res["pop_paint_kb"] = round(pp.nbytes / 1024, 1)

    print(json.dumps({"anim_probe": res, "host_spin_ms": spin}), flush=True)

    # ---------------- pan / app stage split (VERDICT #3) ----------------
    ctx2 = vg.createContext()
    cl = vg.createCommandList(ctx2, vg.CommandListFlags.Cacheable)
    vg.beginCommandList(ctx2, cl)
    draw_tiger(ctx2, 20, 60, 1.06)
    vg.endCommandList(ctx2)

    def app_frame(k, eps=0.0):
        vg.begin(ctx2, 0, 1920, 1080, 1.0)
        vg.submitCommandList(ctx2, cl)
        draw_demo_ui(ctx2, 0.3 + 0.05 * k + eps)
        return vg.end(ctx2, background=BG)

    for k in range(6):
        sync(app_frame(k))
    ctx2.profiler.reset()
    app_ms = bench.run_loop(lambda k: app_frame(k, eps=1e-4), 6, warm_img=wimg)
    rep = ctx2.profiler.report()
    print(json.dumps({
        "app_ms": round(app_ms, 2),
        "app_stages_ms_per_frame": {k: round(v, 2)
                                    for k, v in rep["ms_per_frame"].items()
                                    if v > 0.05},
        "app_counters": rep["counters"]}), flush=True)

    ctx3 = vg.createContext()
    cl3 = vg.createCommandList(ctx3, vg.CommandListFlags.Cacheable)
    vg.beginCommandList(ctx3, cl3)
    draw_tiger(ctx3, 20, 60, 1.06)
    vg.endCommandList(ctx3)

    def pan_frame(k):
        vg.begin(ctx3, 0, 1920, 1080, 1.0)
        vg.pushState(ctx3)
        vg.transformTranslate(ctx3, 2.5 * k, 2 * k)
        vg.submitCommandList(ctx3, cl3)
        vg.popState(ctx3)
        draw_demo_ui(ctx3, 0.3 + 0.05 * k)
        return vg.end(ctx3, background=BG)

    for k in range(4):
        sync(pan_frame(k))
    ctx3.profiler.reset()
    pan_ms = bench.run_loop(lambda k: pan_frame(k + 4), 5, warm_img=wimg)
    rep = ctx3.profiler.report()
    print(json.dumps({
        "pan_ms": round(pan_ms, 2),
        "pan_stages_ms_per_frame": {k: round(v, 2)
                                    for k, v in rep["ms_per_frame"].items()
                                    if v > 0.05},
        "pan_counters": rep["counters"]}), flush=True)


if __name__ == "__main__":
    main()
