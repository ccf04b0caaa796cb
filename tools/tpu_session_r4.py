#!/usr/bin/env python
"""One-process TPU measurement batch (r04): pan A/B, batch K-sweep, ss2.

One process = one tunnel attach (per-process tax, CLAUDE.md); the keepalive
thread pays it while the host bakes.  All numbers are same-session,
same-chip — the only comparison CLAUDE.md's measurement discipline allows.

Usage: python tools/tpu_session_r4.py [pan|sweep|ss2 ...]  (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pan_ab() -> None:
    """Fused vs two-dispatch pan loop, interleaved A/B."""
    import numpy as np
    import vgtpu as vg
    from bench import run_loop
    from vgtpu.scenes.demo_ui import draw_demo_ui
    from vgtpu.scenes.tiger import draw_tiger

    bg = (0.12, 0.12, 0.13, 1.0)
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
        return vg.end(ctx, background=bg)

    wimg = None
    for k in range(4):
        wimg = frame(k)
        np.asarray(wimg[0, 0])
    # warm BOTH modes' compiles outside timing
    os.environ["VGTPU_PAN_NO_FUSE"] = "1"
    np.asarray(frame(4)[0, 0])
    del os.environ["VGTPU_PAN_NO_FUSE"]
    np.asarray(frame(5)[0, 0])

    results = {"fused": [], "two-dispatch": []}
    for rep in range(3):
        for mode in ("fused", "two-dispatch"):
            if mode == "two-dispatch":
                os.environ["VGTPU_PAN_NO_FUSE"] = "1"
            ms = run_loop(lambda k: frame(6 + k + 10 * rep), 5, warm_img=wimg)
            os.environ.pop("VGTPU_PAN_NO_FUSE", None)
            results[mode].append(round(ms, 2))
    hits = ctx.profiler.counters.get("layer_cl_hits", 0)
    print(json.dumps({"pan_ab": results, "layer_cl_hits": hits}), flush=True)


def sweep() -> None:
    from bench import batch_sweep

    batch_sweep()


def ss2() -> None:
    from bench import ss2_diag

    ss2_diag()


def main() -> None:
    from bench import host_spin_ms, start_keepalive

    which = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["pan", "sweep", "ss2"]
    ka = start_keepalive()
    print(f"host_spin_ms={host_spin_ms():.1f}", flush=True)
    ka["ready"].wait(timeout=1800)
    print(f"attach_s={ka['attach_s']}", flush=True)
    if ka["attach_s"] is None:
        sys.exit(1)
    for name in which:
        t0 = time.perf_counter()
        try:
            {"pan": pan_ab, "sweep": sweep, "ss2": ss2}[name]()
        except Exception as e:  # noqa: BLE001
            print(f"# {name} failed: {e}", file=sys.stderr, flush=True)
        print(f"# {name} took {time.perf_counter() - t0:.0f} s", flush=True)
    ka["stop"].set()


if __name__ == "__main__":
    main()
