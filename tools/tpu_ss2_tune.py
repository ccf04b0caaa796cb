#!/usr/bin/env python
"""ss=2 (parity-mode) chunk-pool ladder A/B — one TPU process, one attach.

CLAUDE.md: the (2,4,8,24) default was tuned with the chunk-gather reduction
on the ss=1 benchmark frame; ss=2 doubles the per-chunk pixel domain
(tile_h*ss sub-rows), which shifts the slot-fill vs kernel-launch balance —
this sweep measures ladders on the ss=2 shapes specifically (VERDICT r3 #6
second half: nudge ss=2 under ~2 ms if it will go).

All plans bake first (compiles outside timing), then measurements
interleave round-robin so tunnel drift hits every config equally.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LADDERS = [
    (2, 4, 8, 24),
    (2, 4, 6, 12, 24),   # default (pre-resolve tuning)
    (2, 6, 24),          # coarser: the resolve split doubles launch count,
    (2, 4, 24),          # so fewer sizes may now win
    (4, 8, 24),
]


def main() -> None:
    from bench import host_spin_ms, start_keepalive

    ss = 2
    if "--ss" in sys.argv:
        ss = int(sys.argv[sys.argv.index("--ss") + 1])
    ka = start_keepalive()
    import numpy as np           # noqa: F401
    import vgtpu as vg
    from vgtpu.raster.benchloop import measure_device_ms_per_frame
    from vgtpu.scenes.demo_ui import draw_benchmark_frame

    bg = (0.12, 0.12, 0.13, 1.0)
    ka["ready"].wait(timeout=3300)
    print(f"attach_s={ka['attach_s']}  host_spin={host_spin_ms():.1f}",
          flush=True)
    if ka["attach_s"] is None:
        sys.exit(1)

    plans = []
    for lad in LADDERS:
        ctx = vg.createContext(vg.ContextConfig(
            coverage_supersample=ss, chunk_pools=lad))
        vg.begin(ctx, 0, 1920, 1080, 1.0)
        draw_benchmark_frame(ctx, 0.0)
        img = vg.end(ctx, background=bg)
        import numpy as np
        np.asarray(img[0, 0])    # compile + first execute outside timing
        plans.append((lad, ctx.last_plan, ctx.last_device_arrays))
        print(f"# baked {lad}  chunks={ctx.last_plan.stats.get('chunks')}",
              flush=True)

    results = {str(lad): [] for lad, _p, _d in plans}
    for rep in range(3):
        for lad, plan, d in plans:
            ms = measure_device_ms_per_frame(plan, d, bg,
                                             reps_hi=32, reps_lo=3)
            results[str(lad)].append(round(ms, 3))
            print(f"rep{rep} {lad}: {ms:.3f} ms", flush=True)
    ka["stop"].set()
    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    print(json.dumps({"ss%d_ladders" % ss: results, "median": med,
                      "host_spin_ms": round(host_spin_ms(), 1)}), flush=True)


if __name__ == "__main__":
    main()
