#!/usr/bin/env python
"""A/B chunk-pool ladders for the coverage kernels, with the chunk-gather
reduction in place (chunk count no longer carries a segment-sum penalty —
ROUND_NOTES round-3 lead #2).  Reports slot fill + frame ms per ladder."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import vgtpu as vg  # noqa: E402
from vgtpu.api.config import ContextConfig  # noqa: E402
from vgtpu.raster.benchloop import measure_device_ms_per_frame  # noqa: E402
from vgtpu.scenes.demo_ui import draw_benchmark_frame  # noqa: E402


def run(pools) -> None:
    ctx = vg.createContext(ContextConfig(chunk_pools=tuple(pools)))
    vg.begin(ctx, 0, 1920, 1080, 1.0)
    draw_benchmark_frame(ctx, 0.0)
    img = vg.end(ctx, background=(0.12, 0.12, 0.13, 1.0))
    img.block_until_ready()
    plan, d = ctx.last_plan, ctx.last_device_arrays
    slots = edges = 0
    sizes = []
    for ce, _cent in plan.chunk_pools:
        n, ch = ce.shape[0], ce.shape[1]
        live = (ce[:, :, 1] != ce[:, :, 3]).sum()  # y0 != y1 -> real edge
        slots += n * ch
        edges += int(live)
        sizes.append((n, ch))
    ms = [measure_device_ms_per_frame(plan, d, (0.12, 0.12, 0.13, 1.0),
                                      reps_hi=64, reps_lo=4) for _ in range(3)]
    print(f"pools={tuple(pools)}: sizes={sizes} fill={100 * edges / max(slots, 1):.0f}% "
          f"median={sorted(ms)[1]:.3f} ms (runs {['%.3f' % m for m in ms]})",
          flush=True)


def main() -> None:
    for pools in ([2, 6, 24], [2, 4, 8, 24], [2, 4, 8, 16, 32], [2, 4, 8, 32],
                  [2, 4, 8, 16, 48]):
        run(pools)


if __name__ == "__main__":
    main()
