#!/usr/bin/env python
"""A/B: plain/fancy bucket split (8 composite launches) vs merged equal-depth
buckets (4 launches, union shading lanes).  Chained-loop device timing."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import vgtpu as vg  # noqa: E402
from vgtpu.raster import binning  # noqa: E402
from vgtpu.raster.benchloop import measure_device_ms_per_frame  # noqa: E402
from vgtpu.scenes.demo_ui import draw_benchmark_frame  # noqa: E402


def build(split: bool):
    binning.BUCKET_SPLIT_FANCY = split
    ctx = vg.createContext()
    vg.begin(ctx, 0, 1920, 1080, 1.0)
    draw_benchmark_frame(ctx, 0.0)
    img = vg.end(ctx, background=(0.12, 0.12, 0.13, 1.0))
    img.block_until_ready()
    return ctx.last_plan, ctx.last_device_arrays


def main() -> None:
    bg = (0.12, 0.12, 0.13, 1.0)
    for split in (True, False):
        plan, d = build(split)
        nb = len(plan.tile_buckets)
        ms = [measure_device_ms_per_frame(plan, d, bg, reps_hi=64, reps_lo=4)
              for _ in range(3)]
        shapes = [(te.shape, fl) for te, _ids, fl in plan.tile_buckets]
        print(f"split={split}: buckets={nb} median={sorted(ms)[1]:.3f} ms "
              f"(runs {['%.3f' % m for m in ms]})")
        for s in shapes:
            print(f"   {s}")


if __name__ == "__main__":
    main()
