#!/usr/bin/env python
"""Command-list checkpoint/resume: record a scene once, save it WITH its
tessellation cache, and restore it in a fresh context (e.g. another process,
another day) where it renders without re-tessellating.

The reference's retained byte stream + shape cache (vg.cpp:2323-2966,
:5674-6211) are memory-resident only; here they round-trip through disk.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import vgtpu as vg  # noqa: E402


def record(ctx):
    cl = vg.createCommandList(ctx, vg.CommandListFlags.Cacheable)
    vg.beginCommandList(ctx, cl)
    g = vg.createRadialGradient(ctx, 160, 120, 10, 150,
                                vg.color4ub(255, 220, 120, 255),
                                vg.color4ub(30, 30, 80, 255))
    vg.beginPath(ctx)
    vg.rect(ctx, 0, 0, 320, 240)
    vg.fillPath(ctx, g, vg.FillFlags.ConvexAA)
    for k in range(8):
        a = k * np.pi / 4
        vg.beginPath(ctx)
        vg.moveTo(ctx, 160, 120)
        vg.cubicTo(ctx, 160 + 90 * np.cos(a), 120 + 90 * np.sin(a),
                   160 + 60 * np.cos(a + 1), 120 + 60 * np.sin(a + 1),
                   160 + 110 * np.cos(a + 0.5), 120 + 110 * np.sin(a + 0.5))
        vg.strokePath(ctx, vg.color4ub(255, 255, 255, 160), 2.5,
                      vg.StrokeFlags.RoundRoundAA)
    vg.endCommandList(ctx)
    return cl


def main() -> None:
    path = "/tmp/vgtpu_scene.vgcl"
    bg = (0.06, 0.06, 0.08, 1.0)

    ctx = vg.createContext()
    vg.begin(ctx, 0, 320, 240, 1.0)
    cl = record(ctx)
    vg.submitCommandList(ctx, cl)            # first submit builds the cache
    vg.end(ctx, background=bg)
    vg.saveCommandList(ctx, cl, path)
    print(f"saved {path} ({os.path.getsize(path)} bytes, cache included)")

    # "another process": fresh context, no re-recording, no re-tessellation
    ctx2 = vg.createContext()
    vg.begin(ctx2, 0, 320, 240, 1.0)
    t0 = time.perf_counter()
    h = vg.loadCommandList(ctx2, path)
    load_ms = (time.perf_counter() - t0) * 1e3
    vg.submitCommandList(ctx2, h)
    np.asarray(vg.end(ctx2, background=bg)[0, 0])   # incl. one-time jit compile
    t0 = time.perf_counter()
    vg.begin(ctx2, 0, 320, 240, 1.0)
    vg.submitCommandList(ctx2, h)                    # cached replay, warm
    img = np.asarray(vg.end(ctx2, background=bg))
    warm_ms = (time.perf_counter() - t0) * 1e3
    print(f"load {load_ms:.1f} ms; warm restored-frame {warm_ms:.1f} ms "
          f"(mean alpha {img[..., 3].mean():.3f}) — no re-tessellation")


if __name__ == "__main__":
    main()
