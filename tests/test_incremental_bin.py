"""Incremental binning (per-op piece cache) vs fresh native binning.

The incremental assembly preserves the native binner's op-major ordering, so
a cached rebin must produce ARRAY-IDENTICAL plans — not just identical
pixels."""

import numpy as np
import pytest

import vgtpu as vg
from vgtpu import native
from vgtpu.raster.binning import bin_frame

pytestmark = pytest.mark.skipif(not native.available(), reason="no native lib")


def _scene(ctx, t: float):
    vg.beginPath(ctx)
    vg.circle(ctx, 100 + 40 * t, 80, 50)
    vg.fillPath(ctx, vg.color4ub(255, 0, 0, 255), vg.FillFlags.ConvexAA)
    vg.beginPath(ctx)
    vg.rect(ctx, 20, 20, 60, 40)
    vg.strokePath(ctx, vg.color4ub(0, 200, 0, 255), 4.0, vg.StrokeFlags.ButtMiterAA)
    vg.beginPath(ctx)
    vg.moveTo(ctx, 200, 30)
    vg.cubicTo(ctx, 250, 10, 280, 90, 320, 60)
    vg.lineTo(ctx, 260, 120)
    vg.closePath(ctx)
    vg.fillPath(ctx, vg.color4ub(0, 0, 255, 128), vg.FillFlags.ConcaveNonZeroAA)
    # clip group
    vg.beginClip(ctx, 0)
    vg.beginPath(ctx)
    vg.rect(ctx, 150, 40, 120, 80)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
    vg.endClip(ctx)
    vg.beginPath(ctx)
    vg.circle(ctx, 210, 80, 45)
    vg.fillPath(ctx, vg.color4ub(255, 200, 0, 255), vg.FillFlags.ConvexAA)
    vg.resetClip(ctx)


def _plan_arrays(plan):
    out = [plan.entry_tile, plan.entry_backdrop, plan.entry_kind,
           plan.entry_rule, plan.entry_aa, plan.entry_paint_kind,
           plan.entry_paint, plan.entry_scissor, plan.entry_image,
           plan.entry_op, plan.tile_entries]
    for ce, cent in plan.chunk_pools:
        out += [ce, cent]
    if plan.pop is not None:
        out += [plan.pop[k] for k in sorted(plan.pop)]
        out += [plan.entry_pop]
    return out


def test_incremental_identical_to_fresh():
    ctx = vg.createContext()
    cache: dict = {}
    for t in (0.0, 0.0, 1.0):   # frame 2 = all hits; frame 3 = partial
        vg.begin(ctx, 0, 384, 192, 1.0)
        _scene(ctx, t)
        ctx._finalize_ops()
        fresh = bin_frame(ctx.ops, ctx.fb_width, ctx.fb_height)
        inc = bin_frame(ctx.ops, ctx.fb_width, ctx.fb_height, bin_cache=cache)
        for a, b in zip(_plan_arrays(fresh), _plan_arrays(inc)):
            assert np.array_equal(np.asarray(a), np.asarray(b))
    # frame 2 re-used every op, frame 3 only the moved circle re-binned
    assert cache["hits"] > 0


def test_incremental_hit_counts():
    ctx = vg.createContext()
    cache: dict = {}
    vg.begin(ctx, 0, 384, 192, 1.0)
    _scene(ctx, 0.0)
    ctx._finalize_ops()
    n_ops = len(ctx.ops)
    bin_frame(ctx.ops, ctx.fb_width, ctx.fb_height, bin_cache=cache)
    assert cache["hits"] == 0

    vg.begin(ctx, 0, 384, 192, 1.0)
    _scene(ctx, 0.0)
    ctx._finalize_ops()
    bin_frame(ctx.ops, ctx.fb_width, ctx.fb_height, bin_cache=cache)
    assert cache["hits"] == n_ops

    vg.begin(ctx, 0, 384, 192, 1.0)
    _scene(ctx, 2.0)           # one op moved
    ctx._finalize_ops()
    bin_frame(ctx.ops, ctx.fb_width, ctx.fb_height, bin_cache=cache)
    assert n_ops - 2 <= cache["hits"] < n_ops

    # canvas size change invalidates the whole cache
    vg.begin(ctx, 0, 512, 256, 1.0)
    _scene(ctx, 2.0)
    ctx._finalize_ops()
    bin_frame(ctx.ops, ctx.fb_width, ctx.fb_height, bin_cache=cache)
    assert cache["hits"] == 0


def test_incremental_end_to_end_pixels():
    """Context.end with the cache warm renders identically to a cold context."""
    ctx = vg.createContext()
    for t in (0.0, 0.7):
        vg.begin(ctx, 0, 384, 192, 1.0)
        _scene(ctx, t)
        img_inc = np.asarray(vg.end(ctx, background=(1, 1, 1, 1)))

    cold = vg.createContext()
    vg.begin(cold, 0, 384, 192, 1.0)
    _scene(cold, 0.7)
    img_cold = np.asarray(vg.end(cold, background=(1, 1, 1, 1)))
    assert np.array_equal(img_inc, img_cold)


def test_incremental_fuzz_random_mutations():
    """Randomized frame sequences (op moves, paint changes, insertions,
    deletions — including op-count changes that force the full-bin fallback)
    stay array-identical to fresh binning."""
    rng = np.random.default_rng(7)
    ctx = vg.createContext()
    cache: dict = {}

    def frame(params):
        vg.begin(ctx, 0, 256, 128, 1.0)
        for kind, x, y, r, col in params:
            vg.beginPath(ctx)
            if kind == 0:
                vg.circle(ctx, x, y, r)
            elif kind == 1:
                vg.rect(ctx, x, y, r * 2, r)
            else:
                vg.moveTo(ctx, x, y)
                vg.lineTo(ctx, x + r, y + r)
                vg.lineTo(ctx, x - r, y + r)
                vg.closePath(ctx)
            if int(col) % 3 == 0:
                vg.strokePath(ctx, vg.color4ub(int(col) % 256, 80, 20, 255),
                              2.0, vg.StrokeFlags.ButtMiterAA)
            else:
                vg.fillPath(ctx, vg.color4ub(int(col) % 256, 100, 50, 200),
                            vg.FillFlags.ConcaveNonZeroAA)
        ctx._finalize_ops()

    params = [(int(rng.integers(0, 3)), float(rng.uniform(10, 240)),
               float(rng.uniform(10, 110)), float(rng.uniform(4, 24)),
               int(rng.integers(0, 999))) for _ in range(12)]
    for step in range(8):
        # mutate: move one, recolor one, sometimes insert/delete
        i = int(rng.integers(0, len(params)))
        k, x, y, r, c = params[i]
        params[i] = (k, x + float(rng.uniform(-5, 5)), y, r, c)
        j = int(rng.integers(0, len(params)))
        k, x, y, r, c = params[j]
        params[j] = (k, x, y, r, int(rng.integers(0, 999)))
        if step == 3:
            params.append((0, 100.0, 60.0, 15.0, 5))
        if step == 5:
            params.pop(2)
        frame(params)
        fresh = bin_frame(ctx.ops, ctx.fb_width, ctx.fb_height)
        inc = bin_frame(ctx.ops, ctx.fb_width, ctx.fb_height, bin_cache=cache)
        for a, b in zip(_plan_arrays(fresh), _plan_arrays(inc)):
            assert np.array_equal(np.asarray(a), np.asarray(b)), step
