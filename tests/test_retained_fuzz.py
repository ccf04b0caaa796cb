"""Fuzz: retained-scene panning vs direct rendering on randomized scenes —
fills (both rules, opaque + translucent), strokes, gradients, clip groups,
scissors, polylines with off-canvas vertices — across random view offsets
(whole-tile, sub-tile, negative)."""

from __future__ import annotations

import numpy as np

import vgtpu as vg
from vgtpu.raster.retained import RetainedScene

W, H = 320, 128


def _make_recipe(rng):
    """A replayable list of draw steps (the direct path re-records them
    under a translate, so the scene must be a pure function of the seed)."""
    steps = []
    n_clip = int(rng.integers(0, 2))
    for _ in range(int(rng.integers(5, 14))):
        r = rng.uniform()
        if r < 0.12 and n_clip:
            steps.append(("clip", rng.uniform(0.0, 1.0) < 0.7,
                          rng.uniform(40, 280), rng.uniform(20, 100),
                          rng.uniform(15, 60)))
            n_clip -= 1
        elif r < 0.17:
            steps.append(("resetclip",))
        elif r < 0.27:
            if rng.uniform() < 0.5:
                steps.append(("scissor", rng.uniform(0, 80), rng.uniform(0, 50),
                              rng.uniform(60, 200), rng.uniform(40, 70)))
            else:
                steps.append(("noscissor",))
        elif r < 0.45:
            steps.append(("circle", rng.uniform(0, W), rng.uniform(0, H),
                          rng.uniform(5, 50), tuple(rng.integers(0, 256, 3)),
                          int(rng.integers(40, 256)), rng.uniform() < 0.7))
        elif r < 0.6:
            pts = rng.uniform(-20, W + 20, (int(rng.integers(4, 10)), 2))
            pts[:, 1] = rng.uniform(-20, H + 20, len(pts))
            steps.append(("poly", pts, tuple(rng.integers(0, 256, 3)),
                          int(rng.integers(60, 256)), rng.uniform() < 0.4))
        elif r < 0.75:
            steps.append(("grad", rng.uniform(0, W), rng.uniform(0, H),
                          rng.uniform(40, 160), rng.uniform(20, 60),
                          tuple(rng.integers(0, 256, 3)),
                          tuple(rng.integers(0, 256, 3))))
        else:
            pts = rng.uniform(0, W, (int(rng.integers(2, 6)), 2))
            pts[:, 1] = rng.uniform(0, H, len(pts))
            steps.append(("stroke", pts, tuple(rng.integers(0, 256, 3)),
                          rng.uniform(0.5, 7.0)))
    steps.append(("resetclip",))
    return steps


def _draw(ctx, steps):
    for s in steps:
        if s[0] == "clip":
            _k, inside, cx, cy, rr = s
            vg.beginClip(ctx, vg.ClipRule.In if inside else vg.ClipRule.Out)
            vg.beginPath(ctx)
            vg.circle(ctx, cx, cy, rr)
            vg.fillPath(ctx, vg.Colors.Black, vg.FillFlags.ConvexAA)
            vg.endClip(ctx)
        elif s[0] == "resetclip":
            vg.resetClip(ctx)
        elif s[0] == "scissor":
            vg.setScissor(ctx, *s[1:])
        elif s[0] == "noscissor":
            vg.resetScissor(ctx)
        elif s[0] == "circle":
            _k, cx, cy, rr, rgb, a, aa = s
            vg.beginPath(ctx)
            vg.circle(ctx, cx, cy, rr)
            vg.fillPath(ctx, vg.color4ub(*rgb, a),
                        vg.FillFlags.ConvexAA if aa else vg.FillFlags.Convex)
        elif s[0] == "poly":
            _k, pts, rgb, a, eo = s
            vg.beginPath(ctx)
            vg.polyline(ctx, pts)
            vg.closePath(ctx)
            vg.fillPath(ctx, vg.color4ub(*rgb, a),
                        vg.FillFlags.ConcaveEvenOddAA if eo
                        else vg.FillFlags.ConcaveNonZeroAA)
        elif s[0] == "grad":
            _k, x, y, w, h, c0, c1 = s
            g = vg.createLinearGradient(ctx, x, y, x + w, y + h,
                                        vg.color4ub(*c0, 255),
                                        vg.color4ub(*c1, 255))
            vg.beginPath(ctx)
            vg.rect(ctx, x, y, w, h)
            vg.fillPath(ctx, g, vg.FillFlags.ConvexAA)
        elif s[0] == "stroke":
            _k, pts, rgb, w = s
            # beginPath matters: without it a SAME-context re-record appends
            # to the previous frame's path (reference semantics — paths
            # reset only at beginPath, vg.cpp ctxBeginPath), which
            # update_paint_values correctly rejects as a structural delta
            vg.beginPath(ctx)
            vg.polyline(ctx, s[1])
            vg.strokePath(ctx, vg.color4ub(*rgb, 255), w,
                          vg.StrokeFlags.RoundRoundAA)


def _recolor(steps, rng):
    """Value-only mutation of a recipe: new colors everywhere, alpha class
    preserved for NonZero solids (occlusion covers), free for even-odd
    fills (exercises the guard's rule exemption)."""
    out = []
    for s in steps:
        if s[0] == "circle":
            k, cx, cy, rr, _rgb, a, aa = s
            a2 = 255 if a == 255 else int(rng.integers(40, 255))
            out.append((k, cx, cy, rr, tuple(rng.integers(0, 256, 3)), a2, aa))
        elif s[0] == "poly":
            k, pts, _rgb, a, eo = s
            a2 = (int(rng.integers(60, 256)) if eo
                  else (255 if a == 255 else int(rng.integers(60, 255))))
            out.append((k, pts, tuple(rng.integers(0, 256, 3)), a2, eo))
        elif s[0] == "grad":
            k, x, y, w, h, _c0, _c1 = s
            out.append((k, x, y, w, h, tuple(rng.integers(0, 256, 3)),
                        tuple(rng.integers(0, 256, 3))))
        elif s[0] == "stroke":
            k, pts, _rgb, w = s
            out.append((k, pts, tuple(rng.integers(0, 256, 3)), w))
        else:
            out.append(s)
    return out


def test_fuzz_paint_update_vs_fresh_bake():
    """Random scenes + random value-only recolors: update_paint_values must
    render exactly like a fresh bake of the recolored scene, at integer and
    fractional-x views."""
    rng = np.random.default_rng(13)
    bg = (0.15, 0.1, 0.2, 1.0)
    for trial in range(4):
        steps = _make_recipe(rng)
        ctx = vg.createContext()
        vg.begin(ctx, 0, W, H, 1.0)
        _draw(ctx, steps)
        scene = RetainedScene.bake(ctx, background=bg)

        steps2 = _recolor(steps, rng)
        vg.begin(ctx, 0, W, H, 1.0)
        _draw(ctx, steps2)
        scene.update_paint_values(ctx)

        ctx2 = vg.createContext()
        vg.begin(ctx2, 0, W, H, 1.0)
        _draw(ctx2, steps2)
        want_scene = RetainedScene.bake(ctx2, background=bg)

        for view in [(int(rng.integers(-100, 200)), int(rng.integers(-40, 80))),
                     (float(rng.uniform(-50, 150)), 0)]:
            got = np.asarray(scene.render(*view))
            want = np.asarray(want_scene.render(*view))
            np.testing.assert_allclose(
                got, want, atol=3e-4,
                err_msg=f"trial {trial} view {view}")


def test_fuzz_pan_vs_direct():
    rng = np.random.default_rng(7)
    bg = (0.15, 0.1, 0.2, 1.0)
    for trial in range(6):
        steps = _make_recipe(rng)
        ctx = vg.createContext()
        vg.begin(ctx, 0, W, H, 1.0)
        _draw(ctx, steps)
        scene = RetainedScene.bake(ctx, background=bg)
        for _ in range(3):
            view = (int(rng.integers(-150, 300)), int(rng.integers(-60, 120)))
            got = np.asarray(scene.render(*view))
            ctx2 = vg.createContext()
            vg.begin(ctx2, 0, W, H, 1.0)
            vg.pushState(ctx2)
            vg.transformTranslate(ctx2, -view[0], -view[1])
            _draw(ctx2, steps)
            vg.popState(ctx2)
            want = np.asarray(vg.end(ctx2, background=bg))
            np.testing.assert_allclose(
                got, want, atol=3e-4,
                err_msg=f"trial {trial} view {view}")
