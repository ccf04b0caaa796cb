"""Cross-cutting reference-semantics checks: paints anchor to the transform
at creation time, alpha modulation composes, culling only culls."""

import numpy as np

import vgtpu as vg
from tests.test_text import FONT_DATA


def make_ctx(w=128, h=64):
    ctx = vg.createContext()
    vg.begin(ctx, 0, w, h, 1.0)
    return ctx


def test_gradient_anchors_to_creation_transform():
    """createXxxGradient bakes the CURRENT transform into the paint matrix
    (vg.cpp:3739-3747): moving after creation must not move the gradient."""
    ctx = make_ctx()
    vg.transformTranslate(ctx, 32, 0)
    g = vg.createLinearGradient(ctx, 0, 0, 64, 0, vg.Colors.Red, vg.Colors.Blue)
    vg.transformIdentity(ctx)   # transform changes AFTER creation
    vg.beginPath(ctx)
    vg.rect(ctx, 0, 0, 128, 64)
    vg.fillPath(ctx, g, vg.FillFlags.ConvexAA)
    img = np.asarray(vg.end(ctx, background=(0, 0, 0, 0)))
    # gradient runs from x=32 (red) to x=96 (blue) in screen space
    assert img[32, 33, 0] > 0.9
    assert img[32, 95, 2] > 0.9
    mid = img[32, 64]
    assert 0.3 < mid[0] < 0.7 and 0.3 < mid[2] < 0.7


def test_radial_gradient_shape():
    ctx = make_ctx(128, 128)
    g = vg.createRadialGradient(ctx, 64, 64, 10, 50,
                                vg.Colors.White, vg.color4ub(255, 255, 255, 0))
    vg.beginPath(ctx)
    vg.rect(ctx, 0, 0, 128, 128)
    vg.fillPath(ctx, g, vg.FillFlags.ConvexAA)
    img = np.asarray(vg.end(ctx, background=(0, 0, 0, 0)))[..., 3]
    assert img[64, 64] > 0.95                    # center inner color
    assert img[64, 120] < 0.1                    # beyond outer radius
    # radial symmetry
    assert abs(img[64, 64 + 30] - img[64 + 30, 64]) < 0.05
    # monotonic falloff
    ring = [img[64, 64 + r] for r in (10, 25, 40, 52)]
    assert all(a >= b - 1e-3 for a, b in zip(ring, ring[1:]))


def test_box_gradient_rounded_corner_profile():
    ctx = make_ctx(128, 128)
    g = vg.createBoxGradient(ctx, 24, 24, 80, 80, 12, 20,
                             vg.Colors.White, vg.color4ub(255, 255, 255, 0))
    vg.beginPath(ctx)
    vg.rect(ctx, 0, 0, 128, 128)
    vg.fillPath(ctx, g, vg.FillFlags.ConvexAA)
    img = np.asarray(vg.end(ctx, background=(0, 0, 0, 0)))[..., 3]
    assert img[64, 64] > 0.9                     # box interior
    assert img[8, 8] < 0.15                      # far corner outside feather
    assert img[64, 64] > img[28, 28]             # corner dimmer than center


def test_text_respects_global_alpha():
    ctx = make_ctx(256, 64)
    f = vg.createFont(ctx, "sans", FONT_DATA, len(FONT_DATA), 0)
    cfg = vg.makeTextConfig(ctx, f, 30.0, vg.TextAlign.TopLeft, vg.Colors.White)
    vg.setGlobalAlpha(ctx, 0.5)
    vg.text(ctx, cfg, 8, 8, "OO")
    img = np.asarray(vg.end(ctx, background=(0, 0, 0, 0)))[..., 3]
    assert img.max() < 0.55
    assert img.max() > 0.4


def test_culling_keeps_partially_visible():
    ctx = make_ctx()
    cl = vg.createCommandList(ctx, vg.CommandListFlags.AllowCommandCulling)
    vg.beginCommandList(ctx, cl)
    vg.beginPath(ctx)
    vg.rect(ctx, 10, 10, 30, 30)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
    vg.endCommandList(ctx)
    vg.setScissor(ctx, 0, 0, 20, 20)   # overlaps the rect partially
    vg.submitCommandList(ctx, cl)
    assert len(ctx.ops) == 1           # NOT culled
    img = np.asarray(vg.end(ctx, background=(0, 0, 0, 0)))[..., 3]
    assert img[15, 15] == 1.0
    assert img[25, 25] == 0.0          # scissored


def test_stroke_scales_with_transform():
    ctx = make_ctx(128, 64)
    vg.transformScale(ctx, 2.0, 2.0)
    vg.beginPath(ctx)
    vg.moveTo(ctx, 5, 16)
    vg.lineTo(ctx, 55, 16)
    vg.strokePath(ctx, vg.Colors.White, 4.0, vg.StrokeFlags.ButtMiterAA)
    img = np.asarray(vg.end(ctx, background=(0, 0, 0, 0)))[..., 3]
    # width 4 x scale 2 = 8 device px centered at y=32
    col = img[:, 60]
    assert abs(col.sum() - 8.0) < 0.3
    assert img[32, 60] == 1.0


def test_even_odd_vs_nonzero_same_winding_ring():
    """Two same-orientation nested squares: NonZero fills solid, EvenOdd
    punches the hole — the distinction libtess2 winding rules provided."""
    ctx = make_ctx(64, 64)
    for rule, expect_hole in ((vg.FillFlags.ConcaveNonZeroAA, False),
                              (vg.FillFlags.ConcaveEvenOddAA, True)):
        vg.begin(ctx, 0, 64, 64, 1.0)
        vg.beginPath(ctx)
        vg.rect(ctx, 8, 8, 48, 48)
        vg.rect(ctx, 24, 24, 16, 16)   # same orientation as outer
        vg.fillPath(ctx, vg.Colors.White, rule)
        img = np.asarray(vg.end(ctx, background=(0, 0, 0, 0)))[..., 3]
        assert img[12, 12] == 1.0
        assert (img[32, 32] == 0.0) == expect_hole, rule


def test_stroke_with_gradient_paint():
    """strokePath(gradient,...) — the reference's ctxStrokePathGradient."""
    ctx = make_ctx(128, 64)
    g = vg.createLinearGradient(ctx, 10, 0, 110, 0, vg.Colors.Red, vg.Colors.Blue)
    vg.beginPath(ctx)
    vg.moveTo(ctx, 10, 32)
    vg.lineTo(ctx, 110, 32)
    vg.strokePath(ctx, g, 10.0, vg.StrokeFlags.ButtMiterAA)
    img = np.asarray(vg.end(ctx, background=(0, 0, 0, 0)))
    assert img[32, 14, 0] > 0.8          # red end
    assert img[32, 105, 2] > 0.8         # blue end
    assert img[10, 60, 3] == 0.0         # outside the stroke band


def test_stroke_with_pattern_paint():
    ctx = make_ctx(64, 64)
    data = np.full((2, 2, 4), 255, np.uint8)
    data[..., 1] = 0
    data[..., 2] = 0   # red
    h = vg.createImage(ctx, 2, 2, vg.ImageFlags.Filter_Nearest, data)
    pat = vg.createImagePattern(ctx, 0, 0, 64, 64, 0.0, h)
    vg.beginPath(ctx)
    vg.circle(ctx, 32, 32, 20)
    vg.strokePath(ctx, pat, vg.Colors.White, 6.0, vg.StrokeFlags.ButtMiterAA)
    img = np.asarray(vg.end(ctx, background=(0, 0, 0, 0)))
    assert img[32, 52, 0] > 0.8          # on the ring, red pattern
    assert img[32, 32, 3] < 1e-4         # ring hole


def test_textbox_center_alignment():
    from tests.test_text import FONT_DATA

    ctx = make_ctx(256, 96)
    f = vg.createFont(ctx, "sans", FONT_DATA, len(FONT_DATA), 0)
    cfg = vg.makeTextConfig(ctx, f, 16.0, vg.TextAlign.TopCenter, vg.Colors.White)
    vg.textBox(ctx, cfg, 28, 8, 200.0, "mm", None, 0)
    img = np.asarray(vg.end(ctx, background=(0, 0, 0, 0)))[..., 3]
    ys, xs = np.nonzero(img > 0.3)
    assert len(xs) > 10
    center = (xs.min() + xs.max()) / 2
    assert abs(center - 128) < 6         # centered on box midline x=28+100
