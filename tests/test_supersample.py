"""Conflation-free y-supersampled coverage (ContextConfig.coverage_supersample).

The analytic box-filter conflates at self-intersection pixels: a pixel half
covered by a winding-2 region reads w=1 and paints FULL alpha, where the
reference's triangle meshes (winding-classified regions, libtess2
tess.c:539/:998) paint half.  ss=4 applies the fill rule per quarter-row, so
y-varying overlap resolves to mesh-equivalent coverage."""

import numpy as np

import vgtpu as vg
from vgtpu.api.config import ContextConfig


def _overlap_scene(ctx):
    """One NonZero fill of two identical subpath rects, top edge at y=10.5:
    pixel row 10 is half covered by a winding-2 region."""
    vg.beginPath(ctx)
    vg.rect(ctx, 8, 10.5, 100, 20)
    vg.rect(ctx, 8, 10.5, 100, 20)      # second identical subpath: w=2 inside
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConcaveNonZeroAA)


def _render(ss, draw, w=128, h=48, cfg_extra=None):
    cfg = ContextConfig(coverage_supersample=ss, **(cfg_extra or {}))
    ctx = vg.createContext(cfg=cfg)
    vg.begin(ctx, 0, w, h, 1.0)
    draw(ctx)
    vg.end(ctx, background=(0, 0, 0, 0))
    return np.asarray(ctx.frame_image)


def test_self_overlap_conflation_resolved():
    a1 = _render(1, _overlap_scene)
    a4 = _render(4, _overlap_scene)
    # interior: both paths agree (full coverage)
    assert a1[20, 50, 3] == 1.0 and a4[20, 50, 3] == 1.0
    # boundary row 10 (true coverage 0.5): ss=1 conflates to 1.0,
    # ss=4 recovers the mesh answer
    assert a1[10, 50, 3] > 0.95          # the documented conflation
    assert abs(a4[10, 50, 3] - 0.5) < 0.01


def test_supersample_matches_ss1_on_simple_paths():
    """For non-self-intersecting AA fills the per-subrow rule is linear, so
    ss=4 reproduces ss=1 up to the coverage kernel's near-vertical midpoint
    approximation (|m| < 0.01 threshold trips 4x more often with y scaled;
    bounded error, measured ~1.4e-4 alpha)."""
    def draw(ctx):
        vg.beginPath(ctx)
        vg.circle(ctx, 60, 24, 18)
        vg.fillPath(ctx, vg.color4ub(200, 80, 40, 255), vg.FillFlags.ConvexAA)
        vg.beginPath(ctx)
        vg.moveTo(ctx, 10, 8)
        vg.cubicTo(ctx, 40, 40, 80, 0, 120, 40)
        vg.strokePath(ctx, vg.Colors.White, 3.0, vg.StrokeFlags.RoundRoundAA)

    a1 = _render(1, draw)
    a4 = _render(4, draw)
    np.testing.assert_allclose(a4, a1, atol=5e-4)


def test_supersample_full_feature_smoke():
    """Gradients, clip, scissor, text and even-odd at ss=4 (shading at pixel
    centers, rule/clip at sub-rows)."""
    from tests.test_text import FONT_DATA

    def draw(ctx):
        g = vg.createLinearGradient(ctx, 0, 0, 120, 48, vg.Colors.Red, vg.Colors.Blue)
        vg.beginPath(ctx)
        vg.roundedRect(ctx, 4, 4, 116, 40, 8)
        vg.fillPath(ctx, g, vg.FillFlags.ConvexAA)
        vg.beginClip(ctx, vg.ClipRule.In)
        vg.beginPath(ctx)
        vg.circle(ctx, 64, 24, 15)
        vg.fillPath(ctx, vg.Colors.Black, vg.FillFlags.Convex)
        vg.endClip(ctx)
        vg.beginPath(ctx)
        vg.rect(ctx, 0, 0, 128, 48)
        vg.fillPath(ctx, vg.Colors.Green, vg.FillFlags.Convex)
        vg.resetClip(ctx)
        vg.setScissor(ctx, 0, 0, 64, 48)
        vg.beginPath(ctx)
        vg.rect(ctx, 50, 30, 40, 18)
        vg.fillPath(ctx, vg.color4ub(255, 255, 0, 255), vg.FillFlags.ConvexAA)
        vg.resetScissor(ctx)
        f = vg.createFont(ctx, "sans", FONT_DATA, len(FONT_DATA), 0)
        cfg = vg.makeTextConfig(ctx, f, 14.0, vg.TextAlign.TopLeft, vg.Colors.White)
        vg.text(ctx, cfg, 4, 2, "ss4")

    a1 = _render(1, draw)
    a4 = _render(4, draw)
    # gradient rect, clip circle interior (green), scissored rect edge
    assert a4[24, 64, 1] > 0.9             # green inside clip circle
    assert a4[10, 110, 2] > 0.3            # blue-ish gradient right side
    assert a4[35, 60, 0] > 0.9 and a4[35, 70, 0] < 0.5   # scissor cut at x=64
    # ss=4 resolves the clip-circle boundary at sub-row precision (the ss=1
    # mask is binary per pixel) — differences are confined to that edge band
    diff = np.abs(a4 - a1).max(axis=2)
    ys, xs = np.nonzero(diff > 0.02)
    assert len(ys) < 60, len(ys)
    rr = np.hypot(xs.astype(float) - 64, ys.astype(float) - 24)
    assert np.all(np.abs(rr - 15) < 2.5), "diffs outside the clip edge band"


def test_supersample_even_odd_rule():
    def draw(ctx):
        vg.beginPath(ctx)
        vg.rect(ctx, 10, 10.5, 60, 20)
        vg.rect(ctx, 20, 15.5, 40, 10)    # inner rect -> even-odd hole
        vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConcaveEvenOddAA)

    a4 = _render(4, draw)
    assert a4[12, 15, 3] == 1.0           # ring
    assert a4[20, 40, 3] == 0.0           # even-odd hole
    assert abs(a4[10, 40, 3] - 0.5) < 0.01   # half-covered top row
