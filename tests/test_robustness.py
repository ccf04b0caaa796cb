"""Degenerate-input robustness: the reference warns-and-skips
(SURVEY.md §5 failure handling); we must never crash or emit NaNs."""

import numpy as np
import pytest

import vgtpu as vg


def make_ctx(w=64, h=64):
    ctx = vg.createContext()
    vg.begin(ctx, 0, w, h, 1.0)
    return ctx


def finite_frame(ctx):
    img = np.asarray(vg.end(ctx, background=(0, 0, 0, 0)))
    assert np.isfinite(img).all()
    return img


def test_empty_frame():
    ctx = make_ctx()
    img = finite_frame(ctx)
    assert img[..., 3].max() == 0.0


def test_fill_without_path():
    ctx = make_ctx()
    vg.beginPath(ctx)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
    finite_frame(ctx)


def test_single_point_subpath():
    ctx = make_ctx()
    vg.beginPath(ctx)
    vg.moveTo(ctx, 10, 10)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
    vg.strokePath(ctx, vg.Colors.White, 2.0, vg.StrokeFlags.ButtMiterAA)
    finite_frame(ctx)


def test_zero_width_stroke():
    ctx = make_ctx()
    vg.beginPath(ctx)
    vg.moveTo(ctx, 5, 32)
    vg.lineTo(ctx, 60, 32)
    vg.strokePath(ctx, vg.Colors.White, 0.0, vg.StrokeFlags.ButtMiterAA)
    finite_frame(ctx)   # alpha-law drives it to zero, no NaNs


def test_degenerate_rect_and_circle():
    ctx = make_ctx()
    vg.beginPath(ctx)
    vg.rect(ctx, 10, 10, 0.0, 20)     # zero width -> skipped (path.cpp:277)
    vg.circle(ctx, 30, 30, 0.0)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConcaveNonZeroAA)
    finite_frame(ctx)


def test_collinear_and_repeated_points():
    ctx = make_ctx()
    vg.beginPath(ctx)
    vg.moveTo(ctx, 10, 10)
    vg.lineTo(ctx, 10, 10)
    vg.lineTo(ctx, 30, 10)
    vg.lineTo(ctx, 50, 10)            # collinear
    vg.lineTo(ctx, 50.0000001, 10)    # sub-epsilon step
    vg.strokePath(ctx, vg.Colors.White, 3.0, vg.StrokeFlags.RoundRoundAA)
    img = finite_frame(ctx)
    assert img[10, 30, 3] > 0.9


def test_offscreen_geometry():
    ctx = make_ctx()
    vg.beginPath(ctx)
    vg.rect(ctx, -500, -500, 100, 100)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
    vg.beginPath(ctx)
    vg.rect(ctx, 1000, 1000, 50, 50)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
    img = finite_frame(ctx)
    assert img[..., 3].max() == 0.0


def test_huge_coordinates():
    ctx = make_ctx()
    vg.beginPath(ctx)
    vg.moveTo(ctx, -1e6, 32)
    vg.lineTo(ctx, 1e6, 33)
    vg.lineTo(ctx, 1e6, 40)
    vg.closePath(ctx)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConcaveNonZeroAA)
    finite_frame(ctx)


def test_clip_without_shapes_then_draw():
    ctx = make_ctx()
    vg.beginClip(ctx, vg.ClipRule.In)
    vg.endClip(ctx)                   # empty clip -> reset (no shapes)
    vg.beginPath(ctx)
    vg.rect(ctx, 8, 8, 40, 40)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
    img = finite_frame(ctx)
    assert img[20, 20, 3] == 1.0


def test_many_subpaths():
    ctx = make_ctx(128, 128)
    vg.beginPath(ctx)
    for i in range(64):
        vg.rect(ctx, (i % 8) * 16 + 2, (i // 8) * 16 + 2, 10, 10)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConcaveNonZeroAA)
    img = finite_frame(ctx)
    assert img[7, 7, 3] == 1.0
    assert img[119, 119, 3] == 1.0


def test_svg_opacity_attributes():
    from vgtpu.scenes.svg import load_svg

    doc = load_svg('<svg width="10" height="10">'
                   '<path d="M0 0 H10 V10 Z" fill="#ff0000" fill-opacity="0.5" opacity="0.5"/>'
                   '</svg>')
    assert vg.colorGetAlpha(doc.paths[0].fill) == int(255 * 0.25)
