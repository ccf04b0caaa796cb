"""Color packing, flag encodings, transform math (reference: vg.h:80-250,
vg_util.cpp:14-33)."""

import numpy as np
import pytest

from vgtpu import core


def test_color_packing_roundtrip():
    c = core.color4ub(10, 20, 30, 40)
    assert core.colorGetRed(c) == 10
    assert core.colorGetGreen(c) == 20
    assert core.colorGetBlue(c) == 30
    assert core.colorGetAlpha(c) == 40


def test_color_constants_match_reference():
    # vg.h:114-125
    assert core.color4ub(255, 0, 0, 255) == core.Colors.Red
    assert core.color4ub(0, 255, 0, 255) == core.Colors.Green
    assert core.color4ub(0, 0, 255, 255) == core.Colors.Blue
    assert core.color4ub(255, 255, 255, 255) == core.Colors.White
    assert core.color4ub(0, 0, 0, 255) == core.Colors.Black


def test_color_set_alpha():
    c = core.color4ub(1, 2, 3, 200)
    c2 = core.colorSetAlpha(c, 7)
    assert core.colorGetAlpha(c2) == 7
    assert core.colorGetRed(c2) == 1


def test_stroke_flags_encoding():
    # VG_STROKE_FLAGS bit layout (vg.h:176-179)
    f = core.stroke_flags(core.LineCap.Square, core.LineJoin.Bevel, True)
    assert core.stroke_flags_line_cap(f) == core.LineCap.Square
    assert core.stroke_flags_line_join(f) == core.LineJoin.Bevel
    assert core.stroke_flags_aa(f)
    assert core.StrokeFlags.SquareBevelAA == f


def test_fill_flags_encoding():
    f = core.fill_flags(core.PathType.Concave, core.FillRule.EvenOdd, True)
    assert core.fill_flags_path_type(f) == core.PathType.Concave
    assert core.fill_flags_rule(f) == core.FillRule.EvenOdd
    assert core.fill_flags_aa(f)
    assert core.FillFlags.ConcaveEvenOddAA == f
    assert core.FillFlags.Concave == core.FillFlags.ConcaveNonZero


def test_xform_compose_invert():
    rng = np.random.default_rng(0)
    for _ in range(20):
        m = core.xform_multiply(
            core.xform_rotate(rng.uniform(-3, 3)),
            core.xform_multiply(
                core.xform_scale(rng.uniform(0.1, 4), rng.uniform(0.1, 4)),
                core.xform_translate(rng.uniform(-100, 100), rng.uniform(-100, 100)),
            ),
        )
        inv = core.xform_invert(m)
        pts = rng.uniform(-50, 50, (16, 2)).astype(np.float32)
        back = core.xform_points(inv, core.xform_points(m, pts))
        np.testing.assert_allclose(back, pts, atol=1e-3)


def test_xform_order():
    # translate-then-scale vs scale-then-translate
    m1 = core.xform_multiply(core.xform_scale(2, 2), core.xform_translate(1, 0))
    x, y = core.xform_point(m1, 0, 0)
    assert (x, y) == (2.0, 0.0)
    m2 = core.xform_multiply(core.xform_translate(1, 0), core.xform_scale(2, 2))
    x, y = core.xform_point(m2, 0, 0)
    assert (x, y) == (1.0, 0.0)


def test_avg_scale():
    m = core.xform_multiply(core.xform_scale(2, 4), core.xform_rotate(0.7))
    assert core.xform_average_scale(m) == pytest.approx(3.0, abs=1e-5)
    m2 = core.xform_scale(2, 4)
    assert core.xform_average_scale(m2) == pytest.approx(3.0, abs=1e-5)
