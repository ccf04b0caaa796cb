"""Stroke expansion correctness (reference seam: stroker.h:28-66).

Round caps/joins are validated against an exact distance-field oracle
(coverage == dist-to-polyline <= hsw); butt/square/miter/bevel against
geometric predicates on the rendered coverage."""

import numpy as np
import pytest

from vgtpu.core import LineCap, LineJoin
from vgtpu.geometry.stroker import contours_to_edges, stroke_outline
from vgtpu.raster.binning import RasterOp, bin_frame, make_solid_paint
from vgtpu.raster.frame import execute_plan


def render_stroke(pts, closed, width, cap, join, w, h):
    contours = stroke_outline(np.asarray(pts, np.float32), closed, width, cap, join)
    edges = contours_to_edges(contours)
    op = RasterOp(edges=edges, paint=make_solid_paint(np.array([1, 1, 1, 1], np.float32)))
    plan = bin_frame([op], w, h)
    return np.asarray(execute_plan(plan, background=(0, 0, 0, 0)))[..., 3]


def dist_to_polyline(pts, closed, xs, ys):
    pts = np.asarray(pts, np.float64)
    segs = list(zip(pts[:-1], pts[1:]))
    if closed:
        segs.append((pts[-1], pts[0]))
    best = np.full(np.broadcast(xs, ys).shape, np.inf)
    for a, b in segs:
        ab = np.asarray(b) - np.asarray(a)
        denom = max(float(ab @ ab), 1e-12)
        t = np.clip(((xs - a[0]) * ab[0] + (ys - a[1]) * ab[1]) / denom, 0, 1)
        d = np.hypot(xs - (a[0] + t * ab[0]), ys - (a[1] + t * ab[1]))
        best = np.minimum(best, d)
    return best


def round_stroke_oracle(pts, closed, width, w, h, samples=8):
    """Supersampled coverage of the true round-cap/round-join stroke region."""
    off = (np.arange(samples) + 0.5) / samples
    cov = np.zeros((h, w))
    for oy in off:
        for ox in off:
            xs = np.arange(w)[None, :] + ox
            ys = np.arange(h)[:, None] + oy
            d = dist_to_polyline(pts, closed, np.broadcast_to(xs, (h, w)), np.broadcast_to(ys, (h, w)))
            cov += d <= width / 2
    return cov / samples**2


def test_butt_cap_line_is_exact_rectangle():
    got = render_stroke([(10, 16), (54, 16)], False, 8.0, LineCap.Butt, LineJoin.Miter, 64, 32)
    # interior exact
    assert got[16, 30] == 1.0
    assert got[12, 30] == 1.0  # y=12 inside [12,20]
    assert got[11, 30] == 0.0  # just outside
    assert got[16, 9] == 0.0   # left of cap (pixel 9 covers [9,10] -> 0? edge at x=10)
    assert got[16, 10] == 1.0  # first covered column
    # half-covered boundary row behavior: geometry at integer coords -> crisp
    assert got[16, 54] == 0.0


def test_square_cap_extends_by_half_width():
    got = render_stroke([(20, 16), (44, 16)], False, 8.0, LineCap.Square, LineJoin.Miter, 64, 32)
    assert got[16, 17] == 1.0  # extended region [16,48]
    assert got[16, 15] == 0.0
    assert got[16, 47] == 1.0
    assert got[16, 48] == 0.0


@pytest.mark.parametrize("closed", [False, True])
def test_round_caps_joins_match_distance_oracle(closed):
    """Loose end-to-end check vs the TRUE circular stroke region: the outline
    approximates arcs with the reference's density law (sagitta <= ~tol, and
    the reference cap fan is one interval coarser than the arc law —
    stroker.cpp:1014 ceil(pi/da) points, not intervals — which we mirror), so
    a thin band of arc pixels legitimately deviates."""
    pts = [(12.3, 12.7), (50.2, 18.4), (40.1, 44.6), (15.8, 38.2)]
    got = render_stroke(pts, closed, 9.0, LineCap.Round, LineJoin.Round, 64, 64)
    want = round_stroke_oracle(pts, closed, 9.0, 64, 64)
    d = np.abs(got - want)
    assert d.mean() < 6e-3
    assert d.max() < 0.5
    assert (d > 0.15).sum() <= 40


@pytest.mark.parametrize("closed", [False, True])
def test_round_stroke_raster_matches_outline_polygon_exactly(closed):
    """Tight check: rendered coverage == supersampled coverage of the *same*
    outline polygon (separates raster exactness from arc approximation)."""
    from vgtpu.oracle import coverage_oracle

    pts = [(12.3, 12.7), (50.2, 18.4), (40.1, 44.6), (15.8, 38.2)]
    contours = stroke_outline(np.asarray(pts, np.float32), closed, 9.0,
                              LineCap.Round, LineJoin.Round)
    edges = contours_to_edges(contours)
    got = render_stroke(pts, closed, 9.0, LineCap.Round, LineJoin.Round, 64, 64)
    want = coverage_oracle(edges, 64, 64, fill_rule=0, samples=16)
    d = np.abs(got - want)
    assert d.mean() < 1.5e-3
    assert (d > 0.1).sum() <= 8  # conflation pixels at outline self-overlaps


def test_round_cap_points_on_circle():
    pts = np.array([(20, 20), (44, 20)], np.float32)
    (contour,) = stroke_outline(pts, False, 10.0, LineCap.Round, LineJoin.Round)
    # every outline point is at distance hsw from one of the two endpoints
    d0 = np.hypot(contour[:, 0] - 20, contour[:, 1] - 20)
    d1 = np.hypot(contour[:, 0] - 44, contour[:, 1] - 20)
    assert np.all((np.abs(d0 - 5.0) < 1e-3) | (np.abs(d1 - 5.0) < 1e-3))


def test_miter_corner_fills_point():
    # right angle at (32,16): miter tip extends to (36,12) for width 8
    got = render_stroke([(8, 16), (32, 16), (32, 40)], False, 8.0, LineCap.Butt, LineJoin.Miter, 64, 48)
    assert got[13, 34] == 1.0   # inside miter tip square
    assert got[13, 37] == 0.0   # beyond tip
    assert got[18, 30] == 1.0   # interior


def test_bevel_corner_cuts_tip():
    got = render_stroke([(8, 16), (32, 16), (32, 40)], False, 8.0, LineCap.Butt, LineJoin.Bevel, 64, 48)
    assert got[13, 34] < 0.9    # miter tip region is cut
    # bevel edge runs from (36,16) to (32,12): its midpoint (34,14) is on the boundary
    assert 0.1 < got[14, 33] <= 1.0
    assert got[18, 30] == 1.0


def test_closed_ring_has_hole():
    sq = [(16, 16), (48, 16), (48, 48), (16, 48)]
    got = render_stroke(sq, True, 6.0, LineCap.Butt, LineJoin.Miter, 64, 64)
    assert got[32, 32] == 0.0          # hole
    assert got[16, 32] == 1.0          # on the stroke centerline
    assert got[32, 5] == 0.0           # outside
    # stroke band is [13,19] around each side
    assert got[14, 32] == 1.0
    assert got[20, 32] == 0.0


def test_inner_corner_overlap_stays_solid():
    # wide stroke over a shallow joint: the outline meets at the single
    # inner-corner intersection point (stroker.cpp:1099) which clips a sliver
    # of the capsule-union on the inner side — same artifact as the reference's
    # quad strip.  The region up to the inner corner must stay solid; nothing
    # may go negative/hollow.
    pts = [(20, 30), (32, 26), (44, 30)]
    got = render_stroke(pts, False, 16.0, LineCap.Butt, LineJoin.Miter, 64, 64)
    assert got[30, 32] > 0.999   # interior
    assert got[33, 32] > 0.999   # inside inner corner (y < 34.43)
    assert got[28, 26] > 0.999   # first segment band
    assert got.min() >= 0.0 and np.isfinite(got).all()


def test_degenerate_two_point_closed():
    # duplicate-ish closed polyline should not crash or emit NaNs
    got = render_stroke([(20, 20), (20.5, 20.2)], True, 4.0, LineCap.Butt, LineJoin.Miter, 32, 32)
    assert np.isfinite(got).all()
