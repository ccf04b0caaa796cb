"""Engine AA vs the REFERENCE's mesh semantics (VERDICT r3 item #5).

Each golden shape is rendered twice:
  - by the engine (analytic box-filter coverage -> composite), and
  - by tests/mesh_oracle.py, which reproduces the reference's fringe-mesh
    construction (stroker.cpp) and its GPU raster contract (1 sample per
    pixel center, Gouraud alpha, src-over).

For an isolated straight edge the two are EXACTLY equal: the mesh ramps
alpha linearly from the core ring 0.5 px inside the true edge to 0 at
0.5 px outside, so sampling at a pixel center yields clamp(0.5 - d) — the
same value the analytic box filter integrates.  Differences concentrate
at corners (fan apex vs exact corner integral) and along arc
polygonization; the tolerances below are the MEASURED envelopes plus
slack, so a regression in either the engine's coverage or its stroker
shows up as a tolerance break.  Measured r04 (virtual CPU, float32 engine):
straight-edge bands agree to 0.0000; per-shape maxima 0.02-0.21 (all at
corner fans / miter tips), means <= 2.6e-4.

Known intentional deviation (documented in PARITY.md): the reference's
BUTT caps bleed ~0.5 px beyond the path endpoint (the cap fringe ramps
from alpha A at the endpoint to 0 one fringe BEYOND it,
stroker.cpp:1425-1437), while the engine's butt cap is geometrically
exact.  The butt test measures that band separately.
"""

from __future__ import annotations

import numpy as np
import pytest

import vgtpu as vg
from tests.mesh_oracle import (
    convex_fill_aa_mesh,
    render_meshes,
    stroke_aa_mesh,
)

W, H = 96, 64
BG = (0.15, 0.15, 0.18, 1.0)


def _engine_fill(pts, rgba, ss=1):
    ctx = vg.createContext(vg.ContextConfig(coverage_supersample=ss))
    vg.begin(ctx, 0, W, H, 1.0)
    vg.beginPath(ctx)
    vg.moveTo(ctx, *pts[0])
    for p in pts[1:]:
        vg.lineTo(ctx, *p)
    vg.closePath(ctx)
    vg.fillPath(ctx, vg.color4ub(*rgba), vg.FillFlags.ConvexAA)
    return np.asarray(vg.end(ctx, background=BG))


def _engine_stroke(pts, width, rgba, flags, ss=1):
    ctx = vg.createContext(vg.ContextConfig(coverage_supersample=ss))
    vg.begin(ctx, 0, W, H, 1.0)
    vg.beginPath(ctx)
    vg.moveTo(ctx, *pts[0])
    for p in pts[1:]:
        vg.lineTo(ctx, *p)
    vg.strokePath(ctx, vg.color4ub(*rgba), width, flags)
    return np.asarray(vg.end(ctx, background=BG))


def _engine_stroke_closed(pts, width, rgba, flags, ss=1):
    ctx = vg.createContext(vg.ContextConfig(coverage_supersample=ss))
    vg.begin(ctx, 0, W, H, 1.0)
    vg.beginPath(ctx)
    vg.moveTo(ctx, *pts[0])
    for p in pts[1:]:
        vg.lineTo(ctx, *p)
    vg.closePath(ctx)
    vg.strokePath(ctx, vg.color4ub(*rgba), width, flags)
    return np.asarray(vg.end(ctx, background=BG))


def _rgba01(rgba):
    return tuple(v / 255.0 for v in rgba)


def _compare(engine, mesh, max_tol, mean_tol, label):
    oracle = render_meshes([mesh], W, H, BG)
    diff = np.abs(engine.astype(np.float64) - oracle)
    md, mn = float(diff.max()), float(diff.mean())
    assert md <= max_tol and mn <= mean_tol, (
        f"{label}: max {md:.4f} (tol {max_tol}), mean {mn:.5f} (tol {mean_tol})")
    return md, mn


# ---- convex fills -----------------------------------------------------


def test_fill_rect_fractional():
    """Axis-aligned rect at fractional coords: straight-edge fringes equal
    analytic coverage exactly; only the 4 corners differ (fan apex)."""
    pts = [(10.3, 8.7), (70.6, 8.7), (70.6, 40.2), (10.3, 40.2)]
    col = (220, 120, 40, 255)
    eng = _engine_fill(pts, col)
    m = convex_fill_aa_mesh(pts, _rgba01(col))
    _compare(eng, m, 0.10, 0.0002, "rect fill")


def test_fill_rotated_triangle():
    pts = [(15.2, 50.4), (48.9, 6.3), (82.1, 44.8)]
    col = (40, 160, 220, 255)
    eng = _engine_fill(pts, col)
    m = convex_fill_aa_mesh(pts, _rgba01(col))
    _compare(eng, m, 0.12, 0.0005, "triangle fill")


def test_fill_hexagon():
    a = np.linspace(0, 2 * np.pi, 7)[:-1]
    pts = [(48 + 26 * np.cos(t), 32 + 24 * np.sin(t)) for t in a]
    col = (90, 200, 90, 230)
    eng = _engine_fill(pts, col)
    m = convex_fill_aa_mesh(pts, _rgba01(col))
    _compare(eng, m, 0.04, 0.0004, "hexagon fill")


def test_fill_supersampled_matches_too():
    """ss=4 (conflation-free mode) must sit in the same envelope — for a
    convex shape both engine modes are exact."""
    pts = [(15.2, 50.4), (48.9, 6.3), (82.1, 44.8)]
    col = (40, 160, 220, 255)
    eng = _engine_fill(pts, col, ss=4)
    m = convex_fill_aa_mesh(pts, _rgba01(col))
    _compare(eng, m, 0.12, 0.0005, "triangle fill ss4")


# ---- strokes ----------------------------------------------------------


def test_stroke_square_cap_horizontal():
    """Square caps + straight segment: every edge of the mesh is straight,
    so engine and reference agree to corner terms."""
    pts = [(14.4, 22.6), (78.2, 22.6)]
    col = (240, 240, 240, 255)
    eng = _engine_stroke(pts, 5.0, col, vg.StrokeFlags.SquareMiterAA)
    m = stroke_aa_mesh(pts, False, 5.0, _rgba01(col), cap="square")
    _compare(eng, m, 0.09, 0.0002, "square-cap stroke")


def test_stroke_square_cap_diagonal():
    pts = [(12.7, 12.3), (80.4, 50.9)]
    col = (255, 210, 60, 255)
    eng = _engine_stroke(pts, 3.0, col, vg.StrokeFlags.SquareMiterAA)
    m = stroke_aa_mesh(pts, False, 3.0, _rgba01(col), cap="square")
    _compare(eng, m, 0.15, 0.0006, "diagonal square-cap stroke")


def test_stroke_sharp_miter():
    """Sharp (40 deg) miter: the extrusion-vector join must place the
    spike exactly where the reference's does."""
    pts = [(16.0, 48.0), (50.0, 14.0), (62.0, 52.0)]
    col = (250, 90, 90, 255)
    eng = _engine_stroke(pts, 5.0, col, vg.StrokeFlags.SquareMiterAA)
    m = stroke_aa_mesh(pts, False, 5.0, _rgba01(col), cap="square")
    _compare(eng, m, 0.09, 0.0006, "sharp miter")


def test_stroke_closed_rect_miter():
    pts = [(20.5, 14.5), (74.3, 14.5), (74.3, 48.8), (20.5, 48.8)]
    col = (120, 170, 255, 255)
    eng = _engine_stroke_closed(pts, 4.0, col, vg.StrokeFlags.ButtMiterAA)
    m = stroke_aa_mesh(pts, True, 4.0, _rgba01(col))
    _compare(eng, m, 0.24, 0.0003, "closed rect stroke")


def test_stroke_round_caps():
    """Round caps: both sides polygonize the cap arc with the reference's
    density law, then AA it differently (fringe vs analytic) — the
    envelope is wider on the cap discs."""
    pts = [(20.6, 32.4), (72.9, 32.4)]
    col = (180, 255, 180, 255)
    eng = _engine_stroke(pts, 6.0, col, vg.StrokeFlags.RoundMiterAA)
    m = stroke_aa_mesh(pts, False, 6.0, _rgba01(col), cap="round")
    _compare(eng, m, 0.07, 0.0002, "round caps")


def test_stroke_thin():
    """Thin (sub-fringe) strokes render at fringe width with alpha scaled
    by w^2 — vg.cpp:3416-3420, same law in the engine."""
    pts = [(14.2, 40.7), (80.8, 40.7)]
    col = (255, 255, 255, 255)
    eng = _engine_stroke(pts, 0.5, col, vg.StrokeFlags.SquareMiterAA)
    m = stroke_aa_mesh(pts, False, 0.5, _rgba01(col), cap="square")
    _compare(eng, m, 0.05, 0.0002, "thin stroke")


def test_stroke_butt_cap_deviation_is_localized():
    """KNOWN deviation: reference butt caps bleed ~0.5 px beyond the
    endpoint (cap fringe ramps to zero one fringe PAST it); the engine's
    butt cap ends exactly at the endpoint.  Assert (a) the side bands
    still match tightly and (b) the cap-band deviation is bounded by the
    geometric maximum (~half coverage of the fringe ramp)."""
    pts = [(20.0, 26.5), (76.0, 26.5)]
    col = (240, 240, 240, 255)
    eng = _engine_stroke(pts, 5.0, col, vg.StrokeFlags.ButtMiterAA)
    m = stroke_aa_mesh(pts, False, 5.0, _rgba01(col), cap="butt")
    oracle = render_meshes([m], W, H, BG)
    diff = np.abs(eng.astype(np.float64) - oracle)
    # side band: x well inside the caps
    side = diff[:, 24:72]
    assert side.max() <= 0.01, f"side band max {side.max():.4f}"
    # cap bands: the deviation exists, is < the full ramp, and dies out
    # one pixel past the bleed
    caps = np.concatenate([diff[:, 17:23], diff[:, 73:79]], axis=1)
    assert caps.max() <= 0.45, f"cap band max {caps.max():.4f}"
    away = np.concatenate([diff[:, :16], diff[:, 80:]], axis=1)
    assert away.max() <= 0.01, f"outside cap bleed max {away.max():.4f}"
