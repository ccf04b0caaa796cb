"""SVG loader, benchmark scenes, vgpp wrapper, and the five BASELINE.json
capability tiers as golden-image regression tests."""

from pathlib import Path

import numpy as np
import pytest

import vgtpu as vg
from vgtpu.helpers.vgpp import Renderer
from vgtpu.scenes.svg import load_svg, render_svg
from vgtpu.scenes.tiger import tiger_svg_text

GOLDEN_DIR = Path(__file__).parent / "goldens"


def _check_golden(name: str, img_u8: np.ndarray, tol=2.0):
    """Compare against a committed golden.  A missing golden FAILS under
    CI=1 / VGTPU_STRICT_GOLDENS=1 (a deleted golden must not silently turn a
    regression test into a no-op); interactively it is (re)created once."""
    import os

    GOLDEN_DIR.mkdir(exist_ok=True)
    path = GOLDEN_DIR / f"{name}.npz"
    if not path.exists():
        if os.environ.get("CI") or os.environ.get("VGTPU_STRICT_GOLDENS"):
            pytest.fail(f"golden {name} missing (strict mode refuses to regenerate)")
        np.savez_compressed(path, img=img_u8)
        pytest.skip(f"golden {name} created")
    want = np.load(path)["img"]
    assert want.shape == img_u8.shape
    diff = np.abs(want.astype(np.int32) - img_u8.astype(np.int32))
    assert diff.mean() < tol, f"golden {name}: mean diff {diff.mean()}"
    assert (diff > 32).mean() < 0.01, f"golden {name}: too many changed pixels"


def _ctx(w, h):
    ctx = vg.createContext()
    vg.begin(ctx, 0, w, h, 1.0)
    return ctx


# ---- SVG loader ------------------------------------------------------------

def test_svg_parse_basic():
    doc = load_svg(
        '<svg width="100" height="50">'
        '<path d="M10 10 L90 10 L90 40 Z" fill="#ff0000"/>'
        '<g transform="translate(5,5)">'
        '<path d="M0 0 C10 0 10 10 0 10 Z" fill="none" stroke="rgb(0,0,255)" stroke-width="2"/>'
        "</g></svg>"
    )
    assert doc.width == 100 and doc.height == 50
    assert len(doc.paths) == 2
    assert doc.paths[0].fill == vg.color4ub(255, 0, 0, 255)
    assert doc.paths[1].fill is None
    assert doc.paths[1].stroke == vg.color4ub(0, 0, 255, 255)
    np.testing.assert_allclose(doc.paths[1].transform[4:6], [5, 5])


def test_svg_renders():
    ctx = _ctx(100, 50)
    doc = load_svg('<svg width="100" height="50">'
                   '<path d="M10 10 H90 V40 H10 Z" fill="#00ff00"/></svg>')
    render_svg(ctx, doc)
    vg.end(ctx, background=(0, 0, 0, 1))
    img = np.asarray(ctx.frame_image)
    assert img[25, 50, 1] > 0.9


def test_svg_arc_command():
    ctx = _ctx(100, 100)
    doc = load_svg('<svg width="100" height="100">'
                   '<path d="M50 10 A40 40 0 1 1 49.9 10 Z" fill="#ffffff"/></svg>')
    render_svg(ctx, doc)
    vg.end(ctx, background=(0, 0, 0, 1))
    img = np.asarray(ctx.frame_image)
    assert img[50, 50, 0] > 0.9     # circle interior
    assert img[12, 12, 0] < 0.1     # corner outside


def test_tiger_scene_statistics():
    doc = load_svg(tiger_svg_text())
    assert len(doc.paths) == 240
    n_curves = sum(p.d.count("C") for p in doc.paths)
    assert n_curves > 1500


def test_real_tiger_asset_renders():
    """The real Ghostscript tiger, WHEN the asset is provided: unsourceable
    in this zero-egress environment (PARITY.md), so the test skips unless
    assets/tiger.svg exists — the moment it lands, the parity claim becomes
    concrete: the scene must load through the hook, render non-trivially,
    and reproduce a committed CRC (assets/tiger.crc, written on first run)."""
    import os
    import zlib

    from vgtpu.scenes.tiger import ASSET, draw_tiger, load_tiger

    if not os.path.exists(ASSET):
        pytest.skip("assets/tiger.svg not provided (see PARITY.md)")
    doc = load_tiger()
    assert len(doc.paths) > 100          # the real tiger has 240 paths
    ctx = vg.createContext()
    vg.begin(ctx, 0, 640, 640, 1.0)
    draw_tiger(ctx, 20, 20, 0.55)
    img = np.asarray(vg.end(ctx, background=(1, 1, 1, 1)))
    assert np.isfinite(img).all()
    # non-trivial coverage: the tiger body must darken a real pixel area
    dark = (img[..., :3].sum(axis=-1) < 1.5).mean()
    assert dark > 0.05
    crc = zlib.crc32((img * 255).astype(np.uint8).tobytes())
    crc_path = ASSET.replace(".svg", ".crc")
    if os.path.exists(crc_path):
        committed = int(open(crc_path).read().strip())
        assert crc == committed, (
            f"real-tiger render changed: crc {crc} != committed {committed}")
    else:
        with open(crc_path, "w") as f:
            f.write(str(crc))


# ---- vgpp wrapper ----------------------------------------------------------

def test_vgpp_renderer_roundtrip():
    r = Renderer()
    r.begin_frame(128, 64)
    r.begin_path().rounded_rect(10, 10, 60, 40, 8).fill(vg.color4ub(255, 0, 0, 255))
    shape = r.create_shape()
    with shape:
        vg.beginPath(r.ctx)
        vg.circle(r.ctx, 100, 32, 20)
        vg.fillPath(r.ctx, vg.Colors.Blue, vg.FillFlags.ConvexAA)
    r.submit(shape)
    r.end_frame(background=(1, 1, 1, 1))
    img = np.asarray(r.ctx.frame_image)
    assert img[30, 30, 0] > 0.9    # red rect
    assert img[32, 100, 2] > 0.9   # blue circle via shape


# ---- the five capability tiers (BASELINE.json configs) ---------------------

def test_tier1_flatten_polyline_stroke_no_aa():
    ctx = _ctx(256, 128)
    for i in range(6):
        vg.beginPath(ctx)
        vg.roundedRect(ctx, 10 + i * 40, 16, 34, 96, 6 + i)
        vg.strokePath(ctx, vg.Colors.White, 3.0, vg.StrokeFlags.ButtMiter)
    vg.end(ctx, background=(0, 0, 0, 1))
    _check_golden("tier1_rects_noaa", np.asarray(vg.Context.readback_u8(ctx)))


def test_tier2_curves_aa_joins_caps():
    ctx = _ctx(256, 128)
    caps = [vg.LineCap.Butt, vg.LineCap.Round, vg.LineCap.Square]
    joins = [vg.LineJoin.Miter, vg.LineJoin.Round, vg.LineJoin.Bevel]
    for i, (cap, join) in enumerate(zip(caps, joins)):
        vg.beginPath(ctx)
        vg.moveTo(ctx, 20 + i * 80, 100)
        vg.cubicTo(ctx, 40 + i * 80, 20, 60 + i * 80, 180, 80 + i * 80, 30)
        vg.strokePath(ctx, vg.colorHSB(i / 3, 0.8, 1.0), 8.0,
                      vg.stroke_flags(cap, join, True))
    vg.end(ctx, background=(0, 0, 0, 1))
    _check_golden("tier2_curves_aa", np.asarray(vg.Context.readback_u8(ctx)))


def test_tier3_concave_fills_winding():
    ctx = _ctx(256, 128)
    for rule, x0 in ((vg.FillFlags.ConcaveNonZeroAA, 0), (vg.FillFlags.ConcaveEvenOddAA, 128)):
        vg.beginPath(ctx)
        ang = -np.pi / 2 + np.arange(5) * (4 * np.pi / 5)
        vg.moveTo(ctx, x0 + 64 + 50 * np.cos(ang[0]), 64 + 50 * np.sin(ang[0]))
        for a in ang[1:]:
            vg.lineTo(ctx, x0 + 64 + 50 * np.cos(a), 64 + 50 * np.sin(a))
        vg.closePath(ctx)
        vg.fillPath(ctx, vg.color4ub(255, 160, 20, 255), rule)
    vg.end(ctx, background=(0, 0, 0, 1))
    img = np.asarray(vg.Context.readback_u8(ctx))
    _check_golden("tier3_winding", img)


def test_tier4_text_atlas():
    from tests.test_text import FONT_DATA

    ctx = _ctx(256, 64)
    f = vg.createFont(ctx, "sans", FONT_DATA, len(FONT_DATA), 0)
    cfg = vg.makeTextConfig(ctx, f, 24.0, vg.TextAlign.MiddleLeft, vg.Colors.White)
    vg.text(ctx, cfg, 8, 32, "Glyph cache AA")
    vg.end(ctx, background=(0, 0, 0, 1))
    _check_golden("tier4_text", np.asarray(vg.Context.readback_u8(ctx)))


def test_tier5_full_frame():
    ctx = _ctx(512, 256)
    cl = vg.createCommandList(ctx, vg.CommandListFlags.Cacheable)
    vg.beginCommandList(ctx, cl)
    g = vg.createRadialGradient(ctx, 128, 128, 20, 100,
                                vg.color4ub(255, 255, 200, 255), vg.color4ub(180, 40, 0, 255))
    vg.beginPath(ctx)
    vg.circle(ctx, 128, 128, 100)
    vg.fillPath(ctx, g, vg.FillFlags.ConvexAA)
    vg.endCommandList(ctx)
    vg.submitCommandList(ctx, cl)

    vg.beginClip(ctx, vg.ClipRule.Out)
    vg.beginPath(ctx)
    vg.circle(ctx, 380, 128, 60)
    vg.fillPath(ctx, vg.Colors.Black, vg.FillFlags.Convex)
    vg.endClip(ctx)
    vg.beginPath(ctx)
    vg.rect(ctx, 280, 28, 200, 200)
    vg.fillPath(ctx, vg.color4ub(30, 120, 220, 255), vg.FillFlags.ConvexAA)
    vg.resetClip(ctx)

    from vgtpu.scenes.demo_ui import draw_color_wheel

    draw_color_wheel(ctx, 380, 128, 50, 30)
    vg.end(ctx, background=(0.1, 0.1, 0.1, 1))
    _check_golden("tier5_full", np.asarray(vg.Context.readback_u8(ctx)))


def test_svg_clip_path():
    """<clipPath> defs + clip-path=url(#id) route through the engine clip."""
    doc = load_svg(
        '<svg width="64" height="64">'
        '<defs><clipPath id="c"><path d="M0 0 H32 V64 H0 Z"/></clipPath></defs>'
        '<path clip-path="url(#c)" d="M8 8 H56 V56 H8 Z" fill="#00ff00"/>'
        "</svg>"
    )
    assert "c" in doc.clips and doc.paths[0].clip_id == "c"
    ctx = _ctx(64, 64)
    render_svg(ctx, doc)
    vg.end(ctx, background=(0, 0, 0, 1))
    img = np.asarray(ctx.frame_image)
    assert img[32, 16, 1] > 0.9    # left half: green (inside clip)
    assert img[32, 48, 1] < 0.1    # right half: clipped away


def test_real_matplotlib_logo_renders():
    import glob

    srcs = glob.glob("/root/.cache/uv/**/mpl-data/images/matplotlib.svg", recursive=True)
    if not srcs:
        pytest.skip("matplotlib svg not present")
    doc = load_svg(srcs[0])
    assert len(doc.paths) > 10
    ctx = _ctx(128, 128)
    vg.transformScale(ctx, 128 / max(doc.width, 1), 128 / max(doc.height, 1))
    render_svg(ctx, doc)
    vg.end(ctx, background=(1, 1, 1, 1))
    img = np.asarray(ctx.frame_image)
    # the logo has colored wedges: some saturated non-gray pixels must exist
    sat = np.abs(img[..., 0] - img[..., 1]) + np.abs(img[..., 1] - img[..., 2])
    assert (sat > 0.4).sum() > 100
