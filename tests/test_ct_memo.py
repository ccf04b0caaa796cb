"""Color-tile resample memo (Context._fill_textures).

In a steady app loop the texture content (text quads, pattern fills) is
frame-static even while solid-paint geometry animates; the per-frame device
resample then produces bit-identical color tiles.  The memo skips the
sampler dispatch when the FULL sampling-plan payload (group params/colors/ct
ids, tile mask, image generations) is unchanged, and must miss — never
serve stale tiles — when any texture-visible input changes (text content,
pattern matrix, image pixels via generation bump).
"""

from __future__ import annotations

import numpy as np
import pytest

import vgtpu as vg
from tests.fontdata import FONT_DATA

W, H = 320, 160
BG = (0.1, 0.1, 0.12, 1.0)


def _make_ctx():
    ctx = vg.createContext()
    font = (vg.createFont(ctx, "sans", FONT_DATA, len(FONT_DATA), 0)
            if FONT_DATA is not None else None)
    return ctx, font


def _frame(ctx, font, *, k=0, label="hello", img=None, img_mat=None):
    vg.begin(ctx, 0, W, H, 1.0)
    # animated solid geometry (moves every frame; no texture dependence)
    vg.beginPath(ctx)
    vg.circle(ctx, 60 + 3 * k, 60, 30)
    vg.fillPath(ctx, vg.color4ub(240, 80 + 5 * k, 40, 255), vg.FillFlags.ConvexAA)
    if img is not None:
        m = img_mat if img_mat is not None else (1, 0, 0, 1, 150, 20)
        p = vg.createImagePattern(ctx, m[4], m[5], 64, 64, 0.0, img)
        vg.beginPath(ctx)
        vg.rect(ctx, 150, 20, 64, 64)
        vg.fillPath(ctx, p, vg.color4ub(255, 255, 255, 255), vg.FillFlags.ConvexAA)
    if font is not None:
        cfg = vg.makeTextConfig(ctx, "sans", 20.0,
                                vg.TextAlign.Left | vg.TextAlign.Top,
                                vg.color4ub(255, 255, 255, 255))
        vg.text(ctx, cfg, 30, 110, label)
    vg.end(ctx, background=BG)
    return np.asarray(ctx.frame_image)


def _fresh(**kw):
    ctx, font = _make_ctx()
    if kw.pop("with_img", False):
        data = (np.random.RandomState(7).rand(64, 64, 4) * 255).astype(np.uint8)
        img = vg.createImage(ctx, 64, 64, 0, data)
        kw["img"] = img
    return _frame(ctx, font, **kw)


@pytest.mark.skipif(FONT_DATA is None, reason="no system font found")
def test_memo_hits_on_static_text_and_stays_exact():
    ctx, font = _make_ctx()
    for k in range(3):
        _frame(ctx, font, k=k)
    ctx.profiler.reset()
    out = _frame(ctx, font, k=3)
    assert ctx.profiler.counters.get("ct_memo_hits", 0) >= 1
    ref = _fresh(k=3)
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.skipif(FONT_DATA is None, reason="no system font found")
def test_memo_misses_on_text_change():
    ctx, font = _make_ctx()
    for k in range(3):
        _frame(ctx, font, k=k)
    ctx.profiler.reset()
    out = _frame(ctx, font, k=3, label="WORLD")
    assert ctx.profiler.counters.get("ct_memo_hits", 0) == 0
    ref = _fresh(k=3, label="WORLD")
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_memo_misses_on_image_update():
    ctx, _ = _make_ctx()
    rs = np.random.RandomState(7)
    data = (rs.rand(64, 64, 4) * 255).astype(np.uint8)
    img = vg.createImage(ctx, 64, 64, 0, data)
    for k in range(3):
        _frame(ctx, None, k=k, img=img)
    # updateImage bumps the generation -> key miss -> fresh resample
    data2 = (rs.rand(64, 64, 4) * 255).astype(np.uint8)
    vg.updateImage(ctx, img, 0, 0, 64, 64, data2)
    ctx.profiler.reset()
    out = _frame(ctx, None, k=3, img=img)
    assert ctx.profiler.counters.get("ct_memo_hits", 0) == 0

    ctx2, _ = _make_ctx()
    img2 = vg.createImage(ctx2, 64, 64, 0, data2)
    ref = _frame(ctx2, None, k=3, img=img2)
    np.testing.assert_allclose(out, ref, atol=2e-5)
