"""Static-prefix layer memo (api/context._layer_split): the device-resident
analogue of the reference's cached-list replay (clCacheRender,
vg.cpp:5845-6120).  When the leading run of recorded ops is bit-identical
across frames, the prefix bakes once into resident framebuffer tiles and
later frames bin + composite only the dynamic suffix over them.  Every test
asserts pixel equality against a context with layer_memo disabled (the full
single-plan path)."""

from __future__ import annotations

import numpy as np
import pytest

import vgtpu as vg

W, H = 320, 160
BG = (0.10, 0.12, 0.14, 1.0)


def _static_prefix(ctx, n=20):
    """n deterministic draws: the stand-in for cached artwork."""
    for i in range(n):
        vg.beginPath(ctx)
        vg.circle(ctx, 20 + 14 * (i % 10), 30 + 40 * (i // 10), 9 + (i % 3))
        vg.fillPath(ctx, vg.color4ub(40 + 10 * i, 200 - 7 * i, 90, 200),
                    vg.FillFlags.ConvexAA)


def _ui(ctx, t: float):
    vg.beginPath(ctx)
    vg.rect(ctx, 30 + 50 * t, 100, 60, 30)
    vg.fillPath(ctx, vg.color4ub(250, 210, 60, 220), vg.FillFlags.ConvexAA)
    vg.beginPath(ctx)
    vg.moveTo(ctx, 200, 20 + 30 * t)
    vg.lineTo(ctx, 280, 60)
    vg.strokePath(ctx, vg.color4ub(90, 140, 250, 255), 3.0,
                  vg.StrokeFlags.ButtMiterAA)


def _render(ctx, draw, bg=BG):
    vg.begin(ctx, 0, W, H, 1.0)
    draw(ctx)
    vg.end(ctx, background=bg)
    return np.asarray(ctx.frame_image)


def _ctx(layer=True):
    cfg = vg.ContextConfig(layer_memo=layer)
    return vg.createContext(cfg)


def test_layer_matches_full_path():
    """Animated suffix over a stable prefix: layered frames equal the
    single-plan render, and the layer actually engages."""
    ctx = _ctx(True)
    ref = _ctx(False)
    for k, t in enumerate((0.0, 0.2, 0.4, 0.6)):
        draw = lambda c, t=t: (_static_prefix(c), _ui(c, t))
        img = _render(ctx, draw)
        exp = _render(ref, draw)
        np.testing.assert_allclose(img, exp, atol=1e-6, err_msg=f"frame {k}")
    assert ctx.profiler.counters.get("layer_hits", 0) >= 3
    assert ctx.profiler.counters.get("layer_bakes", 0) == 1
    assert ctx._layer_used >= ctx.cfg.layer_min_prefix


def test_layer_prefix_with_balanced_clip():
    """Clips fully inside the prefix (committed AND reset) stay in it."""
    def prefix(c):
        _static_prefix(c, 18)
        vg.beginClip(c, 0)
        vg.beginPath(c)
        vg.rect(c, 120, 20, 100, 80)
        vg.fillPath(c, vg.Colors.White, vg.FillFlags.ConvexAA)
        vg.endClip(c)
        vg.beginPath(c)
        vg.circle(c, 170, 60, 45)
        vg.fillPath(c, vg.color4ub(250, 120, 40, 255), vg.FillFlags.ConvexAA)
        vg.resetClip(c)

    ctx, ref = _ctx(True), _ctx(False)
    for t in (0.0, 0.3, 0.6):
        draw = lambda c, t=t: (prefix(c), _ui(c, t))
        np.testing.assert_allclose(_render(ctx, draw), _render(ref, draw),
                                   atol=1e-6)
    assert ctx.profiler.counters.get("layer_hits", 0) >= 2


def test_layer_cut_never_crosses_active_clip():
    """A clip committed in the stable region but reset only after the
    dynamic draws: the cut shrinks below the clip, pixels stay equal."""
    def draw(c, t):
        _static_prefix(c, 20)
        vg.beginClip(c, 0)
        vg.beginPath(c)
        vg.rect(c, 100, 10, 140, 120)
        vg.fillPath(c, vg.Colors.White, vg.FillFlags.ConvexAA)
        vg.endClip(c)
        # dynamic draw INSIDE the clip group
        vg.beginPath(c)
        vg.circle(c, 150 + 40 * t, 70, 30)
        vg.fillPath(c, vg.color4ub(60, 220, 160, 255), vg.FillFlags.ConvexAA)
        vg.resetClip(c)

    ctx, ref = _ctx(True), _ctx(False)
    for t in (0.0, 0.4, 0.8):
        np.testing.assert_allclose(
            _render(ctx, lambda c, t=t: draw(c, t)),
            _render(ref, lambda c, t=t: draw(c, t)), atol=1e-6)
    # the cut must sit at or below the last clean point (20 prefix draws)
    assert ctx._layer_used <= 20


def test_layer_invalidates_on_prefix_paint_change():
    """A paint-value change inside the baked prefix re-bakes the layer
    (its keys include paint values) — pixels track the full path."""
    def draw(c, col, t):
        vg.beginPath(c)
        vg.rect(c, 5, 5, 80, 60)
        vg.fillPath(c, vg.color4ub(*col), vg.FillFlags.ConvexAA)
        _static_prefix(c, 18)
        _ui(c, t)

    ctx, ref = _ctx(True), _ctx(False)
    seq = [((200, 40, 40, 255), 0.0), ((200, 40, 40, 255), 0.3),
           ((200, 40, 40, 255), 0.5), ((40, 40, 200, 255), 0.7),
           ((40, 40, 200, 255), 0.9)]
    for col, t in seq:
        np.testing.assert_allclose(
            _render(ctx, lambda c: draw(c, col, t)),
            _render(ref, lambda c: draw(c, col, t)), atol=1e-6)


def test_layer_background_change_rebakes():
    ctx, ref = _ctx(True), _ctx(False)
    for bg, t in ((BG, 0.0), (BG, 0.2), ((0.3, 0.1, 0.1, 1.0), 0.4),
                  ((0.3, 0.1, 0.1, 1.0), 0.6)):
        draw = lambda c, t=t: (_static_prefix(c), _ui(c, t))
        np.testing.assert_allclose(_render(ctx, draw, bg),
                                   _render(ref, draw, bg), atol=1e-6)


def test_layer_memo_and_paint_memo_compose():
    """Frame-memo hits and suffix-only paint patches still work while a
    layer is active; a prefix paint-value delta falls back to the full
    path (and re-bakes) instead of mispatching the suffix plan."""
    def draw(c, ui_col, t):
        _static_prefix(c, 20)
        _ui(c, t)
        vg.beginPath(c)
        vg.rect(c, 250, 120, 40, 30)
        vg.fillPath(c, vg.color4ub(*ui_col), vg.FillFlags.ConvexAA)

    ctx, ref = _ctx(True), _ctx(False)
    base = ((120, 60, 200, 210), 0.5)
    # establish layer
    for t in (0.0, 0.25, 0.5):
        np.testing.assert_allclose(
            _render(ctx, lambda c: draw(c, base[0], t)),
            _render(ref, lambda c: draw(c, base[0], t)), atol=1e-6)
    hits0 = ctx.profiler.counters.get("memo_paint_hits", 0)
    # suffix paint-only delta: should hit the paint patch, pixels equal
    for col in ((40, 220, 90, 210), (220, 90, 40, 210)):
        np.testing.assert_allclose(
            _render(ctx, lambda c: draw(c, col, 0.5)),
            _render(ref, lambda c: draw(c, col, 0.5)), atol=1e-6)
    assert ctx.profiler.counters.get("memo_paint_hits", 0) == hits0 + 2
    # identical re-record: full memo hit with the layer still applied
    img = _render(ctx, lambda c: draw(c, (220, 90, 40, 210), 0.5))
    exp = _render(ref, lambda c: draw(c, (220, 90, 40, 210), 0.5))
    np.testing.assert_allclose(img, exp, atol=1e-6)


def test_layer_with_text_and_texture_suffix():
    """Textured content (text) in BOTH prefix and suffix: color tiles of
    the suffix plan must reference suffix ops (the ops= plumb-through)."""
    from tests.fontdata import FONT_DATA

    if FONT_DATA is None:
        pytest.skip("no test font available")

    def make_draw(t):
        def draw(c):
            f = (c.fonts[0] if c.fonts
                 else vg.createFont(c, "sans", FONT_DATA, len(FONT_DATA), 0))
            cfg = vg.makeTextConfig(c, f, 20.0, vg.TextAlign.BaselineLeft,
                                    vg.color4ub(240, 240, 240, 255))
            _static_prefix(c, 18)
            vg.text(c, cfg, 10, 140, "static label")
            vg.text(c, cfg, 180 + 20 * t, 30, "moving")
            _ui(c, t)
        return draw

    ctx, ref = _ctx(True), _ctx(False)
    for t in (0.0, 0.5, 1.0):
        np.testing.assert_allclose(_render(ctx, make_draw(t)),
                                   _render(ref, make_draw(t)), atol=1e-6)


@pytest.mark.parametrize("seed", (5, 17, 41))
def test_layer_fuzz_random_prefix_suffix(seed):
    """Differential fuzz of the layer memo: a random full-API prefix program
    (paints, clips, text, images, tri-lists) + three random suffix variants,
    rendered through one layered context; every frame must equal a fresh
    non-layered render."""
    from tests.test_differential_fuzz import (
        BG as FBG, H as FH, W as FW, _checker_image, apply_program,
        build_program,
    )
    from tests.fontdata import FONT_DATA

    rng = np.random.default_rng(seed)
    prefix = build_program(rng)
    suffixes = [build_program(np.random.default_rng(100 * seed + k))
                for k in range(3)]

    def make_ctx(layer):
        cfg = vg.ContextConfig(layer_memo=layer, layer_min_prefix=4)
        ctx = vg.createContext(cfg)
        vg.begin(ctx, 0, FW, FH, 1.0)
        font = (vg.createFont(ctx, "sans", FONT_DATA, len(FONT_DATA), 0)
                if FONT_DATA is not None else None)
        img = vg.createImage(ctx, 16, 16, 0,
                             _checker_image(np.random.default_rng(seed)))
        return ctx, font, img

    ctx, font, img = make_ctx(True)

    def frame(c, f, im, sfx):
        apply_program(c, prefix, f, im)
        apply_program(c, sfx, f, im)
        vg.end(c, background=FBG)
        return np.asarray(c.frame_image)

    for k, sfx in enumerate(suffixes):
        if k:
            vg.begin(ctx, 0, FW, FH, 1.0)
        got = frame(ctx, font, img, sfx)
        rctx, rfont, rimg = make_ctx(False)
        exp = frame(rctx, rfont, rimg, sfx)
        np.testing.assert_allclose(got, exp, atol=2e-4,
                                   err_msg=f"seed {seed} suffix {k}")


def test_layer_disabled_by_config():
    ctx = _ctx(False)
    for t in (0.0, 0.3, 0.6):
        _render(ctx, lambda c, t=t: (_static_prefix(c), _ui(c, t)))
    assert ctx.profiler.counters.get("layer_hits", 0) == 0
    assert ctx._layer_render is None
