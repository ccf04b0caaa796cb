"""Device texture sampler vs the host numpy sampler (oracle): text quads,
image patterns, wrap modes, nearest/bilinear, rotation (gather fallback),
and the full-frame integration (zero host sampling in the frame path)."""

import numpy as np
import pytest

import vgtpu as vg
from vgtpu.api.config import ContextConfig

FONT = None


def _font_data():
    global FONT
    if FONT is None:
        from tests.test_text import FONT_DATA

        FONT = FONT_DATA
    return FONT


def _render(device: bool, draw, w=384, h=128, bg=(0, 0, 0, 0)):
    ctx = vg.createContext(cfg=ContextConfig(device_sampling=device))
    vg.begin(ctx, 0, w, h, 1.0)
    draw(ctx)
    vg.end(ctx, background=bg)
    return np.asarray(ctx.frame_image)


def _check(draw, w=384, h=128, atol=2e-5):
    a = _render(False, draw, w, h)
    b = _render(True, draw, w, h)
    np.testing.assert_allclose(b, a, atol=atol)


def test_text_device_sampling_matches_host():
    data = _font_data()

    def draw(ctx):
        f = vg.createFont(ctx, "sans", data, len(data), 0)
        cfg = vg.makeTextConfig(ctx, f, 26.0, vg.TextAlign.MiddleLeft, vg.Colors.White)
        vg.text(ctx, cfg, 8, 40, "Device sampled text!")
        cfg2 = vg.makeTextConfig(ctx, f, 13.0, vg.TextAlign.MiddleLeft,
                                 vg.color4ub(255, 160, 40, 200))
        vg.text(ctx, cfg2, 8, 90, "small translucent colored")

    _check(draw)


def test_rotated_text_gather_fallback():
    data = _font_data()

    def draw(ctx):
        f = vg.createFont(ctx, "sans", data, len(data), 0)
        vg.transformTranslate(ctx, 190, 60)
        vg.transformRotate(ctx, 0.4)
        cfg = vg.makeTextConfig(ctx, f, 24.0, vg.TextAlign.MiddleCenter, vg.Colors.White)
        vg.text(ctx, cfg, 0, 0, "Rotated")

    _check(draw)


def _checker(n=64):
    img = np.zeros((n, n, 4), np.uint8)
    yy, xx = np.mgrid[0:n, 0:n]
    c = ((xx // 8 + yy // 8) % 2).astype(np.uint8)
    img[..., 0] = 255 * c
    img[..., 1] = 128
    img[..., 2] = 255 * (1 - c)
    img[..., 3] = 255
    return img


@pytest.mark.parametrize("flags", [
    0,                                            # repeat + bilinear default
    vg.ImageFlags.Clamp_U | vg.ImageFlags.Clamp_V,
    vg.ImageFlags.Filter_NearestUV | vg.ImageFlags.Filter_Nearest
    if hasattr(vg.ImageFlags, "Filter_Nearest") else vg.ImageFlags.Filter_NearestUV,
])
def test_image_pattern_device_sampling(flags):
    img = _checker()

    def draw(ctx):
        h = vg.createImage(ctx, 64, 64, flags, img)
        p = vg.createImagePattern(ctx, 40, 20, 96, 96, 0.0, h)
        vg.beginPath(ctx)
        vg.rect(ctx, 10, 10, 300, 100)
        vg.fillPath(ctx, p, vg.Colors.White, vg.FillFlags.ConvexAA)

    _check(draw)


def test_rotated_image_pattern_device_sampling():
    img = _checker()

    def draw(ctx):
        h = vg.createImage(ctx, 64, 64, 0, img)
        p = vg.createImagePattern(ctx, 160, 60, 96, 96, 0.5, h)  # rotated
        vg.beginPath(ctx)
        vg.circle(ctx, 180, 64, 55)
        vg.fillPath(ctx, p, vg.Colors.White, vg.FillFlags.ConvexAA)

    _check(draw)


def test_device_sampling_tracks_image_updates():
    """updateImage between frames must invalidate the device texture."""
    img = _checker()
    ctx = vg.createContext(cfg=ContextConfig(device_sampling=True))

    def frame():
        vg.begin(ctx, 0, 128, 64, 1.0)
        p = vg.createImagePattern(ctx, 0, 0, 64, 64, 0.0, h)
        vg.beginPath(ctx)
        vg.rect(ctx, 0, 0, 64, 64)
        vg.fillPath(ctx, p, vg.Colors.White, vg.FillFlags.Convex)
        vg.end(ctx, background=(0, 0, 0, 1))
        return np.asarray(ctx.frame_image)

    vg.begin(ctx, 0, 128, 64, 1.0)
    h = vg.createImage(ctx, 64, 64, 0, img)
    vg.end(ctx, background=(0, 0, 0, 1))

    a = frame().copy()
    solid = np.full((64, 64, 4), 255, np.uint8)
    solid[..., 0] = 10
    solid[..., 1] = 200
    solid[..., 2] = 10
    vg.updateImage(ctx, h, 0, 0, 64, 64, solid)
    b = frame()
    assert not np.allclose(a, b)
    assert b[32, 32, 1] > 0.7    # green now


def test_frame_path_has_zero_host_sampling(monkeypatch):
    """With device_sampling on, the host sampler must never run."""
    import vgtpu.raster.sampling as hs

    def boom(*a, **k):  # pragma: no cover - should not be called
        raise AssertionError("host sampler called on device path")

    monkeypatch.setattr(hs, "fill_color_tiles", boom)
    data = _font_data()

    def draw(ctx):
        f = vg.createFont(ctx, "sans", data, len(data), 0)
        cfg = vg.makeTextConfig(ctx, f, 22.0, vg.TextAlign.MiddleLeft, vg.Colors.White)
        vg.text(ctx, cfg, 8, 32, "no host round-trip")

    img = _render(True, draw)
    assert img[..., 3].max() > 0.5
