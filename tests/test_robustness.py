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


def test_fuzz_occlusion_clip_buckets():
    """Randomized scenes mixing opaque full-cover fills (occlusion culling),
    clip groups (control-entry pruning), merged same-paint draws, scissors
    and both rules: native+bucketed+culled pipeline vs the numpy oracle
    binning, pixel-for-pixel (VERDICT round-1 weak #8)."""
    import jax  # noqa: F401

    import vgtpu as vg
    from vgtpu.raster.binning import bin_frame
    from vgtpu.raster.frame import execute_plan

    rng = np.random.default_rng(42)
    for trial in range(6):
        ctx = vg.createContext()
        vg.begin(ctx, 0, 320, 160, 1.0)
        n_clip_groups = int(rng.integers(0, 3))
        for _ in range(int(rng.integers(6, 18))):
            r = rng.uniform()
            if r < 0.15 and n_clip_groups:
                # clip group around a few draws
                vg.beginClip(ctx, vg.ClipRule.In if rng.uniform() < 0.7 else vg.ClipRule.Out)
                vg.beginPath(ctx)
                vg.circle(ctx, rng.uniform(40, 280), rng.uniform(30, 130),
                          rng.uniform(20, 70))
                vg.fillPath(ctx, vg.Colors.Black, vg.FillFlags.Convex)
                vg.endClip(ctx)
                n_clip_groups -= 1
                continue
            if r < 0.2:
                vg.resetClip(ctx)
                continue
            if r < 0.3:
                if rng.uniform() < 0.5:
                    vg.setScissor(ctx, rng.uniform(0, 100), rng.uniform(0, 60),
                                  rng.uniform(80, 220), rng.uniform(50, 100))
                else:
                    vg.resetScissor(ctx)
                continue
            vg.beginPath(ctx)
            kind = rng.uniform()
            if kind < 0.25:
                # full-viewport opaque rect: triggers occlusion culling
                vg.rect(ctx, -10, -10, 340, 180)
                vg.fillPath(ctx, vg.color4ub(*rng.integers(0, 256, 3), 255),
                            vg.FillFlags.Convex)
            elif kind < 0.6:
                vg.circle(ctx, rng.uniform(0, 320), rng.uniform(0, 160),
                          rng.uniform(5, 60))
                a = 255 if rng.uniform() < 0.5 else int(rng.integers(40, 255))
                vg.fillPath(ctx, vg.color4ub(*rng.integers(0, 256, 3), a),
                            vg.FillFlags.ConvexAA if rng.uniform() < 0.7
                            else vg.FillFlags.Convex)
            elif kind < 0.8:
                pts = rng.uniform(-20, 340, (int(rng.integers(4, 12)), 2))
                vg.polyline(ctx, pts)
                vg.closePath(ctx)
                rule = (vg.FillFlags.ConcaveEvenOddAA if rng.uniform() < 0.4
                        else vg.FillFlags.ConcaveNonZeroAA)
                vg.fillPath(ctx, vg.color4ub(*rng.integers(0, 256, 3),
                                             int(rng.integers(60, 256))), rule)
            else:
                vg.moveTo(ctx, rng.uniform(0, 320), rng.uniform(0, 160))
                for _ in range(int(rng.integers(1, 5))):
                    vg.lineTo(ctx, rng.uniform(0, 320), rng.uniform(0, 160))
                vg.strokePath(ctx, vg.color4ub(*rng.integers(0, 256, 3), 255),
                              rng.uniform(0.4, 8.0), vg.StrokeFlags.RoundRoundAA)
        vg.resetClip(ctx)
        ctx._finalize_ops()

        plan_auto = bin_frame(ctx.ops, 320, 160, backend="auto")
        plan_np = bin_frame(ctx.ops, 320, 160, backend="numpy")
        # oracle binning bypasses occlusion culling / feature-split buckets
        # only through compute_tile_buckets defaults — force plain buckets
        from vgtpu.raster.binning import _bucket_pow2
        import numpy as _np

        te = plan_np.tile_entries
        plan_np.tile_buckets = [(te, _np.arange(te.shape[0], dtype=_np.int32),
                                 (True,) * 7)]
        img_a = np.asarray(execute_plan(plan_auto, background=(1, 1, 1, 1)))
        img_b = np.asarray(execute_plan(plan_np, background=(1, 1, 1, 1)))
        np.testing.assert_allclose(img_a, img_b, atol=2e-4,
                                   err_msg=f"trial {trial}")


def test_create_image_rejects_wrong_size():
    import pytest

    import vgtpu as vg

    ctx = vg.createContext()
    vg.begin(ctx, 0, 64, 64, 1.0)
    bad = np.zeros((8, 8, 4), np.uint8)          # 16x16 claimed below
    with pytest.raises(ValueError, match="expected 1024"):
        vg.createImage(ctx, 16, 16, 0, bad)
    ok = vg.createImage(ctx, 8, 8, 0, bad)       # correct size fine
    assert vg.isImageValid(ctx, ok)


def test_svg_unknown_color_warns():
    import pytest

    from vgtpu.scenes.svg import load_svg

    with pytest.warns(UserWarning, match="unknown color 'chartreuse'"):
        doc = load_svg('<svg width="10" height="10">'
                       '<path d="M0 0 H9 V9 Z" fill="chartreuse"/></svg>')
    assert len(doc.paths) == 1


def test_dpr2_feature_matrix():
    """gradients + text + image patterns + clips at devicePixelRatio 2: the
    framebuffer is dpr-dense and all paints shade in framebuffer space."""
    import vgtpu as vg
    from tests.test_text import FONT_DATA

    def scene(ctx):
        g = vg.createLinearGradient(ctx, 0, 0, 120, 0, vg.Colors.Red, vg.Colors.Blue)
        vg.beginPath(ctx)
        vg.rect(ctx, 4, 4, 120, 30)
        vg.fillPath(ctx, g, vg.FillFlags.ConvexAA)
        img = np.zeros((16, 16, 4), np.uint8)
        img[..., 1] = 200
        img[..., 3] = 255
        h = vg.createImage(ctx, 16, 16, 0, img)
        p = vg.createImagePattern(ctx, 10, 44, 32, 32, 0.0, h)
        vg.beginPath(ctx)
        vg.rect(ctx, 4, 40, 60, 20)
        vg.fillPath(ctx, p, vg.Colors.White, vg.FillFlags.ConvexAA)
        f = vg.createFont(ctx, "sans", FONT_DATA, len(FONT_DATA), 0)
        cfg = vg.makeTextConfig(ctx, f, 14.0, vg.TextAlign.TopLeft, vg.Colors.White)
        vg.text(ctx, cfg, 4, 62, "dpr text")
        vg.beginClip(ctx, vg.ClipRule.In)
        vg.beginPath(ctx)
        vg.circle(ctx, 100, 60, 16)
        vg.fillPath(ctx, vg.Colors.Black, vg.FillFlags.Convex)
        vg.endClip(ctx)
        vg.beginPath(ctx)
        vg.rect(ctx, 80, 40, 44, 40)
        vg.fillPath(ctx, vg.color4ub(255, 200, 0, 255), vg.FillFlags.Convex)
        vg.resetClip(ctx)

    ctx = vg.createContext()
    vg.begin(ctx, 0, 130, 90, 2.0)
    scene(ctx)
    vg.end(ctx, background=(0, 0, 0, 1))
    img2 = np.asarray(ctx.frame_image)
    assert img2.shape[:2] == (180, 260)          # dpr-dense framebuffer
    # gradient: red at left, blue at right (fb coords = 2x logical)
    assert img2[20, 16, 0] > 0.8 and img2[20, 240, 2] > 0.8
    # pattern green band
    assert img2[100, 40, 1] > 0.6
    # text rendered somewhere in its line
    assert img2[130:160, 8:120, 3].max() > 0.5
    # clip: yellow only inside the circle (center (200,120) r=32 in fb)
    assert img2[120, 200, 0] > 0.9 and img2[120, 200, 1] > 0.7
    assert img2[84, 244, 0] < 0.1                # clipped corner stays bg-black

    # visual agreement with a dpr=1 render at matched size (content scaled)
    ctx1 = vg.createContext()
    vg.begin(ctx1, 0, 260, 180, 1.0)
    vg.transformScale(ctx1, 2.0, 2.0)
    scene(ctx1)
    vg.end(ctx1, background=(0, 0, 0, 1))
    img1 = np.asarray(ctx1.frame_image)
    # same macro structure (allowing AA/sampling differences): compare
    # downsampled 4x4 block means
    a = img2.reshape(45, 4, 65, 4, 4).mean(axis=(1, 3))
    b = img1.reshape(45, 4, 65, 4, 4).mean(axis=(1, 3))
    assert np.abs(a - b).mean() < 0.02


def test_tile_depth_cap():
    """Composite depth is capped at ContextConfig.max_ops_per_tile_cap: tiles
    deeper than the cap keep the LAST cap draws (painter order) and warn."""
    import warnings

    import numpy as np

    from vgtpu.api.config import ContextConfig

    def draw(ctx, n0, n):
        vg.begin(ctx, 0, 128, 64, 1.0)
        for i in range(n0, n):
            vg.beginPath(ctx)
            vg.rect(ctx, 0, 0, 128, 64)
            vg.fillPath(ctx, vg.color4ub(40 + 5 * i, 30, 200 - 9 * i, 60),
                        vg.FillFlags.ConvexAA)
        return np.asarray(vg.end(ctx, background=(1, 1, 1, 1)))

    capped_ctx = vg.createContext(cfg=ContextConfig(max_ops_per_tile_cap=8))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        img_capped = draw(capped_ctx, 0, 12)
    assert any("depth" in str(x.message) for x in w)

    ref_ctx = vg.createContext(cfg=ContextConfig(max_ops_per_tile_cap=8))
    img_last8 = draw(ref_ctx, 4, 12)   # only the last 8 draws
    assert np.allclose(img_capped, img_last8, atol=1e-6)


def test_depth_cap_preserves_clip_controls():
    """The composite depth cap drops the oldest DRAWS, never clip controls:
    a capped tile keeps its clip-add/commit so surviving draws stay
    correctly clipped (dropping the adds would pin the mask to 0 and erase
    them; dropping the commit would leak them unclipped)."""
    import warnings

    import vgtpu as vg
    from vgtpu.api.config import ContextConfig

    ctx = vg.createContext(ContextConfig(max_ops_per_tile_cap=16))
    vg.begin(ctx, 0, 128, 8, 1.0)
    # clip to the left half, then stack 40 translucent draws in one tile
    vg.beginClip(ctx, vg.ClipRule.In)
    vg.beginPath(ctx)
    vg.rect(ctx, 0, 0, 64, 8)
    vg.fillPath(ctx, vg.Colors.Black, vg.FillFlags.Convex)
    vg.endClip(ctx)
    for i in range(40):
        vg.beginPath(ctx)
        vg.rect(ctx, 2 + (i % 7), 1, 100, 6)
        vg.fillPath(ctx, vg.color4ub(255, 0, 0, 60), vg.FillFlags.ConvexAA)
    vg.resetClip(ctx)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        img = np.asarray(vg.end(ctx, background=(0, 0, 0, 1)))
    # right half (outside the clip) must stay background; left half red
    assert img[4, 96, 0] < 1e-3, "clip leaked: draws escaped the clip region"
    assert img[4, 30, 0] > 0.5, "clipped draws vanished (mask pinned to 0)"
