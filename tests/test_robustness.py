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
