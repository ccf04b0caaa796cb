"""Batched variant rendering (raster/batch.py): K value-variants of one
structural plan render in ONE device dispatch.  Each variant frame must be
pixel-identical to the ordinary per-frame path (the reference renders frames
strictly one at a time, vg.cpp:1076-1288; batching is a TPU-native capability
with no reference semantics beyond per-frame equality)."""

from __future__ import annotations

import numpy as np
import pytest

import vgtpu as vg
from tests.fontdata import FONT_DATA
from tests.test_paint_memo import BG, H, W, draw_scene
from vgtpu.raster.batch import VariantBatch, measure_batch_ms_per_frame

VARIANTS = [
    dict(rect_col=(90, 140, 220, 160), circ_col=(250, 210, 60, 255)),
    dict(rect_col=(220, 90, 140, 160), circ_col=(60, 250, 210, 255),
         grad=((40, 250, 60, 255), (250, 40, 60, 255)),
         text_col=(255, 220, 40, 255)),
    dict(rect_col=(140, 220, 90, 160), circ_col=(210, 60, 250, 255),
         grad_geo=(40.0, 10.0, 160.0, 110.0),
         stroke_col=(220, 20, 120, 255)),
]


def _fresh_font(ctx):
    return (vg.createFont(ctx, "sans", FONT_DATA, len(FONT_DATA), 0)
            if FONT_DATA is not None else None)


def _draw_variant(c, font, p):
    draw_scene(c, font, **p)
    # corner probes: content in flat tile 0 AND the last tile, so batch-axis
    # scatter bookkeeping (pad-row scratch ids, k*T offsets) is constrained
    # by the per-frame oracle — a pad row mis-scattered into a neighboring
    # variant's tile 0 clobbers the first probe (regression: round-5 review)
    col = p["circ_col"]
    vg.beginPath(c)
    vg.rect(c, 1, 1, 40, 5)
    vg.fillPath(c, vg.color4ub(col[0], col[1], col[2], 200),
                vg.FillFlags.ConvexAA)
    vg.beginPath(c)
    vg.rect(c, W - 30, H - 6, 26, 5)
    vg.fillPath(c, vg.color4ub(col[2], col[0], col[1], 200),
                vg.FillFlags.ConvexAA)


def _oracles():
    out = []
    for p in VARIANTS:
        ctx = vg.createContext()
        vg.begin(ctx, 0, W, H, 1.0)
        _draw_variant(ctx, _fresh_font(ctx), p)
        vg.end(ctx, background=BG)
        out.append(np.asarray(ctx.frame_image))
    return out


def _bake(ctx=None):
    if ctx is None:
        ctx = vg.createContext()
    font = _fresh_font(ctx)
    fns = [lambda c, p=p: _draw_variant(c, font, p) for p in VARIANTS]
    return VariantBatch.bake(ctx, fns, W, H, background=BG)


def test_folded_batch_matches_per_frame():
    """Portable (XLA) batch path: every variant bit-matches its own frame."""
    vb = _bake()
    imgs = np.asarray(vb.render(background=BG))
    assert imgs.shape == (len(VARIANTS), H, W, 4)
    for k, ref in enumerate(_oracles()):
        np.testing.assert_allclose(imgs[k], ref, atol=3e-6,
                                   err_msg=f"variant {k}")


def test_fused_batch_matches_per_frame(monkeypatch):
    """Fused Pallas batch path (lane-axis folding), interpret mode off-TPU:
    force the fused aux build and compare against the per-frame oracles."""
    from vgtpu.raster import frame as frame_mod

    monkeypatch.setattr(frame_mod, "_fused_platform", lambda: True)
    vb = _bake()
    assert vb._mode == "fused"
    imgs = np.asarray(vb.render(background=BG))
    for k, ref in enumerate(_oracles()):
        np.testing.assert_allclose(imgs[k], ref, atol=3e-6,
                                   err_msg=f"variant {k}")


def test_structural_variant_raises():
    """A variant that changes geometry (not just paint values) is rejected."""
    ctx = vg.createContext()
    font = _fresh_font(ctx)

    def base(c):
        draw_scene(c, font, **VARIANTS[0])

    def extra(c):
        draw_scene(c, font, **VARIANTS[0])
        vg.beginPath(c)
        vg.circle(c, 60, 60, 10)
        vg.fillPath(c, vg.Colors.Red, vg.FillFlags.ConvexAA)

    with pytest.raises(ValueError, match="structure"):
        VariantBatch.bake(ctx, [base, extra], W, H, background=BG)


def test_opacity_class_flip_raises():
    """Flipping a solid's opacity class changes occlusion culling = frame
    structure; the bake must refuse rather than silently mis-render."""
    ctx = vg.createContext()
    font = _fresh_font(ctx)
    a = dict(VARIANTS[0])
    b = dict(VARIANTS[0], circ_col=(250, 210, 60, 120))  # opaque -> translucent

    with pytest.raises(ValueError, match="structure"):
        VariantBatch.bake(ctx,
                          [lambda c: draw_scene(c, font, **a),
                           lambda c: draw_scene(c, font, **b)],
                          W, H, background=BG)


def test_sharded_batch_matches_per_frame():
    """Variant-axis sharding over the virtual 8-device mesh: every variant
    frame matches its per-frame oracle (K pads to the mesh size internally;
    the program contains no collectives — pure serving data-parallelism)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device platform")
    mesh = jax.make_mesh((len(jax.devices()),), ("variants",))
    vb = _bake()
    imgs = np.asarray(vb.render_sharded(mesh, background=BG))
    assert imgs.shape == (len(VARIANTS), H, W, 4)
    for k, ref in enumerate(_oracles()):
        np.testing.assert_allclose(imgs[k], ref, atol=3e-6,
                                   err_msg=f"variant {k}")


def test_chained_measure_runs():
    """The chained throughput loop compiles and yields a finite number."""
    vb = _bake()
    ms = measure_batch_ms_per_frame(vb, background=BG, reps_hi=3, reps_lo=1)
    assert np.isfinite(ms)
