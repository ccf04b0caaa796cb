"""Full-frame parity of the resolve-in-kernel supersampled path
(raster/resolve.py + ops/coverage_resolve.py + the composite cov_final
branch) against the XLA ss composite oracle.

The scene is constructed so the plan exercises every chunk class the split
produces: RES (single-chunk non-clip), RAW-clip (entries in clip tiles),
XE (multi-chunk non-clip entries), and CHUNKLESS interiors (backdrop-only
tiles riding the rbd lane rows)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import vgtpu as vg  # noqa: E402
from vgtpu.ops.composite import composite_bucketed_body  # noqa: E402


def _scene(ctx):
    from tests.test_composite_pallas import _scene_full

    _scene_full(ctx)
    # big fill -> interior (chunkless, backdrop-only) tiles
    vg.beginPath(ctx)
    vg.rect(ctx, 20, 60, 460, 180)
    vg.fillPath(ctx, vg.color4ub(20, 40, 90, 120), vg.FillFlags.ConvexAA)
    # dense zig-zag inside one tile column -> a multi-chunk entry (XE)
    vg.beginPath(ctx)
    vg.moveTo(ctx, 10.0, 30.0)
    for i in range(60):
        vg.lineTo(ctx, 12.0 + i * 1.5, 30.0 + (7.0 if i % 2 else -7.0))
    vg.lineTo(ctx, 10.0, 50.0)
    vg.closePath(ctx)
    vg.fillPath(ctx, vg.color4ub(220, 120, 30, 255),
                vg.FillFlags.ConcaveNonZeroAA)


def _build(ctx, w, h, ss, monkeypatch):
    from vgtpu.raster import frame as frame_mod
    from vgtpu.raster.binning import bin_frame

    monkeypatch.setattr(frame_mod, "_fused_platform", lambda: True)
    ctx._finalize_ops()
    plan = bin_frame(ctx.ops, w, h, tile_h=ctx.cfg.tile_h,
                     tile_w=ctx.cfg.tile_w, supersample=ss)
    ctx._fill_textures(plan)
    d = frame_mod.plan_to_device(plan)
    frame_mod.promote_resident(plan, d)   # tests drive the kernels directly
    return plan, d


def _xla_frame(plan, d, bg):
    from vgtpu.ops.coverage import entry_coverage_from_pools

    if "entry_kind" not in d:
        # dedup-upload plans drop the dense arrays; expand like _frame_body
        pop, ep = d["pop"], d["entry_pop"]
        d = dict(d)
        for k, src in (("entry_kind", "kind"), ("entry_rule", "rule"),
                       ("entry_aa", "aa"), ("entry_paint_kind", "paint_kind"),
                       ("entry_paint", "paint"), ("entry_scissor", "scissor")):
            d[k] = jnp.asarray(pop[src])[ep]
    ne = d["entry_backdrop"].shape[0]
    th, tw = plan.tile_h, plan.tile_w
    entry_w = entry_coverage_from_pools(
        d["chunk_pools"], ne, th, tw) + d["entry_backdrop"][:, :, None]
    return composite_bucketed_body(
        entry_w, d["tile_buckets"],
        d["entry_kind"], d["entry_rule"], d["entry_aa"], d["entry_paint_kind"],
        d["entry_paint"], d["entry_scissor"], d["entry_color_tile"],
        d["color_tiles"], bg,
        ntx=plan.ntx, tile_h=th, tile_w=tw,
        num_tiles=plan.tile_entries.shape[0],
        bucket_flags=d["bucket_flags"], ss=plan.supersample,
    )


def _resolve_frame(plan, d, bg, interpret=True):
    from vgtpu.ops.composite_pallas import frame_fb_pallas
    from vgtpu.ops.coverage_resolve import cov_split_resolved

    res = d["res"]
    th, tw = plan.tile_h, plan.tile_w
    cov_final, cov_sub = cov_split_resolved(
        d["chunk_pools"], res, th, tw, plan.supersample)
    return frame_fb_pallas(
        cov_sub, d["tile_buckets"], res["pteb"], d["bucket_params"],
        d["bucket_cts"], bg,
        tile_h=th, tile_w=tw, num_tiles=plan.tile_entries.shape[0],
        bucket_flags=d["bucket_flags"], interpret=interpret,
        ss=plan.supersample, cov_final_arr=cov_final, bucket_rbd=res["rbd"],
    )


@pytest.mark.parametrize("ss", [2, 4])
def test_resolve_path_full_frame_parity(ss, monkeypatch):
    if ss == 4:
        # expansion of dense-path edges is slow under interpret mode; keep
        # the heavier ss in a smaller canvas
        w, h = 384, 192
    else:
        w, h = 512, 256
    ctx = vg.createContext()
    vg.begin(ctx, 0, w, h, 1.0)
    _scene(ctx)
    plan, d = _build(ctx, w, h, ss, monkeypatch)
    assert d.get("res") is not None, "resolve aux missing on the fused plan"

    # the split must actually exercise all four chunk classes
    rh = plan.resolve_host
    assert rh["npools_res"] >= 1 and rh["nres"] > 0
    assert len(plan.chunk_pools) > rh["npools_res"] and rh["nraw"] > 0
    assert rh["entry_flags"][:, 4].any(), "scene lost its clip tiles"
    nxe = int(np.asarray(d["res"]["xe_rparams"]).shape[1])
    assert (np.asarray(d["res"]["xe_primary_raw"]) < rh["nraw"]).any(), \
        "no multi-chunk (XE) entries in the scene"
    assert any(r is not None and np.asarray(r).any()
               for r in d["res"]["rbd"]), "no chunkless interiors rode rbd"

    bg = jnp.asarray(np.asarray((0.1, 0.2, 0.3, 1.0), np.float32))
    fb_xla = _xla_frame(plan, d, bg)
    fb_res = _resolve_frame(plan, d, bg)
    np.testing.assert_allclose(
        np.asarray(fb_res), np.asarray(fb_xla), atol=3e-6)


def test_resolve_path_text_parity(monkeypatch):
    """Textured quads (P_TEXTURE force-coverage) through the resolve path."""
    from tests.test_text import FONT_DATA

    ctx = vg.createContext()
    vg.begin(ctx, 0, 384, 128, 1.0)
    f = vg.createFont(ctx, "sans", FONT_DATA, len(FONT_DATA), 0)
    cfg = vg.makeTextConfig(ctx, f, 26.0, vg.TextAlign.MiddleLeft,
                            vg.Colors.White)
    vg.text(ctx, cfg, 8, 64, "resolve path parity")
    vg.beginPath(ctx)
    vg.circle(ctx, 300, 70, 40)
    vg.fillPath(ctx, vg.color4ub(40, 220, 120, 180), vg.FillFlags.ConvexAA)
    plan, d = _build(ctx, 384, 128, 2, monkeypatch)
    assert d.get("res") is not None
    bg = jnp.asarray(np.asarray((0.05, 0.05, 0.08, 1.0), np.float32))
    fb_xla = _xla_frame(plan, d, bg)
    fb_res = _resolve_frame(plan, d, bg)
    np.testing.assert_allclose(
        np.asarray(fb_res), np.asarray(fb_xla), atol=3e-6)


def test_resolve_path_init_tiles_parity(monkeypatch):
    """Layer-memo composition (init_tiles static layer) through the resolve
    path: the per-bucket init plane and cov_final are independent kernel
    inputs — this pins the combination (api/context layer memo at ss>1)."""
    from vgtpu.ops.composite_pallas import frame_fb_pallas
    from vgtpu.ops.coverage_resolve import cov_split_resolved

    ss = 2
    w, h = 384, 128
    ctx = vg.createContext()
    vg.begin(ctx, 0, w, h, 1.0)
    vg.beginPath(ctx)
    vg.circle(ctx, 120, 64, 50)
    vg.fillPath(ctx, vg.color4ub(220, 80, 40, 200), vg.FillFlags.ConvexAA)
    vg.beginPath(ctx)
    vg.rect(ctx, 30, 10, 330, 110)
    vg.fillPath(ctx, vg.color4ub(30, 90, 200, 90), vg.FillFlags.ConvexAA)
    plan, d = _build(ctx, w, h, ss, monkeypatch)
    assert d.get("res") is not None
    bg = jnp.asarray(np.asarray((0.1, 0.2, 0.3, 1.0), np.float32))
    nt = plan.tile_entries.shape[0]
    th_out = plan.tile_h // ss
    rng = np.random.default_rng(3)
    init = jnp.asarray(rng.uniform(
        0, 1, size=(nt, th_out, plan.tile_w, 4)).astype(np.float32))

    from vgtpu.ops.composite import composite_bucketed_body

    dx = dict(d)
    if "entry_kind" not in dx:
        pop, ep = dx["pop"], dx["entry_pop"]
        for k, src in (("entry_kind", "kind"), ("entry_rule", "rule"),
                       ("entry_aa", "aa"), ("entry_paint_kind", "paint_kind"),
                       ("entry_paint", "paint"), ("entry_scissor", "scissor")):
            dx[k] = jnp.asarray(pop[src])[ep]
    from vgtpu.ops.coverage import entry_coverage_from_pools

    ne = dx["entry_backdrop"].shape[0]
    entry_w = entry_coverage_from_pools(
        dx["chunk_pools"], ne, plan.tile_h, plan.tile_w
    ) + dx["entry_backdrop"][:, :, None]
    fb_xla = composite_bucketed_body(
        entry_w, dx["tile_buckets"],
        dx["entry_kind"], dx["entry_rule"], dx["entry_aa"],
        dx["entry_paint_kind"], dx["entry_paint"], dx["entry_scissor"],
        dx["entry_color_tile"], dx["color_tiles"], bg,
        ntx=plan.ntx, tile_h=plan.tile_h, tile_w=plan.tile_w, num_tiles=nt,
        bucket_flags=dx["bucket_flags"], ss=ss, init_tiles=init,
    )
    res = d["res"]
    cov_final, cov_sub = cov_split_resolved(
        d["chunk_pools"], res, plan.tile_h, plan.tile_w, ss)
    fb_res = frame_fb_pallas(
        cov_sub, d["tile_buckets"], res["pteb"], d["bucket_params"],
        d["bucket_cts"], bg,
        tile_h=plan.tile_h, tile_w=plan.tile_w, num_tiles=nt,
        bucket_flags=d["bucket_flags"], interpret=True, ss=ss,
        init_tiles=init, cov_final_arr=cov_final, bucket_rbd=res["rbd"],
    )
    np.testing.assert_allclose(
        np.asarray(fb_res), np.asarray(fb_xla), atol=3e-6)


def test_resolve_path_random_scenes(monkeypatch):
    """Differential fuzz: random scenes mixing clips, scissors, fill rules,
    non-AA, strokes and dense (multi-chunk) paths through the resolve path
    vs the XLA oracle at ss=2 — hardens the pteb/XE/rbd remaps against
    structures the curated scenes miss."""
    rng = np.random.default_rng(11)
    bg = jnp.asarray(np.asarray((0.15, 0.1, 0.2, 1.0), np.float32))
    for case in range(3):
        ctx = vg.createContext()
        vg.begin(ctx, 0, 256, 128, 1.0)
        for _ in range(10):
            kind = rng.uniform()
            x, y = rng.uniform(0, 230), rng.uniform(0, 110)
            vg.beginPath(ctx)
            if kind < 0.3:
                vg.circle(ctx, x, y, rng.uniform(5, 45))
            elif kind < 0.6:
                vg.rect(ctx, x, y, rng.uniform(10, 120), rng.uniform(10, 70))
            else:
                # dense zig-zag: multi-chunk entries
                vg.moveTo(ctx, x, y)
                for i in range(int(rng.integers(20, 50))):
                    vg.lineTo(ctx, x + i * 1.3,
                              y + (6.0 if i % 2 else -6.0) * rng.uniform(0.5, 1.5))
                vg.closePath(ctx)
            col = vg.color4ub(*rng.integers(0, 256, 3), rng.integers(60, 256))
            r = rng.uniform()
            flags = (vg.FillFlags.ConvexAA if r < 0.4
                     else vg.FillFlags.ConcaveEvenOddAA if r < 0.6
                     else vg.FillFlags.ConcaveNonZeroAA if r < 0.8
                     else vg.FillFlags.Convex)
            if rng.uniform() < 0.25:
                vg.setScissor(ctx, rng.uniform(0, 120), rng.uniform(0, 60),
                              rng.uniform(40, 130), rng.uniform(30, 70))
            vg.fillPath(ctx, col, flags)
            vg.resetScissor(ctx)
            if rng.uniform() < 0.2:
                vg.strokePath(ctx, vg.Colors.Black, rng.uniform(0.5, 5.0),
                              vg.StrokeFlags.ButtMiterAA)
        if rng.uniform() < 0.8:
            vg.beginClip(ctx, vg.ClipRule.In if rng.uniform() < 0.7
                         else vg.ClipRule.Out)
            vg.beginPath(ctx)
            vg.circle(ctx, rng.uniform(40, 200), rng.uniform(30, 100),
                      rng.uniform(20, 60))
            vg.fillPath(ctx, vg.Colors.Black, vg.FillFlags.Convex)
            vg.endClip(ctx)
            vg.beginPath(ctx)
            vg.rect(ctx, 20, 20, 200, 90)
            vg.fillPath(ctx, vg.color4ub(*rng.integers(0, 256, 3), 200),
                        vg.FillFlags.ConvexAA)
            vg.resetClip(ctx)
        plan, d = _build(ctx, 256, 128, 2, monkeypatch)
        if d.get("res") is None:
            continue
        fb_xla = _xla_frame(plan, d, bg)
        fb_res = _resolve_frame(plan, d, bg)
        np.testing.assert_allclose(
            np.asarray(fb_res), np.asarray(fb_xla), atol=3e-6,
            err_msg=f"case {case}")


def test_resolve_gate_off_at_ss1(monkeypatch):
    from vgtpu.raster import frame as frame_mod
    from vgtpu.raster.binning import bin_frame

    monkeypatch.setattr(frame_mod, "_fused_platform", lambda: True)
    ctx = vg.createContext()
    vg.begin(ctx, 0, 256, 128, 1.0)
    vg.beginPath(ctx)
    vg.circle(ctx, 60, 60, 40)
    vg.fillPath(ctx, vg.Colors.Red, vg.FillFlags.ConvexAA)
    ctx._finalize_ops()
    plan = bin_frame(ctx.ops, 256, 128, tile_h=ctx.cfg.tile_h,
                     tile_w=ctx.cfg.tile_w)
    ctx._fill_textures(plan)
    d = frame_mod.plan_to_device(plan)
    assert d.get("res") is None
