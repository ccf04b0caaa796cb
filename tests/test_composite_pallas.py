"""Fused Pallas composite vs the XLA composite (oracle): bit-level parity on
real scene plans — solids, gradients, textures/text, clips, scissors, both
fill rules, non-AA (the four shader programs + stencil semantics of the
reference, src/shaders/*.sc + vg.cpp:1162-1287)."""

import numpy as np
import pytest

import vgtpu as vg
from vgtpu.ops.composite import composite_bucketed_body
from vgtpu.ops.composite_pallas import build_bucket_aux, composite_bucketed_pallas_body
from vgtpu.ops.coverage import entry_coverage_from_pools


def _scene_full(ctx):
    g = vg.createLinearGradient(ctx, 10, 10, 200, 150, vg.Colors.Red, vg.Colors.Blue)
    vg.beginPath(ctx)
    vg.roundedRect(ctx, 10, 10, 190, 140, 25)
    vg.fillPath(ctx, g, vg.FillFlags.ConvexAA)
    vg.beginPath(ctx)
    vg.circle(ctx, 300, 80, 60)
    vg.fillPath(ctx, vg.color4ub(255, 200, 0, 255), vg.FillFlags.ConvexAA)
    vg.strokePath(ctx, vg.Colors.Black, 5.0, vg.StrokeFlags.RoundRoundAA)
    # star: concave + even-odd
    ang = -np.pi / 2 + np.arange(5) * (4 * np.pi / 5)
    vg.beginPath(ctx)
    vg.moveTo(ctx, 420 + 50 * np.cos(ang[0]), 80 + 50 * np.sin(ang[0]))
    for a in ang[1:]:
        vg.lineTo(ctx, 420 + 50 * np.cos(a), 80 + 50 * np.sin(a))
    vg.closePath(ctx)
    vg.fillPath(ctx, vg.color4ub(40, 220, 120, 200), vg.FillFlags.ConcaveEvenOddAA)
    # clip + scissor + non-AA
    vg.beginClip(ctx, vg.ClipRule.In)
    vg.beginPath(ctx)
    vg.circle(ctx, 140, 200, 55)
    vg.fillPath(ctx, vg.Colors.Black, vg.FillFlags.Convex)
    vg.endClip(ctx)
    vg.setScissor(ctx, 60, 150, 400, 100)
    vg.beginPath(ctx)
    vg.rect(ctx, 60, 150, 200, 100)
    vg.fillPath(ctx, vg.color4ub(30, 120, 230, 255), vg.FillFlags.Convex)
    vg.resetScissor(ctx)
    vg.resetClip(ctx)
    # per-vertex-color triangles
    pos = np.array([[330, 160], [470, 170], [400, 250]], np.float32)
    cols = np.array([vg.Colors.Red, vg.Colors.Green, vg.Colors.Blue], np.uint32)
    vg.indexedTriList(ctx, pos, None, 3, cols, 3, np.array([0, 1, 2], np.uint16), 3, None)


def _compare(ctx, w, h, bg=(0.1, 0.2, 0.3, 1.0)):
    import jax.numpy as jnp

    from vgtpu.raster.binning import bin_frame
    from vgtpu.raster.frame import plan_to_device

    ctx._finalize_ops()
    plan = bin_frame(ctx.ops, w, h, tile_h=ctx.cfg.tile_h, tile_w=ctx.cfg.tile_w)
    ctx._fill_textures(plan)
    d = plan_to_device(plan)
    ne = d["entry_backdrop"].shape[0]
    th, tw = plan.tile_h, plan.tile_w
    entry_w = entry_coverage_from_pools(d["chunk_pools"], ne, th, tw) + d["entry_backdrop"][:, :, None]
    bg_arr = jnp.asarray(np.asarray(bg, np.float32))
    nt = plan.tile_entries.shape[0]

    fb_xla = composite_bucketed_body(
        entry_w, d["tile_buckets"],
        d["entry_kind"], d["entry_rule"], d["entry_aa"], d["entry_paint_kind"],
        d["entry_paint"], d["entry_scissor"], d["entry_color_tile"],
        d["color_tiles"], bg_arr,
        ntx=plan.ntx, tile_h=th, tile_w=tw, num_tiles=nt,
        bucket_flags=d["bucket_flags"],
    )

    params, cts = [], []
    for (te_b, _ids, flags) in plan.tile_buckets:
        pp, ct = build_bucket_aux(plan, te_b, need_ct=bool(flags[2]))
        params.append(jnp.asarray(pp))
        cts.append(jnp.asarray(ct) if ct is not None else None)
    fb_pl = composite_bucketed_pallas_body(
        entry_w, d["tile_buckets"], tuple(params), tuple(cts), bg_arr,
        tile_h=th, tile_w=tw, num_tiles=nt,
        bucket_flags=d["bucket_flags"], interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(fb_pl)[:nt], np.asarray(fb_xla)[:nt], atol=2e-6,
    )


def _compare_ss(ctx, w, h, ss, bg=(0.1, 0.2, 0.3, 1.0)):
    """Supersampled fused composite vs the XLA ss composite (oracle)."""
    import jax.numpy as jnp

    from vgtpu.raster.binning import bin_frame
    from vgtpu.raster.frame import plan_to_device

    ctx._finalize_ops()
    plan = bin_frame(ctx.ops, w, h, tile_h=ctx.cfg.tile_h,
                     tile_w=ctx.cfg.tile_w, supersample=ss)
    ctx._fill_textures(plan)
    d = plan_to_device(plan)
    ne = d["entry_backdrop"].shape[0]
    th, tw = plan.tile_h, plan.tile_w        # th = sub-row domain
    entry_w = entry_coverage_from_pools(d["chunk_pools"], ne, th, tw) + d["entry_backdrop"][:, :, None]
    bg_arr = jnp.asarray(np.asarray(bg, np.float32))
    nt = plan.tile_entries.shape[0]

    fb_xla = composite_bucketed_body(
        entry_w, d["tile_buckets"],
        d["entry_kind"], d["entry_rule"], d["entry_aa"], d["entry_paint_kind"],
        d["entry_paint"], d["entry_scissor"], d["entry_color_tile"],
        d["color_tiles"], bg_arr,
        ntx=plan.ntx, tile_h=th, tile_w=tw, num_tiles=nt,
        bucket_flags=d["bucket_flags"], ss=ss,
    )

    params, cts = [], []
    for (te_b, _ids, flags) in plan.tile_buckets:
        pp, ct = build_bucket_aux(plan, te_b, need_ct=bool(flags[2]))
        params.append(jnp.asarray(pp))
        cts.append(jnp.asarray(ct) if ct is not None else None)
    fb_pl = composite_bucketed_pallas_body(
        entry_w, d["tile_buckets"], tuple(params), tuple(cts), bg_arr,
        tile_h=th, tile_w=tw, num_tiles=nt,
        bucket_flags=d["bucket_flags"], interpret=True, ss=ss,
    )
    np.testing.assert_allclose(
        np.asarray(fb_pl)[:nt], np.asarray(fb_xla)[:nt], atol=2e-6,
    )


def test_composite_pallas_supersample_parity():
    """Conflation-free mode (ss=4) through the fused kernel: rule + scissor +
    clip at sub-row resolution, ss-averaged coverage, output-domain shading —
    must match the XLA ss composite on the full feature scene."""
    ctx = vg.createContext()
    vg.begin(ctx, 0, 512, 256, 1.0)
    _scene_full(ctx)
    _compare_ss(ctx, 512, 256, ss=4)


def test_composite_pallas_supersample_ss2_text():
    from tests.test_text import FONT_DATA

    ctx = vg.createContext()
    vg.begin(ctx, 0, 384, 128, 1.0)
    f = vg.createFont(ctx, "sans", FONT_DATA, len(FONT_DATA), 0)
    cfg = vg.makeTextConfig(ctx, f, 26.0, vg.TextAlign.MiddleLeft, vg.Colors.White)
    vg.text(ctx, cfg, 8, 64, "ss fused parity")
    vg.beginPath(ctx)
    vg.circle(ctx, 300, 70, 40)
    vg.fillPath(ctx, vg.color4ub(40, 220, 120, 180), vg.FillFlags.ConvexAA)
    _compare_ss(ctx, 384, 128, ss=2)


def test_frame_fb_pallas_fused_supersample_parity():
    """The fully fused ss path (chunk gather + in-kernel backdrop + ss
    averaging) vs the XLA ss composite."""
    import jax.numpy as jnp

    from vgtpu.ops.composite_pallas import build_bucket_pteb, frame_fb_pallas
    from vgtpu.ops.coverage import build_cov_gather_map, cov_all_resolved
    from vgtpu.raster.binning import bin_frame
    from vgtpu.raster.frame import plan_to_device

    ss = 4
    ctx = vg.createContext()
    vg.begin(ctx, 0, 256, 128, 1.0)
    _scene_full(ctx)
    w, h = 256, 128
    ctx._finalize_ops()
    plan = bin_frame(ctx.ops, w, h, tile_h=ctx.cfg.tile_h,
                     tile_w=ctx.cfg.tile_w, supersample=ss)
    ctx._fill_textures(plan)
    d = plan_to_device(plan)
    ne = d["entry_backdrop"].shape[0]
    th, tw = plan.tile_h, plan.tile_w
    nt = plan.tile_entries.shape[0]
    bg = jnp.asarray(np.asarray((0.1, 0.2, 0.3, 1.0), np.float32))

    entry_w = entry_coverage_from_pools(d["chunk_pools"], ne, th, tw) + d["entry_backdrop"][:, :, None]
    fb_xla = composite_bucketed_body(
        entry_w, d["tile_buckets"],
        d["entry_kind"], d["entry_rule"], d["entry_aa"], d["entry_paint_kind"],
        d["entry_paint"], d["entry_scissor"], d["entry_color_tile"],
        d["color_tiles"], bg,
        ntx=plan.ntx, tile_h=th, tile_w=tw, num_tiles=nt,
        bucket_flags=d["bucket_flags"], ss=ss,
    )

    m = build_cov_gather_map(plan.chunk_pools, ne)
    m_dev = {k: jnp.asarray(v) for k, v in m.items()}
    cov_all = cov_all_resolved(d["chunk_pools"], m_dev, th, tw)
    dead_id = int(sum(len(cent) for _ce, cent in plan.chunk_pools))
    params, cts, ptebs = [], [], []
    for te_b, _ids, flags in plan.tile_buckets:
        pp, ct = build_bucket_aux(plan, te_b, need_ct=bool(flags[2]))
        ptebs.append(jnp.asarray(build_bucket_pteb(te_b, m["primary"], dead_id)))
        params.append(jnp.asarray(pp))
        cts.append(jnp.asarray(ct) if ct is not None else None)
    fb_fused = frame_fb_pallas(
        cov_all, d["tile_buckets"], tuple(ptebs), tuple(params), tuple(cts), bg,
        tile_h=th, tile_w=tw, num_tiles=nt, bucket_flags=d["bucket_flags"],
        interpret=True, ss=ss,
    )
    np.testing.assert_allclose(
        np.asarray(fb_fused), np.asarray(fb_xla), atol=2e-6)


def test_composite_pallas_full_scene_parity():
    ctx = vg.createContext()
    vg.begin(ctx, 0, 512, 256, 1.0)
    _scene_full(ctx)
    _compare(ctx, 512, 256)


def test_composite_pallas_text_parity():
    from tests.test_text import FONT_DATA

    ctx = vg.createContext()
    vg.begin(ctx, 0, 384, 128, 1.0)
    f = vg.createFont(ctx, "sans", FONT_DATA, len(FONT_DATA), 0)
    cfg = vg.makeTextConfig(ctx, f, 26.0, vg.TextAlign.MiddleLeft, vg.Colors.White)
    vg.text(ctx, cfg, 8, 64, "Pallas composite parity")
    vg.beginPath(ctx)
    vg.rect(ctx, 0, 0, 384, 40)
    vg.fillPath(ctx, vg.color4ub(200, 60, 60, 160), vg.FillFlags.ConvexAA)
    _compare(ctx, 384, 128)


def test_composite_pallas_random_scenes_parity():
    rng = np.random.default_rng(7)
    for _ in range(3):
        ctx = vg.createContext()
        vg.begin(ctx, 0, 256, 128, 1.0)
        for _ in range(8):
            vg.beginPath(ctx)
            kind = rng.uniform()
            x, y = rng.uniform(0, 220), rng.uniform(0, 100)
            if kind < 0.4:
                vg.circle(ctx, x, y, rng.uniform(5, 40))
            else:
                vg.rect(ctx, x, y, rng.uniform(10, 80), rng.uniform(10, 60))
            col = vg.color4ub(*rng.integers(0, 256, 3), rng.integers(60, 256))
            flags = vg.FillFlags.ConvexAA if rng.uniform() < 0.7 else vg.FillFlags.Convex
            vg.fillPath(ctx, col, flags)
            if rng.uniform() < 0.3:
                vg.strokePath(ctx, vg.Colors.Black, rng.uniform(0.5, 6.0),
                              vg.StrokeFlags.ButtMiterAA)
        _compare(ctx, 256, 128)


def test_frame_fb_pallas_fused_parity():
    """The fully fused path (chunk-coverage gather + in-kernel backdrop, no
    entry_w materialization) must match the XLA frame pixel-for-pixel."""
    import jax.numpy as jnp

    from vgtpu.ops.composite_pallas import build_bucket_pteb, frame_fb_pallas
    from vgtpu.ops.coverage import build_cov_gather_map, cov_all_resolved
    from vgtpu.raster.binning import bin_frame
    from vgtpu.raster.frame import plan_to_device

    ctx = vg.createContext()
    vg.begin(ctx, 0, 512, 256, 1.0)
    _scene_full(ctx)
    w, h = 512, 256
    ctx._finalize_ops()
    plan = bin_frame(ctx.ops, w, h, tile_h=ctx.cfg.tile_h, tile_w=ctx.cfg.tile_w)
    ctx._fill_textures(plan)
    d = plan_to_device(plan)
    ne = d["entry_backdrop"].shape[0]
    th, tw = plan.tile_h, plan.tile_w
    nt = plan.tile_entries.shape[0]
    bg = jnp.asarray(np.asarray((0.1, 0.2, 0.3, 1.0), np.float32))

    entry_w = entry_coverage_from_pools(d["chunk_pools"], ne, th, tw) + d["entry_backdrop"][:, :, None]
    fb_xla = composite_bucketed_body(
        entry_w, d["tile_buckets"],
        d["entry_kind"], d["entry_rule"], d["entry_aa"], d["entry_paint_kind"],
        d["entry_paint"], d["entry_scissor"], d["entry_color_tile"],
        d["color_tiles"], bg,
        ntx=plan.ntx, tile_h=th, tile_w=tw, num_tiles=nt,
        bucket_flags=d["bucket_flags"],
    )

    m = build_cov_gather_map(plan.chunk_pools, ne)
    m_dev = {k: jnp.asarray(v) for k, v in m.items()}
    cov_all = cov_all_resolved(d["chunk_pools"], m_dev, th, tw)
    dead_id = int(sum(len(cent) for _ce, cent in plan.chunk_pools))
    params, cts, ptebs = [], [], []
    for te_b, _ids, flags in plan.tile_buckets:
        pp, ct = build_bucket_aux(plan, te_b, need_ct=bool(flags[2]))
        ptebs.append(jnp.asarray(build_bucket_pteb(te_b, m["primary"], dead_id)))
        params.append(jnp.asarray(pp))
        cts.append(jnp.asarray(ct) if ct is not None else None)
    fb_fused = frame_fb_pallas(
        cov_all, d["tile_buckets"], tuple(ptebs), tuple(params), tuple(cts), bg,
        tile_h=th, tile_w=tw, num_tiles=nt, bucket_flags=d["bucket_flags"],
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(fb_fused), np.asarray(fb_xla), atol=2e-6)


def test_fused_composite_tile_h16():
    """tile_h beyond 8 must work through the fused path (params carry
    tile_h backdrop rows — was fixed at 8; review finding)."""
    from vgtpu.api.config import ContextConfig

    cfg = ContextConfig(tile_h=16)
    ctx = vg.createContext(cfg=cfg)
    vg.begin(ctx, 0, 256, 128, 1.0)
    _scene_full(ctx)
    _compare(ctx, 256, 128)


def test_bucket_params_device_builder_parity():
    """build_bucket_params_jnp (in-jit, dedup-upload path) must reproduce
    build_bucket_aux bit-exactly — pixels depend on it (frame._frame_fn)."""
    import jax.numpy as jnp

    from vgtpu.ops.composite_pallas import build_bucket_params_jnp
    from vgtpu.raster.frame import plan_to_device

    ctx = vg.createContext()
    vg.begin(ctx, 0, 512, 256, 1.0)
    _scene_full(ctx)
    vg.end(ctx, background=(0.2, 0.2, 0.2, 1.0))
    plan = ctx.last_plan
    plan_to_device(plan)  # ensures tile_buckets

    for te_b, _ids, _fl in plan.tile_buckets:
        pp_host, _ = build_bucket_aux(plan, te_b, need_ct=False)
        pp_dev = np.asarray(build_bucket_params_jnp(
            jnp.asarray(te_b),
            jnp.asarray(plan.entry_kind), jnp.asarray(plan.entry_rule),
            jnp.asarray(plan.entry_aa), jnp.asarray(plan.entry_paint_kind),
            jnp.asarray(plan.entry_scissor), jnp.asarray(plan.entry_paint),
            jnp.asarray(plan.entry_color_tile), jnp.asarray(plan.entry_tile),
            jnp.asarray(plan.entry_backdrop),
            tile_h=plan.tile_h, tile_w=plan.tile_w, ntx=plan.ntx))
        assert pp_dev.shape == pp_host.shape
        np.testing.assert_array_equal(pp_dev, pp_host)


def test_pop_expansion_matches_dense_entries():
    """The compact pseudo-op tables gather back to the dense per-entry
    arrays exactly (native binner plans only)."""
    ctx = vg.createContext()
    vg.begin(ctx, 0, 512, 256, 1.0)
    _scene_full(ctx)
    vg.end(ctx, background=(0.2, 0.2, 0.2, 1.0))
    plan = ctx.last_plan
    if plan.pop is None:
        pytest.skip("numpy binner (no native lib): no compact tables")
    ep = plan.entry_pop
    np.testing.assert_array_equal(plan.pop["kind"][ep], plan.entry_kind)
    np.testing.assert_array_equal(plan.pop["rule"][ep], plan.entry_rule)
    np.testing.assert_array_equal(plan.pop["aa"][ep], plan.entry_aa)
    np.testing.assert_array_equal(plan.pop["paint_kind"][ep], plan.entry_paint_kind)
    np.testing.assert_array_equal(plan.pop["paint"][ep], plan.entry_paint)
    np.testing.assert_array_equal(plan.pop["scissor"][ep], plan.entry_scissor)
