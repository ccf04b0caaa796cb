"""Native C++ geometry engine vs the numpy reference implementation:
plans must match array-for-array (the numpy binner is the oracle)."""

import numpy as np
import pytest

from vgtpu import native
from vgtpu.core import LineCap, LineJoin
from vgtpu.geometry import stroker as py_stroker
from vgtpu.raster.binning import (
    K_CLIP_ADD,
    K_CLIP_COMMIT,
    K_CLIP_RESET,
    RasterOp,
    bin_frame,
    bin_frame_numpy,
    make_solid_paint,
)

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def _rand_ops(rng, n_ops=12, w=300, h=150):
    ops = []
    for i in range(n_ops):
        k = rng.uniform()
        if k < 0.08:
            ops.append(RasterOp(kind=K_CLIP_RESET))
            continue
        npts = int(rng.integers(3, 14))
        pts = rng.uniform(-20, max(w, h) + 20, (npts, 2))
        nxt = np.roll(pts, -1, axis=0)
        edges = np.concatenate([pts, nxt], axis=1).astype(np.float32)
        sciss = None
        if rng.uniform() < 0.3:
            x0, y0 = rng.uniform(0, w / 2), rng.uniform(0, h / 2)
            sciss = (x0, y0, x0 + rng.uniform(10, w), y0 + rng.uniform(10, h))
        ops.append(
            RasterOp(
                kind=K_CLIP_ADD if k < 0.15 else 0,
                edges=edges,
                fill_rule=int(rng.integers(0, 2)),
                aa=bool(rng.integers(0, 2)),
                paint=make_solid_paint(rng.uniform(0, 1, 4).astype(np.float32)),
                scissor=sciss,
            )
        )
        if k < 0.15:
            ops.append(RasterOp(kind=K_CLIP_COMMIT))
    return ops


def test_native_matches_numpy_on_random_scenes():
    """Entry/tile tables must match array-for-array; chunk layouts differ by
    design (native uses multi-size pools, numpy a single pool) so geometry
    parity is checked by rendering both plans to identical pixels."""
    from vgtpu.raster.frame import execute_plan

    rng = np.random.default_rng(3)
    for trial in range(8):
        ops = _rand_ops(rng)
        a = bin_frame(ops, 300, 150, backend="auto")
        b = bin_frame_numpy(ops, 300, 150)
        assert a.stats.get("backend") == "native"
        assert a.stats["entries"] == b.stats["entries"], trial
        assert a.stats["max_ops_per_tile"] == b.stats["max_ops_per_tile"]
        np.testing.assert_array_equal(a.entry_tile, b.entry_tile)
        np.testing.assert_array_equal(a.entry_kind, b.entry_kind)
        np.testing.assert_array_equal(a.entry_rule, b.entry_rule)
        np.testing.assert_array_equal(a.entry_aa, b.entry_aa)
        np.testing.assert_array_equal(a.tile_entries, b.tile_entries)
        np.testing.assert_allclose(a.entry_backdrop, b.entry_backdrop, atol=1e-5)
        np.testing.assert_allclose(a.entry_paint, b.entry_paint)
        np.testing.assert_allclose(a.entry_scissor, b.entry_scissor)
        # edge content parity: total edges per entry must agree
        def edges_per_entry(p):
            tot = np.zeros(p.entry_backdrop.shape[0], np.int64)
            for ce, cent in p.chunk_pools:
                real = (np.abs(ce).sum(axis=2) > 0).sum(axis=1)
                np.add.at(tot, cent, real)
            return tot
        np.testing.assert_array_equal(edges_per_entry(a), edges_per_entry(b))
        img_a = np.asarray(execute_plan(a, background=(0, 0, 0, 0)))
        img_b = np.asarray(execute_plan(b, background=(0, 0, 0, 0)))
        np.testing.assert_allclose(img_a, img_b, atol=1e-5, err_msg=str(trial))


def test_native_stroker_matches_numpy():
    """The numpy stroker pads joints to a uniform K (degenerate repeats);
    the native one emits exact counts — geometry must rasterize identically."""
    from vgtpu.fonts.truetype import _edge_coverage_np

    rng = np.random.default_rng(5)
    for closed in (False, True):
        for cap in (LineCap.Butt, LineCap.Round, LineCap.Square):
            for join in (LineJoin.Miter, LineJoin.Round, LineJoin.Bevel):
                pts = rng.uniform(20, 180, (7, 2)).astype(np.float32)
                a = native.stroke_outline_native(pts, closed, 9.0, cap, join, 1.0, 0.25)
                b = py_stroker.stroke_outline(pts, closed, 9.0, cap, join, 1.0, 0.25)
                assert a is not None
                assert len(a) == len(b)
                ea = py_stroker.contours_to_edges([c.astype(np.float32) for c in a])
                eb = py_stroker.contours_to_edges(b)
                cov_a = _edge_coverage_np(ea, 200, 200)
                cov_b = _edge_coverage_np(eb, 200, 200)
                np.testing.assert_allclose(cov_a, cov_b, atol=2e-3,
                                           err_msg=str((closed, cap, join)))


def test_native_bake_matches_numpy():
    from vgtpu.geometry.path import PathBuilder

    rng = np.random.default_rng(9)
    for trial in range(12):
        pb = PathBuilder()
        pb.reset(float(rng.uniform(0.5, 3.0)), 0.25)
        pb.move_to(*rng.uniform(0, 200, 2))
        for _ in range(int(rng.integers(2, 10))):
            r = rng.uniform()
            if r < 0.4:
                pb.line_to(*rng.uniform(0, 200, 2))
            elif r < 0.7:
                pb.cubic_to(*rng.uniform(0, 200, 6))
            elif r < 0.8:
                pb.arc(*rng.uniform(20, 180, 2), rng.uniform(5, 40),
                       rng.uniform(0, 3), rng.uniform(3, 6), 1)
            elif r < 0.9:
                pb.polyline(rng.uniform(0, 200, (4, 2)).astype(np.float32))
            else:
                pb.move_to(*rng.uniform(0, 200, 2))
        if rng.uniform() < 0.5:
            pb.close()
        va, sa = pb.bake(backend="auto")
        pb._baked = None
        vb, sb = pb.bake(backend="numpy")
        np.testing.assert_array_equal(sa, sb, err_msg=str(trial))
        np.testing.assert_allclose(va, vb, atol=2e-4, err_msg=str(trial))


def test_native_bake_shapes():
    from vgtpu.geometry.path import PathBuilder

    for build in (
        lambda p: p.circle(50, 50, 40),
        lambda p: p.rounded_rect(5, 5, 90, 60, 12),
        lambda p: (p.move_to(0, 0), p.arc_to(50, 0, 50, 50, 20)),
        lambda p: p.ellipse(40, 40, 30, 18),
    ):
        pb = PathBuilder()
        pb.reset(1.0, 0.25)
        build(pb)
        va, sa = pb.bake(backend="auto")
        pb._baked = None
        vb, sb = pb.bake(backend="numpy")
        np.testing.assert_array_equal(sa, sb)
        np.testing.assert_allclose(va, vb, atol=2e-4)


def test_native_binner_tall_tiles():
    """tile_h > 64 must not overflow the native binner's row-overlap scratch
    (was a fixed double[64]); parity vs numpy at tile_h=72."""
    from vgtpu.raster.frame import execute_plan

    rng = np.random.default_rng(11)
    ops = _rand_ops(rng, n_ops=8, w=256, h=216)
    a = bin_frame(ops, 256, 216, tile_h=72, backend="native")
    b = bin_frame_numpy(ops, 256, 216, tile_h=72)
    img_a = np.asarray(execute_plan(a, background=(1, 1, 1, 1)))
    img_b = np.asarray(execute_plan(b, background=(1, 1, 1, 1)))
    np.testing.assert_allclose(img_a, img_b, atol=1e-4)


def test_resolve_tiles_matches_numpy():
    """Native vg_resolve_tiles (static clip + trailing prune + occlusion +
    depth cap + fancy flags) must produce byte-identical tile tables and
    buckets to the numpy oracle passes, across clip groups, scissors,
    opaque covers and depth-capped tiles."""
    import numpy as np

    import vgtpu as vg
    from vgtpu import native
    from vgtpu.api.config import ContextConfig
    from vgtpu.raster.binning import bin_frame, compute_tile_buckets
    from vgtpu.scenes.demo_ui import draw_benchmark_frame

    assert native.available()

    def buckets_both(plan, view_static=False):
        import warnings

        te = plan.tile_entries
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            nat = compute_tile_buckets(te, te.shape[0], plan.entry_kind, plan,
                                       view_static)
            orig = native.resolve_tiles
            native.resolve_tiles = lambda *a, **k: None
            try:
                ref = compute_tile_buckets(te, te.shape[0], plan.entry_kind,
                                           plan, view_static)
            finally:
                native.resolve_tiles = orig
        return nat, ref

    def compare(nat, ref):
        assert len(nat) == len(ref)
        for (te_a, ids_a, fl_a), (te_b, ids_b, fl_b) in zip(nat, ref):
            np.testing.assert_array_equal(te_a, te_b)
            np.testing.assert_array_equal(ids_a, ids_b)
            assert fl_a == fl_b

    # benchmark frame (clip groups, gradients, text, occluded tiger stack)
    ctx = vg.createContext()
    vg.begin(ctx, 0, 960, 544, 1.0)
    draw_benchmark_frame(ctx, 0.1)
    ctx._finalize_ops()
    plan = bin_frame(ctx.ops, 960, 544)
    compare(*buckets_both(plan))

    # depth-capped clipped scene
    ctx = vg.createContext(ContextConfig(max_ops_per_tile_cap=8))
    vg.begin(ctx, 0, 128, 8, 1.0)
    vg.beginClip(ctx, vg.ClipRule.In)
    vg.beginPath(ctx)
    vg.rect(ctx, 0, 0, 64, 8)
    vg.fillPath(ctx, vg.Colors.Black, vg.FillFlags.Convex)
    vg.endClip(ctx)
    for i in range(20):
        vg.beginPath(ctx)
        vg.rect(ctx, 2 + (i % 5), 1, 100, 6)
        vg.fillPath(ctx, vg.color4ub(255, 0, 0, 60), vg.FillFlags.ConvexAA)
    vg.resetClip(ctx)
    ctx._finalize_ops()
    plan = bin_frame(ctx.ops, 128, 8, depth_cap=8)
    compare(*buckets_both(plan))


def test_resolve_tiles_matches_numpy_view_static():
    """The view_static branch (retained pan: reach-2 scissor windows, pan
    backdrop windows, view-invariant occlusion) must also match numpy."""
    import numpy as np

    import vgtpu as vg
    from vgtpu import native
    from vgtpu.raster.binning import bin_frame_numpy, compute_tile_buckets
    from vgtpu.raster.retained import translate_ops

    assert native.available()
    ctx = vg.createContext()
    vg.begin(ctx, 0, 384, 160, 1.0)
    import tests.test_retained as tr

    tr._scene(ctx)
    ctx._finalize_ops()
    from vgtpu.raster.binning import expand_tri_batches

    ops = translate_ops(expand_tri_batches(ctx.ops), 128.0, 8.0)
    plan = bin_frame_numpy(ops, 512, 168, tile_h=8, tile_w=128, pan_margin=True)
    te = plan.tile_entries
    nat = compute_tile_buckets(te, te.shape[0], plan.entry_kind, plan,
                               view_static=True)
    orig = native.resolve_tiles
    native.resolve_tiles = lambda *a, **k: None
    try:
        ref = compute_tile_buckets(te, te.shape[0], plan.entry_kind, plan,
                                   view_static=True)
    finally:
        native.resolve_tiles = orig
    assert len(nat) == len(ref)
    for (te_a, ids_a, fl_a), (te_b, ids_b, fl_b) in zip(nat, ref):
        np.testing.assert_array_equal(te_a, te_b)
        np.testing.assert_array_equal(ids_a, ids_b)
        assert fl_a == fl_b
