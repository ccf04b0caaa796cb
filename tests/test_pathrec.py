"""Parity: the C fast-path recorder (native/vg_pathrec.c) must produce a
bit-identical verb stream to the pure-Python PathBuilder for every verb type
(the Python recorder is the oracle; see geometry/path.py docstring)."""

from __future__ import annotations

import numpy as np
import pytest

from vgtpu import native
from vgtpu.geometry.path import (
    R_ARC,
    R_ARCTO,
    R_CLOSE,
    R_CUBIC,
    R_LINE,
    R_MOVE,
    R_QUAD,
    FastPathBuilder,
    PathBuilder,
    pack_path_program,
    replay_packed,
)

pytestmark = pytest.mark.skipif(
    native.pathrec() is None, reason="pathrec extension unavailable")


def _pair():
    return PathBuilder(), FastPathBuilder(native.pathrec())


def _assert_same(py: PathBuilder, fast: FastPathBuilder):
    a = py.snapshot()
    b = fast.snapshot()
    np.testing.assert_array_equal(a["verbs"], b["verbs"])
    np.testing.assert_array_equal(a["sf"], b["sf"])
    np.testing.assert_array_equal(a["cf"], b["cf"])
    np.testing.assert_array_equal(a["af"], b["af"])
    np.testing.assert_array_equal(a["pa"], b["pa"])
    np.testing.assert_array_equal(a["pp"], b["pp"])
    # bake parity (both through the same backend choice)
    va, sa = py.bake()
    vb, sb = fast.bake()
    np.testing.assert_allclose(va, vb, atol=1e-6)
    np.testing.assert_array_equal(sa, sb)


def _run_both(fn):
    py, fast = _pair()
    py.reset(1.0, 0.25)
    fast.reset(1.0, 0.25)
    fn(py)
    fn(fast)
    _assert_same(py, fast)


def test_simple_verbs():
    def scene(p):
        p.move_to(10.5, 20.25)
        p.line_to(30.0, 40.0)
        p.cubic_to(1, 2, 3, 4, 5, 6)
        p.quadratic_to(7, 8, 9, 10)
        p.close()

    _run_both(scene)


def test_arcs_and_shapes():
    def scene(p):
        p.move_to(0, 0)
        p.arc_to(50, 0, 50, 50, 20)
        p.arc(100, 100, 30, 0.3, 2.5, 1)
        p.arc(200, 100, 30, 2.5, 0.3, 0)
        p.rect(5, 6, 70, 40)
        p.rounded_rect(100, 10, 80, 40, 8)
        p.rounded_rect(100, 10, 50, 50, 30)     # degenerates to circle
        p.rounded_rect(0, 0, 60, 40, 0.05)      # degenerates to rect
        p.rounded_rect_varying(10, 10, 90, 60, 4, 0, 12, 31)
        p.circle(300, 300, 45)
        p.ellipse(400, 300, 45, 25)

    _run_both(scene)


def test_arc_to_degenerate_line():
    def scene(p):
        p.move_to(0, 0)
        p.arc_to(10, 0, 20, 0, 5)     # collinear -> lineTo
        p.arc_to(10, 0, 10, 0, 5)     # zero dir vectors

    _run_both(scene)


def test_polyline_and_mixed():
    coords = np.array([[0, 0], [10, 3], [20, -2], [30, 8]], np.float32)

    def scene(p):
        p.move_to(-5, -5)
        p.polyline(coords)
        p.line_to(40, 40)
        p.polyline(coords[::-1].copy())
        p.close()

    _run_both(scene)


def test_reset_reuse():
    py, fast = _pair()
    for k in range(3):
        py.reset(1.0 + k, 0.25)
        fast.reset(1.0 + k, 0.25)
        py.move_to(k, k)
        fast.move_to(k, k)
        py.circle(10 * k, 5, 3 + k)
        fast.circle(10 * k, 5, 3 + k)
        _assert_same(py, fast)


def test_version_changes_on_every_edit():
    _mod = native.pathrec()
    fast = FastPathBuilder(_mod)
    v0 = fast.version
    fast.move_to(0, 0)
    v1 = fast.version
    assert v1 != v0
    fast.reset(1.0, 0.25)
    v2 = fast.version
    assert v2 != v1
    # same content after reset must NOT reuse the old version
    fast.move_to(0, 0)
    assert fast.version != v1


def test_packed_replay_parity():
    calls = [
        (R_MOVE, 1.0, 2.0),
        (R_LINE, 3.0, 4.5),
        (R_CUBIC, 1, 2, 3, 4, 5, 6),
        (R_QUAD, 0.5, 0.25, 9.0, 9.0),
        (R_ARCTO, 20, 0, 20, 20, 8),
        (R_ARC, 50, 50, 10, 0.0, 3.0, 1),
        (R_CLOSE,),
        (R_MOVE, -4, -4),
        (R_LINE, -8, 2),
    ]
    verbs, args = pack_path_program(calls)
    py, fast = _pair()
    py.reset(1.0, 0.25)
    fast.reset(1.0, 0.25)
    replay_packed(py, verbs, args)
    fast.replay(verbs, args)
    _assert_same(py, fast)


def test_control_bounds_parity():
    def scene(p):
        p.move_to(10, 10)
        p.cubic_to(50, -20, 80, 90, 100, 10)
        p.arc(200, 50, 25, 0, 3, 1)
        p.polyline(np.array([[300, 5], [310, 80]], np.float32))

    py, fast = _pair()
    py.reset(1.0, 0.25)
    fast.reset(1.0, 0.25)
    scene(py)
    scene(fast)
    np.testing.assert_allclose(py.control_bounds(), fast.control_bounds(),
                               atol=1e-9)
    e1, e2 = _pair()
    assert e1.control_bounds() is None
    assert e2.control_bounds() is None


def test_fuzz_random_programs():
    rng = np.random.default_rng(7)
    ops = [R_MOVE, R_LINE, R_CUBIC, R_QUAD, R_ARC, R_CLOSE, R_ARCTO]
    for _ in range(20):
        n = int(rng.integers(1, 40))
        calls = []
        for _k in range(n):
            op = ops[int(rng.integers(0, len(ops)))]
            if op == R_ARC:
                calls.append((op, *rng.uniform(-100, 100, 3),
                              *rng.uniform(-7, 7, 2), int(rng.integers(0, 2))))
            elif op == R_ARCTO:
                calls.append((op, *rng.uniform(-100, 100, 4),
                              float(rng.uniform(0.1, 50))))
            elif op == R_CLOSE:
                calls.append((op,))
            else:
                na = {R_MOVE: 2, R_LINE: 2, R_CUBIC: 6, R_QUAD: 4}[op]
                calls.append((op, *rng.uniform(-200, 200, na)))
        verbs, args = pack_path_program(calls)
        py, fast = _pair()
        py.reset(1.0, 0.25)
        fast.reset(1.0, 0.25)
        replay_packed(py, verbs, args)
        fast.replay(verbs, args)
        _assert_same(py, fast)


def test_fast_bake_numpy_fallback(monkeypatch):
    """FastPathBuilder.bake must fall back to the numpy oracle bit-exactly
    when libvgnative is unavailable (pathrec built, C++ lib missing)."""
    from vgtpu import native as native_mod

    fast = FastPathBuilder(native.pathrec())
    fast.reset(1.3, 0.25)
    fast.move_to(3, 4)
    fast.cubic_to(10, -5, 40, 55, 60, 10)
    fast.rounded_rect(5, 5, 80, 40, 7)
    fast.polyline(np.array([[0, 0], [5, 9], [11, 2]], np.float32))
    v_native, s_native = fast.bake()

    fast2 = FastPathBuilder(native.pathrec())
    fast2.reset(1.3, 0.25)
    fast2.move_to(3, 4)
    fast2.cubic_to(10, -5, 40, 55, 60, 10)
    fast2.rounded_rect(5, 5, 80, 40, 7)
    fast2.polyline(np.array([[0, 0], [5, 9], [11, 2]], np.float32))
    monkeypatch.setattr(native_mod, "bake_path_native",
                        lambda *a, **k: None)
    v_fb, s_fb = fast2.bake()
    np.testing.assert_allclose(v_fb, v_native, atol=2e-4)
    np.testing.assert_array_equal(s_fb, s_native)


def test_append_packed_path_dtype_coercion():
    """Context.appendPackedPath must accept loosely-typed arrays (int64
    verbs, list args) identically on both recorder backends."""
    import vgtpu as vg

    verbs64 = np.array([R_MOVE, R_LINE, R_CLOSE], np.int64)
    args = np.zeros((3, 8))
    args[0, :2] = (1, 2)
    args[1, :2] = (3, 4)

    ctx = vg.createContext()
    vg.begin(ctx, 0, 64, 64, 1.0)
    ctx.beginPath()
    ctx.appendPackedPath(verbs64, args)
    snap_fast = ctx.path.snapshot()
    np.testing.assert_array_equal(snap_fast["verbs"], [0, 1, 4])
    np.testing.assert_array_equal(snap_fast["sf"], [1, 2, 3, 4])

    ctx2 = vg.createContext()
    ctx2.path = PathBuilder()
    vg.begin(ctx2, 0, 64, 64, 1.0)
    ctx2.beginPath()
    ctx2.appendPackedPath(verbs64, args)
    snap_py = ctx2.path.snapshot()
    np.testing.assert_array_equal(snap_py["verbs"], snap_fast["verbs"])
    np.testing.assert_array_equal(snap_py["sf"], snap_fast["sf"])


def test_transform_captured_at_first_draw():
    """transformPath semantics (vg.cpp:4957-4975): the render transform is
    captured at the FIRST fill/stroke after beginPath and reused by later
    draws of the same path — on both the deferred and immediate backends."""
    import vgtpu as vg

    def scene(ctx, immediate):
        vg.begin(ctx, 0, 128, 64, 1.0)
        if immediate:
            ctx._immediate_geom = True
        ctx.beginPath()
        ctx.rect(10, 10, 20, 20)
        ctx.fillPath(vg.Colors.Red, vg.FillFlags.Convex)
        ctx.transformTranslate(30, 0)
        ctx.fillPath(vg.Colors.Blue, vg.FillFlags.Convex)   # same capture
        ctx._finalize_ops()
        ctx._immediate_geom = False
        return [op.edges.copy() for op in ctx.ops]

    ctx = vg.createContext()
    e_def = scene(ctx, immediate=False)
    e_imm = scene(vg.createContext(), immediate=True)
    assert len(e_def) == len(e_imm)
    for a, b in zip(e_def, e_imm):
        np.testing.assert_allclose(a, b, atol=1e-5)
    # both draws of the path share the first-draw transform: identical edges
    np.testing.assert_allclose(e_def[0], e_def[-1], atol=1e-6)
    # a NEW path after the translate picks up the new transform
    ctx3 = vg.createContext()
    vg.begin(ctx3, 0, 128, 64, 1.0)
    ctx3.transformTranslate(30, 0)
    ctx3.beginPath()
    ctx3.rect(10, 10, 20, 20)
    ctx3.fillPath(vg.Colors.Red, vg.FillFlags.Convex)
    ctx3._finalize_ops()
    assert abs(float(ctx3.ops[0].edges[:, 0].min()) - 40.0) < 1e-4


def test_culling_respects_first_draw_transform():
    """AllowCommandCulling must test bounds with the transform the draw will
    RENDER with (the first-draw capture), not the live transform — a
    transform change between two fills of one path must not cull the second
    fill (it renders at the captured position, on-screen)."""
    import vgtpu as vg

    def run(flags):
        ctx = vg.createContext()
        cl = vg.createCommandList(ctx, flags)
        vg.clBeginPath(ctx, cl)
        vg.clRect(ctx, cl, 10, 10, 20, 20)
        vg.clFillPath(ctx, cl, vg.Colors.Red, vg.FillFlags.Convex)
        vg.clTransformTranslate(ctx, cl, 5000, 0)      # off-screen shift
        vg.clFillPath(ctx, cl, vg.Colors.Blue, vg.FillFlags.Convex)
        vg.begin(ctx, 0, 128, 64, 1.0)
        vg.submitCommandList(ctx, cl)
        ctx._finalize_ops()
        return len(ctx.ops)

    n_cull = run(vg.CommandListFlags.AllowCommandCulling)
    n_none = run(0)
    assert n_cull == n_none == 2


def test_context_uses_fast_recorder_and_matches_python():
    """Whole-frame parity: the benchmark scene recorded through the fast
    recorder must produce identical ops (fingerprint) to the Python
    recorder."""
    import vgtpu as vg

    def record(ctx):
        vg.begin(ctx, 0, 640, 360, 1.0)
        from vgtpu.scenes.tiger import draw_tiger

        draw_tiger(ctx, 5, 5, 0.35)
        vg.beginPath(ctx)
        vg.roundedRect(ctx, 400, 40, 180, 120, 9)
        vg.fillPath(ctx, vg.color4ub(30, 40, 50, 255), vg.FillFlags.ConvexAA)
        ctx._finalize_ops()
        return ctx

    ctx_fast = record(vg.createContext())
    assert ctx_fast.path.is_native, "Context should pick the C recorder"

    ctx_py = vg.createContext()
    ctx_py.path = PathBuilder()           # force the oracle recorder
    for n in ("moveTo", "lineTo", "cubicTo", "quadraticTo", "arcTo", "arc",
              "rect", "roundedRect", "roundedRectVarying", "circle",
              "ellipse", "closePath"):
        ctx_py.__dict__.pop(n, None)      # drop the bound C fast methods
    ctx_py._path_transformed = None
    record(ctx_py)

    assert len(ctx_fast.ops) == len(ctx_py.ops)
    for a, b in zip(ctx_fast.ops, ctx_py.ops):
        assert a.kind == b.kind and a.paint_kind == b.paint_kind
        np.testing.assert_allclose(a.edges, b.edges, atol=1e-5)
