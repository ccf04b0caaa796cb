"""Command lists: record/replay, local handles, nesting, caching semantics
(reference: vg.cpp:2323-2966, :4273-4637, :5674-6211)."""

import numpy as np

import vgtpu as vg


def make_ctx(w=128, h=64):
    ctx = vg.createContext()
    vg.begin(ctx, 0, w, h, 1.0)
    return ctx


def record_square(ctx, flags=0):
    cl = vg.createCommandList(ctx, flags)
    vg.beginCommandList(ctx, cl)
    vg.beginPath(ctx)
    vg.rect(ctx, 10, 10, 30, 30)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
    vg.endCommandList(ctx)
    return cl


def test_record_and_submit():
    ctx = make_ctx()
    cl = record_square(ctx)
    assert len(ctx.ops) == 0          # nothing drawn during recording
    vg.submitCommandList(ctx, cl)
    assert len(ctx.ops) == 1
    vg.end(ctx, background=(0, 0, 0, 0))
    img = np.asarray(ctx.frame_image)
    assert img[20, 20, 3] == 1.0


def test_submit_respects_current_transform():
    ctx = make_ctx()
    cl = record_square(ctx)
    vg.transformTranslate(ctx, 50, 0)
    vg.submitCommandList(ctx, cl)
    vg.end(ctx, background=(0, 0, 0, 0))
    img = np.asarray(ctx.frame_image)
    assert img[20, 70, 3] == 1.0
    assert img[20, 20, 3] == 0.0


def test_local_gradient_handles():
    ctx = make_ctx()
    cl = vg.createCommandList(ctx, 0)
    vg.beginCommandList(ctx, cl)
    g = vg.createLinearGradient(ctx, 0, 0, 64, 0, vg.Colors.Red, vg.Colors.Blue)
    assert g.flags == 1               # local handle (vg.cpp:2732-2734)
    vg.beginPath(ctx)
    vg.rect(ctx, 0, 10, 64, 30)
    vg.fillPath(ctx, g, vg.FillFlags.ConvexAA)
    vg.endCommandList(ctx)
    vg.submitCommandList(ctx, cl)
    vg.end(ctx, background=(0, 0, 0, 0))
    img = np.asarray(ctx.frame_image)
    assert img[20, 4, 0] > 0.85       # red end
    assert img[20, 60, 2] > 0.85      # blue end


def test_nested_submit():
    ctx = make_ctx()
    inner = record_square(ctx)
    outer = vg.createCommandList(ctx, 0)
    vg.beginCommandList(ctx, outer)
    vg.transformTranslate(ctx, 60, 0)
    vg.submitCommandList(ctx, inner)
    vg.endCommandList(ctx)
    vg.submitCommandList(ctx, outer)
    vg.end(ctx, background=(0, 0, 0, 0))
    img = np.asarray(ctx.frame_image)
    assert img[20, 80, 3] == 1.0


def test_cacheable_reuses_geometry_and_invalidates_on_scale():
    ctx = make_ctx()
    cl = record_square(ctx, flags=vg.CommandListFlags.Cacheable)
    clobj = ctx.command_lists[cl.idx]

    vg.submitCommandList(ctx, cl)
    assert clobj.cache_valid
    first_slots = dict(clobj.cache_slots)

    # translation: cache reused (vg.cpp:4287-4300 — only avgScale invalidates)
    vg.transformTranslate(ctx, 50, 0)
    vg.submitCommandList(ctx, cl)
    assert clobj.cache_slots is not None and clobj.cache_valid
    assert set(clobj.cache_slots.keys()) == set(first_slots.keys())

    # scale change: rebuilt
    vg.transformScale(ctx, 2, 2)
    vg.submitCommandList(ctx, cl)
    assert clobj.cache_valid
    assert clobj.cache_avg_scale != 1.0

    vg.end(ctx, background=(0, 0, 0, 0))
    img = np.asarray(ctx.frame_image)
    assert img[20, 20, 3] == 1.0      # first submit
    assert img[20, 70, 3] == 1.0      # translated cached submit


def test_cached_submit_pixel_identical_to_direct():
    ctx1 = make_ctx()
    cl = record_square(ctx1, flags=vg.CommandListFlags.Cacheable)
    vg.submitCommandList(ctx1, cl)          # builds cache
    vg.end(ctx1, background=(0, 0, 0, 0))
    direct = np.asarray(ctx1.frame_image).copy()

    vg.begin(ctx1, 0, 128, 64, 1.0)
    vg.submitCommandList(ctx1, cl)          # cached replay
    vg.end(ctx1, background=(0, 0, 0, 0))
    cached = np.asarray(ctx1.frame_image)
    np.testing.assert_allclose(direct, cached, atol=1e-5)


def test_command_culling():
    ctx = make_ctx()
    cl = record_square(ctx, flags=vg.CommandListFlags.AllowCommandCulling)
    vg.setScissor(ctx, 0, 0, 0, 0)    # empty scissor
    vg.submitCommandList(ctx, cl)
    assert len(ctx.ops) == 0          # draw commands culled


def test_reset_command_list():
    ctx = make_ctx()
    cl = record_square(ctx)
    vg.resetCommandList(ctx, cl)
    vg.submitCommandList(ctx, cl)
    assert len(ctx.ops) == 0


def test_depth_limit():
    ctx = make_ctx()
    cl = vg.createCommandList(ctx, 0)
    vg.beginCommandList(ctx, cl)
    vg.submitCommandList(ctx, cl)     # self-recursive
    vg.beginPath(ctx)
    vg.rect(ctx, 10, 10, 30, 30)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
    vg.endCommandList(ctx)
    vg.submitCommandList(ctx, cl)     # must terminate (depth cap 16)
    # the 16 identical fills merge into one op (allocDrawCommand-style
    # batching); the depth cap shows as 16 rect loops of 4 edges
    ctx._finalize_ops()
    total_edges = sum(len(op.edges) for op in ctx.ops)
    assert total_edges == 16 * 4


def test_cached_replay_preserves_clip_semantics():
    """Clip shapes recorded in a Cacheable list must keep their CLIP kind on
    cached replay (geometry cache stores op kinds)."""
    def build(ctx):
        cl = vg.createCommandList(ctx, vg.CommandListFlags.Cacheable)
        vg.beginCommandList(ctx, cl)
        vg.beginClip(ctx, vg.ClipRule.In)
        vg.beginPath(ctx)
        vg.circle(ctx, 40, 32, 20)
        vg.fillPath(ctx, vg.Colors.Black, vg.FillFlags.Convex)
        vg.endClip(ctx)
        vg.beginPath(ctx)
        vg.rect(ctx, 0, 0, 128, 64)
        vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
        vg.resetClip(ctx)
        vg.endCommandList(ctx)
        return cl

    ctx = make_ctx()
    cl = build(ctx)
    vg.submitCommandList(ctx, cl)            # builds cache
    vg.end(ctx, background=(0, 0, 0, 0))
    direct = np.asarray(ctx.frame_image).copy()
    assert direct[32, 40, 3] == 1.0          # inside clip circle
    assert direct[5, 120, 3] == 0.0          # outside clip

    vg.begin(ctx, 0, 128, 64, 1.0)
    vg.submitCommandList(ctx, cl)            # cached replay
    vg.end(ctx, background=(0, 0, 0, 0))
    cached = np.asarray(ctx.frame_image)
    np.testing.assert_allclose(direct, cached, atol=1e-5)


def test_direct_cl_recording_api():
    """clXXX(ctx, handle, ...) records without beginCommandList (vg.h:495)."""
    ctx = make_ctx()
    cl = vg.createCommandList(ctx, 0)
    vg.clBeginPath(ctx, cl)
    vg.clRect(ctx, cl, 10, 10, 30, 30)
    g = vg.clCreateLinearGradient(ctx, cl, 10, 10, 40, 40, vg.Colors.Red, vg.Colors.Blue)
    assert g.flags == 1  # local handle
    vg.clFillPath(ctx, cl, g, vg.FillFlags.ConvexAA)
    assert len(ctx.ops) == 0
    vg.submitCommandList(ctx, cl)
    vg.end(ctx, background=(0, 0, 0, 0))
    img = np.asarray(ctx.frame_image)
    assert img[20, 20, 3] == 1.0


def test_command_list_ref():
    ctx = make_ctx()
    cl = vg.createCommandList(ctx, 0)
    ref = vg.makeCommandListRef(ctx, cl)
    ref.beginPath()
    ref.circle(64, 32, 20)
    ref.fillPath(vg.Colors.White, vg.FillFlags.ConvexAA)
    ref.submit()
    vg.end(ctx, background=(0, 0, 0, 0))
    img = np.asarray(ctx.frame_image)
    assert img[32, 64, 3] > 0.999


def test_cacheable_list_with_mergeable_draws():
    """Two same-paint draws would merge into one op; the geometry cache must
    still capture both (merge is suppressed while building the cache)."""
    ctx = make_ctx()
    cl = vg.createCommandList(ctx, vg.CommandListFlags.Cacheable)
    vg.beginCommandList(ctx, cl)
    vg.beginPath(ctx)
    vg.rect(ctx, 10, 10, 20, 20)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
    vg.beginPath(ctx)
    vg.rect(ctx, 60, 10, 20, 20)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)  # same paint: mergeable
    vg.endCommandList(ctx)

    vg.submitCommandList(ctx, cl)            # builds cache
    vg.end(ctx, background=(0, 0, 0, 0))
    direct = np.asarray(ctx.frame_image).copy()
    assert direct[20, 20, 3] == 1.0 and direct[20, 70, 3] == 1.0

    vg.begin(ctx, 0, 128, 64, 1.0)
    vg.submitCommandList(ctx, cl)            # cached replay
    vg.end(ctx, background=(0, 0, 0, 0))
    cached = np.asarray(ctx.frame_image)
    np.testing.assert_allclose(direct, cached, atol=1e-5)


def test_cached_replay_under_outer_clip():
    """A cache primed OUTSIDE a clip must act as clip geometry when submitted
    inside beginClip/endClip (the reference routes cached meshes through the
    stencil path per the live m_RecordClipCommands)."""
    ctx = make_ctx()
    cl = vg.createCommandList(ctx, vg.CommandListFlags.Cacheable)
    vg.beginCommandList(ctx, cl)
    vg.beginPath(ctx)
    vg.circle(ctx, 40, 32, 20)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.Convex)
    vg.endCommandList(ctx)

    vg.submitCommandList(ctx, cl)          # builds cache as a plain draw
    vg.end(ctx, background=(0, 0, 0, 0))

    # now use the cached list as clip geometry
    vg.begin(ctx, 0, 128, 64, 1.0)
    vg.beginClip(ctx, vg.ClipRule.In)
    vg.submitCommandList(ctx, cl)          # cached replay INSIDE clip
    vg.endClip(ctx)
    vg.beginPath(ctx)
    vg.rect(ctx, 0, 0, 128, 64)
    vg.fillPath(ctx, vg.Colors.Red, vg.FillFlags.ConvexAA)
    vg.resetClip(ctx)
    vg.end(ctx, background=(0, 0, 0, 0))
    img = np.asarray(ctx.frame_image)
    assert img[32, 40, 0] > 0.9            # red INSIDE the clip circle
    assert img[32, 40, 3] == 1.0
    assert img[5, 120, 3] == 0.0           # clipped outside

    # and the inverse: primed inside a clip, replayed as a plain draw
    ctx2 = make_ctx()
    cl2 = vg.createCommandList(ctx2, vg.CommandListFlags.Cacheable)
    vg.beginCommandList(ctx2, cl2)
    vg.beginPath(ctx2)
    vg.circle(ctx2, 40, 32, 20)
    vg.fillPath(ctx2, vg.Colors.Blue, vg.FillFlags.Convex)
    vg.endCommandList(ctx2)
    vg.beginClip(ctx2, vg.ClipRule.In)
    vg.submitCommandList(ctx2, cl2)        # builds cache as clip geometry
    vg.endClip(ctx2)
    vg.resetClip(ctx2)
    vg.end(ctx2, background=(0, 0, 0, 0))

    vg.begin(ctx2, 0, 128, 64, 1.0)
    vg.submitCommandList(ctx2, cl2)        # cached replay as a DRAW
    vg.end(ctx2, background=(0, 0, 0, 0))
    img2 = np.asarray(ctx2.frame_image)
    assert img2[32, 40, 2] > 0.9           # blue circle actually drawn


def test_cacheable_dpr2_translate_after_cache():
    """dpr=2 + Cacheable: cached edges are framebuffer-space, so the rebase
    must fold the dpr viewport scale (vg.cpp:1148-1154 semantics).  A logical
    translate of (50,10) must land at framebuffer (100,20)."""
    ctx = vg.createContext()
    vg.begin(ctx, 0, 128, 64, 2.0)         # framebuffer 256x128
    cl = record_square(ctx, flags=vg.CommandListFlags.Cacheable)
    vg.submitCommandList(ctx, cl)          # builds cache at dpr=2
    vg.end(ctx, background=(0, 0, 0, 0))
    direct = np.asarray(ctx.frame_image).copy()
    assert direct.shape[:2] == (128, 256)
    assert direct[40, 40, 3] == 1.0        # logical (20,20) -> fb (40,40)

    vg.begin(ctx, 0, 128, 64, 2.0)
    vg.transformTranslate(ctx, 50, 10)     # logical units
    vg.submitCommandList(ctx, cl)          # cached replay
    vg.end(ctx, background=(0, 0, 0, 0))
    cached = np.asarray(ctx.frame_image)
    assert cached[60, 140, 3] == 1.0       # fb (40+100, 40+20)
    assert cached[40, 40, 3] == 0.0        # moved away

    # direct (uncached) equivalent must be pixel-identical
    ctx2 = vg.createContext()
    vg.begin(ctx2, 0, 128, 64, 2.0)
    cl2 = record_square(ctx2, flags=0)
    vg.transformTranslate(ctx2, 50, 10)
    vg.submitCommandList(ctx2, cl2)
    vg.end(ctx2, background=(0, 0, 0, 0))
    np.testing.assert_allclose(cached, np.asarray(ctx2.frame_image), atol=1e-5)


def test_dpr_change_invalidates_cache():
    ctx = vg.createContext()
    vg.begin(ctx, 0, 128, 64, 1.0)
    cl = record_square(ctx, flags=vg.CommandListFlags.Cacheable)
    vg.submitCommandList(ctx, cl)          # cache at dpr=1
    vg.end(ctx, background=(0, 0, 0, 0))

    vg.begin(ctx, 0, 128, 64, 2.0)         # dpr changed -> must rebuild
    vg.submitCommandList(ctx, cl)
    vg.end(ctx, background=(0, 0, 0, 0))
    img = np.asarray(ctx.frame_image)
    assert img.shape[:2] == (128, 256)
    assert img[40, 40, 3] == 1.0           # logical (20,20) -> fb (40,40)


def test_cached_replay_thin_stroke_alpha():
    """Thin strokes replayed from the cache must apply the thin-stroke alpha
    law (vg.cpp:3416-3420) — not render ~12x more opaque."""
    def build(ctx):
        cl = vg.createCommandList(ctx, vg.CommandListFlags.Cacheable)
        vg.beginCommandList(ctx, cl)
        vg.beginPath(ctx)
        vg.moveTo(ctx, 10, 32)
        vg.lineTo(ctx, 118, 32)
        vg.strokePath(ctx, vg.Colors.White, 0.3, vg.StrokeFlags.ButtMiterAA)
        vg.endCommandList(ctx)
        return cl

    ctx = make_ctx()
    cl = build(ctx)
    vg.submitCommandList(ctx, cl)          # builds cache (direct path)
    vg.end(ctx, background=(0, 0, 0, 0))
    direct = np.asarray(ctx.frame_image).copy()

    vg.begin(ctx, 0, 128, 64, 1.0)
    vg.submitCommandList(ctx, cl)          # cached replay
    vg.end(ctx, background=(0, 0, 0, 0))
    cached = np.asarray(ctx.frame_image)
    np.testing.assert_allclose(direct, cached, atol=1e-5)
    # sanity: the law actually fired (alpha ~ 0.09, nowhere near full)
    assert 0.0 < cached[32, 64, 3] < 0.2


def test_per_command_scissor_culling():
    """AllowCommandCulling skips draws whose transformed bounds miss the
    scissor (vg.cpp:4534-4567), not just draws under an empty scissor."""
    ctx = make_ctx()
    cl = vg.createCommandList(ctx, vg.CommandListFlags.AllowCommandCulling)
    vg.beginCommandList(ctx, cl)
    vg.beginPath(ctx)
    vg.rect(ctx, 10, 10, 20, 20)          # inside the scissor
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
    vg.beginPath(ctx)
    vg.rect(ctx, 90, 10, 20, 20)          # fully outside the scissor
    vg.fillPath(ctx, vg.Colors.Red, vg.FillFlags.ConvexAA)
    vg.beginPath(ctx)
    vg.moveTo(ctx, 95, 40)
    vg.lineTo(ctx, 120, 40)               # stroke fully outside
    vg.strokePath(ctx, vg.Colors.Blue, 2.0, vg.StrokeFlags.ButtMiterAA)
    vg.endCommandList(ctx)

    vg.setScissor(ctx, 0, 0, 50, 64)
    vg.submitCommandList(ctx, cl)
    # only the inside rect produced an op
    assert len(ctx.ops) == 1
    vg.end(ctx, background=(0, 0, 0, 0))
    img = np.asarray(ctx.frame_image)
    assert img[20, 20, 3] == 1.0

    # without culling, all three draws emit (scissor still clips pixels)
    ctx2 = make_ctx()
    cl2 = vg.createCommandList(ctx2, 0)
    vg.beginCommandList(ctx2, cl2)
    vg.beginPath(ctx2)
    vg.rect(ctx2, 90, 10, 20, 20)
    vg.fillPath(ctx2, vg.Colors.Red, vg.FillFlags.ConvexAA)
    vg.endCommandList(ctx2)
    vg.setScissor(ctx2, 0, 0, 50, 64)
    vg.submitCommandList(ctx2, cl2)
    assert len(ctx2.ops) == 1


def test_cached_replay_scissor_culling():
    """Culling also applies on the cached-geometry replay path: a clipped-out
    cached draw produces zero entries."""
    ctx = make_ctx()
    cl = vg.createCommandList(
        ctx, vg.CommandListFlags.Cacheable | vg.CommandListFlags.AllowCommandCulling)
    vg.beginCommandList(ctx, cl)
    vg.beginPath(ctx)
    vg.rect(ctx, 80, 10, 30, 30)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
    vg.endCommandList(ctx)

    vg.submitCommandList(ctx, cl)          # builds cache (full viewport)
    assert len(ctx.ops) == 1
    vg.end(ctx, background=(0, 0, 0, 0))

    vg.begin(ctx, 0, 128, 64, 1.0)
    vg.setScissor(ctx, 0, 0, 40, 64)       # cached rect now outside
    vg.submitCommandList(ctx, cl)          # cached replay
    assert len(ctx.ops) == 0


def test_cache_build_never_culls():
    """A draw culled during the cache-BUILD pass would have no slot, and a
    later cached replay under a different scissor would fall back to stale
    transient path state (review finding).  Builds must capture everything;
    replays cull from cached bounds."""
    ctx = make_ctx()
    cl = vg.createCommandList(
        ctx, vg.CommandListFlags.Cacheable | vg.CommandListFlags.AllowCommandCulling)
    vg.beginCommandList(ctx, cl)
    vg.beginPath(ctx)
    vg.rect(ctx, 80, 10, 30, 30)          # outside the build-time scissor
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
    vg.endCommandList(ctx)

    vg.setScissor(ctx, 0, 0, 40, 64)      # scissor excludes the rect
    vg.submitCommandList(ctx, cl)         # BUILD: must still cache the rect
    vg.end(ctx, background=(0, 0, 0, 0))
    img = np.asarray(ctx.frame_image)
    assert img[20, 90, 3] == 0.0          # scissor still clips pixels

    vg.begin(ctx, 0, 128, 64, 1.0)        # full scissor now
    # poison the transient path state: the old fallback would draw THIS
    vg.beginPath(ctx)
    vg.circle(ctx, 20, 40, 10)
    vg.submitCommandList(ctx, cl)         # cached replay
    vg.end(ctx, background=(0, 0, 0, 0))
    img = np.asarray(ctx.frame_image)
    assert img[20, 90, 3] == 1.0          # the RECT renders
    assert img[40, 20, 3] == 0.0          # the poison circle does NOT


def test_command_list_save_load_roundtrip(tmp_path):
    """saveCommandList/loadCommandList: a serialized list (SURVEY §5
    checkpoint/resume analogue) replays pixel-identically in a FRESH
    context, and a Cacheable snapshot restores its tessellation cache (no
    rebuild on first submit)."""
    import numpy as np

    import vgtpu as vg

    def record(ctx):
        cl = vg.createCommandList(ctx, vg.CommandListFlags.Cacheable)
        vg.beginCommandList(ctx, cl)
        g = vg.createLinearGradient(ctx, 10, 10, 200, 60,
                                    vg.color4ub(255, 0, 0, 255),
                                    vg.color4ub(0, 0, 255, 255))
        vg.beginPath(ctx)
        vg.roundedRect(ctx, 10, 10, 190, 60, 9)
        vg.fillPath(ctx, g, vg.FillFlags.ConvexAA)
        vg.beginPath(ctx)
        vg.moveTo(ctx, 20, 100)
        vg.cubicTo(ctx, 80, 40, 160, 160, 240, 90)
        vg.strokePath(ctx, vg.Colors.White, 4.0, vg.StrokeFlags.RoundRoundAA)
        vg.beginPath(ctx)
        vg.circle(ctx, 80, 90, 25)
        vg.fillPath(ctx, vg.color4ub(30, 200, 120, 180),
                    vg.FillFlags.ConcaveEvenOddAA)
        vg.endCommandList(ctx)
        return cl

    bg = (0.1, 0.1, 0.1, 1.0)
    ctx = vg.createContext()
    vg.begin(ctx, 0, 256, 160, 1.0)
    cl = record(ctx)
    vg.submitCommandList(ctx, cl)       # builds the cache
    want = np.asarray(vg.end(ctx, background=bg))

    path = str(tmp_path / "scene.vgcl")
    assert vg.saveCommandList(ctx, cl, path)

    ctx2 = vg.createContext()
    vg.begin(ctx2, 0, 256, 160, 1.0)
    h2 = vg.loadCommandList(ctx2, path)
    cl2 = ctx2.command_lists[h2.idx]
    assert cl2.cache_valid and len(cl2.cache_slots)
    n_slots_before = len(cl2.cache_slots)
    vg.submitCommandList(ctx2, h2)      # replays from the restored cache
    got = np.asarray(vg.end(ctx2, background=bg))
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert len(cl2.cache_slots) == n_slots_before

    # translated re-submit reuses the restored cache (avgScale unchanged)
    vg.begin(ctx2, 0, 256, 160, 1.0)
    vg.pushState(ctx2)
    vg.transformTranslate(ctx2, 7, 3)
    vg.submitCommandList(ctx2, h2)
    vg.popState(ctx2)
    moved = np.asarray(vg.end(ctx2, background=bg))
    assert np.abs(moved[20:150, 20:240] - want[17:147, 13:233]).max() < 3e-3


def test_ops_memo_same_state_resubmit():
    """Second same-state submit of a cached list re-emits the SAME RasterOp
    objects (op-list memoization) and renders identically; any state change
    (transform, alpha) misses the memo and still renders correctly."""
    import numpy as np

    import vgtpu as vg

    bg = (0.1, 0.1, 0.1, 1.0)
    ctx = vg.createContext()
    vg.begin(ctx, 0, 256, 128, 1.0)
    cl = vg.createCommandList(ctx, vg.CommandListFlags.Cacheable)
    vg.beginCommandList(ctx, cl)
    g = vg.createLinearGradient(ctx, 10, 10, 200, 60,
                                vg.color4ub(255, 0, 0, 255),
                                vg.color4ub(0, 0, 255, 255))
    vg.beginPath(ctx)
    vg.roundedRect(ctx, 10, 10, 190, 60, 9)
    vg.fillPath(ctx, g, vg.FillFlags.ConvexAA)
    vg.beginPath(ctx)
    vg.circle(ctx, 80, 90, 25)
    vg.fillPath(ctx, vg.color4ub(30, 200, 120, 255), vg.FillFlags.ConvexAA)
    vg.endCommandList(ctx)

    vg.submitCommandList(ctx, cl)                   # builds geometry cache
    img0 = np.asarray(vg.end(ctx, background=bg))

    vg.begin(ctx, 0, 256, 128, 1.0)
    vg.submitCommandList(ctx, cl)                   # cached replay, memo CAPTURE
    seg1 = list(ctx.ops)
    img1 = np.asarray(vg.end(ctx, background=bg))

    vg.begin(ctx, 0, 256, 128, 1.0)
    vg.submitCommandList(ctx, cl)                   # memo HIT
    seg2 = list(ctx.ops)
    img2 = np.asarray(vg.end(ctx, background=bg))
    assert [id(o) for o in seg2] == [id(o) for o in seg1]
    np.testing.assert_allclose(img2, img1, atol=1e-6)
    np.testing.assert_allclose(img1, img0, atol=1e-6)

    # a mergeable solid draw right after the memoized segment must NOT
    # mutate the shared tail op
    vg.begin(ctx, 0, 256, 128, 1.0)
    vg.submitCommandList(ctx, cl)
    tail = ctx.ops[-1]
    tail_edges_id = id(tail.edges)
    vg.beginPath(ctx)
    vg.circle(ctx, 200, 90, 20)
    vg.fillPath(ctx, vg.color4ub(30, 200, 120, 255), vg.FillFlags.ConvexAA)
    assert id(tail.edges) == tail_edges_id and not isinstance(tail.edges, list)
    vg.end(ctx, background=bg)

    # list alone still renders as before (shared ops unmutated)
    vg.begin(ctx, 0, 256, 128, 1.0)
    vg.submitCommandList(ctx, cl)
    img5 = np.asarray(vg.end(ctx, background=bg))
    np.testing.assert_allclose(img5, img0, atol=1e-6)

    # translated submit: memo miss, correct placement
    vg.begin(ctx, 0, 256, 128, 1.0)
    vg.pushState(ctx)
    vg.transformTranslate(ctx, 11, 7)
    vg.submitCommandList(ctx, cl)
    vg.popState(ctx)
    moved = np.asarray(vg.end(ctx, background=bg))
    assert np.abs(moved[20:120, 20:240] - img0[13:113, 9:229]).max() < 3e-3

    # alpha change: memo miss, dimmer output
    vg.begin(ctx, 0, 256, 128, 1.0)
    vg.pushState(ctx)
    vg.setGlobalAlpha(ctx, 0.5)
    vg.submitCommandList(ctx, cl)
    vg.popState(ctx)
    dim = np.asarray(vg.end(ctx, background=bg))
    assert dim[40, 100, 0] < img0[40, 100, 0] - 0.05


def test_save_before_first_submit_and_attr_probes(tmp_path):
    """Regression: a Cacheable list saved BEFORE its first submit (no cache
    built yet) must serialize cleanly — the record-through __getattr__ used
    to intercept cl_save's getattr(cl, "cache_concat", None) probe and leak
    an unpicklable recorder closure into the snapshot.  Attribute probes for
    non-API names must also raise instead of recording."""
    ctx = make_ctx()
    cl = record_square(ctx, flags=vg.CommandListFlags.Cacheable)
    path = str(tmp_path / "fresh.vgcl")
    assert vg.saveCommandList(ctx, cl, path)

    ctx2 = make_ctx()
    cl2 = vg.loadCommandList(ctx2, path)
    vg.submitCommandList(ctx2, cl2)
    vg.end(ctx2, background=(0, 0, 0, 0))
    img = np.asarray(ctx2.frame_image)
    assert img[20, 20, 3] == 1.0

    clobj = ctx.command_lists[cl.idx]
    assert not hasattr(clobj, "cache_concatt")        # typo'd probe raises
    n = len(clobj.commands)
    try:
        clobj.fillPth  # noqa: B018 — typo'd mutator must not record
        raise AssertionError("expected AttributeError")
    except AttributeError:
        pass
    assert len(clobj.commands) == n
