"""Per-op content-key caches (RasterOp.fp_cache / bin_key_cache).

Command-list memo replays re-emit the same frozen RasterOp objects every
frame, so the frame fingerprint and the bin/layer key scans memoize their
CRCs on the op.  These tests pin the invalidation contract: copies clear
the caches (the shallow-copy-then-mutate helpers), and frame-external
inputs (image generation) stay OUTSIDE the cached part.
"""

import copy

import numpy as np

import vgtpu as vg
from vgtpu.raster.binning import RasterOp, _op_bin_key, make_solid_paint


def _op():
    return RasterOp(
        edges=np.array([[0, 0, 4, 4], [4, 4, 0, 8]], np.float32),
        paint=make_solid_paint(np.array([1, 0, 0, 1], np.float32)),
    )


def test_copy_clears_caches():
    op = _op()
    k = _op_bin_key(op)
    op.fp_cache = ("g", "pc", "tt")
    assert op.bin_key_cache == k
    o2 = copy.copy(op)
    assert o2.bin_key_cache is None and o2.fp_cache is None
    # the copy recomputes to the same key while content is unchanged...
    assert _op_bin_key(o2) == k
    # ...and to a different key once the copier mutates geometry
    o3 = copy.copy(op)
    o3.edges = op.edges * 2.0
    assert _op_bin_key(o3) != k


def test_bin_key_cache_returns_same_object():
    op = _op()
    assert _op_bin_key(op) is _op_bin_key(op)


def test_scale_ops_y_keys_track_content():
    from vgtpu.raster.binning import scale_ops_y

    op = _op()
    k = _op_bin_key(op)
    (scaled,) = scale_ops_y([op], 2)
    assert _op_bin_key(scaled) != k          # y-scaled edges
    assert _op_bin_key(op) == k              # original untouched


def test_fingerprint_cached_across_identical_frames():
    ctx = vg.createContext()

    def record():
        vg.begin(ctx, 0, 256, 128, 1.0)
        vg.beginPath(ctx)
        vg.rect(ctx, 10, 10, 50, 40)
        vg.fillPath(ctx, vg.color4ub(200, 60, 60, 255), vg.FillFlags.ConvexAA)

    record()
    fp1 = ctx._frame_fingerprint()
    caches = [op.fp_cache for op in ctx.ops]
    assert all(c is not None for c in caches)
    # same op objects, warm caches -> identical fingerprint
    fp2 = ctx._frame_fingerprint()
    assert fp1 == fp2
    assert [op.fp_cache for op in ctx.ops] == caches


def test_fingerprint_generation_outside_cache():
    """updateImage bumps the generation under the SAME op object (pattern
    draws via the memo path); the fingerprint must change even when the
    op's CRC triple is cached."""
    ctx = vg.createContext()
    data = np.zeros((8, 8, 4), np.uint8)
    data[..., 3] = 255
    img = vg.createImage(ctx, 8, 8, 0, data)

    vg.begin(ctx, 0, 256, 128, 1.0)
    p = vg.createImagePattern(ctx, 0, 0, 8, 8, 0.0, img)
    vg.beginPath(ctx)
    vg.rect(ctx, 0, 0, 64, 64)
    vg.fillPath(ctx, p, vg.color4ub(255, 255, 255, 255), vg.FillFlags.ConvexAA)
    fp1 = ctx._frame_fingerprint()
    assert all(op.fp_cache is not None for op in ctx.ops)
    vg.updateImage(ctx, img, 0, 0, 8, 8, data + 1)
    fp2 = ctx._frame_fingerprint()   # cached triple, fresh generation
    assert fp1 != fp2


def test_app_pattern_steady_state_pixels_unchanged():
    """Cached-list + immediate suffix: pixels must match a fresh render
    with the caches in play (memo replay shares frozen ops)."""
    ctx = vg.createContext()
    cl = vg.createCommandList(ctx, vg.CommandListFlags.Cacheable)
    vg.beginCommandList(ctx, cl)
    vg.beginPath(ctx)
    vg.circle(ctx, 60, 60, 40)
    vg.fillPath(ctx, vg.color4ub(40, 180, 90, 255), vg.FillFlags.ConvexAA)
    vg.endCommandList(ctx)

    def frame(t):
        vg.begin(ctx, 0, 192, 96, 1.0)
        vg.submitCommandList(ctx, cl)
        vg.beginPath(ctx)
        vg.rect(ctx, 100 + t, 20, 30, 30)
        vg.fillPath(ctx, vg.color4ub(220, 80, 40, 255), vg.FillFlags.ConvexAA)
        return np.asarray(vg.end(ctx, background=(0, 0, 0, 1)))

    imgs = [frame(k) for k in range(4)]        # warm: memo + layer settle
    steady = frame(3)                           # same content as frame(3)
    np.testing.assert_array_equal(steady, imgs[3])

    fresh = vg.createContext()
    vg.begin(fresh, 0, 192, 96, 1.0)
    vg.beginPath(fresh)
    vg.circle(fresh, 60, 60, 40)
    vg.fillPath(fresh, vg.color4ub(40, 180, 90, 255), vg.FillFlags.ConvexAA)
    vg.beginPath(fresh)
    vg.rect(fresh, 103, 20, 30, 30)
    vg.fillPath(fresh, vg.color4ub(220, 80, 40, 255), vg.FillFlags.ConvexAA)
    ref = np.asarray(vg.end(fresh, background=(0, 0, 0, 1)))
    np.testing.assert_allclose(steady, ref, atol=1e-5)
