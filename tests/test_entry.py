"""Driver entry points + profiler + image patterns end-to-end."""

import numpy as np
import pytest

import jax

import vgtpu as vg


def test_entry_compiles_and_runs():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    arr = np.asarray(out)
    assert arr.shape[2] == 4
    assert np.isfinite(arr).all()
    # gradient rect and circle must have landed
    assert arr[70, 110, 3] > 0.9
    assert arr[80, 300, 3] > 0.9


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_profiler_collects_stages():
    ctx = vg.createContext()
    vg.begin(ctx, 0, 64, 64, 1.0)
    vg.beginPath(ctx)
    vg.rect(ctx, 8, 8, 48, 48)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
    vg.end(ctx, background=(0, 0, 0, 0))
    rep = ctx.profiler.report()
    assert rep["frames"] == 1
    for stage in ("bin", "upload", "device_dispatch"):
        assert stage in rep["ms_per_frame"]
    assert rep["counters"]["ops"] == 1


def test_get_stats_counts_command_list_memory():
    ctx = vg.createContext()
    vg.begin(ctx, 0, 64, 64, 1.0)
    cl = vg.createCommandList(ctx, vg.CommandListFlags.Cacheable)
    vg.beginCommandList(ctx, cl)
    vg.beginPath(ctx)
    vg.rect(ctx, 0, 0, 32, 32)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
    vg.endCommandList(ctx)
    vg.submitCommandList(ctx, cl)
    st = vg.getStats(ctx)
    assert st.cmd_list_memory_used > 0


def test_image_pattern_fill():
    ctx = vg.createContext()
    vg.begin(ctx, 0, 64, 64, 1.0)
    # 2x2 checker image
    data = np.zeros((2, 2, 4), np.uint8)
    data[0, 0] = data[1, 1] = (255, 0, 0, 255)
    data[0, 1] = data[1, 0] = (0, 0, 255, 255)
    img = vg.createImage(ctx, 2, 2, vg.ImageFlags.Filter_Nearest, data)
    pat = vg.createImagePattern(ctx, 0, 0, 32, 32, 0.0, img)
    assert vg.isValid(pat)
    vg.beginPath(ctx)
    vg.rect(ctx, 0, 0, 64, 64)
    vg.fillPath(ctx, pat, vg.Colors.White, vg.FillFlags.ConvexAA)
    vg.end(ctx, background=(0, 0, 0, 0))
    out = np.asarray(ctx.frame_image)
    # 32px pattern cells, nearest: (8,8) in first cell -> red, (8,24) -> blue
    assert out[8, 8, 0] > 0.9 and out[8, 8, 2] < 0.1
    assert out[8, 24, 2] > 0.9 and out[8, 24, 0] < 0.1
    # repeats beyond one pattern tile
    assert out[40, 40, 0] > 0.9


def test_image_pattern_rotated_and_modulated():
    ctx = vg.createContext()
    vg.begin(ctx, 0, 64, 64, 1.0)
    data = np.full((4, 4, 4), 255, np.uint8)
    img = vg.createImage(ctx, 4, 4, vg.ImageFlags.Filter_Bilinear, data)
    pat = vg.createImagePattern(ctx, 32, 32, 64, 64, 0.5, img)
    vg.beginPath(ctx)
    vg.circle(ctx, 32, 32, 20)
    vg.fillPath(ctx, pat, vg.color4ub(255, 0, 0, 128), vg.FillFlags.ConvexAA)
    vg.end(ctx, background=(0, 0, 0, 0))
    out = np.asarray(ctx.frame_image)
    assert abs(out[32, 32, 3] - 0.5) < 0.02   # modulated alpha
    assert out[32, 32, 0] > 0.4               # red modulate (premultiplied)
    assert out[32, 32, 1] < 0.05


def test_update_image_invalidates_sample_cache():
    """updateImage mutates pixels in place; cached sampled tiles must not go
    stale (generation is part of the cache key)."""
    ctx = vg.createContext()
    vg.begin(ctx, 0, 64, 64, 1.0)
    data = np.zeros((2, 2, 4), np.uint8)
    data[:] = (255, 0, 0, 255)
    h = vg.createImage(ctx, 2, 2, vg.ImageFlags.Filter_Nearest, data)
    pat = vg.createImagePattern(ctx, 0, 0, 64, 64, 0.0, h)
    vg.beginPath(ctx)
    vg.rect(ctx, 0, 0, 64, 64)
    vg.fillPath(ctx, pat, vg.Colors.White, vg.FillFlags.ConvexAA)
    img1 = np.asarray(vg.end(ctx, background=(0, 0, 0, 0)))
    assert img1[32, 32, 0] > 0.9

    vg.updateImage(ctx, h, 0, 0, 2, 2, np.tile([0, 255, 0, 255], (2, 2, 1)).astype(np.uint8))
    vg.begin(ctx, 0, 64, 64, 1.0)
    pat = vg.createImagePattern(ctx, 0, 0, 64, 64, 0.0, h)
    vg.beginPath(ctx)
    vg.rect(ctx, 0, 0, 64, 64)
    vg.fillPath(ctx, pat, vg.Colors.White, vg.FillFlags.ConvexAA)
    img2 = np.asarray(vg.end(ctx, background=(0, 0, 0, 0)))
    assert img2[32, 32, 1] > 0.9 and img2[32, 32, 0] < 0.1   # now green
