"""Multi-device sharded rendering on the virtual 8-device CPU mesh: the
tile-sharded frame (vgtpu/parallel/sharding.py — tiles/entries/chunks
co-partitioned so the frame body is COLLECTIVE-FREE) must be pixel-identical
to the single-device frame for every content class the engine renders:
clips, textures/text, supersampling, user tri-lists, uneven tile counts, and
fuzzed scenes, at mesh sizes 2/4/8."""

import numpy as np
import pytest

import jax

import vgtpu as vg
from tests.fontdata import FONT_DATA
from vgtpu.parallel.sharding import make_mesh, render_frame_sharded

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

MESH_NS = (2, 4, 8)


def _assert_sharded_matches(ctx, n, background=(1, 1, 1, 1), atol=1e-5):
    single = np.asarray(ctx.frame_image)
    mesh = make_mesh(n)
    sharded = np.asarray(
        render_frame_sharded(ctx.last_plan, ctx.last_device_arrays, mesh,
                             background=background))
    np.testing.assert_allclose(sharded, single, atol=atol)


def _basic_scene(ctx):
    vg.beginPath(ctx)
    vg.circle(ctx, 80, 60, 40)
    vg.fillPath(ctx, vg.color4ub(200, 60, 30, 255), vg.FillFlags.ConvexAA)
    g = vg.createLinearGradient(ctx, 120, 0, 250, 0, vg.Colors.Red,
                                vg.Colors.Blue)
    vg.beginPath(ctx)
    vg.roundedRect(ctx, 130, 20, 110, 80, 12)
    vg.fillPath(ctx, g, vg.FillFlags.ConvexAA)
    vg.beginPath(ctx)
    vg.moveTo(ctx, 20, 100)
    vg.lineTo(ctx, 120, 110)
    vg.strokePath(ctx, vg.Colors.Black, 5.0, vg.StrokeFlags.RoundRoundAA)


@pytest.mark.parametrize("n", MESH_NS)
def test_sharded_matches_single_device(n):
    ctx = vg.createContext()
    vg.begin(ctx, 0, 256, 128, 1.0)
    _basic_scene(ctx)
    vg.end(ctx, background=(1, 1, 1, 1))
    _assert_sharded_matches(ctx, n)


@pytest.mark.parametrize("n", MESH_NS)
def test_sharded_clips(n):
    """Clip groups (In + Out, committed masks) through the sharded
    composite — clip state is per-tile and must survive tile sharding."""
    ctx = vg.createContext()
    vg.begin(ctx, 0, 256, 128, 1.0)
    vg.beginClip(ctx, vg.ClipRule.In)
    vg.beginPath(ctx)
    vg.circle(ctx, 90, 64, 50)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
    vg.endClip(ctx)
    vg.beginPath(ctx)
    vg.rect(ctx, 20, 20, 150, 90)
    vg.fillPath(ctx, vg.color4ub(40, 180, 220, 255), vg.FillFlags.ConvexAA)
    vg.resetClip(ctx)
    vg.beginClip(ctx, vg.ClipRule.Out)
    vg.beginPath(ctx)
    vg.rect(ctx, 170, 30, 60, 60)
    vg.fillPath(ctx, vg.Colors.White, vg.FillFlags.ConvexAA)
    vg.endClip(ctx)
    vg.beginPath(ctx)
    vg.circle(ctx, 200, 64, 45)
    vg.fillPath(ctx, vg.color4ub(230, 120, 40, 200), vg.FillFlags.ConvexAA)
    vg.resetClip(ctx)
    vg.end(ctx, background=(0.2, 0.2, 0.25, 1))
    _assert_sharded_matches(ctx, n, background=(0.2, 0.2, 0.25, 1))


@pytest.mark.parametrize("n", MESH_NS)
def test_sharded_text_and_pattern(n):
    """Texture planes (glyph color tiles + image pattern) shard with the
    tile table; the dryrun-class bug this guards: a color-tile plane
    indexed by a GLOBAL tile id inside a LOCAL shard."""
    if FONT_DATA is None:
        pytest.skip("no test font available")
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (32, 32, 4), np.uint8)
    img[..., 3] = 255
    ctx = vg.createContext()
    h_img = vg.createImage(ctx, 32, 32, 0, img)
    f = vg.createFont(ctx, "sans", FONT_DATA, len(FONT_DATA), 0)
    vg.begin(ctx, 0, 256, 128, 1.0)
    p = vg.createImagePattern(ctx, 10, 10, 96, 96, 0.0, h_img)
    vg.beginPath(ctx)
    vg.rect(ctx, 10, 10, 120, 100)
    vg.fillPath(ctx, p, vg.Colors.White, vg.FillFlags.ConvexAA)
    cfg = vg.makeTextConfig(ctx, f, 22.0, vg.TextAlign.BaselineLeft,
                            vg.color4ub(250, 240, 40, 255))
    vg.text(ctx, cfg, 120, 60, "shard me")
    vg.end(ctx, background=(0, 0, 0, 1))
    _assert_sharded_matches(ctx, n, background=(0, 0, 0, 1))


@pytest.mark.parametrize("n", MESH_NS)
def test_sharded_supersample(n):
    """Conflation-free (ss=4) plans: coverage lives on the sub-row domain;
    the sharded composite must apply the fill rule per sub-row then average
    (regression: render_frame_sharded dropped ss before round 3)."""
    cfg = vg.ContextConfig(coverage_supersample=4)
    ctx = vg.createContext(cfg)
    vg.begin(ctx, 0, 256, 128, 1.0)
    # self-intersecting bow-tie: the shape class ss exists for
    vg.beginPath(ctx)
    vg.moveTo(ctx, 30, 20)
    vg.lineTo(ctx, 220, 100)
    vg.lineTo(ctx, 30, 100)
    vg.lineTo(ctx, 220, 20)
    vg.closePath(ctx)
    vg.fillPath(ctx, vg.color4ub(200, 60, 200, 230),
                vg.FillFlags.ConcaveEvenOddAA)
    _basic_scene(ctx)
    vg.end(ctx, background=(1, 1, 1, 1))
    assert ctx.last_plan.supersample == 4
    _assert_sharded_matches(ctx, n)


@pytest.mark.parametrize("n", MESH_NS)
def test_sharded_trilist(n):
    """indexedTriList user meshes (per-vertex-color P_TRI paints)."""
    ctx = vg.createContext()
    vg.begin(ctx, 0, 256, 128, 1.0)
    pos = np.array([[20, 20], [240, 30], [130, 110], [30, 115]], np.float32)
    colors = np.array([0xFF0000FF, 0xFF00FF00, 0xFFFF0000, 0xFF00FFFF],
                      np.uint32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    vg.indexedTriList(ctx, pos, None, 4, colors, 4, idx, 6, None)
    vg.end(ctx, background=(0.1, 0.1, 0.1, 1))
    _assert_sharded_matches(ctx, n, background=(0.1, 0.1, 0.1, 1))


@pytest.mark.parametrize("n", (4, 8))
def test_sharded_uneven_tiles(n):
    """Tile count NOT a multiple of the mesh (384x104 = 3x13 = 39 tiles):
    pad tiles render into scratch rows and are dropped at assembly."""
    ctx = vg.createContext()
    vg.begin(ctx, 0, 384, 104, 1.0)
    _basic_scene(ctx)
    vg.beginPath(ctx)
    vg.circle(ctx, 330, 90, 30)
    vg.fillPath(ctx, vg.color4ub(90, 220, 90, 255), vg.FillFlags.ConvexAA)
    vg.end(ctx, background=(1, 1, 1, 1))
    assert (ctx.last_plan.ntx * ctx.last_plan.nty) % n != 0
    _assert_sharded_matches(ctx, n)


@pytest.mark.parametrize("seed", (0, 1, 2))
def test_sharded_fuzz(seed):
    """Random full-API scenes (differential-fuzz generator: paints, clips,
    text, images, scissors, tri-lists) through the 8-device sharded frame."""
    from tests.test_differential_fuzz import BG, H, W, build_program, fresh_ctx, apply_program

    rng = np.random.default_rng(3000 + seed)
    steps = build_program(rng)
    ctx, font, img_handle = fresh_ctx(np.random.default_rng(3000 + seed))
    vg.begin(ctx, 0, W, H, 1.0)
    apply_program(ctx, steps, font, img_handle)
    vg.end(ctx, background=BG)
    _assert_sharded_matches(ctx, 8, background=BG)
