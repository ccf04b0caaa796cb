"""Multi-device sharded rendering on the virtual 8-device CPU mesh: the
sharded frame must be pixel-identical to the single-device frame."""

import numpy as np
import pytest

import jax

import vgtpu as vg
from vgtpu.parallel.sharding import make_mesh, render_frame_sharded


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_single_device():
    ctx = vg.createContext()
    vg.begin(ctx, 0, 256, 128, 1.0)
    vg.beginPath(ctx)
    vg.circle(ctx, 80, 60, 40)
    vg.fillPath(ctx, vg.color4ub(200, 60, 30, 255), vg.FillFlags.ConvexAA)
    g = vg.createLinearGradient(ctx, 120, 0, 250, 0, vg.Colors.Red, vg.Colors.Blue)
    vg.beginPath(ctx)
    vg.roundedRect(ctx, 130, 20, 110, 80, 12)
    vg.fillPath(ctx, g, vg.FillFlags.ConvexAA)
    vg.beginPath(ctx)
    vg.moveTo(ctx, 20, 100)
    vg.lineTo(ctx, 120, 110)
    vg.strokePath(ctx, vg.Colors.Black, 5.0, vg.StrokeFlags.RoundRoundAA)
    single = np.asarray(vg.end(ctx, background=(1, 1, 1, 1)))

    mesh = make_mesh(8)
    sharded = np.asarray(
        render_frame_sharded(ctx.last_plan, ctx.last_device_arrays, mesh,
                             background=(1, 1, 1, 1))
    )
    np.testing.assert_allclose(sharded, single, atol=1e-5)
