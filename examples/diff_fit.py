"""Differentiable vector fitting: optimize shapes to reproduce a raster.

A capability the reference cannot express (its raster is a GPU pipeline):
here the analytic box-filter coverage is smooth in the geometry, so JAX
gradients flow from output pixels back to polygon vertices, Bezier control
points, and colors.  This demo

  1. renders a small target scene with the full engine,
  2. initializes a handful of translucent polygons at random,
  3. fits their vertices + colors to the target with Adam (optax),
  4. writes target / initial / fitted images side by side.

    python examples/diff_fit.py out.png
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import optax

import vgtpu as vg
from vgtpu.diff import polygon_edges, render_edges

W = H = 96
N_SHAPES = 12
N_VERTS = 8


def render_target() -> np.ndarray:
    ctx = vg.createContext()
    vg.begin(ctx, 0, W, H, 1.0)
    g = vg.createLinearGradient(ctx, 10, 10, 80, 80,
                                vg.color4ub(240, 60, 40, 255),
                                vg.color4ub(40, 60, 240, 255))
    vg.beginPath(ctx)
    vg.roundedRect(ctx, 8, 8, 62, 62, 14)
    vg.fillPath(ctx, g, vg.FillFlags.ConvexAA)
    vg.beginPath(ctx)
    vg.circle(ctx, 64, 64, 22)
    vg.fillPath(ctx, vg.color4ub(250, 210, 60, 230), vg.FillFlags.ConvexAA)
    vg.beginPath(ctx)
    vg.moveTo(ctx, 16, 84)
    vg.cubicTo(ctx, 40, 40, 60, 95, 88, 50)
    vg.strokePath(ctx, vg.color4ub(20, 200, 120, 255), 5.0,
                  vg.StrokeFlags.RoundRoundAA)
    img = vg.end(ctx, background=(0.08, 0.08, 0.1, 1.0))
    return np.asarray(img)


_ANG = np.linspace(0, 2 * np.pi, N_VERTS, endpoint=False)
_RING = jnp.asarray(np.stack([np.cos(_ANG), np.sin(_ANG)], axis=1),
                    jnp.float32)                                 # (V, 2)


def init_params(rng):
    # star-shaped parameterization (center + per-vertex log-radius): vertices
    # cannot cross, so polygons stay simple no matter how far the fit moves
    return {"centers": jnp.asarray(rng.uniform(15, 80, (N_SHAPES, 2)), jnp.float32),
            "log_r": jnp.full((N_SHAPES, N_VERTS),
                              np.log(14.0), jnp.float32),
            "colors": jnp.asarray(rng.uniform(0.2, 0.8, (N_SHAPES, 4)),
                                  jnp.float32).at[:, 3].set(0.6)}


def render_params(params):
    pts = (params["centers"][:, None, :]
           + jnp.exp(params["log_r"])[:, :, None] * _RING[None])  # (S, V, 2)
    edges = jax.vmap(polygon_edges)(pts).reshape(-1, 4)
    shape_ids = jnp.repeat(jnp.arange(N_SHAPES), N_VERTS)
    colors = jnp.clip(params["colors"], 0.0, 1.0)
    return render_edges(edges, colors, shape_ids, W, H,
                        background=jnp.array([0.08, 0.08, 0.1, 1.0]))


def main(out_path: str = "/tmp/vgtpu_diff_fit.png", steps: int = 600) -> float:
    target = jnp.asarray(render_target())
    params = init_params(np.random.default_rng(7))
    initial = np.asarray(render_params(params))

    @jax.jit
    def loss_fn(p):
        return jnp.mean((render_params(p) - target) ** 2)

    # per-leaf learning rates: centers move in pixels, radii in log-space,
    # colors in [0,1] units
    opt = optax.multi_transform(
        {"centers": optax.adam(0.6), "log_r": optax.adam(0.03),
         "colors": optax.adam(0.02)},
        {"centers": "centers", "log_r": "log_r", "colors": "colors"})
    opt_state = opt.init(params)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    loss0 = float(loss_fn(params))
    for i in range(steps):
        val, g = grad_fn(params)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        if i % 100 == 0:
            print(f"step {i:4d}  loss {float(val):.5f}")
    loss1 = float(loss_fn(params))
    fitted = np.asarray(render_params(params))
    print(f"loss {loss0:.5f} -> {loss1:.5f} ({loss0 / max(loss1, 1e-9):.1f}x)")

    strip = np.concatenate([np.asarray(target), initial, fitted], axis=1)
    rgb = np.clip(strip[..., :3], 0, 1)
    try:
        from PIL import Image

        Image.fromarray((rgb * 255).astype(np.uint8)).save(out_path)
        print("wrote", out_path, "(target | initial | fitted)")
    except ImportError:
        np.save(out_path + ".npy", rgb)
        print("PIL unavailable; wrote", out_path + ".npy")
    return loss1 / loss0


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["/tmp/vgtpu_diff_fit.png"]))
