"""Differentiable vector rendering.

A capability the reference cannot have: the analytic coverage formula
(ops/coverage.py) is smooth in the edge coordinates almost everywhere, so
gradients flow from pixels back to control points through the standard JAX
machinery — no reparameterization tricks needed (compare Bezier Splatting /
diffvg, which soften the raster step; here the box-filter AA *is* the
softening).

Typical use: fit path control points, colors, or transforms to a target image
with jax.grad over `render_edges`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vgtpu.ops.coverage import _edge_contribution


@functools.partial(jax.jit, static_argnames=("width", "height", "fill_rule"))
def render_edges(edges: jax.Array, colors: jax.Array, edge_shape: jax.Array,
                 width: int, height: int, fill_rule: int = 0,
                 background: jax.Array | None = None) -> jax.Array:
    """Differentiable multi-shape renderer (dense, no binning — intended for
    optimization loops over small scenes, not production frames).

    edges: (E, 4) f32 segments; edge_shape: (E,) i32 shape id per edge
    (shapes composite in id order); colors: (S, 4) straight-alpha RGBA.
    Returns (H, W, 4) premultiplied.
    """
    n_shapes = colors.shape[0]
    px = jnp.arange(width, dtype=jnp.float32)[None, :]
    py = jnp.arange(height, dtype=jnp.float32)[:, None]

    def edge_cov(e):
        return _edge_contribution(px, py, e[0], e[1], e[2], e[3])

    contrib = jax.vmap(edge_cov)(edges)                      # (E, H, W)
    w = jax.ops.segment_sum(contrib, edge_shape, num_segments=n_shapes)
    if fill_rule == 0:
        cov = jnp.minimum(jnp.abs(w), 1.0)
    else:
        cov = 1.0 - jnp.abs(jnp.mod(w, 2.0) - 1.0)

    if background is None:
        background = jnp.zeros(4, jnp.float32)
    fb = jnp.broadcast_to(background, (height, width, 4)).astype(jnp.float32)

    def blend(fb, i):
        c = cov[i]
        col = colors[i]
        a = col[3] * c
        rgb = col[0:3][None, None, :] * a[..., None]
        return jnp.concatenate(
            [rgb + fb[..., 0:3] * (1.0 - a)[..., None],
             (a + fb[..., 3] * (1.0 - a))[..., None]], axis=-1), None

    fb, _ = jax.lax.scan(blend, fb, jnp.arange(n_shapes))
    return fb


def polygon_edges(pts: jax.Array) -> jax.Array:
    """(N,2) closed polygon -> (N,4) differentiable edge array."""
    nxt = jnp.roll(pts, -1, axis=0)
    return jnp.concatenate([pts, nxt], axis=1)


def cubic_edges(ctrl: jax.Array, samples: int = 16) -> jax.Array:
    """Differentiable cubic-Bezier flattening: (..., 4, 2) control points ->
    (..., samples, 4) edge segments at uniform parameter steps.

    The production flattener (geometry/path.py, Wang-count subdivision) runs
    in numpy on the host; this fixed-count sampler is its differentiable twin
    for optimization loops — gradients flow from pixels through render_edges
    back to the control points.  Leading batch axes broadcast, so a whole
    path of S cubics is `cubic_edges(ctrl_S42).reshape(-1, 4)`.
    """
    t = jnp.linspace(0.0, 1.0, samples + 1)                    # (K+1,)
    u = 1.0 - t
    # Bernstein basis (K+1, 4)
    basis = jnp.stack([u ** 3, 3 * u ** 2 * t, 3 * u * t ** 2, t ** 3], axis=1)
    pts = jnp.einsum("kc,...cd->...kd", basis, ctrl)           # (..., K+1, 2)
    return jnp.concatenate([pts[..., :-1, :], pts[..., 1:, :]], axis=-1)
