"""Differentiable rendering: gradients flow from pixels to geometry/colors,
and a tiny optimization actually converges."""

import numpy as np

import jax
import jax.numpy as jnp

from vgtpu.diff import polygon_edges, render_edges


def _tri(cx, cy, r):
    ang = jnp.array([0.0, 2.1, 4.2])
    return jnp.stack([cx + r * jnp.cos(ang), cy + r * jnp.sin(ang)], axis=1)


def test_gradients_flow_to_geometry():
    pts = _tri(16.0, 16.0, 8.0)
    colors = jnp.array([[1.0, 0.0, 0.0, 1.0]])

    def loss(p):
        img = render_edges(polygon_edges(p), colors,
                           jnp.zeros(len(p), jnp.int32), 32, 32)
        return jnp.sum(img[..., 3])  # total coverage

    g = jax.grad(loss)(pts)
    assert np.isfinite(np.asarray(g)).all()
    # growing the triangle outward must increase area: gradient along the
    # outward radial direction is positive
    center = pts.mean(axis=0)
    radial = (pts - center) / jnp.linalg.norm(pts - center, axis=1, keepdims=True)
    assert float(jnp.sum(g * radial)) > 0.1


def test_fit_circle_position():
    """Recover a disc's position from a target image by gradient descent."""
    target_pts = _tri(20.0, 14.0, 9.0)
    colors = jnp.array([[1.0, 1.0, 1.0, 1.0]])
    shape_ids = jnp.zeros(3, jnp.int32)
    target = render_edges(polygon_edges(target_pts), colors, shape_ids, 32, 32)

    def loss(offset):
        img = render_edges(polygon_edges(_tri(20.0, 14.0, 9.0) + offset),
                           colors, shape_ids, 32, 32)
        return jnp.mean((img - target) ** 2)

    off = jnp.array([4.0, -3.0])
    lg = jax.jit(jax.value_and_grad(loss))
    for _ in range(60):
        val, g = lg(off)
        off = off - 40.0 * g
    assert float(jnp.linalg.norm(off)) < 0.5, off


def test_gradient_wrt_color():
    pts = _tri(16.0, 16.0, 8.0)

    def loss(c):
        img = render_edges(polygon_edges(pts), c[None, :],
                           jnp.zeros(3, jnp.int32), 32, 32)
        return jnp.sum(img[..., 0])

    g = jax.grad(loss)(jnp.array([0.5, 0.5, 0.5, 1.0]))
    assert g[0] > 1.0        # more red -> more red
    assert abs(g[1]) < 1e-6  # green channel independent
