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


def test_cubic_edges_gradient_and_batching():
    from vgtpu.diff import cubic_edges

    ctrl = jnp.array([[4.0, 4.0], [12.0, 28.0], [20.0, -4.0], [28.0, 24.0]])
    e = cubic_edges(ctrl, samples=8)
    assert e.shape == (8, 4)
    # chained samples: each segment starts where the last ended
    np.testing.assert_allclose(e[1:, 0:2], e[:-1, 2:4], atol=1e-6)
    # endpoints interpolate the control polygon ends
    np.testing.assert_allclose(e[0, 0:2], ctrl[0], atol=1e-6)
    np.testing.assert_allclose(e[-1, 2:4], ctrl[3], atol=1e-6)
    # batch axis broadcasts
    assert cubic_edges(jnp.stack([ctrl, ctrl]), samples=5).shape == (2, 5, 4)


def test_fit_cubic_control_point():
    """Recover a perturbed Bezier control point from pixels: the
    differentiable flattening (cubic_edges) + render_edges chain."""
    from vgtpu.diff import cubic_edges

    base = jnp.array([[4.0, 16.0], [12.0, 2.0], [20.0, 30.0], [28.0, 16.0]])
    colors = jnp.array([[1.0, 1.0, 1.0, 1.0]])

    def img_of(ctrl):
        # close the curve back to the start -> a filled lens shape
        edges = jnp.concatenate(
            [cubic_edges(ctrl, 12),
             jnp.concatenate([ctrl[3], ctrl[0]])[None, :]])
        return render_edges(edges, colors, jnp.zeros(13, jnp.int32), 32, 32)

    target = img_of(base)
    delta0 = jnp.array([5.0, -4.0])

    def loss(d):
        ctrl = base.at[1].add(d)
        return jnp.mean((img_of(ctrl) - target) ** 2)

    lg = jax.jit(jax.value_and_grad(loss))
    d = delta0
    for _ in range(80):
        _, g = lg(d)
        d = d - 300.0 * g
    assert float(jnp.linalg.norm(d)) < 1.0, d
