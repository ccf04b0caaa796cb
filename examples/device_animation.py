"""Fully device-resident animation: control points live on device, every frame
re-flattens + rasterizes under ONE jit — zero host round-trips per frame.

This is the pipeline the reference fundamentally cannot express: its CPU
tessellator sits between every geometry change and the GPU.  Here the
morphing blob is Wang-flattened (ops/flatten.py) and rasterized with the
differentiable dense renderer (diff.py) entirely on-device.

    python examples/device_animation.py      # writes /tmp/vgtpu_anim_*.png
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vgtpu.diff import render_edges
from vgtpu.ops.flatten import flatten_cubics, polyline_edges


def blob_control_points(t, n_lobes=7, cx=64.0, cy=64.0):
    """Animated closed cubic loop (device math)."""
    k = jnp.arange(n_lobes)
    ang = k * (2 * jnp.pi / n_lobes)
    r = 40.0 + 12.0 * jnp.sin(3.0 * ang + 4.0 * t) + 6.0 * jnp.sin(t * 2.0)
    px = cx + r * jnp.cos(ang)
    py = cy + r * jnp.sin(ang)
    p = jnp.stack([px, py], axis=1)
    nxt = jnp.roll(p, -1, axis=0)
    prv = jnp.roll(p, 1, axis=0)
    nx2 = jnp.roll(p, -2, axis=0)
    t0 = (nxt - prv) / 6.0
    t1 = (nx2 - p) / 6.0
    return jnp.stack([p, p + t0, nxt - t1, nxt], axis=1)  # (n,4,2) cubics


@functools.partial(jax.jit, static_argnames=("size",))
def frame(t, size=128):
    cp = blob_control_points(t)
    pts = flatten_cubics(cp, 0.5, max_n=16)               # (n, 17, 2)
    edges = polyline_edges(pts, close=False).reshape(-1, 4)
    colors = jnp.array([[0.95, 0.55, 0.1, 1.0]])
    return render_edges(edges, colors, jnp.zeros(edges.shape[0], jnp.int32),
                        size, size)


def main() -> None:
    from PIL import Image

    for i, t in enumerate(np.linspace(0, 2 * np.pi, 8, endpoint=False)):
        img = np.asarray(frame(jnp.float32(t)))
        a = np.clip(img[..., 3:4], 1e-6, 1)
        u8 = (np.clip(np.concatenate([img[..., :3] / a, a], -1), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(u8, "RGBA").save(f"/tmp/vgtpu_anim_{i}.png")
    print("wrote /tmp/vgtpu_anim_0..7.png (one jit, no host geometry)")


if __name__ == "__main__":
    main()
