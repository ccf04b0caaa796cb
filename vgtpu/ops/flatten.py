"""Device-side curve flattening (jnp twin of the host baker).

The same Wang's-formula computation as PathBuilder.bake / vg_bake_path runs
under jit: per-cubic segment counts from the second-difference bound, uniform-t
evaluation, and index-clamped t so every curve emits a FIXED max_n points —
curves needing fewer duplicate their endpoint, and the duplicated tail edges
contribute exactly zero coverage downstream (no masks, no compaction).

This is what lets fully device-resident scenes (animated control points,
differentiable fitting) re-flatten per frame without host round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("max_n",))
def flatten_cubics(cp: jax.Array, tol_d: float | jax.Array, max_n: int = 32) -> jax.Array:
    """cp: (C, 4, 2) control points -> (C, max_n+1, 2) polyline points
    (start point + max_n samples, tail clamped to the endpoint)."""
    d1 = cp[:, 0] - 2.0 * cp[:, 1] + cp[:, 2]
    d2 = cp[:, 1] - 2.0 * cp[:, 2] + cp[:, 3]
    m = jnp.maximum(jnp.linalg.norm(d1, axis=1), jnp.linalg.norm(d2, axis=1))
    n = jnp.ceil(jnp.sqrt(jnp.maximum(3.0 * m / (4.0 * tol_d), 1.0)))
    n = jnp.clip(n, 1.0, float(max_n))                       # (C,)

    i = jnp.arange(1, max_n + 1, dtype=jnp.float32)[None, :]  # (1, max_n)
    t = jnp.minimum(i, n[:, None]) / n[:, None]               # clamped tail
    mt = 1.0 - t
    w0 = (mt ** 3)[..., None]
    w1 = (3.0 * mt * mt * t)[..., None]
    w2 = (3.0 * mt * t * t)[..., None]
    w3 = (t ** 3)[..., None]
    pts = (
        w0 * cp[:, None, 0] + w1 * cp[:, None, 1]
        + w2 * cp[:, None, 2] + w3 * cp[:, None, 3]
    )                                                        # (C, max_n, 2)
    return jnp.concatenate([cp[:, None, 0], pts], axis=1)


def polyline_edges(pts: jax.Array, close: bool = True) -> jax.Array:
    """(..., N, 2) polyline -> (..., N or N-1, 4) edge segments."""
    nxt = jnp.roll(pts, -1, axis=-2) if close else pts[..., 1:, :]
    cur = pts if close else pts[..., :-1, :]
    return jnp.concatenate([cur, nxt], axis=-1)
