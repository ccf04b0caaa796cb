"""Analytic winding-coverage accumulation (device).

This is the TPU replacement for libtess2's sweep-line tessellation (SURVEY.md
§2 #7) *and* the AA-fringe mesh expansion (stroker.cpp AA variants): instead of
producing triangles with alpha ramps, each edge's exact box-filtered signed-area
contribution is accumulated per pixel (see ARCHITECTURE.md for the derivation).

Input layout (from vgtpu.raster.binning):
  chunk_edges: (NC, CHUNK, 4) f32 — edge segments, tile-origin-relative
  chunk_entry: (NC,) i32          — which (tile,op) entry each chunk feeds

The accumulation is linear, so chunks of the same entry sum independently —
that's what makes the computation perfectly uniform: every chunk is CHUNK edges
by TH*TW pixels, no ragged shapes anywhere on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-6


def _edge_contribution(px, py, x0, y0, x1, y1):
    """Signed pixel-area contribution of one edge batch to pixel grid (px,py).

    px,py: (..., TH, TW) pixel corner coordinates.
    x0..y1: broadcastable edge coordinates.
    Exact integral of clamp(px+1 - x(y), 0, 1) over the pixel's y-slab.
    """
    ymin = jnp.minimum(y0, y1)
    ymax = jnp.maximum(y0, y1)
    ytop = jnp.maximum(ymin, py)
    ybot = jnp.minimum(ymax, py + 1.0)
    h = jnp.maximum(ybot - ytop, 0.0)
    s = jnp.sign(y1 - y0)

    dy = y1 - y0
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < _EPS, 1.0, dy)
    m = (x1 - x0) * inv_dy
    xa = x0 + m * (ytop - y0)
    xb = x0 + m * (ybot - y0)
    u0 = (px + 1.0) - xa
    u1 = (px + 1.0) - xb

    # G(u) = integral of clamp(u,0,1); K = mean of clamp over [u0,u1]
    def G(u):
        return jnp.where(u <= 0.0, 0.0, jnp.where(u >= 1.0, u - 0.5, 0.5 * u * u))

    du = u1 - u0
    near = jnp.abs(du) < _EPS
    k_near = jnp.clip(0.5 * (u0 + u1), 0.0, 1.0)
    k_far = (G(u1) - G(u0)) / jnp.where(near, 1.0, du)
    k = jnp.where(near, k_near, k_far)
    return s * h * k


def coverage_chunks_body(chunk_edges: jax.Array, tile_h: int = 8, tile_w: int = 128) -> jax.Array:
    """Unjitted body (reused inside shard_map by vgtpu/parallel)."""
    nc, ch, _ = chunk_edges.shape
    px = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 1)
    py = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 0)

    def step(acc, edges_e):
        # edges_e: (NC, 4) — one edge per chunk this step
        x0 = edges_e[:, 0][:, None, None]
        y0 = edges_e[:, 1][:, None, None]
        x1 = edges_e[:, 2][:, None, None]
        y1 = edges_e[:, 3][:, None, None]
        acc = acc + _edge_contribution(px, py, x0, y0, x1, y1)
        return acc, None

    init = jnp.zeros((nc, tile_h, tile_w), jnp.float32)
    edges_by_step = jnp.transpose(chunk_edges, (1, 0, 2))  # (CHUNK, NC, 4)
    acc, _ = jax.lax.scan(step, init, edges_by_step)
    return acc


@functools.partial(jax.jit, static_argnames=("tile_h", "tile_w"))
def coverage_chunks(chunk_edges: jax.Array, tile_h: int = 8, tile_w: int = 128) -> jax.Array:
    """(NC, CHUNK, 4) edges -> (NC, TH, TW) summed winding contributions."""
    return coverage_chunks_body(chunk_edges, tile_h, tile_w)


@functools.partial(jax.jit, static_argnames=("num_entries",))
def accumulate_entries(
    chunk_cov: jax.Array, chunk_entry: jax.Array, num_entries: int
) -> jax.Array:
    """Sum chunk coverages into per-(tile,op) entry coverage: (NE, TH, TW)."""
    return jax.ops.segment_sum(chunk_cov, chunk_entry, num_segments=num_entries)
