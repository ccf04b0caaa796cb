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
import numpy as np

_EPS = 1e-6


def _edge_contribution(px, py, x0, y0, x1, y1):
    """Signed pixel-area contribution of one edge batch to pixel grid (px,py).

    px,py: (..., TH, TW) pixel corner coordinates.
    x0..y1: broadcastable edge coordinates.
    Exact integral of clamp(px+1 - x(y), 0, 1) over the pixel's y-slab.

    Division-free per pixel: with u(y) = px+1-x(y) linear (du/dy = -m),
       ∫ clamp(u) dy = (G(u0) - G(u1)) / m,      G(u) = c·(u - c/2),
    where c = clamp(u,0,1) — G needs no piecewise selects.  1/m is a
    per-EDGE scalar; near-vertical edges (|m| tiny) use the constant-u
    midpoint rule instead (error ≤ |m|·h/2 ≤ 0.005 coverage).
    """
    ymin = jnp.minimum(y0, y1)
    ymax = jnp.maximum(y0, y1)
    s = jnp.sign(y1 - y0)
    dy = y1 - y0
    m = (x1 - x0) / jnp.where(jnp.abs(dy) < _EPS, 1.0, dy)
    steep = jnp.abs(m) < 0.01
    s_over_m = s / jnp.where(steep, 1.0, m)     # per-edge scalars

    # per-pixel part
    ytop = jnp.maximum(ymin, py)
    h = jnp.maximum(jnp.minimum(ymax, py + 1.0) - ytop, 0.0)
    u0 = (px + 1.0) - (x0 + m * (ytop - y0))
    u1 = u0 - m * h

    c0 = jnp.clip(u0, 0.0, 1.0)
    c1 = jnp.clip(u1, 0.0, 1.0)
    g0 = c0 * (u0 - 0.5 * c0)
    g1 = c1 * (u1 - 0.5 * c1)
    general = (g0 - g1) * s_over_m
    vertical = s * h * c0
    return jnp.where(steep, vertical, general)


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


def build_cov_gather_map(chunk_pools, num_entries: int) -> dict:
    """Host-side (numpy) inverse of the chunk->entry map.

    Most entries own exactly ONE chunk (single-chunk pools cover the bulk of
    the edge-count histogram), so the chunk->entry reduction is a
    near-permutation: entry coverage = one GATHER of each entry's primary
    chunk + a small scatter-add of the leftover chunks of multi-chunk
    entries.  A gather is much cheaper than the general segment-sum scatter
    (measured ~0.9 ms -> ~0.3 ms on the 1080p benchmark frame).

    Returns numpy arrays:
      primary (NE,) i32   — global chunk id per entry (dead id = all-zeros)
      extra_chunk (K,)    — leftover chunk ids (padded with the dead id)
      extra_entry (K,)    — their entries (padded with NE-1, a pad entry)
    """
    cents = [np.asarray(cent) for _ce, cent in chunk_pools]
    cent_all = np.concatenate(cents) if cents else np.zeros(0, np.int64)
    total = len(cent_all)
    # liveness: a chunk with only zero-height edges contributes exactly zero
    alive = np.concatenate([
        (np.abs(np.asarray(ce)[:, :, 3] - np.asarray(ce)[:, :, 1]) > 1e-12).any(axis=1)
        for ce, _cent in chunk_pools
    ]) if cents else np.zeros(0, bool)

    dead_id = total             # index of the appended all-zeros row
    primary = np.full(num_entries, dead_id, np.int32)
    # first chunk per entry without a sort: reversed assignment makes the
    # FIRST occurrence win (np.unique cost ~1 ms/frame on dynamic scenes)
    valid = (cent_all >= 0) & (cent_all < num_entries)
    idxs = np.arange(total, dtype=np.int32)
    primary[cent_all[valid][::-1]] = idxs[valid][::-1]
    is_first = np.zeros(total, bool)
    first_idx = primary[cent_all[valid]]
    is_first[first_idx] = True
    em = alive & ~is_first
    extra_chunk = np.nonzero(em)[0].astype(np.int32)
    extra_entry = cent_all[em].astype(np.int32)
    k = _next_bucket(max(len(extra_chunk), 1))
    ec = np.full(k, dead_id, np.int32)
    ee = np.full(k, num_entries - 1, np.int32)   # pad entry: zero adds land there
    ec[: len(extra_chunk)] = extra_chunk
    ee[: len(extra_entry)] = extra_entry
    return {
        "primary": primary,
        "extra_chunk": ec,
        "extra_entry": ee,
        # extras' target rows when folding into cov_all (see cov_all_resolved)
        "extra_primary": primary[ee],
    }


def _next_bucket(n: int, minimum: int = 8) -> int:
    from vgtpu.raster.binning import _bucket

    return _bucket(n, minimum=minimum)


def _cov_all(chunk_pools, tile_h: int, tile_w: int) -> jax.Array:
    """All pools' per-chunk coverage as ONE (NC+1, NPX) array (last row is
    the all-zeros 'dead chunk' that chunkless entries index).  Pools with
    lane-aligned chunk counts take the chunk-major Pallas kernel on TPU
    (writes (NC, NPX) directly — no HBM transpose pass); the backend choice
    is trace-time (platform is static under jit)."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        on_tpu = False
    npx = tile_h * tile_w
    covs = []
    for ce, _cent in chunk_pools:
        if on_tpu and ce.shape[0] % 128 == 0 and ce.shape[0] >= 128:
            from vgtpu.ops.coverage_pallas import coverage_chunks_pallas_rt_raw

            covs.append(coverage_chunks_pallas_rt_raw(ce, tile_h, tile_w))
        else:
            covs.append(coverage_chunks_body(ce, tile_h, tile_w).reshape(-1, npx))
    covs.append(jnp.zeros((1, npx), jnp.float32))       # dead chunk row
    return jnp.concatenate(covs, axis=0)                # (NC+1, NPX)


def cov_all_resolved(chunk_pools, cov_map: dict, tile_h: int, tile_w: int) -> jax.Array:
    """Chunk coverage with multi-chunk entries' extra coverage folded into
    their primary chunk's row (so entry coverage == cov_all[primary[e]] by
    construction).  Lets the fused composite gather straight from chunk
    coverage — the (NE, NPX) entry_w array is never materialized."""
    cov_all = _cov_all(chunk_pools, tile_h, tile_w)
    # fold extras into their entry's primary chunk row (primary rows are
    # unique per entry; extra rows are only ever sources)
    return cov_all.at[cov_map["extra_primary"]].add(cov_all[cov_map["extra_chunk"]])


def entry_coverage_gather(chunk_pools, cov_map: dict, num_entries: int,
                          tile_h: int, tile_w: int) -> jax.Array:
    """Entry coverage via the inverse-permutation gather (TPU fast path).
    Matches entry_coverage_from_pools up to float reassociation across a
    multi-chunk entry's adds (same chunk order, so identical for the
    single-chunk majority; tests compare both paths pixel-wise)."""
    cov_all = _cov_all(chunk_pools, tile_h, tile_w)
    w = cov_all[cov_map["primary"]]
    w = w.at[cov_map["extra_entry"]].add(cov_all[cov_map["extra_chunk"]])
    return w.reshape(num_entries, tile_h, tile_w)


def entry_coverage_from_pools(chunk_pools, num_entries: int,
                              tile_h: int, tile_w: int) -> jax.Array:
    """Pooled coverage: chunk buffers come in several chunk sizes (entries
    with few edges use small chunks — measured 47%→66% slot fill on the
    benchmark scene).  Coverage is additive, so pools sum independently.

    On TPU, pools with lane-aligned chunk counts use the transposed-layout
    Pallas kernel (coverage_pallas.coverage_chunks_pallas_t — measured faster
    than the XLA formulation); everything else takes the XLA path.  The
    backend choice is trace-time (platform is static under jit).

    The reduction runs on FLAT (chunks, pixels) 2D arrays: segment-summing
    the 3D (chunks, th, tw) form measured ~0.6 ms slower per frame at 1080p
    (XLA fuses the kernel-output transpose + 2D segment-sum into one pass)."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        on_tpu = False
    npx = tile_h * tile_w
    acc = None
    for ce, cent in chunk_pools:
        if on_tpu and ce.shape[0] % 128 == 0 and ce.shape[0] >= 128:
            from vgtpu.ops.coverage_pallas import coverage_chunks_pallas_t_raw

            cov_flat = jnp.transpose(
                coverage_chunks_pallas_t_raw(ce, tile_h, tile_w), (1, 0))
        else:
            cov_flat = coverage_chunks_body(ce, tile_h, tile_w).reshape(-1, npx)
        part = jax.ops.segment_sum(cov_flat, cent, num_segments=num_entries)
        acc = part if acc is None else acc + part
    return acc.reshape(num_entries, tile_h, tile_w)
