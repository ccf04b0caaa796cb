"""In-kernel coverage resolution (ops/coverage_resolve.py) vs its vectorized
reference: the Pallas epilogue must reproduce resolve_cov_rows (which itself
mirrors the XLA composite's rule/AA/scissor/ss-average expressions)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vgtpu.ops.coverage import coverage_chunks_body  # noqa: E402
from vgtpu.ops.coverage_resolve import (  # noqa: E402
    RP_BD,
    RP_EO,
    RP_NOAA,
    RP_SC,
    RP_TEXF,
    _SC_SENTINEL,
    coverage_chunks_pallas_res,
    resolve_cov_rows,
    rp_rows,
)


def _random_case(rng, nc, ch, tile_h, tile_w):
    edges = np.zeros((nc, ch, 4), np.float32)
    # mix of general / near-vertical / degenerate edges inside the tile
    pts = rng.uniform(-2, tile_w + 2, size=(nc, ch, 2)).astype(np.float32)
    ys = rng.uniform(-2, tile_h + 2, size=(nc, ch, 2)).astype(np.float32)
    edges[:, :, 0] = pts[:, :, 0]
    edges[:, :, 2] = pts[:, :, 1]
    edges[:, :, 1] = ys[:, :, 0]
    edges[:, :, 3] = ys[:, :, 1]
    steep = rng.uniform(size=(nc, ch)) < 0.25
    edges[:, :, 2] = np.where(steep, edges[:, :, 0] + rng.uniform(
        -0.005, 0.005, size=(nc, ch)), edges[:, :, 2])
    dead = rng.uniform(size=(nc, ch)) < 0.1
    edges[dead] = 0.0

    rp = np.zeros((rp_rows(tile_h), nc), np.float32)
    rp[RP_EO] = (rng.uniform(size=nc) < 0.3).astype(np.float32)
    rp[RP_NOAA] = (rng.uniform(size=nc) < 0.3).astype(np.float32)
    rp[RP_TEXF] = (rng.uniform(size=nc) < 0.15).astype(np.float32)
    has_sc = rng.uniform(size=nc) < 0.5
    sx0 = rng.uniform(-4, tile_w, size=nc)
    sy0 = rng.uniform(-4, tile_h, size=nc)
    rp[RP_SC + 0] = np.where(has_sc, sx0, -_SC_SENTINEL)
    rp[RP_SC + 1] = np.where(has_sc, sy0, -_SC_SENTINEL)
    rp[RP_SC + 2] = np.where(has_sc, sx0 + rng.uniform(1, tile_w, size=nc), _SC_SENTINEL)
    rp[RP_SC + 3] = np.where(has_sc, sy0 + rng.uniform(1, tile_h, size=nc), _SC_SENTINEL)
    rp[RP_BD : RP_BD + tile_h] = rng.integers(
        -2, 3, size=(tile_h, nc)).astype(np.float32)
    return edges, rp


@pytest.mark.parametrize("ss,ch", [(1, 4), (2, 4), (2, 6), (4, 8), (2, 24)])
def test_resolve_kernel_matches_reference(ss, ch):
    rng = np.random.default_rng(ss * 100 + ch)
    tile_h, tile_w = 8 * ss, 128
    nc = 128
    edges, rp = _random_case(rng, nc, ch, tile_h, tile_w)

    w_rows = coverage_chunks_body(jnp.asarray(edges), tile_h, tile_w).reshape(
        nc, tile_h * tile_w)
    want = np.asarray(resolve_cov_rows(
        w_rows, jnp.asarray(rp), tile_h=tile_h, tile_w=tile_w, ss=ss))
    got = np.asarray(coverage_chunks_pallas_res(
        jnp.asarray(edges), jnp.asarray(rp), tile_h, tile_w, ss,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_resolve_reference_matches_composite_semantics():
    """resolve_cov_rows must equal the composite's own cov expressions
    (ops/composite.py:150-219) for a hand-built case: even-odd ring, non-AA
    threshold, scissor clipping an edge pixel, ss-mean."""
    tile_h, tile_w, ss = 16, 128, 2
    nc = 128
    rng = np.random.default_rng(0)
    edges, rp = _random_case(rng, nc, 4, tile_h, tile_w)
    w_rows = coverage_chunks_body(jnp.asarray(edges), tile_h, tile_w).reshape(
        nc, tile_h * tile_w)
    got = np.asarray(resolve_cov_rows(
        w_rows, jnp.asarray(rp), tile_h=tile_h, tile_w=tile_w, ss=ss))

    # independent numpy mirror of the XLA composite's expressions
    w = np.asarray(w_rows).reshape(nc, tile_h, tile_w) + rp[RP_BD:RP_BD + tile_h].T[:, :, None]
    cov = np.minimum(np.abs(w), 1.0)
    cov_eo = 1.0 - np.abs(np.mod(w, 2.0) - 1.0)
    cov = np.where(rp[RP_EO][:, None, None] > 0, cov_eo, cov)
    cov = np.where(rp[RP_NOAA][:, None, None] > 0, (cov >= 0.5).astype(np.float32), cov)
    cov = np.where(rp[RP_TEXF][:, None, None] > 0, 1.0, cov)
    pxl = np.arange(tile_w, dtype=np.float32)[None, None, :] + 0.5
    pyl = np.arange(tile_h, dtype=np.float32)[None, :, None] + 0.5
    inside = ((pxl >= rp[RP_SC][:, None, None]) & (pyl >= rp[RP_SC + 1][:, None, None])
              & (pxl < rp[RP_SC + 2][:, None, None]) & (pyl < rp[RP_SC + 3][:, None, None]))
    cov = cov * inside
    want = cov.reshape(nc, tile_h // ss, ss, tile_w).mean(axis=2).reshape(nc, -1)
    np.testing.assert_allclose(got, want, atol=2e-6)
