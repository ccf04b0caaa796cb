"""Pallas TPU kernel for analytic winding coverage.

Same math as vgtpu/ops/coverage.py (division-free G-form, see
ARCHITECTURE.md), hand-scheduled for the VPU.  Layout: the pixel grid is
flattened to the lane axis — blocks are (BC chunks, TH*TW pixels), so every
broadcast is single-axis (per-edge params broadcast along lanes, the pixel
iota along sublanes; Mosaic does not lower dual sublane+lane broadcasts).

On non-TPU backends the kernel runs in interpreter mode (tests compare it
against the XLA implementation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BC = 64  # chunks per grid step


def _kernel(edges_ref, out_ref, *, ch: int, tile_h: int, tile_w: int):
    npx = tile_h * tile_w
    bc = out_ref.shape[0]
    flat = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
    px = (flat % tile_w).astype(jnp.float32)      # (1, NPX): sublane-broadcasts
    py = (flat // tile_w).astype(jnp.float32)

    j = pl.program_id(1)

    e = edges_ref[:, pl.ds(j, 1), :]              # (BC,1,4) slot j
    x0 = e[:, 0, 0].reshape(bc, 1)                # (BC,1): lane-broadcasts
    y0 = e[:, 0, 1].reshape(bc, 1)
    x1 = e[:, 0, 2].reshape(bc, 1)
    y1 = e[:, 0, 3].reshape(bc, 1)

    ymin = jnp.minimum(y0, y1)
    ymax = jnp.maximum(y0, y1)
    s = jnp.sign(y1 - y0)
    dy = y1 - y0
    m = (x1 - x0) / jnp.where(jnp.abs(dy) < 1e-6, 1.0, dy)
    steep = jnp.abs(m) < 0.01
    s_over_m = s / jnp.where(steep, 1.0, m)

    ytop = jnp.maximum(ymin, py)
    h = jnp.maximum(jnp.minimum(ymax, py + 1.0) - ytop, 0.0)
    u0 = (px + 1.0) - (x0 + m * (ytop - y0))
    u1 = u0 - m * h
    c0 = jnp.clip(u0, 0.0, 1.0)
    c1 = jnp.clip(u1, 0.0, 1.0)
    g0 = c0 * (u0 - 0.5 * c0)
    g1 = c1 * (u1 - 0.5 * c1)
    contrib = jnp.where(steep, (s * h) * c0, (g0 - g1) * s_over_m)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros((bc, npx), jnp.float32)

    out_ref[:] += contrib


@functools.partial(jax.jit, static_argnames=("tile_h", "tile_w", "interpret"))
def coverage_chunks_pallas(
    chunk_edges: jax.Array, tile_h: int = 8, tile_w: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """(NC, CH, 4) -> (NC, TH, TW)."""
    nc, ch, _ = chunk_edges.shape
    bc = min(_BC, nc)
    if nc % bc:
        bc = _largest_divisor(nc, bc)
    grid = (nc // bc, ch)   # edge slot in the grid: Mosaic pipelines the steps
    npx = tile_h * tile_w
    out = pl.pallas_call(
        functools.partial(_kernel, ch=ch, tile_h=tile_h, tile_w=tile_w),
        out_shape=jax.ShapeDtypeStruct((nc, npx), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bc, ch, 4), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bc, npx), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(chunk_edges)
    return out.reshape(nc, tile_h, tile_w)


def _largest_divisor(n: int, cap: int) -> int:
    d = cap
    while d > 1 and n % d:
        d //= 2
    return max(d, 1)


def coverage_backend_default() -> str:
    """'pallas' on TPU, 'xla' elsewhere (pallas interpret mode is for tests)."""
    try:
        return "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    except Exception:  # noqa: BLE001
        return "xla"


# ---------------------------------------------------------------------------
# Transposed-layout kernel: blocks are (pixels, chunks) so per-edge parameters
# live along LANES (no broadcast at all) and the pixel iota broadcasts along
# lanes from (NPX, 1) — every relayout Mosaic dislikes is gone.
# ---------------------------------------------------------------------------

def _edge_contrib_t(px, py, x0, y0, x1, y1):
    """Signed area a (1,BC)-lane edge sweeps over each (NPX,1) pixel row."""
    ymin = jnp.minimum(y0, y1)
    ymax = jnp.maximum(y0, y1)
    s = jnp.sign(y1 - y0)
    dy = y1 - y0
    m = (x1 - x0) / jnp.where(jnp.abs(dy) < 1e-6, 1.0, dy)
    steep = jnp.abs(m) < 0.01
    s_over_m = s / jnp.where(steep, 1.0, m)

    ytop = jnp.maximum(ymin, py)
    h = jnp.maximum(jnp.minimum(ymax, py + 1.0) - ytop, 0.0)
    u0 = (px + 1.0) - (x0 + m * (ytop - y0))
    u1 = u0 - m * h
    c0 = jnp.clip(u0, 0.0, 1.0)
    c1 = jnp.clip(u1, 0.0, 1.0)
    g0 = c0 * (u0 - 0.5 * c0)
    g1 = c1 * (u1 - 0.5 * c1)
    return jnp.where(steep, (s * h) * c0, (g0 - g1) * s_over_m)


def _kernel_t(edges_ref, out_ref, *, ch: int, tile_h: int, tile_w: int,
              unroll: int = 1):
    npx = tile_h * tile_w
    j = pl.program_id(1)

    flat = jax.lax.broadcasted_iota(jnp.int32, (npx, 1), 0)
    px = (flat % tile_w).astype(jnp.float32)  # (NPX,1): lane-broadcasts
    py = (flat // tile_w).astype(jnp.float32)

    acc = None
    for k in range(unroll):
        row = (j * unroll + k) * 4
        x0 = edges_ref[pl.ds(row, 1), :]      # (1, BC): lane vector
        y0 = edges_ref[pl.ds(row + 1, 1), :]
        x1 = edges_ref[pl.ds(row + 2, 1), :]
        y1 = edges_ref[pl.ds(row + 3, 1), :]
        c = _edge_contrib_t(px, py, x0, y0, x1, y1)
        acc = c if acc is None else acc + c

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += acc


def _kernel_t2(edges_ref, out_ref, *, ch: int, tile_h: int, tile_w: int,
               unroll: int = 1):
    """Row-structured variant of _kernel_t: every y-slab quantity (ytop, h,
    x(ytop), m*h, s*h) depends only on the pixel ROW, so it is computed as a
    cheap (1, BC) lane vector per row; only the x-ramp clamp/integration runs
    at full (TW, BC) width.  ~17 full-width VPU ops per edge-slot-pixel vs
    ~25 for the flat kernel (measured -20% on the benchmark pools).
    Bit-exact vs _kernel_t: same expressions, same order, per pixel."""
    j = pl.program_id(1)

    colf = jax.lax.broadcasted_iota(jnp.int32, (tile_w, 1), 0).astype(jnp.float32)
    px1 = colf + 1.0                       # (TW, 1): lane-broadcasts

    # per-edge lane params for the step's unrolled edges (all (1, BC))
    params = []
    for k in range(unroll):
        row = (j * unroll + k) * 4
        x0 = edges_ref[pl.ds(row, 1), :]
        y0 = edges_ref[pl.ds(row + 1, 1), :]
        x1 = edges_ref[pl.ds(row + 2, 1), :]
        y1 = edges_ref[pl.ds(row + 3, 1), :]
        ymin = jnp.minimum(y0, y1)
        ymax = jnp.maximum(y0, y1)
        s = jnp.sign(y1 - y0)
        dy = y1 - y0
        m = (x1 - x0) / jnp.where(jnp.abs(dy) < 1e-6, 1.0, dy)
        steep = jnp.abs(m) < 0.01
        b_gen = jnp.where(steep, 0.0, s / jnp.where(steep, 1.0, m))
        params.append((x0, y0, ymin, ymax, s, m, steep, b_gen))

    for r in range(tile_h):
        acc = None
        for (x0, y0, ymin, ymax, s, m, steep, b_gen) in params:
            # per-(row, edge) lane vectors
            ytop = jnp.maximum(ymin, float(r))
            h = jnp.maximum(jnp.minimum(ymax, float(r + 1)) - ytop, 0.0)
            xr = x0 + m * (ytop - y0)      # x at the slab top
            mh = m * h
            a_vert = jnp.where(steep, s * h, 0.0)
            # full-width (TW, BC) part
            u0 = px1 - xr
            u1 = u0 - mh
            c0 = jnp.clip(u0, 0.0, 1.0)
            c1 = jnp.clip(u1, 0.0, 1.0)
            g0 = c0 * (u0 - 0.5 * c0)
            g1 = c1 * (u1 - 0.5 * c1)
            contrib = (g0 - g1) * b_gen + a_vert * c0
            acc = contrib if acc is None else acc + contrib

        sl = pl.ds(r * tile_w, tile_w)

        @pl.when(j == 0)
        def _(sl=sl, acc=acc):
            out_ref[sl, :] = acc

        @pl.when(j != 0)
        def _(sl=sl, acc=acc):
            out_ref[sl, :] += acc


@functools.partial(
    jax.jit,
    static_argnames=("tile_h", "tile_w", "interpret", "unroll", "variant"))
def coverage_chunks_pallas_t_raw(
    chunk_edges: jax.Array, tile_h: int = 8, tile_w: int = 128,
    interpret: bool = False, unroll: int = 0, variant: str = "row",
) -> jax.Array:
    """Transposed-layout kernel, raw (NPX, NC) output (no relayout — callers
    fuse the transpose into their reduction).  variant 'row' = row-structured
    _kernel_t2 (default, fastest), 'flat' = the original _kernel_t."""
    nc, ch, _ = chunk_edges.shape
    bc = _largest_divisor(nc, 256)
    npx = tile_h * tile_w
    # Several edges per grid step cut Mosaic's per-step sequencing +
    # output-RMW overhead.  Measured on the benchmark pools (ms, 2048x24 /
    # 4096x6 / 8192x2): u4 wins for ch=24 (0.45 vs 0.49 u2 / 0.59 u1), u3~u1
    # for ch=6 (0.18 vs 0.31 u2), u2 for ch=2 (0.18 vs 0.20 u1); u>=6 loses
    # everywhere (register pressure).  unroll=0 picks by that table.
    if unroll == 0:
        unroll = next((u for u in (4, 3, 2) if ch % u == 0), 1)
    kern = _kernel_t2 if variant == "row" else _kernel_t
    # (NC, CH, 4) -> (CH*4, NC): per-edge params along lanes
    edges_t = jnp.transpose(chunk_edges, (1, 2, 0)).reshape(ch * 4, nc)
    return pl.pallas_call(
        functools.partial(kern, ch=ch, tile_h=tile_h, tile_w=tile_w,
                          unroll=unroll),
        out_shape=jax.ShapeDtypeStruct((npx, nc), jnp.float32),
        grid=(nc // bc, ch // unroll),
        in_specs=[
            pl.BlockSpec((ch * 4, bc), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((npx, bc), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(edges_t)


def _kernel_t2_rt(edges_ref, out_ref, *, ch: int, tile_h: int, tile_w: int,
                  unroll: int = 1):
    """_kernel_t2 with a transposed OUTPUT layout: each row's (TW, BC)
    contribution is transposed in VMEM and written to a (BC, NPX) block, so
    the caller gets chunk-major (NC, NPX) coverage directly — the 53 MB
    HBM concat+transpose the (NPX, NC) layout needed downstream disappears
    (measured net -0.15 ms on the benchmark pools)."""
    j = pl.program_id(1)
    colf = jax.lax.broadcasted_iota(jnp.int32, (tile_w, 1), 0).astype(jnp.float32)
    px1 = colf + 1.0

    params = []
    for k in range(unroll):
        row = (j * unroll + k) * 4
        x0 = edges_ref[pl.ds(row, 1), :]
        y0 = edges_ref[pl.ds(row + 1, 1), :]
        x1 = edges_ref[pl.ds(row + 2, 1), :]
        y1 = edges_ref[pl.ds(row + 3, 1), :]
        ymin = jnp.minimum(y0, y1)
        ymax = jnp.maximum(y0, y1)
        s = jnp.sign(y1 - y0)
        dy = y1 - y0
        m = (x1 - x0) / jnp.where(jnp.abs(dy) < 1e-6, 1.0, dy)
        steep = jnp.abs(m) < 0.01
        b_gen = jnp.where(steep, 0.0, s / jnp.where(steep, 1.0, m))
        params.append((x0, y0, ymin, ymax, s, m, steep, b_gen))

    for r in range(tile_h):
        acc = None
        for (x0, y0, ymin, ymax, s, m, steep, b_gen) in params:
            ytop = jnp.maximum(ymin, float(r))
            h = jnp.maximum(jnp.minimum(ymax, float(r + 1)) - ytop, 0.0)
            xr = x0 + m * (ytop - y0)
            mh = m * h
            a_vert = jnp.where(steep, s * h, 0.0)
            u0 = px1 - xr
            u1 = u0 - mh
            c0 = jnp.clip(u0, 0.0, 1.0)
            c1 = jnp.clip(u1, 0.0, 1.0)
            g0 = c0 * (u0 - 0.5 * c0)
            g1 = c1 * (u1 - 0.5 * c1)
            contrib = (g0 - g1) * b_gen + a_vert * c0
            acc = contrib if acc is None else acc + contrib
        accT = jnp.transpose(acc, (1, 0))   # (BC, TW)
        sl = pl.ds(r * tile_w, tile_w)

        @pl.when(j == 0)
        def _(sl=sl, accT=accT):
            out_ref[:, sl] = accT

        @pl.when(j != 0)
        def _(sl=sl, accT=accT):
            out_ref[:, sl] += accT


@functools.partial(
    jax.jit, static_argnames=("tile_h", "tile_w", "interpret", "unroll"))
def coverage_chunks_pallas_rt_raw(
    chunk_edges: jax.Array, tile_h: int = 8, tile_w: int = 128,
    interpret: bool = False, unroll: int = 0,
) -> jax.Array:
    """Row-structured kernel with chunk-major output: (NC, CH, 4) -> (NC, NPX)."""
    nc, ch, _ = chunk_edges.shape
    bc = _largest_divisor(nc, 128)
    npx = tile_h * tile_w
    if unroll == 0:
        unroll = next((u for u in (4, 3, 2) if ch % u == 0), 1)
    edges_t = jnp.transpose(chunk_edges, (1, 2, 0)).reshape(ch * 4, nc)
    return pl.pallas_call(
        functools.partial(_kernel_t2_rt, ch=ch, tile_h=tile_h, tile_w=tile_w,
                          unroll=unroll),
        out_shape=jax.ShapeDtypeStruct((nc, npx), jnp.float32),
        grid=(nc // bc, ch // unroll),
        in_specs=[
            pl.BlockSpec((ch * 4, bc), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bc, npx), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(edges_t)


def coverage_chunks_pallas_t(
    chunk_edges: jax.Array, tile_h: int = 8, tile_w: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Transposed-layout variant; returns (NC, TH, TW) like the others."""
    nc = chunk_edges.shape[0]
    out = coverage_chunks_pallas_t_raw(chunk_edges, tile_h, tile_w, interpret)
    return jnp.transpose(out, (1, 0)).reshape(nc, tile_h, tile_w)
