"""In-kernel coverage RESOLUTION for the supersampled (conflation-free) path.

Motivation (measured, ss=2 benchmark frame): every stage between the coverage
kernel and the composite's shading lanes scales with the SUB-row domain —
coverage writes, the per-bucket pteb gather, and the composite's per-sub-row
rule/AA/scissor math together cost ~1.4 ms of the 2.26 ms frame.  A previous
attempt to fix this with an XLA pre-pass (rule/aa/scissor/ss-average fused
into the gather) measured at parity: the pre-pass's own HBM traffic cost what
the kernel saved (CLAUDE.md failed-experiments).

This module moves the resolution INSIDE the coverage kernel where the
accumulated winding is already VMEM-resident: the kernel accumulates per-chunk
winding over edge slots in VMEM scratch, then an epilogue adds the entry's
backdrop, applies the fill rule / AA select / scissor per SUB-row, averages
each group of ss sub-rows, and writes OUTPUT-domain coverage — (NC, NPX/ss)
instead of (NC, NPX).  Downstream, the gather moves half (ss=2) or a quarter
(ss=4) of the bytes and the composite kernel reads final coverage directly.

Only chunks whose entry the kernel can fully resolve take this path:
  * the entry owns exactly ONE chunk (the fill rule needs the TOTAL winding),
  * the entry's tile has no clip commands (the clip mask multiplies coverage
    per sub-row with sequentially-built state — composite-side by nature).
Everything else (multi-chunk entries, clip-tile entries) keeps the raw
sub-row path; multi-chunk NON-clip entries are resolved by a small vectorized
XLA pass over their folded totals (resolve_cov_rows body below — the same
expressions as the kernel epilogue, kept in one place).

Semantics are the XLA composite's, expression for expression
(ops/composite.py:150-219): cov = min(|w|,1); even-odd 1-|mod(w,2)-1| when the
entry's rule says so AND its bucket's lane is active; non-AA >= 0.5 threshold;
pixel-center scissor test; mean over ss sub-rows of the rule-applied coverage.
Bucket-lane gating is baked into the per-chunk params host-side so a bucket
that never uses a lane gets bit-identical output to the lane-disabled XLA
composite (scissorless chunks carry a sentinel rect; multiplying by its exact
1.0 inside-mask is an IEEE no-op).

Reference behavior covered: the fill rules + AA of vg.h FillFlags
(vg.h:102-152) and the scissor rect of vg::setScissor — this file only moves
WHERE they are applied, not what they compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rparams rows (f32, lanes = chunks)
RP_EO = 0        # 1.0: apply the even-odd rule (bucket lane AND entry rule)
RP_NOAA = 1      # 1.0: threshold coverage at 0.5 (bucket lane AND not aa)
RP_TEXF = 2      # 1.0: force coverage to 1 (textured quads carry alpha)
RP_SC = 3        # 3..6 scissor x0,y0,x1,y1 (TILE-LOCAL px; y in sub-rows)
RP_BD = 8        # 8..8+tile_h  per-sub-row backdrop winding
_SC_SENTINEL = 1e9


def rp_rows(tile_h: int) -> int:
    """rparams row count, padded to a sublane multiple."""
    return -(-(RP_BD + tile_h) // 8) * 8


def build_chunk_rparams(
    cent: np.ndarray,            # (NC,) chunk -> entry
    entry_rule: np.ndarray,
    entry_aa: np.ndarray,
    entry_paint_kind: np.ndarray,
    entry_scissor: np.ndarray,   # (NE, 4) screen px (sub-row y units)
    entry_backdrop: np.ndarray,  # (NE, tile_h)
    entry_tile: np.ndarray,      # (NE,) flat tile id
    entry_flags,                 # (NE, 4) bool [eo, noaa, tex, scissor] lanes
    *, tile_h: int, tile_w: int, ntx: int,
) -> np.ndarray:
    """(RP_ROWS, NC) per-chunk resolve params.  entry_flags carries the
    ENTRY'S BUCKET lane gates so resolution matches the lane-specialized
    composite exactly (a disabled lane is a no-op here too)."""
    from vgtpu.raster.binning import P_TEXTURE

    e = np.clip(cent, 0, entry_rule.shape[0] - 1).astype(np.int64)
    nc = len(cent)
    rp = np.zeros((rp_rows(tile_h), nc), np.float32)
    eo_l, noaa_l, tex_l, sc_l = (entry_flags[e, k] for k in range(4))
    rp[RP_EO] = (eo_l & (entry_rule[e] != 0)).astype(np.float32)
    rp[RP_NOAA] = (noaa_l & (entry_aa[e] == 0)).astype(np.float32)
    rp[RP_TEXF] = (tex_l & (entry_paint_kind[e] == P_TEXTURE)).astype(np.float32)
    ox = ((entry_tile[e] % ntx) * tile_w).astype(np.float32)
    oy = ((entry_tile[e] // ntx) * tile_h).astype(np.float32)
    sc = entry_scissor[e].astype(np.float32)
    rp[RP_SC + 0] = np.where(sc_l, sc[:, 0] - ox, -_SC_SENTINEL)
    rp[RP_SC + 1] = np.where(sc_l, sc[:, 1] - oy, -_SC_SENTINEL)
    rp[RP_SC + 2] = np.where(sc_l, sc[:, 2] - ox, _SC_SENTINEL)
    rp[RP_SC + 3] = np.where(sc_l, sc[:, 3] - oy, _SC_SENTINEL)
    rp[RP_BD : RP_BD + tile_h] = entry_backdrop[e].astype(np.float32).T
    return rp


def entry_resolve_rparams(entry_rule, entry_aa, entry_paint_kind,
                          entry_scissor, entry_tile, entry_bflags,
                          rx, ry, *, tile_h: int, tile_w: int, ntx: int):
    """In-trace per-ENTRY resolve params for the retained-pan path
    (raster/retained._render_pan_body): same rows as build_chunk_rparams but
    built on device because the scissor's tile-local rect takes the pan
    RESIDUAL (rx, ry) — content shifts left/up by the residual, so the
    scissor does too (the composite kernel's P_OX += rx convention).  The
    RP_BD rows stay zero: the pan entry coverage already carries its
    backdrop (dynamic window slice), so resolve_cov_rows' add is a no-op.

    entry_bflags: (NE, >=4) bool — the entry's bucket lane gates
    [eo, noaa, tex, scissor] (raster/resolve.entry_bucket_flags)."""
    from vgtpu.raster.binning import P_TEXTURE

    ne = entry_rule.shape[0]
    eo_l = entry_bflags[:, 0]
    noaa_l = entry_bflags[:, 1]
    tex_l = entry_bflags[:, 2]
    sc_l = entry_bflags[:, 3]
    rp = jnp.zeros((rp_rows(tile_h), ne), jnp.float32)
    rp = rp.at[RP_EO].set((eo_l & (entry_rule != 0)).astype(jnp.float32))
    rp = rp.at[RP_NOAA].set((noaa_l & (entry_aa == 0)).astype(jnp.float32))
    rp = rp.at[RP_TEXF].set(
        (tex_l & (entry_paint_kind == P_TEXTURE)).astype(jnp.float32))
    ox = ((entry_tile % ntx) * tile_w).astype(jnp.float32) + rx
    oy = ((entry_tile // ntx) * tile_h).astype(jnp.float32) + ry
    sc = entry_scissor.astype(jnp.float32)
    rp = rp.at[RP_SC + 0].set(jnp.where(sc_l, sc[:, 0] - ox, -_SC_SENTINEL))
    rp = rp.at[RP_SC + 1].set(jnp.where(sc_l, sc[:, 1] - oy, -_SC_SENTINEL))
    rp = rp.at[RP_SC + 2].set(jnp.where(sc_l, sc[:, 2] - ox, _SC_SENTINEL))
    rp = rp.at[RP_SC + 3].set(jnp.where(sc_l, sc[:, 3] - oy, _SC_SENTINEL))
    return rp


def resolve_cov_rows(w_rows: jax.Array, rp: jax.Array,
                     *, tile_h: int, tile_w: int, ss: int) -> jax.Array:
    """Vectorized reference of the kernel epilogue: (N, tile_h*tile_w) raw
    winding (WITHOUT backdrop) + (RP_ROWS, N) params -> (N, (tile_h//ss)*tile_w)
    resolved output-domain coverage.  Used for the multi-chunk XLA resolve,
    the non-TPU fallback, and as the kernel's test oracle."""
    n = w_rows.shape[0]
    w = w_rows.reshape(n, tile_h, tile_w) + rp[RP_BD : RP_BD + tile_h].T[:, :, None]
    cov = jnp.minimum(jnp.abs(w), 1.0)
    cov_eo = 1.0 - jnp.abs(jnp.mod(w, 2.0) - 1.0)
    cov = jnp.where(rp[RP_EO][:, None, None] > 0, cov_eo, cov)
    cov = jnp.where(rp[RP_NOAA][:, None, None] > 0,
                    (cov >= 0.5).astype(jnp.float32), cov)
    cov = jnp.where(rp[RP_TEXF][:, None, None] > 0, 1.0, cov)
    pxl = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 1) + 0.5
    pyl = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 0) + 0.5
    inside = (
        (pxl >= rp[RP_SC + 0][:, None, None])
        & (pyl >= rp[RP_SC + 1][:, None, None])
        & (pxl < rp[RP_SC + 2][:, None, None])
        & (pyl < rp[RP_SC + 3][:, None, None])
    )
    cov = cov * inside.astype(jnp.float32)
    th_out = tile_h // ss
    if ss > 1:
        cov = jnp.mean(cov.reshape(n, th_out, ss, tile_w), axis=2)
    return cov.reshape(n, th_out * tile_w)


def cov_split_resolved(chunk_pools, res: dict, tile_h: int, tile_w: int,
                       ss: int):
    """Device coverage for a resolve-split plan (raster/resolve.py):
      cov_final (NR + NXE_P + 1, NPX_OUT) — res-pool kernels ++ the XE
          (multi-chunk non-clip entry) XLA resolve ++ a dead zeros row;
      cov_sub  (NXraw + 1, NPX_SUB)       — raw pools ++ dead, extras folded.
    The res-pool count is static via the rparams tuple structure."""
    from vgtpu.ops.coverage import _cov_all

    k = len(res["rparams"])
    npx = tile_h * tile_w
    npx_out = (tile_h // ss) * tile_w
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        on_tpu = False

    fin_rows = []
    for (ce, _cent), rp in zip(chunk_pools[:k], res["rparams"]):
        if on_tpu and ce.shape[0] % 128 == 0 and ce.shape[0] >= 128:
            fin_rows.append(
                coverage_chunks_pallas_res(ce, rp, tile_h, tile_w, ss))
        else:
            from vgtpu.ops.coverage import coverage_chunks_body

            w = coverage_chunks_body(ce, tile_h, tile_w).reshape(-1, npx)
            fin_rows.append(
                resolve_cov_rows(w, rp, tile_h=tile_h, tile_w=tile_w, ss=ss))

    cov_sub = _cov_all(chunk_pools[k:], tile_h, tile_w)      # (NXraw+1, NPX)
    cov_sub = cov_sub.at[res["extra_primary_raw"]].add(
        cov_sub[res["extra_chunk_raw"]])
    xe_rows = resolve_cov_rows(
        cov_sub[res["xe_primary_raw"]], res["xe_rparams"],
        tile_h=tile_h, tile_w=tile_w, ss=ss)
    cov_final = jnp.concatenate(
        fin_rows + [xe_rows, jnp.zeros((1, npx_out), jnp.float32)], axis=0)
    return cov_final, cov_sub


def _kernel_t2_res(edges_ref, rp_ref, out_ref, acc_ref, *, ch: int,
                   tile_h: int, tile_w: int, ss: int, unroll: int):
    """Row-structured winding accumulation (same math/order as
    coverage_pallas._kernel_t2_rt) into VMEM scratch, with a resolve epilogue
    on the last edge-slot step.  Output is chunk-major (BC, NPX_OUT)."""
    j = pl.program_id(1)
    nsteps = pl.num_programs(1)
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
        sl = pl.ds(r * tile_w, tile_w)

        @pl.when(j == 0)
        def _(sl=sl, acc=acc):
            acc_ref[sl, :] = acc

        @pl.when(j != 0)
        def _(sl=sl, acc=acc):
            acc_ref[sl, :] += acc

    @pl.when(j == nsteps - 1)
    def _():
        # resolve: backdrop + rule/AA/scissor per sub-row, mean over ss
        eo = rp_ref[pl.ds(RP_EO, 1), :]          # (1, BC) lane vectors
        noaa = rp_ref[pl.ds(RP_NOAA, 1), :]
        texf = rp_ref[pl.ds(RP_TEXF, 1), :]
        sx0 = rp_ref[pl.ds(RP_SC + 0, 1), :]
        sy0 = rp_ref[pl.ds(RP_SC + 1, 1), :]
        sx1 = rp_ref[pl.ds(RP_SC + 2, 1), :]
        sy1 = rp_ref[pl.ds(RP_SC + 3, 1), :]
        pxl = colf + 0.5                         # (TW, 1) pixel centers
        inv_ss = 1.0 / ss
        th_out = tile_h // ss
        for ro in range(th_out):
            c_sum = None
            for k in range(ss):
                r = ro * ss + k
                pyl = float(r) + 0.5
                w = acc_ref[pl.ds(r * tile_w, tile_w), :] + rp_ref[pl.ds(RP_BD + r, 1), :]
                cov = jnp.minimum(jnp.abs(w), 1.0)
                cov_eo = 1.0 - jnp.abs(jnp.mod(w, 2.0) - 1.0)
                cov = jnp.where(eo > 0, cov_eo, cov)
                cov = jnp.where(noaa > 0, (cov >= 0.5).astype(jnp.float32), cov)
                cov = jnp.where(texf > 0, 1.0, cov)
                inside = (
                    (pxl >= sx0) & (pyl >= sy0) & (pxl < sx1) & (pyl < sy1)
                )
                cov = cov * inside.astype(jnp.float32)
                c_sum = cov if k == 0 else c_sum + cov
            c_out = c_sum if ss == 1 else c_sum * inv_ss
            out_ref[:, pl.ds(ro * tile_w, tile_w)] = jnp.transpose(c_out, (1, 0))


@functools.partial(
    jax.jit, static_argnames=("tile_h", "tile_w", "ss", "interpret", "unroll"))
def coverage_chunks_pallas_res(
    chunk_edges: jax.Array,      # (NC, CH, 4)
    rparams: jax.Array,          # (RP_ROWS, NC)
    tile_h: int, tile_w: int, ss: int,
    interpret: bool = False, unroll: int = 0,
) -> jax.Array:
    """(NC, CH, 4) edges + per-chunk resolve params -> (NC, NPX_OUT) resolved
    OUTPUT-domain coverage (tile_h counts sub-rows; NPX_OUT = tile_h//ss*tile_w).
    Requires NC to be 128-aligned (the caller pads pools; see frame._bucket128)."""
    from vgtpu.ops.coverage_pallas import _largest_divisor

    nc, ch, _ = chunk_edges.shape
    bc = _largest_divisor(nc, 128)
    npx = tile_h * tile_w
    npx_out = (tile_h // ss) * tile_w
    if unroll == 0:
        unroll = next((u for u in (4, 3, 2) if ch % u == 0), 1)
    edges_t = jnp.transpose(chunk_edges, (1, 2, 0)).reshape(ch * 4, nc)
    return pl.pallas_call(
        functools.partial(_kernel_t2_res, ch=ch, tile_h=tile_h, tile_w=tile_w,
                          ss=ss, unroll=unroll),
        out_shape=jax.ShapeDtypeStruct((nc, npx_out), jnp.float32),
        grid=(nc // bc, ch // unroll),
        in_specs=[
            pl.BlockSpec((ch * 4, bc), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((rparams.shape[0], bc), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bc, npx_out), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((npx, bc), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(edges_t, rparams)
