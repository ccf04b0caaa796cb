"""Multi-chip frame rendering over a jax.sharding.Mesh.

The reference has no distributed anything (SURVEY.md §2, explicit); scaling is
a new capability designed for the TPU: the screen-tile grid is the data axis.

Layout per frame on an n-device 1-D mesh ('tiles'):
  - edge CHUNKS shard across devices (coverage is chunk-parallel);
  - per-(tile,op) entry coverage is a segment-sum of chunk coverages, so each
    device computes a partial sum over its chunk shard and a single psum over
    ICI produces the full entry coverage (the only collective in the frame);
  - tile rows of the per-tile op table shard across devices; composite runs
    on local tiles only (pixel coords derive from explicit tile ids);
  - the framebuffer comes back tile-sharded; assembling the (H,W,4) image is
    an all-gather that XLA inserts when the caller reshapes.

Everything runs in ONE jitted shard_map program per frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vgtpu.ops.composite import composite_tiles_body, tiles_to_image
from vgtpu.ops.coverage import entry_coverage_from_pools


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return jax.make_mesh((n,), ("tiles",), devices=devs[:n])


def pad_plan_for_mesh(d: dict, plan, n: int) -> tuple[dict, int]:
    """Pad tile rows (and chunk rows) to multiples of n.  Chunk/entry buckets
    are powers of two already; tile count usually is not."""
    te = np.asarray(d["tile_entries"])
    T = te.shape[0]
    T_pad = -(-T // n) * n
    if T_pad != T:
        te = np.concatenate([te, np.full((T_pad - T, te.shape[1]), -1, te.dtype)])
    pools = []
    for ce, cent in d["chunk_pools"]:
        ce = np.asarray(ce)
        cent = np.asarray(cent)
        NC = ce.shape[0]
        NC_pad = -(-NC // n) * n
        if NC_pad != NC:
            ce = np.concatenate([ce, np.zeros((NC_pad - NC,) + ce.shape[1:], ce.dtype)])
            cent = np.concatenate([cent, np.zeros(NC_pad - NC, cent.dtype)])
        pools.append((ce, cent))
    out = dict(d)
    out["tile_entries"] = te
    out["chunk_pools"] = tuple(pools)
    return out, T_pad


def make_sharded_frame_fn(mesh: Mesh, plan, num_entries: int, t_pad: int,
                          n_pools: int = 1):
    """Builds the jitted sharded frame function for fixed static shapes."""
    n = mesh.devices.size
    ntx, tile_h, tile_w = plan.ntx, plan.tile_h, plan.tile_w
    max_ops = plan.tile_entries.shape[1]
    ss = plan.supersample   # tile_h counts SUB-rows when ss > 1

    def local_frame(
        chunk_pools,
        entry_backdrop, entry_kind, entry_rule, entry_aa,
        entry_paint_kind, entry_paint, entry_scissor, entry_color_tile,
        color_tiles, tile_entries, tile_ids, background,
    ):
        # coverage over the local chunk shards (all pools), one psum total
        partial = entry_coverage_from_pools(chunk_pools, num_entries, tile_h, tile_w)
        entry_cov = jax.lax.psum(partial, "tiles")        # ICI collective
        entry_w = entry_cov + entry_backdrop[:, :, None]
        fb = composite_tiles_body(
            entry_w, tile_entries, tile_ids,
            entry_kind, entry_rule, entry_aa, entry_paint_kind, entry_paint,
            entry_scissor, entry_color_tile, color_tiles, background,
            ntx=ntx, tile_h=tile_h, tile_w=tile_w, max_ops=max_ops, ss=ss,
        )
        return fb

    sharded = jax.shard_map(
        local_frame,
        mesh=mesh,
        in_specs=(
            tuple((P("tiles"), P("tiles")) for _ in range(n_pools)),  # chunk pools shard
            P(), P(), P(), P(),                # entry arrays replicated
            P(), P(), P(), P(),
            P(), P("tiles"), P("tiles"), P(),  # tile table + ids shard
        ),
        out_specs=P("tiles"),
        check_vma=False,
    )

    @jax.jit
    def frame_fn(*args):
        return sharded(*args)

    return frame_fn


def render_frame_sharded(plan, device_arrays: dict, mesh: Mesh, background=(1, 1, 1, 1)):
    """Full sharded frame -> (H, W, 4) premultiplied image (gathered)."""
    n = mesh.devices.size
    if "entry_kind" not in device_arrays:
        # dedup-upload plans (frame.plan_to_device on TPU) ship compact
        # pseudo-op tables instead of the dense per-entry arrays; the plan
        # keeps the dense host copies — use those here
        device_arrays = {
            **device_arrays,
            "entry_kind": plan.entry_kind, "entry_rule": plan.entry_rule,
            "entry_aa": plan.entry_aa, "entry_paint_kind": plan.entry_paint_kind,
            "entry_paint": plan.entry_paint, "entry_scissor": plan.entry_scissor,
        }
    d, t_pad = pad_plan_for_mesh(device_arrays, plan, n)
    num_entries = d["entry_backdrop"].shape[0]
    fn = make_sharded_frame_fn(mesh, plan, num_entries, t_pad,
                               n_pools=len(d["chunk_pools"]))
    tile_ids = np.arange(t_pad, dtype=np.int32)
    bg = jnp.asarray(np.asarray(background, np.float32))
    fb = fn(
        tuple((jnp.asarray(ce), jnp.asarray(cent)) for ce, cent in d["chunk_pools"]),
        jnp.asarray(d["entry_backdrop"]), jnp.asarray(d["entry_kind"]),
        jnp.asarray(d["entry_rule"]), jnp.asarray(d["entry_aa"]),
        jnp.asarray(d["entry_paint_kind"]), jnp.asarray(d["entry_paint"]),
        jnp.asarray(d["entry_scissor"]), jnp.asarray(d["entry_color_tile"]),
        jnp.asarray(d["color_tiles"]), jnp.asarray(d["tile_entries"]),
        jnp.asarray(tile_ids), bg,
    )
    # all-gather the tile-sharded framebuffer before image assembly
    fb = jax.device_put(fb, NamedSharding(mesh, P()))
    fb = fb[: plan.ntx * plan.nty]
    return tiles_to_image(
        fb, ntx=plan.ntx, nty=plan.nty,
        tile_h=plan.tile_h // plan.supersample, tile_w=plan.tile_w,
        width=plan.width, height=plan.height,
    )
