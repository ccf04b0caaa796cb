"""Sharded PRODUCTION frame path: the fused Pallas composite + chunk-gather
coverage running inside shard_map (VERDICT r04 #2).

`parallel/sharding.py` shards the frame with the XLA oracle composite
(`composite_tiles_body`) — correct, but not the code a single chip runs in
production (`raster/frame.frame_fb`: chunk-coverage gather + fused per-bucket
Pallas composite).  This module shards THAT path:

  - the tile/entry/chunk co-partition comes from
    `sharding.partition_plan_for_mesh` (ownership tree, zero collectives);
  - the single-device fused aux (cov gather map, per-bucket pteb/params/ct
    ids — `frame._coverage_composite_aux_host` semantics) is built globally
    on host with the SAME builders, then COLUMN-SELECTED per device: each
    bucket keeps its global MO class and flags, so every tile's kernel math
    is identical to the single-device fused path (bit-equality asserted by
    tests/test_sharded_fused.py and the dryrun);
  - per-device bucket widths pad to the across-device max so shard_map sees
    uniform shapes; pad columns carry valid=0 params, dead-chunk pteb rows
    and scratch-tile ids — exactly the padding frame_fb_pallas already
    handles on one device;
  - chunk ids in pteb are REMAPPED to device-local coverage rows (device
    pools are the partition's device-major groups, order-preserving, so
    per-chunk coverage rows are bit-identical to the global concat's rows);
  - the body is collective-free; the framebuffer comes back tile-sharded
    and the output gather + LPT unpermute assemble the image (the one
    cross-device movement, same as the oracle-sharded frame).

On the virtual CPU mesh the Pallas kernels run in interpret mode (the same
technique tests/test_composite_pallas.py uses — hardware is not required
for correctness); on a real TPU mesh they compile natively.

The reference has no distributed anything (SURVEY.md §2); the contract here
is this repo's own single-chip fused path.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vgtpu.ops.composite import tiles_to_image
from vgtpu.parallel.sharding import partition_plan_for_mesh


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


def build_sharded_fused(plan, d: dict, n: int):
    """Partition a rendered plan's fused aux for an n-device mesh.

    Returns (stacked, reps, static) where `stacked` is a pytree of host
    arrays with leading axis n (one slice per device), `reps` the replicated
    arrays (color tiles), and `static` the body's static config (shapes,
    bucket flags, interpret mode, output unpermute map)."""
    from vgtpu.ops.composite_pallas import (
        _pad_tiles,
        build_bucket_aux,
        build_bucket_pteb,
    )
    from vgtpu.ops.coverage import build_cov_gather_map

    arrays, meta = partition_plan_for_mesh(d, plan, n)
    dev_of_tile = meta["dev_of_tile"]
    local_of = meta["local_of"]
    owner_e = meta["owner_e"]
    pool_maps = meta["pool_maps"]
    ne = plan.entry_backdrop.shape[0]
    ts = meta["t_pad"] // n

    # ---- global fused aux (host twins of the single-device builders) ----
    m = build_cov_gather_map(plan.chunk_pools, ne)
    pool_lens = [len(cent) for _ce, cent in plan.chunk_pools]
    glob_dead = int(sum(pool_lens))
    nct = plan.color_tiles.shape[0]

    # global chunk id -> owning device's local coverage row.  Local coverage
    # concatenates the device's per-pool groups in pool order + a dead row.
    nc_devs = [pm[2] for pm in pool_maps]
    loc_dead = int(sum(nc_devs))
    glob2loc = np.full(glob_dead + 1, loc_dead, np.int64)
    goff = 0
    loff = 0
    for (keep, slot, nc_dev), ln in zip(pool_maps, pool_lens):
        glob2loc[goff + keep] = loff + (slot % nc_dev)
        goff += ln
        loff += nc_dev

    # ---- per-device column selection of every bucket class ----
    classes = []
    bucket_flags = []
    for te_b, ids_b, flags in plan.tile_buckets:
        nb, mo = te_b.shape
        pp_glob, _ = build_bucket_aux(plan, te_b, need_ct=False)
        pteb_glob = build_bucket_pteb(te_b, m["primary"], glob_dead)
        ctile_glob = np.where(
            te_b >= 0, plan.entry_color_tile[np.maximum(te_b, 0)], -1)
        ctile_glob = np.where(ctile_glob >= 0, ctile_glob, nct).astype(np.int32)
        # bucket rows whose tile is the scratch id (== num_tiles) are global
        # padding — re-created per device below, so exclude them here
        real = ids_b < dev_of_tile.shape[0]
        cols = [np.nonzero(real & (dev_of_tile[np.minimum(
            ids_b, dev_of_tile.shape[0] - 1)] == k))[0] for k in range(n)]
        nbd = max(1, max(len(c) for c in cols))
        nbdp = _pad_tiles(nbd)
        te_s = np.full((n, nbd, mo), -1, np.int32)
        ids_s = np.full((n, nbd), ts, np.int32)            # pad -> scratch row
        pteb_s = np.full((n, nbdp, mo), loc_dead, np.int32)
        pp_s = np.zeros((n, mo, pp_glob.shape[1], nbdp), np.float32)
        ct_s = np.full((n, nbdp, mo), nct, np.int32) if flags[2] else None
        for k, ck in enumerate(cols):
            c = len(ck)
            if not c:
                continue
            tloc = te_b[ck]
            te_s[k, :c] = np.where(
                tloc >= 0, local_of[np.maximum(tloc, 0)], -1)
            # device-local fb row of each tile (rows are device-contiguous)
            ids_s[k, :c] = meta["row_of_tile"][ids_b[ck]] - k * ts
            pteb_s[k, :c] = glob2loc[pteb_glob[ck]]
            pp_s[k, :, :, :c] = pp_glob[:, :, ck]
            if ct_s is not None:
                ct_s[k, :c] = ctile_glob[ck]
        classes.append({"te": te_s, "ids": ids_s, "pteb": pteb_s,
                        "params": pp_s, "ctids": ct_s})
        bucket_flags.append(tuple(flags))

    # ---- per-device extras of the coverage fold ----
    alive_x = m["extra_chunk"] < glob_dead
    own_x = np.where(alive_x, owner_e[np.clip(m["extra_entry"], 0, ne - 1)], -1)
    kmax = max(1, int(np.bincount(own_x[own_x >= 0], minlength=n).max())
               if (own_x >= 0).any() else 1)
    ec_s = np.full((n, kmax), loc_dead, np.int32)
    et_s = np.full((n, kmax), loc_dead, np.int32)
    for k in range(n):
        sel = np.nonzero(own_x == k)[0]
        ec_s[k, : len(sel)] = glob2loc[m["extra_chunk"][sel]]
        et_s[k, : len(sel)] = glob2loc[m["extra_primary"][sel]]

    pools_s = tuple(
        (np.asarray(ce).reshape((n, -1) + np.asarray(ce).shape[1:]),
         np.asarray(cent).reshape(n, -1))
        for ce, cent in arrays["chunk_pools"])

    stacked = {
        "pools": pools_s,
        "extra_chunk": ec_s,
        "extra_target": et_s,
        "classes": tuple(
            {k: v for k, v in c.items() if v is not None} for c in classes),
    }
    reps = {"color_tiles": np.asarray(d["color_tiles"])}
    static = {
        "ts": ts,
        "tile_h": plan.tile_h,
        "tile_w": plan.tile_w,
        "ss": plan.supersample,
        "bucket_flags": tuple(bucket_flags),
        "has_ct": tuple(c["ctids"] is not None for c in classes),
        "interpret": not _on_tpu(),
        "row_of_tile": meta["row_of_tile"],
        "meta": meta,
    }
    return stacked, reps, static


def make_sharded_fused_fn(mesh: Mesh, stacked, static):
    """Jitted shard_map frame over the partitioned fused aux: per device,
    chunk coverage -> extras fold -> fused Pallas composite — the SAME
    kernels as the single-chip production frame (raster/frame.frame_fb),
    zero collectives in the body."""
    from vgtpu.ops.composite_pallas import ct_t_from_color_tiles, frame_fb_pallas
    from vgtpu.ops.coverage import _cov_all
    from vgtpu.raster.frame import _ct_flat_body

    ts = static["ts"]
    tile_h, tile_w, ss = static["tile_h"], static["tile_w"], static["ss"]
    th_out = tile_h // ss
    bucket_flags = static["bucket_flags"]
    has_ct = static["has_ct"]
    interpret = static["interpret"]

    def local_frame(st, color_tiles, background):
        pools = tuple((ce[0], cent[0]) for ce, cent in st["pools"])
        cov_all = _cov_all(pools, tile_h, tile_w)
        cov_all = cov_all.at[st["extra_target"][0]].add(
            cov_all[st["extra_chunk"][0]])
        ct_flat = None
        if any(has_ct):
            ct_flat = _ct_flat_body(color_tiles, th_out, tile_w)
        buckets, ptebs, params, cts = [], [], [], []
        for c, hc in zip(st["classes"], has_ct):
            buckets.append((c["te"][0], c["ids"][0]))
            ptebs.append(c["pteb"][0])
            params.append(c["params"][0])
            cts.append(ct_t_from_color_tiles(ct_flat, c["ctids"][0])
                       if hc else None)
        return frame_fb_pallas(
            cov_all, tuple(buckets), tuple(ptebs), tuple(params), tuple(cts),
            background, tile_h=tile_h, tile_w=tile_w, num_tiles=ts,
            bucket_flags=bucket_flags, ss=ss, interpret=interpret,
        )

    specs = jax.tree_util.tree_map(lambda _x: P("tiles"), stacked)
    sharded = jax.shard_map(
        local_frame, mesh=mesh,
        in_specs=(specs, P(), P()),
        out_specs=P("tiles"),
        check_vma=False,
    )
    return jax.jit(sharded)


def render_frame_sharded_fused(plan, d: dict, mesh: Mesh,
                               background=(1, 1, 1, 1),
                               return_meta: bool = False):
    """Full sharded-fused frame -> (H, W, 4) premultiplied image."""
    n = mesh.devices.size
    stacked, reps, static = build_sharded_fused(plan, d, n)
    fn = make_sharded_fused_fn(mesh, stacked, static)
    bg = jnp.asarray(np.asarray(background, np.float32))
    fb = fn(jax.tree_util.tree_map(jnp.asarray, stacked),
            jnp.asarray(reps["color_tiles"]), bg)
    fb = jax.device_put(fb, jax.sharding.NamedSharding(mesh, P()))
    fb = fb[jnp.asarray(static["row_of_tile"])]
    img = tiles_to_image(
        fb, ntx=plan.ntx, nty=plan.nty, tile_h=plan.tile_h // plan.supersample,
        tile_w=plan.tile_w, width=plan.width, height=plan.height,
    )
    if return_meta:
        return img, static["meta"]
    return img
