#!/usr/bin/env python
"""Measure the per-leaf vs packed-blob cost of the dynamic frame's plan
upload through the axon tunnel.

(a) one device_put of the ~60-leaf host pytree (current plan_to_device path)
(b) one device_put of dtype-grouped flat blobs (2 transfers) + a jitted
    unpack that slices/reshapes the leaves on device
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import vgtpu as vg  # noqa: E402
from vgtpu.scenes.demo_ui import draw_benchmark_frame  # noqa: E402


def build_host(t: float):
    ctx = build_host.ctx
    vg.begin(ctx, 0, 1920, 1080, 1.0)
    draw_benchmark_frame(ctx, t)
    ctx._finalize_ops()
    if not hasattr(ctx, "_bin_cache"):
        ctx._bin_cache = {}
    from vgtpu.raster.binning import bin_frame
    from vgtpu.raster.frame import _coverage_composite_aux_host, compute_tile_buckets

    plan = bin_frame(ctx.ops, 1920, 1080, tile_h=ctx.cfg.tile_h,
                     tile_w=ctx.cfg.tile_w, chunk=ctx.cfg.edges_per_chunk,
                     pools=ctx.cfg.chunk_pools, bin_cache=ctx._bin_cache)
    ctx._fill_textures(plan)
    if plan.tile_buckets is None:
        plan.tile_buckets = compute_tile_buckets(
            plan.tile_entries, plan.tile_entries.shape[0], plan.entry_kind, plan)
    host = {
        "chunk_pools": tuple((ce, cent) for ce, cent in plan.chunk_pools),
        "entry_backdrop": plan.entry_backdrop,
        "color_tiles": plan.color_tiles,
        "entry_color_tile": plan.entry_color_tile,
        "tile_entries": plan.tile_entries,
        "tile_buckets": tuple((te, ids) for te, ids, _fl in plan.tile_buckets),
    }
    aux, _ct = _coverage_composite_aux_host(plan)
    host.update(aux)
    return host


build_host.ctx = vg.createContext()


def leaves(prefix, obj, out):
    if isinstance(obj, np.ndarray):
        out.append((prefix, obj))
    elif isinstance(obj, dict):
        for k in sorted(obj):
            leaves(f"{prefix}.{k}", obj[k], out)
    elif isinstance(obj, (tuple, list)):
        for i, v in enumerate(obj):
            leaves(f"{prefix}[{i}]", v, out)


def sync(x):
    # block_until_ready lies through the tunnel: fetch a scalar instead
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jnp.ravel(leaf)[0] if leaf.ndim else leaf)


def main() -> None:
    hosts = [build_host(0.3 + 0.05 * k) for k in range(8)]
    ls = []
    leaves("", hosts[0], ls)
    nbytes = sum(a.nbytes for _k, a in ls)
    print(f"leaves={len(ls)}  total={nbytes / 1e6:.2f} MB")

    # (a) current: one pytree device_put
    for h in hosts[:2]:
        sync(jax.device_put(h))
    t0 = time.perf_counter()
    for h in hosts:
        sync(jax.device_put(h))
    ms_a = (time.perf_counter() - t0) * 1e3 / len(hosts)
    print(f"(a) pytree device_put : {ms_a:.1f} ms")

    # (b) dtype-grouped blobs + jitted unpack
    def pack(host):
        ls = []
        leaves("", host, ls)
        groups = {}
        meta = []
        for k, a in ls:
            key = a.dtype.str
            buf = groups.setdefault(key, [])
            meta.append((k, key, sum(x.size for x in buf), a.shape))
            buf.append(np.ascontiguousarray(a).ravel())
        blobs = {k: np.concatenate(v) for k, v in groups.items()}
        return blobs, tuple(meta)

    import functools

    @functools.partial(jax.jit, static_argnames=("meta",))
    def unpack(blobs, meta):
        out = []
        for _k, g, off, shape in meta:
            n = int(np.prod(shape)) if shape else 1
            out.append(jax.lax.dynamic_slice_in_dim(
                blobs[g], off, n).reshape(shape))
        return tuple(out)

    packed = [pack(h) for h in hosts]
    for blobs, meta in packed[:2]:
        sync(unpack(jax.device_put(blobs), meta))
    t0 = time.perf_counter()
    for blobs, meta in packed:
        sync(unpack(jax.device_put(blobs), meta))
    ms_b = (time.perf_counter() - t0) * 1e3 / len(packed)
    # host-side packing cost
    t0 = time.perf_counter()
    for h in hosts:
        pack(h)
    ms_pack = (time.perf_counter() - t0) * 1e3 / len(hosts)
    print(f"(b) blob put + unpack : {ms_b:.1f} ms  (+{ms_pack:.1f} ms host pack)")


if __name__ == "__main__":
    main()
