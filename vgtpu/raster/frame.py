"""Frame executor: FramePlan -> framebuffer (the device side of end(),
vg.cpp:1076-1288, minus bgfx: upload arrays once, run the jitted pipeline)."""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from vgtpu.ops.composite import composite_bucketed_body, tiles_to_image
from vgtpu.ops.coverage import entry_coverage_from_pools
from vgtpu.raster.binning import FramePlan, compute_tile_buckets


def composite_dispatch(
    entry_w, d: dict, background,
    *, ntx, tile_h, tile_w, num_tiles, bucket_flags, ss: int = 1,
    init_tiles=None,
):
    """Composite backend choice (trace-time: the platform is static under
    jit): fused Pallas kernels on TPU, the XLA scan elsewhere.  Both are
    bit-compared in tests/test_composite_pallas.py."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        on_tpu = False
    if on_tpu and d.get("bucket_params") is not None:
        from vgtpu.ops.composite_pallas import composite_bucketed_pallas_body

        return composite_bucketed_pallas_body(
            entry_w, d["tile_buckets"], d["bucket_params"], d["bucket_cts"],
            background, tile_h=tile_h, tile_w=tile_w, num_tiles=num_tiles,
            bucket_flags=bucket_flags, ss=ss, init_tiles=init_tiles,
        )
    return composite_bucketed_body(
        entry_w, d["tile_buckets"],
        d["entry_kind"], d["entry_rule"], d["entry_aa"], d["entry_paint_kind"],
        d["entry_paint"], d["entry_scissor"], d["entry_color_tile"],
        d["color_tiles"], background,
        ntx=ntx, tile_h=tile_h, tile_w=tile_w, num_tiles=num_tiles,
        bucket_flags=bucket_flags, ss=ss, init_tiles=init_tiles,
    )


def coverage_dispatch(chunk_pools, d: dict, num_entries, tile_h, tile_w):
    """Entry coverage: inverse-permutation gather when the host map is
    available (TPU plan uploads), general segment-sum otherwise."""
    if d.get("cov_map") is not None:
        from vgtpu.ops.coverage import entry_coverage_gather

        return entry_coverage_gather(chunk_pools, d["cov_map"], num_entries,
                                     tile_h, tile_w)
    return entry_coverage_from_pools(chunk_pools, num_entries, tile_h, tile_w)


def frame_fb(chunk_pools, entry_backdrop, d: dict, background,
             *, num_entries, ntx, tile_h, tile_w, num_tiles, bucket_flags,
             ss: int = 1, init_tiles=None):
    """coverage + composite -> (T, TH, TW, 4) tiles.  On TPU with the fused
    aux data, buckets gather straight from chunk coverage (the (NE, NPX)
    entry_w intermediate is never materialized; backdrop is added in-kernel).
    Elsewhere: entry coverage then the XLA composite.

    init_tiles: optional (T, TH//ss, TW, 4) resident static layer the frame
    composites over (api/context layer memo) instead of the background."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        on_tpu = False
    if on_tpu and d.get("bucket_pteb") is not None:
        from vgtpu.ops.composite_pallas import frame_fb_pallas

        if d.get("res") is not None:
            # in-kernel coverage resolution (raster/resolve.py): non-clip
            # buckets gather FINAL output-domain coverage
            from vgtpu.ops.coverage_resolve import cov_split_resolved

            res = d["res"]
            cov_final, cov_sub = cov_split_resolved(
                chunk_pools, res, tile_h, tile_w, ss)
            return frame_fb_pallas(
                cov_sub, d["tile_buckets"], res["pteb"], d["bucket_params"],
                d["bucket_cts"], background,
                tile_h=tile_h, tile_w=tile_w, num_tiles=num_tiles,
                bucket_flags=bucket_flags, ss=ss, init_tiles=init_tiles,
                cov_final_arr=cov_final, bucket_rbd=res["rbd"],
            )
        from vgtpu.ops.coverage import cov_all_resolved

        cov_all = cov_all_resolved(chunk_pools, d["cov_map"], tile_h, tile_w)
        return frame_fb_pallas(
            cov_all, d["tile_buckets"], d["bucket_pteb"], d["bucket_params"],
            d["bucket_cts"], background,
            tile_h=tile_h, tile_w=tile_w, num_tiles=num_tiles,
            bucket_flags=bucket_flags, ss=ss, init_tiles=init_tiles,
        )
    entry_cov = coverage_dispatch(chunk_pools, d, num_entries, tile_h, tile_w)
    entry_w = entry_cov + entry_backdrop[:, :, None]
    return composite_dispatch(
        entry_w, d, background,
        ntx=ntx, tile_h=tile_h, tile_w=tile_w, num_tiles=num_tiles,
        bucket_flags=bucket_flags, ss=ss, init_tiles=init_tiles,
    )


def _frame_body(
    chunk_pools, entry_backdrop, d, background,
    *, num_entries, ntx, nty, tile_h, tile_w, width, height, bucket_flags=None,
    ss=1, init_tiles=None,
):
    """The whole device frame (unjitted body — _frame_fn compiles it alone;
    execute_plans compiles several plans' bodies into one program)."""
    fb = _frame_tiles_body(
        chunk_pools, entry_backdrop, d, background,
        num_entries=num_entries, ntx=ntx, nty=nty, tile_h=tile_h,
        tile_w=tile_w, bucket_flags=bucket_flags, ss=ss,
        init_tiles=init_tiles,
    )
    return tiles_to_image(fb, ntx=ntx, nty=nty, tile_h=tile_h // ss,
                          tile_w=tile_w, width=width, height=height)


def _frame_tiles_body(
    chunk_pools, entry_backdrop, d, background,
    *, num_entries, ntx, nty, tile_h, tile_w, bucket_flags=None,
    ss=1, init_tiles=None,
):
    """Frame pipeline up to (T, TH//ss, TW, 4) tiles (no image assembly) —
    the layer-memo bake keeps these resident and later frames composite
    their dynamic suffix over them (init_tiles)."""
    if d.get("bucket_cts") is None and d.get("ct_ids") is not None:
        # lazy kernel-layout color tiles (see plan_to_device): build them
        # inside the frame program on dynamic frames; resident loops were
        # promoted (promote_resident) and skip this
        from vgtpu.ops.composite_pallas import ct_t_from_color_tiles

        d = dict(d)
        ct_flat = _ct_flat_body(d["color_tiles"], tile_h // ss, tile_w)
        d["bucket_cts"] = tuple(
            ct_t_from_color_tiles(ct_flat, ids) if ids is not None else None
            for ids in d["ct_ids"])
    if d.get("pop") is not None:
        # dedup upload: expand the compact per-pseudo-op tables to the dense
        # per-entry arrays + per-bucket params with on-device gathers (the
        # host ships ~3x fewer bytes; bit-identical to the host expansion).
        # On the fused TPU path the params expand ONCE at promote_resident
        # for reused plans; dynamic frames build them right here in-jit and
        # the dense entry arrays below are dead code XLA eliminates.
        pop, ep = d["pop"], d["entry_pop"]
        d = dict(d)
        d["entry_kind"] = pop["kind"][ep]
        d["entry_rule"] = pop["rule"][ep]
        d["entry_aa"] = pop["aa"][ep]
        d["entry_paint_kind"] = pop["paint_kind"][ep]
        d["entry_paint"] = pop["paint"][ep]
        d["entry_scissor"] = pop["scissor"][ep]
        if d.get("bucket_pteb") is not None and d.get("bucket_params") is None:
            from vgtpu.ops.composite_pallas import build_bucket_params_jnp

            d["bucket_params"] = tuple(
                build_bucket_params_jnp(
                    te, d["entry_kind"], d["entry_rule"], d["entry_aa"],
                    d["entry_paint_kind"], d["entry_scissor"], d["entry_paint"],
                    d["entry_color_tile"], d["entry_tile"], entry_backdrop,
                    tile_h=tile_h, tile_w=tile_w, ntx=ntx)
                for te, _ids in d["tile_buckets"])
    return frame_fb(
        chunk_pools, entry_backdrop, d, background,
        num_entries=num_entries, ntx=ntx, tile_h=tile_h, tile_w=tile_w,
        num_tiles=ntx * nty, bucket_flags=bucket_flags, ss=ss,
        init_tiles=init_tiles,
    )


_frame_fn = functools.partial(
    jax.jit,
    static_argnames=("num_entries", "ntx", "nty", "tile_h", "tile_w", "width",
                     "height", "bucket_flags", "ss"),
)(_frame_body)

_frame_tiles_fn = functools.partial(
    jax.jit,
    static_argnames=("num_entries", "ntx", "nty", "tile_h", "tile_w",
                     "bucket_flags", "ss"),
)(_frame_tiles_body)


@functools.partial(jax.jit, static_argnames=("statics_t",))
def _frames_fn(groups, backgrounds, *, statics_t):
    """K independent resident frames compiled into ONE program (multi-canvas
    serving): K eager dispatches through the tunnel cost ~1 ms each, one
    fused dispatch costs one.  backgrounds: one (K, 4) array (a single
    upload; K separate puts would eat the saving)."""
    return tuple(
        _frame_body(pools, ebd, d, backgrounds[i], init_tiles=init,
                    **dict(st))
        for i, ((pools, ebd, d, init), st) in enumerate(zip(groups, statics_t)))


_COMPOSITE_KEYS = (
    "tile_buckets", "entry_kind", "entry_rule", "entry_aa", "entry_paint_kind",
    "entry_paint", "entry_scissor", "entry_color_tile", "color_tiles",
    "bucket_params", "bucket_cts", "cov_map", "bucket_pteb",
    "pop", "entry_pop", "entry_tile", "res", "ct_ids",
)


def composite_arrays(d: dict) -> dict:
    """The array-only sub-dict composite_dispatch consumes (jit pytree)."""
    return {k: d[k] for k in _COMPOSITE_KEYS if k in d}


def _plan_statics(plan: FramePlan, d: dict) -> tuple:
    """The frame body's static kwargs as a hashable sorted tuple — the ONE
    definition shared by execute_plan and execute_plans (drift between the
    two paths would make fused renders diverge from single renders)."""
    return tuple(sorted(dict(
        num_entries=d["chunk_entry_num"], ntx=plan.ntx, nty=plan.nty,
        tile_h=plan.tile_h, tile_w=plan.tile_w,
        width=plan.width, height=plan.height,
        bucket_flags=d["bucket_flags"], ss=plan.supersample,
    ).items()))


def execute_plan(plan: FramePlan, background=(1.0, 1.0, 1.0, 1.0),
                 device_arrays=None, init_tiles=None) -> jax.Array:
    """Run the device pipeline; returns (H, W, 4) premultiplied f32 RGBA.

    init_tiles: optional resident static layer (execute_plan_tiles output)
    the plan composites over instead of the background."""
    d = device_arrays if device_arrays is not None else plan_to_device(plan)
    args = (d["chunk_pools"], d["entry_backdrop"], composite_arrays(d),
            jnp.asarray(np.asarray(background, np.float32)))
    statics = dict(_plan_statics(plan, d))
    if init_tiles is None:
        try:
            on_tpu = jax.devices()[0].platform == "tpu"
        except Exception:  # noqa: BLE001
            on_tpu = False
        if on_tpu:
            # persisted-executable cache (raster/execache.py): a warm fresh
            # process skips the frame program's trace+lower+compile — the
            # dominant cold-start term once the upload stages are paid.
            # Returns None on miss-and-disabled or any failure.
            from vgtpu.raster.execache import dispatch_cached

            out = dispatch_cached(_frame_fn, args, statics, key_cache=d)
            if out is not None:
                return out
    return _frame_fn(*args, init_tiles=init_tiles, **statics)


def execute_plan_tiles(plan: FramePlan, background=(1.0, 1.0, 1.0, 1.0),
                       device_arrays=None) -> jax.Array:
    """Render a plan to its (T, TH//ss, TW, 4) tile framebuffer — the
    layer-memo bake (api/context): later frames pass this as init_tiles."""
    d = device_arrays if device_arrays is not None else plan_to_device(plan)
    statics = dict(_plan_statics(plan, d))
    statics.pop("width")
    statics.pop("height")
    return _frame_tiles_fn(
        d["chunk_pools"], d["entry_backdrop"], composite_arrays(d),
        jnp.asarray(np.asarray(background, np.float32)),
        **statics,
    )


def execute_plans(plans_arrays, backgrounds, init_tiles=None) -> tuple:
    """Render K resident (plan, device_arrays) pairs as ONE device program
    -> tuple of (H_k, W_k, 4) images.  The multi-canvas serving analogue of
    execute_plan: the scenes are independent (different geometry, sizes,
    configs), but fusing their dispatch amortizes the per-dispatch tunnel
    cost, and XLA schedules the K pipelines together."""
    plans_arrays = list(plans_arrays)
    backgrounds = list(backgrounds)
    if len(backgrounds) != len(plans_arrays):
        raise ValueError(f"{len(backgrounds)} backgrounds for "
                         f"{len(plans_arrays)} plans")
    if init_tiles is None:
        init_tiles = [None] * len(plans_arrays)
    groups, statics = [], []
    for (plan, d), init in zip(plans_arrays, init_tiles):
        promote_resident(plan, d)   # multi-canvas serving is resident
        groups.append((d["chunk_pools"], d["entry_backdrop"],
                       composite_arrays(d), init))
        statics.append(_plan_statics(plan, d))
    bgs = jnp.asarray(np.asarray(backgrounds, np.float32))   # one (K,4) put
    return _frames_fn(tuple(groups), bgs, statics_t=tuple(statics))


@functools.partial(jax.jit, static_argnames=("sig",))
def _arena_unpack(arena, *, sig):
    """Slice the packed upload arena back into per-leaf device arrays.
    sig: tuple of (flat_offset, shape, dtype_str) — static, so one compiled
    program per plan shape signature ({2^k,1.5*2^k} bucketing keeps the
    signature count bounded)."""
    outs = []
    for off, shape, dstr in sig:
        n = 1
        for s in shape:
            n *= s
        seg = jax.lax.slice(arena, (off,), (off + n,))
        dt = np.dtype(dstr)
        if dt != arena.dtype:
            seg = jax.lax.bitcast_convert_type(seg, dt)
        outs.append(seg.reshape(shape))
    return outs


def _arena_put(host):
    """Single-transfer upload of a plan's host pytree: every 4-byte numpy
    leaf ships inside ONE int32 arena (the axon tunnel charges a fixed
    ~0.1-0.3 ms per device_put leaf and a dynamic frame's plan has ~40 —
    measured 10.9 -> ~2 ms on the app-pattern suffix), then one jitted
    unpack slices the leaves back out on device.  Device-resident leaves
    (e.g. device-sampled color tiles) and odd-size dtypes pass through a
    plain device_put.  Opt out with VGTPU_NO_ARENA_PUT=1."""
    import os

    leaves, treedef = jax.tree_util.tree_flatten(host)
    np_idx = [i for i, x in enumerate(leaves)
              if isinstance(x, np.ndarray) and x.dtype.itemsize == 4]
    if len(np_idx) < 8 or os.environ.get("VGTPU_NO_ARENA_PUT"):
        return jax.device_put(host)
    metas = []
    chunks = []
    off = 0
    for i in np_idx:
        x = leaves[i]
        flat = np.ascontiguousarray(x).reshape(-1).view(np.int32)
        metas.append((off, x.shape, x.dtype.str))
        chunks.append(flat)
        off += flat.size
    arena = np.concatenate(chunks)
    unpacked = _arena_unpack(arena, sig=tuple(metas))
    for i, dev in zip(np_idx, unpacked):
        leaves[i] = dev
    rest = [i for i in range(len(leaves)) if i not in set(np_idx)
            and not isinstance(leaves[i], jax.Array)]
    if rest:
        put = jax.device_put([leaves[i] for i in rest])
        for i, dev in zip(rest, put):
            leaves[i] = dev
    return jax.tree_util.tree_unflatten(treedef, leaves)


def plan_to_device(plan: FramePlan, profiler=None) -> dict:
    """Upload the plan's arrays once (command lists / caches stay resident).
    All host arrays ship in ONE batched jax.device_put (59 per-leaf puts
    measured 15 ms vs 4 ms batched through the axon tunnel); the composite's
    color-tile expansion then runs on device.

    profiler: optional FrameProfiler for sub-stage attribution (upload.*)."""
    import contextlib

    stage = profiler.stage if profiler is not None else (
        lambda _n: contextlib.nullcontext())
    with stage("upload.buckets"):
        if plan.tile_buckets is None:
            plan.tile_buckets = compute_tile_buckets(
                plan.tile_entries, plan.tile_entries.shape[0], plan.entry_kind,
                plan
            )
    with stage("upload.compact"):
        _compact_culled_chunks(plan)
    with stage("upload.resolve_split"):
        # in-kernel coverage resolution (supersampled fused path only): split
        # pools into resolvable/raw BEFORE the host dict snapshots them
        res_split = None
        if _resolve_path_enabled(plan):
            from vgtpu.raster.resolve import build_resolve_split

            res_split = build_resolve_split(plan)
    host = {
        "chunk_pools": tuple((ce, cent) for ce, cent in plan.chunk_pools),
        "entry_backdrop": plan.entry_backdrop,
        "entry_kind": plan.entry_kind,
        "entry_rule": plan.entry_rule,
        "entry_aa": plan.entry_aa,
        "entry_paint_kind": plan.entry_paint_kind,
        "entry_paint": plan.entry_paint,
        "entry_scissor": plan.entry_scissor,
        "entry_color_tile": plan.entry_color_tile,
        "color_tiles": plan.color_tiles,
        "tile_entries": plan.tile_entries,
        "tile_buckets": tuple(
            (te, ids) for te, ids, _fl in plan.tile_buckets
        ),
    }
    with stage("upload.aux"):
        aux_host, bucket_ctile = _coverage_composite_aux_host(plan, res_split)
    host.update(aux_host)
    if bucket_ctile is not None:
        # color-tile slot ids per texture bucket: ride the arena put; the
        # kernel-layout ct planes build lazily (in-jit on dynamic frames,
        # promoted resident via promote_resident on reused plans)
        host["ct_ids"] = tuple(
            ids if ids is not None else None for ids in bucket_ctile)
    if "pop" in aux_host:
        # dedup upload: the jitted frame gathers the per-entry expansions +
        # per-bucket params from these compact tables on device (frame_fb),
        # so the dense copies never cross the host->device link (~3x fewer
        # bytes on typical frames)
        for k in ("entry_kind", "entry_rule", "entry_aa", "entry_paint_kind",
                  "entry_paint", "entry_scissor"):
            del host[k]
    if profiler is not None:
        # honest cold/dynamic accounting: bytes that actually cross the
        # host->device link this frame (device-resident leaves are free)
        leaves = jax.tree_util.tree_leaves(host)
        profiler.count("upload_bytes", sum(
            x.nbytes for x in leaves
            if isinstance(x, np.ndarray)))
    with stage("upload.put"):
        d = _arena_put(host)
    d["chunk_entry_num"] = plan.entry_backdrop.shape[0]
    d["bucket_flags"] = tuple(fl for _te, _ids, fl in plan.tile_buckets)
    # host-side per-bucket color-tile ids, kept for the paint-memo texture
    # patch (Context._value_only_update re-expands bucket_cts after a
    # resample); not part of the jit pytree (composite_arrays selects keys)
    d["_bucket_ctile"] = bucket_ctile
    # param/ct expansion: ONE fused jitted call (async enqueue).  The old
    # per-piece expansion (_expand_params_on_device + _ct_flat + one
    # ct_t_from_color_tiles per texture bucket) cost 4-6 tunnel round-trips
    # ≈ 4 ms host per DYNAMIC frame (measured, tools/tpu_pan_profile.py).
    # A fully lazy in-jit variant was tried and reverted: it minted a second
    # frame-program signature (params None vs arrays), whose promote-time
    # recompile landed inside short measured windows (anim/redraw diags) and
    # grew the cold compile 6 -> 17.6 s.
    with stage("upload.expand"):
        promote_resident(plan, d)
    return d


def promote_resident(plan: FramePlan, d: dict) -> None:
    """Materialize the param/ct expansions as resident device arrays in ONE
    jitted call (no-op when both are already present)."""
    need_pp = (d.get("bucket_pteb") is not None and d.get("pop") is not None
               and d.get("bucket_params") is None)
    need_ct = d.get("bucket_cts") is None and d.get("ct_ids") is not None
    if not (need_pp or need_ct):
        return
    pp, cts = _expand_all_on_device(
        d.get("pop"), d.get("entry_pop"), d["entry_color_tile"],
        d.get("entry_tile"), d["entry_backdrop"],
        tuple(te for te, _ids in d["tile_buckets"]) if need_pp else None,
        d["color_tiles"] if need_ct else None,
        d.get("ct_ids") if need_ct else None,
        tile_h=plan.tile_h, tile_w=plan.tile_w, ntx=plan.ntx,
        ss=plan.supersample)
    if need_pp:
        d["bucket_params"] = pp
    if need_ct:
        d["bucket_cts"] = cts


@functools.partial(jax.jit,
                   static_argnames=("tile_h", "tile_w", "ntx", "ss"))
def _expand_all_on_device(pop, entry_pop, entry_color_tile, entry_tile,
                          entry_backdrop, te_list, ct_dev, ct_ids,
                          *, tile_h, tile_w, ntx, ss):
    """Both upload-time expansions in one program: per-bucket params from
    the compact pseudo-op tables AND kernel-layout color-tile planes.
    Tuple/None pytree structure selects the pieces (static)."""
    params = None
    if te_list is not None:
        params = _expand_params_body(
            pop, entry_pop, entry_color_tile, entry_tile, entry_backdrop,
            te_list, tile_h=tile_h, tile_w=tile_w, ntx=ntx)
    cts = None
    if ct_ids is not None:
        from vgtpu.ops.composite_pallas import ct_t_from_color_tiles

        ct_flat = _ct_flat_body(ct_dev, tile_h // ss, tile_w)
        cts = tuple(
            ct_t_from_color_tiles(ct_flat, ids) if ids is not None else None
            for ids in ct_ids)
    return params, cts


def _bucket128(n: int) -> int:
    """128-aligned pool size with PROPORTIONAL quantization: the step grows
    with the size (128 up to 1k, 256 to 2k, 512 to 4k, then 1024) — at most
    8 sizes per octave, padding waste typically a few % (worst ~50% only for
    tiny pools just over 128; raw {2^k,1.5*2^k} buckets waste up to 33% of
    coverage slots — measured +0.4 ms on the benchmark frame) while bounding
    the number of distinct jit signatures a drifting dynamic scene can mint
    (raw 128-multiples mint one per boundary crossing)."""
    n = max(n, 1)
    step = 128
    while step * 8 < n:
        step *= 2
    return -(-n // step) * step


def _compact_culled_chunks(plan: FramePlan) -> None:
    """Drop chunks whose entry no bucket references (occlusion / static-clip
    culled draws): their coverage would be computed and never gathered.
    Pads pools to 128-chunk multiples (the Pallas kernel's lane constraint);
    pad chunks are all-zero edges -> exactly zero coverage by the binning
    invariant, so pointing them at any entry is harmless."""
    if plan.stats.get("chunks_compacted"):
        return
    plan.stats["chunks_compacted"] = True
    ne = plan.entry_backdrop.shape[0]
    ref = np.zeros(ne, bool)
    for te_b, _ids, _fl in plan.tile_buckets:
        ref[te_b[te_b >= 0]] = True
    new_pools = []
    live = 0
    for ce, cent in plan.chunk_pools:
        ce = np.asarray(ce)
        cent = np.asarray(cent)
        keep = (cent >= 0) & (cent < ne) & ref[np.clip(cent, 0, ne - 1)]
        ce2, cent2 = ce[keep], cent[keep]
        live += len(ce2)
        # 128-aligned proportional-step padding (see _bucket128): a relaxed
        # form of the {2^k, 1.5*2^k} invariant for compacted pools only —
        # raw buckets waste up to 33% of coverage slots here (+0.4 ms)
        nc = _bucket128(len(ce2))
        cep = np.zeros((nc,) + ce.shape[1:], ce.dtype)
        cep[: len(ce2)] = ce2
        centp = np.full(nc, ne - 1, cent.dtype)
        centp[: len(cent2)] = cent2
        new_pools.append((cep, centp))
    plan.stats["chunks_live"] = live
    plan.chunk_pools = new_pools


def _expand_params_body(pop, entry_pop, entry_color_tile, entry_tile,
                        entry_backdrop, te_list, *, tile_h, tile_w, ntx):
    """One-time (upload-time) expansion of the compact pseudo-op tables into
    the fused composite's per-bucket params — keeps the per-frame program
    free of the ~0.3 ms params rebuild (the arrays are plan-static)."""
    from vgtpu.ops.composite_pallas import build_bucket_params_jnp

    ek = pop["kind"][entry_pop]
    er = pop["rule"][entry_pop]
    ea = pop["aa"][entry_pop]
    epk = pop["paint_kind"][entry_pop]
    ep = pop["paint"][entry_pop]
    esc = pop["scissor"][entry_pop]
    return tuple(
        build_bucket_params_jnp(
            te, ek, er, ea, epk, esc, ep, entry_color_tile, entry_tile,
            entry_backdrop, tile_h=tile_h, tile_w=tile_w, ntx=ntx)
        for te in te_list)


def _ct_flat_body(ct_dev, th, tw):
    """(NCT, TH, TW, 4) -> (NCT+1, 4*NPX) channel-major + zeros row."""
    return jnp.concatenate([
        jnp.transpose(ct_dev, (0, 3, 1, 2)).reshape(ct_dev.shape[0], 4 * th * tw),
        jnp.zeros((1, 4 * th * tw), jnp.float32),
    ])


_ct_flat = functools.partial(jax.jit, static_argnames=("th", "tw"))(_ct_flat_body)


def _fused_platform() -> bool:
    """Whether plans should carry the fused-composite aux (TPU only; tests
    monkeypatch this to exercise the fused path in Pallas interpret mode)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


def _resolve_path_enabled(plan: FramePlan) -> bool:
    """Gate for the chunk-split in-kernel coverage resolution
    (raster/resolve.py): fused TPU path, supersampled plans only (at ss=1
    the resolution work merely moves between kernels — no domain shrinks).
    Retained-pan plans are excluded from THIS formulation (their backdrop
    windows are render-time dynamic, these resolve params are plan-static).
    Supersampled pans run the RAW chunk-gather formulation by default
    (raster/retained pan_chunk_gather — that upgrade, not resolution, is
    where the pan ss win came from: 11.69 -> 8.47 ms); a per-ENTRY
    in-trace resolve exists (entry_resolve_rparams) but measured NET WORSE
    (14.95 vs 11.64 ms on the entry-gather path, CLAUDE.md
    failed-experiments) and stays opt-in behind VGTPU_PAN_ENTRY_RESOLVE=1.
    VGTPU_NO_RESOLVE=1 disables all resolve paths for A/B."""
    import os

    return (
        _fused_platform()
        and plan.supersample > 1
        and plan.entry_backdrop_pan is None
        and not os.environ.get("VGTPU_NO_RESOLVE")
    )


def _coverage_composite_aux_host(plan: FramePlan, res_split: dict | None = None):
    """Host-built static aux for the fused TPU path: the chunk->entry inverse
    map and the Pallas composite's per-bucket metadata.  TPU-only — the
    gather formulation measured ~2x SLOWER than segment_sum on the CPU
    backend, so other platforms keep the plain arrays.

    Returns (host-array dict to device_put, per-bucket ctile index arrays or
    None — the color-tile expansion itself runs on device afterwards)."""
    if not _fused_platform():
        return {}, None
    from vgtpu.ops.coverage import build_cov_gather_map

    pop_host = {}
    if plan.pop is not None:
        pop_host = {"pop": plan.pop, "entry_pop": plan.entry_pop,
                    "entry_tile": plan.entry_tile}
    from vgtpu.ops.composite_pallas import (
        _pad_tiles,
        build_bucket_aux,
        build_bucket_pteb,
    )

    m = build_cov_gather_map(plan.chunk_pools, plan.entry_backdrop.shape[0])
    nct = plan.color_tiles.shape[0]
    dead_id = int(sum(len(cent) for _ce, cent in plan.chunk_pools))
    params, ptebs, ctiles = [], [], []
    for te_b, _ids, flags in plan.tile_buckets:
        if plan.pop is None:
            # no compact tables (numpy binner): params build on host
            pp, _unused = build_bucket_aux(plan, te_b, need_ct=False)
            params.append(pp)
        pteb = build_bucket_pteb(te_b, m["primary"], dead_id)
        if flags[2]:
            nbp = _pad_tiles(te_b.shape[0])
            te_p = te_b
            if nbp != te_b.shape[0]:
                te_p = np.concatenate(
                    [te_b, np.full((nbp - te_b.shape[0], te_b.shape[1]), -1, te_b.dtype)])
            ctile = np.where(
                te_p >= 0, plan.entry_color_tile[np.maximum(te_p, 0)], -1)
            ctiles.append(np.where(ctile >= 0, ctile, nct).astype(np.int32))
        else:
            ctiles.append(None)
        ptebs.append(pteb)
    host = {
        "cov_map": m,
        "bucket_pteb": tuple(ptebs),
        **pop_host,
    }
    if params:
        host["bucket_params"] = tuple(params)
    if res_split is not None:
        from vgtpu.raster.resolve import build_resolve_aux

        host["res"] = build_resolve_aux(plan, m, res_split, dead_id)
    return host, tuple(ctiles)


def image_to_u8(img) -> np.ndarray:
    """Premultiplied f32 -> straight u8 RGBA."""
    img = np.asarray(img)
    a = np.maximum(img[..., 3:4], 1e-6)
    rgb = np.clip(img[..., 0:3] / a, 0.0, 1.0)
    out = np.concatenate([rgb, np.clip(img[..., 3:4], 0.0, 1.0)], axis=-1)
    return (out * 255.0 + 0.5).astype(np.uint8)
