#!/usr/bin/env python
"""Per-stage device timing of the benchmark frame (chained-loop method, see
raster/benchloop.py for why naive dispatch timing lies on the axon tunnel).

Profiles the PRODUCTION TPU path piecewise (falls back to the XLA stages on
other platforms):
  coverage   = chunk coverage kernels + extras fold (cov_all_resolved)
  gather     = per-bucket ew_t gathers from chunk coverage
  composite  = fused Pallas painter kernels (given pre-gathered ew_t)
  scatter    = per-bucket fb untranspose + tile scatter + tiles_to_image
  frame      = the whole pipeline (what bench.py reports)

Run from the repo root: python tools/profile_stages.py
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def _expand_pop(d):
    """Dense per-entry arrays from the compact pseudo-op tables (host-side
    mirror of _frame_fn's device expansion) so stage loops can use them."""
    import jax.numpy as jnp

    if d.get("pop") is None:
        return d
    d = dict(d)
    pop, ep = d["pop"], d["entry_pop"]
    for k, dk in (("kind", "entry_kind"), ("rule", "entry_rule"),
                  ("aa", "entry_aa"), ("paint_kind", "entry_paint_kind"),
                  ("paint", "entry_paint"), ("scissor", "entry_scissor")):
        d[dk] = jnp.asarray(pop[k])[ep]
    return d


def main() -> None:
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    import vgtpu as vg
    from vgtpu.scenes.demo_ui import draw_benchmark_frame

    ss = 1
    if "--ss" in sys.argv:
        ss = int(sys.argv[sys.argv.index("--ss") + 1])
    ctx = vg.createContext(vg.ContextConfig(coverage_supersample=ss))
    vg.begin(ctx, 0, 1920, 1080, 1.0)
    draw_benchmark_frame(ctx, 0.0)
    vg.end(ctx, background=(0.12, 0.12, 0.13, 1.0))
    plan = ctx.last_plan
    d = ctx.last_device_arrays
    th, tw = plan.tile_h, plan.tile_w      # th counts SUB-rows when ss > 1
    th_out = th // ss
    npx = th * tw
    ne = d["entry_backdrop"].shape[0]
    nt = plan.tile_entries.shape[0]
    bg = jnp.asarray(np.array([0.12, 0.12, 0.13, 1.0], np.float32))

    from vgtpu.raster.frame import composite_arrays, promote_resident

    promote_resident(ctx.last_plan, d)   # stage loops want resident planes
    dd = _expand_pop(composite_arrays(d))
    fused = dd.get("bucket_pteb") is not None

    def timeit(fn, *args):
        lo, hi = 3, 24
        float(np.asarray(fn(*args, n=lo)))
        float(np.asarray(fn(*args, n=hi)))
        t0 = time.perf_counter()
        float(np.asarray(fn(*args, n=lo)))
        t1 = time.perf_counter()
        float(np.asarray(fn(*args, n=hi)))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (hi - lo) * 1e3

    # ---- stage: coverage (kernels + extras fold [+ resolve]) ----
    from vgtpu.ops.coverage import cov_all_resolved, entry_coverage_from_pools

    res = dd.get("res") if fused else None

    @functools.partial(jax.jit, static_argnames=("n",))
    def cov_loop(pools, n):
        def body(i, eps):
            p = tuple((ce + eps, cent) for ce, cent in pools)
            if res is not None:
                from vgtpu.ops.coverage_resolve import cov_split_resolved

                cf, cs = cov_split_resolved(p, res, th, tw, ss)
                return jnp.sum(cf[:, 0]) * 1e-9 + jnp.sum(cs[:, 0]) * 1e-9
            if fused:
                cov = cov_all_resolved(p, dd["cov_map"], th, tw)
            else:
                cov = entry_coverage_from_pools(p, ne, th, tw).reshape(-1, npx)
            return jnp.sum(cov[:, 0]) * 1e-9

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    cov_ms = timeit(cov_loop, d["chunk_pools"])

    gather_ms = comp_ms = scatter_ms = float("nan")
    if fused:
        if res is not None:
            from vgtpu.ops.coverage_resolve import cov_split_resolved

            cov_fin0, cov_all0 = cov_split_resolved(
                d["chunk_pools"], res, th, tw, ss)
            ptebs = res["pteb"]
        else:
            cov_fin0 = None
            cov_all0 = cov_all_resolved(d["chunk_pools"], dd["cov_map"], th, tw)
            ptebs = dd["bucket_pteb"]
        flags_list = d["bucket_flags"]

        # ---- stage: per-bucket ew gathers ----
        @functools.partial(jax.jit, static_argnames=("n",))
        def gather_loop(cov_all, cov_fin, n):
            def body(i, eps):
                acc = eps
                for pteb, fl in zip(ptebs, flags_list):
                    src = cov_fin if (cov_fin is not None and not fl[3]) else cov_all
                    ew_t = jnp.transpose((src + eps)[pteb], (1, 2, 0))
                    acc = acc + jnp.sum(ew_t[:, 0, :]) * 1e-9
                return acc

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        gather_ms = timeit(gather_loop, cov_all0, cov_fin0)

        # ---- stage: fused composite kernels (pre-gathered inputs) ----
        from vgtpu.ops.composite_pallas import composite_bucket_pallas, _pad_tiles

        covfinal_b = tuple(
            cov_fin0 is not None and not fl[3] for fl in flags_list)
        rbd_b = (res["rbd"] if res is not None
                 else (None,) * len(ptebs))
        ew_ts = tuple(
            jnp.transpose((cov_fin0 if cf else cov_all0)[pteb], (1, 2, 0))
            for pteb, cf in zip(ptebs, covfinal_b))
        bg_vec = jnp.repeat(bg, th_out * tw)[:, None]
        params = dd.get("bucket_params")
        if params is None:
            from vgtpu.ops.composite_pallas import build_bucket_params_jnp

            params = tuple(
                build_bucket_params_jnp(
                    jnp.asarray(te), dd["entry_kind"], dd["entry_rule"],
                    dd["entry_aa"], dd["entry_paint_kind"], dd["entry_scissor"],
                    dd["entry_paint"], dd["entry_color_tile"], dd["entry_tile"],
                    d["entry_backdrop"], tile_h=th, tile_w=tw, ntx=plan.ntx)
                for te, _ids in dd["tile_buckets"])

        @functools.partial(jax.jit, static_argnames=("n",))
        def comp_loop(ew_ts, params, n):
            def body(i, eps):
                acc = eps
                for ew_t, pp, ct, fl, cf, rbd in zip(
                        ew_ts, params, dd["bucket_cts"], d["bucket_flags"],
                        covfinal_b, rbd_b):
                    fb_t = composite_bucket_pallas(
                        ew_t + eps, pp, ct, bg_vec, npx=npx, tile_w=tw,
                        flags=tuple(fl), add_backdrop=not cf, ss=ss,
                        cov_final=cf, rbd_t=rbd)
                    acc = acc + jnp.sum(fb_t[0, :]) * 1e-9
                return acc

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        comp_ms = timeit(comp_loop, ew_ts, params)

        # ---- stage: fb untranspose + scatter + image assembly ----
        from vgtpu.ops.composite import tiles_to_image

        fb_ts = tuple(
            composite_bucket_pallas(ew_t, pp, ct, bg_vec, npx=npx, tile_w=tw,
                                    flags=tuple(fl), add_backdrop=not cf,
                                    ss=ss, cov_final=cf, rbd_t=rbd)
            for ew_t, pp, ct, fl, cf, rbd in zip(
                ew_ts, params, dd["bucket_cts"], d["bucket_flags"],
                covfinal_b, rbd_b))

        @functools.partial(jax.jit, static_argnames=("n",))
        def scatter_loop(fb_ts, n):
            def body(i, eps):
                fb = jnp.broadcast_to(bg, (nt + 1, th_out, tw, 4)).astype(jnp.float32)
                for fb_t, (te_b, ids_b) in zip(fb_ts, dd["tile_buckets"]):
                    nb = fb_t.shape[1]
                    nbp = _pad_tiles(te_b.shape[0])
                    ids = ids_b
                    if nbp != te_b.shape[0]:
                        ids = jnp.concatenate(
                            [ids_b, jnp.full((nbp - te_b.shape[0],), nt, ids_b.dtype)])
                    fb_b = jnp.transpose(
                        (fb_t + eps).reshape(4, th_out, tw, nb), (3, 1, 2, 0))
                    fb = fb.at[ids].set(fb_b)
                img = tiles_to_image(fb[:nt], ntx=plan.ntx, nty=plan.nty,
                                     tile_h=th_out, tile_w=tw,
                                     width=plan.width, height=plan.height)
                return jnp.sum(img[..., 3]) * 1e-9

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        scatter_ms = timeit(scatter_loop, fb_ts)

    from vgtpu.raster.benchloop import measure_device_ms_per_frame

    frame_ms = measure_device_ms_per_frame(plan, d, (0.12, 0.12, 0.13, 1.0))

    print(f"platform      : {jax.devices()[0].platform}")
    print(f"stats         : {plan.stats}")
    print(f"buckets       : {[(te.shape, fl) for te, ids, fl in plan.tile_buckets]}")
    print(f"pools         : {[tuple(ce.shape) for ce, _ in plan.chunk_pools]}")
    print(f"coverage ms   : {cov_ms:.3f}")
    print(f"gather ms     : {gather_ms:.3f}")
    print(f"composite ms  : {comp_ms:.3f}")
    print(f"scatter ms    : {scatter_ms:.3f}")
    print(f"frame ms      : {frame_ms:.3f}")


if __name__ == "__main__":
    main()
