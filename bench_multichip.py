#!/usr/bin/env python
"""Multi-chip scaling harness (VERDICT round-1 item #10).

Runs the sharded frame (vgtpu/parallel/sharding.py) over an n-device mesh and
reports per-device tile/chunk counts plus wall-clock per frame.  On this box
only one real TPU chip is reachable, so the mesh is the virtual CPU platform
(xla_force_host_platform_device_count) — the numbers validate the SHARDING
LAYOUT (partition shapes, locality, load balance), not ICI speed.

Expected cost model on real hardware: the frame body has ZERO collectives —
tiles, entries and chunks are co-partitioned host-side so coverage, the
chunk->entry reduction and the composite are all device-local
(partition_plan_for_mesh).  The only cross-device movement is the OUTPUT
gather of the tile-sharded framebuffer (~8 MB/n per device at 1080p), which
a consumer that shards its downstream work (encode, diff, serve) never pays.
The previous layout psum'd the full entry coverage (~74 MB over ICI per
1080p frame); the partition removed it at the cost of load imbalance, which
this harness measures per run (chunk_balance/entry_balance: mean/max work
across devices, 1.0 = perfect).

Artifacts: docs/multichip.md (human table) and docs/multichip_runs.jsonl
(one JSON object per measured mesh size, machine-parseable).

Usage: python bench_multichip.py [n_devices ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _measure(n: int) -> dict:
    import numpy as np

    import vgtpu as vg
    from vgtpu.parallel.sharding import make_mesh, render_frame_sharded
    from vgtpu.scenes.demo_ui import draw_benchmark_frame

    ctx = vg.createContext()
    vg.begin(ctx, 0, 1920, 1080, 1.0)
    draw_benchmark_frame(ctx, 0.0)
    vg.end(ctx, background=(0.12, 0.12, 0.13, 1.0))
    plan, d = ctx.last_plan, ctx.last_device_arrays

    mesh = make_mesh(n)
    host_arrays = {
        "chunk_pools": tuple((np.asarray(ce), np.asarray(cent))
                             for ce, cent in plan.chunk_pools),
        # dense per-entry arrays come from the host plan (dedup-upload
        # device dicts ship compact pseudo-op tables instead)
        "entry_backdrop": plan.entry_backdrop,
        "entry_kind": plan.entry_kind,
        "entry_rule": plan.entry_rule,
        "entry_aa": plan.entry_aa,
        "entry_paint_kind": plan.entry_paint_kind,
        "entry_paint": plan.entry_paint,
        "entry_scissor": plan.entry_scissor,
        "entry_color_tile": plan.entry_color_tile,
        "color_tiles": np.asarray(d["color_tiles"]),
        "tile_entries": plan.tile_entries,
    }

    meta_box = {}

    def run():
        img, meta = render_frame_sharded(
            plan, host_arrays, mesh,
            background=(0.12, 0.12, 0.13, 1.0), return_meta=True)
        meta_box.update(meta)
        return float(np.asarray(img)[0, 0, 3])

    run()                                # compile
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps * 1e3

    # variant-axis serving batch (raster/batch.render_sharded): one variant
    # per device, zero collectives — validates the second sharding layout
    batch_ms = None
    batch_pads = None
    try:
        from vgtpu.raster.batch import VariantBatch

        def variant(k):
            def f(c):
                draw_benchmark_frame(c, 0.0)
                vg.beginPath(c)
                vg.rect(c, 1800, 1000, 60, 40)
                vg.fillPath(c, vg.color4ub(50 + 13 * k, 120, 200, 180),
                            vg.FillFlags.ConvexAA)
            return f

        bgc = (0.12, 0.12, 0.13, 1.0)
        vb = VariantBatch.bake(ctx, [variant(k) for k in range(n)],
                               1920, 1080, background=bgc)

        def run_batch():
            out = vb.render_sharded(mesh, background=bgc)
            return float(np.asarray(out)[0, 0, 0, 3])

        run_batch()                      # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            run_batch()
        batch_ms = round((time.perf_counter() - t0) / reps / n * 1e3, 2)
        # per-device work accounting (VERDICT r04 #5): K == n here, so each
        # device owns exactly one live variant and zero pads — per-variant
        # compute is n-invariant by construction; any residual growth is
        # output-traffic or host-gather, not padding/replication
        batch_pads = -(-vb.K // n) * n - vb.K
    except Exception as e:  # noqa: BLE001
        print(f"variant batch failed: {e}", file=sys.stderr)

    tiles = plan.tile_entries.shape[0]
    return {
        "devices": n,
        "platform": __import__("jax").devices()[0].platform,
        "ms_per_frame": round(dt, 2),
        "tiles_per_device": -(-tiles // n),
        "chunks_per_device": [int(max(c)) for c in meta_box["chunks_per_dev"]],
        "chunk_balance": round(meta_box["chunk_balance"], 3),
        "entry_balance": round(meta_box["entry_balance"], 3),
        "batch_ms_per_variant": batch_ms,
        "batch_pad_variants": batch_pads,
        "batch_live_variants_per_device": 1 if batch_ms is not None else None,
        "collectives": "none in frame body (co-partitioned); output fb "
                       "gather ~%d MB total" % (
            tiles * plan.tile_h // plan.supersample * plan.tile_w * 16 // 2**20),
        "ici_bytes_per_frame": meta_box["ici_bytes_per_frame"],
    }


def main() -> None:
    ns = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 2, 4, 8]
    if os.environ.get("_VGTPU_MC_CHILD"):
        # belt-and-braces like tests/conftest.py: force the cpu platform via
        # jax.config too — a dead TPU tunnel otherwise makes the axon
        # plugin's backend init fatal inside plain device_put calls
        import jax

        jax.config.update("jax_platforms", "cpu")
        print(json.dumps(_measure(int(os.environ["_VGTPU_MC_CHILD"]))))
        return
    rows = []
    for n in ns:
        env = dict(os.environ)
        env["_VGTPU_MC_CHILD"] = str(n)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_PLATFORM_NAME"] = "cpu"
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "host_platform_device_count" not in f]
        flags.append(f"--xla_force_host_platform_device_count={n}")
        env["XLA_FLAGS"] = " ".join(flags)
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True, timeout=1800,
                             cwd=os.path.dirname(os.path.abspath(__file__)))
        if out.returncode != 0:
            print(f"n={n} FAILED:\n{out.stderr[-2000:]}", file=sys.stderr)
            continue
        r = json.loads(out.stdout.strip().splitlines()[-1])
        rows.append(r)
        print(json.dumps(r))
    if len(rows) >= 2:
        base = rows[0]["ms_per_frame"]
        for r in rows[1:]:
            print(f"# scaling {rows[0]['devices']}->{r['devices']} devices: "
                  f"{base / r['ms_per_frame']:.2f}x (virtual CPU mesh: validates "
                  f"sharding layout, not ICI bandwidth)", file=sys.stderr)
    if rows:
        _persist(rows)


def _persist(rows: list) -> None:
    """Append this run to docs/multichip.md (human table) and
    docs/multichip_runs.jsonl (machine-parseable, VERDICT r3 item #7)."""
    import datetime

    docs = os.path.join(os.path.dirname(os.path.abspath(__file__)), "docs")
    date = datetime.date.today().isoformat()
    with open(os.path.join(docs, "multichip_runs.jsonl"), "a") as f:
        for r in rows:
            f.write(json.dumps({"date": date, **r}) + "\n")
    path = os.path.join(docs, "multichip.md")
    fresh = not os.path.exists(path)
    with open(path, "a") as f:
        if fresh:
            f.write("# Multichip scaling runs (virtual CPU mesh)\n\n"
                    "Appended by bench_multichip.py; validates sharding "
                    "layout + collective placement, not ICI bandwidth "
                    "(one real chip per session).\n")
        f.write(f"\n## {date} ({rows[0]['platform']})\n\n")
        f.write("| devices | ms/frame | tiles/dev | chunk balance | "
                "entry balance | batch ms/variant | ICI bytes/frame |\n"
                "|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['devices']} | {r['ms_per_frame']} | "
                    f"{r['tiles_per_device']} | {r['chunk_balance']} | "
                    f"{r['entry_balance']} | {r['batch_ms_per_variant']} | "
                    f"{r['ici_bytes_per_frame']} |\n")
    print(f"# appended to {path} + multichip_runs.jsonl", file=sys.stderr)


if __name__ == "__main__":
    main()
