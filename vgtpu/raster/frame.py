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


@functools.partial(
    jax.jit,
    static_argnames=("num_entries", "ntx", "nty", "tile_h", "tile_w", "width",
                     "height", "bucket_flags"),
)
def _frame_fn(
    chunk_pools, entry_backdrop, entry_kind, entry_rule,
    entry_aa, entry_paint_kind, entry_paint, entry_scissor,
    entry_color_tile, color_tiles, buckets, background,
    *, num_entries, ntx, nty, tile_h, tile_w, width, height, bucket_flags=None,
):
    """The whole device frame in ONE compiled program."""
    entry_cov = entry_coverage_from_pools(chunk_pools, num_entries, tile_h, tile_w)
    entry_w = entry_cov + entry_backdrop[:, :, None]
    fb = composite_bucketed_body(
        entry_w, buckets,
        entry_kind, entry_rule, entry_aa, entry_paint_kind, entry_paint,
        entry_scissor, entry_color_tile, color_tiles, background,
        ntx=ntx, tile_h=tile_h, tile_w=tile_w, num_tiles=ntx * nty,
        bucket_flags=bucket_flags,
    )
    return tiles_to_image(fb, ntx=ntx, nty=nty, tile_h=tile_h, tile_w=tile_w,
                          width=width, height=height)


def execute_plan(plan: FramePlan, background=(1.0, 1.0, 1.0, 1.0), device_arrays=None) -> jax.Array:
    """Run the device pipeline; returns (H, W, 4) premultiplied f32 RGBA."""
    d = device_arrays if device_arrays is not None else plan_to_device(plan)
    return _frame_fn(
        d["chunk_pools"], d["entry_backdrop"],
        d["entry_kind"], d["entry_rule"], d["entry_aa"],
        d["entry_paint_kind"], d["entry_paint"], d["entry_scissor"],
        d["entry_color_tile"], d["color_tiles"], d["tile_buckets"],
        jnp.asarray(np.asarray(background, np.float32)),
        num_entries=d["chunk_entry_num"],
        ntx=plan.ntx, nty=plan.nty,
        tile_h=plan.tile_h, tile_w=plan.tile_w,
        width=plan.width, height=plan.height,
        bucket_flags=d["bucket_flags"],
    )


def plan_to_device(plan: FramePlan) -> dict:
    """Upload the plan's arrays once (command lists / caches stay resident)."""
    if plan.tile_buckets is None:
        plan.tile_buckets = compute_tile_buckets(
            plan.tile_entries, plan.tile_entries.shape[0], plan.entry_kind, plan
        )
    return {
        "chunk_pools": tuple(
            (jnp.asarray(ce), jnp.asarray(cent)) for ce, cent in plan.chunk_pools
        ),
        "chunk_entry_num": plan.entry_backdrop.shape[0],
        "entry_backdrop": jnp.asarray(plan.entry_backdrop),
        "entry_kind": jnp.asarray(plan.entry_kind),
        "entry_rule": jnp.asarray(plan.entry_rule),
        "entry_aa": jnp.asarray(plan.entry_aa),
        "entry_paint_kind": jnp.asarray(plan.entry_paint_kind),
        "entry_paint": jnp.asarray(plan.entry_paint),
        "entry_scissor": jnp.asarray(plan.entry_scissor),
        "entry_color_tile": jnp.asarray(plan.entry_color_tile),
        "color_tiles": jnp.asarray(plan.color_tiles),
        "tile_entries": jnp.asarray(plan.tile_entries),
        "tile_buckets": tuple(
            (jnp.asarray(te), jnp.asarray(ids)) for te, ids, _fl in plan.tile_buckets
        ),
        "bucket_flags": tuple(fl for _te, _ids, fl in plan.tile_buckets),
    }


def image_to_u8(img) -> np.ndarray:
    """Premultiplied f32 -> straight u8 RGBA."""
    img = np.asarray(img)
    a = np.maximum(img[..., 3:4], 1e-6)
    rgb = np.clip(img[..., 0:3] / a, 0.0, 1.0)
    out = np.concatenate([rgb, np.clip(img[..., 3:4], 0.0, 1.0)], axis=-1)
    return (out * 255.0 + 0.5).astype(np.uint8)
