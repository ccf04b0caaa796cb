"""tpu-vg: a TPU-native 2D vector-graphics engine.

Capability-parity rebuild of jdryg/vg-renderer (see /root/repo/SURVEY.md) as an
idiomatic JAX/Pallas pipeline: analytic winding-number coverage rasterization on
8x128-pixel tiles instead of CPU tessellation + GPU triangles.

Public API mirrors the reference's vg:: namespace (include/vg/vg.h) as free
functions over a Context, so reference users can map calls 1:1.
"""

import os as _os


def _enable_compile_cache() -> None:
    """Persistent XLA/Mosaic compilation cache (serving cold-start bound):
    the frame pipeline mints ~10 kernel shapes per plan signature and a cold
    first frame pays 20-40 s of compiles per shape bucket; the disk cache
    cuts warm-process cold start to upload+execute.  Opt out with
    VGTPU_NO_COMPILE_CACHE=1; relocate with VGTPU_COMPILE_CACHE_DIR."""
    if _os.environ.get("VGTPU_NO_COMPILE_CACHE"):
        return
    # the cache exists for the TPU serving cold start; on the (virtual) CPU
    # platform compiles are fast AND jaxlib has been observed to SEGFAULT
    # deserializing cache entries under the forced-cpu test platform
    # (compilation_cache.get_executable_and_time, reproduced twice in the
    # round-3 test suite) — keep CPU processes cache-free
    if (_os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
            or _os.environ.get("JAX_PLATFORM_NAME") == "cpu"):
        return
    try:
        import jax

        path = _os.environ.get(
            "VGTPU_COMPILE_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "vgtpu-jax"))
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # default thresholds skip fast compiles; cache everything — the axon
        # tunnel makes even small recompiles cost dispatch latency
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # noqa: BLE001 - cache is an optimization, never fatal
        pass


_enable_compile_cache()

from vgtpu.core import (  # noqa: F401
    Color,
    Colors,
    LineCap,
    LineJoin,
    PathType,
    FillRule,
    Winding,
    ClipRule,
    TransformOrder,
    StrokeFlags,
    FillFlags,
    ImageFlags,
    TextAlign,
    TextBoxFlags,
    CommandListFlags,
    FontFlags,
    color4f,
    color4ub,
    colorHSB,
    colorHSL,
    colorSetAlpha,
    colorGetRed,
    colorGetGreen,
    colorGetBlue,
    colorGetAlpha,
    stroke_flags,
    fill_flags,
)
from vgtpu.api.config import ContextConfig  # noqa: F401

from vgtpu.api.context import *  # noqa: F401,F403
from vgtpu.api.context import (  # noqa: F401 (explicit for IDEs)
    Context,
    GradientHandle,
    ImagePatternHandle,
    ImageHandle,
    FontHandle,
    CommandListHandle,
    TextConfig,
    TextRow,
    GlyphPosition,
    isValid,
)

from vgtpu.api.standalone import *  # noqa: F401,F403  (path.h/stroker.h seam)
from vgtpu.api.standalone import Mesh, Stroker, SubPath  # noqa: F401
from vgtpu.raster.batch import (  # noqa: F401  (TPU-native batched serving)
    VariantBatch,
    measure_batch_ms_per_frame,
)


def debugPrintf(fmt: str, *args) -> None:
    """vg.h VG_TRACE analogue (vg.h:50-56): formatted diagnostic print.

    The reference compiles this to bx::debugPrintf only when VG_CONFIG_DEBUG;
    here it is gated by the VGTPU_DEBUG environment variable."""
    import os as _os
    import sys as _sys

    if _os.environ.get("VGTPU_DEBUG"):
        print("vg " + (fmt % args if args else fmt), file=_sys.stderr)


def debugBreak() -> None:
    """vg.h VG_CHECK's bx::debugBreak analogue (vg.h:62-68): drop into the
    debugger when VGTPU_DEBUG is set, else no-op."""
    import os as _os

    if _os.environ.get("VGTPU_DEBUG"):
        import pdb

        pdb.set_trace()


__version__ = "0.1.0"
