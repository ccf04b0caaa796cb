"""Persisted-EXECUTABLE cache for the cold frame dispatch (serving cold
start, VERDICT r05 #7).

The XLA persistent compilation cache already bounds the backend-compile
cost, but a fresh serving process still pays the frame program's full
trace+lower on its first dispatch — measured 3.3 s at 4x host throttle
(tools/probe_dispatch_cold.py), nearly all of it the Mosaic lowering of the
~14 Pallas kernels, pure GIL-bound Python that no cache below jax touches.
`jax.experimental.serialize_executable` persists the COMPILED executable
itself: a warm fresh process deserializes and calls it, skipping trace,
lowering and compile entirely.

Safety: the cache key covers (jax/jaxlib versions, device kind and count, a
content hash of every vgtpu/ops + vgtpu/raster source file, the static
kwargs, and the full input-aval tree).  Any miss or ANY exception — bad
pickle, device mismatch, API drift — falls back to the normal jit path.
Entries are written atomically from a background thread so the first
(populating) frame never blocks on serialization.  VGTPU_NO_EXEC_CACHE=1
disables the whole mechanism.

The reference has no analogue (shaders ship precompiled in vg.cpp's
embedded blobs — which is, in spirit, exactly this)."""

from __future__ import annotations

import functools
import hashlib
import os
import pickle
import tempfile
import threading

import numpy as np

import jax


def _enabled() -> bool:
    return not os.environ.get("VGTPU_NO_EXEC_CACHE")


@functools.lru_cache(maxsize=1)
def _code_fingerprint() -> str:
    """Content hash of the compute-path sources: a code change must never
    serve a stale executable."""
    h = hashlib.sha256()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for sub in ("ops", "raster"):
        d = os.path.join(root, sub)
        for name in sorted(os.listdir(d)):
            if name.endswith(".py"):
                with open(os.path.join(d, name), "rb") as f:
                    h.update(name.encode())
                    h.update(f.read())
    h.update(jax.__version__.encode())
    try:
        import jaxlib

        h.update(jaxlib.__version__.encode())
    except Exception:  # noqa: BLE001
        pass
    return h.hexdigest()[:16]


def _cache_dir() -> str:
    d = os.environ.get("VGTPU_EXEC_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "vgtpu-jax", "exec")
    os.makedirs(d, exist_ok=True)
    return d


def _aval_sig(tree) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    parts = [str(treedef)]
    for x in leaves:
        if hasattr(x, "shape"):
            parts.append(f"{tuple(x.shape)}{np.dtype(x.dtype).str}")
        else:
            parts.append(repr(x))
    return "|".join(parts)


def _key(statics, args) -> str:
    h = hashlib.sha256()
    h.update(_code_fingerprint().encode())
    try:
        dev = jax.devices()[0]
        h.update(f"{dev.platform}/{dev.device_kind}/{len(jax.devices())}"
                 .encode())
    except Exception:  # noqa: BLE001
        pass
    h.update(repr(sorted(statics.items())).encode())
    h.update(_aval_sig(args).encode())
    return h.hexdigest()[:32]


_loaded: dict[str, object] = {}       # per-process executables (hit or built)
# Populate gate: only the process's FIRST dispatch may build + store (the
# serving cold frame).  Later misses — e.g. every padded-shape variant a
# dynamic scene sweeps through — take the plain jit path instead: the AOT
# populate is ~3x slower than a jit call with a warm XLA cache, and its
# background serialization (~10 MB per entry) would land inside steady
# render loops.  Later HITS still load (multi-plan serving processes).
_first_dispatch = [True]


def dispatch_cached(jit_fn, args: tuple, statics: dict, key_cache=None):
    """Run `jit_fn(*args, **statics)` through the executable cache.

    Returns the output, or None when the caller should use the plain jit
    path (cache disabled, load failed, or this key previously failed —
    a bad entry is marked once and skipped, never retried per frame).

    key_cache: optional mutable dict the computed key memoizes into under
    "_exe_key" — steady frames reuse the plan's resident dict so the
    per-dispatch sha256 over the full aval tree is paid once per plan, not
    per frame.  Callers MUST drop the entry whenever the arg pytree
    STRUCTURE changes (paint-patch lazy/promoted transitions); a stale
    key only costs a pytree-mismatch fallback, never a wrong frame."""
    if not _enabled():
        return None
    first, _first_dispatch[0] = _first_dispatch[0], False
    key = key_cache.get("_exe_key") if key_cache is not None else None
    if key is None:
        try:
            key = _key(statics, args)
        except Exception:  # noqa: BLE001
            return None
        if key_cache is not None:
            key_cache["_exe_key"] = key
    if key in _loaded:
        compiled = _loaded[key]
        if compiled is None:            # marked bad earlier this process
            return None
        try:
            return compiled(*args)
        except Exception:  # noqa: BLE001
            _loaded[key] = None
            return None
    try:
        path = os.path.join(_cache_dir(), key + ".jexe")
        if os.path.exists(path):
            from jax.experimental import serialize_executable as se

            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            compiled = se.deserialize_and_load(payload, in_tree, out_tree)
        else:
            if not first:
                return None             # plain jit for later shape variants
            compiled = jit_fn.lower(*args, **statics).compile()
            _store_async(path, compiled)
        out = compiled(*args)
    except Exception:  # noqa: BLE001 — any failure: plain jit path
        _loaded[key] = None
        return None
    _loaded[key] = compiled
    return out


def _store_async(path: str, compiled) -> None:
    """Serialize + atomic-write off the frame's critical path."""

    def work():
        try:
            from jax.experimental import serialize_executable as se

            payload, in_tree, out_tree = se.serialize(compiled)
            fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path),
                                       suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f)
            os.replace(tmp, path)
        except Exception:  # noqa: BLE001
            pass

    threading.Thread(target=work, daemon=True,
                     name="vgtpu-execache-store").start()
