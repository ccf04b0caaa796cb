"""Persisted-executable cache mechanics (vgtpu/raster/execache.py).

The TPU hook (raster/frame.execute_plan) is platform-gated; these tests
drive dispatch_cached directly on the CPU backend — serialize/deserialize
round-trip, per-process reuse, key sensitivity, disable switch, and the
fail-open contract (any bad cache state falls back to None)."""

from __future__ import annotations

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vgtpu.raster import execache


@pytest.fixture
def cachedir(tmp_path, monkeypatch):
    monkeypatch.setenv("VGTPU_EXEC_CACHE_DIR", str(tmp_path))
    monkeypatch.delenv("VGTPU_NO_EXEC_CACHE", raising=False)
    execache._loaded.clear()
    execache._first_dispatch[0] = True
    yield tmp_path
    execache._loaded.clear()
    execache._first_dispatch[0] = True


# static kwargs exactly like the production _frame_fn (static_argnames drop
# out of the compiled call tree — dispatch_cached calls compiled(*args))
FN = jax.jit(lambda a, b, *, scale: (a * scale + b),
             static_argnames=("scale",))


def _args():
    return (jnp.arange(8.0), jnp.ones(8))


def test_roundtrip_and_reuse(cachedir):
    out = execache.dispatch_cached(FN, _args(), {"scale": 2.0})
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.arange(8.0) * 2 + 1)
    assert len(execache._loaded) == 1
    # same process, same key: served from _loaded without touching disk
    out_b = execache.dispatch_cached(FN, _args(), {"scale": 2.0})
    np.testing.assert_array_equal(np.asarray(out_b), np.asarray(out))
    # wait for the async store, then a fresh "process" (cleared _loaded)
    # must either load from disk and match, or fail OPEN (None) — the
    # XLA:CPU AOT loader can reject its own result over machine-feature
    # flags (+prefer-no-scatter); the TPU loader is validated end-to-end
    # by tools/probe_execache.py instead
    import time

    for _ in range(100):
        if any(f.endswith(".jexe") for f in os.listdir(cachedir)):
            break
        time.sleep(0.05)
    files = [f for f in os.listdir(cachedir) if f.endswith(".jexe")]
    assert files, "async store never landed"
    execache._loaded.clear()
    out2 = execache.dispatch_cached(FN, _args(), {"scale": 2.0})
    if out2 is not None:
        np.testing.assert_array_equal(np.asarray(out2), np.asarray(out))


def test_key_sensitivity(cachedir):
    k1 = execache._key({"scale": 2.0}, _args())
    assert k1 == execache._key({"scale": 2.0}, _args())
    assert k1 != execache._key({"scale": 3.0}, _args())
    a, b = _args()
    assert k1 != execache._key({"scale": 2.0}, (a[:4], b[:4]))
    assert k1 != execache._key({"scale": 2.0},
                               (a.astype(jnp.bfloat16), b))


def test_disabled_returns_none(cachedir, monkeypatch):
    monkeypatch.setenv("VGTPU_NO_EXEC_CACHE", "1")
    assert execache.dispatch_cached(FN, _args(), {"scale": 2.0}) is None


def test_corrupt_entry_fails_open(cachedir):
    key = execache._key({"scale": 2.0}, _args())
    with open(os.path.join(cachedir, key + ".jexe"), "wb") as f:
        f.write(b"not a pickle")
    out = execache.dispatch_cached(FN, _args(), {"scale": 2.0})
    assert out is None          # caller falls back to the plain jit path


def test_wrong_pytree_fails_open(cachedir):
    """A cached executable called with a structurally different arg tree
    (the in-place paint-patch mutation scenario) must error out into the
    fallback, never silently misrender."""
    out = execache.dispatch_cached(FN, _args(), {"scale": 2.0})
    assert out is not None
    key = execache._key({"scale": 2.0}, _args())
    # simulate a stale key -> wrong executable for these args
    execache._loaded[execache._key({"scale": 2.0},
                                   (jnp.arange(4.0), jnp.ones(4)))] = \
        execache._loaded[key]
    out2 = execache.dispatch_cached(
        FN, (jnp.arange(4.0), jnp.ones(4)), {"scale": 2.0})
    if out2 is not None:        # a fresh compile is also acceptable
        np.testing.assert_allclose(np.asarray(out2), np.arange(4.0) * 2 + 1)


def test_code_fingerprint_in_key(cachedir, monkeypatch):
    k1 = execache._key({"s": 1}, _args())
    monkeypatch.setattr(execache, "_code_fingerprint", lambda: "other")
    assert execache._key({"s": 1}, _args()) != k1


def test_populate_gate_first_dispatch_only(cachedir):
    """Only the process's first dispatch may BUILD an entry; later misses
    (dynamic padded-shape variants) return None so the caller stays on the
    plain jit path, but later HITS still load."""
    out = execache.dispatch_cached(FN, _args(), {"scale": 2.0})
    assert out is not None
    # a second, different-shaped miss must NOT populate
    a4 = (jnp.arange(4.0), jnp.ones(4))
    assert execache.dispatch_cached(FN, a4, {"scale": 2.0}) is None
    import time

    for _ in range(100):
        if any(f.endswith(".jexe") for f in os.listdir(cachedir)):
            break
        time.sleep(0.05)
    assert len([f for f in os.listdir(cachedir)
                if f.endswith(".jexe")]) == 1


def test_key_cache_memoizes_and_invalidation_contract(cachedir):
    """key_cache holds the computed key under _exe_key (steady frames skip
    the sha256); clearing the entry forces recompute to the same value."""
    kc = {}
    out = execache.dispatch_cached(FN, _args(), {"scale": 2.0}, key_cache=kc)
    assert out is not None and "_exe_key" in kc
    k1 = kc["_exe_key"]
    out2 = execache.dispatch_cached(FN, _args(), {"scale": 2.0}, key_cache=kc)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(out))
    kc.pop("_exe_key")
    execache.dispatch_cached(FN, _args(), {"scale": 2.0}, key_cache=kc)
    assert kc["_exe_key"] == k1
