#!/usr/bin/env python
"""Measure the axon worker's cold-attach tax, separating it from the
engine's own cold start.

Evidence (2026-08-19 session, each line one fresh process, persistent
compile cache warm so client compile is ~0):

    trivial XLA matmul   first-exec-fetch = 29.6 s ... 127.5 s
    trivial Pallas kernel first-exec-fetch = 101-111 s (when first) /
                                             0.62 s (right after another
                                             process paid the tax)
    full benchmark frame  first-fetch      = 1.9-17 s warm / 188 s cold

Interpretation: the FIRST program execution that reaches the tunnel worker
after an idle period pays a one-time, highly variable (~30-190 s) warm-up,
regardless of program size or whether it contains Mosaic custom calls.
Subsequent executes — from the SAME or DIFFERENT processes — are fast.
This is an environment/tunnel artifact (it did not exist in the round-1
session, where the same engine cold-started in 6.0 s end to end); it is
not client compile time (jax_explain_cache_misses shows persistent-cache
hits totalling ~2 s) and not upload (scene is 2.6 MB at 10-30 MB/s).

bench.py therefore pays this tax in its backend health probe (which
executes one trivial jitted program) and reports it as worker_attach_s,
so cold_ms measures the ENGINE's cold start: record + bin + texture bake
+ upload + cached-compile load + first execute.

Run: cd /root/repo && python tools/probe_cold_tax.py
Each phase runs in a fresh subprocess so per-process state can't hide
the tax.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

XLA = """
import sys; sys.path.insert(0, {repo!r})
import time, numpy as np, jax, jax.numpy as jnp
import vgtpu  # enables the persistent compile cache
@jax.jit
def f(x): return (x @ x.T).sum() + jnp.sin(x).sum()
x = jnp.ones((256, 128), jnp.float32)
t0 = time.perf_counter(); y = f(x); t1 = time.perf_counter()
np.asarray(y); t2 = time.perf_counter()
print(f"xla: dispatch={{t1-t0:.2f}}s first-exec-fetch={{t2-t1:.2f}}s")
"""

PALLAS = """
import sys; sys.path.insert(0, {repo!r})
import time, numpy as np, jax, jax.numpy as jnp
import vgtpu
from jax.experimental import pallas as pl
def k(x_ref, o_ref): o_ref[...] = x_ref[...] * 2.0 + 1.0
@jax.jit
def f(x):
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32))(x)
x = jnp.ones((256, 128), jnp.float32)
t0 = time.perf_counter(); y = f(x); t1 = time.perf_counter()
np.asarray(y[0, 0]); t2 = time.perf_counter()
np.asarray(f(x)[0, 0]); t3 = time.perf_counter()
print(f"pallas: dispatch={{t1-t0:.2f}}s first-exec-fetch={{t2-t1:.2f}}s "
      f"second={{t3-t2:.2f}}s")
"""

FRAME = """
import sys; sys.path.insert(0, {repo!r})
import time, numpy as np
import vgtpu as vg
from vgtpu.scenes.demo_ui import draw_benchmark_frame
ctx = vg.createContext()
t0 = time.perf_counter()
vg.begin(ctx, 0, 1920, 1080, 1.0); draw_benchmark_frame(ctx, 0.0)
img = vg.end(ctx, background=(0.12, 0.12, 0.13, 1.0))
t2 = time.perf_counter()
np.asarray(img[0, 0])
t3 = time.perf_counter()
print(f"frame: end={{t2-t0:.1f}}s first-fetch={{t3-t2:.1f}}s")
"""


def run(code: str) -> None:
    out = subprocess.run([sys.executable, "-c", code.format(repo=REPO)],
                         capture_output=True, text=True, timeout=600,
                         cwd=REPO)
    sys.stdout.write(out.stdout)
    if out.returncode != 0:
        sys.stdout.write(f"  rc={out.returncode}: {out.stderr[-300:]}\n")


def main() -> None:
    print("Each phase is a fresh process; the FIRST one pays the worker "
          "attach tax (if the worker is cold):")
    run(XLA)
    run(PALLAS)
    run(FRAME)
    print("Re-running the XLA probe (worker now warm):")
    run(XLA)


if __name__ == "__main__":
    main()
