#!/usr/bin/env python
"""Does the axon tunnel's cold-attach tax RE-APPLY after idle gaps?

tools/probe_cold_tax.py established: the first program execute reaching an
idle tunnel worker pays a one-time 30 s-6 min warm-up, cross-process.  bench.py
pays it in the health probe — yet cold first-fetch still measured 63 s fresh
(411 s aged, BENCH_r03/r04), with ~60-80 s of pure host work (record + bin +
upload build) between the probe and the first frame execute.  Hypothesis: the
warm-up is per-IDLE-PERIOD, not per-session — the worker/tunnel detaches after
some idle threshold and the next execute pays again.

Method: execute a trivial jitted program, then sleep T and execute again, for
growing T.  Also interleave a NEW program shape after a gap to separate
per-program load cost from per-connection reattach cost.

Usage: python tools/probe_idle_tax.py [gap_seconds ...]   (default 5 30 75 150)
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    gaps = [float(a) for a in sys.argv[1:]] or [5, 30, 75, 150]
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print(f"platform={dev.platform}", flush=True)

    f = jax.jit(lambda x: (x * 2 + 1).sum())
    x = jnp.ones((128,), jnp.float32)

    t0 = time.perf_counter()
    float(np.asarray(f(x)))
    print(f"first execute: {time.perf_counter() - t0:.2f} s", flush=True)
    t0 = time.perf_counter()
    float(np.asarray(f(x)))
    print(f"second execute: {time.perf_counter() - t0:.3f} s", flush=True)

    for gap in gaps:
        time.sleep(gap)
        t0 = time.perf_counter()
        float(np.asarray(f(x)))
        dt = time.perf_counter() - t0
        print(f"after {gap:.0f}s idle: same-program execute {dt:.2f} s",
              flush=True)
        # a NEW program shape right after (connection now warm): separates
        # per-program dispatch cost from per-connection reattach
        g = jax.jit(lambda x, n=int(gap): (x + n).sum())
        t0 = time.perf_counter()
        float(np.asarray(g(x)))
        print(f"           new-program execute {time.perf_counter() - t0:.2f} s",
              flush=True)


if __name__ == "__main__":
    main()
