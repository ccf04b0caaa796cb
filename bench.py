#!/usr/bin/env python
"""Benchmark: SVG tiger + demo UI @ 1080p (BASELINE.json north star).

Prints ONE JSON line:
  {"metric": ..., "value": ms_per_frame, "unit": "ms", "vs_baseline": x}

value    = steady-state device ms/frame on the default JAX platform (TPU under
           the driver): full on-device raster (coverage + shade + composite)
           of the resident scene — the analogue of the reference's per-frame
           GPU submit+draw with Cacheable command lists.
baseline = the same steady-state frame on CPU (XLA host backend, subprocess) —
           the reference is a CPU-geometry engine, so CPU wall-clock is the
           comparison axis; the reference itself publishes no numbers
           (BASELINE.md) and is not runnable here (needs bgfx+GPU).
vs_baseline = baseline_ms / value  (>1 means faster than CPU baseline).

Extra diagnostics (cold-frame breakdown) go to stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def host_spin_ms() -> float:
    """Fixed pure-host workload (~5 ms on an unthrottled VM): a throttle
    indicator for the host-side diagnostics.  The VM's wall-clock inflates
    2-4x under throttling (CLAUDE.md), so dynamic/app/redraw numbers are only
    comparable across sessions after normalizing by this."""
    import zlib

    import numpy as np

    buf = np.arange(1_500_000, dtype=np.int32).tobytes()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        c = 0
        for _k in range(8):
            c = zlib.crc32(buf, c)
        x = 0
        for i in range(120_000):
            x += i * i
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return best


def tunnel_mbps() -> float:
    """Host->device upload throughput right now: one 8 MB put + a fetch of
    a scalar that depends on it.  The axon tunnel DEGRADES over a session
    (CLAUDE.md: 24 MB = 15 ms fresh, tens of seconds degraded) — this probe
    turns 'cold/dynamic look slow' into an attributable environment fact."""
    import jax
    import numpy as np

    first = jax.jit(lambda a: a[0])
    x = np.zeros((2_000_000,), np.float32)
    np.asarray(first(jax.device_put(x[:128])))   # compile outside the timing
    t0 = time.perf_counter()
    np.asarray(first(jax.device_put(x)))
    dt = time.perf_counter() - t0
    return 8.0 / max(dt, 1e-9)


def fetch_rtt_ms() -> float:
    """Median host<->device round-trip of fetching ONE resident scalar.
    Through the axon tunnel this is ~30 ms — a fixed environment tax that
    any per-frame-synced wall-clock number carries and that a real render
    loop (device-side present, like the reference's GPU swap) never pays.
    Reported in the JSON line so host-path numbers are interpretable."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    y = jax.jit(lambda x: x * 2 + 1)(jnp.ones((128,), jnp.float32))
    np.asarray(y[0])
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(y[0])
        ts.append((time.perf_counter() - t0) * 1e3)
    return sorted(ts)[len(ts) // 2]


def start_keepalive(interval: float = 4.0) -> dict:
    """Pay this process's tunnel attach tax CONCURRENTLY with host work.

    tools/probe_idle_tax.py (r04) established that the axon worker warm-up is
    PER-PROCESS (a fresh process pays 167 s right after another process ran),
    NOT cross-process as the r03 probe suggested, and that it lands on the
    process's FIRST blocking fetch.  bench's cold path does 60 s+ of pure
    host work (record + bin + upload build + trace/compile) before its first
    fetch — so a daemon thread executes one trivial program immediately
    (attach proceeds worker-side while the main thread records the scene) and
    then keeps the program-load channel warm with a small fetch every few
    seconds (a NEW program's first execute costs ~10.6 s after a 30 s idle
    gap vs 0.53 s on an active channel — same probe).

    Returns a state dict: {"attach_s": float|None, "t_done": float|None,
    "stop": Event, "ready": Event}.  Call state["stop"].set() before any
    timed device loop.

    The thread doubles as the HEALTH GATE: "ready" is set once the first
    execute lands (attach paid, tunnel proven alive).  A dead tunnel hangs
    the daemon thread forever; main() waits on "ready" with a timeout and
    emits the honest null metric without ever touching jax from the main
    thread (a hung backend init is uninterruptible in-process).
    """
    import threading

    state = {"attach_s": None, "t_done": None, "stop": threading.Event(),
             "ready": threading.Event()}

    def loop():
        t0 = time.perf_counter()
        try:
            import jax
            import jax.numpy as jnp
            import numpy as np

            f = jax.jit(lambda x: (x * 2 + 1).sum())
            x = jnp.ones((128,), jnp.float32)
            float(np.asarray(f(x)))
            state["attach_s"] = time.perf_counter() - t0
            state["t_done"] = time.perf_counter()
            state["ready"].set()
        except Exception:  # noqa: BLE001 — keepalive is best-effort
            state["ready"].set()   # failed fast: unblock the gate honestly
            return
        while not state["stop"].wait(interval):
            try:
                float(np.asarray(f(x)))
            except Exception:  # noqa: BLE001
                return

    th = threading.Thread(target=loop, daemon=True, name="vgtpu-keepalive")
    th.start()
    state["thread"] = th
    return state


_PROBES = {}


def _probe_fn(n: int):
    """Jitted n-image fetch probe (one scalar depending on every frame);
    cached per n so its trace+compile never lands inside a timed loop."""
    import jax

    if n not in _PROBES:
        _PROBES[n] = jax.jit(lambda ims: sum(im[0, 0, 0] for im in ims))
    return _PROBES[n]


def run_loop(frame_fn, n: int, warm_img=None) -> float:
    """Pipelined render-loop timing: issue n frames back-to-back with NO
    per-frame host sync (render loops present asynchronously — the
    reference's bgfx swap is async too), then ONE fetch that depends on
    every frame's image.  Per-frame host work overlaps device execution of
    earlier frames, exactly as a production loop would run; the per-frame
    cost is the loop's throughput, not latency.  Returns mean ms/frame.

    warm_img: a same-shape image used to compile the fetch probe outside
    the timed window."""
    import numpy as np

    probe = _probe_fn(n)
    if warm_img is not None:
        np.asarray(probe([warm_img] * n))
    imgs = []
    t0 = time.perf_counter()
    for k in range(n):
        imgs.append(frame_fn(k))
    np.asarray(probe(imgs))
    return (time.perf_counter() - t0) * 1e3 / n


def measure(reps: int = 32, warmup: int = 3, keepalive: dict | None = None) -> dict:
    import numpy as np
    import vgtpu as vg
    from vgtpu.raster.benchloop import measure_device_ms_per_frame
    from vgtpu.scenes.demo_ui import draw_benchmark_frame

    # build-system warm-up OUTSIDE the timed record: the on-demand g++
    # builds (ctypes lib + CPython path recorder) cost 5-15 s on a fresh
    # checkout and are one-time artifacts, not per-frame engine work
    from vgtpu.native import available as _native_available, pathrec as _pathrec

    _native_available()
    _pathrec()

    ctx = vg.createContext()

    t0 = time.perf_counter()
    vg.begin(ctx, 0, 1920, 1080, 1.0)
    draw_benchmark_frame(ctx, 0.0)
    t1 = time.perf_counter()
    img = vg.end(ctx, background=(0.12, 0.12, 0.13, 1.0))
    t_end = time.perf_counter()
    np.asarray(img[0, 0])
    t2 = time.perf_counter()
    # cold-start breakdown (VERDICT r2 #2): device_dispatch covers the jit
    # trace+compile (persistent cache hits show up as a collapse here),
    # fetch is the first execute + tunnel download
    stages = {k: round(v, 1) for k, v in ctx.profiler.times_ms.items()}
    # first-fetch waits for the queued scene upload (tunnel-throughput
    # bound: probe below), any uncached XLA/Mosaic compiles, and first
    # execute.  The tunnel worker's one-time cold-attach warm-up (30 s-6 min,
    # environment artifact — tools/probe_cold_tax.py) was already paid by
    # _backend_alive's probe execute, so it does NOT land here
    cold_mb = ctx.profiler.counters.get("upload_bytes", 0) / 1e6
    mbps = tunnel_mbps()
    est_upload_ms = cold_mb / max(mbps, 1e-9) * 1e3
    # attach accounting (per-process tunnel warm-up, probe_idle_tax.py):
    # the keepalive thread paid it concurrently with the host work above —
    # if it finished before the first fetch started, first-fetch contains
    # NO attach; otherwise the residual seconds are named here
    attach_s = attach_residual_s = None
    if keepalive is not None:
        attach_s = keepalive.get("attach_s")
        t_done = keepalive.get("t_done")
        if attach_s is None:
            attach_residual_s = t2 - t_end    # attach never finished: all of it
        else:
            attach_residual_s = max(0.0, t_done - t_end)
        keepalive["stop"].set()
    print(f"[bench] cold breakdown: record={(t1 - t0) * 1e3:.0f} ms  "
          f"end-call={(t_end - t1) * 1e3:.0f} ms {stages}  "
          f"first-fetch={(t2 - t_end) * 1e3:.0f} ms  "
          f"compile_cache={'off' if os.environ.get('VGTPU_NO_COMPILE_CACHE') else 'on'}  "
          f"scene_upload={cold_mb:.1f} MB  tunnel={mbps:.1f} MB/s  "
          f"(~{est_upload_ms:.0f} ms of first-fetch is upload wait; "
          f"process attach tax={attach_s if attach_s is None else round(attach_s, 1)} s "
          f"paid concurrently by the keepalive thread, residual inside "
          f"first-fetch={attach_residual_s if attach_residual_s is None else round(attach_residual_s, 1)} s)",
          file=sys.stderr)

    plan = ctx.last_plan
    d = ctx.last_device_arrays
    bg = (0.12, 0.12, 0.13, 1.0)

    # full dynamic frame (CHANGED content per frame -> frame-memo misses):
    # re-record + re-bin + re-upload + render (the reference's analogue is
    # CPU retessellation of non-cached content)
    def sync(img):
        # block_until_ready does NOT synchronize through the axon tunnel
        # (CLAUDE.md); fetching a value that depends on the frame does
        np.asarray(img[0, 0])

    def dyn_frame(k, eps=0.0):
        vg.begin(ctx, 0, 1920, 1080, 1.0)
        draw_benchmark_frame(ctx, 0.05 * (k + 1) + eps)
        return vg.end(ctx, background=bg)

    # warm EVERY timed frame's padded bucket shapes first: animation sweeps
    # entry counts across {2^k, 1.5*2^k} bucket boundaries, and one
    # fresh-shape compile (~4 s through the tunnel) inside the timed loop
    # would swamp the steady throughput this stage measures.  The timed pass
    # perturbs t by 1e-4 — a distinct content fingerprint (frame-memo MISS,
    # full record+bin+upload per frame) with the same padded shapes.
    wimg = None
    for k in range(5):
        wimg = dyn_frame(k)
        sync(wimg)
    dynamic_ms = run_loop(lambda k: dyn_frame(k, eps=1e-4), 5, warm_img=wimg)

    # identical-content redraw (frame-memo hits): record + fingerprint +
    # resident-plan dispatch — the common app pattern
    def redraw_frame(_k):
        vg.begin(ctx, 0, 1920, 1080, 1.0)
        draw_benchmark_frame(ctx, 0.0)
        return vg.end(ctx, background=bg)

    sync(redraw_frame(0))
    redraw_ms = run_loop(redraw_frame, 5, warm_img=wimg)

    # paint-only animation (color/alpha values change, geometry does not):
    # the paint_memo patch path — record + fingerprint + ~KB paint upload +
    # dispatch, no bin/sample/upload (context._value_only_update)
    def frame_with_overlay(k):
        vg.begin(ctx, 0, 1920, 1080, 1.0)
        draw_benchmark_frame(ctx, 0.0)
        vg.beginPath(ctx)
        vg.rect(ctx, 1800, 1000, 60, 40)
        vg.fillPath(ctx, vg.color4ub(50 + 17 * k, 120, 200, 180),
                    vg.FillFlags.ConvexAA)
        return vg.end(ctx, background=bg)

    sync(frame_with_overlay(0))  # geometry now includes the overlay: full bin
    sync(frame_with_overlay(-3))  # first PATCH frame: the in-jit-expansion
    # program signature (bucket_params None, numpy pop-paint leaf) compiles
    # here, outside the timed window — the same warm discipline as wimg
    paint_hits0 = ctx.profiler.counters.get("memo_paint_hits", 0)
    anim_ms = run_loop(lambda k: frame_with_overlay(k + 1), 5, warm_img=wimg)
    anim_hits = ctx.profiler.counters.get("memo_paint_hits", 0) - paint_hits0

    # serving-mode diagnostics (batch / pan / ss2) are collected by main()
    # from the pre-launched --diag-all child (see main's comment)
    batch_ms = batch_mode = pan_ms = pan_hits = ss2_ms = None

    # app pattern (the reference's intended usage, vg.cpp:4287-4300): static
    # artwork in a Cacheable command list, dynamic UI immediate — cached
    # replay + incremental rebin do the heavy lifting
    from vgtpu.scenes.demo_ui import draw_demo_ui
    from vgtpu.scenes.tiger import draw_tiger

    cl = vg.createCommandList(ctx, vg.CommandListFlags.Cacheable)
    vg.beginCommandList(ctx, cl)
    draw_tiger(ctx, 20, 60, 1.06)
    vg.endCommandList(ctx)

    def app_frame(k, eps=0.0):
        vg.begin(ctx, 0, 1920, 1080, 1.0)
        vg.submitCommandList(ctx, cl)
        draw_demo_ui(ctx, 0.3 + 0.05 * k + eps)
        return vg.end(ctx, background=bg)

    for k in range(6):   # cache build + layer bake settle + shape warm
        sync(app_frame(k))
    app_ms = run_loop(lambda k: app_frame(k, eps=1e-4), 6, warm_img=wimg)

    # chained on-device loop: immune to async-dispatch timing artifacts
    frame_ms = measure_device_ms_per_frame(plan, d, bg, reps_hi=reps, reps_lo=warmup)
    return {
        "record_ms": (t1 - t0) * 1e3,
        "cold_bin_exec_ms": (t2 - t1) * 1e3,
        "attach_s": attach_s,
        "attach_residual_s": attach_residual_s,
        "frame_ms": frame_ms,
        "dynamic_ms": dynamic_ms,
        "redraw_ms": redraw_ms,
        "anim_ms": anim_ms,
        "anim_paint_hits": anim_hits,
        "ss2_ms": ss2_ms,
        "batch_ms": batch_ms,
        "batch_mode": batch_mode,
        "pan_ms": pan_ms,
        "pan_layer_hits": pan_hits,
        "app_ms": app_ms,
        "fetch_rtt_ms": fetch_rtt_ms(),
        "tunnel_mbps": mbps,
        "cold_upload_mb": cold_mb,
        "host_spin_ms": host_spin_ms(),
        "stats": plan.stats,
        "platform": str(__import__("jax").devices()[0].platform),
    }


def pan_diag() -> None:
    """Standalone translated-cached-list measurement (subprocess child):
    submits the tiger list under a moving translation with the demo UI on
    top; prints {"pan_ms": median steady ms, "layer_cl_hits": n}."""
    import numpy as np
    import vgtpu as vg
    from vgtpu.scenes.demo_ui import draw_demo_ui
    from vgtpu.scenes.tiger import draw_tiger

    bg = (0.12, 0.12, 0.13, 1.0)
    ka = start_keepalive()   # overlap this process's attach with the record
    ctx = vg.createContext()
    cl = vg.createCommandList(ctx, vg.CommandListFlags.Cacheable)
    vg.beginCommandList(ctx, cl)
    draw_tiger(ctx, 20, 60, 1.06)
    vg.endCommandList(ctx)

    def frame(k):
        vg.begin(ctx, 0, 1920, 1080, 1.0)
        vg.pushState(ctx)
        vg.transformTranslate(ctx, 2.5 * k, 2 * k)
        vg.submitCommandList(ctx, cl)
        vg.popState(ctx)
        # UI content CYCLES over warmed values: the moving view alone makes
        # every frame's fingerprint fresh (layer token), so cycling keeps
        # padded bucket shapes warm — an unbounded 0.05*k sweep can cross a
        # {2^k,1.5*2^k} boundary and compile INSIDE the timed loop
        # (measured: rep-offset runs timed 0.8-7 s compiles, r5a session)
        draw_demo_ui(ctx, 0.3 + 0.05 * (k % 4))
        return vg.end(ctx, background=bg)

    # frames 0-3 cover cache build, first cached replay, the moved replay
    # that requests the bake, and the bake+compile frame; frames 4-7 settle
    # the static-UI overlay layer (two stable-prefix frames -> transparent
    # bake -> first blended dispatch compile) — steady is 8+
    wimg = None
    for k in range(8):
        wimg = frame(k)
        np.asarray(wimg[0, 0])
    ka["stop"].set()
    spin_before = host_spin_ms()
    pan_ms = run_loop(lambda k: frame(k + 8), 5, warm_img=wimg)
    spin_after = host_spin_ms()
    print(json.dumps({
        "pan_ms": pan_ms,
        "layer_cl_hits": ctx.profiler.counters.get("layer_cl_hits", 0),
        # this child timeshares the core with the main bench sequence: its
        # throttle DURING the loop is what pan_norm must divide by —
        # bracket the timed window and average (a single post-loop probe
        # can catch a quieter moment and under-correct)
        "host_spin_ms": (spin_before + spin_after) / 2.0,
        "host_spin_bracket_ms": [round(spin_before, 1),
                                 round(spin_after, 1)],
    }), flush=True)


def ss2_diag() -> None:
    """Standalone parity-mode (coverage_supersample=2) steady-state frame:
    the conflation-free mode whose output matches the reference's mesh
    semantics.  Prints {"ss2_ms": chained device ms/frame}."""
    import numpy as np
    import vgtpu as vg
    from vgtpu.raster.benchloop import measure_device_ms_per_frame
    from vgtpu.scenes.demo_ui import draw_benchmark_frame

    ka = start_keepalive()   # overlap this process's attach with the record
    bg = (0.12, 0.12, 0.13, 1.0)
    ctx = vg.createContext(vg.ContextConfig(coverage_supersample=2))
    vg.begin(ctx, 0, 1920, 1080, 1.0)
    draw_benchmark_frame(ctx, 0.0)
    img = vg.end(ctx, background=bg)
    np.asarray(img[0, 0])
    ka["stop"].set()
    # median of 3 (CLAUDE.md measurement discipline: single two-length runs
    # are +-0.5 ms under tunnel drift)
    runs = sorted(
        measure_device_ms_per_frame(ctx.last_plan, ctx.last_device_arrays,
                                    bg, reps_hi=64, reps_lo=3)
        for _ in range(3))
    print(json.dumps({"ss2_ms": runs[1]}), flush=True)


def batch_diag(k: int = 6, reps_hi: int = 8, emit: bool = True):
    """Standalone batched-variant measurement (subprocess child of measure):
    bakes K overlay-color variants of the benchmark frame and prints one
    JSON line {"batch_ms": per-variant chained device ms}."""
    import vgtpu as vg
    from vgtpu.raster.batch import VariantBatch, measure_batch_ms_per_frame
    from vgtpu.scenes.demo_ui import draw_benchmark_frame

    bg = (0.12, 0.12, 0.13, 1.0)
    ctx = vg.createContext()

    def variant(k):
        def f(c):
            draw_benchmark_frame(c, 0.0)
            vg.beginPath(c)
            vg.rect(c, 1800, 1000, 60, 40)
            vg.fillPath(c, vg.color4ub(50 + 17 * k, 120, 200, 180),
                        vg.FillFlags.ConvexAA)
        return f

    ka = start_keepalive()   # overlap this process's attach with the bake
    vb = VariantBatch.bake(ctx, [variant(i) for i in range(k)],
                           1920, 1080, background=bg)
    ka["stop"].set()
    ms = measure_batch_ms_per_frame(vb, background=bg, reps_hi=reps_hi, reps_lo=2)
    out = {"batch_ms": ms, "mode": vb._mode, "k": k}
    if emit:
        print(json.dumps(out), flush=True)
    return out


def batch_sweep(ks=(2, 4, 6, 8, 12, 16)) -> None:
    """K-sweep of the fused batch in ONE process/session (comparable
    numbers, VERDICT r3 #4): per-variant chained ms for each K.  The edge
    probe (VERDICT r4 #6) passes larger ks until a resource fails; failures
    are recorded as rows with the error named.  Appends
    docs/batch_sweep.jsonl and prints the rows."""
    import datetime

    rows = []
    for k in ks:
        try:
            r = batch_diag(k=k, reps_hi=8, emit=False)
            rows.append(r)
            print(json.dumps(r), flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"# K={k} failed: {e}", file=sys.stderr)
            rows.append({"k": k, "batch_ms": None, "error": str(e)[:200]})
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "docs", "batch_sweep.jsonl")
    date = datetime.date.today().isoformat()
    with open(path, "a") as f:
        for r in rows:
            f.write(json.dumps({"date": date, **r}) + "\n")
    print(f"# appended to {path}", file=sys.stderr)


def main() -> None:
    if "--batch-diag" in sys.argv:
        batch_diag()
        return
    if "--batch-sweep" in sys.argv:
        batch_sweep()
        return
    if "--ss2-diag" in sys.argv:
        ss2_diag()
        return
    if "--pan-diag" in sys.argv:
        pan_diag()
        return
    if "--diag-all" in sys.argv:
        # one child process = one attach tax for all three serving diags.
        # The parent launches this child at bench START so the attach
        # (pure waiting, no CPU) overlaps the whole main sequence; the
        # _VGTPU_DIAG_GATE file defers the HOST-TIMED diag loops until the
        # parent's own timed measurements are done (1-core VM — concurrent
        # host work corrupts both sides' wall clocks).
        gate = os.environ.get("_VGTPU_DIAG_GATE")
        if gate:
            ka = start_keepalive()
            ka["ready"].wait(timeout=3300)
            print(f"# diag child attach_s={ka['attach_s']}", flush=True)
            t0 = time.perf_counter()
            while not os.path.exists(gate):
                if time.perf_counter() - t0 > 3600:
                    print("# diag gate never opened", file=sys.stderr)
                    return
                time.sleep(1.0)
        # order cheapest-compile first so a hang keeps the earlier lines
        for fn in (batch_diag, pan_diag, ss2_diag):
            try:
                fn()
            except Exception as e:  # noqa: BLE001
                print(f"# {fn.__name__} failed: {e}", file=sys.stderr)
        return
    if "--cpu-baseline" in sys.argv:
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        r = measure(reps=5, warmup=2)
        print(json.dumps(r))
        return

    # the keepalive thread starts paying THIS process's attach tax now
    # (per-process, GROWS with session age — probe_idle_tax.py measured
    # 22.7 s at session start, 167 s forty minutes in, 363 s at two hours)
    # and doubles as the health gate: its first successful execute proves
    # the tunnel alive; the main thread touches jax only after that.  The
    # old design paid a SECOND attach in a probe subprocess and lost it —
    # and its 900 s probe timeout could null the whole metric at round-end
    # session age.
    t_start = time.perf_counter()
    ka = start_keepalive()

    # the serving-diag child (batch / pan / ss2, one process = one attach)
    # launches NOW so its attach — pure waiting, no CPU — overlaps the
    # whole main sequence instead of sitting on the critical path after it
    # (attach grows to 1000 s+ late in a session).  Its host-timed loops
    # stay gated behind a file flag until main's own timed work is done.
    diag_proc = None
    gate_path = None
    if not os.environ.get("VGTPU_BENCH_NO_BATCH"):
        try:
            import tempfile

            fd, gate_path = tempfile.mkstemp(prefix="vgtpu_diag_gate_")
            os.close(fd)
            os.unlink(gate_path)            # child waits for it to EXIST
            env = dict(os.environ)
            env["_VGTPU_DIAG_GATE"] = gate_path
            diag_proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--diag-all"],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
            )
        except Exception as e:  # noqa: BLE001
            print(f"[bench] diag child launch failed: {e}", file=sys.stderr)
            diag_proc = None

    # CPU baseline FIRST: a pure-CPU subprocess whose 3-8 min of wall time
    # overlaps the main process's tunnel attach, so the cold measurement
    # below starts with a warm channel and first-fetch measures the ENGINE
    cpu_ms = None
    try:
        env = dict(os.environ)
        env["JAX_PLATFORM_NAME"] = "cpu"
        env["JAX_PLATFORMS"] = "cpu"
        env["VGTPU_BENCH_NO_BATCH"] = "1"   # keep the baseline under its timeout
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-baseline"],
            capture_output=True, text=True, timeout=1800, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if out.returncode != 0:
            raise RuntimeError(
                f"baseline subprocess rc={out.returncode}: {out.stderr[-800:]}")
        cpu_ms = json.loads(out.stdout.strip().splitlines()[-1])["frame_ms"]
        print(f"[bench] cpu baseline frame={cpu_ms:.3f} ms", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"[bench] cpu baseline failed: {e}", file=sys.stderr)

    # health gate: give the attach up to 55 min wall total before declaring
    # the tunnel dead — it GROWS with session age (22.7 s fresh, 363 s at
    # 2 h, 1015 s at 3 h) and the handshake is starved further by the CPU
    # baseline sharing the one core; a too-tight gate nulls the metric
    remaining = max(60.0, 3300.0 - (time.perf_counter() - t_start))
    ka["ready"].wait(timeout=remaining)
    if ka["attach_s"] is None:
        print("[bench] tunnel attach did not complete within the gate — "
              "emitting null metric instead of hanging", file=sys.stderr)
        if diag_proc is not None:
            diag_proc.kill()
        print(json.dumps({
            "metric": "ms/frame SVG-tiger+demo-UI 1080p, on-device raster (steady-state)",
            "value": None,
            "unit": "ms",
            "vs_baseline": None,
            "note": "TPU backend unreachable at bench time "
                    "(attach gate timed out)",
        }))
        return
    print(f"[bench] tunnel attach={ka['attach_s']:.1f} s (paid concurrently "
          f"with the CPU baseline)", file=sys.stderr)

    r = measure(keepalive=ka)

    # main's timed work is done: open the diag gate and collect the child
    # (its attach overlapped everything above; only its measurement time —
    # a few minutes — remains on the critical path)
    if diag_proc is not None:
        diag_out = ""
        try:
            with open(gate_path, "w") as f:
                f.write("go")
            diag_out, diag_err = diag_proc.communicate(timeout=1500)
            if diag_proc.returncode != 0:
                print(f"[bench] diag child rc={diag_proc.returncode}: "
                      f"{(diag_err or '')[-400:]}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            diag_proc.kill()
            diag_out = (diag_proc.communicate()[0] or "")
            print("[bench] diag child timed out; keeping partial results",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"[bench] diag child failed: {e}", file=sys.stderr)
        finally:
            try:
                os.unlink(gate_path)
            except OSError:
                pass
        for line in (diag_out or "").splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                dd = json.loads(line)
            except ValueError:
                continue
            if "batch_ms" in dd:
                r["batch_ms"], r["batch_mode"] = dd["batch_ms"], dd.get("mode")
            elif "pan_ms" in dd:
                r["pan_ms"], r["pan_layer_hits"] = (dd["pan_ms"],
                                                    dd["layer_cl_hits"])
                # the pan loop is host-timed in the CHILD process, which
                # timeshares the 1-core VM with the main sequence — its
                # throttle can differ from the main process's; normalize pan
                # by the throttle the child itself measured around its loop
                r["pan_host_spin_ms"] = dd.get("host_spin_ms")
            elif "ss2_ms" in dd:
                r["ss2_ms"] = dd["ss2_ms"]

    print(f"[bench] device={r['platform']} frame={r['frame_ms']:.3f} ms  "
          f"dynamic={r['dynamic_ms']:.1f} ms  app={r['app_ms']:.1f} ms  "
          f"redraw={r['redraw_ms']:.1f} ms  "
          f"anim={r['anim_ms']:.1f} ms (paint hits {r['anim_paint_hits']}/5)  "
          f"ss2={r['ss2_ms'] if r['ss2_ms'] is None else round(r['ss2_ms'], 3)} ms  "
          f"batch={r['batch_ms'] if r['batch_ms'] is None else round(r['batch_ms'], 3)} ms/variant "
          f"({r['batch_mode']})  "
          f"pan={r['pan_ms'] if r['pan_ms'] is None else round(r['pan_ms'], 1)} ms "
          f"(layer hits {r['pan_layer_hits']})  "
          f"record={r['record_ms']:.1f} ms  cold={r['cold_bin_exec_ms']:.1f} ms  "
          f"host_spin={r['host_spin_ms']:.1f} ms  "
          f"fetch_rtt={r['fetch_rtt_ms']:.1f} ms  "
          f"stats={r['stats']}", file=sys.stderr)

    vs = None if cpu_ms is None else cpu_ms / r["frame_ms"]

    # host-timed numbers carry throttle-normalized companions (×5/host_spin:
    # the probe's unthrottled floor is ~5 ms) so BENCH_r* records compare
    # across sessions despite 1-5x host throttling variance.  dynamic/redraw/
    # anim/app/pan are PIPELINED loop throughput since r03 (run_loop): r02's
    # per-frame-synced values additionally carried one fetch_rtt_ms (~30 ms
    # tunnel round-trip) per frame — add it back when diffing r02 vs r03
    norm = 5.0 / max(r["host_spin_ms"], 1e-6)
    print(json.dumps({
        "metric": "ms/frame SVG-tiger+demo-UI 1080p, on-device raster (steady-state)",
        "value": round(r["frame_ms"], 3),
        "unit": "ms",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        # parity-mode (conflation-free, reference-mesh-equivalent) frame:
        # the headline `value` is the conflating default; this is the
        # number a strict AA-parity reading should attach the claim to
        "frame_ms_ss2": (None if r["ss2_ms"] is None
                         else round(r["ss2_ms"], 3)),
        "batch_ms": (None if r["batch_ms"] is None
                     else round(r["batch_ms"], 3)),
        "batch_mode": r["batch_mode"],
        "pan_layer_hits": r["pan_layer_hits"],
        "host_spin_ms": round(r["host_spin_ms"], 1),
        "fetch_rtt_ms": round(r["fetch_rtt_ms"], 1),
        "tunnel_mbps": round(r["tunnel_mbps"], 1),
        "cold_upload_mb": round(r["cold_upload_mb"], 1),
        "cold_ms": round(r["cold_bin_exec_ms"], 1),
        # per-process tunnel attach (environment tax, probe_idle_tax.py):
        # paid concurrently by the keepalive thread; residual = the part
        # that still landed inside cold_ms's first fetch
        "attach_s": (None if r["attach_s"] is None
                     else round(r["attach_s"], 1)),
        "attach_residual_s": (None if r["attach_residual_s"] is None
                              else round(r["attach_residual_s"], 1)),
        **{f"{k}_norm_ms": (None if r[f"{k}_ms"] is None
                            else round(r[f"{k}_ms"] * norm, 1))
           for k in ("record", "dynamic", "redraw", "anim", "app")},
        # pan runs host-timed in the concurrent diag child: normalize by the
        # child's OWN measured throttle when it reported one
        "pan_norm_ms": (None if r["pan_ms"] is None else round(
            r["pan_ms"] * (5.0 / max(r.get("pan_host_spin_ms")
                                     or r["host_spin_ms"], 1e-6)), 1)),
        "pan_host_spin_ms": r.get("pan_host_spin_ms"),
    }))


if __name__ == "__main__":
    main()
