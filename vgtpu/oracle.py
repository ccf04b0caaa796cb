"""Independent brute-force oracles for testing (SURVEY.md §4).

The reference ships no tests; its implicit strategy is golden images.  Ours is
stronger: every production kernel is validated against an *independently
implemented* brute-force version here.

- coverage_oracle: supersampled point-in-winding test (the textbook definition
  of fill-rule coverage) — validates the analytic coverage kernel.
- flatten_cubic_adaptive: the reference's recursive-descent flattening
  (path.cpp:86-182 algorithm, reimplemented from its math) — validates that
  Wang-formula uniform flattening stays within tolerance.
"""

from __future__ import annotations

import numpy as np


def winding_at_points(edges: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Winding number at sample points via leftward ray casting.

    edges: (E,4); xs, ys: (...,) broadcastable sample coordinates.
    Counts edges whose y-span covers the sample (half-open [ymin,ymax)) and
    whose crossing x <= sample x, signed by direction.
    """
    x0, y0, x1, y1 = edges[:, 0], edges[:, 1], edges[:, 2], edges[:, 3]
    keep = np.abs(y1 - y0) > 1e-12
    x0, y0, x1, y1 = x0[keep], y0[keep], x1[keep], y1[keep]
    s = np.sign(y1 - y0)
    ymin = np.minimum(y0, y1)
    ymax = np.maximum(y0, y1)

    pts_shape = np.broadcast(xs, ys).shape
    w = np.zeros(pts_shape, np.float64)
    # chunk over edges to bound memory
    for i in range(0, len(x0), 512):
        sl = slice(i, i + 512)
        t = (ys[..., None] - y0[sl]) / (y1[sl] - y0[sl])
        xc = x0[sl] + t * (x1[sl] - x0[sl])
        hit = (ys[..., None] >= ymin[sl]) & (ys[..., None] < ymax[sl]) & (xc <= xs[..., None])
        w += (hit * s[sl]).sum(axis=-1)
    return w


def coverage_oracle(
    edges: np.ndarray,
    width: int,
    height: int,
    fill_rule: int = 0,
    samples: int = 8,
    origin=(0.0, 0.0),
) -> np.ndarray:
    """Supersampled fill-rule coverage image, (height, width) float64."""
    off = (np.arange(samples) + 0.5) / samples
    cov = np.zeros((height, width), np.float64)
    for oy in off:
        ys = origin[1] + np.arange(height)[:, None] + oy
        for ox in off:
            xs = origin[0] + np.arange(width)[None, :] + ox
            w = winding_at_points(edges, np.broadcast_to(xs, (height, width)),
                                  np.broadcast_to(ys, (height, width)))
            if fill_rule == 0:
                c = np.minimum(np.abs(w), 1.0)
            else:
                c = 1.0 - np.abs(np.mod(w, 2.0) - 1.0)
            cov += c
    return cov / (samples * samples)


def flatten_cubic_adaptive(p0, p1, p2, p3, tess_tol: float, max_levels: int = 10):
    """Reference-style adaptive flattening (path.cpp:86-182 semantics):
    flatness test (d2+d3)^2 <= tessTol*(dx^2+dy^2), depth-first, emits
    endpoints of accepted sub-curves in order (excluding the start point)."""
    out = []
    stack = [(p0, p1, p2, p3, 0)]
    while stack:
        a, b, c, d, lvl = stack.pop()
        dx = d[0] - a[0]
        dy = d[1] - a[1]
        d2 = abs((b[0] - d[0]) * dy - (b[1] - d[1]) * dx)
        d3 = abs((c[0] - d[0]) * dy - (c[1] - d[1]) * dx)
        if (d2 + d3) ** 2 <= tess_tol * (dx * dx + dy * dy) or lvl >= max_levels:
            out.append(d)
            continue
        ab = ((a[0] + b[0]) / 2, (a[1] + b[1]) / 2)
        bc = ((b[0] + c[0]) / 2, (b[1] + c[1]) / 2)
        cd = ((c[0] + d[0]) / 2, (c[1] + d[1]) / 2)
        abc = ((ab[0] + bc[0]) / 2, (ab[1] + bc[1]) / 2)
        bcd = ((bc[0] + cd[0]) / 2, (bc[1] + cd[1]) / 2)
        mid = ((abc[0] + bcd[0]) / 2, (abc[1] + bcd[1]) / 2)
        stack.append((mid, bcd, cd, d, lvl + 1))
        stack.append((a, ab, abc, mid, lvl + 1))
    return np.array(out, np.float64)


def cubic_eval(p0, p1, p2, p3, t):
    t = np.asarray(t)[:, None]
    mt = 1.0 - t
    return (
        mt**3 * np.asarray(p0)
        + 3 * mt**2 * t * np.asarray(p1)
        + 3 * mt * t**2 * np.asarray(p2)
        + t**3 * np.asarray(p3)
    )


def polyline_max_deviation(poly: np.ndarray, p0, p1, p2, p3, n_probe: int = 256) -> float:
    """Max distance from dense samples of the cubic to the polyline."""
    ts = np.linspace(0.0, 1.0, n_probe)
    samples = cubic_eval(p0, p1, p2, p3, ts)
    # distance from each sample to nearest polyline segment
    a = poly[:-1]
    b = poly[1:]
    ab = b - a
    denom = (ab**2).sum(axis=1)
    denom = np.where(denom < 1e-12, 1.0, denom)
    best = np.full(len(samples), np.inf)
    for i in range(len(a)):
        ap = samples - a[i]
        t = np.clip((ap @ ab[i]) / denom[i], 0.0, 1.0)
        proj = a[i] + t[:, None] * ab[i]
        dist = np.hypot(*(samples - proj).T)
        best = np.minimum(best, dist)
    return float(best.max())
