"""CPU oracle for the REFERENCE's output semantics: AA triangle meshes.

The engine replaces the reference's mesh pipeline (fringe triangles with
Gouraud alpha, rasterized 1-sample on the GPU) with analytic box-filter
coverage.  Everything else in the test suite checks the engine against its
own numpy twins — this module is the one place the reference's ACTUAL
output semantics are reproduced end-to-end, so the "mesh-equivalent AA"
claim is a measured number instead of a belief (VERDICT r3 item #5).

Meshing reimplemented from /root/reference/src/stroker.cpp:
  - convex fill AA     (strokerConvexFillAA, scalar version :713-805):
    fan over the inner ring p + v*aa, fringe quads to the outer ring
    p - v*aa at alpha 0, aa = fringeWidth/2 * sign(orientation cross).
  - stroke AA          (polylineStrokeAA template :1390-):
    core quad at +-hsw (hsw = (w - fringe)/2) alpha A, fringes to
    +-hsw_aa = hsw + fringe ramping to 0; miter joins via the extrusion
    vector (:40-53); butt/square/round caps (:1413-1517); round cap fan
    density law da = 2*acos(s*hsw / (s*hsw + tol)) (:1398).
  - thin strokes       (vg.cpp:3416-3420): width < fringe renders at
    fringe width with alpha scaled by clamp(w, 0, fringe)^2.

Rasterization matches the GPU contract: 1 sample per pixel center,
top-left fill rule on shared edges, barycentric (Gouraud) alpha, src-over
blending (BGFX_STATE_BLEND_SRC_ALPHA / INV_SRC_ALPHA, vg.cpp:1120).
"""

from __future__ import annotations

import math

import numpy as np

_EPS = 1e-6
_MAX_EXTRUSION = 1.0 / 100.0   # stroker.cpp kMaxExtrusionScale


def _dir(a, b):
    d = np.asarray(b, np.float64) - np.asarray(a, np.float64)
    n = math.hypot(d[0], d[1])
    return d / n if n * n >= _EPS else d * 0.0


def _perp_ccw(d):
    return np.array([-d[1], d[0]])


def _cross(a, b):
    return a[0] * b[1] - b[0] * a[1]


def calc_extrusion(d01, d12):
    """stroker.cpp:40-53 — joint extrusion for unit stroke width."""
    v = _perp_ccw(d01)
    cross = _cross(d12, d01)
    if abs(cross) > _MAX_EXTRUSION:
        v = (d01 - d12) / cross
    return v


class Mesh:
    """Vertex positions (N,2), per-vertex RGBA (N,4 straight alpha),
    triangle indices (M,3)."""

    def __init__(self):
        self.pos: list = []
        self.col: list = []
        self.tri: list = []

    def add(self, p, c) -> int:
        self.pos.append(np.asarray(p, np.float64))
        self.col.append(np.asarray(c, np.float64))
        return len(self.pos) - 1

    def tris(self, ids):
        for k in range(0, len(ids), 3):
            self.tri.append(ids[k:k + 3])

    def arrays(self):
        return (np.asarray(self.pos), np.asarray(self.col),
                np.asarray(self.tri, np.int32))


def convex_fill_aa_mesh(pts, rgba, fringe: float = 1.0) -> Mesh:
    """strokerConvexFillAA (scalar, stroker.cpp:713-805)."""
    pts = np.asarray(pts, np.float64)
    n = len(pts)
    assert n >= 3
    cross = _cross(pts[1] - pts[0], pts[2] - pts[0])
    aa = fringe * 0.5 * math.copysign(1.0, cross)
    c = np.asarray(rgba, np.float64)
    c0 = c.copy()
    c0[3] = 0.0

    m = Mesh()
    d01 = _dir(pts[n - 1], pts[0])
    for i in range(n):
        p1 = pts[i]
        p2 = pts[(i + 1) % n]
        d12 = _dir(p1, p2)
        v = calc_extrusion(d01, d12) * aa
        m.add(p1 + v, c)        # inner (vertex 2*i)
        m.add(p1 - v, c0)       # outer fringe (vertex 2*i+1)
        d01 = d12

    ids = []
    for i in range(n - 2):      # fan over inner ring
        ids += [0, 2 * (i + 1), 2 * (i + 2)]
    for i in range(n - 1):      # fringe quads
        b = 2 * i
        ids += [b, b + 1, b + 3, b, b + 3, b + 2]
    b = 2 * (n - 1)
    ids += [b, b + 1, 1, b, 1, 0]
    m.tris(ids)
    return m


def _half_circle_points(center, start_angle, radius_core, radius_aa, npts):
    pts = []
    for i in range(npts):
        a = start_angle + i * math.pi / (npts - 1)
        ca, sa = math.cos(a), math.sin(a)
        pts.append((np.array([center[0] + ca * radius_core,
                              center[1] + sa * radius_core]),
                    np.array([center[0] + ca * radius_aa,
                              center[1] + sa * radius_aa])))
    return pts


def stroke_aa_mesh(pts, closed: bool, width: float, rgba,
                   fringe: float = 1.0, cap: str = "butt",
                   scale: float = 1.0, tol: float = 0.25) -> Mesh:
    """polylineStrokeAA with Miter joins (stroker.cpp:1390-) and the thin
    law (vg.cpp:3416-3420).  Caps: butt / square / round."""
    pts = np.asarray(pts, np.float64)
    n = len(pts)
    assert n >= 2
    c = np.asarray(rgba, np.float64)
    if width <= fringe:          # thin stroke: fringe width, alpha *= w^2
        c = c.copy()
        c[3] *= max(0.0, min(width, fringe)) ** 2
        width = fringe
    c0 = c.copy()
    c0[3] = 0.0
    hsw = (width - fringe) * 0.5
    hsw_aa = hsw + fringe
    da = math.acos((scale * hsw) / ((scale * hsw) + tol)) * 2.0 \
        if hsw > 0 else math.pi / 2
    arc_n = max(2, math.ceil(math.pi / da))

    m = Mesh()
    ring_cols = (c0, c, c, c0)

    def add_ring(p, v):
        """lAA, l, r, rAA vertex ids at joint p with extrusion v."""
        return [m.add(p + v * hsw_aa, c0), m.add(p + v * hsw, c),
                m.add(p - v * hsw, c), m.add(p - v * hsw_aa, c0)]

    def connect(a, b):
        """Core + both fringe quads between rings a and b."""
        for k in range(3):
            m.tris([a[k], a[k + 1], b[k + 1], a[k], b[k + 1], b[k]])

    rings = []
    if closed:
        d01 = _dir(pts[-1], pts[0])
        for i in range(n):
            p1 = pts[i]
            d12 = _dir(p1, pts[(i + 1) % n])
            rings.append(add_ring(p1, calc_extrusion(d01, d12)))
            d01 = d12
        for i in range(n):
            connect(rings[i], rings[(i + 1) % n])
        return m

    d = [_dir(pts[i], pts[i + 1]) for i in range(n - 1)]
    l0 = _perp_ccw(d[0])
    # start cap (stroker.cpp:1413-1517)
    if cap == "butt":
        ids = [m.add(pts[0] + l0 * hsw_aa - d[0] * fringe, c0),
               m.add(pts[0] + l0 * hsw, c),
               m.add(pts[0] - l0 * hsw, c),
               m.add(pts[0] - l0 * hsw_aa - d[0] * fringe, c0)]
        m.tris([ids[0], ids[2], ids[1], ids[0], ids[3], ids[2]])
    elif cap == "square":
        ids = [m.add(pts[0] + l0 * hsw_aa - d[0] * hsw_aa, c0),
               m.add(pts[0] + l0 * hsw - d[0] * hsw, c),
               m.add(pts[0] - l0 * hsw - d[0] * hsw, c),
               m.add(pts[0] - l0 * hsw_aa - d[0] * hsw_aa, c0)]
        m.tris([ids[0], ids[2], ids[1], ids[0], ids[3], ids[2]])
    elif cap == "round":
        start = math.atan2(l0[1], l0[0])
        ring_pts = _half_circle_points(pts[0], start, hsw, hsw_aa, arc_n)
        vids = []
        for pc, pa in ring_pts:
            vids += [m.add(pc, c), m.add(pa, c0)]
        for i in range(arc_n - 2):        # fan over core points
            m.tris([vids[0], vids[2 * (i + 1)], vids[2 * (i + 2)]])
        for i in range(arc_n - 1):        # AA quads
            b = 2 * i
            m.tris([vids[b], vids[b + 1], vids[b + 3],
                    vids[b], vids[b + 3], vids[b + 2]])
        ids = [vids[1], vids[0], vids[-2], vids[-1]]
    else:
        raise ValueError(cap)
    rings.append(ids)

    for i in range(1, n - 1):
        v = calc_extrusion(d[i - 1], d[i])
        rings.append(add_ring(pts[i], v))
    le = _perp_ccw(d[-1])
    # end cap
    if cap == "butt":
        ids = [m.add(pts[-1] + le * hsw_aa + d[-1] * fringe, c0),
               m.add(pts[-1] + le * hsw, c),
               m.add(pts[-1] - le * hsw, c),
               m.add(pts[-1] - le * hsw_aa + d[-1] * fringe, c0)]
        m.tris([ids[0], ids[1], ids[2], ids[0], ids[2], ids[3]])
    elif cap == "square":
        ids = [m.add(pts[-1] + le * hsw_aa + d[-1] * hsw_aa, c0),
               m.add(pts[-1] + le * hsw + d[-1] * hsw, c),
               m.add(pts[-1] - le * hsw + d[-1] * hsw, c),
               m.add(pts[-1] - le * hsw_aa + d[-1] * hsw_aa, c0)]
        m.tris([ids[0], ids[1], ids[2], ids[0], ids[2], ids[3]])
    else:  # round
        start = math.atan2(-le[1], -le[0])
        ring_pts = _half_circle_points(pts[-1], start, hsw, hsw_aa, arc_n)
        vids = []
        for pc, pa in ring_pts:
            vids += [m.add(pc, c), m.add(pa, c0)]
        for i in range(arc_n - 2):
            m.tris([vids[0], vids[2 * (i + 1)], vids[2 * (i + 2)]])
        for i in range(arc_n - 1):
            b = 2 * i
            m.tris([vids[b], vids[b + 1], vids[b + 3],
                    vids[b], vids[b + 3], vids[b + 2]])
        ids = [vids[-1], vids[-2], vids[0], vids[1]]
    rings.append(ids)

    for i in range(len(rings) - 1):
        connect(rings[i], rings[i + 1])
    return m


def rasterize(mesh: Mesh, fb: np.ndarray) -> None:
    """Rasterize mesh into premultiplied fb (H,W,4), in place.

    GPU contract: one sample at each pixel center, top-left fill rule so
    shared mesh edges are covered exactly once, Gouraud alpha, src-over.
    """
    pos, col, tri = mesh.arrays()
    h, w = fb.shape[:2]
    for t in tri:
        v0, v1, v2 = pos[t[0]], pos[t[1]], pos[t[2]]
        c0, c1, c2 = col[t[0]], col[t[1]], col[t[2]]
        area = _cross(v1 - v0, v2 - v0)
        if area == 0.0:
            continue
        if area < 0:     # normalize to CCW so edge functions are positive
            v1, v2 = v2, v1
            c1, c2 = c2, c1
            area = -area
        xmin = max(int(math.floor(min(v0[0], v1[0], v2[0]) - 0.5)), 0)
        xmax = min(int(math.ceil(max(v0[0], v1[0], v2[0]) + 0.5)), w - 1)
        ymin = max(int(math.floor(min(v0[1], v1[1], v2[1]) - 0.5)), 0)
        ymax = min(int(math.ceil(max(v0[1], v1[1], v2[1]) + 0.5)), h - 1)
        if xmin > xmax or ymin > ymax:
            continue
        xs = np.arange(xmin, xmax + 1) + 0.5
        ys = np.arange(ymin, ymax + 1) + 0.5
        px, py = np.meshgrid(xs, ys)

        def edge(a, b):
            return ((b[0] - a[0]) * (py - a[1]) - (b[1] - a[1]) * (px - a[0]),
                    # top-left rule: edge counts when strictly inside OR on a
                    # top edge (horizontal, going left in CCW) / left edge
                    # (going up in CCW)
                    (a[1] == b[1] and b[0] < a[0]) or (b[1] < a[1]))

        e0, tl0 = edge(v0, v1)
        e1, tl1 = edge(v1, v2)
        e2, tl2 = edge(v2, v0)
        inside = (((e0 > 0) | ((e0 == 0) & tl0))
                  & ((e1 > 0) | ((e1 == 0) & tl1))
                  & ((e2 > 0) | ((e2 == 0) & tl2)))
        if not inside.any():
            continue
        # barycentric weights from opposite-edge functions
        w0 = e1 / area
        w1 = e2 / area
        w2 = e0 / area
        rgba = (w0[..., None] * c0 + w1[..., None] * c1 + w2[..., None] * c2)
        a = np.clip(rgba[..., 3], 0.0, 1.0) * inside
        src = rgba[..., :3]
        tile = fb[ymin:ymax + 1, xmin:xmax + 1]
        tile[..., :3] = src * a[..., None] + tile[..., :3] * (1 - a[..., None])
        tile[..., 3] = a + tile[..., 3] * (1 - a)


def render_meshes(meshes, width: int, height: int, background) -> np.ndarray:
    """Premultiplied (H,W,4) of meshes src-over a premultiplied background."""
    bgc = np.asarray(background, np.float64)
    fb = np.empty((height, width, 4), np.float64)
    fb[:] = bgc
    for m in meshes:
        rasterize(m, fb)
    return fb
