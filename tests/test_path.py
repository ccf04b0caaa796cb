"""Path building + flattening vs the reference's adaptive algorithm
(path.cpp seam: pathGetVertices/pathGetSubPaths, path.h:35-38)."""

import math

import numpy as np

from vgtpu.geometry.path import PathBuilder
from vgtpu.oracle import flatten_cubic_adaptive, polyline_max_deviation


def _bake(build, scale=1.0, tol=0.25):
    p = PathBuilder()
    p.reset(scale, tol)
    build(p)
    return p.bake()


def test_moveto_lineto_subpaths():
    v, s = _bake(lambda p: (p.move_to(0, 0), p.line_to(10, 0), p.line_to(10, 10),
                            p.move_to(20, 20), p.line_to(30, 20)))
    assert len(s) == 2
    assert s[0].tolist() == [0, 3, 0]
    assert s[1].tolist() == [3, 2, 0]
    np.testing.assert_allclose(v[3], [20, 20])


def test_close_dedupes_matching_endpoint():
    v, s = _bake(lambda p: (p.move_to(0, 0), p.line_to(10, 0), p.line_to(10, 10),
                            p.line_to(0, 0), p.close()))
    # last vertex == first -> dropped (pathClose, path.cpp:707-726)
    assert s[0][1] == 3
    assert s[0][2] == 1


def test_consecutive_dedupe():
    v, s = _bake(lambda p: (p.move_to(0, 0), p.line_to(0, 0), p.line_to(10, 0)))
    assert s[0][1] == 2


def test_cubic_flatten_within_tolerance():
    rng = np.random.default_rng(42)
    for scale in (0.5, 1.0, 3.0):
        for _ in range(25):
            cp = rng.uniform(0, 200, (4, 2))
            v, s = _bake(
                lambda p: (p.move_to(*cp[0]), p.cubic_to(*cp[1], *cp[2], *cp[3])),
                scale=scale,
            )
            poly = np.concatenate([[cp[0]], v[1:]], axis=0)
            dev = polyline_max_deviation(v, cp[0], cp[1], cp[2], cp[3])
            # Wang bound guarantees error <= sqrt(tol)/scale = 0.5/scale
            assert dev <= 0.55 / scale, (dev, scale)


def test_cubic_density_comparable_to_adaptive():
    """Uniform flattening should not emit wildly more points than the
    reference's adaptive scheme (cost parity)."""
    rng = np.random.default_rng(1)
    ours, ref = 0, 0
    for _ in range(30):
        cp = rng.uniform(0, 500, (4, 2))
        v, _ = _bake(lambda p: (p.move_to(*cp[0]), p.cubic_to(*cp[1], *cp[2], *cp[3])))
        ours += len(v)
        ref += 1 + len(flatten_cubic_adaptive(cp[0], cp[1], cp[2], cp[3], 0.25))
    assert ours < ref * 3.0, (ours, ref)


def test_quadratic_elevation_matches_curve():
    # quadratic through (0,0),(50,100),(100,0)
    v, _ = _bake(lambda p: (p.move_to(0, 0), p.quadratic_to(50, 100, 100, 0)))
    # quadratic apex at t=.5 is (50,50)
    apex = v[np.argmax(v[:, 1])]
    assert abs(apex[1] - 50.0) < 1.0


def test_circle_point_density_law():
    # reference law: da = 2*acos(s*r/(s*r+tol)); numPoints = 2*max(2,ceil(pi/da))
    r, tol = 40.0, 0.25
    da = 2 * math.acos(r / (r + tol))
    expected = 2 * max(2, math.ceil(math.pi / da))
    v, s = _bake(lambda p: p.circle(50, 50, r))
    assert abs(len(v) - expected) <= 2
    rad = np.hypot(v[:, 0] - 50, v[:, 1] - 50)
    np.testing.assert_allclose(rad, r, atol=1e-3)
    assert s[0][2] == 1  # closed


def test_circle_scales_density_with_zoom():
    v1, _ = _bake(lambda p: p.circle(0, 0, 10), scale=1.0)
    v4, _ = _bake(lambda p: p.circle(0, 0, 10), scale=4.0)
    assert len(v4) > len(v1) * 1.5


def test_rect_winding_order():
    v, s = _bake(lambda p: p.rect(0, 0, 10, 10))
    assert s[0].tolist() == [0, 4, 1]
    # reference order: (x,y) -> (x,y+h) -> (x+w,y+h) -> (x+w,y) (path.cpp:281-285)
    np.testing.assert_allclose(v, [[0, 0], [0, 10], [10, 10], [10, 0]])


def test_arc_endpoints():
    v, _ = _bake(lambda p: (p.move_to(100, 50), p.arc(50, 50, 50, 0.0, math.pi / 2, 1)))
    np.testing.assert_allclose(v[-1], [50, 100], atol=1e-3)


def test_rounded_rect_bbox_and_corners():
    v, s = _bake(lambda p: p.rounded_rect(10, 20, 100, 60, 15))
    assert s[0][2] == 1
    np.testing.assert_allclose(v.min(axis=0), [10, 20], atol=1e-3)
    np.testing.assert_allclose(v.max(axis=0), [110, 80], atol=1e-3)
    # corner point must lie on the corner circle
    c = np.array([25, 35])  # top-left corner center
    near = v[(v[:, 0] < 25) & (v[:, 1] < 35)]
    rad = np.hypot(*(near - c).T)
    np.testing.assert_allclose(rad, 15.0, atol=0.05)


def test_polyline_appends():
    coords = np.array([[1, 1], [2, 2], [3, 1]], np.float32)
    v, s = _bake(lambda p: (p.move_to(0, 0), p.polyline(coords)))
    assert s[0][1] == 4
    np.testing.assert_allclose(v[1:], coords)


def test_device_flatten_matches_host():
    """ops/flatten.py (jit) and the host baker implement the same math: the
    flattened polylines rasterize to the same coverage, and clamped-tail
    padding edges contribute nothing."""
    import jax.numpy as jnp

    from vgtpu.fonts.truetype import _edge_coverage_np
    from vgtpu.ops.flatten import flatten_cubics, polyline_edges

    rng = np.random.default_rng(21)
    cps = rng.uniform(5, 120, (6, 4, 2))
    # close each curve into a loop with a chord back to the start
    dev_pts = np.asarray(flatten_cubics(jnp.asarray(cps, jnp.float32), 0.5, max_n=48))
    dev_edges = np.asarray(polyline_edges(jnp.asarray(dev_pts), close=True))

    for k in range(len(cps)):
        pb = PathBuilder()
        pb.reset(1.0, 0.25)   # tol_d = sqrt(0.25)/1 = 0.5, same as device call
        pb.move_to(*cps[k, 0])
        pb.cubic_to(*cps[k, 1], *cps[k, 2], *cps[k, 3])
        pb.close()
        v, _ = pb.bake(backend="numpy")
        nxt = np.roll(v, -1, axis=0)
        host_edges = np.concatenate([v, nxt], axis=1).astype(np.float32)

        cov_host = _edge_coverage_np(host_edges, 128, 128)
        cov_dev = _edge_coverage_np(dev_edges[k].astype(np.float32), 128, 128)
        d = np.abs(cov_host - cov_dev)
        assert d.mean() < 2e-3, k     # same curve within flattening tolerance
        assert (d > 0.3).sum() < 40, k
