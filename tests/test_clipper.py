"""Clipper unit tests.

The reference's 10-type polygon taxonomy (Source.cpp:1037-1050) is the test
case list: each overlap pattern type 0-9 must come out of the one clip-then-
shoelace formula with the correct closed-form area.  Random sweeps are
checked against an independent scalar Sutherland–Hodgman implementation.
"""

import math

import numpy as np
import pytest

from aainterp.ops.clipper import quad_rect_overlap_area, quad_vertices


# ---------------------------------------------------------------------
# Independent scalar reference: classic list-based Sutherland–Hodgman
# ---------------------------------------------------------------------


def _clip_poly_halfplane(poly, inside, intersect):
    out = []
    n = len(poly)
    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        if inside(cur):
            out.append(cur)
            if not inside(nxt):
                out.append(intersect(cur, nxt))
        elif inside(nxt):
            out.append(intersect(cur, nxt))
    return out


def _ref_quad_rect_area(quad, lo_x, lo_y, hi_x, hi_y):
    poly = list(quad)
    for a, val, sign in (
        (0, lo_x, 1.0),
        (0, hi_x, -1.0),
        (1, lo_y, 1.0),
        (1, hi_y, -1.0),
    ):
        def inside(p, a=a, val=val, sign=sign):
            return sign * (p[a] - val) >= 0

        def intersect(p, q, a=a, val=val):
            t = (val - p[a]) / (q[a] - p[a])
            return (
                p[0] + t * (q[0] - p[0]),
                p[1] + t * (q[1] - p[1]),
            )

        poly = _clip_poly_halfplane(poly, inside, intersect)
        if len(poly) < 3:
            return 0.0
    area = 0.0
    for i in range(len(poly)):
        x0, y0 = poly[i]
        x1, y1 = poly[(i + 1) % len(poly)]
        area += x0 * y1 - x1 * y0
    return abs(area) / 2.0


def _rot_square(cx, cy, side, angle_deg):
    """Rotated square vertices in boundary order (matches quad_vertices)."""
    c = math.cos(math.radians(angle_deg))
    s = math.sin(math.radians(angle_deg))
    h = side / 2.0
    pts = []
    for u, v in ((-h, -h), (h, -h), (h, h), (-h, h)):
        pts.append((cx + u * c + v * s, cy - u * s + v * c))
    return pts


def test_random_sweep_vs_scalar_reference():
    rng = np.random.default_rng(0)
    n = 1500
    angles = rng.uniform(0, 90, n)
    sides = rng.uniform(0.3, 4.0, n)
    cx = rng.uniform(-3, 3, n)
    cy = rng.uniform(-3, 3, n)
    lo_x = rng.uniform(-3, 2, n)
    lo_y = rng.uniform(-3, 2, n)
    w = rng.uniform(0.2, 3.0, n)
    h = rng.uniform(0.2, 3.0, n)

    qx = np.empty((n, 4))
    qy = np.empty((n, 4))
    expected = np.empty(n)
    for i in range(n):
        quad = _rot_square(cx[i], cy[i], sides[i], angles[i])
        qx[i] = [p[0] for p in quad]
        qy[i] = [p[1] for p in quad]
        expected[i] = _ref_quad_rect_area(
            quad, lo_x[i], lo_y[i], lo_x[i] + w[i], lo_y[i] + h[i]
        )

    got = quad_rect_overlap_area(np, qx, qy, lo_x, lo_y, lo_x + w, lo_y + h)
    np.testing.assert_allclose(got, expected, rtol=0, atol=1e-12)


def test_quad_vertices_matches_rot_square():
    px = np.array([1.3, -0.7])
    py = np.array([0.2, 2.0])
    for angle in (0.0, 17.0, 45.0, 89.0):
        c, s = math.cos(math.radians(angle)), math.sin(math.radians(angle))
        qx, qy = quad_vertices(np, px, py, 2.0, c, s)
        for i in range(2):
            ref = _rot_square(px[i], py[i], 2.0, angle)
            np.testing.assert_allclose(qx[i], [p[0] for p in ref], atol=1e-15)
            np.testing.assert_allclose(qy[i], [p[1] for p in ref], atol=1e-15)


# ---------------------------------------------------------------------
# The reference's type 0-9 taxonomy as explicit fixtures
# (types per Source.cpp:919-931; geometry chosen to realise each pattern
# against the unit cell [-0.5, 0.5]^2)
# ---------------------------------------------------------------------

SQRT2 = math.sqrt(2.0)

TAXONOMY = [
    # (name, square center, side, angle, expected area)
    ("type0_not_included", (5.0, 5.0), 2.0, 30.0, 0.0),
    ("type1_whole_pixel", (0.0, 0.0), 4.0, 30.0, 1.0),
    # 45-deg square (diamond) centered on the right cell edge: its left
    # corner reaches x=0.5-sqrt(2)/2 cutting a corner triangle of the cell
    ("type2_triangle", (0.5 + SQRT2 / 2 - 0.3, 0.0), 1.0, 45.0, 0.3 * 0.3),
    # axis-aligned half overlap: quadrangle (trapezoid)
    ("type3_quadrangle", (1.0, 0.0), 2.0, 0.0, 0.5),
    # axis-aligned corner overlap: quadrangle
    ("type3_corner_rect", (1.0, 1.0), 2.0, 0.0, 0.25),
]


@pytest.mark.parametrize(
    "name,center,side,angle,expected",
    [t for t in TAXONOMY if t[4] is not None],
)
def test_taxonomy_known_areas(name, center, side, angle, expected):
    quad = _rot_square(center[0], center[1], side, angle)
    qx = np.array([[p[0] for p in quad]])
    qy = np.array([[p[1] for p in quad]])
    got = quad_rect_overlap_area(
        np, qx, qy, np.array([-0.5]), np.array([-0.5]),
        np.array([0.5]), np.array([0.5]),
    )
    assert got[0] == pytest.approx(expected, abs=1e-14), name


def test_taxonomy_types_2_through_9_vs_reference_clipper():
    """Sweep a rotated square across the unit cell so every overlap type
    (triangle, trapezoid, pentagon by 1/2 lines, hexagon, vertex-in-cell
    triangle/quad/pentagon) occurs; validate each against the scalar clip."""
    cell = (-0.5, -0.5, 0.5, 0.5)
    for angle in (10.0, 45.0, 80.0):
        for ox in np.linspace(-1.5, 1.5, 7):
            for oy in np.linspace(-1.5, 1.5, 7):
                quad = _rot_square(ox, oy, 1.6, angle)
                qx = np.array([[p[0] for p in quad]])
                qy = np.array([[p[1] for p in quad]])
                got = quad_rect_overlap_area(
                    np, qx, qy,
                    np.array([cell[0]]), np.array([cell[1]]),
                    np.array([cell[2]]), np.array([cell[3]]),
                )[0]
                ref = _ref_quad_rect_area(quad, *cell)
                assert got == pytest.approx(ref, abs=1e-13)


def test_tangency_zero_slivers():
    """Tangent contacts (the reference's dedup rules 1&2, Source.cpp:478-493)
    must contribute exactly zero area, with no NaNs."""
    # square edge exactly on the cell edge
    quad = _rot_square(1.5, 0.0, 2.0, 0.0)  # touches x = 0.5
    qx = np.array([[p[0] for p in quad]])
    qy = np.array([[p[1] for p in quad]])
    got = quad_rect_overlap_area(
        np, qx, qy, np.array([-0.5]), np.array([-0.5]),
        np.array([0.5]), np.array([0.5]),
    )
    assert np.isfinite(got).all()
    assert got[0] == pytest.approx(0.0, abs=1e-15)

    # 45-degree square touching the cell at a single corner point
    quad = _rot_square(0.5 + SQRT2 / 2, 0.0, 1.0, 45.0)
    qx = np.array([[p[0] for p in quad]])
    qy = np.array([[p[1] for p in quad]])
    got = quad_rect_overlap_area(
        np, qx, qy, np.array([-0.5]), np.array([-0.5]),
        np.array([0.5]), np.array([0.5]),
    )
    assert got[0] == pytest.approx(0.0, abs=1e-15)


def test_jnp_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n = 256
    angles = rng.uniform(0, 90, n)
    qx = np.empty((n, 4))
    qy = np.empty((n, 4))
    for i in range(n):
        quad = _rot_square(
            rng.uniform(-2, 2), rng.uniform(-2, 2), rng.uniform(0.5, 3), angles[i]
        )
        qx[i] = [p[0] for p in quad]
        qy[i] = [p[1] for p in quad]
    lo_x = rng.uniform(-2, 1, n)
    lo_y = rng.uniform(-2, 1, n)
    hi_x = lo_x + rng.uniform(0.5, 2, n)
    hi_y = lo_y + rng.uniform(0.5, 2, n)
    ref = quad_rect_overlap_area(np, qx, qy, lo_x, lo_y, hi_x, hi_y)
    got = quad_rect_overlap_area(
        jnp,
        jnp.asarray(qx, jnp.float32), jnp.asarray(qy, jnp.float32),
        jnp.asarray(lo_x, jnp.float32), jnp.asarray(lo_y, jnp.float32),
        jnp.asarray(hi_x, jnp.float32), jnp.asarray(hi_y, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-6)
