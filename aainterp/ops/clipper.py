"""Exact quad∩cell overlap areas, branch-free and fully elementwise.

This single routine replaces the reference's entire overlap-area engine:
  - getIntersectionPoint (Source.cpp:962-985)
  - getIntersectionType (Source.cpp:986-1034)
  - struct PixelState + the 16-segment-test state machine (Source.cpp:914-960,
    432-570)
  - the 10-type closed-form polygon taxonomy getArea (Source.cpp:1035-1431)
  - the tangency dedup rules 1 & 2 (Source.cpp:478-564)

Algorithm: *clamp-form Sutherland–Hodgman* for axis-aligned boxes, as used in
exact-coverage rasterisers.  Clipping a closed chain against the half-plane
pair {u >= lo, u <= hi} is done by (a) clamping the u-coordinate of every
vertex into [lo, hi] and (b) inserting the true line intersections of every
crossing edge, in order along the edge.  Correctness rests on the line
integral ∮x dy being path-independent along a fixed clip line, so the
clamped excursions outside the box contribute exactly like the straight
connection between their entry/exit intersections.  Tangencies produce
zero-length edges — no case analysis, the reference's 10-type table survives
only as our unit-test taxonomy (tests/test_clipper.py).

Everything is elementwise over an arbitrary batch shape with *static* vertex
counts (4 -> 12 -> 36), so the same code runs under numpy (host float64
weight-gen), jax.numpy (jit/vmap fused weight-gen) and inside Pallas kernels
(pure VPU ops, no gathers).

Numerical note: callers should pass coordinates *relative to the dst-pixel
center* so float32 on-device use keeps full precision (magnitudes ~ the dst
side length, not the image extent).
"""

from __future__ import annotations

import numpy as np


def _interleave3(xp, a, b, c):
    """Stack three (..., N) arrays into (..., 3N) as a0,b0,c0,a1,b1,c1,..."""
    out = xp.stack([a, b, c], axis=-1)
    return out.reshape(a.shape[:-1] + (3 * a.shape[-1],))


def _clamp_pass(xp, u, w, lo, hi):
    """Clip the closed chain (u, w) against lo <= u <= hi (clamp form).

    u, w : (..., N) — u is the coordinate being clipped, w its partner.
    lo, hi : broadcastable to (..., 1).
    Returns (u', w') with N' = 3N vertices.
    """
    u_n = xp.roll(u, -1, axis=-1)
    w_n = xp.roll(w, -1, axis=-1)

    du = u_n - u
    safe = xp.where(du != 0.0, du, 1.0)

    cross_lo = (u < lo) != (u_n < lo)
    cross_hi = (u > hi) != (u_n > hi)
    t_lo = xp.where(cross_lo, (lo - u) / safe, 2.0)
    t_hi = xp.where(cross_hi, (hi - u) / safe, 2.0)

    t1 = xp.minimum(t_lo, t_hi)
    t2 = xp.maximum(t_lo, t_hi)
    u1 = xp.where(t_lo <= t_hi, lo + xp.zeros_like(u), hi + xp.zeros_like(u))
    u2 = xp.where(t_lo <= t_hi, hi + xp.zeros_like(u), lo + xp.zeros_like(u))

    uc = xp.clip(u, lo, hi)
    has1 = t1 <= 1.0
    has2 = t2 <= 1.0

    s1_u = xp.where(has1, u1, uc)
    s1_w = xp.where(has1, w + t1 * (w_n - w), w)
    s2_u = xp.where(has2, u2, s1_u)
    s2_w = xp.where(has2, w + t2 * (w_n - w), s1_w)

    return _interleave3(xp, uc, s1_u, s2_u), _interleave3(xp, w, s1_w, s2_w)


def _shoelace(xp, x, y):
    x_n = xp.roll(x, -1, axis=-1)
    y_n = xp.roll(y, -1, axis=-1)
    return 0.5 * xp.abs(xp.sum(x * y_n - x_n * y, axis=-1))


def quad_rect_overlap_area(xp, quad_x, quad_y, lo_x, lo_y, hi_x, hi_y):
    """Area of (convex quad) ∩ (axis-aligned rectangle), batched.

    quad_x, quad_y : (..., 4) quad vertices in boundary order
    lo_x, lo_y, hi_x, hi_y : (...,) rectangle bounds
    Returns (...,) areas.  ``xp`` is numpy or jax.numpy.
    """
    vx, vy = _clamp_pass(
        xp, quad_x, quad_y, lo_x[..., None], hi_x[..., None]
    )  # clip in x -> 12 vertices
    vy, vx = _clamp_pass(
        xp, vy, vx, lo_y[..., None], hi_y[..., None]
    )  # clip in y -> 36 vertices
    return _shoelace(xp, vx, vy)


def quad_vertices(xp, px, py, dst_side, cos_v, sin_v):
    """Corners of the rotated dst pixel centered at (px, py).

    The dst pixel is a square of side ``dst_side`` rotated by the *inverse*
    residual rotation R_inv = [[c, s], [-s, c]] — identical (in exact
    arithmetic) to the corners the reference builds by intersecting its edge
    lines (Source.cpp:229-305, 419-422).  Returned in boundary order
    [v0, v1, v3, v2], the clockwise order of Source.cpp:377.

    px, py : (...,) center positions; returns (..., 4) x and y.
    """
    h = dst_side / 2.0
    us = xp.asarray([-h, h, h, -h], dtype=px.dtype)
    vs = xp.asarray([-h, -h, h, h], dtype=px.dtype)
    qx = px[..., None] + us * cos_v + vs * sin_v
    qy = py[..., None] - us * sin_v + vs * cos_v
    return qx, qy
