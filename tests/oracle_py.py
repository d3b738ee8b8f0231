"""Independent brute-force Python oracle with *true* overlap areas.

Follows the reference's pipeline structure literally (Source.cpp:135-221,
411-579): materialises the scale-replicated, quadrant-rotated modSrc image
and loops over unit mod cells per dst pixel — but computes each overlap area
with an independent scalar Sutherland–Hodgman clip instead of the reference's
10-case closed-form taxonomy (whose type-2/type-4 formulas are wrong for
mixed side pairs, see tests/test_vs_oracle.py::test_reference_type2_bug_documented).

Because it replicates (it does materialise modSrc), comparing it against the
production path also proves the replication-equivalence identity
(SURVEY.md §7 hard part 2: clipping original cells of side `scale` ==
summing clipped unit replica cells).

Scalar and slow on purpose — use small images only.
"""

import math

import numpy as np


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


def quad_rect_area(quad, lo_x, lo_y, hi_x, hi_y):
    poly = list(quad)
    for axis, val, sign in (
        (0, lo_x, 1.0), (0, hi_x, -1.0), (1, lo_y, 1.0), (1, hi_y, -1.0)
    ):
        def inside(p, axis=axis, val=val, sign=sign):
            return sign * (p[axis] - val) >= 0

        def intersect(p, q, axis=axis, val=val):
            t = (val - p[axis]) / (q[axis] - p[axis])
            return (p[0] + t * (q[0] - p[0]), p[1] + t * (q[1] - p[1]))

        poly = _clip_poly_halfplane(poly, inside, intersect)
        if len(poly) < 3:
            return 0.0
    area = 0.0
    for i in range(len(poly)):
        x0, y0 = poly[i]
        x1, y1 = poly[(i + 1) % len(poly)]
        area += x0 * y1 - x1 * y0
    return abs(area) / 2.0


def interpolate_bruteforce(src, src_resolution, dst_resolution, src_isocenter,
                           rotation_angle, mode="exact"):
    """Full-pipeline scalar reference.  Returns (dst, dst_isocenter)."""
    src = np.asarray(src, dtype=np.float64)
    H, W = src.shape
    DBL_EPSILON = 2.220446049250313e-16

    scale = int(dst_resolution / src_resolution * math.sqrt(2.0) + 1
                + DBL_EPSILON)
    angle = float(rotation_angle)
    while angle < 0:
        angle += 360.0
    while angle >= 360.0:
        angle -= 360.0
    quadrant = min(int(angle // 90.0), 3)
    angle -= 90.0 * quadrant
    c = math.cos(math.radians(angle))
    s = math.sin(math.radians(angle))

    # materialise modSrc: quadrant-rotate then replicate scale x scale
    q = np.rot90(src, k=-quadrant)
    mod = np.kron(q, np.ones((scale, scale)))
    modH, modW = mod.shape

    icx = src_isocenter[0] * scale + (scale - 1) / 2.0
    icy = src_isocenter[1] * scale + (scale - 1) / 2.0
    expansion = dst_resolution / (src_resolution * scale)
    L = (src_resolution * scale) / dst_resolution
    dstW = int(math.floor((modW * abs(c) + modH * abs(s)) * expansion + 0.5))
    dstH = int(math.floor((modW * abs(s) + modH * abs(c)) * expansion + 0.5))
    dicx = (icx * c + (modH - icy) * s) * expansion
    dicy = (icx * s + icy * c) * expansion
    fx, fy = dicx - int(dicx), dicy - int(dicy)

    ox = oy = 0.0
    for cxp, cyp in ((0, 0), (modW - 1, 0), (0, modH - 1), (modW - 1, modH - 1)):
        ox = min(ox, (cxp - icx) * c - (cyp - icy) * s + icx)
        oy = min(oy, (cxp - icx) * s + (cyp - icy) * c + icy)

    dst = np.zeros((dstH, dstW))
    h = L / 2.0
    corners_uv = [(-h, -h), (h, -h), (h, h), (-h, h)]
    for dy in range(dstH):
        for dx in range(dstW):
            ax = (dx + fx) * L - icx + ox
            ay = (dy + fy) * L - icy + oy
            px = ax * c + ay * s + icx
            py = -ax * s + ay * c + icy
            quad = [(px + u * c + v * s, py - u * s + v * c)
                    for u, v in corners_uv]
            x0 = max(0, int(math.floor(px - L * math.sqrt(2) / 2 - 1)))
            x1 = min(int(math.ceil(px + L * math.sqrt(2) / 2 + 1)), modW - 1)
            y0 = max(0, int(math.floor(py - L * math.sqrt(2) / 2 - 1)))
            y1 = min(int(math.ceil(py + L * math.sqrt(2) / 2 + 1)), modH - 1)
            num = den = 0.0
            for my in range(y0, y1 + 1):
                for mx in range(x0, x1 + 1):
                    if mode == "exact":
                        a = quad_rect_area(quad, mx - 0.5, my - 0.5,
                                           mx + 0.5, my + 0.5)
                    else:
                        du, dv = mx - px, my - py
                        u = du * c - dv * s
                        v = du * s + dv * c
                        a = 1.0 if (abs(u) <= h + 1e-9 and abs(v) <= h + 1e-9) \
                            else 0.0
                    num += a * mod[my, mx]
                    den += a
            dst[dy, dx] = num / den if abs(den) > 1e-9 else 0.0
    return dst, (int(dicx), int(dicy))
