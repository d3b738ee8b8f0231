// Native weight-generation engine + CSV I/O for aainterp.
//
// TPU-native rebuild of the reference's C++ components (SURVEY.md §2): the
// geometry/area core (reference C7/C8/C10/C12, Source.cpp:962-1431) becomes
// a multithreaded exact ELL weight generator — Sutherland–Hodgman clipping +
// shoelace instead of the reference's 10-case closed-form taxonomy — and the
// CSV layer (reference C14/C15, Source.cpp:1437-1515) becomes a buffered
// reader/writer.  Used from Python via ctypes (aainterp/native.py) as the
// fast host path for very large grids, and as a third independent
// implementation cross-checking the vectorized clipper.
//
// Build: make -C native   (produces ../aainterp/_aainterp_native.so)

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Pt { double x, y; };

// Area of convex polygon `poly` clipped to the half-plane keep(d <= 0),
// d = sign * (coord - val).  Classic list-based Sutherland–Hodgman on a
// fixed buffer (max 8 vertices for quad-vs-box).
inline int clip_halfplane(const Pt* in, int n, Pt* out, int axis, double val,
                          double sign) {
    int m = 0;
    for (int i = 0; i < n; ++i) {
        const Pt& cur = in[i];
        const Pt& nxt = in[(i + 1) % n];
        double dc = sign * ((axis == 0 ? cur.x : cur.y) - val);
        double dn = sign * ((axis == 0 ? nxt.x : nxt.y) - val);
        bool cin = dc <= 0.0, nin = dn <= 0.0;
        if (cin) out[m++] = cur;
        if (cin != nin) {
            double t = dc / (dc - dn);
            out[m++] = {cur.x + t * (nxt.x - cur.x),
                        cur.y + t * (nxt.y - cur.y)};
        }
    }
    return m;
}

inline double quad_rect_area(const Pt quad[4], double lox, double loy,
                             double hix, double hiy) {
    Pt a[16], b[16];
    int n = 4;
    std::memcpy(a, quad, sizeof(Pt) * 4);
    n = clip_halfplane(a, n, b, 0, lox, -1.0); if (n < 3) return 0.0;
    n = clip_halfplane(b, n, a, 0, hix, +1.0); if (n < 3) return 0.0;
    n = clip_halfplane(a, n, b, 1, loy, -1.0); if (n < 3) return 0.0;
    n = clip_halfplane(b, n, a, 1, hiy, +1.0); if (n < 3) return 0.0;
    double area = 0.0;
    for (int i = 0; i < n; ++i) {
        const Pt& p = a[i];
        const Pt& q = a[(i + 1) % n];
        area += p.x * q.y - q.x * p.y;
    }
    return std::fabs(area) * 0.5;
}

}  // namespace

extern "C" {

// Exact/fast ELL weight generation over dst rows [0, Hd).
// Geometry parameters mirror aainterp.grids.GridSpec.linear_map.
// Outputs: base (Hd*Wd*2 int32, [jy0, jx0]), w (Hd*Wd*K*K float64,
// row-normalised when normalise != 0), sums (Hd*Wd float64 raw sums).
void aai_ell_weights(
    int Hd, int Wd, int K, int qH, int qW,
    double p00x, double p00y, double exx, double exy, double eyx, double eyy,
    double L, double cosv, double sinv, double scale,
    int mode /*0 exact, 1 fast*/, int normalise,
    int n_threads,
    int32_t* base, double* w, double* sums) {
    const double radius = L * (std::fabs(cosv) + std::fabs(sinv)) / 2.0;
    const double h = L / 2.0;
    const double extent = K * scale + L;
    const double sliver = 64.0 * 2.220446049250313e-16 * extent * extent;
    const int iscale = (int)scale;

    auto worker = [&](int y0, int y1) {
        std::vector<double> cell(K * K);
        for (int dy = y0; dy < y1; ++dy) {
            for (int dx = 0; dx < Wd; ++dx) {
                const double px = p00x + dx * exx + dy * eyx;
                const double py = p00y + dx * exy + dy * eyy;
                int jy0 = (int)std::floor((py - radius + 0.5) / scale - 1.0) + 1;
                int jx0 = (int)std::floor((px - radius + 0.5) / scale - 1.0) + 1;
                jy0 = std::min(std::max(jy0, 0), std::max(qH - K, 0));
                jx0 = std::min(std::max(jx0, 0), std::max(qW - K, 0));
                const size_t pix = (size_t)dy * Wd + dx;
                base[pix * 2 + 0] = jy0;
                base[pix * 2 + 1] = jx0;

                // quad in local coordinates (relative to (px, py))
                Pt quad[4];
                const double us[4] = {-h, h, h, -h};
                const double vs[4] = {-h, -h, h, h};
                for (int i = 0; i < 4; ++i) {
                    quad[i] = {us[i] * cosv + vs[i] * sinv,
                               -us[i] * sinv + vs[i] * cosv};
                }

                double total = 0.0;
                for (int a = 0; a < K; ++a) {
                    const int jy = jy0 + a;
                    const double ylo = jy * scale - 0.5 - py;
                    for (int b = 0; b < K; ++b) {
                        const int jx = jx0 + b;
                        double area = 0.0;
                        if (jy >= 0 && jy < qH && jx >= 0 && jx < qW) {
                            const double xlo = jx * scale - 0.5 - px;
                            if (mode == 0) {
                                area = quad_rect_area(quad, xlo, ylo,
                                                      xlo + scale, ylo + scale);
                                if (area <= sliver) area = 0.0;
                            } else {
                                // count replica centers inside the square
                                for (int my = 0; my < iscale; ++my) {
                                    for (int mx = 0; mx < iscale; ++mx) {
                                        const double cx = xlo + 0.5 + mx;
                                        const double cy = ylo + 0.5 + my;
                                        const double u = cx * cosv - cy * sinv;
                                        const double v = cx * sinv + cy * cosv;
                                        if (std::fabs(u) <= h + 1e-9 &&
                                            std::fabs(v) <= h + 1e-9)
                                            area += 1.0;
                                    }
                                }
                            }
                        }
                        cell[a * K + b] = area;
                        total += area;
                    }
                }
                sums[pix] = total;
                double* wp = w + pix * K * K;
                if (normalise) {
                    if (std::fabs(total) > 2.220446049250313e-16) {
                        const double inv = 1.0 / total;
                        for (int i = 0; i < K * K; ++i) wp[i] = cell[i] * inv;
                    } else {
                        std::fill(wp, wp + K * K, 0.0);
                    }
                } else {
                    std::copy(cell.begin(), cell.end(), wp);
                }
            }
        }
    };

    int nt = n_threads > 0 ? n_threads
                           : (int)std::thread::hardware_concurrency();
    nt = std::max(1, std::min(nt, Hd));
    if (nt == 1) {
        worker(0, Hd);
        return;
    }
    std::vector<std::thread> threads;
    const int rows = (Hd + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        const int y0 = t * rows, y1 = std::min(Hd, (t + 1) * rows);
        if (y0 < y1) threads.emplace_back(worker, y0, y1);
    }
    for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------
// Reference-compatibility (bug-for-bug) cell areas.
//
// Scalar transcription of aainterp/ops/compat.py (itself a faithful
// replica of Source.cpp:327-1431): 16 segment-intersection tests with
// DBL_EPSILON conventions, the tangent-contact edge filter, sort +
// tangency dedup rules, infinite-ray center inclusion, strict vertex-in,
// and the full type 0-9 getArea dispatch including the type-2 mixed-pair
// defect.  Operation order matches the numpy module expression-for-
// expression; the build uses -ffp-contract=off so doubles agree bit for
// bit (validated by tests/test_native.py::test_compat_areas_bitexact).
// ---------------------------------------------------------------------

namespace compat {

constexpr double kEps = 2.220446049250313e-16;  // DBL_EPSILON
const double kInf = std::numeric_limits<double>::infinity();

struct Seg { int typ; double r, s; };

// getIntersectionType (Source.cpp:986-1034) exactly as compat.py
inline Seg seg_intersection(double p1x, double p1y, double p2x, double p2y,
                            double q1x, double q1y, double q2x, double q2y) {
    const double den = (p2x - p1x) * (q2y - q1y) - (p2y - p1y) * (q2x - q1x);
    const double rn = (q1x - p1x) * (q2y - q1y) - (q1y - p1y) * (q2x - q1x);
    const double sn = (p2y - p1y) * (q1x - p1x) - (p2x - p1x) * (q1y - p1y);
    const bool par = std::fabs(den) <= kEps;
    const bool overlap = par && std::fabs(rn) <= kEps && std::fabs(sn) <= kEps;
    const double safe = par ? 1.0 : den;
    const double r = rn / safe;
    const double s = sn / safe;
    const bool in01 = (-kEps <= r) && (r <= 1.0 + kEps)
                      && (-kEps <= s) && (s <= 1.0 + kEps);
    const bool endpoint = std::fabs(r) <= kEps || std::fabs(r - 1.0) <= kEps
                          || std::fabs(s) <= kEps || std::fabs(s - 1.0) <= kEps;
    int typ;
    if (overlap) typ = 2;
    else if (par) typ = 1;
    else if (in01 && endpoint) typ = 4;
    else if (in01) typ = 3;
    else typ = 5;
    return {typ, r, s};
}

struct SideList {
    double v[4];
    bool valid[4];
    double sorted[4];
    int count;
};

inline void sort_by_value(double* v, bool* valid) {
    // 4-element sort ascending by value, carrying valid (values are
    // finite where valid, +inf otherwise, so ordering matches numpy)
    for (int i = 1; i < 4; ++i) {
        double tv = v[i]; bool tb = valid[i];
        int j = i - 1;
        while (j >= 0 && v[j] > tv) {
            v[j + 1] = v[j]; valid[j + 1] = valid[j]; --j;
        }
        v[j + 1] = tv; valid[j + 1] = tb;
    }
}

// One mod cell vs one dst quad: PixelState + getArea (compat.py
// compat_cell_state + compat_get_area, scalarised).
double cell_area(const double qvx[4], const double qvy[4],
                 double x0, double y0) {
    const double x1 = x0 + 1.0, y1 = y0 + 1.0;
    static const int edges[4][2] = {{0, 1}, {2, 3}, {0, 2}, {1, 3}};
    // sides i=0..3 -> xa (top), ya (left), yb (right), xb (bottom)
    const double sq[4][4] = {
        {x0, y0, x1, y0},
        {x0, y0, x0, y1},
        {x1, y0, x1, y1},
        {x0, y1, x1, y1},
    };

    double s_vals[4][4];
    int types[4][4];
    for (int e = 0; e < 4; ++e) {
        const double p1x = qvx[edges[e][0]], p1y = qvy[edges[e][0]];
        const double p2x = qvx[edges[e][1]], p2y = qvy[edges[e][1]];
        for (int i = 0; i < 4; ++i) {
            Seg g = seg_intersection(p1x, p1y, p2x, p2y,
                                     sq[i][0], sq[i][1], sq[i][2], sq[i][3]);
            types[e][i] = g.typ;
            s_vals[e][i] = g.s;
        }
    }

    // tangent-contact edge filter (Source.cpp:327-342)
    bool skip_edge[4];
    for (int e = 0; e < 4; ++e) {
        int c4 = 0, c3 = 0;
        for (int i = 0; i < 4; ++i) {
            c4 += types[e][i] == 4;
            c3 += types[e][i] == 3;
        }
        skip_edge[e] = (c4 == 1) && (c3 == 0);
    }

    // side lists keyed xa, ya, yb, xb (slot per edge), sorted
    SideList L[4];
    for (int i = 0; i < 4; ++i) {
        for (int e = 0; e < 4; ++e) {
            bool emit = (types[e][i] == 3 || types[e][i] == 4)
                        && !skip_edge[e];
            L[i].v[e] = emit ? s_vals[e][i] : kInf;
            L[i].valid[e] = emit;
        }
        sort_by_value(L[i].v, L[i].valid);
    }
    SideList& xa = L[0];
    SideList& ya = L[1];
    SideList& yb = L[2];
    SideList& xb = L[3];

    // dedup rules 1 & 2 (Source.cpp:498-564)
    auto exists_le = [](const SideList& s) {
        for (int e = 0; e < 4; ++e)
            if (s.valid[e] && s.v[e] <= kEps) return true;
        return false;
    };
    auto exists_ge = [](const SideList& s) {
        for (int e = 0; e < 4; ++e)
            if (s.valid[e] && 1.0 - s.v[e] <= kEps) return true;
        return false;
    };
    const bool xa_le = exists_le(xa), xb_le = exists_le(xb);
    const bool xa_ge = exists_ge(xa), xb_ge = exists_ge(xb);
    for (int e = 0; e < 4; ++e) {
        const double v = ya.v[e];
        if (v <= kEps) { if (!xa_le) ya.valid[e] = false; }
        else if (1.0 - v <= kEps) { if (!xb_le) ya.valid[e] = false; }
    }
    for (int e = 0; e < 4; ++e) {
        const double v = yb.v[e];
        if (v <= kEps) { if (!xa_ge) yb.valid[e] = false; }
        else if (1.0 - v <= kEps) { if (!xb_ge) yb.valid[e] = false; }
    }
    for (SideList* s : {&xa, &xb})
        for (int e = 0; e < 4; ++e) {
            const double v = s->v[e];
            if (!(v > kEps && 1.0 - v > kEps)) s->valid[e] = false;
        }

    // compact: invalid -> inf, sort, count
    for (SideList* s : {&xa, &ya, &yb, &xb}) {
        s->count = 0;
        for (int e = 0; e < 4; ++e) {
            s->sorted[e] = s->valid[e] ? s->v[e] : kInf;
            s->count += s->valid[e];
        }
        std::sort(s->sorted, s->sorted + 4);
    }

    // center inclusion: infinite axis ray cast, cycle v0,v1,v3,v2
    static const int cyc[4] = {0, 1, 3, 2};
    const double cx = (x0 + x1) / 2.0, cy = (y0 + y1) / 2.0;
    static const double rays[4][2] = {
        {0.0, -100.0}, {0.0, 100.0}, {-100.0, 0.0}, {100.0, 0.0}};
    bool center_in = true;
    for (int rr = 0; rr < 4; ++rr) {
        bool crossed = false;
        for (int k = 0; k < 4; ++k) {
            const int a = cyc[k], b = cyc[(k + 1) % 4];
            Seg g = seg_intersection(cx, cy, cx + rays[rr][0],
                                     cy + rays[rr][1],
                                     qvx[a], qvy[a], qvx[b], qvy[b]);
            if (g.typ >= 3 && -kEps < g.r && -kEps < g.s
                && g.s < 1.0 + kEps)
                crossed = true;
        }
        center_in = center_in && crossed;
    }

    // vertex-in-cell: strict with eps, LAST vertex wins
    bool ver = false;
    double vx = -1.0, vy = -1.0;
    for (int i = 0; i < 4; ++i) {
        const double px = qvx[i], py = qvy[i];
        if (x0 + kEps < px && px < x1 - kEps
            && y0 + kEps < py && py < y1 - kEps) {
            ver = true;
            vx = px - x0;
            vy = py - y0;
        }
    }

    // ---- getArea dispatch (Source.cpp:1035-1431) ----
    const int nxa = xa.count, nxb = xb.count, nya = ya.count, nyb = yb.count;
    const int xc = nxa + nxb, yc = nya + nyb;
    auto first = [](const SideList& s, int cnt) {
        return cnt > 0 ? (std::isfinite(s.sorted[0]) ? s.sorted[0] : 0.0)
                       : 0.0;
    };
    const double xa0 = first(xa, nxa), xa1 = nxa > 1 ? xa.sorted[1] : 0.0;
    const double xb0 = first(xb, nxb), xb1 = nxb > 1 ? xb.sorted[1] : 0.0;
    const double ya0 = first(ya, nya), ya1 = nya > 1 ? ya.sorted[1] : 0.0;
    const double yb0 = first(yb, nyb), yb1 = nyb > 1 ? yb.sorted[1] : 0.0;

    const double fallback = center_in ? 1.0 : 0.0;

    if (ver) {
        const bool any_two = nxa == 2 || nxb == 2 || nya == 2 || nyb == 2;
        const bool x20_or_02 = ((xc == 2) && (yc == 0))
                               || ((xc == 0) && (yc == 2));
        if (x20_or_02 && any_two) {
            // type 7: map order xa < xb < ya < yb, LAST with 2 wins
            double base7 = 0.0, height7 = 0.0;
            if (nxa == 2) { base7 = std::fabs(xa0 - xa1); height7 = vy; }
            if (nxb == 2) { base7 = std::fabs(xb0 - xb1); height7 = 1.0 - vy; }
            if (nya == 2) { base7 = std::fabs(ya0 - ya1); height7 = vx; }
            if (nyb == 2) { base7 = std::fabs(yb0 - yb1); height7 = 1.0 - vx; }
            return 0.5 * base7 * height7;
        }
        if (x20_or_02) {
            // type 9: pentagon, 4 subcases
            if (nxa == 1 && nxb == 1) {
                if (std::fmax(xa0, xb0) <= vx)
                    return 0.5 * xa0 * vy + 0.5 * vx + 0.5 * xb0 * (1.0 - vy);
                return 0.5 * (1.0 - xa0) * vy + 0.5 * (1.0 - vx)
                       + 0.5 * (1.0 - xb0) * (1.0 - vy);
            }
            if (std::fmax(ya0, yb0) <= vy)
                return 0.5 * ya0 * vx + 0.5 * vy + 0.5 * yb0 * (1.0 - vx);
            return 0.5 * (1.0 - ya0) * vx + 0.5 * (1.0 - vy)
                   + 0.5 * (1.0 - yb0) * (1.0 - vx);
        }
        if (xc == 1 && yc == 1) {
            // type 8: quadrangle with dst vertex
            if (nxa == 1 && nya == 1) return 0.5 * xa0 * vy + 0.5 * ya0 * vx;
            if (nxa == 1 && nyb == 1)
                return 0.5 * (1.0 - xa0) * vy + 0.5 * yb0 * (1.0 - vx);
            if (nxb == 1 && nya == 1)
                return 0.5 * xb0 * (1.0 - vy) + 0.5 * (1.0 - ya0) * vx;
            return 0.5 * (1.0 - xb0) * (1.0 - vy)
                   + 0.5 * (1.0 - yb0) * (1.0 - vx);
        }
        return fallback;
    }

    if (xc == 0 && yc == 0) return center_in ? 1.0 : 0.0;
    if (xc == 1 && yc == 1) {
        // type 2 / type 4, faithfully including the mixed-pair defect
        const double t2x = nxa != 0 ? xa0 : 1.0 - xb0;
        const double t2y = nya != 0 ? ya0 : 1.0 - yb0;
        const double type2 = 0.5 * t2x * t2y;
        return center_in ? 1.0 - type2 : type2;
    }
    if ((xc == 2 && yc == 0) || (xc == 0 && yc == 2)) {
        // type 3: trapezoid with center disambiguation
        const bool has_x = nxa != 0 && nxb != 0;
        const bool has_y = nya != 0 && nyb != 0;
        if (has_x || has_y) {
            const double s1 = has_x ? xa0 : ya0;
            const double s2 = has_x ? xb0 : yb0;
            const double trap = 0.5 * (s1 + s2);
            return center_in ? std::fmax(trap, 1.0 - trap)
                             : std::fmin(trap, 1.0 - trap);
        }
        return center_in ? 1.0 : 0.0;
    }
    if ((xc == 3 && yc == 1) || (xc == 1 && yc == 3)) {
        // type 5: 1 - (trapezoid + triangle), 8 subcases
        double sb, lb, ba, he;
        if (xc == 1 && yc == 3) {
            if (nxa == 0 && nya == 1) {
                sb = ya0; lb = std::fmin(yb0, yb1);
                ba = 1.0 - xb0; he = 1.0 - std::fmax(yb0, yb1);
            } else if (nxa == 0) {
                sb = std::fmin(ya0, ya1); lb = yb0;
                ba = xb0; he = 1.0 - std::fmax(ya0, ya1);
            } else if (nya == 1) {
                sb = 1.0 - ya0; lb = 1.0 - std::fmax(yb0, yb1);
                ba = 1.0 - xa0; he = std::fmin(yb0, yb1);
            } else {
                sb = 1.0 - std::fmax(ya0, ya1); lb = 1.0 - yb0;
                ba = xa0; he = std::fmin(ya0, ya1);
            }
        } else {
            if (nya == 0 && nxa == 1) {
                sb = xa0; lb = std::fmin(xb0, xb1);
                ba = 1.0 - std::fmax(xb0, xb1); he = 1.0 - yb0;
            } else if (nya == 0) {
                sb = xb0; lb = std::fmin(xa0, xa1);
                ba = 1.0 - std::fmax(xa0, xa1); he = yb0;
            } else if (nxa == 1) {
                sb = 1.0 - xa0; lb = 1.0 - std::fmax(xb0, xb1);
                ba = std::fmin(xb0, xb1); he = 1.0 - ya0;
            } else {
                sb = 1.0 - xb0; lb = 1.0 - std::fmax(xa0, xa1);
                ba = std::fmin(xa0, xa1); he = ya0;
            }
        }
        return 1.0 - 0.5 * (sb + lb) - 0.5 * ba * he;
    }
    if (xc == 2 && yc == 2) {
        // type 6: hexagon = 1 - 2 corner triangles
        double t6 = 0.0;
        if (nxa == 2)
            t6 = 0.5 * std::fmin(xa0, xa1) * ya0
                 + 0.5 * (1.0 - std::fmax(xa0, xa1)) * yb0;
        else if (nxb == 2)
            t6 = 0.5 * std::fmin(xb0, xb1) * (1.0 - ya0)
                 + 0.5 * (1.0 - std::fmax(xb0, xb1)) * (1.0 - yb0);
        else if (nya == 2)
            t6 = 0.5 * xa0 * std::fmin(ya0, ya1)
                 + 0.5 * xb0 * (1.0 - std::fmax(ya0, ya1));
        else if (nyb == 2)
            t6 = 0.5 * (1.0 - xa0) * std::fmin(yb0, yb1)
                 + 0.5 * (1.0 - xb0) * (1.0 - std::fmax(yb0, yb1));
        return 1.0 - t6;
    }
    if (xc == 0 && yc == 1) return center_in ? 1.0 : 0.0;
    return fallback;
}

}  // namespace compat

// Per-cell compat areas over a pixel range.  qvx/qvy: (n_pix, 4) dst quad
// vertices (reference corner construction, done host-side in numpy to
// preserve its exact fp order); mx0/my0: (n_pix,) clamped window bases.
// areas out: (n_pix, Km, Km); cells outside [0, modW-1]x[0, modH-1] are 0.
void aai_compat_cell_areas(
    int64_t n_pix, int Km, int modH, int modW,
    const double* qvx, const double* qvy,
    const int64_t* mx0, const int64_t* my0,
    int n_threads, double* areas) {
    auto worker = [&](int64_t lo, int64_t hi) {
        for (int64_t pix = lo; pix < hi; ++pix) {
            const double* vx = qvx + pix * 4;
            const double* vy = qvy + pix * 4;
            const int64_t bx = mx0[pix], by = my0[pix];
            double* out = areas + pix * Km * Km;
            for (int iy = 0; iy < Km; ++iy) {
                const int64_t my = by + iy;
                const bool y_ok = my >= 0 && my <= modH - 1;
                for (int ix = 0; ix < Km; ++ix) {
                    const int64_t mx = bx + ix;
                    double a = 0.0;
                    if (y_ok && mx >= 0 && mx <= modW - 1)
                        a = compat::cell_area(vx, vy, (double)mx - 0.5,
                                              (double)my - 0.5);
                    out[iy * Km + ix] = a;
                }
            }
        }
    };
    int nt = n_threads > 0 ? n_threads
                           : (int)std::thread::hardware_concurrency();
    nt = std::max(1, (int)std::min<int64_t>(nt, n_pix));
    if (nt == 1) {
        worker(0, n_pix);
    } else {
        std::vector<std::thread> threads;
        const int64_t chunk = (n_pix + nt - 1) / nt;
        for (int t = 0; t < nt; ++t) {
            const int64_t lo = t * chunk, hi = std::min(n_pix, lo + chunk);
            if (lo < hi) threads.emplace_back(worker, lo, hi);
        }
        for (auto& th : threads) th.join();
    }
}

// Buffered CSV image reader.  Returns 0 on success; caller passes a buffer
// of capacity cap_rows*cap_cols and receives the actual (h, w).  Invalid
// tokens are skipped (Source.cpp:1457-1459 semantics); short rows 0-padded.
int aai_csv_read(const char* path, double* buf, int cap_rows, int cap_cols,
                 int* out_h, int* out_w) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::string text(size, '\0');
    if (std::fread(&text[0], 1, size, f) != (size_t)size) {
        std::fclose(f);
        return -2;
    }
    std::fclose(f);

    int h = 0, w = 0, col = 0;
    const char* p = text.c_str();
    const char* end = p + size;
    bool row_has_data = false;
    while (p < end) {
        if (*p == '\n' || *p == '\r') {
            if (row_has_data) {
                ++h;
                if (col > w) w = col;  // col == number of values emitted
            }
            col = 0;
            row_has_data = false;
            ++p;
            continue;
        }
        if (*p == ',') { ++p; continue; }
        char* q;
        double v = std::strtod(p, &q);
        if (q == p) { ++p; continue; }  // skip invalid token char-by-char
        // valid tokens are compacted left (Source.cpp:1449-1470 split()
        // only emplaces parseable values)
        if (h < cap_rows && col < cap_cols)
            buf[(size_t)h * cap_cols + col] = v;
        ++col;
        row_has_data = true;
        p = q;
    }
    if (row_has_data) { ++h; if (col > w) w = col; }
    *out_h = h;
    *out_w = w;
    return (h <= cap_rows && w <= cap_cols) ? 0 : 1;  // 1 = buffer too small
}

int aai_csv_write(const char* path, const double* data, int h, int w,
                  int sig_digits) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    char fmt[16];
    std::snprintf(fmt, sizeof(fmt), "%%.%dg", sig_digits > 0 ? sig_digits : 17);
    std::string line;
    char num[64];
    for (int i = 0; i < h; ++i) {
        line.clear();
        for (int j = 0; j < w; ++j) {
            std::snprintf(num, sizeof(num), fmt, data[(size_t)i * w + j]);
            line += num;
            if (j + 1 < w) line += ',';
        }
        line += '\n';
        if (std::fwrite(line.data(), 1, line.size(), f) != line.size()) {
            std::fclose(f);
            return -2;
        }
    }
    std::fclose(f);
    return 0;
}

}  // extern "C"
