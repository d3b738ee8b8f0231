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
