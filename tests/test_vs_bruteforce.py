"""Parity vs the independent true-geometry Python oracle (tests/oracle_py.py).

This covers what the C++ oracle cannot: exact mode under true rotation
(where the reference's own area formulas are wrong — see
test_vs_oracle.py::test_reference_type2_bug_documented).  The brute-force
oracle materialises the replicated modSrc and clips unit replica cells, so
agreement here also proves the replication-equivalence identity
(SURVEY.md §7 hard part 2)."""

import numpy as np
import pytest

import aainterp as aa
from oracle_py import interpolate_bruteforce

RNG = np.random.default_rng(3)
SRC = RNG.uniform(0.0, 1.0, (16, 16))


def _assert_match(src, sr, dr, iso, ang, mode, tol=2e-6):
    ref, ref_iso = interpolate_bruteforce(src, sr, dr, iso, ang, mode=mode)
    r = aa.area_average_interpolate(src, sr, dr, iso, ang, mode=mode)
    got = np.asarray(r.dst, dtype=np.float64)
    assert got.shape == ref.shape
    assert r.dst_isocenter == ref_iso
    np.testing.assert_allclose(got, ref, atol=tol)


def test_exact_rotated_30():
    _assert_match(SRC, 1.0, 0.5, (7.5, 8.5), 30.0, "exact")


def test_exact_rotated_scale2():
    # scale=2: replication equivalence under rotation
    _assert_match(SRC, 1.0, 1.0, (7.5, 8.5), 30.0, "exact")


def test_exact_rotated_small_angle():
    _assert_match(SRC, 150.0, 60.0, (7.0, 8.0), 1.5, "exact")


def test_exact_rotated_steep_angle():
    _assert_match(SRC, 1.0, 0.5, (7.5, 8.5), 75.0, "exact")


def test_exact_rotated_quadrant3():
    _assert_match(SRC, 1.0, 0.5, (7.5, 8.5), 300.0, "exact")


def test_exact_upscale_rotated():
    _assert_match(SRC[:8, :8], 25.4, 72.0, (3.0, 4.0), 10.0, "exact")


def test_fast_rotated():
    _assert_match(SRC, 1.0, 0.5, (7.5, 8.5), 30.0, "fast")


def test_conservation_under_rotation():
    """Total flux conservation: interior source cells (fully inside the
    rotated dst footprint) contribute total unnormalised weight equal to
    their cell area.  The C++ reference VIOLATES this under rotation; we
    must not."""
    from aainterp.grids import make_grid_spec
    from aainterp.ops.weights import ell_weights

    spec = make_grid_spec((16, 16), 1.0, 0.5, (7.5, 8.5), 30.0)
    Hd, Wd = spec.dst_shape
    base, w, _ = ell_weights(spec, normalise=False)
    qH, qW = spec.qrot_shape
    K = spec.window_cells
    cell_total = np.zeros((qH, qW))
    for a in range(K):
        for b in range(K):
            jy = np.clip(base[..., 0] + a, 0, qH - 1)
            jx = np.clip(base[..., 1] + b, 0, qW - 1)
            np.add.at(cell_total, (jy, jx), w[..., a, b])
    s = spec.scale
    # interior cells: fully covered by the dst footprint (away from edges)
    interior = cell_total[4:-4, 4:-4]
    np.testing.assert_allclose(interior, float(s * s), atol=1e-9)
