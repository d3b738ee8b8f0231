"""Parity vs the compiled C++ reference (the oracle, SURVEY.md §4).

Tolerance: 1e-5 absolute + 1e-5 relative (the BASELINE.md target), which
also absorbs the oracle's 6-significant-digit CSV output quantisation
(Source.cpp:1508) and our float32 apply.

Scope notes:
  * exact mode, axis-aligned (any scale/quadrant): full parity expected.
  * fast mode, ALL angles: full parity expected (the fast mode has no area
    formulas to get wrong).
  * exact mode with true rotation: the REFERENCE is wrong — its type-2
    triangle formula (Source.cpp:1055-1062) mis-handles mixed side pairs
    (intersections on (ya,xb) or (xa,yb)), returning 0.5*(1-xb)*ya instead of
    0.5*xb*(1-ya) etc.  test_reference_type2_bug_documented pins down a
    minimal repro proving the divergence is the reference's, not ours (our
    clipper matches an independent scalar Sutherland–Hodgman everywhere, and
    satisfies conservation, which the reference violates).  Rotated-exact
    parity is therefore checked against tests/oracle_py.py instead (see
    test_vs_bruteforce.py).
"""

import math

import numpy as np
import pytest

import aainterp as aa

try:
    from oracle.runner import oracle_available, run_oracle
except ImportError:  # pragma: no cover
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from oracle.runner import oracle_available, run_oracle

pytestmark = pytest.mark.skipif(
    not oracle_available(), reason="reference Source.cpp not available"
)

RNG = np.random.default_rng(7)
SRC = RNG.uniform(0.0, 1.0, (24, 24))


def _assert_parity(src, sr, dr, iso, ang, mode, tol_abs=1e-5, tol_rel=1e-5):
    ref, ref_iso = run_oracle(
        src, sr, dr, iso, ang, mode=1 if mode in ("exact", "compat") else 2
    )
    r = aa.area_average_interpolate(src, sr, dr, iso, ang, mode=mode)
    got = np.asarray(r.dst, dtype=np.float64)
    assert got.shape == ref.shape
    assert r.dst_isocenter == (int(ref_iso[0]), int(ref_iso[1]))
    err = np.abs(got - ref)
    tol = tol_abs + tol_rel * np.abs(ref)
    assert (err <= tol).all(), (
        f"max err {err.max():.3e} at {np.unravel_index(err.argmax(), err.shape)}"
    )


# ---- exact mode, axis-aligned ----

def test_exact_integer_downscale():
    _assert_parity(SRC, 2.0, 1.0, (4.0, 4.0), 0.0, "exact")


def test_exact_arbitrary_ratio():
    _assert_parity(SRC, 150.0, 25.4, (11.0, 13.0), 0.0, "exact")


def test_exact_quadrant_rotations():
    # includes the reference's unmapped-isocenter quirk for angles >= 90
    for ang in (90.0, 180.0, 270.0):
        _assert_parity(SRC, 150.0, 25.4, (11.0, 13.0), ang, "exact")


def test_exact_upscale_replication():
    # scale > 1 path (replication semantics without materialising modSrc)
    _assert_parity(SRC[:12, :12], 25.4, 72.0, (5.0, 6.0), 0.0, "exact")


# ---- fast mode, all angles ----

def test_fast_integer_downscale():
    _assert_parity(SRC, 2.0, 1.0, (4.0, 4.0), 0.0, "fast")


def test_fast_default_film_config():
    # the reference's shipped defaults: 150 -> 25.4 dpi at 1.5 degrees, mode 2
    # (Source.cpp:1528-1534)
    _assert_parity(SRC, 150.0, 25.4, (11.0, 13.0), 1.5, "fast")


def test_fast_rotation_30deg():
    _assert_parity(SRC, 1.0, 1.0, (11.5, 12.5), 30.0, "fast")


def test_fast_rotation_other_quadrants():
    _assert_parity(SRC, 1.0, 1.0, (11.5, 12.5), 117.0, "fast")
    _assert_parity(SRC, 150.0, 25.4, (11.0, 13.0), 271.5, "fast")


def test_fast_upscale_rotated():
    _assert_parity(SRC[:12, :12], 25.4, 72.0, (5.0, 6.0), 10.0, "fast")


# ---- the reference's exact-mode rotation bug, pinned down ----

def test_reference_type2_bug_documented():
    """Minimal repro of the reference's type-2 mis-classification.

    Config: 24x24, srcRes=1, dstRes=0.5, iso (11.5, 12.5), 30 deg, exact.
    At dst pixel (8, 0), source cell (18, 1), one quad edge clips a corner
    triangle with intersections on sides ya (left, s=0.947) and xb (bottom,
    s=0.031).  True area (independent scalar clip) = 0.5*xb*(1-ya) ~ 0.0008;
    the reference computes 0.5*(1-xb)*ya ~ 0.459 (Source.cpp:1055-1062 picks
    x = 1-xb, y = ya regardless of which corner the pair encloses).

    This asserts (a) our weight equals the true area, and (b) the oracle's
    output at that pixel implies the wrong area — i.e. the rotated-exact
    divergence is a reference defect, not ours.  If the assertion on (b)
    ever fails, the reference was fixed and rotated-exact parity tests
    should be added.
    """
    from aainterp.grids import make_grid_spec
    from aainterp.ops.weights import ell_weights
    from oracle_py import quad_rect_area

    spec = make_grid_spec((24, 24), 1.0, 0.5, (11.5, 12.5), 30.0)
    base, w, sums = ell_weights(spec, dy_slice=(8, 9), normalise=False)
    jy0, jx0 = base[0, 0]
    a, b = 18 - jy0, 1 - jx0
    p = spec.dst_center(0, 8)
    c, s = spec.cos, spec.sin
    h = spec.dst_side / 2
    quad = [(p[0] + u * c + v * s, p[1] - u * s + v * c)
            for u, v in ((-h, -h), (h, -h), (h, h), (-h, h))]
    true_area = quad_rect_area(quad, 0.5, 17.5, 1.5, 18.5)
    assert w[0, 0, a, b] == pytest.approx(true_area, abs=1e-9)
    assert true_area < 0.001  # it IS a sliver triangle

    ref, _ = run_oracle(SRC, 1.0, 0.5, (11.5, 12.5), 30.0, mode=1)
    r = aa.area_average_interpolate(SRC, 1.0, 0.5, (11.5, 12.5), 30.0)
    # the oracle disagrees with true-area interpolation at this pixel by far
    # more than any numerical tolerance
    assert abs(ref[8, 0] - float(r.dst[8, 0])) > 1e-3


# ---- reference-compat exact mode: full parity under rotation ----

@pytest.mark.parametrize("sr,dr,iso,ang", [
    (1.0, 0.5, (11.5, 12.5), 30.0),    # exact-tangency angle, scale 1
    (1.0, 1.0, (11.5, 12.5), 30.0),    # scale 2
    (150.0, 25.4, (11.0, 13.0), 1.5),  # the shipped film config
    (1.0, 1.0, (11.5, 12.5), 117.0),   # quadrant 1
    (25.4, 72.0, (11.0, 13.0), 10.0),  # upscale (scale 5)
    (1.0, 0.5, (11.5, 12.5), 290.5),   # quadrant 3, >=45 residual branch
])
def test_compat_mode_full_rotated_parity(sr, dr, iso, ang):
    """mode='compat' reproduces the reference's exact mode bug-for-bug under
    rotation (reference-exact corner fp ordering + the type-2 defect)."""
    _assert_parity(SRC, sr, dr, iso, ang, "compat")
