"""Randomised oracle parity sweep: fuzz geometry knobs against the C++
reference across all three modes' supported envelopes.  Catches convention
drift that hand-picked configs miss (window clamps, isocenter fractions,
quadrant handling, odd ratios)."""

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

RNG = np.random.default_rng(123)
SRC = RNG.uniform(0.0, 1.0, (20, 20))


def _check(sr, dr, iso, ang, mode):
    ref, ref_iso = run_oracle(
        SRC, sr, dr, iso, ang, mode=1 if mode in ("exact", "compat") else 2
    )
    r = aa.area_average_interpolate(SRC, sr, dr, iso, ang, mode=mode)
    got = np.asarray(r.dst, dtype=np.float64)
    assert got.shape == ref.shape, (sr, dr, iso, ang, mode)
    err = np.abs(got - ref)
    tol = 1e-5 + 1e-5 * np.abs(ref)
    assert (err <= tol).all(), (
        f"{mode} sr={sr} dr={dr} iso={iso} ang={ang}: max {err.max():.2e}"
    )


def test_fuzz_fast_mode():
    rng = np.random.default_rng(0)
    for _ in range(6):
        sr = float(rng.uniform(0.5, 200.0))
        dr = float(rng.uniform(0.2, 1.5)) * sr  # down/near-unity ratios
        iso = (float(rng.uniform(0, 20)), float(rng.uniform(0, 20)))
        ang = float(rng.uniform(0, 360))
        _check(sr, dr, iso, ang, "fast")


def test_fuzz_exact_axis_aligned():
    rng = np.random.default_rng(1)
    for _ in range(6):
        sr = float(rng.uniform(0.5, 200.0))
        dr = float(rng.uniform(0.15, 2.5)) * sr
        iso = (float(rng.uniform(-5, 25)), float(rng.uniform(-5, 25)))
        ang = float(rng.choice([0.0, 90.0, 180.0, 270.0]))
        _check(sr, dr, iso, ang, "exact")


def test_fuzz_compat_rotated():
    rng = np.random.default_rng(2)
    for _ in range(5):
        sr = float(rng.uniform(0.5, 100.0))
        dr = float(rng.uniform(0.3, 1.2)) * sr
        iso = (float(rng.uniform(0, 20)), float(rng.uniform(0, 20)))
        ang = float(rng.uniform(0.5, 359.5))
        if abs(ang % 90.0) < 0.5 or abs(ang % 90.0) > 89.5:
            ang += 1.0  # keep a genuine residual rotation
        _check(sr, dr, iso, ang, "compat")


def test_fuzz_fast_upscale():
    rng = np.random.default_rng(3)
    for _ in range(4):
        sr = float(rng.uniform(1.0, 30.0))
        dr = float(rng.uniform(1.5, 4.0)) * sr  # upscales (scale 3..7)
        iso = (float(rng.uniform(0, 20)), float(rng.uniform(0, 20)))
        ang = float(rng.uniform(0, 360))
        _check(sr, dr, iso, ang, "fast")


def test_fuzz_compat_upscale():
    rng = np.random.default_rng(4)
    for _ in range(3):
        sr = float(rng.uniform(1.0, 30.0))
        dr = float(rng.uniform(1.5, 3.0)) * sr
        iso = (float(rng.uniform(0, 20)), float(rng.uniform(0, 20)))
        ang = float(rng.uniform(1.0, 89.0))
        _check(sr, dr, iso, ang, "compat")
