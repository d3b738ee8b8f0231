"""Oracle parity at the BASELINE config sizes (VERDICT r1 item 4).

The small-grid suite (test_vs_oracle.py, 24x24) exercises every geometric
branch; this module re-validates at the sizes the baseline configs name,
where window clamps and edge paths cover thousands of boundary cells:

  * config 1 verbatim: 512x512 grayscale, 2x integer downscale, exact +
    fast modes, centre isocenter (Source.cpp:1471-1515 I/O + full pipeline)
  * compat rotated parity at 256x256 / 30 deg (the bug-for-bug replica of
    the reference's exact mode, Source.cpp:1055-1062 defect included)

Slower than the unit suite (the scalar C++ oracle takes seconds per run);
still inside the CI budget (~40 s total on CPU).
"""

import os

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

RNG = np.random.default_rng(512)


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
        f"max err {err.max():.3e} at "
        f"{np.unravel_index(err.argmax(), err.shape)}"
    )


SRC512 = RNG.uniform(0.0, 1.0, (512, 512))


def test_config1_512_exact_downscale():
    """BASELINE config 1 verbatim: 512x512, 2x integer downscale, exact."""
    _assert_parity(SRC512, 2.0, 1.0, (256.0, 256.0), 0.0, "exact")


def test_config1_512_fast_downscale():
    """BASELINE config 1, fast mode (the reference's default mode 2)."""
    _assert_parity(SRC512, 2.0, 1.0, (256.0, 256.0), 0.0, "fast")


def test_512_offcentre_arbitrary_ratio_exact():
    """512x512 at the shipped film ratio with an off-centre isocenter:
    fractional-overlap edges at scale (window clamp paths a 24x24 grid
    cannot populate densely)."""
    _assert_parity(SRC512, 150.0, 25.4, (201.0, 310.5), 0.0, "exact")


def test_compat_rotated_256():
    """Compat (bug-for-bug exact) parity at 256x256 / 30 deg rotation."""
    src = RNG.uniform(0.0, 1.0, (256, 256))
    _assert_parity(src, 1.0, 0.5, (128.0, 128.0), 30.0, "compat")


def test_fast_rotated_512_film_config():
    """Fast mode at 512x512 with the shipped film config angles."""
    _assert_parity(SRC512, 150.0, 25.4, (255.0, 257.0), 1.5, "fast")


@pytest.mark.skipif(
    os.environ.get("AAINTERP_SLOW_TESTS", "") != "1",
    reason="set AAINTERP_SLOW_TESTS=1 (adds ~30 s: 1024^2 scalar oracle)",
)
def test_compat_rotated_1024():
    """Compat envelope at migration size (VERDICT r4 weak 5): 1024^2 /
    30 deg bug-for-bug parity.  Measured 2026-08-20: oracle 14.0 s,
    compat native weight-gen + apply 16.1 s, max err 6.1e-7 — the
    validated envelope recorded in PARITY.md."""
    src = np.random.default_rng(1024).uniform(0.0, 1.0, (1024, 1024))
    _assert_parity(src, 1.0, 0.5, (512.0, 512.0), 30.0, "compat")
