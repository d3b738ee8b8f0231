"""1-D overlap band tests: conservation and brute-force parity."""

import numpy as np
import pytest

from aainterp.ops.overlap1d import count_band_1d, overlap_band_1d


def _brute_overlap(n_dst, n_src, L, s, f):
    W = np.zeros((n_dst, n_src))
    for i in range(n_dst):
        lo, hi = (i + f) * L - L / 2, (i + f) * L + L / 2
        for j in range(n_src):
            clo, chi = j * s - 0.5, j * s + s - 0.5
            W[i, j] = max(0.0, min(hi, chi) - max(lo, clo))
    return W


@pytest.mark.parametrize("L,s,f", [
    (2.0, 1, 0.0), (2.0, 1, 0.75), (5.905511811023622, 1, 0.37),
    (1.4173228346456692, 5, 0.0), (3.7, 2, 0.99),
])
def test_band_matches_bruteforce(L, s, f):
    n_dst, n_src = 17, 23
    band = overlap_band_1d(n_dst, n_src, L, s, f)
    np.testing.assert_allclose(
        band.dense(), _brute_overlap(n_dst, n_src, L, s, f), atol=1e-12
    )


def test_conservation():
    """Each fully-covered src cell's total weight across all dst intervals
    equals its length (no information lost — the README's core claim)."""
    L, s, f = 2.3, 1, 0.41
    n_src = 40
    n_dst = int(n_src * s / L) + 2
    band = overlap_band_1d(n_dst, n_src, L, s, f)
    col_sums = band.dense().sum(axis=0)
    lo0 = (0 + f) * L - L / 2
    hi1 = (n_dst - 1 + f) * L + L / 2
    for j in range(n_src):
        clo, chi = j * s - 0.5, j * s + s - 0.5
        if clo >= lo0 and chi <= hi1:  # cell fully covered by the dst range
            assert col_sums[j] == pytest.approx(float(s), abs=1e-12)


def test_row_sums_bounded_by_interval_length():
    band = overlap_band_1d(10, 100, 3.3, 1, 0.2)
    assert (band.row_sums() <= 3.3 + 1e-12).all()


def test_count_band_integer_alignment_inclusive():
    """f=0, L=2, s=1: interval edges land exactly on cell centers; the
    reference's eps-fuzzed ray cast counts boundary centers as inside on BOTH
    neighbouring intervals (Source.cpp:837-864) => 3 centers per interval."""
    band = count_band_1d(5, 20, 2.0, 1, 0.0)
    dense = band.dense()
    # interior interval [2i-1, 2i+1] contains centers 2i-1, 2i, 2i+1
    for i in range(1, 4):
        assert dense[i].sum() == pytest.approx(3.0)
        assert dense[i, 2 * i - 1] == 1.0
        assert dense[i, 2 * i] == 1.0
        assert dense[i, 2 * i + 1] == 1.0


def test_count_band_replicas():
    """scale>1: replica centers are counted per original cell."""
    band = count_band_1d(3, 10, 6.0, 3, 0.0)
    dense = band.dense()
    # interval i spans [6i-3, 6i+3]; cell j has replica centers 3j, 3j+1, 3j+2
    assert dense[1, 1] == 3.0  # centers 3,4,5 all within [3, 9]
    assert dense[1].sum() == pytest.approx(7.0)  # centers 3..9 inclusive


def test_fractional_edge_overlaps():
    """Non-integer ratio: fractional overlap at interval edges (config 2)."""
    band = overlap_band_1d(4, 11, 2.5, 1, 0.0)
    d = band.dense()
    # interval 1 = [1.25, 3.75]: cells 1 (overlap .25), 2,3 (1.0), 4 (.25)
    np.testing.assert_allclose(d[1, 1:5], [0.25, 1.0, 1.0, 0.25], atol=1e-12)
