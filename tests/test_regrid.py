"""Conservative lat-lon regrid tests (BASELINE config 5)."""

import numpy as np
import pytest

from aainterp.regrid import (
    LatLonGrid,
    area_weighted_mean,
    conservative_regrid,
    conservative_regrid_operator,
)


def test_operator_rows_normalised():
    src, dst = LatLonGrid(180, 360), LatLonGrid(45, 90)
    by, bx = conservative_regrid_operator(src, dst)
    np.testing.assert_allclose(by.weights.sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(bx.weights.sum(axis=1), 1.0, atol=1e-12)


def test_constant_field_preserved():
    src, dst = LatLonGrid(180, 360), LatLonGrid(30, 60)
    field = np.full((180, 360), 2.5, np.float32)
    out = np.asarray(conservative_regrid(field, src, dst))
    np.testing.assert_allclose(out, 2.5, rtol=1e-6)


def test_global_mean_conserved():
    """First-order conservative regridding preserves the area-weighted
    global mean exactly (up to float32) — the defining property."""
    rng = np.random.default_rng(0)
    src, dst = LatLonGrid(90, 180), LatLonGrid(30, 60)
    field = rng.uniform(200.0, 300.0, (90, 180)).astype(np.float32)
    out = conservative_regrid(field, src, dst)
    m_src = float(area_weighted_mean(field, src))
    m_dst = float(area_weighted_mean(out, dst))
    assert m_dst == pytest.approx(m_src, rel=2e-6)


def test_integer_ratio_matches_area_mean():
    """3x coarsening: each dst cell = sin-lat-weighted mean of its 3x3."""
    rng = np.random.default_rng(1)
    src, dst = LatLonGrid(18, 36), LatLonGrid(6, 12)
    field = rng.uniform(0, 1, (18, 36))
    out = np.asarray(conservative_regrid(field, src, dst))
    sin_e = np.sin(np.radians(src.lat_edges))
    wlat = np.abs(np.diff(sin_e))
    ref = np.empty((6, 12))
    for i in range(6):
        for j in range(12):
            blk = field[3 * i: 3 * i + 3, 3 * j: 3 * j + 3]
            w = wlat[3 * i: 3 * i + 3][:, None] * np.ones((1, 3))
            ref[i, j] = (blk * w).sum() / w.sum()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_batched_fields():
    src, dst = LatLonGrid(36, 72), LatLonGrid(12, 24)
    rng = np.random.default_rng(2)
    fields = rng.uniform(0, 1, (4, 36, 72)).astype(np.float32)
    out = conservative_regrid(fields, src, dst)
    assert out.shape == (4, 12, 24)


def test_pallas_route_matches_xla():
    """The impl='pallas' route (what auto picks on TPU — the path the
    config-5 bench measures) equals the XLA banded apply; on CPU the
    compiled kernel is unavailable, so exercise it in interpret mode and
    check the silent-XLA fallback separately."""
    src, dst = LatLonGrid(180, 360), LatLonGrid(18, 36)
    rng = np.random.default_rng(3)
    field = rng.uniform(200.0, 300.0, (2, 180, 360)).astype(np.float32)
    ref = np.asarray(conservative_regrid(field, src, dst, impl="xla"))
    got = np.asarray(conservative_regrid(field, src, dst, impl="pallas",
                                         interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    fell_back = np.asarray(conservative_regrid(field, src, dst,
                                               impl="pallas"))
    np.testing.assert_allclose(fell_back, ref, rtol=1e-6)
    # precision knob plumbs through (interpret mode is exact regardless)
    hi = np.asarray(conservative_regrid(field, src, dst, impl="pallas",
                                        precision="high", interpret=True))
    np.testing.assert_allclose(hi, ref, rtol=1e-5, atol=1e-5)
