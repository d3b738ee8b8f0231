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


def test_pallas_bf16x3_precision_budget():
    """precision='bf16x3' (manual hi/lo-split 3-dot scheme — half of
    HIGHEST's MXU passes; Mosaic has no native HIGH lowering) stays
    inside the BASELINE 1e-5 relative budget, including conservation.
    Interpret mode runs the real split arithmetic, so this bounds the
    on-chip error too (each DEFAULT bf16 dot accumulates in f32)."""
    src, dst = LatLonGrid(180, 360), LatLonGrid(18, 36)
    rng = np.random.default_rng(7)
    field = rng.uniform(200.0, 300.0, (2, 180, 360)).astype(np.float32)
    ref = np.asarray(conservative_regrid(field, src, dst,
                                         impl="xla")).astype(np.float64)
    got = np.asarray(conservative_regrid(
        field, src, dst, impl="pallas", precision="bf16x3",
        interpret=True)).astype(np.float64)
    rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-30)
    assert rel.max() < 1e-5, rel.max()
    flux = abs(got.sum() - ref.sum()) / abs(ref.sum())
    assert flux < 2e-6, flux
    # non-f32 inputs quietly run the one-pass-exact DEFAULT path
    u8 = (field[0] % 256).astype(np.uint8)
    out_u8 = conservative_regrid(u8, src, dst, impl="pallas",
                                 precision="bf16x3", interpret=True)
    assert np.asarray(out_u8).dtype == np.uint8


# ----------------------------------------------------------------------
# Aligned integer-ratio fast path (ops/apply.aligned_axis_plan)
# ----------------------------------------------------------------------


def test_aligned_plan_detects_regrid_bands():
    """The config-5-shaped regrid partitions source cells exactly (m=10,
    c0=0) even though the cos-lat weights VARY per row — the uniform box
    detector rejects it, the aligned plan accepts it."""
    from aainterp.ops.apply import aligned_axis_plan, uniform_box_params

    src, dst = LatLonGrid(180, 360), LatLonGrid(18, 36)
    by, bx = conservative_regrid_operator(src, dst)
    yp = aligned_axis_plan(by.start, by.weights, by.n_src)
    xp = aligned_axis_plan(bx.start, bx.weights, bx.n_src)
    assert yp is not None and yp["m"] == 10 and yp["c0"] == 0
    assert xp is not None and xp["m"] == 10 and xp["c0"] == 0
    assert yp["wk"].shape == (18, 10)
    # y weights vary per row -> not a uniform box
    assert uniform_box_params(by.start, by.weights, bx.start, bx.weights,
                              180, 360) is None
    # non-integer ratio -> no plan
    b2, _ = conservative_regrid_operator(LatLonGrid(170, 360),
                                         LatLonGrid(18, 36))
    assert aligned_axis_plan(b2.start, b2.weights, b2.n_src) is None


def test_aligned_route_matches_banded_and_f64():
    from aainterp.regrid import apply_band_operators

    src, dst = LatLonGrid(180, 360), LatLonGrid(18, 36)
    by, bx = conservative_regrid_operator(src, dst)
    rng = np.random.default_rng(11)
    f = rng.uniform(200.0, 300.0, (2, 180, 360)).astype(np.float32)
    ref = np.asarray(apply_band_operators(f, by, bx, impl="xla"))
    got = np.asarray(apply_band_operators(f, by, bx, impl="aligned"))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)
    # against the float64 dense apply: true-f32-grade accuracy
    wy, wx = by.dense().astype(np.float64), bx.dense().astype(np.float64)
    dense = wy @ f[0].astype(np.float64) @ wx.T
    rel = np.abs(got[0] - dense) / np.maximum(np.abs(dense), 1e-30)
    assert rel.max() < 1e-6, rel.max()


def test_aligned_auto_route_taken(monkeypatch):
    """impl='auto' with f32 fields and aligned bands takes the aligned
    path (the 3.1x-measured config-5 production route)."""
    import aainterp.ops.apply as apply_mod
    from aainterp.regrid import apply_band_operators

    calls = []
    real = apply_mod.apply_separable_aligned
    monkeypatch.setattr(
        apply_mod, "apply_separable_aligned",
        lambda *a, **k: (calls.append(1), real(*a, **k))[1])
    src, dst = LatLonGrid(60, 90), LatLonGrid(15, 18)
    by, bx = conservative_regrid_operator(src, dst)
    f = np.full((60, 90), 1.5, np.float32)
    out = np.asarray(apply_band_operators(f, by, bx))
    assert calls, "auto route did not take the aligned path"
    np.testing.assert_allclose(out, 1.5, rtol=1e-6)
    # non-f32 fields keep their existing routes (f64 numpy would quietly
    # land as f32 under non-x64 JAX, so probe with bf16)
    import jax.numpy as jnp

    calls.clear()
    apply_band_operators(jnp.asarray(f, jnp.bfloat16), by, bx)
    assert not calls


def test_aligned_force_raises_off_envelope():
    from aainterp.regrid import apply_band_operators

    src, dst = LatLonGrid(170, 360), LatLonGrid(18, 36)
    by, bx = conservative_regrid_operator(src, dst)
    f = np.zeros((170, 360), np.float32)
    with pytest.raises(ValueError, match="aligned"):
        apply_band_operators(f, by, bx, impl="aligned")


def test_aligned_offset_band_c0():
    """A band whose partition starts at a nonzero source offset (c0 > 0,
    trailing rows unused) — the sharded-local-block shape."""
    from aainterp.ops.apply import (
        aligned_axis_plan, apply_separable_aligned,
    )
    from aainterp.ops.overlap1d import Band1D
    from aainterp.regrid import apply_band_operators

    rng = np.random.default_rng(5)
    wy = rng.uniform(0.1, 1.0, (7, 3))
    wy /= wy.sum(axis=1, keepdims=True)
    by = Band1D(start=(3 * np.arange(7) + 1).astype(np.int32), weights=wy,
                n_src=24, n_dst=7)
    wx = rng.uniform(0.1, 1.0, (5, 4))
    wx /= wx.sum(axis=1, keepdims=True)
    bx = Band1D(start=(4 * np.arange(5)).astype(np.int32), weights=wx,
                n_src=21, n_dst=5)
    yp = aligned_axis_plan(by.start, by.weights, by.n_src)
    xp = aligned_axis_plan(bx.start, bx.weights, bx.n_src)
    assert yp["m"] == 3 and yp["c0"] == 1
    assert xp["m"] == 4 and xp["c0"] == 0
    f = rng.uniform(0, 1, (2, 24, 21)).astype(np.float32)
    got = np.asarray(apply_separable_aligned(jnp_array(f), yp, xp))
    ref = np.asarray(apply_band_operators(f, by, bx, impl="xla"))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def jnp_array(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def test_aligned_u8_contract_and_grad():
    import jax
    import jax.numpy as jnp
    from aainterp.regrid import apply_band_operators

    src, dst = LatLonGrid(60, 90), LatLonGrid(15, 18)
    by, bx = conservative_regrid_operator(src, dst)
    rng = np.random.default_rng(13)
    u8 = rng.integers(0, 256, (60, 90), dtype=np.uint8)
    out8 = apply_band_operators(u8, by, bx, impl="aligned")
    assert np.asarray(out8).dtype == np.uint8
    ref = np.asarray(apply_band_operators(
        u8.astype(np.float32), by, bx, impl="xla"))
    assert np.abs(np.asarray(out8).astype(np.float64)
                  - np.round(ref)).max() <= 1.0
    # pure XLA -> natively differentiable: adjoint is the transposed op
    f = rng.uniform(0, 1, (60, 90)).astype(np.float32)
    c = rng.uniform(0, 1, (15, 18)).astype(np.float32)

    def loss(x):
        return jnp.sum(apply_band_operators(x, by, bx, impl="aligned") * c)

    g = np.asarray(jax.grad(loss)(jnp.asarray(f)))
    wy, wx = by.dense(), bx.dense()
    want = wy.T @ c.astype(np.float64) @ wx
    np.testing.assert_allclose(g, want, rtol=2e-5, atol=1e-6)


# ----------------------------------------------------------------------
# Masked (valid-cell-renormalised) regrid
# ----------------------------------------------------------------------

RNG_M = np.random.default_rng(42)


def _dense_masked_ref(field, mask, by, bx, min_cov=1e-6):
    """float64 ground truth: dense A(x*m)/A(m) with NaN fill."""
    wy, wx = by.dense().astype(np.float64), bx.dense().astype(np.float64)
    num = wy @ (field.astype(np.float64) * mask) @ wx.T
    den = wy @ mask.astype(np.float64) @ wx.T
    out = np.where(den > min_cov, num / np.where(den > min_cov, den, 1.0),
                   np.nan)
    return out, den


def test_masked_regrid_matches_dense_reference():
    src, dst = LatLonGrid(60, 90), LatLonGrid(15, 18)
    field = RNG_M.uniform(-2, 3, (60, 90)).astype(np.float32)
    mask = (RNG_M.uniform(0, 1, (60, 90)) > 0.35).astype(np.float32)
    by, bx = conservative_regrid_operator(src, dst)
    out = np.asarray(conservative_regrid(field, src, dst, src_mask=mask))
    ref, den = _dense_masked_ref(field, mask, by, bx)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-6)
    # fully-masked destination cells get the fill value
    assert np.isnan(out).sum() == (den <= 1e-6).sum()


def test_masked_regrid_constant_field_and_insensitivity():
    """A constant valid field stays constant wherever coverage > 0, and
    values under the mask NEVER leak into the output."""
    src, dst = LatLonGrid(40, 60), LatLonGrid(10, 12)
    mask = np.ones((40, 60), np.float32)
    mask[:, 20:40] = 0.0  # a masked longitude stripe
    a = np.full((40, 60), 1.75, np.float32)
    b = a.copy()
    b[:, 20:40] = 999.0  # garbage under the mask
    out_a = np.asarray(conservative_regrid(a, src, dst, src_mask=mask))
    out_b = np.asarray(conservative_regrid(b, src, dst, src_mask=mask))
    np.testing.assert_array_equal(out_a, out_b)
    valid = ~np.isnan(out_a)
    np.testing.assert_allclose(out_a[valid], 1.75, rtol=1e-6)


def test_masked_regrid_coverage_and_fill_knobs():
    from aainterp.regrid import apply_band_operators_masked

    src, dst = LatLonGrid(40, 60), LatLonGrid(10, 12)
    by, bx = conservative_regrid_operator(src, dst)
    field = RNG_M.uniform(0, 1, (40, 60)).astype(np.float32)
    mask = np.zeros((40, 60), np.float32)
    mask[:20] = 1.0
    out, cov = apply_band_operators_masked(field, mask, by, bx,
                                           fill_value=-7.0)
    assert np.asarray(cov).min() >= 0.0 and np.asarray(cov).max() <= 1.0 + 1e-6
    o = np.asarray(out)
    assert (o[np.asarray(cov) <= 1e-6] == -7.0).all()
    # u8 fields take the masked (float) route without the u8 contract
    u8 = (field * 255).astype(np.uint8)
    out8, _ = apply_band_operators_masked(u8, mask, by, bx)
    assert np.asarray(out8).dtype == np.float32


def test_masked_regrid_batched_and_per_frame_mask():
    src, dst = LatLonGrid(24, 36), LatLonGrid(6, 9)
    by, bx = conservative_regrid_operator(src, dst)
    from aainterp.regrid import apply_band_operators_masked

    fields = RNG_M.uniform(0, 1, (3, 24, 36)).astype(np.float32)
    masks = (RNG_M.uniform(0, 1, (3, 24, 36)) > 0.3).astype(np.float32)
    out, _ = apply_band_operators_masked(fields, masks, by, bx)
    for i in range(3):
        ref, _ = _dense_masked_ref(fields[i], masks[i], by, bx)
        np.testing.assert_allclose(np.asarray(out)[i], ref, rtol=2e-5,
                                   atol=1e-6)


def test_masked_regrid_sharded_matches_unsharded():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from aainterp.regrid import conservative_regrid_sharded

    src, dst = LatLonGrid(48, 72), LatLonGrid(12, 18)
    fields = RNG_M.uniform(0, 1, (4, 48, 72)).astype(np.float32)
    mask = (RNG_M.uniform(0, 1, (48, 72)) > 0.4).astype(np.float32)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "rows"))
    fdev = jax.device_put(jnp.asarray(fields),
                          NamedSharding(mesh, P("data", "rows", None)))
    out = np.asarray(conservative_regrid_sharded(fdev, src, dst, mesh,
                                                 src_mask=mask))
    ref = np.asarray(conservative_regrid(fields, src, dst, src_mask=mask))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-6)
    with pytest.raises(ValueError, match="conserve"):
        conservative_regrid_sharded(fdev, src, dst, mesh, src_mask=mask,
                                    conserve=True)


def test_masked_regrid_pallas_route_interpret():
    """The masked apply rides the Pallas 2-D banded-tile route like the
    unmasked one (interpret mode mirrors the TPU routing)."""
    from aainterp.regrid import apply_band_operators_masked

    src, dst = LatLonGrid(40, 256), LatLonGrid(10, 64)
    by, bx = conservative_regrid_operator(src, dst)
    f = RNG_M.uniform(0, 1, (2, 40, 256)).astype(np.float32)
    m = (RNG_M.uniform(0, 1, (40, 256)) > 0.3).astype(np.float32)
    ref, cov_ref = apply_band_operators_masked(f, m, by, bx, impl="xla")
    got, cov = apply_band_operators_masked(f, m, by, bx, impl="pallas",
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(cov_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_masked_regrid_differentiable_xla_route():
    """The masked apply is traced jnp ops on the XLA route, so grads
    flow: check jax.grad against the dense float64 closed form
    d/df sum(c * A(f*m)/A(m)) = m * A^T(c / A(m))."""
    import jax
    import jax.numpy as jnp
    from aainterp.regrid import apply_band_operators_masked

    src, dst = LatLonGrid(20, 30), LatLonGrid(5, 6)
    by, bx = conservative_regrid_operator(src, dst)
    f = RNG_M.uniform(0, 1, (20, 30)).astype(np.float32)
    m = (RNG_M.uniform(0, 1, (20, 30)) > 0.3).astype(np.float32)
    c = RNG_M.uniform(0, 1, (5, 6)).astype(np.float32)

    def loss(field):
        out, _ = apply_band_operators_masked(field, m, by, bx,
                                             fill_value=0.0, impl="xla")
        return jnp.sum(out * c)

    g = np.asarray(jax.grad(loss)(jnp.asarray(f)))
    wy, wx = by.dense(), bx.dense()
    den = wy @ m.astype(np.float64) @ wx.T
    cd = np.where(den > 1e-6, c / np.where(den > 1e-6, den, 1.0), 0.0)
    want = m * (wy.T @ cd @ wx)
    np.testing.assert_allclose(g, want, rtol=2e-5, atol=1e-6)
