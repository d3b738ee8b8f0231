"""End-to-end API tests: path cross-validation, batching, fast/exact modes."""

import numpy as np
import pytest

import aainterp as aa

RNG = np.random.default_rng(42)
SRC = RNG.uniform(0.0, 1.0, (24, 24))


def test_separable_equals_ell_at_axis_aligned():
    """Two independent weight-gen paths (1-D intervals vs polygon clipping)
    must agree exactly when the residual rotation is zero."""
    r1 = aa.area_average_interpolate(SRC, 150.0, 25.4, (11.0, 13.0), 0.0)
    r2 = aa.area_average_interpolate(
        SRC, 150.0, 25.4, (11.0, 13.0), 0.0, method="ell"
    )
    np.testing.assert_allclose(
        np.asarray(r1.dst), np.asarray(r2.dst), atol=1e-5
    )
    assert r1.dst_isocenter == r2.dst_isocenter


def test_separable_equals_ell_at_quadrants():
    for ang in (90.0, 180.0, 270.0):
        r1 = aa.area_average_interpolate(SRC, 2.0, 1.0, (4.0, 7.0), ang)
        r2 = aa.area_average_interpolate(
            SRC, 2.0, 1.0, (4.0, 7.0), ang, method="ell"
        )
        np.testing.assert_allclose(
            np.asarray(r1.dst), np.asarray(r2.dst), atol=1e-5
        )


def test_batching_matches_loop():
    batch = RNG.uniform(0, 1, (2, 3, 24, 24))
    rb = aa.area_average_interpolate(batch, 2.0, 1.0, (4.0, 4.0), 0.0)
    assert rb.dst.shape[:2] == (2, 3)
    r00 = aa.area_average_interpolate(batch[0, 0], 2.0, 1.0, (4.0, 4.0), 0.0)
    np.testing.assert_allclose(
        np.asarray(rb.dst[0, 0]), np.asarray(r00.dst), atol=1e-6
    )


def test_operator_reuse():
    spec = aa.make_grid_spec((24, 24), 2.0, 1.0, (4.0, 4.0), 0.0)
    op = aa.build_operator(spec)
    r1 = aa.area_average_interpolate(
        SRC, 2.0, 1.0, (4.0, 4.0), 0.0, operator=op
    )
    r2 = aa.area_average_interpolate(SRC, 2.0, 1.0, (4.0, 4.0), 0.0)
    np.testing.assert_array_equal(np.asarray(r1.dst), np.asarray(r2.dst))


def test_fast_mode_converges_to_exact():
    """Fast mode is supersampled nearest rasterisation: exact in the limit
    scale -> inf; at rotation 0 with aligned integer grids both are exact up
    to the boundary-center double-count (Source.cpp:866-907 semantics)."""
    r_exact = aa.area_average_interpolate(SRC, 8.0, 1.0, (8.0, 8.0), 0.0)
    r_fast = aa.area_average_interpolate(
        SRC, 8.0, 1.0, (8.0, 8.0), 0.0, mode="fast"
    )
    # L = 8: interval [8i-4, 8i+4] with 9 centers (counts) vs 8 units (areas)
    assert (
        np.abs(np.asarray(r_exact.dst) - np.asarray(r_fast.dst)).max() < 0.15
    )


def test_constant_image_invariance():
    """A constant image must stay exactly constant everywhere the footprint
    covers any source area (weights are normalised)."""
    const = np.full((24, 24), 3.25)
    for ang in (0.0, 30.0):
        r = aa.area_average_interpolate(const, 1.0, 0.5, (11.5, 12.5), ang)
        d = np.asarray(r.dst)
        covered = d != 0.0
        assert covered.any()
        np.testing.assert_allclose(d[covered], 3.25, rtol=1e-5)


def test_validation_raised_from_api():
    with pytest.raises(aa.ValidationError):
        aa.area_average_interpolate(SRC, 0.0, 1.0, (0, 0), 0.0)


def test_reference_named_wrappers():
    dst, iso = aa.area_average_interpolation(SRC, 2.0, 1.0, (4.0, 4.0), 0.0)
    dst_f, iso_f = aa.fast_area_average_interpolation(
        SRC, 2.0, 1.0, (4.0, 4.0), 0.0
    )
    assert dst.shape == dst_f.shape == (12, 12)
    assert iso == iso_f == (2, 2)


def test_fused_matches_operator_path():
    """On-device f32 fused weight-gen + apply (BASELINE config 4) agrees
    with the host f64 operator path to f32 geometry tolerance.  Pixels whose
    footprint barely grazes the image (total overlap below the f32 sliver
    threshold) may be zero in one path and tiny-coverage in the other —
    measure-zero boundary cases (SURVEY.md §7 hard part 1); allow a <1%
    count of them."""
    r_host = aa.area_average_interpolate(SRC, 1.0, 0.5, (11.5, 12.5), 30.0)
    r_fused = aa.area_average_interpolate(
        SRC, 1.0, 0.5, (11.5, 12.5), 30.0, fused=True
    )
    a = np.asarray(r_fused.dst)
    b = np.asarray(r_host.dst)
    edge = (a == 0.0) != (b == 0.0)
    assert edge.mean() < 0.01
    np.testing.assert_allclose(a[~edge], b[~edge], atol=2e-4)


def test_fused_fast_mode():
    r_host = aa.area_average_interpolate(
        SRC, 1.0, 1.0, (11.5, 12.5), 30.0, mode="fast"
    )
    r_fused = aa.area_average_interpolate(
        SRC, 1.0, 1.0, (11.5, 12.5), 30.0, mode="fast", fused=True
    )
    np.testing.assert_allclose(
        np.asarray(r_fused.dst), np.asarray(r_host.dst), atol=2e-4
    )


def test_forced_pallas_honors_quadrant():
    """impl='pallas' with quadrant != 0 must pre-rotate like the XLA path
    (round-1 advisor finding: the auto route gated on quadrant==0 but a
    forced pallas silently skipped the rot90).  On CPU the pallas call falls
    back to the banded path; the quadrant handling under test is in
    api.apply_operator either way."""
    spec = aa.make_grid_spec((24, 24), 2.0, 1.0, (4.0, 7.0), 180.0)
    assert spec.quadrant != 0
    op = aa.build_operator(spec)
    ref = aa.apply_operator(op, SRC, impl="xla")
    got = aa.apply_operator(op, SRC, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_sheared_weight_dtype_honored():
    """weight_dtype must thread into the sheared plan (round-1 advisor
    finding: non-f32 requests were silently computed in f32).  bf16 is used
    as the probe dtype: f64 canonicalizes to f32 unless jax_enable_x64 is
    set, which would make the assertion vacuous."""
    import jax.numpy as jnp
    from aainterp.ops.shear_apply import make_sheared_apply
    from aainterp.ops.weights import ell_operator

    spec = aa.make_grid_spec((24, 24), 1.0, 0.5, (12.0, 12.0), 30.0)
    op = ell_operator(spec, mode="exact")
    _, arrs = make_sheared_apply(op, weight_dtype=jnp.bfloat16)
    assert arrs["weights"].dtype == jnp.bfloat16
    _, arrs32 = make_sheared_apply(op)
    assert arrs32["weights"].dtype == jnp.float32


def test_operator_sanitizer():
    """The numerical-sanitizer path (SURVEY.md §5): weight-row checks plus
    jax_debug_nans over a full apply."""
    import jax

    from aainterp.ops.weights import validate_operator

    spec_s = aa.make_grid_spec((24, 24), 150.0, 25.4, (11.0, 13.0), 0.0)
    stats = validate_operator(aa.build_operator(spec_s))
    assert "y_zero_rows" in stats

    spec_e = aa.make_grid_spec((24, 24), 1.0, 0.5, (11.5, 12.5), 30.0)
    stats = validate_operator(aa.build_operator(spec_e))
    assert stats["zero_rows"] > 0  # bounding-box corners are empty

    with jax.debug_nans(True):
        r = aa.area_average_interpolate(SRC, 1.0, 0.5, (11.5, 12.5), 30.0)
        np.asarray(r.dst)


def test_separable_auto_route_ignores_quadrant():
    """VERDICT r2 item 5: the TPU auto route must take the Pallas kernel
    for quadrant != 0 too (rot90 pre-rotation is handled inside the
    pallas branch), and the forced impl='pallas' path must match XLA for
    every quadrant (interpret-mode numerical check)."""
    from aainterp.api import _separable_auto_route

    # big 2/3-D shapes ride pallas regardless of quadrant
    assert _separable_auto_route((2160, 3840), 2, True) == "pallas"
    assert _separable_auto_route((3, 2160, 3840), 3, True) == "pallas"
    # small shapes / CPU / deep batching stay on XLA
    assert _separable_auto_route((256, 256), 2, True) == "xla"
    assert _separable_auto_route((2160, 3840), 2, False) == "xla"
    assert _separable_auto_route((2, 3, 2160, 3840), 4, True) == "xla"

    # numerical: every quadrant through the pallas branch == the XLA path
    from aainterp.ops.apply import quadrant_rotate
    from aainterp.ops.pallas_apply import apply_separable_pallas

    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    for angle, hw in ((90.0, (128, 128)), (180.0, (128, 128)),
                      (270.0, (128, 128))):
        spec = aa.make_grid_spec(hw, 2.0, 1.0, (5.0, 3.0), angle)
        assert spec.quadrant != 0
        op = aa.build_operator(spec)
        src = jnp.asarray(rng.uniform(0, 1, hw).astype(np.float32))
        got = apply_separable_pallas(
            quadrant_rotate(src, op.spec.quadrant),
            jnp.asarray(op.wy.start), jnp.asarray(op.wy.weights, jnp.float32),
            jnp.asarray(op.wx.start), jnp.asarray(op.wx.weights, jnp.float32),
            interpret=True)
        ref = aa.apply_operator(op, src, impl="xla")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)


def test_plan_caches_survive_first_call_in_trace():
    """First apply_operator call INSIDE a jit trace must not poison the
    plan caches (_STENCIL_CACHE / shear caches / _ELL_LINEAR_CACHE):
    JAX 0.9 lifts trace-time jnp.asarray(numpy) to tracers, so cached
    closures/arrays built during tracing used to raise
    UnexpectedTracerError on every later eager call.  Conversions are now
    concrete via jax.ensure_compile_time_eval."""
    import jax
    import jax.numpy as jnp
    from aainterp import api as api_mod
    from aainterp.ops.weights import ell_operator

    rng = np.random.default_rng(9)

    # stencil route (interior-constant integer-ratio operator)
    api_mod._STENCIL_CACHE.clear()
    spec = aa.make_grid_spec((48, 48), 2.0, 1.0, (4.0, 4.0), 0.0)
    op = aa.build_operator(spec)
    src = jnp.asarray(rng.uniform(0, 1, (48, 48)).astype(np.float32))
    inside = jax.jit(lambda s: aa.apply_operator(op, s, impl="stencil"))(src)
    eager = aa.apply_operator(op, src, impl="stencil")
    np.testing.assert_allclose(np.asarray(inside), np.asarray(eager),
                               rtol=1e-6)

    # sheared + differentiable ELL routes (rotated operator)
    api_mod._PALLAS_SHEAR_CACHE.clear()
    api_mod._XLA_SHEAR_CACHE.clear()
    api_mod._ELL_LINEAR_CACHE.clear()
    spec_r = aa.make_grid_spec((48, 48), 1.0, 0.5, (24.0, 24.0), 30.0)
    op_r = ell_operator(spec_r, mode="exact")
    inside = jax.jit(
        lambda s: aa.apply_operator(op_r, s, impl="sheared"))(src)
    eager = aa.apply_operator(op_r, src, impl="sheared")
    np.testing.assert_allclose(np.asarray(inside), np.asarray(eager),
                               rtol=1e-6)

    g_in = jax.jit(jax.grad(lambda s: jnp.sum(aa.apply_operator(
        op_r, s, impl="xla", differentiable=True))))(src)
    g_out = jax.grad(lambda s: jnp.sum(aa.apply_operator(
        op_r, s, impl="xla", differentiable=True)))(src)
    np.testing.assert_allclose(np.asarray(g_in), np.asarray(g_out),
                               rtol=1e-6)


def test_forced_ell_impl_raises_off_envelope(monkeypatch):
    """A forced impl='pallas'/'sheared' on an ELL operator must raise when
    its plan doesn't fit rather than silently running a ~5x slower
    different path (the auto route may still degrade; ADVICE r2
    convention, matching the sharded applies)."""
    import jax.numpy as jnp

    import aainterp.api as api_mod
    from aainterp.ops.weights import ell_operator

    spec = aa.make_grid_spec((24, 24), 1.0, 1.0, (12.0, 12.0), 1.5)
    op = ell_operator(spec, mode="exact")
    src = jnp.asarray(RNG.uniform(0, 1, (24, 24)).astype(np.float32))

    def boom(*a, **k):
        raise ValueError("geometry off the kernel envelope (test)")

    monkeypatch.setattr(api_mod, "_pallas_shear_plan", boom)
    monkeypatch.setattr(api_mod, "_sheared_plan", boom)
    with pytest.raises(ValueError, match="envelope"):
        aa.apply_operator(op, src, impl="pallas")
    with pytest.raises(ValueError, match="envelope"):
        aa.apply_operator(op, src, impl="sheared")
    # the auto route still degrades to the XLA flat-gather apply
    out = aa.apply_operator(op, src, impl="auto")
    ref = aa.apply_operator(op, src, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_unknown_ell_impl_raises():
    """A typo'd impl on an EllOperator must raise, not silently fall
    through to the flat-gather XLA path (ADVICE r3)."""
    import jax.numpy as jnp

    from aainterp.ops.weights import ell_operator

    spec = aa.make_grid_spec((24, 24), 1.0, 1.0, (12.0, 12.0), 1.5)
    op = ell_operator(spec, mode="exact")
    src = jnp.asarray(RNG.uniform(0, 1, (24, 24)).astype(np.float32))
    with pytest.raises(ValueError, match="unknown impl"):
        aa.apply_operator(op, src, impl="palas")


def test_shear_plan_caches_are_per_family(monkeypatch):
    """VERDICT r3 weak #3: the Pallas and XLA shear plans keep SEPARATE
    LRUs — alternating geometries across both impls must not thrash
    ~30-s plan builds out of a shared 4-slot pool."""
    import jax.numpy as jnp

    import aainterp.api as api_mod
    from aainterp.ops.weights import ell_operator

    api_mod._PALLAS_SHEAR_CACHE.clear()
    api_mod._XLA_SHEAR_CACHE.clear()
    builds = {"pallas": 0, "xla": 0}

    def fake_pallas(op, **kw):
        builds["pallas"] += 1
        return (lambda q, **a: q), {}

    def fake_sheared(op, **kw):
        builds["xla"] += 1
        return (lambda q, **a: q), {}

    import aainterp.ops.pallas_shear as ps
    import aainterp.ops.shear_apply as sa

    monkeypatch.setattr(ps, "make_pallas_shear_apply", fake_pallas)
    monkeypatch.setattr(sa, "make_sheared_apply", fake_sheared)

    ops = [ell_operator(
        aa.make_grid_spec((24, 24), 1.0, 0.5, (12.0, 12.0), ang),
        mode="exact") for ang in (10.0, 20.0, 30.0, 40.0)]
    # interleave 4 geometries across both families twice: with the old
    # shared LruDict(4) the 8 live entries evicted each other every
    # round; per-family caches build each plan exactly once
    for _ in range(2):
        for op in ops:
            api_mod._pallas_shear_plan(op)
            api_mod._sheared_plan(op)
    assert builds == {"pallas": 4, "xla": 4}
    assert len(api_mod._PALLAS_SHEAR_CACHE) == 4
    assert len(api_mod._XLA_SHEAR_CACHE) == 4


def test_aligned_plan_detection_memoized(monkeypatch):
    """VERDICT r3 weak #4: apply_band_operators must not re-run the
    aligned_axis_plan host scans on every auto-route f32 call — the
    detection is memoized by table content."""
    import aainterp.regrid as regrid_mod
    from aainterp.regrid import (LatLonGrid, apply_band_operators,
                                 conservative_regrid_operator)

    by, bx = conservative_regrid_operator(LatLonGrid(120, 72),
                                          LatLonGrid(12, 18))
    calls = {"n": 0}
    real = regrid_mod.__dict__.get("aligned_axis_plan")  # imported lazily
    from aainterp.ops import apply as apply_mod

    real = apply_mod.aligned_axis_plan

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(apply_mod, "aligned_axis_plan", counting)
    regrid_mod._ALIGNED_PLAN_CACHE.clear()
    field = np.random.default_rng(0).uniform(
        200, 300, (120, 72)).astype(np.float32)
    out1 = apply_band_operators(field, by, bx)
    first = calls["n"]
    assert first >= 1  # the detection ran once
    out2 = apply_band_operators(field, by, bx)
    assert calls["n"] == first  # ...and never again for the same tables
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
