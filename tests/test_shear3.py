"""3-pass conservative shear decomposition (mode='shear', ops/shear3.py).

The approximate high-throughput rotated mode: checks the exact
invariants (flux conservation, constant-image identity, coverage mask),
the approximation quality vs the exact operator, and the API contract.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import aainterp as aa
from aainterp.ops.shear3 import (apply_shear3_np, apply_shear3_xla,
                                 build_shear3_plan, plan_arrays)

RNG = np.random.default_rng(7)

GEOMS = [
    # (H, W, sres, dres, angle): band branch and fold branch, quadrants,
    # steep angles, anisotropic shapes
    (96, 96, 1.0, 0.5, 30.0),     # rot30-config class (scale 1, L 2)
    (64, 80, 1.0, 1.0, 30.0),     # equal res -> fold branch (s == L)
    (72, 72, 1.0, 1.0, 75.0),     # steep, fold branch
    (64, 64, 2.0, 1.5, 14.0),     # band branch, non-integer ratio
    (64, 64, 1.0, 0.8, 100.0),    # quadrant 1
    (48, 64, 1.0, 0.7, 213.0),    # quadrant 2
    (64, 48, 1.0, 1.0, 322.0),    # quadrant 3, fold branch
]


def _quad_input(src, spec):
    return np.rot90(src, -spec.quadrant).copy() if spec.quadrant else src


def _smooth(H, W):
    y, x = np.mgrid[0:H, 0:W]
    return (0.5 + 0.3 * np.sin(2 * math.pi * x / W * 3)
            * np.cos(2 * math.pi * y / H * 2)
            + 0.2 * np.cos(2 * math.pi * (x + y) / (H + W)))


def _decs_for(spec):
    """Decompositions valid for a geometry: xyx always, yxy when the
    pass scale reduces (scale < dst_side)."""
    return ("xyx", "yxy") if spec.scale < spec.dst_side else ("xyx",)


@pytest.mark.parametrize("H,W,sr,dr,ang", GEOMS)
def test_invariants(H, W, sr, dr, ang):
    spec = aa.make_grid_spec((H, W), sr, dr, (W / 2, H / 2), ang)
    qH, qW = spec.qrot_shape
    for dec in _decs_for(spec):
        plan = build_shear3_plan(spec, decomposition=dec)

        # constant image -> exactly 1 on the covered region, 0 outside
        out = apply_shear3_np(plan, np.ones((qH, qW)))
        covered = plan.inv_cov > 0
        assert covered.mean() > 0.3
        assert np.abs(out[covered] - 1.0).max() < 1e-6
        if (~covered).any():
            assert np.abs(out[~covered]).max() == 0.0

        # exact flux conservation for an interior-supported image:
        # every stage is mass-preserving by construction (both
        # decompositions — conservation is NOT part of the
        # approximation trade)
        q = np.zeros((qH, qW))
        m = max(4, qH // 4, qW // 4)
        q[m:-m, m:-m] = RNG.uniform(0.5, 1.5, (qH - 2 * m, qW - 2 * m))
        un = apply_shear3_np(plan, q, normalize=False)
        flux_in = q.sum() * spec.scale ** 2
        flux_out = un.sum() * spec.dst_side ** 2
        assert abs(flux_out - flux_in) / flux_in < 1e-12, dec


@pytest.mark.parametrize("H,W,sr,dr,ang", GEOMS)
def test_accuracy_vs_exact(H, W, sr, dr, ang):
    """The approximation contract vs the exact polygon-clip operator on
    smooth content: x-y-x (translate at source pitch) ~0.5%-of-range
    rms; y-x-y (reduce-first, dst-pitch translates — the fast serving
    decomposition) trades ~2-3x that smearing for ~2x throughput."""
    spec = aa.make_grid_spec((H, W), sr, dr, (W / 2, H / 2), ang)
    src = _smooth(H, W)
    exact = np.asarray(aa.area_average_interpolate(
        src, sr, dr, (W / 2, H / 2), ang, mode="exact").dst, np.float64)
    for dec, rms_bound, max_bound in (("xyx", 5e-3, 0.08),
                                      ("yxy", 1.6e-2, 0.2)):
        if dec not in _decs_for(spec):
            continue
        plan = build_shear3_plan(spec, decomposition=dec)
        approx = apply_shear3_np(plan, _quad_input(src, spec))
        covered = (plan.inv_cov > 0) & (exact != 0)
        # boundary slivers (coverage << 1) renormalise a sub-cell region
        # and the two methods disagree about WHICH sliver — the tight
        # contract holds on well-covered pixels
        well = covered & (plan.inv_cov <= 1.5)
        rng_v = exact[covered].max() - exact[covered].min()
        rms = float(np.sqrt(((approx - exact)[well] ** 2).mean()))
        assert rms / rng_v < rms_bound, (dec, rms, rng_v)
        assert np.abs((approx - exact)[well]).max() / rng_v < max_bound
        assert np.abs((approx - exact)[covered]).max() / rng_v < 0.3


def test_xla_matches_numpy_and_batches():
    spec = aa.make_grid_spec((64, 80), 1.0, 0.6, (40.0, 32.0), 23.0)
    plan = build_shear3_plan(spec)
    arrs = plan_arrays(plan)
    q = RNG.uniform(0, 1, (3, 64, 80)).astype(np.float32)
    ref = apply_shear3_np(plan, q)
    out = np.asarray(apply_shear3_xla(plan, jnp.asarray(q), arrs))
    assert out.shape == (3,) + spec.dst_shape
    np.testing.assert_allclose(out, ref, atol=2e-5)
    # jit with tables as arguments (the serving pattern)
    jf = jax.jit(lambda x, a: apply_shear3_xla(plan, x, a))
    out_j = np.asarray(jf(jnp.asarray(q), arrs))
    np.testing.assert_allclose(out_j, ref, atol=2e-5)


def test_u8_contract():
    spec = aa.make_grid_spec((64, 64), 1.0, 1.0, (32.0, 32.0), 30.0)
    plan = build_shear3_plan(spec)
    arrs = plan_arrays(plan)
    q = RNG.integers(0, 256, (64, 64), dtype=np.uint8)
    out8 = np.asarray(apply_shear3_xla(plan, jnp.asarray(q), arrs))
    assert out8.dtype == np.uint8
    ref = apply_shear3_np(plan, q.astype(np.float64))
    assert np.abs(out8.astype(np.float64)
                  - np.clip(np.round(ref), 0, 255)).max() <= 1.0


def test_api_mode_shear():
    src = _smooth(64, 64)
    res = aa.area_average_interpolate(
        src, 1.0, 0.5, (32.0, 32.0), 30.0, mode="shear", method="xla")
    spec = res.spec
    assert np.asarray(res.dst).shape == spec.dst_shape
    assert res.dst_isocenter == spec.dst_isocenter
    # matches the direct pipeline
    plan = build_shear3_plan(spec)
    ref = apply_shear3_np(plan, _quad_input(src, spec))
    np.testing.assert_allclose(np.asarray(res.dst), ref, atol=2e-5)

    # axis-aligned 'shear' falls through to the exact separable path
    r_sh = aa.area_average_interpolate(
        src, 1.0, 0.5, (32.0, 32.0), 0.0, mode="shear")
    r_ex = aa.area_average_interpolate(
        src, 1.0, 0.5, (32.0, 32.0), 0.0, mode="exact")
    np.testing.assert_allclose(np.asarray(r_sh.dst), np.asarray(r_ex.dst),
                               rtol=0, atol=0)

    with pytest.raises(ValueError, match="shear"):
        op = aa.build_operator(aa.make_grid_spec(
            (64, 64), 1.0, 0.5, (32.0, 32.0), 30.0))
        aa.area_average_interpolate(src, 1.0, 0.5, (32.0, 32.0), 30.0,
                                    mode="shear", operator=op)
    with pytest.raises(ValueError, match="auto/xla/pallas"):
        aa.area_average_interpolate(src, 1.0, 0.5, (32.0, 32.0), 30.0,
                                    mode="shear", method="bogus")


def test_shear_quality_contract():
    """The shear mode's accuracy contract (measured 2026-08-20, pinned):

    1. MORE accurate than the reference's own default approximate mode
       ('fast', replica-center counting) against the exact operator —
       at a rot30-class config the margin is ~2x in rms, ~2.7x in max.
    2. Roundtrip smoothing is bilinear-CLASS (each pass adds ~half a
       cell of conservative smear; the single 2-D overlap of exact mode
       smears less) — the mode's edge over bilinear is exact flux
       conservation + accuracy-vs-exact, not roundtrip sharpness.
    """
    from scipy import ndimage

    # near-Nyquist scene (same class as test_quality_claims): smooth
    # content hides interpolator differences; this one separates them
    y, x = np.mgrid[0:128, 0:128].astype(np.float64)
    src = (np.sin(x * 0.9) * np.cos(y * 0.55) + 1.0) / 2.0
    H = W = 128
    iso = (W / 2.0, H / 2.0)

    # (1) single-rotation accuracy vs exact, near-Nyquist content: the
    # default (quality, x-y-x) decomposition beats the reference's fast
    # mode; the 'fast' (y-x-y reduce-first) decomposition does NOT on
    # this content class (its contract is smooth content, where it wins
    # ~3x — pinned below) — which is why 'quality' is the default.
    spec = aa.make_grid_spec((H, W), 1.0, 0.5, iso, 30.0)
    exact = np.asarray(aa.area_average_interpolate(
        src, 1.0, 0.5, iso, 30.0, mode="exact").dst, np.float64)
    fast = np.asarray(aa.area_average_interpolate(
        src, 1.0, 0.5, iso, 30.0, mode="fast").dst, np.float64)
    plan = build_shear3_plan(spec)             # auto == quality == xyx
    shear = apply_shear3_np(plan, _quad_input(src, spec))
    m = (plan.inv_cov > 0) & (plan.inv_cov <= 1.5) & (exact != 0)
    rms_f = float(np.sqrt(((fast - exact)[m] ** 2).mean()))
    rms_s = float(np.sqrt(((shear - exact)[m] ** 2).mean()))
    assert rms_s < 0.7 * rms_f, (rms_s, rms_f)

    # (1b) smooth content (the dosimetry domain): BOTH decompositions
    # beat the fast mode, yxy included
    smooth = _smooth(H, W)
    exact_s = np.asarray(aa.area_average_interpolate(
        smooth, 1.0, 0.5, iso, 30.0, mode="exact").dst, np.float64)
    fast_s = np.asarray(aa.area_average_interpolate(
        smooth, 1.0, 0.5, iso, 30.0, mode="fast").dst, np.float64)
    plan_y = build_shear3_plan(spec, decomposition="fast")
    shear_y = apply_shear3_np(plan_y, _quad_input(smooth, spec))
    m2 = (plan_y.inv_cov > 0) & (plan_y.inv_cov <= 1.5) & (exact_s != 0)
    rms_fy = float(np.sqrt(((fast_s - exact_s)[m2] ** 2).mean()))
    rms_sy = float(np.sqrt(((shear_y - exact_s)[m2] ** 2).mean()))
    assert rms_sy < 0.75 * rms_fy, (rms_sy, rms_fy)

    # (2) roundtrip PSNR stays within 1.5 dB of bilinear (same class)
    def roundtrip(mode):
        r1 = aa.area_average_interpolate(src, 1.0, 1.0, iso, 30.0,
                                         mode=mode)
        fwd = np.asarray(r1.dst, np.float64)
        h2, w2 = fwd.shape
        r2 = aa.area_average_interpolate(
            fwd, 1.0, 1.0, (w2 / 2, h2 / 2), -30.0, mode=mode)
        return np.asarray(r2.dst, np.float64)

    def crop_psnr(rt):
        hh, ww = rt.shape
        k = 24
        a = rt[hh // 2 - k: hh // 2 + k, ww // 2 - k: ww // 2 + k]
        b = src[H // 2 - k: H // 2 + k, W // 2 - k: W // 2 + k]
        mse = float(np.mean((a - b) ** 2))
        rng = float(b.max() - b.min())
        return 10 * math.log10(rng * rng / max(mse, 1e-30))

    p_exact = crop_psnr(roundtrip("exact"))
    p_shear = crop_psnr(roundtrip("shear"))
    f1 = ndimage.rotate(src, -30.0, reshape=True, order=1)
    p_bil = crop_psnr(
        np.asarray(ndimage.rotate(f1, 30.0, reshape=True, order=1)))
    assert p_exact >= p_shear - 0.5  # exact stays the best
    assert p_shear > p_bil - 1.5, (p_shear, p_bil)


@pytest.mark.parametrize("H,W,sr,dr,ang", GEOMS[:5])
def test_pallas_interpret_matches_numpy(H, W, sr, dr, ang):
    from aainterp.ops.pallas_shear3 import apply_shear3_pallas

    spec = aa.make_grid_spec((H, W), sr, dr, (W / 2, H / 2), ang)
    qH, qW = spec.qrot_shape
    q = RNG.uniform(0, 1, (2, qH, qW)).astype(np.float32)
    for dec in _decs_for(spec):
        plan = build_shear3_plan(spec, decomposition=dec)
        ref = apply_shear3_np(plan, q)
        out = np.asarray(apply_shear3_pallas(
            plan, jnp.asarray(q), mid_dtype=jnp.float32, interpret=True))
        np.testing.assert_allclose(out, ref, atol=3e-6)
        # bf16 staging stays within the mode's approximation contract
        outb = np.asarray(apply_shear3_pallas(
            plan, jnp.asarray(q, jnp.bfloat16), interpret=True))
        assert np.abs(outb.astype(np.float64) - ref).max() < 2e-2, dec


def test_pallas_interpret_u8():
    from aainterp.ops.pallas_shear3 import apply_shear3_pallas

    spec = aa.make_grid_spec((64, 64), 1.0, 1.0, (32.0, 32.0), 30.0)
    plan = build_shear3_plan(spec)
    q = RNG.integers(0, 256, (64, 64), dtype=np.uint8)
    out = np.asarray(apply_shear3_pallas(plan, jnp.asarray(q),
                                         interpret=True))
    assert out.dtype == np.uint8
    ref = apply_shear3_np(plan, q.astype(np.float64))
    cov = plan.inv_cov > 0
    # bf16 staging of integer content + one final quantisation
    assert np.abs(out.astype(np.float64) - ref)[cov].max() <= 2.0


def test_gradients_flow():
    """The pipeline is linear; XLA autodiff gives the exact transpose."""
    spec = aa.make_grid_spec((32, 32), 1.0, 1.0, (16.0, 16.0), 20.0)
    plan = build_shear3_plan(spec)
    arrs = plan_arrays(plan)

    def f(x):
        return jnp.sum(apply_shear3_xla(plan, x, arrs) ** 2)

    x = jnp.asarray(RNG.uniform(0, 1, (32, 32)).astype(np.float32))
    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    # directional derivative check
    v = jnp.asarray(RNG.uniform(-1, 1, (32, 32)).astype(np.float32))
    eps = 1e-3
    fd = (f(x + eps * v) - f(x - eps * v)) / (2 * eps)
    an = jnp.vdot(g, v)
    assert abs(float(fd - an)) < 5e-2 * max(1.0, abs(float(an)))


def test_api_differentiable_routes_to_xla():
    """mode='shear' + differentiable=True must grad (XLA natively on
    CPU; on TPU the Pallas route carries the custom VJP — see
    test_pallas_custom_vjp below)."""
    src = jnp.asarray(_smooth(48, 48).astype(np.float32))

    def loss(x):
        return jnp.sum(aa.area_average_interpolate(
            x, 1.0, 1.0, (24.0, 24.0), 30.0, mode="shear",
            differentiable=True).dst ** 2)

    g = jax.grad(loss)(src)
    assert np.isfinite(np.asarray(g)).all()


def test_fuzz_pallas_vs_numpy():
    """Randomized geometry fuzz over both decompositions: the Pallas
    pipeline (interpret) must match the numpy reference bit-closely and
    conserve flux, across scales, ratios, angles, quadrants, aspect
    ratios, and edge isocenters."""
    from aainterp.ops.pallas_shear3 import apply_shear3_pallas

    rng = np.random.default_rng(99)
    for trial in range(8):
        H = int(rng.integers(24, 90))
        W = int(rng.integers(24, 90))
        sr = float(rng.uniform(0.5, 3.0))
        dr = float(rng.uniform(0.4, 3.0) * sr)
        ang = float(rng.uniform(1.0, 359.0))
        spec = aa.make_grid_spec(
            (H, W), sr, dr,
            (float(rng.uniform(0, W)), float(rng.uniform(0, H))), ang)
        if spec.is_axis_aligned:
            continue
        qH, qW = spec.qrot_shape
        q = rng.uniform(0, 1, (qH, qW)).astype(np.float32)
        for dec in _decs_for(spec):
            plan = build_shear3_plan(spec, decomposition=dec)
            ref = apply_shear3_np(plan, q)
            got = np.asarray(apply_shear3_pallas(
                plan, jnp.asarray(q), mid_dtype=jnp.float32,
                interpret=True))
            np.testing.assert_allclose(
                got, ref, atol=5e-6,
                err_msg=f"trial {trial} {dec} {H}x{W} {sr}->{dr} {ang}")
            # flux accounting: never duplicated, and exactly conserved
            # when the dst bbox covers the footprint (quadrant 0 — at
            # quadrant >= 1 the reference's unmapped-isocenter quirk,
            # grids.py docstring / Source.cpp:173-174, can CROP the
            # rotated image for off-center isocenters; shear3 matches
            # the exact operator's capture there — see
            # test_quirk_cropping_matches_exact_mode)
            m = max(3, qH // 4, qW // 4)
            qq = np.zeros((qH, qW))
            if qH > 2 * m and qW > 2 * m:
                qq[m:-m, m:-m] = 1.0
                un = apply_shear3_np(plan, qq, normalize=False)
                fin = qq.sum() * spec.scale ** 2
                fout = un.sum() * spec.dst_side ** 2
                assert fout <= fin * (1 + 1e-9), (trial, dec)
                if spec.quadrant == 0:
                    assert abs(fout - fin) / fin < 1e-12, (trial, dec)


def test_quirk_cropping_matches_exact_mode():
    """At quadrant >= 1 with an off-center isocenter, the reference's
    unmapped-isocenter quirk (Source.cpp:173-174, replicated in
    make_grid_spec) places the dst bbox so that part of the rotated
    image falls OUTSIDE it and is cropped.  The shear mode inherits the
    same geometry, so its captured flux equals the exact operator's to
    machine precision — pinned on a geometry where 82% of the flux is
    quirk-cropped (found by the fuzz test, 2026-08-20); the residual
    ~1e-4 relative difference is boundary-sliver smearing at the crop
    edge (the approximate footprint differs sub-cell from the exact
    polygon there)."""
    spec = aa.make_grid_spec(
        (83, 83), 1.4550439019858459, 0.6955118658077443,
        (4.351261909932634, 72.17704716193894), 264.1240074133924)
    assert spec.quadrant == 2
    qH, qW = spec.qrot_shape
    qq = np.zeros((qH, qW))
    qq[21:-21, 21:-21] = 1.0
    src = np.rot90(qq, spec.quadrant)
    op = aa.build_operator(spec, mode="exact")
    dst = np.asarray(aa.area_average_interpolate(
        src, spec.src_resolution, spec.dst_resolution, spec.src_isocenter,
        spec.rotation_angle, mode="exact").dst, np.float64)
    flux_exact = float((dst * op.raw_row_sums).sum())
    flux_in = qq.sum() * spec.scale ** 2
    assert flux_exact < 0.2 * flux_in          # the quirk really crops
    for dec in ("xyx", "yxy"):
        plan = build_shear3_plan(spec, decomposition=dec)
        un = apply_shear3_np(plan, qq, normalize=False)
        flux_shear = float(un.sum() * spec.dst_side ** 2)
        assert abs(flux_shear - flux_exact) / flux_exact < 1e-3, dec


def test_build_operator_rejects_shear_mode():
    spec = aa.make_grid_spec((32, 32), 1.0, 0.5, (16.0, 16.0), 30.0)
    with pytest.raises(ValueError, match="operator-free"):
        aa.build_operator(spec, mode="shear")
    with pytest.raises(ValueError, match="exact/fast/compat"):
        aa.build_operator(spec, mode="bogus")


def test_pallas_custom_vjp_matches_xla_autodiff():
    """The Pallas route's custom VJP (backward = transposed pass
    pipeline on the same kernels) equals XLA autodiff's gradient, for
    both decompositions (interpret mode)."""
    from aainterp.ops.pallas_shear3 import make_shear3_linear
    from aainterp.ops.shear3 import transpose_shear3_plan

    spec = aa.make_grid_spec((48, 64), 1.0, 0.6, (32.0, 24.0), 23.0)
    qH, qW = spec.qrot_shape
    q = jnp.asarray(RNG.uniform(0, 1, (qH, qW)).astype(np.float32))
    cot = jnp.asarray(
        RNG.uniform(-1, 1, spec.dst_shape).astype(np.float32))
    for dec in ("xyx", "yxy"):
        plan = build_shear3_plan(spec, decomposition=dec)
        arrs = plan_arrays(plan)
        out_ref, vjp_ref = jax.vjp(
            lambda x: apply_shear3_xla(plan, x, arrs), q)
        gt = np.asarray(vjp_ref(cot)[0])
        fn = make_shear3_linear(plan, interpret=True)
        out, vjp = jax.vjp(fn, q)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                                   atol=3e-6)
        np.testing.assert_allclose(np.asarray(vjp(cot)[0]), gt,
                                   atol=3e-6, err_msg=dec)

    # the adjoint identity <P q, g> == <q, P^T g> holds exactly at the
    # plan level (unnormalised)
    plan = build_shear3_plan(spec)
    planT = transpose_shear3_plan(plan)
    g = RNG.uniform(0, 1, spec.dst_shape)
    qn = RNG.uniform(0, 1, (qH, qW))
    lhs = float((apply_shear3_np(plan, qn, normalize=False) * g).sum())
    rhs = float((qn * apply_shear3_np(planT, g, normalize=False)).sum())
    assert abs(lhs - rhs) / abs(lhs) < 1e-9


def test_pallas_vjp_rejects_u8():
    from aainterp.ops.pallas_shear3 import make_shear3_linear

    spec = aa.make_grid_spec((32, 32), 1.0, 1.0, (16.0, 16.0), 30.0)
    plan = build_shear3_plan(spec)
    fn = make_shear3_linear(plan, interpret=True)
    with pytest.raises(TypeError, match="float-only"):
        fn(jnp.zeros((32, 32), jnp.uint8))
