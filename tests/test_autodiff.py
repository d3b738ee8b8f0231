"""Custom VJPs / adjoint apply (aainterp.autodiff).

The operator is linear, so every gradient identity here is exact up to fp
rounding: the VJP of ``apply`` IS the transposed operator, and
``<apply(u), v> == <u, apply_T(v)>`` (adjoint identity).  New capability
vs the forward-only reference (Source.cpp:55-911).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aainterp import autodiff
from aainterp.api import apply_operator, build_operator
from aainterp.grids import make_grid_spec
from aainterp.ops import overlap1d
from aainterp.ops.apply import (apply_ell, apply_ell_transpose,
                                apply_separable_banded)

RNG = np.random.default_rng(7)


# ----------------------------------------------------------------------
# transpose_band
# ----------------------------------------------------------------------


@pytest.mark.parametrize("n_dst,n_src,side,scale,iso", [
    (16, 32, 2.0, 1, 0.0),
    (25, 64, 2.56, 1, 0.37),
    (40, 20, 0.5, 1, 0.0),      # upscale: taller than wide
    (7, 100, 14.3, 2, 0.11),    # wide band
])
def test_transpose_band_dense(n_dst, n_src, side, scale, iso):
    b = overlap1d.overlap_band_1d(n_dst, n_src, side, scale, iso)
    t = overlap1d.transpose_band(b)
    assert t.n_dst == n_src and t.n_src == n_dst
    np.testing.assert_array_equal(t.dense(), b.dense().T)


def test_transpose_band_involution_dense():
    b = overlap1d.overlap_band_1d(33, 77, 2.3, 1, 0.5)
    tt = overlap1d.transpose_band(overlap1d.transpose_band(b))
    np.testing.assert_array_equal(tt.dense(), b.dense())


# ----------------------------------------------------------------------
# apply_ell_transpose
# ----------------------------------------------------------------------


def _rot_op(shape=(40, 44), angle=17.0):
    spec = make_grid_spec(shape, 2.0, 1.5, (3.0, 5.0), angle)
    return build_operator(spec, method="ell")


def test_ell_transpose_matches_dense():
    op = _rot_op()
    qH, qW = op.spec.qrot_shape
    Hd, Wd = op.spec.dst_shape
    g = RNG.uniform(-1, 1, (Hd, Wd)).astype(np.float32)
    got = apply_ell_transpose(
        jnp.asarray(g), jnp.asarray(op.base),
        jnp.asarray(op.weights, jnp.float32), (qH, qW))
    want = (op.dense().T.astype(np.float32) @ g.reshape(-1)).reshape(qH, qW)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_ell_transpose_batched():
    op = _rot_op((32, 36), 9.0)
    qH, qW = op.spec.qrot_shape
    Hd, Wd = op.spec.dst_shape
    g = RNG.uniform(-1, 1, (3, Hd, Wd)).astype(np.float32)
    got = apply_ell_transpose(
        jnp.asarray(g), jnp.asarray(op.base),
        jnp.asarray(op.weights, jnp.float32), (qH, qW))
    for i in range(3):
        want = (op.dense().T.astype(np.float32)
                @ g[i].reshape(-1)).reshape(qH, qW)
        np.testing.assert_allclose(np.asarray(got[i]), want, atol=1e-5)


# ----------------------------------------------------------------------
# adjoint identity  <A u, v> == <u, A^T v>
# ----------------------------------------------------------------------


@pytest.mark.parametrize("angle,method", [
    (0.0, "separable"),
    (0.0, "separable"),
    (23.0, "ell"),
])
def test_adjoint_identity(angle, method):
    spec = make_grid_spec((48, 56), 2.0, 1.1, (1.0, 2.0), angle)
    op = build_operator(spec, method=method)
    H, W = spec.src_shape
    u = jnp.asarray(RNG.uniform(0, 1, (H, W)).astype(np.float32))
    v = jnp.asarray(
        RNG.uniform(-1, 1, spec.dst_shape).astype(np.float32))
    au = apply_operator(op, u, impl="xla")
    atv = autodiff.apply_operator_transpose(op, v, impl="xla")
    lhs = float(jnp.vdot(au.astype(jnp.float32), v))
    rhs = float(jnp.vdot(u, atv.astype(jnp.float32)))
    assert abs(lhs - rhs) <= 1e-3 * max(1.0, abs(lhs))


def test_adjoint_identity_quadrant():
    # 90-deg quadrant: the transpose must invert the rot90 pre-rotation
    spec = make_grid_spec((40, 64), 2.0, 1.0, (0.0, 0.0), 90.0)
    op = build_operator(spec)
    assert op.spec.quadrant == 1
    u = jnp.asarray(RNG.uniform(0, 1, (40, 64)).astype(np.float32))
    v = jnp.asarray(RNG.uniform(-1, 1, spec.dst_shape).astype(np.float32))
    au = apply_operator(op, u, impl="xla")
    atv = autodiff.apply_operator_transpose(op, v, impl="xla")
    assert atv.shape == u.shape
    lhs = float(jnp.vdot(au, v))
    rhs = float(jnp.vdot(u, atv))
    assert abs(lhs - rhs) <= 1e-3 * max(1.0, abs(lhs))


# ----------------------------------------------------------------------
# custom VJPs vs native autodiff
# ----------------------------------------------------------------------


def test_separable_custom_vjp_matches_native():
    spec = make_grid_spec((48, 64), 2.0, 1.0, (0.5, 0.5), 0.0)
    op = build_operator(spec)
    src = jnp.asarray(RNG.uniform(0, 1, (48, 64)).astype(np.float32))
    cot = jnp.asarray(
        RNG.uniform(-1, 1, op.spec.dst_shape).astype(np.float32))

    _, pull_native = jax.vjp(
        lambda s: apply_operator(op, s, impl="xla"), src)
    _, pull_custom = jax.vjp(
        lambda s: apply_operator(op, s, impl="xla", differentiable=True),
        src)
    np.testing.assert_allclose(
        np.asarray(pull_custom(cot)[0]), np.asarray(pull_native(cot)[0]),
        atol=1e-5)


def test_separable_custom_vjp_pallas_interpret():
    # the Pallas-kind wrapper end to end in interpret mode (CPU)
    spec = make_grid_spec((64, 128), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = build_operator(spec)
    lin = autodiff.separable_linear_for(op, jnp.float32, "pallas",
                                        interpret=True)
    src = jnp.asarray(RNG.uniform(0, 1, (2, 64, 128)).astype(np.float32))
    cot = jnp.asarray(
        RNG.uniform(-1, 1, (2,) + op.spec.dst_shape).astype(np.float32))
    out, pull = jax.vjp(lin, src)
    ref = apply_operator(op, src, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    _, pull_ref = jax.vjp(lambda s: apply_operator(op, s, impl="xla"), src)
    np.testing.assert_allclose(
        np.asarray(pull(cot)[0]), np.asarray(pull_ref(cot)[0]), atol=1e-5)


def test_ell_custom_vjp_matches_native():
    op = _rot_op((36, 40), 21.0)
    H, W = op.spec.src_shape
    src = jnp.asarray(RNG.uniform(0, 1, (H, W)).astype(np.float32))
    cot = jnp.asarray(
        RNG.uniform(-1, 1, op.spec.dst_shape).astype(np.float32))
    _, pull_native = jax.vjp(
        lambda s: apply_operator(op, s, impl="xla"), src)
    _, pull_custom = jax.vjp(
        lambda s: apply_operator(op, s, impl="xla", differentiable=True),
        src)
    np.testing.assert_allclose(
        np.asarray(pull_custom(cot)[0]), np.asarray(pull_native(cot)[0]),
        atol=1e-5)


def test_ell_custom_vjp_sheared_kind():
    # rotated custom VJP over the shear-aligned forward: forward matches
    # the flat-gather apply, backward matches the dense transpose
    op = _rot_op((64, 64), 30.0)
    H, W = op.spec.src_shape
    src = jnp.asarray(RNG.uniform(0, 1, (H, W)).astype(np.float32))
    cot = jnp.asarray(
        RNG.uniform(-1, 1, op.spec.dst_shape).astype(np.float32))
    out, pull = jax.vjp(
        lambda s: apply_operator(op, s, impl="sheared",
                                 differentiable=True), src)
    ref = apply_operator(op, src, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    qH, qW = op.spec.qrot_shape
    want = (op.dense().T.astype(np.float32)
            @ np.asarray(cot).reshape(-1)).reshape(qH, qW)
    np.testing.assert_allclose(
        np.asarray(pull(cot)[0]), want, atol=1e-5)


def test_grad_through_area_average_interpolate():
    src = jnp.asarray(RNG.uniform(0, 1, (40, 40)).astype(np.float32))

    def loss(s):
        from aainterp import area_average_interpolate
        r = area_average_interpolate(s, 2.0, 1.0, (0.0, 0.0), 15.0,
                                     differentiable=True)
        return jnp.sum(r.dst ** 2)

    g = jax.grad(loss)(src)
    assert g.shape == src.shape and bool(jnp.isfinite(g).all())
    # directional derivative check against finite differences
    d = jnp.asarray(RNG.uniform(-1, 1, (40, 40)).astype(np.float32))
    eps = 1e-3
    fd = (loss(src + eps * d) - loss(src - eps * d)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, d)), float(fd),
                               rtol=5e-2, atol=5e-3)


def test_jit_grad_separable_pallas_kind():
    # jit(grad(...)) over the custom-vjp'd callable compiles and matches
    spec = make_grid_spec((64, 128), 4.0, 1.0, (0.0, 0.0), 0.0)
    op = build_operator(spec)
    lin = autodiff.separable_linear_for(op, jnp.float32, "pallas",
                                        interpret=True)
    src = jnp.asarray(RNG.uniform(0, 1, (64, 128)).astype(np.float32))
    g = jax.jit(jax.grad(lambda s: jnp.sum(lin(s))))(src)
    ty, tx = autodiff.transposed_separable(op)
    want = apply_separable_banded(
        jnp.ones((1,) + op.spec.dst_shape, jnp.float32),
        jnp.asarray(ty.start), jnp.asarray(ty.weights, jnp.float32),
        jnp.asarray(tx.start), jnp.asarray(tx.weights, jnp.float32))[0]
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), atol=1e-5)


def test_separable_linear_cache_survives_first_call_in_trace():
    """First separable_linear_for call INSIDE a jit trace must not poison
    the LRU cache: JAX 0.9 lifts trace-time jnp.asarray(numpy) to tracers,
    so a cached closure built during tracing used to raise
    UnexpectedTracerError on every later eager call.  The cache now stores
    host numpy tables only (converted at use time)."""
    autodiff._SEP_LINEAR_CACHE.clear()
    spec = make_grid_spec((48, 48), 150.0, 75.0, (24.0, 24.0), 0.0)
    op = build_operator(spec)
    src = jnp.asarray(RNG.uniform(0, 1, (48, 48)).astype(np.float32))

    @jax.jit
    def loss(x):
        return jnp.sum(autodiff.separable_linear_for(op, jnp.float32,
                                                     "xla")(x))

    inside = float(loss(src))
    # same cached closure, now outside any trace
    lin = autodiff.separable_linear_for(op, jnp.float32, "xla")
    outside = float(jnp.sum(lin(src)))
    np.testing.assert_allclose(inside, outside, rtol=1e-6)
    # and gradients still flow through the cached closure
    g = jax.grad(lambda s: jnp.sum(lin(s)))(src)
    assert np.isfinite(np.asarray(g)).all()


# ----------------------------------------------------------------------
# fuzz: transpose exactness across modes and random geometries
# ----------------------------------------------------------------------


def test_transpose_band_fuzz_modes():
    rng = np.random.default_rng(11)
    for _ in range(20):
        n_dst = int(rng.integers(3, 60))
        n_src = int(rng.integers(3, 90))
        side = float(rng.uniform(0.3, 6.0))
        iso = float(rng.uniform(-0.5, 0.5))
        for gen in (overlap1d.overlap_band_1d, overlap1d.count_band_1d):
            b = gen(n_dst, n_src, side, 1, iso)
            t = overlap1d.transpose_band(b)
            np.testing.assert_array_equal(t.dense(), b.dense().T)


def test_adjoint_identity_fuzz():
    rng = np.random.default_rng(13)
    for _ in range(6):
        H = int(rng.integers(24, 56))
        W = int(rng.integers(24, 56))
        angle = float(rng.uniform(0, 80))
        mode = rng.choice(["exact", "fast", "compat"])
        spec = make_grid_spec((H, W), 2.0, float(rng.uniform(0.8, 2.0)),
                              (float(rng.uniform(0, W)),
                               float(rng.uniform(0, H))), angle)
        method = "separable" if spec.is_axis_aligned else "ell"
        if mode == "compat" and method == "separable":
            mode = "exact"
        op = build_operator(spec, mode=str(mode), method=method)
        u = jnp.asarray(RNG.uniform(0, 1, (H, W)).astype(np.float32))
        v = jnp.asarray(
            RNG.uniform(-1, 1, spec.dst_shape).astype(np.float32))
        lhs = float(jnp.vdot(apply_operator(op, u, impl="xla"), v))
        rhs = float(jnp.vdot(u, autodiff.apply_operator_transpose(op, v)))
        assert abs(lhs - rhs) <= 2e-3 * max(1.0, abs(lhs)), (
            H, W, angle, mode, lhs, rhs)


def test_differentiable_ell_quadrant_folded():
    """Round 4: the differentiable single-chip ELL route folds quadrants
    too — forward matches the non-differentiable apply and the gradient
    matches the public adjoint, with neither direction materialising a
    source-sized rot90."""
    from aainterp.autodiff import apply_operator_transpose
    from aainterp.ops.weights import ell_operator

    rng = np.random.default_rng(23)
    for ang in (121.5, 211.5, 301.5):
        spec = make_grid_spec((40, 32), 1.0, 0.5, (16.0, 20.0), ang)
        assert spec.quadrant in (1, 2, 3)
        op = ell_operator(spec, mode="exact")
        src = jnp.asarray(rng.uniform(0, 1, (40, 32)).astype(np.float32))
        out = apply_operator(op, src, impl="xla")
        g_ref = apply_operator_transpose(op, 2.0 * out)
        # every differentiable kind rides the same folded wrapper
        # (xla flat-gather, sheared re-indexing; pallas falls back to
        # sheared off its envelope on CPU, still exercising the fold)
        for impl in ("xla", "sheared"):
            out_d = apply_operator(op, src, impl=impl,
                                   differentiable=True)
            np.testing.assert_allclose(
                np.asarray(out_d), np.asarray(out), atol=1e-5,
                err_msg=f"{ang} {impl}")
            g = jax.grad(lambda s: jnp.sum(apply_operator(
                op, s, impl=impl, differentiable=True) ** 2))(src)
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(g_ref), atol=1e-5,
                err_msg=f"{ang} {impl}")
