"""aa.propagate_variance + aa.area_rotate.

Variance ground truth: for out = A x with independent pixels,
Var(out) = (A ∘ A) var — the dense elementwise-squared matrix in
float64.  New capability vs the reference (no uncertainty propagation
exists there; relevant to its dosimetry use case).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import aainterp as aa
from aainterp.ops.weights import squared_operator

RNG = np.random.default_rng(17)


def test_variance_separable_matches_dense():
    spec = aa.make_grid_spec((40, 56), 2.0, 3.0, (0.0, 0.0), 0.0)
    op = aa.build_operator(spec)
    var = RNG.uniform(0.1, 2.0, (40, 56)).astype(np.float32)
    got = np.asarray(aa.propagate_variance(op, var))
    wy, wx = op.dense()
    want = (wy ** 2) @ var.astype(np.float64) @ (wx ** 2).T
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


def test_variance_rotated_matches_dense():
    spec = aa.make_grid_spec((24, 24), 1.0, 0.8, (12.0, 12.0), 30.0)
    op = aa.build_operator(spec, method="ell")
    var = RNG.uniform(0.1, 2.0, (24, 24)).astype(np.float32)
    got = np.asarray(aa.propagate_variance(op, var))
    A = op.dense()
    want = ((A ** 2) @ var.astype(np.float64).ravel()).reshape(got.shape)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


def test_variance_monte_carlo():
    """End-to-end sanity: the propagated variance matches the empirical
    variance of the resampled noisy ensemble."""
    spec = aa.make_grid_spec((32, 32), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = aa.build_operator(spec)
    sigma = RNG.uniform(0.5, 1.5, (32, 32)).astype(np.float32)
    n = 4000
    noise = RNG.normal(0.0, 1.0, (n, 32, 32)).astype(np.float32) * sigma
    outs = np.asarray(aa.apply_operator(op, jnp.asarray(noise)))
    emp = outs.var(axis=0)
    pred = np.asarray(aa.propagate_variance(op, sigma.astype(np.float32) ** 2))
    # MC error ~ sqrt(2/n) ~ 2.2% relative; allow 5 sigma
    np.testing.assert_allclose(emp, pred, rtol=0.12)


def test_variance_reduction_bound():
    """Averaging with weights summing to 1 cannot amplify variance:
    squared row sums are <= 1, and a constant variance map shrinks by
    exactly the per-row sum-of-squares product."""
    spec = aa.make_grid_spec((64, 64), 4.0, 1.0, (0.0, 0.0), 0.0)
    op = aa.build_operator(spec)
    sq = squared_operator(op)
    sy = sq.wy.weights.sum(axis=1)
    sx = sq.wx.weights.sum(axis=1)
    assert (sy <= 1.0 + 1e-12).all() and (sx <= 1.0 + 1e-12).all()
    var = np.full((64, 64), 2.0, np.float32)
    out = np.asarray(aa.propagate_variance(op, var))
    np.testing.assert_allclose(out, 2.0 * np.outer(sy, sx), rtol=2e-5)
    assert out.max() <= 2.0 + 1e-6  # never amplified


def test_area_rotate_matches_interpolate_and_conserves():
    img = RNG.uniform(0, 1, (48, 48)).astype(np.float32)
    out = np.asarray(aa.area_rotate(img, 30.0))
    ref = aa.area_average_interpolate(img, 1.0, 1.0, (24.0, 24.0), 30.0)
    np.testing.assert_array_equal(out, np.asarray(ref.dst))
    # each dst pixel is a row-normalised MEAN: a constant image stays
    # exactly constant inside the rotated footprint, zero outside
    const = np.full((48, 48), 2.5, np.float32)
    rc = np.asarray(aa.area_rotate(const, 30.0))
    inside = rc != 0.0
    assert inside.any() and not inside.all()
    np.testing.assert_allclose(rc[inside], 2.5, rtol=1e-5)
    # custom isocenter + batched leading dims
    imgs = RNG.uniform(0, 1, (3, 48, 48)).astype(np.float32)
    out2 = np.asarray(aa.area_rotate(imgs, -17.0, isocenter=(10.0, 20.0)))
    ref2 = aa.area_average_interpolate(imgs, 1.0, 1.0, (10.0, 20.0), -17.0)
    np.testing.assert_array_equal(out2, np.asarray(ref2.dst))
