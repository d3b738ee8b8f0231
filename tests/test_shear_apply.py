"""Sheared rotated apply: exactness vs the flat ELL apply."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import aainterp as aa
from aainterp.ops.apply import apply_ell
from aainterp.ops.shear_apply import make_sheared_apply
from aainterp.ops.weights import ell_operator

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("H,W,sr,dr,ang", [
    (64, 64, 1.0, 0.5, 30.0),
    (48, 80, 1.0, 0.5, 17.0),     # non-square
    (64, 64, 1.0, 1.0, 75.0),     # scale 2, steep angle
    (32, 32, 25.4, 72.0, 10.0),   # upscale (scale 5)
    (64, 64, 1.0, 0.5, 45.0),
    (64, 64, 150.0, 25.4, 1.5),   # the film config
])
def test_sheared_matches_flat_ell(H, W, sr, dr, ang):
    spec = aa.make_grid_spec((H, W), sr, dr, (W / 2, H / 2), ang)
    op = ell_operator(spec, mode="exact")
    q = jnp.asarray(
        np.rot90(RNG.uniform(0, 1, (H, W)), -spec.quadrant).copy()
        .astype(np.float32)
    )
    ref = apply_ell(q, jnp.asarray(op.base),
                    jnp.asarray(op.weights, jnp.float32))
    fn, arrs = make_sheared_apply(op)
    got = jax.jit(lambda qq: fn(qq, **arrs))(q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_sheared_batched():
    spec = aa.make_grid_spec((48, 48), 1.0, 0.5, (24.0, 24.0), 30.0)
    op = ell_operator(spec, mode="exact")
    fn, arrs = make_sheared_apply(op)
    q = jnp.asarray(RNG.uniform(0, 1, (3, 48, 48)).astype(np.float32))
    got = jax.jit(lambda qq: fn(qq, **arrs))(q)
    ref = apply_ell(q, jnp.asarray(op.base),
                    jnp.asarray(op.weights, jnp.float32))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_sheared_window_stays_small():
    spec = aa.make_grid_spec((128, 128), 1.0, 0.5, (64.0, 64.0), 30.0)
    op = ell_operator(spec, mode="exact")
    from aainterp.ops.shear_apply import build_shear_plan

    plan = build_shear_plan(op)
    Ka, Kb = plan.weights.shape[2:]
    assert Ka <= op.window + 2 and Kb <= op.window + 2
    # re-indexing preserves total weight exactly
    np.testing.assert_allclose(
        plan.weights.sum(axis=(-1, -2)), op.weights.sum(axis=(-1, -2)),
        atol=1e-12,
    )


def test_api_sheared_impl_matches_xla():
    """apply_operator(impl='sheared') — the TPU auto-route — on CPU."""
    spec = aa.make_grid_spec((48, 48), 1.0, 0.5, (24.0, 24.0), 30.0)
    op = ell_operator(spec, mode="exact")
    src = RNG.uniform(0, 1, (48, 48)).astype(np.float32)
    ref = aa.apply_operator(op, jnp.asarray(src), impl="xla")
    got = aa.apply_operator(op, jnp.asarray(src), impl="sheared")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_sheared_quadrant_angles():
    """Residual angles in other quadrants (q handled before the shear)."""
    for ang in (120.0, 210.0, 300.0):
        spec = aa.make_grid_spec((40, 40), 1.0, 0.5, (20.0, 20.0), ang)
        op = ell_operator(spec, mode="exact")
        q = jnp.asarray(
            np.rot90(RNG.uniform(0, 1, (40, 40)), -spec.quadrant).copy()
            .astype(np.float32)
        )
        ref = apply_ell(q, jnp.asarray(op.base),
                        jnp.asarray(op.weights, jnp.float32))
        fn, arrs = make_sheared_apply(op)
        got = jax.jit(lambda qq: fn(qq, **arrs))(q)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)


def test_tiny_image_and_extreme_ratio():
    """1-ish pixel outputs and large downscale factors stay finite/sane."""
    src = RNG.uniform(0, 1, (8, 8)).astype(np.float32)
    r = aa.area_average_interpolate(src, 8.0, 1.0, (4.0, 4.0), 0.0)
    assert r.dst.shape == (1, 1)
    assert np.isfinite(np.asarray(r.dst)).all()
    r2 = aa.area_average_interpolate(src, 8.0, 1.0, (4.0, 4.0), 33.0)
    assert np.isfinite(np.asarray(r2.dst)).all()
