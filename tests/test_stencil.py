"""Strided-stencil separable apply (ops.apply.axis_stencil_plan et al).

The flagship iso=(0,0) integer-ratio grids have constant-stride bands with
one constant interior tap vector (row 0 deviates, the last row only in
storage) — these reduce to strided slices + FMAs.  Must equal the banded
apply to accumulation rounding; non-stencil bands must be rejected.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from aainterp.api import apply_operator, build_operator
from aainterp.grids import make_grid_spec
from aainterp.ops import apply as apply_ops


def _op(shape, src_res, dst_res, iso=(0.0, 0.0), angle=0.0, mode="exact"):
    spec = make_grid_spec(shape, src_res, dst_res, iso, angle)
    return build_operator(spec, mode=mode)


def _plans(op):
    qH, qW = op.spec.qrot_shape
    return (apply_ops.axis_stencil_plan(op.wy.start, op.wy.weights, qH),
            apply_ops.axis_stencil_plan(op.wx.start, op.wx.weights, qW))


def test_flagship_geometry_has_stencil_plans():
    op = _op((64, 96), 2.0, 1.0)  # iso=(0,0) ratio-2: the flagship bands
    py, px = _plans(op)
    assert py is not None and px is not None
    assert py["m"] == 2 and px["m"] == 2
    # row 0 is the only true boundary row (the last row deviates only in
    # its clamped storage, not in its effective taps)
    assert py["i0"] == 1 and py["i1"] == 32


def test_ratio3_has_stencil_plans():
    op = _op((96, 96), 3.0, 1.0)
    py, px = _plans(op)
    assert py is not None and py["m"] == 3


def test_non_integer_ratio_rejected():
    op = _op((64, 64), 150.0, 60.0)  # ratio 2.5: strides alternate 2, 3
    py, px = _plans(op)
    assert py is None and px is None


def test_stencil_matches_banded_f32():
    op = _op((64, 96), 2.0, 1.0)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(0, 1, (3, 64, 96)).astype(np.float32))
    ref = apply_operator(op, src, impl="xla")
    got = apply_operator(op, src, impl="stencil")
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_stencil_matches_banded_ratio3_batched():
    op = _op((48, 48), 3.0, 1.0, iso=(7.25, 3.5))
    py, px = _plans(op)
    if py is None or px is None:
        pytest.skip("geometry not a stencil at this isocenter")
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.uniform(0, 1, (2, 2, 48, 48)).astype(np.float32))
    ref = apply_operator(op, src, impl="xla")
    got = apply_operator(op, src, impl="stencil")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_stencil_forced_on_non_stencil_raises():
    op = _op((64, 64), 150.0, 60.0)
    src = jnp.zeros((64, 64), jnp.float32)
    with pytest.raises(ValueError):
        apply_operator(op, src, impl="stencil")


def test_stencil_quadrant():
    op = _op((32, 64), 2.0, 1.0, angle=270.0, iso=(16.0, 16.0))
    assert op.spec.quadrant == 3
    py, px = _plans(op)
    if py is None or px is None:
        pytest.skip("quadrant geometry not a stencil here")
    rng = np.random.default_rng(2)
    src = jnp.asarray(rng.uniform(0, 1, (32, 64)).astype(np.float32))
    ref = apply_operator(op, src, impl="xla")
    got = apply_operator(op, src, impl="stencil")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_stencil_bf16_input_f32_accum():
    op = _op((64, 96), 2.0, 1.0)
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.uniform(0, 1, (64, 96)).astype(np.float32),
                      dtype=jnp.bfloat16)
    ref = apply_operator(op, src, impl="xla")
    got = apply_operator(op, src, impl="stencil")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=2e-3)  # bf16 inputs, f32 accumulation both paths
