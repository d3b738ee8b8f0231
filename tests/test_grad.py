"""Differentiability of the apply stage (new capability vs the reference).

The resampling operator is linear, so JAX autodiff gives exact gradients:
d/d(src) sum(W @ src) = column sums of W (each source cell's total
normalised contribution).  All XLA apply paths (banded, stencil, box, ELL)
must agree under grad — enabling gradient-based use (deformable
registration, differentiable pipelines) the C++ reference cannot serve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aainterp.api import apply_operator, build_operator
from aainterp.grids import make_grid_spec


def _colsums_separable(op):
    wy, wx = op.wy.dense(), op.wx.dense()
    return np.outer(wy.sum(axis=0), wx.sum(axis=0))


def test_grad_banded_equals_column_sums():
    spec = make_grid_spec((24, 32), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = build_operator(spec)
    f = lambda s: jnp.sum(apply_operator(op, s, impl="xla"))
    g = jax.grad(f)(jnp.ones((24, 32), jnp.float32))
    np.testing.assert_allclose(np.asarray(g), _colsums_separable(op),
                               rtol=0, atol=1e-6)


def test_grad_stencil_matches_banded():
    spec = make_grid_spec((48, 64), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = build_operator(spec)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(0, 1, (48, 64)).astype(np.float32))
    cot = jnp.asarray(rng.uniform(-1, 1, op.spec.dst_shape).astype(np.float32))

    def vjp_of(impl):
        _, pull = jax.vjp(lambda s: apply_operator(op, s, impl=impl), src)
        return np.asarray(pull(cot)[0])

    np.testing.assert_allclose(vjp_of("stencil"), vjp_of("xla"),
                               rtol=0, atol=1e-5)


def test_grad_box_matches_banded():
    spec = make_grid_spec((24, 24), 2.0, 1.0, (0.5, 0.5), 0.0)
    op = build_operator(spec)
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.uniform(0, 1, (24, 24)).astype(np.float32))
    cot = jnp.asarray(rng.uniform(-1, 1, op.spec.dst_shape).astype(np.float32))

    def vjp_of(impl):
        _, pull = jax.vjp(lambda s: apply_operator(op, s, impl=impl), src)
        return np.asarray(pull(cot)[0])

    np.testing.assert_allclose(vjp_of("box"), vjp_of("xla"),
                               rtol=0, atol=1e-6)


def test_grad_rotated_ell():
    spec = make_grid_spec((20, 20), 1.0, 0.5, (10.0, 10.0), 30.0)
    op = build_operator(spec)
    src = jnp.ones((20, 20), jnp.float32)
    g = jax.grad(lambda s: jnp.sum(apply_operator(op, s, impl="xla")))(src)
    # column sums of the ELL operator: scatter the normalised weights
    Hd, Wd = spec.dst_shape
    K = op.weights.shape[-1]
    cs = np.zeros((20, 20))
    base = np.asarray(op.base)
    w = np.asarray(op.weights)
    for dy in range(Hd):
        for dx in range(Wd):
            ry, rx = base[dy, dx]
            for a in range(K):
                for b in range(K):
                    y, x = ry + a, rx + b
                    if 0 <= y < 20 and 0 <= x < 20:
                        cs[y, x] += w[dy, dx, a, b]
    np.testing.assert_allclose(np.asarray(g), cs, rtol=0, atol=1e-5)


def test_jvp_linearity():
    spec = make_grid_spec((24, 32), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = build_operator(spec)
    rng = np.random.default_rng(2)
    src = jnp.asarray(rng.uniform(0, 1, (24, 32)).astype(np.float32))
    tan = jnp.asarray(rng.uniform(-1, 1, (24, 32)).astype(np.float32))
    f = lambda s: apply_operator(op, s, impl="xla")
    _, jv = jax.jvp(f, (src,), (tan,))
    np.testing.assert_allclose(np.asarray(jv), np.asarray(f(tan)),
                               rtol=0, atol=1e-6)  # linear operator
