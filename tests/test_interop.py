"""Torch <-> jax DLPack bridging (aainterp/interop.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

import aainterp as aa
from aainterp.interop import apply_operator_torch, from_torch, to_torch

RNG = np.random.default_rng(31)


def test_roundtrip_values_and_zero_copy_cpu():
    t = torch.rand(3, 16, 16)
    x = from_torch(t)
    assert x.shape == (3, 16, 16) and x.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(x), t.numpy())
    back = to_torch(x)
    np.testing.assert_array_equal(back.numpy(), t.numpy())


def test_from_torch_noncontiguous():
    t = torch.rand(8, 8).T  # non-contiguous view
    x = from_torch(t)
    np.testing.assert_array_equal(np.asarray(x), t.numpy())


def test_apply_operator_torch_matches_jax():
    spec = aa.make_grid_spec((64, 64), 2.0, 1.0, (32.0, 32.0), 0.0)
    op = aa.build_operator(spec)
    t = torch.rand(2, 64, 64)
    out = apply_operator_torch(op, t)
    assert isinstance(out, torch.Tensor)
    want = np.asarray(aa.apply_operator(op, jnp.asarray(t.numpy())))
    np.testing.assert_allclose(out.numpy(), want, atol=1e-6)


def test_apply_operator_torch_rotated_and_grad_tensor():
    spec = aa.make_grid_spec((48, 48), 1.0, 1.0, (24.0, 24.0), 30.0)
    op = aa.build_operator(spec)
    t = torch.rand(48, 48, requires_grad=True)  # detach() handles this
    out = apply_operator_torch(op, t)
    want = np.asarray(aa.apply_operator(op, jnp.asarray(t.detach().numpy())))
    np.testing.assert_allclose(out.numpy(), want, atol=1e-6)
