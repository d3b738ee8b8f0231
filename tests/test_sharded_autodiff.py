"""Sharded adjoints + multi-chip gradients on the virtual 8-device mesh.

The adjoint of the row-sharded apply is the row-sharded apply of the
transposed operator; its halo contributions flow BACK over the ring
(_halo_reduce, the exact transpose of _halo_extend's ppermute schedule).
Every test checks the sharded adjoint/vjp against the unsharded exact
one (which is itself dense-transpose-validated in test_autodiff.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import aainterp as aa
from aainterp import autodiff
from aainterp.ops.weights import ell_operator, separable_operator
from aainterp.parallel.sharding import (
    make_sharded_ell_linear,
    make_sharded_separable_linear,
    sharded_apply_ell_transpose,
    sharded_apply_separable_transpose,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def _mesh(data, rows):
    devs = np.asarray(jax.devices()[: data * rows]).reshape(data, rows)
    return Mesh(devs, ("data", "rows"))


RNG = np.random.default_rng(3)


def _put(mesh, x):
    return jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P("data", "rows", None)))


def test_sharded_separable_transpose_matches_unsharded():
    H, W, B = 128, 64, 4
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec)
    mesh = _mesh(2, 4)
    cot = RNG.uniform(-1, 1, (B,) + spec.dst_shape).astype(np.float32)
    cdev = _put(mesh, cot)
    out = jax.jit(lambda g: sharded_apply_separable_transpose(
        g, op, mesh))(cdev)
    ref = autodiff.apply_operator_transpose(op, jnp.asarray(cot),
                                            impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert out.sharding.spec == P("data", "rows", None)


def test_sharded_separable_transpose_quadrant():
    H, W, B = 64, 128, 2
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 180.0)
    op = separable_operator(spec)
    assert op.spec.quadrant == 2
    mesh = _mesh(2, 4)
    cot = RNG.uniform(-1, 1, (B,) + spec.dst_shape).astype(np.float32)
    out = jax.jit(lambda g: sharded_apply_separable_transpose(
        g, op, mesh))(_put(mesh, cot))
    ref = autodiff.apply_operator_transpose(op, jnp.asarray(cot),
                                            impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("angle,dr", [(12.0, 1.16), (30.0, 1.2), (62.0, 1.2)])
def test_sharded_ell_transpose_matches_unsharded(angle, dr):
    H = W = 64
    spec = aa.make_grid_spec((H, W), 2.0, dr, (0.0, 0.0), angle)
    op = ell_operator(spec)
    if op.spec.dst_shape[0] % 4 or op.spec.qrot_shape[0] % 4:
        pytest.skip("row counts not divisible by the 4-row mesh")
    mesh = _mesh(2, 4)
    B = 2
    cot = RNG.uniform(-1, 1, (B,) + op.spec.dst_shape).astype(np.float32)
    out = jax.jit(lambda g: sharded_apply_ell_transpose(
        g, op, mesh))(_put(mesh, cot))
    ref = autodiff.apply_operator_transpose(op, jnp.asarray(cot))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sharded_ell_transpose_multihop():
    # steep rotation: halo spans multiple ring hops in BOTH directions
    H = W = 64
    # 2.0/0.9 at 55 deg: halo 44 rows over sb=8 blocks -> SIX ring hops
    spec = aa.make_grid_spec((H, W), 2.0, 0.9, (0.0, 0.0), 55.0)
    op = ell_operator(spec)
    Hd, qH = op.spec.dst_shape[0], op.spec.qrot_shape[0]
    assert Hd % 8 == 0 and qH % 8 == 0
    mesh = Mesh(np.asarray(jax.devices()).reshape(1, 8), ("data", "rows"))
    cot = RNG.uniform(-1, 1, (1,) + op.spec.dst_shape).astype(np.float32)
    out = jax.jit(lambda g: sharded_apply_ell_transpose(
        g, op, mesh))(_put(mesh, cot))
    ref = autodiff.apply_operator_transpose(op, jnp.asarray(cot))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sharded_separable_grad():
    H, W, B = 128, 64, 4
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec)
    mesh = _mesh(2, 4)
    lin = make_sharded_separable_linear(op, mesh, interpret=True)
    frames = RNG.uniform(0, 1, (B, H, W)).astype(np.float32)
    tgt = RNG.uniform(0, 1, (B,) + spec.dst_shape).astype(np.float32)
    tdev = _put(mesh, tgt)

    def loss(f):
        r = lin(f) - tdev
        return jnp.sum(r * r)

    g = jax.jit(jax.grad(loss))(_put(mesh, frames))

    def loss_ref(f):
        r = aa.apply_operator(op, f, impl="xla") - jnp.asarray(tgt)
        return jnp.sum(r * r)

    g_ref = jax.grad(loss_ref)(jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


def test_sharded_ell_grad():
    H = W = 64
    spec = aa.make_grid_spec((H, W), 2.0, 1.12, (0.0, 0.0), 25.0)
    op = ell_operator(spec)
    assert not (op.spec.dst_shape[0] % 4 or op.spec.qrot_shape[0] % 4)
    mesh = _mesh(2, 4)
    lin = make_sharded_ell_linear(op, mesh, impl="xla")
    base = jnp.asarray(op.base)
    w = jnp.asarray(op.weights, jnp.float32)
    frames = RNG.uniform(0, 1, (2, H, W)).astype(np.float32)

    g = jax.jit(jax.grad(lambda f: jnp.sum(lin(f, base, w) ** 2)))(
        _put(mesh, frames))

    def loss_ref(f):
        return jnp.sum(aa.apply_operator(op, f, impl="xla") ** 2)

    g_ref = jax.grad(loss_ref)(jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


@pytest.mark.parametrize("angle", (90.0, 270.0))
def test_sharded_transpose_folded_odd_quadrants(angle):
    # quadrant folding in the adjoint: the dst cotangent pays the small
    # inverse permutation, the output lands in source orientation with
    # no global rot90 (the old source-sized all-to-all)
    H = W = 128
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (2.0, 6.0), angle)
    op = separable_operator(spec)
    assert op.spec.quadrant in (1, 3)
    mesh = _mesh(2, 4)
    cot = RNG.uniform(-1, 1, (2,) + spec.dst_shape).astype(np.float32)
    out = jax.jit(lambda g: sharded_apply_separable_transpose(
        g, op, mesh))(_put(mesh, cot))
    ref = autodiff.apply_operator_transpose(op, jnp.asarray(cot),
                                            impl="xla")
    assert out.shape == (2, H, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("angle", (90.0, 180.0))
def test_sharded_grad_folded_quadrant(angle):
    # jit(grad) of a sharded scalar loss through the folded forward AND
    # folded backward on the virtual mesh
    H = W = 128
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), angle)
    op = separable_operator(spec)
    mesh = _mesh(2, 4)
    lin = make_sharded_separable_linear(op, mesh, impl="banded")
    frames = RNG.uniform(0, 1, (2, H, W)).astype(np.float32)
    tgt = RNG.uniform(0, 1, (2,) + spec.dst_shape).astype(np.float32)
    tdev = _put(mesh, tgt)

    def loss(f):
        return jnp.sum((lin(f) - tdev) ** 2)

    g = jax.jit(jax.grad(loss))(_put(mesh, frames))

    def loss_ref(f):
        out = aa.apply_operator(op, f, impl="xla", differentiable=True)
        return jnp.sum((out - jnp.asarray(tgt)) ** 2)

    g_ref = jax.grad(loss_ref)(jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=2e-4)


@pytest.mark.parametrize("angle", (121.5, 211.5, 301.5))
def test_sharded_ell_transpose_quadrant_folded(angle):
    """quadrant != 0 ELL adjoint: the dst cotangent pays the small
    inverse permutation (ell_fold_post_inv) and the scatter lands in the
    original source orientation — no source-sized inverse rot90."""
    spec = aa.make_grid_spec((128, 96), 1.0, 0.5, (48.0, 64.0), angle)
    assert spec.quadrant in (1, 2, 3)
    op = ell_operator(spec, mode="exact")
    from aainterp.ops.weights import fold_quadrant_ell

    fop = fold_quadrant_ell(op)[0]
    assert fop.spec.dst_shape[0] % 4 == 0
    assert fop.spec.qrot_shape[0] % 4 == 0
    mesh = _mesh(2, 4)
    cot = RNG.uniform(-1, 1, (2,) + op.spec.dst_shape).astype(np.float32)
    # the TRUE dst rows (e.g. 74) may not divide the mesh — that's the
    # point of the fold; the inverse permutation re-orients to the
    # folded (divisible) layout, so the cotangent arrives unsharded here
    out = jax.jit(lambda g: sharded_apply_ell_transpose(
        g, op, mesh))(jnp.asarray(cot))
    ref = autodiff.apply_operator_transpose(op, jnp.asarray(cot))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, err_msg=str(angle))


def test_sharded_ell_linear_fold_only_geometry():
    """ADVICE r4 finding 1: make_sharded_ell_linear must be grad-able at
    geometries the fold newly enabled (true dst rows don't divide the
    mesh; explicit argument tables fold ON DEVICE,
    weights.fold_tables_device)."""
    spec = aa.make_grid_spec((128, 96), 1.0, 0.5, (48.0, 64.0), 121.5)
    op = ell_operator(spec, mode="exact")
    assert op.spec.dst_shape[0] % 4 != 0  # fold-only: 74 rows, 4 shards
    mesh = _mesh(2, 4)
    lin = make_sharded_ell_linear(op, mesh, impl="xla")
    base = jnp.asarray(op.base)
    w = jnp.asarray(op.weights, jnp.float32)
    frames = RNG.uniform(0, 1, (2, 128, 96)).astype(np.float32)
    fdev = jnp.asarray(frames)
    out = jax.jit(lambda f: lin(f, base, w))(fdev)
    ref = aa.apply_operator(op, fdev, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)
    g = jax.jit(jax.grad(lambda f: jnp.sum(lin(f, base, w) ** 2)))(fdev)
    g_ref = jax.grad(lambda f: jnp.sum(
        aa.apply_operator(op, f, impl="xla") ** 2))(fdev)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-4)


def test_sharded_ell_eager_fold_only_geometry():
    """ADVICE r4 finding 2: eager (non-jit) sharded applies at folded
    geometries whose TRUE dst doesn't divide the mesh must work — the
    post-permutation sharding hint is skipped outside tracing."""
    from aainterp.parallel.sharding import sharded_apply_ell

    spec = aa.make_grid_spec((128, 96), 1.0, 0.5, (48.0, 64.0), 121.5)
    op = ell_operator(spec, mode="exact")
    mesh = _mesh(2, 4)
    frames = jnp.asarray(
        RNG.uniform(0, 1, (2, 128, 96)).astype(np.float32))
    out = sharded_apply_ell(frames, op, mesh, impl="xla")  # no jit
    ref = aa.apply_operator(op, frames, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def test_sharded_impl_typos_raise():
    """ADVICE r4 finding 3: unknown impl strings raise on every sharded
    apply instead of silently running the slow local path."""
    from aainterp.parallel.sharding import (
        sharded_apply_ell, sharded_apply_separable,
    )
    from aainterp.ops.weights import separable_operator

    mesh = _mesh(2, 4)
    spec_s = aa.make_grid_spec((128, 64), 2.0, 1.0, (0.0, 0.0), 0.0)
    op_s = separable_operator(spec_s)
    frames = jnp.asarray(
        RNG.uniform(0, 1, (2, 128, 64)).astype(np.float32))
    with pytest.raises(ValueError, match="unknown impl"):
        sharded_apply_separable(frames, op_s, mesh, impl="palas")
    spec_r = aa.make_grid_spec((128, 96), 1.0, 0.5, (48.0, 64.0), 14.0)
    op_r = ell_operator(spec_r, mode="exact")
    frames_r = jnp.asarray(
        RNG.uniform(0, 1, (2, 128, 96)).astype(np.float32))
    with pytest.raises(ValueError, match="unknown impl"):
        sharded_apply_ell(frames_r, op_r, mesh, impl="sheared")
