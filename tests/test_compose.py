"""Operator composition (compose_band / compose_separable).

The product of two banded operators is banded, so chained resampling
stages fuse into ONE operator — one apply pass, intermediate never
materialised.  Ground truth is the dense matrix product in float64.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import aainterp as aa
from aainterp.ops.overlap1d import Band1D, compose_band
from aainterp.ops.weights import compose_separable, separable_operator

RNG = np.random.default_rng(7)


def _op(shape, sr, dr, mode="exact"):
    spec = aa.make_grid_spec(shape, sr, dr, (0.0, 0.0), 0.0)
    return separable_operator(spec, mode=mode)


@pytest.mark.parametrize("srm,drm", [(2.0, 1.0), (150.0, 60.0), (1.0, 3.0)])
def test_compose_band_equals_dense_product(srm, drm):
    op1 = _op((96, 120), 4.0, srm)
    mid = (op1.wy.n_dst, op1.wx.n_dst)
    op2 = _op(mid, srm, drm)
    for outer, inner in ((op2.wy, op1.wy), (op2.wx, op1.wx)):
        comp = compose_band(outer, inner)
        np.testing.assert_allclose(
            comp.dense(), outer.dense() @ inner.dense(), atol=1e-12)
        # clamp convention preserved where possible
        assert comp.n_src == inner.n_src and comp.n_dst == outer.n_dst
        if comp.n_src >= comp.band:
            assert (comp.start + comp.band <= comp.n_src).all()
            assert (comp.start >= 0).all()


def test_compose_band_rows_stay_normalised():
    op1 = _op((64, 64), 3.0, 1.5)
    op2 = _op((op1.wy.n_dst, op1.wx.n_dst), 1.5, 0.5)
    comp = compose_band(op2.wy, op1.wy)
    np.testing.assert_allclose(comp.weights.sum(axis=1), 1.0, atol=1e-12)


def test_compose_separable_end_to_end():
    """One fused apply == two chained applies (f64 weight path)."""
    op1 = _op((100, 140), 4.0, 2.0)        # 4->2: 2x downscale
    mid = (op1.wy.n_dst, op1.wx.n_dst)
    op2 = _op(mid, 150.0, 60.0)            # non-integer second stage
    fused = compose_separable(op2, op1)
    src = jnp.asarray(RNG.uniform(0, 1, (2, 100, 140)).astype(np.float32))
    chained = aa.apply_operator(op2, aa.apply_operator(op1, src))
    one_pass = aa.apply_operator(fused, src)
    assert one_pass.shape == chained.shape
    np.testing.assert_allclose(np.asarray(one_pass), np.asarray(chained),
                               atol=1e-5)


def test_compose_separable_validates_and_caches():
    from aainterp.ops.weights import validate_operator

    op1 = _op((64, 64), 2.0, 1.0)
    op2 = _op((op1.wy.n_dst, op1.wx.n_dst), 2.0, 1.0)
    fused = compose_separable(op2, op1)
    validate_operator(fused)  # sanitizer accepts the composed operator
    # constant image -> constant output (conservation of the mean)
    const = jnp.full((1, 64, 64), 3.25, jnp.float32)
    out = aa.apply_operator(fused, const)
    np.testing.assert_allclose(np.asarray(out), 3.25, rtol=1e-6)


def test_compose_separable_rejects_mismatch_and_quadrant():
    op1 = _op((64, 64), 2.0, 1.0)
    bad = _op((48, 48), 2.0, 1.0)
    with pytest.raises(ValueError, match="chain"):
        compose_separable(bad, op1)
    spec_q = aa.make_grid_spec((64, 64), 2.0, 1.0, (4.0, 4.0), 90.0)
    op_q = separable_operator(spec_q)
    assert op_q.spec.quadrant != 0
    with pytest.raises(ValueError, match="quadrant"):
        compose_separable(op_q, op_q)


@pytest.mark.parametrize("seed", range(6))
def test_compose_band_fuzz_random_bands(seed):
    """Random bands (random starts incl. clamped/OOB entries, zero rows)
    compose to exactly the dense product."""
    rng = np.random.default_rng(seed)
    n_src = int(rng.integers(5, 60))
    n_mid = int(rng.integers(5, 60))
    n_dst = int(rng.integers(5, 60))
    ki = int(rng.integers(1, 7))
    ko = int(rng.integers(1, 7))

    def rand_band(n_d, n_s, k):
        start = rng.integers(-2, n_s + 2, size=n_d).astype(np.int32)
        w = rng.uniform(-1, 1, (n_d, k))
        w[rng.uniform(size=n_d) < 0.15] = 0.0       # empty rows
        # zero the weights of out-of-range cells (the Band1D contract)
        j = start[:, None] + np.arange(k)[None, :]
        w[(j < 0) | (j >= n_s)] = 0.0
        return Band1D(start=start, weights=w, n_src=n_s, n_dst=n_d)

    inner = rand_band(n_mid, n_src, ki)
    outer = rand_band(n_dst, n_mid, ko)
    comp = compose_band(outer, inner)
    np.testing.assert_allclose(comp.dense(),
                               outer.dense() @ inner.dense(), atol=1e-12)


def test_compose_band_identity():
    """Composing with an identity band is a no-op."""
    op = _op((80, 80), 2.0, 1.0)
    def ident(n):
        return Band1D(start=np.arange(n, dtype=np.int32),
                      weights=np.ones((n, 1)), n_src=n, n_dst=n)

    comp = compose_band(ident(op.wy.n_dst), op.wy)
    np.testing.assert_allclose(comp.dense(), op.wy.dense(), atol=0)
    comp2 = compose_band(op.wy, ident(op.wy.n_src))
    np.testing.assert_allclose(comp2.dense(), op.wy.dense(), atol=0)


def test_compose_sharded_and_adjoint():
    """Composed operators ride the sharded apply and the exact adjoint
    unchanged (they are ordinary SeparableOperators)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")
    from aainterp.parallel.sharding import sharded_apply_separable

    op1 = _op((128, 64), 2.0, 1.0)          # 128 -> 64 rows
    op2 = _op((64, 32), 2.0, 1.0)           # 64 -> 32 rows (divisible by 4)
    fused = compose_separable(op2, op1)
    frames = RNG.uniform(0, 1, (4, 128, 64)).astype(np.float32)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "rows"))
    fdev = jax.device_put(
        jnp.asarray(frames), NamedSharding(mesh, P("data", "rows", None)))
    out = jax.jit(lambda f: sharded_apply_separable(f, fused, mesh))(fdev)
    ref = aa.apply_operator(fused, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # exact adjoint: <W x, y> == <x, W^T y>
    cot = RNG.uniform(0, 1, ref.shape).astype(np.float32)
    splat = aa.apply_operator_transpose(fused, jnp.asarray(cot))
    lhs = float(np.sum(np.asarray(ref, np.float64) * cot))
    rhs = float(np.sum(frames.astype(np.float64) * np.asarray(splat)))
    assert lhs == pytest.approx(rhs, rel=1e-5)


def test_compose_regrid_chain():
    """Regrid chains fuse too: 0.5deg -> 1deg -> 2deg in one pass."""
    from aainterp.regrid import (
        LatLonGrid, area_weighted_mean, conservative_regrid_operator,
    )

    g0, g1, g2 = LatLonGrid(360, 720), LatLonGrid(180, 360), LatLonGrid(90, 180)
    by1, bx1 = conservative_regrid_operator(g0, g1)
    by2, bx2 = conservative_regrid_operator(g1, g2)
    by = compose_band(by2, by1)
    bx = compose_band(bx2, bx1)
    field = RNG.uniform(200, 300, (360, 720))
    one = by.dense() @ field @ bx.dense().T
    two = by2.dense() @ (by1.dense() @ field @ bx1.dense().T) @ bx2.dense().T
    np.testing.assert_allclose(one, two, atol=1e-9)
    # the fused chain still preserves the area-weighted global mean
    m0 = float(area_weighted_mean(field, g0))
    m2 = float(area_weighted_mean(one, g2))
    assert m2 == pytest.approx(m0, rel=1e-6)  # area_weighted_mean is f32
