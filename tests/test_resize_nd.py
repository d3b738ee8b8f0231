"""aa.area_resize_nd / aa.area_pyramid: N-D conservative resize.

New capability vs the reference (strictly 2-D, Source.cpp:30
``IMG = vector<vector<double>>``).  Ground truth: per-axis dense float64
interval-overlap operators contracted with einsum.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import aainterp as aa

RNG = np.random.default_rng(23)


def _dense_axis(n_src, n_dst):
    """(n_dst, n_src) exact interval-overlap row-mean operator, f64."""
    se = np.linspace(0.0, n_src, n_src + 1)
    de = np.linspace(0.0, n_src, n_dst + 1)
    w = np.maximum(
        0.0,
        np.minimum(de[1:, None], se[None, 1:])
        - np.maximum(de[:-1, None], se[None, :-1]),
    )
    return w / w.sum(axis=1, keepdims=True)


def _dense_resize(vol, axes, sizes):
    out = np.asarray(vol, np.float64)
    for ax, s in zip(axes, sizes):
        A = _dense_axis(out.shape[ax], s)
        out = np.moveaxis(
            np.tensordot(A, np.moveaxis(out, ax, 0), axes=1), 0, ax)
    return out


@pytest.mark.parametrize("shape,dst", [
    ((12, 40, 56), (5, 17, 23)),   # 3-D ragged downscale
    ((6, 20, 20), (13, 20, 9)),    # depth upscale, H identity, W down
    ((9, 16, 24), (9, 16, 24)),    # full identity
])
def test_resize_nd_matches_dense_3d(shape, dst):
    vol = RNG.uniform(0, 1, shape)
    out = np.asarray(aa.area_resize_nd(jnp.asarray(vol, jnp.float32), dst))
    want = _dense_resize(vol, (0, 1, 2), dst)
    assert out.shape == dst
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_resize_nd_integer_ratio_axis_takes_aligned_path(monkeypatch):
    """Integer-ratio non-trailing axes run the aligned reshape + tap-sum
    contraction (no gather) and still match the dense f64 reference."""
    import aainterp.ops.apply as apply_mod

    calls = []
    real = apply_mod.apply_aligned_axis
    monkeypatch.setattr(
        apply_mod, "apply_aligned_axis",
        lambda *a, **k: (calls.append(1), real(*a, **k))[1])
    vol = RNG.uniform(0, 1, (12, 40, 56))
    out = np.asarray(aa.area_resize_nd(
        jnp.asarray(vol, jnp.float32), (4, 17, 23)))  # depth 12 -> 4 (m=3)
    assert calls, "integer-ratio depth axis did not take the aligned path"
    want = _dense_resize(vol, (0, 1, 2), (4, 17, 23))
    np.testing.assert_allclose(out, want, atol=1e-5)
    # fractional depth falls back to the banded gather
    calls.clear()
    out2 = np.asarray(aa.area_resize_nd(
        jnp.asarray(vol, jnp.float32), (5, 17, 23)))
    assert not calls
    np.testing.assert_allclose(out2, _dense_resize(vol, (0, 1, 2),
                                                   (5, 17, 23)), atol=1e-5)


def test_resize_nd_conserves_mean_3d():
    vol = RNG.uniform(0, 2, (11, 37, 29))
    for dst in [(4, 13, 10), (23, 50, 61)]:
        out = np.asarray(
            aa.area_resize_nd(jnp.asarray(vol, jnp.float32), dst))
        np.testing.assert_allclose(out.mean(), vol.mean(), rtol=2e-6)


def test_resize_nd_axes_subset_and_leading_batch():
    # resize ONLY the depth axis of a (B, D, H, W) stack
    vol = RNG.uniform(0, 1, (3, 10, 8, 12))
    out = np.asarray(aa.area_resize_nd(
        jnp.asarray(vol, jnp.float32), (4,), axes=(1,)))
    assert out.shape == (3, 4, 8, 12)
    want = _dense_resize(vol, (1,), (4,))
    np.testing.assert_allclose(out, want, atol=1e-5)
    # non-trailing pair (negative axes) leaves W alone
    out2 = np.asarray(aa.area_resize_nd(
        jnp.asarray(vol, jnp.float32), (5, 4), axes=(-3, -2)))
    assert out2.shape == (3, 5, 4, 12)
    np.testing.assert_allclose(
        out2, _dense_resize(vol, (1, 2), (5, 4)), atol=1e-5)


def test_resize_nd_matches_area_resize_2d():
    img = RNG.uniform(0, 1, (48, 64)).astype(np.float32)
    a = np.asarray(aa.area_resize(jnp.asarray(img), (20, 28)))
    b = np.asarray(aa.area_resize_nd(jnp.asarray(img), (20, 28)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_resize_nd_uint8_roundtrip():
    vol = RNG.integers(0, 256, (5, 24, 24), dtype=np.uint8)
    out = aa.area_resize_nd(jnp.asarray(vol), (3, 11, 11))
    assert out.dtype == jnp.uint8 and out.shape == (3, 11, 11)
    want = _dense_resize(vol.astype(np.float64), (0, 1, 2), (3, 11, 11))
    assert np.abs(np.asarray(out).astype(np.float64) - want).max() <= 1.0
    # trailing-2-D u8 delegates to the native u8 route of area_resize
    out2 = aa.area_resize_nd(jnp.asarray(vol), (11, 11), axes=(-2, -1))
    want2 = aa.area_resize(jnp.asarray(vol), (11, 11))
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(want2))


def test_resize_nd_masked_no_leak_and_fill():
    vol = RNG.uniform(0, 1, (6, 18, 18)).astype(np.float32)
    mask = np.ones_like(vol, bool)
    mask[2, 4:8, 4:8] = False
    poisoned = vol.copy()
    poisoned[~mask] = 1e6  # must never contribute
    out = np.asarray(aa.area_resize_nd(
        jnp.asarray(poisoned), (3, 9, 9), mask=jnp.asarray(mask)))
    assert np.isfinite(out).all() and out.max() < 10.0
    # dense ground truth: R(x*m)/R(m)
    num = _dense_resize(vol * mask, (0, 1, 2), (3, 9, 9))
    den = _dense_resize(mask.astype(np.float64), (0, 1, 2), (3, 9, 9))
    np.testing.assert_allclose(out, num / den, atol=1e-4)
    # fully-masked input -> fill value everywhere
    out2 = np.asarray(aa.area_resize_nd(
        jnp.asarray(vol), (3, 9, 9), mask=jnp.zeros_like(vol),
        fill_value=-1.0))
    np.testing.assert_array_equal(out2, -1.0)


def test_resize_nd_interpret_pallas_route_matches_xla():
    vol = RNG.uniform(0, 1, (4, 40, 128)).astype(np.float32)
    a = np.asarray(aa.area_resize_nd(
        jnp.asarray(vol), (2, 17, 64), impl="pallas", interpret=True))
    b = np.asarray(aa.area_resize_nd(jnp.asarray(vol), (2, 17, 64),
                                     impl="xla"))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_resize_nd_validation():
    vol = jnp.zeros((4, 8, 8))
    with pytest.raises(ValueError):
        aa.area_resize_nd(vol, (2, 2, 2, 2))          # too many sizes
    with pytest.raises(ValueError):
        aa.area_resize_nd(vol, (2, 2), axes=(0,))     # length mismatch
    with pytest.raises(ValueError):
        aa.area_resize_nd(vol, (2, 2), axes=(1, -2))  # duplicate axis
    with pytest.raises(ValueError):
        aa.area_resize_nd(vol, (0, 2, 2))             # non-positive


def test_resize_nd_jit_and_grad():
    import jax

    vol = jnp.asarray(RNG.uniform(0, 1, (5, 16, 16)), jnp.float32)

    @jax.jit
    def f(v):
        return aa.area_resize_nd(v, (2, 7, 7)).sum()

    g = jax.grad(f)(vol)
    assert g.shape == vol.shape
    # linear map with row-normalised weights: d(sum out)/dv sums each
    # column of the N-D operator; total gradient mass = number of dst
    # cells * 1 (each row sums to 1)
    np.testing.assert_allclose(float(g.sum()), 2 * 7 * 7, rtol=1e-4)


def test_area_pyramid_conserves_mean():
    img = jnp.asarray(RNG.uniform(0, 1, (2, 81, 107)), jnp.float32)
    levels = aa.area_pyramid(img, 5)
    assert len(levels) == 5
    shapes = [lvl.shape[-2:] for lvl in levels]
    assert shapes == [(81, 107), (41, 54), (21, 27), (11, 14), (6, 7)]
    m0 = float(levels[0].mean())
    for lvl in levels[1:]:
        np.testing.assert_allclose(float(lvl.mean()), m0, rtol=1e-5)


def test_area_pyramid_stops_at_min_size():
    img = jnp.ones((4, 4))
    levels = aa.area_pyramid(img, 10, min_size=2)
    assert [lvl.shape for lvl in levels] == [(4, 4), (2, 2)]
    with pytest.raises(ValueError):
        aa.area_pyramid(img, 0)
    with pytest.raises(ValueError):
        aa.area_pyramid(img, 3, factor=1)
