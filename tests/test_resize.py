"""aa.area_resize: conservative resize to arbitrary (anisotropic) shapes.

New capability vs the reference (it rejects anisotropic resolutions,
Source.cpp:111-117).  Ground truth: dense float64 interval-overlap
operators.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import aainterp as aa

RNG = np.random.default_rng(11)


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


@pytest.mark.parametrize("shape,dst", [
    ((64, 96), (32, 32)),     # anisotropic downscale
    ((50, 70), (21, 33)),     # ragged non-integer ratios
    ((16, 16), (40, 24)),     # anisotropic upscale
    ((37, 53), (37, 20)),     # one axis identity
])
def test_area_resize_matches_dense(shape, dst):
    img = RNG.uniform(0, 1, shape)
    out = np.asarray(aa.area_resize(jnp.asarray(img, jnp.float32), dst))
    want = _dense_axis(shape[0], dst[0]) @ img @ _dense_axis(shape[1], dst[1]).T
    assert out.shape == dst
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_area_resize_integer_box_mean():
    img = RNG.uniform(0, 1, (8, 48, 64)).astype(np.float32)
    out = np.asarray(aa.area_resize(jnp.asarray(img), (24, 16)))
    ref = img.reshape(8, 24, 2, 16, 4).mean(axis=(2, 4))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_area_resize_conserves_mean():
    img = RNG.uniform(0, 1, (33, 47))
    for dst in ((11, 13), (66, 94), (5, 120)):
        out = np.asarray(aa.area_resize(jnp.asarray(img, jnp.float32), dst))
        assert float(out.mean()) == pytest.approx(float(img.mean()),
                                                  rel=1e-5)


def test_area_resize_pallas_route_interpret():
    img = jnp.asarray(RNG.uniform(0, 1, (2, 200, 300)).astype(np.float32))
    ref = np.asarray(aa.area_resize(img, (80, 120), impl="xla"))
    got = np.asarray(aa.area_resize(img, (80, 120), impl="pallas",
                                    interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_area_resize_uint8_contract():
    """u8 in -> u8 out on BOTH routes (native Pallas path on TPU, rounded
    XLA fallback elsewhere), within 1 quantisation step of each other."""
    img = jnp.asarray(RNG.integers(0, 256, (2, 96, 128), dtype=np.uint8))
    xla = aa.area_resize(img, (48, 32))            # CPU: XLA fallback
    pal = aa.area_resize(img, (48, 32), impl="pallas", interpret=True)
    assert xla.dtype == jnp.uint8 and pal.dtype == jnp.uint8
    d = np.abs(np.asarray(xla, np.int32) - np.asarray(pal, np.int32))
    assert d.max() <= 1


def test_area_resize_rejects_bad_shape():
    img = jnp.zeros((8, 8))
    with pytest.raises(ValueError, match="positive"):
        aa.area_resize(img, (0, 4))


def test_area_resize_masked():
    """mask=: valid-cell renormalisation — masked pixels never leak, a
    constant valid field stays constant, fully-masked dst pixels fill."""
    rng = np.random.default_rng(5)
    img = np.full((40, 60), 3.25, np.float32)
    garbage = img.copy()
    mask = np.ones((40, 60), np.float32)
    mask[10:30, :20] = 0.0
    garbage[10:30, :20] = -500.0
    a = np.asarray(aa.area_resize(img, (10, 12), mask=mask))
    b = np.asarray(aa.area_resize(garbage, (10, 12), mask=mask))
    np.testing.assert_array_equal(a, b)
    valid = ~np.isnan(a)
    np.testing.assert_allclose(a[valid], 3.25, rtol=1e-6)
    # fully-masked destination region gets the fill value
    mask2 = np.zeros((40, 60), np.float32)
    mask2[:, 30:] = 1.0
    c = np.asarray(aa.area_resize(img, (10, 12), mask=mask2, fill_value=-1.0))
    assert (c[:, :5] == -1.0).all() and np.isfinite(c[:, 7:]).all()
    # dense float64 reference on random data: A(f*m)/A(m) with the
    # unmasked resize supplying the operator action A
    f = rng.uniform(0, 1, (40, 60)).astype(np.float32)
    m = (rng.uniform(0, 1, (40, 60)) > 0.4).astype(np.float32)
    got = np.asarray(aa.area_resize(f, (10, 12), mask=m))
    num = np.asarray(aa.area_resize((f * m).astype(np.float64), (10, 12)))
    den = np.asarray(aa.area_resize(m.astype(np.float64), (10, 12)))
    with np.errstate(invalid="ignore"):
        ref = np.where(den > 1e-6, num / den, np.nan)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)


def test_resize_bands_public_pair_matches_area_resize():
    from aainterp.regrid import apply_band_operators

    img = RNG.uniform(0, 1, (3, 40, 56)).astype(np.float32)
    by, bx = aa.resize_bands((40, 56), (17, 23))
    out = np.asarray(apply_band_operators(jnp.asarray(img), by, bx))
    want = np.asarray(aa.area_resize(jnp.asarray(img), (17, 23)))
    np.testing.assert_allclose(out, want, atol=1e-6)
    with pytest.raises(ValueError):
        aa.resize_bands((0, 4), (2, 2))


def test_resize_bands_stream_and_compose():
    from aainterp.ops.overlap1d import compose_band
    from aainterp.regrid import apply_band_operators

    frames = [RNG.uniform(0, 1, (48, 64)).astype(np.float32)
              for _ in range(5)]
    pair = aa.resize_bands((48, 64), (24, 32))
    outs = list(aa.stream_apply(pair, iter(frames), batch=2, depth=2))
    assert len(outs) == 5 and outs[0].shape == (24, 32)
    np.testing.assert_allclose(
        outs[3], np.asarray(aa.area_resize(jnp.asarray(frames[3]),
                                           (24, 32))), atol=1e-6)
    # fuse two resize stages into one banded pair: one pass == chained
    p2 = aa.resize_bands((24, 32), (10, 14))
    fused = (compose_band(p2[0], pair[0]), compose_band(p2[1], pair[1]))
    one = np.asarray(apply_band_operators(jnp.asarray(frames[0]), *fused))
    two = np.asarray(aa.area_resize(
        aa.area_resize(jnp.asarray(frames[0]), (24, 32)), (10, 14)))
    np.testing.assert_allclose(one, two, atol=1e-5)


def test_unified_resize_front_door():
    """aa.resize(method=) dispatches: 'area' == area_resize, the
    interpolator baselines ride jax.image.resize, bad knobs raise."""
    import pytest

    x = jnp.asarray(RNG.uniform(0, 1, (48, 64)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(aa.resize(x, (24, 32))),
        np.asarray(aa.area_resize(x, (24, 32))), atol=0)
    bl = aa.resize(x, (24, 32), method="bilinear")
    assert bl.shape == (24, 32)
    import jax
    np.testing.assert_allclose(
        np.asarray(bl),
        np.asarray(jax.image.resize(x, (24, 32), method="linear")), atol=0)
    with pytest.raises(ValueError, match="method"):
        aa.resize(x, (24, 32), method="lanczos")
    with pytest.raises(TypeError, match="no extra options"):
        aa.resize(x, (24, 32), method="bicubic", impl="pallas")
