"""Pallas separable kernel tests (interpret mode on CPU; the real-TPU run is
exercised by bench.py and was validated manually on v5e)."""

import numpy as np
import jax.numpy as jnp
import pytest

import aainterp as aa
from aainterp.ops.apply import apply_separable_banded
from aainterp.ops.pallas_apply import apply_separable_pallas
from aainterp.ops.weights import separable_operator

RNG = np.random.default_rng(0)


def _bands(spec):
    op = separable_operator(spec)
    return (
        jnp.asarray(op.wy.start), jnp.asarray(op.wy.weights, jnp.float32),
        jnp.asarray(op.wx.start), jnp.asarray(op.wx.weights, jnp.float32),
    )


@pytest.mark.parametrize("y_pass", ["vpu", "mxu"])
@pytest.mark.parametrize("H,W,sr,dr", [
    (256, 512, 2.0, 1.0),          # integer 2x downscale
    (512, 768, 150.0, 60.0),       # non-integer ratio
    (384, 640, 4.0, 1.0),          # 4x downscale (wider band)
    (128, 256, 1.0, 2.0),          # 2x upscale
])
def test_pallas_matches_banded_f32(H, W, sr, dr, y_pass):
    spec = aa.make_grid_spec((H, W), sr, dr, (0.0, 0.0), 0.0)
    ys, yw, xs, xw = _bands(spec)
    frames = jnp.asarray(RNG.uniform(0, 1, (2, H, W)).astype(np.float32))
    ref = apply_separable_banded(frames, ys, yw, xs, xw)
    got = apply_separable_pallas(
        frames, ys, yw, xs, xw, y_pass=y_pass, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5
    )


def test_pallas_bf16_output_rounding_only():
    spec = aa.make_grid_spec((256, 512), 2.0, 1.0, (0.0, 0.0), 0.0)
    ys, yw, xs, xw = _bands(spec)
    frames = jnp.asarray(
        RNG.uniform(0, 1, (1, 256, 512)).astype(np.float32), jnp.bfloat16
    )
    ref = apply_separable_banded(frames, ys, yw, xs, xw).astype(jnp.bfloat16)
    got = apply_separable_pallas(frames, ys, yw, xs, xw, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=1e-2
    )


@pytest.mark.parametrize("ns", [3, 4])
def test_pallas_n_slot_band_buffer(ns):
    """Deeper cross-grid-step DMA pipelines (n_slots > 2) stay exact —
    the pipeline-fill/steady-state slot rotation must never let a step
    read a band another step is still fetching."""
    spec = aa.make_grid_spec((256, 512), 2.0, 1.0, (0.0, 0.0), 0.0)
    ys, yw, xs, xw = _bands(spec)
    frames = jnp.asarray(RNG.uniform(0, 1, (3, 256, 512)).astype(np.float32))
    ref = apply_separable_banded(frames, ys, yw, xs, xw)
    got = apply_separable_pallas(frames, ys, yw, xs, xw, n_slots=ns,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pallas_small_image_fallback():
    """Tiny images (band span exceeds image) route to the XLA path."""
    spec = aa.make_grid_spec((24, 24), 2.0, 1.0, (4.0, 4.0), 0.0)
    ys, yw, xs, xw = _bands(spec)
    frames = jnp.asarray(RNG.uniform(0, 1, (1, 24, 24)).astype(np.float32))
    ref = apply_separable_banded(frames, ys, yw, xs, xw)
    got = apply_separable_pallas(frames, ys, yw, xs, xw, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("out_name", ["uint8", "bfloat16"])
def test_pallas_uint8_pixels(out_name):
    """uint8 frames ride the kernel natively (8-bit band DMAs, f32 accum,
    round+saturate back to uint8 or any requested out_dtype)."""
    spec = aa.make_grid_spec((256, 512), 150.0, 60.0, (0.0, 0.0), 0.0)
    ys, yw, xs, xw = _bands(spec)
    u8 = jnp.asarray(RNG.integers(0, 256, (2, 256, 512), dtype=np.uint8))
    out_dtype = jnp.dtype(out_name)
    got = apply_separable_pallas(u8, ys, yw, xs, xw,
                                 out_dtype=out_dtype, interpret=True)
    assert got.dtype == out_dtype
    ref = apply_separable_banded(u8.astype(jnp.float32), ys, yw, xs, xw)
    ref = np.asarray(ref)
    if out_dtype == jnp.uint8:
        # fp summation-order differences can flip a .5-boundary rounding
        assert np.abs(got.astype(np.int32) -
                      np.clip(np.round(ref), 0, 255).astype(np.int32)).max() <= 1
    else:
        np.testing.assert_allclose(np.asarray(got, np.float32), ref, atol=1.0)


def test_pallas_uint8_default_out_and_fallback():
    # default out_dtype is uint8-in -> uint8-out; odd widths (off the 1-D
    # envelope) quantise the f32 fallback path identically
    spec = aa.make_grid_spec((128, 250), 2.0, 1.0, (0.0, 0.0), 0.0)
    ys, yw, xs, xw = _bands(spec)
    u8 = jnp.asarray(RNG.integers(0, 256, (1, 128, 250), dtype=np.uint8))
    got = apply_separable_pallas(u8, ys, yw, xs, xw, interpret=True)
    assert got.dtype == jnp.uint8
    ref = apply_separable_banded(u8.astype(jnp.float32), ys, yw, xs, xw)
    want = np.clip(np.round(np.asarray(ref)), 0, 255).astype(np.int32)
    assert np.abs(got.astype(np.int32) - want).max() <= 1


def test_pallas_uint8_api_route_returns_float32():
    # the api-level custom-VJP pallas route keeps the float32 output
    # contract for uint8 sources (native 8-bit DMAs inside the kernel)
    from aainterp.autodiff import separable_linear_for

    spec = aa.make_grid_spec((256, 512), 150.0, 60.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec)
    u8 = jnp.asarray(RNG.integers(0, 256, (1, 256, 512), dtype=np.uint8))
    got = separable_linear_for(op, jnp.float32, "pallas",
                               interpret=True)(u8)
    assert got.dtype == jnp.float32
    ys, yw, xs, xw = _bands(spec)
    ref = apply_separable_banded(u8.astype(jnp.float32), ys, yw, xs, xw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


# ----------------------------------------------------------------------
# 2-D banded-tile kernel (apply_separable_pallas_2d)
# ----------------------------------------------------------------------

from aainterp.ops.pallas_apply import apply_separable_pallas_2d


@pytest.mark.parametrize("H,W,sr,dr", [
    (360, 600, 10.0, 1.0),    # 10x downscale, W % 128 != 0 (regrid shape)
    (256, 500, 2.0, 1.0),     # odd width, narrow band
    (200, 384, 150.0, 60.0),  # non-integer ratio, H % 8 != 0
    (128, 256, 1.0, 2.0),     # 2x upscale
    (96, 250, 1.0, 3.5),      # non-integer upscale, odd width
])
def test_pallas_2d_matches_banded_f32(H, W, sr, dr):
    spec = aa.make_grid_spec((H, W), sr, dr, (0.0, 0.0), 0.0)
    ys, yw, xs, xw = _bands(spec)
    frames = jnp.asarray(RNG.uniform(0, 1, (2, H, W)).astype(np.float32))
    ref = apply_separable_banded(frames, ys, yw, xs, xw)
    got = apply_separable_pallas_2d(frames, ys, yw, xs, xw, interpret=True)
    assert got is not None, "2-D kernel rejected a feasible geometry"
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pallas_2d_regrid_bands():
    # the actual config-5 operator: sin-lat y bands + uniform lon x bands
    from aainterp.regrid import LatLonGrid, conservative_regrid_operator

    src, dst = LatLonGrid(360, 720), LatLonGrid(36, 72)
    by, bx = conservative_regrid_operator(src, dst)
    ys = jnp.asarray(by.start); yw = jnp.asarray(by.weights, jnp.float32)
    xs = jnp.asarray(bx.start); xw = jnp.asarray(bx.weights, jnp.float32)
    fields = jnp.asarray(RNG.uniform(250, 300, (2, 360, 720)).astype(np.float32))
    ref = apply_separable_banded(fields, ys, yw, xs, xw)
    got = apply_separable_pallas_2d(fields, ys, yw, xs, xw, interpret=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-3)


def test_pallas_2d_uint8_native():
    # the 2-D banded-tile kernel rides u8 natively (32-aligned row bases,
    # round+saturate store); odd width keeps it off the 1-D kernel
    spec = aa.make_grid_spec((200, 500), 2.0, 1.0, (0.0, 0.0), 0.0)
    ys, yw, xs, xw = _bands(spec)
    u8 = jnp.asarray(RNG.integers(0, 256, (2, 200, 500), dtype=np.uint8))
    got = apply_separable_pallas_2d(u8, ys, yw, xs, xw, interpret=True)
    assert got is not None and got.dtype == jnp.uint8
    ref = apply_separable_banded(u8.astype(jnp.float32), ys, yw, xs, xw)
    want = np.clip(np.round(np.asarray(ref)), 0, 255).astype(np.int32)
    assert np.abs(np.asarray(got).astype(np.int32) - want).max() <= 1


def test_pallas_2d_precision_knob():
    # explicit MXU precisions plumb through the plan cache and match in
    # interpret mode (which is exact at any precision); bad names raise
    spec = aa.make_grid_spec((200, 500), 2.0, 1.0, (0.0, 0.0), 0.0)
    ys, yw, xs, xw = _bands(spec)
    x = jnp.asarray(RNG.uniform(0, 1, (2, 200, 500)).astype(np.float32))
    ref = apply_separable_banded(x, ys, yw, xs, xw)
    for prec in ("default", "high", "highest"):
        got = apply_separable_pallas_2d(x, ys, yw, xs, xw,
                                        precision=prec, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError, match="precision"):
        apply_separable_pallas_2d(x, ys, yw, xs, xw, precision="bogus",
                                  interpret=True)


def test_pallas_1d_falls_back_to_2d_on_odd_width():
    # apply_separable_pallas routes W % 128 != 0 to the 2-D kernel
    spec = aa.make_grid_spec((128, 250), 2.0, 1.0, (0.0, 0.0), 0.0)
    ys, yw, xs, xw = _bands(spec)
    frames = jnp.asarray(RNG.uniform(0, 1, (128, 250)).astype(np.float32))
    ref = apply_separable_banded(frames, ys, yw, xs, xw)
    got = apply_separable_pallas(frames, ys, yw, xs, xw, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pallas_uint8_bitcast_route_engaged():
    """u8 1-D kernel uses the bitcast byte-split unpack (u8_bitcast flag
    in the cached plan), including at H not a multiple of 32 — the case
    whose aligned-span fixpoint used to degenerate to whole-image bands
    and silently push u8 off the 1-D kernel."""
    from aainterp.ops import pallas_apply as pa

    # H=176: not a 32-multiple (the case whose aligned-span fixpoint used
    # to diverge) but an 8-multiple (Mosaic requires sublane-tile-aligned
    # copy LENGTHS on VMEM-resident refs, so H % 8 != 0 falls back)
    for shape in [(256, 512), (176, 256)]:
        spec = aa.make_grid_spec(shape, 2.0, 1.0, (0.0, 0.0), 0.0)
        ys, yw, xs, xw = _bands(spec)
        u8 = jnp.asarray(RNG.integers(0, 256, (1,) + shape, dtype=np.uint8))
        got = apply_separable_pallas(u8, ys, yw, xs, xw, interpret=True)
        ref = apply_separable_banded(u8.astype(jnp.float32), ys, yw, xs, xw)
        want = np.clip(np.round(np.asarray(ref)), 0, 255).astype(np.int32)
        assert np.abs(got.astype(np.int32) - want).max() <= 1, shape
        # the freshest plan for this geometry must carry the bitcast flag
        flags = [p["build_args"][-1] for p in pa._PREP_CACHE.values()
                 if isinstance(p, dict)
                 and tuple(p["build_args"][1:3]) == shape
                 and p.get("in_dtype") == jnp.uint8]
        assert flags and flags[-1] is True, (shape, flags)


def test_pallas_uint8_h_not_div4_falls_back_cleanly():
    """H % 4 != 0 cannot host the 4-row bitcast window; the route must
    fall back (2-D kernel / XLA) and stay exact, not crash."""
    spec = aa.make_grid_spec((94, 128), 2.0, 1.0, (0.0, 0.0), 0.0)
    ys, yw, xs, xw = _bands(spec)
    u8 = jnp.asarray(RNG.integers(0, 256, (1, 94, 128), dtype=np.uint8))
    got = apply_separable_pallas(u8, ys, yw, xs, xw, interpret=True)
    assert got.dtype == jnp.uint8
    ref = apply_separable_banded(u8.astype(jnp.float32), ys, yw, xs, xw)
    want = np.clip(np.round(np.asarray(ref)), 0, 255).astype(np.int32)
    assert np.abs(got.astype(np.int32) - want).max() <= 1


def test_u8_pack_order_interpret_is_contiguous():
    """Interpret-mode bitcast groups rows contiguously: perm[b*Q+q] =
    4q+b.  (Real Mosaic's order is discovered on the live backend by the
    same probe; the TPU smoke suite covers that path.)"""
    from aainterp.ops.pallas_apply import _u8_pack_order

    perm = _u8_pack_order(16, True)
    Q = 4
    for q in range(Q):
        for b in range(4):
            assert perm[b * Q + q] == 4 * q + b


@pytest.mark.parametrize("shape,ratio", [
    ((64, 128), (2.0, 1.0)),      # H % 32 == 0, exact 2x
    ((96, 256), (150.0, 60.0)),   # non-integer ratio, wider band
    ((136, 128), (2.0, 1.0)),     # H % 32 == 8 (span-fit boundary)
    ((328, 384), (3.0, 1.0)),     # H % 8 == 0, % 16 != 0
])
def test_pallas_uint8_shape_fuzz(shape, ratio):
    """u8 route exactness across alignment regimes (interpret): every
    shape must match the f32 banded apply to <= 1 gray regardless of
    which kernel (1-D bitcast, 2-D, XLA fallback) serves it."""
    H, W = shape
    spec = aa.make_grid_spec(shape, ratio[0], ratio[1], (0.0, 0.0), 0.0)
    ys, yw, xs, xw = _bands(spec)
    u8 = jnp.asarray(RNG.integers(0, 256, (2, H, W), dtype=np.uint8))
    got = apply_separable_pallas(u8, ys, yw, xs, xw, interpret=True)
    assert got.dtype == jnp.uint8
    ref = apply_separable_banded(u8.astype(jnp.float32), ys, yw, xs, xw)
    want = np.clip(np.round(np.asarray(ref)), 0, 255).astype(np.int32)
    assert np.abs(got.astype(np.int32) - want).max() <= 1, shape
