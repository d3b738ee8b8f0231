"""Pallas rotated-apply kernels (ops/pallas_shear.py), interpret mode.

Validates the three-kernel pipeline (vshear, hshear, tiled one-hot
contraction) against the XLA ELL apply on CPU.  Real-TPU coverage is the
env-gated smoke test in test_pallas_tpu.py plus bench.py --case rot30.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import aainterp as aa
from aainterp.ops import apply as apply_ops
from aainterp.ops.weights import ell_operator
from aainterp.ops.pallas_shear import build_kernel_plan, make_pallas_shear_apply

RNG = np.random.default_rng(7)


def _check(H, W, ang, dtype=jnp.float32, batch=2, sr=1.0, dr=0.5):
    spec = aa.make_grid_spec((H, W), sr, dr, (W / 2, H / 2), ang)
    op = ell_operator(spec, mode="exact")
    src = jnp.asarray(
        RNG.uniform(0, 1, (batch, H, W)).astype(np.float32), dtype=dtype)
    q = apply_ops.quadrant_rotate(src, spec.quadrant)
    ref = aa.apply_operator(op, src, impl="xla").astype(dtype)
    fn, arrs = make_pallas_shear_apply(op, interpret=True)
    got = fn(q, **arrs)
    assert got.shape == ref.shape
    tol = 2e-6 if dtype == jnp.float32 else 0.0  # bf16: bit-exact selection
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=tol)


@pytest.mark.parametrize("ang", [5.0, 30.0, 44.0])
def test_matches_xla_f32(ang):
    _check(192, 256, ang)


def test_matches_xla_bf16_bitexact():
    """bf16 pixels: one-hot selection is exact, so the kernel output equals
    the XLA apply rounded to bf16, bit for bit."""
    _check(256, 256, 30.0, dtype=jnp.bfloat16)


def test_quadrant_angles():
    for ang in (120.0, 210.0, 300.5):
        _check(200, 136, ang)


def test_single_frame_2d():
    spec = aa.make_grid_spec((160, 160), 1.0, 0.5, (80.0, 80.0), 15.0)
    op = ell_operator(spec, mode="exact")
    src = jnp.asarray(RNG.uniform(0, 1, (160, 160)).astype(np.float32))
    ref = aa.apply_operator(op, src, impl="xla")
    fn, arrs = make_pallas_shear_apply(op, interpret=True)
    got = fn(src, **arrs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_downscale_ratio():
    # scale-2 prescale geometry (sr == dr at rotation -> dst_side 2)
    _check(192, 192, 20.0, sr=1.0, dr=1.0)


def test_fuzz_random_geometries():
    """Random shapes/angles/ratios vs the XLA apply (interpret mode)."""
    rng = np.random.default_rng(123)
    for _ in range(8):
        H = int(rng.integers(96, 288))
        W = int(rng.integers(96, 288))
        ang = float(rng.uniform(0.5, 359.5))
        sr = float(rng.uniform(0.5, 4.0))
        dr = sr / float(rng.uniform(1.2, 3.0))
        iso = (float(rng.uniform(0, W)), float(rng.uniform(0, H)))
        spec = aa.make_grid_spec((H, W), sr, dr, iso, ang)
        if spec.is_axis_aligned:
            continue
        op = ell_operator(spec, mode="exact")
        src = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
        q = apply_ops.quadrant_rotate(src, spec.quadrant)
        ref = aa.apply_operator(op, src, impl="xla")
        try:
            fn, arrs = make_pallas_shear_apply(op, interpret=True)
        except ValueError:
            continue  # geometry too small for the tiled kernel: XLA path
        got = fn(q, **arrs)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-6,
            err_msg=f"H={H} W={W} ang={ang} sr={sr} dr={dr} iso={iso}")


def test_plan_disk_cache_roundtrip(tmp_path):
    """build_kernel_plan_cached: save -> load reproduces the plan exactly."""
    from aainterp.ops.pallas_shear import build_kernel_plan_cached
    import dataclasses

    spec = aa.make_grid_spec((128, 160), 1.0, 0.5, (80.0, 64.0), 30.0)
    op = ell_operator(spec, mode="exact")
    kp1 = build_kernel_plan_cached(op, cache_dir=str(tmp_path))
    kp2 = build_kernel_plan_cached(op, cache_dir=str(tmp_path))  # cache hit
    for f in dataclasses.fields(kp1):
        v1, v2 = getattr(kp1, f.name), getattr(kp2, f.name)
        if isinstance(v1, np.ndarray):
            np.testing.assert_array_equal(v1, v2)
        else:
            assert v1 == v2, f.name


def test_plan_selectors_are_one_hot():
    spec = aa.make_grid_spec((160, 224), 1.0, 0.5, (112.0, 80.0), 30.0)
    op = ell_operator(spec, mode="exact")
    kp = build_kernel_plan(op)
    # each selector row/col selects at most one entry
    assert kp.rsel.sum(axis=-1).max() <= 1.0
    assert kp.csel.sum(axis=-2).max() <= 1.0
    # every live dst pixel's weights are preserved in the tiled layout
    assert np.isclose(kp.w2t.sum(), op.weights.sum(), atol=1e-6)


def test_plan_residual_roll_invariants():
    """Residual-roll bases (v2 plans): the kernels place the rolled block
    with ONE dynamic aligned store at the hoisted per-strip/per-block base,
    so the plan must guarantee (a) base alignment to the sublane/lane tile,
    (b) residual shifts representable in nbv/nbh bit passes, and (c) the
    stored slice staying inside the padded output."""
    rng = np.random.default_rng(42)
    for _ in range(6):
        H = int(rng.integers(128, 320))
        W = int(rng.integers(128, 320))
        ang = float(rng.uniform(1.0, 89.0))
        spec = aa.make_grid_spec((H, W), 1.0, 0.5,
                                 (W / 2.0, H / 2.0), ang)
        if spec.is_axis_aligned:
            continue
        op = ell_operator(spec, mode="exact")
        try:
            kp = build_kernel_plan(op)
        except ValueError:
            continue
        assert np.all(kp.base_v % 16 == 0) and np.all(kp.base_v >= 0)
        assert np.all(kp.base_h % 128 == 0) and np.all(kp.base_h >= 0)
        gy = kp.gy_col[0, 0]
        residv = gy - np.repeat(kp.base_v, 128)[: len(gy)]
        assert residv.min() >= 0 and residv.max() < (1 << kp.nbv)
        assert kp.qH + residv.max() <= kp.RH
        hx = kp.hx_row[0, :, 0]
        residh = hx - np.repeat(kp.base_h, kp.BLKR)[: len(hx)]
        assert residh.min() >= 0 and residh.max() < (1 << kp.nbh)
        assert kp.qWp + residh.max() <= kp.RW
        assert kp.base_v.max() + kp.RH <= kp.THp
        assert kp.base_h.max() + kp.RW <= kp.TWp


def test_sharded_plan_residual_roll_invariants():
    """Same invariants for the per-chip sharded plan (base_h varies by
    chip with the local hx slices; base_v is replicated)."""
    from aainterp.ops.pallas_shear import build_sharded_kernel_plan

    spec = aa.make_grid_spec((352, 352), 1.0, 0.5, (176.0, 176.0), 30.0)
    op = ell_operator(spec, mode="exact")
    kp = build_sharded_kernel_plan(op, n_dev=4)
    assert np.all(kp.base_v % 16 == 0) and np.all(kp.base_v >= 0)
    assert np.all(kp.base_h % 128 == 0) and np.all(kp.base_h >= 0)
    gy = kp.gy_col[0, 0]
    residv = gy - np.repeat(kp.base_v, 128)[: len(gy)]
    assert residv.min() >= 0 and residv.max() < (1 << kp.nbv)
    assert kp.Hloc + residv.max() <= kp.RH
    for i in range(kp.n_dev):
        hx = kp.hx_loc[i, :, 0]
        residh = hx - np.repeat(kp.base_h[i], kp.BLKR)
        assert residh.min() >= 0 and residh.max() < (1 << kp.nbh)
    assert kp.base_v.max() + kp.RH <= kp.THp
    assert kp.base_h.max() + kp.RW <= kp.TWp


def test_tile_masks_structure():
    """tile_masks: one liveness flag per tile, zero iff the whole weight
    block is zero (the kernel skips exactly those tiles)."""
    from aainterp.ops.pallas_shear import tile_masks

    rng = np.random.default_rng(0)
    nt = 5
    w2t = rng.uniform(-1, 1, (nt, 12, 8, 8))
    w2t[w2t < 0.3] = 0.0
    w2t[2] = 0.0                  # fully dead tile
    m = tile_masks(w2t)
    assert m.shape == (nt,) and m.dtype == np.int32
    assert list(m) == [1, 1, 0, 1, 1]
