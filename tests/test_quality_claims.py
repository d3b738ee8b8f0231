"""Regression tests pinning the README/BENCHMARKS quality claims
(VERDICT r3 item 6): the rot30 round-trip PSNR ordering and the flagship
bf16 1-ulp accuracy statement.  A weight-gen regression that degraded
either claim must FAIL the suite, not just shift a bench printout.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import aainterp as aa


def test_rot30_roundtrip_psnr_full_ordering():
    """BENCHMARKS.md:72-73 (quantifying README.md:8-9 of the reference):
    +30/-30 deg round trip at 2048^2 measures area-average 13.9 dB vs
    bilinear 11.8 / bicubic 11.2 — the strict ordering
    area > bilinear > bicubic with a multi-dB area margin.  Pinned here
    at a CPU-sized 64^2 near-Nyquist scene (measured 24.4 / 17.8 / 17.7
    dB, 2026-08-20 — the ordering is scale-stable; the absolute dB is
    resolution- and scene-dependent)."""
    from aainterp.baselines import compare_rotation_roundtrip

    y, x = np.mgrid[0:64, 0:64].astype(np.float64)
    src = (np.sin(x * 0.9) * np.cos(y * 0.55) + 1.0) / 2.0
    res = compare_rotation_roundtrip(src, 30.0)
    assert res["area_average"] > res["bilinear"] + 3.0, res
    assert res["bilinear"] > res["bicubic"], res


def test_flagship_bf16_output_one_ulp_vs_f32_reference():
    """BENCHMARKS.md:98: the flagship kernel's bf16 output equals the
    XLA f32 reference apply to bf16 output rounding (1 ulp).  Interpret
    mode pins the quantisation contract + weight-gen on CPU; the Mosaic
    MXU build is covered by the env-gated real-TPU smoke suite."""
    from aainterp.ops.apply import apply_separable_banded
    from aainterp.ops.pallas_apply import apply_separable_pallas
    from aainterp.ops.weights import separable_operator

    # flagship-ratio geometry (2x downscale) at a CPU-sized W%128==0 shape
    spec = aa.make_grid_spec((256, 512), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec, mode="exact")
    args = (jnp.asarray(op.wy.start),
            jnp.asarray(np.asarray(op.wy.weights, np.float32)),
            jnp.asarray(op.wx.start),
            jnp.asarray(np.asarray(op.wx.weights, np.float32)))
    rng = np.random.default_rng(5)
    x32 = rng.uniform(0, 1, (2, 256, 512)).astype(np.float32)
    xb = jnp.asarray(x32, jnp.bfloat16)

    got = apply_separable_pallas(xb, *args, interpret=True)
    assert got.dtype == jnp.bfloat16
    # the f32 reference consumes the SAME bf16-quantised pixels (the
    # claim is about the kernel's accumulation + output rounding, not
    # the input quantisation the user opted into)
    ref = apply_separable_banded(xb.astype(jnp.float32), *args)
    ref_b = np.asarray(ref.astype(jnp.bfloat16))

    # within-1-ulp via the bf16 integer representation: adjacent codes
    # differ by 1 (all values positive here, no sign/zero crossing)
    gi = np.asarray(got).view(np.uint16).astype(np.int32)
    ri = ref_b.view(np.uint16).astype(np.int32)
    assert np.abs(gi - ri).max() <= 1


def test_u8_serving_one_gray_vs_f32_reference():
    """The u8 serving contract (PARITY.md): u8-in -> u8-out within one
    gray level of the rounded f32 reference, on the 1-D kernel route."""
    from aainterp.ops.apply import apply_separable_banded
    from aainterp.ops.pallas_apply import apply_separable_pallas
    from aainterp.ops.weights import separable_operator

    spec = aa.make_grid_spec((256, 512), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec, mode="exact")
    args = (jnp.asarray(op.wy.start),
            jnp.asarray(np.asarray(op.wy.weights, np.float32)),
            jnp.asarray(op.wx.start),
            jnp.asarray(np.asarray(op.wx.weights, np.float32)))
    x = jnp.asarray(np.random.default_rng(6).integers(
        0, 256, (2, 256, 512), dtype=np.uint8))
    got = apply_separable_pallas(x, *args, interpret=True)
    assert got.dtype == jnp.uint8
    ref = apply_separable_banded(x.astype(jnp.float32), *args)
    want = np.clip(np.round(np.asarray(ref)), 0, 255).astype(np.int32)
    assert np.abs(np.asarray(got).astype(np.int32) - want).max() <= 1
