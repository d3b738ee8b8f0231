"""Probe: aligned-path variants — u8 resize serving and a fused regrid.

Two questions (2026-08-20):

1. **u8 integer-ratio resize serving.**  ``aa.resize`` / ``area_resize``
   bands are EDGE-ALIGNED interval overlaps, so a 4K -> 1080p resize is
   an exact m=2 aligned partition on both axes (unlike the reference-
   grid flagship operator, whose half-pixel isocenter offset makes a
   3-tap interior stencil — that config stays on the Pallas kernel).
   The u8 Pallas route measures ~266 Gpixel/s and is per-tile-overhead-
   bound (BENCHMARKS.md u8 tile sweep), but the u8 traffic ceiling is
   ~614 Gpixel/s (8.3 MB read + 2.07 MB write per frame at ~770 GB/s).
   Does the aligned XLA formulation beat Pallas for u8?

2. **Fused both-axes reduction.**  The shipped aligned path is two
   passes (y then x).  At m=2 the f32 y-intermediate (B, 1080, 3840) is
   ~2x the u8 input's bytes; at the regrid config (m=10) it adds ~20%
   read+write.  A single (..., Hd, my, Wd, mx) reshape + 2-axis reduce
   touches the source once — IF XLA keeps it one fusion.

Run ON the real TPU:  python benchmarks/aligned_u8_probe.py [--batch 8]
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import timed_scan


def fused_aligned(f, yp, xp):
    """Single-pass both-axes aligned contraction (probe variant)."""
    my, mx = int(yp["m"]), int(xp["m"])
    cy, cx = int(yp["c0"]), int(xp["c0"])
    wy = jnp.asarray(yp["wk"], jnp.float32)   # (Hd, my)
    wx = jnp.asarray(xp["wk"], jnp.float32)   # (Wd, mx)
    hd, wd = wy.shape[0], wx.shape[0]
    if cy or f.shape[-2] != cy + my * hd:
        f = jax.lax.slice_in_dim(f, cy, cy + my * hd, axis=-2)
    if cx or f.shape[-1] != cx + mx * wd:
        f = jax.lax.slice_in_dim(f, cx, cx + mx * wd, axis=-1)
    v = f.reshape(f.shape[:-2] + (hd, my, wd, mx)).astype(jnp.float32)
    return (v * wy[:, :, None, None] * wx[None, None, :, :]).sum(
        axis=(-3, -1))


def quant_like(out, dtype):
    if dtype == jnp.uint8:
        # round/saturate identical to the Pallas u8 store
        # (ops/pallas_apply.py:250-254)
        return jnp.clip(jnp.round(out), 0.0, 255.0).astype(
            jnp.int32).astype(jnp.uint8)
    return out.astype(dtype)


def bench_resize(batch: int):
    """4K -> 1080p edge-aligned resize (aa.resize geometry), u8 + bf16."""
    from aainterp.api import resize_bands
    from aainterp.ops import apply as apply_ops
    from aainterp.regrid import apply_band_operators

    H, W, Hd, Wd = 2160, 3840, 1080, 1920
    by, bx = resize_bands((H, W), (Hd, Wd))
    yp = apply_ops.aligned_axis_plan(by.start, by.weights, H)
    xp = apply_ops.aligned_axis_plan(bx.start, bx.weights, W)
    assert yp is not None and xp is not None, "resize bands not aligned?"
    in_pixels = batch * H * W
    rng = np.random.default_rng(0)
    K = max(2, min(24, int(3.5e9 / (batch * H * W * 2))))

    for dtype in (jnp.uint8, jnp.bfloat16):
        def mk():
            x = rng.uniform(0, 1, (K, batch, H, W))
            if dtype == jnp.uint8:
                return jnp.asarray((x * 255.0).astype(np.uint8))
            return jnp.asarray(x.astype(np.float32), dtype=dtype)

        frames, warm = mk(), mk()
        dname = jnp.dtype(dtype).name

        def fn_2p(f):
            return quant_like(
                apply_ops.apply_separable_aligned(f, yp, xp), dtype)

        def fn_1p(f):
            return quant_like(fused_aligned(f, yp, xp), dtype)

        def fn_pallas(f):
            # production route today for u8/bf16 (aligned auto-gate is
            # f32-only): the Pallas kernels via apply_band_operators
            return apply_band_operators(f, by, bx, impl="pallas")

        for name, fn in (("aligned2p", fn_2p), ("fused1p", fn_1p),
                         ("pallas", fn_pallas)):
            try:
                dt = timed_scan(jax.jit(fn), frames, warm)
            except Exception as e:
                print(f"resize {name:9s} {dname}: FAILED "
                      f"{type(e).__name__}: {e}")
                continue
            g = in_pixels / dt / 1e9
            print(f"resize {name:9s} {dname}: {g:.1f} Gpixel/s "
                  f"({dt / batch * 1e6:.1f} us/frame)")

        # correctness vs banded f32
        f0 = frames[0].astype(jnp.float32)
        ref = apply_ops.apply_separable_banded(
            f0, jnp.asarray(by.start), jnp.asarray(by.weights, jnp.float32),
            jnp.asarray(bx.start), jnp.asarray(bx.weights, jnp.float32))
        e2 = float(jnp.max(jnp.abs(ref - apply_ops.apply_separable_aligned(
            f0, yp, xp))))
        e1 = float(jnp.max(jnp.abs(ref - fused_aligned(f0, yp, xp))))
        print(f"# {dname} max abs err vs banded: 2p {e2:.3e} 1p {e1:.3e}")


def bench_regrid_fused(batch: int):
    """Config-5 regrid (m=10 aligned, per-row cos-lat weights): shipped
    two-pass vs fused single reduction."""
    from aainterp.ops import apply as apply_ops
    from aainterp.regrid import (
        LatLonGrid, conservative_regrid_operator,
    )

    src, dst = LatLonGrid(1800, 3600), LatLonGrid(180, 360)
    by, bx = conservative_regrid_operator(src, dst)
    yp = apply_ops.aligned_axis_plan(np.asarray(by.start),
                                     np.asarray(by.weights), by.n_src)
    xp = apply_ops.aligned_axis_plan(np.asarray(bx.start),
                                     np.asarray(bx.weights), bx.n_src)
    assert yp is not None and xp is not None
    in_pixels = batch * 1800 * 3600
    rng = np.random.default_rng(1)
    K = max(2, min(12, int(3.0e9 / (batch * 1800 * 3600 * 4))))

    def mk():
        return jnp.asarray(
            rng.uniform(200, 300, (K, batch, 1800, 3600)).astype(np.float32))

    frames, warm = mk(), mk()

    def fn_2p(f):
        return apply_ops.apply_separable_aligned(f, yp, xp)

    def fn_1p(f):
        return fused_aligned(f, yp, xp)

    for name, fn in (("aligned2p", fn_2p), ("fused1p", fn_1p)):
        dt = timed_scan(jax.jit(fn), frames, warm)
        g = in_pixels / dt / 1e9
        print(f"regrid {name:9s} f32: {g:.1f} Gpixel/s "
              f"({dt / batch * 1e6:.1f} us/frame)")

    f0 = frames[0]
    e = float(jnp.max(jnp.abs(fn_2p(f0) - fn_1p(f0))))
    print(f"# regrid max abs diff 2p vs 1p: {e:.3e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--case", default="all",
                    choices=("all", "resize", "regrid"))
    args = ap.parse_args()
    if args.case in ("all", "resize"):
        bench_resize(args.batch)
    if args.case in ("all", "regrid"):
        bench_regrid_fused(args.batch)


if __name__ == "__main__":
    main()
