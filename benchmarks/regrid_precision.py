"""Regrid (config 5) MXU-precision probe: DEFAULT vs HIGH vs HIGHEST.

The regrid runs f32 fields through the 2-D banded-tile kernel at ~130
us/frame — ~3.7x above its HBM read floor (25.9 MB/frame at ~750 GB/s
= 34.5 us).  The working theory was MXU-pass-bound (f32 operands force
Precision.HIGHEST = 6 bf16 passes on both dots), which this probe set
out to halve.

RESOLVED 2026-08-19 on the real chip, in two stages:

1. Mosaic's dot lowering has NO HIGH strategy on this v5e libtpu
   (NotImplementedError: "Unsupported dot precision: HIGH") — "high"
   now aliases HIGHEST in ops/pallas_apply._PRECISIONS.  HIGHEST
   measures max rel err 1.867e-07 / flux rel err 2.854e-08 vs the f64
   host apply.  The manual precision="bf16x3" hi/lo-split scheme
   measures 6.312e-06 / 9.209e-07 — inside the 1e-5 budget.
2. The MXU-pass-bound theory is REFUTED by measurement: HIGHEST (6
   passes) 49.9, bf16x3 (3 passes + VPU split) 51.65, DEFAULT (1 pass,
   no split) 51.85 Gpixel/s — ~125 us/frame regardless of MXU work.
   The kernel is bound by its banded-tile DMA schedule (column-sliced
   (SY, SX) band fetches), not by the dots, so no precision knob can
   buy speed here.  The aligned integer-ratio reshape path
   (benchmarks/regrid_aligned_probe.py, ops/apply.py aligned plan) is
   the lever that actually pays on this config.

This probe measures, on the real chip, for each precision:
  * wall time on the honest harness (bench.timed_scan)
  * max |rel err| vs the float64 HOST apply of the same operator
  * global-flux (conservation) relative error

Run: python benchmarks/regrid_precision.py --prec high
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from bench import timed_scan  # noqa: E402


def _setup():
    from aainterp.regrid import LatLonGrid, conservative_regrid_operator

    src, dst = LatLonGrid(1800, 3600), LatLonGrid(180, 360)
    by, bx = conservative_regrid_operator(src, dst)
    return by, bx


def _host_f64(field, by, bx):
    """float64 host reference: dense banded apply of the same operator."""
    H, W = field.shape
    Hd, Wd = by.weights.shape[0], bx.weights.shape[0]
    wy = np.zeros((Hd, H))
    for i in range(Hd):
        s = int(by.start[i])
        k = by.weights.shape[1]
        wy[i, s: s + k] = by.weights[i]
    wx = np.zeros((Wd, W))
    for i in range(Wd):
        s = int(bx.start[i])
        k = bx.weights.shape[1]
        wx[i, s: s + k] = bx.weights[i]
    return wy @ field.astype(np.float64) @ wx.T, wy, wx


def accuracy(prec: str):
    from aainterp.ops.pallas_apply import apply_separable_pallas_2d

    by, bx = _setup()
    rng = np.random.default_rng(0)
    f = rng.uniform(250.0, 300.0, (1, 1800, 3600)).astype(np.float32)
    ref, wy, wx = _host_f64(f[0], by, bx)
    got = apply_separable_pallas_2d(
        jnp.asarray(f), jnp.asarray(by.start),
        jnp.asarray(by.weights, jnp.float32), jnp.asarray(bx.start),
        jnp.asarray(bx.weights, jnp.float32), precision=prec)
    assert got is not None
    g = np.asarray(got[0], dtype=np.float64)
    rel = np.abs(g - ref) / np.maximum(np.abs(ref), 1e-30)
    # conservation: flux against the dst-row raw sums (the y/x weights
    # are row-normalised, so the area-weighted sums must match)
    flux_ref = ref.sum()
    flux_got = g.sum()
    return rel.max(), abs(flux_got - flux_ref) / abs(flux_ref)


def speed(prec: str, batch: int = 8):
    from aainterp.ops.pallas_apply import apply_separable_pallas_2d

    by, bx = _setup()
    rng = np.random.default_rng(0)
    K = 12
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.uniform(250, 300, (K, batch, 1800, 3600)).astype(np.float32))
    fields, warm = mk(), mk()
    args = (jnp.asarray(by.start), jnp.asarray(by.weights, jnp.float32),
            jnp.asarray(bx.start), jnp.asarray(bx.weights, jnp.float32))

    def fn(f):
        out = apply_separable_pallas_2d(
            f.reshape((-1, 1800, 3600)), *args, precision=prec)
        return out.reshape((batch, 180, 360))

    dt = timed_scan(fn, fields, warm)
    return batch * 1800 * 3600 / dt / 1e9, dt / batch * 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prec", required=True,
                    choices=("auto", "default", "high", "highest",
                             "bf16x3"))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--accuracy-only", action="store_true")
    args = ap.parse_args()
    maxrel, fluxrel = accuracy(args.prec)
    print(f"{args.prec}: max rel err {maxrel:.3e}  flux rel err "
          f"{fluxrel:.3e}")
    if args.accuracy_only:
        return
    g, us = speed(args.prec, args.batch)
    print(f"{args.prec}: {g:.2f} Gpixel/s  ({us:.1f} us/frame)")


if __name__ == "__main__":
    main()
