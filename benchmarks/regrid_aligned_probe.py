"""Aligned integer-ratio regrid probe: reshape + per-row tap contraction.

The config-5 regrid (0.1 deg -> 1 deg) has EXACTLY aligned bands: every
dst cell covers exactly m=10 contiguous source cells starting at 10*i
(verified from the operator tables, not assumed).  The existing XLA
stencil path (ops/apply.axis_stencil_plan) cannot take it because the
cos-lat y weights VARY per row (it requires one constant interior tap
vector), and the Pallas 2-D kernel densifies the band onto the MXU at
HIGHEST precision (6 bf16 passes) — measured 49.9 Gpixel/s, with the
manual bf16x3 split at 51.65 (the VPU split cancels the saved passes).

For aligned bands none of that machinery is needed:

    dst_y = sum_k wy[i, k] * src[m*i + k]  ==  einsum('bhmw,hm->bhw',
            src.reshape(B, Hd, m, W), wyk)

— a reshape (free, row-major) + length-m contraction, exact f32 on the
VPU (better numerics than any MXU splitting scheme).  This probe
measures the XLA lowering of three formulations on the honest harness:

  * einsum : jnp.einsum with precision=HIGHEST on both axes
  * vpu    : broadcast multiply + sum (forces elementwise + reduce)
  * mixed  : y via multiply+sum, x via einsum

Run: python benchmarks/regrid_aligned_probe.py --variant vpu

MEASURED 2026-08-19 (v5e, honest harness, batch 8):
  vpu    153.84 Gpixel/s (42.1 us/frame), max rel err 1.785e-07
  einsum 152.94 Gpixel/s (42.4 us/frame), max rel err 1.973e-07
— equivalent lowerings, both within ~22% of the 34.5 us HBM read floor
and 3.1x the Pallas 2-D banded-tile kernel (49.9).  The vpu form is the
production path (ops/apply.apply_separable_aligned, routed by
apply_band_operators impl='auto' for qualifying f32 band pairs).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import timed_scan  # noqa: E402
from benchmarks.regrid_precision import _host_f64, _setup  # noqa: E402


def compact_aligned(band):
    """(m, wk) for an exactly aligned constant-width band, else None.

    Aligned means: every dst cell i has exactly `width` contiguous live
    taps whose first source index is width*i — i.e. the source axis is
    partitioned into equal runs (integer-ratio regrid/downscale with
    cell-boundary alignment).
    """
    s = np.asarray(band.start)
    w = np.asarray(band.weights)
    live = w != 0.0
    width = live.sum(axis=1)
    if width.min() != width.max():
        return None
    m = int(width[0])
    if m < 1:
        return None
    first = live.argmax(axis=1)
    # contiguous live run per row
    idx = np.arange(w.shape[1])
    run = (first[:, None] <= idx) & (idx < (first + m)[:, None])
    if (live != run).any():
        return None
    eff = s + first
    n = len(s)
    if (eff != m * np.arange(n)).any() or m * n != band.n_src:
        return None
    wk = w[np.arange(n)[:, None], first[:, None] + idx[None, :m]]
    return m, np.ascontiguousarray(wk)


def make_fn(variant, wyk, wxk, my, mx, batch, H, W):
    Hd, Wd = H // my, W // mx
    wyk = jnp.asarray(wyk, jnp.float32)
    wxk = jnp.asarray(wxk, jnp.float32)

    def fn(f):
        f = f.reshape((-1, H, W))
        B = f.shape[0]
        f4 = f.reshape(B, Hd, my, W)
        if variant in ("vpu", "mixed"):
            t = (f4 * wyk[None, :, :, None]).sum(axis=2)
        else:
            t = jnp.einsum("bhmw,hm->bhw", f4, wyk,
                           precision=jax.lax.Precision.HIGHEST)
        t4 = t.reshape(B, Hd, Wd, mx)
        if variant == "vpu":
            out = (t4 * wxk[None, None, :, :]).sum(axis=3)
        else:
            out = jnp.einsum("bhwm,wm->bhw", t4, wxk,
                             precision=jax.lax.Precision.HIGHEST)
        return out.reshape((batch, Hd, Wd))

    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True,
                    choices=("einsum", "vpu", "mixed"))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--accuracy-only", action="store_true")
    args = ap.parse_args()

    by, bx = _setup()
    cy, cx = compact_aligned(by), compact_aligned(bx)
    assert cy is not None and cx is not None, "bands not aligned"
    my, wyk = cy
    mx, wxk = cx
    H, W = by.n_src, bx.n_src

    rng = np.random.default_rng(0)
    f = rng.uniform(250.0, 300.0, (1, H, W)).astype(np.float32)
    ref, _, _ = _host_f64(f[0], by, bx)
    fn1 = make_fn(args.variant, wyk, wxk, my, mx, 1, H, W)
    g = np.asarray(jax.jit(fn1)(jnp.asarray(f))[0], np.float64)
    rel = np.abs(g - ref) / np.maximum(np.abs(ref), 1e-30)
    flux = abs(g.sum() - ref.sum()) / abs(ref.sum())
    print(f"{args.variant}: max rel err {rel.max():.3e}  flux rel err "
          f"{flux:.3e}")
    if args.accuracy_only:
        return

    K = 12
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.uniform(250, 300, (K, args.batch, H, W)).astype(np.float32))
    fields, warm = mk(), mk()
    fn = make_fn(args.variant, wyk, wxk, my, mx, args.batch, H, W)
    dt = timed_scan(fn, fields, warm)
    print(f"{args.variant}: {args.batch * H * W / dt / 1e9:.2f} Gpixel/s  "
          f"({dt / args.batch * 1e6:.1f} us/frame)")


if __name__ == "__main__":
    main()
