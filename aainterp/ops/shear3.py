"""3-pass conservative shear decomposition: high-throughput rotated mode.

The exact rotated apply (polygon-clip ELL weights + the three-kernel
Pallas contraction, ops/pallas_shear.py) is closed at ~10 Gpixel/s on
v5e — MXU-pass-bound in its one-hot gather structure — while everything
separable serves at 150-312.  This module provides the speed/accuracy
trade the reference itself ships as its default "fast" mode
(/root/reference/Source.cpp:584-911, default interpolationMode=2 at
:1534): users who accept an approximation shouldn't pay the exact
path's floor.

Method (Paeth-style shear factorization, generalised to carry the
resolution change): the dst-index map of the rotated resample,
``B(p) = (1/L)·R(theta)·(p - p00)``  (GridSpec.linear_map inverted,
Source.cpp:203-221), factors into three AXIS-ALIGNED passes

    x1    = x - t*y                    t = tan(theta/2)   (x-pass, scale 1)
    dst_y = (n*x1 + y)/L               n = sin(theta)     (y-pass, scale s/L)
    dst_x = x1/L - t*dst_y                                (x-pass, scale s/L)

Each pass is an EXACT 1-D conservative (area-overlap) resample of its
axis — implemented as a per-line fractional translate (integer shift +
2-tap blend, the 1-D overlap weights of a pure translation) followed,
when the pass scale is not 1, by a SHARED banded interval-overlap
resample (overlap1d machinery).  Every stage is mass-preserving on the
interior, so flux conservation survives the composition; the boundary
renormalisation the reference applies per-pixel (divide by covered
area, Source.cpp:577) is recovered by dividing by the same pipeline
applied to a ones image (reciprocal coverage, precomputed per
geometry).

Approximation contract: each pass treats a source line as rigidly
shifted by its center's shear offset, so the result differs from the
true rotated-footprint overlap by O(shear * cell) smearing — measured
as PSNR/max-err vs exact mode in tests/test_shear3.py and
BENCHMARKS.md (substantially above the bilinear baseline, below the
exact operator).  Exact flux identities still hold (interior
conservation is by construction, not approximation).

Unlike the exact path there is NO ELL operator: the plan is O(H + W)
translate tables + two 1-D bands + an (Hd, Wd) coverage image, built in
milliseconds (the 2048^2 ELL build takes ~30 s).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..grids import GridSpec
from .overlap1d import Band1D


def _interval_band(src_edge0: float, src_pitch: float, n_src: int,
                   n_dst: int) -> Band1D:
    """Banded overlap of unit dst cells [i, i+1) with the uniform source
    grid whose cell j spans [src_edge0 + j*pitch, src_edge0 + (j+1)*pitch).

    Weights are overlap lengths in dst units (interior rows sum to 1
    exactly: the source grid partitions the line), float64 host math.
    """
    p = float(src_pitch)
    e0 = float(src_edge0)
    band = int(math.floor(1.0 / p)) + 2 if p < 1.0 else 2
    i = np.arange(n_dst, dtype=np.float64)
    lo = i          # dst cell i = [i, i+1)
    hi = i + 1.0
    # first source cell whose right edge exceeds lo
    start = np.floor((lo - e0) / p - 1.0).astype(np.int64) + 1
    start = np.clip(start, 0, max(n_src - band, 0))
    k = np.arange(band, dtype=np.float64)
    j = start[:, None] + k[None, :]
    c_lo = e0 + j * p
    c_hi = c_lo + p
    w = np.minimum(hi[:, None], c_hi) - np.maximum(lo[:, None], c_lo)
    w = np.maximum(w, 0.0)
    valid = (j >= 0) & (j < n_src)
    w = np.where(valid, w, 0.0)
    return Band1D(start=start.astype(np.int32), weights=w,
                  n_src=n_src, n_dst=n_dst)


@dataclasses.dataclass(frozen=True)
class Shear3Plan:
    """Host tables for the 3-pass sheared rotated apply (one geometry).

    Translate convention (applies to all three passes): shifting a line
    by delta >= 0 cells means ``out[u] = (1-f)*v[u-d] + f*v[u-d-1]``
    with d = floor(delta), f = frac(delta); out-of-range taps read 0.
    These are the exact 1-D conservative weights of a pure translation
    (the overlap of a unit cell translated by f is split (1-f, f)).
    """

    spec: GridSpec
    # pass 1: per-row x translate of the quadrant-rotated source
    d1: np.ndarray            # (qH,) int32
    f1: np.ndarray            # (qH,) float32
    W1: int                   # pass-1 output width (cells of pitch `scale`)
    # pass 2: per-column y translate (+ optional shared band H1 -> Hd)
    d2: np.ndarray            # (W1,) int32
    f2: np.ndarray            # (W1,) float32
    H1: int                   # rows after the y translate
    band2: Optional[Band1D]   # H1 -> Hd; None when scale == dst_side, in
    crop2: int                # which case dst row v = translate row crop2+v
    # pass 3: per-row x translate (+ optional shared band W2 -> Wd)
    d3: np.ndarray            # (Hd,) int32
    f3: np.ndarray            # (Hd,) float32
    W2: int                   # cols after the x translate
    band3: Optional[Band1D]   # W2 -> Wd; None when scale == dst_side, in
    crop3: int                # which case dst col k = translate col crop3+k
    # reciprocal coverage (0 where the footprint never lands,
    # Source.cpp:577's zero-background convention)
    inv_cov: np.ndarray       # (Hd, Wd) float32

    @property
    def dst_shape(self) -> Tuple[int, int]:
        return self.spec.dst_shape


def build_shear3_plan(spec: GridSpec) -> Shear3Plan:
    """Pass tables for one GridSpec (host float64; milliseconds).

    Valid for any residual angle in (0, 90); axis-aligned geometries
    should use the separable operator (raises ValueError).
    """
    if spec.is_axis_aligned:
        raise ValueError("shear3 is for rotated geometries; axis-aligned "
                         "specs take the separable path")
    qH, qW = spec.qrot_shape
    Hd, Wd = spec.dst_shape
    s = float(spec.scale)
    L = spec.dst_side
    c, n = spec.cos, spec.sin
    t = (1.0 - c) / n            # tan(theta/2), stable for theta in (0,90)
    rho = s / L                  # source-cell pitch in dst units

    p00, _, _ = spec.linear_map
    # dst-index map constants:  dst = (1/L) R(theta) (p - p00)
    #   dst_x(p) = ( c*(px-p00x) - n*(py-p00y)) / L
    #   dst_y(p) = ( n*(px-p00x) + c*(py-p00y)) / L
    # dst pixel (dx, dy) is the unit cell CENTERED at (dx, dy) in dst-index
    # space (Source.cpp:212-219), i.e. it spans [d - 0.5, d + 0.5).
    C2 = (-n * p00[0] - c * p00[1]) / L          # dst_y = (n*x1 + y)/L + C2
    # C3 fixed by evaluating dst_x = x1/L - t*dst_y + C3 at p = (0, 0)
    C3 = (-c * p00[0] + n * p00[1]) / L + t * C2

    # ---- pass 1: x1 = x - t*y, output pitch s --------------------------
    # row jy center y_c = jy*s + (s-1)/2; source cell jx left edge in x1:
    # jx*s - 0.5 - t*y_c.  Shift (in cells) relative to the LAST row so
    # every per-row delta is >= 0 (t >= 0 on (0, 90)).
    jy = np.arange(qH, dtype=np.float64)
    y_c = jy * s + (s - 1.0) / 2.0
    delta1 = t * (y_c[-1] - y_c) / s             # (qH,) >= 0, slope t
    d1 = np.floor(delta1).astype(np.int64)
    f1 = delta1 - d1
    W1 = qW + int(d1.max()) + 2
    # pass-1 grid offset: cell u spans x1 in [o1 + u*s, o1 + (u+1)*s);
    # the last row is unshifted, so o1 aligns its source edges exactly.
    o1 = -0.5 - t * y_c[-1]

    # ---- pass 2: dst_y = (n*x1 + y)/L + C2 -----------------------------
    # per-column shift (in source rows) aligning every column's grid to
    # column 0's:  delta2(u) = n*(x1c(u) - x1c(0))/s = n*u  (n >= 0).
    u = np.arange(W1, dtype=np.float64)
    delta2 = n * u
    # after the translate, mid-cell row j spans (uniformly over columns)
    # dst_y in [E2(j), E2(j) + s/L) with E2(j) = (n*x1c0 + j*s - 0.5)/L + C2
    x1c0 = o1 + 0.5 * s
    E2_0 = (n * x1c0 - 0.5) / L + C2
    crop2 = 0
    if s == L:
        # pitch-1 source: the shared band degenerates to a constant
        # fractional translate — fold it into the per-column deltas.  In
        # "row-index" coordinates vt = dst_y + 0.5 (so dst row v is the
        # unit cell [v, v+1)), source row j starts at E2_0 + 0.5 + j +
        # n*u; an extra integer lift keeps every delta >= 0, relabeling
        # output rows by crop2.
        delta2 = delta2 + E2_0 + 0.5
        crop2 = max(0, int(math.ceil(-float(delta2.min()))))
        delta2 = delta2 + crop2
        d2 = np.floor(delta2).astype(np.int64)
        f2 = delta2 - d2
        H1 = max(crop2 + Hd, qH + int(d2.max()) + 2)
        band2 = None
    else:
        d2 = np.floor(delta2).astype(np.int64)
        f2 = delta2 - d2
        H1 = qH + int(d2.max()) + 2
        band2 = _interval_band(E2_0 + 0.5, rho, H1, Hd)

    # ---- pass 3: dst_x = x1/L - t*dst_y + C3 ---------------------------
    # per-row shift (in pass-1 cells) aligning every dst row's grid to the
    # LAST dst row's: delta3(v) = t*(Hd-1 - v)*L/s >= 0.
    v = np.arange(Hd, dtype=np.float64)
    delta3 = t * (v[-1] - v) * L / s
    # uniform source edges after the translate (referenced to row Hd-1):
    # E3(j) = (o1 + j*s)/L - t*(Hd-1) + C3
    E3_0 = o1 / L - t * (Hd - 1.0) + C3
    crop3 = 0
    if s == L:
        # fold the constant part into the per-row deltas, as in pass 2
        delta3 = delta3 + E3_0 + 0.5
        crop3 = max(0, int(math.ceil(-float(delta3.min()))))
        delta3 = delta3 + crop3
        d3 = np.floor(delta3).astype(np.int64)
        f3 = delta3 - d3
        W2 = max(crop3 + Wd, W1 + int(d3.max()) + 2)
        band3 = None
    else:
        d3 = np.floor(delta3).astype(np.int64)
        f3 = delta3 - d3
        W2 = W1 + int(d3.max()) + 2
        band3 = _interval_band(E3_0 + 0.5, rho, W2, Wd)

    plan = Shear3Plan(
        spec=spec,
        d1=d1.astype(np.int32), f1=f1.astype(np.float32), W1=W1,
        d2=d2.astype(np.int32), f2=f2.astype(np.float32), H1=H1,
        band2=band2, crop2=crop2,
        d3=d3.astype(np.int32), f3=f3.astype(np.float32), W2=W2,
        band3=band3, crop3=crop3,
        inv_cov=np.ones((1, 1), np.float32),  # placeholder, replaced below
    )
    cov = _coverage_np(plan)
    inv_cov = np.where(cov > 1e-6, 1.0 / np.maximum(cov, 1e-30), 0.0)
    return dataclasses.replace(plan, inv_cov=inv_cov.astype(np.float32))


# ----------------------------------------------------------------------
# host (numpy) reference apply — also builds the coverage image
# ----------------------------------------------------------------------


def _translate_np(x: np.ndarray, d: np.ndarray, f: np.ndarray, n_out: int,
                  axis: int) -> np.ndarray:
    """Per-line fractional translate along ``axis`` (numpy, float64).

    out[u] = (1-f)*x[u-d] + f*x[u-d-1] with zero out-of-range taps;
    (d, f) vary along the OTHER axis.
    """
    x = np.moveaxis(x, axis, -1)
    n_in = x.shape[-1]
    lines = x.shape[-2]
    assert d.shape[0] == lines, (d.shape, x.shape)
    u = np.arange(n_out)
    j0 = u[None, :] - d[:, None].astype(np.int64)          # (lines, n_out)
    out = np.zeros(x.shape[:-1] + (n_out,), np.float64)
    for tap, wf in ((j0, 1.0 - f[:, None]), (j0 - 1, f[:, None])):
        valid = (tap >= 0) & (tap < n_in)
        tc = np.clip(tap, 0, n_in - 1)
        vals = np.take_along_axis(
            x, np.broadcast_to(tc, x.shape[:-1] + (n_out,)), axis=-1)
        out += np.where(valid, vals * wf, 0.0)
    return np.moveaxis(out, -1, axis)


def _band_np(x: np.ndarray, band: Band1D, axis: int) -> np.ndarray:
    """Banded 1-D resample along ``axis`` (numpy, float64)."""
    x = np.moveaxis(x, axis, -1)
    n_in = x.shape[-1]
    K = band.band
    start = band.start.astype(np.int64)
    out = np.zeros(x.shape[:-1] + (band.n_dst,), np.float64)
    for k in range(K):
        j = start + k
        valid = (j >= 0) & (j < n_in)
        jc = np.clip(j, 0, n_in - 1)
        vals = np.take_along_axis(
            x, np.broadcast_to(jc, x.shape[:-1] + (band.n_dst,)), axis=-1)
        out += np.where(valid, vals * band.weights[:, k], 0.0)
    return np.moveaxis(out, -1, axis)


def apply_shear3_np(plan: Shear3Plan, q: np.ndarray,
                    normalize: bool = True) -> np.ndarray:
    """Reference numpy apply of the 3-pass pipeline: (..., qH, qW) ->
    (..., Hd, Wd), float64.  Used by tests and the coverage build."""
    Hd, Wd = plan.spec.dst_shape
    x = np.asarray(q, np.float64)
    x = _translate_np(x, plan.d1, plan.f1.astype(np.float64), plan.W1, -1)
    x = _translate_np(np.swapaxes(x, -1, -2), plan.d2,
                      plan.f2.astype(np.float64), plan.H1, -1)
    x = np.swapaxes(x, -1, -2)
    if plan.band2 is not None:
        x = _band_np(np.swapaxes(x, -1, -2), plan.band2, -1)
        x = np.swapaxes(x, -1, -2)
    else:
        x = x[..., plan.crop2: plan.crop2 + Hd, :]
    x = _translate_np(x, plan.d3, plan.f3.astype(np.float64), plan.W2, -1)
    if plan.band3 is not None:
        x = _band_np(x, plan.band3, -1)
    else:
        x = x[..., plan.crop3: plan.crop3 + Wd]
    if normalize:
        x = x * plan.inv_cov.astype(np.float64)
    return x


def _coverage_np(plan: Shear3Plan) -> np.ndarray:
    """Coverage = pipeline applied to a ones image (interior == 1)."""
    qH, qW = plan.spec.qrot_shape
    return apply_shear3_np(plan, np.ones((qH, qW)), normalize=False)


# ----------------------------------------------------------------------
# XLA apply (fallback / CPU; the TPU path is ops/pallas_shear3.py)
# ----------------------------------------------------------------------


def _translate_xla(x: jax.Array, d: jax.Array, f: jax.Array, n_out: int,
                   axis: int) -> jax.Array:
    """Per-line fractional translate (XLA gather formulation)."""
    x = jnp.moveaxis(x, axis, -1)
    n_in = x.shape[-1]
    u = jnp.arange(n_out)
    j0 = u[None, :] - d[:, None]
    fw = f[:, None].astype(x.dtype)
    out = jnp.zeros(x.shape[:-1] + (n_out,), x.dtype)
    for tap, wf in ((j0, 1.0 - fw), (j0 - 1, fw)):
        valid = (tap >= 0) & (tap < n_in)
        tc = jnp.clip(tap, 0, n_in - 1)
        vals = jnp.take_along_axis(
            x, jnp.broadcast_to(tc, x.shape[:-1] + (n_out,)), axis=-1)
        out = out + jnp.where(valid, vals * wf, 0.0)
    return jnp.moveaxis(out, -1, axis)


def _band_xla(x: jax.Array, start: jax.Array, w: jax.Array,
              n_dst: int, axis: int) -> jax.Array:
    """Banded 1-D resample along ``axis`` (XLA gather formulation)."""
    x = jnp.moveaxis(x, axis, -1)
    n_in = x.shape[-1]
    K = w.shape[1]
    out = jnp.zeros(x.shape[:-1] + (n_dst,), x.dtype)
    for k in range(K):
        j = start + k
        valid = (j >= 0) & (j < n_in)
        jc = jnp.clip(j, 0, n_in - 1)
        vals = jnp.take_along_axis(
            x, jnp.broadcast_to(jc, x.shape[:-1] + (n_dst,)), axis=-1)
        out = out + jnp.where(valid, vals * w[:, k].astype(x.dtype), 0.0)
    return jnp.moveaxis(out, -1, axis)


def plan_arrays(plan: Shear3Plan, weight_dtype=jnp.float32) -> dict:
    """Device arrays of a plan's tables (kernel/jit arguments, never
    closures — closed-over arrays become HLO constants)."""
    with jax.ensure_compile_time_eval():
        arrs = dict(
            d1=jnp.asarray(plan.d1), f1=jnp.asarray(plan.f1),
            d2=jnp.asarray(plan.d2), f2=jnp.asarray(plan.f2),
            d3=jnp.asarray(plan.d3), f3=jnp.asarray(plan.f3),
            inv_cov=jnp.asarray(plan.inv_cov, dtype=weight_dtype),
        )
        for name, b in (("b2", plan.band2), ("b3", plan.band3)):
            if b is not None:
                arrs[name + "_start"] = jnp.asarray(b.start)
                arrs[name + "_w"] = jnp.asarray(
                    b.weights.astype(np.float32), dtype=weight_dtype)
    return arrs


def apply_shear3_xla(plan: Shear3Plan, q: jax.Array, arrs: dict,
                     out_dtype=None) -> jax.Array:
    """XLA 3-pass apply: (..., qH, qW) -> (..., Hd, Wd).

    Gather-based — correct everywhere, but the TPU production path is
    the Pallas pipeline (ops/pallas_shear3.py); this is the CPU / test
    / fallback route.
    """
    Hd, Wd = plan.spec.dst_shape
    in_dtype = q.dtype
    if out_dtype is None:
        out_dtype = in_dtype if in_dtype in (
            jnp.bfloat16, jnp.float32, jnp.uint8) else jnp.float32
    x = q.astype(jnp.float32)
    x = _translate_xla(x, arrs["d1"], arrs["f1"], plan.W1, -1)
    x = jnp.swapaxes(x, -1, -2)
    x = _translate_xla(x, arrs["d2"], arrs["f2"], plan.H1, -1)
    if plan.band2 is not None:
        x = _band_xla(x, arrs["b2_start"], arrs["b2_w"], Hd, -1)
    else:
        x = x[..., plan.crop2: plan.crop2 + Hd]
    x = jnp.swapaxes(x, -1, -2)
    x = _translate_xla(x, arrs["d3"], arrs["f3"], plan.W2, -1)
    if plan.band3 is not None:
        x = _band_xla(x, arrs["b3_start"], arrs["b3_w"], Wd, -1)
    else:
        x = x[..., plan.crop3: plan.crop3 + Wd]
    x = x * arrs["inv_cov"].astype(x.dtype)
    if jnp.dtype(out_dtype) == jnp.uint8:
        return jnp.clip(jnp.round(x), 0.0, 255.0).astype(jnp.uint8)
    return x.astype(out_dtype)
