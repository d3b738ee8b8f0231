"""3-pass conservative shear decomposition: high-throughput rotated mode.

The exact rotated apply (polygon-clip ELL weights + the three-kernel
Pallas contraction, ops/pallas_shear.py) is closed at ~10 Gpixel/s on
v5e — MXU-pass-bound in its one-hot gather structure — while everything
separable serves at 150-312.  This module provides the speed/accuracy
trade the reference itself ships as its default "fast" mode
(/root/reference/Source.cpp:584-911, default interpolationMode=2 at
:1534): users who accept an approximation shouldn't pay the exact
path's floor.

Method: the dst-index map of the rotated resample,
``B(p) = (1/L)·R(theta)·(p - p00)`` (GridSpec.linear_map inverted,
Source.cpp:203-221), factors into three AXIS-ALIGNED passes.  Two
decompositions are used, chosen by the per-axis cell ratio
rho = scale/dst_side:

  rho >= 1 (dst finer or equal — upscaling):   x-y-x, "expand late"
      x1    = x - t*y                 t = tan(theta/2)
      dst_y = (n*x1 + y)/L            n = sin(theta)
      dst_x = x1/L - t*dst_y
  rho < 1 (dst coarser — downscaling):         y-x-y, "reduce FIRST"
      y1    = (t*x + y)/L
      dst_x = x/L - n*y1
      dst_y = y1 + t*dst_x
  (both verified against the closed form in tests; the reduce-first
  ordering runs the expensive per-line translates on the REDUCED grids
  — at the 2048^2 -> 1399^2 30-deg config it does ~2.6x less VPU work
  and ~35% less HBM traffic than x-y-x, see BENCHMARKS.md.)

Each pass is a 1-D conservative resample of its axis, factored into a
SHARED banded interval-overlap resample (overlap1d machinery) and a
per-line fractional translate (integer shift + 2-tap blend — the exact
1-D overlap weights of a pure translation).  Reducing passes apply the
band FIRST (the translate then runs at dst pitch); enlarging passes
translate first (at source pitch).  Every stage is mass-preserving on
the interior, so flux conservation is EXACT by construction; the
reference's per-pixel boundary renormalisation (divide by covered
area, Source.cpp:577) is recovered by dividing by the same pipeline
applied to a ones image (reciprocal coverage, precomputed per
geometry).

Approximation contract: each pass treats a source line as rigidly
shifted by its center's shear offset, so the result differs from the
true rotated-footprint overlap by O(shear * cell) smearing — measured
vs exact mode in tests/test_shear3.py and BENCHMARKS.md (more accurate
than the reference's own fast mode; bilinear-class roundtrip
smoothing; exact flux identities regardless).

Unlike the exact path there is NO ELL operator: the plan is O(H + W)
translate tables + 1-D bands + an (Hd, Wd) coverage image, built in
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
class Pass1D:
    """One axis-aligned conservative pass of the shear pipeline.

    Translate convention: shifting a line by delta >= 0 cells means
    ``out[u] = (1-f)*v[u-d] + f*v[u-d-1]`` with d = floor(delta),
    f = frac(delta); out-of-range taps read 0.  These are the exact 1-D
    conservative weights of a pure translation.

    Composition order along the pass axis:
      band is None:        out = translate(in)[crop : crop + n_out]
      band_first = True:   out = translate(band(in))[crop : crop + n_out]
      band_first = False:  out = band(translate(in))   (crop == 0; the
                           band maps the translate grid to n_out)
    """

    axis: str                 # 'x' (last axis) or 'y' (second-to-last)
    band: Optional[Band1D]
    band_first: bool
    d: np.ndarray             # (n_lines,) int32 — lines = the OTHER axis
    f: np.ndarray             # (n_lines,) float32
    n_t: int                  # translate-grid size along the pass axis
    crop: int
    n_out: int                # output size along the pass axis


@dataclasses.dataclass(frozen=True)
class Shear3Plan:
    """Host tables for the 3-pass sheared rotated apply (one geometry).

    ``in_shape``/``out_shape`` default to the spec's qrot/dst shapes;
    ADJOINT plans (transpose_shear3_plan) run the reversed transposed
    passes, so their shapes swap and ``inv_cov`` is None (the caller
    chain-rules the coverage onto the cotangent instead)."""

    spec: GridSpec
    passes: Tuple[Pass1D, ...]
    # reciprocal coverage (0 where the footprint never lands,
    # Source.cpp:577's zero-background convention)
    inv_cov: Optional[np.ndarray]    # (out_shape) float32, or None
    in_shape: Optional[Tuple[int, int]] = None
    out_shape: Optional[Tuple[int, int]] = None

    @property
    def src_shape(self) -> Tuple[int, int]:
        return self.in_shape or self.spec.qrot_shape

    @property
    def dst_shape(self) -> Tuple[int, int]:
        return self.out_shape or self.spec.dst_shape


def _split_shift(delta: np.ndarray):
    d = np.floor(delta).astype(np.int64)
    return d, (delta - d)


def _passes_xyx(spec: GridSpec) -> Tuple[Pass1D, ...]:
    """Expand-late x-y-x decomposition (rho = s/L >= 1, and rho == 1)."""
    qH, qW = spec.qrot_shape
    Hd, Wd = spec.dst_shape
    s = float(spec.scale)
    L = spec.dst_side
    c, n = spec.cos, spec.sin
    t = (1.0 - c) / n
    rho = s / L

    p00, _, _ = spec.linear_map
    C2 = (-n * p00[0] - c * p00[1]) / L          # dst_y = (n*x1 + y)/L + C2
    C3 = (-c * p00[0] + n * p00[1]) / L + t * C2

    # ---- pass 1: x1 = x - t*y, pure translate at source pitch --------
    jy = np.arange(qH, dtype=np.float64)
    y_c = jy * s + (s - 1.0) / 2.0
    delta1 = t * (y_c[-1] - y_c) / s             # >= 0, slope t
    d1, f1 = _split_shift(delta1)
    W1 = qW + int(d1.max()) + 2
    o1 = -0.5 - t * y_c[-1]                      # pass-1 grid offset
    passes = [Pass1D(axis="x", band=None, band_first=False,
                     d=d1.astype(np.int32), f=f1.astype(np.float32),
                     n_t=W1, crop=0, n_out=W1)]

    # ---- pass 2: dst_y = (n*x1 + y)/L + C2 ---------------------------
    u = np.arange(W1, dtype=np.float64)
    delta2 = n * u                               # per-column, slope n
    x1c0 = o1 + 0.5 * s
    E2_0 = (n * x1c0 - 0.5) / L + C2
    if s == L:
        delta2 = delta2 + E2_0 + 0.5
        crop2 = max(0, int(math.ceil(-float(delta2.min()))))
        delta2 = delta2 + crop2
        d2, f2 = _split_shift(delta2)
        H1 = max(crop2 + Hd, qH + int(d2.max()) + 2)
        passes.append(Pass1D(axis="y", band=None, band_first=False,
                             d=d2.astype(np.int32),
                             f=f2.astype(np.float32),
                             n_t=H1, crop=crop2, n_out=Hd))
    else:
        d2, f2 = _split_shift(delta2)
        H1 = qH + int(d2.max()) + 2
        passes.append(Pass1D(
            axis="y", band=_interval_band(E2_0 + 0.5, rho, H1, Hd),
            band_first=False, d=d2.astype(np.int32),
            f=f2.astype(np.float32), n_t=H1, crop=0, n_out=Hd))

    # ---- pass 3: dst_x = x1/L - t*dst_y + C3 -------------------------
    v = np.arange(Hd, dtype=np.float64)
    delta3 = t * (v[-1] - v) * L / s             # >= 0
    E3_0 = o1 / L - t * (Hd - 1.0) + C3
    if s == L:
        delta3 = delta3 + E3_0 + 0.5
        crop3 = max(0, int(math.ceil(-float(delta3.min()))))
        delta3 = delta3 + crop3
        d3, f3 = _split_shift(delta3)
        W2 = max(crop3 + Wd, W1 + int(d3.max()) + 2)
        passes.append(Pass1D(axis="x", band=None, band_first=False,
                             d=d3.astype(np.int32),
                             f=f3.astype(np.float32),
                             n_t=W2, crop=crop3, n_out=Wd))
    else:
        d3, f3 = _split_shift(delta3)
        W2 = W1 + int(d3.max()) + 2
        passes.append(Pass1D(
            axis="x", band=_interval_band(E3_0 + 0.5, rho, W2, Wd),
            band_first=False, d=d3.astype(np.int32),
            f=f3.astype(np.float32), n_t=W2, crop=0, n_out=Wd))
    return tuple(passes)


def _passes_yxy(spec: GridSpec) -> Tuple[Pass1D, ...]:
    """Reduce-first y-x-y decomposition (rho = s/L < 1, downscaling).

      y1    = (t*x + y)/L + c1     band-first: reduce rows, then shift
      dst_x = x/L - n*y1 + c2      band-first: reduce cols, then shift
      dst_y = y1 + t*dst_x + c3    pure translate at dst pitch

    Verified: x/L - n*(tx+y)/L = (c*x - n*y)/L and
    (tx+y)/L + t*(cx-ny)/L = (n*x + c*y)/L — the exact dst-index maps.
    """
    qH, qW = spec.qrot_shape
    Hd, Wd = spec.dst_shape
    s = float(spec.scale)
    L = spec.dst_side
    c, n = spec.cos, spec.sin
    t = (1.0 - c) / n
    rho = s / L
    p00, _, _ = spec.linear_map
    Cx0 = -(c * p00[0] - n * p00[1]) / L         # dst_x = (c*x - n*y)/L + Cx0
    Cy0 = -(n * p00[0] + c * p00[1]) / L         # dst_y = (n*x + c*y)/L + Cy0
    c3 = Cy0 - t * Cx0                           # dst_y = y1 + t*dst_x + c3

    # ---- pass 1 (y): band reduce mu = y/L, then shift by t*x/L -------
    # source row j spans mu in [(j*s-0.5)/L, +rho); mid rows unit cells
    # [r + om, r+1+om) with om = -0.5/L  ->  band edges at 0 relative
    n_mid1 = int(math.ceil(qH * rho)) + 2
    om = -0.5 / L
    B1 = _interval_band(0.0, rho, qH, n_mid1)
    x_c = (np.arange(qW, dtype=np.float64) * s + (s - 1.0) / 2.0)
    delta1 = t * (x_c - x_c[0]) / L              # >= 0, slope t*s/L
    d1, f1 = _split_shift(delta1)
    n_t1 = n_mid1 + int(d1.max()) + 2
    # y1 grid: cell v = [v + o1v, v+1+o1v) with o1v = om + t*x_c[0]/L + c1;
    # c1 is free — fold it to 0 and carry the offset symbolically
    o1v = om + t * x_c[0] / L
    passes = [Pass1D(axis="y", band=B1, band_first=True,
                     d=d1.astype(np.int32), f=f1.astype(np.float32),
                     n_t=n_t1, crop=0, n_out=n_t1)]

    # ---- pass 2 (x): band reduce xi = x/L, then shift by -n*y1 + c2 --
    n_mid2 = int(math.ceil(qW * rho)) + 2
    B2 = _interval_band(0.0, rho, qW, n_mid2)
    oxi = -0.5 / L
    # out position (xt = dst_x + 0.5): mid cell m + oxi - n*y1c(v) + Cx0
    # + 0.5; y1 center of row v: v + 0.5 + o1v
    v = np.arange(n_t1, dtype=np.float64)
    delta2 = oxi - n * (v + 0.5 + o1v) + Cx0 + 0.5
    crop2 = max(0, int(math.ceil(-float(delta2.min()))))
    delta2 = delta2 + crop2
    assert delta2.min() >= 0.0
    d2, f2 = _split_shift(delta2)
    n_t2 = max(crop2 + Wd, n_mid2 + int(d2.max()) + 2)
    passes.append(Pass1D(axis="x", band=B2, band_first=True,
                         d=d2.astype(np.int32), f=f2.astype(np.float32),
                         n_t=n_t2, crop=crop2, n_out=Wd))

    # ---- pass 3 (y): pure translate, dst pitch -----------------------
    # out position (yt = dst_y + 0.5): y1 cell v + o1v + t*k + c3 + 0.5
    # per dst column k (dst_x center = k)
    k = np.arange(Wd, dtype=np.float64)
    delta3 = o1v + t * k + c3 + 0.5
    crop3 = max(0, int(math.ceil(-float(delta3.min()))))
    delta3 = delta3 + crop3
    assert delta3.min() >= 0.0
    d3, f3 = _split_shift(delta3)
    n_t3 = max(crop3 + Hd, n_t1 + int(d3.max()) + 2)
    passes.append(Pass1D(axis="y", band=None, band_first=False,
                         d=d3.astype(np.int32), f=f3.astype(np.float32),
                         n_t=n_t3, crop=crop3, n_out=Hd))
    return tuple(passes)


def build_shear3_plan(spec: GridSpec,
                      decomposition: str = "auto") -> Shear3Plan:
    """Pass tables for one GridSpec (host float64; milliseconds).

    decomposition:
      'auto'/'quality' — x-y-x with translates at source pitch: the
          robust accuracy point (beats the reference's fast mode on
          ALL content classes tested, incl. near-Nyquist).
      'fast' — y-x-y reduce-first when the geometry downscales
          (scale < dst_side), else x-y-x.  ~2x the throughput (the
          per-line translates run on the REDUCED grids) at dst-pitch
          translate quantisation: still beats the reference's fast
          mode on smooth content (the dosimetry domain), but LOSES to
          it near Nyquist — see tests/test_shear3.py's pinned contract
          and BENCHMARKS.md.
      'xyx' / 'yxy' — force a specific decomposition (yxy requires
          scale < dst_side).
    Valid for any residual angle in (0, 90); axis-aligned geometries
    should use the separable operator (raises ValueError).
    """
    if spec.is_axis_aligned:
        raise ValueError("shear3 is for rotated geometries; axis-aligned "
                         "specs take the separable path")
    rho = spec.scale / spec.dst_side
    if decomposition in ("auto", "quality"):
        decomposition = "xyx"
    elif decomposition == "fast":
        decomposition = "yxy" if rho < 1.0 else "xyx"
    if decomposition == "xyx":
        passes = _passes_xyx(spec)
    elif decomposition == "yxy":
        if rho >= 1.0:
            raise ValueError("yxy (reduce-first) needs scale < dst_side")
        passes = _passes_yxy(spec)
    else:
        raise ValueError(f"unknown decomposition {decomposition!r}")
    plan = Shear3Plan(spec=spec, passes=passes,
                      inv_cov=np.ones((1, 1), np.float32))
    cov = _coverage_np(plan)
    inv_cov = np.where(cov > 1e-6, 1.0 / np.maximum(cov, 1e-30), 0.0)
    return dataclasses.replace(plan, inv_cov=inv_cov.astype(np.float32))


# ----------------------------------------------------------------------
# host (numpy) reference apply — also builds the coverage image
# ----------------------------------------------------------------------


def _translate_np(x: np.ndarray, d: np.ndarray, f: np.ndarray,
                  n_out: int) -> np.ndarray:
    """Per-line fractional translate along the LAST axis (float64).

    out[u] = (1-f)*x[u-d] + f*x[u-d-1]; (d, f) vary along axis -2."""
    n_in = x.shape[-1]
    lines = x.shape[-2]
    assert d.shape[0] == lines, (d.shape, x.shape)
    u = np.arange(n_out)
    j0 = u[None, :] - d[:, None].astype(np.int64)
    out = np.zeros(x.shape[:-1] + (n_out,), np.float64)
    for tap, wf in ((j0, 1.0 - f[:, None]), (j0 - 1, f[:, None])):
        valid = (tap >= 0) & (tap < n_in)
        tc = np.clip(tap, 0, n_in - 1)
        vals = np.take_along_axis(
            x, np.broadcast_to(tc, x.shape[:-1] + (n_out,)), axis=-1)
        out += np.where(valid, vals * wf, 0.0)
    return out


def _band_np(x: np.ndarray, band: Band1D) -> np.ndarray:
    """Banded 1-D resample along the LAST axis (numpy, float64)."""
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
    return out


def _apply_pass_np(x: np.ndarray, p: Pass1D) -> np.ndarray:
    if p.axis == "y":
        x = np.swapaxes(x, -1, -2)
    f64 = p.f.astype(np.float64)
    if p.band is not None and p.band_first:
        x = _band_np(x, p.band)
        x = _translate_np(x, p.d, f64, p.n_t)
        x = x[..., p.crop: p.crop + p.n_out]
    elif p.band is not None:
        x = _translate_np(x, p.d, f64, p.n_t)
        x = _band_np(x, p.band)
    else:
        x = _translate_np(x, p.d, f64, p.n_t)
        x = x[..., p.crop: p.crop + p.n_out]
    if p.axis == "y":
        x = np.swapaxes(x, -1, -2)
    return x


def apply_shear3_np(plan: Shear3Plan, q: np.ndarray,
                    normalize: bool = True) -> np.ndarray:
    """Reference numpy apply of the pass pipeline: (..., qH, qW) ->
    (..., Hd, Wd), float64.  Used by tests and the coverage build."""
    x = np.asarray(q, np.float64)
    for p in plan.passes:
        x = _apply_pass_np(x, p)
    if normalize and plan.inv_cov is not None:
        x = x * plan.inv_cov.astype(np.float64)
    return x


def _coverage_np(plan: Shear3Plan) -> np.ndarray:
    """Coverage = pipeline applied to a ones image (interior == 1)."""
    qH, qW = plan.src_shape
    return apply_shear3_np(plan, np.ones((qH, qW)), normalize=False)


# ----------------------------------------------------------------------
# XLA apply (fallback / CPU; the TPU path is ops/pallas_shear3.py)
# ----------------------------------------------------------------------


def _translate_xla(x: jax.Array, d: jax.Array, f: jax.Array,
                   n_out: int) -> jax.Array:
    """Per-line fractional translate along the last axis (XLA gather)."""
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
    return out


def _band_xla(x: jax.Array, start: jax.Array, w: jax.Array,
              n_dst: int) -> jax.Array:
    """Banded 1-D resample along the last axis (XLA gather)."""
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
    return out


def plan_arrays(plan: Shear3Plan, weight_dtype=jnp.float32) -> dict:
    """Device arrays of a plan's tables (kernel/jit arguments, never
    closures — closed-over arrays become HLO constants)."""
    with jax.ensure_compile_time_eval():
        arrs = {}
        if plan.inv_cov is not None:
            arrs["inv_cov"] = jnp.asarray(plan.inv_cov, dtype=weight_dtype)
        for i, p in enumerate(plan.passes):
            arrs[f"p{i}_d"] = jnp.asarray(p.d)
            arrs[f"p{i}_f"] = jnp.asarray(p.f)
            if p.band is not None:
                arrs[f"p{i}_start"] = jnp.asarray(p.band.start)
                arrs[f"p{i}_w"] = jnp.asarray(
                    p.band.weights.astype(np.float32), dtype=weight_dtype)
    return arrs


def apply_shear3_xla(plan: Shear3Plan, q: jax.Array, arrs: dict,
                     out_dtype=None) -> jax.Array:
    """XLA pass-pipeline apply: (..., qH, qW) -> (..., Hd, Wd).

    Gather-based — correct everywhere, but the TPU production path is
    the Pallas pipeline (ops/pallas_shear3.py); this is the CPU / test
    / fallback route.
    """
    in_dtype = q.dtype
    if out_dtype is None:
        out_dtype = in_dtype if in_dtype in (
            jnp.bfloat16, jnp.float32, jnp.uint8) else jnp.float32
    x = q.astype(jnp.float32)
    for i, p in enumerate(plan.passes):
        if p.axis == "y":
            x = jnp.swapaxes(x, -1, -2)
        d, f = arrs[f"p{i}_d"], arrs[f"p{i}_f"]
        if p.band is not None and p.band_first:
            x = _band_xla(x, arrs[f"p{i}_start"], arrs[f"p{i}_w"],
                          p.band.n_dst)
            x = _translate_xla(x, d, f, p.n_t)
            x = x[..., p.crop: p.crop + p.n_out]
        elif p.band is not None:
            x = _translate_xla(x, d, f, p.n_t)
            x = _band_xla(x, arrs[f"p{i}_start"], arrs[f"p{i}_w"],
                          p.band.n_dst)
        else:
            x = _translate_xla(x, d, f, p.n_t)
            x = x[..., p.crop: p.crop + p.n_out]
        if p.axis == "y":
            x = jnp.swapaxes(x, -1, -2)
    if plan.inv_cov is not None:
        x = x * arrs["inv_cov"].astype(x.dtype)
    if jnp.dtype(out_dtype) == jnp.uint8:
        return jnp.clip(jnp.round(x), 0.0, 255.0).astype(jnp.uint8)
    return x.astype(out_dtype)


# ----------------------------------------------------------------------
# adjoint plan: the pass vocabulary is closed under transposition
# ----------------------------------------------------------------------


def _transpose_translate(d: np.ndarray, f: np.ndarray, n_in: int,
                         crop: int, n_out: int):
    """Tables of (crop o translate)^T as another (translate, crop) pair.

    Forward (n_in -> n_out): out[u] = (1-f) v[u+crop-d] + f v[u+crop-d-1]
    for u in [0, n_out).  The adjoint scatters cot back:
    v_bar[j] = (1-f) cot[j+d-crop] + f cot[j+d+1-crop] — itself a
    fractional translate with per-line shift crop - d - f, lifted by an
    integer K so every shift is >= 0 and realised as translate-then-crop.
    Returns (d_T, f_T, n_t_T, crop_T=K, n_out_T=n_in).
    """
    d = d.astype(np.int64)
    fpos = f > 0.0
    d_T = np.where(fpos, crop - d - 1, crop - d)
    f_T = np.where(fpos, 1.0 - f, 0.0)
    K = max(0, int(-d_T.min()))
    d_T = d_T + K
    n_t_T = max(K + n_in, n_out + int(d_T.max()) + 2)
    return (d_T.astype(np.int32), f_T.astype(np.float32), int(n_t_T),
            int(K), int(n_in))


def transpose_shear3_plan(plan: Shear3Plan) -> Shear3Plan:
    """The exact adjoint pipeline as another Shear3Plan.

    Reverse the passes and transpose each component: translate^T is a
    translate with lifted negated shifts (+ crop by the lift), band^T
    is overlap1d.transpose_band, and pre-band <-> post-band swap.  The
    adjoint plan carries inv_cov=None — the coverage chain rule
    (q_bar = P^T (inv_cov * cot)) belongs to the caller.  Validated
    against jax.vjp of the XLA forward in tests/test_shear3.py.
    """
    from .overlap1d import transpose_band

    # walk the FORWARD chain to recover each stage's input size along
    # its own axis (Pass1D doesn't store it)
    rows, cols = plan.src_shape
    stage_in = []
    for p in plan.passes:
        stage_in.append(rows if p.axis == "y" else cols)
        if p.axis == "y":
            rows = p.n_out
        else:
            cols = p.n_out

    passes_T = []
    for p, n_stage_in in zip(reversed(plan.passes),
                             reversed(stage_in)):
        if p.band is not None and p.band_first:
            # forward: crop o T o B   (B: n_stage_in -> band.n_dst;
            #                          T: band.n_dst -> crop window)
            # adjoint: B^T o T^T — band AFTER translate
            d_T, f_T, n_t_T, K, _ = _transpose_translate(
                p.d, p.f, p.band.n_dst, p.crop, p.n_out)
            bT = transpose_band(p.band)      # band.n_dst -> n_stage_in
            # the post-band consumes the translate GRID in our pass
            # semantics: fold the crop K into the band's start offsets
            bT2 = Band1D(start=(bT.start.astype(np.int64) + K
                                ).astype(np.int32),
                         weights=bT.weights, n_src=n_t_T,
                         n_dst=bT.n_dst)
            passes_T.append(Pass1D(axis=p.axis, band=bT2,
                                   band_first=False, d=d_T, f=f_T,
                                   n_t=n_t_T, crop=0, n_out=bT.n_dst))
        elif p.band is not None:
            # forward: B o T   (T: n_stage_in -> n_t; B: n_t -> n_out)
            # adjoint: T^T o B^T — band FIRST, then translate + crop
            bT = transpose_band(p.band)      # n_out -> n_t
            d_T, f_T, n_t_T, K, n_out_T = _transpose_translate(
                p.d, p.f, n_stage_in, 0, p.n_t)
            passes_T.append(Pass1D(axis=p.axis, band=bT,
                                   band_first=True, d=d_T, f=f_T,
                                   n_t=n_t_T, crop=K, n_out=n_out_T))
        else:
            d_T, f_T, n_t_T, K, n_out_T = _transpose_translate(
                p.d, p.f, n_stage_in, p.crop, p.n_out)
            passes_T.append(Pass1D(axis=p.axis, band=None,
                                   band_first=False, d=d_T, f=f_T,
                                   n_t=n_t_T, crop=K, n_out=n_out_T))
    return Shear3Plan(spec=plan.spec, passes=tuple(passes_T),
                      inv_cov=None, in_shape=plan.dst_shape,
                      out_shape=plan.src_shape)
