"""Pallas TPU pipeline for the 3-pass sheared rotated mode (ops/shear3).

Three kernels, each reading its input once and writing its output once
(the pass structure is axis-local, so no fusion across passes is
possible without re-reading overlapped windows — same accounting that
killed the fused exact-shear variants, BENCHMARKS.md):

  X1. x-translate: per-row fractional translate along lanes.  The
      integer shifts use the residual-roll scheme proven in
      ops/pallas_shear.py (per-row-block 128-aligned base hoisted to a
      dynamic aligned store offset; in-register bit rolls cover only
      the residual); the fractional part is ONE extra static roll and a
      2-tap blend.
  Y2. y-translate (+ shared banded resample when scale != dst_side):
      per-column-strip translate along sublanes (16-aligned bases),
      then the shared 1-D band as densified (TY, SY) @ (SY, 128) MXU
      matmuls straight out of VMEM — the same banded y-pass shape as
      the 311 Gpixel/s separable kernel.
  X3. x-translate (+ shared band + reciprocal-coverage normalise +
      output cast): per-row-block translate, banded x matmuls at
      128-aligned dynamic offsets, multiply by the prefetched inv_cov
      block, round/saturate for uint8.

All I/O is BlockSpec-driven (Mosaic auto-pipelines the block DMAs);
the planner aligns every crop offset (crop2 to the X3 row-block size,
crop3 to the lane tile) so no kernel needs an unaligned access.
Intermediates are bf16 by default (the approximation error of the mode
is ~1e-3 relative; bf16 adds ~4e-3 worst-case rounding — measured in
tests against the f32 pipeline) — halving the dominant HBM traffic.

Reference context: this serves Source.cpp's rotated configs
(Source.cpp:411-579 semantics approximated per ops/shear3.py's
contract) at separable-class throughput.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_apply import _densify_row_band
from .shear3 import Shear3Plan


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _rdn(x: int, m: int) -> int:
    return (x // m) * m


def _to_f32(x):
    if x.dtype == jnp.uint8:
        return x.astype(jnp.int32).astype(jnp.float32)
    return x.astype(jnp.float32)


# ----------------------------------------------------------------------
# host planner
# ----------------------------------------------------------------------


@dataclasses.dataclass
class Shear3KernelPlan:
    """Static geometry + host tables for the three kernels."""

    # pass X1
    qH: int
    qW: int
    qWp: int
    qHp: int              # qH padded to BLKR1 (kernel grid rows)
    BLKR1: int
    RW1: int
    nb1: int
    W1p: int              # X1 output width (128-aligned)
    base1: np.ndarray     # (qHp/BLKR1,) int32 128-aligned lane bases
    d1: np.ndarray        # (qHp, 1) int32 residual source tables
    f1: np.ndarray        # (qHp, 1) float32
    # pass Y2
    RH2: int
    nb2: int
    H2p: int              # Y2 output rows (translate grid or dst rows)
    base2: np.ndarray     # (W1p/128,) int32 16-aligned sublane bases
    d2: np.ndarray        # (1, W1p) int32
    f2: np.ndarray        # (1, W1p) float32
    Hsc2: int             # band-branch scratch rows (0 = fold branch)
    TY2: int
    rb2: Optional[np.ndarray]   # (nty2,) int32 8-aligned band row bases
    wy2: Optional[np.ndarray]   # (nty2, TY2, SY2) float32
    SY2: int
    crop2: int            # X3 input row offset (multiple of BLKR3)
    # pass X3
    BLKR3: int
    RW3: int
    nb3: int
    Wsc3: int             # translate scratch width (128-aligned)
    base3: np.ndarray     # (Hd3p/BLKR3,) int32 128-aligned lane bases
    d3: np.ndarray        # (Hd3p, 1) int32
    f3: np.ndarray        # (Hd3p, 1) float32
    TX3: int
    cb3: Optional[np.ndarray]   # (ntx3,) int32 128-aligned band col bases
    wx3: Optional[np.ndarray]   # (ntx3, SX3, TX3) float32
    SX3: int
    crop3: int            # fold-branch output col offset (mult of 128)
    Hd3p: int
    Wd3p: int
    inv_cov: np.ndarray   # (Hd3p, Wd3p) float32
    Hd: int
    Wd: int


def build_shear3_kernel_plan(plan: Shear3Plan, blkr1: int = 256,
                             blkr3: int = 128) -> Shear3KernelPlan:
    """Kernel tables from a Shear3Plan (host, exact integers)."""
    spec = plan.spec
    qH, qW = spec.qrot_shape
    Hd, Wd = spec.dst_shape

    # ---- X1 ----
    BLKR1 = blkr1
    qHp = _rup(qH, BLKR1)
    qWp = _rup(qW, 128)
    d1 = np.zeros(qHp, np.int64)
    f1 = np.zeros(qHp, np.float32)
    d1[:qH] = plan.d1
    d1[qH:] = plan.d1[-1] if qH else 0
    f1[:qH] = plan.f1
    nrb1 = qHp // BLKR1
    base1 = np.array([_rdn(int(d1[r * BLKR1:(r + 1) * BLKR1].min()), 128)
                      for r in range(nrb1)], np.int64)
    resid1 = d1 - np.repeat(base1, BLKR1)
    assert (resid1 >= 0).all()
    nb1 = max(1, int(resid1.max() + 1).bit_length())  # +1: the frac tap
    RW1 = _rup(max(qWp, qW + int(resid1.max()) + 2), 128)
    W1p = _rup(max(int(base1.max()) + RW1, plan.W1), 128)

    # ---- Y2 ----
    ncs = W1p // 128
    d2 = np.zeros(W1p, np.int64)
    f2 = np.zeros(W1p, np.float32)
    n2 = min(plan.W1, W1p)
    d2[:n2] = plan.d2[:n2]
    d2[n2:] = plan.d2[-1]
    f2[:n2] = plan.f2[:n2]
    fold2 = plan.band2 is None
    BLKR3 = blkr3
    crop2 = plan.crop2
    if fold2 and crop2 % BLKR3:
        # lift the whole translate grid so the X3 row blocks start on a
        # block boundary (pure relabeling: content and crop move together)
        lift = BLKR3 - crop2 % BLKR3
        d2 += lift
        crop2 += lift
    base2 = np.array([_rdn(int(d2[c * 128:(c + 1) * 128].min()), 16)
                      for c in range(ncs)], np.int64)
    resid2 = d2 - np.repeat(base2, 128)
    assert (resid2 >= 0).all()
    nb2 = max(1, int(resid2.max() + 1).bit_length())
    RH2 = _rup(qHp + int(resid2.max()) + 2, 16)
    Hfull = int(base2.max()) + RH2        # translate-grid rows touched

    rb2 = wy2 = None
    SY2 = 0
    TY2 = 128
    Hsc2 = 0
    if fold2:
        Hd3p = _rup(Hd, BLKR3)
        # X3 consumes this array in BLKR3-row BlockSpec blocks: keep the
        # row count block-divisible
        H2p = _rup(max(Hfull, crop2 + Hd3p), BLKR3)
        crop2_eff = crop2
    else:
        crop2_eff = 0
        Hsc2 = _rup(Hfull, 8)
        b2 = plan.band2
        rb2, wy2, SY2 = _densify_row_band(
            b2.start, b2.weights.astype(np.float32), Hsc2, TY2, align=8)
        Hd3p = _rup(Hd, BLKR3)
        H2p = _rup(Hd, TY2)
        assert H2p >= Hd3p  # TY2 == BLKR3-compatible grids
    assert crop2_eff % BLKR3 == 0

    # ---- X3 ----
    Hd3p = _rup(Hd, BLKR3)
    d3 = np.zeros(Hd3p, np.int64)
    f3 = np.zeros(Hd3p, np.float32)
    d3[:Hd] = plan.d3
    d3[Hd:] = plan.d3[-1] if Hd else 0
    f3[:Hd] = plan.f3
    fold3 = plan.band3 is None
    crop3 = plan.crop3
    if fold3 and crop3 % 128:
        lift = 128 - crop3 % 128
        d3 += lift
        crop3 += lift
    nrb3 = Hd3p // BLKR3
    base3 = np.array([_rdn(int(d3[r * BLKR3:(r + 1) * BLKR3].min()), 128)
                      for r in range(nrb3)], np.int64)
    resid3 = d3 - np.repeat(base3, BLKR3)
    assert (resid3 >= 0).all()
    nb3 = max(1, int(resid3.max() + 1).bit_length())
    RW3 = _rup(max(W1p, plan.W1 + int(resid3.max()) + 2), 128)
    Wfull = int(base3.max()) + RW3
    Wd3p = _rup(Wd, 128)
    cb3 = wx3 = None
    SX3 = 0
    TX3 = 128
    if fold3:
        Wsc3 = _rup(max(Wfull, crop3 + Wd3p), 128)
    else:
        Wsc3 = _rup(Wfull, 128)
        b3 = plan.band3
        cb3, wx3_t, SX3 = _densify_row_band(
            b3.start, b3.weights.astype(np.float32), Wsc3, TX3, align=128)
        wx3 = np.ascontiguousarray(np.swapaxes(wx3_t, 1, 2))

    inv_cov = np.zeros((Hd3p, Wd3p), np.float32)
    inv_cov[:Hd, :Wd] = plan.inv_cov

    return Shear3KernelPlan(
        qH=qH, qW=qW, qWp=qWp, qHp=qHp, BLKR1=BLKR1, RW1=RW1, nb1=nb1,
        W1p=W1p, base1=base1.astype(np.int32),
        d1=d1.astype(np.int32)[:, None], f1=f1[:, None],
        RH2=RH2, nb2=nb2, H2p=H2p, base2=base2.astype(np.int32),
        d2=d2.astype(np.int32)[None, :], f2=f2[None, :],
        Hsc2=Hsc2, TY2=TY2, rb2=rb2, wy2=wy2, SY2=SY2, crop2=crop2_eff,
        BLKR3=BLKR3, RW3=RW3, nb3=nb3, Wsc3=Wsc3,
        base3=base3.astype(np.int32),
        d3=d3.astype(np.int32)[:, None], f3=f3[:, None],
        TX3=TX3, cb3=cb3, wx3=wx3, SX3=SX3, crop3=crop3,
        Hd3p=Hd3p, Wd3p=Wd3p, inv_cov=inv_cov, Hd=Hd, Wd=Wd,
    )


# ----------------------------------------------------------------------
# kernels
# ----------------------------------------------------------------------


def _frac_roll(x, resid, frac, nb, axis):
    """Fractional roll: bit-rolls by the integer residual, then a 2-tap
    blend with the +1 static roll.  x is f32; resid/frac broadcast along
    the other axis."""
    for k in range(nb):
        x = jnp.where(((resid >> k) & 1) == 1,
                      pltpu.roll(x, 1 << k, axis=axis), x)
    x1 = pltpu.roll(x, 1, axis=axis)
    return x * (1.0 - frac) + x1 * frac


@functools.lru_cache(maxsize=32)
def _build_x1(F, qHp, qWp, BLKR1, RW1, nb1, W1p, in_dtype_name,
              mid_dtype_name, interpret):
    in_dtype = jnp.dtype(in_dtype_name)
    mid_dtype = jnp.dtype(mid_dtype_name)

    def kernel(base_ref, d_ref, f_ref, x_ref, out_ref):
        r = pl.program_id(1)
        base = pl.multiple_of(base_ref[r], 128)
        x = jnp.pad(_to_f32(x_ref[0]), ((0, 0), (0, RW1 - qWp)))
        resid = d_ref[0] - base                      # (BLKR1, 1)
        y = _frac_roll(x, resid, f_ref[0], nb1, axis=1)
        out_ref[0] = jnp.zeros((BLKR1, W1p), mid_dtype)
        out_ref[0, :, pl.ds(base, RW1)] = y.astype(mid_dtype)

    nrb = qHp // BLKR1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(F, nrb),
        in_specs=[
            pl.BlockSpec((1, BLKR1, 1), lambda f, r, *_: (0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLKR1, 1), lambda f, r, *_: (0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLKR1, qWp), lambda f, r, *_: (f, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLKR1, W1p), lambda f, r, *_: (f, r, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, qHp, W1p), mid_dtype),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _build_y2(F, qHp, W1p, RH2, nb2, H2p, Hsc2, TY2, SY2, nty2,
              mid_dtype_name, interpret):
    mid_dtype = jnp.dtype(mid_dtype_name)
    band = Hsc2 > 0
    # f32 staging keeps true f32 dots (DEFAULT silently truncates
    # operands to bf16); the bf16 pipeline accepts the one-pass rounding
    # (within the mode's approximation contract) for half the MXU passes
    prec = (jax.lax.Precision.HIGHEST if mid_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def kernel(*refs):
        if band:
            (base_ref, rb_ref, d_ref, f_ref, x_ref, wy_ref, out_ref,
             scr_ref) = refs
        else:
            base_ref, d_ref, f_ref, x_ref, out_ref = refs
        c = pl.program_id(1)
        base = pl.multiple_of(base_ref[c], 16)
        x = jnp.pad(_to_f32(x_ref[0]), ((0, RH2 - qHp), (0, 0)))
        resid = d_ref[0] - base                      # (1, 128)
        y = _frac_roll(x, resid, f_ref[0], nb2, axis=0)
        if not band:
            out_ref[0] = jnp.zeros((H2p, 128), mid_dtype)
            out_ref[0, pl.ds(base, RH2)] = y.astype(mid_dtype)
            return
        scr_ref[:] = jnp.zeros((Hsc2, 128), jnp.float32)
        scr_ref[pl.ds(base, RH2)] = y
        for t in range(nty2):
            rb = pl.multiple_of(rb_ref[t], 8)
            seg = scr_ref[pl.ds(rb, SY2)]
            out_ref[0, t * TY2:(t + 1) * TY2] = jnp.dot(
                wy_ref[0, t], seg, precision=prec,
                preferred_element_type=jnp.float32).astype(mid_dtype)

    ncs = W1p // 128
    n_prefetch = 2 if band else 1
    in_specs = [
        pl.BlockSpec((1, 1, 128), lambda f, c, *_: (0, 0, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 128), lambda f, c, *_: (0, 0, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, qHp, 128), lambda f, c, *_: (f, 0, c),
                     memory_space=pltpu.VMEM),
    ]
    scratch = []
    if band:
        in_specs.append(
            pl.BlockSpec((1, nty2, TY2, SY2), lambda f, c, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM))
        scratch.append(pltpu.VMEM((Hsc2, 128), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(F, ncs),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H2p, 128), lambda f, c, *_: (f, 0, c),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, H2p, W1p), mid_dtype),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _build_x3(F, H2p, W1p, BLKR3, RW3, nb3, Wsc3, crop2, crop3,
              TX3, SX3, ntx3, Hd3p, Wd3p, mid_dtype_name, out_dtype_name,
              interpret):
    mid_dtype = jnp.dtype(mid_dtype_name)
    out_dtype = jnp.dtype(out_dtype_name)
    band = SX3 > 0
    roff = crop2 // BLKR3
    prec = (jax.lax.Precision.HIGHEST if mid_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def to_out(blk):
        if out_dtype == jnp.uint8:
            return jnp.clip(jnp.round(blk), 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)
        return blk.astype(out_dtype)

    def kernel(*refs):
        if band:
            (base_ref, cb_ref, d_ref, f_ref, x_ref, wx_ref, cov_ref,
             out_ref, scr_ref) = refs
        else:
            (base_ref, d_ref, f_ref, x_ref, cov_ref, out_ref,
             scr_ref) = refs
        r = pl.program_id(1)
        base = pl.multiple_of(base_ref[r], 128)
        x = jnp.pad(_to_f32(x_ref[0]), ((0, 0), (0, RW3 - W1p)))
        resid = d_ref[0] - base                      # (BLKR3, 1)
        y = _frac_roll(x, resid, f_ref[0], nb3, axis=1)
        scr_ref[:] = jnp.zeros((BLKR3, Wsc3), jnp.float32)
        scr_ref[:, pl.ds(base, RW3)] = y
        if band:
            for t in range(ntx3):
                cb = pl.multiple_of(cb_ref[t], 128)
                seg = scr_ref[:, pl.ds(cb, SX3)]
                blk = jnp.dot(seg, wx_ref[0, t], precision=prec,
                              preferred_element_type=jnp.float32)
                blk = blk * cov_ref[0, :, t * TX3:(t + 1) * TX3]
                out_ref[0, :, t * TX3:(t + 1) * TX3] = to_out(blk)
        else:
            blk = scr_ref[:, crop3: crop3 + Wd3p] * cov_ref[0]
            out_ref[0] = to_out(blk)

    nrb3 = Hd3p // BLKR3
    n_prefetch = 2 if band else 1
    in_specs = [
        pl.BlockSpec((1, BLKR3, 1), lambda f, r, *_: (0, r, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLKR3, 1), lambda f, r, *_: (0, r, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLKR3, W1p), lambda f, r, *_: (f, r + roff, 0),
                     memory_space=pltpu.VMEM),
    ]
    if band:
        in_specs.append(
            pl.BlockSpec((1, ntx3, SX3, TX3), lambda f, r, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM))
    in_specs.append(
        pl.BlockSpec((1, BLKR3, Wd3p), lambda f, r, *_: (0, r, 0),
                     memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(F, nrb3),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, BLKR3, Wd3p), lambda f, r, *_: (f, r, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BLKR3, Wsc3), jnp.float32)],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, Hd3p, Wd3p), out_dtype),
        interpret=interpret,
    )


# ----------------------------------------------------------------------
# public wrapper
# ----------------------------------------------------------------------


def apply_shear3_pallas(plan: Shear3Plan, q: jax.Array, arrs: dict = None,
                        *, mid_dtype=jnp.bfloat16, out_dtype=None,
                        interpret: bool = False,
                        kernel_plan: Shear3KernelPlan = None) -> jax.Array:
    """Pallas 3-pass apply: (..., qH, qW) -> (..., Hd, Wd).

    ``arrs`` (the XLA table dict) is accepted for signature parity with
    apply_shear3_xla but unused — the kernel tables live in the
    kernel plan (small: O(H + W) int32/f32 vectors + the coverage
    image).  bf16 intermediates by default; pass mid_dtype=jnp.float32
    for full f32 staging.
    """
    del arrs
    if q.ndim == 2:
        return apply_shear3_pallas(
            plan, q[None], mid_dtype=mid_dtype, out_dtype=out_dtype,
            interpret=interpret, kernel_plan=kernel_plan)[0]
    if q.ndim > 3:
        lead = q.shape[:-2]
        out = apply_shear3_pallas(
            plan, q.reshape((-1,) + q.shape[-2:]), mid_dtype=mid_dtype,
            out_dtype=out_dtype, interpret=interpret,
            kernel_plan=kernel_plan)
        return out.reshape(lead + out.shape[-2:])
    kp = kernel_plan if kernel_plan is not None \
        else build_shear3_kernel_plan_cached(plan)
    F, H, W = q.shape
    assert (H, W) == (kp.qH, kp.qW), (q.shape, kp.qH, kp.qW)
    in_dtype = q.dtype
    if in_dtype not in (jnp.bfloat16, jnp.float32, jnp.uint8):
        q = q.astype(jnp.float32)
        in_dtype = jnp.float32
    if out_dtype is None:
        out_dtype = in_dtype
    mid = jnp.dtype(mid_dtype)
    if in_dtype == jnp.float32 and mid == jnp.bfloat16:
        mid = jnp.float32  # don't silently degrade f32 inputs
    if (kp.qHp, kp.qWp) != (H, W):
        q = jnp.pad(q, ((0, 0), (0, kp.qHp - H), (0, kp.qWp - W)))

    with jax.ensure_compile_time_eval():
        base1 = jnp.asarray(kp.base1)
        d1 = jnp.asarray(kp.d1[None])
        f1 = jnp.asarray(kp.f1[None])
        base2 = jnp.asarray(kp.base2)
        d2 = jnp.asarray(kp.d2[None])
        f2 = jnp.asarray(kp.f2[None])
        base3 = jnp.asarray(kp.base3)
        d3 = jnp.asarray(kp.d3[None])
        f3 = jnp.asarray(kp.f3[None])
        cov = jnp.asarray(kp.inv_cov[None])

    mid_name = jnp.dtype(mid).name
    x1 = _build_x1(F, kp.qHp, kp.qWp, kp.BLKR1, kp.RW1, kp.nb1, kp.W1p,
                   jnp.dtype(in_dtype).name, mid_name, interpret)
    o1 = x1(base1, d1, f1, q)

    nty2 = 0 if kp.rb2 is None else kp.wy2.shape[0]
    y2 = _build_y2(F, kp.qHp, kp.W1p, kp.RH2, kp.nb2, kp.H2p, kp.Hsc2,
                   kp.TY2, kp.SY2, nty2, mid_name, interpret)
    if kp.rb2 is None:
        o2 = y2(base2, d2, f2, o1)
    else:
        with jax.ensure_compile_time_eval():
            rb2 = jnp.asarray(kp.rb2)
            wy2 = jnp.asarray(kp.wy2[None])
        o2 = y2(base2, rb2, d2, f2, o1, wy2)

    ntx3 = 0 if kp.cb3 is None else kp.wx3.shape[0]
    x3 = _build_x3(F, kp.H2p, kp.W1p, kp.BLKR3, kp.RW3, kp.nb3, kp.Wsc3,
                   kp.crop2, kp.crop3, kp.TX3, kp.SX3, ntx3, kp.Hd3p,
                   kp.Wd3p, mid_name, jnp.dtype(out_dtype).name, interpret)
    if kp.cb3 is None:
        out = x3(base3, d3, f3, o2, cov)
    else:
        with jax.ensure_compile_time_eval():
            cb3 = jnp.asarray(kp.cb3)
            wx3 = jnp.asarray(kp.wx3[None])
        out = x3(base3, cb3, d3, f3, o2, wx3, cov)
    return out[:, : kp.Hd, : kp.Wd]


_KP_CACHE: dict = {}


def build_shear3_kernel_plan_cached(plan: Shear3Plan) -> Shear3KernelPlan:
    key = plan.spec
    kp = _KP_CACHE.get(key)
    if kp is None:
        kp = build_shear3_kernel_plan(plan)
        if len(_KP_CACHE) > 8:
            _KP_CACHE.pop(next(iter(_KP_CACHE)))
        _KP_CACHE[key] = kp
    return kp
