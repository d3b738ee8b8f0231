"""Pallas TPU pipeline for the 3-pass sheared rotated mode (ops/shear3).

One kernel per pass, each reading its input once and writing its output
once (the passes are axis-local; fusing across passes would re-read
overlapped windows — the same accounting that killed the fused
exact-shear variants, BENCHMARKS.md).  Two parameterised builders:

  Y-kernel — grid over (frame, 128-column strips): optional PRE-band
      (densified (TY, SY) MXU matmuls straight off the raw strip at
      STATIC bases — no scratch, no zero fill), per-column fractional
      translate (residual-roll scheme: 16-aligned per-strip base as a
      dynamic aligned store offset + in-register bit rolls + one static
      roll + 2-tap blend), optional POST-band, static crop, optional
      reciprocal-coverage multiply + output cast.
  X-kernel — grid over (frame, row blocks): the lane-axis mirror
      (128-aligned bases/crops).

The pass list comes from ops/shear3.Shear3Plan — both decompositions
(x-y-x translate-first, y-x-y reduce-first) lower onto the same two
builders.  Intermediates are bf16 by default (the mode's approximation
error dominates bf16 rounding — measured in tests); f32 staging is
used automatically for f32 inputs, with HIGHEST-precision dots.
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


def _frac_roll(x, resid, frac, nb, axis):
    """Fractional roll: bit-rolls by the integer residual, then a 2-tap
    blend with the +1 static roll.  x is f32; resid/frac broadcast along
    the other axis."""
    for k in range(nb):
        x = jnp.where(((resid >> k) & 1) == 1,
                      pltpu.roll(x, 1 << k, axis=axis), x)
    x1 = pltpu.roll(x, 1, axis=axis)
    return x * (1.0 - frac) + x1 * frac


@dataclasses.dataclass
class StagePlan:
    """Kernel tables for one pass (host)."""

    axis: str
    n_in: int             # input size along the pass axis (padded)
    n_lines_p: int        # padded size of the other axis (grid blocks)
    blk: int              # BLKR (x) or 128 (y): lines per program
    # pre-band (band_first): static per-tile densified blocks
    pre_base: Optional[Tuple[int, ...]]
    pre_w: Optional[np.ndarray]    # (nt, TY, SY) f32
    pre_SY: int
    n_mid: int            # rows fed to the translate (pre out or n_in)
    # translate
    base: np.ndarray      # per-block aligned shift bases, int32
    d: np.ndarray         # (n_lines_p, 1) int32
    f: np.ndarray         # (n_lines_p, 1) float32
    R: int                # roll-array size along the pass axis
    nb: int
    # post-band (translate-then-band)
    post_base: Optional[Tuple[int, ...]]
    post_w: Optional[np.ndarray]
    post_SY: int
    n_sc: int             # translate-grid scratch size (post/crop modes)
    crop: int             # aligned crop into the translate grid
    n_out_p: int          # padded output size along the pass axis


@dataclasses.dataclass
class Shear3KernelPlan:
    qH: int
    qW: int
    qHp: int
    qWp: int
    stages: Tuple[StagePlan, ...]
    inv_cov: Optional[np.ndarray]   # (Hd_p, Wd_p) float32, or None
    Hd: int
    Wd: int


def build_shear3_kernel_plan(plan: Shear3Plan, blkr_x: int = 128,
                             ) -> Shear3KernelPlan:
    """Kernel tables from a Shear3Plan (host, exact integers).

    Works for forward AND adjoint plans (transpose_shear3_plan): shapes
    come from the plan, and a cov-less plan (inv_cov=None) skips the
    coverage multiply in the final stage."""
    qH, qW = plan.src_shape
    Hd, Wd = plan.dst_shape
    passes = plan.passes

    # padded chain shapes: rows multiple of blkr_x (x-stage blocks, and
    # sublane tiling), cols multiple of 128 (lane tiling / y strips)
    rows = _rup(qH, blkr_x)
    cols = _rup(qW, 128)
    qHp, qWp = rows, cols
    stages = []
    for idx, p in enumerate(passes):
        last = idx == len(passes) - 1
        if p.axis == "x":
            n_in, n_lines_p, blk = cols, rows, blkr_x
            s_align, c_align = 128, 128
        else:
            n_in, n_lines_p, blk = rows, cols, 128
            s_align, c_align = 16, 8
        nlines_true = p.d.shape[0]
        d = np.zeros(n_lines_p, np.int64)
        f = np.zeros(n_lines_p, np.float32)
        nl = min(nlines_true, n_lines_p)
        d[:nl] = p.d[:nl]
        d[nl:] = p.d[nl - 1] if nl else 0
        f[:nl] = p.f[:nl]

        pre_base = pre_w = None
        pre_SY = 0
        if p.band is not None and p.band_first:
            b = p.band
            assert b.n_src <= n_in
            TY = 128 if p.axis == "y" else blkr_x
            # densify against the PADDED input (pad region: zero pixels
            # meet zero weights)
            db, dw, dSY = _densify_row_band(
                b.start, b.weights.astype(np.float32), n_in, TY,
                align=8 if p.axis == "y" else 128)
            if p.axis == "x":
                # the x dot is (blk, SY) @ (SY, TX): transpose the
                # densified (nt, TX, SY) blocks
                dw = np.ascontiguousarray(np.swapaxes(dw, 1, 2))
            pre_base, pre_w, pre_SY = tuple(int(v) for v in db), dw, dSY
            n_mid = dw.shape[0] * TY           # tiles cover all mid rows
        else:
            n_mid = n_in

        crop = p.crop
        if p.band is None or p.band_first:
            # stage ends in translate(+crop): align the crop by lifting
            # the whole translate grid (pure relabel)
            if crop % c_align:
                lift = c_align - crop % c_align
                d += lift
                crop += lift
        nblk = n_lines_p // blk
        base = np.array([_rdn(int(d[i * blk:(i + 1) * blk].min()), s_align)
                         for i in range(nblk)], np.int64)
        resid = d - np.repeat(base, blk)
        assert (resid >= 0).all()
        nb = max(1, int(resid.max() + 1).bit_length())
        pitch = _rup(n_mid, s_align)
        R = _rup(max(pitch, n_mid + int(resid.max()) + 2), s_align)
        full = int(base.max()) + R

        post_base = post_w = None
        post_SY = 0
        n_sc = 0
        if p.band is not None and not p.band_first:
            b = p.band
            TY = 128 if p.axis == "y" else blkr_x
            n_sc = _rup(full, s_align)
            db, dw, dSY = _densify_row_band(
                b.start, b.weights.astype(np.float32), n_sc, TY,
                align=8 if p.axis == "y" else 128)
            if p.axis == "x":
                dw = np.ascontiguousarray(np.swapaxes(dw, 1, 2))
            post_base, post_w, post_SY = tuple(int(v) for v in db), dw, dSY
            n_out_p = dw.shape[0] * TY
        else:
            n_out_p = _rup(p.n_out, blkr_x if p.axis == "y" else 128)
            # the translate scratch must cover both the stored roll and
            # the cropped output window
            n_sc = _rup(max(full, crop + n_out_p), s_align)

        stages.append(StagePlan(
            axis=p.axis, n_in=n_in, n_lines_p=n_lines_p, blk=blk,
            pre_base=pre_base, pre_w=pre_w, pre_SY=pre_SY, n_mid=n_mid,
            base=base.astype(np.int32),
            d=d.astype(np.int32)[:, None], f=f[:, None],
            R=R, nb=nb,
            post_base=post_base, post_w=post_w, post_SY=post_SY,
            n_sc=n_sc, crop=crop, n_out_p=n_out_p))
        # chain: this stage's output size becomes the next stage's input
        if p.axis == "x":
            cols = n_out_p
        else:
            rows = n_out_p
        del last

    Hd_p, Wd_p = rows, cols
    assert Hd_p >= Hd and Wd_p >= Wd, (Hd_p, Wd_p, Hd, Wd)
    if plan.inv_cov is None:
        inv_cov = None
    else:
        inv_cov = np.zeros((Hd_p, Wd_p), np.float32)
        inv_cov[:Hd, :Wd] = plan.inv_cov
    return Shear3KernelPlan(qH=qH, qW=qW, qHp=qHp, qWp=qWp,
                            stages=tuple(stages), inv_cov=inv_cov,
                            Hd=Hd, Wd=Wd)


# ----------------------------------------------------------------------
# the two stage builders
# ----------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _build_y_stage(F, n_in, ncs, pre_base, pre_SY, n_mid, R, nb,
                   post_base, post_SY, n_sc, crop, n_out_p,
                   in_dtype_name, out_dtype_name, has_cov, interpret):
    """Column-strip kernel: [pre-band] -> translate -> [post-band |
    crop] -> [cov] -> cast.  Tables: scalar-prefetch base (ncs,),
    BlockSpec d/f (1,1,strip) and weight stacks; cov as (1, n_out_p,
    128) strip blocks."""
    in_dtype = jnp.dtype(in_dtype_name)
    out_dtype = jnp.dtype(out_dtype_name)
    prec = (jax.lax.Precision.HIGHEST if in_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    TY = 128
    npre = 0 if pre_base is None else len(pre_base)
    npost = 0 if post_base is None else len(post_base)

    def to_out(blk):
        if out_dtype == jnp.uint8:
            return jnp.clip(jnp.round(blk), 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)
        return blk.astype(out_dtype)

    def kernel(*refs):
        it = list(refs)
        base_ref = it.pop(0)
        d_ref = it.pop(0)
        f_ref = it.pop(0)
        x_ref = it.pop(0)
        wpre_ref = it.pop(0) if npre else None
        wpost_ref = it.pop(0) if npost else None
        cov_ref = it.pop(0) if has_cov else None
        out_ref = it.pop(0)
        scr_ref = it.pop(0) if it else None

        c = pl.program_id(1)
        if npre:
            parts = []
            for t in range(npre):
                seg = _to_f32(x_ref[0, pre_base[t]: pre_base[t] + pre_SY])
                parts.append(jnp.dot(
                    wpre_ref[0, t], seg, precision=prec,
                    preferred_element_type=jnp.float32))
            x = jnp.concatenate(parts, axis=0)       # (n_mid, 128)
        else:
            x = _to_f32(x_ref[0])
        base = pl.multiple_of(base_ref[c], 16)
        x = jnp.pad(x, ((0, R - n_mid), (0, 0)))
        resid = d_ref[0] - base                      # (1, 128)
        y = _frac_roll(x, resid, f_ref[0], nb, axis=0)

        if npost:
            scr_ref[:] = jnp.zeros((n_sc, 128), jnp.float32)
            scr_ref[pl.ds(base, R)] = y
            for t in range(npost):
                seg = scr_ref[post_base[t]: post_base[t] + post_SY]
                blk = jnp.dot(wpost_ref[0, t], seg, precision=prec,
                              preferred_element_type=jnp.float32)
                if has_cov:
                    blk = blk * cov_ref[0, t * TY:(t + 1) * TY]
                out_ref[0, t * TY:(t + 1) * TY] = to_out(blk)
            return
        if crop or n_sc != n_out_p or has_cov:
            scr_ref[:] = jnp.zeros((n_sc, 128), jnp.float32)
            scr_ref[pl.ds(base, R)] = y
            blk = scr_ref[crop: crop + n_out_p]
            if has_cov:
                blk = blk * cov_ref[0]
            out_ref[0] = to_out(blk)
            return
        out_ref[0] = jnp.zeros((n_out_p, 128), out_dtype)
        out_ref[0, pl.ds(base, R)] = to_out(y)

    in_specs = [
        pl.BlockSpec((1, 1, 128), lambda f, c, *_: (0, 0, c),
                     memory_space=pltpu.VMEM),       # d
        pl.BlockSpec((1, 1, 128), lambda f, c, *_: (0, 0, c),
                     memory_space=pltpu.VMEM),       # f
        pl.BlockSpec((1, n_in, 128), lambda f, c, *_: (f, 0, c),
                     memory_space=pltpu.VMEM),       # x strip
    ]
    if npre:
        in_specs.append(pl.BlockSpec(
            (1, npre, TY, pre_SY), lambda f, c, *_: (0, 0, 0, 0),
            memory_space=pltpu.VMEM))
    if npost:
        in_specs.append(pl.BlockSpec(
            (1, npost, TY, post_SY), lambda f, c, *_: (0, 0, 0, 0),
            memory_space=pltpu.VMEM))
    if has_cov:
        in_specs.append(pl.BlockSpec(
            (1, n_out_p, 128), lambda f, c, *_: (0, 0, c),
            memory_space=pltpu.VMEM))
    scratch = []
    need_scratch = npost or crop or n_sc != n_out_p or has_cov
    if need_scratch:
        scratch.append(pltpu.VMEM((n_sc, 128), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(F, ncs),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_out_p, 128),
                               lambda f, c, *_: (f, 0, c),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, n_out_p, ncs * 128), out_dtype),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=64)
def _build_x_stage(F, n_in, nrb, blk, pre_base, pre_SY, n_mid, R, nb,
                   post_base, post_SY, n_sc, crop, n_out_p,
                   in_dtype_name, out_dtype_name, has_cov, interpret):
    """Row-block kernel: lane-axis mirror of _build_y_stage."""
    in_dtype = jnp.dtype(in_dtype_name)
    out_dtype = jnp.dtype(out_dtype_name)
    prec = (jax.lax.Precision.HIGHEST if in_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    TX = 128
    npre = 0 if pre_base is None else len(pre_base)
    npost = 0 if post_base is None else len(post_base)

    def to_out(b):
        if out_dtype == jnp.uint8:
            return jnp.clip(jnp.round(b), 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)
        return b.astype(out_dtype)

    def kernel(*refs):
        it = list(refs)
        base_ref = it.pop(0)
        d_ref = it.pop(0)
        f_ref = it.pop(0)
        x_ref = it.pop(0)
        wpre_ref = it.pop(0) if npre else None
        wpost_ref = it.pop(0) if npost else None
        cov_ref = it.pop(0) if has_cov else None
        out_ref = it.pop(0)
        scr_ref = it.pop(0) if it else None

        r = pl.program_id(1)
        if npre:
            parts = []
            for t in range(npre):
                seg = _to_f32(
                    x_ref[0][:, pre_base[t]: pre_base[t] + pre_SY])
                parts.append(jnp.dot(
                    seg, wpre_ref[0, t], precision=prec,
                    preferred_element_type=jnp.float32))
            x = jnp.concatenate(parts, axis=1)       # (blk, n_mid)
        else:
            x = _to_f32(x_ref[0])
        base = pl.multiple_of(base_ref[r], 128)
        x = jnp.pad(x, ((0, 0), (0, R - n_mid)))
        resid = d_ref[0] - base                      # (blk, 1)
        y = _frac_roll(x, resid, f_ref[0], nb, axis=1)

        if npost:
            scr_ref[:] = jnp.zeros((blk, n_sc), jnp.float32)
            scr_ref[:, pl.ds(base, R)] = y
            for t in range(npost):
                seg = scr_ref[:, post_base[t]: post_base[t] + post_SY]
                b = jnp.dot(seg, wpost_ref[0, t], precision=prec,
                            preferred_element_type=jnp.float32)
                if has_cov:
                    b = b * cov_ref[0][:, t * TX:(t + 1) * TX]
                out_ref[0, :, t * TX:(t + 1) * TX] = to_out(b)
            return
        if crop or n_sc != n_out_p or has_cov:
            scr_ref[:] = jnp.zeros((blk, n_sc), jnp.float32)
            scr_ref[:, pl.ds(base, R)] = y
            b = scr_ref[:, crop: crop + n_out_p]
            if has_cov:
                b = b * cov_ref[0]
            out_ref[0] = to_out(b)
            return
        out_ref[0] = jnp.zeros((blk, n_out_p), out_dtype)
        out_ref[0, :, pl.ds(base, R)] = to_out(y)

    in_specs = [
        pl.BlockSpec((1, blk, 1), lambda f, r, *_: (0, r, 0),
                     memory_space=pltpu.VMEM),       # d
        pl.BlockSpec((1, blk, 1), lambda f, r, *_: (0, r, 0),
                     memory_space=pltpu.VMEM),       # f
        pl.BlockSpec((1, blk, n_in), lambda f, r, *_: (f, r, 0),
                     memory_space=pltpu.VMEM),       # x rows
    ]
    if npre:
        in_specs.append(pl.BlockSpec(
            (1, npre, pre_SY, TX), lambda f, r, *_: (0, 0, 0, 0),
            memory_space=pltpu.VMEM))
    if npost:
        in_specs.append(pl.BlockSpec(
            (1, npost, post_SY, TX), lambda f, r, *_: (0, 0, 0, 0),
            memory_space=pltpu.VMEM))
    if has_cov:
        in_specs.append(pl.BlockSpec(
            (1, blk, n_out_p), lambda f, r, *_: (0, r, 0),
            memory_space=pltpu.VMEM))
    scratch = []
    if npost or crop or n_sc != n_out_p or has_cov:
        scratch.append(pltpu.VMEM((blk, n_sc), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(F, nrb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk, n_out_p),
                               lambda f, r, *_: (f, r, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, nrb * blk, n_out_p), out_dtype),
        interpret=interpret,
    )


# ----------------------------------------------------------------------
# public wrapper
# ----------------------------------------------------------------------


def apply_shear3_pallas(plan: Shear3Plan, q: jax.Array, arrs: dict = None,
                        *, mid_dtype=jnp.bfloat16, out_dtype=None,
                        interpret: bool = False,
                        kernel_plan: Shear3KernelPlan = None) -> jax.Array:
    """Pallas pass-pipeline apply: (..., qH, qW) -> (..., Hd, Wd).

    ``arrs`` (the XLA table dict) is accepted for signature parity with
    apply_shear3_xla but unused — the kernel tables live in the kernel
    plan (small: O(H + W) vectors, densified band blocks, and the
    coverage image).  bf16 intermediates by default; f32 inputs stage
    in f32 with HIGHEST-precision dots (no silent degrade).
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
    mid_name = jnp.dtype(mid).name

    x = q
    n_st = len(kp.stages)
    for i, st in enumerate(kp.stages):
        last = i == n_st - 1
        has_cov = last and kp.inv_cov is not None
        stage_in = jnp.dtype(x.dtype).name
        stage_out = jnp.dtype(out_dtype).name if last else mid_name
        with jax.ensure_compile_time_eval():
            base = jnp.asarray(st.base)
            d = jnp.asarray(st.d[None])
            f = jnp.asarray(st.f[None])
            extra = []
            if st.pre_base is not None:
                extra.append(jnp.asarray(st.pre_w[None]))
            if st.post_base is not None:
                extra.append(jnp.asarray(st.post_w[None]))
            if has_cov:
                extra.append(jnp.asarray(kp.inv_cov[None]))
        if st.axis == "y":
            d_blk = jnp.swapaxes(d, -1, -2)
            f_blk = jnp.swapaxes(f, -1, -2)
            call = _build_y_stage(
                F, st.n_in, st.n_lines_p // 128, st.pre_base, st.pre_SY,
                st.n_mid, st.R, st.nb, st.post_base, st.post_SY, st.n_sc,
                st.crop, st.n_out_p, stage_in, stage_out, has_cov,
                interpret)
            x = call(base, d_blk, f_blk, x, *extra)
        else:
            call = _build_x_stage(
                F, st.n_in, st.n_lines_p // st.blk, st.blk, st.pre_base,
                st.pre_SY, st.n_mid, st.R, st.nb, st.post_base,
                st.post_SY, st.n_sc, st.crop, st.n_out_p, stage_in,
                stage_out, has_cov, interpret)
            x = call(base, d, f, x, *extra)
    return x[:, : kp.Hd, : kp.Wd]


from ..utils.lru import LruDict  # noqa: E402

# kernel plans hold densified band blocks + the padded coverage image
# (~10-20 MB each at 2048^2): byte-bounded like the other table caches
_KP_CACHE = LruDict(8, max_bytes=1 << 30)


def build_shear3_kernel_plan_cached(plan: Shear3Plan) -> Shear3KernelPlan:
    key = (plan.spec, plan.in_shape, plan.out_shape,
           plan.inv_cov is None,
           tuple((p.axis, p.band_first, p.band is not None, p.n_t, p.crop)
                 for p in plan.passes))
    kp = _KP_CACHE.get(key)
    if kp is None:
        kp = build_shear3_kernel_plan(plan)
        _KP_CACHE.put(key, kp)
    return kp


# ----------------------------------------------------------------------
# custom VJP: backward = the transposed pass pipeline on the same kernels
# ----------------------------------------------------------------------


def make_shear3_linear(plan: Shear3Plan, *, interpret: bool = False):
    """Differentiable Pallas shear apply: fn(q) -> dst with a custom VJP
    whose backward runs the EXACT adjoint pipeline
    (shear3.transpose_shear3_plan) through the same two kernel builders
    — q_bar = P^T(inv_cov * cot), the same transposed-operator pattern
    every other apply family uses (aainterp.autodiff).

    Float paths only (u8 quantisation is not differentiable); the
    backward stages in f32.
    """
    from .shear3 import transpose_shear3_plan

    kp = build_shear3_kernel_plan_cached(plan)
    plan_T = transpose_shear3_plan(plan)
    kp_T = build_shear3_kernel_plan_cached(plan_T)
    with jax.ensure_compile_time_eval():
        inv_cov_dev = (None if plan.inv_cov is None
                       else jnp.asarray(plan.inv_cov))

    @jax.custom_vjp
    def fn(q):
        if q.dtype == jnp.uint8:
            raise TypeError(
                "make_shear3_linear is float-only (u8 round/saturate "
                "is not differentiable); cast to bfloat16/float32")
        return apply_shear3_pallas(plan, q, kernel_plan=kp,
                                   interpret=interpret)

    def fwd(q):
        # a zero-size residual carries the primal dtype (dtypes
        # themselves are not JAX types)
        return fn(q), jnp.zeros((), q.dtype)

    def bwd(res, cot):
        in_dtype = res.dtype
        g = cot.astype(jnp.float32)
        if inv_cov_dev is not None:
            g = g * inv_cov_dev
        qbar = apply_shear3_pallas(plan_T, g, kernel_plan=kp_T,
                                   mid_dtype=jnp.float32,
                                   out_dtype=jnp.float32,
                                   interpret=interpret)
        return (qbar.astype(in_dtype),)

    fn.defvjp(fwd, bwd)
    return fn
