"""Pallas rotated apply: global shear kernels + a tiled one-hot contraction.

Replaces the XLA shear-aligned apply (ops/shear_apply.py) for large rotated
operators.  That path is exact but HBM-bound (~2 GB of roll + gather
traffic per 2048x2048 frame -> 1.6 Gpixel/s, the round-1 verdict's top
perf item).  Three kernels, same exact weights:

  A. vshear — build S[y, x] = q[y - gy[x], x]: one program per (frame,
     128-column strip); the per-column roll runs as log2 bit passes of
     static sublane rolls + selects in VMEM.  HBM cost: read q, write S.
  B. hshear — build T[y, x] = S[y, x - hx[y]]: one program per (frame,
     row block); per-row roll along lanes, same bit-pass trick.  HBM
     cost: read S, write T.
  C. contract — out[dy, dx] = sum_ab w2[dy,dx,a,b] * T[ry0[dy]+a,
     cx0[dx]+b]: one program per (dst tile, frame), frames innermost so
     the per-tile weight/selector blocks stay VMEM-resident.  The two
     monotone gathers (slope ~L/cos, non-integer) become ONE-HOT MATMULS
     on the MXU — Vb = Tblk @ Csel[b], A = Rsel[a] @ Vb — exact selection
     (0/1 weights, fp32 accumulation), then VPU-weighted accumulation
     with the exact fp32 ELL weights.

Correctness is delegated: gy/hx/ry0/cx0/w2 come unchanged from
shear_apply.build_shear_plan over the polygon-clip ELL operator
(Source.cpp:411-579 semantics); these kernels only re-route the same
multiply-adds.  Zero-weight taps may read shear-wrapped zeros/garbage,
which is finite by construction and multiplied by zero.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .shear_apply import build_shear_plan
from .weights import EllOperator


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _rdn(x: int, m: int) -> int:
    return (x // m) * m


# ----------------------------------------------------------------------
# Kernel A: vertical shear (per-column roll down by gy[x])
# ----------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _build_vshear(F, qH, qWp, THp, RH, nbv, dtype_name, interpret):
    """Vertical shear with host-static per-strip bases.

    Within a 128-column strip the roll amount gy varies by only
    ~128*slope (<< gy.max), so the strip's 16-aligned minimum is hoisted
    to the host (``base_v``, scalar-prefetched) and implemented as the
    STORE OFFSET of one dynamic sublane slice; the in-register bit rolls
    cover only the residual — nbv drops ~11 -> 7 passes at 2048^2/30 deg
    and they run on an RH-row array instead of THp (RH ~= qH + 90 vs
    THp ~= qH + gy.max).  The two-level DYNAMIC roll was measured slower
    (BENCHMARKS.md: Mosaic dynamic rotate > 4 saved static passes); the
    store-offset form keeps every roll static.
    """
    dtype = jnp.dtype(dtype_name)

    def kernel(base_ref, gy_ref, q_ref, out_ref):
        c = pl.program_id(1)
        base = pl.multiple_of(base_ref[c], 16)
        # Mosaic rotates are 32-bit only on this backend ("Rotate with
        # non-32-bit data"): roll in f32 in-register, keep HBM I/O bf16
        x = jnp.pad(q_ref[0], ((0, RH - qH), (0, 0))).astype(jnp.float32)
        dg = gy_ref[0] - base  # (1, 128) int32 residual in [0, 2^nbv)
        for k in range(nbv):
            x = jnp.where(((dg >> k) & 1) == 1,
                          pltpu.roll(x, 1 << k, axis=0), x)
        out_ref[0] = jnp.zeros((THp, 128), dtype)
        out_ref[0, pl.ds(base, RH)] = x.astype(dtype)

    nc = qWp // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(F, nc),
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda f, c, *_: (0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qH, 128), lambda f, c, *_: (f, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, THp, 128), lambda f, c, *_: (f, 0, c),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, THp, qWp), dtype),
        interpret=interpret,
    )


# ----------------------------------------------------------------------
# Kernel B: horizontal shear (per-row roll right by hx[y])
# ----------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _build_hshear(F, THp, qWp, TWp, BLKR, RW, nbh, dtype_name, interpret):
    """Horizontal shear with host-static per-row-block bases.

    Mirror of _build_vshear's residual-roll scheme along lanes: the
    128-aligned per-block minimum of hx becomes the lane offset of one
    dynamic store (128 = the lane tile, so the slice stays aligned), and
    the bit rolls cover only the residual on an RW-column array
    (RW ~= qWp + BLKR*slope + 128 vs TWp ~= qWp + hx.max).
    """
    dtype = jnp.dtype(dtype_name)

    def kernel(base_ref, hx_ref, s_ref, out_ref):
        r = pl.program_id(1)
        base = pl.multiple_of(base_ref[r], 128)
        # f32 rolls for the same Mosaic 32-bit-rotate restriction
        x = jnp.pad(s_ref[0], ((0, 0), (0, RW - qWp))).astype(jnp.float32)
        dh = hx_ref[0] - base  # (BLKR, 1) int32 residual in [0, 2^nbh)
        for k in range(nbh):
            x = jnp.where(((dh >> k) & 1) == 1,
                          pltpu.roll(x, 1 << k, axis=1), x)
        out_ref[0] = jnp.zeros((BLKR, TWp), dtype)
        out_ref[0, :, pl.ds(base, RW)] = x.astype(dtype)

    nr = THp // BLKR
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(F, nr),
        in_specs=[
            pl.BlockSpec((1, BLKR, 1), lambda f, r, *_: (0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLKR, qWp), lambda f, r, *_: (f, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLKR, TWp), lambda f, r, *_: (f, r, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, THp, TWp), dtype),
        interpret=interpret,
    )


# ----------------------------------------------------------------------
# Kernel C: tiled contraction with one-hot MXU gathers
# ----------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _build_contract(F, THp, TWp, nty, ntx, TYd, TXd, Ka, Kb, SRF, SCF,
                    dtype_name, out_dtype_name, interpret,
                    masked=False):
    """Tiled one-hot contraction.

    With ``masked``, a scalar-prefetched per-tile liveness flag gates the
    ENTIRE contraction behind one ``pl.when`` — tiles whose weight block
    is identically zero (host-detected: outside the rotated source
    footprint, 30% of tiles at 2048^2/30 deg) write zeros and skip all
    MXU passes and FMAs.  Tap-granular masking was measured SLOWER
    (6.19 vs 7.44 Gpixel/s, 2026-08-17): 25 pl.when branches force the
    accumulator through VMEM scratch (a load+store round trip per tap)
    instead of registers, costing more than the skipped taps save.  The
    tile-level branch keeps the inner loop register-pure.
    """
    dtype = jnp.dtype(dtype_name)
    out_dtype = jnp.dtype(out_dtype_name)
    # TPU f32 matmuls at DEFAULT precision silently truncate operands to
    # bf16 (~1e-3 error); HIGHEST (bf16x3 passes) restores f32 accuracy.
    # bf16 operands are exact either way — keep the cheap single pass.
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def kernel(*refs):
        if masked:
            (r0_ref, c0_ref, m_ref, t_ref, rsel_ref, csel_ref, w2_ref,
             out_ref, tblk, sem) = refs
        else:
            (r0_ref, c0_ref, t_ref, rsel_ref, csel_ref, w2_ref,
             out_ref, tblk, sem) = refs
        t = pl.program_id(0)
        f = pl.program_id(1)

        # cross-grid-step double buffering: frames iterate innermost, so
        # step (t, f) prefetches step (t, f+1)'s (or (t+1, 0)'s) T block
        # while the one-hot contraction of the current block runs
        def tblk_dma(tt, ff, slot_i):
            r0 = pl.multiple_of(r0_ref[jax.lax.div(tt, ntx)], 8)
            c0 = pl.multiple_of(c0_ref[jax.lax.rem(tt, ntx)], 128)
            return pltpu.make_async_copy(
                t_ref.at[ff, pl.ds(r0, SRF), pl.ds(c0, SCF)],
                tblk.at[slot_i], sem.at[slot_i])

        s = t * F + f
        slot = jax.lax.rem(s, 2)
        # dead tiles (masked) skip their T-block DMA entirely, not just
        # the compute: starts and waits are both gated on the SAME
        # liveness flag, so semaphores stay matched 1:1 and the two
        # slots still alternate by step parity (a dead step simply never
        # touches its slot).  36/121 dead tiles at 2048^2/30 deg
        # otherwise cost ~8.6 MB of HBM reads per frame.
        live = m_ref[t] != 0 if masked else True

        @pl.when(jnp.logical_and(s == 0, live) if masked else s == 0)
        def _():
            tblk_dma(t, f, slot).start()

        nxt = s + 1
        nxt_in = nxt < nty * ntx * F
        if masked:
            nxt_live = jnp.logical_and(
                nxt_in, m_ref[jax.lax.div(jnp.minimum(
                    nxt, nty * ntx * F - 1), F)] != 0)
        else:
            nxt_live = nxt_in

        @pl.when(nxt_live)
        def _():
            tblk_dma(jax.lax.div(nxt, F), jax.lax.rem(nxt, F),
                     jax.lax.rem(nxt, 2)).start()

        def contract_body():
            tblk_dma(t, f, slot).wait()
            blk = tblk[slot]
            acc = jnp.zeros((TYd, TXd), jnp.float32)
            for b in range(Kb):
                vb = jnp.dot(blk, csel_ref[0, b], precision=prec,
                             preferred_element_type=jnp.float32
                             ).astype(dtype)
                for a in range(Ka):
                    sel = jnp.dot(rsel_ref[0, a], vb, precision=prec,
                                  preferred_element_type=jnp.float32)
                    acc = acc + w2_ref[0, a * Kb + b] * sel
            out_ref[0] = acc.astype(out_dtype)

        if not masked:
            contract_body()
            return

        pl.when(live)(contract_body)

        @pl.when(jnp.logical_not(live))
        def _():
            out_ref[0] = jnp.zeros((TYd, TXd), out_dtype)

    n_prefetch = 3 if masked else 2
    scratch = [
        pltpu.VMEM((2, SRF, SCF), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(nty * ntx, F),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # T (HBM)
            pl.BlockSpec((1, Ka, TYd, SRF),
                         lambda t, f, *_: (jax.lax.div(t, ntx), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kb, SCF, TXd),
                         lambda t, f, *_: (jax.lax.rem(t, ntx), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ka * Kb, TYd, TXd),
                         lambda t, f, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TYd, TXd),
            lambda t, f, *_: (f, jax.lax.div(t, ntx), jax.lax.rem(t, ntx)),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch,
    )
    flops = 2 * F * nty * ntx * (Kb * SRF * SCF * TXd
                                 + Ka * Kb * TYd * SRF * TXd)

    def call(r0, c0, *args):
        # args: [masks,] t_arr, rsel, csel, w2t
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (F, nty * TYd, ntx * TXd), out_dtype),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=F * (THp * TWp + nty * TYd * ntx * TXd) * 2,
                transcendentals=0,
            ),
            interpret=interpret,
        )(r0, c0, *args)

    return call


def tile_masks(w2t: np.ndarray) -> np.ndarray:
    """(nt,) int32 per-tile liveness (any weight nonzero), host-derived
    from the weight blocks so the kernel's dead-tile skip is exact.  At
    2048^2/30 deg, 36 of 121 dst tiles lie fully outside the rotated
    source footprint (the dst grid covers the rotation's bounding box,
    Source.cpp:175-183) and contribute only zeros."""
    return (np.abs(w2t).max(axis=(1, 2, 3)) != 0).astype(np.int32)


# ----------------------------------------------------------------------
# Host planner
# ----------------------------------------------------------------------


@dataclasses.dataclass
class ShearKernelPlan:
    Hd: int
    Wd: int
    qH: int
    qW: int
    qWp: int
    THp: int
    TWp: int
    BLKR: int
    RH: int              # vshear rolled-array height (qH + max residual)
    RW: int              # hshear rolled-array width (qWp + max residual)
    TYd: int
    TXd: int
    nty: int
    ntx: int
    Ka: int
    Kb: int
    SRF: int
    SCF: int
    nbv: int             # residual roll bits (per-strip base hoisted)
    nbh: int
    gy_col: np.ndarray   # (1, 1, qWp) int32
    hx_row: np.ndarray   # (1, THp, 1) int32
    base_v: np.ndarray   # (qWp/128,) int32 16-aligned per-strip gy bases
    base_h: np.ndarray   # (THp/BLKR,) int32 128-aligned per-block hx bases
    r0: np.ndarray       # (nty,) int32, 8-aligned T row bases
    c0: np.ndarray       # (ntx,) int32, 128-aligned T col bases
    rsel: np.ndarray     # (nty, Ka, TYd, SRF) f32 one-hots
    csel: np.ndarray     # (ntx, Kb, SCF, TXd) f32 one-hots
    w2t: np.ndarray      # (nty*ntx, Ka*Kb, TYd, TXd) f32


def build_kernel_plan(op: EllOperator, tile_y: int = 128,
                      tile_x: int = 128, blk_r: int = 256) -> ShearKernelPlan:
    """Static geometry + tables for the three kernels (host, exact ints).

    Raises ValueError when the geometry doesn't fit (tiny images) —
    callers fall back to the XLA shear apply.
    """
    spec = op.spec
    qH, qW = spec.qrot_shape
    Hd, Wd = spec.dst_shape
    plan = build_shear_plan(op)
    gy = plan.gy.astype(np.int64)
    hx = plan.hx.astype(np.int64)
    ry0 = plan.ry0.astype(np.int64)
    cx0 = plan.cx0.astype(np.int64)
    w2 = plan.weights
    Ka, Kb = w2.shape[2], w2.shape[3]
    live = w2 != 0.0
    lv_row = live.any(axis=(1, 2, 3))   # (Hd,)
    lv_col = live.any(axis=(0, 2, 3))   # (Wd,)
    if not lv_row.any():
        raise ValueError("empty operator")

    TYd, TXd = tile_y, tile_x
    nty, ntx = _rup(Hd, TYd) // TYd, _rup(Wd, TXd) // TXd

    # per-row-tile / per-col-tile T bases and spans
    r0 = np.zeros(nty, np.int64)
    c0 = np.zeros(ntx, np.int64)
    SRF = SCF = 8
    for ty in range(nty):
        sl = slice(ty * TYd, min(ty * TYd + TYd, Hd))
        m = lv_row[sl]
        if not m.any():
            continue
        rr = ry0[sl][m]
        r0[ty] = _rdn(int(rr.min()), 8)
        SRF = max(SRF, int(rr.max()) + Ka - int(r0[ty]))
    for tx in range(ntx):
        sl = slice(tx * TXd, min(tx * TXd + TXd, Wd))
        m = lv_col[sl]
        if not m.any():
            continue
        cc = cx0[sl][m]
        c0[tx] = _rdn(int(cc.min()), 128)
        SCF = max(SCF, int(cc.max()) + Kb - int(c0[tx]))
    SRF = _rup(SRF, 8)
    # the contraction DMA slices T columns at c0: base AND width must be
    # 128-aligned (Mosaic DMA restriction on this backend)
    SCF = _rup(SCF, 128)

    qWp = _rup(qW, 128)

    # residual-roll bases: hoist the per-strip / per-row-block aligned
    # minimum of the shift tables to the host (the kernels place the
    # rolled block with ONE dynamic aligned store), leaving only the
    # intra-strip residual (~strip_extent * slope) for the bit rolls
    gy_pad = np.zeros(qWp, np.int64)
    gy_pad[:qW] = gy
    nc = qWp // 128
    base_v = np.array([_rdn(int(gy_pad[c * 128:(c + 1) * 128].min()), 16)
                       for c in range(nc)], np.int64)
    residv = gy_pad - np.repeat(base_v, 128)
    RH = _rup(qH + int(residv.max()), 16)
    nbv = max(1, int(residv.max()).bit_length())

    THp = _rup(max(int(r0.max()) + SRF, qH + int(gy.max()) + 1,
                   int(base_v.max()) + RH, blk_r), blk_r)
    if THp > len(hx):
        hx = np.concatenate([hx, np.full(THp - len(hx), hx[-1])])

    nrh = THp // blk_r
    base_h = np.array([_rdn(int(hx[r * blk_r:(r + 1) * blk_r].min()), 128)
                       for r in range(nrh)], np.int64)
    residh = hx[:THp] - np.repeat(base_h, blk_r)
    RW = _rup(qWp + int(residh.max()), 128)
    nbh = max(1, int(residh.max()).bit_length())

    TWp = _rup(max(int(c0.max()) + SCF, qW + int(hx.max()) + 1,
                   int(base_h.max()) + RW), 128)

    gy_col = np.zeros((1, 1, qWp), np.int32)
    gy_col[0, 0, :qW] = gy
    hx_row = np.zeros((1, THp, 1), np.int32)
    hx_row[0, :, 0] = hx[:THp]

    # selectors + tiled weights
    rsel = np.zeros((nty, Ka, TYd, SRF), np.float32)
    csel = np.zeros((ntx, Kb, SCF, TXd), np.float32)
    for ty in range(nty):
        dy0, dy1 = ty * TYd, min(ty * TYd + TYd, Hd)
        m = lv_row[dy0:dy1]
        ryl = ry0[dy0:dy1] - r0[ty]
        for a in range(Ka):
            ok = m & (ryl + a >= 0) & (ryl + a < SRF)
            assert (ok | ~(live[dy0:dy1, :, a, :].any(axis=(1, 2)))).all()
            rsel[ty, a, np.arange(dy1 - dy0)[ok], (ryl + a)[ok]] = 1.0
    for tx in range(ntx):
        dx0, dx1 = tx * TXd, min(tx * TXd + TXd, Wd)
        m = lv_col[dx0:dx1]
        cxl = cx0[dx0:dx1] - c0[tx]
        for b in range(Kb):
            ok = m & (cxl + b >= 0) & (cxl + b < SCF)
            assert (ok | ~(live[:, dx0:dx1, :, b].any(axis=(0, 2)))).all()
            csel[tx, b, (cxl + b)[ok], np.arange(dx1 - dx0)[ok]] = 1.0

    w2t = np.zeros((nty * ntx, Ka * Kb, TYd, TXd), np.float32)
    for ty in range(nty):
        for tx in range(ntx):
            dy0, dy1 = ty * TYd, min(ty * TYd + TYd, Hd)
            dx0, dx1 = tx * TXd, min(tx * TXd + TXd, Wd)
            nY, nX = dy1 - dy0, dx1 - dx0
            w2t[ty * ntx + tx, :, :nY, :nX] = np.moveaxis(
                w2[dy0:dy1, dx0:dx1].reshape(nY, nX, Ka * Kb), -1, 0
            ).astype(np.float32)

    return ShearKernelPlan(
        Hd=Hd, Wd=Wd, qH=qH, qW=qW, qWp=qWp, THp=THp, TWp=TWp, BLKR=blk_r,
        RH=RH, RW=RW,
        TYd=TYd, TXd=TXd, nty=nty, ntx=ntx, Ka=Ka, Kb=Kb, SRF=SRF, SCF=SCF,
        nbv=nbv, nbh=nbh, gy_col=gy_col, hx_row=hx_row,
        base_v=base_v.astype(np.int32), base_h=base_h.astype(np.int32),
        r0=r0.astype(np.int32), c0=c0.astype(np.int32),
        rsel=rsel, csel=csel, w2t=w2t,
    )


# ----------------------------------------------------------------------
# Row-sharded plan: per-chip tables for the shard_map local contraction
# ----------------------------------------------------------------------


@dataclasses.dataclass
class ShardedShearPlan:
    """Per-chip kernel tables for the row-sharded rotated apply.

    The vertical shear commutes with row sharding: with chip offset
    ``off_i = i*sb - halo`` (halo-extended local block), every local
    sheared row is the global sheared row shifted by ``off_i``
    (``Ty_local = jy_local + gy[jx] = Ty_global - off_i``), so ONE global
    shear plan serves all chips — the per-chip tables are row shifts
    (``hx`` slice, ``r0 - off_i``) while the column-side tables
    (``gy``, ``c0``, ``csel``) are chip-independent.  Leading n_dev axes
    shard over the mesh row axis; the kernels see identical shapes on
    every chip (SPMD).
    """

    n_dev: int
    halo: int          # 8-aligned pre-shear halo rows per side
    Hloc: int          # sb + 2*halo (local block height fed to vshear)
    db: int
    sb: int
    Hd: int
    Wd: int
    qH: int
    qW: int
    qWp: int
    THp: int           # local padded sheared height (uniform across chips)
    TWp: int
    BLKR: int
    RH: int            # vshear rolled-array height (Hloc + max residual)
    RW: int            # hshear rolled-array width (qWp + max residual)
    TYd: int
    TXd: int
    nty: int           # per-chip row tiles
    ntx: int
    Ka: int
    Kb: int
    SRF: int
    SCF: int
    nbv: int           # residual roll bits (per-strip base hoisted)
    nbh: int
    gy_col: np.ndarray   # (1, 1, qWp) int32, replicated
    hx_loc: np.ndarray   # (n_dev, THp, 1) int32, row-sharded
    base_v: np.ndarray   # (qWp/128,) int32, replicated per-strip gy bases
    base_h: np.ndarray   # (n_dev, THp/BLKR) int32, row-sharded hx bases
    r0_loc: np.ndarray   # (n_dev, nty) int32, row-sharded
    c0: np.ndarray       # (ntx,) int32, replicated
    rsel: np.ndarray     # (n_dev, nty, Ka, TYd, SRF) f32, row-sharded
    csel: np.ndarray     # (ntx, Kb, SCF, TXd) f32, replicated
    w2t: np.ndarray      # (n_dev, nty*ntx, Ka*Kb, TYd, TXd) f32, sharded


def build_sharded_kernel_plan(op: EllOperator, n_dev: int,
                              tile_y: int = 128, tile_x: int = 128,
                              blk_r: int = 256) -> ShardedShearPlan:
    """Host tables for the row-sharded three-kernel rotated apply.

    Raises ValueError off the envelope (row counts not divisible, sb not
    8-aligned, geometry too small) — callers fall back to the XLA local
    apply.  Reference hot loop being distributed:
    /root/reference/Source.cpp:432-576.
    """
    spec = op.spec
    qH, qW = spec.qrot_shape
    Hd, Wd = spec.dst_shape
    if Hd % n_dev or qH % n_dev:
        raise ValueError(
            f"row-sharded plan needs divisible rows (dst {Hd}, src {qH}, "
            f"devices {n_dev})")
    db, sb = Hd // n_dev, qH // n_dev
    if sb % 8:
        # off_i = i*sb - halo must stay 8-aligned so the global plan's
        # 8-aligned r0 bases remain aligned after the per-chip shift
        raise ValueError(f"per-chip source block {sb} not 8-aligned")

    K = op.window
    base_y = op.base[..., 0]
    halo = 0
    for i in range(n_dev):
        blk = base_y[i * db: (i + 1) * db]
        halo = max(halo, i * sb - int(blk.min()),
                   int(blk.max()) + K - (i + 1) * sb)
    halo = _rup(max(halo, 0), 8)
    if halo and -(-halo // sb) > n_dev - 1:
        raise ValueError("halo exceeds the ring (use fewer row shards)")
    Hloc = sb + 2 * halo

    plan = build_shear_plan(op)
    gy = plan.gy.astype(np.int64)
    hx = plan.hx.astype(np.int64)
    ry0 = plan.ry0.astype(np.int64)
    cx0 = plan.cx0.astype(np.int64)
    w2 = plan.weights
    Ka, Kb = w2.shape[2], w2.shape[3]
    live = w2 != 0.0
    lv_row = live.any(axis=(1, 2, 3))
    lv_col = live.any(axis=(0, 2, 3))
    if not lv_row.any():
        raise ValueError("empty operator")

    TYd, TXd = tile_y, tile_x
    nty = _rup(db, TYd) // TYd           # per-chip row tiles
    ntx = _rup(Wd, TXd) // TXd
    off = np.arange(n_dev, dtype=np.int64) * sb - halo

    # per-(chip, tile) local row bases + uniform SRF
    r0_loc = np.zeros((n_dev, nty), np.int64)
    SRF = 8
    for i in range(n_dev):
        for t in range(nty):
            g0 = i * db + t * TYd
            g1 = min(g0 + TYd, (i + 1) * db)
            m = lv_row[g0:g1]
            if not m.any():
                continue
            rr = ry0[g0:g1][m] - off[i]
            lo = _rdn(int(rr.min()), 8)
            if lo < 0:
                raise ValueError("local sheared base below the halo block")
            r0_loc[i, t] = lo
            SRF = max(SRF, int(rr.max()) + Ka - lo)
    SRF = _rup(SRF, 8)

    # column tables: identical to the single-chip builder
    c0 = np.zeros(ntx, np.int64)
    SCF = 8
    for tx in range(ntx):
        sl = slice(tx * TXd, min(tx * TXd + TXd, Wd))
        m = lv_col[sl]
        if not m.any():
            continue
        cc = cx0[sl][m]
        c0[tx] = _rdn(int(cc.min()), 128)
        SCF = max(SCF, int(cc.max()) + Kb - int(c0[tx]))
    SCF = _rup(SCF, 128)

    qWp = _rup(qW, 128)

    # residual-roll bases, as in build_kernel_plan: the column-side gy
    # bases are chip-independent; the row-side hx bases follow the
    # per-chip hx slices
    gy_pad = np.zeros(qWp, np.int64)
    gy_pad[:qW] = gy
    nc = qWp // 128
    base_v = np.array([_rdn(int(gy_pad[c * 128:(c + 1) * 128].min()), 16)
                       for c in range(nc)], np.int64)
    residv = gy_pad - np.repeat(base_v, 128)
    RH = _rup(Hloc + int(residv.max()), 16)
    nbv = max(1, int(residv.max()).bit_length())

    THp = _rup(max(int((r0_loc + SRF).max()),
                   Hloc + int(gy.max()) + 1,
                   int(base_v.max()) + RH, blk_r), blk_r)

    # per-chip hx slice (clamped: rows outside the global table are never
    # read by the contraction — see r0_loc >= -off bound — but must hold
    # SOME value so the kernel's rolls stay defined)
    hx_loc = np.zeros((n_dev, THp, 1), np.int32)
    for i in range(n_dev):
        u = np.clip(off[i] + np.arange(THp), 0, len(hx) - 1)
        hx_loc[i, :, 0] = hx[u]

    nrh = THp // blk_r
    base_h = np.zeros((n_dev, nrh), np.int64)
    for i in range(n_dev):
        for r in range(nrh):
            base_h[i, r] = _rdn(
                int(hx_loc[i, r * blk_r:(r + 1) * blk_r, 0].min()), 128)
    residh = (hx_loc[:, :, 0].astype(np.int64)
              - np.repeat(base_h, blk_r, axis=1))
    RW = _rup(qWp + int(residh.max()), 128)
    nbh = max(1, int(residh.max()).bit_length())

    TWp = _rup(max(int(c0.max()) + SCF, qW + int(hx.max()) + 1,
                   int(base_h.max()) + RW), 128)

    gy_col = np.zeros((1, 1, qWp), np.int32)
    gy_col[0, 0, :qW] = gy

    rsel = np.zeros((n_dev, nty, Ka, TYd, SRF), np.float32)
    for i in range(n_dev):
        for t in range(nty):
            g0 = i * db + t * TYd
            g1 = min(g0 + TYd, (i + 1) * db)
            m = lv_row[g0:g1]
            ryl = ry0[g0:g1] - off[i] - r0_loc[i, t]
            for a in range(Ka):
                ok = m & (ryl + a >= 0) & (ryl + a < SRF)
                if not (ok | ~(live[g0:g1, :, a, :].any(axis=(1, 2)))).all():
                    raise ValueError("live tap outside the local row span")
                rsel[i, t, a, np.arange(g1 - g0)[ok], (ryl + a)[ok]] = 1.0

    csel = np.zeros((ntx, Kb, SCF, TXd), np.float32)
    for tx in range(ntx):
        dx0, dx1 = tx * TXd, min(tx * TXd + TXd, Wd)
        m = lv_col[dx0:dx1]
        cxl = cx0[dx0:dx1] - c0[tx]
        for b in range(Kb):
            ok = m & (cxl + b >= 0) & (cxl + b < SCF)
            if not (ok | ~(live[:, dx0:dx1, :, b].any(axis=(0, 2)))).all():
                raise ValueError("live tap outside the local col span")
            csel[tx, b, (cxl + b)[ok], np.arange(dx1 - dx0)[ok]] = 1.0

    w2t = np.zeros((n_dev, nty * ntx, Ka * Kb, TYd, TXd), np.float32)
    for i in range(n_dev):
        for t in range(nty):
            g0 = i * db + t * TYd
            g1 = min(g0 + TYd, (i + 1) * db)
            for tx in range(ntx):
                dx0, dx1 = tx * TXd, min(tx * TXd + TXd, Wd)
                nY, nX = g1 - g0, dx1 - dx0
                w2t[i, t * ntx + tx, :, :nY, :nX] = np.moveaxis(
                    w2[g0:g1, dx0:dx1].reshape(nY, nX, Ka * Kb), -1, 0
                ).astype(np.float32)

    return ShardedShearPlan(
        n_dev=n_dev, halo=halo, Hloc=Hloc, db=db, sb=sb, Hd=Hd, Wd=Wd,
        qH=qH, qW=qW, qWp=qWp, THp=THp, TWp=TWp, BLKR=blk_r, RH=RH, RW=RW,
        TYd=TYd, TXd=TXd, nty=nty, ntx=ntx, Ka=Ka, Kb=Kb, SRF=SRF, SCF=SCF,
        nbv=nbv, nbh=nbh, gy_col=gy_col, hx_loc=hx_loc,
        base_v=base_v.astype(np.int32), base_h=base_h.astype(np.int32),
        r0_loc=r0_loc.astype(np.int32), c0=c0.astype(np.int32),
        rsel=rsel, csel=csel, w2t=w2t,
    )


_PLAN_FIELDS = ("gy_col", "hx_row", "base_v", "base_h", "r0", "c0",
                "rsel", "csel", "w2t")


def build_kernel_plan_cached(op: EllOperator, tile_y: int = 128,
                             tile_x: int = 128,
                             cache_dir=None) -> ShearKernelPlan:
    """build_kernel_plan with a persistent disk cache (geometry-keyed).

    The plan is data-independent like the operator itself (SURVEY.md §5
    checkpoint/resume story); at 2048^2 it takes ~30 s to build and ~1 s
    to load.
    """
    import dataclasses as _dc
    import json as _json
    import os as _os

    from ..utils import cache as _cache

    cache_dir = cache_dir or _cache.DEFAULT_CACHE_DIR
    key = _cache.spec_key(op.spec, op.mode,
                          f"pallas_shear_v2_{tile_y}x{tile_x}")
    path = _os.path.join(cache_dir, f"{key}.npz")
    if _os.path.exists(path):
        z = np.load(path, allow_pickle=False)
        meta = _json.loads(str(z["__meta__"]))
        return ShearKernelPlan(**meta, **{f: z[f] for f in _PLAN_FIELDS})
    kp = build_kernel_plan(op, tile_y=tile_y, tile_x=tile_x)
    meta = {f.name: getattr(kp, f.name) for f in _dc.fields(kp)
            if f.name not in _PLAN_FIELDS}
    _os.makedirs(cache_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, __meta__=_json.dumps(meta),
                 **{n: getattr(kp, n) for n in _PLAN_FIELDS})
    _os.replace(tmp, path)
    return kp


def make_pallas_shear_apply(op: EllOperator, tile_y: int = 128,
                            tile_x: int = 128, weight_dtype=jnp.float32,
                            interpret: bool = False, cache: bool = False):
    """(fn, arrays): jit-ready Pallas rotated apply for an ELL operator.

    fn(q, **arrays) maps (F, qH, qW) -> (F, Hd, Wd).  Data dtype follows
    the input (bf16 or f32); selection matmuls run in the input dtype with
    fp32 accumulation (exact for one-hot weights); the final weighted
    accumulation uses fp32 weights.  ``cache=True`` persists the plan on
    disk keyed by geometry+mode (SURVEY.md §5 checkpoint/resume).
    """
    if cache:
        kp = build_kernel_plan_cached(op, tile_y=tile_y, tile_x=tile_x)
    else:
        kp = build_kernel_plan(op, tile_y=tile_y, tile_x=tile_x)
    # concrete even when called inside a jit trace: callers cache these
    # arrays (api._PALLAS_SHEAR_CACHE), and a trace-time jnp.asarray(numpy) is a
    # TRACER under JAX 0.9 — caching it poisons every later call
    with jax.ensure_compile_time_eval():
        arrays = dict(
            gy_col=jnp.asarray(kp.gy_col),
            hx_row=jnp.asarray(kp.hx_row),
            base_v=jnp.asarray(kp.base_v),
            base_h=jnp.asarray(kp.base_h),
            r0=jnp.asarray(kp.r0),
            c0=jnp.asarray(kp.c0),
            masks=jnp.asarray(tile_masks(kp.w2t)),
            rsel=jnp.asarray(kp.rsel),
            csel=jnp.asarray(kp.csel),
            w2t=jnp.asarray(kp.w2t, dtype=weight_dtype),
        )

    def fn(q, gy_col, hx_row, base_v, base_h, r0, c0, masks, rsel, csel,
           w2t):
        if q.ndim == 2:
            return fn(q[None], gy_col, hx_row, base_v, base_h, r0, c0,
                      masks, rsel, csel, w2t)[0]
        F, H, W = q.shape
        assert (H, W) == (kp.qH, kp.qW), (q.shape, kp.qH, kp.qW)
        dtype = q.dtype
        if dtype not in (jnp.bfloat16, jnp.float32):
            dtype = jnp.float32
            q = q.astype(dtype)
        if kp.qWp != W:
            q = jnp.pad(q, ((0, 0), (0, 0), (0, kp.qWp - W)))
        dname = jnp.dtype(dtype).name
        vshear = _build_vshear(F, kp.qH, kp.qWp, kp.THp, kp.RH, kp.nbv,
                               dname, interpret)
        hshear = _build_hshear(F, kp.THp, kp.qWp, kp.TWp, kp.BLKR, kp.RW,
                               kp.nbh, dname, interpret)
        contract = _build_contract(
            F, kp.THp, kp.TWp, kp.nty, kp.ntx, kp.TYd, kp.TXd, kp.Ka,
            kp.Kb, kp.SRF, kp.SCF, dname, dname, interpret, masked=True)
        s = vshear(base_v, gy_col, q)
        t = hshear(base_h, hx_row, s)
        out = contract(r0, c0, masks, t, rsel.astype(dtype),
                       csel.astype(dtype), w2t)
        return out[:, : kp.Hd, : kp.Wd]

    return fn, arrays


# ----------------------------------------------------------------------
# 2-D-mesh (rows x cols) sharded plan: per-chip tables for the
# three-kernel local contraction over a spatially 2-D-sharded source
# ----------------------------------------------------------------------


@dataclasses.dataclass
class Sharded2DShearPlan:
    """Per-chip kernel tables for the (rows x cols)-sharded rotated apply.

    BOTH shears commute with the 2-D spatial sharding: with chip offsets
    ``off_i = i*sb_r - halo_y`` / ``off_j = j*sb_c - halo_x`` every local
    sheared coordinate is the global one shifted by (off_i, off_j) —
    ``T_loc[t, x]`` holds ``T_glob[t + off_i, x + off_j]`` — because the
    vertical shift table gy is indexed by source COLUMN (per-col-chip
    slice) and the horizontal table hx by sheared ROW (per-row-chip
    slice).  One global shear plan therefore serves every chip; the
    leading n_r / n_c table axes shard over the mesh axes and the
    kernels see identical shapes everywhere (SPMD).
    """

    n_r: int
    n_c: int
    halo_y: int        # pre-shear halo rows per side (rows axis)
    halo_x: int        # pre-shear halo cols per side (cols axis)
    Hloc: int          # sb_r + 2*halo_y (local block height)
    Wloc: int          # sb_c + 2*halo_x (local block width, unpadded)
    qWp: int           # local padded width (rup(Wloc, 128))
    db_r: int
    sb_r: int
    db_c: int
    sb_c: int
    Hd: int
    Wd: int
    THp: int           # local padded sheared height (uniform)
    TWp: int
    BLKR: int
    RH: int
    RW: int
    TYd: int
    TXd: int
    nty: int           # per-chip dst row tiles (over db_r)
    ntx: int           # per-chip dst col tiles (over db_c)
    Ka: int
    Kb: int
    SRF: int
    SCF: int
    nbv: int
    nbh: int
    gy_loc: np.ndarray   # (n_c, 1, qWp) int32, col-sharded
    hx_loc: np.ndarray   # (n_r, THp, 1) int32, row-sharded
    base_v: np.ndarray   # (n_c, qWp/128) int32, col-sharded
    base_h: np.ndarray   # (n_r, THp/BLKR) int32, row-sharded
    r0_loc: np.ndarray   # (n_r, nty) int32, row-sharded
    c0_loc: np.ndarray   # (n_c, ntx) int32, col-sharded
    rsel: np.ndarray     # (n_r, nty, Ka, TYd, SRF) f32, row-sharded
    csel: np.ndarray     # (n_c, ntx, Kb, SCF, TXd) f32, col-sharded
    w2t: np.ndarray      # (n_r, n_c, nty*ntx, Ka*Kb, TYd, TXd) f32, 2-D


def build_sharded_kernel_plan_2d(op: EllOperator, n_r: int, n_c: int,
                                 tile_y: int = 128, tile_x: int = 128,
                                 blk_r: int = 256) -> Sharded2DShearPlan:
    """Host tables for the (rows x cols)-sharded three-kernel rotated
    apply — the 2-D-mesh distribution of the reference's hot loop
    (/root/reference/Source.cpp:432-576).

    Raises ValueError off the envelope (indivisible counts, sb_r not
    8-aligned, halo exceeding either ring, sheared base below the halo
    block) — callers fall back to the XLA flat-gather local apply.
    """
    spec = op.spec
    qH, qW = spec.qrot_shape
    Hd, Wd = spec.dst_shape
    if Hd % n_r or qH % n_r or Wd % n_c or qW % n_c:
        raise ValueError(
            f"2-D sharded plan needs divisible counts (dst {Hd}x{Wd}, "
            f"src {qH}x{qW}, mesh {n_r}x{n_c})")
    db_r, sb_r = Hd // n_r, qH // n_r
    db_c, sb_c = Wd // n_c, qW // n_c
    if sb_r % 8:
        raise ValueError(f"per-chip source rows {sb_r} not 8-aligned")

    K = op.window
    base_y = op.base[..., 0]
    base_x = op.base[..., 1]
    halo_y = 0
    for i in range(n_r):
        blk = base_y[i * db_r: (i + 1) * db_r]
        halo_y = max(halo_y, i * sb_r - int(blk.min()),
                     int(blk.max()) + K - (i + 1) * sb_r)
    halo_y = _rup(max(halo_y, 0), 8)
    halo_x = 0
    for j in range(n_c):
        blk = base_x[:, j * db_c: (j + 1) * db_c]
        halo_x = max(halo_x, j * sb_c - int(blk.min()),
                     int(blk.max()) + K - (j + 1) * sb_c)
    halo_x = max(halo_x, 0)
    if halo_y and -(-halo_y // sb_r) > n_r - 1:
        raise ValueError("row halo exceeds the ring")
    if halo_x and -(-halo_x // sb_c) > n_c - 1:
        raise ValueError("col halo exceeds the ring")
    Hloc = sb_r + 2 * halo_y
    Wloc = sb_c + 2 * halo_x
    qWp = _rup(Wloc, 128)

    plan = build_shear_plan(op)
    gy = plan.gy.astype(np.int64)
    hx = plan.hx.astype(np.int64)
    ry0 = plan.ry0.astype(np.int64)
    cx0 = plan.cx0.astype(np.int64)
    w2 = plan.weights
    Ka, Kb = w2.shape[2], w2.shape[3]
    live = w2 != 0.0
    lv_row = live.any(axis=(1, 2, 3))
    lv_col = live.any(axis=(0, 2, 3))
    if not lv_row.any():
        raise ValueError("empty operator")

    TYd, TXd = tile_y, tile_x
    nty = _rup(db_r, TYd) // TYd
    ntx = _rup(db_c, TXd) // TXd
    off_r = np.arange(n_r, dtype=np.int64) * sb_r - halo_y
    off_c = np.arange(n_c, dtype=np.int64) * sb_c - halo_x

    # per-(row-chip, tile) local sheared row bases + uniform SRF.  ry0 is
    # the GLOBAL per-dst-row sheared base (min over all cols) — the
    # vertical shear cancels the cross-column drift, so restricting to a
    # col block would tighten SRF by at most a few cells
    r0_loc = np.zeros((n_r, nty), np.int64)
    SRF = 8
    for i in range(n_r):
        for t in range(nty):
            g0 = i * db_r + t * TYd
            g1 = min(g0 + TYd, (i + 1) * db_r)
            m = lv_row[g0:g1]
            if not m.any():
                continue
            rr = ry0[g0:g1][m] - off_r[i]
            lo = _rdn(int(rr.min()), 8)
            if lo < 0:
                raise ValueError("local sheared base below the halo block")
            r0_loc[i, t] = lo
            SRF = max(SRF, int(rr.max()) + Ka - lo)
    SRF = _rup(SRF, 8)

    # per-(col-chip, tile) local sheared col bases + uniform SCF
    c0_loc = np.zeros((n_c, ntx), np.int64)
    SCF = 8
    for j in range(n_c):
        for t in range(ntx):
            g0 = j * db_c + t * TXd
            g1 = min(g0 + TXd, (j + 1) * db_c)
            m = lv_col[g0:g1]
            if not m.any():
                continue
            cc = cx0[g0:g1][m] - off_c[j]
            lo = _rdn(int(cc.min()), 128)
            if lo < 0:
                raise ValueError("local sheared col base below the halo "
                                 "block")
            c0_loc[j, t] = lo
            SCF = max(SCF, int(cc.max()) + Kb - lo)
    SCF = _rup(SCF, 128)

    # per-col-chip gy slices (clamped outside the global table: those
    # local columns hold zero halo pixels) + per-strip 16-aligned bases
    gy_loc = np.zeros((n_c, 1, qWp), np.int32)
    for j in range(n_c):
        u = np.clip(off_c[j] + np.arange(qWp), 0, len(gy) - 1)
        gy_loc[j, 0] = gy[u]
    nc_strip = qWp // 128
    base_v = np.zeros((n_c, nc_strip), np.int64)
    for j in range(n_c):
        for s in range(nc_strip):
            base_v[j, s] = _rdn(
                int(gy_loc[j, 0, s * 128:(s + 1) * 128].min()), 16)
    residv = (gy_loc[:, 0, :].astype(np.int64)
              - np.repeat(base_v, 128, axis=1))
    RH = _rup(Hloc + int(residv.max()), 16)
    nbv = max(1, int(residv.max()).bit_length())

    THp = _rup(max(int((r0_loc + SRF).max()),
                   Hloc + int(gy.max()) + 1,
                   int(base_v.max()) + RH, blk_r), blk_r)

    # per-row-chip hx slices (indexed by GLOBAL sheared row) + per-block
    # 128-aligned bases
    hx_loc = np.zeros((n_r, THp, 1), np.int32)
    for i in range(n_r):
        u = np.clip(off_r[i] + np.arange(THp), 0, len(hx) - 1)
        hx_loc[i, :, 0] = hx[u]
    nrh = THp // blk_r
    base_h = np.zeros((n_r, nrh), np.int64)
    for i in range(n_r):
        for r in range(nrh):
            base_h[i, r] = _rdn(
                int(hx_loc[i, r * blk_r:(r + 1) * blk_r, 0].min()), 128)
    residh = (hx_loc[:, :, 0].astype(np.int64)
              - np.repeat(base_h, blk_r, axis=1))
    RW = _rup(qWp + int(residh.max()), 128)
    nbh = max(1, int(residh.max()).bit_length())

    TWp = _rup(max(int((c0_loc + SCF).max()),
                   qWp + int(hx.max()) + 1,
                   int(base_h.max()) + RW), 128)

    rsel = np.zeros((n_r, nty, Ka, TYd, SRF), np.float32)
    for i in range(n_r):
        for t in range(nty):
            g0 = i * db_r + t * TYd
            g1 = min(g0 + TYd, (i + 1) * db_r)
            m = lv_row[g0:g1]
            ryl = ry0[g0:g1] - off_r[i] - r0_loc[i, t]
            for a in range(Ka):
                ok = m & (ryl + a >= 0) & (ryl + a < SRF)
                if not (ok | ~(live[g0:g1, :, a, :].any(axis=(1, 2)))).all():
                    raise ValueError("live tap outside the local row span")
                rsel[i, t, a, np.arange(g1 - g0)[ok], (ryl + a)[ok]] = 1.0

    csel = np.zeros((n_c, ntx, Kb, SCF, TXd), np.float32)
    for j in range(n_c):
        for t in range(ntx):
            g0 = j * db_c + t * TXd
            g1 = min(g0 + TXd, (j + 1) * db_c)
            m = lv_col[g0:g1]
            cxl = cx0[g0:g1] - off_c[j] - c0_loc[j, t]
            for b in range(Kb):
                ok = m & (cxl + b >= 0) & (cxl + b < SCF)
                if not (ok | ~(live[:, g0:g1, :, b].any(axis=(0, 2)))).all():
                    raise ValueError("live tap outside the local col span")
                csel[j, t, b, (cxl + b)[ok], np.arange(g1 - g0)[ok]] = 1.0

    w2t = np.zeros((n_r, n_c, nty * ntx, Ka * Kb, TYd, TXd), np.float32)
    for i in range(n_r):
        for j in range(n_c):
            for t in range(nty):
                r0g = i * db_r + t * TYd
                r1g = min(r0g + TYd, (i + 1) * db_r)
                for tx in range(ntx):
                    c0g = j * db_c + tx * TXd
                    c1g = min(c0g + TXd, (j + 1) * db_c)
                    nY, nX = r1g - r0g, c1g - c0g
                    w2t[i, j, t * ntx + tx, :, :nY, :nX] = np.moveaxis(
                        w2[r0g:r1g, c0g:c1g].reshape(nY, nX, Ka * Kb),
                        -1, 0).astype(np.float32)

    return Sharded2DShearPlan(
        n_r=n_r, n_c=n_c, halo_y=halo_y, halo_x=halo_x, Hloc=Hloc,
        Wloc=Wloc, qWp=qWp, db_r=db_r, sb_r=sb_r, db_c=db_c, sb_c=sb_c,
        Hd=Hd, Wd=Wd, THp=THp, TWp=TWp, BLKR=blk_r, RH=RH, RW=RW,
        TYd=TYd, TXd=TXd, nty=nty, ntx=ntx, Ka=Ka, Kb=Kb, SRF=SRF,
        SCF=SCF, nbv=nbv, nbh=nbh, gy_loc=gy_loc, hx_loc=hx_loc,
        base_v=base_v.astype(np.int32), base_h=base_h.astype(np.int32),
        r0_loc=r0_loc.astype(np.int32), c0_loc=c0_loc.astype(np.int32),
        rsel=rsel, csel=csel, w2t=w2t,
    )
