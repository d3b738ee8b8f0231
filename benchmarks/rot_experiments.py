"""Rotated-kernel component experiments (VERDICT r2 item 2).

Decomposes the 2048^2 rot30 pipeline (563 us/frame measured, round 2) into
its engine budgets to find what a restructured kernel can actually save:

    Measured decomposition (2026-08-17, round 3): shears 157 us +
    contract 400 us = 557 ~= the 563 us full pipeline.  "noweight" (397)
    and "pipelined" (404) match plain contract (400): the VPU weighted
    accumulation is ALREADY hidden behind the MXU — the contraction is
    purely MXU-pass-bound at ~23 ns/effective pass (~91% of peak).

Experiments (each timed with bench.timed_scan — the honest harness):
  shears    vshear+hshear only (T construction)
  contract  contract kernel only on a prebuilt T
  noweight  contract with the VPU weighted accumulation replaced by a
            plain sum (invalid numerics, isolates VPU-FMA serialization)
  full      the production three-kernel pipeline (baseline)

Run on the real TPU:  python benchmarks/rot_experiments.py --exp shears
"""

from __future__ import annotations

import argparse
import functools
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import timed_scan, _CACHE_DIR  # noqa: F401 (cache config side effect)


def _plan(H=2048, W=2048, angle=30.0):
    import aainterp as aa
    from aainterp.ops.weights import ell_operator
    from aainterp.ops.pallas_shear import build_kernel_plan_cached

    spec = aa.make_grid_spec((H, W), 1.0, 0.5, (W / 2, H / 2), angle)
    op = ell_operator(spec, mode="exact")
    kp = build_kernel_plan_cached(op)
    return spec, op, kp


def _frames(K, B, H, W, dtype, seed=0):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.uniform(0, 1, (K, B, H, W)).astype(np.float32),
                    dtype=dtype)
    b = jnp.asarray(rng.uniform(0, 1, (K, B, H, W)).astype(np.float32),
                    dtype=dtype)
    return a, b


def exp_full(batch, dtype, tile_y=128):
    from aainterp.ops.pallas_shear import make_pallas_shear_apply

    spec, op, kp = _plan()
    fn, arrs = make_pallas_shear_apply(op, tile_y=tile_y, cache=True)
    frames, warm = _frames(8, batch, 2048, 2048, dtype)
    consts = tuple(arrs.values())
    dt = timed_scan(lambda f, *cs: fn(f, *cs).astype(dtype), frames, warm,
                    consts=consts)
    return batch * 2048 * 2048 / dt / 1e9, dt / batch


def exp_shears(batch, dtype):
    from aainterp.ops.pallas_shear import (
        _build_hshear, _build_vshear, build_kernel_plan_cached,
    )

    spec, op, kp = _plan()
    dname = jnp.dtype(dtype).name
    vshear = _build_vshear(batch, kp.qH, kp.qWp, kp.THp, kp.RH, kp.nbv,
                           dname, False)
    hshear = _build_hshear(batch, kp.THp, kp.qWp, kp.TWp, kp.BLKR, kp.RW,
                           kp.nbh, dname, False)
    gy = jnp.asarray(kp.gy_col)
    hx = jnp.asarray(kp.hx_row)
    bv = jnp.asarray(kp.base_v)
    bh = jnp.asarray(kp.base_h)
    frames, warm = _frames(8, batch, 2048, 2048, dtype)

    def fn(q, gy, hx, bv, bh):
        t = hshear(bh, hx, vshear(bv, gy, q))
        return t

    dt = timed_scan(fn, frames, warm, consts=(gy, hx, bv, bh))
    return batch * 2048 * 2048 / dt / 1e9, dt / batch


def _contract_inputs(kp, batch, dtype, K=4):  # K=4: T stacks are 23 MB/frame
    """Prebuilt random T stacks (stand-ins for the sheared plane) plus the
    real selector/weight tables."""
    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.uniform(0, 1, (K, batch, kp.THp, kp.TWp)).astype(
        np.float32), dtype=dtype)
    tw = jnp.asarray(rng.uniform(0, 1, (K, batch, kp.THp, kp.TWp)).astype(
        np.float32), dtype=dtype)
    consts = (jnp.asarray(kp.r0), jnp.asarray(kp.c0),
              jnp.asarray(kp.rsel, dtype=dtype),
              jnp.asarray(kp.csel, dtype=dtype),
              jnp.asarray(kp.w2t))
    return t, tw, consts


def exp_contract(batch, dtype):
    from aainterp.ops.pallas_shear import _build_contract

    spec, op, kp = _plan()
    dname = jnp.dtype(dtype).name
    contract = _build_contract(batch, kp.THp, kp.TWp, kp.nty, kp.ntx,
                               kp.TYd, kp.TXd, kp.Ka, kp.Kb, kp.SRF,
                               kp.SCF, dname, dname, False)
    t, tw, consts = _contract_inputs(kp, batch, dtype)

    def fn(t_arr, r0, c0, rsel, csel, w2t):
        return contract(r0, c0, t_arr, rsel, csel, w2t)

    dt = timed_scan(fn, t, tw, consts=consts)
    return batch * 2048 * 2048 / dt / 1e9, dt / batch


@functools.lru_cache(maxsize=8)
def _build_contract_noweight(F, THp, TWp, nty, ntx, TYd, TXd, Ka, Kb, SRF,
                             SCF, dtype_name, interpret):
    """Contract variant with the VPU weighted accumulation replaced by a
    plain sum of the one-hot selects (WRONG numerics — isolates how much
    of the kernel time is serialized VPU FMA + weight-table loads)."""
    dtype = jnp.dtype(dtype_name)
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def kernel(r0_ref, c0_ref, t_ref, rsel_ref, csel_ref, out_ref, tblk,
               sem):
        t = pl.program_id(0)
        f = pl.program_id(1)

        def tblk_dma(tt, ff, slot_i):
            r0 = pl.multiple_of(r0_ref[jax.lax.div(tt, ntx)], 8)
            c0 = pl.multiple_of(c0_ref[jax.lax.rem(tt, ntx)], 128)
            return pltpu.make_async_copy(
                t_ref.at[ff, pl.ds(r0, SRF), pl.ds(c0, SCF)],
                tblk.at[slot_i], sem.at[slot_i])

        s = t * F + f
        slot = jax.lax.rem(s, 2)

        @pl.when(s == 0)
        def _():
            tblk_dma(t, f, slot).start()

        @pl.when(s + 1 < nty * ntx * F)
        def _():
            tblk_dma(jax.lax.div(s + 1, F), jax.lax.rem(s + 1, F),
                     jax.lax.rem(s + 1, 2)).start()

        tblk_dma(t, f, slot).wait()
        blk = tblk[slot]
        acc = jnp.zeros((TYd, TXd), jnp.float32)
        for b in range(Kb):
            vb = jnp.dot(blk, csel_ref[0, b], precision=prec,
                         preferred_element_type=jnp.float32).astype(dtype)
            for a in range(Ka):
                sel = jnp.dot(rsel_ref[0, a], vb, precision=prec,
                              preferred_element_type=jnp.float32)
                acc = acc + sel          # <-- no weight load, no multiply
        out_ref[0] = acc.astype(dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty * ntx, F),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, Ka, TYd, SRF),
                         lambda t, f, *_: (jax.lax.div(t, ntx), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kb, SCF, TXd),
                         lambda t, f, *_: (jax.lax.rem(t, ntx), 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TYd, TXd),
            lambda t, f, *_: (f, jax.lax.div(t, ntx), jax.lax.rem(t, ntx)),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, SRF, SCF), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def call(r0, c0, t_arr, rsel, csel):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (F, nty * TYd, ntx * TXd), dtype),
            interpret=interpret,
        )(r0, c0, t_arr, rsel, csel)

    return call


def exp_noweight(batch, dtype):
    spec, op, kp = _plan()
    dname = jnp.dtype(dtype).name
    contract = _build_contract_noweight(
        batch, kp.THp, kp.TWp, kp.nty, kp.ntx, kp.TYd, kp.TXd, kp.Ka,
        kp.Kb, kp.SRF, kp.SCF, dname, False)
    t, tw, consts = _contract_inputs(kp, batch, dtype)
    consts = consts[:4]  # no w2t

    def fn(t_arr, r0, c0, rsel, csel):
        return contract(r0, c0, t_arr, rsel, csel)

    dt = timed_scan(fn, t, tw, consts=consts)
    return batch * 2048 * 2048 / dt / 1e9, dt / batch


def exp_contract_masked(batch, dtype):
    from aainterp.ops.pallas_shear import _build_contract, tile_masks

    spec, op, kp = _plan()
    dname = jnp.dtype(dtype).name
    contract = _build_contract(batch, kp.THp, kp.TWp, kp.nty, kp.ntx,
                               kp.TYd, kp.TXd, kp.Ka, kp.Kb, kp.SRF,
                               kp.SCF, dname, dname, False, masked=True)
    t, tw, consts = _contract_inputs(kp, batch, dtype)
    masks = jnp.asarray(tile_masks(kp.w2t))
    consts = (consts[0], consts[1], masks) + consts[2:]

    def fn(t_arr, r0, c0, m, rsel, csel, w2t):
        return contract(r0, c0, m, t_arr, rsel, csel, w2t)

    dt = timed_scan(fn, t, tw, consts=consts)
    return batch * 2048 * 2048 / dt / 1e9, dt / batch



@functools.lru_cache(maxsize=8)
def _build_contract_share(F, THp, TWp, nty, ntx, TYd, TXd, Ka, Kb, SRF,
                          SCF, dtype_name, tshare, wshare, interpret):
    """Masked contract with shared (non-streamed) operands — VERDICT r3
    item 5's itemization probes.  ``tshare`` fetches ONE T block at step
    0 and reuses it for every (tile, frame) — deletes the ~54 MB/frame
    of overlapped T re-reads (WRONG numerics, DMA-traffic-valid);
    ``wshare`` pins the w2t BlockSpec to block 0 — deletes the per-tile
    weight-block streaming (~25 MB/frame at F=8).  Everything else is
    the production masked kernel (dead-tile skip included).
    """
    dtype = jnp.dtype(dtype_name)
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def kernel(r0_ref, c0_ref, m_ref, t_ref, rsel_ref, csel_ref, w2_ref,
               out_ref, tblk, sem):
        t = pl.program_id(0)
        f = pl.program_id(1)

        def tblk_dma(tt, ff, slot_i):
            r0 = pl.multiple_of(r0_ref[jax.lax.div(tt, ntx)], 8)
            c0 = pl.multiple_of(c0_ref[jax.lax.rem(tt, ntx)], 128)
            return pltpu.make_async_copy(
                t_ref.at[ff, pl.ds(r0, SRF), pl.ds(c0, SCF)],
                tblk.at[slot_i], sem.at[slot_i])

        s = t * F + f
        live = m_ref[t] != 0
        if tshare:
            @pl.when(s == 0)
            def _():
                d = tblk_dma(0, 0, 0)
                d.start()
                d.wait()
            slot = 0
        else:
            slot = jax.lax.rem(s, 2)

            @pl.when(jnp.logical_and(s == 0, live))
            def _():
                tblk_dma(t, f, slot).start()

            nxt = s + 1
            nxt_in = nxt < nty * ntx * F
            nxt_live = jnp.logical_and(
                nxt_in, m_ref[jax.lax.div(jnp.minimum(
                    nxt, nty * ntx * F - 1), F)] != 0)

            @pl.when(nxt_live)
            def _():
                tblk_dma(jax.lax.div(nxt, F), jax.lax.rem(nxt, F),
                         jax.lax.rem(nxt, 2)).start()

        def contract_body():
            if not tshare:
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
            out_ref[0] = acc.astype(dtype)

        pl.when(live)(contract_body)

        @pl.when(jnp.logical_not(live))
        def _():
            out_ref[0] = jnp.zeros((TYd, TXd), dtype)

    w2_map = ((lambda t, f, *_: (0, 0, 0, 0)) if wshare
              else (lambda t, f, *_: (t, 0, 0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nty * ntx, F),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, Ka, TYd, SRF),
                         lambda t, f, *_: (jax.lax.div(t, ntx), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kb, SCF, TXd),
                         lambda t, f, *_: (jax.lax.rem(t, ntx), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ka * Kb, TYd, TXd), w2_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TYd, TXd),
            lambda t, f, *_: (f, jax.lax.div(t, ntx), jax.lax.rem(t, ntx)),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, SRF, SCF), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def call(r0, c0, m, t_arr, rsel, csel, w2t):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (F, nty * TYd, ntx * TXd), dtype),
            interpret=interpret,
        )(r0, c0, m, t_arr, rsel, csel, w2t)

    return call


def _share_exp(batch, dtype, tshare, wshare):
    from aainterp.ops.pallas_shear import tile_masks

    spec, op, kp = _plan()
    dname = jnp.dtype(dtype).name
    contract = _build_contract_share(
        batch, kp.THp, kp.TWp, kp.nty, kp.ntx, kp.TYd, kp.TXd, kp.Ka,
        kp.Kb, kp.SRF, kp.SCF, dname, tshare, wshare, False)
    t, tw, consts = _contract_inputs(kp, batch, dtype)
    masks = jnp.asarray(tile_masks(kp.w2t))
    consts = (consts[0], consts[1], masks) + consts[2:]

    def fn(t_arr, r0, c0, m, rsel, csel, w2t):
        return contract(r0, c0, m, t_arr, rsel, csel, w2t)

    dt = timed_scan(fn, t, tw, consts=consts)
    return batch * 2048 * 2048 / dt / 1e9, dt / batch


def exp_contract_tshare(batch, dtype):
    return _share_exp(batch, dtype, True, False)


def exp_contract_wshare(batch, dtype):
    return _share_exp(batch, dtype, False, True)


def exp_contract_bothshare(batch, dtype):
    return _share_exp(batch, dtype, True, True)


@functools.lru_cache(maxsize=8)
def _build_contract_pipelined(F, THp, TWp, nty, ntx, TYd, TXd, Ka, Kb, SRF,
                              SCF, dtype_name, interpret):
    """Contract with hand-pipelined emission: each tap's weighted FMA is
    emitted AFTER the next tap's sel matmul, so the VPU work of tap k is
    independent of the MXU op in flight (tests whether Mosaic dual-issues
    when given an overlap-friendly order)."""
    dtype = jnp.dtype(dtype_name)
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def kernel(r0_ref, c0_ref, t_ref, rsel_ref, csel_ref, w2_ref, out_ref,
               tblk, sem):
        t = pl.program_id(0)
        f = pl.program_id(1)

        def tblk_dma(tt, ff, slot_i):
            r0 = pl.multiple_of(r0_ref[jax.lax.div(tt, ntx)], 8)
            c0 = pl.multiple_of(c0_ref[jax.lax.rem(tt, ntx)], 128)
            return pltpu.make_async_copy(
                t_ref.at[ff, pl.ds(r0, SRF), pl.ds(c0, SCF)],
                tblk.at[slot_i], sem.at[slot_i])

        s = t * F + f
        slot = jax.lax.rem(s, 2)

        @pl.when(s == 0)
        def _():
            tblk_dma(t, f, slot).start()

        @pl.when(s + 1 < nty * ntx * F)
        def _():
            tblk_dma(jax.lax.div(s + 1, F), jax.lax.rem(s + 1, F),
                     jax.lax.rem(s + 1, 2)).start()

        tblk_dma(t, f, slot).wait()
        blk = tblk[slot]
        acc = jnp.zeros((TYd, TXd), jnp.float32)
        pending = None  # (w2 index, sel) awaiting its FMA
        for b in range(Kb):
            vb = jnp.dot(blk, csel_ref[0, b], precision=prec,
                         preferred_element_type=jnp.float32).astype(dtype)
            for a in range(Ka):
                sel = jnp.dot(rsel_ref[0, a], vb, precision=prec,
                              preferred_element_type=jnp.float32)
                if pending is not None:
                    acc = acc + w2_ref[0, pending[0]] * pending[1]
                pending = (a * Kb + b, sel)
        acc = acc + w2_ref[0, pending[0]] * pending[1]
        out_ref[0] = acc.astype(dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty * ntx, F),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
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
        scratch_shapes=[
            pltpu.VMEM((2, SRF, SCF), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def call(r0, c0, t_arr, rsel, csel, w2t):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (F, nty * TYd, ntx * TXd), dtype),
            interpret=interpret,
        )(r0, c0, t_arr, rsel, csel, w2t)

    return call


def exp_pipelined(batch, dtype):
    spec, op, kp = _plan()
    dname = jnp.dtype(dtype).name
    contract = _build_contract_pipelined(
        batch, kp.THp, kp.TWp, kp.nty, kp.ntx, kp.TYd, kp.TXd, kp.Ka,
        kp.Kb, kp.SRF, kp.SCF, dname, False)
    t, tw, consts = _contract_inputs(kp, batch, dtype)

    def fn(t_arr, r0, c0, rsel, csel, w2t):
        return contract(r0, c0, t_arr, rsel, csel, w2t)

    dt = timed_scan(fn, t, tw, consts=consts)
    return batch * 2048 * 2048 / dt / 1e9, dt / batch


EXPS = {"full": exp_full, "shears": exp_shears, "contract": exp_contract,
        "noweight": exp_noweight, "contract_masked": exp_contract_masked,
        "pipelined": exp_pipelined, "tshare": exp_contract_tshare,
        "wshare": exp_contract_wshare, "bothshare": exp_contract_bothshare}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True, choices=sorted(EXPS))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--tile_y", type=int, default=128,
                    help="dst row-tile height (full pipeline only); 104 "
                    "drops SRF to 2 MXU K-tiles")
    args = ap.parse_args()
    if args.exp == "full":
        g, per_frame = exp_full(args.batch, jnp.dtype(args.dtype),
                                tile_y=args.tile_y)
    else:
        g, per_frame = EXPS[args.exp](args.batch, jnp.dtype(args.dtype))
    print(f"{args.exp}: {g:.2f} Gpixel/s  ({per_frame*1e6:.0f} us/frame)")


if __name__ == "__main__":
    main()
