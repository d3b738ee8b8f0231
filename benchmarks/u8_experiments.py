"""u8 flagship (4K->1080p u8->u8) engine decomposition — VERDICT r3 #1.

The u8 serving route measures 31.2 us/frame (266.4 Gpixel/s) against a
~14.7 us HBM-traffic floor (8.3 MB read + 2.1 MB write at the measured
~770 GB/s duplex) — the largest quantified single-chip gap left, and the
one config whose residual was attributed ("y/x MXU passes + the extract
VPU work that no longer hides") but never probe-measured.  These probes
time the production pipeline's stages in isolation at the exact
production geometry (TY=120, TX=128, 32-aligned u8 band bases, bitcast
byte-split unpack with the backend-probed wy permutation):

  dma      the u8 band-DMA schedule only (double-buffered (SY, W)
           fetches) + a production-sized (TY, Wd) u8 store — the
           kernel's traffic floor
  extract  dma + the bitcast byte-split unpack (free reinterpret +
           4x lanewise shift/mask + concat) — the VPU stage
  ydot     extract + the densified y matmul (TY, SY) x (SY, W) — the
           big MXU pass (wy pre-permuted, DEFAULT precision: u8 pixels
           are bf16-exact)
  full     production apply_separable_pallas u8->u8 (reference point);
           full adds the ntx x-pass dots (TY, SX) x (SX, TX) + the
           round/saturate stores

Run on the real TPU:
  python benchmarks/u8_experiments.py --exp dma|extract|ydot|full|all
Interpret-mode stage correctness: --check (CPU).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import timed_scan  # noqa: E402

H, W = 2160, 3840
TY, TX = 120, 128  # production tiling (u8 tile sweep: (120,128) stands)
Wd = 1920


def _geometry(interpret=False):
    """Production u8 plan pieces: 32-aligned row bases, permuted wy."""
    from aainterp.grids import make_grid_spec
    from aainterp.ops.pallas_apply import (_densify_row_band,
                                           _u8_pack_order)
    from aainterp.ops.weights import separable_operator

    spec = make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec, mode="exact")
    ys = np.asarray(op.wy.start)
    yw = np.asarray(op.wy.weights, np.float32)
    xs = np.asarray(op.wx.start)
    xw = np.asarray(op.wx.weights, np.float32)
    # EXACT production u8 plan: 32-aligned bases with a tight 8-multiple
    # span (span_align=8) — no frame padding, base clamped inside H
    row_base, wy_blocks, SY = _densify_row_band(ys, yw, H, TY,
                                                align=32, span_align=8)
    perm = _u8_pack_order(SY, interpret)
    wy_perm = np.ascontiguousarray(wy_blocks[:, :, list(perm)])
    col_base, wx_t, SX = _densify_row_band(xs, xw, W, TX, align=128)
    wx_blocks = np.ascontiguousarray(np.swapaxes(wx_t, 1, 2))
    return op, row_base, wy_perm, SY, col_base, wx_blocks, SX


def _frames(K, B, seed=0):
    rng = np.random.default_rng(seed)

    def mk():
        return jnp.asarray(rng.integers(0, 256, (K, B, H, W),
                                        dtype=np.uint8))

    return mk(), mk()


@functools.lru_cache(maxsize=16)
def _build_stage_probe(F, SY, nty, stage, SX=0, ntx=0, col_base=(),
                       interpret=False):
    """Band-DMA schedule of the production u8 kernel, cut after `stage`.

    Every stage stores exactly one production-sized (TY, Wd) u8 tile per
    program, so write traffic matches the real kernel's ~4:1
    read:write ratio and nothing is DCE'd.  Extra stages beyond the
    cumulative cut-offs:

      xdot   the FULL pipeline but with tmp kept as a register VALUE
             (no (TY, W) VMEM scratch ref) and STATIC 128-aligned
             col bases — isolates the tmp-ref round trip + dynamic
             slicing from the x-MXU work itself
      xpair  aligned x-pass on the VPU: the flagship x band is an exact
             m=2 partition (ratio-2 downscale), so the x contraction is
             an even/odd lane split (stride-2 value slices: 32-bit f32,
             last-dim 128-multiple — inside the Mosaic strided
             contract) + one FMA with the (2, Wd) compacted tap table.
             No x MXU passes, no 15-way dot/store fragmentation.
    """
    from aainterp.ops.pallas_apply import _u8_unpack_bf16

    def kernel(row_base_ref, src_ref, wy_ref, wx_ref, out_ref, src_buf,
               tmp_buf, sem):
        t = pl.program_id(0)

        def band_dma(step, slot_i):
            tr = jax.lax.rem(step, nty)
            fr = jax.lax.div(step, nty)
            return pltpu.make_async_copy(
                src_ref.at[fr, pl.ds(
                    pl.multiple_of(row_base_ref[tr], 32), SY), :],
                src_buf.at[slot_i],
                sem.at[slot_i],
            )

        slot = jax.lax.rem(t, 2)

        @pl.when(t == 0)
        def _():
            band_dma(t, slot).start()

        @pl.when(t + 1 < F * nty)
        def _():
            band_dma(t + 1, jax.lax.rem(t + 1, 2)).start()

        band_dma(t, slot).wait()
        if stage == "dma":
            out_ref[0] = src_buf[slot, :TY, :Wd]
            return
        unpacked = _u8_unpack_bf16(src_buf[slot])  # (SY, W) bf16
        if stage == "extract":
            # consume the unpack (production-sized store; the cast is a
            # cheap VPU op, shared by every stage so it cancels in diffs)
            out_ref[0] = unpacked[:TY, :Wd].astype(jnp.int32).astype(
                jnp.uint8)
            return
        tmp = jnp.dot(wy_ref[0], unpacked,
                      preferred_element_type=jnp.float32)  # (TY, W)
        if stage == "ydot":
            out_ref[0] = jnp.clip(jnp.round(tmp[:, :Wd]), 0.0,
                                  255.0).astype(jnp.int32).astype(
                jnp.uint8)
            return
        if stage == "xpair":
            # stride-2 stencil x-pass on the VPU: parity split via
            # STRIDED REF LOADS (Mosaic allows strided VMEM loads for
            # 32-bit dtypes on last-dim-128-multiple refs — value-level
            # strided slices lower to a rejected gather) +
            # per-(parity, offset) weight tables + lane rolls for the
            # +-1 dst-cell offsets.  wx_ref rows: [o_prev (p1,q-1),
            # e (p0,q0), o (p1,q0), e_next (p0,q+1)]; out-of-range
            # boundary taps carry zero weights by construction, so roll
            # wrap-around is harmless.
            tmp_buf[:] = tmp
            e = tmp_buf[:, 0::2]      # (TY, Wd) cols 0,2,4,..
            o = tmp_buf[:, 1::2]      # cols 1,3,5,..
            o_prev = pltpu.roll(o, 1, axis=1)
            e_next = pltpu.roll(e, Wd - 1, axis=1)  # roll(-1)
            res = (o_prev * wx_ref[0] + e * wx_ref[1]
                   + o * wx_ref[2] + e_next * wx_ref[3])
            out_ref[0] = jnp.clip(jnp.round(res), 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)
            return
        if stage == "xstore":
            # 15 fragmented (TY, TX) stores of tmp slices, NO dots —
            # isolates store fragmentation from the MXU work
            for c in range(ntx):
                seg = tmp[:, col_base[c]: col_base[c] + TX]
                out_ref[0, :, c * TX: (c + 1) * TX] = jnp.clip(
                    jnp.round(seg), 0.0, 255.0).astype(
                    jnp.int32).astype(jnp.uint8)
            return
        if stage == "xdot1":
            # the 15 x dots but ONE concatenated (TY, ntx*TX) store
            blks = []
            for c in range(ntx):
                seg = tmp[:, col_base[c]: col_base[c] + SX]
                blks.append(jnp.dot(seg, wx_ref[c],
                                    preferred_element_type=jnp.float32))
            res = jnp.concatenate(blks, axis=1)
            out_ref[0] = jnp.clip(jnp.round(res), 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)
            return
        # stage == "xdot": production x-MXU passes, tmp as a VALUE with
        # static 128-aligned col bases
        for c in range(ntx):
            seg = tmp[:, col_base[c]: col_base[c] + SX]
            blk = jnp.dot(seg, wx_ref[c],
                          preferred_element_type=jnp.float32)
            out_ref[0, :, c * TX: (c + 1) * TX] = jnp.clip(
                jnp.round(blk), 0.0, 255.0).astype(jnp.int32).astype(
                jnp.uint8)

    if stage == "xdot":
        wx_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # (ntx, SX, TX)
    elif stage == "xpair":
        wx_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # (2, Wd)
    else:
        wx_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # dummy (1, 8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(F * nty,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, TY, SY),
                         lambda t, *_: (jax.lax.rem(t, nty), 0, 0),
                         memory_space=pltpu.VMEM),
            wx_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, TY, Wd),
            lambda t, *_: (jax.lax.div(t, nty), jax.lax.rem(t, nty), 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, SY, W), jnp.uint8),
            pltpu.VMEM((TY, W), jnp.float32),   # tmp ref (xpair strides)
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, nty * TY, Wd), jnp.uint8),
        interpret=interpret,
    )


def _stage_tables(stage, interpret=False):

    op, row_base, wy_perm, SY, col_base, wx_blocks, SX = _geometry(
        interpret)
    nty = wy_perm.shape[0]
    if stage in ("xdot", "xdot1", "xstore"):
        return (row_base, wy_perm, SY, nty, SX, wx_blocks.shape[0],
                tuple(int(c) for c in col_base), jnp.asarray(wx_blocks))
    if stage == "xpair":
        # (parity, dst-offset) weight tables from the band: tap j of dst
        # col w hits src col xs[w]+j = 2*(w+q) + p -> weight lands in
        # table row {(1,-1): 0, (0,0): 1, (1,0): 2, (0,1): 3}
        xs = np.asarray(op.wx.start).astype(np.int64)
        xw = np.asarray(op.wx.weights, np.float32)
        tab = np.zeros((4, Wd), np.float32)
        rowmap = {(1, -1): 0, (0, 0): 1, (1, 0): 2, (0, 1): 3}
        for w_i in range(Wd):
            for j in range(xw.shape[1]):
                wt = float(xw[w_i, j])
                if wt == 0.0:
                    continue
                col = int(xs[w_i]) + j
                p, q = col % 2, col // 2 - w_i
                assert (p, q) in rowmap, (w_i, j, col, p, q)
                tab[rowmap[(p, q)], w_i] += wt
        return (row_base, wy_perm, SY, nty, 0, 0, (),
                jnp.asarray(tab))
    return (row_base, wy_perm, SY, nty, 0, 0, (),
            jnp.zeros((1, 8), jnp.float32))


def _stage_exp(batch, stage):
    row_base, wy_perm, SY, nty, SX, ntx, cb, wx = _stage_tables(stage)
    probe = _build_stage_probe(batch, SY, nty, stage, SX, ntx, cb)
    rb = jnp.asarray(row_base)
    wy = jnp.asarray(wy_perm)
    frames, warm = _frames(8, batch)
    dt = timed_scan(lambda f, r, w, x: probe(r, f, w, x), frames, warm,
                    consts=(rb, wy, wx))
    return batch * H * W / dt / 1e9, dt / batch


def exp_full(batch):
    from aainterp.ops.pallas_apply import apply_separable_pallas

    op, *_ = _geometry()
    ys = jnp.asarray(op.wy.start)
    yw = jnp.asarray(np.asarray(op.wy.weights, np.float32))
    xs = jnp.asarray(op.wx.start)
    xw = jnp.asarray(np.asarray(op.wx.weights, np.float32))
    frames, warm = _frames(8, batch)
    dt = timed_scan(
        lambda f: apply_separable_pallas(f, ys, yw, xs, xw,
                                         tile_y=TY, tile_x=TX),
        frames, warm)
    return batch * H * W / dt / 1e9, dt / batch


def check_stages():
    """Interpret-mode correctness: the ydot stage equals the reference
    y-pass (the unpack permutation must cancel against the wy perm)."""
    _, row_base, wy_perm, SY, *_ = _geometry(interpret=True)
    nty = wy_perm.shape[0]
    probe = _build_stage_probe(1, SY, nty, "ydot", interpret=True)
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.integers(0, 256, (1, H, W), dtype=np.uint8))
    got = np.asarray(probe(jnp.asarray(row_base), f, jnp.asarray(wy_perm),
                           jnp.zeros((1, 8), jnp.float32)))

    from aainterp.grids import make_grid_spec
    from aainterp.ops.weights import separable_operator

    spec = make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec, mode="exact")
    ys = np.asarray(op.wy.start)
    yw = np.asarray(op.wy.weights, np.float64)
    x64 = np.asarray(f[0], np.float64)
    ref = np.zeros((1080, W))
    for r in range(1080):
        s = ys[r]
        ref[r] = (yw[r][:, None] * x64[s:s + yw.shape[1]]).sum(axis=0)
    want = np.clip(np.round(ref[:, :Wd]), 0, 255).astype(np.int32)
    err = np.abs(got[0, :1080].astype(np.int32) - want)
    print(f"check ydot (interpret): max abs err {err.max()}")
    assert err.max() <= 1, err.max()

    # xpair: the aligned even/odd x-pass must match the full u8 apply
    from aainterp.ops.apply import apply_separable_banded
    from aainterp.ops.pallas_apply import apply_separable_pallas

    rb2, wy2, SY2, nty2, _, _, _, wx01 = _stage_tables(
        "xpair", interpret=True)
    probe2 = _build_stage_probe(1, SY2, nty2, "xpair", 0, 0, (),
                                interpret=True)
    got2 = np.asarray(probe2(jnp.asarray(rb2), f, jnp.asarray(wy2),
                             wx01))
    ref_full = apply_separable_banded(
        f.astype(jnp.float32), jnp.asarray(np.asarray(op.wy.start)),
        jnp.asarray(np.asarray(op.wy.weights, np.float32)),
        jnp.asarray(np.asarray(op.wx.start)),
        jnp.asarray(np.asarray(op.wx.weights, np.float32)))
    want2 = np.clip(np.round(np.asarray(ref_full)), 0,
                    255).astype(np.int32)
    err2 = np.abs(got2[0, :1080].astype(np.int32) - want2)
    print(f"check xpair (interpret): max abs err {err2.max()}")
    assert err2.max() <= 1, err2.max()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="all",
                    choices=("dma", "extract", "ydot", "xdot", "xdot1",
                             "xstore", "xpair", "full", "all"))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--check", action="store_true",
                    help="interpret-mode stage correctness (CPU)")
    args = ap.parse_args()

    if args.check:
        jax.config.update("jax_platforms", "cpu")
        check_stages()
        return

    exps = (("dma", "extract", "ydot", "xdot", "xpair", "full")
            if args.exp == "all" else (args.exp,))
    for name in exps:
        if name == "full":
            g, per = exp_full(args.batch)
        else:
            g, per = _stage_exp(args.batch, name)
        print(f"{name}: {g:.2f} Gpixel/s ({per * 1e6:.1f} us/frame)")


if __name__ == "__main__":
    main()
