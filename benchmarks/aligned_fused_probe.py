"""Regrid aligned path: fuse away the (Hd, W) f32 intermediate.

ROADMAP r4 candidate 1.  The aligned integer-ratio apply
(ops/apply.apply_separable_aligned) measures 42.1 us/frame at the
config-5 regrid (f32 (1800, 3600) -> (180, 360)) against a 33.6 us HBM
read floor; the gap is the y->x intermediate round trip ((Hd, W) f32 =
~2.6 MB r+w ~ 6.7 us/frame).  Variants:

  prod    apply_separable_aligned (reference point: reshape + VPU sums,
          intermediate materialised between the two stages)
  einsum  single-expression double contraction — does XLA fuse through
          the (Hd, my, Wd, mx) reshape without materialising?
  pallas  fused full-width kernel: per (frame, row-tile) DMA of the
          (SY = my*TY, W) source block, aligned block-diagonal y dot
          (TY, SY) x (SY, W) in VMEM, zero-pad to the 128-aligned
          width as a VALUE, per-col-tile x dots (TY, mx*TX) x
          (mx*TX, TX) — the intermediate never touches HBM.  The
          aligned structure makes cb = mx*TX*c STATIC and 128-aligned,
          so the value slices cost no lane relayout (the non-aligned
          static-slice variant measured slower, ops/pallas_apply.py).
          HIGHEST-precision dots: measured 1.9e-7 on this config
          (benchmarks/regrid_precision.py), same class as the VPU
          path's 1.8e-7.

Run on the real TPU:
  python benchmarks/aligned_fused_probe.py --exp all
Interpret-mode correctness: --check (CPU).

MEASURED OUTCOME (2026-08-20, v5e): CLOSED NEGATIVE.
  prod    152.99 Gpixel/s (42.4 us/frame) — reproduces the recorded 153.8
  einsum  6.20 Gpixel/s (1045.8 us/frame) — XLA does NOT fuse the double
          contraction through the reshape; it materialises something
          catastrophically larger.  Dead.
  pallas  cannot be built for W=3600 on this backend: EVERY DMA whose
          row dim is sliced requires the last dim to be 128-ALIGNED —
          both spellings measured/compiled dead:
            * sliced col blocks: the aligned 1280-col blocks are
              128-aligned, but W=3600 = 28*128+16 means NO aligned
              base+length grid reaches the last 16 columns (the
              base/span fixpoint diverges, same phenomenon
              _densify_row_band's give-up branch handles);
            * full-width rows: "Slice shape along dimension 1 must be
              aligned to tiling (128), but is 3600" — even an UNSLICED
              last dim must be 128-aligned when rows are sliced.
          Padding the source to 3712 first (what apply_separable_
          pallas_2d does) is a full HBM copy: ~2*26 MB r+w ~ 60 us —
          10x the 6.7 us intermediate-round-trip prize.  Accounting
          negative; the 1-D reshape trick (flat views keep 128-aligned
          lengths) dies on the 1-D->2-D VMEM relayout.
CLOSURE: the aligned XLA path at 42.4 us/frame (1.26x its 33.6 us read
floor) is the production route for unaligned-W aligned-ratio regrids;
the fused kernel remains viable only for 128-aligned widths, where the
separable Pallas kernel already sits at 94% of the HBM bound.
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


def _geometry():
    from aainterp.ops.apply import aligned_axis_plan
    from aainterp.regrid import LatLonGrid, conservative_regrid_operator

    src, dst = LatLonGrid(1800, 3600), LatLonGrid(180, 360)
    by, bx = conservative_regrid_operator(src, dst)
    yp = aligned_axis_plan(np.asarray(by.start),
                           np.asarray(by.weights, np.float32), by.n_src)
    xp = aligned_axis_plan(np.asarray(bx.start),
                           np.asarray(bx.weights, np.float32), bx.n_src)
    assert yp is not None and xp is not None and yp["c0"] == 0 \
        and xp["c0"] == 0
    return yp, xp


H, W = 1800, 3600
Hd, Wd = 180, 360
TY = 36          # Hd = 5 * 36; SY = my*TY = 360 -> 5.2 MB f32 block
TX = 128


def _rup(x, m):
    return -(-x // m) * m


@functools.lru_cache(maxsize=4)
def _build_fused(F, my, mx, nty, ntx, interpret=False):
    """Fused aligned regrid: one (row-block, col-block) program per
    (36 dst rows x 128 dst cols), reading its (360, 1280) source block
    ONCE — the aligned structure makes every block slice 128-aligned
    (cols 1280*c) so no padding of the 3600-wide source is ever needed,
    and the y->x intermediate lives entirely in registers.  Out rows pad
    36 -> 40 (Mosaic block-shape 8-divisibility); the caller crops.
    """
    SYb = my * TY            # 360 source rows per block
    SXb = mx * TX            # 1280 source cols per block
    TYp = _rup(TY, 8)        # 40 padded out rows

    def kernel(src_ref, wy_ref, wx_ref, out_ref, src_buf, sem):
        t = pl.program_id(0)
        npr = nty * ntx

        def blk_dma(step, slot_i):
            fr = jax.lax.div(step, npr)
            r = jax.lax.rem(step, npr)
            ty = jax.lax.div(r, ntx)
            tx = jax.lax.rem(r, ntx)
            return pltpu.make_async_copy(
                src_ref.at[fr, pl.ds(ty * SYb, SYb),
                           pl.ds(pl.multiple_of(tx * SXb, 128), SXb)],
                src_buf.at[slot_i],
                sem.at[slot_i],
            )

        slot = jax.lax.rem(t, 2)

        @pl.when(t == 0)
        def _():
            blk_dma(t, slot).start()

        @pl.when(t + 1 < F * npr)
        def _():
            blk_dma(t + 1, jax.lax.rem(t + 1, 2)).start()

        blk_dma(t, slot).wait()
        tmp = jnp.dot(wy_ref[0, 0], src_buf[slot],
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)  # (TYp, SXb)
        out_ref[0, 0] = jnp.dot(
            tmp, wx_ref[0], precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)            # (TYp, TX)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(F * nty * ntx,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # src (HBM)
            pl.BlockSpec(
                (1, 1, TYp, SYb),
                lambda t, *_: (
                    jax.lax.div(jax.lax.rem(t, nty * ntx), ntx), 0, 0, 0),
                memory_space=pltpu.VMEM),                  # wy blocks
            pl.BlockSpec(
                (1, SXb, TX),
                lambda t, *_: (jax.lax.rem(t, ntx), 0, 0),
                memory_space=pltpu.VMEM),                  # wx blocks
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TYp, TX),
            lambda t, *_: (
                jax.lax.div(t, nty * ntx),
                jax.lax.div(jax.lax.rem(t, nty * ntx), ntx) * 0
                + jax.lax.rem(t, nty * ntx), 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, SYb, SXb), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, nty * ntx, TYp, TX),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * F * nty * ntx * (TYp * SYb * SXb + TYp * SXb * TX),
            bytes_accessed=F * (H * W + Hd * Wd) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )


def _fused_finish(out, nty, ntx):
    # (F, nty*ntx, TYp, TX) -> (F, Hd, Wd): crop pad rows, stitch tiles
    F = out.shape[0]
    o = out.reshape(F, nty, ntx, -1, TX)[:, :, :, :TY, :]
    return jnp.swapaxes(o, 2, 3).reshape(F, nty * TY, ntx * TX)[
        :, :Hd, :Wd]


def _fused_tables(yp, xp):
    """Per-(row-block, col-block) dense blocks of the aligned plans.

    wy blocks are (nty, 1, TYp, my*TY) block-diagonal (pad rows zero);
    wx blocks are (ntx, mx*TX, TX) block-diagonal."""
    my, mx = int(yp["m"]), int(xp["m"])
    wky = np.asarray(yp["wk"], np.float32)   # (Hd, my)
    wkx = np.asarray(xp["wk"], np.float32)   # (Wd, mx)
    nty = Hd // TY
    ntx = _rup(Wd, TX) // TX
    TYp = _rup(TY, 8)
    wy_blocks = np.zeros((nty, 1, TYp, my * TY), np.float32)
    for t in range(nty):
        for r in range(TY):
            wy_blocks[t, 0, r, r * my: (r + 1) * my] = wky[t * TY + r]
    wx_blocks = np.zeros((ntx, mx * TX, TX), np.float32)
    for c in range(ntx):
        for r in range(min(TX, Wd - c * TX)):
            wx_blocks[c, r * mx: (r + 1) * mx, r] = wkx[c * TX + r]
    return my, mx, nty, ntx, wy_blocks, wx_blocks


def _frames(K, B, seed=0):
    rng = np.random.default_rng(seed)

    def mk():
        return jnp.asarray(rng.uniform(200, 300, (K, B, H, W))
                           .astype(np.float32))

    return mk(), mk()


def exp_prod(batch):
    from aainterp.ops.apply import apply_separable_aligned

    yp, xp = _geometry()
    frames, warm = _frames(8, batch)
    dt = timed_scan(lambda f: apply_separable_aligned(f, yp, xp),
                    frames, warm)
    return batch * H * W / dt / 1e9, dt / batch


def exp_einsum(batch):
    yp, xp = _geometry()
    my, mx = int(yp["m"]), int(xp["m"])
    wy = jnp.asarray(yp["wk"], jnp.float32)
    wx = jnp.asarray(xp["wk"], jnp.float32)

    def fn(f):
        q4 = f.reshape(f.shape[:-2] + (Hd, my, Wd, mx))
        return jnp.einsum("...hawb,ha,wb->...hw", q4, wy, wx)

    frames, warm = _frames(8, batch)
    dt = timed_scan(fn, frames, warm)
    return batch * H * W / dt / 1e9, dt / batch


def exp_pallas(batch, interpret=False):
    yp, xp = _geometry()
    my, mx, nty, ntx, wyb, wxb = _fused_tables(yp, xp)
    probe = _build_fused(batch, my, mx, nty, ntx, interpret)
    wy = jnp.asarray(wyb)
    wx = jnp.asarray(wxb)
    frames, warm = _frames(8, batch)
    dt = timed_scan(
        lambda f, a, b: _fused_finish(probe(f, a, b), nty, ntx),
        frames, warm, consts=(wy, wx))
    return batch * H * W / dt / 1e9, dt / batch


def check():
    from aainterp.ops.apply import apply_separable_aligned

    yp, xp = _geometry()
    my, mx, nty, ntx, wyb, wxb = _fused_tables(yp, xp)
    probe = _build_fused(1, my, mx, nty, ntx, interpret=True)
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.uniform(200, 300, (1, H, W)).astype(np.float32))
    got = np.asarray(_fused_finish(probe(f, jnp.asarray(wyb),
                                         jnp.asarray(wxb)), nty, ntx))
    want = np.asarray(apply_separable_aligned(f, yp, xp))
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-6)
    print(f"check fused (interpret): max rel err {rel.max():.2e}")
    assert rel.max() < 1e-5, rel.max()

    # einsum variant too
    wy = jnp.asarray(yp["wk"], jnp.float32)
    wx = jnp.asarray(xp["wk"], jnp.float32)
    q4 = f.reshape((1, Hd, my, Wd, mx))
    got_e = np.asarray(jnp.einsum("fhawb,ha,wb->fhw", q4, wy, wx))
    rel_e = np.abs(got_e - want) / np.maximum(np.abs(want), 1e-6)
    print(f"check einsum: max rel err {rel_e.max():.2e}")
    assert rel_e.max() < 1e-5, rel_e.max()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="all",
                    choices=("prod", "einsum", "pallas", "all"))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    if args.check:
        jax.config.update("jax_platforms", "cpu")
        check()
        return

    exps = (("prod", "einsum", "pallas") if args.exp == "all"
            else (args.exp,))
    for name in exps:
        g, per = dict(prod=exp_prod, einsum=exp_einsum,
                      pallas=exp_pallas)[name](args.batch)
        print(f"{name}: {g:.2f} Gpixel/s ({per * 1e6:.1f} us/frame)")


if __name__ == "__main__":
    main()
