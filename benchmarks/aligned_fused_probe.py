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
def _build_fused(F, my, mx, nty, ntx, Wp, interpret=False):
    SY = my * TY
    SXa = mx * TX  # aligned x-block span (static, 128-aligned for mx*TX)

    def kernel(src_ref, wy_ref, wx_ref, out_ref, src_buf, sem):
        t = pl.program_id(0)

        def band_dma(step, slot_i):
            tr = jax.lax.rem(step, nty)
            fr = jax.lax.div(step, nty)
            return pltpu.make_async_copy(
                src_ref.at[fr, pl.ds(tr * SY, SY), :],
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
        tmp = jnp.dot(wy_ref[0], src_buf[slot],
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)  # (TY, W) value
        if Wp > W:
            tmp = jnp.pad(tmp, ((0, 0), (0, Wp - W)))
        for c in range(ntx):
            seg = tmp[:, c * SXa: (c + 1) * SXa]  # static 128-aligned
            out_ref[0, :, c * TX: (c + 1) * TX] = jnp.dot(
                seg, wx_ref[c], precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(F * nty,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # src (HBM)
            pl.BlockSpec((1, TY, SY),
                         lambda t, *_: (jax.lax.rem(t, nty), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),         # wx blocks
        ],
        out_specs=pl.BlockSpec(
            (1, TY, ntx * TX),
            lambda t, *_: (jax.lax.div(t, nty), jax.lax.rem(t, nty), 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, SY, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, nty * TY, ntx * TX),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * F * (Hd * SY * W + Hd * SXa * ntx * TX),
            bytes_accessed=F * (H * W + Hd * Wd) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )


def _fused_tables(yp, xp):
    """Block-diagonal dense blocks of the aligned plans (zero waste on
    live rows; the (TY, SY) y block is 1/TY dense — MXU FLOPs hide
    under the DMA stream at this geometry)."""
    my, mx = int(yp["m"]), int(xp["m"])
    wky = np.asarray(yp["wk"], np.float32)   # (Hd, my)
    wkx = np.asarray(xp["wk"], np.float32)   # (Wd, mx)
    nty = Hd // TY
    SY = my * TY
    wy_blocks = np.zeros((nty, TY, SY), np.float32)
    for t in range(nty):
        for r in range(TY):
            wy_blocks[t, r, r * my: (r + 1) * my] = wky[t * TY + r]
    ntx = _rup(Wd, TX) // TX
    SXa = mx * TX
    wx_blocks = np.zeros((ntx, SXa, TX), np.float32)
    for c in range(ntx):
        for r in range(min(TX, Wd - c * TX)):
            wx_blocks[c, r * mx: (r + 1) * mx, r] = wkx[c * TX + r]
    Wp = ntx * SXa
    return my, mx, nty, ntx, SY, Wp, wy_blocks, wx_blocks


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
    my, mx, nty, ntx, SY, Wp, wyb, wxb = _fused_tables(yp, xp)
    probe = _build_fused(batch, my, mx, nty, ntx, Wp, interpret)
    wy = jnp.asarray(wyb)
    wx = jnp.asarray(wxb)
    frames, warm = _frames(8, batch)
    dt = timed_scan(lambda f, a, b: probe(f, a, b)[..., :Wd],
                    frames, warm, consts=(wy, wx))
    return batch * H * W / dt / 1e9, dt / batch


def check():
    from aainterp.ops.apply import apply_separable_aligned

    yp, xp = _geometry()
    my, mx, nty, ntx, SY, Wp, wyb, wxb = _fused_tables(yp, xp)
    probe = _build_fused(1, my, mx, nty, ntx, Wp, interpret=True)
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.uniform(200, 300, (1, H, W)).astype(np.float32))
    got = np.asarray(probe(f, jnp.asarray(wyb),
                           jnp.asarray(wxb)))[:, :, :Wd]
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
