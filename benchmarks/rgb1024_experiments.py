"""rgb1024 (config 2) engine decomposition on the honest harness.

The tile_y sweep (rgb1024_tile_sweep.py) showed a ~5.1 us/frame plateau
independent of program count and y-pass K-tiles.  These probes time the
pipeline's stages in isolation at the production geometry (TY=128,
SY=328, nty=4, ntx=4) to locate the binding constraint:

  copy   pure HBM->VMEM->HBM copy of the (24, 1024, 1024) bf16 frames
         at (TY, W) tiles — the bandwidth ceiling for this row length
  dma    the band DMAs only (same double-buffered (SY, W) fetch schedule
         as production) + a (TY, W) slice store
  ypass  dma + the densified y matmul, storing the (TY, W) f32->bf16 tmp
  xonly  x matmuls only from a pre-reduced (nty*TY, W) input
  full   production apply_separable_pallas (reference point)

Run on the real TPU: python benchmarks/rgb1024_experiments.py --exp dma
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

H = W = 1024
TY = TX = 128


def _geometry():
    from aainterp.grids import make_grid_spec
    from aainterp.ops.pallas_apply import _densify_row_band
    from aainterp.ops.weights import separable_operator

    spec = make_grid_spec((H, W), 150.0, 60.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec, mode="exact")
    ys = np.asarray(op.wy.start)
    yw = np.asarray(op.wy.weights, np.float32)
    xs = np.asarray(op.wx.start)
    xw = np.asarray(op.wx.weights, np.float32)
    row_base, wy_blocks, SY = _densify_row_band(ys, yw, H, TY, align=8)
    col_base, wx_t, SX = _densify_row_band(xs, xw, W, TX, align=128)
    wx_blocks = np.ascontiguousarray(np.swapaxes(wx_t, 1, 2))
    return op, row_base, wy_blocks, SY, col_base, wx_blocks, SX


def _frames(K, B, dtype, seed=0):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.uniform(0, 1, (K, B, H, W)).astype(np.float32),
                    dtype=dtype)
    b = jnp.asarray(rng.uniform(0, 1, (K, B, H, W)).astype(np.float32),
                    dtype=dtype)
    return a, b


@functools.lru_cache(maxsize=8)
def _build_copy(F, dtype_name):
    dtype = jnp.dtype(dtype_name)
    nt = H // TY

    def kernel(src_ref, out_ref):
        out_ref[0] = src_ref[0]

    return pl.pallas_call(
        kernel,
        grid=(F * nt,),
        in_specs=[pl.BlockSpec(
            (1, TY, W), lambda t: (jax.lax.div(t, nt), jax.lax.rem(t, nt), 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, TY, W), lambda t: (jax.lax.div(t, nt), jax.lax.rem(t, nt), 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, nt * TY, W), dtype),
    )


@functools.lru_cache(maxsize=8)
def _build_band_probe(F, SY, nty, dtype_name, with_y):
    """Band-DMA schedule of the production kernel; optional y matmul."""
    dtype = jnp.dtype(dtype_name)

    def kernel(row_base_ref, src_ref, wy_ref, out_ref, src_buf, sem):
        t = pl.program_id(0)

        def band_dma(step, slot_i):
            tr = jax.lax.rem(step, nty)
            fr = jax.lax.div(step, nty)
            return pltpu.make_async_copy(
                src_ref.at[fr, pl.ds(
                    pl.multiple_of(row_base_ref[tr], 8), SY), :],
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
        if with_y:
            out_ref[0] = jnp.dot(
                wy_ref[0], src_buf[slot].astype(jnp.float32),
                preferred_element_type=jnp.float32).astype(dtype)
        else:
            out_ref[0] = src_buf[slot, :TY, :].astype(dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(F * nty,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, TY, SY),
                         lambda t, *_: (jax.lax.rem(t, nty), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TY, W),
            lambda t, *_: (jax.lax.div(t, nty), jax.lax.rem(t, nty), 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, SY, W), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, nty * TY, W), dtype),
    )


@functools.lru_cache(maxsize=8)
def _build_xonly(F, nty, ntx, SX, dtype_name):
    dtype = jnp.dtype(dtype_name)

    def kernel(col_base_ref, tmp_ref, wx_ref, out_ref):
        for c in range(ntx):
            cb = pl.multiple_of(col_base_ref[c], 128)
            seg = tmp_ref[0, :, pl.ds(cb, SX)]  # dynamic ds on the REF
            out_ref[0, :, c * TX: (c + 1) * TX] = jnp.dot(
                seg.astype(jnp.float32), wx_ref[c],
                preferred_element_type=jnp.float32).astype(dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(F * nty,),
        in_specs=[
            pl.BlockSpec(
                (1, TY, W),
                lambda t, *_: (jax.lax.div(t, nty), jax.lax.rem(t, nty), 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TY, ntx * TX),
            lambda t, *_: (jax.lax.div(t, nty), jax.lax.rem(t, nty), 0),
            memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, nty * TY, ntx * TX), dtype),
    )


@functools.lru_cache(maxsize=8)
def _build_full_dense_x(F, SY, nty, Wd_pad, dtype_name):
    """Full pipeline prototype with a DENSE x operator: the per-col-tile
    dynamic lane slices of tmp (suspected relayout copies) are replaced
    by one (TY, W) @ (W, Wd_pad) matmul — at W=1024 the dense x weights
    are only W*Wd_pad*2B = 1 MB of VMEM."""
    dtype = jnp.dtype(dtype_name)

    def kernel(row_base_ref, src_ref, wy_ref, wx_ref, out_ref, src_buf,
               sem):
        t = pl.program_id(0)

        def band_dma(step, slot_i):
            tr = jax.lax.rem(step, nty)
            fr = jax.lax.div(step, nty)
            return pltpu.make_async_copy(
                src_ref.at[fr, pl.ds(
                    pl.multiple_of(row_base_ref[tr], 8), SY), :],
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
        tmp = jnp.dot(wy_ref[0], src_buf[slot].astype(jnp.float32),
                      preferred_element_type=jnp.float32)
        out_ref[0] = jnp.dot(tmp, wx_ref[...].astype(jnp.float32),
                             preferred_element_type=jnp.float32
                             ).astype(dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(F * nty,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, TY, SY),
                         lambda t, *_: (jax.lax.rem(t, nty), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),       # dense wx (W, Wd_pad)
        ],
        out_specs=pl.BlockSpec(
            (1, TY, Wd_pad),
            lambda t, *_: (jax.lax.div(t, nty), jax.lax.rem(t, nty), 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, SY, W), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, nty * TY, Wd_pad), dtype),
    )


def exp_fulldense(batch, dtype):
    op, row_base, wy_blocks, SY, col_base, wx_blocks, SX = _geometry()
    nty = wy_blocks.shape[0]
    Wd = int(np.asarray(op.wx.weights).shape[0])
    Wd_pad = ((Wd + 127) // 128) * 128
    xs = np.asarray(op.wx.start)
    xw = np.asarray(op.wx.weights, np.float32)
    kx = xw.shape[1]
    wx_dense = np.zeros((W, Wd_pad), np.float32)
    for j in range(Wd):
        wx_dense[xs[j]: xs[j] + kx, j] = xw[j]
    B = batch * 3
    probe = _build_full_dense_x(B, SY, nty, Wd_pad, jnp.dtype(dtype).name)
    rb = jnp.asarray(row_base)
    wy = jnp.asarray(wy_blocks)
    wx = jnp.asarray(wx_dense, dtype=dtype)  # bf16 operands: DEFAULT
    # precision truncates f32 to bf16 in the MXU anyway for bf16 pixels
    frames, warm = _frames(8, B, dtype)
    dt = timed_scan(lambda f, r, wyc, wxc: probe(r, f, wyc, wxc),
                    frames, warm, consts=(rb, wy, wx))
    return B * H * W / dt / 1e9, dt / B


def exp_copy(batch, dtype):
    B = batch * 3
    copy = _build_copy(B, jnp.dtype(dtype).name)
    frames, warm = _frames(8, B, dtype)
    dt = timed_scan(lambda f: copy(f), frames, warm)
    return B * H * W / dt / 1e9, dt / B


def _band_exp(batch, dtype, with_y):
    op, row_base, wy_blocks, SY, *_ = _geometry()
    nty = wy_blocks.shape[0]
    probe = _build_band_probe(batch * 3, SY, nty, jnp.dtype(dtype).name,
                              with_y)
    rb = jnp.asarray(row_base)
    wy = jnp.asarray(wy_blocks)
    frames, warm = _frames(8, batch * 3, dtype)
    dt = timed_scan(lambda f, r, w: probe(r, f, w), frames, warm,
                    consts=(rb, wy))
    return batch * 3 * H * W / dt / 1e9, dt / (batch * 3)


def exp_dma(batch, dtype):
    return _band_exp(batch, dtype, with_y=False)


def exp_ypass(batch, dtype):
    return _band_exp(batch, dtype, with_y=True)


def exp_xonly(batch, dtype):
    op, row_base, wy_blocks, SY, col_base, wx_blocks, SX = _geometry()
    nty, ntx = wy_blocks.shape[0], wx_blocks.shape[0]
    B = batch * 3
    probe = _build_xonly(B, nty, ntx, SX, jnp.dtype(dtype).name)
    cb = jnp.asarray(col_base)
    wx = jnp.asarray(wx_blocks)
    rng = np.random.default_rng(1)
    tmp = jnp.asarray(rng.uniform(0, 1, (8, B, nty * TY, W))
                      .astype(np.float32), dtype=dtype)
    tmpw = jnp.asarray(rng.uniform(0, 1, (8, B, nty * TY, W))
                       .astype(np.float32), dtype=dtype)
    dt = timed_scan(lambda f, c, w: probe(c, f, w), tmp, tmpw,
                    consts=(cb, wx))
    return B * H * W / dt / 1e9, dt / B


def exp_full(batch, dtype):
    from aainterp.ops.pallas_apply import apply_separable_pallas

    op, *_ = _geometry()
    ys = jnp.asarray(op.wy.start)
    yw = jnp.asarray(op.wy.weights, jnp.float32)
    xs = jnp.asarray(op.wx.start)
    xw = jnp.asarray(op.wx.weights, jnp.float32)
    frames, warm = _frames(8, batch * 3, dtype)
    dt = timed_scan(
        lambda f: apply_separable_pallas(f, ys, yw, xs, xw), frames, warm)
    return batch * 3 * H * W / dt / 1e9, dt / (batch * 3)


EXPS = {
    "copy": exp_copy,
    "dma": exp_dma,
    "ypass": exp_ypass,
    "xonly": exp_xonly,
    "fulldense": exp_fulldense,
    "full": exp_full,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True, choices=sorted(EXPS))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    g, per_frame = EXPS[args.exp](args.batch, jnp.dtype(args.dtype))
    print(f"{args.exp}: {g:.2f} Gpixel/s  ({per_frame * 1e6:.1f} us/frame)")


if __name__ == "__main__":
    main()
