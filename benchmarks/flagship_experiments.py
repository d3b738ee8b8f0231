"""Flagship (config 1: 4K->1080p bf16) engine decomposition.

The copy-ceiling probe (copy_ceiling.py) measures reads and writes
OVERLAPPING on this chip (1.18 TB/s combined at (128,1024) bf16 tiles),
which puts the flagship's one-way read floor at ~16.6 MB / ~750 GB/s
= ~22 us/frame — below the production kernel's 26.7 us.  These probes
time the production pipeline's stages in isolation at the exact flagship
geometry (TY=120, SY=248, nty=9, ntx=15, SX=384) to locate the gap:

  dma    the band-DMA schedule only (double-buffered (SY, W) fetches) +
         a production-sized (TY, Wd) store — the kernel's traffic floor
  ypass  dma + the densified y matmul (store (TY, Wd) slice of tmp)
  full   production apply_separable_pallas (reference point)
  full3  production pipeline with a 3-slot band buffer (one extra DMA in
         flight) — tests whether 2-slot ping-pong stalls the read stream

Run on the real TPU: python benchmarks/flagship_experiments.py --exp dma
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
TY = 120  # apply_separable_pallas auto-picks 120 (1080 % 128 != 0)
TX = 128


def _geometry(row_align=8):
    from aainterp.grids import make_grid_spec
    from aainterp.ops.pallas_apply import _densify_row_band
    from aainterp.ops.weights import separable_operator

    spec = make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec, mode="exact")
    ys = np.asarray(op.wy.start)
    yw = np.asarray(op.wy.weights, np.float32)
    xs = np.asarray(op.wx.start)
    xw = np.asarray(op.wx.weights, np.float32)
    row_base, wy_blocks, SY = _densify_row_band(ys, yw, H, TY,
                                                align=row_align)
    col_base, wx_t, SX = _densify_row_band(xs, xw, W, TX, align=128)
    wx_blocks = np.ascontiguousarray(np.swapaxes(wx_t, 1, 2))
    return op, row_base, wy_blocks, SY, col_base, wx_blocks, SX


def _frames(K, B, dtype, seed=0):
    rng = np.random.default_rng(seed)

    def mk():
        x = rng.uniform(0, 1, (K, B, H, W))
        if jnp.dtype(dtype) == jnp.uint8:
            return jnp.asarray((x * 255.0).astype(np.uint8))
        return jnp.asarray(x.astype(np.float32), dtype=dtype)

    return mk(), mk()


@functools.lru_cache(maxsize=8)
def _build_band_probe(F, SY, nty, Wd, dtype_name, with_y):
    """Band-DMA schedule of the production kernel; optional y matmul.

    Unlike the rgb1024 probe this stores only a production-sized
    (TY, Wd) tile, so write traffic matches the real kernel's 4:1
    read:write ratio.
    """
    dtype = jnp.dtype(dtype_name)
    from aainterp.ops.pallas_apply import _as_f32
    row_hint = 32 if dtype == jnp.uint8 else 8

    def kernel(row_base_ref, src_ref, wy_ref, out_ref, src_buf, sem):
        t = pl.program_id(0)

        def band_dma(step, slot_i):
            tr = jax.lax.rem(step, nty)
            fr = jax.lax.div(step, nty)
            return pltpu.make_async_copy(
                src_ref.at[fr, pl.ds(
                    pl.multiple_of(row_base_ref[tr], row_hint), SY), :],
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
            tmp = jnp.dot(
                wy_ref[0], _as_f32(src_buf[slot]),
                preferred_element_type=jnp.float32)
            if dtype == jnp.uint8:
                out_ref[0] = tmp[:, :Wd].astype(jnp.int32).astype(dtype)
            else:
                out_ref[0] = tmp[:, :Wd].astype(dtype)
        else:
            out_ref[0] = src_buf[slot, :TY, :Wd].astype(dtype)

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
            (1, TY, Wd),
            lambda t, *_: (jax.lax.div(t, nty), jax.lax.rem(t, nty), 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, SY, W), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, nty * TY, Wd), dtype),
    )


@functools.lru_cache(maxsize=8)
def _build_full_nslot(F, SY, SX, nty, ntx, Wd, dtype_name, nslot,
                      interpret=False):
    """Production separable pipeline with an `nslot`-deep band buffer."""
    dtype = jnp.dtype(dtype_name)
    total = F * nty
    from aainterp.ops.pallas_apply import _as_f32
    row_hint = 32 if dtype == jnp.uint8 else 8

    def kernel(row_base_ref, col_base_ref, src_ref, wy_ref, wx_ref,
               out_ref, src_buf, tmp_buf, sem):
        t = pl.program_id(0)

        def band_dma(step, slot_i):
            tr = jax.lax.rem(step, nty)
            fr = jax.lax.div(step, nty)
            return pltpu.make_async_copy(
                src_ref.at[fr, pl.ds(
                    pl.multiple_of(row_base_ref[tr], row_hint), SY), :],
                src_buf.at[slot_i],
                sem.at[slot_i],
            )

        @pl.when(t == 0)
        def _():
            # fill the pipeline: slots 0 .. nslot-2
            for s in range(nslot - 1):
                if s == 0:
                    band_dma(t, 0).start()
                else:
                    @pl.when(t + s < total)
                    def _(s=s):
                        band_dma(t + s, s).start()

        ahead = nslot - 1

        @pl.when(t + ahead < total)
        def _():
            band_dma(t + ahead, jax.lax.rem(t + ahead, nslot)).start()

        slot = jax.lax.rem(t, nslot)
        band_dma(t, slot).wait()
        tmp_buf[:] = jnp.dot(wy_ref[0], _as_f32(src_buf[slot]),
                             preferred_element_type=jnp.float32)
        for c in range(ntx):
            cb = pl.multiple_of(col_base_ref[c], 128)
            seg = tmp_buf[:, pl.ds(cb, SX)]
            # match production: f32 operands at DEFAULT precision (the MXU
            # truncates to bf16 internally for bf16 pixel paths)
            blk = jnp.dot(seg, wx_ref[c],
                          preferred_element_type=jnp.float32)
            if dtype == jnp.uint8:
                blk = jnp.clip(jnp.round(blk), 0.0, 255.0).astype(jnp.int32)
            out_ref[0, :, c * TX: (c + 1) * TX] = blk.astype(dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(total,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, TY, SY),
                         lambda t, *_: (jax.lax.rem(t, nty), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TY, ntx * TX),
            lambda t, *_: (jax.lax.div(t, nty), jax.lax.rem(t, nty), 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nslot, SY, W), dtype),
            pltpu.VMEM((TY, W), jnp.float32),
            pltpu.SemaphoreType.DMA((nslot,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, nty * TY, ntx * TX), dtype),
        interpret=interpret,
    )


def check_nslot(nslot, dtype=jnp.bfloat16):
    """Interpret-mode equality of the nslot pipeline vs production (CPU)."""
    from aainterp.ops.pallas_apply import apply_separable_pallas

    op, row_base, wy_blocks, SY, col_base, wx_blocks, SX = _geometry()
    nty, ntx = wy_blocks.shape[0], wx_blocks.shape[0]
    probe = _build_full_nslot(1, SY, SX, nty, ntx, 1920,
                              jnp.dtype(dtype).name, nslot, interpret=True)
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.uniform(0, 1, (1, H, W)).astype(np.float32),
                    dtype=dtype)
    got = probe(jnp.asarray(row_base), jnp.asarray(col_base), f,
                jnp.asarray(wy_blocks), jnp.asarray(wx_blocks))[:, :1080, :]
    want = apply_separable_pallas(
        f, jnp.asarray(op.wy.start),
        jnp.asarray(np.asarray(op.wy.weights, np.float32)),
        jnp.asarray(op.wx.start),
        jnp.asarray(np.asarray(op.wx.weights, np.float32)),
        interpret=True)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    print(f"check nslot={nslot}: max abs err {err:.2e}")
    assert err < 1e-2, err


def _band_exp(batch, dtype, with_y):
    row_align = 32 if jnp.dtype(dtype) == jnp.uint8 else 8
    op, row_base, wy_blocks, SY, col_base, wx_blocks, SX = _geometry(
        row_align)
    nty = wy_blocks.shape[0]
    Wd = 1920
    probe = _build_band_probe(batch, SY, nty, Wd, jnp.dtype(dtype).name,
                              with_y)
    rb = jnp.asarray(row_base)
    wy = jnp.asarray(wy_blocks)
    frames, warm = _frames(8, batch, dtype)
    dt = timed_scan(lambda f, r, w: probe(r, f, w), frames, warm,
                    consts=(rb, wy))
    return batch * H * W / dt / 1e9, dt / batch


def exp_dma(batch, dtype):
    return _band_exp(batch, dtype, with_y=False)


def exp_ypass(batch, dtype):
    return _band_exp(batch, dtype, with_y=True)


def exp_full(batch, dtype):
    from aainterp.ops.pallas_apply import apply_separable_pallas

    op, *_ = _geometry()
    ys = jnp.asarray(op.wy.start)
    yw = jnp.asarray(op.wy.weights, jnp.float32)
    xs = jnp.asarray(op.wx.start)
    xw = jnp.asarray(op.wx.weights, jnp.float32)
    frames, warm = _frames(8, batch, dtype)
    dt = timed_scan(
        lambda f: apply_separable_pallas(f, ys, yw, xs, xw), frames, warm)
    return batch * H * W / dt / 1e9, dt / batch


def _full_nslot_exp(batch, dtype, nslot):
    row_align = 32 if jnp.dtype(dtype) == jnp.uint8 else 8
    op, row_base, wy_blocks, SY, col_base, wx_blocks, SX = _geometry(
        row_align)
    nty, ntx = wy_blocks.shape[0], wx_blocks.shape[0]
    probe = _build_full_nslot(batch, SY, SX, nty, ntx, 1920,
                              jnp.dtype(dtype).name, nslot)
    rb = jnp.asarray(row_base)
    cb = jnp.asarray(col_base)
    wy = jnp.asarray(wy_blocks)
    wx = jnp.asarray(wx_blocks)
    frames, warm = _frames(8, batch, dtype)
    dt = timed_scan(lambda f, r, c, a, b: probe(r, c, f, a, b),
                    frames, warm, consts=(rb, cb, wy, wx))
    return batch * H * W / dt / 1e9, dt / batch


def discover_u8_pack_order(rows, interpret=False):
    """Mosaic's u8 sublane packing, measured on the live backend.

    Returns perm (rows,) int: perm[b * rows//4 + q] = the u8 source row
    whose byte lands in byte lane b of i32 row q under
    ``pltpu.bitcast(u8_block, int32)``.  Interpret mode groups rows
    contiguously (4q+b); real Mosaic may interleave differently — this
    probe asks the backend instead of assuming.  Row indices are encoded
    over two lane columns (lo/hi byte) so rows > 256 work.
    """
    assert rows % 4 == 0

    def kern(x_ref, o_ref):
        o_ref[:] = pltpu.bitcast(x_ref[:], jnp.int32)

    r = np.arange(rows)
    x = np.zeros((rows, 128), dtype=np.uint8)
    x[:, 0] = r & 0xFF
    x[:, 1] = r >> 8
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows // 4, 128), jnp.int32),
        interpret=interpret,
    )(jnp.asarray(x))
    w = np.asarray(out)[:, :2].astype(np.int64) & 0xFFFFFFFF
    perm = np.zeros(rows, dtype=np.int64)
    for q in range(rows // 4):
        for b in range(4):
            lo = (w[q, 0] >> (8 * b)) & 0xFF
            hi = (w[q, 1] >> (8 * b)) & 0xFF
            perm[b * (rows // 4) + q] = lo | (hi << 8)
    assert sorted(perm.tolist()) == list(range(rows)), perm
    return perm


@functools.lru_cache(maxsize=8)
def _build_u8bitcast(F, SY, SX, nty, ntx, Wd, nslot=2, interpret=False):
    """u8 pipeline with the bitcast byte-split unpack.

    The production u8 path converts the whole (SY, W) u8 band via
    u8 -> i32 -> bf16 — the u8 -> i32 step is a (32,128) -> (8,128)
    sublane unpack relayout that dominates the u8 frame time.  Here the
    band is reinterpreted in place (pltpu.bitcast to i32 — free: vregs
    are already packed 4 rows per 32-bit word), the four byte lanes are
    extracted with lanewise shifts/masks (no relayout), and the row
    scramble this induces is folded into the wy operand host-side
    (wy columns permuted by discover_u8_pack_order).
    """
    dtype = jnp.uint8
    total = F * nty
    Q = SY // 4

    def kernel(row_base_ref, col_base_ref, src_ref, wy_ref, wx_ref,
               out_ref, src_buf, tmp_buf, sem):
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

        @pl.when(t == 0)
        def _():
            for s in range(nslot - 1):
                if s == 0:
                    band_dma(t, 0).start()
                else:
                    @pl.when(t + s < total)
                    def _(s=s):
                        band_dma(t + s, s).start()

        ahead = nslot - 1

        @pl.when(t + ahead < total)
        def _():
            band_dma(t + ahead, jax.lax.rem(t + ahead, nslot)).start()

        slot = jax.lax.rem(t, nslot)
        band_dma(t, slot).wait()
        word = pltpu.bitcast(src_buf[slot], jnp.uint32)  # (Q, W) packed
        parts = []
        for b in range(4):
            v = word if b == 0 else jax.lax.shift_right_logical(
                word, jnp.uint32(8 * b))
            if b < 3:
                v = v & jnp.uint32(0xFF)
            parts.append(pltpu.bitcast(v, jnp.int32).astype(jnp.bfloat16))
        xcat = jnp.concatenate(parts, axis=0)  # (SY, W) row-scrambled
        tmp_buf[:] = jnp.dot(wy_ref[0], xcat,
                             preferred_element_type=jnp.float32)
        for c in range(ntx):
            cb = pl.multiple_of(col_base_ref[c], 128)
            seg = tmp_buf[:, pl.ds(cb, SX)]
            blk = jnp.dot(seg, wx_ref[c],
                          preferred_element_type=jnp.float32)
            blk = jnp.clip(jnp.round(blk), 0.0, 255.0).astype(jnp.int32)
            out_ref[0, :, c * TX: (c + 1) * TX] = blk.astype(dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(total,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, TY, SY),
                         lambda t, *_: (jax.lax.rem(t, nty), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TY, ntx * TX),
            lambda t, *_: (jax.lax.div(t, nty), jax.lax.rem(t, nty), 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nslot, SY, W), dtype),
            pltpu.VMEM((TY, W), jnp.float32),
            pltpu.SemaphoreType.DMA((nslot,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, nty * TY, ntx * TX), dtype),
        interpret=interpret,
    )


def _u8bitcast_setup(interpret=False):
    # 32-aligned DMA bases but a tight 4-multiple span: H=2160 is not a
    # 32-multiple, so align=32 span rounding has no in-bounds solution
    # (the plain _geometry(32) call degenerates to span 2176 = whole
    # image, which is what made the production u8 route fall off the
    # 1-D kernel entirely)
    from aainterp.ops.pallas_apply import _densify_row_band

    op, _, _, _, col_base, wx_blocks, SX = _geometry(8)
    ys = np.asarray(op.wy.start)
    yw = np.asarray(op.wy.weights, np.float32)
    row_base, wy_blocks, SY = _densify_row_band(ys, yw, H, TY, align=32,
                                                span_align=8)
    if SY % 4 or SY > H:
        raise ValueError(f"u8bitcast needs SY % 4 == 0 and SY <= H, "
                         f"got SY={SY}")
    perm = discover_u8_pack_order(SY, interpret=interpret)
    wy_p = np.ascontiguousarray(wy_blocks[:, :, perm])
    return op, row_base, wy_p, SY, col_base, wx_blocks, SX


def exp_u8bitcast(batch, dtype):
    if jnp.dtype(dtype) != jnp.uint8:
        raise ValueError("u8bitcast is a uint8 experiment (--dtype uint8)")
    op, row_base, wy_p, SY, col_base, wx_blocks, SX = _u8bitcast_setup()
    nty, ntx = wy_p.shape[0], wx_blocks.shape[0]
    probe = _build_u8bitcast(batch, SY, SX, nty, ntx, 1920)
    rb = jnp.asarray(row_base)
    cb = jnp.asarray(col_base)
    wy = jnp.asarray(wy_p)
    wx = jnp.asarray(wx_blocks)
    frames, warm = _frames(8, batch, jnp.uint8)
    dt = timed_scan(lambda f, r, c, a, b: probe(r, c, f, a, b),
                    frames, warm, consts=(rb, cb, wy, wx))
    return batch * H * W / dt / 1e9, dt / batch


def check_u8bitcast():
    """Interpret-mode equality vs the production u8 apply (CPU)."""
    from aainterp.ops.pallas_apply import apply_separable_pallas

    op, row_base, wy_p, SY, col_base, wx_blocks, SX = _u8bitcast_setup(
        interpret=True)
    nty, ntx = wy_p.shape[0], wx_blocks.shape[0]
    probe = _build_u8bitcast(1, SY, SX, nty, ntx, 1920, interpret=True)
    rng = np.random.default_rng(7)
    f = jnp.asarray(rng.integers(0, 256, (1, H, W), dtype=np.uint8))
    got = probe(jnp.asarray(row_base), jnp.asarray(col_base), f,
                jnp.asarray(wy_p), jnp.asarray(wx_blocks))[:, :1080, :]
    want = apply_separable_pallas(
        f, jnp.asarray(op.wy.start),
        jnp.asarray(np.asarray(op.wy.weights, np.float32)),
        jnp.asarray(op.wx.start),
        jnp.asarray(np.asarray(op.wx.weights, np.float32)),
        interpret=True)
    err = float(jnp.max(jnp.abs(got.astype(jnp.int32)
                                - want.astype(jnp.int32))))
    print(f"check u8bitcast: max abs err {err} gray")
    assert err <= 1, err


@functools.lru_cache(maxsize=8)
def _build_u8chunk(F, SY, SX, nty, ntx, Wd, n_chunks, nslot=2,
                   interpret=False):
    """u8 bitcast pipeline with the unpack CHUNKED into the y matmul.

    The monolithic u8bitcast kernel extracts the whole (SY, W) band then
    runs one dot — the extract's VPU work serialises before the MXU
    (the full band is the dot's operand).  Chunking the packed word rows
    into n_chunks independent (extract -> partial-dot) pairs lets Mosaic
    overlap extract(c+1) with dot(c).  wy columns are ordered per chunk
    host-side (see _u8chunk_setup).
    """
    dtype = jnp.uint8
    total = F * nty
    Q = SY // 4
    assert Q % n_chunks == 0
    cq = Q // n_chunks

    def kernel(row_base_ref, col_base_ref, src_ref, wy_ref, wx_ref,
               out_ref, src_buf, tmp_buf, sem):
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

        @pl.when(t == 0)
        def _():
            for s in range(nslot - 1):
                if s == 0:
                    band_dma(t, 0).start()
                else:
                    @pl.when(t + s < total)
                    def _(s=s):
                        band_dma(t + s, s).start()

        ahead = nslot - 1

        @pl.when(t + ahead < total)
        def _():
            band_dma(t + ahead, jax.lax.rem(t + ahead, nslot)).start()

        slot = jax.lax.rem(t, nslot)
        band_dma(t, slot).wait()
        word = pltpu.bitcast(src_buf[slot], jnp.uint32)  # (Q, W)
        acc = jnp.zeros((TY, src_buf.shape[-1]), jnp.float32)
        for c in range(n_chunks):
            wc = word[c * cq:(c + 1) * cq]
            parts = []
            for b in range(4):
                v = wc if b == 0 else jax.lax.shift_right_logical(
                    wc, jnp.uint32(8 * b))
                if b < 3:
                    v = v & jnp.uint32(0xFF)
                parts.append(pltpu.bitcast(v, jnp.int32).astype(
                    jnp.bfloat16))
            xc = jnp.concatenate(parts, axis=0)  # (4*cq, W)
            acc = acc + jnp.dot(
                wy_ref[0][:, c * 4 * cq:(c + 1) * 4 * cq], xc,
                preferred_element_type=jnp.float32)
        tmp_buf[:] = acc
        for cx in range(ntx):
            cb = pl.multiple_of(col_base_ref[cx], 128)
            seg = tmp_buf[:, pl.ds(cb, SX)]
            blk = jnp.dot(seg, wx_ref[cx],
                          preferred_element_type=jnp.float32)
            blk = jnp.clip(jnp.round(blk), 0.0, 255.0).astype(jnp.int32)
            out_ref[0, :, cx * TX: (cx + 1) * TX] = blk.astype(dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(total,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, TY, SY),
                         lambda t, *_: (jax.lax.rem(t, nty), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TY, ntx * TX),
            lambda t, *_: (jax.lax.div(t, nty), jax.lax.rem(t, nty), 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nslot, SY, W), dtype),
            pltpu.VMEM((TY, W), jnp.float32),
            pltpu.SemaphoreType.DMA((nslot,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, nty * TY, ntx * TX), dtype),
        interpret=interpret,
    )


def _u8chunk_setup(n_chunks, interpret=False):
    from aainterp.ops.pallas_apply import _densify_row_band

    op, _, _, _, col_base, wx_blocks, SX = _geometry(8)
    ys = np.asarray(op.wy.start)
    yw = np.asarray(op.wy.weights, np.float32)
    row_base, wy_blocks, SY = _densify_row_band(ys, yw, H, TY, align=32,
                                                span_align=8)
    Q = SY // 4
    if Q % n_chunks:
        raise ValueError(f"SY={SY}: Q={Q} not divisible by {n_chunks}")
    cq = Q // n_chunks
    disc = discover_u8_pack_order(SY, interpret=interpret)
    # disc[b*Q + q] = source row of word-row q byte b.  Chunk order:
    # perm[c*4cq + b*cq + j] = source row of word-row (c*cq + j) byte b
    perm = np.zeros(SY, dtype=np.int64)
    for c in range(n_chunks):
        for b in range(4):
            for j in range(cq):
                perm[c * 4 * cq + b * cq + j] = disc[b * Q + c * cq + j]
    wy_p = np.ascontiguousarray(wy_blocks[:, :, perm])
    return op, row_base, wy_p, SY, col_base, wx_blocks, SX


def _exp_u8chunk(batch, dtype, n_chunks):
    if jnp.dtype(dtype) != jnp.uint8:
        raise ValueError("u8chunk is a uint8 experiment (--dtype uint8)")
    op, row_base, wy_p, SY, col_base, wx_blocks, SX = _u8chunk_setup(
        n_chunks)
    nty, ntx = wy_p.shape[0], wx_blocks.shape[0]
    probe = _build_u8chunk(batch, SY, SX, nty, ntx, 1920, n_chunks)
    rb = jnp.asarray(row_base)
    cb = jnp.asarray(col_base)
    wy = jnp.asarray(wy_p)
    wx = jnp.asarray(wx_blocks)
    frames, warm = _frames(8, batch, jnp.uint8)
    dt = timed_scan(lambda f, r, c, a, b: probe(r, c, f, a, b),
                    frames, warm, consts=(rb, cb, wy, wx))
    return batch * H * W / dt / 1e9, dt / batch


def exp_u8chunk2(batch, dtype):
    return _exp_u8chunk(batch, dtype, 2)


def exp_u8chunk4(batch, dtype):
    return _exp_u8chunk(batch, dtype, 4)


def check_u8chunk(n_chunks=2):
    """Interpret-mode equality vs the production u8 apply (CPU)."""
    from aainterp.ops.pallas_apply import apply_separable_pallas

    op, row_base, wy_p, SY, col_base, wx_blocks, SX = _u8chunk_setup(
        n_chunks, interpret=True)
    nty, ntx = wy_p.shape[0], wx_blocks.shape[0]
    probe = _build_u8chunk(1, SY, SX, nty, ntx, 1920, n_chunks,
                           interpret=True)
    rng = np.random.default_rng(9)
    f = jnp.asarray(rng.integers(0, 256, (1, H, W), dtype=np.uint8))
    got = probe(jnp.asarray(row_base), jnp.asarray(col_base), f,
                jnp.asarray(wy_p), jnp.asarray(wx_blocks))[:, :1080, :]
    want = apply_separable_pallas(
        f, jnp.asarray(op.wy.start),
        jnp.asarray(np.asarray(op.wy.weights, np.float32)),
        jnp.asarray(op.wx.start),
        jnp.asarray(np.asarray(op.wx.weights, np.float32)),
        interpret=True)
    err = float(jnp.max(jnp.abs(got.astype(jnp.int32)
                                - want.astype(jnp.int32))))
    print(f"check u8chunk{n_chunks}: max abs err {err} gray")
    assert err <= 1, err


def exp_full2(batch, dtype):
    """2-slot replica of production built HERE (control for full3)."""
    return _full_nslot_exp(batch, dtype, 2)


def exp_full3(batch, dtype):
    return _full_nslot_exp(batch, dtype, 3)


def exp_full4(batch, dtype):
    return _full_nslot_exp(batch, dtype, 4)


EXPS = {
    "dma": exp_dma,
    "ypass": exp_ypass,
    "full": exp_full,
    "full2": exp_full2,
    "full3": exp_full3,
    "full4": exp_full4,
    "u8bitcast": exp_u8bitcast,
    "u8chunk2": exp_u8chunk2,
    "u8chunk4": exp_u8chunk4,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True, choices=sorted(EXPS))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--check", action="store_true",
                    help="interpret-mode correctness check (CPU) for "
                    "full2/full3/full4 instead of timing")
    args = ap.parse_args()
    if args.check:
        jax.config.update("jax_platforms", "cpu")
        if args.exp == "u8bitcast":
            check_u8bitcast()
        elif args.exp.startswith("u8chunk"):
            check_u8chunk(int(args.exp[-1]))
        else:
            check_nslot({"full2": 2, "full3": 3, "full4": 4}[args.exp],
                        jnp.dtype(args.dtype))
        return
    g, per_frame = EXPS[args.exp](args.batch, jnp.dtype(args.dtype))
    print(f"{args.exp}: {g:.2f} Gpixel/s  ({per_frame * 1e6:.1f} us/frame)")


if __name__ == "__main__":
    main()
