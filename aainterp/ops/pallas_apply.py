"""Pallas TPU kernels for the apply stage.

The XLA banded apply (ops/apply.py) materialises its gathers in HBM; these
kernels keep everything in VMEM.  Design (separable kernel):

  grid = one program per (frame, dst-row-tile); the tile height is chosen
  to divide the dst height exactly (no partial last tile, whose clamped
  DMA base would inflate the band span)
  1. DMA the tile's source row band HBM -> VMEM (band start is a prefetched
     scalar — data-dependent row offsets, the reason BlockSpec indexing
     alone can't express this).
  2. y-contraction (default 'mxu'): the banded Wy rows of this tile are
     *densified per tile* into a (TY, SY) block on the host (SY = band span
     of the tile, a static bound like the reference's search window,
     Source.cpp:426-429) -> tmp (TY, W) in fp32.
  3. x-contraction: static loop over dst column tiles, each a
     (TY, SX) x (SX, TX) MXU matmul against the per-column-tile densified
     Wx block at 128-aligned dynamic offsets, writing bf16/f32 output.

Measured on v5e: 311 Gpixel/s on the 4K->1080p bf16 flagship (62x the
BASELINE target) with the honest unrolled-args harness — 94% of the
328 Gpixel/s HBM-traffic physical bound; earlier recorded "80-106" was
the old scan harness's per-step slice-copy tax, not the kernel (see
BENCHMARKS.md methodology).  Per-tile HBM traffic is the
source band + output tile only.  Weights stay fp32 by default (bf16
weights would cost ~4e-3 relative accuracy; measured no speed benefit —
see BENCHMARKS.md for this and the other negative results: tight static
x blocks lose to lane relayouts, and every formulation of the exact
integer-ratio 'strided' y-pass is blocked by current Mosaic limitations
on this backend, though all are exact in interpret mode).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.digest import array_digest
from ..utils.lru import LruDict


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _as_f32(x):
    """Cast a VMEM block to a dot-ready dtype inside a kernel.

    Mosaic on this v5e libtpu rejects the direct uint8 -> float32
    convert ("Unsupported cast", caught by the real-TPU smoke suite);
    hop through int32, which lowers fine and is exact for u8 values.
    (Same for the store direction: f32 -> u8 must hop via int32 too.)

    u8 goes to BFLOAT16, not f32: values <= 255 are bf16-exact and the
    MXU consumes bf16 natively (the production bf16 path is dot(f32
    weights, bf16 band) already), so the materialised intermediate is
    half the size.  Measured 2026-08-18 (u8 flagship): the cast TARGET
    makes no difference (84.3 Gpixel/s via bf16 vs 85.2 via f32, noise)
    — the cost is the u8 -> i32 unpack itself (a (32,128) -> (8,128)
    sublane relayout over the whole band, ~8.6M elem/frame of VPU
    restructuring that the saved HBM reads cannot buy back); bf16 kept
    as the marginally lighter variant.
    """
    if x.dtype == jnp.uint8:
        return x.astype(jnp.int32).astype(jnp.bfloat16)
    return x.astype(jnp.float32)


def _require_host_geometry(*tables) -> None:
    """Reject traced band tables with an actionable message.

    The Pallas wrappers plan on the host (numpy densify, content-hash
    plan caches), so the geometry must be concrete.  Under ``jax.jit``,
    closed-over *device* arrays are lifted to arguments by current JAX
    and arrive here as tracers; numpy closures stay concrete.  Callers
    that jit a step function should hold Band1D tables as numpy (see
    pipeline._host_band).
    """
    for t in tables:
        if isinstance(t, jax.core.Tracer):
            raise TypeError(
                "apply_separable_pallas* needs concrete (host) band "
                "tables to plan its kernel, but got a traced array. "
                "Keep operator tables as numpy when closing over them "
                "inside jax.jit (device-array closures become jit "
                "arguments), or call the apply outside jit.")


def _densify_row_band(start: np.ndarray, weights: np.ndarray, n_src: int,
                      tile: int, align: int, span_align: int = 0,
                      ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Per-tile dense blocks of a banded operator.

    Returns (base (n_tiles,) int32, blocks (n_tiles, tile, span) f32, span).
    base is clamped to [0, n_src - span]; blocks place weights[i, k] at
    column start[i] + k - base[t].

    ``span_align`` (default: same as ``align``) rounds the span
    separately from the base alignment.  The split matters when n_src is
    not a multiple of ``align``: with span forced to an align-multiple
    too, aligned-base + aligned-span can never land exactly on n_src, so
    the base/span fixpoint below diverges to the give-up branch (span =
    n_src rounded up, which the caller treats as "off the envelope").
    DMA *bases* carry the hard Mosaic alignment contract; the copy
    LENGTH only needs sublane-tile (8) alignment, so e.g. the uint8 path
    (align=32, span_align=8) can use a tight span and still cover
    n_src = 2160 (base 1888 + span 272).
    """
    if span_align <= 0:
        span_align = align
    n_dst, band = weights.shape
    n_tiles = _round_up(n_dst, tile) // tile
    lo_arr = np.zeros(n_tiles, dtype=np.int64)
    hi_arr = np.zeros(n_tiles, dtype=np.int64)
    for t in range(n_tiles):
        rows = slice(t * tile, min((t + 1) * tile, n_dst))
        lo_arr[t] = (int(start[rows].min()) // align) * align
        hi_arr[t] = int(start[rows].max()) + band
    # clamp bases to ALIGNED positions inside [0, n_src - span]: the DMA
    # base alignment is a hard Mosaic contract (the kernel hints
    # multiple_of(align)), so the upper clamp must be floored to align
    # too — n_src - span itself need not be aligned.  Clamping a base
    # down grows its tile's required span, so iterate to a fixpoint
    # (grows monotonically; bounded by n_src).
    span = _round_up(int((hi_arr - lo_arr).max()), span_align)
    base = lo_arr
    while True:
        max_base = ((n_src - span) // align) * align
        if max_base < 0:
            base = np.zeros(n_tiles, dtype=np.int64)
            # > n_src: caller falls back
            span = _round_up(n_src, span_align)
            break
        base = np.clip(lo_arr, 0, max_base)
        need = int((hi_arr - base).max())
        if need <= span:
            break
        span = _round_up(need, span_align)
    base = base.astype(np.int32)
    blocks = np.zeros((n_tiles, tile, span), dtype=np.float32)
    for t in range(n_tiles):
        for r in range(tile):
            i = t * tile + r
            if i >= n_dst:
                continue
            off = int(start[i]) - int(base[t])
            assert 0 <= off and off + band <= span, (t, r, off, span)
            blocks[t, r, off: off + band] = weights[i]
    return base, blocks, span


def _u8_unpack_bf16(band):
    """Byte-split a packed u8 VMEM block to bf16 without a relayout.

    ``pltpu.bitcast`` reinterprets the (SY, W) u8 block as (SY/4, W)
    uint32 for free — vregs already pack 4 sublanes per 32-bit word —
    then each byte lane is extracted with lanewise shifts/masks and
    converted i32 -> bf16 (u8 values are bf16-exact).  The result rows
    are SCRAMBLED by the hardware packing order: callers must permute
    the wy operand's columns by _u8_pack_order(SY) host-side.

    This replaces the u8 -> i32 convert (a (32,128) -> (8,128) sublane
    unpack relayout over the whole band) that held the u8 flagship at
    84 Gpixel/s; the bitcast variant measures 264 (2026-08-19 probe).
    """
    word = pltpu.bitcast(band, jnp.uint32)
    parts = []
    for b in range(4):
        v = word if b == 0 else jax.lax.shift_right_logical(
            word, jnp.uint32(8 * b))
        if b < 3:
            v = v & jnp.uint32(0xFF)
        parts.append(pltpu.bitcast(v, jnp.int32).astype(jnp.bfloat16))
    return jnp.concatenate(parts, axis=0)


@functools.lru_cache(maxsize=16)
def _u8_pack_order(rows: int, interpret: bool = False) -> tuple:
    """Row permutation induced by _u8_unpack_bf16, asked of the backend.

    perm[b * rows//4 + q] = the u8 source row whose byte lands in byte
    lane b of uint32 row q.  Interpret mode groups rows contiguously
    (4q + b); real Mosaic's packed sublane order may differ, so it is
    DISCOVERED with a tiny kernel on the live backend (one cheap compile
    per distinct row count, cached).  Row indices are encoded over two
    lane columns (lo/hi byte) so rows > 256 work.
    """
    assert rows % 4 == 0

    def kern(x_ref, o_ref):
        o_ref[:] = pltpu.bitcast(x_ref[:], jnp.int32)

    r = np.arange(rows)
    x = np.zeros((rows, 128), dtype=np.uint8)
    x[:, 0] = r & 0xFF
    x[:, 1] = r >> 8
    # plan prep may run while the caller is TRACING (e.g. a jitted
    # serving step); the probe's inputs are concrete, so force eager
    # evaluation — otherwise the probe output is a tracer and the
    # discovery cannot read it
    with jax.ensure_compile_time_eval():
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
    if sorted(perm.tolist()) != list(range(rows)):
        raise RuntimeError(
            f"u8 pack-order probe returned a non-bijection at rows="
            f"{rows}: {perm[:8]}... — backend packing changed; "
            "the u8 bitcast route must be disabled for this shape")
    return tuple(int(p) for p in perm)


@functools.lru_cache(maxsize=32)
def _build_separable_kernel(F, H, W, Hd, Wd, TY, TX, SY, SX, nty, ntx,
                            ky, wy_width, out_dtype_name, in_dtype_name,
                            y_pass="mxu", stride_m=0, x_bases=None,
                            c0_static=-1, buf_rows=0, bf16_x=False,
                            double_buffer=True, n_slots=2,
                            u8_bitcast=False, interpret=False):
    out_dtype = jnp.dtype(out_dtype_name)
    in_dtype = jnp.dtype(in_dtype_name)
    # TPU f32 matmuls at DEFAULT precision silently truncate operands to
    # bf16 (~1e-3 error, found by the real-TPU smoke test).  For f32
    # pixels run HIGHEST (bf16x3) to keep true f32 accuracy; for the bf16
    # production path keep the cheap single pass (pixel operands are bf16-
    # exact and the ~0.5-ulp weight truncation vanishes in bf16 output).
    # uint8 pixels are integers <= 255, hence bf16-exact too.
    prec = (jax.lax.Precision.HIGHEST if in_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    # 8-bit VMEM tiles pack (32, 128): band DMA bases are 32-aligned for
    # uint8 sources (the wrapper densifies with align=32), 8 otherwise
    row_hint = 32 if in_dtype == jnp.uint8 else 8

    def to_out(blk):
        if out_dtype == jnp.uint8:
            # round-to-nearest with saturation: the operator rows are
            # normalised (weights.py), so the average stays in [0, 255]
            return jnp.clip(jnp.round(blk), 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)
        return blk.astype(out_dtype)

    # strided mode geometry: the caller reshapes the source to
    # (F, H/m, m, W) — free for row-major layouts — so parity j of the
    # tile's band arrives via its own contiguous DMA and every tap is a
    # plain static sublane slice (Mosaic supports neither strided VMEM
    # loads on wide refs nor sub-8 dynamic offsets).
    m = stride_m
    PPAD = 8  # zeroed pad rows per parity buffer (residue + structural)
    if y_pass == "strided":
        rows_per_par = buf_rows
    # cross-grid-step buffering of the band DMA (mxu path): grid steps
    # run sequentially per core and scratch/semaphores persist, so step t
    # issues the next slots' band fetches before waiting on its own —
    # overlapping the HBM read with the y/x matmuls.  n_slots=2 is the
    # classic ping-pong; deeper buffers keep more DMAs in flight
    db = bool(double_buffer) and y_pass == "mxu"
    NSLOT = max(2, int(n_slots)) if db else 1

    def kernel(row_base_ref, col_base_ref, row_off_ref, yw_flat_ref,
               src_ref, wy_ref, wx_ref, out_ref, src_buf, tmp_buf, sem):
        t = pl.program_id(0)
        tile_row = jax.lax.rem(t, nty)
        frame = jax.lax.div(t, nty)
        if y_pass == "strided":
            # r0 is a multiple of lcm(8, m); per-parity row base r0 // m
            r0 = pl.multiple_of(row_base_ref[tile_row], 8)
            r0p = pl.multiple_of(jax.lax.div(r0, m), max(8 // m, 1))
            SYp = (SY + m - 1) // m
            for j in range(m):
                dma = pltpu.make_async_copy(
                    src_ref.at[frame, pl.ds(r0p, SYp), j, :],
                    src_buf.at[j, PPAD: PPAD + SYp, :],
                    sem.at[j],
                )
                dma.start()
            src_buf[:, 0:PPAD, :] = jnp.zeros((m, PPAD, W), in_dtype)
            if rows_per_par > PPAD + SYp:
                src_buf[:, PPAD + SYp:, :] = jnp.zeros(
                    (m, rows_per_par - PPAD - SYp, W), in_dtype
                )
            for j in range(m):
                pltpu.make_async_copy(
                    src_ref.at[frame, pl.ds(r0p, SYp), j, :],
                    src_buf.at[j, PPAD: PPAD + SYp, :],
                    sem.at[j],
                ).wait()
            # tap k reads global band row  m*r + c0 + k  (c0 = min per-row
            # residue; deviations folded into shifted tap weights) =
            # parity (c0+k) % m, per-parity row r + (c0+k)//m + PPAD
            acc = jnp.zeros((TY, W), jnp.float32)
            for k in range(ky):
                idx = c0_static + k   # c0_static = cmin + m*PPAD
                j, q = idx % m, idx // m
                rows = src_buf[j, q: q + TY, :]
                acc = acc + wy_ref[0, :, k:k + 1] * _as_f32(rows)
            tmp_buf[:] = acc
        elif db:
            def band_dma(step, slot_i):
                tr = jax.lax.rem(step, nty)
                fr = jax.lax.div(step, nty)
                return pltpu.make_async_copy(
                    src_ref.at[fr, pl.ds(
                        pl.multiple_of(row_base_ref[tr], row_hint), SY), :],
                    src_buf.at[slot_i],
                    sem.at[slot_i],
                )

            slot = jax.lax.rem(t, NSLOT)

            @pl.when(t == 0)
            def _():
                # fill the pipeline: this step's fetch + NSLOT-2 ahead
                for s in range(NSLOT - 1):
                    if s == 0:
                        band_dma(t, 0).start()
                    else:
                        @pl.when(t + s < F * nty)
                        def _(s=s):
                            band_dma(t + s, s).start()

            @pl.when(t + (NSLOT - 1) < F * nty)
            def _():
                band_dma(t + (NSLOT - 1),
                         jax.lax.rem(t + (NSLOT - 1), NSLOT)).start()

            band_dma(t, slot).wait()
        else:
            dma = pltpu.make_async_copy(
                src_ref.at[frame, pl.ds(
                    pl.multiple_of(row_base_ref[tile_row], row_hint), SY), :],
                src_buf,
                sem.at[0],
            )
            dma.start()
            dma.wait()

        if y_pass == "mxu":
            # dense banded block on the MXU: simple but SY/ky x wasted FLOPs
            band = src_buf[slot] if db else src_buf[:]
            # u8 bands: bitcast byte-split (free reinterpret + lanewise
            # extract; wy columns are pre-permuted by _u8_pack_order)
            # instead of the sublane-relayout u8 -> i32 convert
            operand = (_u8_unpack_bf16(band) if u8_bitcast
                       else _as_f32(band))
            tmp_buf[:] = jnp.dot(
                wy_ref[0],
                operand,
                precision=prec,
                preferred_element_type=jnp.float32,
            )  # (TY, W)
        elif y_pass == "vpu":
            # exact band taps on the VPU: ky fused multiply-adds per row,
            # per-row dynamic sublane offsets from the prefetched band
            # (crashes the Mosaic compiler on v5e — kept for interpret mode)
            def row_body(r, _):
                i = tile_row * TY + r
                off = row_off_ref[i]
                acc = (
                    yw_flat_ref[i * ky]
                    * _as_f32(src_buf[pl.ds(off, 1), :])
                )
                for k in range(1, ky):
                    acc += (
                        yw_flat_ref[i * ky + k]
                        * _as_f32(src_buf[pl.ds(off + k, 1), :])
                    )
                tmp_buf[pl.ds(r, 1), :] = acc
                return 0

            jax.lax.fori_loop(0, TY, row_body, 0)

        for c in range(ntx):
            if x_bases is not None:
                # integer-stride x band: block bases are static ints and the
                # span is tight (8-aligned), no 128-lane alignment slack
                seg = tmp_buf[:, x_bases[c]: x_bases[c] + SX]
            else:
                cb = pl.multiple_of(col_base_ref[c], 128)
                seg = tmp_buf[:, pl.ds(cb, SX)]
            if bf16_x:
                blk = jnp.dot(
                    seg.astype(jnp.bfloat16), wx_ref[c],
                    preferred_element_type=jnp.float32,
                )
            else:
                blk = jnp.dot(
                    seg, wx_ref[c], precision=prec,
                    preferred_element_type=jnp.float32,
                )
            out_ref[0, :, c * TX: (c + 1) * TX] = to_out(blk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(F * nty,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),        # src (HBM)
            pl.BlockSpec(
                (1, TY, wy_width),
                lambda t, *_: (jax.lax.rem(t, nty), 0, 0),
                memory_space=pltpu.VMEM,
            ),                                           # wy blocks
            pl.BlockSpec(memory_space=pltpu.VMEM),       # wx blocks (all)
        ],
        out_specs=pl.BlockSpec(
            (1, TY, ntx * TX),
            lambda t, *_: (jax.lax.div(t, nty), jax.lax.rem(t, nty), 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            (pltpu.VMEM((m, buf_rows, W), in_dtype) if y_pass == "strided"
             else pltpu.VMEM((NSLOT, SY, W), in_dtype) if db
             else pltpu.VMEM((SY, W), in_dtype)),
            pltpu.VMEM((TY, W), jnp.float32),
            pltpu.SemaphoreType.DMA((max(m, NSLOT),)),
        ],
    )

    y_flops = Hd * (SY * W if y_pass == "mxu" else ky * W)
    flops = F * (y_flops + Hd * SX * Wd) * 2

    def call(row_base, col_base, row_off, yw_flat, src, wy_blocks, wx_blocks):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((F, nty * TY, ntx * TX), out_dtype),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=F * (H * W * 2 + Hd * Wd * 2),
                transcendentals=0,
            ),
            interpret=interpret,
        )(row_base, col_base, row_off, yw_flat, src, wy_blocks, wx_blocks)

    return call


def apply_separable_pallas(
    frames: jax.Array,
    y_start: jax.Array,
    y_w: jax.Array,
    x_start: jax.Array,
    x_w: jax.Array,
    *,
    tile_y: int = 128,
    tile_x: int = 128,
    y_pass: str = "auto",
    x_static: bool = False,
    bf16_x: bool = False,
    double_buffer: bool = True,
    n_slots: int = 2,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Pallas separable banded apply: (F, H, W) -> (F, Hd, Wd).

    Drop-in equivalent of ops.apply.apply_separable_banded for 3-D inputs
    (use vmap/reshape for higher batch ranks).  y_pass: 'vpu' (exact band
    taps, ky FMAs/row) or 'mxu' (densified band matmul).

    uint8 pixels are first-class: the band DMA moves 8-bit rows (half the
    HBM read traffic of bf16 on a traffic-bound kernel), the contraction
    accumulates f32, and the output is rounded/saturated back to uint8
    (or any `out_dtype`).  The rows of a normalised operator sum to 1, so
    the result is the exact area average quantised once at the end.
    """
    if frames.ndim == 2:
        return apply_separable_pallas(
            frames[None], y_start, y_w, x_start, x_w,
            tile_y=tile_y, tile_x=tile_x, y_pass=y_pass,
            double_buffer=double_buffer, n_slots=n_slots,
            out_dtype=out_dtype, interpret=interpret,
        )[0]
    F, H, W = frames.shape
    Hd = int(y_w.shape[0])
    Wd = int(x_w.shape[0])
    TY, TX = tile_y, tile_x
    if y_pass in ("auto", "strided") and Hd % TY != 0:
        # a partial last tile forces its DMA base down (base+SY <= H), which
        # inflates that tile's tap residue beyond the static pad; prefer a
        # tile height that divides Hd exactly
        for cand in range(min(TY, Hd) - min(TY, Hd) % 8, 39, -8):
            if Hd % cand == 0:
                TY = cand
                break

    _require_host_geometry(y_start, y_w, x_start, x_w)
    ys = np.asarray(y_start)
    yw = np.asarray(y_w, dtype=np.float32)
    xs = np.asarray(x_start)
    xw = np.asarray(x_w, dtype=np.float32)

    u8 = frames.dtype == jnp.uint8
    if u8:
        # 8-bit VMEM tiles pack (32, 128) sublanes x lanes: band bases must
        # be 32-aligned and the strided/vpu y passes don't apply
        y_pass = "mxu"
    row_align = 32 if u8 else 8
    if out_dtype is None:
        out_dtype = frames.dtype if (u8 or frames.dtype in (
            jnp.bfloat16, jnp.float32)) else jnp.float32
    out_dtype = jnp.dtype(out_dtype)

    # cache the host-side densify/shift prep per operator content (eager
    # callers would otherwise redo ~ms of numpy per frame batch)
    # clamp the band-buffer depth to a VMEM budget (the deep slots only
    # pay off when the DMA stream, not VMEM, is the constraint)
    isize = 1 if u8 else (2 if frames.dtype == jnp.bfloat16 else 4)
    n_slots = max(2, int(n_slots))
    prep_key = (
        (array_digest(ys), array_digest(yw),
         array_digest(xs), array_digest(xw)),
        F, H, W, TY, TX, y_pass, x_static, bf16_x, double_buffer, n_slots,
        str(frames.dtype), str(out_dtype), bool(interpret),
    )
    cached = _PREP_CACHE.get(prep_key)
    if cached is not None:
        return _finish_separable_pallas(frames, cached, interpret)

    u8_bitcast = False
    if u8:
        # tight 8-multiple span (32-aligned bases stay the hard Mosaic
        # contract) so the band window fits H even when H % 32 != 0 —
        # with span forced to a 32-multiple the 4K flagship degenerated
        # to whole-image bands and fell off this kernel entirely.  The
        # bitcast itself only needs SY % 4, but Mosaic requires the COPY
        # LENGTH to be sublane-tile (8) aligned when the source ref is
        # VMEM-resident ("Slice shape along dimension 1 must be aligned
        # to tiling (8)", hit by the sharded local blocks on real TPU)
        row_base, wy_blocks, SY = _densify_row_band(ys, yw, H, TY,
                                                    align=32, span_align=8)
        if SY % 4 == 0 and SY <= H:
            perm = _u8_pack_order(SY, bool(interpret))
            wy_blocks = np.ascontiguousarray(wy_blocks[:, :, list(perm)])
            u8_bitcast = True
    else:
        row_base, wy_blocks, SY = _densify_row_band(ys, yw, H, TY,
                                                    align=row_align)
    col_base, wx_blocks_t, SX = _densify_row_band(xs, xw, W, TX, align=128)
    if SY > H or SX > W or W % 128 != 0:
        # off the 1-D kernel's envelope: full-width row bands need
        # W % 128 == 0 (the HBM band DMA slices the full last dim) and a
        # band that fits VMEM at full width.  Try the 2-D banded-tile
        # kernel (per-tile (SY, SX) block DMAs) before the XLA fallback.
        # The 2-D kernel rides u8 natively for the u8->u8 contract; other
        # out dtypes (and the XLA path) compute in f32 and quantise back.
        ffall = frames
        if u8 and out_dtype != jnp.uint8:
            ffall = frames.astype(jnp.float32)
        out = apply_separable_pallas_2d(
            ffall, y_start, y_w, x_start, x_w, interpret=interpret)
        if out is None:
            from .apply import apply_separable_banded

            if ffall.dtype == jnp.uint8:
                ffall = ffall.astype(jnp.float32)
            out = apply_separable_banded(ffall, y_start, y_w,
                                         x_start, x_w)
        if out.dtype != out_dtype:
            if out_dtype == jnp.uint8:
                out = jnp.clip(jnp.round(out), 0.0, 255.0)
            out = out.astype(out_dtype)
        return out
    # x blocks are used as (SX, TX): transpose the densified (TX, SX)
    wx_blocks = np.ascontiguousarray(np.swapaxes(wx_blocks_t, 1, 2))
    nty, ntx = wy_blocks.shape[0], wx_blocks.shape[0]

    if frames.dtype not in (jnp.bfloat16, jnp.float32, jnp.uint8):
        frames = frames.astype(jnp.float32)

    # per-row band offsets/weights for the VPU y-pass (padded rows: weight 0)
    ky = yw.shape[1]
    n_rows = nty * TY
    row_off = np.zeros(n_rows, dtype=np.int32)
    yw_flat = np.zeros((n_rows, ky), dtype=np.float32)
    rows = np.arange(Hd)
    tiles = rows // TY
    row_off[:Hd] = ys[:Hd] - row_base[tiles]
    yw_flat[:Hd] = yw
    assert (row_off >= 0).all() and (row_off[:Hd] + ky <= SY).all()

    # Static tight x blocks (off by default: measured SLOWER on v5e —
    # the tight spans land on non-128 lane offsets and the static slices
    # then pay lane-relayout copies that outweigh the saved MXU FLOPs;
    # the 128-aligned dynamic path wins at 59.3 vs 35.9 Gpixel/s)
    x_bases = None
    dx = np.diff(xs.astype(np.int64))
    if x_static and dx.size and (dx == dx[0]).all() and int(dx[0]) >= 1:
        mx = int(dx[0])
        kx = xw.shape[1]
        cgx = int(xs[0])
        cg8 = (cgx // 8) * 8
        SXs = _round_up(mx * (TX - 1) + (cgx - cg8) + kx, 8)
        bases = [mx * TX * c + cg8 for c in range(ntx)]
        if bases[-1] >= 0 and bases[-1] + SXs <= W:
            wx_t = np.zeros((ntx, TX, SXs), dtype=np.float32)
            ok = True
            for c in range(ntx):
                for r in range(TX):
                    i = c * TX + r
                    if i >= Wd:
                        continue
                    off = int(xs[i]) - bases[c]
                    if off < 0 or off + kx > SXs:
                        ok = False
                        break
                    wx_t[c, r, off: off + kx] = xw[i]
                if not ok:
                    break
            if ok:
                x_bases = tuple(bases)
                SX = SXs
                wx_blocks = np.ascontiguousarray(np.swapaxes(wx_t, 1, 2))

    stride_m = 0
    c0_static = -1
    buf_rows = 0
    wy_in = wy_blocks
    wy_width = SY
    if y_pass == "auto":
        # 'mxu' is the production path.  The 'strided' integer-ratio
        # variant is exact and ~40x cheaper in y-pass FLOPs but every
        # formulation hits a Mosaic limitation on v5e (strided VMEM loads
        # are 32-bit-only and require last-dim-128 refs; per-parity DMA
        # slices collide with bf16 sub-tile packing) — kept for interpret
        # mode and future Mosaic versions.  See BENCHMARKS.md.
        y_pass = "mxu"
    if y_pass == "strided":
        d = np.diff(ys.astype(np.int64))
        # use the median (interior) stride; boundary clamping of the band
        # start may perturb the first/last steps — those rows' residues are
        # absorbed by the shifted weights below
        d0 = int(np.median(d)) if d.size else 0
        interior_const = d.size and (np.abs(d - d0) <= max(d0, 1)).all() \
            and d0 >= 1
        # the per-parity decomposition needs the DMA base divisible by both
        # the sublane alignment (8) and the stride m, and the source height
        # divisible by m (the caller reshapes to (F, H/m, m, W))
        lcm = 0
        if interior_const:
            stride_m = d0
            lcm = 8 * stride_m // math.gcd(8, stride_m)
            if H % stride_m or lcm > 64:
                interior_const = False
        if interior_const:
            # re-densify the y band at lcm(8, m) alignment so every tile's
            # base is stride-divisible
            row_base, wy_blocks, SY = _densify_row_band(
                ys, yw, H, TY, align=lcm
            )
            SY = _round_up(SY, lcm)
            nty = wy_blocks.shape[0]
            wy_in = wy_blocks
            wy_width = SY
            row_off = np.zeros(n_rows, dtype=np.int32)
            row_off[:Hd] = ys[:Hd] - row_base[tiles]
            if SY > H:
                from .apply import apply_separable_banded

                return apply_separable_banded(frames, y_start, y_w,
                                              x_start, x_w)
            c0 = row_off - stride_m * (np.arange(n_rows) % TY)
            cc = c0[:Hd]
            cmin, cmax = int(cc.min()), int(cc.max())
            kys = cmax - cmin + ky
            PPAD = 8  # per-parity zeroed pad rows (kernel constant)
            if cmin >= -stride_m * PPAD and kys <= ky + 2 * lcm:
                c0_static = cmin + stride_m * PPAD
                SYp = SY // stride_m
                buf_rows = _round_up(
                    max(PPAD + SYp,
                        TY + (cmax + ky) // stride_m + PPAD + 2), 8
                )
                wy_shift = np.zeros((nty, TY, kys), dtype=np.float32)
                idx = np.arange(Hd)
                for k in range(ky):
                    wy_shift[tiles, idx % TY, cc - cmin + k] = yw[:, k]
                wy_in = wy_shift
                wy_width = kys
                ky = kys
            else:
                y_pass = "mxu"
        else:
            y_pass = "mxu"
        if y_pass == "mxu":
            wy_in = wy_blocks  # never mix shifted weights with the mxu path
            wy_width = SY

    while n_slots > 2 and n_slots * SY * W * isize > 10 * 1024 * 1024:
        n_slots -= 1

    plan = dict(
        build_args=(F, H, W, Hd, Wd, TY, TX, SY, SX, nty, ntx, ky, wy_width,
                    jnp.dtype(out_dtype).name, jnp.dtype(frames.dtype).name,
                    y_pass, stride_m, x_bases, c0_static, buf_rows,
                    bf16_x, double_buffer, n_slots, u8_bitcast),
        # HOST tables only: plans outlive traces, and a jnp.asarray done
        # while tracing is a tracer in current JAX — caching it leaks
        # (UnexpectedTracerError on the next batch, hit by the jitted
        # stream step).  Device upload happens lazily in _plan_tables.
        tables=(row_base, np.asarray(col_base), row_off,
                yw_flat.reshape(-1), np.asarray(wy_in),
                np.asarray(wx_blocks)),
        wx_dtype=jnp.bfloat16 if bf16_x else jnp.float32,
        Hd=Hd,
        Wd=Wd,
        in_dtype=frames.dtype,
        reshape_m=stride_m if y_pass == "strided" else 0,
    )
    _PREP_CACHE.put(prep_key, plan)
    return _finish_separable_pallas(frames, plan, interpret)


def _plan_tables(plan) -> tuple:
    """Device copies of a cached plan's host tables.

    Outside a trace the converted arrays are concrete and memoised on
    the plan (one upload per process).  Inside a trace jnp.asarray
    yields tracers — correct as kernel inputs for THAT trace, but never
    stored (a cached tracer outlives its trace and poisons later calls).
    """
    dev = plan.get("_dev")
    if dev is not None:
        return dev
    tabs = plan["tables"]
    dev = tuple(jnp.asarray(t) for t in tabs[:-1]) + (
        jnp.asarray(tabs[-1], dtype=plan["wx_dtype"]),)
    if not any(isinstance(t, jax.core.Tracer) for t in dev):
        plan["_dev"] = dev
    return dev


# bounded: each plan holds densified f32 band blocks (tens of MB at 4K);
# a many-geometry server must not grow this without bound (VERDICT r2 #7)
_PREP_CACHE = LruDict(16, max_bytes=2 << 30)  # densified f32 band blocks


# ----------------------------------------------------------------------
# 2-D banded tile kernel: per-(frame, row-tile, col-tile) band blocks
# ----------------------------------------------------------------------


def _banded_blocks_2d(start: np.ndarray, weights: np.ndarray, n: int,
                      tile: int, align: int):
    """Per-tile (base, span) with ALIGNED bases clamped inside [0, n).

    Unlike _densify_row_band, the span is recomputed after the base is
    floored to `align`, so bases stay aligned even when n - span is not —
    the requirement for 2-D block DMAs (row offset 8-aligned, col offset
    and width 128-aligned; same contract the pallas_shear contract kernel
    relies on).  Returns (base (nt,), blocks (nt, tile, span), span) or
    None when a span cannot fit inside n.
    """
    n_dst, band = weights.shape
    nt = _round_up(n_dst, tile) // tile
    lo = np.zeros(nt, dtype=np.int64)
    hi = np.zeros(nt, dtype=np.int64)
    for t in range(nt):
        rows = slice(t * tile, min((t + 1) * tile, n_dst))
        lo[t] = (int(start[rows].min()) // align) * align
        hi[t] = int(start[rows].max()) + band
    span = _round_up(int((hi - lo).max()), align)
    if span > n:
        return None
    max_base = ((n - span) // align) * align
    base = np.clip(lo, 0, max_base)
    span = _round_up(int((hi - base).max()), align)
    if span > n or (base + span > n).any():
        return None
    blocks = np.zeros((nt, tile, span), dtype=np.float32)
    for t in range(nt):
        for r in range(tile):
            i = t * tile + r
            if i >= n_dst:
                continue
            off = int(start[i]) - int(base[t])
            if off < 0 or off + band > span:
                return None
            blocks[t, r, off: off + band] = weights[i]
    return base.astype(np.int32), blocks, span


# Mosaic's dot lowering supports only DEFAULT (1 bf16 MXU pass) and
# HIGHEST (full f32 via bf16x6) on this backend — HIGH (bf16x3) raises
# NotImplementedError at lowering (measured 2026-08-19; the hoped-for
# half-cost regrid precision point does not exist on v5e).  "high" is
# accepted for forward compatibility but runs HIGHEST.  The missing
# middle point is recovered MANUALLY as precision="bf16x3": operands are
# split into bf16 hi/lo halves (weights host-side, fields in-kernel) and
# each contraction runs THREE one-pass DEFAULT dots
# (wh@xh + wh@xl + wl@xh, dropping the ~2^-18 wl@xl term) — half
# HIGHEST's MXU passes at ~1e-5 relative accuracy (the BASELINE budget).
_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGHEST,
    "highest": jax.lax.Precision.HIGHEST,
}


def _split_bf16_np(w: np.ndarray) -> np.ndarray:
    """Host split of f32 blocks into stacked bf16 (hi, lo) halves.

    hi = bf16(w); lo = bf16(w - f32(hi)).  hi + lo carries ~16 mantissa
    bits of w, so a product of two split operands is exact to ~2^-18
    relative once the cross terms are kept (the bf16x3 scheme keeps all
    but lo*lo).  Returns shape (2,) + w.shape, dtype bfloat16.
    """
    import ml_dtypes

    bf16 = ml_dtypes.bfloat16
    hi = w.astype(bf16)
    lo = (w - hi.astype(np.float32)).astype(bf16)
    return np.stack([hi, lo])


def _split_bf16(x):
    """In-kernel split of an f32 block into (hi, lo) bf16 halves."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_bf16x3(ah, al, bh, bl):
    """f32-accurate-ish product of split operands: 3 one-pass MXU dots.

    Drops al@bl (~2^-18 relative); each dot runs DEFAULT precision on
    bf16 operands, which is exact per pass (f32 accumulation)."""
    acc = jnp.dot(ah, bh, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(ah, bl, preferred_element_type=jnp.float32)
    return acc + jnp.dot(al, bh, preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=32)
def _build_separable_kernel_2d(F, H, W, Hd, Wd, TY, TX, SY, SX, nty, ntx,
                               out_dtype_name, in_dtype_name, precision,
                               interpret=False):
    out_dtype = jnp.dtype(out_dtype_name)
    in_dtype = jnp.dtype(in_dtype_name)
    # "auto": f32 pixels need multi-pass MXU accuracy (DEFAULT silently
    # truncates operands to bf16, ~1e-3 error); bf16/u8 operands are
    # exact in one pass.  An explicit precision overrides (see
    # _PRECISIONS: "high" runs HIGHEST — Mosaic has no HIGH lowering;
    # "bf16x3" runs the manual hi/lo-split 3-dot scheme, half HIGHEST's
    # passes at ~1e-5 accuracy — weight blocks then arrive pre-split as
    # (nt, 2, ...) bf16 stacks from the wrapper).
    x3 = precision == "bf16x3"
    if x3:
        prec = jax.lax.Precision.DEFAULT  # unused by the x3 dots
    elif precision == "auto":
        prec = (jax.lax.Precision.HIGHEST if in_dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
    else:
        prec = _PRECISIONS[precision]
    row_hint = 32 if in_dtype == jnp.uint8 else 8
    npr = nty * ntx  # programs per frame

    def to_out(blk):
        if out_dtype == jnp.uint8:
            return jnp.clip(jnp.round(blk), 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)
        return blk.astype(out_dtype)

    def kernel(row_base_ref, col_base_ref, src_ref, wy_ref, wx_ref,
               out_ref, band_buf, sem):
        t = pl.program_id(0)

        def band_dma(step, slot_i):
            fr = jax.lax.div(step, npr)
            r = jax.lax.rem(step, npr)
            ty = jax.lax.div(r, ntx)
            tx = jax.lax.rem(r, ntx)
            return pltpu.make_async_copy(
                src_ref.at[fr,
                           pl.ds(pl.multiple_of(row_base_ref[ty],
                                                row_hint), SY),
                           pl.ds(pl.multiple_of(col_base_ref[tx], 128),
                                 SX)],
                band_buf.at[slot_i],
                sem.at[slot_i],
            )

        slot = jax.lax.rem(t, 2)

        @pl.when(t == 0)
        def _():
            band_dma(t, slot).start()

        @pl.when(t + 1 < F * npr)
        def _():
            band_dma(t + 1, jax.lax.rem(t + 1, 2)).start()

        band_dma(t, slot).wait()
        band = band_buf[slot]
        # u8 blocks keep the plain convert: the bitcast byte-split that
        # wins 3.15x on the 1-D kernel's full-width bands measured
        # SLOWER here on every config (rgb1024 204.3 -> 195.5, big
        # odd-width 4K 84.2 -> 78.7) — per-(SY, SX)-block extracts on
        # narrow SX don't amortise the 4-way shift/mask + concat
        if x3:
            xh, xl = _split_bf16(band.astype(jnp.float32))
            tmp = _dot_bf16x3(wy_ref[0, 0], wy_ref[0, 1], xh, xl)
            th, tl = _split_bf16(tmp)
            out_ref[0] = to_out(
                _dot_bf16x3(th, tl, wx_ref[0, 0], wx_ref[0, 1]))
            return
        tmp = jnp.dot(
            wy_ref[0], _as_f32(band),
            precision=prec, preferred_element_type=jnp.float32,
        )  # (TY, SX)
        out_ref[0] = to_out(jnp.dot(
            tmp, wx_ref[0], precision=prec,
            preferred_element_type=jnp.float32,
        ))

    # bf16x3 weight blocks carry a leading (hi, lo) split pair
    wy_blk = (1, 2, TY, SY) if x3 else (1, TY, SY)
    wx_blk = (1, 2, SX, TX) if x3 else (1, SX, TX)
    pad0 = ((0,) if x3 else ())
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(F * npr,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),        # src (HBM)
            pl.BlockSpec(
                wy_blk,
                lambda t, *_: (
                    jax.lax.div(jax.lax.rem(t, npr), ntx),) + pad0 + (0, 0),
                memory_space=pltpu.VMEM,
            ),                                           # wy blocks
            pl.BlockSpec(
                wx_blk,
                lambda t, *_: (jax.lax.rem(t, ntx),) + pad0 + (0, 0),
                memory_space=pltpu.VMEM,
            ),                                           # wx blocks
        ],
        out_specs=pl.BlockSpec(
            (1, TY, TX),
            lambda t, *_: (
                jax.lax.div(t, npr),
                jax.lax.div(jax.lax.rem(t, npr), ntx),
                jax.lax.rem(t, ntx),
            ),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, SY, SX), in_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    flops = 2 * F * (nty * ntx) * (TY * SY * SX + TY * SX * TX)

    def call(row_base, col_base, src, wy_blocks, wx_blocks):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (F, nty * TY, ntx * TX), out_dtype),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=F * (H * W * 2 + Hd * Wd * 2),
                transcendentals=0,
            ),
            interpret=interpret,
        )(row_base, col_base, src, wy_blocks, wx_blocks)

    return call


def apply_separable_pallas_2d(
    frames: jax.Array,
    y_start: jax.Array,
    y_w: jax.Array,
    x_start: jax.Array,
    x_w: jax.Array,
    *,
    vmem_budget: int = 12 * 1024 * 1024,
    precision: str = "auto",
    interpret: bool = False,
):
    """2-D banded-tile Pallas apply: (F, H, W) -> (F, Hd, Wd) or None.

    The 1-D kernel (apply_separable_pallas) fetches full-width row bands,
    which requires W % 128 == 0 and a band that fits VMEM at full width —
    wide-band operators (e.g. the 10x lat-lon regrid: 1296-row bands x
    3600 f32 columns = 37 MB of scratch) and odd widths fall off it.
    This variant fetches an (SY, SX) band BLOCK per (frame, dst row tile,
    dst col tile) — row base 8-aligned, col base/width 128-aligned (the
    same DMA contract the pallas_shear contract kernel uses) — and runs
    both banded contractions per block on the MXU.  Tile sizes are chosen
    to fit the double-buffered block in `vmem_budget`.

    Returns None when no tile configuration fits (caller falls back).
    """
    if not interpret and jax.devices()[0].platform != "tpu":
        return None  # compiled Pallas is TPU-only; interpret covers CPU
    if frames.ndim == 2:
        out = apply_separable_pallas_2d(
            frames[None], y_start, y_w, x_start, x_w,
            vmem_budget=vmem_budget, precision=precision,
            interpret=interpret)
        return None if out is None else out[0]
    F, H, W = frames.shape
    Hd = int(y_w.shape[0])
    Wd = int(x_w.shape[0])
    if frames.dtype not in (jnp.bfloat16, jnp.float32, jnp.uint8):
        frames = frames.astype(jnp.float32)
    if precision != "auto" and precision != "bf16x3" \
            and precision not in _PRECISIONS:
        raise ValueError(f"precision must be auto/default/high/highest/"
                         f"bf16x3, got {precision!r}")
    in_dtype = frames.dtype
    if precision == "bf16x3" and in_dtype != jnp.float32:
        precision = "default"  # bf16/u8 operands are one-pass exact already
    u8 = in_dtype == jnp.uint8
    row_align = 32 if u8 else 8
    isize = 1 if u8 else (2 if in_dtype == jnp.bfloat16 else 4)

    _require_host_geometry(y_start, y_w, x_start, x_w)
    ys = np.asarray(y_start)
    yw = np.asarray(y_w, dtype=np.float32)
    xs = np.asarray(x_start)
    xw = np.asarray(x_w, dtype=np.float32)

    # plan against aligned padded source dims (8 or 32 sublanes by pixel
    # width, 128 lanes): aligned block bases clamped inside an unaligned
    # W would otherwise force the last tile's span past the array (zero
    # pad, zero weights there)
    Hp, Wp = _round_up(H, row_align), _round_up(W, 128)

    prep_key = (
        (array_digest(ys), array_digest(yw),
         array_digest(xs), array_digest(xw)),
        F, H, W, str(in_dtype), vmem_budget, precision, "2d",
    )
    cached = _PREP_CACHE.get(prep_key)
    if cached is not None:
        if cached == "reject":
            return None
        if (Hp, Wp) != (H, W):
            frames = jnp.pad(frames, ((0, 0), (0, Hp - H), (0, Wp - W)))
        call = _build_separable_kernel_2d(*cached["build_args"], interpret)
        row_base, col_base, wy, wx = _plan_tables(cached)
        out = call(row_base, col_base, frames, wy, wx)
        return out[:, :Hd, :Wd]

    plan = None
    # TX is pinned to 128: the out BlockSpec's last dim must be divisible
    # by 128 (or equal the full array dim); TY only needs 8-divisibility
    for TY, TX in ((128, 128), (64, 128), (32, 128), (16, 128), (8, 128)):
        by = _banded_blocks_2d(ys, yw, Hp, TY, align=row_align)
        bx = _banded_blocks_2d(xs, xw, Wp, TX, align=128)
        if by is None or bx is None:
            continue
        row_base, wy_blocks, SY = by
        col_base, wx_blocks_t, SX = bx
        vmem = (2 * SY * SX * isize           # band double buffer
                + TY * SY * 4 + SX * TX * 4   # weight blocks
                + TY * TX * 4 + TY * SX * 4)  # out + y-pass temporary
        if vmem > vmem_budget:
            continue
        plan = (TY, TX, row_base, wy_blocks, SY, col_base,
                np.ascontiguousarray(np.swapaxes(wx_blocks_t, 1, 2)), SX)
        break
    if plan is None:
        _PREP_CACHE.put(prep_key, "reject")
        return None
    TY, TX, row_base, wy_blocks, SY, col_base, wx_blocks, SX = plan
    nty, ntx = wy_blocks.shape[0], wx_blocks.shape[0]
    wx_dtype = jnp.float32
    if precision == "bf16x3":
        # pre-split weight blocks into stacked (hi, lo) bf16 pairs —
        # same VMEM bytes as the f32 originals
        wy_blocks = np.ascontiguousarray(
            np.swapaxes(_split_bf16_np(wy_blocks), 0, 1))
        wx_blocks = np.ascontiguousarray(
            np.swapaxes(_split_bf16_np(wx_blocks), 0, 1))
        wx_dtype = jnp.bfloat16
    build_args = (F, Hp, Wp, Hd, Wd, TY, TX, SY, SX, nty, ntx,
                  jnp.dtype(in_dtype).name, jnp.dtype(in_dtype).name,
                  precision)
    cached = dict(
        build_args=build_args,
        # host tables; device upload is lazy and never caches tracers
        # (see _plan_tables — jitted callers plan inside a trace)
        tables=(row_base, col_base, wy_blocks, wx_blocks),
        wx_dtype=wx_dtype,
    )
    _PREP_CACHE.put(prep_key, cached)
    if (Hp, Wp) != (H, W):
        frames = jnp.pad(frames, ((0, 0), (0, Hp - H), (0, Wp - W)))
    call = _build_separable_kernel_2d(*build_args, interpret)
    row_base_d, col_base_d, wy_d, wx_d = _plan_tables(cached)
    out = call(row_base_d, col_base_d, frames, wy_d, wx_d)
    return out[:, :Hd, :Wd]


def _finish_separable_pallas(frames, plan, interpret):
    if frames.dtype != plan["in_dtype"]:
        frames = frames.astype(plan["in_dtype"])
    m = plan["reshape_m"]
    if m:
        # parity split for the strided y-pass: free for row-major layout
        F, H, W = frames.shape
        frames = frames.reshape(F, H // m, m, W)
    call = _build_separable_kernel(*plan["build_args"], interpret)
    row_base, col_base, row_off, yw_flat, wy, wx = _plan_tables(plan)
    out = call(row_base, col_base, row_off, yw_flat, frames, wy, wx)
    return out[:, : plan["Hd"], : plan["Wd"]]
