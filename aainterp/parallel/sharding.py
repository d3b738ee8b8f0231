"""Multi-chip spatial sharding of the apply stage (SURVEY.md §5).

The reference is a single-threaded CPU program with no distribution; scaling
across chips is new capability.  Design (the scaling-book recipe): pick a
mesh, shard the *image plane* over a row axis and the batch over a data
axis, and let each chip compute its destination row band from its own source
row band plus a fixed-width halo fetched from ring neighbours with
``jax.lax.ppermute`` — neighbour traffic rides ICI, no all-gather of the
full image.  The halo width is computed on the host from the operator's row
bands (static, like Source.cpp:426-429's window bound but per-chip).

Row indices are the only subtlety: inside ``shard_map`` each chip sees local
rows; the banded operator's global ``y_start`` is rebased with
``axis_index`` so gathers stay in the chip-local (halo-extended) block.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax >= 0.8 top-level export; the experimental path is deprecated
    from jax import shard_map as _shard_map
    _SHMAP_REP_KW = "check_vma"  # the new API renamed check_rep
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map
    _SHMAP_REP_KW = "check_rep"


def shard_map(f, **kw):
    """jax.shard_map across the 0.8 rename (check_rep -> check_vma)."""
    if "check_rep" in kw:
        kw[_SHMAP_REP_KW] = kw.pop("check_rep")
    return _shard_map(f, **kw)

from ..ops import apply as apply_ops
from ..ops import overlap1d
from ..ops import weights as weights_ops




def _ell_axis_halo(base_axis, K: int, db: int, sb: int, n_dev: int) -> int:
    """Max overhang of any dst block's K-window bases past its own source
    block along one sharded axis (pass ``op.base[..., 0]`` for rows or
    ``op.base[..., 1].T`` for columns — slicing rows of the transpose
    slices dst columns).  Shared by the 1-D/2-D ELL applies and
    adjoints so halo semantics can never drift between routes."""
    halo = 0
    for i in range(n_dev):
        blk = base_axis[i * db: (i + 1) * db]
        halo = max(halo, i * sb - int(blk.min()),
                   int(blk.max()) + K - (i + 1) * sb)
    return max(halo, 0)


def _hint_sharding(out, mesh, spec):
    """with_sharding_constraint as a layout HINT that is safe everywhere.

    Under jit the constraint keeps the documented sharded layout
    (uneven dims included); eagerly it RESHARDS and raises on dims that
    don't divide their mesh axis — exactly the folded true-dst case
    whose indivisibility is the fold's added reach (ADVICE r4) — so
    eager calls simply skip the hint (values are already correct;
    layout hints are meaningless to materialised arrays)."""
    if not isinstance(out, jax.core.Tracer):
        return out
    from jax.sharding import NamedSharding

    return jax.lax.with_sharding_constraint(out, NamedSharding(mesh, spec))


def _folded_sharded_bands(op: weights_ops.SeparableOperator, n_dev: int):
    """Quadrant folding under row sharding, or None (use the rot90 path).

    The single-chip folding (weights.fold_quadrant_separable) replaces
    the rot90 of the source with flipped band tables; under sharding a
    flipped y band's window slides BACKWARD, which would mirror the halo
    into a full-ring exchange.  Reversing its dst rows restores a
    forward-sliding window (start of ``reverse_rows_band(flip_band(b))``
    is monotone non-decreasing), so the neighbour-hop ring halo is
    preserved and the residual permutation moves to the SMALL dst side:

      q=0:  out =   inner                      inner = Wy       A Wx^T
      q=1:  out = T(R inner)                   inner = R(Wx P_H) A Wy^T
      q=2:  out =   R inner                    inner = R(Wy P_H) A (Wx P_W)^T
      q=3:  out = T(inner)                     inner = Wx        A (Wy P_W)^T

    (R = dst-row reversal, T = trailing transpose, P = source flip.)
    The source-sized all-to-all a distributed rot90 needs becomes a
    dst-sized flip/transpose reshard — r^2 less ICI traffic at
    downscale ratio r.  Returns dict(y, x, post, post_inv, measures)
    where post maps the inner shard_map output to the final dst (and
    post_inv is its inverse permutation, used by the adjoint), and
    measures are the per-row raw sums paired with the INNER orientation
    (for the psum conservation flux).  None when the folded row counts
    don't divide ``n_dev`` (the rot90 path has different divisibility).
    """
    q = op.spec.quadrant % 4
    ry, rx = op.raw_row_sums
    flip, rr = overlap1d.flip_band, overlap1d.reverse_rows_band
    if q == 0:
        y_use, x_use, post, post_inv, meas = (
            op.wy, op.wx, None, None, (ry, rx))
    elif q == 1:
        y_use = rr(flip(op.wx))
        x_use = op.wy
        post = lambda o: jnp.swapaxes(jnp.flip(o, -2), -1, -2)
        post_inv = lambda g: jnp.flip(jnp.swapaxes(g, -1, -2), -2)
        meas = (rx[::-1], ry)
    elif q == 2:
        y_use = rr(flip(op.wy))
        x_use = flip(op.wx)
        post = post_inv = lambda o: jnp.flip(o, -2)
        meas = (ry[::-1], rx)
    else:
        y_use = op.wx
        x_use = flip(op.wy)
        post = post_inv = lambda o: jnp.swapaxes(o, -1, -2)
        meas = (rx, ry)
    if y_use.n_dst % n_dev != 0 or y_use.n_src % n_dev != 0:
        return None
    return dict(y=y_use, x=x_use, post=post, post_inv=post_inv,
                measures=meas)


def _row_halo(y_start: np.ndarray, band: int, n_src: int, n_dst: int,
              n_dev: int) -> int:
    """Max rows any chip needs beyond its own source row block (static)."""
    if n_dst % n_dev or n_src % n_dev:
        # a ValueError (not assert) so the guard survives python -O —
        # non-divisible rows would otherwise shard into ragged blocks
        # and return silently wrong output
        raise ValueError(
            "row-sharded apply requires divisible row counts "
            f"(dst {n_dst}, src {n_src}, devices {n_dev})")
    db = n_dst // n_dev
    sb = n_src // n_dev
    h = 0
    for i in range(n_dev):
        lo = int(y_start[i * db: (i + 1) * db].min())
        hi = int(y_start[i * db: (i + 1) * db].max()) + band
        h = max(h, i * sb - lo, hi - (i + 1) * sb)
    return max(h, 0)


def _halo_extend(x, h: int, axis_name: str, n_dev: int, axis: int = -2):
    """Extend a sharded image axis (rows -2, or cols -1) by h entries from
    ring neighbours.

    Multi-hop: when the halo exceeds the per-chip block (steep rotations,
    narrow shards), hop k in 1..ceil(h/sb) fetches a (partial on the last
    hop) block from the chips k positions away on each side, each hop one
    ``ppermute`` over ICI.  Since band indices are in [0, n_src) the halo
    is at most (n_dev-1)*sb, so every valid operator is coverable.

    Missing neighbours at the edges contribute zeros (ppermute semantics),
    which is correct because the rebased band indices never reach the pad
    for edge chips (global indices are in-range by construction).
    """
    if h == 0:
        return x
    assert axis in (-2, -1)
    sb = x.shape[axis]
    hops = -(-h // sb)
    if hops > n_dev - 1:
        # can trigger for clamped bands (e.g. compat operators with
        # Kc > qH) whose windows reach past the full ring; a bare assert
        # here would be stripped under -O and silently zero the halo
        raise ValueError(
            f"halo of {h} needs {hops} ring hops but only "
            f"{n_dev - 1} neighbours exist (per-chip block {sb}); "
            "use fewer shards along this axis for this operator"
        )

    def take(lo, hi):
        sl = slice(lo, hi)
        return x[..., sl, :] if axis == -2 else x[..., sl]

    parts_prev, parts_next = [], []
    for k in range(1, hops + 1):
        hk = min(sb, h - (k - 1) * sb)  # partial block on the last hop
        # leading hk entries of chip i+k -> after my block
        parts_next.append(jax.lax.ppermute(
            take(0, hk), axis_name, [(j, j - k) for j in range(k, n_dev)]
        ))
        # trailing hk entries of chip i-k -> before my block
        parts_prev.append(jax.lax.ppermute(
            take(sb - hk, sb), axis_name,
            [(j, j + k) for j in range(n_dev - k)]
        ))
    return jnp.concatenate(parts_prev[::-1] + [x] + parts_next, axis=axis)


def sharded_apply_banded(
    frames: jax.Array,
    y_band,
    x_band,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
) -> jax.Array:
    """Row-sharded banded apply from plain Band1D operators (used by both
    the image separable path and the lat-lon conservative regrid)."""
    n_dev = mesh.shape[row_axis]
    qH, Hd = y_band.n_src, y_band.n_dst
    halo = _row_halo(y_band.start, y_band.band, qH, Hd, n_dev)
    sb = qH // n_dev

    y_start = jnp.asarray(y_band.start)
    y_w = jnp.asarray(y_band.weights, dtype=jnp.float32)
    x_start = jnp.asarray(x_band.start)
    x_w = jnp.asarray(x_band.weights, dtype=jnp.float32)

    batch_spec = (P(data_axis),) if data_axis else (P(),)
    row_only = P(*(batch_spec[0] + (row_axis, None)))
    vec_row = P(row_axis)
    mat_row = P(row_axis, None)

    # aligned integer-ratio fast path for the local contraction (the
    # config-5 regrid: 3.1x the banded form single-chip — see
    # ops/apply.aligned_axis_plan).  A strict global partition
    # (c0 == 0, qH == m*Hd) shards compatibly: chip i's local effective
    # starts are m*r + halo for EVERY chip, so one static plan serves the
    # SPMD body with the per-chip (Hd/n, m) tap blocks as a sharded
    # operand.  Traced band tables or f64 weights fall through.
    aligned = None
    if (Hd % n_dev == 0 and frames.dtype == jnp.float32
            and not any(isinstance(t, jax.core.Tracer)
                        for t in (y_band.start, y_band.weights,
                                  x_band.start, x_band.weights))):
        yp = apply_ops.aligned_axis_plan(
            np.asarray(y_band.start), np.asarray(y_band.weights), qH)
        if (yp is not None and yp["c0"] == 0
                and yp["m"] * Hd == qH):
            xp = apply_ops.aligned_axis_plan(
                np.asarray(x_band.start), np.asarray(x_band.weights),
                x_band.n_src)
            if xp is not None:
                aligned = (yp, xp)

    if aligned is not None:
        yp, xp = aligned
        wyk = jnp.asarray(yp["wk"], jnp.float32)  # (Hd, m) sharded by rows

        def local_fn_aligned(frames_blk, wyk_blk):
            ext = _halo_extend(frames_blk, halo, row_axis, n_dev)
            return apply_ops.apply_separable_aligned(
                ext,
                dict(m=yp["m"], c0=halo, wk=wyk_blk),
                xp,
            )

        fn = shard_map(
            local_fn_aligned,
            mesh=mesh,
            in_specs=(row_only, mat_row),
            out_specs=row_only,
            check_rep=False,
        )
        return fn(frames, wyk)

    def local_fn(frames_blk, y_start_blk, y_w_blk, x_start_l, x_w_l):
        i = jax.lax.axis_index(row_axis)
        ext = _halo_extend(frames_blk, halo, row_axis, n_dev)
        # rebase global row indices into the halo-extended local block
        local_start = y_start_blk - (i * sb - halo)
        return apply_ops.apply_separable_banded(
            ext, local_start, y_w_blk, x_start_l, x_w_l
        )

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(row_only, vec_row, mat_row, P(None), P(None, None)),
        out_specs=row_only,
        check_rep=False,
    )
    return fn(frames, y_start, y_w, x_start, x_w)


def _sharded_pallas_plan(y_band, x_band, n_dev: int, halo: int,
                         tile_y: int = 128, tile_x: int = 128,
                         u8: bool = False, interpret: bool = False):
    """Host-side per-chip kernel plan for the row-sharded Pallas apply.

    Each chip's local y band (rebased into its halo-extended source block
    of Hloc = sb + 2*halo rows) is densified into per-row-tile blocks with
    ONE uniform span SY across chips/tiles, so a single SPMD kernel serves
    every shard; the x plan is chip-independent.  Returns None when the
    geometry is off the 1-D kernel's envelope (W % 128 != 0, span > Hloc).

    ``u8`` builds the uint8 variant: 32-aligned DMA bases, a 4-multiple
    span, and the wy columns pre-permuted for the kernel's bitcast
    byte-split unpack (pack order probed from the live backend — pass the
    caller's ``interpret`` so the probe runs on the same backend).
    """
    from ..ops.pallas_apply import (_densify_row_band, _round_up,
                                    _u8_pack_order)

    qH, Hd = y_band.n_src, y_band.n_dst
    W, Wd = x_band.n_src, x_band.n_dst
    if W % 128 != 0:
        return None
    db, sb = Hd // n_dev, qH // n_dev
    Hloc = sb + 2 * halo
    TY = min(tile_y, db)
    if db % TY != 0:
        for cand in range(TY - TY % 8, 7, -8):
            if db % cand == 0:
                TY = cand
                break
        else:
            return None
    nty = db // TY
    ys = np.asarray(y_band.start).astype(np.int64)
    yw = np.asarray(y_band.weights, dtype=np.float32)
    band = yw.shape[1]
    base_align = 32 if u8 else 8
    # spans stay 8-aligned even for u8: Mosaic requires copy lengths to
    # be sublane-tile aligned on VMEM-resident refs (and 8 % 4 == 0
    # keeps the bitcast's 4-row grouping valid)
    span_align = 8

    # local (rebased) starts per chip; uniform SY across all (chip, tile)
    lo = np.zeros((n_dev, nty), np.int64)
    hi = np.zeros((n_dev, nty), np.int64)
    for i in range(n_dev):
        loc = ys[i * db: (i + 1) * db] - (i * sb - halo)
        if loc.min() < 0 or loc.max() + band > Hloc:
            return None  # halo bound violated (shouldn't happen)
        for t in range(nty):
            rows = loc[t * TY: (t + 1) * TY]
            lo[i, t] = (int(rows.min()) // base_align) * base_align
            hi[i, t] = int(rows.max()) + band
    base = np.clip(lo, 0, None)
    SY = _round_up(int((hi - base).max()), span_align)
    # the per-chip block is OURS to shape: when the aligned span spills
    # past the halo-extended height (tiny shards), pad the local block
    # with zero rows instead of rejecting — spill rows carry weight 0
    Hpad = _round_up(max(Hloc, int((base + SY).max())), base_align)
    wy_blocks = np.zeros((n_dev, nty, TY, SY), np.float32)
    for i in range(n_dev):
        loc = ys[i * db: (i + 1) * db] - (i * sb - halo)
        for t in range(nty):
            for r in range(TY):
                off = int(loc[t * TY + r]) - int(base[i, t])
                wy_blocks[i, t, r, off: off + band] = yw[i * db + t * TY + r]
    if u8:
        perm = _u8_pack_order(SY, interpret)
        wy_blocks = np.ascontiguousarray(wy_blocks[:, :, :, list(perm)])

    xs = np.asarray(x_band.start)
    xw = np.asarray(x_band.weights, dtype=np.float32)
    TX = tile_x
    col_base, wx_t, SX = _densify_row_band(xs, xw, W, TX, align=128)
    if SX > W:
        return None
    wx_blocks = np.ascontiguousarray(np.swapaxes(wx_t, 1, 2))
    return dict(TY=TY, TX=TX, SY=SY, SX=SX, nty=nty,
                ntx=wx_blocks.shape[0], Hloc=Hloc, Hpad=Hpad, db=db, sb=sb,
                band=band, u8_bitcast=bool(u8),
                row_base=base.astype(np.int32), wy_blocks=wy_blocks,
                col_base=col_base.astype(np.int32), wx_blocks=wx_blocks)


def sharded_apply_banded_pallas(
    frames: jax.Array,
    y_band,
    x_band,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    interpret: bool = False,
) -> jax.Array:
    """Row-sharded apply with the Pallas MXU kernel per shard.

    Same collective structure as sharded_apply_banded (ring-halo exchange
    over ICI, then a chip-local apply), but the local contraction runs the
    1-D Pallas kernel (311 vs ~15 Gpixel/s single-chip) on each chip's
    halo-extended block.  Per-chip band plans ride as row-sharded kernel
    inputs.  Raises ValueError off the kernel envelope — callers fall back
    to sharded_apply_banded.
    """
    from ..ops.pallas_apply import _build_separable_kernel

    n_dev = mesh.shape[row_axis]
    qH, Hd = y_band.n_src, y_band.n_dst
    Wd = x_band.n_dst
    halo = _row_halo(y_band.start, y_band.band, qH, Hd, n_dev)
    u8 = frames.dtype == jnp.uint8
    plan = _sharded_pallas_plan(y_band, x_band, n_dev, halo,
                                u8=u8, interpret=interpret)
    if plan is None:
        raise ValueError("geometry off the sharded Pallas kernel envelope")

    if frames.dtype not in (jnp.bfloat16, jnp.float32, jnp.uint8):
        frames = frames.astype(jnp.float32)
    lead = frames.ndim - 2
    assert lead in (0, 1)
    Bloc = 1
    if lead:
        n_data = mesh.shape[data_axis] if data_axis else 1
        Bloc = frames.shape[0] // n_data
    TY, TX, SY, SX = plan["TY"], plan["TX"], plan["SY"], plan["SX"]
    nty, ntx, db, sb = plan["nty"], plan["ntx"], plan["db"], plan["sb"]
    Hloc, Hpad, W = plan["Hloc"], plan["Hpad"], x_band.n_src
    dname = jnp.dtype(frames.dtype).name
    n_rows = nty * TY
    ky = plan["band"]

    call = _build_separable_kernel(
        Bloc, Hpad, W, db, Wd, TY, TX, SY, SX, nty, ntx, ky, SY,
        dname, dname, "mxu", 0, None, -1, 0, False, True,
        u8_bitcast=plan["u8_bitcast"], interpret=interpret)

    row_off = jnp.zeros(n_rows, jnp.int32)        # vpu-path dummies
    yw_flat = jnp.zeros(n_rows * ky, jnp.float32)
    row_base = jnp.asarray(plan["row_base"])      # (n_dev, nty)
    wy_blocks = jnp.asarray(plan["wy_blocks"])    # (n_dev, nty, TY, SY)
    col_base = jnp.asarray(plan["col_base"])
    wx_blocks = jnp.asarray(plan["wx_blocks"])

    batch_spec = (P(data_axis),) if data_axis else (P(),)
    row_only = P(*(batch_spec[0] + (row_axis, None)))

    def local_fn(frames_blk, rb, wyb, cb, ro, ywf, wxb):
        ext = _halo_extend(frames_blk, halo, row_axis, n_dev)
        if Hpad > Hloc:
            # zero rows so the 8-aligned band spans stay DMA-in-range;
            # they only ever meet zero weights (see _sharded_pallas_plan)
            pad = [(0, 0)] * (ext.ndim - 2) + [(0, Hpad - Hloc), (0, 0)]
            ext = jnp.pad(ext, pad)
        squeeze = frames_blk.ndim == 2
        if squeeze:
            ext = ext[None]
        out = call(rb[0], cb, ro, ywf, ext, wyb[0], wxb)
        out = out[:, :db, :Wd]
        return out[0] if squeeze else out

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(row_only, P(row_axis, None), P(row_axis, None, None, None),
                  P(None), P(None), P(None), P(None, None, None)),
        out_specs=row_only,
        check_rep=False,
    )
    return fn(frames, row_base, wy_blocks, col_base, row_off, yw_flat,
              wx_blocks)


def sharded_apply_separable(
    frames: jax.Array,
    op: weights_ops.SeparableOperator,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    impl: str = "auto",
    interpret: bool = False,
    conserve: bool = False,
):
    """Apply a separable operator with dst/src rows sharded over ``row_axis``
    and leading batch dims over ``data_axis``.

    frames: (B, H, W) (or (H, W) with data_axis=None).  Returns (B, Hd, Wd)
    with the same sharding layout.

    impl: 'auto' uses the per-shard Pallas MXU kernel on TPU (falling back
    to the XLA banded local apply off its envelope); 'pallas' / 'banded'
    force.

    conserve: also return the replicated (2,) [flux_dst, flux_src] global
    conservation pair (psum over the mesh — parallel/conserve.py); the two
    entries agree to fp tolerance iff every chip's halo + local contraction
    is correct.  The multi-chip form of Source.cpp:573-577.

    quadrant != 0 folds the rot90 pre-rotation (Source.cpp:159-172) into
    the band tables (_folded_sharded_bands): the source stays sharded in
    its original orientation and only the SMALL dst output pays a
    flip/transpose reshard; when the folded row counts don't divide the
    mesh, the global-rot90 route (source-sized all-to-all) is the
    fallback.
    """
    n_dev = mesh.shape[row_axis]
    u8 = frames.dtype == jnp.uint8  # u8 in -> u8 out, like apply_operator
    if u8 and conserve:
        raise ValueError(
            "conserve=True needs float outputs (the u8 round+saturate "
            "quantisation breaks the exact flux identity); cast the "
            "frames to float32 for conservation checks")
    fold = _folded_sharded_bands(op, n_dev)
    if fold is None:
        # folded divisibility failed: global jnp.rot90 (an all-to-all of
        # the full source over ICI) then the unfolded bands
        frames = apply_ops.quadrant_rotate(frames, op.spec.quadrant)
        fold = dict(y=op.wy, x=op.wx, post=None, post_inv=None,
                    measures=op.raw_row_sums)
    y_use, x_use, post = fold["y"], fold["x"], fold["post"]
    if impl not in ("auto", "pallas", "banded"):
        raise ValueError(
            f"unknown impl {impl!r} for the sharded separable apply; "
            "expected 'auto', 'pallas', or 'banded'")
    forced = impl != "auto"
    if impl == "auto":
        impl = ("pallas" if jax.devices()[0].platform == "tpu" or interpret
                else "banded")
    out = None
    if impl == "pallas":
        try:
            out = sharded_apply_banded_pallas(
                frames, y_use, x_use, mesh, data_axis=data_axis,
                row_axis=row_axis, interpret=interpret)
        except ValueError:
            # off the kernel envelope: the auto route degrades to the XLA
            # banded local apply, but an explicitly forced impl='pallas'
            # must not silently run a ~15x slower different path
            if forced:
                raise
    if out is None:
        out = sharded_apply_banded(
            frames.astype(jnp.float32) if u8 else frames,
            y_use, x_use, mesh, data_axis=data_axis,
            row_axis=row_axis)
        if u8:  # quantise the XLA fallback identically to the kernel
            out = jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)
    if conserve:
        from .conserve import separable_flux_factors, sharded_flux_separable

        # factors pair with the INNER orientation (pre-post), where both
        # frames and out are row-sharded to match the band tables
        factors = separable_flux_factors(y_use, x_use,
                                         raw_sums=fold["measures"])
        flux = sharded_flux_separable(frames, out, factors, mesh,
                                      data_axis=data_axis,
                                      row_axis=row_axis)
    if post is not None:
        out = post(out)
        # restore the documented row-sharded layout on the dst array (a
        # dst-sized collective — the whole point of the folding is that
        # the SOURCE never pays one)
        batch = (P(data_axis),) if data_axis else (P(),)
        spec = P(*(batch[0] + (row_axis, None)))
        out = _hint_sharding(
            out, mesh, spec)
    if not conserve:
        return out
    return out, flux


def _folded_sharded_bands_2d(op: weights_ops.SeparableOperator,
                             n_r: int, n_c: int):
    """Quadrant folding under 2-D (rows x cols) sharding, or None.

    Extends _folded_sharded_bands: with columns sharded too, the X band
    must also slide forward, so flipped x bands get the same
    reverse-dst-order treatment as flipped y bands
    (``rr(flip(wx))``) and the residual dst-col reversal moves into
    ``post``.  Every quadrant's residual permutation is dst-sized
    (flip/rot180/transpose of the SMALL output) — the 2-D path's only
    source-sized all-to-all (the global rot90 reshard) disappears:

      q=0:  out =      inner          y=wy           x=wx
      q=1:  out = T(R_r inner)        y=rr(flip(wx)) x=wy
      q=2:  out = rot180(inner)       y=rr(flip(wy)) x=rr(flip(wx))
      q=3:  out = R_r(T(inner))       y=wx           x=rr(flip(wy))

    (R_r = dst-row reversal AFTER the trailing transpose for q=3, i.e.
    post = flip(swapaxes(o), -2); T = trailing transpose.)  measures
    pair with the inner orientation for the conservation flux.
    """
    q = op.spec.quadrant % 4
    ry, rx = op.raw_row_sums
    flip, rr = overlap1d.flip_band, overlap1d.reverse_rows_band
    if q == 0:
        y_use, x_use, post, post_inv, meas = (
            op.wy, op.wx, None, None, (ry, rx))
    elif q == 1:
        y_use = rr(flip(op.wx))
        x_use = op.wy
        post = lambda o: jnp.swapaxes(jnp.flip(o, -2), -1, -2)
        post_inv = lambda g: jnp.flip(jnp.swapaxes(g, -1, -2), -2)
        meas = (rx[::-1], ry)
    elif q == 2:
        y_use = rr(flip(op.wy))
        x_use = rr(flip(op.wx))
        post = post_inv = lambda o: jnp.flip(jnp.flip(o, -2), -1)
        meas = (ry[::-1], rx[::-1])
    else:
        y_use = op.wx
        x_use = rr(flip(op.wy))
        post = lambda o: jnp.flip(jnp.swapaxes(o, -1, -2), -2)
        post_inv = lambda g: jnp.swapaxes(jnp.flip(g, -2), -1, -2)
        meas = (rx, ry[::-1])
    if (y_use.n_dst % n_r or y_use.n_src % n_r
            or x_use.n_dst % n_c or x_use.n_src % n_c):
        return None
    return dict(y=y_use, x=x_use, post=post, post_inv=post_inv,
                measures=meas)


def _sharded_pallas_plan_2d(y_band, x_band, n_r: int, n_c: int,
                            halo_y: int, halo_x: int,
                            tile_y: int = 128, tile_x: int = 128,
                            u8: bool = False, interpret: bool = False):
    """Host-side per-chip kernel plan for the 2-D-sharded Pallas apply.

    Generalises _sharded_pallas_plan to a rows x cols mesh: chip (i, j)'s
    local block is (sb_r + 2*halo_y) x (sb_c + 2*halo_x) — with columns
    sharded the local width is arbitrary (never 128-aligned), so the
    block is zero-padded to Wpad % 128 == 0 INSIDE the shard and the
    per-col-chip x bands are densified against that padded width (pad
    columns only ever meet zero weights).  One uniform (SY, SX) across
    all (i, j) chips keeps the shard_map body a single SPMD kernel; the
    y tables shard over the rows axis and the x tables over the cols
    axis.  Returns None when no tile height divides the per-chip dst
    rows.

    ``u8`` builds the uint8 variant exactly like the 1-D plan
    (_sharded_pallas_plan): 32-aligned band-DMA bases (8-bit VMEM tiles
    pack (32, 128)), 8-multiple spans, and the wy columns pre-permuted
    for the kernel's bitcast byte-split unpack (pack order probed from
    the live backend, hence ``interpret``).
    """
    from ..ops.pallas_apply import _round_up, _u8_pack_order

    qH, Hd = y_band.n_src, y_band.n_dst
    W, Wd = x_band.n_src, x_band.n_dst
    db_r, sb_r = Hd // n_r, qH // n_r
    db_c, sb_c = Wd // n_c, W // n_c
    Hloc = sb_r + 2 * halo_y
    Wloc = sb_c + 2 * halo_x
    TY = min(tile_y, db_r)
    if db_r % TY != 0 or TY % 8 != 0:   # Mosaic sublane granularity
        for cand in range(TY - TY % 8, 7, -8):
            if db_r % cand == 0:
                TY = cand
                break
        else:
            return None
    nty = db_r // TY

    ys = np.asarray(y_band.start).astype(np.int64)
    yw = np.asarray(y_band.weights, dtype=np.float32)
    ky = yw.shape[1]
    base_align = 32 if u8 else 8
    lo = np.zeros((n_r, nty), np.int64)
    hi = np.zeros((n_r, nty), np.int64)
    for i in range(n_r):
        loc = ys[i * db_r: (i + 1) * db_r] - (i * sb_r - halo_y)
        if loc.min() < 0 or loc.max() + ky > Hloc:
            return None  # halo bound violated (shouldn't happen)
        for t in range(nty):
            rows = loc[t * TY: (t + 1) * TY]
            lo[i, t] = (int(rows.min()) // base_align) * base_align
            hi[i, t] = int(rows.max()) + ky
    row_base = np.clip(lo, 0, None)
    # spans stay 8-aligned even for u8 (copy lengths need sublane-tile
    # alignment on VMEM refs; 8 % 4 == 0 keeps the bitcast grouping valid)
    SY = _round_up(int((hi - row_base).max()), 8)
    Hpad = _round_up(max(Hloc, int((row_base + SY).max())), base_align)
    wy_blocks = np.zeros((n_r, nty, TY, SY), np.float32)
    for i in range(n_r):
        loc = ys[i * db_r: (i + 1) * db_r] - (i * sb_r - halo_y)
        for t in range(nty):
            for r in range(TY):
                off = int(loc[t * TY + r]) - int(row_base[i, t])
                wy_blocks[i, t, r, off: off + ky] = yw[i * db_r + t * TY + r]
    if u8:
        perm = _u8_pack_order(SY, interpret)
        wy_blocks = np.ascontiguousarray(wy_blocks[:, :, :, list(perm)])

    xs = np.asarray(x_band.start).astype(np.int64)
    xw = np.asarray(x_band.weights, dtype=np.float32)
    kx = xw.shape[1]
    TX = tile_x
    ntx = -(-db_c // TX)
    xlo = np.zeros((n_c, ntx), np.int64)
    xhi = np.zeros((n_c, ntx), np.int64)
    for j in range(n_c):
        loc = xs[j * db_c: (j + 1) * db_c] - (j * sb_c - halo_x)
        if loc.min() < 0 or loc.max() + kx > Wloc:
            return None
        for t in range(ntx):
            cols = loc[t * TX: min((t + 1) * TX, db_c)]
            xlo[j, t] = (int(cols.min()) // 128) * 128
            xhi[j, t] = int(cols.max()) + kx
    col_base = np.clip(xlo, 0, None)
    SX = _round_up(int((xhi - col_base).max()), 128)
    Wpad = _round_up(max(Wloc, int((col_base + SX).max())), 128)
    wx_blocks = np.zeros((n_c, ntx, TX, SX), np.float32)
    for j in range(n_c):
        loc = xs[j * db_c: (j + 1) * db_c] - (j * sb_c - halo_x)
        for t in range(ntx):
            for r in range(min(TX, db_c - t * TX)):
                off = int(loc[t * TX + r]) - int(col_base[j, t])
                wx_blocks[j, t, r, off: off + kx] = xw[j * db_c + t * TX + r]
    # kernel consumes x blocks as (ntx, SX, TX)
    wx_blocks = np.ascontiguousarray(np.swapaxes(wx_blocks, 2, 3))
    return dict(TY=TY, TX=TX, SY=SY, SX=SX, nty=nty, ntx=ntx,
                Hloc=Hloc, Hpad=Hpad, Wloc=Wloc, Wpad=Wpad,
                db_r=db_r, sb_r=sb_r, db_c=db_c, sb_c=sb_c, ky=ky,
                u8_bitcast=bool(u8),
                row_base=row_base.astype(np.int32), wy_blocks=wy_blocks,
                col_base=col_base.astype(np.int32), wx_blocks=wx_blocks)


def sharded_apply_banded_2d_pallas(
    frames: jax.Array,
    y_band,
    x_band,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    col_axis: str = "cols",
    interpret: bool = False,
) -> jax.Array:
    """2-D-sharded apply with the Pallas MXU kernel per shard.

    Same collective structure as sharded_apply_banded_2d (one ring-halo
    exchange per mesh axis), but each chip's local contraction runs the
    separable Pallas kernel on its zero-padded halo-extended block —
    per-(row-chip) y tables and per-(col-chip) x tables ride as sharded
    kernel inputs (see _sharded_pallas_plan_2d).  Raises ValueError off
    the plan envelope — callers fall back to sharded_apply_banded_2d.
    """
    from ..ops.pallas_apply import _build_separable_kernel

    n_r = mesh.shape[row_axis]
    n_c = mesh.shape[col_axis]
    qH, Hd = y_band.n_src, y_band.n_dst
    W, Wd = x_band.n_src, x_band.n_dst
    halo_y = _row_halo(y_band.start, y_band.band, qH, Hd, n_r)
    halo_x = _row_halo(x_band.start, x_band.band, W, Wd, n_c)
    u8 = frames.dtype == jnp.uint8  # u8 in -> u8 out, like the 1-D path
    plan = _sharded_pallas_plan_2d(y_band, x_band, n_r, n_c, halo_y, halo_x,
                                   u8=u8, interpret=interpret)
    if plan is None:
        raise ValueError("geometry off the 2-D sharded Pallas kernel "
                         "envelope")

    if frames.dtype not in (jnp.bfloat16, jnp.float32, jnp.uint8):
        frames = frames.astype(jnp.float32)
    lead = frames.ndim - 2
    assert lead in (0, 1)
    Bloc = 1
    if lead:
        n_data = mesh.shape[data_axis] if data_axis else 1
        Bloc = frames.shape[0] // n_data
    TY, TX, SY, SX = plan["TY"], plan["TX"], plan["SY"], plan["SX"]
    nty, ntx = plan["nty"], plan["ntx"]
    db_r, db_c = plan["db_r"], plan["db_c"]
    Hloc, Hpad = plan["Hloc"], plan["Hpad"]
    Wloc, Wpad = plan["Wloc"], plan["Wpad"]
    ky = plan["ky"]
    dname = jnp.dtype(frames.dtype).name
    n_rows = nty * TY

    call = _build_separable_kernel(
        Bloc, Hpad, Wpad, db_r, db_c, TY, TX, SY, SX, nty, ntx, ky, SY,
        dname, dname, "mxu", 0, None, -1, 0, False, True,
        u8_bitcast=plan["u8_bitcast"], interpret=interpret)

    row_off = jnp.zeros(n_rows, jnp.int32)        # vpu-path dummies
    yw_flat = jnp.zeros(n_rows * ky, jnp.float32)
    row_base = jnp.asarray(plan["row_base"])      # (n_r, nty)
    wy_blocks = jnp.asarray(plan["wy_blocks"])    # (n_r, nty, TY, SY)
    col_base = jnp.asarray(plan["col_base"])      # (n_c, ntx)
    wx_blocks = jnp.asarray(plan["wx_blocks"])    # (n_c, ntx, SX, TX)

    batch = (P(data_axis),) if data_axis else (P(),)
    img2d = P(*(batch[0] + (row_axis, col_axis)))

    def local_fn(frames_blk, rb, wyb, cb, wxb, ro, ywf):
        ext = _halo_extend(frames_blk, halo_y, row_axis, n_r, axis=-2)
        ext = _halo_extend(ext, halo_x, col_axis, n_c, axis=-1)
        # zero rows/cols so the 8-/128-aligned band spans stay DMA-in-
        # range; they only ever meet zero weights (_sharded_pallas_plan_2d)
        if Hpad > Hloc or Wpad > Wloc:
            pad = ([(0, 0)] * (ext.ndim - 2)
                   + [(0, Hpad - Hloc), (0, Wpad - Wloc)])
            ext = jnp.pad(ext, pad)
        squeeze = frames_blk.ndim == 2
        if squeeze:
            ext = ext[None]
        out = call(rb[0], cb[0], ro, ywf, ext, wyb[0], wxb[0])
        out = out[:, :db_r, :db_c]
        return out[0] if squeeze else out

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(img2d, P(row_axis, None), P(row_axis, None, None, None),
                  P(col_axis, None), P(col_axis, None, None, None),
                  P(None), P(None)),
        out_specs=img2d,
        check_rep=False,
    )
    return fn(frames, row_base, wy_blocks, col_base, wx_blocks,
              row_off, yw_flat)


def sharded_apply_banded_2d(
    frames: jax.Array,
    y_band,
    x_band,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    col_axis: str = "cols",
) -> jax.Array:
    """2-D-sharded banded apply from plain Band1D operators: rows over
    ``row_axis``, columns over ``col_axis``, one ring-halo exchange per
    mesh axis.  Shared by the separable 2-D forward AND its adjoint
    (the transpose of a banded operator is banded, so the cotangent
    flows back through this same function with transposed bands)."""
    n_r = mesh.shape[row_axis]
    n_c = mesh.shape[col_axis]
    qH, Hd = y_band.n_src, y_band.n_dst
    W, Wd = x_band.n_src, x_band.n_dst
    halo_y = _row_halo(y_band.start, y_band.band, qH, Hd, n_r)
    halo_x = _row_halo(x_band.start, x_band.band, W, Wd, n_c)
    sb_r, sb_c = qH // n_r, W // n_c

    y_start = jnp.asarray(y_band.start)
    y_w = jnp.asarray(y_band.weights, dtype=jnp.float32)
    x_start = jnp.asarray(x_band.start)
    x_w = jnp.asarray(x_band.weights, dtype=jnp.float32)

    batch = (P(data_axis),) if data_axis else (P(),)
    img2d = P(*(batch[0] + (row_axis, col_axis)))

    # aligned integer-ratio local contraction, both axes (the 1-D-sharded
    # analogue lives in sharded_apply_banded): strict partitions shard
    # compatibly on each axis, so chip (i, j)'s local effective starts
    # are my*r + halo_y / mx*c + halo_x for every chip and the per-chip
    # tap blocks ride as sharded operands.  Adjoint (transposed-band)
    # calls never qualify — a partition's transpose is an upsampling
    # band — so they keep the banded local apply below.
    if (Hd % n_r == 0 and Wd % n_c == 0 and frames.dtype == jnp.float32
            and not any(isinstance(t, jax.core.Tracer)
                        for t in (y_band.start, y_band.weights,
                                  x_band.start, x_band.weights))):
        yp = apply_ops.aligned_axis_plan(
            np.asarray(y_band.start), np.asarray(y_band.weights), qH)
        xp = apply_ops.aligned_axis_plan(
            np.asarray(x_band.start), np.asarray(x_band.weights), W)
        if (yp is not None and xp is not None
                and yp["c0"] == 0 and yp["m"] * Hd == qH
                and xp["c0"] == 0 and xp["m"] * Wd == W):
            wyk = jnp.asarray(yp["wk"], jnp.float32)   # (Hd, my) by rows
            wxk = jnp.asarray(xp["wk"], jnp.float32)   # (Wd, mx) by cols

            def local_fn_aligned(frames_blk, wyk_blk, wxk_blk):
                ext = _halo_extend(frames_blk, halo_y, row_axis, n_r,
                                   axis=-2)
                ext = _halo_extend(ext, halo_x, col_axis, n_c, axis=-1)
                return apply_ops.apply_separable_aligned(
                    ext,
                    dict(m=yp["m"], c0=halo_y, wk=wyk_blk),
                    dict(m=xp["m"], c0=halo_x, wk=wxk_blk),
                )

            fn = shard_map(
                local_fn_aligned,
                mesh=mesh,
                in_specs=(img2d, P(row_axis, None), P(col_axis, None)),
                out_specs=img2d,
                check_rep=False,
            )
            return fn(frames, wyk, wxk)

    def local_fn(frames_blk, ys_blk, yw_blk, xs_blk, xw_blk):
        i = jax.lax.axis_index(row_axis)
        j = jax.lax.axis_index(col_axis)
        ext = _halo_extend(frames_blk, halo_y, row_axis, n_r, axis=-2)
        ext = _halo_extend(ext, halo_x, col_axis, n_c, axis=-1)
        ly = ys_blk - (i * sb_r - halo_y)
        lx = xs_blk - (j * sb_c - halo_x)
        return apply_ops.apply_separable_banded(ext, ly, yw_blk, lx, xw_blk)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(img2d, P(row_axis), P(row_axis, None),
                  P(col_axis), P(col_axis, None)),
        out_specs=img2d,
        check_rep=False,
    )
    return fn(frames, y_start, y_w, x_start, x_w)


def sharded_apply_separable_2d(
    frames: jax.Array,
    op: weights_ops.SeparableOperator,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    col_axis: str = "cols",
    impl: str = "auto",
    interpret: bool = False,
    conserve: bool = False,
):
    """Apply a separable operator with BOTH image axes sharded — rows over
    ``row_axis`` and columns over ``col_axis`` of a (data, rows, cols)
    mesh — plus leading batch dims over ``data_axis``.

    2-D spatial sharding is the scaling form for frames too large for a
    1-D row split (a row-only split of an NxN frame stops paying off once
    per-chip strips go below the band height; a rows x cols mesh keeps
    per-chip blocks square).  Collective structure: one ring-halo
    exchange per mesh axis — rows first, then columns of the
    row-extended block, so corner regions arrive transitively through
    the edge neighbour (chip (i, j+-1)'s block already contains its own
    row halo from (i+-1, j+-1)); both rides are neighbour ppermutes over
    ICI, never an all-gather.  Each chip then runs the local contraction
    on its (sb_r + 2*halo_y) x (sb_c + 2*halo_x) block with BOTH band
    tables rebased by its mesh coordinates.

    impl: 'auto' uses the per-shard Pallas MXU kernel on TPU (falling
    back to the XLA banded local apply off its envelope); 'pallas' /
    'banded' force.

    uint8 frames keep the u8-in -> u8-out serving contract exactly like
    the 1-D route (sharded_apply_separable): the per-shard kernel rides
    8-bit band DMAs with the bitcast byte-split unpack, and the XLA
    fallback quantises identically (round + saturate).

    quadrant != 0 folds the rot90 into the band tables
    (_folded_sharded_bands_2d): the source stays sharded in its original
    orientation and only the SMALL dst output pays a
    flip/rot180/transpose reshard; when the folded row/col counts don't
    divide the mesh, the global-rot90 route (source-sized all-to-all) is
    the fallback.

    conserve: also return the replicated (2,) [flux_dst, flux_src] psum
    pair (see parallel/conserve.py), here reduced over all three mesh
    axes.  Requires dst/src rows divisible by the rows axis AND dst/src
    cols divisible by the cols axis.
    """
    from .conserve import separable_flux_factors

    n_r, n_c = mesh.shape[row_axis], mesh.shape[col_axis]
    u8 = frames.dtype == jnp.uint8  # u8 in -> u8 out, like the 1-D path
    if u8 and conserve:
        raise ValueError(
            "conserve=True needs float outputs (the u8 round+saturate "
            "quantisation breaks the exact flux identity); cast the "
            "frames to float32 for conservation checks")
    fold = _folded_sharded_bands_2d(op, n_r, n_c)
    if fold is None:
        frames = apply_ops.quadrant_rotate(frames, op.spec.quadrant)
        fold = dict(y=op.wy, x=op.wx, post=None, post_inv=None,
                    measures=op.raw_row_sums)
    y_band, x_band, post = fold["y"], fold["x"], fold["post"]
    if impl not in ("auto", "pallas", "banded"):
        raise ValueError(
            f"unknown impl {impl!r} for the sharded separable apply; "
            "expected 'auto', 'pallas', or 'banded'")
    forced = impl != "auto"
    if impl == "auto":
        impl = ("pallas" if jax.devices()[0].platform == "tpu" or interpret
                else "banded")
    out = None
    if impl == "pallas":
        try:
            out = sharded_apply_banded_2d_pallas(
                frames, y_band, x_band, mesh, data_axis=data_axis,
                row_axis=row_axis, col_axis=col_axis, interpret=interpret)
        except ValueError:
            if forced:
                raise
    if out is None:
        out = sharded_apply_banded_2d(
            frames.astype(jnp.float32) if u8 else frames,
            y_band, x_band, mesh, data_axis=data_axis,
            row_axis=row_axis, col_axis=col_axis)
        if u8:  # quantise the XLA fallback identically to the kernel
            out = jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)
    if conserve:
        from .conserve import sharded_flux_separable_2d

        factors = separable_flux_factors(y_band, x_band,
                                         raw_sums=fold["measures"])
        flux = sharded_flux_separable_2d(
            frames, out, factors, mesh, data_axis=data_axis,
            row_axis=row_axis, col_axis=col_axis)
    if post is not None:
        out = post(out)
        # restore the documented (data, rows, cols) layout on the dst
        # array (a dst-sized collective — the whole point of the fold)
        batch = (P(data_axis),) if data_axis else (P(),)
        spec = P(*(batch[0] + (row_axis, col_axis)))
        out = _hint_sharding(
            out, mesh, spec)
    if not conserve:
        return out
    return out, flux


def sharded_apply_separable_2d_transpose(
    cot: jax.Array,
    op: weights_ops.SeparableOperator,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    col_axis: str = "cols",
    impl: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """2-D-sharded adjoint apply: (B, Hd, Wd) -> (B, H, W).

    The transpose of a banded separable operator is another banded
    separable operator, so the adjoint is ``sharded_apply_banded_2d``
    with transposed bands — the two-axis halo machinery generalises with
    no new collective code.  The quadrant is folded like the forward's
    (_folded_sharded_bands_2d): the incoming dst cotangent pays the
    small inverse permutation (``post_inv``), the transposed FOLDED
    bands run under the same two-axis ring halo, and the output lands
    directly in the original source orientation; the rot90 fallback
    transposes to an inverse rot90 AFTER the transposed bands.
    """
    from ..autodiff import transposed_separable

    n_r, n_c = mesh.shape[row_axis], mesh.shape[col_axis]
    ty, tx = transposed_separable(op)
    fold = _folded_sharded_bands_2d(op, n_r, n_c)
    unfold_after = fold is None
    if fold is None:
        t_y, t_x = ty, tx
    else:
        # transposes of the folded bands via (W P)^T = P W^T and
        # (R W)^T = W^T R:  t(rr(flip(b))) = flip_band(reverse_rows(t(b)))
        flip, rr = overlap1d.flip_band, overlap1d.reverse_rows_band
        q = op.spec.quadrant % 4
        if q == 0:
            t_y, t_x = ty, tx
        elif q == 1:            # fwd: y=rr(flip(wx)), x=wy
            t_y, t_x = flip(rr(tx)), ty
        elif q == 2:            # fwd: y=rr(flip(wy)), x=rr(flip(wx))
            t_y, t_x = flip(rr(ty)), flip(rr(tx))
        else:                   # fwd: y=wx, x=rr(flip(wy))
            t_y, t_x = tx, flip(rr(ty))
        if fold["post_inv"] is not None:
            cot = fold["post_inv"](cot)
    if impl not in ("auto", "pallas", "banded"):
        raise ValueError(
            f"unknown impl {impl!r} for the sharded separable apply; "
            "expected 'auto', 'pallas', or 'banded'")
    forced = impl != "auto"
    if impl == "auto":
        impl = ("pallas" if jax.devices()[0].platform == "tpu" or interpret
                else "banded")
    out = None
    if impl == "pallas":
        try:
            out = sharded_apply_banded_2d_pallas(
                cot, t_y, t_x, mesh, data_axis=data_axis, row_axis=row_axis,
                col_axis=col_axis, interpret=interpret)
        except ValueError:
            if forced:
                raise
    if out is None:
        out = sharded_apply_banded_2d(
            cot, t_y, t_x, mesh, data_axis=data_axis, row_axis=row_axis,
            col_axis=col_axis)
    if unfold_after and op.spec.quadrant:
        out = apply_ops.quadrant_rotate(out, -op.spec.quadrant)
    return out


def make_sharded_separable_2d_linear(
    op: weights_ops.SeparableOperator,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    col_axis: str = "cols",
    impl: str = "auto",
    interpret: bool = False,
):
    """Custom-vjp'd 2-D-sharded separable apply: jit(grad(...)) over the
    (data, rows, cols) mesh is one SPMD program whose backward runs the
    transposed bands through the same two-axis ring halo."""

    kw = dict(data_axis=data_axis, row_axis=row_axis, col_axis=col_axis,
              impl=impl, interpret=interpret)

    @jax.custom_vjp
    def f(frames):
        return sharded_apply_separable_2d(frames, op, mesh, **kw)

    def fwd(frames):
        return f(frames), None

    def bwd(_, g):
        return (sharded_apply_separable_2d_transpose(g, op, mesh, **kw),)

    f.defvjp(fwd, bwd)
    return f


def make_sharded_ell_pallas(
    op: weights_ops.EllOperator,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    interpret: bool = False,
):
    """(fn, arrays): row-sharded three-kernel Pallas rotated apply.

    Same ring-halo collective structure as sharded_apply_ell, but each
    chip's local contraction runs ops/pallas_shear's VMEM shears + one-hot
    MXU gathers (~200x the XLA flat-gather local apply single-chip)
    instead of apply_ell.  One GLOBAL shear plan serves every chip — the
    per-chip tables are row shifts of it (see ShardedShearPlan) — so the
    shard_map body is a single SPMD program.  Distributes the reference's
    hot loop (/root/reference/Source.cpp:432-576) across the mesh.

    ``fn(frames, **arrays)`` is jit-ready with the (potentially large)
    plan tables as traced ARGUMENTS, not closed-over HLO constants (the
    w2t table alone is hundreds of MB at 2048^2 — the compile tunnel
    rejects such programs).  ``arrays`` leading n_dev axes shard over
    ``row_axis``; passing them unsharded also works (XLA reshards).

    quadrant != 0 folds the rot90 pre-rotation into the ELL table
    (weights.fold_quadrant_ell): the folded tables consume the ORIGINAL
    row-sharded source — no source-sized rot90 all-to-all — and only the
    small dst output pays a flip/transpose reshard.  When the folded row
    counts don't divide the mesh, the global-rot90 route is the
    fallback.

    Raises ValueError off the plan envelope — sharded_apply_ell's auto
    route falls back to the XLA local apply.
    """
    from ..ops.pallas_shear import (
        _build_contract, _build_hshear, _build_vshear,
        build_sharded_kernel_plan, tile_masks,
    )

    n_dev = mesh.shape[row_axis]
    quadrant = op.spec.quadrant
    post = None
    kp = None
    if quadrant != 0:
        folded = weights_ops.fold_quadrant_ell_cached(op)
        if folded is not None:
            try:
                kp = build_sharded_kernel_plan(folded[0], n_dev)
            except ValueError:
                kp = None  # folded rows don't fit the mesh: global rot90
            else:
                op, post = folded
                quadrant = 0
    if kp is None:
        kp = build_sharded_kernel_plan(op, n_dev)

    masks_np = np.stack([tile_masks(kp.w2t[i]) for i in range(n_dev)])
    arrays = dict(
        hx_loc=jnp.asarray(kp.hx_loc),
        base_h=jnp.asarray(kp.base_h),
        r0_loc=jnp.asarray(kp.r0_loc),
        masks=jnp.asarray(masks_np),
        rsel=jnp.asarray(kp.rsel),
        w2t=jnp.asarray(kp.w2t),
        gy_col=jnp.asarray(kp.gy_col),
        base_v=jnp.asarray(kp.base_v),
        c0=jnp.asarray(kp.c0),
        csel=jnp.asarray(kp.csel),
    )

    batch_spec = (P(data_axis),) if data_axis else (P(),)
    row_only = P(*(batch_spec[0] + (row_axis, None)))

    def fn(frames, hx_loc, base_h, r0_loc, masks, rsel, w2t, gy_col,
           base_v, c0, csel):
        if quadrant != 0:
            frames = apply_ops.quadrant_rotate(frames, quadrant)
        if frames.dtype not in (jnp.bfloat16, jnp.float32):
            frames = frames.astype(jnp.float32)
        lead = frames.ndim - 2
        assert lead in (0, 1)
        Bloc = 1
        if lead:
            n_data = mesh.shape[data_axis] if data_axis else 1
            Bloc = frames.shape[0] // n_data
        dname = jnp.dtype(frames.dtype).name
        vshear = _build_vshear(Bloc, kp.Hloc, kp.qWp, kp.THp, kp.RH,
                               kp.nbv, dname, interpret)
        hshear = _build_hshear(Bloc, kp.THp, kp.qWp, kp.TWp, kp.BLKR,
                               kp.RW, kp.nbh, dname, interpret)
        contract = _build_contract(
            Bloc, kp.THp, kp.TWp, kp.nty, kp.ntx, kp.TYd, kp.TXd, kp.Ka,
            kp.Kb, kp.SRF, kp.SCF, dname, dname, interpret, masked=True)
        rsel = rsel.astype(frames.dtype)
        csel = csel.astype(frames.dtype)

        def local_fn(frames_blk, hx_blk, bh_blk, r0_blk, m_blk, rsel_blk,
                     w2t_blk, gy_l, bv_l, c0_l, csel_l):
            ext = _halo_extend(frames_blk, kp.halo, row_axis, n_dev)
            squeeze = frames_blk.ndim == 2
            if squeeze:
                ext = ext[None]
            if kp.qWp != kp.qW:
                pad = ([(0, 0)] * (ext.ndim - 2)
                       + [(0, 0), (0, kp.qWp - kp.qW)])
                ext = jnp.pad(ext, pad)
            s = vshear(bv_l, gy_l, ext)
            t = hshear(bh_blk[0], hx_blk, s)
            out = contract(r0_blk[0], c0_l, m_blk[0], t, rsel_blk[0],
                           csel_l, w2t_blk[0])
            out = out[:, : kp.db, : kp.Wd]
            return out[0] if squeeze else out

        smapped = shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(row_only,
                      P(row_axis, None, None),          # hx_loc
                      P(row_axis, None),                # base_h
                      P(row_axis, None),                # r0_loc
                      P(row_axis, None),                # tap masks
                      P(row_axis, None, None, None, None),  # rsel
                      P(row_axis, None, None, None, None),  # w2t
                      P(None, None, None),              # gy_col
                      P(None),                          # base_v
                      P(None),                          # c0
                      P(None, None, None, None)),       # csel
            out_specs=row_only,
            check_rep=False,
        )
        out = smapped(frames, hx_loc, base_h, r0_loc, masks, rsel, w2t,
                      gy_col, base_v, c0, csel)
        if post is not None:
            # dst-sized flip/transpose reshard replacing the source-sized
            # rot90 all-to-all (see fold_quadrant_ell); restore the
            # documented row-sharded layout on the permuted dst
            out = post(out)
            out = _hint_sharding(
                out, mesh, row_only)
        return out

    return fn, arrays


def sharded_apply_ell_pallas(
    frames: jax.Array,
    op: weights_ops.EllOperator,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    interpret: bool = False,
) -> jax.Array:
    """Convenience wrapper over make_sharded_ell_pallas (tables closed
    over — fine at test sizes; use the maker for production jits)."""
    fn, arrays = make_sharded_ell_pallas(
        op, mesh, data_axis=data_axis, row_axis=row_axis,
        interpret=interpret)
    return fn(frames, **arrays)


def sharded_apply_ell(
    frames: jax.Array,
    op: weights_ops.EllOperator,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    conserve: bool = False,
    base: Optional[jax.Array] = None,
    weights: Optional[jax.Array] = None,
    impl: str = "auto",
    interpret: bool = False,
):
    """Row-sharded rotated (ELL) apply with halo exchange.

    The halo is the max diagonal overhang of any chip's window bases — it
    grows with W*sin(angle); steep rotations spill past the nearest
    neighbour and are served by the multi-hop exchange in ``_halo_extend``
    (hop k trades one more ppermute for sb more halo rows, degrading
    gracefully toward an all-gather as the angle approaches 90 deg).

    conserve: also return the replicated (2,) [flux_dst, flux_src] psum
    conservation pair (parallel/conserve.py, Source.cpp:573-577 analogue).

    base/weights: optional device arrays overriding op.base / op.weights —
    pass the tables as traced jit ARGUMENTS instead of closed-over host
    constants (hundreds of MB of HLO constants otherwise; this box's
    remote-compile tunnel rejects programs >~100 MB).

    impl: 'auto' runs the per-chip Pallas shear kernels on TPU (or under
    ``interpret``), degrading to the XLA flat-gather local apply off the
    plan envelope; 'pallas' forces (raising off-envelope); 'xla' forces
    the flat-gather local apply.

    quadrant != 0 folds the rot90 pre-rotation (Source.cpp:159-172) into
    the ELL table (weights.fold_quadrant_ell) on both the Pallas and XLA
    routes: the source stays sharded in its original orientation — no
    source-sized all-to-all — and only the SMALL dst output pays a
    flip/transpose reshard; the conserve flux pair rides folded coverage
    factors against the un-rotated frames.  Explicit base/weights
    overrides are folded ON DEVICE (weights.fold_tables_device — jnp
    flips/transposes, bit-identical to the host fold), so they ride the
    folded route too; the global-rot90 reshard remains only as the
    fallback when the folded row counts don't divide the mesh.
    """
    n_dev = mesh.shape[row_axis]
    qH, qW = op.spec.qrot_shape
    Hd, Wd = op.spec.dst_shape

    if impl not in ("auto", "pallas", "xla"):
        # a typo'd impl must not silently run the flat-gather local
        # apply (same contract as api.apply_operator, ADVICE r3/r4)
        raise ValueError(
            f"unknown impl {impl!r} for the sharded ELL apply; expected "
            "'auto', 'pallas', or 'xla'")
    forced = impl != "auto"
    if impl == "auto":
        impl = ("pallas" if jax.devices()[0].platform == "tpu" or interpret
                else "xla")
    pall_out = None
    if impl == "pallas":
        try:
            pall_out = sharded_apply_ell_pallas(
                frames, op, mesh, data_axis=data_axis, row_axis=row_axis,
                interpret=interpret)
        except ValueError:
            if forced:
                raise
    if pall_out is not None:
        if not conserve:
            return pall_out
        from .conserve import ell_flux_factors, sharded_flux_ell

        flux = None
        if op.spec.quadrant:
            folded = weights_ops.fold_quadrant_ell_cached(op)
            if folded is not None:
                # cov from the FOLDED table pairs with the UN-rotated
                # source; m2 pairs with the true dst (global sums are
                # permutation-invariant) — the flux pair no longer pays
                # its own rot90 all-to-all.  Plain jnp sums instead of
                # the shard_map flux: XLA reduces the sharded operands
                # with the same AllReduce and needs no row divisibility
                # (the true dst rows may not divide the mesh even when
                # the folded apply does — that's the fold's added reach)
                m2, _ = ell_flux_factors(op)
                _, cov = ell_flux_factors(folded[0])
                fd = jnp.sum(pall_out.astype(jnp.float32)
                             * jnp.asarray(m2, jnp.float32))
                fs = jnp.sum(frames.astype(jnp.float32)
                             * jnp.asarray(cov, jnp.float32))
                flux = jnp.stack([fd, fs])
        if flux is None:
            q = (apply_ops.quadrant_rotate(frames, op.spec.quadrant)
                 if op.spec.quadrant else frames)
            flux = sharded_flux_ell(q, pall_out, ell_flux_factors(op),
                                    mesh, data_axis=data_axis,
                                    row_axis=row_axis)
        return pall_out, flux

    post = None
    if op.spec.quadrant != 0:
        # fold the rot90 into the ELL table (weights.fold_quadrant_ell):
        # the source stays sharded un-rotated and only the small dst pays
        # a flip/transpose reshard.  Explicit base/weights device
        # overrides fold ON DEVICE (weights.fold_tables_device — the
        # same index algebra as jnp flips/transposes on the argument
        # tables), so the explicit-tables contract and the fold compose;
        # the global rot90 (source-sized all-to-all) remains the
        # indivisible fallback.
        folded = weights_ops.fold_quadrant_ell_cached(op)
        Hdf = folded[0].spec.dst_shape[0]
        qHf = folded[0].spec.qrot_shape[0]
        if Hdf % n_dev == 0 and qHf % n_dev == 0:
            if base is not None or weights is not None:
                b_use = jnp.asarray(op.base) if base is None else base
                w_use = (jnp.asarray(op.weights, jnp.float32)
                         if weights is None else weights)
                base, weights = weights_ops.fold_tables_device(
                    b_use, w_use, op.spec.quadrant, qH, qW)
            op, post = folded
            qH, qW = op.spec.qrot_shape
            Hd, Wd = op.spec.dst_shape
        else:
            frames = apply_ops.quadrant_rotate(frames, op.spec.quadrant)
    K = op.window
    if Hd % n_dev or qH % n_dev:
        raise ValueError(
            "row-sharded ELL apply requires divisible row counts "
            f"(dst {Hd}, src {qH}, devices {n_dev})")
    db, sb = Hd // n_dev, qH // n_dev
    halo = _ell_axis_halo(op.base[..., 0], K, db, sb, n_dev)

    base = jnp.asarray(op.base) if base is None else base
    w = (jnp.asarray(op.weights, dtype=jnp.float32) if weights is None
         else weights)

    batch_spec = (P(data_axis),) if data_axis else (P(),)
    row_only = P(*(batch_spec[0] + (row_axis, None)))

    def local_fn(frames_blk, base_blk, w_blk):
        i = jax.lax.axis_index(row_axis)
        ext = _halo_extend(frames_blk, halo, row_axis, n_dev)
        rebased = base_blk.at[..., 0].add(-(i * sb - halo))
        return apply_ops.apply_ell(ext, rebased, w_blk)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(row_only, P(row_axis, None, None), P(row_axis, None, None, None)),
        out_specs=row_only,
        check_rep=False,
    )
    out = fn(frames, base, w)
    final = out
    if post is not None:
        final = _hint_sharding(
            post(out), mesh, row_only)
    if not conserve:
        return final
    from .conserve import ell_flux_factors, sharded_flux_ell

    # when folded, frames / the pre-post out / op's (permuted) factors
    # all live in the folded orientation — consistent, and the global
    # sums are permutation-invariant, so the flux values are unchanged
    flux = sharded_flux_ell(frames, out, ell_flux_factors(op), mesh,
                            data_axis=data_axis, row_axis=row_axis)
    return final, flux


def make_sharded_ell_pallas_2d(
    op: weights_ops.EllOperator,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    col_axis: str = "cols",
    interpret: bool = False,
):
    """(fn, arrays): (rows x cols)-sharded three-kernel Pallas rotated
    apply — the 2-D-mesh form of make_sharded_ell_pallas.

    Each chip runs the VMEM shears + one-hot MXU contraction on its own
    halo-extended (Hloc, Wloc) block; BOTH shears commute with the 2-D
    sharding (see Sharded2DShearPlan), so one global shear plan serves
    every chip — gy/base_v/c0/csel shard over the cols axis, hx/base_h/
    r0/rsel over the rows axis, w2t/masks over both.  Collective
    structure: one ring-halo exchange per mesh axis (corners arrive
    transitively), as in sharded_apply_separable_2d.

    quadrant != 0 folds the rot90 into the table (fold_quadrant_ell) —
    no source-sized all-to-all; the small dst pays a flip/transpose
    reshard.  Falls back to the global-rot90 route when the folded
    counts don't divide the mesh.

    Raises ValueError off the plan envelope — sharded_apply_ell_2d's
    auto route falls back to the XLA flat-gather local apply.
    """
    from ..ops.pallas_shear import (
        _build_contract, _build_hshear, _build_vshear,
        build_sharded_kernel_plan_2d, tile_masks,
    )

    n_r, n_c = mesh.shape[row_axis], mesh.shape[col_axis]
    quadrant = op.spec.quadrant
    post = None
    kp = None
    if quadrant != 0:
        folded = weights_ops.fold_quadrant_ell_cached(op)
        if folded is not None:
            try:
                kp = build_sharded_kernel_plan_2d(folded[0], n_r, n_c)
            except ValueError:
                kp = None  # folded counts don't fit: global rot90 below
            else:
                op, post = folded
                quadrant = 0
    if kp is None:
        kp = build_sharded_kernel_plan_2d(op, n_r, n_c)

    masks_np = np.stack(
        [[tile_masks(kp.w2t[i, j]) for j in range(n_c)]
         for i in range(n_r)])
    arrays = dict(
        gy_loc=jnp.asarray(kp.gy_loc),
        base_v=jnp.asarray(kp.base_v),
        hx_loc=jnp.asarray(kp.hx_loc),
        base_h=jnp.asarray(kp.base_h),
        r0_loc=jnp.asarray(kp.r0_loc),
        c0_loc=jnp.asarray(kp.c0_loc),
        masks=jnp.asarray(masks_np),
        rsel=jnp.asarray(kp.rsel),
        csel=jnp.asarray(kp.csel),
        w2t=jnp.asarray(kp.w2t),
    )

    batch = (P(data_axis),) if data_axis else (P(),)
    img2d = P(*(batch[0] + (row_axis, col_axis)))

    def fn(frames, gy_loc, base_v, hx_loc, base_h, r0_loc, c0_loc, masks,
           rsel, csel, w2t):
        if quadrant != 0:
            frames = apply_ops.quadrant_rotate(frames, quadrant)
        if frames.dtype not in (jnp.bfloat16, jnp.float32):
            frames = frames.astype(jnp.float32)
        lead = frames.ndim - 2
        assert lead in (0, 1)
        Bloc = 1
        if lead:
            n_data = mesh.shape[data_axis] if data_axis else 1
            Bloc = frames.shape[0] // n_data
        dname = jnp.dtype(frames.dtype).name
        vshear = _build_vshear(Bloc, kp.Hloc, kp.qWp, kp.THp, kp.RH,
                               kp.nbv, dname, interpret)
        hshear = _build_hshear(Bloc, kp.THp, kp.qWp, kp.TWp, kp.BLKR,
                               kp.RW, kp.nbh, dname, interpret)
        contract = _build_contract(
            Bloc, kp.THp, kp.TWp, kp.nty, kp.ntx, kp.TYd, kp.TXd, kp.Ka,
            kp.Kb, kp.SRF, kp.SCF, dname, dname, interpret, masked=True)
        rsel = rsel.astype(frames.dtype)
        csel = csel.astype(frames.dtype)

        def local_fn(frames_blk, gy_l, bv_l, hx_l, bh_l, r0_l, c0_l,
                     m_l, rsel_l, csel_l, w2t_l):
            ext = _halo_extend(frames_blk, kp.halo_y, row_axis, n_r,
                               axis=-2)
            ext = _halo_extend(ext, kp.halo_x, col_axis, n_c, axis=-1)
            squeeze = frames_blk.ndim == 2
            if squeeze:
                ext = ext[None]
            if kp.qWp != kp.Wloc:
                pad = ([(0, 0)] * (ext.ndim - 2)
                       + [(0, 0), (0, kp.qWp - kp.Wloc)])
                ext = jnp.pad(ext, pad)
            s = vshear(bv_l[0], gy_l, ext)
            t = hshear(bh_l[0], hx_l, s)
            out = contract(r0_l[0], c0_l[0], m_l[0, 0], t, rsel_l[0],
                           csel_l[0], w2t_l[0, 0])
            out = out[:, : kp.db_r, : kp.db_c]
            return out[0] if squeeze else out

        smapped = shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(img2d,
                      P(col_axis, None, None),          # gy_loc
                      P(col_axis, None),                # base_v
                      P(row_axis, None, None),          # hx_loc
                      P(row_axis, None),                # base_h
                      P(row_axis, None),                # r0_loc
                      P(col_axis, None),                # c0_loc
                      P(row_axis, col_axis, None),      # masks
                      P(row_axis, None, None, None, None),  # rsel
                      P(col_axis, None, None, None, None),  # csel
                      P(row_axis, col_axis, None, None, None, None)),
            out_specs=img2d,
            check_rep=False,
        )
        out = smapped(frames, gy_loc, base_v, hx_loc, base_h, r0_loc,
                      c0_loc, masks, rsel, csel, w2t)
        if post is not None:
            out = post(out)
            out = _hint_sharding(
                out, mesh, img2d)
        return out

    return fn, arrays


def _ell_halo_2d(op: weights_ops.EllOperator, n_r: int, n_c: int):
    """(halo_y, halo_x) for the 2-D-sharded ELL apply, plus block dims.

    halo_y is the max row overhang of any dst-row-block's window bases
    past its own source-row block (it grows with W*sin(angle) — the
    dst-row <-> src-row alignment drifts across columns under rotation;
    multi-hop _halo_extend serves the steep cases exactly as in 1-D);
    halo_x is the column-side analogue.  Raises on indivisible counts.
    """
    qH, qW = op.spec.qrot_shape
    Hd, Wd = op.spec.dst_shape
    if Hd % n_r or qH % n_r or Wd % n_c or qW % n_c:
        raise ValueError(
            "2-D-sharded ELL apply requires divisible row AND col counts "
            f"(dst {Hd}x{Wd}, src {qH}x{qW}, mesh {n_r}x{n_c})")
    db_r, sb_r = Hd // n_r, qH // n_r
    db_c, sb_c = Wd // n_c, qW // n_c
    K = op.window
    halo_y = _ell_axis_halo(op.base[..., 0], K, db_r, sb_r, n_r)
    halo_x = _ell_axis_halo(op.base[..., 1].T, K, db_c, sb_c, n_c)
    return (halo_y, halo_x, db_r, sb_r, db_c, sb_c)


def sharded_apply_ell_2d(
    frames: jax.Array,
    op: weights_ops.EllOperator,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    col_axis: str = "cols",
    conserve: bool = False,
    base: Optional[jax.Array] = None,
    weights: Optional[jax.Array] = None,
    impl: str = "auto",
    interpret: bool = False,
):
    """Rotated (ELL) apply with BOTH image axes sharded — rows over
    ``row_axis``, columns over ``col_axis`` of a (data, rows, cols)
    mesh.  The 2-D-mesh form of the reference's hot loop
    (/root/reference/Source.cpp:432-576) for frames too large for a 1-D
    strip split.

    Collective structure mirrors sharded_apply_separable_2d: one
    ring-halo exchange per mesh axis (rows first, then columns of the
    row-extended block — corner regions arrive transitively), both
    neighbour ppermutes over ICI; each chip then contracts its
    (sb_r + 2*halo_y) x (sb_c + 2*halo_x) block against its own
    (db_r, db_c) block of the ELL tables, rebased by its mesh
    coordinates.  Note the row halo still grows with W*sin(angle): under
    rotation the dst-row <-> src-row alignment drifts across the column
    range, so steep angles ride the multi-hop exchange exactly as in
    the 1-D path.

    impl: 'auto' runs the per-chip Pallas three-kernel shear local
    contraction (make_sharded_ell_pallas_2d) on TPU or under
    ``interpret``, degrading to the XLA flat-gather local apply off the
    plan envelope; 'pallas' forces (raising off-envelope); 'xla' forces
    the flat-gather local apply.

    quadrant != 0 folds the rot90 into the table (fold_quadrant_ell) —
    the source stays sharded un-rotated, only the small dst pays a
    flip/transpose reshard; global rot90 is the indivisible fallback.

    conserve: also return the replicated (2,) [flux_dst, flux_src] psum
    pair reduced over all three mesh axes.

    base/weights: optional device-array overrides of op's tables (pass
    them as traced jit arguments; see sharded_apply_ell) — when the
    quadrant fold applies, argument tables are folded ON DEVICE
    (weights.fold_tables_device), matching the 1-D path.
    """
    n_r, n_c = mesh.shape[row_axis], mesh.shape[col_axis]
    if impl not in ("auto", "pallas", "xla"):
        raise ValueError(
            f"unknown impl {impl!r} for the 2-D sharded ELL apply; "
            "expected 'auto', 'pallas', or 'xla'")
    forced = impl != "auto"
    if impl == "auto":
        impl = ("pallas" if jax.devices()[0].platform == "tpu" or interpret
                else "xla")
    if impl == "pallas":
        try:
            fn_p, arrays = make_sharded_ell_pallas_2d(
                op, mesh, data_axis=data_axis, row_axis=row_axis,
                col_axis=col_axis, interpret=interpret)
        except ValueError:
            if forced:
                raise
            fn_p = None
        if fn_p is not None:
            pall_out = fn_p(frames, **arrays)
            if not conserve:
                return pall_out
            from .conserve import ell_flux_factors, sharded_flux_ell_2d

            if op.spec.quadrant:
                folded = weights_ops.fold_quadrant_ell_cached(op)
                # permutation-invariant global sums: folded cov pairs
                # with the un-rotated frames, true m2 with the true dst
                # (see sharded_apply_ell; plain sums need no divisibility)
                m2, _ = ell_flux_factors(op)
                _, cov = ell_flux_factors(folded[0])
                fd = jnp.sum(pall_out.astype(jnp.float32)
                             * jnp.asarray(m2, jnp.float32))
                fs = jnp.sum(frames.astype(jnp.float32)
                             * jnp.asarray(cov, jnp.float32))
                return pall_out, jnp.stack([fd, fs])
            flux = sharded_flux_ell_2d(frames, pall_out,
                                       ell_flux_factors(op), mesh,
                                       data_axis=data_axis,
                                       row_axis=row_axis,
                                       col_axis=col_axis)
            return pall_out, flux

    post = None
    if op.spec.quadrant != 0:
        folded = weights_ops.fold_quadrant_ell_cached(op)
        fop = folded[0]
        ok = (fop.spec.dst_shape[0] % n_r == 0
              and fop.spec.qrot_shape[0] % n_r == 0
              and fop.spec.dst_shape[1] % n_c == 0
              and fop.spec.qrot_shape[1] % n_c == 0)
        if ok:
            if base is not None or weights is not None:
                # explicit argument tables fold on device (same algebra)
                qH0, qW0 = op.spec.qrot_shape
                b_use = jnp.asarray(op.base) if base is None else base
                w_use = (jnp.asarray(op.weights, jnp.float32)
                         if weights is None else weights)
                base, weights = weights_ops.fold_tables_device(
                    b_use, w_use, op.spec.quadrant, qH0, qW0)
            op, post = folded
        else:
            frames = apply_ops.quadrant_rotate(frames, op.spec.quadrant)
    halo_y, halo_x, db_r, sb_r, db_c, sb_c = _ell_halo_2d(op, n_r, n_c)

    base = jnp.asarray(op.base) if base is None else base
    w = (jnp.asarray(op.weights, dtype=jnp.float32) if weights is None
         else weights)

    batch = (P(data_axis),) if data_axis else (P(),)
    img2d = P(*(batch[0] + (row_axis, col_axis)))

    def local_fn(frames_blk, base_blk, w_blk):
        i = jax.lax.axis_index(row_axis)
        j = jax.lax.axis_index(col_axis)
        ext = _halo_extend(frames_blk, halo_y, row_axis, n_r, axis=-2)
        ext = _halo_extend(ext, halo_x, col_axis, n_c, axis=-1)
        rebased = (base_blk.at[..., 0].add(-(i * sb_r - halo_y))
                   .at[..., 1].add(-(j * sb_c - halo_x)))
        return apply_ops.apply_ell(ext, rebased, w_blk)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(img2d, P(row_axis, col_axis, None),
                  P(row_axis, col_axis, None, None)),
        out_specs=img2d,
        check_rep=False,
    )
    out = fn(frames, base, w)
    final = out
    if post is not None:
        final = _hint_sharding(
            post(out), mesh, img2d)
    if not conserve:
        return final
    from .conserve import ell_flux_factors, sharded_flux_ell_2d

    # when folded, frames / the pre-post out / op's (permuted) factors
    # all live in the folded orientation — consistent (see 1-D path)
    flux = sharded_flux_ell_2d(frames, out, ell_flux_factors(op), mesh,
                               data_axis=data_axis, row_axis=row_axis,
                               col_axis=col_axis)
    return final, flux


# ----------------------------------------------------------------------
# Sharded adjoints (exact transposes of the sharded applies) and custom
# VJPs — multi-chip gradients (aainterp/autodiff.py at pod scale)
# ----------------------------------------------------------------------


def _halo_reduce(xext, h: int, axis_name: str, n_dev: int,
                 axis: int = -2):
    """Exact adjoint of ``_halo_extend``: fold halo contributions back.

    In the adjoint apply each chip scatters cotangent mass into its
    halo-extended local source block; rows in the halo regions belong to
    ring neighbours and must be SENT BACK and summed — the same ppermute
    schedule as the forward exchange, direction-reversed (hop-k prev
    slabs carry contributions to chip i-k's bottom rows, next slabs to
    chip i+k's top rows).  Edge chips' orphan slabs are provably zero
    (rebased indices never reach the pad — see _halo_extend) and are
    dropped by the ppermute permutation, matching the forward's zero
    fill.  ``axis`` selects the reduced image axis (-2 rows, -1 cols —
    the 2-D-mesh adjoint reduces both, in reverse forward order).
    """
    if h == 0:
        return xext
    ax = axis % xext.ndim

    def sl(arr, lo, hi):
        idx = [slice(None)] * arr.ndim
        idx[ax] = slice(lo, hi)
        return tuple(idx)

    sb = xext.shape[ax] - 2 * h
    core = xext[sl(xext, h, h + sb)]
    hops = -(-h // sb)
    for k in range(1, hops + 1):
        hk = min(sb, h - (k - 1) * sb)
        # prev region layout (see _halo_extend): hop-k slab at
        # [h - (k-1)*sb - hk, h - (k-1)*sb)
        lo = h - (k - 1) * sb - hk
        recv = jax.lax.ppermute(
            xext[sl(xext, lo, lo + hk)], axis_name,
            [(j, j - k) for j in range(k, n_dev)])
        core = core.at[sl(core, sb - hk, sb)].add(recv)
        # next region: hop-k slab at [h + sb + (k-1)*sb, ... + hk)
        nlo = h + sb + (k - 1) * sb
        recv = jax.lax.ppermute(
            xext[sl(xext, nlo, nlo + hk)], axis_name,
            [(j, j + k) for j in range(n_dev - k)])
        core = core.at[sl(core, 0, hk)].add(recv)
    return core


def sharded_apply_separable_transpose(
    cot: jax.Array,
    op: weights_ops.SeparableOperator,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    impl: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """Row-sharded adjoint apply: (B, Hd, Wd) -> (B, H, W).

    The transpose of a banded separable operator is another banded
    separable operator (ops.overlap1d.transpose_band), so the adjoint is
    simply ``sharded_apply_banded`` with transposed bands — the halo
    machinery (now derived from the transposed y-band) and the per-shard
    Pallas kernels generalise with no new collective code.

    The quadrant is folded like the forward's (_folded_sharded_bands):
    the incoming dst cotangent pays the small inverse permutation
    (``post_inv``), the transposed FOLDED bands run under the same ring
    halo, and the output lands directly in the original source
    orientation — the old global inverse rot90 was an all-to-all of the
    SOURCE-sized array, the most expensive collective in the adjoint.
    """
    from ..autodiff import transposed_separable

    n_dev = mesh.shape[row_axis]
    ty, tx = transposed_separable(op)
    fold = _folded_sharded_bands(op, n_dev)
    unfold_after = fold is None
    if fold is None:
        t_y, t_x = ty, tx       # rot90 fallback, inverse rotation after
    else:
        # transposes of the folded bands, derived from the cached (ty, tx)
        # via (W P)^T = P W^T and (R W)^T = W^T R:
        #   t(rr(flip(b))) = flip_band(reverse_rows(t(b)))  [monotone]
        #   t(flip(b))     = reverse_rows(t(b))
        flip, rr = overlap1d.flip_band, overlap1d.reverse_rows_band
        q = op.spec.quadrant % 4
        if q == 0:
            t_y, t_x = ty, tx
        elif q == 1:            # fwd: y=rr(flip(wx)), x=wy
            t_y, t_x = flip(rr(tx)), ty
        elif q == 2:            # fwd: y=rr(flip(wy)), x=flip(wx)
            t_y, t_x = flip(rr(ty)), rr(tx)
        else:                   # fwd: y=wx, x=flip(wy)
            t_y, t_x = tx, rr(ty)
        if fold["post_inv"] is not None:
            cot = fold["post_inv"](cot)
    if impl not in ("auto", "pallas", "banded"):
        raise ValueError(
            f"unknown impl {impl!r} for the sharded separable apply; "
            "expected 'auto', 'pallas', or 'banded'")
    forced = impl != "auto"
    if impl == "auto":
        impl = ("pallas" if jax.devices()[0].platform == "tpu" or interpret
                else "banded")
    out = None
    if impl == "pallas":
        try:
            out = sharded_apply_banded_pallas(
                cot, t_y, t_x, mesh, data_axis=data_axis, row_axis=row_axis,
                interpret=interpret)
        except ValueError:
            if forced:
                raise
    if out is None:
        out = sharded_apply_banded(cot, t_y, t_x, mesh, data_axis=data_axis,
                                   row_axis=row_axis)
    if unfold_after and op.spec.quadrant:
        out = apply_ops.quadrant_rotate(out, -op.spec.quadrant)
    return out


def sharded_apply_ell_transpose(
    cot: jax.Array,
    op: weights_ops.EllOperator,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    base: Optional[jax.Array] = None,
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    """Row-sharded adjoint of the rotated apply: (B, Hd, Wd) -> (B, H, W).

    Each chip scatters its local cotangent block into its halo-extended
    source block (ops.apply.apply_ell_transpose with the same rebased
    window bases as the forward), then ``_halo_reduce`` returns the halo
    contributions to their owning chips over the ring — the exact
    transpose of the forward's gather exchange, hop for hop.

    quadrant != 0 folds like the forward (fold_quadrant_ell): the dst
    cotangent pays the small inverse permutation (ell_fold_post_inv)
    and the folded scatter lands directly in the original source
    orientation — no source-sized inverse rot90; global rot90 is the
    indivisible / explicit-tables fallback.
    """
    n_dev = mesh.shape[row_axis]
    unfold_after = False
    if op.spec.quadrant != 0:
        folded = weights_ops.fold_quadrant_ell_cached(op)
        fop = folded[0]
        ok = (fop.spec.dst_shape[0] % n_dev == 0
              and fop.spec.qrot_shape[0] % n_dev == 0)
        if ok:
            cot = weights_ops.ell_fold_post_inv(op.spec.quadrant)(cot)
            if base is not None or weights is not None:
                # explicit argument tables fold on device (same algebra)
                qH0, qW0 = op.spec.qrot_shape
                b_use = jnp.asarray(op.base) if base is None else base
                w_use = (jnp.asarray(op.weights, jnp.float32)
                         if weights is None else weights)
                base, weights = weights_ops.fold_tables_device(
                    b_use, w_use, op.spec.quadrant, qH0, qW0)
            op = fop
        else:
            unfold_after = True
    qH, qW = op.spec.qrot_shape
    Hd, Wd = op.spec.dst_shape
    K = op.window
    if Hd % n_dev or qH % n_dev:
        raise ValueError(
            "row-sharded ELL apply requires divisible row counts "
            f"(dst {Hd}, src {qH}, devices {n_dev})")
    db, sb = Hd // n_dev, qH // n_dev
    halo = _ell_axis_halo(op.base[..., 0], K, db, sb, n_dev)

    base = jnp.asarray(op.base) if base is None else base
    w = (jnp.asarray(op.weights, dtype=jnp.float32) if weights is None
         else weights)

    batch_spec = (P(data_axis),) if data_axis else (P(),)
    row_only = P(*(batch_spec[0] + (row_axis, None)))

    def local_fn(g_blk, base_blk, w_blk):
        i = jax.lax.axis_index(row_axis)
        rebased = base_blk.at[..., 0].add(-(i * sb - halo))
        qext = apply_ops.apply_ell_transpose(
            g_blk, rebased, w_blk, (sb + 2 * halo, qW))
        return _halo_reduce(qext, halo, row_axis, n_dev)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(row_only, P(row_axis, None, None),
                  P(row_axis, None, None, None)),
        out_specs=row_only,
        check_rep=False,
    )
    qbar = fn(cot, base, w)
    if unfold_after:
        qbar = apply_ops.quadrant_rotate(qbar, -op.spec.quadrant)
    return qbar


def make_sharded_separable_linear(
    op: weights_ops.SeparableOperator,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    impl: str = "auto",
    interpret: bool = False,
):
    """custom-vjp'd sharded separable apply: multi-chip gradients.

    Forward = sharded_apply_separable (per-shard Pallas on TPU); backward
    = sharded_apply_separable_transpose — both collective schedules are
    static, so jit(grad(...)) over the mesh compiles one SPMD program.
    """

    @jax.custom_vjp
    def f(frames):
        return sharded_apply_separable(
            frames, op, mesh, data_axis=data_axis, row_axis=row_axis,
            impl=impl, interpret=interpret)

    def fwd(frames):
        return f(frames), (jnp.zeros((0,), frames.dtype),)

    def bwd(res, g):
        (dt,) = res
        sbar = sharded_apply_separable_transpose(
            g, op, mesh, data_axis=data_axis, row_axis=row_axis,
            impl=impl, interpret=interpret)
        return (sbar.astype(dt.dtype),)

    f.defvjp(fwd, bwd)
    return f


def sharded_apply_ell_2d_transpose(
    cot: jax.Array,
    op: weights_ops.EllOperator,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    col_axis: str = "cols",
    base: Optional[jax.Array] = None,
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    """2-D-mesh adjoint of the rotated apply: (B, Hd, Wd) -> (B, H, W).

    Each chip scatters its local cotangent block into its halo-extended
    source block (apply_ell_transpose with the forward's rebased window
    bases), then ``_halo_reduce`` folds the halo contributions back
    over BOTH ring axes — columns first, then rows (the exact reverse
    of the forward's extend order, hop for hop).

    quadrant != 0 folds like the forward (fold_quadrant_ell): the dst
    cotangent pays the small inverse permutation (ell_fold_post_inv)
    and the folded scatter lands directly in the original source
    orientation — no source-sized inverse rot90; the global-rot90 route
    is the indivisible fallback.
    """
    n_r, n_c = mesh.shape[row_axis], mesh.shape[col_axis]
    unfold_after = False
    if op.spec.quadrant != 0:
        folded = weights_ops.fold_quadrant_ell_cached(op)
        fop = folded[0]
        ok = (fop.spec.dst_shape[0] % n_r == 0
              and fop.spec.qrot_shape[0] % n_r == 0
              and fop.spec.dst_shape[1] % n_c == 0
              and fop.spec.qrot_shape[1] % n_c == 0)
        if ok:
            cot = weights_ops.ell_fold_post_inv(op.spec.quadrant)(cot)
            batch0 = (P(data_axis),) if data_axis else (P(),)
            cot = _hint_sharding(
                cot, mesh, P(*(batch0[0] + (row_axis, col_axis))))
            if base is not None or weights is not None:
                # explicit argument tables fold on device (same algebra)
                qH0, qW0 = op.spec.qrot_shape
                b_use = jnp.asarray(op.base) if base is None else base
                w_use = (jnp.asarray(op.weights, jnp.float32)
                         if weights is None else weights)
                base, weights = weights_ops.fold_tables_device(
                    b_use, w_use, op.spec.quadrant, qH0, qW0)
            op = fop
        else:
            unfold_after = True
    halo_y, halo_x, db_r, sb_r, db_c, sb_c = _ell_halo_2d(op, n_r, n_c)
    qW = op.spec.qrot_shape[1]

    base = jnp.asarray(op.base) if base is None else base
    w = (jnp.asarray(op.weights, dtype=jnp.float32) if weights is None
         else weights)

    batch = (P(data_axis),) if data_axis else (P(),)
    img2d = P(*(batch[0] + (row_axis, col_axis)))

    def local_fn(g_blk, base_blk, w_blk):
        i = jax.lax.axis_index(row_axis)
        j = jax.lax.axis_index(col_axis)
        rebased = (base_blk.at[..., 0].add(-(i * sb_r - halo_y))
                   .at[..., 1].add(-(j * sb_c - halo_x)))
        qext = apply_ops.apply_ell_transpose(
            g_blk, rebased, w_blk,
            (sb_r + 2 * halo_y, sb_c + 2 * halo_x))
        red = _halo_reduce(qext, halo_x, col_axis, n_c, axis=-1)
        return _halo_reduce(red, halo_y, row_axis, n_r, axis=-2)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(img2d, P(row_axis, col_axis, None),
                  P(row_axis, col_axis, None, None)),
        out_specs=img2d,
        check_rep=False,
    )
    qbar = fn(cot, base, w)
    if unfold_after:
        qbar = apply_ops.quadrant_rotate(qbar, -op.spec.quadrant)
    return qbar


def make_sharded_ell_2d_linear(
    op: weights_ops.EllOperator,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    col_axis: str = "cols",
    impl: str = "auto",
    interpret: bool = False,
):
    """custom-vjp'd 2-D-mesh rotated apply f(frames, base, weights) —
    the (rows x cols) form of make_sharded_ell_linear (same argument
    contract: base/weights ride as arguments, never closures)."""

    @jax.custom_vjp
    def f(frames, base, w):
        return sharded_apply_ell_2d(
            frames, op, mesh, data_axis=data_axis, row_axis=row_axis,
            col_axis=col_axis, base=base, weights=w, impl=impl,
            interpret=interpret)

    def fwd(frames, base, w):
        return f(frames, base, w), (jnp.zeros((0,), frames.dtype), base, w)

    def bwd(res, g):
        dt, base, w = res
        sbar = sharded_apply_ell_2d_transpose(
            g, op, mesh, data_axis=data_axis, row_axis=row_axis,
            col_axis=col_axis, base=base, weights=w)
        zb = np.zeros(base.shape, jax.dtypes.float0)
        return (sbar.astype(dt.dtype), zb, jnp.zeros_like(w))

    f.defvjp(fwd, bwd)
    return f


def make_sharded_ell_linear(
    op: weights_ops.EllOperator,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    impl: str = "auto",
    interpret: bool = False,
):
    """custom-vjp'd sharded rotated apply f(frames, base, weights).

    base/weights ride as ARGUMENTS (the backward scatter tables; hundreds
    of MB at production sizes — never closed over, see aainterp/autodiff
    module docs).  Pass ``jnp.asarray(op.base)`` /
    ``jnp.asarray(op.weights, jnp.float32)`` once and reuse.
    """

    @jax.custom_vjp
    def f(frames, base, w):
        return sharded_apply_ell(
            frames, op, mesh, data_axis=data_axis, row_axis=row_axis,
            base=base, weights=w, impl=impl, interpret=interpret)

    def fwd(frames, base, w):
        return f(frames, base, w), (jnp.zeros((0,), frames.dtype), base, w)

    def bwd(res, g):
        dt, base, w = res
        sbar = sharded_apply_ell_transpose(
            g, op, mesh, data_axis=data_axis, row_axis=row_axis,
            base=base, weights=w)
        zb = np.zeros(base.shape, jax.dtypes.float0)
        return (sbar.astype(dt.dtype), zb, jnp.zeros_like(w))

    f.defvjp(fwd, bwd)
    return f
