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

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import apply as apply_ops
from ..ops import weights as weights_ops


def _row_halo(y_start: np.ndarray, band: int, n_src: int, n_dst: int,
              n_dev: int) -> int:
    """Max rows any chip needs beyond its own source row block (static)."""
    assert n_dst % n_dev == 0 and n_src % n_dev == 0, (
        "row-sharded apply requires divisible row counts "
        f"(dst {n_dst}, src {n_src}, devices {n_dev})"
    )
    db = n_dst // n_dev
    sb = n_src // n_dev
    h = 0
    for i in range(n_dev):
        lo = int(y_start[i * db: (i + 1) * db].min())
        hi = int(y_start[i * db: (i + 1) * db].max()) + band
        h = max(h, i * sb - lo, hi - (i + 1) * sb)
    return max(h, 0)


def _halo_extend(x, h: int, axis_name: str, n_dev: int):
    """Extend the sharded row axis (-2) by h rows from ring neighbours.

    Multi-hop: when the halo exceeds the per-chip block (steep rotations,
    narrow shards), hop k in 1..ceil(h/sb) fetches a (partial on the last
    hop) block from the chips k positions away on each side, each hop one
    ``ppermute`` over ICI.  Since band indices are in [0, n_src) the halo
    is at most (n_dev-1)*sb, so every valid operator is coverable.

    Missing neighbours at the edges contribute zeros (ppermute semantics),
    which is correct because the rebased band indices never reach the pad
    for edge chips (global row indices are in-range by construction).
    """
    if h == 0:
        return x
    sb = x.shape[-2]
    hops = -(-h // sb)
    assert hops <= n_dev - 1, (h, sb, n_dev)
    parts_prev, parts_next = [], []
    for k in range(1, hops + 1):
        hk = min(sb, h - (k - 1) * sb)  # partial block on the last hop
        # top hk rows of chip i+k -> below my block
        parts_next.append(jax.lax.ppermute(
            x[..., :hk, :], axis_name, [(j, j - k) for j in range(k, n_dev)]
        ))
        # bottom hk rows of chip i-k -> above my block
        parts_prev.append(jax.lax.ppermute(
            x[..., -hk:, :], axis_name,
            [(j, j + k) for j in range(n_dev - k)]
        ))
    return jnp.concatenate(parts_prev[::-1] + [x] + parts_next, axis=-2)


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


def sharded_apply_separable(
    frames: jax.Array,
    op: weights_ops.SeparableOperator,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
) -> jax.Array:
    """Apply a separable operator with dst/src rows sharded over ``row_axis``
    and leading batch dims over ``data_axis``.

    frames: (B, H, W) (or (H, W) with data_axis=None).  Returns (B, Hd, Wd)
    with the same sharding layout.
    """
    if op.spec.quadrant != 0:
        # quadrant pre-rotation (Source.cpp:159-172) as a global jnp.rot90:
        # under jit over the mesh, XLA lowers the transpose+reverse to an
        # all-to-all over ICI and reshards for the shard_map that follows —
        # the minimal collective any distributed rot90 needs
        frames = apply_ops.quadrant_rotate(frames, op.spec.quadrant)
    return sharded_apply_banded(
        frames, op.wy, op.wx, mesh, data_axis=data_axis, row_axis=row_axis
    )


def sharded_apply_ell(
    frames: jax.Array,
    op: weights_ops.EllOperator,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
) -> jax.Array:
    """Row-sharded rotated (ELL) apply with halo exchange.

    The halo is the max diagonal overhang of any chip's window bases — it
    grows with W*sin(angle); steep rotations spill past the nearest
    neighbour and are served by the multi-hop exchange in ``_halo_extend``
    (hop k trades one more ppermute for sb more halo rows, degrading
    gracefully toward an all-gather as the angle approaches 90 deg).
    """
    n_dev = mesh.shape[row_axis]
    qH, qW = op.spec.qrot_shape
    Hd, Wd = op.spec.dst_shape
    if op.spec.quadrant != 0:
        # see sharded_apply_separable: global rot90, resharded by XLA
        frames = apply_ops.quadrant_rotate(frames, op.spec.quadrant)
    K = op.window
    assert Hd % n_dev == 0 and qH % n_dev == 0
    db, sb = Hd // n_dev, qH // n_dev
    base_y = op.base[..., 0]
    halo = 0
    for i in range(n_dev):
        blk = base_y[i * db: (i + 1) * db]
        halo = max(halo, i * sb - int(blk.min()),
                   int(blk.max()) + K - (i + 1) * sb)
    halo = max(halo, 0)

    base = jnp.asarray(op.base)
    w = jnp.asarray(op.weights, dtype=jnp.float32)

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
    return fn(frames, base, w)
