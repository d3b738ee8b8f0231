"""Sharded global conservation check — the framework's `psum` collective.

SURVEY.md §5 prescribes exactly two collectives for the rebuild: ppermute
for the ring halo exchange (parallel/sharding.py) and **psum for global
conservation checks** — the multi-chip analogue of the reference's sumArea
normalisation (Source.cpp:573-577), which guarantees every destination
pixel's weights integrate its true source footprint.

The check is an exact linear identity.  For any resampling operator
``dst = W_norm @ src`` with raw (un-normalised) overlap weights
``W_raw[d, s] = W_norm[d, s] * raw_row_sum[d]``:

    sum_d raw_row_sum[d] * dst[d]  ==  sum_s cov[s] * src[s],
    cov[s] = sum_d W_raw[d, s]      (source-cell coverage)

— both sides are the same triple sum reordered, so they agree to floating
point on ANY input.  ``cov`` is data-independent and precomputed on the
host; each chip contributes its local partial dot products and two
``jax.lax.psum`` over the mesh axes produce the replicated global pair.
A halo-exchange bug, index-rebase bug, or kernel defect on any chip breaks
the identity, so asserting |flux_dst - flux_src| <= tol validates the
entire sharded pipeline end to end (VERDICT r2 item 3).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .sharding import shard_map  # check_rep/check_vma rename shim

from ..ops import weights as weights_ops


def separable_flux_factors(y_band, x_band, raw_sums=None):
    """Host factors (my, mx, covy, covx) for a separable operator.

    The 2-D raw weight factorises as
    ``W_raw[(r,c),(jy,jx)] = my[r]*wy[r,jy] * mx[c]*wx[c,jx]`` with
    ``my/mx`` the per-axis raw overlap sums, so both fluxes factorise into
    row/column dots: flux_dst = my^T dst mx, flux_src = covy^T src covx.

    raw_sums: optional (sums_y, sums_x) from SeparableOperator.
    raw_row_sums; defaults to all-ones measure (valid — the identity holds
    for any dst measure, ones simply checks plain row-sum conservation).
    """
    my = np.ones(y_band.n_dst) if raw_sums is None else np.asarray(raw_sums[0], np.float64)
    mx = np.ones(x_band.n_dst) if raw_sums is None else np.asarray(raw_sums[1], np.float64)
    covy = np.zeros(y_band.n_src, np.float64)
    covx = np.zeros(x_band.n_src, np.float64)
    ys = np.asarray(y_band.start)
    yw = np.asarray(y_band.weights, np.float64)
    for k in range(yw.shape[1]):
        np.add.at(covy, np.clip(ys + k, 0, y_band.n_src - 1), my * yw[:, k])
    xs = np.asarray(x_band.start)
    xw = np.asarray(x_band.weights, np.float64)
    for k in range(xw.shape[1]):
        np.add.at(covx, np.clip(xs + k, 0, x_band.n_src - 1), mx * xw[:, k])
    return my, mx, covy, covx


def ell_flux_factors(op: weights_ops.EllOperator):
    """Host factors (m2, cov) for an ELL operator.

    m2[d] = raw 2-D overlap area of dst cell d (op.raw_row_sums);
    cov[jy, jx] = sum_d m2[d] * weights[d, a, b] scattered to the source
    cell each tap addresses — the coverage of that rotated-source cell.
    """
    qH, qW = op.spec.qrot_shape
    Hd, Wd = op.spec.dst_shape
    K = op.window
    m2 = np.asarray(op.raw_row_sums, np.float64)
    cov = np.zeros((qH, qW), np.float64)
    w = np.asarray(op.weights, np.float64) * m2[..., None, None]
    jy = np.clip(op.base[..., 0:1, None] + np.arange(K)[:, None], 0, qH - 1)
    jx = np.clip(op.base[..., 1:2, None].swapaxes(-1, -2)
                 + np.arange(K)[None, :], 0, qW - 1)
    jy = np.broadcast_to(jy, w.shape)
    jx = np.broadcast_to(jx, w.shape)
    np.add.at(cov, (jy.ravel(), jx.ravel()), w.ravel())
    return m2, cov


def sharded_flux_separable(
    src: jax.Array,
    dst: jax.Array,
    factors,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
) -> jax.Array:
    """(2,) replicated [flux_dst, flux_src] via local dots + psum.

    src/dst: (B, rows, cols) row-sharded over ``row_axis`` (src in qrot
    orientation, matching the band operators).  Factor vectors shard with
    their row axes; column factors replicate.
    """
    my, mx, covy, covx = (jnp.asarray(f, jnp.float32) for f in factors)
    axes = (row_axis,) if data_axis is None else (data_axis, row_axis)
    batch = (P(),) if data_axis is None else (P(data_axis),)
    row_only = P(*(batch[0] + (row_axis, None)))

    def local(dst_blk, src_blk, my_blk, covy_blk, mx_l, covx_l):
        fd = jnp.einsum("...rc,r,c->", dst_blk.astype(jnp.float32),
                        my_blk, mx_l)
        fs = jnp.einsum("...rc,r,c->", src_blk.astype(jnp.float32),
                        covy_blk, covx_l)
        out = jnp.stack([fd, fs])
        for ax in axes:
            out = jax.lax.psum(out, ax)
        return out

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(row_only, row_only, P(row_axis), P(row_axis),
                  P(None), P(None)),
        out_specs=P(None),
        check_rep=False,
    )
    return fn(dst, src, my, covy, mx, covx)


def sharded_flux_separable_2d(
    src: jax.Array,
    dst: jax.Array,
    factors,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    col_axis: str = "cols",
) -> jax.Array:
    """(2,) replicated [flux_dst, flux_src] for 2-D (rows x cols) sharded
    separable applies: row factors shard over ``row_axis``, column
    factors over ``col_axis``, psum over all mesh axes."""
    my, mx, covy, covx = (jnp.asarray(f, jnp.float32) for f in factors)
    axes = ((row_axis, col_axis) if data_axis is None
            else (data_axis, row_axis, col_axis))
    batch = (P(),) if data_axis is None else (P(data_axis),)
    img2d = P(*(batch[0] + (row_axis, col_axis)))

    def local(dst_blk, src_blk, my_blk, covy_blk, mx_blk, covx_blk):
        fd = jnp.einsum("...rc,r,c->", dst_blk.astype(jnp.float32),
                        my_blk, mx_blk)
        fs = jnp.einsum("...rc,r,c->", src_blk.astype(jnp.float32),
                        covy_blk, covx_blk)
        out = jnp.stack([fd, fs])
        for ax in axes:
            out = jax.lax.psum(out, ax)
        return out

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(img2d, img2d, P(row_axis), P(row_axis),
                  P(col_axis), P(col_axis)),
        out_specs=P(None),
        check_rep=False,
    )
    return fn(dst, src, my, covy, mx, covx)


def sharded_flux_ell(
    src: jax.Array,
    dst: jax.Array,
    factors,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
) -> jax.Array:
    """(2,) replicated [flux_dst, flux_src] for the rotated (ELL) apply.

    src: quadrant-rotated source rows sharded over ``row_axis``; dst: the
    sharded apply's output.  m2/cov are (Hd, Wd)/(qH, qW) row-sharded.
    """
    m2, cov = (jnp.asarray(f, jnp.float32) for f in factors)
    axes = (row_axis,) if data_axis is None else (data_axis, row_axis)
    batch = (P(),) if data_axis is None else (P(data_axis),)
    row_only = P(*(batch[0] + (row_axis, None)))

    def local(dst_blk, src_blk, m2_blk, cov_blk):
        fd = jnp.sum(dst_blk.astype(jnp.float32) * m2_blk)
        fs = jnp.sum(src_blk.astype(jnp.float32) * cov_blk)
        out = jnp.stack([fd, fs])
        for ax in axes:
            out = jax.lax.psum(out, ax)
        return out

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(row_only, row_only, P(row_axis, None), P(row_axis, None)),
        out_specs=P(None),
        check_rep=False,
    )
    return fn(dst, src, m2, cov)


def sharded_flux_ell_2d(
    src: jax.Array,
    dst: jax.Array,
    factors,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    row_axis: str = "rows",
    col_axis: str = "cols",
) -> jax.Array:
    """(2,) replicated [flux_dst, flux_src] for the 2-D (rows x cols)
    sharded rotated (ELL) apply: m2 (Hd, Wd) and cov (qH, qW) shard over
    both image axes with their arrays; psum over all mesh axes."""
    m2, cov = (jnp.asarray(f, jnp.float32) for f in factors)
    axes = ((row_axis, col_axis) if data_axis is None
            else (data_axis, row_axis, col_axis))
    batch = (P(),) if data_axis is None else (P(data_axis),)
    img2d = P(*(batch[0] + (row_axis, col_axis)))

    def local(dst_blk, src_blk, m2_blk, cov_blk):
        fd = jnp.sum(dst_blk.astype(jnp.float32) * m2_blk)
        fs = jnp.sum(src_blk.astype(jnp.float32) * cov_blk)
        out = jnp.stack([fd, fs])
        for ax in axes:
            out = jax.lax.psum(out, ax)
        return out

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(img2d, img2d, P(row_axis, col_axis),
                  P(row_axis, col_axis)),
        out_specs=P(None),
        check_rep=False,
    )
    return fn(dst, src, m2, cov)
