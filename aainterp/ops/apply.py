"""Apply stage: evaluate the sparse resampling operator on device (XLA paths).

The reference evaluates weights and applies them inside one scalar loop
(Source.cpp:411-579).  Here the apply stage is a standalone jittable function
of static-shape operator arrays, so it batches with ``vmap`` over channels /
frames and shards with ``shard_map`` over chips.  Pallas kernels for the same
contractions live in pallas_apply.py; these XLA versions are the reference
implementations and the fallback on non-TPU backends.

All accumulation is float32 (or the operator dtype) regardless of image dtype
(bf16 pixel I/O, fp32 accum).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quadrant_rotate(src: jax.Array, quadrant: int) -> jax.Array:
    """90-degree quadrant pre-rotation of the source image.

    Cell-level equivalent of the reference's replication loop rotation cases
    (Source.cpp:159-172): quadrant k (k*90 degrees clockwise) is
    ``rot90(src, -k)`` on the trailing two axes.
    """
    return jnp.rot90(src, k=-int(quadrant), axes=(-2, -1))


def apply_separable_banded(
    q: jax.Array,
    y_start: jax.Array,  # (Hd,) int32
    y_w: jax.Array,      # (Hd, ky)
    x_start: jax.Array,  # (Wd,) int32
    x_w: jax.Array,      # (Wd, kx)
) -> jax.Array:
    """dst = (Wy @ q) @ Wx.T with banded row-normalised weights.

    O(k) work per output pixel instead of the dense O(n): bandwidth-bound,
    the speed-of-light formulation for axis-aligned area-average resize.
    q may have arbitrary leading batch dims: (..., H, W) -> (..., Hd, Wd).
    """
    acc_dtype = y_w.dtype
    ky = y_w.shape[1]
    kx = x_w.shape[1]
    # clamp: when a band is wider than the image the trailing indices go
    # out of range (their weights are 0, but jnp.take's default fill is NaN)
    rows = jnp.clip(
        y_start[:, None] + jnp.arange(ky, dtype=y_start.dtype),
        0, q.shape[-2] - 1,
    )  # (Hd, ky)
    g = jnp.take(q, rows, axis=-2)                 # (..., Hd, ky, W)
    t = jnp.einsum(
        "hk,...hkw->...hw", y_w, g.astype(acc_dtype),
        preferred_element_type=acc_dtype,
    )
    cols = jnp.clip(
        x_start[:, None] + jnp.arange(kx, dtype=x_start.dtype),
        0, q.shape[-1] - 1,
    )  # (Wd, kx)
    g2 = jnp.take(t, cols, axis=-1)                # (..., Hd, Wd, kx)
    out = jnp.einsum(
        "wk,...hwk->...hw", x_w, g2, preferred_element_type=acc_dtype
    )
    return out


def apply_band_axis(
    q: jax.Array,
    start: jax.Array,  # (n_dst,) int32
    w: jax.Array,      # (n_dst, k)
    axis: int,
) -> jax.Array:
    """Banded contraction along ONE axis of an N-D array.

    Generalises the two trailing-axis contractions of
    ``apply_separable_banded`` to any axis: out[..., i, ...] =
    sum_k w[i, k] * q[..., clip(start[i] + k), ...] along ``axis``.
    Same clamp semantics (out-of-range band entries carry zero weight).
    This is the building block for volumetric / N-D conservative
    resizing (api.area_resize_nd) — the reference program is strictly
    2-D (Source.cpp IMG = vector<vector<double>>).
    """
    acc_dtype = w.dtype
    k = w.shape[1]
    axis = axis % q.ndim
    v = jnp.moveaxis(q, axis, -1)
    idx = jnp.clip(
        start[:, None] + jnp.arange(k, dtype=start.dtype),
        0, v.shape[-1] - 1,
    )  # (n_dst, k)
    g = jnp.take(v, idx, axis=-1)                  # (..., n_dst, k)
    out = jnp.einsum(
        "nk,...nk->...n", w, g.astype(acc_dtype),
        preferred_element_type=acc_dtype,
    )
    return jnp.moveaxis(out, -1, axis)


def uniform_box_params(y_start, y_w, x_start, x_w, H: int, W: int):
    """(my, mx) if the banded separable operator is an exact uniform integer
    box filter; None otherwise.

    Integer-ratio downscales whose dst-cell edges land on src-cell edges
    produce bands of constant stride m whose m live taps all carry weight
    1/m: the area-average reduces to an m x m box mean with no MXU work,
    no gathers, no band DMA choreography.  Edge alignment requires the
    forward-mapped isocenter fraction (m-1)/(2m) per axis, i.e.
    src_isocenter = ((m-1)/2, (m-1)/2) — NOTE the flagship iso=(0,0)
    ratio-2 grid is offset half a src cell (3-tap [1/4, 1/2, 1/4]
    stencil) and is correctly rejected here.  Detection is exact: strides
    must equal m with zero anchor offset, H == m * Hd, all live taps
    bit-identical, and m * w0 == 1 within one rounding of 1/m.
    """
    params = []
    for start, w, n in ((y_start, y_w, H), (x_start, x_w, W)):
        s = np.asarray(start).astype(np.int64)
        wt = np.asarray(w)
        nd, k = wt.shape
        if nd == 0:
            return None
        live = wt != 0.0
        m = int(live[0].sum())
        if m < 1 or (live.sum(axis=1) != m).any():
            return None
        # live taps must be one contiguous run (boundary rows store a
        # clamped `start` with the weights shifted into trailing columns)
        first = live.argmax(axis=1)
        run = (first[:, None] <= np.arange(k)) & (np.arange(k)
                                                  < first[:, None] + m)
        if (live != run).any():
            return None
        w0 = wt[0, first[0]]
        if (np.where(run, wt, w0) != w0).any():
            return None
        if abs(m * float(w0) - 1.0) > 4e-7:  # one f32 rounding of 1/m
            return None
        eff = s + first  # effective first source row of each dst cell
        if n != m * nd or (eff != m * np.arange(nd)).any():
            return None
        params.append(m)
    return tuple(params)


def apply_box_mean(q: jax.Array, my: int, mx: int,
                   acc_dtype=jnp.float32) -> jax.Array:
    """Exact uniform integer-ratio area average: reshape + accumulated mean.

    Equivalent (to accumulation rounding) to apply_separable_banded with the
    stride-m uniform bands that uniform_box_params detects, but touches each
    source pixel exactly once with zero weight traffic: read H*W + write
    Hd*Wd, the HBM-bandwidth floor for this operator.

    Implementation notes (TPU layout, all measured at the flagship shape):
    a reshape to (..., Hd, my, Wd, mx) pads the trailing size-m axis to 128
    lanes (a 50 GB layout copy); single-pass strided slices over BOTH dims
    slice the lane dim of the bf16 input and pay sub-tile relayout gathers
    (0.4 Gpixel/s); lax.reduce_window lowers to a slow scalar window scan
    (50.7 Gpixel/s).  The fast form mirrors the stencil apply: sublane
    strided slices on the input dtype (fine for bf16), accumulate to
    acc_dtype, THEN lane strided slices on the converted intermediate.
    """
    t = None
    for i in range(my):
        part = q[..., i::my, :].astype(acc_dtype)
        t = part if t is None else t + part
    o = None
    for j in range(mx):
        part = t[..., j::mx]
        o = part if o is None else o + part
    return o * jnp.asarray(1.0 / (my * mx), acc_dtype)


def aligned_axis_plan(start, w, n: int):
    """dict(m, c0, wk) for an exactly aligned integer-ratio band, else None.

    Aligned means the destination cells PARTITION a contiguous run of
    source cells into equal blocks of m: every dst cell i has exactly m
    contiguous live taps whose first source index is c0 + m*i, and the
    run c0 .. c0 + m*n_dst fits inside the n source cells.  Weights may
    vary per row (unlike ``uniform_box_params``) — e.g. the cos-lat
    (sin-edge) weights of an integer-ratio conservative regrid, the
    config-5 0.1deg -> 1deg case, qualify with m=10.

    For such bands the contraction needs no band densification, no
    gathers and no MXU: a free row-major reshape groups each dst cell's
    m source rows and a length-m weighted sum does the rest
    (``apply_separable_aligned``).  Measured on the v5e (honest harness,
    2026-08-19): 153.8 Gpixel/s vs 49.9 for the Pallas 2-D banded-tile
    kernel on the regrid config — the banded-tile DMA schedule, not MXU
    precision, bounds that kernel (DEFAULT/bf16x3/HIGHEST all measure
    ~125 us/frame; benchmarks/regrid_precision.py), while this
    formulation runs at f32-exact accuracy (max rel err 1.8e-07 vs the
    f64 host apply) within ~22% of the HBM read floor.

    Returns dict(m, c0, wk) with wk the (n_dst, m) compacted tap table.
    """
    s = np.asarray(start).astype(np.int64)
    wt = np.asarray(w)
    nd, k = wt.shape
    if nd == 0:
        return None
    live = wt != 0.0
    m = int(live[0].sum())
    if m < 1 or m > k or (live.sum(axis=1) != m).any():
        return None
    first = live.argmax(axis=1)
    idx = np.arange(k)
    run = (first[:, None] <= idx) & (idx < first[:, None] + m)
    if (live != run).any():
        return None  # live taps not one contiguous run
    eff = s + first
    c0 = int(eff[0])
    if c0 < 0 or (eff != c0 + m * np.arange(nd)).any() or c0 + m * nd > n:
        return None
    wk = wt[np.arange(nd)[:, None], first[:, None] + idx[None, :m]]
    return dict(m=m, c0=c0, wk=np.ascontiguousarray(wk))


def apply_separable_aligned(q: jax.Array, y_plan, x_plan,
                            acc_dtype=jnp.float32) -> jax.Array:
    """Aligned integer-ratio separable apply: reshape + weighted tap sum.

    (..., H, W) -> (..., Hd, Wd) for band pairs whose
    ``aligned_axis_plan`` exists on both axes.  Exactly equivalent to
    ``apply_separable_banded`` up to f32 accumulation order, but touches
    each source pixel once with zero gather/densification work: the
    row-major reshape (..., Hd, m, W) is free, the multiply + length-m
    sum fuses on the VPU (XLA does NOT materialise the lane-split
    (..., Wd, m) intermediate — measured at the regrid shape), and
    accuracy is true f32 (better than any MXU splitting scheme, whose
    operands truncate to bf16 triples).  Pure XLA and differentiable.
    """
    # wk tables may be numpy (host plans) or traced arrays (per-chip
    # sharded blocks inside shard_map); m/c0 are always static ints
    my, cy = int(y_plan["m"]), int(y_plan["c0"])
    mx, cx = int(x_plan["m"]), int(x_plan["c0"])
    wy = jnp.asarray(y_plan["wk"], acc_dtype)
    wx = jnp.asarray(x_plan["wk"], acc_dtype)
    hd, wd = wy.shape[0], wx.shape[0]
    lead = q.shape[:-2]
    if cy or q.shape[-2] != cy + my * hd:
        q = jax.lax.slice_in_dim(q, cy, cy + my * hd, axis=-2)
    t = (q.reshape(lead + (hd, my, q.shape[-1])).astype(acc_dtype)
         * wy[:, :, None]).sum(axis=-2)
    if cx or t.shape[-1] != cx + mx * wd:
        t = jax.lax.slice_in_dim(t, cx, cx + mx * wd, axis=-1)
    return (t.reshape(lead + (hd, wd, mx)) * wx).sum(axis=-1)


def apply_aligned_axis(q: jax.Array, plan, axis: int,
                       acc_dtype=jnp.float32) -> jax.Array:
    """Aligned integer-ratio banded contraction along ONE axis.

    The N-D sibling of ``apply_separable_aligned`` (see
    ``aligned_axis_plan``): out[..., i, ...] = sum_k wk[i, k] *
    q[..., c0 + m*i + k, ...] along ``axis`` via moveaxis + reshape +
    weighted tap sum — no gather, no band densification.  Used by
    ``api.area_resize_nd`` for integer-ratio axes.
    """
    m, c0 = int(plan["m"]), int(plan["c0"])
    wk = jnp.asarray(plan["wk"], acc_dtype)
    nd_out = wk.shape[0]
    axis = axis % q.ndim
    v = jnp.moveaxis(q, axis, -1)
    if c0 or v.shape[-1] != c0 + m * nd_out:
        v = jax.lax.slice_in_dim(v, c0, c0 + m * nd_out, axis=-1)
    out = (v.reshape(v.shape[:-1] + (nd_out, m)).astype(acc_dtype)
           * wk).sum(axis=-1)
    return jnp.moveaxis(out, -1, axis)


def axis_stencil_plan(start, w, n: int):
    """Per-axis plan for the interior-constant strided-stencil apply.

    Many practical geometries (every integer-ratio downscale, e.g. the
    flagship iso=(0,0) ratio-2 grid) produce bands whose effective starts
    advance by a constant stride m with one constant interior tap vector
    w_star, deviating only at the first/last few rows.  Re-anchoring taps
    at a_i = m*i + c turns the interior contraction into len(w_star)
    strided slices + fused multiply-adds — no gather, no band
    densification.  Honest flagship-shape numbers (harness with
    materialisation barriers, 2026-08-17): 5.0 Gpixel/s — XLA lowers the
    strided-slice FMA chain poorly on v5e once outputs are actually
    materialised (the earlier "ties the Pallas kernel" reading was an
    artifact of the scan harness's per-step slice copy dominating both
    paths).  Value of this path: a portable, differentiable, pure-XLA
    formulation ~3x the banded gather, not TPU peak (the Pallas kernel
    measures 264.9 Gpixel/s on the same harness).

    Returns dict(m, c, w_star, i0, i1) — interior rows [i0, i1) use
    w_star; rows outside are evaluated by the banded gather — or None if
    the band is not an interior-constant constant-stride stencil.
    """
    s = np.asarray(start).astype(np.int64)
    wt = np.asarray(w)
    nd, k = wt.shape
    if nd < 16:
        return None
    live = wt != 0.0
    if not live.any(axis=1).all():
        return None
    first = live.argmax(axis=1)
    width = live.sum(axis=1)
    run = (first[:, None] <= np.arange(k)) & (
        np.arange(k) < (first + width)[:, None])
    if (live != run).any():
        return None  # non-contiguous live taps
    eff = s + first  # effective first source index per dst cell
    m = int(np.median(np.diff(eff)))
    if m < 1 or m > 16:
        return None
    ci = eff - m * np.arange(nd)
    c = int(ci.min())
    kp = int((ci - c + width).max())
    if kp > k + 2 * m:
        return None  # starts not constant-stride (e.g. alternating 2,3)
    w2 = np.zeros((nd, kp), wt.dtype)
    for j in range(k):
        msk = live[:, j]
        if not msk.any():
            continue
        w2[np.nonzero(msk)[0], (ci - c + j - first)[msk]] = wt[msk, j]
    w_star = w2[nd // 2]
    inter = (w2 == w_star).all(axis=1)
    i0 = nd // 2
    while i0 > 0 and inter[i0 - 1]:
        i0 -= 1
    i1 = nd // 2 + 1
    while i1 < nd and inter[i1]:
        i1 += 1
    js = np.nonzero(w_star)[0]
    if js.size == 0:
        return None
    while i0 < i1 and m * i0 + c + int(js[0]) < 0:
        i0 += 1
    while i1 > i0 and m * (i1 - 1) + c + int(js[-1]) > n - 1:
        i1 -= 1
    if (i1 - i0) < nd // 2 or (i0 + nd - i1) > 32:
        return None
    return dict(m=m, c=c, w_star=w_star, i0=i0, i1=i1)


def _banded_rows(q, axis, start, w, r0, r1, acc_dtype):
    """Banded gather-contraction restricted to dst rows [r0, r1) on axis."""
    k = w.shape[1]
    idx = jnp.clip(
        jnp.asarray(start)[r0:r1, None] + jnp.arange(k), 0,
        q.shape[axis] - 1)
    g = jnp.take(q, idx, axis=axis).astype(acc_dtype)
    wj = jnp.asarray(np.asarray(w)[r0:r1], acc_dtype)
    if axis == q.ndim - 2:
        return jnp.einsum("bk,...bkw->...bw", wj, g,
                          preferred_element_type=acc_dtype)
    return jnp.einsum("bk,...bk->...b", wj, g,
                      preferred_element_type=acc_dtype)


def _apply_axis_stencil(q, axis, plan, start, w, acc_dtype):
    axis = q.ndim + axis if axis < 0 else axis
    m, c, i0, i1 = plan["m"], plan["c"], plan["i0"], plan["i1"]
    w_star = np.asarray(plan["w_star"], dtype=np.float64)
    nd = int(np.asarray(w).shape[0])
    n_int = i1 - i0
    acc = None
    for j, wj in enumerate(w_star):
        if wj == 0.0:
            continue
        lo = m * i0 + c + j
        sl = jax.lax.slice_in_dim(q, lo, lo + m * (n_int - 1) + 1,
                                  stride=m, axis=axis)
        part = sl.astype(acc_dtype) * jnp.asarray(wj, acc_dtype)
        acc = part if acc is None else acc + part
    pieces = []
    if i0 > 0:
        pieces.append(_banded_rows(q, axis, start, w, 0, i0, acc_dtype))
    pieces.append(acc)
    if i1 < nd:
        pieces.append(_banded_rows(q, axis, start, w, i1, nd, acc_dtype))
    return jnp.concatenate(pieces, axis=axis) if len(pieces) > 1 else acc


def apply_separable_stencil(
    q: jax.Array,
    y_plan, x_plan,
    y_start, y_w, x_start, x_w,
    acc_dtype=jnp.float32,
) -> jax.Array:
    """Strided-stencil separable apply: (..., H, W) -> (..., Hd, Wd).

    Equivalent to apply_separable_banded (1-ulp accumulation-order
    differences) for operators whose axis plans exist
    (``axis_stencil_plan``).  Pure XLA and differentiable; see
    axis_stencil_plan for honest v5e numbers (slow there — portability
    and autodiff are the point, not TPU peak).
    """
    t = _apply_axis_stencil(q, -2, y_plan, y_start, y_w, acc_dtype)
    return _apply_axis_stencil(t, -1, x_plan, x_start, x_w, acc_dtype)


def apply_separable_dense(
    q: jax.Array, wy: jax.Array, wx: jax.Array
) -> jax.Array:
    """dst = Wy @ q @ Wx.T with dense (Hd, H) / (Wd, W) operators.

    MXU path: two large matmuls.  Wasteful in FLOPs for narrow bands but
    maps perfectly onto the systolic array; useful as a cross-check and for
    very wide bands (large downscale factors).
    """
    acc = jnp.float32 if wy.dtype != jnp.float64 else jnp.float64
    t = jnp.einsum("yh,...hw->...yw", wy, q, preferred_element_type=acc)
    return jnp.einsum("...yw,xw->...yx", t, wx, preferred_element_type=acc)


def apply_ell(
    q: jax.Array,
    base: jax.Array,     # (Hd, Wd, 2) int32
    weights: jax.Array,  # (Hd, Wd, K, K)
) -> jax.Array:
    """Gather-weighted window reduction for the rotated operator.

    For each dst pixel, gathers its K x K candidate source cells and reduces
    with the pre-normalised overlap weights.  Static tap loop (K*K gathers of
    (Hd, Wd)) keeps the intermediate footprint at one dst-plane per tap.
    q: (..., qH, qW) -> (..., Hd, Wd).
    """
    K = weights.shape[-1]
    qW = q.shape[-1]
    qf = q.reshape(q.shape[:-2] + (-1,))
    a = jnp.arange(K, dtype=base.dtype)
    ry = base[..., 0:1] + a                        # (Hd, Wd, K)
    rx = base[..., 1:2] + a
    # tap axis leads: trailing (Hd, Wd) keeps TPU (8,128) tiling dense —
    # a trailing (K, K) would pad each 6x6 tap block to (8,128), a ~28x
    # memory blowup.
    ry = jnp.clip(ry, 0, q.shape[-2] - 1)
    rx = jnp.clip(rx, 0, qW - 1)
    idx = ry[..., :, None] * qW + rx[..., None, :]  # (Hd, Wd, K, K)
    idx = jnp.moveaxis(idx.reshape(idx.shape[:-2] + (K * K,)), -1, 0)
    w_t = jnp.moveaxis(
        weights.reshape(weights.shape[:-2] + (K * K,)), -1, 0
    )                                               # (K*K, Hd, Wd)
    acc_dtype = weights.dtype
    vals = jnp.take(qf, idx.reshape(-1), axis=-1)
    vals = vals.reshape(q.shape[:-2] + idx.shape).astype(acc_dtype)
    return jnp.einsum(
        "khw,...khw->...hw", w_t, vals, preferred_element_type=acc_dtype
    )


def apply_ell_transpose(
    g: jax.Array,
    base: jax.Array,     # (Hd, Wd, 2) int32
    weights: jax.Array,  # (Hd, Wd, K, K)
    q_shape,
) -> jax.Array:
    """Adjoint of ``apply_ell``: scatter dst cotangents into source cells.

    out[jy, jx] = sum over (dy, dx, a, b) with clip(base[dy,dx] + (a,b))
    == (jy, jx) of weights[dy,dx,a,b] * g[..., dy, dx] — the exact
    transpose of the matrix ``apply_ell`` evaluates (indices clipped the
    same way; clipped taps carry zero weight by construction).  Backward
    pass of the rotated apply's custom VJP; scatter-add XLA, not Pallas —
    the forward remains the hot path.  g: (..., Hd, Wd) -> (..., qH, qW).
    """
    qH, qW = int(q_shape[0]), int(q_shape[1])
    K = weights.shape[-1]
    acc_dtype = weights.dtype
    a = jnp.arange(K, dtype=base.dtype)
    ry = jnp.clip(base[..., 0:1] + a, 0, qH - 1)    # (Hd, Wd, K)
    rx = jnp.clip(base[..., 1:2] + a, 0, qW - 1)
    idx = (ry[..., :, None] * qW + rx[..., None, :]).reshape(-1)
    contrib = weights * g[..., None, None].astype(acc_dtype)
    flat = contrib.reshape(g.shape[:-2] + (-1,))
    out = jnp.zeros(g.shape[:-2] + (qH * qW,), acc_dtype)
    out = out.at[..., idx].add(flat)
    return out.reshape(g.shape[:-2] + (qH, qW))
