"""Shear-aligned rotated apply: gather-free evaluation of the ELL operator.

XLA's general gather is catastrophically slow on TPU (~95 ms for one
2048x2048 frame at 30 deg — measured honestly, see BENCHMARKS.md), so the
rotated apply reorganises the *gather structure* while keeping the exact
overlap weights:

1. Two integer shears (vertical per-source-column, then horizontal
   per-row), applied with a bit-decomposed sequence of static `jnp.roll` +
   `where` steps (log2(max shift) passes, pure VPU) — after them, every
   destination pixel's candidate window lives at
   ``T[ry0(dy) + a, cx0(dx) + b]`` with *per-row* and *per-column* bases.
2. The apply then looks exactly like the separable path: per tap row a, one
   cheap row-take, then a banded column-take + weighted reduction.

The shear composition is a bijection on cell coordinates, so the exact ELL
weights are re-indexed host-side into the sheared window with no change in
value (build_shear_plan).  Window growth from the two roundings is ~+2 per
axis.  Out-of-image cells keep weight 0 and rolls only wrap zero padding,
so correctness is unconditional; geometries whose sheared windows blow up
(pathological aspect ratios) fall back to the flat-gather apply.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..grids import GridSpec
from .weights import EllOperator


@dataclasses.dataclass(frozen=True)
class ShearPlan:
    """Host-precomputed shear layout for one EllOperator."""

    TH: int
    TW: int
    qH: int
    qW: int
    gy: np.ndarray      # (qW,) vertical shift per source column
    hx: np.ndarray      # (TH,) horizontal shift per sheared row (>= 0)
    ry0: np.ndarray     # (Hd,) per-dst-row tap base in T rows
    cx0: np.ndarray     # (Wd,) per-dst-col tap base in T cols
    weights: np.ndarray  # (Hd, Wd, Ka, Kb) re-indexed exact weights


def build_shear_plan(op: EllOperator, max_window: int = 24,
                     f32_tables: bool = False) -> ShearPlan:
    """Re-index an ELL operator into the sheared layout (host, float64).

    With ``f32_tables=True`` the shift tables are computed as
    ``floor(x * c + 0.5)`` in strict float32 — bit-reproducible on the TPU
    VPU, so a Pallas kernel can regenerate gy/hx in-register from an iota
    instead of loading them (ops/pallas_shear.py).  The plan is valid for
    ANY integer shift tables (weights are re-indexed through them), so the
    two variants differ only in which cells land where, never in values.
    """
    spec = op.spec
    qH, qW = spec.qrot_shape
    Hd, Wd = spec.dst_shape
    K = op.window
    c, sn = spec.cos, spec.sin
    tan = sn / c if c != 0 else 0.0

    # vertical shear cancels the dx-dependence of the row index:
    #   Ty ~ jy + jx*tan(theta); horizontal shear must then cancel the
    # dy-dependence of the column index given u ~ dy*L/(s*cos):
    #   hx(u) = -u*sin*cos  (so  jx + hx(Ty) loses its dy term exactly)
    if f32_tables:
        t32 = np.float32(tan)
        gy = np.floor(
            np.arange(qW, dtype=np.float32) * t32 + np.float32(0.5)
        ).astype(np.int64)
    else:
        gy = np.round(np.arange(qW) * tan).astype(np.int64)
    TH = int(qH + (gy.max() if qW else 0) + 1)
    u = np.arange(TH)
    if f32_tables:
        sc32 = np.float32(sn * c)
        hx_raw = -np.floor(
            u.astype(np.float32) * sc32 + np.float32(0.5)
        ).astype(np.int64)
    else:
        hx_raw = -np.round(u * (sn * c)).astype(np.int64)
    hx = hx_raw - hx_raw.min()
    TW = int(qW + hx.max() + 1)

    # int32 working set: (Hd, Wd, K, K) reaches ~70M cells at 2048^2 —
    # narrow dtypes + no broadcast materialisation keeps this pass in
    # seconds (was the dominant host cost of the Pallas plan build)
    a = np.arange(K, dtype=np.int32)
    gy32 = gy.astype(np.int32)
    hx32 = hx.astype(np.int32)
    jyc = np.clip(op.base[..., 0:1, None] + a[:, None], 0, qH - 1)
    jxc = np.clip(
        op.base[..., 1:2, None].swapaxes(-1, -2) + a[None, :], 0, qW - 1
    )
    Ty = jyc + gy32[jxc]        # (Hd, Wd, K, K) by broadcasting
    Tx = jxc + hx32[Ty]

    # spreads are computed over nonzero-weight cells only (edge windows are
    # clamped into range, and their zero-weight fringe cells would otherwise
    # inflate the sheared window)
    live = op.weights != 0.0
    if not live.any():
        raise ValueError("empty operator")
    iy, ix, ia, ib = np.nonzero(live)
    Ty_l = Ty[iy, ix, ia, ib]
    Tx_l = Tx[iy, ix, ia, ib]
    BIG = np.int32(1 << 30)
    Ty_live = np.where(live, Ty, BIG)
    Tx_live = np.where(live, Tx, BIG)
    ry0 = Ty_live.min(axis=(1, 2, 3))
    cx0 = Tx_live.min(axis=(0, 2, 3))
    # all-zero rows/cols (outside the rotated footprint): harmless base
    ry0 = np.where(ry0 == BIG, 0, ry0)
    cx0 = np.where(cx0 == BIG, 0, cx0)
    Ty_hi = np.where(live, Ty, -1)
    Tx_hi = np.where(live, Tx, -1)
    Ka = int((Ty_hi.max(axis=(1, 2, 3)) - ry0).max()) + 1
    Kb = int((Tx_hi.max(axis=(0, 2, 3)) - cx0).max()) + 1
    if Ka > max_window or Kb > max_window:
        raise ValueError(f"sheared window {Ka}x{Kb} too large")
    # keep gathers in range
    ry0 = np.clip(ry0, 0, max(TH - Ka, 0)).astype(np.int32)
    cx0 = np.clip(cx0, 0, max(TW - Kb, 0)).astype(np.int32)
    a2_l = Ty_l - ry0[iy]
    b2_l = Tx_l - cx0[ix]
    # zero-weight cells may land anywhere; live cells must fit the window
    assert a2_l.min() >= 0 and a2_l.max() < Ka
    assert b2_l.min() >= 0 and b2_l.max() < Kb

    # the shear composition is bijective on cells, so live cells never
    # collide: plain fancy assignment replaces the (slow) np.add.at
    w2 = np.zeros((Hd, Wd, Ka, Kb), dtype=op.weights.dtype)
    w2[iy, ix, a2_l, b2_l] = op.weights[iy, ix, ia, ib]

    return ShearPlan(TH=TH, TW=TW, qH=qH, qW=qW,
                     gy=gy.astype(np.int32), hx=hx.astype(np.int32),
                     ry0=ry0, cx0=cx0, weights=w2)


def _bit_roll(x, shifts, axis, max_shift):
    """Per-slice integer roll via log2 passes of static roll + select.

    shifts: int32 array broadcastable against x along the *other* axis.
    Rolls are downward/rightward; the rolled-in wrap region only ever
    contains zero padding (callers pad by >= max_shift).
    """
    nbits = max(1, int(max_shift).bit_length())
    for k in range(nbits):
        bit = (shifts >> k) & 1
        rolled = jnp.roll(x, 1 << k, axis=axis)
        x = jnp.where((bit == 1), rolled, x)
    return x


def _two_level_roll(x, shifts_np, shifts_dev, axis, block):
    """Per-slice roll with coarse static block rolls + fine bit passes.

    The shifts are nondecreasing (shear tables), so each block of ``block``
    consecutive slices shares a static base shift (its first element) and
    the residual fits in a few bit passes — roughly halving the roll+select
    traffic of a pure bit decomposition.

    shifts_np: host numpy copy of the shift table (for the static bases);
    shifts_dev: the same table on device (for the residual selects).
    axis: the roll axis (-2 rolls columns down, -1 rolls rows right);
    blocks are formed along the *other* axis.
    """
    other = -1 if axis == -2 else -2
    n = x.shape[other]
    bases = []
    pieces = []
    for b0 in range(0, n, block):
        b1 = min(b0 + block, n)
        s = int(shifts_np[b0:b1].min())  # monotone either way: block min
        bases.append((b0, b1, s))
    base_tbl = np.zeros(n, dtype=np.int32)
    for b0, b1, s in bases:
        base_tbl[b0:b1] = s
        sl = [slice(None)] * x.ndim
        sl[other] = slice(b0, b1)
        pieces.append(jnp.roll(x[tuple(sl)], s, axis=axis) if s else
                      x[tuple(sl)])
    x = jnp.concatenate(pieces, axis=other)
    residual = shifts_np - base_tbl
    max_res = int(residual.max()) if residual.size else 0
    if max_res > 0:
        res_dev = shifts_dev - jnp.asarray(base_tbl)
        if axis == -2:
            res_dev = res_dev[None, :]
        else:
            res_dev = res_dev[:, None]
        x = _bit_roll(x, res_dev, axis=axis, max_shift=max_res)
    return x


def apply_ell_sheared(
    q: jax.Array,
    gy: jax.Array,
    hx: jax.Array,
    ry0: jax.Array,
    cx0: jax.Array,
    weights: jax.Array,
    TH: int,
    TW: int,
    gy_np=None,
    hx_np=None,
    block: int = 128,
) -> jax.Array:
    """Device-side sheared apply: (..., qH, qW) -> (..., Hd, Wd).

    When host copies of the shift tables are provided (gy_np / hx_np), the
    shears use the two-level coarse-block + fine-bit roll (about half the
    roll+select traffic)."""
    qH, qW = q.shape[-2], q.shape[-1]
    Hd, Wd, Ka, Kb = weights.shape
    acc_dtype = weights.dtype

    # vertical shear: pad rows then roll each column down by gy[col]
    pad = [(0, 0)] * (q.ndim - 2) + [(0, TH - qH), (0, 0)]
    S = jnp.pad(q, pad)
    if gy_np is not None:
        S = _two_level_roll(S, gy_np, gy, axis=-2, block=block)
    else:
        S = _bit_roll(S, gy[None, :], axis=-2, max_shift=TH - qH)

    # horizontal shear: pad cols then roll each row right by hx[row]
    pad = [(0, 0)] * (q.ndim - 2) + [(0, 0), (0, TW - qW)]
    T = jnp.pad(S, pad)
    if hx_np is not None:
        T = _two_level_roll(T, hx_np, hx, axis=-1, block=block)
    else:
        T = _bit_roll(T, hx[:, None], axis=-1, max_shift=TW - qW)

    cols = cx0[:, None] + jnp.arange(Kb, dtype=cx0.dtype)  # (Wd, Kb)
    out = jnp.zeros(q.shape[:-2] + (Hd, Wd), dtype=acc_dtype)
    for a in range(Ka):
        rows = jnp.take(T, ry0 + a, axis=-2)               # (..., Hd, TW)
        vals = jnp.take(rows, cols, axis=-1)               # (..., Hd, Wd, Kb)
        out = out + jnp.einsum(
            "hwb,...hwb->...hw", weights[:, :, a, :],
            vals.astype(acc_dtype), preferred_element_type=acc_dtype,
        )
    return out


def make_sheared_apply(op: EllOperator, weight_dtype=jnp.float32):
    """(fn, arrays): jit-ready sheared apply for a built ELL operator.

    ``weight_dtype`` sets both the weight storage and accumulation dtype
    (apply_ell_sheared accumulates in weights.dtype), so f64 requests are
    honored on backends that support it."""
    plan = build_shear_plan(op)
    # concrete even inside a jit trace: api._XLA_SHEAR_CACHE stores these,
    # a trace-time jnp.asarray(numpy) is a TRACER under JAX 0.9
    with jax.ensure_compile_time_eval():
        arrays = dict(
            gy=jnp.asarray(plan.gy),
            hx=jnp.asarray(plan.hx),
            ry0=jnp.asarray(plan.ry0),
            cx0=jnp.asarray(plan.cx0),
            weights=jnp.asarray(plan.weights, dtype=weight_dtype),
        )

    def fn(q, gy, hx, ry0, cx0, weights):
        return apply_ell_sheared(
            q, gy, hx, ry0, cx0, weights, plan.TH, plan.TW,
            gy_np=plan.gy, hx_np=plan.hx,
        )

    return fn, arrays
