"""Exact adjoints and custom VJPs for the apply stage.

The resampling operator is LINEAR in the image, so its vector-Jacobian
product is simply the transposed operator — itself a banded / ELL apply
that can run on the same XLA and Pallas kernels as the forward:

    dst   = rot90^{-quad} -> (Wy @ q @ Wx.T)          (forward)
    q_bar = (Wy.T @ g @ Wx) -> rot90^{+quad}          (adjoint / VJP)

``transpose_band`` (ops/overlap1d.py) turns each normalised band into the
band of its transpose on the host, so the backward pass is one more
separable banded apply — including the 311 Gpixel/s Pallas kernel when
shapes allow.  For rotated (ELL) operators the adjoint is a scatter-add
(``ops.apply.apply_ell_transpose``).

This is new capability versus the reference (a forward-only C++ program,
Source.cpp:55-911): exact gradients for deformable registration /
differentiable pipelines, and the adjoint itself ("splatting" dst-grid
data back onto the src grid conservatively) as a public API.

Design constraints honoured here:
  * Pallas kernel planners need HOST band tables, so the custom-vjp'd
    callables close over them (tiny for separable: O(n * band) f32).
  * ELL tables are large (Hd*Wd*K^2 f32, ~400 MB at 2048^2), so they are
    passed as ARGUMENTS, never closed over (a closure would embed them as
    jit constants — this box's remote-compile tunnel rejects >~100 MB
    HLO).  Rotated differentiability is therefore opt-in at the API layer
    (apply_operator(differentiable=True)).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops import apply as apply_ops
from .ops import overlap1d
from .ops import weights as weights_ops
from .utils.digest import array_digest
from .utils.lru import LruDict


def _zero_cot(x):
    """Zero cotangent matching a primal (float0 for integer arrays)."""
    dt = jnp.result_type(x)
    if jnp.issubdtype(dt, jnp.inexact):
        return jnp.zeros(jnp.shape(x), dt)
    return np.zeros(jnp.shape(x), jax.dtypes.float0)


# ----------------------------------------------------------------------
# Transposed separable tables (host, cached by operator content)
# ----------------------------------------------------------------------

_TBAND_CACHE = LruDict(64)


def transposed_separable(
    op: "weights_ops.SeparableOperator",
) -> Tuple[overlap1d.Band1D, overlap1d.Band1D]:
    """(Wy^T, Wx^T) as banded operators, content-cached."""
    key = (array_digest(op.wy.weights), array_digest(op.wx.weights),
           array_digest(op.wy.start), array_digest(op.wx.start))
    hit = _TBAND_CACHE.get(key)
    if hit is None:
        hit = (overlap1d.transpose_band(op.wy), overlap1d.transpose_band(op.wx))
        _TBAND_CACHE.put(key, hit)
    return hit


# ----------------------------------------------------------------------
# Custom-VJP separable apply (banded XLA or Pallas forward; transposed
# banded/Pallas backward)
# ----------------------------------------------------------------------


def _sep_apply(kind: str, q, ys, yw, xs, xw, interpret: bool):
    """One separable apply on (..., H, W); kind in {'xla', 'pallas'}."""
    if kind == "xla":
        return apply_ops.apply_separable_banded(
            q, jnp.asarray(ys), jnp.asarray(yw), jnp.asarray(xs),
            jnp.asarray(xw))
    from .ops.pallas_apply import apply_separable_pallas

    lead = q.shape[:-2]
    q3 = q.reshape((-1,) + q.shape[-2:]) if len(lead) != 1 else q
    # uint8 pixels ride the kernel's native 8-bit band DMAs (half the
    # read traffic) but the api-level contract stays float32 output on
    # every route (XLA promotes u8 @ f32 to f32); uint8-in/uint8-out is
    # the ops-level apply_separable_pallas(out_dtype=...) surface
    out_dtype = jnp.float32 if q3.dtype == jnp.uint8 else None
    out = apply_separable_pallas(q3, ys, yw, xs, xw, out_dtype=out_dtype,
                                 interpret=interpret)
    return out.reshape(lead + out.shape[-2:])


def folded_separable_tables(op: "weights_ops.SeparableOperator"):
    """Quadrant-folded forward/backward bands: (yb, xb, tyb, txb, out_t).

    The quadrant pre-rotation is folded into the band tables
    (weights.fold_quadrant_separable) so neither direction ever
    materialises a rot90 of the LARGE array: forward consumes the
    original image, backward produces the original-image cotangent
    directly.  Transposes of flipped bands use the identity
    ``(W P)^T == P W^T`` (overlap1d.reverse_rows_band of the transposed
    band); quadrants 1/3 additionally transpose the SMALL dst-side array
    (``out_t``): the forward transposes its output, the backward its
    incoming cotangent.
    """
    yb, xb, out_t = weights_ops.fold_quadrant_separable(op)
    ty, tx = transposed_separable(op)  # (wy^T, wx^T), content-cached
    rr = overlap1d.reverse_rows_band
    q = op.spec.quadrant % 4
    if q == 0:
        tyb, txb = ty, tx
    elif q == 1:      # yb = wx @ P  ->  yb^T = P @ wx^T ; xb = wy
        tyb, txb = rr(tx), ty
    elif q == 2:      # both flipped
        tyb, txb = rr(ty), rr(tx)
    else:             # yb = wx ; xb = wy @ P
        tyb, txb = tx, rr(ty)
    return yb, xb, tyb, txb, out_t


def make_separable_linear(kind: str, tables, t_tables, out_t: bool,
                          interpret: bool = False):
    """custom-vjp'd fn(src): quadrant-folded separable apply.

    ``tables`` / ``t_tables`` are HOST (ys, yw, xs, xw) for the folded
    forward and its transpose (folded_separable_tables); both are closed
    over (small — the Pallas planner needs concrete values anyway).  The
    quadrant pre-rotation (Source.cpp:159-172) lives inside the tables,
    so both directions run straight on the un-rotated arrays; ``out_t``
    transposes the small dst-side array for quadrants 1/3.
    """

    @jax.custom_vjp
    def f(src):
        out = _sep_apply(kind, src, *tables, interpret)
        return jnp.swapaxes(out, -1, -2) if out_t else out

    def fwd(src):
        # residual leaves must be JAX types: carry the primal dtype as a
        # zero-size array
        return f(src), (jnp.zeros((0,), src.dtype),)

    def bwd(res, g):
        (dt,) = res
        gq = jnp.swapaxes(g, -1, -2) if out_t else g
        sbar = _sep_apply(kind, gq, *t_tables, interpret)
        return (sbar.astype(dt.dtype),)

    f.defvjp(fwd, bwd)
    return f


_SEP_LINEAR_CACHE = LruDict(32)


def separable_linear_for(op, weight_dtype, kind: str,
                         interpret: bool = False):
    """Cached custom-vjp'd apply for a SeparableOperator."""
    wname = jnp.dtype(weight_dtype).name
    key = (kind, wname, interpret, op.spec.quadrant,
           array_digest(op.wy.weights), array_digest(op.wx.weights),
           array_digest(op.wy.start), array_digest(op.wx.start))
    hit = _SEP_LINEAR_CACHE.get(key)
    if hit is None:
        yb, xb, tyb, txb, out_t = folded_separable_tables(op)

        # HOST numpy only: this closure is cached, and a first call inside
        # a jit trace would otherwise capture jnp.asarray(numpy) TRACERS
        # (JAX 0.9 constants-become-arguments) and poison the cache for
        # every later call.  _sep_apply converts at use time; the Pallas
        # planner needs host tables anyway.
        def _pair(b):
            return (np.asarray(b.start),
                    np.asarray(b.weights, dtype=jnp.dtype(weight_dtype)))

        tables = _pair(yb) + _pair(xb)
        t_tables = _pair(tyb) + _pair(txb)
        hit = make_separable_linear(kind, tables, t_tables, out_t, interpret)
        _SEP_LINEAR_CACHE.put(key, hit)
    return hit


# ----------------------------------------------------------------------
# Custom-VJP rotated (ELL) apply: any forward, scatter-add backward
# ----------------------------------------------------------------------


def make_ell_linear(fwd_fn, quadrant: int, q_shape, post=None,
                    post_inv=None):
    """custom-vjp'd f(src, fwd_arrs, base, weights) for a rotated apply.

    ``fwd_fn(q, fwd_arrs)`` is any exact rotated apply of the same
    operator (flat-gather XLA, shear-aligned XLA, or the three-kernel
    Pallas path — their plan tables all re-route the same weights, see
    ops/pallas_shear.py).  ``base``/``weights`` are the raw ELL tables
    used only by the backward scatter; they ride as arguments so they are
    never embedded as jit constants.

    With ``post``/``post_inv`` the wrapper runs in FOLDED-quadrant form
    (weights.fold_quadrant_ell): fwd_fn and the scatter tables consume
    the ORIGINAL image (``quadrant`` is then 0 and ``q_shape`` the
    original source shape), the forward output pays only the small dst
    permutation ``post``, and the backward carries cotangents through
    ``post_inv`` and scatters straight into source orientation — neither
    direction materialises a source-sized rot90.
    """
    if post is not None and quadrant != 0:
        # folded wrappers MUST receive the folded op's quadrant (0): a
        # nonzero quadrant here would silently skip the rotate against
        # unfolded tables — wrong outputs with no error (ADVICE r4)
        raise ValueError(
            "make_ell_linear: post/post_inv imply folded tables "
            f"(quadrant 0), got quadrant={quadrant}")

    @jax.custom_vjp
    def f(src, fwd_arrs, base, w):
        if post is not None:
            return post(fwd_fn(src, fwd_arrs))
        return fwd_fn(apply_ops.quadrant_rotate(src, quadrant), fwd_arrs)

    def fwd(src, fwd_arrs, base, w):
        return f(src, fwd_arrs, base, w), (jnp.zeros((0,), src.dtype),
                                           fwd_arrs, base, w)

    def bwd(res, g):
        dt, fwd_arrs, base, w = res
        if post_inv is not None:
            sbar = apply_ops.apply_ell_transpose(
                post_inv(g), base, w, q_shape).astype(dt.dtype)
        else:
            qbar = apply_ops.apply_ell_transpose(g, base, w, q_shape)
            sbar = apply_ops.quadrant_rotate(
                qbar, -quadrant).astype(dt.dtype)
        return (sbar, jax.tree.map(_zero_cot, fwd_arrs), _zero_cot(base),
                _zero_cot(w))

    f.defvjp(fwd, bwd)
    return f


def _ell_fwd_xla(q, arrs):
    return apply_ops.apply_ell(q, arrs["base"], arrs["weights"])


# ----------------------------------------------------------------------
# Public adjoint apply ("splatting": dst-grid data back to the src grid)
# ----------------------------------------------------------------------


def apply_operator_transpose(
    op,
    cot: jax.Array,
    weight_dtype=jnp.float32,
    impl: str = "auto",
) -> jax.Array:
    """Apply the TRANSPOSED operator: (..., Hd, Wd) -> (..., H, W).

    The exact adjoint of ``apply_operator(op, .)`` as a linear map: for
    any images u, v, ``<apply(op, u), v> == <u, apply_transpose(op, v)>``
    up to fp rounding.  Conservative splatting of dst-grid quantities
    back onto the source grid; also the building block of the custom
    VJPs.  impl: 'auto' routes separable transposes through the Pallas
    kernel on TPU for large shapes, like the forward.
    """
    if isinstance(op, weights_ops.SeparableOperator):
        # quadrant folded into the transposed tables: the adjoint writes
        # the original-image layout directly, so the inverse rot90 of the
        # LARGE source-sized array never materialises (quadrants 1/3 only
        # transpose the small dst-side cotangent)
        _, _, tyb, txb, out_t = folded_separable_tables(op)
        tys = np.asarray(tyb.start)
        tyw = jnp.asarray(tyb.weights, dtype=weight_dtype)
        txs = np.asarray(txb.start)
        txw = jnp.asarray(txb.weights, dtype=weight_dtype)
        if out_t:
            cot = jnp.swapaxes(cot, -1, -2)
        if impl == "auto":
            on_tpu = jax.devices()[0].platform == "tpu"
            big = cot.shape[-2] >= 512 and cot.shape[-1] >= 512
            impl = "pallas" if (on_tpu and big and cot.ndim in (2, 3)) \
                else "xla"
        return _sep_apply(impl, cot, tys, tyw, txs, txw, False)
    if isinstance(op, weights_ops.EllOperator):
        qbar = apply_ops.apply_ell_transpose(
            cot.astype(weight_dtype) if cot.dtype != weight_dtype else cot,
            jnp.asarray(op.base),
            jnp.asarray(op.weights, dtype=weight_dtype),
            op.spec.qrot_shape,
        )
        return apply_ops.quadrant_rotate(qbar, -op.spec.quadrant)
    raise TypeError(f"unknown operator type {type(op)!r}")
