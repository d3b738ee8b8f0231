"""Streaming executor: sustained host->device->host resampling.

The reference program's main() is a strictly serial loop — read a CSV,
compute, write, repeat (Source.cpp:1216-1320) — so its end-to-end rate
is the SUM of IO and compute time.  On TPU the same workload is a
pipelining problem: the H2D copy of batch n+1 and the D2H fetch of
batch n-1 should hide under the device compute of batch n.  JAX's
dispatch model gives this for free without threads: ``jax.device_put``
and jitted calls are asynchronous, and only materialising a result on
the host (``np.asarray``) blocks.  ``stream_apply`` therefore keeps
``depth`` batches in flight and forces only the OLDEST one, so steady
state overlaps host IO, PCIe transfers, and TPU compute.

Shapes are static by construction (one compiled executable): frames are
stacked into fixed-size batches and the final partial batch is
zero-padded to the same shape, then trimmed on yield.
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, Iterator, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .ops import weights as weights_ops
from .ops.overlap1d import Band1D

OperatorLike = Union["weights_ops.SeparableOperator",
                     "weights_ops.EllOperator",
                     Tuple[Band1D, Band1D]]


def _make_step(op: OperatorLike, impl: str, weight_dtype, precision: str):
    """One-batch apply fn for ``op``; (..., H, W) in, (..., Hd, Wd) out.

    Uses the same routing as the public applies: a ``(Band1D, Band1D)``
    pair or a SeparableOperator rides ``regrid.apply_band_operators``
    (u8-in -> u8-out on every route, Pallas on TPU); an EllOperator
    rides ``api.apply_operator`` (kernel plans hold their tables as
    device ARGUMENTS, so nothing large is baked into HLO).
    """
    from .regrid import apply_band_operators

    if isinstance(op, tuple):
        by, bx = op
        if not (isinstance(by, Band1D) and isinstance(bx, Band1D)):
            raise TypeError(
                "operator tuple must be a (Band1D, Band1D) pair, got "
                f"({type(by).__name__}, {type(bx).__name__})")
        return lambda x: apply_band_operators(
            x, by, bx, impl=impl, precision=precision)
    if isinstance(op, weights_ops.SeparableOperator):
        yb, xb, out_t = weights_ops.fold_quadrant_separable(op)

        def step(x):
            out = apply_band_operators(x, yb, xb, impl=impl,
                                       precision=precision)
            # quadrants 1/3 transpose the SMALL dst-side output
            return jnp.swapaxes(out, -1, -2) if out_t else out

        return step
    if isinstance(op, weights_ops.EllOperator):
        from .api import apply_operator

        ell_impl = "auto" if impl in ("auto", "pallas", "xla") else impl
        return lambda x: apply_operator(op, x, weight_dtype=weight_dtype,
                                        impl=ell_impl)
    raise TypeError(f"unknown operator type {type(op)!r}")


def stream_apply(
    op: OperatorLike,
    frames: Iterable[np.ndarray],
    *,
    batch: int = 8,
    depth: int = 2,
    impl: str = "auto",
    weight_dtype=jnp.float32,
    precision: str = "auto",
) -> Iterator[np.ndarray]:
    """Stream host frames through ``op``; yields one host array per frame.

    Parameters
    ----------
    op : a prebuilt Operator (``aa.build_operator``) or a raw
        ``(Band1D, Band1D)`` pair (``aa.compose_separable`` output, a
        regrid operator, or ``area_resize``-style interval bands).
    frames : iterable of equally-shaped host arrays, each ``(H, W)`` or
        ``(..., H, W)`` (e.g. ``(C, H, W)`` planar RGB).  uint8 frames
        keep the u8-in -> u8-out contract on separable/banded routes.
    batch : frames per device batch (one compiled executable; the tail
        is zero-padded to the same shape and trimmed on yield).
    depth : device batches kept in flight.  ``depth=1`` degenerates to
        the reference's serial read/compute/write loop; ``depth>=2``
        overlaps the H2D copy and dispatch of newer batches with the
        blocking D2H fetch of the oldest.
    impl / weight_dtype / precision : forwarded to the underlying apply
        (see ``regrid.apply_band_operators`` / ``api.apply_operator``).

    Results come back in input order; output dtype follows the
    underlying route (uint8 for uint8 separable input, else the apply's
    native float dtype).
    """
    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    step = _make_step(op, impl, weight_dtype, precision)

    inflight: deque = deque()  # (device_out, n_valid)
    shape = dtype = None
    buf = []

    def _submit(stack: np.ndarray, n_valid: int) -> None:
        x = jax.device_put(stack)        # async H2D
        inflight.append((step(x), n_valid))  # async dispatch

    def _drain_oldest():
        out, n = inflight.popleft()
        host = np.asarray(out)           # blocks on the OLDEST only
        for i in range(n):
            yield host[i]

    for f in frames:
        f = np.asarray(f)
        if shape is None:
            shape, dtype = f.shape, f.dtype
            if len(shape) < 2:
                raise ValueError(
                    f"frames must be at least 2-D (H, W), got shape {shape}")
        elif f.shape != shape or f.dtype != dtype:
            raise ValueError(
                f"frame shape/dtype changed mid-stream: expected "
                f"{shape}/{dtype}, got {f.shape}/{f.dtype}")
        buf.append(f)
        if len(buf) == batch:
            _submit(np.stack(buf), batch)
            buf = []
            if len(inflight) > depth:
                yield from _drain_oldest()
    if buf:  # zero-pad the tail to the compiled batch shape
        n = len(buf)
        stack = np.zeros((batch,) + shape, dtype)
        stack[:n] = np.stack(buf)
        _submit(stack, n)
    while inflight:
        yield from _drain_oldest()
