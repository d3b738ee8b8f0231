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
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Optional, Sequence, Tuple, \
    Union

import jax
import jax.numpy as jnp
import numpy as np

from .ops import weights as weights_ops
from .ops.overlap1d import Band1D

OperatorLike = Union["weights_ops.SeparableOperator",
                     "weights_ops.EllOperator",
                     Tuple[Band1D, Band1D],
                     Callable]


def _host_band(b: Band1D) -> Band1D:
    """Band1D with HOST (numpy) tables.

    The banded steps close over their bands inside ``jax.jit``; closed-
    over *device* arrays are lifted to jit arguments (tracers) by
    current JAX, which breaks the Pallas routes' host-side plan prep
    (``np.asarray`` on a traced start vector).  numpy closures stay
    baked trace-time constants — and band tables are small, so
    embedding them in HLO is safe.
    """
    return Band1D(start=np.asarray(b.start), weights=np.asarray(b.weights),
                  n_src=b.n_src, n_dst=b.n_dst)


def _make_step(op: OperatorLike, impl: str, weight_dtype, precision: str):
    """One-batch apply fn for ``op``; (..., H, W) in, (..., Hd, Wd) out.

    Uses the same routing as the public applies: a ``(Band1D, Band1D)``
    pair or a SeparableOperator rides ``regrid.apply_band_operators``
    (u8-in -> u8-out on every route, Pallas on TPU); an EllOperator
    rides ``api.apply_operator`` (kernel plans hold their tables as
    device ARGUMENTS, so nothing large is baked into HLO).
    """
    from .regrid import apply_band_operators

    if not isinstance(op, (weights_ops.SeparableOperator,
                           weights_ops.EllOperator, tuple)) and callable(op):
        return op  # user-supplied step: any jittable batch -> batch fn
    if isinstance(op, tuple):
        by, bx = op
        if not (isinstance(by, Band1D) and isinstance(bx, Band1D)):
            raise TypeError(
                "operator tuple must be a (Band1D, Band1D) pair, got "
                f"({type(by).__name__}, {type(bx).__name__})")
        # jit so each batch is ONE dispatch (band tables are small — safe
        # to close over; the eager u8 round/clip tail would otherwise
        # cost extra per-batch round trips)
        by, bx = _host_band(by), _host_band(bx)
        return jax.jit(lambda x: apply_band_operators(
            x, by, bx, impl=impl, precision=precision))
    if isinstance(op, weights_ops.SeparableOperator):
        yb, xb, out_t = weights_ops.fold_quadrant_separable(op)
        yb, xb = _host_band(yb), _host_band(xb)

        @jax.jit
        def step(x):
            out = apply_band_operators(x, yb, xb, impl=impl,
                                       precision=precision)
            # quadrants 1/3 transpose the SMALL dst-side output
            return jnp.swapaxes(out, -1, -2) if out_t else out

        return step
    if isinstance(op, weights_ops.EllOperator):
        from .api import apply_operator

        ell_impl = "auto" if impl in ("auto", "pallas", "xla") else impl

        def step(x):
            # the rotated kernels are not u8-native; rotated streams are
            # float-out by contract
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32)
            return apply_operator(op, x, weight_dtype=weight_dtype,
                                  impl=ell_impl)

        return step
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
    impl / precision : forwarded to the underlying apply (see
        ``regrid.apply_band_operators`` / ``api.apply_operator``).
        weight_dtype applies to the EllOperator route only; the banded
        routes run float32 weights (their fixed contract).

    Results come back in input order; output dtype follows the
    underlying route (uint8 for uint8 separable input, else the apply's
    native float dtype).
    """
    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    step = _make_step(op, impl, weight_dtype, precision)
    # validate eagerly; the generator itself starts lazily
    return _stream_run(step, frames, batch, depth)


def _stream_run(step, frames, batch: int, depth: int):
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
            if len(inflight) >= depth:  # at most `depth` in flight;
                yield from _drain_oldest()  # depth=1 is truly serial
    if buf:  # zero-pad the tail to the compiled batch shape
        n = len(buf)
        stack = np.zeros((batch,) + shape, dtype)
        stack[:n] = np.stack(buf)
        _submit(stack, n)
    while inflight:
        yield from _drain_oldest()


# ----------------------------------------------------------------------
# File streaming: threaded prefetch loader + end-to-end serving loop
# ----------------------------------------------------------------------


def _default_reader(path: str) -> np.ndarray:
    """CSV via the reference-semantics reader — the buffered native C++
    decoder when built (ctypes calls drop the GIL, so decodes overlap
    device work; Source.cpp:1450-1495 semantics) — and grayscale raster
    load otherwise."""
    from . import native
    from .utils import io as iom

    if path.lower().endswith(".csv"):
        if native.available():
            return native.csv_read_native(path)
        return iom.csv_read(path)
    return iom.image_read(path, as_gray=True)


def iter_files(paths: Sequence[str],
               reader: Optional[Callable[[str], np.ndarray]] = None,
               *, threads: int = 4, prefetch: int = 8
               ) -> Iterator[np.ndarray]:
    """Ordered prefetching file loader: up to ``prefetch`` reads in
    flight on a thread pool, yielded strictly in input order.

    The default reader is ``_default_reader`` (native CSV when built).
    Read errors surface on the yield of the failing file, in order.
    """
    if reader is None:
        reader = _default_reader
    paths = list(paths)
    with ThreadPoolExecutor(max_workers=max(1, threads)) as ex:
        pending = deque()
        i = 0
        while i < len(paths) or pending:
            while i < len(paths) and len(pending) < max(1, prefetch):
                pending.append(ex.submit(reader, paths[i]))
                i += 1
            yield pending.popleft().result()


def stream_apply_files(
    op: OperatorLike,
    in_paths: Sequence[str],
    out_paths: Optional[Sequence[str]] = None,
    *,
    batch: int = 8,
    depth: int = 2,
    threads: int = 4,
    sig_digits: int = 6,
    impl: str = "auto",
    weight_dtype=jnp.float32,
    precision: str = "auto",
) -> list:
    """End-to-end file serving loop: read -> apply -> write, pipelined.

    The production counterpart of the reference's serial main()
    (Source.cpp:1216-1320, one file per process invocation): reads
    prefetch on a thread pool, the device pipeline keeps ``depth``
    batches in flight, and CSV writes run on the pool too, so steady
    state overlaps decode, H2D, compute, D2H, and encode.  Outputs
    default to the reference's ``<base>_mod.csv`` naming next to each
    input; ``sig_digits=6`` matches the reference's stream precision
    (Source.cpp:1508).  Returns the output paths (all writes joined).
    """
    from .utils import io as iom

    in_paths = list(in_paths)
    if out_paths is None:
        out_paths = [iom.default_output_path(p) for p in in_paths]
    else:
        out_paths = list(out_paths)
        if len(out_paths) != len(in_paths):
            raise ValueError(
                f"{len(in_paths)} inputs but {len(out_paths)} outputs")
    # device apply contract is f32 (the 6-sig-digit CSV output loses
    # nothing); float64 host reads would only downcast noisily at put
    frames = (f.astype(np.float32, copy=False)
              for f in iter_files(in_paths, threads=threads))
    with ThreadPoolExecutor(max_workers=max(1, threads)) as ex:
        # bound the pending-write queue: each future pins its output
        # array until written, so an unbounded list would grow host
        # memory without limit when the disk is slower than the device
        writes: deque = deque()
        for out, path in zip(
            stream_apply(op, frames, batch=batch, depth=depth, impl=impl,
                         weight_dtype=weight_dtype, precision=precision),
            out_paths,
        ):
            writes.append(ex.submit(iom.csv_write, path, out, sig_digits))
            while len(writes) > 2 * max(1, threads):
                writes.popleft().result()  # surface write errors, in order
        for w in writes:
            w.result()
    return out_paths
