"""Benchmark: 4K -> 1080p area-average resize throughput (BASELINE.md target).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "Gpixel/s",
"vs_baseline": N / 5.0} where value counts *input* pixels processed per
second per chip (batch * 3840 * 2160 / wall-time), bf16 pixel I/O with fp32
accumulation, weights precomputed (the production serving configuration —
geometry is fixed across frames, the operator is cached).

The reference publishes no numbers (BASELINE.md); the driver-provided north
star is >= 5 Gpixel/s/chip on TPU v5p.  Run with no env overrides to use the
real TPU; --backend / --impl / --batch for exploration.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the remote-compile tunnel on this box takes
# minutes per kernel; cache hits make reruns (and the driver's run) fast
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _roundtrip_cost():
    """Measure the relay's dispatch+fetch round trip with a trivial op."""
    f = jax.jit(lambda v: v * 1.0001)
    xs = [jnp.asarray(np.full((8, 128), float(i), np.float32))
          for i in range(6)]
    _ = np.asarray(f(xs[5]))
    best = float("inf")
    for i in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(f(xs[i]))
        best = min(best, time.perf_counter() - t0)
    return best


def timed_scan(apply_fn, frames_all, frames_warm, consts=(),
               target_s: float = 1.5, max_repeats: int = 2000,
               checksum: str = "barrier", max_k: int = 8):
    """Honest device-time measurement on this box's remote-execution relay.

    Hazards, each verified with falsifiable probes (2026-08-16/17):

    1. The relay DEDUPES repeated identical execute requests (same
       executable + same input bytes): a looped 128MB+128MB add "ran" at
       14.6 TB/s.  -> warm-up and measurement use different data; the
       repeat count R is a *traced* argument so probe and measurement
       share one executable but differ in input bytes.
    2. Async dispatch + block_until_ready can return before real
       completion, and every synchronised dispatch pays a ~30 ms round
       trip.  -> ONE dispatch runs the apply R*K times on device and the
       inline-measured round trip is subtracted once.
    3. XLA DCE/hoisting inside the repeat loop: a scalar checksum lets
       elementwise work be sliced away (a bf16 copy "ran" at 284 TB/s); a
       fused full-output sum never writes the output (1.4 TB/s) AND can
       shatter the producer fusion (the stencil path measured 21x slower);
       a loop body not tied to the carry is hoisted out of the fori_loop
       entirely ("34 TB/s", R-independent).  -> each input is tied to the
       loop carry via lax.optimization_barrier (identity, no copy) so the
       body cannot be hoisted, and checksum="barrier" additionally forces
       the output to materialise as a real consumer would.
    4. Scanning over a stacked (K, B, H, W) array materialises a full
       (B, H, W) slice copy per step (Pallas operands need dense buffers):
       at the flagship shape that is 132 MB extra read+write per apply —
       it depressed every round-1/2 number ~2.5x (pallas measured 105.9
       with the scan harness vs 264.9 unrolled, the latter matching the
       20.7 MB/frame HBM traffic model).  -> the K frame sets are passed
       as K SEPARATE jit arguments and the body iterates over them.

    frames_all: (K, B, H, W) distinct data (only the first max_k sets are
    used — variety exists to defeat relay dedupe across calls, not within
    a dispatch).  Returns seconds per (B, H, W) application.

    checksum: "barrier" (default) wraps the output in
    lax.optimization_barrier before the scalar carry — free for Pallas
    kernels (their outputs are materialised anyway) and REQUIRED for any
    pure-XLA path, including the silent fallbacks a case can take.
    "first" carries out[0] bare (only safe when the measured fn is known
    opaque).
    """
    K = min(int(frames_all.shape[0]), max_k)
    fr_list = [frames_all[k] for k in range(K)]
    warm_list = [frames_warm[k] for k in range(K)]
    for a in fr_list + warm_list:
        a.block_until_ready()

    def run(repeats, *args):
        cs, fr = args[:len(consts)], args[len(consts):]

        def outer(_, acc):
            for f in fr:
                f_b, acc = jax.lax.optimization_barrier((f, acc))
                out = apply_fn(f_b, *cs)
                if checksum == "barrier":
                    out = jax.lax.optimization_barrier(out)
                acc = acc + out.ravel()[0].astype(jnp.float32)
            return acc

        return jax.lax.fori_loop(0, repeats, outer, jnp.float32(0.0))[None]

    jfn = jax.jit(run)
    # warm/compile on DIFFERENT data: a second call on identical bytes
    # would be deduped by the relay
    _ = np.asarray(jfn(jnp.int32(1), *consts, *warm_list))
    rt = _roundtrip_cost()
    # differential calibration: the R=1 dispatch carries cold-start costs
    # (first-touch allocation etc. — observed 15x steady state on the
    # rgb1024 config) so a single probe mis-sizes R.  Timing R=1 and R=5
    # and differencing cancels every per-dispatch fixed cost; the same
    # subtraction extracts the final number, so the round trip and cold
    # effects never enter the result.
    t0 = time.perf_counter()
    _ = np.asarray(jfn(jnp.int32(1), *consts, *fr_list))
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = np.asarray(jfn(jnp.int32(5), *consts, *fr_list))
    dt5 = time.perf_counter() - t0
    per_app = max((dt5 - dt1) / (4 * K), 1e-7)
    repeats = int(np.clip(math.ceil(max(target_s, 30.0 * rt)
                                    / (per_app * K)) + 5, 15, max_repeats))
    # wall-clock guard: if timing noise collapsed dt5 - dt1, per_app
    # underestimates and repeats explodes; bound the final dispatch to
    # ~120 s using the directly-measured whole-dispatch time dt5/5 per R
    repeats = min(repeats, max(15, int(120.0 / max(dt5 / 5.0, 1e-3))))
    # extraction: time a small-R and a big-R dispatch (both warm) and
    # difference — per-dispatch fixed costs (round trip, cold-start)
    # cancel.  The tunnel occasionally stalls a single dispatch for
    # hundreds of ms (observed 2026-08-20: a stalled small-R baseline
    # made the span NEGATIVE and the extracted number nonsense at
    # 8e9 Gpixel/s), so a non-physical span is retried with shifted
    # repeat counts — each R is a traced argument, so every retry's
    # request bytes differ and the relay's dedupe cannot serve a cached
    # result (hazard 1 above).
    rs, rb = 6, max(repeats, 16)
    best = None  # (span, per_app)
    accepted = []  # attempts whose span cleared the 5*rt threshold
    for _ in range(4):
        t0 = time.perf_counter()
        _ = np.asarray(jfn(jnp.int32(rs), *consts, *fr_list))
        dts = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = np.asarray(jfn(jnp.int32(rb), *consts, *fr_list))
        dtb = time.perf_counter() - t0
        span = dtb - dts
        per = max(span, 1e-9) / ((rb - rs) * K)
        if best is None or span > best[0]:
            best = (span, per, rs, rb)
        if span >= 5.0 * rt:
            # a tunnel stall on the BIG dispatch also clears the
            # threshold but inflates per (ADVICE r3, opposite sign of
            # the stalled-baseline hazard): accept immediately only when
            # the number is consistent with the dt5-dt1 sizing probe;
            # otherwise keep retrying and take the MIN among accepted
            # attempts (stalls only ever inflate a span)
            accepted.append(per)
            if per <= 3.0 * per_app:
                return per
        # grow the big dispatch (bounded to ~120 s by its own measured
        # per-R time) so the retried span clears the noise floor
        per_r = max(dtb / max(rb, 1), 1e-3)
        rb = max(min(max_repeats, 2 * rb, max(16, int(120.0 / per_r))),
                 rs + 11)
        rs += 1
    if accepted:
        # every accepted attempt looked slow vs the sizing probe —
        # either the probe under-sized (noise collapsed dt5-dt1) or a
        # stall inflated some spans; min is robust against the latter
        return min(accepted)
    span, per, rs, rb = best
    print(f"# warning: differential span {span*1e3:.0f} ms is <5x the "
          f"{rt*1e3:.0f} ms round trip (R={rs}/{rb}) after 4 attempts; "
          "number is loose")
    return per


def build_inputs(batch: int, dtype, K: int = 24):
    from aainterp.grids import make_grid_spec
    from aainterp.ops.weights import separable_operator

    H, W = 2160, 3840
    spec = make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec, mode="exact")
    rng = np.random.default_rng(0)
    # (K, batch, H, W) distinct frame sets for one-dispatch scan timing;
    # bound total to ~3.5 GB (plus an equal warm-up stack)
    K = max(2, min(K, int(3.5e9 / (batch * H * W * 2))))

    def mk():
        x = rng.uniform(0, 1, (K, batch, H, W))
        if jnp.dtype(dtype) == jnp.uint8:
            # native 8-bit pixel path: half the HBM read traffic of bf16
            return jnp.asarray((x * 255.0).astype(np.uint8))
        return jnp.asarray(x.astype(np.float32), dtype=dtype)

    return spec, op, mk(), mk()


def make_fn(impl: str, op, dtype):
    from aainterp.ops import apply as apply_ops

    y_start = jnp.asarray(op.wy.start)
    x_start = jnp.asarray(op.wx.start)
    y_w = jnp.asarray(op.wy.weights, dtype=jnp.float32)
    x_w = jnp.asarray(op.wx.weights, dtype=jnp.float32)

    if impl == "banded":
        def fn(frames):
            return apply_ops.apply_separable_banded(
                frames, y_start, y_w, x_start, x_w
            ).astype(dtype)
    elif impl == "dense":
        wy = jnp.asarray(op.wy.dense(), dtype=jnp.bfloat16)
        wx = jnp.asarray(op.wx.dense(), dtype=jnp.bfloat16)

        def fn(frames):
            return apply_ops.apply_separable_dense(frames, wy, wx).astype(dtype)
    elif impl == "pallas":
        from aainterp.ops.pallas_apply import apply_separable_pallas

        def fn(frames):
            return apply_separable_pallas(
                frames, y_start, y_w, x_start, x_w
            ).astype(dtype)
    elif impl == "stencil":
        # pure-XLA strided-stencil path (portable + differentiable; slow
        # on v5e once outputs materialise — see ops/apply.py)
        from aainterp.ops.apply import apply_separable_stencil, axis_stencil_plan

        py = axis_stencil_plan(op.wy.start, op.wy.weights, 2160)
        px = axis_stencil_plan(op.wx.start, op.wx.weights, 3840)
        assert py is not None and px is not None

        def fn(frames):
            return apply_separable_stencil(
                frames, py, px, y_start, y_w, x_start, x_w
            ).astype(dtype)
    else:
        raise ValueError(impl)
    return jax.jit(fn)


def bench_compose(batch: int, dtype):
    """Fused-pipeline demonstration: 4K -> 1080p -> 720p as TWO chained
    Pallas applies vs ONE composed operator (aa.compose_separable).

    The fused pass reads the 4K source and writes only the 720p output
    (~18.4 MB/frame bf16) where the chain also round-trips the 1080p
    intermediate (~26.7 MB/frame) — on a traffic-bound kernel that is a
    ~1.45x expected win, for free at operator-build time.
    """
    from aainterp.grids import make_grid_spec
    from aainterp.ops.pallas_apply import apply_separable_pallas
    from aainterp.ops.weights import compose_separable, separable_operator

    H, W = 2160, 3840
    spec1 = make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op1 = separable_operator(spec1, mode="exact")
    mid = (op1.wy.n_dst, op1.wx.n_dst)          # 1080 x 1920
    spec2 = make_grid_spec(mid, 3.0, 2.0, (0.0, 0.0), 0.0)
    op2 = separable_operator(spec2, mode="exact")
    fused = compose_separable(op2, op1)

    def tables(op):
        return (jnp.asarray(op.wy.start),
                jnp.asarray(op.wy.weights, jnp.float32),
                jnp.asarray(op.wx.start),
                jnp.asarray(op.wx.weights, jnp.float32))

    t1, t2, tf = tables(op1), tables(op2), tables(fused)
    rng = np.random.default_rng(0)
    K = max(2, min(24, int(3.5e9 / (batch * H * W * 2))))
    frames = jnp.asarray(
        rng.uniform(0, 1, (K, batch, H, W)).astype(np.float32), dtype=dtype)
    warm = jnp.asarray(
        rng.uniform(0, 1, (K, batch, H, W)).astype(np.float32), dtype=dtype)

    def chained(f):
        mid_img = apply_separable_pallas(f, *t1)
        return apply_separable_pallas(mid_img, *t2)

    def one_pass(f):
        return apply_separable_pallas(f, *tf)

    px = batch * H * W
    g_chain = px / timed_scan(chained, frames, warm) / 1e9
    g_fused = px / timed_scan(one_pass, frames, warm) / 1e9
    # correctness cross-check on one frame set (bf16: 1-ulp class)
    a = np.asarray(chained(frames[0]), dtype=np.float32)
    b = np.asarray(one_pass(frames[0]), dtype=np.float32)
    err = float(np.max(np.abs(a - b)))
    return g_chain, g_fused, err


def bench_stream(batch: int, dtype, n_frames: int = 48, depth: int = 3):
    """End-to-end host->device->host streaming at the flagship geometry
    (aainterp.pipeline.stream_apply): wall-clock over n_frames DISTINCT
    host frames (distinct input bytes also defeat the relay's execute
    dedup), pipelined depth-k vs the reference-style serial depth-1 loop.

    This measures the whole serving path — H2D copy, device apply, D2H
    fetch — not just the kernel, so on this box it includes the axon
    relay's ~30 ms synchronised round trips; on locally-attached TPU the
    transfers ride PCIe/DMA and the pipeline hides them under compute.
    """
    import time

    from aainterp.grids import make_grid_spec
    from aainterp.ops.weights import separable_operator
    from aainterp.pipeline import stream_apply

    H, W = 2160, 3840
    spec = make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec, mode="exact")
    rng = np.random.default_rng(0)

    def mk_frames(n):
        # per-frame generation at target dtype: no (n, H, W) float64
        # staging array, and every run gets DISTINCT bytes — the relay
        # dedupes repeated identical execute requests (CLAUDE.md), so
        # reusing one frame set across warm/serial/piped runs would time
        # cache hits, not TPU work
        if jnp.dtype(dtype) == jnp.uint8:
            return [rng.integers(0, 256, (H, W), dtype=np.uint8)
                    for _ in range(n)]
        return [rng.uniform(0, 1, (H, W)).astype(np.float32).astype(dtype)
                for _ in range(n)]

    def run(d):
        # warm (compile + caches) on its own frames, then time fresh ones
        for _ in stream_apply(op, mk_frames(2 * batch), batch=batch,
                              depth=d):
            pass
        frames = mk_frames(n_frames)
        t0 = time.perf_counter()
        n = sum(1 for _ in stream_apply(op, frames, batch=batch, depth=d))
        dt = time.perf_counter() - t0
        assert n == n_frames
        return n_frames * H * W / dt / 1e9

    g_serial = run(1)
    g_piped = run(depth)
    print(f"# stream x{n_frames} frames: depth=1 {g_serial:.2f} "
          f"Gpixel/s, depth={depth} {g_piped:.2f} Gpixel/s")
    return g_serial, g_piped


def bench_rot30(batch: int, iters: int, dtype, impl: str = "auto"):
    """Config 3: 2048x2048 rotation by 30 deg via polygon-clip ELL weights.

    Default path: the three-kernel Pallas rotated apply (ops/pallas_shear:
    residual-roll VMEM shears + one-hot MXU gathers, 9.99 Gpixel/s honest)
    with the XLA
    shear-aligned apply as fallback (1.6 Gpixel/s; the flat XLA gather runs
    at ~0.04 — see BENCHMARKS.md)."""
    from aainterp.grids import make_grid_spec
    from aainterp.ops.shear_apply import make_sheared_apply
    from aainterp.ops.weights import ell_operator

    H = W = 2048
    spec = make_grid_spec((H, W), 1.0, 0.5, (W / 2, H / 2), 30.0)
    if impl == "shear":
        # 3-pass conservative shear decomposition (mode='shear'): the
        # approximate high-throughput rotated mode riding separable-class
        # kernels (ops/pallas_shear3.py) — no ELL operator at all.
        # Measures BOTH decompositions: 'quality' (x-y-x, the default —
        # beats the reference's fast mode on all content) and 'fast'
        # (y-x-y reduce-first — smooth-content contract, ~2x speed).
        from aainterp.ops.pallas_shear3 import (
            apply_shear3_pallas, build_shear3_kernel_plan_cached)
        from aainterp.ops.shear3 import build_shear3_plan

        rng = np.random.default_rng(0)
        K = 8

        def _mk():
            if jnp.dtype(dtype) == jnp.uint8:   # u8-in -> u8-out serving
                return jnp.asarray(rng.integers(
                    0, 256, (K, batch, H, W), dtype=np.uint8))
            return jnp.asarray(
                rng.uniform(0, 1, (K, batch, H, W)).astype(np.float32),
                dtype=dtype)

        frames, warm = _mk(), _mk()
        out = {}
        for dec in ("quality", "fast"):
            plan = build_shear3_plan(spec, decomposition=dec)
            kp = build_shear3_kernel_plan_cached(plan)
            dt = timed_scan(
                lambda f: apply_shear3_pallas(plan, f, kernel_plan=kp
                                              ).astype(dtype),
                frames, warm)
            out[dec] = batch * H * W / dt / 1e9
            print(f"# rot30 shear3[{dec}] dst={spec.dst_shape}: "
                  f"{out[dec]:.2f} Gpixel/s")
        return out
    op = ell_operator(spec, mode="exact")
    if impl in ("auto", "pallas"):
        try:
            from aainterp.ops.pallas_shear import make_pallas_shear_apply

            fn, arrs = make_pallas_shear_apply(op, cache=True)
        except Exception as e:
            print(f"# pallas shear unavailable ({type(e).__name__}: {e}); "
                  "falling back to XLA sheared")
            fn, arrs = make_sheared_apply(op)
    else:
        fn, arrs = make_sheared_apply(op)
    rng = np.random.default_rng(0)
    K = 8
    frames = jnp.asarray(
        rng.uniform(0, 1, (K, batch, H, W)).astype(np.float32), dtype=dtype)
    warm = jnp.asarray(
        rng.uniform(0, 1, (K, batch, H, W)).astype(np.float32), dtype=dtype)
    # weights as jit ARGUMENTS: closed over they become HLO constants
    # (hundreds of MB -> HTTP 413 on the compile tunnel)
    consts = tuple(arrs.values())
    dt = timed_scan(
        lambda f, *cs: fn(f, *cs).astype(dtype), frames, warm, consts=consts
    )
    gpix = batch * H * W / dt / 1e9
    print(f"# rot30 K={op.window} dst={spec.dst_shape}: {gpix:.2f} Gpixel/s")
    return gpix


def bench_rgb1024(batch: int, iters: int, dtype):
    """Config 2: 1024x1024 RGB arbitrary-ratio resize (non-integer scale,
    fractional edge overlaps) — exercises the Pallas MXU fallback (the
    strided fast path requires integer band strides)."""
    from aainterp.grids import make_grid_spec
    from aainterp.ops.pallas_apply import apply_separable_pallas
    from aainterp.ops.weights import separable_operator

    H = W = 1024
    spec = make_grid_spec((H, W), 150.0, 60.0, (0.0, 0.0), 0.0)  # ratio 2.5
    op = separable_operator(spec, mode="exact")
    rng = np.random.default_rng(0)
    K = 64

    def mk():  # batched RGB flattened over channels
        x = rng.uniform(0, 1, (K, batch * 3, H, W))
        if jnp.dtype(dtype) == jnp.uint8:
            return jnp.asarray((x * 255.0).astype(np.uint8))
        return jnp.asarray(x.astype(np.float32), dtype=dtype)

    frames, warm = mk(), mk()
    ys = jnp.asarray(op.wy.start)
    yw = jnp.asarray(op.wy.weights, jnp.float32)
    xs = jnp.asarray(op.wx.start)
    xw = jnp.asarray(op.wx.weights, jnp.float32)
    dt = timed_scan(
        lambda f: apply_separable_pallas(f, ys, yw, xs, xw), frames, warm)
    gpix = batch * 3 * H * W / dt / 1e9
    print(f"# rgb1024 ratio 2.5 dst={spec.dst_shape}: {gpix:.2f} Gpixel/s")
    return gpix


def bench_regrid(batch: int, iters: int):
    """Config 5 (single-chip): 0.1deg -> 1deg conservative lat-lon regrid."""
    from aainterp.regrid import (
        LatLonGrid, apply_band_operators, conservative_regrid_operator,
    )

    src, dst = LatLonGrid(1800, 3600), LatLonGrid(180, 360)
    by, bx = conservative_regrid_operator(src, dst)
    rng = np.random.default_rng(0)
    K = 12
    fields = jnp.asarray(
        rng.uniform(250, 300, (K, batch, 1800, 3600)).astype(np.float32))
    warm = jnp.asarray(
        rng.uniform(250, 300, (K, batch, 1800, 3600)).astype(np.float32))
    # the production route: impl='auto' takes the aligned integer-ratio
    # fast path for this config (ops/apply.aligned_axis_plan — pure-XLA
    # reshape + tap sum, 3.1x the Pallas 2-D banded-tile kernel here);
    # checksum='barrier' (timed_scan default) is REQUIRED on XLA paths
    dt = timed_scan(
        lambda f: apply_band_operators(f, by, bx), fields, warm)
    gpix = batch * 1800 * 3600 / dt / 1e9
    print(f"# regrid 0.1deg->1deg: {gpix:.2f} Gpixel/s")
    return gpix


def bench_sharded(batch: int, dtype):
    """Multi-chip bench scaffolding (VERDICT r2 item 8): sharded separable
    + rotated ELL applies on whatever mesh exists — the 8-device virtual
    CPU mesh here, a real pod slice the day one appears.  Reports total
    and per-chip throughput plus the collective schedule (ppermute hops).
    """
    import math as _math

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from aainterp.grids import make_grid_spec
    from aainterp.ops.weights import ell_operator, separable_operator
    from aainterp.parallel.sharding import (
        _row_halo, sharded_apply_ell, sharded_apply_separable,
    )

    n_dev = jax.device_count()
    rows = 4 if n_dev % 4 == 0 and n_dev >= 4 else (
        2 if n_dev % 2 == 0 else 1)
    data = n_dev // rows
    mesh = Mesh(np.asarray(jax.devices()).reshape(data, rows),
                ("data", "rows"))
    sharding = NamedSharding(mesh, P(None, "data", "rows", None))
    rng = np.random.default_rng(0)
    B = max(batch, 1) * data
    out = {"mesh": {"data": data, "rows": rows},
           "platform": jax.devices()[0].platform}

    # --- separable: flagship-like 2048x3840 2x downscale ---
    H, W = 2048, 3840
    spec = make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec, mode="exact")
    halo = _row_halo(op.wy.start, op.wy.band, H, spec.dst_shape[0], rows)
    sb = H // rows
    hops = -(-halo // sb) if halo else 0
    K = 4

    def _mk():
        if jnp.dtype(dtype) == jnp.uint8:  # u8-in -> u8-out serving path
            return jnp.asarray(rng.integers(0, 256, (K, B, H, W),
                                            dtype=np.uint8))
        return jnp.asarray(rng.uniform(0, 1, (K, B, H, W)).astype(
            np.float32), dtype=dtype)

    frames = jax.device_put(_mk(), sharding)
    warm = jax.device_put(_mk(), sharding)
    dt = timed_scan(
        lambda f: sharded_apply_separable(f, op, mesh).astype(dtype),
        frames, warm)
    g_sep = B * H * W / dt / 1e9
    out["separable"] = {
        "gpixel_per_s": round(g_sep, 3),
        "gpixel_per_s_per_chip": round(g_sep / n_dev, 3),
        "halo_rows": halo, "ppermute_per_apply": 2 * hops,
    }
    print(f"# sharded separable {data}x{rows}: {g_sep:.2f} Gpixel/s total, "
          f"{g_sep / n_dev:.2f}/chip, halo {halo} rows ({2 * hops} ppermutes)")

    # --- rotated ELL near 30 deg (angle scanned for row divisibility) ---
    Hr = Wr = 1024
    spec_r = op_r = None
    for d_ang in [x / 10.0 for x in range(0, 20)]:
        cand = make_grid_spec((Hr, Wr), 1.0, 0.5, (Wr / 2, Hr / 2),
                              30.0 + d_ang)
        if cand.dst_shape[0] % rows == 0 and cand.qrot_shape[0] % rows == 0:
            spec_r = cand
            break
    assert spec_r is not None
    op_r = ell_operator(spec_r, mode="exact")
    base_y = op_r.base[..., 0]
    db_r, sb_r = spec_r.dst_shape[0] // rows, Hr // rows
    halo_r = 0
    for i in range(rows):
        blk = base_y[i * db_r: (i + 1) * db_r]
        halo_r = max(halo_r, i * sb_r - int(blk.min()),
                     int(blk.max()) + op_r.window - (i + 1) * sb_r)
    hops_r = -(-max(halo_r, 0) // sb_r) if halo_r > 0 else 0
    K = 4
    # the rotated path is float-contract (u8 rotated streams cast to
    # float); bench it at f32 regardless of the separable dtype
    dtype_r = (jnp.float32 if jnp.dtype(dtype) == jnp.uint8
               else jnp.dtype(dtype))
    frames_r = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (K, B, Hr, Wr)).astype(np.float32), dtype=dtype_r),
        sharding)
    warm_r = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (K, B, Hr, Wr)).astype(np.float32), dtype=dtype_r),
        sharding)
    # tables as jit args (closed over they become HLO constants -> the
    # compile tunnel's HTTP 413); row-sharded so each chip holds its slice
    impl_r = ("pallas" if jax.devices()[0].platform == "tpu" else "xla")
    try:
        if impl_r != "pallas":
            raise ValueError("non-TPU backend: XLA local apply")
        from aainterp.parallel.sharding import make_sharded_ell_pallas

        fn_r, arrs = make_sharded_ell_pallas(op_r, mesh)
        sharded_keys = {"hx_loc", "r0_loc", "rsel", "w2t"}
        consts = tuple(
            jax.device_put(v, NamedSharding(
                mesh, P(*(("rows",) + (None,) * (v.ndim - 1))))
                if k in sharded_keys else NamedSharding(mesh, P()))
            for k, v in arrs.items())
        dt_r = timed_scan(
            lambda f, *cs: fn_r(f, *cs).astype(dtype_r),
            frames_r, warm_r, consts=consts)
    except ValueError as e:
        print(f"# sharded pallas rotated off-envelope ({e}); XLA local apply")
        impl_r = "xla"
        tab_shard = NamedSharding(mesh, P("rows"))
        base_arr = jax.device_put(jnp.asarray(op_r.base), tab_shard)
        w_arr = jax.device_put(
            jnp.asarray(op_r.weights, dtype=jnp.float32), tab_shard)
        dt_r = timed_scan(
            lambda f, b, w: sharded_apply_ell(
                f, op_r, mesh, base=b, weights=w, impl="xla").astype(dtype_r),
            frames_r, warm_r, consts=(base_arr, w_arr))
    g_rot = B * Hr * Wr / dt_r / 1e9
    out["rot30"] = {
        "angle": spec_r.rotation_angle,
        "impl": impl_r,
        "gpixel_per_s": round(g_rot, 3),
        "gpixel_per_s_per_chip": round(g_rot / n_dev, 3),
        "halo_rows": int(max(halo_r, 0)),
        "ppermute_per_apply": 2 * hops_r,
    }
    print(f"# sharded rot{spec_r.rotation_angle:g} {data}x{rows}: "
          f"{g_rot:.2f} Gpixel/s total, {g_rot / n_dev:.2f}/chip, "
          f"halo {max(halo_r, 0)} rows ({2 * hops_r} ppermutes)")
    return g_sep, out


def bench_sharded_2d(batch: int, dtype):
    """2-D-mesh (data, rows, cols) sharded benches (VERDICT r4 missing
    2): real-chip numbers for the 2-D separable, 2-D rotated, and 2-D
    u8 paths — the (rows x cols) distribution of the reference's hot
    loop (/root/reference/Source.cpp:432-576).  On this box the real
    chip gives the 1x1x1 mesh (machinery + per-chip kernel overhead);
    the virtual CPU mesh exercises the collectives.
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from aainterp.grids import make_grid_spec
    from aainterp.ops.weights import ell_operator, separable_operator
    from aainterp.parallel.sharding import (
        make_sharded_ell_pallas_2d, sharded_apply_ell_2d,
        sharded_apply_separable_2d,
    )

    n_dev = jax.device_count()
    if n_dev >= 8:
        data, rows, cols = n_dev // 4, 2, 2
    elif n_dev >= 4:
        data, rows, cols = 1, 2, 2
    else:
        data, rows, cols = 1, 1, 1
    mesh = Mesh(np.asarray(jax.devices())[: data * rows * cols].reshape(
        data, rows, cols), ("data", "rows", "cols"))
    sharding = NamedSharding(mesh, P(None, "data", "rows", "cols"))
    rng = np.random.default_rng(0)
    B = max(batch, 1) * data
    out = {"mesh": {"data": data, "rows": rows, "cols": cols},
           "platform": jax.devices()[0].platform}
    K = 4

    # --- 2-D separable: flagship-like 2048x3840 2x downscale, at the
    # requested dtype AND the u8 serving contract ---
    H, W = 2048, 3840
    spec = make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec, mode="exact")

    def _mk(dt):
        if jnp.dtype(dt) == jnp.uint8:
            return jnp.asarray(rng.integers(0, 256, (K, B, H, W),
                                            dtype=np.uint8))
        return jnp.asarray(rng.uniform(0, 1, (K, B, H, W)).astype(
            np.float32), dtype=dt)

    for name, dt in (("separable", dtype), ("separable_u8", jnp.uint8)):
        if name == "separable_u8" and jnp.dtype(dtype) == jnp.uint8:
            continue  # already measured
        frames = jax.device_put(_mk(dt), sharding)
        warm = jax.device_put(_mk(dt), sharding)
        dts = timed_scan(
            lambda f: sharded_apply_separable_2d(f, op, mesh).astype(dt),
            frames, warm)
        g = B * H * W / dts / 1e9
        out[name] = {"gpixel_per_s": round(g, 3),
                     "gpixel_per_s_per_chip": round(g / n_dev, 3),
                     "dtype": jnp.dtype(dt).name}
        print(f"# sharded2d {name} {data}x{rows}x{cols}: {g:.2f} "
              f"Gpixel/s total, {g / n_dev:.2f}/chip")

    # --- 2-D rotated ELL near 30 deg (angle scanned so every count
    # divides the mesh: dst rows/cols, src rows/cols) ---
    Hr = Wr = 1024
    spec_r = None
    for d_ang in [x / 10.0 for x in range(0, 40)]:
        cand = make_grid_spec((Hr, Wr), 1.0, 0.5, (Wr / 2, Hr / 2),
                              30.0 + d_ang)
        Hd, Wd = cand.dst_shape
        if (Hd % rows == 0 and Hr % rows == 0 and Wd % cols == 0
                and Wr % cols == 0 and (Hr // rows) % 8 == 0):
            spec_r = cand
            break
    assert spec_r is not None
    op_r = ell_operator(spec_r, mode="exact")
    dtype_r = (jnp.float32 if jnp.dtype(dtype) == jnp.uint8
               else jnp.dtype(dtype))
    frames_r = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (K, B, Hr, Wr)).astype(np.float32),
        dtype=dtype_r), sharding)
    warm_r = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (K, B, Hr, Wr)).astype(np.float32),
        dtype=dtype_r), sharding)
    impl_r = ("pallas" if jax.devices()[0].platform == "tpu" else "xla")
    row_keys = {"hx_loc", "base_h", "r0_loc", "rsel"}
    col_keys = {"gy_loc", "base_v", "c0_loc", "csel"}
    try:
        if impl_r != "pallas":
            raise ValueError("non-TPU backend: XLA local apply")
        fn_r, arrs = make_sharded_ell_pallas_2d(op_r, mesh)

        def _shard_for(k, v):
            if k in row_keys:
                return NamedSharding(mesh, P(*(("rows",)
                                               + (None,) * (v.ndim - 1))))
            if k in col_keys:
                return NamedSharding(mesh, P(*(("cols",)
                                               + (None,) * (v.ndim - 1))))
            # masks / w2t carry leading (n_r, n_c)
            return NamedSharding(mesh, P(*(("rows", "cols")
                                           + (None,) * (v.ndim - 2))))

        consts = tuple(jax.device_put(v, _shard_for(k, v))
                       for k, v in arrs.items())
        dt_r = timed_scan(
            lambda f, *cs: fn_r(f, *cs).astype(dtype_r),
            frames_r, warm_r, consts=consts)
    except ValueError as e:
        print(f"# sharded2d pallas rotated off-envelope ({e}); XLA local")
        impl_r = "xla"
        tab_shard = NamedSharding(mesh, P("rows", "cols"))
        base_arr = jax.device_put(jnp.asarray(op_r.base), tab_shard)
        w_arr = jax.device_put(
            jnp.asarray(op_r.weights, dtype=jnp.float32), tab_shard)
        dt_r = timed_scan(
            lambda f, b, w: sharded_apply_ell_2d(
                f, op_r, mesh, base=b, weights=w,
                impl="xla").astype(dtype_r),
            frames_r, warm_r, consts=(base_arr, w_arr))
    g_rot = B * Hr * Wr / dt_r / 1e9
    out["rot30"] = {"angle": spec_r.rotation_angle, "impl": impl_r,
                    "gpixel_per_s": round(g_rot, 3),
                    "gpixel_per_s_per_chip": round(g_rot / n_dev, 3)}
    print(f"# sharded2d rot{spec_r.rotation_angle:g} {data}x{rows}x"
          f"{cols}: {g_rot:.2f} Gpixel/s total ({impl_r})")
    g_total = out["separable"]["gpixel_per_s"]
    return g_total, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8,
                    help="frames per scan step (the scan runs ~24 steps per dispatch)")
    ap.add_argument("--impl", default="auto",
                    choices=("auto", "banded", "dense", "pallas", "stencil",
                             "shear"))
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--all", action="store_true",
                    help="benchmark every impl and report the best")
    ap.add_argument("--case", default="resize4k",
                    choices=("resize4k", "rot30", "regrid", "rgb1024",
                             "sharded", "sharded2d", "compose", "stream"))
    args = ap.parse_args()

    if args.case == "stream":
        g1, gk = bench_stream(args.batch, jnp.dtype(args.dtype))
        dsfx = "" if args.dtype == "bfloat16" else f"_{args.dtype}"
        print(json.dumps({
            "metric": f"gpixel_per_s_stream_e2e_4k_x{args.batch}{dsfx}",
            "value": round(gk, 3), "unit": "Gpixel/s",
            "vs_baseline": round(gk / 5.0, 3),
            "depth1_serial": round(g1, 3),
            "pipeline_speedup": round(gk / g1, 3)}))
        return

    if args.case == "compose":
        g_chain, g_fused, err = bench_compose(args.batch,
                                              jnp.dtype(args.dtype))
        print(json.dumps({
            "metric": f"gpixel_per_s_4k_1080_720_fused_x{args.batch}",
            "value": round(g_fused, 3), "unit": "Gpixel/s",
            "vs_baseline": round(g_fused / 5.0, 3),
            "chained": round(g_chain, 3),
            "fused_over_chained": round(g_fused / g_chain, 3),
            "max_abs_err_fused_vs_chained": err}))
        return

    if args.case == "sharded2d":
        g, detail = bench_sharded_2d(args.batch, jnp.dtype(args.dtype))
        m = detail["mesh"]
        print(json.dumps({
            "metric": "gpixel_per_s_sharded2d_separable_"
                      f"{m['data']}x{m['rows']}x{m['cols']}",
            "value": round(g, 3), "unit": "Gpixel/s",
            "vs_baseline": round(g / 5.0, 3), "detail": detail}))
        return

    if args.case == "sharded":
        g, detail = bench_sharded(args.batch, jnp.dtype(args.dtype))
        print(json.dumps({
            "metric": "gpixel_per_s_sharded_separable_"
                      f"{detail['mesh']['data']}x{detail['mesh']['rows']}",
            "value": round(g, 3), "unit": "Gpixel/s",
            "vs_baseline": round(g / 5.0, 3), "detail": detail}))
        return

    if args.case == "rgb1024":
        g = bench_rgb1024(args.batch, args.iters, jnp.dtype(args.dtype))
        dsfx = "" if args.dtype == "bfloat16" else f"_{args.dtype}"
        print(json.dumps({
            "metric": f"gpixel_per_s_rgb1024_ratio2.5_x{args.batch}{dsfx}",
            "value": round(g, 3), "unit": "Gpixel/s",
            "vs_baseline": round(g / 5.0, 3)}))
        return
    if args.case == "rot30":
        g = bench_rot30(args.batch, args.iters, jnp.dtype(args.dtype),
                        impl=args.impl)
        # information-preservation PSNR vs the interpolators the reference
        # README positions itself against (rotate +30/-30 round trip at a
        # CI-sized 512 grid; the metric is size-stable)
        from aainterp.baselines import compare_rotation_roundtrip
        img = np.random.default_rng(0).uniform(0, 1, (512, 512))
        img[128:384, 128:384] += 1.0  # structure so PSNR is meaningful
        psnr = {k: round(v, 2)
                for k, v in compare_rotation_roundtrip(img, 30.0).items()}
        if args.impl == "shear":
            print(json.dumps({
                "metric": f"gpixel_per_s_2048_rot30_shear_x{args.batch}",
                "value": round(g["quality"], 3), "unit": "Gpixel/s",
                "vs_baseline": round(g["quality"] / 5.0, 3),
                "fast_decomposition": round(g["fast"], 3),
                "psnr_roundtrip_db": psnr}))
            return
        print(json.dumps({
            "metric": f"gpixel_per_s_2048_rot30_x{args.batch}",
            "value": round(g, 3), "unit": "Gpixel/s",
            "vs_baseline": round(g / 5.0, 3),
            "psnr_roundtrip_db": psnr}))
        return
    if args.case == "regrid":
        g = bench_regrid(args.batch, args.iters)
        print(json.dumps({
            "metric": f"gpixel_per_s_regrid_0p1_to_1deg_x{args.batch}",
            "value": round(g, 3), "unit": "Gpixel/s",
            "vs_baseline": round(g / 5.0, 3)}))
        return

    dtype = jnp.dtype(args.dtype)
    platform = jax.devices()[0].platform
    spec, op, frames, warm = build_inputs(args.batch, dtype)
    in_pixels = args.batch * 2160 * 3840

    def run(impl):
        try:
            fn = make_fn(impl, op, dtype)
            dt = timed_scan(fn, frames, warm)
            return in_pixels / dt / 1e9
        except Exception as e:  # pragma: no cover
            print(f"# impl {impl} failed: {type(e).__name__}: {e}")
            return None

    if args.all:
        results = {}
        for impl in ("pallas", "banded", "dense"):
            g = run(impl)
            if g is not None:
                results[impl] = g
                print(f"# {impl}: {g:.2f} Gpixel/s")
        best_impl = max(results, key=results.get)
        gpix = results[best_impl]
    elif args.impl == "auto":
        # pallas is the production path; banded is the fallback if the
        # kernel fails on this backend
        best_impl = "pallas"
        gpix = run("pallas")
        if gpix is None:
            best_impl = "banded"
            gpix = run("banded")
    else:
        best_impl = args.impl
        gpix = run(args.impl)

    dname = {"bfloat16": "bf16", "float32": "f32", "uint8": "u8"}.get(
        args.dtype, args.dtype)
    print(json.dumps({
        "metric": f"gpixel_per_s_4k_to_1080p_{dname}_x{args.batch} "
                  f"({best_impl}, {platform})",
        "value": round(gpix, 3),
        "unit": "Gpixel/s",
        "vs_baseline": round(gpix / 5.0, 3),
    }))


if __name__ == "__main__":
    main()
