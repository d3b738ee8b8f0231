"""Mosaic/libtpu watchlist: one command re-tests every parked win.

Four measured optimisations are blocked by restrictions of the CURRENT
v5e libtpu's Mosaic lowering (dossiers in BENCHMARKS.md).  Each probe
below attempts the exact blocked lowering in a minimal kernel and
reports lifted/blocked, so a libtpu bump is checked in seconds instead
of relying on prose reminders ("re-test on every libtpu bump" appeared
in three places; this file replaces them — VERDICT r4 item 3).

Run on the real chip:  python benchmarks/mosaic_watchlist.py
(off-TPU the probes report SKIP; the env-gated test in
tests/test_tpu_smoke.py runs the harness on CI and the live chip.)

| probe          | blocked lowering                         | parked win |
|----------------|------------------------------------------|------------|
| strided_y_bf16 | per-parity size-1 DMA slice vs bf16      | exact strided y-pass: ~40x fewer y FLOPs (flagship currently DMA-hidden; wide-band compute-bound cases win) |
| strided_load   | last-dim-strided ref read (needs last    | u8 VPU x-pass `xpair`: deletes the 15.4 us unhidden x dots, u8 flagship 30.9 -> ~17 us/frame (~490 G) |
|                | dim == 128 exactly)                      | |
| value_slice    | strided slice of a VALUE (lowers to      | same `xpair` formulation, alternative spelling |
|                | rejected gather)                         | |
| unaligned_dma  | row-sliced DMA with non-128-aligned last | regrid aligned-path fusion: reclaim ~6.7 us of 42.1 us/frame at W=3600 (-> ~180 Gpixel/s) |
|                | dim (W=3600)                             | |
| high_dot       | Precision.HIGH dot (only DEFAULT /       | native bf16x3 middle point replacing the manual hi/lo-split scheme (regrid f32 precision at half HIGHEST's passes) |
|                | HIGHEST lower)                           | |
| vpu_dyn_rows   | fori_loop of dynamic sublane slices      | exact VPU y-pass (y_pass='vpu'): per-row band taps without densified-band MXU waste |
"""

from __future__ import annotations

import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _run(fn):
    """Compile + run a probe; returns (status, detail)."""
    try:
        out = fn()
        jax.block_until_ready(out)
        return "LIFTED", ""
    except Exception as e:  # noqa: BLE001 - any compile/runtime error
        msg = f"{type(e).__name__}: {e}"
        return "blocked", msg.splitlines()[0][:160]


def probe_strided_y_bf16():
    """Per-parity DMA with a size-1 index on a packed bf16 sub-tile dim.

    Blocked as: "Slice shape along dimension 2 must be aligned to
    tiling (2), but is 1" (bf16 (16, 128) sub-tile packing)."""
    m = 2
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 32, m, 256)).astype(np.float32), jnp.bfloat16)

    def kernel(src_ref, out_ref, buf, sem):
        dma = pltpu.make_async_copy(
            src_ref.at[0, pl.ds(0, 16), 1, :], buf, sem)
        dma.start()
        dma.wait()
        out_ref[:] = buf[:].astype(jnp.float32)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 256), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, 256), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )(x)


def probe_strided_load():
    """Lane-strided ref read: tpu.strided_load demands the base memref's
    last dim be EXACTLY 128 ("The last dim size is not 128 in original
    base memref", strides=[1,2] on memref<120x3840xf32>)."""
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (120, 3840)).astype(np.float32))

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:, ::2]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((120, 1920), jnp.float32),
    )(x)


def probe_value_slice():
    """Strided slice of a VALUE (not a ref): lowers to a gather Mosaic
    rejects outright on this backend."""
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (8, 512)).astype(np.float32))

    def kernel(x_ref, o_ref):
        v = x_ref[:]
        o_ref[:] = v[:, ::2] + v[:, 1::2]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
    )(x)


def probe_unaligned_dma():
    """Row-sliced DMA whose (fully copied) last dim is not 128-aligned:
    "Slice shape along dimension 1 must be aligned to tiling (128), but
    is 3600" — blocks Pallas on regrid's W=3600 sources."""
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (64, 3600)).astype(np.float32))

    def kernel(src_ref, out_ref, buf, sem):
        dma = pltpu.make_async_copy(src_ref.at[pl.ds(8, 16), :], buf, sem)
        dma.start()
        dma.wait()
        out_ref[:] = buf[:]

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 3600), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, 3600), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(x)


def probe_high_dot():
    """Precision.HIGH dot: Mosaic lowers only DEFAULT and HIGHEST
    (NotImplementedError for the bf16x3 middle point, 2026-08-19)."""
    a = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (128, 128)).astype(np.float32))

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
    )(a, a)


def probe_vpu_dyn_rows():
    """fori_loop over dynamic sublane slices (the exact VPU y-pass
    formulation): crashed the Mosaic compiler in round 1."""
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (64, 256)).astype(np.float32))
    offs = jnp.asarray(np.arange(16, dtype=np.int32))

    def kernel(off_ref, x_ref, o_ref):
        def body(r, _):
            off = off_ref[r]
            o_ref[pl.ds(r, 1), :] = (x_ref[pl.ds(off, 1), :]
                                     + x_ref[pl.ds(off + 1, 1), :])
            return 0

        jax.lax.fori_loop(0, 16, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, 256), jnp.float32),
    )(offs, x)


PROBES = [
    ("strided_y_bf16", probe_strided_y_bf16,
     "exact strided y-pass (~40x fewer y FLOPs; wide-band bf16 cases)"),
    ("strided_load", probe_strided_load,
     "u8 VPU x-pass xpair: u8 flagship 30.9 -> ~17 us/frame (~490 G)"),
    ("value_slice", probe_value_slice,
     "same xpair win, value-slice spelling"),
    ("unaligned_dma", probe_unaligned_dma,
     "regrid W=3600 fusion: 42.1 -> ~35 us/frame (~180 G)"),
    ("high_dot", probe_high_dot,
     "native bf16x3 precision point (replaces manual hi/lo split)"),
    ("vpu_dyn_rows", probe_vpu_dyn_rows,
     "exact VPU y-pass (y_pass='vpu') without densified-band waste"),
]


def run_watchlist(verbose: bool = True):
    """Run every probe; returns {name: (status, detail)}."""
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    try:
        ver = dev.client.platform_version
    except Exception:  # noqa: BLE001
        ver = "unknown"
    if verbose:
        print(f"# backend: {dev.platform} ({ver})")
    results = {}
    for name, fn, win in PROBES:
        if not on_tpu:
            results[name] = ("SKIP", "no TPU backend")
        else:
            results[name] = _run(fn)
        if verbose:
            status, detail = results[name]
            print(f"{name:16s} {status:8s} win: {win}")
            if detail:
                print(f"{'':16s} {'':8s} {detail}")
    lifted = [n for n, (s, _) in results.items() if s == "LIFTED"]
    if verbose and on_tpu:
        if lifted:
            print(f"\n# LIFTED on this libtpu: {', '.join(lifted)} — "
                  "re-run the parked implementations (BENCHMARKS.md "
                  "dossiers name each)")
        else:
            print("\n# all watchlist restrictions still in place")
    return results


if __name__ == "__main__":
    res = run_watchlist()
    sys.exit(0)
