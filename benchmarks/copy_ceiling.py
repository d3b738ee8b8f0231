"""HBM copy ceiling at arbitrary frame geometry (honest harness).

The rgb1024 decomposition measured a (128,1024)-tiled bf16 copy at
1.18 TB/s COMBINED read+write — above the 819 GB/s nominal HBM figure,
i.e. reads and writes overlap on this chip.  This probe measures the
same ceiling at other geometries (notably the 2160x3840 flagship frame)
to establish whether the flagship kernel's 775 GB/s combined is at the
true DMA ceiling or only at the single-direction arithmetic bound.

Run on the real TPU: python benchmarks/copy_ceiling.py --H 2160 --W 3840
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import timed_scan  # noqa: E402


@functools.lru_cache(maxsize=8)
def _build_copy(F, H, W, TY, dtype_name):
    dtype = jnp.dtype(dtype_name)
    nt = H // TY

    def kernel(src_ref, out_ref):
        out_ref[0] = src_ref[0]

    return pl.pallas_call(
        kernel,
        grid=(F * nt,),
        in_specs=[pl.BlockSpec(
            (1, TY, W), lambda t: (jax.lax.div(t, nt), jax.lax.rem(t, nt), 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, TY, W), lambda t: (jax.lax.div(t, nt), jax.lax.rem(t, nt), 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, nt * TY, W), dtype),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--H", type=int, default=2160)
    ap.add_argument("--W", type=int, default=3840)
    ap.add_argument("--tile_y", type=int, default=120)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)
    H, W, B = args.H, args.W, args.batch
    assert H % args.tile_y == 0, (H, args.tile_y)
    copy = _build_copy(B, H, W, args.tile_y, dtype.name)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 1, (8, B, H, W)).astype(np.float32),
                         dtype=dtype)
    warm = jnp.asarray(rng.uniform(0, 1, (8, B, H, W)).astype(np.float32),
                       dtype=dtype)
    dt = timed_scan(lambda f: copy(f), frames, warm)
    nbytes = H * W * dtype.itemsize
    print(f"copy {H}x{W} {dtype.name} tile_y={args.tile_y}: "
          f"{dt / B * 1e6:.1f} us/frame, "
          f"{2 * nbytes / (dt / B) / 1e9:.0f} GB/s combined "
          f"({nbytes / (dt / B) / 1e9:.0f} GB/s each way)")


if __name__ == "__main__":
    main()
