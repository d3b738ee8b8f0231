"""rgb1024 (config 2) tile_y sweep on the honest harness.

Config 2 sits at 202.7 Gpixel/s = ~57% of its ~353 Gpixel/s src-pixel
HBM bound, unlike the flagship's 94%.  Hd = 410 has no 8-multiple
divisor in [40, 128], so the 1-D kernel runs nty = 4 row tiles per
frame (F*nty = 96 Mosaic programs per 24-frame apply) with a 26/128-row
last tile.  This sweep probes whether per-program overhead or the
band-overlap read tax dominates by varying tile_y.

Run on the real TPU: python benchmarks/rgb1024_tile_sweep.py [--tile_y N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from bench import timed_scan  # noqa: E402  (honest harness)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile_y", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)

    from aainterp.grids import make_grid_spec
    from aainterp.ops.pallas_apply import apply_separable_pallas
    from aainterp.ops.weights import separable_operator

    H = W = 1024
    spec = make_grid_spec((H, W), 150.0, 60.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec, mode="exact")
    rng = np.random.default_rng(0)
    K = 8
    B = args.batch * 3
    frames = jnp.asarray(
        rng.uniform(0, 1, (K, B, H, W)).astype(np.float32), dtype=dtype)
    warm = jnp.asarray(
        rng.uniform(0, 1, (K, B, H, W)).astype(np.float32), dtype=dtype)
    ys = jnp.asarray(op.wy.start)
    yw = jnp.asarray(op.wy.weights, jnp.float32)
    xs = jnp.asarray(op.wx.start)
    xw = jnp.asarray(op.wx.weights, jnp.float32)
    dt = timed_scan(
        lambda f: apply_separable_pallas(f, ys, yw, xs, xw,
                                         tile_y=args.tile_y),
        frames, warm)
    gpix = B * H * W / dt / 1e9
    print(f"tile_y={args.tile_y}: {gpix:.2f} Gpixel/s "
          f"({dt / B * 1e6:.1f} us/frame)")


if __name__ == "__main__":
    main()
