"""u8 flagship tile sweep: the bitcast route is MXU-bound, tiles matter.

With the bitcast byte-split unpack the u8 4K->1080p apply measures
31.2 us/frame against a ~14.7 us HBM-traffic floor — unlike bf16 (where
25 us of band DMA hides all MXU work), the u8 MXU passes are EXPOSED:

  y pass:  Hd x SY x W   with SY ~ 2*TY + pad   (densified band)
  x pass:  Hd x SX x Wd  with SX ~ 2*TX + pad-to-128

Both scale with the tile edge, so SMALLER tile_y cuts y FLOPs almost
linearly (TY=40: SY 272 -> ~116) and LARGER tile_x amortises the
128-alignment pad (TX=384: K/dst 4.0 -> 2.33) — the opposite of the
bf16 tuning, where fewer programs won because DMA dominated.

Run on the real TPU:
  python benchmarks/u8_tile_sweep.py --ty 40 --tx 384
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from bench import timed_scan  # noqa: E402

H, W = 2160, 3840


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ty", type=int, default=120)
    ap.add_argument("--tx", type=int, default=128)
    ap.add_argument("--slots", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from aainterp.grids import make_grid_spec
    from aainterp.ops.pallas_apply import apply_separable_pallas
    from aainterp.ops.weights import separable_operator

    spec = make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec, mode="exact")
    ys = jnp.asarray(op.wy.start)
    yw = jnp.asarray(np.asarray(op.wy.weights, np.float32))
    xs = jnp.asarray(op.wx.start)
    xw = jnp.asarray(np.asarray(op.wx.weights, np.float32))

    rng = np.random.default_rng(0)

    def mk():
        return jnp.asarray(rng.integers(0, 256, (8, args.batch, H, W),
                                        dtype=np.uint8))

    frames, warm = mk(), mk()
    dt = timed_scan(
        lambda f: apply_separable_pallas(f, ys, yw, xs, xw,
                                         tile_y=args.ty, tile_x=args.tx,
                                         n_slots=args.slots),
        frames, warm)
    g = args.batch * H * W / dt / 1e9
    print(f"ty={args.ty} tx={args.tx} slots={args.slots}: {g:.2f} Gpixel/s "
          f"({dt / args.batch * 1e6:.1f} us/frame)")


if __name__ == "__main__":
    main()
