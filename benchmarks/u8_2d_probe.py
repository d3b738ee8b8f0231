"""2-D-kernel u8 probe at a large odd-width geometry (4K-ish, W % 128 != 0).

The rgb1024 u8 config measured the bitcast byte-split unpack ~4% SLOWER
in the 2-D kernel (195.5 vs 204.3 — small (SY, SX) blocks pay the
4-extract + concat overhead without a big relayout to save).  This probe
asks whether a LARGE odd-width u8 frame — the case the 2-D kernel alone
serves — flips the verdict before deciding the route default.

Run: python benchmarks/u8_2d_probe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from bench import timed_scan  # noqa: E402

H, W = 2160, 3832  # W % 128 = 120 -> off the 1-D kernel, 2-D route


def main():
    from aainterp.grids import make_grid_spec
    from aainterp.ops.pallas_apply import apply_separable_pallas_2d
    from aainterp.ops.weights import separable_operator

    batch = 8
    spec = make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec, mode="exact")
    ys = jnp.asarray(op.wy.start)
    yw = jnp.asarray(np.asarray(op.wy.weights, np.float32))
    xs = jnp.asarray(op.wx.start)
    xw = jnp.asarray(np.asarray(op.wx.weights, np.float32))
    rng = np.random.default_rng(0)

    def mk():
        return jnp.asarray(rng.integers(0, 256, (8, batch, H, W),
                                        dtype=np.uint8))

    frames, warm = mk(), mk()
    dt = timed_scan(
        lambda f: apply_separable_pallas_2d(f, ys, yw, xs, xw),
        frames, warm)
    g = batch * H * W / dt / 1e9
    print(f"2d u8 {H}x{W}: {g:.2f} Gpixel/s ({dt / batch * 1e6:.1f} us/frame)")


if __name__ == "__main__":
    main()
