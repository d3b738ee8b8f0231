"""Stage decomposition of the shear3 Pallas pipeline (rot30 config).

Times each of the three kernels in isolation (random inputs of the
inter-stage shapes) plus the full pipeline, to locate where the
195 us/frame (21.4 Gpixel/s, 2026-08-20 first measurement) actually
goes — the HBM traffic model predicts ~65 us, so ~130 us is compute
(bit-roll VPU passes are the suspect: ~8 passes per lane-axis
translate at the 128-lane store-alignment floor).

Usage (real chip): python benchmarks/shear3_experiments.py [stage ...]
stages: full x1 y2 x3 (default: all)
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402  (compile cache config + timed_scan)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aainterp.grids import make_grid_spec  # noqa: E402
from aainterp.ops import pallas_shear3 as p3  # noqa: E402
from aainterp.ops.shear3 import build_shear3_plan  # noqa: E402

H = W = 2048
BATCH = 8
K = 6
DTYPE = jnp.bfloat16


def main():
    stages = sys.argv[1:] or ["full", "x1", "y2", "x3"]
    spec = make_grid_spec((H, W), 1.0, 0.5, (W / 2, H / 2), 30.0)
    plan = build_shear3_plan(spec)
    kp = p3.build_shear3_kernel_plan(plan)
    print(f"# geometry: qHp={kp.qHp} qWp={kp.qWp} W1p={kp.W1p} "
          f"RW1={kp.RW1} nb1={kp.nb1} | RH2={kp.RH2} nb2={kp.nb2} "
          f"Hsc2={kp.Hsc2} H2p={kp.H2p} SY2={kp.SY2} | RW3={kp.RW3} "
          f"nb3={kp.nb3} Wsc3={kp.Wsc3} SX3={kp.SX3} dst={kp.Hd}x{kp.Wd}")
    rng = np.random.default_rng(0)
    px = BATCH * H * W

    def report(name, dt):
        print(f"{name:8s} {dt*1e6/BATCH:8.1f} us/frame "
              f"{px/dt/1e9:7.2f} Gpixel/s-equiv")

    def mk(shape, dtype=DTYPE):
        a = rng.uniform(0, 1, (K,) + shape).astype(np.float32)
        return (jnp.asarray(a, dtype=dtype),
                jnp.asarray(rng.uniform(0, 1, (K,) + shape)
                            .astype(np.float32), dtype=dtype))

    mid_name = jnp.dtype(DTYPE).name
    with jax.ensure_compile_time_eval():
        t = {k: jnp.asarray(getattr(kp, k)) for k in
             ("base1", "base2", "base3")}
        t["d1"] = jnp.asarray(kp.d1[None])
        t["f1"] = jnp.asarray(kp.f1[None])
        t["d2"] = jnp.asarray(kp.d2[None])
        t["f2"] = jnp.asarray(kp.f2[None])
        t["d3"] = jnp.asarray(kp.d3[None])
        t["f3"] = jnp.asarray(kp.f3[None])
        t["cov"] = jnp.asarray(kp.inv_cov[None])
        if kp.rb2 is not None:
            t["rb2"] = jnp.asarray(kp.rb2)
            t["wy2"] = jnp.asarray(kp.wy2[None])
        if kp.cb3 is not None:
            t["cb3"] = jnp.asarray(kp.cb3)
            t["wx3"] = jnp.asarray(kp.wx3[None])

    if "full" in stages:
        frames, warm = mk((BATCH, H, W))
        dt = bench.timed_scan(
            lambda f: p3.apply_shear3_pallas(plan, f, kernel_plan=kp),
            frames, warm)
        report("full", dt)

    if "x1" in stages:
        x1 = p3._build_x1(BATCH, kp.qHp, kp.qWp, kp.BLKR1, kp.RW1, kp.nb1,
                          kp.W1p, mid_name, mid_name, False)
        frames, warm = mk((BATCH, kp.qHp, kp.qWp))
        dt = bench.timed_scan(
            lambda f: x1(t["base1"], t["d1"], t["f1"], f), frames, warm)
        report("x1", dt)

    if "y2" in stages:
        nty2 = 0 if kp.rb2 is None else kp.wy2.shape[0]
        y2 = p3._build_y2(BATCH, kp.qHp, kp.W1p, kp.RH2, kp.nb2, kp.H2p,
                          kp.Hsc2, kp.TY2, kp.SY2, nty2, mid_name, False)
        frames, warm = mk((BATCH, kp.qHp, kp.W1p))
        if kp.rb2 is None:
            fn = lambda f: y2(t["base2"], t["d2"], t["f2"], f)  # noqa: E731
        else:
            fn = lambda f: y2(t["base2"], t["rb2"], t["d2"], t["f2"], f,  # noqa: E731
                              t["wy2"])
        dt = bench.timed_scan(fn, frames, warm)
        report("y2", dt)

    if "x3" in stages:
        ntx3 = 0 if kp.cb3 is None else kp.wx3.shape[0]
        x3 = p3._build_x3(BATCH, kp.H2p, kp.W1p, kp.BLKR3, kp.RW3, kp.nb3,
                          kp.Wsc3, kp.crop2, kp.crop3, kp.TX3, kp.SX3,
                          ntx3, kp.Hd3p, kp.Wd3p, mid_name, mid_name,
                          False)
        frames, warm = mk((BATCH, kp.H2p, kp.W1p))
        if kp.cb3 is None:
            fn = lambda f: x3(t["base3"], t["d3"], t["f3"], f, t["cov"])  # noqa: E731
        else:
            fn = lambda f: x3(t["base3"], t["cb3"], t["d3"], t["f3"], f,  # noqa: E731
                              t["wx3"], t["cov"])
        dt = bench.timed_scan(fn, frames, warm)
        report("x3", dt)


if __name__ == "__main__":
    main()
