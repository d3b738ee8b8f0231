"""Stage decomposition of the shear3 Pallas pipeline (rot30 config).

Times each pass kernel in isolation (random inputs of the inter-stage
shapes) plus the full pipeline, for either decomposition.  Results
(2026-08-20, bf16, batch 8):

  x-y-x (quality): full 196.4 us/frame = 56.0 + 82.0 + 56.8 — each
  kernel VPU-bound on its bit-roll chain (traffic model ~65 us),
  which motivated the reduce-first y-x-y variant (52.3 Gpixel/s).

Usage (real chip):
  python benchmarks/shear3_experiments.py [quality|fast] [full s0 s1 s2]
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
    args = sys.argv[1:]
    dec = "quality"
    if args and args[0] in ("quality", "fast"):
        dec = args.pop(0)
    stages = args or ["full", "s0", "s1", "s2"]
    spec = make_grid_spec((H, W), 1.0, 0.5, (W / 2, H / 2), 30.0)
    plan = build_shear3_plan(spec, decomposition=dec)
    kp = p3.build_shear3_kernel_plan(plan)
    mid_name = jnp.dtype(DTYPE).name
    rng = np.random.default_rng(0)
    px = BATCH * H * W

    print(f"# {dec}: " + " | ".join(
        f"s{i}:{st.axis} pre={st.pre_base is not None} "
        f"post={st.post_base is not None} nb={st.nb} R={st.R} "
        f"n_sc={st.n_sc} out={st.n_out_p}"
        for i, st in enumerate(kp.stages)))

    def report(name, dt):
        print(f"{name:8s} {dt*1e6/BATCH:8.1f} us/frame "
              f"{px/dt/1e9:7.2f} Gpixel/s-equiv")

    def mk(shape):
        return (jnp.asarray(rng.uniform(0, 1, (K,) + shape)
                            .astype(np.float32), dtype=DTYPE),
                jnp.asarray(rng.uniform(0, 1, (K,) + shape)
                            .astype(np.float32), dtype=DTYPE))

    if "full" in stages:
        frames, warm = mk((BATCH, H, W))
        dt = bench.timed_scan(
            lambda f: p3.apply_shear3_pallas(plan, f, kernel_plan=kp),
            frames, warm)
        report("full", dt)

    # chain shapes entering each stage
    rows, cols = kp.qHp, kp.qWp
    for i, st in enumerate(kp.stages):
        name = f"s{i}"
        in_shape = (BATCH, rows, cols)
        if name in stages:
            with jax.ensure_compile_time_eval():
                base = jnp.asarray(st.base)
                d = jnp.asarray(st.d[None])
                f = jnp.asarray(st.f[None])
                extra = []
                if st.pre_base is not None:
                    extra.append(jnp.asarray(st.pre_w[None]))
                if st.post_base is not None:
                    extra.append(jnp.asarray(st.post_w[None]))
                last = i == len(kp.stages) - 1
                if last:
                    extra.append(jnp.asarray(kp.inv_cov[None]))
            if st.axis == "y":
                dd = jnp.swapaxes(d, -1, -2)
                ff = jnp.swapaxes(f, -1, -2)
                call = p3._build_y_stage(
                    BATCH, st.n_in, st.n_lines_p // 128, st.pre_base,
                    st.pre_SY, st.n_mid, st.R, st.nb, st.post_base,
                    st.post_SY, st.n_sc, st.crop, st.n_out_p, mid_name,
                    mid_name, last, False)
            else:
                dd, ff = d, f
                call = p3._build_x_stage(
                    BATCH, st.n_in, st.n_lines_p // st.blk, st.blk,
                    st.pre_base, st.pre_SY, st.n_mid, st.R, st.nb,
                    st.post_base, st.post_SY, st.n_sc, st.crop,
                    st.n_out_p, mid_name, mid_name, last, False)
            frames, warm = mk(in_shape)
            dt = bench.timed_scan(
                lambda fr: call(base, dd, ff, fr, *extra), frames, warm)
            report(name, dt)
        if st.axis == "x":
            cols = st.n_out_p
        else:
            rows = st.n_out_p


if __name__ == "__main__":
    main()
