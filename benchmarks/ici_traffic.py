"""ICI traffic dossier: collective payloads of every sharded config.

Real multi-chip hardware is unavailable in this environment, but the
collective structure is statically knowable: this tool compiles each
sharded apply on the 8-device virtual CPU mesh, parses the HLO into
bytes-per-collective, and models halo-communication time against
per-chip compute at v5e ICI bandwidth — the predicted weak-scaling
curves a future pod run can falsify (VERDICT r4 missing 3; SURVEY §5
distributed-communication checklist).  Output feeds docs/SCALING.md;
tests/test_ici_traffic.py pins the collective structure so regressions
(e.g. a reintroduced source-sized all-to-all) fail loudly.

Usage:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
            python benchmarks/ici_traffic.py
"""

from __future__ import annotations

import os
import re
import sys
from typing import Dict, List, Tuple

sys.path.insert(0, ".")

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()

import jax  # noqa: E402

# this box's sitecustomize force-sets jax_platforms="axon,cpu"; the
# traffic analysis wants the virtual CPU mesh regardless
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

# public v5e figures (per chip): 4 ICI ports; quoted inter-chip
# bandwidth 1600 Gbit/s total -> ~100 GB/s per direction per torus
# axis.  The model treats this as a parameter — change it for other
# topologies.
ICI_GBPS_PER_AXIS = 100.0      # GB/s, one direction, one mesh axis
# measured single-chip throughputs (BENCHMARKS.md, v5e, honest harness)
GPIX_SEP = 150.5               # sharded separable local contraction
GPIX_ROT = 8.25                # sharded rotated local contraction

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "s8": 1, "u8": 1, "pred": 1}

_COLLECTIVES = ("collective-permute", "all-reduce", "all-to-all",
                "all-gather", "reduce-scatter")


def collective_bytes(hlo: str) -> Dict[str, List[Tuple[int, str]]]:
    """{kind: [(payload_bytes, shape_str), ...]} from compiled HLO.

    Takes the RESULT shape of each collective op line (the first
    typed shape on the line); start/done pairs of async collectives are
    deduplicated by counting only the -start (or the plain op when no
    async pair exists).
    """
    out: Dict[str, List[Tuple[int, str]]] = {k: [] for k in _COLLECTIVES}
    shape_re = re.compile(r"(f64|f32|bf16|f16|s32|u32|s8|u8|pred)"
                          r"\[([0-9,]*)\]")
    for ln in hlo.splitlines():
        s = ln.strip()
        for kind in _COLLECTIVES:
            # match op occurrences like "= f32[...] collective-permute("
            # and async "collective-permute-start("; skip -done lines
            # (same payload as their -start)
            if f" {kind}(" not in s and f" {kind}-start(" not in s:
                continue
            m = shape_re.search(s.split("=", 1)[-1])
            if not m:
                continue
            dt, dims = m.groups()
            els = 1
            for d in dims.split(","):
                if d:
                    els *= int(d)
            out[kind].append((els * _DTYPE_BYTES[dt], f"{dt}[{dims}]"))
            break
    return {k: v for k, v in out.items() if v}


def summarize(name: str, hlo: str, px_per_chip: int, gpix_local: float,
              n_axes: int = 1, verbose: bool = True) -> dict:
    """Aggregate collective bytes and model comm vs compute."""
    colls = collective_bytes(hlo)
    total = {k: sum(b for b, _ in v) for k, v in colls.items()}
    halo = total.get("collective-permute", 0)
    t_comm_us = halo / (ICI_GBPS_PER_AXIS * 1e3)     # bytes/GBps -> us
    t_comp_us = px_per_chip / gpix_local / 1e3
    frac = t_comm_us / max(t_comp_us, 1e-9)
    eff = 1.0 / (1.0 + frac)  # serial model (no overlap): lower bound
    rec = {"config": name, "collectives": {
        k: {"count": len(v), "bytes": total[k]} for k, v in colls.items()},
        "halo_bytes_per_chip": halo,
        "t_comm_us": round(t_comm_us, 2),
        "t_compute_us": round(t_comp_us, 2),
        "comm_fraction": round(frac, 4),
        "weak_scaling_eff_lower_bound": round(eff, 4)}
    if verbose:
        print(f"\n== {name}")
        for k, v in colls.items():
            shapes = {}
            for b, s in v:
                shapes[s] = shapes.get(s, 0) + 1
            print(f"  {k:20s} n={len(v):3d} bytes={total[k]:>12,d}  "
                  + "  ".join(f"{c}x {s}" for s, c in sorted(shapes.items())))
        print(f"  halo {halo:,} B/chip -> t_comm {t_comm_us:.1f} us vs "
              f"t_compute {t_comp_us:.1f} us "
              f"(comm/compute {frac:.3f}, weak-scaling eff >= {eff:.3f})")
    return rec


def _compile(fn, *args):
    return jax.jit(fn).lower(*args).compile().as_text()


def build_cases(small: bool = False):
    """[(name, hlo, px_per_chip, gpix_local)] for every sharded family.

    ``small`` shrinks the geometries for the CI pinning test.
    """
    from aainterp.grids import make_grid_spec
    from aainterp.ops.weights import ell_operator, separable_operator
    from aainterp.parallel import sharding as sh

    cases = []
    devs = np.asarray(jax.devices()[:8])
    mesh1 = Mesh(devs.reshape(2, 4), ("data", "rows"))
    mesh2 = Mesh(devs.reshape(2, 2, 2), ("data", "rows", "cols"))
    rng = np.random.default_rng(0)

    # --- separable, 1-D row sharding (flagship-like) ---
    H, W = (256, 512) if small else (2048, 3840)
    spec = make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec, mode="exact")
    B = 2
    f1 = jax.device_put(
        jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32)),
        NamedSharding(mesh1, P("data", "rows", None)))
    hlo = _compile(lambda f: sh.sharded_apply_separable(
        f, op, mesh1, impl="banded"), f1)
    cases.append(("separable_1d_2x4", hlo, (B // 2) * (H // 4) * W,
                  GPIX_SEP, 1))

    # --- separable, 2-D rows x cols sharding ---
    f2 = jax.device_put(
        jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32)),
        NamedSharding(mesh2, P("data", "rows", "cols")))
    hlo = _compile(lambda f: sh.sharded_apply_separable_2d(
        f, op, mesh2, impl="banded"), f2)
    cases.append(("separable_2d_2x2x2", hlo, (B // 2) * (H // 2) * (W // 2),
                  GPIX_SEP, 2))

    # --- separable + conserve (adds the psum flux pair) ---
    hlo = _compile(lambda f: sh.sharded_apply_separable(
        f, op, mesh1, impl="banded", conserve=True), f1)
    cases.append(("separable_1d_conserve", hlo, (B // 2) * (H // 4) * W,
                  GPIX_SEP, 1))

    # --- rotated ELL, 1-D and 2-D (angle scanned for divisibility) ---
    Hr = Wr = 128 if small else 1024
    spec_r = None
    for d_ang in [x / 10.0 for x in range(0, 40)]:
        cand = make_grid_spec((Hr, Wr), 1.0, 0.5, (Wr / 2, Hr / 2),
                              30.0 + d_ang)
        Hd, Wd = cand.dst_shape
        if (Hd % 4 == 0 and Hr % 4 == 0 and Wd % 2 == 0 and Wr % 2 == 0):
            spec_r = cand
            break
    assert spec_r is not None
    op_r = ell_operator(spec_r, mode="exact")
    fr1 = jax.device_put(
        jnp.asarray(rng.uniform(0, 1, (B, Hr, Wr)).astype(np.float32)),
        NamedSharding(mesh1, P("data", "rows", None)))
    hlo = _compile(lambda f: sh.sharded_apply_ell(
        f, op_r, mesh1, impl="xla"), fr1)
    cases.append((f"rot{spec_r.rotation_angle:g}_1d_2x4", hlo,
                  (B // 2) * (Hr // 4) * Wr, GPIX_ROT, 1))

    fr2 = jax.device_put(
        jnp.asarray(rng.uniform(0, 1, (B, Hr, Wr)).astype(np.float32)),
        NamedSharding(mesh2, P("data", "rows", "cols")))
    hlo = _compile(lambda f: sh.sharded_apply_ell_2d(
        f, op_r, mesh2, impl="xla"), fr2)
    cases.append((f"rot{spec_r.rotation_angle:g}_2d_2x2x2", hlo,
                  (B // 2) * (Hr // 2) * (Wr // 2), GPIX_ROT, 2))

    # --- lat-lon conservative regrid, row-sharded ---
    from aainterp import regrid as rg

    Hg, Wg = (180, 360) if small else (1800, 3600)
    fg = jax.device_put(
        jnp.asarray(rng.uniform(0, 1, (B, Hg, Wg)).astype(np.float32)),
        NamedSharding(mesh1, P("data", "rows", None)))
    dfac = 10 if (Hg // 10) % 4 == 0 else 5   # dst rows must divide rows=4
    hlo = _compile(lambda f: rg.conservative_regrid_sharded(
        f, rg.LatLonGrid(Hg, Wg), rg.LatLonGrid(Hg // dfac, Wg // dfac),
        mesh1), fg)
    cases.append(("regrid_1d_2x4", hlo, (B // 2) * (Hg // 4) * Wg,
                  GPIX_SEP, 1))
    return cases


def main():
    recs = []
    for name, hlo, px, gpix, axes in build_cases():
        recs.append(summarize(name, hlo, px, gpix, axes))
    import json

    print("\n# JSON records:")
    for r in recs:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
