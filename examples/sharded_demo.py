"""Multi-chip spatial sharding demo (runs on a virtual 8-device CPU mesh).

Run:  python examples/sharded_demo.py

Shows the scale-out story (SURVEY.md §5): image rows sharded over a
device mesh, each chip computing its destination row band from its own
source band plus a ring-exchanged halo (multi-hop for steep rotations),
and the sharded conservative lat-lon regrid.  On a real TPU pod slice the
same code runs unchanged — the mesh axes map onto ICI neighbours.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402
import numpy as np              # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # this box force-sets a TPU plugin

import aainterp as aa           # noqa: E402
from aainterp.ops.weights import ell_operator, separable_operator  # noqa: E402
from aainterp.parallel.sharding import (   # noqa: E402
    sharded_apply_ell, sharded_apply_separable,
)
from aainterp.regrid import (   # noqa: E402
    LatLonGrid, conservative_regrid, conservative_regrid_sharded,
)


def main():
    rng = np.random.default_rng(0)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "rows"))
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    # 1. Separable 2x downscale, batch over 'data', rows over 'rows'
    H, W, B = 256, 128, 4
    frames = rng.uniform(0, 1, (B, H, W)).astype(np.float32)
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec)
    fdev = jax.device_put(
        jnp.asarray(frames), NamedSharding(mesh, P("data", "rows", None)))
    out = jax.jit(lambda f: sharded_apply_separable(f, op, mesh))(fdev)
    ref = aa.apply_operator(op, jnp.asarray(frames))
    print(f"separable: {frames.shape} -> {out.shape}, "
          f"max|sharded - unsharded| = "
          f"{float(jnp.abs(out - ref).max()):.2e}, "
          f"out sharding {out.sharding.spec}")

    # 2. Rotated ELL apply with a multi-hop ring halo (45 deg is steep
    #    enough that the halo spans several row shards)
    H2, W2 = 32, 512
    spec_r = aa.make_grid_spec((H2, W2), 1.0, 0.5, (W2 / 2, H2 / 2), 45.0)
    op_r = ell_operator(spec_r, mode="exact")
    img = rng.uniform(0, 1, (1, H2, W2)).astype(np.float32)
    mesh_r = Mesh(np.asarray(jax.devices()[:8]).reshape(1, 8),
                  ("data", "rows"))
    idev = jax.device_put(
        jnp.asarray(img), NamedSharding(mesh_r, P("data", "rows", None)))
    out_r = jax.jit(lambda f: sharded_apply_ell(f, op_r, mesh_r))(idev)
    ref_r = aa.apply_operator(op_r, jnp.asarray(img))
    print(f"rotated 45deg over 8 row shards: max err "
          f"{float(jnp.abs(out_r - ref_r).max()):.2e}")

    # 3. Conservative lat-lon regrid with the psum conservation check:
    #    the replicated [flux_dst, flux_src] pair (one psum over the mesh)
    #    agrees to fp tolerance iff every chip's halo + contraction is
    #    correct — the multi-chip form of the reference's sumArea
    #    normalisation (Source.cpp:573-577)
    src, dst = LatLonGrid(96, 72), LatLonGrid(24, 18)
    fields = rng.uniform(200, 300, (2, 96, 72)).astype(np.float32)
    fdev = jax.device_put(
        jnp.asarray(fields), NamedSharding(mesh, P("data", "rows", None)))
    out_g, flux = jax.jit(
        lambda f: conservative_regrid_sharded(f, src, dst, mesh,
                                              conserve=True))(fdev)
    ref_g = conservative_regrid(fields, src, dst)
    fd, fs = np.asarray(flux)
    print(f"regrid: {fields.shape} -> {out_g.shape}, max err "
          f"{float(jnp.abs(out_g - jnp.asarray(ref_g)).max()):.2e}, "
          f"psum flux dst/src = {fd:.2f}/{fs:.2f} "
          f"(rel diff {abs(fd - fs) / abs(fs):.1e})")

    # 4. 2-D (rows x cols) mesh: BOTH image axes sharded — the scaling
    #    form for frames too large for a 1-D strip split.  The rotated
    #    (ELL) apply runs the per-chip three-kernel Pallas shear path
    #    (interpret on CPU) with a ring halo per axis; quadrant >= 90
    #    deg folds into the tables (no source-sized all-to-all).
    from aainterp.parallel.sharding import sharded_apply_ell_2d

    mesh3 = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                 ("data", "rows", "cols"))
    H3, W3 = 128, 96
    spec3 = aa.make_grid_spec((H3, W3), 1.0, 0.5, (48.0, 64.0), 121.5)
    op3 = ell_operator(spec3, mode="exact")
    img3 = rng.uniform(0, 1, (2, H3, W3)).astype(np.float32)
    idev3 = jax.device_put(
        jnp.asarray(img3),
        NamedSharding(mesh3, P("data", "rows", "cols")))
    out3, flux3 = jax.jit(lambda f: sharded_apply_ell_2d(
        f, op3, mesh3, impl="pallas", interpret=True,
        conserve=True))(idev3)
    ref3 = aa.apply_operator(op3, jnp.asarray(img3))
    fd3, fs3 = np.asarray(flux3)
    print(f"rotated 121.5deg on a 2x2 spatial mesh (quadrant folded): "
          f"{img3.shape} -> {out3.shape}, max err "
          f"{float(jnp.abs(out3 - ref3).max()):.2e}, "
          f"flux rel diff {abs(fd3 - fs3) / abs(fs3):.1e}")


if __name__ == "__main__":
    main()
