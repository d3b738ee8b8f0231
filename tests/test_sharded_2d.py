"""2-D (rows x cols) spatial sharding tests on the virtual 8-device mesh.

sharded_apply_separable_2d shards BOTH image axes: ring halo over the
rows axis, then over the cols axis of the row-extended block (corner
regions arrive transitively through the edge neighbour).  Validated
against the unsharded apply, across mesh shapes, quadrants, batch
layouts, and the psum conservation flux.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import aainterp as aa
from aainterp.ops.weights import separable_operator
from aainterp.parallel.sharding import sharded_apply_separable_2d

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)

RNG = np.random.default_rng(3)


def _mesh3(data, rows, cols):
    devs = np.asarray(jax.devices()[: data * rows * cols]).reshape(
        data, rows, cols)
    return Mesh(devs, ("data", "rows", "cols"))


def _run(spec, B, mesh, conserve=False, frames=None):
    H, W = spec.src_shape
    op = separable_operator(spec)
    if frames is None:
        frames = RNG.uniform(0, 1, (B, H, W)).astype(np.float32)
    sharding = NamedSharding(mesh, P("data", "rows", "cols"))
    fdev = jax.device_put(jnp.asarray(frames), sharding)
    fn = jax.jit(lambda f: sharded_apply_separable_2d(
        f, op, mesh, conserve=conserve))
    out = fn(fdev)
    ref = aa.apply_operator(op, jnp.asarray(frames))
    return out, ref


def test_2d_matches_unsharded_2x2():
    spec = aa.make_grid_spec((128, 64), 2.0, 1.0, (0.0, 0.0), 0.0)
    out, ref = _run(spec, 4, _mesh3(2, 2, 2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert out.sharding.spec == P("data", "rows", "cols")


def test_2d_matches_unsharded_2x4_nodata():
    spec = aa.make_grid_spec((160, 80), 150.0, 30.0, (0.0, 0.0), 0.0)
    # dst (32, 16): rows % 2 == 0, cols % 4 == 0
    assert spec.dst_shape[0] % 2 == 0 and spec.dst_shape[1] % 4 == 0
    H, W = spec.src_shape
    op = separable_operator(spec)
    frames = RNG.uniform(0, 1, (H, W)).astype(np.float32)
    devs = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("rows", "cols"))
    fdev = jax.device_put(jnp.asarray(frames),
                          NamedSharding(mesh, P("rows", "cols")))
    out = jax.jit(lambda f: sharded_apply_separable_2d(
        f, op, mesh, data_axis=None))(fdev)
    ref = aa.apply_operator(op, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_2d_noninteger_ratio_and_offsets():
    # fractional edge overlaps + nonzero isocenter: halo widths differ
    # per axis and per chip
    spec = aa.make_grid_spec((96, 160), 1.0, 0.5, (13.0, 7.0), 0.0)
    if spec.dst_shape[0] % 2 or spec.dst_shape[1] % 2:
        pytest.skip("geometry not divisible for this mesh")
    out, ref = _run(spec, 2, _mesh3(2, 2, 2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("ang", [90.0, 180.0, 270.0])
def test_2d_quadrants_folded(ang):
    """Quadrant pre-rotation folded into the band tables: the source is
    never rot90'd; only the dst output pays a flip/rot180/transpose."""
    from aainterp.parallel.sharding import _folded_sharded_bands_2d

    spec = aa.make_grid_spec((64, 64), 2.0, 1.0, (4.0, 7.0), ang)
    assert spec.quadrant != 0
    op = separable_operator(spec)
    assert _folded_sharded_bands_2d(op, 2, 2) is not None
    out, ref = _run(spec, 2, _mesh3(2, 2, 2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_2d_quadrant_rot90_fallback():
    """When the folded row/col counts don't divide the mesh, the global
    rot90 reshard route still produces the right answer."""
    from aainterp.parallel.sharding import _folded_sharded_bands_2d

    # 90 deg swaps axes, so on an ASYMMETRIC rows=2 x cols=4 mesh the
    # fold can fail (swapped x_use = wy needs Hd % 4) while the rot90
    # fallback divides (Hd % 2, Wd % 4)
    spec = aa.make_grid_spec((64, 68), 2.0, 1.0, (0.0, 0.0), 90.0)
    op = separable_operator(spec)
    assert spec.quadrant != 0
    assert _folded_sharded_bands_2d(op, 2, 4) is None
    H, W = spec.src_shape
    frames = RNG.uniform(0, 1, (H, W)).astype(np.float32)
    devs = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("rows", "cols"))
    fdev = jax.device_put(jnp.asarray(frames),
                          NamedSharding(mesh, P("rows", "cols")))
    out = jax.jit(lambda f: sharded_apply_separable_2d(
        f, op, mesh, data_axis=None))(fdev)
    ref = aa.apply_operator(op, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("ang", [90.0, 180.0, 270.0])
def test_2d_quadrant_conserve(ang):
    spec = aa.make_grid_spec((64, 64), 2.0, 1.0, (4.0, 7.0), ang)
    (out, flux), ref = _run(spec, 2, _mesh3(2, 2, 2), conserve=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    fd, fs = np.asarray(flux)
    assert abs(fd - fs) <= 1e-3 * max(abs(fd), 1.0)


def test_2d_regrid_aligned_local_path(monkeypatch):
    """Integer-ratio regrid bands on a rows x cols mesh take the aligned
    local contraction (per-chip tap blocks sharded per axis) and match
    the unsharded apply; fractional ratios keep the banded local."""
    import aainterp.ops.apply as apply_mod
    from aainterp.parallel.sharding import sharded_apply_banded_2d
    from aainterp.regrid import (
        LatLonGrid, apply_band_operators, conservative_regrid_operator,
    )

    calls = []
    real = apply_mod.apply_separable_aligned
    monkeypatch.setattr(
        apply_mod, "apply_separable_aligned",
        lambda *a, **k: (calls.append(1), real(*a, **k))[1])
    mesh = _mesh3(2, 2, 2)
    src, dst = LatLonGrid(96, 72), LatLonGrid(24, 18)
    by, bx = conservative_regrid_operator(src, dst)
    fields = RNG.uniform(200, 300, (2, 96, 72)).astype(np.float32)
    fdev = jax.device_put(jnp.asarray(fields),
                          NamedSharding(mesh, P("data", "rows", "cols")))
    out = sharded_apply_banded_2d(fdev, by, bx, mesh)
    assert calls, "2-D sharded local contraction skipped the aligned path"
    ref = apply_band_operators(fields, by, bx, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # fractional latitude ratio: banded local fallback
    calls.clear()
    src2, dst2 = LatLonGrid(88, 72), LatLonGrid(24, 18)
    by2, bx2 = conservative_regrid_operator(src2, dst2)
    f2 = RNG.uniform(200, 300, (2, 88, 72)).astype(np.float32)
    f2dev = jax.device_put(jnp.asarray(f2),
                           NamedSharding(mesh, P("data", "rows", "cols")))
    out2 = sharded_apply_banded_2d(f2dev, by2, bx2, mesh)
    assert not calls
    ref2 = apply_band_operators(f2, by2, bx2, impl="xla")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=1e-4)


def test_2d_conservation_flux():
    spec = aa.make_grid_spec((128, 64), 2.0, 1.0, (0.0, 0.0), 0.0)
    (out, flux), ref = _run(spec, 2, _mesh3(2, 2, 2), conserve=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    fd, fs = np.asarray(flux)
    assert abs(fd - fs) <= 1e-3 * max(abs(fd), 1.0)


def test_2d_conservation_detects_corruption():
    """A wrong halo (simulated by zeroing a source shard's edge after
    upload) must break the psum identity — the check has teeth."""
    spec = aa.make_grid_spec((128, 64), 2.0, 1.0, (0.0, 0.0), 0.0)
    H, W = spec.src_shape
    op = separable_operator(spec)
    frames = RNG.uniform(0.5, 1, (2, H, W)).astype(np.float32)
    mesh = _mesh3(2, 2, 2)
    fdev = jax.device_put(jnp.asarray(frames),
                          NamedSharding(mesh, P("data", "rows", "cols")))
    _, flux = jax.jit(lambda f: sharded_apply_separable_2d(
        f, op, mesh, conserve=True))(fdev)
    fd, fs = np.asarray(flux)
    # corrupt: drop the top half of the image but keep the factors —
    # flux_dst now integrates a different field than flux_src
    bad = frames.copy()
    bad[:, : H // 2] = 0.0
    bdev = jax.device_put(jnp.asarray(bad),
                          NamedSharding(mesh, P("data", "rows", "cols")))
    out_bad = jax.jit(lambda f: sharded_apply_separable_2d(
        f, op, mesh))(bdev)
    # recompute flux_dst of the corrupted output against the ORIGINAL
    # source flux: identity must fail
    from aainterp.parallel.conserve import separable_flux_factors

    my, mx, covy, covx = separable_flux_factors(
        op.wy, op.wx, raw_sums=op.raw_row_sums)
    fd_bad = np.einsum("brc,r,c->", np.asarray(out_bad, np.float64),
                       my, mx)
    assert abs(fd_bad - fs) > 1e-2 * abs(fs)


def test_2d_narrow_col_shards():
    """8 column shards of a 40-wide source: every chip's x window leans
    on its neighbours (halo_x > 0 at sb_c = 5)."""
    spec = aa.make_grid_spec((32, 40), 150.0, 30.0, (3.0, 3.0), 0.0)
    H, W = spec.src_shape
    op = separable_operator(spec)
    n_c = 8
    assert spec.dst_shape[1] % n_c == 0 and W % n_c == 0
    from aainterp.parallel.sharding import _row_halo

    halo_x = _row_halo(op.wx.start, op.wx.band, W, spec.dst_shape[1], n_c)
    assert halo_x > 0
    frames = RNG.uniform(0, 1, (H, W)).astype(np.float32)
    devs = np.asarray(jax.devices()).reshape(1, 8)
    mesh = Mesh(devs, ("rows", "cols"))
    fdev = jax.device_put(jnp.asarray(frames),
                          NamedSharding(mesh, P("rows", "cols")))
    out = jax.jit(lambda f: sharded_apply_separable_2d(
        f, op, mesh, data_axis=None))(fdev)
    ref = aa.apply_operator(op, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_2d_transpose_dot_identity():
    """<A x, y> == <x, A^T y> with both sides computed on the 2-D mesh,
    and A^T y matching the unsharded adjoint."""
    from aainterp.autodiff import apply_operator_transpose
    from aainterp.parallel.sharding import (
        sharded_apply_separable_2d_transpose,
    )

    spec = aa.make_grid_spec((128, 64), 2.0, 1.0, (0.0, 0.0), 0.0)
    H, W = spec.src_shape
    Hd, Wd = spec.dst_shape
    op = separable_operator(spec)
    mesh = _mesh3(2, 2, 2)
    sh_src = NamedSharding(mesh, P("data", "rows", "cols"))
    x = RNG.uniform(0, 1, (2, H, W)).astype(np.float32)
    y = RNG.uniform(0, 1, (2, Hd, Wd)).astype(np.float32)
    xdev = jax.device_put(jnp.asarray(x), sh_src)
    ydev = jax.device_put(jnp.asarray(y), sh_src)
    ax = jax.jit(lambda f: sharded_apply_separable_2d(f, op, mesh))(xdev)
    aty = jax.jit(lambda g: sharded_apply_separable_2d_transpose(
        g, op, mesh))(ydev)
    ref_aty = apply_operator_transpose(op, jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(aty), np.asarray(ref_aty),
                               atol=1e-5)
    lhs = float(np.vdot(np.asarray(ax, np.float64), y))
    rhs = float(np.vdot(x, np.asarray(aty, np.float64)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


@pytest.mark.parametrize("ang", [90.0, 180.0, 270.0])
def test_2d_transpose_quadrant(ang):
    """Folded-quadrant adjoints: the cotangent pays only the dst-sized
    inverse permutation; output lands in original source orientation."""
    from aainterp.autodiff import apply_operator_transpose
    from aainterp.parallel.sharding import (
        sharded_apply_separable_2d_transpose,
    )

    spec = aa.make_grid_spec((64, 64), 2.0, 1.0, (4.0, 7.0), ang)
    assert spec.quadrant != 0
    op = separable_operator(spec)
    Hd, Wd = spec.dst_shape
    mesh = _mesh3(2, 2, 2)
    g = RNG.uniform(0, 1, (2, Hd, Wd)).astype(np.float32)
    gdev = jax.device_put(jnp.asarray(g),
                          NamedSharding(mesh, P("data", "rows", "cols")))
    got = jax.jit(lambda c: sharded_apply_separable_2d_transpose(
        c, op, mesh))(gdev)
    ref = apply_operator_transpose(op, jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_2d_jit_grad():
    """jit(grad) of a loss through the custom-vjp'd 2-D-sharded apply
    equals the unsharded analytic gradient."""
    from aainterp.autodiff import apply_operator_transpose
    from aainterp.parallel.sharding import make_sharded_separable_2d_linear

    spec = aa.make_grid_spec((128, 64), 2.0, 1.0, (0.0, 0.0), 0.0)
    H, W = spec.src_shape
    op = separable_operator(spec)
    mesh = _mesh3(2, 2, 2)
    sh = NamedSharding(mesh, P("data", "rows", "cols"))
    x = RNG.uniform(0, 1, (2, H, W)).astype(np.float32)
    tgt = RNG.uniform(0, 1, (2,) + spec.dst_shape).astype(np.float32)
    xdev = jax.device_put(jnp.asarray(x), sh)
    tdev = jax.device_put(jnp.asarray(tgt), sh)
    lin = make_sharded_separable_2d_linear(op, mesh)
    g = jax.jit(jax.grad(lambda f: jnp.sum((lin(f) - tdev) ** 2)))(xdev)
    ref_out = aa.apply_operator(op, jnp.asarray(x))
    g_ref = apply_operator_transpose(
        op, 2.0 * (np.asarray(ref_out) - tgt))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


def test_2d_regrid_lat_and_lon_sharded():
    """conservative_regrid_sharded with col_axis: latitude AND longitude
    sharded, spherical flux conserved over the 3-axis mesh."""
    from aainterp.regrid import (
        LatLonGrid, conservative_regrid, conservative_regrid_sharded,
    )

    g_src, g_dst = LatLonGrid(24, 72), LatLonGrid(6, 18)
    rng = np.random.default_rng(11)
    fields = rng.uniform(200, 300, (2, 24, 72)).astype(np.float32)
    mesh = _mesh3(2, 2, 2)
    fdev = jax.device_put(jnp.asarray(fields),
                          NamedSharding(mesh, P("data", "rows", "cols")))
    out, flux = jax.jit(lambda f: conservative_regrid_sharded(
        f, g_src, g_dst, mesh, col_axis="cols", conserve=True))(fdev)
    ref = conservative_regrid(fields, g_src, g_dst)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    fd, fs = np.asarray(flux)
    assert abs(fd - fs) <= 1e-4 * abs(fs)


def test_halo_extend_cols_multihop():
    """_halo_extend on the column axis with h > sb (multi-hop ppermute
    ring), against the numpy construction with zeros past the edges."""
    from functools import partial

    from aainterp.parallel.sharding import _halo_extend, shard_map

    n_dev, sb, h = 8, 4, 9  # 3 hops, partial last hop
    W = n_dev * sb
    x = np.arange(2 * 3 * W, dtype=np.float32).reshape(2, 3, W) + 1.0
    devs = np.asarray(jax.devices()).reshape(n_dev)
    mesh = Mesh(devs, ("cols",))
    fdev = jax.device_put(jnp.asarray(x),
                          NamedSharding(mesh, P(None, None, "cols")))
    fn = shard_map(
        partial(_halo_extend, h=h, axis_name="cols", n_dev=n_dev, axis=-1),
        mesh=mesh,
        in_specs=P(None, None, "cols"),
        out_specs=P(None, None, "cols"),
        check_rep=False,
    )
    got = np.asarray(jax.jit(fn)(fdev))
    # expected: each chip's block becomes [left h | own sb | right h],
    # reading from the global array with zeros outside [0, W)
    padded = np.concatenate(
        [np.zeros((2, 3, h), np.float32), x, np.zeros((2, 3, h), np.float32)],
        axis=-1)
    exp = np.concatenate(
        [padded[..., i * sb: i * sb + sb + 2 * h] for i in range(n_dev)],
        axis=-1)
    np.testing.assert_array_equal(got, exp)


# ----------------------------------------------------------------------
# Per-shard Pallas MXU kernel on the 2-D mesh (interpret mode here; the
# real-TPU smoke lives in tests/test_tpu_smoke.py)
# ----------------------------------------------------------------------


def test_2d_pallas_matches_unsharded_interpret():
    spec = aa.make_grid_spec((128, 64), 2.0, 1.0, (0.0, 0.0), 0.0)
    H, W = spec.src_shape
    op = separable_operator(spec)
    frames = RNG.uniform(0, 1, (4, H, W)).astype(np.float32)
    mesh = _mesh3(2, 2, 2)
    fdev = jax.device_put(jnp.asarray(frames),
                          NamedSharding(mesh, P("data", "rows", "cols")))
    out = jax.jit(lambda f: sharded_apply_separable_2d(
        f, op, mesh, impl="pallas", interpret=True))(fdev)
    ref = aa.apply_operator(op, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_2d_pallas_noninteger_ratio_interpret():
    spec = aa.make_grid_spec((96, 160), 1.0, 0.5, (13.0, 7.0), 0.0)
    if spec.dst_shape[0] % 2 or spec.dst_shape[1] % 2:
        pytest.skip("geometry not divisible for this mesh")
    H, W = spec.src_shape
    op = separable_operator(spec)
    frames = RNG.uniform(0, 1, (2, H, W)).astype(np.float32)
    mesh = _mesh3(2, 2, 2)
    fdev = jax.device_put(jnp.asarray(frames),
                          NamedSharding(mesh, P("data", "rows", "cols")))
    out = jax.jit(lambda f: sharded_apply_separable_2d(
        f, op, mesh, impl="pallas", interpret=True))(fdev)
    ref = aa.apply_operator(op, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("ang", [90.0, 270.0])
def test_2d_pallas_quadrant_folded_interpret(ang):
    """Folded quadrant bands feed the per-shard Pallas kernel directly."""
    spec = aa.make_grid_spec((64, 64), 2.0, 1.0, (4.0, 7.0), ang)
    assert spec.quadrant != 0
    H, W = spec.src_shape
    op = separable_operator(spec)
    frames = RNG.uniform(0, 1, (2, H, W)).astype(np.float32)
    mesh = _mesh3(2, 2, 2)
    fdev = jax.device_put(jnp.asarray(frames),
                          NamedSharding(mesh, P("data", "rows", "cols")))
    out = jax.jit(lambda f: sharded_apply_separable_2d(
        f, op, mesh, impl="pallas", interpret=True))(fdev)
    ref = aa.apply_operator(op, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_2d_pallas_transpose_interpret():
    """Adjoint through the per-shard Pallas kernel (transposed bands are
    an upsampling banded operator — exercises the kernel's pad spill)."""
    from aainterp.autodiff import apply_operator_transpose
    from aainterp.parallel.sharding import (
        sharded_apply_separable_2d_transpose,
    )

    spec = aa.make_grid_spec((128, 64), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec)
    Hd, Wd = spec.dst_shape
    cot = RNG.uniform(-1, 1, (2, Hd, Wd)).astype(np.float32)
    mesh = _mesh3(2, 2, 2)
    cdev = jax.device_put(jnp.asarray(cot),
                          NamedSharding(mesh, P("data", "rows", "cols")))
    out = jax.jit(lambda g: sharded_apply_separable_2d_transpose(
        g, op, mesh, impl="pallas", interpret=True))(cdev)
    ref = apply_operator_transpose(op, jnp.asarray(cot))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_2d_pallas_forced_raises_off_envelope():
    """db_r with no multiple-of-8 divisor: forced impl='pallas' raises,
    auto degrades to the XLA banded local apply with the right answer."""
    from aainterp.parallel.sharding import _sharded_pallas_plan_2d

    spec = aa.make_grid_spec((108, 72), 150.0, 25.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec)
    Hd, Wd = spec.dst_shape
    assert Hd % 2 == 0 and (Hd // 2) % 8 != 0  # db_r = 9
    assert Wd % 2 == 0
    assert _sharded_pallas_plan_2d(op.wy, op.wx, 2, 2, 8, 8) is None
    H, W = spec.src_shape
    frames = RNG.uniform(0, 1, (2, H, W)).astype(np.float32)
    mesh = _mesh3(2, 2, 2)
    fdev = jax.device_put(jnp.asarray(frames),
                          NamedSharding(mesh, P("data", "rows", "cols")))
    out = jax.jit(lambda f: sharded_apply_separable_2d(
        f, op, mesh, interpret=True))(fdev)  # auto: falls back
    ref = aa.apply_operator(op, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    with pytest.raises(ValueError):
        jax.jit(lambda f: sharded_apply_separable_2d(
            f, op, mesh, impl="pallas", interpret=True))(fdev)


def test_2d_pallas_uint8_interpret():
    """u8 frames ride the per-shard Pallas kernel natively on the 2-D
    mesh too (bitcast byte-split unpack inside each chip's local
    contraction; u8-in -> u8-out contract) — the 2-D form of the 1-D
    path's serving contract (VERDICT r3 item 4)."""
    H, W = 128, 128
    frames = RNG.integers(0, 256, (2, H, W), dtype=np.uint8)
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec)
    mesh = _mesh3(2, 2, 2)
    sharding = NamedSharding(mesh, P("data", "rows", "cols"))
    fdev = jax.device_put(jnp.asarray(frames), sharding)
    out = jax.jit(lambda f: sharded_apply_separable_2d(
        f, op, mesh, impl="pallas", interpret=True))(fdev)
    assert out.dtype == jnp.uint8
    assert out.sharding.spec == P("data", "rows", "cols")
    ref = aa.apply_operator(op, jnp.asarray(frames, jnp.float32))
    want = np.clip(np.round(np.asarray(ref)), 0, 255).astype(np.int32)
    assert np.abs(np.asarray(out).astype(np.int32) - want).max() <= 1


def test_2d_banded_uint8_fallback_quantises():
    """Off the kernel envelope the 2-D route degrades to the XLA banded
    local apply but keeps the u8 -> u8 contract (quantised identically
    to the kernel)."""
    H, W = 128, 96
    frames = RNG.integers(0, 256, (2, H, W), dtype=np.uint8)
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec)
    mesh = _mesh3(2, 2, 2)
    sharding = NamedSharding(mesh, P("data", "rows", "cols"))
    fdev = jax.device_put(jnp.asarray(frames), sharding)
    out = jax.jit(lambda f: sharded_apply_separable_2d(
        f, op, mesh, impl="banded"))(fdev)
    assert out.dtype == jnp.uint8
    ref = aa.apply_operator(op, jnp.asarray(frames, jnp.float32))
    want = np.clip(np.round(np.asarray(ref)), 0, 255).astype(np.int32)
    assert np.abs(np.asarray(out).astype(np.int32) - want).max() <= 1


def test_2d_pallas_uint8_quadrant_folded():
    """u8 + quadrant: the fold keeps the source un-rotated and the u8
    kernel consumes the folded bands; only the small dst output pays the
    reshard."""
    H, W = 128, 64
    frames = RNG.integers(0, 256, (2, H, W), dtype=np.uint8)
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 180.0)
    assert spec.quadrant == 2
    op = separable_operator(spec)
    mesh = _mesh3(2, 2, 2)
    sharding = NamedSharding(mesh, P("data", "rows", "cols"))
    fdev = jax.device_put(jnp.asarray(frames), sharding)
    out = jax.jit(lambda f: sharded_apply_separable_2d(
        f, op, mesh, impl="pallas", interpret=True))(fdev)
    assert out.dtype == jnp.uint8
    ref = aa.apply_operator(op, jnp.asarray(frames, jnp.float32))
    want = np.clip(np.round(np.asarray(ref)), 0, 255).astype(np.int32)
    assert np.abs(np.asarray(out).astype(np.int32) - want).max() <= 1


def test_2d_uint8_conserve_raises():
    H, W = 128, 64
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec)
    mesh = _mesh3(2, 2, 2)
    frames = jnp.asarray(RNG.integers(0, 256, (2, H, W), dtype=np.uint8))
    with pytest.raises(ValueError, match="conserve"):
        sharded_apply_separable_2d(frames, op, mesh, conserve=True,
                                   interpret=True)
