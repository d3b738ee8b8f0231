"""shard_map spatial sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import aainterp as aa
from aainterp.ops.weights import ell_operator, separable_operator
from aainterp.parallel.sharding import (
    sharded_apply_ell,
    sharded_apply_separable,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def _mesh(data, rows):
    devs = np.asarray(jax.devices()[: data * rows]).reshape(data, rows)
    return Mesh(devs, ("data", "rows"))


RNG = np.random.default_rng(0)


def test_sharded_separable_matches_unsharded():
    H, W, B = 128, 64, 4
    frames = RNG.uniform(0, 1, (B, H, W)).astype(np.float32)
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec)
    mesh = _mesh(2, 4)
    sharding = NamedSharding(mesh, P("data", "rows", None))
    fdev = jax.device_put(jnp.asarray(frames), sharding)
    out = jax.jit(lambda f: sharded_apply_separable(f, op, mesh))(fdev)
    ref = aa.apply_operator(op, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # output keeps the sharded layout
    assert out.sharding.spec == P("data", "rows", None)


def test_sharded_separable_noninteger_ratio():
    H, W, B = 160, 64, 2
    frames = RNG.uniform(0, 1, (B, H, W)).astype(np.float32)
    spec = aa.make_grid_spec((H, W), 150.0, 30.0, (0.0, 0.0), 0.0)
    # dst rows = 32, src rows = 160: divisible by 4 row shards
    assert spec.dst_shape[0] % 4 == 0
    op = separable_operator(spec)
    mesh = _mesh(2, 4)
    fdev = jax.device_put(
        jnp.asarray(frames), NamedSharding(mesh, P("data", "rows", None))
    )
    out = jax.jit(lambda f: sharded_apply_separable(f, op, mesh))(fdev)
    ref = aa.apply_operator(op, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sharded_ell_rotated_matches_unsharded():
    H, W, B = 128, 64, 2
    frames = RNG.uniform(0, 1, (B, H, W)).astype(np.float32)
    # 8 deg, 2x downscale: Hd=68 and qH=128 are both divisible by 4
    spec = aa.make_grid_spec((H, W), 1.0, 0.5, (W / 2, H / 2), 8.0)
    Hd = spec.dst_shape[0]
    assert Hd % 4 == 0 and spec.qrot_shape[0] % 4 == 0
    op = ell_operator(spec, mode="exact")
    mesh = _mesh(2, 4)
    fdev = jax.device_put(
        jnp.asarray(frames), NamedSharding(mesh, P("data", "rows", None))
    )
    out = jax.jit(lambda f: sharded_apply_ell(f, op, mesh))(fdev)
    ref = aa.apply_operator(op, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_steep_rotation_multi_hop_halo():
    # 45 deg on a wide 32x512 image: Hd=192, qH=32 (both divide 8); the
    # diagonal halo spans several 4-row shards, exercising the multi-hop
    # ring exchange (round-1 guard replaced in round 2, ROADMAP item 4)
    H, W = 32, 512
    spec = aa.make_grid_spec((H, W), 1.0, 0.5, (W / 2, H / 2), 45.0)
    assert spec.dst_shape[0] % 8 == 0 and spec.qrot_shape[0] % 8 == 0
    op = ell_operator(spec, mode="exact")
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(1, 8), ("data", "rows"))
    frames = jnp.asarray(RNG.uniform(0, 1, (1, H, W)).astype(np.float32))
    fdev = jax.device_put(
        frames, NamedSharding(mesh, P("data", "rows", None))
    )
    out = jax.jit(lambda f: sharded_apply_ell(f, op, mesh))(fdev)
    ref = aa.apply_operator(op, frames)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sharded_quadrant_rotations():
    """quadrant != 0 sharded apply (VERDICT r1 item 8): the global rot90
    pre-rotation reshards across the mesh and must match the unsharded
    path for both the separable and ELL operators."""
    mesh = _mesh(2, 4)
    # separable at 180 deg: qrot shape (128, 64) keeps row divisibility
    H, W, B = 128, 64, 2
    frames = RNG.uniform(0, 1, (B, H, W)).astype(np.float32)
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (4.0, 7.0), 180.0)
    assert spec.quadrant != 0
    op = separable_operator(spec)
    fdev = jax.device_put(
        jnp.asarray(frames), NamedSharding(mesh, P("data", "rows", None))
    )
    out = jax.jit(lambda f: sharded_apply_separable(f, op, mesh))(fdev)
    ref = aa.apply_operator(op, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # ELL at 93.5 deg: quadrant 1, qrot (64, 128), dst (36, 66) — both
    # row counts divide the 4-way mesh
    spec_r = aa.make_grid_spec((H, W), 1.0, 0.5, (W / 2, H / 2), 93.5)
    assert spec_r.quadrant == 1
    Hd = spec_r.dst_shape[0]
    assert Hd % 4 == 0 and spec_r.qrot_shape[0] % 4 == 0, (
        Hd, spec_r.qrot_shape)
    op_r = ell_operator(spec_r, mode="exact")
    out_r = jax.jit(lambda f: sharded_apply_ell(f, op_r, mesh))(fdev)
    ref_r = aa.apply_operator(op_r, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(ref_r),
                               atol=1e-5)


def test_banded_extreme_halo_full_ring():
    """Worst-case halo: every dst row reads src rows 0..2, so the last chip
    needs rows 7 hops away — the maximal (n_dev-1)-hop exchange.  Round 1
    rejected this; the multi-hop _halo_extend must now compute it exactly."""
    from aainterp.ops.apply import apply_separable_banded
    from aainterp.ops.overlap1d import Band1D
    from aainterp.parallel.sharding import sharded_apply_banded

    n = 32
    band = Band1D(
        start=np.zeros(n, np.int32),
        weights=np.full((n, 3), 1.0 / 3.0, np.float64),
        n_src=n, n_dst=n,
    )
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(1, 8), ("data", "rows"))
    frames = jnp.asarray(RNG.uniform(0, 1, (1, n, n)).astype(np.float32))
    fdev = jax.device_put(
        frames, NamedSharding(mesh, P("data", "rows", None))
    )
    out = jax.jit(lambda f: sharded_apply_banded(f, band, band, mesh))(fdev)
    ref = apply_separable_banded(
        frames, jnp.asarray(band.start),
        jnp.asarray(band.weights, jnp.float32),
        jnp.asarray(band.start), jnp.asarray(band.weights, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sharded_regrid_matches_unsharded():
    """BASELINE config 5: lat-lon conservative regrid sharded over 8 chips
    (latitude rows over the mesh, halo via ppermute)."""
    from aainterp.regrid import (
        LatLonGrid, conservative_regrid, conservative_regrid_sharded,
    )

    src, dst = LatLonGrid(96, 72), LatLonGrid(24, 18)
    rng = np.random.default_rng(5)
    fields = rng.uniform(200, 300, (2, 96, 72)).astype(np.float32)
    mesh = _mesh(2, 4)
    fdev = jax.device_put(
        jnp.asarray(fields), NamedSharding(mesh, P("data", "rows", None))
    )
    out = jax.jit(
        lambda f: conservative_regrid_sharded(f, src, dst, mesh)
    )(fdev)
    ref = conservative_regrid(fields, src, dst)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_sharded_regrid_aligned_local_path(monkeypatch):
    """Integer-ratio regrids take the aligned local contraction inside
    shard_map (per-chip tap blocks as a sharded operand, c0 = halo), and
    non-partition bands fall back to the banded local apply."""
    import aainterp.ops.apply as apply_mod
    from aainterp.regrid import (
        LatLonGrid, conservative_regrid, conservative_regrid_sharded,
    )

    calls = []
    real = apply_mod.apply_separable_aligned
    monkeypatch.setattr(
        apply_mod, "apply_separable_aligned",
        lambda *a, **k: (calls.append(1), real(*a, **k))[1])
    src, dst = LatLonGrid(96, 72), LatLonGrid(24, 18)
    rng = np.random.default_rng(17)
    fields = rng.uniform(200, 300, (2, 96, 72)).astype(np.float32)
    mesh = _mesh(2, 4)
    fdev = jax.device_put(
        jnp.asarray(fields), NamedSharding(mesh, P("data", "rows", None))
    )
    out = conservative_regrid_sharded(fdev, src, dst, mesh)
    assert calls, "sharded local contraction did not take the aligned path"
    ref = conservative_regrid(fields, src, dst, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # fractional ratio: no partition -> banded local apply
    calls.clear()
    src2, dst2 = LatLonGrid(88, 72), LatLonGrid(24, 18)
    f2 = rng.uniform(200, 300, (2, 88, 72)).astype(np.float32)
    f2dev = jax.device_put(
        jnp.asarray(f2), NamedSharding(mesh, P("data", "rows", None))
    )
    out2 = conservative_regrid_sharded(f2dev, src2, dst2, mesh)
    assert not calls
    ref2 = conservative_regrid(f2, src2, dst2, impl="xla")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=1e-4)


def test_sharded_ell_fuzz_angles():
    """Random angles/shapes: row-sharded ELL apply (multi-hop halo) must
    match the unsharded apply whenever the row counts divide the mesh."""
    from aainterp.ops.weights import ell_operator as ell

    rng = np.random.default_rng(99)
    mesh = _mesh(2, 4)
    checked = 0
    for _ in range(40):
        if checked >= 5:
            break
        H = int(rng.integers(12, 40)) * 8
        W = int(rng.integers(8, 24)) * 8
        ang = float(rng.uniform(1.0, 359.0))
        spec = aa.make_grid_spec((H, W), 1.0, 0.5, (W / 2, H / 2), ang)
        if spec.is_axis_aligned:
            continue
        if spec.dst_shape[0] % 4 or spec.qrot_shape[0] % 4:
            continue
        op = ell(spec, mode="exact")
        frames = rng.uniform(0, 1, (2, H, W)).astype(np.float32)
        fdev = jax.device_put(
            jnp.asarray(frames), NamedSharding(mesh, P("data", "rows", None))
        )
        out = jax.jit(lambda f, op=op: sharded_apply_ell(f, op, mesh))(fdev)
        ref = aa.apply_operator(op, jnp.asarray(frames))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5,
            err_msg=f"H={H} W={W} ang={ang}")
        checked += 1
    assert checked >= 3


def test_sharded_pallas_matches_unsharded_interpret():
    """Per-shard Pallas kernel path (interpret mode on the virtual mesh)."""
    H, W, B = 128, 128, 4
    frames = RNG.uniform(0, 1, (B, H, W)).astype(np.float32)
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec)
    mesh = _mesh(2, 4)
    sharding = NamedSharding(mesh, P("data", "rows", None))
    fdev = jax.device_put(jnp.asarray(frames), sharding)
    out = jax.jit(lambda f: sharded_apply_separable(
        f, op, mesh, impl="pallas", interpret=True))(fdev)
    ref = aa.apply_operator(op, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert out.sharding.spec == P("data", "rows", None)


def test_sharded_pallas_noninteger_ratio_interpret():
    H, W, B = 160, 256, 2
    frames = RNG.uniform(0, 1, (B, H, W)).astype(np.float32)
    spec = aa.make_grid_spec((H, W), 150.0, 60.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec)
    mesh = _mesh(1, 8)
    sharding = NamedSharding(mesh, P("data", "rows", None))
    fdev = jax.device_put(jnp.asarray(frames), sharding)
    out = jax.jit(lambda f: sharded_apply_separable(
        f, op, mesh, impl="pallas", interpret=True))(fdev)
    ref = aa.apply_operator(op, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sharded_pallas_envelope_fallback():
    # W % 128 != 0 is off the 1-D kernel envelope: impl='auto' degrades to
    # the banded local apply, but a user-forced impl='pallas' must raise
    # rather than silently run a different (slower) path (ADVICE r2)
    H, W, B = 128, 96, 2
    frames = RNG.uniform(0, 1, (B, H, W)).astype(np.float32)
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec)
    mesh = _mesh(1, 4)
    sharding = NamedSharding(mesh, P("data", "rows", None))
    fdev = jax.device_put(jnp.asarray(frames), sharding)
    out = jax.jit(lambda f: sharded_apply_separable(
        f, op, mesh, interpret=True))(fdev)  # auto: falls back
    ref = aa.apply_operator(op, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    with pytest.raises(ValueError, match="envelope"):
        jax.jit(lambda f: sharded_apply_separable(
            f, op, mesh, impl="pallas", interpret=True))(fdev)


class TestConservationPsum:
    """SURVEY.md §5's second collective: global conservation flux via psum
    (VERDICT r2 item 3; reference analogue Source.cpp:573-577).  The
    identity flux_dst == flux_src holds to fp on any input iff every
    chip's halo exchange + local contraction is correct."""

    def test_separable_flux(self):
        H, W, B = 160, 128, 4
        frames = RNG.uniform(0, 1, (B, H, W)).astype(np.float32)
        spec = aa.make_grid_spec((H, W), 150.0, 30.0, (0.0, 0.0), 0.0)
        assert spec.dst_shape[0] % 4 == 0
        op = separable_operator(spec)
        mesh = _mesh(2, 4)
        fdev = jax.device_put(
            jnp.asarray(frames), NamedSharding(mesh, P("data", "rows", None)))
        out, flux = jax.jit(lambda f: sharded_apply_separable(
            f, op, mesh, conserve=True))(fdev)
        fd, fs = np.asarray(flux)
        assert fd > 0
        np.testing.assert_allclose(fd, fs, rtol=1e-5)
        # flux is replicated (P(None)) and matches the host computation
        from aainterp.parallel.conserve import separable_flux_factors
        my, mx, covy, covx = separable_flux_factors(
            op.wy, op.wx, raw_sums=op.raw_row_sums)
        host_fs = np.einsum("byx,y,x->", frames.astype(np.float64),
                            covy, covx)
        np.testing.assert_allclose(fs, host_fs, rtol=1e-5)

    def test_separable_flux_catches_corruption(self):
        """A deliberately broken halo (zeroed) must break the identity —
        the check has teeth."""
        from aainterp.ops import apply as apply_ops
        from aainterp.parallel.conserve import (
            separable_flux_factors, sharded_flux_separable)

        H, W, B = 160, 128, 2
        frames = RNG.uniform(0, 1, (B, H, W)).astype(np.float32)
        spec = aa.make_grid_spec((H, W), 150.0, 30.0, (0.0, 0.0), 0.0)
        op = separable_operator(spec)
        mesh = _mesh(2, 4)
        fdev = jax.device_put(
            jnp.asarray(frames), NamedSharding(mesh, P("data", "rows", None)))
        good = jax.jit(lambda f: sharded_apply_separable(f, op, mesh))(fdev)
        bad = good.at[:, 5:7, :].set(0.0)  # simulate a chip-local defect
        factors = separable_flux_factors(op.wy, op.wx,
                                         raw_sums=op.raw_row_sums)
        flux = jax.jit(lambda s, d: sharded_flux_separable(
            s, d, factors, mesh))(fdev, bad)
        fd, fs = np.asarray(flux)
        assert abs(fd - fs) / abs(fs) > 1e-3

    def test_ell_flux_rotated(self):
        H, W, B = 128, 64, 2
        frames = RNG.uniform(0, 1, (B, H, W)).astype(np.float32)
        spec = aa.make_grid_spec((H, W), 1.0, 0.5, (W / 2, H / 2), 8.0)
        op = ell_operator(spec, mode="exact")
        mesh = _mesh(2, 4)
        fdev = jax.device_put(
            jnp.asarray(frames), NamedSharding(mesh, P("data", "rows", None)))
        out, flux = jax.jit(lambda f: sharded_apply_ell(
            f, op, mesh, conserve=True))(fdev)
        fd, fs = np.asarray(flux)
        assert fd > 0
        np.testing.assert_allclose(fd, fs, rtol=1e-5)

    def test_ell_flux_quadrant(self):
        # quadrant 1 (93.5 deg): the flux src side must see the
        # quadrant-rotated frames (handled inside sharded_apply_ell)
        H, W, B = 128, 64, 2
        frames = RNG.uniform(0, 1, (B, H, W)).astype(np.float32)
        spec = aa.make_grid_spec((H, W), 1.0, 0.5, (W / 2, H / 2), 93.5)
        assert spec.quadrant == 1
        op = ell_operator(spec, mode="exact")
        mesh = _mesh(2, 4)
        fdev = jax.device_put(
            jnp.asarray(frames), NamedSharding(mesh, P("data", "rows", None)))
        out, flux = jax.jit(lambda f: sharded_apply_ell(
            f, op, mesh, conserve=True))(fdev)
        fd, fs = np.asarray(flux)
        np.testing.assert_allclose(fd, fs, rtol=1e-5)

    def test_regrid_flux_spherical(self):
        """Config 5: the sharded regrid's area-weighted dst integral equals
        the coverage-weighted src integral (true spherical conservation —
        and for full coverage, equals the plain spherical integral)."""
        from aainterp.regrid import (
            LatLonGrid, conservative_regrid_sharded,
        )

        src, dst = LatLonGrid(96, 72), LatLonGrid(24, 18)
        rng = np.random.default_rng(5)
        fields = rng.uniform(200, 300, (2, 96, 72)).astype(np.float32)
        mesh = _mesh(2, 4)
        fdev = jax.device_put(
            jnp.asarray(fields), NamedSharding(mesh, P("data", "rows", None)))
        out, flux = jax.jit(lambda f: conservative_regrid_sharded(
            f, src, dst, mesh, conserve=True))(fdev)
        fd, fs = np.asarray(flux)
        np.testing.assert_allclose(fd, fs, rtol=1e-5)
        # full-coverage grids: flux equals the true spherical integral
        my = np.abs(np.diff(np.sin(np.radians(src.lat_edges))))
        mx = np.diff(src.lon_edges)
        true_int = np.einsum("byx,y,x->", fields.astype(np.float64), my, mx)
        np.testing.assert_allclose(fs, true_int, rtol=1e-4)


class TestShardedEllPallas:
    """Per-shard Pallas rotated local contraction (VERDICT r2 item 1):
    the sharded ELL apply's chip-local work runs the three-kernel shear
    path (ops/pallas_shear) instead of the XLA flat gather.  Interpret
    mode on the virtual mesh; real-TPU smoke in test_tpu_smoke.py."""

    def _check(self, H, W, B, angle, mesh, atol=1e-5):
        from aainterp.parallel.sharding import sharded_apply_ell_pallas

        frames = RNG.uniform(0, 1, (B, H, W)).astype(np.float32)
        spec = aa.make_grid_spec((H, W), 1.0, 0.5, (W / 2, H / 2), angle)
        rows = mesh.shape["rows"]
        assert spec.dst_shape[0] % rows == 0
        assert spec.qrot_shape[0] % rows == 0
        op = ell_operator(spec, mode="exact")
        fdev = jax.device_put(
            jnp.asarray(frames), NamedSharding(mesh, P("data", "rows", None)))
        out = jax.jit(lambda f: sharded_apply_ell_pallas(
            f, op, mesh, interpret=True))(fdev)
        ref = aa.apply_operator(op, jnp.asarray(frames))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=atol, err_msg=f"angle={angle}")
        assert out.sharding.spec == P("data", "rows", None)

    def test_small_rotation(self):
        self._check(128, 64, 2, 8.0, _mesh(2, 4))

    def test_steep_rotation_multi_hop(self):
        # 37.5 deg on a wide 32x128 image: halo 24 rows over 8-row shards
        # = a 3-hop ring exchange feeding the pallas local contraction
        self._check(32, 128, 2, 37.5, _mesh(2, 4))

    def test_quadrant_rotation(self):
        # 98 deg -> quadrant 1 + 8 deg residual; rot90 reshard feeds the
        # pallas path
        H, W = 64, 128
        spec = aa.make_grid_spec((H, W), 1.0, 0.5, (W / 2, H / 2), 98.0)
        assert spec.quadrant == 1
        self._check(H, W, 2, 98.0, _mesh(2, 4))

    def test_auto_route_interpret(self):
        # impl='auto' + interpret rides the pallas path inside
        # sharded_apply_ell, with the conserve knob composed on top
        H, W, B = 128, 64, 2
        frames = RNG.uniform(0, 1, (B, H, W)).astype(np.float32)
        spec = aa.make_grid_spec((H, W), 1.0, 0.5, (W / 2, H / 2), 8.0)
        op = ell_operator(spec, mode="exact")
        mesh = _mesh(2, 4)
        fdev = jax.device_put(
            jnp.asarray(frames), NamedSharding(mesh, P("data", "rows", None)))
        out, flux = jax.jit(lambda f: sharded_apply_ell(
            f, op, mesh, interpret=True, conserve=True))(fdev)
        ref = aa.apply_operator(op, jnp.asarray(frames))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        fd, fs = np.asarray(flux)
        np.testing.assert_allclose(fd, fs, rtol=1e-5)

    def test_forced_pallas_raises_off_envelope(self):
        # Hd = 51 rows do not divide 4: forced impl='pallas' must raise,
        # auto must fall back to the XLA local apply
        H, W, B = 100, 60, 2
        frames = RNG.uniform(0, 1, (B, H, W)).astype(np.float32)
        spec = aa.make_grid_spec((H, W), 1.0, 0.5, (W / 2, H / 2), 8.0)
        op = ell_operator(spec, mode="exact")
        if spec.dst_shape[0] % 4 == 0 and spec.qrot_shape[0] % 8 == 0:
            pytest.skip("geometry unexpectedly on-envelope")
        mesh = _mesh(2, 4)
        fdev = jax.device_put(
            jnp.asarray(frames), NamedSharding(mesh, P("data", "rows", None)))
        with pytest.raises(ValueError):
            jax.jit(lambda f: sharded_apply_ell(
                f, op, mesh, impl="pallas", interpret=True))(fdev)

    def test_fuzz_angles(self):
        rng = np.random.default_rng(7)
        mesh = _mesh(2, 4)
        checked = 0
        for _ in range(60):
            if checked >= 4:
                break
            H = int(rng.integers(6, 20)) * 8
            W = int(rng.integers(8, 24)) * 8
            ang = float(rng.uniform(1.0, 359.0))
            spec = aa.make_grid_spec((H, W), 1.0, 0.5, (W / 2, H / 2), ang)
            if spec.is_axis_aligned:
                continue
            if spec.dst_shape[0] % 4 or spec.qrot_shape[0] % 4:
                continue
            if (spec.qrot_shape[0] // 4) % 8:
                continue  # sb must be 8-aligned for the plan
            try:
                self._check(H, W, 2, ang, mesh)
            except ValueError:
                continue  # off envelope: covered by the fallback tests
            checked += 1
        assert checked >= 2


# ----------------------------------------------------------------------
# Quadrant folding under sharding: the rot90 all-to-all of the SOURCE
# replaced by folded bands + a dst-sized flip/transpose
# ----------------------------------------------------------------------


class TestShardedQuadrantFold:
    def _frames(self, B, H, W):
        return RNG.uniform(0, 1, (B, H, W)).astype(np.float32)

    @pytest.mark.parametrize("angle", (90.0, 180.0, 270.0))
    def test_folded_matches_unsharded_banded(self, angle):
        H = W = 128
        mesh = _mesh(2, 4)
        spec = aa.make_grid_spec((H, W), 2.0, 1.0, (3.0, 5.0), angle)
        op = separable_operator(spec)
        from aainterp.parallel.sharding import _folded_sharded_bands
        assert _folded_sharded_bands(op, 4) is not None  # folded path taken
        frames = self._frames(2, H, W)
        fdev = jax.device_put(
            jnp.asarray(frames), NamedSharding(mesh, P("data", "rows", None)))
        out = jax.jit(lambda f: sharded_apply_separable(
            f, op, mesh, impl="banded"))(fdev)
        ref = aa.apply_operator(op, jnp.asarray(frames), impl="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        assert out.sharding.spec == P("data", "rows", None)

    @pytest.mark.parametrize("angle", (90.0, 270.0))
    def test_folded_pallas_interpret(self, angle):
        # odd quadrants swap the sharded axis of the inner apply; the
        # per-shard Pallas kernel runs on the folded bands unchanged
        H = W = 128
        mesh = _mesh(2, 4)
        spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), angle)
        op = separable_operator(spec)
        frames = self._frames(2, H, W)
        fdev = jax.device_put(
            jnp.asarray(frames), NamedSharding(mesh, P("data", "rows", None)))
        out = jax.jit(lambda f: sharded_apply_separable(
            f, op, mesh, impl="pallas", interpret=True))(fdev)
        ref = aa.apply_operator(op, jnp.asarray(frames), impl="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_folded_conserve_flux(self):
        # the psum conservation identity must hold in the folded (inner)
        # orientation at every quadrant
        H = W = 128
        mesh = _mesh(2, 4)
        for angle in (90.0, 180.0, 270.0):
            spec = aa.make_grid_spec((H, W), 2.0, 1.0, (1.0, 2.0), angle)
            op = separable_operator(spec)
            frames = self._frames(2, H, W)
            fdev = jax.device_put(
                jnp.asarray(frames),
                NamedSharding(mesh, P("data", "rows", None)))
            out, flux = jax.jit(lambda f, o=op: sharded_apply_separable(
                f, o, mesh, impl="banded", conserve=True))(fdev)
            fd, fs = np.asarray(flux)
            assert abs(fd - fs) <= 1e-3 * max(1.0, abs(fd)), (angle, fd, fs)

    def test_indivisible_fold_falls_back_to_rot90(self):
        # quadrant 1 with Wd % n_dev != 0: the folded bands don't divide
        # the mesh but the q-grid ones do — the rot90 route must engage
        # and still match unsharded
        # H=100: input rows shard 4-ways, but the folded inner dst rows
        # (Wd = 50) do not -> _folded_sharded_bands returns None
        H, W = 100, 128
        mesh = _mesh(2, 4)
        spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 90.0)
        op = separable_operator(spec)
        assert op.spec.quadrant == 1
        from aainterp.parallel.sharding import _folded_sharded_bands
        if _folded_sharded_bands(op, 4) is not None:
            pytest.skip("geometry unexpectedly divisible — adjust shapes")
        frames = self._frames(2, H, W)
        fdev = jax.device_put(
            jnp.asarray(frames), NamedSharding(mesh, P("data", "rows", None)))
        out = jax.jit(lambda f: sharded_apply_separable(
            f, op, mesh, impl="banded"))(fdev)
        ref = aa.apply_operator(op, jnp.asarray(frames), impl="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)


def test_sharded_variance_propagation():
    """Uncertainty maps scale out for free: the squared-weight operator
    (aa.propagate_variance) is just another SeparableOperator, so it
    rides the sharded apply unchanged."""
    from aainterp.ops.weights import squared_operator

    H, W, B = 128, 64, 4
    var = RNG.uniform(0.5, 2.0, (B, H, W)).astype(np.float32)
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec)
    mesh = _mesh(2, 4)
    sharding = NamedSharding(mesh, P("data", "rows", None))
    vdev = jax.device_put(jnp.asarray(var), sharding)
    out = jax.jit(lambda v: sharded_apply_separable(
        v, squared_operator(op), mesh))(vdev)
    ref = aa.propagate_variance(op, jnp.asarray(var))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_sharded_pallas_uint8_interpret():
    """u8 frames ride the per-shard Pallas kernel natively (bitcast
    byte-split unpack inside each chip's local contraction; u8-in ->
    u8-out contract), matching the single-chip u8 apply."""
    from aainterp.ops.pallas_apply import apply_separable_pallas

    H, W, B = 128, 128, 4
    frames = RNG.integers(0, 256, (B, H, W), dtype=np.uint8)
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec)
    mesh = _mesh(2, 4)
    sharding = NamedSharding(mesh, P("data", "rows", None))
    fdev = jax.device_put(jnp.asarray(frames), sharding)
    out = jax.jit(lambda f: sharded_apply_separable(
        f, op, mesh, impl="pallas", interpret=True))(fdev)
    assert out.dtype == jnp.uint8
    want = apply_separable_pallas(
        jnp.asarray(frames),
        jnp.asarray(op.wy.start),
        jnp.asarray(np.asarray(op.wy.weights, np.float32)),
        jnp.asarray(op.wx.start),
        jnp.asarray(np.asarray(op.wx.weights, np.float32)),
        interpret=True)
    err = np.abs(np.asarray(out).astype(np.int32)
                 - np.asarray(want).astype(np.int32))
    assert err.max() <= 1  # fp order across the shard split


def test_sharded_pallas_uint8_fallback_quantises():
    """Off the kernel envelope (W % 128 != 0) u8 degrades to the XLA
    banded local apply but keeps the u8 -> u8 contract."""
    H, W, B = 128, 96, 2
    frames = RNG.integers(0, 256, (B, H, W), dtype=np.uint8)
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec)
    mesh = _mesh(1, 8)
    sharding = NamedSharding(mesh, P("data", "rows", None))
    fdev = jax.device_put(jnp.asarray(frames), sharding)
    out = jax.jit(lambda f: sharded_apply_separable(
        f, op, mesh, interpret=False, impl="banded"))(fdev)
    assert out.dtype == jnp.uint8
    ref = aa.apply_operator(op, jnp.asarray(frames, jnp.float32))
    want = np.clip(np.round(np.asarray(ref)), 0, 255).astype(np.int32)
    assert np.abs(np.asarray(out).astype(np.int32) - want).max() <= 1


def test_sharded_uint8_conserve_raises():
    H, W = 128, 128
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec)
    mesh = _mesh(1, 8)
    frames = jnp.asarray(RNG.integers(0, 256, (2, H, W), dtype=np.uint8))
    with pytest.raises(ValueError, match="conserve"):
        sharded_apply_separable(frames, op, mesh, conserve=True,
                                interpret=True)


def test_nondivisible_rows_raise_value_error():
    # guard must survive python -O: a descriptive ValueError, not an
    # assert, for row counts that don't divide the mesh (would otherwise
    # shard into ragged blocks and return silently wrong output)
    H, W = 130, 64  # src rows 130 % 4 != 0
    frames = RNG.uniform(0, 1, (2, H, W)).astype(np.float32)
    mesh = _mesh(2, 4)
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = separable_operator(spec)
    with pytest.raises(ValueError, match="divisible"):
        sharded_apply_separable(jnp.asarray(frames), op, mesh,
                                interpret=True)
    spec_r = aa.make_grid_spec((H, W), 1.0, 0.5, (W / 2, H / 2), 8.0)
    op_r = ell_operator(spec_r, mode="exact")
    assert op_r.spec.qrot_shape[0] % 4 != 0
    with pytest.raises(ValueError, match="divisible"):
        sharded_apply_ell(jnp.asarray(frames), op_r, mesh, impl="xla")


class TestEllQuadrantFolding:
    """quadrant != 0 folded into the ELL table (VERDICT r3 item 3): the
    row-sharded rotated apply consumes the ORIGINAL source at any
    quadrant — the rot90 source-sized all-to-all is gone, replaced by a
    dst-sized flip/transpose reshard."""

    def _spec(self, angle, shape=(128, 96)):
        H, W = shape
        return aa.make_grid_spec((H, W), 1.0, 0.5, (W / 2, H / 2), angle)

    @pytest.mark.parametrize("angle", [121.5, 211.5, 301.5])
    def test_folded_matches_unsharded(self, angle):
        from aainterp.ops.weights import fold_quadrant_ell

        spec = self._spec(angle)
        op = ell_operator(spec, mode="exact")
        assert spec.quadrant in (1, 2, 3)
        folded, _ = fold_quadrant_ell(op)
        assert folded.spec.dst_shape[0] % 4 == 0
        assert folded.spec.qrot_shape[0] % 4 == 0
        H, W = spec.src_shape
        frames = RNG.uniform(0, 1, (2, H, W)).astype(np.float32)
        mesh = _mesh(2, 4)
        fdev = jax.device_put(
            jnp.asarray(frames),
            NamedSharding(mesh, P("data", "rows", None)))
        ref = aa.apply_operator(op, jnp.asarray(frames))
        for kw in (dict(impl="xla"),
                   dict(impl="pallas", interpret=True)):
            out = jax.jit(
                lambda f: sharded_apply_ell(f, op, mesh, **kw))(fdev)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=1e-5,
                err_msg=f"angle={angle} {kw}")

    def test_folded_conserve_flux(self):
        spec = self._spec(121.5)
        op = ell_operator(spec, mode="exact")
        H, W = spec.src_shape
        frames = RNG.uniform(0, 1, (2, H, W)).astype(np.float32)
        mesh = _mesh(2, 4)
        fdev = jax.device_put(
            jnp.asarray(frames),
            NamedSharding(mesh, P("data", "rows", None)))
        for kw in (dict(impl="xla"),
                   dict(impl="pallas", interpret=True)):
            out, flux = jax.jit(lambda f: sharded_apply_ell(
                f, op, mesh, conserve=True, **kw))(fdev)
            fd, fs = np.asarray(flux, dtype=np.float32)
            assert abs(fd - fs) <= 1e-4 * abs(fs), (kw, fd, fs)

    def test_no_source_sized_all_to_all_in_hlo(self):
        """The VERDICT r3 done-criterion: the compiled folded HLO moves
        at most dst-sized payloads through all-to-all (the source-sized
        rot90 collective is gone)."""
        import re

        from aainterp.ops import weights as weights_ops

        spec = self._spec(121.5)
        op = ell_operator(spec, mode="exact")
        H, W = spec.src_shape
        Hd, Wd = spec.dst_shape
        B = 2
        mesh = _mesh(2, 4)
        fdev = jax.device_put(
            jnp.asarray(RNG.uniform(0, 1, (B, H, W)).astype(np.float32)),
            NamedSharding(mesh, P("data", "rows", None)))

        def coll_sizes(hlo, kind):
            sizes = []
            for ln in hlo.splitlines():
                if kind not in ln:
                    continue
                for shp in re.findall(r"f32\[([0-9,]*)\]", ln):
                    els = 1
                    for d in shp.split(","):
                        if d:
                            els *= int(d)
                    sizes.append(els)
            return sizes

        # teeth built into the geometry: the UNFOLDED route cannot even
        # run here (true dst 74 rows don't divide 4 shards — the fold
        # ADDED the capability), so a successful compile proves the
        # folded path ran; the all-to-all bound then pins its contract
        assert Hd % 4 != 0
        hlo = jax.jit(lambda f: sharded_apply_ell(
            f, op, mesh, impl="xla")).lower(fdev).compile().as_text()
        per_chip_dst = -(-B // 2) * -(-Hd // 4) * Wd
        a2a = coll_sizes(hlo, "all-to-all")
        assert all(s <= per_chip_dst for s in a2a), (a2a, per_chip_dst)


def test_sharded_ell_explicit_tables_quadrant_conserve():
    """Explicit argument tables + quadrant fold + conserve compose: the
    tables fold on device (fold_tables_device), the output matches the
    unsharded apply, and the psum flux identity holds."""
    spec = aa.make_grid_spec((128, 96), 1.0, 0.5, (48.0, 64.0), 121.5)
    op = ell_operator(spec, mode="exact")
    mesh = _mesh(2, 4)
    base = jnp.asarray(op.base)
    w = jnp.asarray(op.weights, jnp.float32)
    frames = jnp.asarray(
        RNG.uniform(0, 1, (2, 128, 96)).astype(np.float32))
    out, flux = jax.jit(lambda f, b, ww: sharded_apply_ell(
        f, op, mesh, impl="xla", base=b, weights=ww,
        conserve=True))(frames, base, w)
    ref = aa.apply_operator(op, frames, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)
    fd, fs = np.asarray(flux, dtype=np.float32)
    assert abs(fd - fs) <= 1e-4 * abs(fs), (fd, fs)
