"""2-D (rows x cols) sharded rotated (ELL) apply tests — VERDICT r3
item 2: the distributed form of the reference's hot loop
(Source.cpp:432-576) over BOTH image axes, for frames too large for a
1-D strip split.

Collective structure: one ring-halo exchange per mesh axis (corners
transitively through the edge neighbour); each chip contracts its
halo-extended block against its (db_r, db_c) block of the ELL tables —
either the XLA flat-gather local apply or the per-chip three-kernel
Pallas shear path (build_sharded_kernel_plan_2d, interpret here).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import aainterp as aa
from aainterp.ops.weights import ell_operator
from aainterp.parallel.sharding import (
    make_sharded_ell_pallas_2d,
    sharded_apply_ell_2d,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)

RNG = np.random.default_rng(11)


def _mesh3(data, rows, cols):
    devs = np.asarray(jax.devices()[: data * rows * cols]).reshape(
        data, rows, cols)
    return Mesh(devs, ("data", "rows", "cols"))


def _run(spec, mesh, B=2, **kw):
    H, W = spec.src_shape
    op = ell_operator(spec, mode="exact")
    frames = RNG.uniform(0, 1, (B, H, W)).astype(np.float32)
    fdev = jax.device_put(
        jnp.asarray(frames), NamedSharding(mesh, P("data", "rows", "cols")))
    out = jax.jit(lambda f: sharded_apply_ell_2d(f, op, mesh, **kw))(fdev)
    ref = aa.apply_operator(op, jnp.asarray(frames))
    return out, ref, op, fdev


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_2d_ell_matches_unsharded(impl):
    spec = aa.make_grid_spec((128, 96), 1.0, 0.5, (48.0, 64.0), 14.0)
    kw = dict(impl=impl) if impl == "xla" else dict(
        impl="pallas", interpret=True)
    out, ref, _, _ = _run(spec, _mesh3(2, 2, 2), **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert out.sharding.spec == P("data", "rows", "cols")


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_2d_ell_steeper_angle_multi_hop(impl):
    # 4-way col mesh at a steeper angle: the row halo spans multiple
    # shard hops (it grows with W*sin(angle) — the dst/src row alignment
    # drifts across the full column range)
    spec = aa.make_grid_spec((128, 128), 1.0, 0.5, (64.0, 64.0), 31.0)
    assert spec.dst_shape[0] % 2 == 0 and spec.dst_shape[1] % 4 == 0
    kw = dict(impl=impl) if impl == "xla" else dict(
        impl="pallas", interpret=True)
    out, ref, _, _ = _run(spec, _mesh3(1, 2, 4), **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("angle", [121.5, 211.5, 301.5])
def test_2d_ell_quadrant_folded(angle):
    """quadrant != 0: the rot90 folds into the ELL table — the sharded
    source is consumed un-rotated on the 2-D mesh too."""
    spec = aa.make_grid_spec((128, 96), 1.0, 0.5, (48.0, 64.0), angle)
    assert spec.quadrant in (1, 2, 3)
    for kw in (dict(impl="xla"), dict(impl="pallas", interpret=True)):
        out, ref, _, _ = _run(spec, _mesh3(2, 2, 2), **kw)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5,
            err_msg=f"angle={angle} {kw}")


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_2d_ell_conserve_flux(impl):
    spec = aa.make_grid_spec((128, 96), 1.0, 0.5, (48.0, 64.0), 14.0)
    kw = dict(impl=impl) if impl == "xla" else dict(
        impl="pallas", interpret=True)
    out, ref, _, _ = _run(spec, _mesh3(2, 2, 2), conserve=True, **kw)
    out, flux = out
    fd, fs = np.asarray(flux, dtype=np.float32)
    assert abs(fd - fs) <= 1e-4 * abs(fs), (fd, fs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_2d_ell_conserve_flux_quadrant():
    spec = aa.make_grid_spec((128, 96), 1.0, 0.5, (48.0, 64.0), 121.5)
    for kw in (dict(impl="xla"), dict(impl="pallas", interpret=True)):
        out, _, _, _ = _run(spec, _mesh3(2, 2, 2), conserve=True, **kw)
        out, flux = out
        fd, fs = np.asarray(flux, dtype=np.float32)
        assert abs(fd - fs) <= 1e-4 * abs(fs), (kw, fd, fs)


def test_2d_ell_no_batch_axis():
    spec = aa.make_grid_spec((128, 96), 1.0, 0.5, (48.0, 64.0), 14.0)
    H, W = spec.src_shape
    op = ell_operator(spec, mode="exact")
    frames = RNG.uniform(0, 1, (H, W)).astype(np.float32)
    mesh = _mesh3(1, 2, 2)
    with mesh:
        fdev = jax.device_put(
            jnp.asarray(frames), NamedSharding(mesh, P("rows", "cols")))
    out = jax.jit(lambda f: sharded_apply_ell_2d(
        f, op, mesh, data_axis=None, impl="pallas", interpret=True))(fdev)
    ref = aa.apply_operator(op, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_2d_ell_forced_pallas_raises_off_envelope():
    # dst 87x87 does not divide the 2x2 mesh: forced raises, auto would
    # also fail the XLA divisibility check (honest error, no silent path)
    spec = aa.make_grid_spec((128, 128), 1.0, 0.5, (64.0, 64.0), 30.0)
    assert spec.dst_shape[0] % 2 != 0
    op = ell_operator(spec, mode="exact")
    H, W = spec.src_shape
    mesh = _mesh3(2, 2, 2)
    fdev = jax.device_put(
        jnp.asarray(RNG.uniform(0, 1, (2, H, W)).astype(np.float32)),
        NamedSharding(mesh, P("data", "rows", "cols")))
    with pytest.raises(ValueError, match="divisible"):
        jax.jit(lambda f: sharded_apply_ell_2d(
            f, op, mesh, impl="pallas", interpret=True))(fdev)


def test_2d_ell_pallas_fallback_to_xla(monkeypatch):
    """Auto route degrades to the XLA local apply when the Pallas plan
    raises; a forced impl='pallas' must raise instead."""
    import aainterp.parallel.sharding as sh

    spec = aa.make_grid_spec((128, 96), 1.0, 0.5, (48.0, 64.0), 14.0)

    def boom(*a, **k):
        raise ValueError("forced off the 2-D shear plan envelope (test)")

    monkeypatch.setattr(sh, "make_sharded_ell_pallas_2d", boom)
    out, ref, _, fdev = _run(spec, _mesh3(2, 2, 2), impl="auto",
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    op = ell_operator(spec, mode="exact")
    mesh = _mesh3(2, 2, 2)
    with pytest.raises(ValueError, match="envelope"):
        sharded_apply_ell_2d(fdev, op, mesh, impl="pallas", interpret=True)


def test_2d_ell_quadrant_no_source_sized_all_to_all():
    """Folded quadrant on the 2-D mesh: the compiled HLO moves at most
    dst-chunk-sized payloads through all-to-all (the fold's contract)."""
    import re

    spec = aa.make_grid_spec((128, 96), 1.0, 0.5, (48.0, 64.0), 121.5)
    op = ell_operator(spec, mode="exact")
    H, W = spec.src_shape
    Hd, Wd = spec.dst_shape
    mesh = _mesh3(2, 2, 2)
    fdev = jax.device_put(
        jnp.asarray(RNG.uniform(0, 1, (2, H, W)).astype(np.float32)),
        NamedSharding(mesh, P("data", "rows", "cols")))
    hlo = jax.jit(lambda f: sharded_apply_ell_2d(
        f, op, mesh, impl="xla")).lower(fdev).compile().as_text()
    per_chip_dst = 1 * -(-Hd // 2) * -(-Wd // 2)
    for ln in hlo.splitlines():
        if "all-to-all" not in ln:
            continue
        for shp in re.findall(r"f32\[([0-9,]*)\]", ln):
            els = 1
            for d in shp.split(","):
                if d:
                    els *= int(d)
            assert els <= per_chip_dst, (ln[:160], els, per_chip_dst)


def test_2d_plan_matches_1d_plan_structure():
    """n_c=1 degenerates the 2-D plan to the 1-D sharded plan's halo and
    span decisions (same geometry, same ring)."""
    from aainterp.ops.pallas_shear import (
        build_sharded_kernel_plan, build_sharded_kernel_plan_2d,
    )

    spec = aa.make_grid_spec((128, 128), 1.0, 0.5, (64.0, 64.0), 31.0)
    op = ell_operator(spec, mode="exact")
    assert op.spec.dst_shape[0] % 4 == 0
    kp1 = build_sharded_kernel_plan(op, 4)
    kp2 = build_sharded_kernel_plan_2d(op, 4, 1)
    assert kp2.halo_y == kp1.halo
    assert kp2.SRF == kp1.SRF
    assert kp2.Ka == kp1.Ka and kp2.Kb == kp1.Kb
    np.testing.assert_array_equal(kp2.r0_loc, kp1.r0_loc)


class TestEll2dAdjoint:
    """2-D-mesh adjoint + custom VJP of the rotated apply: local scatter
    + two-axis reverse ring halo reduce (cols then rows), quadrant
    folded via ell_fold_post_inv (no source-sized inverse rot90)."""

    def test_transpose_matches_unsharded(self):
        from aainterp import autodiff
        from aainterp.parallel.sharding import (
            sharded_apply_ell_2d_transpose,
        )

        spec = aa.make_grid_spec((128, 96), 1.0, 0.5, (48.0, 64.0), 14.0)
        op = ell_operator(spec, mode="exact")
        mesh = _mesh3(2, 2, 2)
        cot = RNG.uniform(-1, 1, (2,) + op.spec.dst_shape).astype(
            np.float32)
        cdev = jax.device_put(
            jnp.asarray(cot),
            NamedSharding(mesh, P("data", "rows", "cols")))
        out = jax.jit(lambda g: sharded_apply_ell_2d_transpose(
            g, op, mesh))(cdev)
        ref = autodiff.apply_operator_transpose(op, jnp.asarray(cot))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    @pytest.mark.parametrize("angle", [121.5, 211.5, 301.5])
    def test_transpose_quadrant_folded(self, angle):
        from aainterp import autodiff
        from aainterp.parallel.sharding import (
            sharded_apply_ell_2d_transpose,
        )

        spec = aa.make_grid_spec((128, 96), 1.0, 0.5, (48.0, 64.0),
                                 angle)
        assert spec.quadrant in (1, 2, 3)
        op = ell_operator(spec, mode="exact")
        mesh = _mesh3(2, 2, 2)
        cot = RNG.uniform(-1, 1, (2,) + op.spec.dst_shape).astype(
            np.float32)
        cdev = jax.device_put(
            jnp.asarray(cot),
            NamedSharding(mesh, P("data", "rows", "cols")))
        out = jax.jit(lambda g: sharded_apply_ell_2d_transpose(
            g, op, mesh))(cdev)
        ref = autodiff.apply_operator_transpose(op, jnp.asarray(cot))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, err_msg=str(angle))

    def test_grad_matches_unsharded(self):
        from aainterp.parallel.sharding import make_sharded_ell_2d_linear

        spec = aa.make_grid_spec((128, 96), 1.0, 0.5, (48.0, 64.0), 14.0)
        op = ell_operator(spec, mode="exact")
        mesh = _mesh3(2, 2, 2)
        lin = make_sharded_ell_2d_linear(op, mesh, impl="xla")
        base = jnp.asarray(op.base)
        w = jnp.asarray(op.weights, jnp.float32)
        H, W = spec.src_shape
        frames = RNG.uniform(0, 1, (2, H, W)).astype(np.float32)
        fdev = jax.device_put(
            jnp.asarray(frames),
            NamedSharding(mesh, P("data", "rows", "cols")))
        g = jax.jit(jax.grad(
            lambda f: jnp.sum(lin(f, base, w) ** 2)))(fdev)
        g_ref = jax.grad(lambda f: jnp.sum(
            aa.apply_operator(op, f, impl="xla") ** 2))(
            jnp.asarray(frames))
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=1e-4)


def test_2d_ell_transpose_steep_multihop_cols():
    """Adjoint multi-hop over the COLUMN ring: steep angle on a 4-way
    col mesh makes halo_x span multiple col shards, exercising
    _halo_reduce(axis=-1) beyond one hop (the axis generalisation)."""
    from aainterp import autodiff
    from aainterp.parallel.sharding import (
        _ell_halo_2d, sharded_apply_ell_2d_transpose,
    )

    spec = aa.make_grid_spec((128, 128), 1.0, 0.5, (64.0, 64.0), 31.0)
    op = ell_operator(spec, mode="exact")
    halo_y, halo_x, _, _, _, sb_c = _ell_halo_2d(op, 2, 4)
    assert halo_x > sb_c  # the col halo really is multi-hop here
    mesh = _mesh3(1, 2, 4)
    cot = RNG.uniform(-1, 1, (1,) + op.spec.dst_shape).astype(np.float32)
    cdev = jax.device_put(
        jnp.asarray(cot), NamedSharding(mesh, P("data", "rows", "cols")))
    out = jax.jit(lambda g: sharded_apply_ell_2d_transpose(
        g, op, mesh))(cdev)
    ref = autodiff.apply_operator_transpose(op, jnp.asarray(cot))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)
