"""Quadrant folding: the rot90 pre-rotation absorbed into the band tables.

The separable apply used to materialise ``rot90(src)`` for quadrant != 0
(a full HBM round trip of the LARGE source at 4K, Source.cpp:159-172
cell semantics).  weights.fold_quadrant_separable re-expresses rot90^k
as source flips/swaps folded into the 1-D bands, so every separable
path (XLA banded, Pallas, box, custom VJPs, adjoint apply) consumes the
original image; quadrants 1/3 transpose only the small dst-side array.

Identities under test:
  flip_band(b).dense()        == b.dense()[:, ::-1]          (W @ P)
  reverse_rows_band(b).dense() == b.dense()[::-1]            (P @ W)
  folded apply                == rot90 path, all quadrants, all impls
  folded adjoint              == <Au, v> = <u, A^T v>, all quadrants
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aainterp import autodiff
from aainterp.api import apply_operator, build_operator
from aainterp.grids import make_grid_spec
from aainterp.ops import apply as apply_ops
from aainterp.ops import overlap1d
from aainterp.ops import weights as weights_ops

RNG = np.random.default_rng(7)

ANGLES = (0.0, 90.0, 180.0, 270.0)


def _band_cases():
    for n_dst, n_src, L, iso, off in [
        (7, 15, 2.1, 0.3, -0.2),
        (10, 10, 1.0, 0.0, 0.0),
        (5, 23, 4.7, -0.1, 0.4),
        (30, 8, 0.26, 0.2, 0.0),
        (4, 3, 0.9, 0.0, 0.1),
    ]:
        yield overlap1d.overlap_band_1d(n_dst, n_src, L, 1, iso, off)


def test_flip_band_dense_identity():
    for b in _band_cases():
        np.testing.assert_array_equal(
            overlap1d.flip_band(b).dense(), b.dense()[:, ::-1])


def test_reverse_rows_band_dense_identity():
    for b in _band_cases():
        np.testing.assert_array_equal(
            overlap1d.reverse_rows_band(b).dense(), b.dense()[::-1])
        # (W P)^T == P W^T: the backward-table identity
        np.testing.assert_array_equal(
            overlap1d.flip_band(b).dense().T,
            overlap1d.reverse_rows_band(overlap1d.transpose_band(b)).dense(),
        )


def _rot90_reference(op, src):
    """The pre-fold evaluation: explicit rot90 then banded apply."""
    q = apply_ops.quadrant_rotate(jnp.asarray(src), op.spec.quadrant)
    return apply_ops.apply_separable_banded(
        q, jnp.asarray(op.wy.start), jnp.asarray(op.wy.weights),
        jnp.asarray(op.wx.start), jnp.asarray(op.wx.weights))


@pytest.mark.parametrize("angle", ANGLES)
def test_folded_xla_matches_rot90_path(angle):
    spec = make_grid_spec((37, 52), 150.0, 300.0, (10.0, 7.0), angle)
    op = build_operator(spec)
    src = RNG.uniform(0, 1, (2, 37, 52)).astype(np.float32)
    ref = _rot90_reference(op, src)
    out = apply_operator(op, jnp.asarray(src))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("angle", (90.0, 270.0))
def test_folded_pallas_interpret_matches(angle):
    spec = make_grid_spec((64, 96), 2.0, 1.0, (0.0, 0.0), angle)
    op = build_operator(spec)
    assert op.spec.quadrant in (1, 3)
    src = RNG.uniform(0, 1, (2, 64, 96)).astype(np.float32)
    ref = _rot90_reference(op, src)
    lin = autodiff.separable_linear_for(op, jnp.float32, "pallas",
                                        interpret=True)
    out = lin(jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # backward: pull a random cotangent through both paths
    cot = jnp.asarray(RNG.uniform(-1, 1, ref.shape).astype(np.float32))
    _, pull = jax.vjp(lin, jnp.asarray(src))
    _, pull_ref = jax.vjp(lambda s: _rot90_reference(op, s), jnp.asarray(src))
    np.testing.assert_allclose(
        np.asarray(pull(cot)[0]), np.asarray(pull_ref(cot)[0]), atol=1e-5)


@pytest.mark.parametrize("angle", ANGLES[1:])
def test_folded_box_route_matches_banded(angle):
    # edge-aligned integer ratio-2 grid: box params detected on the q grid;
    # the folded box runs on the original image with (my, mx) swapped for
    # odd quadrants and rot90s only the small output
    spec = make_grid_spec((24, 48), 2.0, 1.0, (0.5, 0.5), angle)
    op = build_operator(spec)
    assert op.spec.quadrant != 0
    src = RNG.uniform(0, 1, (24, 48)).astype(np.float32)
    out_box = apply_operator(op, jnp.asarray(src), impl="box")
    ref = _rot90_reference(op, src)
    assert out_box.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out_box), np.asarray(ref),
                               atol=1e-6)


@pytest.mark.parametrize("angle", ANGLES)
def test_folded_adjoint_identity(angle):
    spec = make_grid_spec((40, 64), 2.0, 1.0, (1.0, 3.0), angle)
    op = build_operator(spec)
    u = jnp.asarray(RNG.uniform(0, 1, (40, 64)).astype(np.float32))
    v = jnp.asarray(
        RNG.uniform(-1, 1, apply_operator(op, u).shape).astype(np.float32))
    au = apply_operator(op, u, impl="xla")
    atv = autodiff.apply_operator_transpose(op, v, impl="xla")
    assert atv.shape == u.shape
    lhs = float(jnp.vdot(au, v))
    rhs = float(jnp.vdot(u, atv))
    assert abs(lhs - rhs) <= 1e-3 * max(1.0, abs(lhs))


@pytest.mark.parametrize("angle", ANGLES)
def test_folded_differentiable_vjp_matches_native(angle):
    spec = make_grid_spec((32, 40), 2.0, 1.0, (0.5, 1.5), angle)
    op = build_operator(spec)
    src = jnp.asarray(RNG.uniform(0, 1, (32, 40)).astype(np.float32))
    out, pull = jax.vjp(
        lambda s: apply_operator(op, s, impl="xla", differentiable=True),
        src)
    ref_out, pull_ref = jax.vjp(lambda s: _rot90_reference(op, s), src)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-6)
    cot = jnp.asarray(RNG.uniform(-1, 1, out.shape).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(pull(cot)[0]), np.asarray(pull_ref(cot)[0]), atol=1e-6)


def test_fold_tables_identity_quadrant0():
    # q == 0 must return the ORIGINAL band objects (no copy, no flip)
    spec = make_grid_spec((24, 24), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = build_operator(spec)
    yb, xb, out_t = weights_ops.fold_quadrant_separable(op)
    assert yb is op.wy and xb is op.wx and out_t is False


def test_ell_fold_fuzz_random_geometries():
    """fold_quadrant_ell exactness fuzz: random shapes / angles in every
    quadrant / isocenters near corners (edge windows clip) — the folded
    apply on the ORIGINAL image must match the unfolded apply on the
    rotated image bitwise up to f32 accumulation order."""
    import jax.numpy as jnp

    import aainterp as aa
    from aainterp.ops import apply as apply_ops
    from aainterp.ops.weights import ell_operator, fold_quadrant_ell

    rng = np.random.default_rng(17)
    for trial in range(12):
        H = int(rng.integers(20, 52))
        W = int(rng.integers(20, 52))
        ang = float(rng.uniform(91.0, 359.0))
        if abs(ang % 90.0) < 1e-6:
            ang += 0.7
        iso = (float(rng.uniform(-2.0, W + 2.0)),
               float(rng.uniform(-2.0, H + 2.0)))
        dr = float(rng.uniform(0.4, 1.3))
        spec = aa.make_grid_spec((H, W), 1.0, dr, iso, ang)
        if spec.quadrant == 0:
            continue
        op = ell_operator(spec, mode="exact")
        src = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
        ref = apply_ops.apply_ell(
            apply_ops.quadrant_rotate(src, spec.quadrant),
            jnp.asarray(op.base), jnp.asarray(op.weights, jnp.float32))
        folded, post = fold_quadrant_ell(op)
        out = post(apply_ops.apply_ell(
            src, jnp.asarray(folded.base),
            jnp.asarray(folded.weights, jnp.float32)))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5,
            err_msg=f"trial {trial}: {H}x{W} ang={ang} iso={iso} dr={dr}")


def test_fold_tables_device_matches_host_fold():
    """weights.fold_tables_device (the jnp fold of explicit argument
    tables used by the sharded VJPs) must match fold_quadrant_ell's host
    fold bit-for-bit at every quadrant."""
    import jax.numpy as jnp

    import aainterp as aa
    from aainterp.ops.weights import (ell_operator, fold_quadrant_ell,
                                      fold_tables_device)

    for ang in (95.0, 200.0, 301.5):
        spec = aa.make_grid_spec((48, 40), 1.0, 0.5, (20.0, 24.0), ang)
        op = ell_operator(spec, mode="exact")
        fop = fold_quadrant_ell(op)[0]
        qH, qW = op.spec.qrot_shape
        nb, nw = fold_tables_device(
            jnp.asarray(op.base), jnp.asarray(op.weights, jnp.float32),
            op.spec.quadrant, qH, qW)
        np.testing.assert_array_equal(np.asarray(nb), fop.base)
        np.testing.assert_array_equal(
            np.asarray(nw), fop.weights.astype(np.float32))
