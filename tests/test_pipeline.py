"""Streaming executor (aainterp.pipeline.stream_apply).

Correctness model: streaming must equal the direct one-shot apply,
frame for frame, in input order, at every (n_frames, batch, depth)
combination — the padding/trim and in-flight bookkeeping must never
show through.  The reference analogue is Source.cpp:1216-1320's serial
read/compute/write loop (depth=1 degenerates to it).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import aainterp as aa
from aainterp.pipeline import stream_apply
from aainterp.regrid import apply_band_operators

RNG = np.random.default_rng(11)


def _sep_op(shape=(48, 64), quadrant_angle=0.0):
    spec = aa.make_grid_spec(shape, 2.0, 3.0, (0.0, 0.0), quadrant_angle)
    return aa.build_operator(spec, mode="exact")


def _direct(op, frame):
    return np.asarray(aa.apply_operator(op, jnp.asarray(frame)))


@pytest.mark.parametrize("n_frames", [1, 3, 4, 9])
@pytest.mark.parametrize("depth", [1, 2, 3])
def test_stream_matches_direct_apply(n_frames, depth):
    op = _sep_op()
    frames = [RNG.uniform(0, 1, (48, 64)).astype(np.float32)
              for _ in range(n_frames)]
    got = list(stream_apply(op, frames, batch=4, depth=depth))
    assert len(got) == n_frames
    for f, g in zip(frames, got):
        np.testing.assert_allclose(g, _direct(op, f), rtol=1e-6, atol=1e-6)


def test_stream_accepts_generator_and_leading_dims():
    op = _sep_op()
    ref = [RNG.uniform(0, 1, (3, 48, 64)).astype(np.float32)
           for _ in range(5)]
    got = list(stream_apply(op, (f for f in ref), batch=2, depth=2))
    assert len(got) == 5
    for f, g in zip(ref, got):
        assert g.shape[:-2] == (3,)
        np.testing.assert_allclose(g, _direct(op, f), rtol=1e-6, atol=1e-6)


def test_stream_uint8_contract():
    """u8 frames keep the u8-in -> u8-out video contract (round+saturate),
    matching apply_band_operators on the folded tables."""
    op = _sep_op()
    frames = [RNG.integers(0, 256, (48, 64), dtype=np.uint8)
              for _ in range(3)]
    got = list(stream_apply(op, frames, batch=2, depth=2))
    from aainterp.ops.weights import fold_quadrant_separable

    yb, xb, out_t = fold_quadrant_separable(op)
    assert not out_t
    for f, g in zip(frames, got):
        assert g.dtype == np.uint8
        ref = np.asarray(apply_band_operators(jnp.asarray(f), yb, xb))
        np.testing.assert_array_equal(g, ref)


@pytest.mark.parametrize("angle,quad", [(90.0, 1), (180.0, 2), (270.0, 3)])
def test_stream_quadrants_fold(angle, quad):
    op = _sep_op(quadrant_angle=angle)
    assert op.spec.quadrant == quad
    frames = [RNG.uniform(0, 1, (48, 64)).astype(np.float32)
              for _ in range(3)]
    got = list(stream_apply(op, frames, batch=2, depth=2))
    for f, g in zip(frames, got):
        np.testing.assert_allclose(g, _direct(op, f), rtol=1e-5, atol=1e-6)


def test_stream_band_pair_regrid():
    """A raw (Band1D, Band1D) pair (regrid / area_resize operators)
    streams through the same executor."""
    from aainterp.regrid import LatLonGrid, conservative_regrid_operator

    src, dst = LatLonGrid(24, 36), LatLonGrid(12, 18)
    by, bx = conservative_regrid_operator(src, dst)
    frames = [RNG.uniform(0, 1, (24, 36)).astype(np.float32)
              for _ in range(5)]
    got = list(stream_apply((by, bx), frames, batch=2, depth=2))
    assert len(got) == 5
    for f, g in zip(frames, got):
        ref = np.asarray(apply_band_operators(jnp.asarray(f), by, bx))
        np.testing.assert_allclose(g, ref, rtol=1e-6, atol=1e-6)


def test_stream_rotated_ell():
    spec = aa.make_grid_spec((40, 40), 1.0, 0.8, (20.0, 20.0), 30.0)
    op = aa.build_operator(spec, mode="exact", method="ell")
    frames = [RNG.uniform(0, 1, (40, 40)).astype(np.float32)
              for _ in range(3)]
    got = list(stream_apply(op, frames, batch=2, depth=2))
    for f, g in zip(frames, got):
        np.testing.assert_allclose(g, _direct(op, f), rtol=1e-5, atol=1e-6)


def test_stream_rejects_ragged_frames():
    op = _sep_op()
    frames = [np.zeros((48, 64), np.float32), np.zeros((48, 63), np.float32)]
    with pytest.raises(ValueError, match="changed mid-stream"):
        list(stream_apply(op, frames, batch=4))
    with pytest.raises(ValueError, match="at least 2-D"):
        list(stream_apply(op, [np.zeros(48, np.float32)], batch=4))
    with pytest.raises(ValueError, match="batch"):
        list(stream_apply(op, [], batch=0))
    with pytest.raises(TypeError, match="Band1D"):
        list(stream_apply((1, 2), [np.zeros((4, 4), np.float32)]))


# ----------------------------------------------------------------------
# File streaming (iter_files / stream_apply_files)
# ----------------------------------------------------------------------


def test_iter_files_order_threads_and_errors(tmp_path):
    from aainterp.pipeline import iter_files
    from aainterp.utils.io import csv_write

    mats = [RNG.uniform(0, 1, (8, 9)) for _ in range(7)]
    paths = []
    for i, m in enumerate(mats):
        p = tmp_path / f"f{i}.csv"
        csv_write(str(p), m)
        paths.append(str(p))
    got = list(iter_files(paths, threads=3, prefetch=2))
    assert len(got) == 7
    for m, g in zip(mats, got):
        np.testing.assert_allclose(g, m, rtol=1e-12)
    # a missing file raises on ITS yield, after the earlier ones arrive
    it = iter_files(paths[:2] + [str(tmp_path / "missing.csv")], threads=2)
    next(it), next(it)
    with pytest.raises((IOError, OSError)):
        next(it)


def test_stream_apply_files_end_to_end(tmp_path):
    """read -> pipelined apply -> write equals the one-shot CLI-style
    path, with the reference's _mod naming and 6-digit precision."""
    from aainterp.pipeline import stream_apply_files
    from aainterp.utils.io import csv_read, csv_write

    op = _sep_op((32, 40))
    mats = [RNG.uniform(0, 1, (32, 40)) for _ in range(5)]
    paths = []
    for i, m in enumerate(mats):
        p = tmp_path / f"in{i}.csv"
        csv_write(str(p), m)
        paths.append(str(p))
    outs = stream_apply_files(op, paths, batch=2, depth=2, threads=2)
    assert outs == [str(tmp_path / f"in{i}_mod.csv") for i in range(5)]
    for m, o in zip(mats, outs):
        ref = _direct(op, m.astype(np.float32))
        got = csv_read(o)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)
    with pytest.raises(ValueError, match="outputs"):
        stream_apply_files(op, paths, [str(tmp_path / "x.csv")])


def test_cli_multi_input_streams(tmp_path, capsys):
    """Multi-input CLI: one operator, <base>_mod.csv per input, outputs
    equal the single-input CLI run on each file."""
    from aainterp.cli import main
    from aainterp.utils.io import csv_read, csv_write

    mats = [RNG.uniform(0, 1, (24, 24)) for _ in range(3)]
    paths = []
    for i, m in enumerate(mats):
        p = tmp_path / f"s{i}.csv"
        csv_write(str(p), m)
        paths.append(str(p))
    common = ["--src-resolution", "150", "--dst-resolution", "25.4",
              "--isocenter", "12", "12", "--angle", "1.5", "--mode", "2"]
    assert main(paths + common) == 0
    out = capsys.readouterr().out
    assert "Streamed 3 files" in out and "Run terminated correctly." in out
    multi = [csv_read(str(tmp_path / f"s{i}_mod.csv")) for i in range(3)]
    # reference: the single-input path on each file
    for i in range(3):
        (tmp_path / f"s{i}_mod.csv").unlink()
        assert main([paths[i]] + common + ["--no-banner"]) == 0
        single = csv_read(str(tmp_path / f"s{i}_mod.csv"))
        np.testing.assert_array_equal(multi[i], single)
    # --output is single-input only
    assert main(paths + common + ["--output", str(tmp_path / "x.csv")]) == -1
    assert "Run terminated abnormally." in capsys.readouterr().out


def test_stream_rotated_u8_casts_to_float():
    """u8 into a rotated (ELL) stream: the shear kernels are not
    u8-native, so the executor casts to f32 — float output by contract."""
    spec = aa.make_grid_spec((40, 40), 1.0, 0.8, (20.0, 20.0), 30.0)
    op = aa.build_operator(spec, mode="exact", method="ell")
    frames = [RNG.integers(0, 256, (40, 40), dtype=np.uint8)
              for _ in range(2)]
    got = list(stream_apply(op, frames, batch=2, depth=1))
    for f, g in zip(frames, got):
        assert g.dtype != np.uint8
        ref = _direct(op, f.astype(np.float32))
        np.testing.assert_allclose(g, ref, rtol=1e-5, atol=1e-5)


def test_stream_through_callable_sharded_step():
    """op may be ANY batch->batch callable — here the multi-chip sharded
    apply on the virtual 8-device mesh, so a host frame stream feeds a
    sharded serving step directly."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from aainterp.parallel.sharding import sharded_apply_separable

    H, W, B = 64, 32, 4
    spec = aa.make_grid_spec((H, W), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = aa.build_operator(spec)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "rows"))
    sharding = NamedSharding(mesh, P("data", "rows", None))

    def step(x):
        return sharded_apply_separable(jax.device_put(x, sharding), op, mesh)

    frames = [RNG.uniform(0, 1, (H, W)).astype(np.float32)
              for _ in range(6)]
    got = list(stream_apply(step, frames, batch=B, depth=2))
    for f, g in zip(frames, got):
        np.testing.assert_allclose(g, _direct(op, f), rtol=1e-5, atol=1e-6)


def test_jitted_step_reaches_pallas_plan_with_host_tables():
    """Regression: the TPU stream route plans a Pallas kernel INSIDE the
    jitted step.  In current JAX a trace-time jnp.asarray(numpy) is a
    tracer (constants-become-arguments), so apply_band_operators must
    hand the planner HOST tables, not jnp conversions — the 2026-08-19
    bench --case stream crash on the real TPU.  interpret=True runs the
    same host-side planning on CPU."""
    import jax

    by, bx = aa.resize_bands((48, 64), (24, 32))
    x = jnp.asarray(RNG.uniform(0, 1, (2, 48, 64)).astype(np.float32))

    @jax.jit
    def step(f):
        return apply_band_operators(f, by, bx, impl="pallas",
                                    interpret=True)

    got = step(x)
    want = apply_band_operators(x, by, bx, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_traced_band_tables_raise_clearly():
    """Genuinely traced tables (jit arguments) cannot be planned on the
    host; a forced impl='pallas' must raise the descriptive TypeError
    rather than silently running the slower XLA path."""
    import jax

    from aainterp.ops.overlap1d import Band1D

    by, bx = aa.resize_bands((48, 64), (24, 32))
    x = jnp.asarray(RNG.uniform(0, 1, (2, 48, 64)).astype(np.float32))

    @jax.jit
    def step(f, ys, yw):
        byt = Band1D(start=ys, weights=yw, n_src=by.n_src, n_dst=by.n_dst)
        return apply_band_operators(f, byt, bx, impl="pallas",
                                    interpret=True)

    with pytest.raises(TypeError, match="concrete"):
        step(x, jnp.asarray(by.start), jnp.asarray(by.weights))


def test_stream_apply_shear3_callable():
    """mode='shear' composes with the streaming executor: the cached
    jitted shear step serves as a batch->batch callable (the rotated
    serving-loop pattern the mode exists for)."""
    import jax

    from aainterp.ops.shear3 import (apply_shear3_np, build_shear3_plan,
                                     plan_arrays)
    from aainterp.ops.shear3 import apply_shear3_xla

    spec = aa.make_grid_spec((48, 48), 1.0, 0.6, (24.0, 24.0), 30.0)
    plan = build_shear3_plan(spec)
    arrs = plan_arrays(plan)
    step = jax.jit(lambda b: apply_shear3_xla(plan, b, arrs))
    rng = np.random.default_rng(21)
    frames = [rng.uniform(0, 1, (48, 48)).astype(np.float32)
              for _ in range(5)]
    outs = list(stream_apply(step, frames, batch=2, depth=2))
    assert len(outs) == 5
    for f, o in zip(frames, outs):
        np.testing.assert_allclose(o, apply_shear3_np(plan, f), atol=2e-5)
