"""Native C++ engine tests: third-implementation cross-checks."""

import numpy as np
import pytest

import aainterp as aa
from aainterp import native
from aainterp.ops.weights import ell_weights

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_native_ell_matches_numpy_exact():
    spec = aa.make_grid_spec((16, 16), 1.0, 0.5, (7.5, 8.5), 30.0)
    base_n, w_n, sums_n = native.ell_weights_native(spec, mode="exact")
    base_p, w_p, sums_p = ell_weights(spec, mode="exact")
    np.testing.assert_array_equal(base_n, np.asarray(base_p))
    np.testing.assert_allclose(w_n, np.asarray(w_p), atol=1e-13)
    np.testing.assert_allclose(sums_n, np.asarray(sums_p), atol=1e-12)


def test_native_ell_matches_numpy_fast():
    spec = aa.make_grid_spec((16, 16), 1.0, 1.0, (7.5, 8.5), 30.0)
    base_n, w_n, _ = native.ell_weights_native(spec, mode="fast")
    base_p, w_p, _ = ell_weights(spec, mode="fast")
    np.testing.assert_array_equal(base_n, np.asarray(base_p))
    np.testing.assert_allclose(w_n, np.asarray(w_p), atol=1e-12)


def test_native_ell_scale_and_quadrant():
    spec = aa.make_grid_spec((12, 10), 25.4, 72.0, (5.0, 6.0), 100.0)
    base_n, w_n, _ = native.ell_weights_native(spec, mode="exact")
    base_p, w_p, _ = ell_weights(spec, mode="exact")
    np.testing.assert_array_equal(base_n, np.asarray(base_p))
    np.testing.assert_allclose(w_n, np.asarray(w_p), atol=1e-12)


def test_native_multithreaded_deterministic():
    spec = aa.make_grid_spec((32, 32), 1.0, 0.5, (15.5, 16.5), 17.0)
    _, w1, _ = native.ell_weights_native(spec, n_threads=1)
    _, w4, _ = native.ell_weights_native(spec, n_threads=4)
    np.testing.assert_array_equal(w1, w4)


def test_native_csv_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(-5, 5, (13, 7))
    p = str(tmp_path / "x.csv")
    native.csv_write_native(p, img)
    back = native.csv_read_native(p)
    np.testing.assert_allclose(back, img, atol=0)
    # interoperable with the Python CSV layer
    from aainterp.utils import io as iom
    np.testing.assert_allclose(iom.csv_read(p), img, atol=0)


def test_native_csv_skips_bad_tokens(tmp_path):
    p = str(tmp_path / "bad.csv")
    with open(p, "w") as f:
        f.write("1.0,abc,2.0\n3.0,4.0,5.0\n")
    img = native.csv_read_native(p)
    np.testing.assert_allclose(img, [[1.0, 2.0, 0.0], [3.0, 4.0, 5.0]])


def test_compat_areas_bitexact_vs_numpy():
    """The C++ compat state machine (aai_compat_cell_areas) must agree BIT
    FOR BIT with the numpy replica at rotated geometries — DBL_EPSILON
    tangency classifications leave no tolerance budget (the build uses
    -ffp-contract=off so doubles match expression-for-expression)."""
    from aainterp.ops.compat import compat_ell_weights

    for H, W, ang in ((96, 96, 30.0), (64, 80, 17.3), (72, 64, 93.5)):
        spec = aa.make_grid_spec((H, W), 1.0, 0.5, (W / 2.0, H / 2.0), ang)
        b1, w1, s1 = compat_ell_weights(spec, prefer_native=False)
        b2, w2, s2 = compat_ell_weights(spec, prefer_native=True)
        np.testing.assert_array_equal(b1, b2)
        np.testing.assert_array_equal(w1, w2)
        np.testing.assert_array_equal(s1, s2)
