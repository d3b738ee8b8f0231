"""Fuzz the box/stencil detections: on ANY random axis-aligned geometry,
a detected fast path must match the banded apply; detection may reject
freely, but must never mislabel.

These paths route automatically (box off the Pallas route in
apply_operator auto mode), so a false positive would silently corrupt
results — the invariant is worth fuzzing, not just spot-checking.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from aainterp.api import apply_operator, build_operator
from aainterp.grids import make_grid_spec
from aainterp.ops import apply as apply_ops

CASES = []
_rng = np.random.default_rng(20260817)
for _ in range(24):
    H = int(_rng.integers(3, 13)) * 8
    W = int(_rng.integers(3, 13)) * 8
    kind = _rng.integers(0, 3)
    if kind == 0:  # integer ratio
        m = int(_rng.integers(1, 5))
        sr, dr = float(m), 1.0
        if _rng.random() < 0.5:
            # edge-aligned isocenter: the box-detection positive case
            iso = ((m - 1) / 2.0, (m - 1) / 2.0)
        elif _rng.random() < 0.5:
            # iso=(0,0): the flagship stencil-positive case
            iso = (0.0, 0.0)
        else:
            iso = (float(_rng.uniform(-2, H + 2)),
                   float(_rng.uniform(-2, W + 2)))
    elif kind == 1:  # arbitrary ratio
        sr = float(_rng.uniform(1.0, 6.0))
        dr = 1.0
        iso = (float(_rng.uniform(-2, H + 2)),
               float(_rng.uniform(-2, W + 2)))
    else:  # classic dpi-style pair
        sr = float(_rng.choice([72.0, 96.0, 150.0, 300.0]))
        dr = float(_rng.choice([25.4, 60.0, 72.0, 150.0]))
        iso = (float(_rng.uniform(-2, H + 2)),
               float(_rng.uniform(-2, W + 2)))
    quad = int(_rng.integers(0, 4)) * 90
    CASES.append((H, W, sr, dr, iso, quad))


@pytest.mark.parametrize("H,W,sr,dr,iso,quad", CASES)
def test_detected_paths_match_banded(H, W, sr, dr, iso, quad):
    try:
        spec = make_grid_spec((H, W), sr, dr, iso, float(quad))
        op = build_operator(spec, mode="exact")
    except Exception:
        pytest.skip("geometry rejected upstream")
    if min(spec.dst_shape) < 1:
        pytest.skip("degenerate dst")
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    ref = np.asarray(apply_operator(op, src, impl="xla"))

    qH, qW = spec.qrot_shape
    box = apply_ops.uniform_box_params(
        op.wy.start, op.wy.weights, op.wx.start, op.wx.weights, qH, qW)
    if box is not None:
        got = np.asarray(apply_operator(op, src, impl="box"))
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5,
                                   err_msg=f"box {box} mislabeled")

    py = apply_ops.axis_stencil_plan(op.wy.start, op.wy.weights, qH)
    px = apply_ops.axis_stencil_plan(op.wx.start, op.wx.weights, qW)
    if py is not None and px is not None:
        got = np.asarray(apply_operator(op, src, impl="stencil"))
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5,
                                   err_msg="stencil plan mislabeled")


def test_fuzz_actually_detects_some():
    """The fuzz above is vacuous unless detections occur; pin the counts."""
    nbox = nsten = 0
    for H, W, sr, dr, iso, quad in CASES:
        try:
            spec = make_grid_spec((H, W), sr, dr, iso, float(quad))
            op = build_operator(spec, mode="exact")
        except Exception:
            continue
        qH, qW = spec.qrot_shape
        if apply_ops.uniform_box_params(op.wy.start, op.wy.weights,
                                        op.wx.start, op.wx.weights, qH, qW):
            nbox += 1
        py = apply_ops.axis_stencil_plan(op.wy.start, op.wy.weights, qH)
        px = apply_ops.axis_stencil_plan(op.wx.start, op.wx.weights, qW)
        if py is not None and px is not None:
            nsten += 1
    assert nbox >= 2 and nsten >= 3, (nbox, nsten)
