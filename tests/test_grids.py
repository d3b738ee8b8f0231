"""GridSpec derivation tests (reference parity of Source.cpp:135-200)."""

import math

import pytest

from aainterp.grids import GridSpec, ValidationError, make_grid_spec


def test_scale_factor():
    # scale = uint(dstRes/srcRes*sqrt(2) + 1 + eps)  (Source.cpp:139)
    assert make_grid_spec((8, 8), 150.0, 25.4, (0, 0), 0.0).scale == 1
    assert make_grid_spec((8, 8), 1.0, 1.0, (0, 0), 0.0).scale == 2
    assert make_grid_spec((8, 8), 25.4, 72.0, (0, 0), 0.0).scale == 5
    assert make_grid_spec((8, 8), 1.0, 4.0, (0, 0), 0.0).scale == 6


def test_quadrant_and_residual():
    for ang, quad, resid in [
        (0.0, 0, 0.0), (45.0, 0, 45.0), (90.0, 1, 0.0), (135.0, 1, 45.0),
        (180.0, 2, 0.0), (271.5, 3, 1.5), (-30.0, 3, 60.0), (360.0, 0, 0.0),
        (725.0, 0, 5.0),
    ]:
        spec = make_grid_spec((8, 8), 2.0, 1.0, (0, 0), ang)
        assert spec.quadrant == quad, ang
        assert spec.residual_angle == pytest.approx(resid, abs=1e-12), ang


def test_mod_shape_swaps_on_odd_quadrant():
    spec = make_grid_spec((6, 10), 1.0, 1.0, (0, 0), 100.0)
    assert spec.scale == 2
    assert spec.qrot_shape == (10, 6)
    assert spec.mod_shape == (20, 12)


def test_dst_shape_axis_aligned():
    # dst = round(src * dstRes/srcRes) at angle 0 (Source.cpp:179-180)
    spec = make_grid_spec((910, 910), 150.0, 25.4, (455, 455), 0.0)
    assert spec.dst_shape == (154, 154)
    assert spec.dst_side == pytest.approx(150.0 / 25.4)


def test_dst_shape_rotated_bounding_box():
    spec = make_grid_spec((24, 24), 1.0, 0.5, (11.5, 12.5), 30.0)
    # round(24*(cos30+sin30)*0.5) = round(16.39) = 16
    assert spec.dst_shape == (16, 16)


def test_isocenter_split_and_offset():
    spec = make_grid_spec((24, 24), 1.0, 0.5, (11.5, 12.5), 30.0)
    fx, fy = spec.iso_offset
    ix, iy = spec.dst_isocenter
    assert 0.0 <= fx < 1.0 and 0.0 <= fy < 1.0
    # forward-rotated isocenter = int + frac recomposition (Source.cpp:181-186)
    icx, icy = spec.mod_isocenter
    c, s = spec.cos, spec.sin
    modH = spec.mod_shape[0]
    raw_x = (icx * c + (modH - icy) * s) * spec.expansion_ratio
    raw_y = (icx * s + icy * c) * spec.expansion_ratio
    assert ix + fx == pytest.approx(raw_x)
    assert iy + fy == pytest.approx(raw_y)
    # corner-min offset is <= 0 (min over rotated corners, seeded with 0)
    assert spec.offset[0] <= 0 and spec.offset[1] <= 0


def test_offset_zero_at_axis_aligned():
    spec = make_grid_spec((24, 24), 2.0, 1.0, (4.0, 4.0), 0.0)
    assert spec.offset == (0.0, 0.0)
    assert spec.is_axis_aligned


def test_linear_map_matches_reference_formula():
    spec = make_grid_spec((24, 24), 1.0, 0.5, (11.5, 12.5), 30.0)
    L = spec.dst_side
    icx, icy = spec.mod_isocenter
    fx, fy = spec.iso_offset
    ox, oy = spec.offset
    c, s = spec.cos, spec.sin
    for dx, dy in [(0, 0), (3, 7), (15, 2)]:
        # verbatim Source.cpp:212-219
        ref_x = ((dx + fx) * L - icx + ox) * c + ((dy + fy) * L - icy + oy) * s + icx
        ref_y = -((dx + fx) * L - icx + ox) * s + ((dy + fy) * L - icy + oy) * c + icy
        got = spec.dst_center(dx, dy)
        assert got[0] == pytest.approx(ref_x, abs=1e-12)
        assert got[1] == pytest.approx(ref_y, abs=1e-12)


def test_validation_errors_match_reference_messages():
    # Source.cpp:111-132
    with pytest.raises(ValidationError, match="Assumed X & Y resolution"):
        from aainterp.grids import validate_args
        validate_args((4, 4), (1.0, 2.0), (1.0, 1.0))
    with pytest.raises(ValidationError, match="0 or negative resolution"):
        make_grid_spec((4, 4), -1.0, 1.0, (0, 0), 0.0)
    with pytest.raises(ValidationError, match="no data in src array"):
        make_grid_spec((0, 4), 1.0, 1.0, (0, 0), 0.0)
    with pytest.raises(ValidationError, match="second dimension"):
        make_grid_spec((4, 0), 1.0, 1.0, (0, 0), 0.0)
