"""Pins the sharded applies' collective structure (docs/SCALING.md).

The framework's entire collective vocabulary is (a) neighbour
collective-permute halos and (b) the 16-byte psum flux pair.  Anything
else appearing in the compiled HLO — an all-gather of the source, a
source-sized rot90 all-to-all, a reduce-scatter — is a scaling
regression and fails here.
"""

import numpy as np
import pytest

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from benchmarks.ici_traffic import build_cases, collective_bytes  # noqa: E402


@pytest.fixture(scope="module")
def cases():
    return build_cases(small=True)


def test_collective_vocabulary(cases):
    for name, hlo, px, gpix, axes in cases:
        colls = collective_bytes(hlo)
        extra = set(colls) - {"collective-permute", "all-reduce"}
        assert not extra, (name, extra)


def test_halo_payloads_below_block_size(cases):
    """Every ppermute moves strictly less than one per-chip source
    block (neighbour halos, never a gather of the field)."""
    blocks = {
        "separable_1d_2x4": (256 // 4) * 512 * 4,
        "separable_2d_2x2x2": (256 // 2) * (512 // 2) * 4,
        "separable_1d_conserve": (256 // 4) * 512 * 4,
        "regrid_1d_2x4": (180 // 4) * 360 * 4,
    }
    for name, hlo, px, gpix, axes in cases:
        colls = collective_bytes(hlo)
        bound = blocks.get(name)
        if bound is None:  # rotated: bound = the full per-chip source
            bound = px * 4 * 3  # halo may span multiple hops of blocks
        for b, shp in colls.get("collective-permute", ()):
            assert b <= bound, (name, b, shp, bound)


def test_conserve_adds_only_scalar_allreduce(cases):
    by_name = {c[0]: c for c in cases}
    name, hlo, *_ = by_name["separable_1d_conserve"]
    colls = collective_bytes(hlo)
    ars = colls.get("all-reduce", [])
    assert ars, "conserve=True must emit the psum flux pair"
    assert all(b <= 16 for b, _ in ars), ars

    # and the non-conserve separable has NO all-reduce at all
    _, hlo0, *_ = by_name["separable_1d_2x4"]
    assert "all-reduce" not in collective_bytes(hlo0)
