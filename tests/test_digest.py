"""Memoized table digests (VERDICT r4 weak 1): repeated applies must
not re-hash the big operator tables."""

import numpy as np
import pytest

import aainterp as aa
from aainterp.utils import digest


def test_array_digest_memoizes_and_guards_identity():
    a = np.arange(1000, dtype=np.float64)
    s0 = digest.digest_stats()
    d1 = digest.array_digest(a)
    d2 = digest.array_digest(a)
    s1 = digest.digest_stats()
    assert d1 == d2
    assert s1["hashed"] == s0["hashed"] + 1     # hashed exactly once
    assert s1["memo_hits"] >= s0["memo_hits"] + 1
    # equal content, different object: digests agree (content key), and
    # the new object is hashed once
    b = a.copy()
    assert digest.array_digest(b) == d1
    assert digest.digest_stats()["hashed"] == s1["hashed"] + 1


def test_no_rehash_on_repeated_apply(monkeypatch):
    """The serving loop pattern: one operator, many apply calls — the
    content-keyed caches must hash each table object at most once."""
    spec = aa.make_grid_spec((64, 64), 1.0, 0.5, (32.0, 32.0), 20.0)
    op = aa.build_operator(spec)              # ELL operator
    src = np.random.default_rng(0).uniform(0, 1, (64, 64)).astype(
        np.float32)
    aa.apply_operator(op, src)                # first call: may hash
    before = digest.digest_stats()["hashed"]
    for _ in range(3):
        aa.apply_operator(op, src)
    assert digest.digest_stats()["hashed"] == before

    # separable path too
    spec2 = aa.make_grid_spec((64, 64), 2.0, 1.0, (0.0, 0.0), 0.0)
    op2 = aa.build_operator(spec2)
    aa.apply_operator(op2, src)
    before = digest.digest_stats()["hashed"]
    for _ in range(3):
        aa.apply_operator(op2, src)
    assert digest.digest_stats()["hashed"] == before


def test_digest_entry_released_on_gc():
    import gc

    a = np.arange(4096, dtype=np.float64)
    digest.array_digest(a)
    k = id(a)
    assert k in digest._MEMO
    del a
    gc.collect()
    assert k not in digest._MEMO
