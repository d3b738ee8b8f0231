"""Smoke tests for the bench measurement harness (bench.py::timed_scan).

The harness is driver-critical (the round-end number comes from it) and
carries subtle anti-DCE/anti-hoisting machinery (see BENCHMARKS.md
methodology); these tests pin its contract on CPU with tiny shapes —
positive finite timings, both checksum modes, consts threading, and the
repeat-count guard rails.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _harness():
    import bench
    return bench


def test_timed_scan_smoke_scalar_checksum():
    bench = _harness()
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 1, (3, 2, 8, 128)), jnp.float32)
    warm = jnp.asarray(rng.uniform(0, 1, (3, 2, 8, 128)), jnp.float32)
    dt = bench.timed_scan(jax.jit(lambda x: x * 2.0), frames, warm,
                          target_s=0.01)
    assert 0.0 < dt < 10.0


def test_timed_scan_barrier_checksum_and_consts():
    bench = _harness()
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.uniform(0, 1, (2, 1, 8, 128)), jnp.float32)
    warm = jnp.asarray(rng.uniform(0, 1, (2, 1, 8, 128)), jnp.float32)
    scale = jnp.float32(3.0)
    dt = bench.timed_scan(lambda x, s: x * s, frames, warm,
                          consts=(scale,), target_s=0.01,
                          checksum="barrier")
    assert 0.0 < dt < 10.0


def test_timed_scan_respects_max_k():
    bench = _harness()
    rng = np.random.default_rng(2)
    frames = jnp.asarray(rng.uniform(0, 1, (12, 1, 8, 128)), jnp.float32)
    warm = jnp.asarray(rng.uniform(0, 1, (12, 1, 8, 128)), jnp.float32)
    dt = bench.timed_scan(jax.jit(lambda x: x + 1.0), frames, warm,
                          target_s=0.01, max_k=2)
    assert 0.0 < dt < 10.0
