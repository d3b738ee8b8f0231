"""Structured logging, timing, and profiler hooks (SURVEY.md §5).

The reference's observability is cout banners + a wall-clock timer
(Source.cpp:59-75, 1559-1581).  Here: structured JSON records with
device-honest timing (block_until_ready) and jax.profiler trace capture for
TPU timeline inspection.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from typing import Any, Dict, Optional

logger = logging.getLogger("aainterp")


def log_record(event: str, **fields: Any) -> Dict[str, Any]:
    rec = {"event": event, **fields}
    logger.info(json.dumps(rec, default=str))
    return rec


@contextlib.contextmanager
def device_timer(label: str, result_holder: Optional[dict] = None):
    """Wall-clock timer that prints the reference's timing line format
    (Source.cpp:1581).  Call .block_until_ready() on outputs inside."""
    t0 = time.perf_counter()
    yield
    ms = (time.perf_counter() - t0) * 1000.0
    log_record("timing", label=label, ms=ms)
    print(f"Calculation time : {ms:g} [ms]")
    if result_holder is not None:
        result_holder[label] = ms


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/aainterp_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def banner(fn_name: str, src_resolution, dst_resolution, src_isocenter,
           rotation_angle) -> str:
    """The reference's parameter banner, reproduced byte-for-byte.

    The reference prints this from each driver (Source.cpp:59-75 exact,
    588-604 fast): a 58-char box, values at ``setprecision(10)`` (~ %.10g)
    with ``setw(9)`` fields, unit labels right-justified by ``setw(20)``.
    Returns the banner string (callers print it)."""
    def g(v):
        return f"{float(v):.10g}"

    dpi = " [pixel/mm or dpi] *"
    lines = [
        "*" * 58,
        f"* {fn_name}".ljust(57) + "*",
        "* Input parameters".ljust(57) + "*",
        "*".ljust(57) + "*",
        f"* srcResolution : {g(src_resolution):>9}, {g(src_resolution):>9}"
        + dpi.rjust(20),
        f"* dstResolution : {g(dst_resolution):>9}, {g(dst_resolution):>9}"
        + dpi.rjust(20),
        f"* srcIsocenter  : {g(src_isocenter[0]):>9}, {g(src_isocenter[1]):>9}"
        + " [pixels] *".rjust(20),
        f"* rotationAngle : {g(rotation_angle):>20}" + " [degrees] *".rjust(20),
        "*" * 58,
    ]
    return "\n".join(lines)
