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
           rotation_angle) -> None:
    """The reference's parameter banner (Source.cpp:59-75), for CLI parity."""
    print("*" * 58)
    print(f"* {fn_name:<54} *")
    print("* Input parameters                                       *")
    print(f"* srcResolution : {src_resolution:>9.10g}, {src_resolution:>9.10g} [pixel/mm or dpi] *")
    print(f"* dstResolution : {dst_resolution:>9.10g}, {dst_resolution:>9.10g} [pixel/mm or dpi] *")
    print(f"* srcIsocenter  : {src_isocenter[0]:>9.10g}, {src_isocenter[1]:>9.10g} [pixels] *")
    print(f"* rotationAngle : {rotation_angle:>20.10g} [degrees] *")
    print("*" * 58)
