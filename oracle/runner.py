"""C++ oracle harness.

Compiles the *unmodified* reference implementation (read directly from
/root/reference/Source.cpp — never vendored into this repo) with its
hard-coded user parameters (Source.cpp:1528-1534) rewritten for the desired
config, runs it on a CSV image, and returns the reference's output image and
dst isocenter.  This provides bit-level ground truth for parity tests
(SURVEY.md §4: the reference has no tests; the C++ file itself is the
oracle).

All build artifacts live under /tmp; the repo never contains reference code.
"""

from __future__ import annotations

import hashlib
import os
import re
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

REFERENCE_SOURCE = os.environ.get(
    "AAINTERP_REFERENCE_SOURCE", "/root/reference/Source.cpp"
)
BUILD_ROOT = os.path.join(tempfile.gettempdir(), "aainterp_oracle")


def oracle_available() -> bool:
    return os.path.exists(REFERENCE_SOURCE)


def _patched_source(
    src_resolution: float,
    dst_resolution: float,
    src_isocenter: Tuple[float, float],
    rotation_angle: float,
    mode: int,
) -> str:
    with open(REFERENCE_SOURCE, "r", encoding="utf-8", errors="replace") as f:
        text = f.read()
    subs = [
        (r'string inputPath = "[^"]*";',
         'string inputPath = "input.csv";'),
        (r"srcResolution = make_pair\([^)]*\);",
         f"srcResolution = make_pair({src_resolution!r}, {src_resolution!r});"),
        (r"dstResolution = make_pair\([^)]*\);",
         f"dstResolution = make_pair({dst_resolution!r}, {dst_resolution!r});"),
        (r"srcIsocenter = make_pair\([^)]*\);",
         f"srcIsocenter = make_pair({src_isocenter[0]!r}, {src_isocenter[1]!r});"),
        (r"rotationAngle = [^;]*;",
         f"rotationAngle = {rotation_angle!r};"),
        (r"interpolationMode = \d+;",
         f"interpolationMode = {int(mode)};"),
    ]
    for pat, rep in subs:
        text, n = re.subn(pat, rep, text, count=1)
        assert n == 1, f"oracle patch failed: {pat}"
    # print the dst isocenter so tests can check it (appended to main's exit)
    text = text.replace(
        'cout << "Run terminated correctly." << endl;',
        'cout << "DSTISO " << setprecision(17) << dstIsocenter.first << " " '
        '<< dstIsocenter.second << endl;\n\t'
        'cout << "Run terminated correctly." << endl;',
    )
    return text


def _binary_for(config_key: str, source_text: str) -> str:
    os.makedirs(BUILD_ROOT, exist_ok=True)
    exe = os.path.join(BUILD_ROOT, f"oracle_{config_key}")
    if os.path.exists(exe):
        return exe
    cpp = exe + ".cpp"
    with open(cpp, "w") as f:
        f.write(source_text)
    subprocess.run(
        ["g++", "-O2", "-std=c++11", "-o", exe, cpp],
        check=True, capture_output=True,
    )
    return exe


def run_oracle_full(
    src: np.ndarray,
    src_resolution: float,
    dst_resolution: float,
    src_isocenter: Tuple[float, float],
    rotation_angle: float,
    mode: int = 1,
    timeout: float = 600.0,
):
    """Run the C++ reference; returns (dst, dst_iso, stdout, csv_text).

    stdout contains the injected "DSTISO ..." line in addition to the real
    reference's output (banner / timing / termination message); csv_text is
    the raw bytes of the reference's output CSV (6-significant-digit stream
    precision, Source.cpp:1508).
    """
    source_text = _patched_source(
        src_resolution, dst_resolution, src_isocenter, rotation_angle, mode
    )
    key = hashlib.sha256(source_text.encode()).hexdigest()[:16]
    exe = _binary_for(key, source_text)

    with tempfile.TemporaryDirectory(dir=BUILD_ROOT) as tmpdir:
        in_csv = os.path.join(tmpdir, "input.csv")
        np.savetxt(in_csv, np.asarray(src, dtype=np.float64),
                   delimiter=",", fmt="%.17g")
        proc = subprocess.run(
            [exe], cwd=tmpdir, capture_output=True, text=True, timeout=timeout
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"oracle failed rc={proc.returncode}:\n{proc.stdout}\n{proc.stderr}"
            )
        out_csv = os.path.join(tmpdir, "input_mod.csv")
        dst = np.loadtxt(out_csv, delimiter=",", ndmin=2)
        with open(out_csv, "r") as f:
            csv_text = f.read()
        m = re.search(r"DSTISO (\S+) (\S+)", proc.stdout)
        dst_iso = (float(m.group(1)), float(m.group(2))) if m else (None, None)
    return dst, dst_iso, proc.stdout, csv_text


def run_oracle(
    src: np.ndarray,
    src_resolution: float,
    dst_resolution: float,
    src_isocenter: Tuple[float, float],
    rotation_angle: float,
    mode: int = 1,
    timeout: float = 600.0,
) -> Tuple[np.ndarray, Tuple[float, float]]:
    """Run the C++ reference; returns (dst image, dst isocenter (x, y)).

    Note: the oracle's CSV output uses C++ default stream precision
    (6 significant digits, Source.cpp:1508) — comparisons must allow
    ~1e-6 relative quantisation on top of algorithmic tolerance.
    """
    dst, dst_iso, _, _ = run_oracle_full(
        src, src_resolution, dst_resolution, src_isocenter, rotation_angle,
        mode, timeout,
    )
    return dst, dst_iso
