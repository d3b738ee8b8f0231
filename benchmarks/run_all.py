"""Run every BASELINE config benchmark and collect one JSON line each.

Thin driver over the repo-root ``bench.py`` (which the round driver runs
with no arguments for the flagship config).  Usage:

    python benchmarks/run_all.py [--out benchmarks/results.jsonl]

Each case prints its own honest calibrated-scan JSON line (see
BENCHMARKS.md "Measurement methodology"); this script just sequences them
on the one real chip and stores the lines.  Expect several minutes: the
rot30 case builds its operator + kernel plan host-side (~40 s at 2048^2)
and first-time kernel compiles go through this box's remote tunnel.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (name, --case value, extra argv); names are unique for --cases filters
CASES = [
    ("resize4k", "resize4k", []),    # config 4: flagship 4K->1080p bf16
    ("rgb1024", "rgb1024", []),      # config 2: RGB arbitrary-ratio resize
    ("rot30", "rot30", []),          # config 3: 2048^2 rotation 30 deg
    ("rot30_shear", "rot30", ["--impl", "shear"]),  # mode='shear', both
                                     # decompositions (round 5)
    ("regrid", "regrid", []),        # config 5: conservative lat-lon regrid
    ("sharded", "sharded", []),      # multi-chip 1-D mesh (1x1 here)
    ("sharded2d", "sharded2d", []),  # multi-chip 2-D rows x cols mesh
    ("compose", "compose", []),      # fused 2-stage pipeline vs chained
    ("stream", "stream", ["--dtype", "uint8"]),  # host->host serving loop
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results.jsonl"))
    ap.add_argument("--cases", nargs="*", default=[c for c, _, _ in CASES])
    args = ap.parse_args(argv)

    lines = []
    for name, case, extra in CASES:
        if name not in args.cases:
            continue
        cmd = [sys.executable, os.path.join(REPO, "bench.py")]
        if case != "resize4k":
            cmd += ["--case", case]
        cmd += extra
        print(f"# running {name}: {' '.join(cmd)}", flush=True)
        proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        for ln in proc.stdout.splitlines():
            print(ln, flush=True)
            if ln.startswith("{"):
                rec = json.loads(ln)
                rec["case"] = name
                lines.append(rec)
        if proc.returncode != 0:
            print(f"# {name} FAILED rc={proc.returncode}\n{proc.stderr[-2000:]}")
    with open(args.out, "w") as f:
        for rec in lines:
            f.write(json.dumps(rec) + "\n")
    print(f"# wrote {len(lines)} records to {args.out}")
    return 0 if len(lines) == len(args.cases) else 1


if __name__ == "__main__":
    sys.exit(main())
