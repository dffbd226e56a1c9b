"""Solo adjudication for packed-bench outliers (VERDICT r7 item 6).

Packed bench runs (the driver's 197-query BENCH_r{N}.json session) read
individual queries 2-4x slower than an idle solo session from cache
pressure and JVM scheduling — a documented noise class, re-adjudicated
by hand every round until now. This script makes the adjudication a
recorded artifact:

  python scripts/bench_solo.py BENCH_r8_rehearsal.json BENCH_SOLO_r8.json
  python scripts/bench_solo.py --queries a,b,c BENCH_SOLO_r8.json

Mode 1 reads a packed bench JSON, compares every query against the
BASELINE.md gate table (parsed from the repo root), and re-runs each
query whose packed reading exceeds ``--threshold`` (default 1.5x) SOLO:
one fresh ``bench.py`` process per query (SPARK_GRAFT_BENCH_ONLY)
with ``--reps`` (default 3) repetitions, min reported. Mode 2 skips the
packed comparison and solo-runs the named queries directly.

Output JSON: {"sf": ..., "threshold": ..., "queries": {name: {
"packed": s|null, "baseline": s, "solo_min3": s, "ratio_solo": r}}} —
committed alongside BENCH_r{N}.json so the judge can diff the gate
without re-measuring.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_baseline() -> dict[str, float]:
    """Parse the newest per-query gate table from BASELINE.md (2-column
    `| query | sec | query | sec |` rows; later tables override earlier
    ones so re-snapshots win)."""
    out: dict[str, float] = {}
    with open(os.path.join(REPO, "BASELINE.md")) as f:
        for line in f:
            m = re.match(r"^\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|"
                         r"(?:\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|)?", line)
            if m:
                out[m.group(1)] = float(m.group(2))
                if m.group(3):
                    out[m.group(3)] = float(m.group(4))
    return out


def solo_run(name: str, reps: int) -> float | None:
    env = dict(os.environ,
               SPARK_GRAFT_BENCH_ONLY=name,
               SPARK_GRAFT_BENCH_REPS=str(reps))
    p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, env=env)
    for line in p.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)["queries"].get(name)
    sys.stderr.write(f"solo bench of {name} produced no JSON:\n"
                     f"{p.stderr[-2000:]}\n")
    return None


def main() -> None:
    args = sys.argv[1:]
    threshold, reps, only = 1.5, 3, None
    if "--threshold" in args:
        i = args.index("--threshold")
        threshold = float(args[i + 1])
        args = args[:i] + args[i + 2:]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    if "--queries" in args:
        i = args.index("--queries")
        only = args[i + 1].split(",")
        args = args[:i] + args[i + 2:]
    if only is None:
        packed_path, out_path = args
        packed = json.load(open(packed_path))["queries"]
    else:
        (out_path,) = args
        packed = {}

    base = load_baseline()
    if only is None:
        only = sorted(
            n for n, s in packed.items()
            if s is not None and n in base and s > threshold * base[n])
        print(f"{len(only)} queries above {threshold}x packed: {only}")

    results = {}
    for n in only:
        solo = solo_run(n, reps)
        b = base.get(n)
        results[n] = {
            "packed": packed.get(n),
            "baseline": b,
            "solo_min3": solo,
            "ratio_solo": (round(solo / b, 3)
                           if solo is not None and b else None),
        }
        print(f"{n:28s} packed={packed.get(n)} baseline={b} "
              f"solo_min{reps}={solo}")
    with open(out_path, "w") as f:
        json.dump({"sf": os.environ.get("SPARK_GRAFT_SF_DIR",
                                        "/root/testdata/sf0.1"),
                   "threshold": threshold, "reps": reps,
                   "queries": results}, f, indent=1, sort_keys=True)
    print(f"wrote {out_path} ({len(results)} adjudications)")


if __name__ == "__main__":
    main()
