"""Record the LOCAL oracle environment: DuckDB version + the result of
every portability-sensitive construct the oracle corpus relies on.

Motivation (r6): `span_dedup` was value-identical to local DuckDB yet
hash-red at the driver — a local-green/driver-red divergence that was
undiagnosable from artifacts because nothing recorded which DuckDB
semantics each side assumed. Two instruments now close that hole:

  * this script commits the LOCAL side per round (ORACLE_ENV.json);
  * the `oracle_env_probe` driver query recomputes the same constructs on
    the DRIVER's DuckDB against pinned literals, so CORRECTNESS_r{N}.json
    carries a green/red verdict on semantic agreement every round.

The construct list and pinned values live in __spark_entry__.py
(_ENV_PROBE_EXPECTED + the oracle_env_probe oracle SQL) — this script
executes that same SQL so the two instruments can never drift apart.

Usage: python scripts/oracle_env_probe.py [--json ORACLE_ENV.json]
Exit 1 if any construct deviates from the pinned expectation.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod


def main() -> int:
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]

    con = duckdb.connect()
    sql = entrymod.oracle_sql()["oracle_env_probe"]
    got = dict(con.execute(sql).fetchall())
    expected = dict(entrymod._ENV_PROBE_EXPECTED)

    report = {
        "duckdb_version": duckdb.__version__,
        "python_version": sys.version.split()[0],
        "constructs": {},
        "deviations": {},
    }
    for name in sorted(expected):
        report["constructs"][name] = got.get(name)
        if got.get(name) != expected[name]:
            report["deviations"][name] = {
                "expected": expected[name], "got": got.get(name)}

    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")
    for name, v in report["deviations"].items():
        print(f"DEVIATION {name}: expected {v['expected']!r}, "
              f"got {v['got']!r}")
    ok = not report["deviations"]
    print(f"duckdb {duckdb.__version__}: "
          f"{len(expected) - len(report['deviations'])}/{len(expected)} "
          f"constructs match pinned expectations")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
