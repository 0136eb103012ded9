"""One-command verification of both runtime surfaces:

1. driver contract — fresh-process oracle sweep of EVERY registered
   query vs DuckDB at the given scale factor (delegates to
   tools/oracle_sweep.py, which since round 4 compares through the
   DRIVER'S pandas canonicalization — toPandas()/.df(), sort_values,
   dtype-sensitive cell formatting — so HUGEINT/Decimal/list-cell
   representation breaks fail HERE before a driver round sees them),
   plus an ``entry(spark)`` smoke check (runs, >=0 rows, stable
   schema);
2. bench CLI — stdout purity (exactly one line, valid JSON, required
   keys) at a small scale factor.

Run: python tools/verify.py [sf_dir]   (default /root/testdata/sf0.01)
Exit code 0 = both surfaces pass. This is the recipe in
.claude/skills/verify/SKILL.md, automated.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

ENTRY_SMOKE = """
from pyspark.sql import SparkSession
import __spark_entry__ as m
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = m.entry(spark)
n = df.count()
assert n >= 0 and df.columns, (n, df.columns)
print(f"entry: {n} rows, {len(df.columns)} cols")
"""


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    failures = []

    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "oracle_sweep.py"), sf],
        cwd=ROOT, capture_output=True, text=True,
    )
    print(r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "(no sweep output)")
    for line in r.stdout.splitlines():
        if line.startswith("FAIL"):
            print(line)
    if r.returncode != 0:
        failures.append("oracle sweep")

    r = subprocess.run(
        [sys.executable, "-c", ENTRY_SMOKE], cwd=ROOT,
        capture_output=True, text=True,
    )
    print(r.stdout.strip() or r.stderr.strip()[-400:])
    if r.returncode != 0:
        failures.append("entry smoke")

    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        cwd=ROOT, capture_output=True, text=True, env=env,
    )
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    try:
        assert len(lines) == 1, f"stdout has {len(lines)} lines, want 1"
        # the driver captures only a ~2 KB stdout tail: an oversized
        # final line truncates to unparseable JSON (this cost round 2
        # its bench headline), so length is part of the contract
        nbytes = len(lines[0].encode())
        assert nbytes < 1500, f"final line is {nbytes} bytes, want <1500"
        d = json.loads(lines[0])
        missing = {"metric", "value", "unit", "queries", "sf"} - set(d)
        assert not missing, f"missing keys {missing}"
        print(f"bench: 1 clean JSON line ({nbytes}B), "
              f"{len(d['queries'])} queries, {d['value']}s total")
    except (AssertionError, json.JSONDecodeError) as exc:
        print(f"bench FAIL: {exc}")
        failures.append("bench purity")

    if failures:
        print("VERIFY FAILED:", ", ".join(failures))
        return 1
    print("VERIFY OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
