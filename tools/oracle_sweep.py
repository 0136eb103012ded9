"""Fresh-process, driver-identical oracle sweep: run EVERY registered
query through __spark_entry__ and compare against its DuckDB oracle
the same way the external driver does (columns sorted by name, floats
canonicalized via repr, timestamps via isoformat, rows sorted).

Run: python tools/oracle_sweep.py [sf_dir]   (default /root/testdata/sf0.01)

This is deliberately NOT built on sentiflow_spark.oracle — that module
is code under test; this script re-implements the comparison so a bug
there cannot mask itself.
"""

from __future__ import annotations

import datetime
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), sorted(
        tuple(
            repr(float(r[i]))
            if isinstance(r[i], float)
            else r[i].isoformat()
            if isinstance(r[i], (datetime.datetime, datetime.date))
            else repr(r[i])
            for i in order
        )
        for r in rows
    )


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[32]")
        # the 1g pyspark default driver heap dies late in a 200-query
        # sweep (accumulated memory-sink tables + broadcasts); size it
        # like session.get_spark does
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    t0 = time.perf_counter()
    npass, fails = 0, []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf)
            sc, sr = canon(sdf.columns, [tuple(r) for r in sdf.collect()])
            if name in osql:
                rel = con.execute(osql[name])
                oc = [d[0] for d in rel.description]
                oc, orows = canon(oc, rel.fetchall())
                ok = sc == oc and sr == orows
            else:
                ok = True  # rows-only contract
        except Exception as exc:  # noqa: BLE001 - report, don't crash the sweep
            ok = False
            fails.append((name, str(exc)[:150]))
        if ok:
            npass += 1
        elif not fails or fails[-1][0] != name:
            fails.append((name, "value/schema mismatch"))
    print(f"{npass}/{len(qs)} pass at {sf} in {time.perf_counter() - t0:.0f} s")
    for f in fails:
        print("FAIL:", f)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
