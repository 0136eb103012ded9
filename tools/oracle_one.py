"""Focused oracle parity check: run NAMED registered queries vs their
DuckDB oracles with the sweep's exact driver-identical pandas
comparison — for iterating on a single query without paying the
full-registry sweep.

Run: python tools/oracle_one.py SF_DIR NAME [NAME ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_canon import TABLES, check_one, use_big_oracles  # noqa: E402


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    sf, names = sys.argv[1], sys.argv[2:]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = entry.queries(), entry.oracle_sql()
    # match the sweep's behavior at big scale: swap in the cheap
    # mirrored-blocking oracle variants so iterating on e.g.
    # dd_edit_prefix_pairs at sf0.1 doesn't pay the ~175 s brute-force
    # proof oracle every run
    if getattr(entry, "oracle_sql_big", None) and use_big_oracles(sf):
        osql = {**osql, **entry.oracle_sql_big()}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    rc = 0
    for name in names:
        t0 = time.perf_counter()
        ok, detail = check_one(name, qs[name], osql.get(name), spark, con, sf)
        dt = time.perf_counter() - t0
        if ok:
            print(f"PASS {name}: {detail} ({dt:.2f}s)")
        else:
            rc = 1
            print(f"FAIL {name}: {detail} ({dt:.2f}s)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
