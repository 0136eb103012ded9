"""Focused oracle parity check: run NAMED registered queries vs their
DuckDB oracles with the sweep's exact comparison — for iterating on a
single query without paying the 207-query sweep.

Run: python tools/oracle_one.py SF_DIR NAME [NAME ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_sweep import TABLES, canon  # noqa: E402


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
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    rc = 0
    for name in names:
        t0 = time.perf_counter()
        sdf = qs[name](spark, sf)
        sc, sr = canon(sdf.columns, [tuple(r) for r in sdf.collect()])
        t_spark = time.perf_counter() - t0
        if name not in osql:
            print(f"{name}: {len(sr)} rows in {t_spark:.2f}s (rows-only, no oracle)")
            continue
        t0 = time.perf_counter()
        rel = con.execute(osql[name])
        oc = [d[0] for d in rel.description]
        oc, orows = canon(oc, rel.fetchall())
        t_duck = time.perf_counter() - t0
        if sc == oc and sr == orows:
            print(f"PASS {name}: {len(sr)} rows (spark {t_spark:.2f}s, duck {t_duck:.2f}s)")
        else:
            rc = 1
            print(f"FAIL {name}: spark {len(sr)}x{sc} vs duck {len(orows)}x{oc}")
            for s, o in list(zip(sr, orows))[:5]:
                if s != o:
                    print("  spark:", s)
                    print("  duck :", o)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
