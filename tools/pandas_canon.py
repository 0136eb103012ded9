"""Driver-identical pandas canonicalization preflight.

The external driver compares Spark vs DuckDB through *pandas*
(``spark_df.toPandas()`` vs ``duckdb_rel.df()``), sorts columns by
name, ``sort_values`` over all columns, then hashes the cell values
dtype-sensitively.  That path has failure modes the tuple-based local
sweep (tools/oracle_sweep.py) can never see — round 3 shipped 5 red
driver rows that were value-identical under ``.collect()``:

1. DuckDB ``SUM(int)`` returns HUGEINT, which ``.df()`` coerces to
   float64 → driver hashes ``0.0`` against Spark's ``0``.
2. list/map-typed cells crash pandas ``sort_values``
   ("unhashable type: 'list'").
3. Spark DECIMAL outputs survive as ``Decimal`` objects in an
   object-dtype column while the oracle emits float64.

This script re-implements the driver-style comparison so those classes
are caught locally BEFORE a driver round.  A query passes only if:

- both sides ``sort_values`` cleanly (no unhashable cells),
- per-column dtype KINDS match (int vs int, float vs float, ...),
- the dtype-sensitive per-cell formatting is identical row-for-row.

Run:  python tools/pandas_canon.py [sf_dir] [--names a,b,c | --first N]
Default sf_dir /root/testdata/sf0.001 (cheap; the class of bug is
scale-independent).  Exit 0 = all checked queries driver-canon-safe.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _fmt_cell(v, kind: str) -> str:
    """Dtype-sensitive cell formatting mirroring a pandas value hash:
    int64 0 and float64 0.0 must format DIFFERENTLY (the driver's
    HUGEINT class), and exotic objects (Decimal, list) must be loud."""
    import pandas as pd

    if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
        return "<null>"
    try:
        if pd.isna(v):  # scalar NA (numpy nan, pd.NA)
            return "<null>"
    except (TypeError, ValueError):
        pass  # arrays/lists: not NA, fall through to repr
    if kind == "f":
        return repr(float(v))
    if kind in ("i", "u"):
        return repr(int(v))
    if kind == "b":
        return repr(bool(v))
    if kind == "M":
        return v.isoformat()
    # object dtype: keep the python type visible so Decimal('1') vs
    # 1.0 vs 1 vs '1' all differ, exactly as a pandas hash would.
    return f"{type(v).__name__}:{v!r}"


def use_big_oracles(sf_dir: str) -> bool:
    """True when the data directory is LARGE enough that the cheap
    mirrored-blocking oracle variants (``oracle_sql_big``) should
    replace the deliberately brute-force proof oracles.

    Decided from the DATA (parquet row counts), not the path name — a
    symlinked/renamed/oddly-suffixed directory (``sf0.010``, trailing
    slash, copy under another name) must not silently swap oracles.
    The driver runs sf0.01 (lineitem ≈ 60k rows) and always gets the
    proof-carrying originals; sf0.1 has ≈ 600k.
    """
    import pyarrow.parquet as pq

    try:
        n = pq.ParquetFile(os.path.join(sf_dir, "lineitem.parquet")).metadata.num_rows
    except Exception:  # noqa: BLE001 - unreadable ⇒ safest: proof oracles
        return False
    return n > 150_000


def canon_pdf(pdf):
    """Sort columns by name, sort rows by all columns (the driver's
    _canon crashes here on unhashable cells — so do we), then format
    every cell dtype-sensitively.  Returns (cols, kinds, row_strings).
    """
    pdf = pdf[sorted(pdf.columns)]
    # the driver's traceback shows sort_values over the full frame
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )
    kinds = {c: pdf[c].dtype.kind for c in pdf.columns}
    rows = [
        "\x1f".join(_fmt_cell(row[c], kinds[c]) for c in pdf.columns)
        for row in pdf.to_dict("records")
    ]
    return list(pdf.columns), kinds, rows


def check_one(name, fn, osql, spark, con, sf):
    """Returns (ok, detail)."""
    sdf = fn(spark, sf)
    try:
        spdf = sdf.toPandas()
    except Exception as exc:  # noqa: BLE001
        return False, f"spark toPandas: {str(exc)[:120]}"
    try:
        sc, sk, srows = canon_pdf(spdf)
    except Exception as exc:  # noqa: BLE001
        return False, f"spark canon crash: {str(exc)[:120]}"
    if osql is None:
        return True, f"rows-only:{len(srows)}"
    try:
        opdf = con.execute(osql).df()
    except Exception as exc:  # noqa: BLE001
        return False, f"oracle exec: {str(exc)[:120]}"
    try:
        oc, ok_, orows = canon_pdf(opdf)
    except Exception as exc:  # noqa: BLE001
        return False, f"oracle canon crash: {str(exc)[:120]}"
    if sc != oc:
        return False, f"columns: spark={sc} oracle={oc}"
    kind_diff = [
        f"{c}(spark={sk[c]},oracle={ok_[c]})" for c in sc if sk[c] != ok_[c]
    ]
    if kind_diff:
        return False, "dtype kinds: " + ", ".join(kind_diff)
    if len(srows) != len(orows):
        return False, f"rows: spark={len(srows)} oracle={len(orows)}"
    for i, (a, b) in enumerate(zip(srows, orows)):
        if a != b:
            return False, f"row {i}: spark={a[:90]!r} oracle={b[:90]!r}"
    return True, f"ok:{len(srows)}"


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    args = [a for a in sys.argv[1:]]
    sf = "/root/testdata/sf0.001"
    names = None
    first = None
    i = 0
    while i < len(args):
        if args[i] == "--names":
            names = set(args[i + 1].split(","))
            i += 2
        elif args[i] == "--first":
            first = int(args[i + 1])
            i += 2
        else:
            sf = args[i]
            i += 1

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
    # at big scale swap in the cheap mirrored-blocking oracle variants
    # (the registered originals include a deliberately brute-force
    # proof oracle that costs ~175 s at sf0.1; the driver runs sf0.01
    # and always gets the originals). Decided from the data, not the
    # path suffix — see use_big_oracles.
    if getattr(entry, "oracle_sql_big", None) and use_big_oracles(sf):
        osql = {**osql, **entry.oracle_sql_big()}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    t0 = time.perf_counter()
    checked, npass, fails = 0, 0, []
    for name, fn in qs.items():
        if names is not None and name not in names:
            continue
        if first is not None and checked >= first:
            break
        checked += 1
        try:
            ok, detail = check_one(name, fn, osql.get(name), spark, con, sf)
        except Exception as exc:  # noqa: BLE001
            ok, detail = False, f"query exec: {str(exc)[:150]}"
        if ok:
            npass += 1
        else:
            fails.append((name, detail))
            print(f"CANON-FAIL {name}: {detail}", flush=True)
    print(
        f"pandas-canon: {npass}/{checked} pass at {sf} "
        f"in {time.perf_counter() - t0:.0f} s"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
