"""Local DuckDB oracle harness.

Mirrors the driver's correctness gate: run a registered query's Spark
implementation and its ANSI-SQL oracle over the same parquet tables and
compare row count, schema (column names), and an order-insensitive
canonical value hash. Used by tests/test_parity.py.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import hashlib
import json
import math
from dataclasses import dataclass

import duckdb
from pyspark.sql import DataFrame, SparkSession

from sentiflow_spark.tables import TABLE_NAMES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(v: object) -> object:
    """Canonicalize a cell so Spark and DuckDB results compare equal."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # doubles must be bitwise-identical across engines by construction
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return [_canon(x) for x in v]
    if isinstance(v, dict):
        return {k: _canon(x) for k, x in sorted(v.items())}
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return v


def canonical_rows(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[str]]:
    """Sort columns by name, canonicalize values, return (cols, sorted row-json)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = [
        json.dumps([_canon(r[i]) for i in order], default=str, sort_keys=True)
        for r in rows
    ]
    out.sort()
    return cols, out


def value_hash(columns: list[str], rows: list[tuple]) -> str:
    cols, out = canonical_rows(columns, rows)
    h = hashlib.sha256()
    h.update(json.dumps(cols).encode())
    for line in out:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


@dataclass
class ParityReport:
    name: str
    spark_rows: int
    oracle_rows: int
    spark_cols: list[str]
    oracle_cols: list[str]
    spark_hash: str
    oracle_hash: str
    sample_diff: list[str]

    type_mismatch: list[str] | None = None

    @property
    def ok(self) -> bool:
        return (
            self.spark_rows == self.oracle_rows
            and self.spark_cols == self.oracle_cols
            and self.spark_hash == self.oracle_hash
            and not self.type_mismatch
        )


_TYPE_CLASSES = (
    (bool, "bool"),
    (int, "int"),
    (float, "float"),
    (decimal.Decimal, "decimal"),
    (_dt.datetime, "timestamp"),
    (_dt.date, "date"),
    (str, "str"),
    ((bytes, bytearray), "binary"),
    ((list, tuple), "array"),
    (dict, "map"),
)


def _type_sig(cols: list[str], rows: list[tuple]) -> dict[str, str]:
    """Broad type class per column from the first non-null cell.
    Canonicalization coerces Decimal→float for VALUE comparison, which
    is correct when both engines emit the same class — but it would
    MASK a query whose Spark side emits DOUBLE while its oracle emits
    DECIMAL (a real schema divergence the external driver may flag).
    This signature keeps the class visible."""
    sig: dict[str, str] = {}
    for i, c in enumerate(cols):
        for r in rows:
            v = r[i]
            if v is None:
                continue
            for types, label in _TYPE_CLASSES:
                if isinstance(v, types):
                    sig[c] = label
                    break
            break
    return sig


def compare(
    name: str, spark_df: DataFrame, oracle_sql: str, sf_dir: str
) -> ParityReport:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    con = duck_connect(sf_dir)
    try:
        res = con.execute(oracle_sql)
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
    finally:
        con.close()

    sc, s_sorted = canonical_rows(s_cols, s_rows)
    oc, o_sorted = canonical_rows(o_cols, o_rows)
    diff: list[str] = []
    if s_sorted != o_sorted:
        for a, b in zip(s_sorted, o_sorted):
            if a != b:
                diff.append(f"spark={a}")
                diff.append(f"duck ={b}")
                if len(diff) >= 6:
                    break
        if not diff:
            diff.append(f"row count differs: spark={len(s_sorted)} duck={len(o_sorted)}")
            extra = s_sorted[len(o_sorted):] or o_sorted[len(s_sorted):]
            diff.extend(extra[:3])
    s_sig = _type_sig(s_cols, s_rows)
    o_sig = _type_sig(o_cols, o_rows)
    mismatches = [
        f"{c}: spark={s_sig[c]} duck={o_sig[c]}"
        for c in sorted(set(s_sig) & set(o_sig))
        if s_sig[c] != o_sig[c]
    ]
    return ParityReport(
        name=name,
        spark_rows=len(s_rows),
        oracle_rows=len(o_rows),
        spark_cols=sc,
        oracle_cols=oc,
        spark_hash=value_hash(s_cols, s_rows),
        oracle_hash=value_hash(o_cols, o_rows),
        sample_diff=diff,
        type_mismatch=mismatches or None,
    )


def run_all(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, ParityReport | str]:
    """Run every registered query against its oracle; returns per-name
    report (or 'rows-only: N' for oracle-less entries)."""
    from sentiflow_spark.queries.registry import load_all

    registry = load_all()
    out: dict[str, ParityReport | str] = {}
    for name, q in registry.items():
        if names and name not in names:
            continue
        df = q.fn(spark, sf_dir)
        if q.oracle is None:
            out[name] = f"rows-only: {df.count()}"
        else:
            out[name] = compare(name, df, q.oracle, sf_dir)
    return out
