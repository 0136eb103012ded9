"""The local mirror of the driver's correctness gate: every registered
query's Spark result must hash-match its DuckDB oracle (t1 runs at
sf0.001; set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for t2)."""

from __future__ import annotations

import pytest

from sentiflow_spark.oracle import compare
from sentiflow_spark.queries.registry import load_all

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_parity(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    report = compare(name, df, q.oracle, sf_dir)
    assert report.ok, (
        f"{name}: rows {report.spark_rows}/{report.oracle_rows}, "
        f"cols {report.spark_cols} vs {report.oracle_cols}, "
        f"diff sample: {report.sample_diff}"
    )
