"""Dump `.explain("formatted")` for named queries to plans/<round>/.

Usage: python tools/dump_query_plans.py <round_dir> <suffix> <query> [...]
e.g.   python tools/dump_query_plans.py r13 before dd_boilerplate_lines

Writes plans/<round_dir>/<query>_<suffix>.txt for each query — the
committed plan evidence the optimization rounds require.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sentiflow_spark.queries.registry import load_all  # noqa: E402
from sentiflow_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    round_dir, suffix, *names = sys.argv[1:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        round_dir,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-query-plans")
    registry = load_all()
    for n in names:
        df = registry[n].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{n}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(path)


if __name__ == "__main__":
    main()
