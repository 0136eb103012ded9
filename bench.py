"""Benchmark harness: run the headline declared queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Each query is executed once to warm the JVM/scan caches off the clock?
No — cold numbers are the honest ones: we time a single full execution
per query (count() to force the plan without collecting results to the
driver), plus a whole-suite wall figure.
"""

from __future__ import annotations

import json
import os
import time

from sentiflow_spark.queries.registry import load_all
from sentiflow_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: flagship pipeline + the heaviest operator families.
HEADLINE_TAGS = {"flagship", "bench"}


def main() -> None:
    spark = get_spark("sentiflow-bench")
    registry = load_all()
    names = [
        n for n, q in registry.items() if HEADLINE_TAGS.intersection(q.tags)
    ] or list(registry)

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in names:
        # timed span covers plan construction AND execution, so the
        # per-query figures sum to ~the suite wall (construction is
        # real per-query cost: analysis, file-index reuse, codegen)
        t0 = time.perf_counter()
        registry[name].fn(spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 4)
    total = round(time.perf_counter() - t_all, 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "declared-query suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
