"""Optimization-round profiler: split each headline query's wall time
into DataFrame BUILD time (fn() call — pays Catalyst analysis of
eagerly-evaluated parts: localCheckpoints, metadata counts) vs the two
timed .count() passes (bench.py's exact action), and count the Spark
JOBS each phase launches (job-scheduling overhead is a fixed per-query
cost that dominates at small SFs — sf0.001 suite 39.8 s vs sf0.1
53.7 s means ~75% of the bench is scale-invariant overhead).

Run: python tools/profile_bench.py [SF_DIR] [name ...]
Writes PROFILE_BENCH.json next to the repo root; optionally dumps
explain('formatted') per query to plans/r12/<name>_<tag>.txt when
--plans TAG is given.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = list(sys.argv[1:])
    plan_tag = None
    if "--plans" in args:
        i = args.index("--plans")
        plan_tag = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = args[1:]

    from sentiflow_spark.queries.registry import load_all
    from sentiflow_spark.session import get_spark

    spark = get_spark("profile-bench")
    sc = spark.sparkContext
    # identical warm-up to bench.py so first-query costs don't skew
    spark.range(1).count()
    from sentiflow_spark.tables import load

    load(spark, sf_dir, "documents").limit(1).count()
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as F

    spark.range(1000).groupBy((F.col("id") % 8).alias("k")).count().count()
    (
        spark.range(64)
        .select("id", F.md5(F.regexp_replace(F.col("id").cast("string"), "[0-9]", "x")).alias("fp"))
        .withColumn("rn", F.row_number().over(_W.partitionBy("fp").orderBy("id")))
        .count()
    )
    from sentiflow_spark.streaming.dag import warm_streaming_engine

    warm_streaming_engine(spark)

    registry = load_all()
    if not names:
        names = [
            n for n, q in registry.items()
            if {"flagship", "bench"} & set(q.tags)
        ]

    def job_count() -> int:
        # next job id == number of jobs submitted so far
        return sc._jsc.sc().dagScheduler().nextJobId()

    out: dict[str, dict] = {}
    for name in names:
        sc.setJobDescription(f"profile:{name}")
        j0 = job_count()
        t0 = time.perf_counter()
        df = registry[name].fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        j1 = job_count()
        t0 = time.perf_counter()
        df.count()
        t_c1 = time.perf_counter() - t0
        j2 = job_count()
        t0 = time.perf_counter()
        # bench best-of-2 re-runs fn? No: bench calls fn fresh per pass.
        df2 = registry[name].fn(spark, sf_dir)
        df2.count()
        t_c2 = time.perf_counter() - t0
        j3 = job_count()
        out[name] = {
            "build_s": round(t_build, 3),
            "count1_s": round(t_c1, 3),
            "pass2_s": round(t_c2, 3),
            "jobs_build": j1 - j0,
            "jobs_count": j2 - j1,
            "jobs_pass2": j3 - j2,
        }
        if plan_tag:
            os.makedirs(os.path.join(ROOT, "plans", "r12"), exist_ok=True)
            p = os.path.join(ROOT, "plans", "r12", f"{name}_{plan_tag}.txt")
            with open(p, "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        print(
            f"{name:36s} build {t_build:6.2f}s ({j1-j0:3d} jobs)  "
            f"pass1 {t_c1:6.2f}s ({j2-j1:3d} jobs)  pass2 {t_c2:6.2f}s ({j3-j2:3d} jobs)",
            flush=True,
        )
        sc.setJobDescription(None)
    path = os.path.join(ROOT, "PROFILE_BENCH.json")
    with open(path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "queries": out}, fh, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
