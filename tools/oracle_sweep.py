"""Fresh-process, driver-identical oracle sweep: run EVERY registered
query through __spark_entry__ and compare against its DuckDB oracle
the same way the external driver does — through PANDAS
(``toPandas()`` vs ``.df()``), columns sorted by name, rows sorted via
``sort_values`` (crashing on unhashable list/map cells exactly like
the driver's canon), cells formatted dtype-sensitively so int64 0 vs
float64 0.0 FAILS (the round-3 HUGEINT class).

Run: python tools/oracle_sweep.py [sf_dir] [--timings OUT.json]
(default sf_dir /root/testdata/sf0.01)

--timings writes {"queries": {name: seconds}, "sf": ..., "total": ...}
per query (Spark execution + oracle + driver-identical compare, one
fresh pass) — the same shape bench.py emits, so tools/regress.py diffs
two sweep-timing files directly. Committed per round as
SWEEP_TIMINGS_r{N}.json, this catches plan regressions in the ~190
queries the headline bench never times.

The timings header carries a ``host`` contention sentinel (loadavg +
the single-core cpu probe, sampled at sweep start AND end — bench.py's
r10 design): r10's final sweeps read a phantom 1.27x under
hypervisor-level contention that guest loadavg could NOT see (probe
0.217 s at load1 0.05 vs the 0.09-0.12 quiet band), so the artifact
itself must prove which side of a comparison was contended.
tools/regress.py reads the block and suppresses per-query flag chasing
when either side's probe is >= 0.15 s.  Since r12 the block also
carries an IN-RUN summary (tools/host_sentinel.py: a detached child
samples probe + runnable count + IO PSI every ~20 s) because the
endpoint pair can STRADDLE bursty interference — r12's worst same-code
re-run read 1.9x total, streaming queries 10-19x, with BOTH endpoint
probes in the quiet band; regress.py gates on `in_run_bursts` (probe
contended while the host was NOT saturated by the sweep's own load)
the same way it gates on the endpoint probes.

This is deliberately NOT built on sentiflow_spark.oracle — that module
is code under test; the comparison lives in tools/pandas_canon.py so a
bug there cannot mask itself.  Round 3 shipped 5 red driver rows from
a .collect()-based sweep that was 213/213 green — the pandas path is
the one that counts.
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

    args = list(sys.argv[1:])
    timings_out = None
    if "--timings" in args:
        i = args.index("--timings")
        timings_out = args[i + 1]
        del args[i : i + 2]
    sf = args[0] if args else "/root/testdata/sf0.01"
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
    # at big scale swap in the cheap mirrored-blocking oracle variants;
    # the driver (sf0.01) always gets the proof-carrying originals.
    # Decided from parquet row counts, not the path suffix.
    if getattr(entry, "oracle_sql_big", None) and use_big_oracles(sf):
        osql = {**osql, **entry.oracle_sql_big()}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    # Session streaming-engine + Arrow-worker bring-up off the clock:
    # otherwise ~8-10 s of one-time cost lands on whichever st_* query
    # rotation order puts first and reads as a phantom regression.
    from sentiflow_spark.streaming.dag import warm_streaming_engine

    warm_streaming_engine(spark)
    # host-contention sentinel, sampled at both ends of the sweep
    from bench import _cpu_probe_s

    host = {
        "load1_start": round(os.getloadavg()[0], 2),
        "cpu_probe_start_s": _cpu_probe_s(),
    }
    # The endpoint probes can STRADDLE bursty interference (r12: the
    # worst of three same-code re-runs read 1.9x total with BOTH
    # endpoint probes quiet); a detached child samples the probe +
    # runnable count + IO PSI throughout and the summary lands in the
    # host block for regress.py to read.
    from host_sentinel import InRunSampler

    sampler = InRunSampler()
    sampler.start()
    t0 = time.perf_counter()
    npass, fails = 0, []
    per_query: dict[str, float] = {}
    # per-query START offsets (same clock as the sampler's burst
    # offsets): lets regress.py suppress only the queries whose run
    # window overlaps a recorded burst instead of discarding the whole
    # comparison
    offsets: dict[str, float] = {}
    for name, fn in qs.items():
        tq = time.perf_counter()
        offsets[name] = round(tq - t0, 1)
        try:
            ok, detail = check_one(name, fn, osql.get(name), spark, con, sf)
        except Exception as exc:  # noqa: BLE001 - report, don't crash the sweep
            ok, detail = False, f"query exec: {str(exc)[:150]}"
        per_query[name] = round(time.perf_counter() - tq, 3)
        if ok:
            npass += 1
        else:
            fails.append((name, detail))
    total = time.perf_counter() - t0
    host["load1_end"] = round(os.getloadavg()[0], 2)
    host["cpu_probe_end_s"] = _cpu_probe_s()
    host.update(sampler.stop())
    print(f"{npass}/{len(qs)} pass at {sf} in {total:.0f} s")
    print(f"host sentinel: {host}")
    for f in fails:
        print("FAIL:", f)
    if timings_out:
        import json

        with open(timings_out, "w") as fh:
            json.dump(
                {
                    "sf": sf,
                    "total": round(total, 1),
                    "n_pass": npass,
                    "n_queries": len(qs),
                    "host": host,
                    "queries": per_query,
                    "offsets": offsets,
                },
                fh,
                indent=1,
            )
        print(f"timings -> {timings_out}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
