"""Zero-extra-scan pipeline metrics via ``df.observe``.

The reference runs side-channel counters for operational visibility
(e.g. batch-size logging in ``internal/utils/batching.go`` and
per-batch insert counts in ``internal/consumers/results_consumer.go``).
The naive Spark translation — ``df.count()`` before/after each filter —
re-executes the plan per counter, which at 100 TB means re-scanning
the table once per metric. ``observe`` attaches accumulator-backed
aggregates to the existing plan instead: metrics are collected as a
by-product of the one real action, with zero additional scans or
shuffles, and the same mechanism feeds StreamingQueryListener in
streaming jobs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(df: DataFrame, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``'s plan. Returns the
    observed DataFrame (use it in place of ``df``) and the
    `Observation` handle — read ``obs.get`` AFTER an action has run.

    Metrics must be aggregates Spark can compute as accumulators on
    the fly (count/sum/min/max/avg composites — no distinct, no
    sort-based aggregates), which is exactly what keeps them free."""
    obs = Observation()
    return df.observe(obs, *[c.alias(n) for n, c in metrics.items()]), obs


def quality_funnel(df: DataFrame, text_col: str = "text") -> tuple[DataFrame, Observation]:
    """The curation-pipeline funnel counters as one observation:
    rows in, empty texts, and total bytes — the three numbers an
    operator watches to spot upstream drift without paying a second
    scan."""
    from pyspark.sql import functions as F

    t = F.col(text_col)
    return observed(
        df,
        n_rows=F.count(F.lit(1)),
        n_empty=F.sum((t == "").cast("long")),
        total_chars=F.sum(F.length(t)),
    )
