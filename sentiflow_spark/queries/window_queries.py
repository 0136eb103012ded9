"""Window-function and event-time-window surface (SURVEY §2.7 W4 + §7.2
M2/M5): ranking, analytic, frame-based aggregates, top-k per group, and
the tumbling / sliding / session event-time windows the reference never
had (its only time notion was a 24h TTL) but a streaming analytics
engine needs. Batch-checkable against DuckDB; the same expressions run
under Structured Streaming with watermarks (streaming/dag.py).

Determinism: every window ORDER BY ends in a unique key; frame
aggregates over doubles go through DECIMAL (see functions/numeric.py);
DuckDB computes window sums with segment trees (arbitrary addition
order), so float frames would drift otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sentiflow_spark.functions.numeric import MONEY
from sentiflow_spark.queries.registry import register
from sentiflow_spark.tables import load

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@register(
    "win_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window", "topk", "bench"),
    doc="Top-3 orders per customer — row_number with unique tiebreak.",
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "win_rank_dense_ntile",
    oracle="""
    SELECT p_brand, p_partkey,
           rank()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rnk,
           dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS drnk,
           ntile(4)     OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS quartile
    FROM part
    """,
    tags=("window",),
    doc="rank / dense_rank / ntile ranking family.",
)
def win_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return part.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "win_lag_lead",
    oracle=f"""
    SELECT user_id, event_id,
           strftime(ts, '{TS_FMT_DUCK}') AS ts_s,
           lag(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
           CAST(floor(epoch(ts)) -
                floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)))
                AS BIGINT) AS gap_s
    FROM events
    """,
    tags=("window", "streaming-analog"),
    doc="lag/lead + inter-event gap per user.",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.date_format("ts", TS_FMT_SPARK).alias("ts_s"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).cast("long").alias("gap_s"),
    )


@register(
    "win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS last3_spend
    FROM orders
    """,
    tags=("window", "bench"),
    doc="Running + bounded ROWS frame aggregates (decimal-exact).",
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    spend = F.col("o_totalprice").cast(MONEY)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(spend).over(w.rowsBetween(W.unboundedPreceding, 0)).cast("double").alias(
            "running_spend"
        ),
        F.sum(spend).over(w.rowsBetween(-2, 0)).cast("double").alias("last3_spend"),
    )


@register(
    "win_first_last",
    oracle="""
    SELECT DISTINCT l_orderkey,
           first_value(l_partkey) OVER w AS first_part,
           last_value(l_partkey)  OVER w AS last_part,
           max(l_linenumber)      OVER w AS n_lines
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window",),
    doc="first_value/last_value over an unbounded frame.",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_orderkey")
        # l_linenumber repeats within an order in the synthetic data, so a
        # bare ORDER BY l_linenumber leaves first/last tie-nondeterministic
        .orderBy("l_linenumber", "l_partkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return li.select(
        "l_orderkey",
        F.first("l_partkey").over(w).alias("first_part"),
        F.last("l_partkey").over(w).alias("last_part"),
        F.max("l_linenumber").over(w).alias("n_lines"),
    ).distinct()


@register(
    "win_percent_rank",
    oracle="""
    SELECT c_custkey,
           percent_rank() OVER (ORDER BY c_acctbal, c_custkey) AS pr,
           cume_dist()    OVER (ORDER BY c_acctbal, c_custkey) AS cd
    FROM customer
    """,
    tags=("window",),
    doc="percent_rank / cume_dist (exact rational doubles) via the "
    "TWO-PASS distributed ranking — NOT percent_rank() over an "
    "unpartitioned window, which moves every row through ONE task. "
    "Pass 1 range-buckets rows on the order key (uniform-width value "
    "buckets: order-consistent because bucket(x) is monotone in "
    "c_acctbal and ties share a bucket) and takes per-bucket counts; "
    "a cumulative sum over the <=64 bucket rows yields each bucket's "
    "global offset. Pass 2 ranks WITHIN each bucket (partitioned "
    "window) and adds the offset: global rank with the sort sharded "
    "across buckets. The ordering key (c_acctbal, c_custkey) is "
    "unique, so rank == row_number, percent_rank = (rank-1)/(n-1) and "
    "cume_dist = rank/n exactly — integer/int division, bitwise "
    "identical cross-engine; the oracle states the plain built-in "
    "window. At 100 TB the same shape holds with sampled range "
    "boundaries (repartitionByRange-style) instead of min/max-uniform.",
)
def win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    nb = 64
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    stats = cust.agg(
        F.min("c_acctbal").alias("_lo"),
        F.max("c_acctbal").alias("_hi"),
        F.count(F.lit(1)).alias("_n"),
    )
    b = cust.crossJoin(F.broadcast(stats)).withColumn(
        "_b",
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
            F.least(
                F.lit(nb - 1),
                F.floor(
                    (F.col("c_acctbal") - F.col("_lo"))
                    / ((F.col("_hi") - F.col("_lo")) / nb)
                ).cast("int"),
            )
        ),
    )
    counts = b.groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
    # cumulative bucket offsets: unpartitioned window over <= nb rows
    # BY CONSTRUCTION (groupBy on the nb-valued bucket id) — carried in
    # the unpartitioned-WindowExec allow-list in tests/test_plans.py
    w_off = W.orderBy("_b").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = W.partitionBy("_b").orderBy("c_acctbal", "c_custkey")
    ranked = b.join(F.broadcast(offsets), "_b").withColumn(
        "_r", F.col("_off") + F.row_number().over(w_in)
    )
    pr = F.when(
        F.col("_n") > 1,
        (F.col("_r") - 1).cast("double") / (F.col("_n") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    cd = F.col("_r").cast("double") / F.col("_n").cast("double")
    return ranked.select("c_custkey", pr.alias("pr"), cd.alias("cd"))


@register(
    "win_tumbling_hourly",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS window_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("window", "event-time", "W4", "bench"),
    doc="Tumbling 1h event-time window (streaming-equivalent groupBy window()).",
)
def win_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(MONEY)).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "win_sliding_2h_1h",
    oracle=f"""
    WITH assigned AS (
      SELECT date_trunc('hour', ts) AS w_start, user_id, value FROM events
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, user_id, value FROM events
    )
    SELECT strftime(w_start, '{TS_FMT_DUCK}') AS window_start,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users
    FROM assigned GROUP BY w_start
    """,
    tags=("window", "event-time", "W4"),
    doc="Sliding window (2h size, 1h slide): each event lands in 2 windows.",
)
def win_sliding_2h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("window_start"),
            "n",
            "n_users",
        )
    )


@register(
    "win_session_30m",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts,
             -- Spark merges strictly-within-gap events (next < prev_end),
             -- so a gap of exactly 30m starts a NEW session in both.
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTES
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM ordered
    )
    SELECT user_id,
           strftime(MIN(ts), '{TS_FMT_DUCK}') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTES, '{TS_FMT_DUCK}') AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
    tags=("window", "event-time", "session", "W4"),
    doc="Session windows (30m gap) — session_window() in Spark, "
    "gaps-and-islands in the oracle; identical merge semantics.",
)
def win_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("session_start"),
            F.date_format(F.col("w.end"), TS_FMT_SPARK).alias("session_end"),
            "n_events",
        )
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           date_diff('day', DATE '1992-01-01', o_orderdate) AS order_day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY date_diff('day', DATE '1992-01-01', o_orderdate)
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS spend_30d
    FROM orders
    """,
    tags=("window", "frame"),
    doc="Value-based RANGE frame: trailing-30-day spend per customer. "
    "RANGE (unlike ROWS) includes all peers of the current value, so "
    "same-day ties are deterministic without a tiebreak column.",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").withColumn(
        "order_day", F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("order_day")
        .rangeBetween(-30, W.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "order_day",
        F.sum(F.col("o_totalprice").cast(MONEY)).over(w).cast("double").alias(
            "spend_30d"
        ),
    )


@register(
    "win_scd2_intervals",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS effective_from,
           strftime(LEAD(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id),
                    '%Y-%m-%d %H:%M:%S') AS effective_to
    FROM changes
    """,
    tags=("window", "scd2", "time"),
    doc="SCD type-2 interval construction: collapse each user's event "
    "stream into validity windows [effective_from, effective_to) that "
    "change only when event_type changes (run-length encoding via "
    "lag-compare, interval close via lead; NULL effective_to = "
    "current). Both windows share the (user_id → ts, event_id) sort, "
    "so the whole rewrite is ONE shuffle + one sort — the standard "
    "way to build a type-2 dimension from a 100 TB change log. "
    "event_id breaks ts ties deterministically.",
)
def win_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.withColumn(
        "prev_type", F.lag("event_type").over(w)
    ).filter(
        F.col("prev_type").isNull()
        | (F.col("event_type") != F.col("prev_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("effective_from"),
        F.date_format(F.lead("ts").over(w2), "yyyy-MM-dd HH:mm:ss").alias(
            "effective_to"
        ),
    )


@register(
    "win_cume_dist_nth",
    oracle="""
    SELECT user_id, event_id,
           cume_dist() OVER w AS cd,
           nth_value(value, 3) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING) AS third_value
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
    tags=("window", "rank"),
    doc="cume_dist + nth_value, completing the ranking-function "
    "family. cume_dist divides two ints derived from the same sort "
    "(deterministic doubles); nth_value needs the explicit "
    "whole-partition ROWS frame — the default frame stops at "
    "CURRENT ROW, which would null the first two rows per key. "
    "(value, event_id) makes the order total, so both functions are "
    "partition-order independent.",
)
def win_cume_dist_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id",
        "event_id",
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("value", 3).over(wf).alias("third_value"),
    )


@register(
    "win_funnel_steps",
    oracle="""
    WITH staged AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id) AS signup_ts,
             ts, event_type
      FROM events
    ), per_user AS (
      SELECT user_id,
             MIN(signup_ts) AS signup_ts,
             MIN(CASE WHEN event_type = 'click' AND ts > signup_ts
                      THEN ts END) AS click_ts
      FROM staged GROUP BY user_id
    ), with_purchase AS (
      SELECT p.user_id, p.signup_ts, p.click_ts,
             MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > p.click_ts
                      THEN e.ts END) AS purchase_ts
      FROM per_user p JOIN events e ON e.user_id = p.user_id
      GROUP BY p.user_id, p.signup_ts, p.click_ts
    )
    SELECT COUNT(signup_ts) AS n_signup,
           COUNT(click_ts) AS n_click_after_signup,
           COUNT(purchase_ts) AS n_purchase_after_click
    FROM with_purchase
    """,
    tags=("window", "funnel", "analytics"),
    doc="Funnel conversion: users who signed up -> first click AFTER "
    "the signup -> first purchase AFTER that click. One hash "
    "partitioning by user_id serves the window AND both groupBys "
    "(Spark reuses the exchange: window, partial agg, and final agg "
    "are all user_id-clustered), so the whole funnel is a single "
    "shuffle of the events scan plus a scalar collect — the shape "
    "that survives a 100x scale-up. Conditional MIN aggregates "
    "replace the per-stage self-joins of the textbook funnel SQL.",
)
def win_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    by_user = W.partitionBy("user_id")
    staged = ev.withColumn(
        "signup_ts",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(by_user),
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("signup_ts").alias("signup_ts"),
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("signup_ts")),
                F.col("ts"),
            )
        ).alias("click_ts"),
    )
    # purchase stage: re-scan events against each user's click_ts; the
    # join and its aggregate stay in the same user_id clustering
    with_purchase = (
        per_user.join(ev, "user_id")
        .groupBy("user_id", "signup_ts", "click_ts")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("click_ts")),
                    F.col("ts"),
                )
            ).alias("purchase_ts")
        )
    )
    return with_purchase.agg(
        F.count("signup_ts").alias("n_signup"),
        F.count("click_ts").alias("n_click_after_signup"),
        F.count("purchase_ts").alias("n_purchase_after_click"),
    )
