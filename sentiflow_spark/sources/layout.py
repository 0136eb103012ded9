"""Physical table layout for 100 TB: partitioning and bucketing.

The reference's only layout decision was Kafka partition counts
(``deploy/docker/kafka/scripts/init-kafka.sh:6-16``). A batch/lakehouse
engine at scale has two stronger levers:

- **Hive-style partition columns** (``write.partitionBy``): coarse,
  low-cardinality keys (date, event_type, lang). Filters on them prune
  whole directories before any IO — the scan's ``PartitionFilters``
  entry — which is the difference between reading 100 TB and reading
  one day's slice.
- **Bucketing** (``write.bucketBy + sortBy``): high-cardinality join/
  agg keys (custkey, content_id). Two tables bucketed the same way
  co-locate their keys, so joins and aggregations run with NO shuffle
  exchange — at 100 TB the shuffle is usually the whole cost of a
  fact-fact join. Bucket counts must match (or divide) between tables;
  pick a count that keeps buckets under a few hundred MB at target
  scale and ideally a multiple of the cluster's parallelism.

Rules of thumb encoded here:
- partition count on disk = cardinality(partition cols); keep it
  < ~10^4 directories per table,
- bucket pruning also applies to point lookups on the bucket key,
- sortBy within buckets makes merge-joins and min/max skipping cheap.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet: predicates on ``partition_cols``
    become PartitionFilters (pruned before IO)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int,
    sort_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (bucketing metadata lives in the
    catalog, so this is saveAsTable, not a path write)."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_key)
    writer = writer.sortBy(*(sort_cols or [bucket_key]))
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables: Catalyst sees matching
    HashPartitioning(bucket_key) output partitionings on both scans and
    plans a SortMergeJoin with zero Exchange nodes."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
