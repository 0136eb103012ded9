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


def zorder_value(scaled_cols: Sequence, bits: int = 16):
    """Morton (Z-order) key: interleave the low ``bits`` bits of the
    given integer Column expressions, as a pure Column expression
    (stays in whole-stage codegen — no UDF).

    Sorting by one column gives perfect file-level min/max skipping on
    that column and none on the others; sorting by the Z-value gives
    every interleaved column a bounded range within each file, so
    predicates on ANY of them skip files. The standard multi-column
    data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER does the
    same). Inputs MUST already be scaled to [0, 2**bits): columns
    with unequal bit widths would let the wide column own every
    significant interleave bit and the narrow one would not cluster
    at all — ``write_zordered`` does the min-max scaling.
    """
    from pyspark.sql import functions as F

    n = len(scaled_cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(scaled_cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered by the Z-order of ``cols`` into
    ``n_files`` range-partitioned, internally sorted files.

    Each column is min-max scaled to the full [0, 2**bits) range
    first (one tiny aggregate over the input) so every column gets
    equal weight at every interleave level regardless of its domain
    width. At 100 TB the min/max pass is a cheap columnar-stats scan;
    for monotonically growing keys use a fixed published range
    instead so files stay comparable across write batches.
    """
    from pyspark.sql import functions as F

    top = (1 << bits) - 1
    stats = df.agg(
        *[F.min(c).alias(f"{c}_lo") for c in cols],
        *[F.max(c).alias(f"{c}_hi") for c in cols],
    ).collect()[0]
    scaled = []
    for c in cols:
        lo, hi = stats[f"{c}_lo"], stats[f"{c}_hi"]
        width = max(float(hi - lo), 1.0)
        scaled.append(
            F.round((F.col(c) - F.lit(lo)) / F.lit(width) * top).cast("long")
        )
    z = zorder_value(scaled, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


# ------------------------------------------------------------ snapshots

def write_snapshot(df, base_path: str) -> int:
    """Versioned-snapshot write (time-travel without a table format):
    each call lands a complete snapshot under ``base_path/v=N/`` and
    commits it by writing ``base_path/_latest`` LAST (a one-line
    pointer file). Readers resolve the pointer first, so a crashed
    write — data files present, pointer not yet advanced — is
    invisible: commit is the atomicity of one tiny file PUT, the same
    trick table formats play with their metadata pointer. Returns the
    new version number.

    At scale this is the poor-man's Iceberg: full-snapshot versions
    suit dimension/manifest tables (the serving tables here);
    fact-scale data wants a real table format with delta manifests —
    documented boundary, not a hidden assumption. The pointer protocol
    uses LOCAL filesystem ops (os.replace atomicity), so ``base_path``
    must be a local path — remote URIs are rejected up front rather
    than corrupting the commit protocol halfway through.
    """
    import os

    if "://" in base_path:
        raise ValueError(
            "write_snapshot commits via local-filesystem rename; "
            f"remote path not supported: {base_path!r}"
        )
    # allocate past BOTH the committed pointer and any orphaned
    # (crashed, uncommitted) version directories, so a crash never
    # wedges the next writer on an errorifexists collision
    orphans = [
        int(d[2:])
        for d in (os.listdir(base_path) if os.path.isdir(base_path) else [])
        if d.startswith("v=") and d[2:].isdigit()
    ]
    v = max([latest_version(base_path), *orphans, -1]) + 1
    df.write.mode("errorifexists").parquet(f"{base_path}/v={v}")
    tmp = f"{base_path}/_latest.tmp"
    with open(tmp, "w") as f:
        f.write(str(v))
    os.replace(tmp, f"{base_path}/_latest")  # atomic on POSIX
    return v


def latest_version(base_path: str) -> int:
    import os

    try:
        with open(os.path.join(base_path, "_latest")) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return -1


def read_snapshot(spark, base_path: str, version: int | None = None):
    """Read a snapshot: the committed latest by default, or any prior
    version for time travel. Uncommitted (crashed) writes are never
    returned — only versions at or below the pointer are visible, so
    an explicit ``version`` pointing at an orphaned directory is
    rejected rather than served as possibly-partial data."""
    latest = latest_version(base_path)
    v = latest if version is None else version
    if v < 0:
        raise FileNotFoundError(f"no committed snapshot under {base_path}")
    if v > latest:
        raise ValueError(
            f"version {v} is not committed (latest committed is {latest})"
        )
    return spark.read.parquet(f"{base_path}/v={v}")


def snapshot_diff(spark, base_path: str, v_old: int, v_new: int, key_cols):
    """Keyed diff between two committed snapshot versions — the CDC
    extraction a downstream consumer runs after a pointer advance:
    ``change`` is 'added' (key only in v_new), 'removed' (key only in
    v_old) or 'changed' (key in both, any non-key column differs).
    Returns the key columns + ``change``.

    Non-key equality is compared through a sha256 of the column-ordered
    string rendering — one expression per side, so the diff is ONE
    full-outer join on the key with no per-column join residuals. Each
    value is LENGTH-PREFIXED (``<len>:<chars>``, NULL renders as the
    prefix-free ``N``), so a value containing any separator-looking
    character cannot shift content across column boundaries and NULL is
    distinguishable from every real string — two rows hash equal iff
    their rendered columns are identical. At scale both snapshot scans
    prune to key + hashed columns, and if the snapshots were written
    bucketed by the key the join co-locates with zero Exchange.
    """
    from pyspark.sql import functions as F

    keys = list(key_cols)

    def render(c: str):
        s = F.col(c).cast("string")
        return F.coalesce(
            F.concat(F.length(s).cast("string"), F.lit(":"), s), F.lit("N")
        )

    def hashed(df, tag: str):
        value_cols = [c for c in df.columns if c not in keys]
        parts = [render(c) for c in sorted(value_cols)] or [F.lit("")]
        return df.select(
            *keys,
            F.sha2(F.concat(*parts), 256).alias(f"_h_{tag}"),
        )

    old = hashed(read_snapshot(spark, base_path, v_old), "old")
    new = hashed(read_snapshot(spark, base_path, v_new), "new")
    j = old.join(new, keys, "full_outer")
    change = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
    )
    return (
        j.select(*keys, change.alias("change"))
        .filter(F.col("change").isNotNull())
    )
