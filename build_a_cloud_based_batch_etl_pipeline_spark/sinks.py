"""Sinks: object-store and managed-table writers (reference R3/R6
re-expressed; SURVEY.md §2.2 "Sinks").

The reference writes one JSON blob per run via a client library
(src/extract/main.py:46-49) and streams rows into BigQuery one file at a
time (src/load/main.py:40,47). Engine-native equivalents write through
Spark — partition-parallel, splittable formats, atomic per-task commit —
to any Hadoop filesystem (file://, gs://, s3a://).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_json(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Land as JSON-lines (splittable; the reference's array-blob format is
    one unsplittable task at scale)."""
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def write_parquet_table(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Managed-table append (reference R6). Partition columns should be the
    dominant pruning predicate (ingest_date for event/fact data) so reads
    at 100 TB touch only relevant partitions."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink — same partition-parallel, atomic-per-task commit shape as
    the parquet writer, for warehouses standardized on ORC."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog table: later equi-joins/aggs on bucket_col skip the
    shuffle entirely (co-located join). The 100 TB answer to repeated
    joins on the same key (e.g. lineitem x orders on orderkey)."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )


def write_sharded(
    df, path: str, target_rows_per_file: int, order_by: str | None = None
) -> int:
    """Write `df` as evenly-sized shards (~target_rows_per_file each) —
    the file-sizing step before publishing training shards, where
    downstream loaders want uniform files, not whatever task layout the
    upstream job happened to have.

    Computes the shard count from an exact count (one extra pass — at
    shard-writing time the data is about to be fully written anyway),
    then round-robin repartitions for even sizes; with `order_by`, uses a
    range repartition instead so shards are also key-ordered (enables
    shard-level pruning by the ordering key). Returns the shard count.
    """
    from pyspark.sql import functions as F  # noqa: F401

    n = df.count()
    shards = max(1, -(-n // target_rows_per_file))  # ceil div
    out = (
        df.repartitionByRange(shards, order_by)
        if order_by
        else df.repartition(shards)
    )
    out.write.mode("overwrite").parquet(path)
    return shards
