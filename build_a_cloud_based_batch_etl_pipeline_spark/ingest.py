"""Reference-surface ingest, Spark-first: extract -> land -> load.

Reference semantics reproduced (and fixed) per SURVEY.md §3.4:

- EXTRACT (reference R1-R3, src/extract/main.py:22-55): fetch JSON from an
  HTTP API, write one timestamped object to the landing zone. Here the
  landing file is JSON-LINES (splittable => scan-parallel at any size,
  unlike the reference's single JSON array blob) under an ingest_date=
  partition directory, so downstream reads prune by date.

- LOAD (reference R4-R6, src/load/main.py:20-56): read landed JSON with an
  EXPLICIT schema (no inference; malformed rows surface as nulls in
  _corrupt_record-style fashion rather than per-row warehouse errors,
  reference src/load/main.py:41-43), populate processedAt (the reference's
  declared-but-never-populated Transform column, terraform/main.tf:90-93),
  and append to a managed parquet table IDEMPOTENTLY: the reference's
  Pub/Sub redelivery chain is at-least-once with no insertId
  (src/load/main.py:40), so re-delivered files create duplicate rows; here
  an anti-join on the key against the existing table makes re-loading the
  same file a no-op.

The streaming twin (exactly-once incremental load via file-source +
checkpoint, replacing the reference's R7/R11 notification chain) is in
streaming/ingest_stream.py.

At scale: extraction of N endpoints parallelizes by distributing the URL
list (one task per partition of URLs); landing files are partitioned by
ingest_date and sized by the writer; the load's anti-join broadcasts
the incoming batch (bounded by one extraction run), never the table.
"""

from __future__ import annotations

import json
import os
import time
import urllib.request
import uuid
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import IngestConfig
from .schemas import POSTS, POSTS_RAW
from .sources import read_json

Fetcher = Callable[[str], bytes]


def _default_fetcher(url: str) -> bytes:
    """GET the source URL (reference download_data, src/extract/main.py:22-31).
    raise-for-status parity: urlopen raises on HTTP errors."""
    with urllib.request.urlopen(url, timeout=30) as resp:  # noqa: S310
        return resp.read()


def _run_id(run_ts: float) -> str:
    """Unique landing-run directory id: second-resolution timestamp (the
    reference's data_%Y%m%d_%H%M%S naming, src/extract/main.py:36) PLUS a
    random suffix — two extracts in the same wall-clock second must not
    compute the same run= dir, or the second overwrite silently destroys
    the first payload before it is ever loaded."""
    stamp = time.strftime("%Y%m%d_%H%M%S", time.gmtime(run_ts))
    return f"{stamp}_{uuid.uuid4().hex[:8]}"


def extract_to_landing(
    spark: SparkSession,
    cfg: IngestConfig,
    fetcher: Fetcher | None = None,
    run_ts: float | None = None,
) -> str:
    """Fetch one payload and land it as JSON-lines under an ingest_date
    partition. Returns the landing directory for this run.

    The reference writes data_%Y%m%d_%H%M%S.json via a GCS client
    (src/extract/main.py:36-49); the engine writes through Spark so the
    same code lands to file://, gs://, or s3a:// and large payloads are
    written partition-parallel.
    """
    fetcher = fetcher or _default_fetcher
    run_ts = time.time() if run_ts is None else run_ts
    payload = json.loads(fetcher(cfg.source_url))
    # reference load-side normalization (single object vs list,
    # src/load/main.py:39-51) happens at extract time instead:
    rows = payload if isinstance(payload, list) else [payload]
    ingest_date = time.strftime("%Y-%m-%d", time.gmtime(run_ts))
    run_id = _run_id(run_ts)
    out_dir = os.path.join(cfg.landing_uri, f"ingest_date={ingest_date}", f"run={run_id}")
    # Arrow path for the driver-side batch: createDataFrame from a
    # pandas frame crosses to the JVM as Arrow record batches instead
    # of pickled rows (guide §6 — the row path measured ~2.5x slower at
    # the reference's batch sizes). Columns are built dtype=object so
    # missing fields stay None (never coerced to NaN floats); any
    # payload the Arrow converter rejects falls back to the row path,
    # which accepts exactly what it always did.
    try:
        import pandas as pd

        pdf = pd.DataFrame(
            {
                f.name: pd.Series(
                    [r.get(f.name) for r in rows], dtype=object
                )
                for f in POSTS_RAW.fields
            }
        )
        df = spark.createDataFrame(pdf, schema=POSTS_RAW)
    except Exception:
        df = spark.createDataFrame(
            [tuple(r.get(f.name) for f in POSTS_RAW.fields) for r in rows],
            schema=POSTS_RAW,
        )
    df.write.mode("overwrite").json(out_dir)
    return out_dir


def extract_many_to_landing(
    spark: SparkSession,
    cfg: IngestConfig,
    urls: Iterable[str],
    fetcher: Fetcher | None = None,
    run_ts: float | None = None,
) -> str:
    """Parallel extract of many endpoints: distribute the URL list and
    fetch inside executors (mapInPandas-free: a partition-level python
    fetch is fine here because the payloads, not the fetch loop, dominate).
    This is the scale path for R1 when one cron tick hits thousands of
    shards/pages of an API.
    """
    fetcher = fetcher or _default_fetcher
    run_ts = time.time() if run_ts is None else run_ts
    ingest_date = time.strftime("%Y-%m-%d", time.gmtime(run_ts))
    run_id = _run_id(run_ts)
    out_dir = os.path.join(cfg.landing_uri, f"ingest_date={ingest_date}", f"run={run_id}")

    url_list = list(urls)
    sc = spark.sparkContext

    def fetch_partition(part: Iterable[str]):
        for u in part:
            payload = json.loads(fetcher(u))
            rows = payload if isinstance(payload, list) else [payload]
            for r in rows:
                yield tuple(r.get(f.name) for f in POSTS_RAW.fields)

    rdd = sc.parallelize(url_list, max(1, min(len(url_list), 64))).mapPartitions(
        fetch_partition
    )
    spark.createDataFrame(rdd, schema=POSTS_RAW).write.mode("overwrite").json(out_dir)
    return out_dir


def append_idempotent(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
    key: str = "id",
    partition_by: list[str] | None = None,
    new_values_of: str | None = None,
) -> int | tuple[int, list]:
    """Append `df` to the warehouse table, skipping rows whose key is
    already present. Returns the number of NEW rows appended — or, when
    `new_values_of` names a column, the tuple (n_new, distinct values
    of that column among the rows ACTUALLY appended). The clustered
    streaming load uses that to derive its touched-partition set from
    the survivors of the idempotency anti-join, not the raw batch
    (ADVICE r12: a duplicate key arriving under a NEW partition value
    is skipped here, so its partition dir never exists — a raw-batch
    touched set then flagged it as missing and wedged the stream). The
    extra collect is bounded by one batch's distinct values and runs
    while `incoming` is cached, so it costs no extra scan.

    Idempotency at scale: the warehouse key set is unbounded, so it is
    never broadcast/shuffled. Instead (1) semi-join the warehouse against
    the BROADCAST incoming batch -> the set of keys already present
    (bounded by one batch), then (2) anti-join incoming against that
    small set. Both joins broadcast only batch-sized data; the warehouse
    side streams through a scan. Shared by the batch loader and the
    streaming foreachBatch sink — for the streaming side this is also
    what makes micro-batch REPLAY safe: a retried epoch's rows are
    already in the table, so the re-append is a no-op (a blind append
    after a checkpoint race would duplicate them).
    """
    incoming = df
    if _table_exists(spark, table_path):
        existing_keys = spark.read.parquet(table_path).select(key)
        already_present = existing_keys.join(
            F.broadcast(incoming.select(key).distinct()), key, "left_semi"
        ).distinct()
        incoming = incoming.join(F.broadcast(already_present), key, "left_anti")
    # cache: count() + write() below would otherwise execute the whole
    # read + both idempotency joins twice.
    incoming = incoming.cache()
    try:
        n_new = incoming.count()
        if n_new:
            writer = incoming.write.mode("append")
            if partition_by:
                # hive-partitioned layout so downstream maintenance
                # (zorder_maintain) and partition pruning see one
                # directory per key — the clustered-load composition
                writer = writer.partitionBy(*partition_by)
            writer.parquet(table_path)
        if new_values_of is not None:
            vals = [
                r[0]
                for r in incoming.select(new_values_of).distinct().collect()
            ]
            return n_new, vals
    finally:
        incoming.unpersist()
    return n_new


def load_landing_to_table(
    spark: SparkSession,
    cfg: IngestConfig,
    landing_path: str | None = None,
    key: str = "id",
) -> int:
    """Load landed JSON into the managed parquet table, idempotently.

    Returns the number of NEW rows appended. Re-running on the same
    landing data appends nothing (fixes the reference's duplicate
    exposure: at-least-once Pub/Sub redelivery x no insertId,
    src/load/main.py:40 + terraform/main.tf:277-298).
    """
    path = landing_path or cfg.landing_uri
    incoming = (
        read_json(spark, path, POSTS_RAW)
        .filter(F.col(key).isNotNull())
        .dropDuplicates([key])
        .withColumn("processedAt", F.current_timestamp())
        .select(*[f.name for f in POSTS.fields])
    )
    return append_idempotent(spark, incoming, cfg.table_path(), key)


def read_table(spark: SparkSession, cfg: IngestConfig) -> DataFrame:
    from .sinks import swap_recover

    swap_recover(spark, cfg.table_path())
    return spark.read.parquet(cfg.table_path())


def _table_exists(spark: SparkSession, path: str) -> bool:
    # works for any Hadoop FS URI, not just local files; restores a
    # mid-swap crash artifact first, so a parked-but-unswapped table is
    # never mistaken for a missing one (a merge would then silently
    # restart its state from the current batch alone)
    from .sinks import swap_recover

    swap_recover(spark, path)
    jvm = spark._jvm
    jsc = spark._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    return fs.exists(hpath)


def _atomic_swap_rewrite(spark: SparkSession, table_path: str, new_df: DataFrame) -> None:
    """Write `new_df` to a staging dir, then swap it into `table_path`
    via the rename-aside swap (sinks.swap_dir: park the live dir at
    `.old`, rename staging in, delete the park) — the plain-parquet
    stand-in for a transactional format's metadata commit. No crash
    point destroys the previous table; sinks.swap_recover restores the
    mid-swap state."""
    from .sinks import swap_dir

    staging = table_path + ".staging"
    new_df.write.mode("overwrite").parquet(staging)
    swap_dir(spark, staging, table_path)


def merge_upsert(
    spark: SparkSession, table_path: str, updates: DataFrame, key: str = "id"
) -> tuple[int, int]:
    """MERGE semantics on a plain parquet table: WHEN MATCHED update (the
    incoming row replaces the stored row), WHEN NOT MATCHED insert.
    Returns (n_updated, n_inserted).

    This is the transactional-MERGE parity the reference's at-least-once
    load needs (duplicate exposure: src/load/main.py:40 + redelivery
    terraform/main.tf:277-298) for the UPDATE case that append_idempotent
    (insert-only) cannot express. Parquet has no row updates, so matched
    rows are dropped via anti-join against the BROADCAST update batch and
    the union is rewritten through an atomic staged swap. At warehouse
    scale the rewrite should target only partitions containing matched
    keys (partition pruning on the key's partition column); on
    Delta/Iceberg the same join shape becomes a metadata-commit MERGE —
    those format jars are not available in this sandbox, so the staged
    swap is the documented stand-in with identical semantics. The update
    batch is the bounded side (one load run) and is broadcast; the table
    side only streams through a scan."""
    # cache once: the deduped batch is read for its key set, its count,
    # and the union write — uncached, an expensive upstream batch plan
    # would re-execute for each.
    updates = updates.dropDuplicates([key]).cache()
    try:
        if not _table_exists(spark, table_path):
            n_ins = updates.count()
            updates.write.mode("overwrite").parquet(table_path)
            return 0, n_ins

        current = spark.read.parquet(table_path)
        upd_keys = updates.select(key).distinct()
        kept = current.join(F.broadcast(upd_keys), key, "left_anti")
        merged = kept.unionByName(updates)
        # n_updated is counted DIRECTLY as the matched batch keys (semi-join
        # against the table's key column) — deriving it from
        # merged.count() - current.count() silently mis-counts (and can go
        # negative) when the stored table carries duplicate keys, e.g. from
        # a pre-idempotency append; the merge itself collapses those dups.
        n_upd_batch = updates.count()
        n_updated = updates.join(
            current.select(key), key, "left_semi"
        ).count()
        n_inserted = n_upd_batch - n_updated
        _atomic_swap_rewrite(spark, table_path, merged)
        return n_updated, n_inserted
    finally:
        updates.unpersist()


def purge_keys(
    spark: SparkSession, table_path: str, keys: DataFrame, key: str = "id"
) -> int:
    """Delete every row whose key appears in `keys` (right-to-be-forgotten
    / takedown purge). Returns the number of rows removed.

    Parquet has no row deletes, so the purge is a filtered rewrite:
    anti-join the table against the broadcast key list, write to a
    staging dir, atomically swap. At warehouse scale the rewrite targets
    only the partitions that contain purged keys (partition pruning on
    the key's partition column); transactional formats (Delta/Iceberg)
    turn the swap into a metadata commit — the anti-join shape is the
    same. The key list is the bounded side and is broadcast; the table
    streams through.

    A purge must also reach any PERSISTED INDEX ARTIFACTS built over
    the table — a purged id that survives in an index keeps getting
    SERVED (an ANN neighbor, a dedup candidate) even though its row is
    gone. Compose with the family purges: similarity.purge_pq_index
    (ANN codes + epochs, bumps the serve validation stamp),
    dedup.purge_minhash_index, sampling.purge_eval_gram_index,
    multimodal.purge_phash_index — each rewrites only the affected
    epoch partitions via sinks.purge_epoch_partitions.
    """
    from .sinks import swap_recover

    swap_recover(spark, table_path)
    current = spark.read.parquet(table_path)
    kept = current.join(F.broadcast(keys.select(key).distinct()), key, "left_anti")
    kept = kept.cache()
    try:
        n_kept = kept.count()
        n_removed = current.count() - n_kept
        if n_removed:
            _atomic_swap_rewrite(spark, table_path, kept)
    finally:
        kept.unpersist()
    return n_removed
