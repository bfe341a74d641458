"""Source/sink coverage: CSV/text/JSON roundtrips with explicit schemas,
partitioned writes with partition pruning, bucketed tables eliminating
join shuffles (SURVEY.md §2.2 Scans/Sinks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from build_a_cloud_based_batch_etl_pipeline_spark import plans, sinks
from build_a_cloud_based_batch_etl_pipeline_spark.schemas import CUSTOMER
from build_a_cloud_based_batch_etl_pipeline_spark.sources import (
    load_table,
    read_csv,
    read_json,
    read_orc,
    read_text,
)


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    """ORC sink/source roundtrip preserves rows + schema, and filters
    push down to the ORC scan like parquet."""
    cust = load_table(spark, sf_dir, "customer")
    path = str(tmp_path / "cust_orc")
    sinks.write_orc(cust, path, mode="overwrite")
    back = read_orc(spark, path)
    assert back.schema == cust.schema
    assert back.count() == cust.count()
    filtered = back.filter(F.col("c_custkey") == 1).select("c_custkey")
    assert plans.has_pushed_filters(filtered)


def test_csv_roundtrip_explicit_schema(spark, sf_dir, tmp_path):
    cust = load_table(spark, sf_dir, "customer")
    out = str(tmp_path / "cust_csv")
    cust.write.option("header", "true").csv(out)
    back = read_csv(spark, out, CUSTOMER)
    assert back.count() == cust.count()
    assert back.schema == cust.schema
    a = {r.c_custkey: r.c_acctbal for r in cust.collect()}
    b = {r.c_custkey: r.c_acctbal for r in back.collect()}
    assert a == b


def test_json_multiline_array_format(spark, tmp_path):
    """The reference's extract-run format: one JSON array per file
    (reference src/extract/main.py:46-47)."""
    p = tmp_path / "arr.json"
    p.write_text('[{"userId": 1, "id": 1, "title": "a", "body": "b"}, '
                 '{"userId": 2, "id": 2, "title": "c", "body": "d"}]')
    from build_a_cloud_based_batch_etl_pipeline_spark.schemas import POSTS_RAW

    df = read_json(spark, str(p), POSTS_RAW, multiline=True)
    assert df.count() == 2
    assert {r.id for r in df.collect()} == {1, 2}


def test_text_source(spark, tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("line one\nline two\nline three\n")
    df = read_text(spark, str(p))
    assert df.count() == 3
    assert df.columns == ["value"]


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_part")
    sinks.write_parquet_table(orders, out, mode="overwrite", partition_by=["order_year"])
    back = spark.read.parquet(out).filter(F.col("order_year") == 1996)
    plan = plans.physical_plan(back)
    # partition filter must reach the scan, not a post-filter
    assert "PartitionFilters" in plan and "order_year" in plan.split("PartitionFilters", 1)[1][:200]
    expected = orders.filter(F.col("order_year") == 1996).count()
    assert back.count() == expected


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Bucketed tables co-locate join keys: the sort-merge join on the
    bucket column needs ZERO exchanges (the 100 TB repeated-join answer)."""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    sinks.write_bucketed_table(orders, "b_orders", "o_orderkey", n_buckets=8)
    sinks.write_bucketed_table(li, "b_lineitem", "l_orderkey", n_buckets=8)
    joined = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    # disable broadcast so the join must be sort-merge (the case bucketing helps)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        n_shuffles = plans.count_shuffles(joined)
        assert n_shuffles == 0, plans.physical_plan(joined)
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_schema_evolution_on_append(spark, tmp_path):
    """Warehouse appends survive additive schema evolution: a new column
    appears in later files; mergeSchema reads the union schema with nulls
    backfilled for old files — the drift case the reference's fixed
    Terraform DDL cannot absorb (its BigQuery insert rejects unknown
    columns row by row)."""
    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id: long, title: string"
    ).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(3, "c", 7.5)], "id: long, title: string, score: double"
    ).write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "title", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: 7.5}


def test_write_sharded_even_files(spark, sf_dir, tmp_path):
    """Sharded writes produce the computed number of parquet files with
    near-uniform row counts; range-sharding keeps shards key-ordered."""
    import glob

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    out = str(tmp_path / "shards")
    shards = sinks.write_sharded(docs, out, target_rows_per_file=100)
    assert shards == -(-n // 100)
    files = glob.glob(out + "/part-*.parquet")
    assert len(files) == shards
    sizes = [spark.read.parquet(f).count() for f in files]
    assert sum(sizes) == n
    assert max(sizes) - min(sizes) <= max(10, n // shards // 2)

    out2 = str(tmp_path / "shards_ranged")
    sinks.write_sharded(docs, out2, target_rows_per_file=100, order_by="doc_id")
    ranges = []
    for f in glob.glob(out2 + "/part-*.parquet"):
        r = spark.read.parquet(f).agg(
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
        ).first()
        ranges.append((r.lo, r.hi))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # non-overlapping key ranges -> prunable shards


def test_compact_table_reduces_files_and_preserves_rows(spark, tmp_path):
    """Many tiny appended files -> few uniform files, identical rows, and
    partition pruning still works when a partition column is kept."""
    import glob

    path = str(tmp_path / "frag")
    for i in range(8):  # 8 separate appends = at least 8 files
        spark.createDataFrame(
            [(i * 10 + j, f"d{i % 2}") for j in range(10)], "id: long, day: string"
        ).coalesce(1).write.mode("append").parquet(path)
    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 8
    rows_before = {(r.id, r.day) for r in spark.read.parquet(path).collect()}

    from build_a_cloud_based_batch_etl_pipeline_spark import sinks

    sinks.compact_table(spark, path, target_rows_per_file=40, partition_col="day")
    rows_after = {(r.id, r.day) for r in spark.read.parquet(path).collect()}
    assert rows_after == rows_before
    files_after = len(glob.glob(f"{path}/day=*/*.parquet"))
    assert files_after < before, (before, files_after)
    # hive layout retained -> pruning-capable path structure
    assert glob.glob(f"{path}/day=d0") and glob.glob(f"{path}/day=d1")


def test_expire_partitions_drops_only_unkept(spark, tmp_path):
    path = str(tmp_path / "retain")
    df = spark.createDataFrame(
        [(i, f"2024-01-0{1 + i % 3}") for i in range(30)], "id: long, ingest_date: string"
    )
    df.write.partitionBy("ingest_date").mode("overwrite").parquet(path)

    from build_a_cloud_based_batch_etl_pipeline_spark import sinks

    removed = sinks.expire_partitions(
        spark, path, "ingest_date", keep=["2024-01-02", "2024-01-03"]
    )
    assert removed == 1
    left = spark.read.parquet(path)
    assert left.select("ingest_date").distinct().count() == 2
    assert left.filter(F.col("ingest_date") == "2024-01-01").count() == 0
    # idempotent: nothing more to remove
    assert sinks.expire_partitions(
        spark, path, "ingest_date", keep=["2024-01-02", "2024-01-03"]
    ) == 0


def test_load_events_normalizes_all_ts_physical_types(spark, tmp_path):
    """The events loader must yield session-TimestampType `ts` whether
    the parquet stores TIMESTAMP(NANOS) (legacy fixtures, read as int64
    via the nanos conf), TIMESTAMP_NTZ(us) (current fixtures), or a
    Spark-written TIMESTAMP_LTZ — the r4 fixture regeneration flipped
    nanos->micros and broke 29 queries until this normalization."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import types as T
    from build_a_cloud_based_batch_etl_pipeline_spark.sources import load_table

    base = dt.datetime(2024, 1, 1, 12, 0, 0, 123456)
    rows = {
        "event_id": [1], "user_id": [7], "event_type": ["click"],
        "value": [1.0], "props": ["{}"],
    }
    expect = base

    for unit in ("ns", "us"):
        d = tmp_path / f"ev_{unit}"
        d.mkdir()
        tbl = pa.table({**rows, "ts": pa.array([base], type=pa.timestamp(unit))})
        pq.write_table(tbl, str(d / "events.parquet"))
        out = load_table(spark, str(d), "events")
        assert isinstance(out.schema["ts"].dataType, T.TimestampType), unit
        got = out.collect()[0].ts
        assert got == expect, (unit, got)

    # Spark-written LTZ round-trip
    d = tmp_path / "ev_ltz"
    d.mkdir()
    spark.createDataFrame(
        [(1, base, 7, "click", 1.0, "{}")],
        "event_id: long, ts: timestamp, user_id: long, event_type: string, value: double, props: string",
    ).write.parquet(str(d / "events.parquet"))
    out = load_table(spark, str(d), "events")
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    assert out.collect()[0].ts == expect


def test_swap_dir_crash_states_are_recoverable(spark, tmp_path):
    """swap_dir parks the live dir at `.old` before renaming staging in,
    so no crash point loses data: the mid-swap state (live missing,
    `.old` present) is mechanically restored by swap_recover, and a
    leftover `.old` from a crash after the second rename is swept by the
    next swap."""
    import os

    from build_a_cloud_based_batch_etl_pipeline_spark import sinks

    path = str(tmp_path / "tbl")
    spark.range(5).write.parquet(path)
    spark.range(10).write.parquet(path + ".staging1")

    # normal swap: new data in, no .old residue
    sinks.swap_dir(spark, path + ".staging1", path)
    assert spark.read.parquet(path).count() == 10
    assert not os.path.exists(path + ".old")

    # crash state (a): live renamed aside, staging never moved
    os.rename(path, path + ".old")
    assert sinks.swap_recover(spark, path) is True
    assert spark.read.parquet(path).count() == 10
    # idempotent / no-op when healthy
    assert sinks.swap_recover(spark, path) is False

    # crash state (b): .old residue left behind -> next swap sweeps it
    spark.range(3).write.parquet(path + ".old")
    spark.range(7).write.parquet(path + ".staging2")
    sinks.swap_dir(spark, path + ".staging2", path)
    assert spark.read.parquet(path).count() == 7
    assert not os.path.exists(path + ".old")

    # first-ever swap (no live dir yet)
    fresh = str(tmp_path / "fresh")
    spark.range(4).write.parquet(fresh + ".staging")
    sinks.swap_dir(spark, fresh + ".staging", fresh)
    assert spark.read.parquet(fresh).count() == 4


def test_read_parquet_evolving_normalizes_generations(spark, tmp_path):
    """Files from three schema generations (base, +quality column,
    +lang column) read back as ONE stable target schema: missing
    columns are typed NULLs, order follows the target, values survive."""
    from pyspark.sql import types as T

    from build_a_cloud_based_batch_etl_pipeline_spark import sources

    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "doc_id: long, text: string"
    ).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(2, "b", 0.5)], "doc_id: long, text: string, quality: double"
    ).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(3, "c", 0.9, "en")],
        "doc_id: long, text: string, quality: double, lang: string",
    ).coalesce(1).write.mode("append").parquet(path)

    target = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("quality", T.DoubleType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    out = sources.read_parquet_evolving(spark, path, target)
    assert [f.name for f in out.schema.fields] == ["doc_id", "text", "quality", "lang"]
    got = {r.doc_id: (r.text, r.quality, r.lang) for r in out.collect()}
    assert got == {
        1: ("a", None, None),
        2: ("b", 0.5, None),
        3: ("c", 0.9, "en"),
    }


def test_commit_epoch_partition_protocol(spark, tmp_path):
    """Atomic epoch-partition append: commit -> True, replay -> False
    with no data change; a stale staging dir from a crash between the
    staging write and the rename is swept on the replay skip; a
    different lineage raises loudly."""
    import glob
    import os

    import pytest

    from build_a_cloud_based_batch_etl_pipeline_spark import sinks

    table = str(tmp_path / "epochs")
    df = spark.range(5).withColumnRenamed("id", "v")
    assert sinks.commit_epoch_partition(spark, df, table, "lin1", 0) is True
    assert spark.read.parquet(table).count() == 5
    # replay: skip, no duplicate rows
    assert sinks.commit_epoch_partition(spark, df, table, "lin1", 0) is False
    assert spark.read.parquet(table).count() == 5
    # crash artifact: stale staging next to the committed partition is
    # swept by the replay skip
    stale = f"{table}/.epoch=lin1-0.staging"
    os.makedirs(stale, exist_ok=True)
    with open(f"{stale}/part-junk", "w") as f:
        f.write("x")
    assert sinks.commit_epoch_partition(spark, df, table, "lin1", 0) is False
    assert not os.path.exists(stale), "stale staging must be swept"
    # second epoch appends; first epoch's files untouched
    snap = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{table}/**/*", recursive=True)
        if os.path.isfile(p)
    }
    assert sinks.commit_epoch_partition(spark, df, table, "lin1", 1) is True
    assert spark.read.parquet(table).count() == 10
    for p, mt in snap.items():
        assert os.path.getmtime(p) == mt
    # lineage mismatch is loud
    with pytest.raises(RuntimeError, match="lineage"):
        sinks.commit_epoch_partition(spark, df, table, "lin2", 0)


def test_versioned_table_time_travel(spark, sf_dir, tmp_path):
    """Versioned publish / time travel / crash-orphan sweep / vacuum."""
    from build_a_cloud_based_batch_etl_pipeline_spark import sinks

    root = str(tmp_path / "versioned")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    v1 = sinks.publish_version(spark, orders.limit(100), root)
    v2 = sinks.publish_version(spark, orders.limit(200), root)
    assert (v1, v2) == (1, 2)
    assert sinks.current_version(spark, root) == 2
    # default read = published; explicit version = time travel
    assert sinks.read_version(spark, root).count() == 200
    assert sinks.read_version(spark, root, version=1).count() == 100

    # crash between data rename and pointer flip: orphan v=3 exists,
    # pointer still says 2 -> readers unaffected, next publish sweeps it
    orders.limit(10).write.parquet(f"{root}/v=3")
    assert sinks.current_version(spark, root) == 2
    assert sinks.read_version(spark, root).count() == 200
    v3 = sinks.publish_version(spark, orders.limit(300), root)
    assert v3 == 3
    assert sinks.read_version(spark, root).count() == 300

    # vacuum: keep last 2 published, current always survives
    removed = sinks.vacuum_versions(spark, root, keep_last=2)
    assert removed == 1
    assert sinks.read_version(spark, root, version=2).count() == 200
    try:
        sinks.read_version(spark, root, version=1)
        raise AssertionError("vacuumed version must not be readable")
    except FileNotFoundError:
        pass


def test_versioned_table_pointer_missing_fallback(spark, sf_dir, tmp_path):
    """A lost pointer file (crash in the flip window) falls back to the
    newest version dir — which is exactly the just-committed version."""
    from build_a_cloud_based_batch_etl_pipeline_spark import sinks

    root = str(tmp_path / "versioned2")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    sinks.publish_version(spark, orders.limit(50), root)
    import os
    os.remove(f"{root}/_VERSION")
    assert sinks.current_version(spark, root) == 1
    assert sinks.read_version(spark, root).count() == 50


def test_versioned_table_diff_between_versions(spark, sf_dir, tmp_path):
    """diff_snapshots over two retained versions of a versioned table:
    the end-to-end CDC story (publish v1, publish edited v2, diff)."""
    from pyspark.sql import functions as F

    from build_a_cloud_based_batch_etl_pipeline_spark import sinks
    from build_a_cloud_based_batch_etl_pipeline_spark.operators.dq import (
        diff_snapshots,
    )

    root = str(tmp_path / "versioned_diff")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    sinks.publish_version(spark, orders.filter(F.col("o_orderkey") <= 400), root)
    v2_df = (
        orders.filter(F.col("o_orderkey").between(101, 500))
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") <= 150, F.col("o_totalprice") + 1.0)
            .otherwise(F.col("o_totalprice")),
        )
    )
    sinks.publish_version(spark, v2_df, root)

    delta = diff_snapshots(
        sinks.read_version(spark, root, version=1),
        sinks.read_version(spark, root, version=2),
        "o_orderkey",
        ["o_totalprice"],
    )
    by_type = {r.change_type: r.n for r in delta.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    n_keys = orders.filter(F.col("o_orderkey") <= 500).count()
    n_old = orders.filter(F.col("o_orderkey") <= 400).count()
    n_new = orders.filter(F.col("o_orderkey").between(101, 500)).count()
    n_changed = orders.filter(F.col("o_orderkey").between(101, 150)).count()
    assert by_type.get("added", 0) == n_keys - n_old      # keys 401..500
    assert by_type.get("removed", 0) == n_keys - n_new    # keys 1..100
    assert by_type.get("changed", 0) == n_changed         # keys 101..150


def test_shard_manifest_roundtrip_and_corruption_detection(spark, sf_dir, tmp_path):
    """write_manifest -> verify_manifest is clean on an intact copy;
    byte corruption, row tampering, deletion, and extra files are each
    reported in their own bucket."""
    from build_a_cloud_based_batch_etl_pipeline_spark import sinks

    path = str(tmp_path / "shards")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    sinks.write_sharded(orders, path, target_rows_per_file=500)
    m = sinks.write_manifest(spark, path)
    assert m["total_rows"] == orders.count()
    assert m["n_files"] == len(m["files"]) >= 2
    assert all(len(e["sha256"]) == 64 for e in m["files"])

    assert sinks.verify_manifest(spark, path)["ok"]

    # corrupt one shard (append a byte), delete another, add an extra
    import glob as g
    import shutil

    files = sorted(g.glob(f"{path}/*.parquet"))
    with open(files[0], "ab") as f:
        f.write(b"\x00")
    # drop Hadoop's local-FS .crc sidecar for the tampered file: object
    # stores have no sidecars, and the point is that the MANIFEST (not
    # a local checksum file) catches the corruption
    import os

    crc = f"{path}/.{files[0].rsplit('/', 1)[-1]}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    victim = files[1]
    shutil.move(victim, f"{path}/extra-not-in-manifest.parquet")
    got = sinks.verify_manifest(spark, path)
    assert not got["ok"]
    assert got["corrupt"] == [files[0].rsplit("/", 1)[-1]]
    assert got["missing"] == [victim.rsplit("/", 1)[-1]]
    assert got["extra"] == ["extra-not-in-manifest.parquet"]


def test_write_warehouse_dispatch(spark, sf_dir, tmp_path):
    """write_warehouse (reference src/load/main.py:40,47 parity): with
    the target connector on the classpath it writes through
    format(fmt); without it (BigQuery in this sandbox) it lands the
    managed-parquet fallback with the same mode semantics. The manifest
    return names the sink that actually ran."""
    import pytest

    df = spark.read.parquet(f"{sf_dir}/nation.parquet")

    # built-in formats resolve; the BigQuery connector jar is absent here
    assert sinks.warehouse_format_available(spark, "parquet")
    bq_present = sinks.warehouse_format_available(spark, "bigquery")

    # present-branch dispatch, exercised via a built-in format
    direct = str(tmp_path / "direct")
    got = sinks.write_warehouse(df, direct, fmt="parquet", mode="overwrite")
    assert got["sink"] == "parquet"
    assert spark.read.parquet(direct).count() == df.count()

    # absent-branch dispatch: BigQuery falls back to the managed table
    if bq_present:  # pragma: no cover - only on a real GCP deployment
        pytest.skip("bigquery connector present; fallback branch untestable")
    got = sinks.write_warehouse(
        df,
        "analytics.nation",
        fmt="bigquery",
        mode="append",
        fallback_root=str(tmp_path / "wh"),
    )
    assert got["sink"] == "parquet_fallback"
    back = spark.read.parquet(str(tmp_path / "wh" / "analytics" / "nation"))
    assert back.count() == df.count()
    # append semantics carry through the fallback
    sinks.write_warehouse(
        df, "analytics.nation", fmt="bigquery", mode="append",
        fallback_root=str(tmp_path / "wh"),
    )
    assert spark.read.parquet(
        str(tmp_path / "wh" / "analytics" / "nation")
    ).count() == 2 * df.count()

    # no fallback and no jar is an explicit error, not a silent no-op
    with pytest.raises(ValueError):
        sinks.write_warehouse(df, "analytics.nation", fmt="bigquery")


def test_write_warehouse_bigquery_jar():
    """Real BigQuery write — runs only where the connector jar (and GCP
    credentials) exist; in this sandbox it records as skipped so the
    dispatch surface is visibly tested-but-environment-blocked."""
    import pytest

    pytest.importorskip("google.cloud.bigquery")
    pytest.skip("no GCP credentials in sandbox")
