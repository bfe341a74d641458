"""Golden ingest tests replicating the reference's E/L semantics
(SURVEY.md §5 item 3): extract -> land -> load -> table contents; the
idempotency property the reference lacks; corrupt-record handling."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from build_a_cloud_based_batch_etl_pipeline_spark.config import IngestConfig
from build_a_cloud_based_batch_etl_pipeline_spark import ingest

POSTS_FIXTURE = [
    {"userId": 1, "id": 1, "title": "t1", "body": "b1"},
    {"userId": 1, "id": 2, "title": "t2", "body": "b2\nwith newline"},
    {"userId": 2, "id": 3, "title": "t3", "body": "b3"},
]


def _cfg(tmp_path) -> IngestConfig:
    return IngestConfig(
        source_url="fake://posts",
        landing_uri=str(tmp_path / "landing"),
        warehouse_uri=str(tmp_path / "warehouse"),
        checkpoint_uri=str(tmp_path / "ckpt"),
    )


def _fake_fetcher(payload):
    return lambda url: json.dumps(payload).encode()


def test_extract_load_end_to_end(spark, tmp_path):
    cfg = _cfg(tmp_path)
    ingest.extract_to_landing(spark, cfg, fetcher=_fake_fetcher(POSTS_FIXTURE), run_ts=1700000000)
    n = ingest.load_landing_to_table(spark, cfg)
    assert n == 3
    table = ingest.read_table(spark, cfg)
    rows = {r.id: r for r in table.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2].body == "b2\nwith newline"
    # processedAt populated (the reference's vestigial Transform column)
    assert all(r.processedAt is not None for r in rows.values())


def test_load_is_idempotent(spark, tmp_path):
    """Reloading the same landing data must append nothing — the
    at-least-once duplicate exposure the reference ships
    (src/load/main.py:40 + Pub/Sub redelivery)."""
    cfg = _cfg(tmp_path)
    ingest.extract_to_landing(spark, cfg, fetcher=_fake_fetcher(POSTS_FIXTURE), run_ts=1700000000)
    assert ingest.load_landing_to_table(spark, cfg) == 3
    assert ingest.load_landing_to_table(spark, cfg) == 0
    assert ingest.read_table(spark, cfg).count() == 3


def test_single_object_payload_normalized(spark, tmp_path):
    """The reference's single-object branch (src/load/main.py:45-51)."""
    cfg = _cfg(tmp_path)
    one = {"userId": 9, "id": 99, "title": "solo", "body": "x"}
    ingest.extract_to_landing(spark, cfg, fetcher=_fake_fetcher(one), run_ts=1700000000)
    assert ingest.load_landing_to_table(spark, cfg) == 1
    assert ingest.read_table(spark, cfg).first().id == 99


def test_incremental_runs_append_only_new(spark, tmp_path):
    cfg = _cfg(tmp_path)
    ingest.extract_to_landing(spark, cfg, fetcher=_fake_fetcher(POSTS_FIXTURE), run_ts=1700000000)
    ingest.load_landing_to_table(spark, cfg)
    # second run: one overlapping id, one new
    newer = [
        {"userId": 2, "id": 3, "title": "t3-dup", "body": "redelivered"},
        {"userId": 3, "id": 4, "title": "t4", "body": "b4"},
    ]
    ingest.extract_to_landing(spark, cfg, fetcher=_fake_fetcher(newer), run_ts=1700086400)
    assert ingest.load_landing_to_table(spark, cfg) == 1
    table = ingest.read_table(spark, cfg)
    assert table.count() == 4
    # first write wins for the duplicated key (no overwrite on redelivery)
    assert table.filter(F.col("id") == 3).first().title == "t3"


def test_extract_many_parallel(spark, tmp_path):
    cfg = _cfg(tmp_path)
    payloads = {
        "fake://a": [{"userId": 1, "id": 10, "title": "a", "body": ""}],
        "fake://b": [{"userId": 1, "id": 11, "title": "b", "body": ""}],
        "fake://c": {"userId": 1, "id": 12, "title": "c", "body": ""},
    }
    fetcher = lambda url: json.dumps(payloads[url]).encode()
    ingest.extract_many_to_landing(
        spark, cfg, urls=sorted(payloads), fetcher=fetcher, run_ts=1700000000
    )
    assert ingest.load_landing_to_table(spark, cfg) == 3


def test_malformed_rows_do_not_poison_load(spark, tmp_path):
    """PERMISSIVE read: a malformed row yields nulls, the batch still
    loads (vs the reference raising on any per-row insert error,
    src/load/main.py:41-43). Null-key rows are filtered."""
    cfg = _cfg(tmp_path)
    landing = tmp_path / "landing" / "ingest_date=2023-11-14" / "run=x"
    landing.mkdir(parents=True)
    with open(landing / "part-0.json", "w") as f:
        f.write('{"userId": 1, "id": 21, "title": "ok", "body": "y"}\n')
        f.write("THIS IS NOT JSON\n")
        f.write('{"userId": "not-an-int", "id": 22, "title": "coerce-fail", "body": "z"}\n')
    n = ingest.load_landing_to_table(spark, cfg)
    table = ingest.read_table(spark, cfg)
    ids = {r.id for r in table.collect()}
    assert 21 in ids
    assert n >= 1


def test_purge_keys_removes_and_preserves(spark, tmp_path):
    """Purge removes exactly the listed keys, preserves everything else,
    and is a no-op (no rewrite) when no key matches."""
    cfg = _cfg(tmp_path)
    ingest.extract_to_landing(spark, cfg, fetcher=_fake_fetcher(POSTS_FIXTURE), run_ts=1700000000)
    ingest.load_landing_to_table(spark, cfg)
    before = {r.id for r in ingest.read_table(spark, cfg).collect()}
    assert len(before) == 3

    doomed = spark.createDataFrame([(min(before),)], "id: long")
    removed = ingest.purge_keys(spark, cfg.table_path(), doomed)
    assert removed == 1
    after = {r.id for r in ingest.read_table(spark, cfg).collect()}
    assert after == before - {min(before)}

    none = spark.createDataFrame([(999999,)], "id: long")
    assert ingest.purge_keys(spark, cfg.table_path(), none) == 0
    assert {r.id for r in ingest.read_table(spark, cfg).collect()} == after


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    """MERGE parity on plain parquet: matched keys are replaced by the
    incoming row, unmatched keys are inserted, untouched rows survive,
    and a re-run of the same batch is idempotent (0 inserts)."""
    path = str(tmp_path / "merge_table")
    schema = "id: long, val: string"
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], schema)

    # first merge onto a non-existent table = pure insert
    n_upd, n_ins = ingest.merge_upsert(spark, path, base)
    assert (n_upd, n_ins) == (0, 3)

    batch = spark.createDataFrame([(2, "B2"), (4, "d")], schema)
    n_upd, n_ins = ingest.merge_upsert(spark, path, batch)
    assert (n_upd, n_ins) == (1, 1)
    rows = {r.id: r.val for r in spark.read.parquet(path).collect()}
    assert rows == {1: "a", 2: "B2", 3: "c", 4: "d"}

    # replaying the same batch updates in place, inserts nothing new
    n_upd, n_ins = ingest.merge_upsert(spark, path, batch)
    assert (n_upd, n_ins) == (2, 0)
    assert {r.id: r.val for r in spark.read.parquet(path).collect()} == rows


def test_merge_upsert_counts_with_duplicate_stored_keys(spark, tmp_path):
    """A table holding DUPLICATE keys (e.g. from a pre-idempotency append)
    must still report (n_updated, n_inserted) from the batch's view: the
    merge collapses the stored dups, which used to skew a
    merged-minus-current derivation (n_inserted could go negative)."""
    path = str(tmp_path / "dup_table")
    schema = "id: long, val: string"
    # raw append wrote key 1 twice
    spark.createDataFrame(
        [(1, "a"), (1, "a_dup"), (2, "b")], schema
    ).write.mode("overwrite").parquet(path)

    batch = spark.createDataFrame([(1, "A"), (3, "c")], schema)
    n_upd, n_ins = ingest.merge_upsert(spark, path, batch)
    assert (n_upd, n_ins) == (1, 1)
    rows = {r.id: r.val for r in spark.read.parquet(path).collect()}
    assert rows == {1: "A", 2: "b", 3: "c"}


@pytest.mark.parametrize("scheme", ["plain", "file_uri"])
def test_extract_stream_publish_over_uri(spark, tmp_path, scheme):
    """The remote-filesystem seam (VERDICT r6 item 6): the full
    extract -> incremental (streaming, exactly-once) -> publish ->
    manifest chain parameterized over a NON-plain-path URI. The sandbox
    has no object-store credentials, so `file://` absolute URIs are the
    closest stand-in that still forces every path through the Hadoop
    FileSystem API with an explicit scheme — the seam a gs://
    s3a:// deployment hits first (reference src/extract/main.py:46-49,
    src/load/main.py:26-29). Any str(path) concatenation, glob.glob, or
    open() on a URI string breaks under this parameterization."""
    from build_a_cloud_based_batch_etl_pipeline_spark import sinks
    from build_a_cloud_based_batch_etl_pipeline_spark.streaming.ingest_stream import (
        incremental_load,
    )

    def u(p) -> str:
        return f"file://{p}" if scheme == "file_uri" else str(p)

    cfg = IngestConfig(
        source_url="fake://posts",
        landing_uri=u(tmp_path / "landing"),
        warehouse_uri=u(tmp_path / "warehouse"),
        checkpoint_uri=u(tmp_path / "ckpt"),
    )
    out_dir = ingest.extract_to_landing(
        spark, cfg, fetcher=_fake_fetcher(POSTS_FIXTURE), run_ts=1700000000
    )
    assert out_dir.startswith(cfg.landing_uri)
    assert incremental_load(spark, cfg) == 3
    # second tick: nothing new — streaming checkpoint works over the URI
    assert incremental_load(spark, cfg) == 0
    assert ingest.read_table(spark, cfg).count() == 3

    # publish a verified copy next to the warehouse, over the same URI
    pub = u(tmp_path / "published")
    sinks.write_parquet_table(
        ingest.read_table(spark, cfg), pub, mode="overwrite"
    )
    manifest = sinks.write_manifest(spark, pub)
    assert manifest["total_rows"] == 3
    assert all(f["rows"] >= 0 for f in manifest["files"])
    assert sinks.verify_manifest(spark, pub)["ok"]
