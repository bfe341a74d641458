"""Job entry-point parity (reference R8/R10): envelope semantics of the
scheduled extract/load handlers (src/extract/main.py:57-76,
src/load/main.py:58-84) as one spark-submit-able main()."""

from __future__ import annotations

import json

from build_a_cloud_based_batch_etl_pipeline_spark import job
from build_a_cloud_based_batch_etl_pipeline_spark.config import IngestConfig

POSTS_FIXTURE = [
    {"userId": 1, "id": 1, "title": "t1", "body": "b1"},
    {"userId": 2, "id": 2, "title": "t2", "body": "b2"},
]


def _cfg(tmp_path) -> IngestConfig:
    return IngestConfig(
        source_url="fake://posts",
        landing_uri=str(tmp_path / "landing"),
        warehouse_uri=str(tmp_path / "warehouse"),
        checkpoint_uri=str(tmp_path / "ckpt"),
    )


def _fetcher(url):
    return json.dumps(POSTS_FIXTURE).encode()


def test_pipeline_envelope_and_idempotent_rerun(spark, tmp_path):
    """One tick: success envelope with landing file + appended count; a
    retried tick on the same payload re-lands but appends zero rows."""
    cfg = _cfg(tmp_path)
    env1 = job.run_pipeline(spark, cfg, fetcher=_fetcher)
    assert env1["success"] is True
    assert env1["rows_appended"] == 2
    assert env1["file"].startswith(str(tmp_path / "landing"))

    env2 = job.run_pipeline(spark, cfg, fetcher=_fetcher)
    assert env2["success"] is True
    assert env2["rows_appended"] == 0  # idempotent re-run


def test_extract_failure_envelope(spark, tmp_path):
    """Handler parity: failures become {"success": False, "error": ...}
    envelopes (reference returns the same shape with HTTP 500), and the
    pipeline short-circuits without attempting the load."""

    def boom(url):
        raise RuntimeError("upstream API down")

    env = job.run_pipeline(spark, _cfg(tmp_path), fetcher=boom)
    assert env["success"] is False
    assert "upstream API down" in env["error"]


def test_stream_step_envelope(spark, tmp_path):
    """The availableNow streaming step drains landed files exactly once:
    first tick appends, second tick (no new files) appends zero."""
    cfg = _cfg(tmp_path)
    assert job.run_extract(spark, cfg, fetcher=_fetcher)["success"]
    env = job.run_stream(spark, cfg)
    assert env["success"] is True
    assert env["rows_appended"] == 2
    env2 = job.run_stream(spark, cfg)
    assert env2["success"] is True
    assert env2["rows_appended"] == 0


def test_job_compact_step(spark, tmp_path, monkeypatch):
    """The compact step returns a success envelope after a real load and
    a failure envelope (exit-1 signal) when the table doesn't exist."""
    from build_a_cloud_based_batch_etl_pipeline_spark import job
    from build_a_cloud_based_batch_etl_pipeline_spark.config import IngestConfig

    cfg = IngestConfig(
        source_url="fake://posts",
        landing_uri=str(tmp_path / "landing"),
        warehouse_uri=str(tmp_path / "warehouse"),
        checkpoint_uri=str(tmp_path / "ckpt"),
    )
    missing = job.run_compact(spark, cfg)
    assert missing["success"] is False

    payload = json.dumps(
        [{"userId": 1, "id": i, "title": f"t{i}", "body": ""} for i in range(50)]
    ).encode()
    assert job.run_pipeline(spark, cfg, fetcher=lambda url: payload)["success"]
    out = job.run_compact(spark, cfg)
    assert out["success"] is True and out["files"] >= 1
    from build_a_cloud_based_batch_etl_pipeline_spark import ingest
    assert ingest.read_table(spark, cfg).count() == 50


def test_stream_validated_step_envelope(spark, tmp_path):
    """The validated streaming step reports appended AND quarantined
    counts in one envelope (the quarantine-spike alert signal), and a
    drained rerun moves nothing."""
    import json as _json

    bad_fixture = POSTS_FIXTURE + [
        {"userId": None, "id": 3, "title": "no-user", "body": "b3"},
    ]
    cfg = _cfg(tmp_path)
    assert job.run_extract(
        spark, cfg, fetcher=lambda url: _json.dumps(bad_fixture).encode()
    )["success"]
    env = job.run_validated_stream(spark, cfg)
    assert env["success"] is True
    assert env["rows_appended"] == 2
    assert env["rows_quarantined"] == 1
    quar = spark.read.parquet(f"{cfg.warehouse_uri}/_quarantine")
    assert quar.count() == 1 and quar.first().reasons == "userid_null"
    env2 = job.run_validated_stream(spark, cfg)
    assert (env2["rows_appended"], env2["rows_quarantined"]) == (0, 0)


def test_job_zorder_maintain_step(spark, tmp_path, monkeypatch):
    """The zorder-maintain step: missing/short ENGINE_ZORDER_COLS is a
    failure envelope (exit-1 signal, no work attempted); with a real
    hive-partitioned table and cols set, the first run re-clusters
    every partition and a rerun reports them all clean — the dirty-only
    contract surfaced through the scheduled-job envelope."""
    from build_a_cloud_based_batch_etl_pipeline_spark import job
    from build_a_cloud_based_batch_etl_pipeline_spark.sinks import (
        write_parquet_table,
    )

    cfg = _cfg(tmp_path)
    monkeypatch.delenv("ENGINE_ZORDER_COLS", raising=False)
    out = job.run_zorder_maintain(spark, cfg)
    assert out["success"] is False and "ENGINE_ZORDER_COLS" in out["error"]

    table = str(tmp_path / "orders_zt")
    df = spark.range(600).selectExpr(
        "id",
        "CAST(id % 3 AS STRING) AS grp",
        "CAST(id * 7 % 101 AS LONG) AS x",
        "CAST(id * 13 % 97 AS LONG) AS y",
    )
    write_parquet_table(df, table, mode="overwrite", partition_by=["grp"])
    monkeypatch.setenv("ENGINE_ZORDER_TABLE", table)
    monkeypatch.setenv("ENGINE_ZORDER_COLS", "x,y")
    out = job.run_zorder_maintain(spark, cfg)
    assert out["success"] is True
    assert out["partitions_clustered"] == 3 and out["partitions_skipped"] == 0
    again = job.run_zorder_maintain(spark, cfg)
    assert again["success"] is True
    assert again["partitions_clustered"] == 0 and again["partitions_skipped"] == 3
    assert spark.read.parquet(table).count() == 600
