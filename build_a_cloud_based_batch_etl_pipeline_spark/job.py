"""Scheduled-job entry point: the reference's R8/R10 handler parity.

The reference wraps extract and load in HTTP Cloud Function handlers that
return success/error envelopes — ``{"success": True, "message": ...,
"file": ...}`` / ``{"success": False, "error": str(e)}`` with a non-2xx
status on failure (reference src/extract/main.py:57-76,
src/load/main.py:58-84) — fired by a 6-hour Cloud Scheduler cron
(terraform/cloud_scheduler.tf:4). The engine's equivalent of one cron
tick is one ``spark-submit`` run of this module: the same envelope dict
goes to stdout as one JSON line, the process exit code carries the
success bit, and the ``stream`` step's availableNow trigger gives the
"process everything new, then stop" semantics the cron expects.

Steps:

- ``extract``  : API -> JSON-lines landing zone      (reference R1-R3)
- ``load``     : landing -> warehouse, idempotent    (reference R4-R6)
- ``pipeline`` : extract then load, one envelope     (reference full tick)
- ``stream``   : incremental exactly-once load via the Structured
                 Streaming file source, availableNow (reference R7/R11)

Re-running any step against the same landing data appends nothing (the
idempotent append fixes the reference's duplicate exposure,
src/load/main.py:40 + terraform/main.tf:277-298), so a mis-fired or
retried cron tick is safe — the envelope reports ``rows_appended: 0``.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any

from pyspark.sql import SparkSession

from . import ingest
from .config import IngestConfig


def run_extract(
    spark: SparkSession, cfg: IngestConfig, fetcher: ingest.Fetcher | None = None
) -> dict[str, Any]:
    """Extract step with the reference's success/error envelope."""
    try:
        out_dir = ingest.extract_to_landing(spark, cfg, fetcher=fetcher)
        return {
            "success": True,
            "message": f"Data landed to {out_dir}",
            "file": out_dir,
        }
    except Exception as e:  # envelope, not stack trace: handler parity
        return {"success": False, "error": str(e)}


def run_load(
    spark: SparkSession, cfg: IngestConfig, landing_path: str | None = None
) -> dict[str, Any]:
    """Load step with the reference's success/error envelope."""
    try:
        n = ingest.load_landing_to_table(spark, cfg, landing_path)
        return {
            "success": True,
            "message": f"Loaded {n} new rows into {cfg.table_path()}",
            "rows_appended": n,
        }
    except Exception as e:
        return {"success": False, "error": str(e)}


def run_stream(spark: SparkSession, cfg: IngestConfig) -> dict[str, Any]:
    """Incremental exactly-once load (availableNow) with envelope."""
    try:
        from .streaming.ingest_stream import incremental_load

        n = incremental_load(spark, cfg)
        return {
            "success": True,
            "message": f"Streamed {n} new rows into {cfg.table_path()}",
            "rows_appended": n,
        }
    except Exception as e:
        return {"success": False, "error": str(e)}


def run_pipeline(
    spark: SparkSession, cfg: IngestConfig, fetcher: ingest.Fetcher | None = None
) -> dict[str, Any]:
    """One full scheduled tick: extract -> load, short-circuiting on
    extract failure (the reference runs these as two independently
    triggered functions; one envelope for the pair is the spark-submit
    shape of the same contract)."""
    extracted = run_extract(spark, cfg, fetcher=fetcher)
    if not extracted["success"]:
        return extracted
    loaded = run_load(spark, cfg, landing_path=extracted["file"])
    if not loaded["success"]:
        return loaded
    return {
        "success": True,
        "message": f"{extracted['message']}; {loaded['message']}",
        "file": extracted["file"],
        "rows_appended": loaded["rows_appended"],
    }


def run_compact(spark: SparkSession, cfg: IngestConfig) -> dict[str, Any]:
    """Scheduled table maintenance: compact the warehouse table's small
    files (the reference has no maintenance surface at all — BigQuery
    does this invisibly; on plain parquet it is an explicit cron step,
    same 6-hour-tick shape as extract)."""
    from . import sinks

    try:
        files = sinks.compact_table(
            spark, cfg.table_path(), target_rows_per_file=1_000_000
        )
        return {
            "success": True,
            "message": f"compacted {cfg.table_path()} to {files} file(s)",
            "files": files,
        }
    except Exception as exc:  # surfaced as the envelope, exit 1
        return {"success": False, "error": f"compact failed: {exc}"}


def run_validated_stream(
    spark: SparkSession, cfg: IngestConfig
) -> dict[str, Any]:
    """Validated incremental load with the quarantine reject path
    (streaming.ingest_stream.incremental_load_validated): valid rows
    append idempotently, rule-failing rows land epoch-partitioned with
    reason codes. The envelope carries both counts so the scheduler can
    alert on a quarantine spike — the ops signal the reference's silent
    per-row BigQuery insert errors (src/load/main.py:41-43) never gave
    anyone."""
    from .streaming.ingest_stream import incremental_load_validated

    try:
        got = incremental_load_validated(
            spark, cfg, quarantine_uri=f"{cfg.warehouse_uri}/_quarantine"
        )
        return {
            "success": True,
            "message": (
                f"validated load: {got['appended']} appended, "
                f"{got['quarantined']} quarantined"
            ),
            "rows_appended": got["appended"],
            "rows_quarantined": got["quarantined"],
        }
    except Exception as exc:
        return {"success": False, "error": f"validated stream failed: {exc}"}


def run_zorder_maintain(
    spark: SparkSession, cfg: IngestConfig
) -> dict[str, Any]:
    """Scheduled layout maintenance: incremental OPTIMIZE-ZORDER over a
    hive-partitioned table (operators.layout.zorder_maintain — only
    partitions whose data changed since their marker re-cluster). The
    cron sibling of `compact`: where compact bounds small files, this
    restores multi-column skipping after appends. Table and clustering
    columns come from the same env surface as the rest of the job
    (ENGINE_ZORDER_TABLE, default the warehouse table;
    ENGINE_ZORDER_COLS, comma-separated, required). The reference has
    no layout surface at all — BigQuery manages physical layout
    invisibly (src/load/main.py:40); on plain parquet it is an explicit
    scheduled step."""
    import os

    from .operators.layout import zorder_maintain

    table = os.environ.get("ENGINE_ZORDER_TABLE", cfg.table_path())
    cols = [
        c.strip()
        for c in os.environ.get("ENGINE_ZORDER_COLS", "").split(",")
        if c.strip()
    ]
    if not 2 <= len(cols) <= 4:
        return {
            "success": False,
            "error": (
                "ENGINE_ZORDER_COLS must name 2-4 clustering columns "
                f"(got {cols!r})"
            ),
        }
    try:
        report = zorder_maintain(spark, table, cols)
        n_clustered = sum(1 for _e, a, _n in report if a == "clustered")
        n_skipped = sum(1 for _e, a, _n in report if a == "skipped")
        return {
            "success": True,
            "message": (
                f"zorder-maintained {table} on {cols}: "
                f"{n_clustered} partition(s) re-clustered, "
                f"{n_skipped} clean"
            ),
            "partitions_clustered": n_clustered,
            "partitions_skipped": n_skipped,
        }
    except Exception as exc:
        return {"success": False, "error": f"zorder-maintain failed: {exc}"}


def main(argv: list[str] | None = None) -> int:
    """CLI entry point:
    ``spark-submit path/to/build_a_cloud_based_batch_etl_pipeline_spark/job.py <step>`` or
    ``python -m build_a_cloud_based_batch_etl_pipeline_spark.job <step>``.

    Prints the envelope as one JSON line; exit code 0 on success, 1 on
    failure (the cron/scheduler-visible error signal, standing in for the
    reference handlers' HTTP 500)."""
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "step",
        choices=[
            "extract", "load", "pipeline", "stream", "stream-validated",
            "compact", "zorder-maintain",
        ],
    )
    args = ap.parse_args(argv)

    from .session import get_spark

    spark = get_spark(f"etl-job-{args.step}")
    cfg = IngestConfig()  # env-driven, reference example.env parity
    step = {
        "extract": run_extract,
        "load": run_load,
        "pipeline": run_pipeline,
        "stream": run_stream,
        "stream-validated": run_validated_stream,
        "compact": run_compact,
        "zorder-maintain": run_zorder_maintain,
    }[args.step]
    envelope = step(spark, cfg)
    print(json.dumps(envelope))
    return 0 if envelope["success"] else 1


if __name__ == "__main__":
    sys.exit(main())
