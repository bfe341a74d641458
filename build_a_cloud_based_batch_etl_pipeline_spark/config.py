"""Engine configuration via environment variables.

Mirrors the reference's env-config surface (reference example.env:1-6,
src/extract/main.py:18-20, src/load/main.py:16-18) translated to engine
terms: the GCS bucket becomes a landing-zone URI (any Hadoop-supported
filesystem: file://, gs://, s3a://), the BigQuery dataset.table becomes a
warehouse path/table name. The reference's dead PUBSUB_TOPIC config
(injected at terraform/main.tf:179-182 but never read) is deliberately
NOT carried over; the name-drift trap (data_table vs posts,
SURVEY.md §1.3) is avoided by a single authoritative default.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class IngestConfig:
    """Config for the extract -> land -> load pipeline."""

    # reference: DATA_SOURCE_URL (src/extract/main.py:20)
    source_url: str = field(
        default_factory=lambda: os.environ.get(
            "ENGINE_SOURCE_URL", "https://jsonplaceholder.typicode.com/posts"
        )
    )
    # reference: GCS_BUCKET_NAME (src/extract/main.py:18) -> landing URI
    landing_uri: str = field(
        default_factory=lambda: os.environ.get("ENGINE_LANDING_URI", "/tmp/engine/landing")
    )
    # reference: BIGQUERY_DATASET_ID/TABLE_ID (src/load/main.py:16-18)
    warehouse_uri: str = field(
        default_factory=lambda: os.environ.get(
            "ENGINE_WAREHOUSE_URI", "/tmp/engine/warehouse"
        )
    )
    table_name: str = field(
        default_factory=lambda: os.environ.get("ENGINE_TABLE_NAME", "posts")
    )
    # streaming checkpoint root (no reference equivalent: the Pub/Sub
    # chain had no exactly-once state; Spark's checkpoint replaces it)
    checkpoint_uri: str = field(
        default_factory=lambda: os.environ.get(
            "ENGINE_CHECKPOINT_URI", "/tmp/engine/checkpoints"
        )
    )

    def table_path(self) -> str:
        return os.path.join(self.warehouse_uri, self.table_name)
