"""Structured Streaming surface: exactly-once incremental ingest (replacing
the reference's GCS->Pub/Sub->push notification chain, SURVEY.md R7/R11),
watermarked windowed aggregations, session windows, and stateful dedup.
"""
