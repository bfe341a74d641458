"""Streaming windowed aggregations with watermarks, session windows and
stateful dedup over the events stream (SURVEY.md §2.2 "Streaming" —
absent from the reference, which has no ordering/lateness handling at all).

These builders take a streaming DataFrame (readStream) and return the
transformed streaming DataFrame; tests drive them with availableNow over
staged parquet/json drops and a memory sink. The same builders accept a
batch DataFrame for plan-equivalence (minus watermark semantics), which is
how the oracle-checked batch twins in operators/events.py stay honest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """1-hour tumbling windows; watermark bounds state and drops rows later
    than the threshold (late-data policy the reference lacks)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def sliding_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """1-hour windows sliding every 30 minutes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_aggregates(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native streaming sessionization: session_window merges rows whose
    gaps are under the threshold, per user (batch twin: the lag/cumsum
    composition in operators/events.py events_session)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Stateful dedup on event_id: duplicates arriving within the watermark
    horizon are dropped; state is GC'd past it (bounded memory — the
    property that makes streaming dedup feasible on an unbounded stream)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_with_dim(
    events: DataFrame, dim: DataFrame, on: str, hint_broadcast: bool = True
) -> DataFrame:
    """Stream-static join: enrich each micro-batch with a (slowly
    changing) dimension table. The static side is re-resolved per
    micro-batch, so dimension updates are picked up without restarting
    the stream.

    hint_broadcast=True (default) forces the broadcast — right for the
    common small-dim case and removes any stream-side shuffle. For a dim
    too large to broadcast, pass False and let the planner pick from its
    size estimate: a forced hint on a huge dim would ship the whole table
    to every executor each micro-batch."""
    d = F.broadcast(dim) if hint_broadcast else dim
    return events.join(d, on, "left")


def join_streams_interval(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    max_delay: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join: pair each left event with right events
    of the same key that happened within [left.ts, left.ts + max_delay).

    Both sides carry watermarks and the join condition bounds event time
    in BOTH directions, which is what lets Spark GC buffered state: a
    buffered left row can be dropped once the right watermark passes
    left.ts + max_delay, and vice versa. Without the time bound the state
    store grows without limit — the property that separates a viable
    100 TB streaming join from an OOM."""
    l = left.withWatermark("ts", watermark).select(
        F.col(key).alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") < F.col("l_ts") + F.expr(f"INTERVAL {max_delay}")),
    ).select("l_key", "l_event_id", "r_event_id", "l_ts", "r_ts")
