"""Slowly-changing-dimension Type 2 history maintenance.

The reference's warehouse table is append-only with no notion of row
versions (reference terraform/main.tf:63-102 — five flat columns, no
validity interval); any upstream record edit simply never reaches it.
This module supplies the standard warehouse answer: keep every version of
a keyed record with [valid_from, valid_to) intervals, close the open
version when an attribute changes, and ignore no-op updates.

Scale shape: one window (latest update per key) + three joins, all
keyed on the dimension key — the history table streams through the join
while the (bounded) update batch is broadcast, mirroring
ingest.append_idempotent's asymmetry. Pure DataFrame composition, no
driver-side row handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    ts_col: str,
    attrs: list[str],
) -> DataFrame:
    """Merge an update batch into an SCD2 history table.

    history: columns [key, *attrs, valid_from, valid_to] — valid_to null
             marks the open (current) version.
    updates: columns [key, *attrs, ts_col] — may contain several updates
             per key; only the latest is applied (intermediate states
             within one batch are not materialized, matching warehouse
             batch-merge semantics).

    Returns the new history: untouched rows + closed-out old versions +
    newly-opened versions. A latest-update equal to the open version on
    every attribute is a no-op (no spurious version churn), and so is a
    STALE update (ts <= the open version's valid_from) — applying one
    would close the open row with valid_to < valid_from, an inverted
    interval that corrupts every as-of lookup after it.
    """
    out_cols = [key, *attrs, "valid_from", "valid_to"]

    # ts desc, then the attribute tuple desc: two updates with the SAME
    # timestamp must pick a deterministic winner, not partition order.
    w = W.partitionBy(key).orderBy(
        F.col(ts_col).desc(), *[F.col(a).desc_nulls_last() for a in attrs]
    )
    latest = (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(key, *attrs, F.col(ts_col).alias("_upd_ts"))
    )

    open_rows = history.filter(F.col("valid_to").isNull())
    closed_rows = history.filter(F.col("valid_to").isNotNull())

    attr_changed = F.lit(False)
    for a in attrs:
        attr_changed = attr_changed | ~F.col(f"h.{a}").eqNullSafe(F.col(f"u.{a}"))

    joined = open_rows.alias("h").join(
        F.broadcast(latest).alias("u"), key, "full_outer"
    )
    # an update only counts if it is NEWER than the open version; stale
    # (late-arriving, already-superseded) updates are no-ops.
    fresh_update = F.col("u._upd_ts").isNotNull() & (
        F.col("h.valid_from").isNull()
        | (F.col("u._upd_ts") > F.col("h.valid_from"))
    )
    # open rows with a real, fresh change -> close at the update timestamp
    to_close = (
        joined.filter(
            F.col("h.valid_from").isNotNull() & fresh_update & attr_changed
        )
        .select(
            key,
            *[F.col(f"h.{a}").alias(a) for a in attrs],
            F.col("h.valid_from").alias("valid_from"),
            F.col("u._upd_ts").alias("valid_to"),
        )
    )
    # those same keys get a fresh open version from the update
    to_open = (
        joined.filter(
            fresh_update & (F.col("h.valid_from").isNull() | attr_changed)
        )
        .select(
            key,
            *[F.col(f"u.{a}").alias(a) for a in attrs],
            F.col("u._upd_ts").alias("valid_from"),
            F.lit(None).cast(history.schema["valid_to"].dataType).alias("valid_to"),
        )
    )
    # open rows with no update, or whose latest update is a no-op, survive
    untouched_open = (
        joined.filter(
            F.col("h.valid_from").isNotNull() & (~fresh_update | ~attr_changed)
        )
        .select(
            key,
            *[F.col(f"h.{a}").alias(a) for a in attrs],
            F.col("h.valid_from").alias("valid_from"),
            F.col("h.valid_to").alias("valid_to"),
        )
    )
    return (
        closed_rows.select(*out_cols)
        .unionByName(untouched_open)
        .unionByName(to_close)
        .unionByName(to_open)
    )
