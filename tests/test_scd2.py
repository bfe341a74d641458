"""SCD Type-2 merge semantics: version close/open on change, no-op
updates cause no churn, new keys open fresh versions, latest-wins within
a batch, closed history is never touched."""

from __future__ import annotations

from datetime import datetime

from build_a_cloud_based_batch_etl_pipeline_spark.scd import scd2_apply

T0 = datetime(2024, 1, 1)
T1 = datetime(2024, 2, 1)
T2 = datetime(2024, 3, 1)
T3 = datetime(2024, 4, 1)

HIST_SCHEMA = "id: long, title: string, valid_from: timestamp, valid_to: timestamp"
UPD_SCHEMA = "id: long, title: string, ts: timestamp"


def _apply(spark, hist_rows, upd_rows):
    hist = spark.createDataFrame(hist_rows, HIST_SCHEMA)
    upd = spark.createDataFrame(upd_rows, UPD_SCHEMA)
    out = scd2_apply(hist, upd, key="id", ts_col="ts", attrs=["title"]).collect()
    return sorted(
        ((r.id, r.title, r.valid_from, r.valid_to) for r in out),
        key=lambda x: (x[0], x[2]),
    )


def test_change_closes_and_opens(spark):
    got = _apply(
        spark,
        [(1, "old", T0, None)],
        [(1, "new", T2)],
    )
    assert got == [(1, "old", T0, T2), (1, "new", T2, None)]


def test_noop_update_causes_no_churn(spark):
    got = _apply(spark, [(1, "same", T0, None)], [(1, "same", T2)])
    assert got == [(1, "same", T0, None)]


def test_new_key_opens_version(spark):
    got = _apply(spark, [(1, "a", T0, None)], [(2, "b", T2)])
    assert got == [(1, "a", T0, None), (2, "b", T2, None)]


def test_latest_update_wins_within_batch(spark):
    got = _apply(
        spark,
        [(1, "v0", T0, None)],
        [(1, "v1", T1), (1, "v2", T3), (1, "interim", T2)],
    )
    assert got == [(1, "v0", T0, T3), (1, "v2", T3, None)]


def test_closed_history_untouched(spark):
    got = _apply(
        spark,
        [(1, "ancient", T0, T1), (1, "current", T1, None)],
        [(1, "newer", T2)],
    )
    assert got == [
        (1, "ancient", T0, T1),
        (1, "current", T1, T2),
        (1, "newer", T2, None),
    ]


def test_stale_update_is_noop(spark):
    """A late-arriving update older than the open version must not close
    it (that would create an inverted interval)."""
    got = _apply(spark, [(1, "current", T2, None)], [(1, "stale", T0)])
    assert got == [(1, "current", T2, None)]


def test_equal_ts_updates_pick_deterministic_winner(spark):
    """Two same-key updates with the SAME timestamp resolve by attribute
    order, not partition order — rerunning gives the same history."""
    runs = [
        _apply(spark, [(1, "v0", T0, None)], [(1, "alpha", T2), (1, "zeta", T2)])
        for _ in range(3)
    ]
    assert runs[0] == runs[1] == runs[2]
    assert runs[0] == [(1, "v0", T0, T2), (1, "zeta", T2, None)]
