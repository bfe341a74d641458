"""Null-handling semantics on inline data (the fixtures are null-free, so
these engine behaviors would otherwise ship unasserted): null grouping
keys, null join keys, null ordering, null-safe equality, and aggregate
null-skipping — pinned to the ANSI semantics the DuckDB oracle assumes."""

from __future__ import annotations

from pyspark.sql import functions as F


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 20.0), (3, "a", None), (4, None, 40.0), (5, "b", 50.0)],
        "id: long, k: string, v: double",
    )


def test_groupby_groups_nulls_together(spark):
    out = {r.k: (r.n, r.s) for r in
           _df(spark).groupBy("k").agg(F.count("*").alias("n"),
                                       F.sum("v").alias("s")).collect()}
    assert out[None] == (2, 60.0)          # null keys form ONE group
    assert out["a"] == (2, 10.0)           # sum skips null v


def test_inner_join_drops_null_keys(spark):
    left = _df(spark).select("id", "k")
    right = spark.createDataFrame([("a", 1), (None, 2)], "k: string, r: long")
    joined = left.join(right, "k").collect()
    assert {r.id for r in joined} == {1, 3}  # null = null is not a match


def test_null_safe_equality_matches_nulls(spark):
    left = _df(spark).select("id", "k")
    right = spark.createDataFrame([("a", 1), (None, 2)], "k: string, r: long")
    joined = left.join(right, left.k.eqNullSafe(right.k)).collect()
    assert {r.id for r in joined} == {1, 2, 3, 4}  # <=> matches null pairs


def test_count_semantics_on_nulls(spark):
    row = _df(spark).agg(
        F.count("*").alias("all"),
        F.count("v").alias("non_null"),
        F.countDistinct("k").alias("distinct_k"),
        F.avg("v").alias("avg_v"),
    ).first()
    assert row.all == 5
    assert row.non_null == 4               # count(col) skips nulls
    assert row.distinct_k == 2             # count(distinct) skips nulls
    assert abs(row.avg_v - 30.0) < 1e-9    # avg over non-null only


def test_order_by_null_placement(spark):
    asc = [r.id for r in _df(spark).orderBy(F.col("v").asc_nulls_first()).collect()]
    assert asc[0] == 3
    desc = [r.id for r in _df(spark).orderBy(F.col("v").desc_nulls_last()).collect()]
    assert desc[-1] == 3


def test_window_ignorenulls_vs_respect(spark):
    from pyspark.sql import Window as W

    w = W.orderBy("id").rowsBetween(W.unboundedPreceding, W.currentRow)
    out = {r.id: (r.last_any, r.last_nn) for r in _df(spark).select(
        "id",
        F.last("v").over(w).alias("last_any"),
        F.last("v", ignorenulls=True).over(w).alias("last_nn"),
    ).collect()}
    assert out[3] == (None, 20.0)          # respect-nulls sees the null, ignore skips


def test_r4_operators_handle_empty_inputs(spark, monkeypatch):
    """Every r4 operator must return an EMPTY result (not crash) on an
    empty corpus — windows, sketches, chunking and streak logic all have
    degenerate-input paths (empty arrays, sum-over-nothing, 1/0)."""
    from build_a_cloud_based_batch_etl_pipeline_spark.operators import (
        dedup as dedup_mod,
        events as events_mod,
        text as text_mod,
    )
    from build_a_cloud_based_batch_etl_pipeline_spark.schemas import DOCUMENTS, EVENTS

    empty_docs = spark.createDataFrame([], schema=DOCUMENTS)
    empty_events = spark.createDataFrame([], schema=EVENTS)

    def fake_t(spark_, sf_dir_, name_):
        return empty_docs if name_ == "documents" else empty_events

    for mod in (dedup_mod, events_mod, text_mod):
        monkeypatch.setattr(mod, "t", fake_t)

    for fn in (
        text_mod.doc_chunk_cdc,
        text_mod.doc_boilerplate_chunks,
        text_mod.text_heavy_hitters_cms,
        text_mod.text_vocab_coverage,
        dedup_mod.dedup_ngram_containment,
        events_mod.events_activity_streaks,
        events_mod.events_transition_matrix,
        events_mod.events_inter_arrival,
    ):
        assert fn(spark, "ignored").count() == 0, fn.__name__


def test_r6_operators_handle_empty_inputs(spark, monkeypatch):
    """Round-6 operators on an EMPTY corpus: row-bounded queries return
    zero rows; report-shaped queries (dq_expectations, dataset card)
    return their constant row count with NULL rates instead of crashing
    (ANSI div-by-zero, empty percentile arrays, empty pandas groups)."""
    from build_a_cloud_based_batch_etl_pipeline_spark.operators import (
        aggregates as agg_mod,
        dq as dq_mod,
        events as events_mod,
        joins as joins_mod,
        layout as layout_mod,
        reshape as reshape_mod,
        sampling as sampling_mod,
        text as text_mod,
        windows as windows_mod,
    )
    from build_a_cloud_based_batch_etl_pipeline_spark import schemas as S

    empty = {
        "documents": spark.createDataFrame([], schema=S.DOCUMENTS),
        "events": spark.createDataFrame([], schema=S.EVENTS),
        "orders": spark.createDataFrame([], schema=S.ORDERS),
        "lineitem": spark.createDataFrame([], schema=S.LINEITEM),
        "customer": spark.createDataFrame([], schema=S.CUSTOMER),
    }

    def fake_t(spark_, sf_dir_, name_):
        return empty[name_]

    mods = (agg_mod, dq_mod, events_mod, joins_mod, layout_mod,
            reshape_mod, sampling_mod, text_mod, windows_mod)
    for mod in mods:
        monkeypatch.setattr(mod, "t", fake_t)

    for fn in (
        text_mod.text_inverted_index,
        text_mod.text_phrase_search,
        events_mod.events_anomaly_mad,
        windows_mod.window_distinct_frame,
        joins_mod.join_interval_overlap,
        layout_mod.zorder_key,
        reshape_mod.feature_quantile_bins,
        dq_mod.snapshot_diff,
        dq_mod.dq_quarantine_split,
        agg_mod.sketch_tdigest_quantiles,
        text_mod.text_bm25_rank,
        events_mod.events_attribution,
        events_mod.events_sliding_distinct,
        events_mod.events_downsample_lttb,
        sampling_mod.sample_shuffle_shards,
        sampling_mod.decontaminate_bloom_confusion,
    ):
        assert fn(spark, "ignored").count() == 0, fn.__name__

    # constant-shape reports: full rule/metric list, NULL-safe rates
    assert dq_mod.dq_expectations(spark, "ignored").count() == 10
    card = dq_mod.pipeline_dataset_card(spark, "ignored")
    assert card.count() == 8
    # global-agg report: one row of NULL statistics, not a crash
    assert dq_mod.dq_ks_drift(spark, "ignored").count() == 1


def test_rbin_half_boundary_matches_duckdb(spark):
    """The cross-engine landmine rbin exists for: Spark round() re-reads
    a double's shortest decimal string (HALF_UP on "40792.005") while
    DuckDB rounds the binary value (40792.004999999997 -> down). rbin
    must agree with DuckDB's floor-form on the boundary value AND on
    ordinary values, from the same binary doubles."""
    import duckdb

    from build_a_cloud_based_batch_etl_pipeline_spark.operators.util import rbin

    vals = [43395.75 * 0.94, 38951.50 * 1.05, 0.005, 2.675, 1.0049999]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        round(r.x, 6): r.y
        for r in df.select("x", rbin(F.col("x")).alias("y")).collect()
    }
    con = duckdb.connect()
    for v in vals:
        expect = con.execute(
            "SELECT floor(? * 100 + 0.5) / 100", [v]
        ).fetchone()[0]
        assert got[round(v, 6)] == expect, (v, got[round(v, 6)], expect)
    # the motivating boundary: Spark's own round() would say 40792.01
    assert got[round(43395.75 * 0.94, 6)] == 40792.00
