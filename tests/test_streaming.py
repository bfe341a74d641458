"""Structured Streaming tests (SURVEY.md §5 item 5): exactly-once
incremental ingest over staged file drops, watermark windowed aggs,
session windows, stateful dedup — all driven with availableNow triggers
to completion (deterministic, synchronous)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from build_a_cloud_based_batch_etl_pipeline_spark.config import IngestConfig
from build_a_cloud_based_batch_etl_pipeline_spark import ingest
from build_a_cloud_based_batch_etl_pipeline_spark.schemas import EVENTS
from build_a_cloud_based_batch_etl_pipeline_spark.streaming import (
    ingest_stream,
    windows_stream,
)


def _cfg(tmp_path) -> IngestConfig:
    return IngestConfig(
        source_url="fake://posts",
        landing_uri=str(tmp_path / "landing"),
        warehouse_uri=str(tmp_path / "warehouse"),
        checkpoint_uri=str(tmp_path / "ckpt"),
    )


def _drop_file(tmp_path, name, rows):
    d = tmp_path / "landing" / "ingest_date=2023-11-14" / f"run={name}"
    d.mkdir(parents=True, exist_ok=True)
    with open(d / "part-0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_incremental_stream_exactly_once(spark, tmp_path):
    cfg = _cfg(tmp_path)
    _drop_file(tmp_path, "r1", [
        {"userId": 1, "id": 1, "title": "a", "body": ""},
        {"userId": 1, "id": 2, "title": "b", "body": ""},
    ])
    assert ingest_stream.incremental_load(spark, cfg) == 2
    # re-run with no new files: checkpoint prevents reprocessing
    assert ingest_stream.incremental_load(spark, cfg) == 0
    # drop a second file -> only it is processed
    _drop_file(tmp_path, "r2", [{"userId": 2, "id": 3, "title": "c", "body": ""}])
    assert ingest_stream.incremental_load(spark, cfg) == 1
    assert ingest.read_table(spark, cfg).count() == 3


def _run_stream_to_memory(spark, stream_df, name, output_mode):
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_tumbling_matches_batch(spark, sf_dir, tmp_path):
    """The streaming tumbling agg over the events fixture must equal its
    batch twin once the stream is fully drained (availableNow + complete
    output => no rows are watermark-dropped on a bounded input)."""
    from build_a_cloud_based_batch_etl_pipeline_spark.sources import load_table

    batch_events = load_table(spark, sf_dir, "events")
    # stage events as parquet with µs timestamps for the stream source
    staged = str(tmp_path / "events_staged")
    batch_events.write.mode("overwrite").parquet(staged)

    stream = spark.readStream.schema(batch_events.schema).parquet(staged)
    out = _run_stream_to_memory(
        spark, windows_stream.tumbling_counts(stream), "tumb", "complete"
    )
    got = {
        (r.window_start, r.event_type): (r.n, round(r.total_value, 2))
        for r in out.collect()
    }
    expected = {
        (r.window_start, r.event_type): (r.n, round(r.total_value, 2))
        for r in (
            batch_events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
            .collect()
        )
    }
    assert got == expected


def test_streaming_session_window_runs(spark, sf_dir, tmp_path):
    from build_a_cloud_based_batch_etl_pipeline_spark.sources import load_table

    batch_events = load_table(spark, sf_dir, "events")
    staged = str(tmp_path / "events_staged2")
    batch_events.write.mode("overwrite").parquet(staged)
    stream = spark.readStream.schema(batch_events.schema).parquet(staged)
    out = _run_stream_to_memory(
        spark, windows_stream.session_aggregates(stream), "sess", "complete"
    )
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.session_end >= r.session_start for r in rows)
    # session count should match the batch sessionization's session count
    from build_a_cloud_based_batch_etl_pipeline_spark.operators.events import (
        events_session,
    )

    assert len(rows) == events_session(spark, sf_dir).count()


def test_streaming_dedup_within_watermark(spark, tmp_path):
    rows = [
        {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 1,
         "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 1, "ts": "2024-01-01T00:05:00", "user_id": 1,
         "event_type": "click", "value": 1.0, "props": "{}"},  # dup id
        {"event_id": 2, "ts": "2024-01-01T00:10:00", "user_id": 1,
         "event_type": "view", "value": 2.0, "props": "{}"},
    ]
    d = tmp_path / "ev"
    d.mkdir()
    with open(d / "e.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema(EVENTS).json(str(d))
    out = _run_stream_to_memory(
        spark, windows_stream.dedup_within_watermark(stream), "dd", "append"
    )
    assert sorted(r.event_id for r in out.collect()) == [1, 2]


def test_stream_static_enrichment(spark, tmp_path):
    """Stream-static broadcast join resolves per micro-batch and enriches
    every streamed row that has a matching dim key."""
    d = tmp_path / "evdrop"
    d.mkdir()
    rows = [
        {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 7, "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T00:01:00", "user_id": 8, "event_type": "view", "value": 2.0, "props": "{}"},
        {"event_id": 3, "ts": "2024-01-01T00:02:00", "user_id": 99, "event_type": "view", "value": 3.0, "props": "{}"},
    ]
    with open(d / "part-0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    dim = spark.createDataFrame(
        [(7, "gold"), (8, "silver")], "user_id: long, tier: string"
    )
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        ).json(str(d))
    )
    enriched = windows_stream.enrich_with_dim(stream, dim, "user_id")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.event_id: r.tier for r in spark.sql("SELECT * FROM enriched_out").collect()}
    assert got == {1: "gold", 2: "silver", 3: None}


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream join pairs clicks with purchases of the
    same user within the interval, drops pairs outside it."""
    import datetime as dt

    def drop(dirname, rows):
        d = tmp_path / dirname
        d.mkdir(exist_ok=True)
        with open(d / "part-0.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    base = "2024-01-01T00:{m:02d}:00"
    drop("clicks", [
        {"event_id": 1, "ts": base.format(m=0), "user_id": 7},
        {"event_id": 2, "ts": base.format(m=5), "user_id": 8},
    ])
    drop("purchases", [
        {"event_id": 10, "ts": base.format(m=30), "user_id": 7},   # within 1h of click 1
        {"event_id": 11, "ts": base.format(m=4), "user_id": 8},    # BEFORE click 2 -> excluded
        {"event_id": 12, "ts": "2024-01-01T02:00:00", "user_id": 7},  # > 1h after -> excluded
    ])
    schema = "event_id long, ts timestamp, user_id long"
    clicks = spark.readStream.schema(schema).json(str(tmp_path / "clicks"))
    purchases = spark.readStream.schema(schema).json(str(tmp_path / "purchases"))
    joined = windows_stream.join_streams_interval(clicks, purchases)
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.l_event_id, r.r_event_id)
           for r in spark.sql("SELECT * FROM ss_join_out").collect()}
    assert got == {(1, 10)}


def test_incremental_stream_survives_checkpoint_loss(spark, tmp_path):
    """Replay safety: if the checkpoint is lost (or an epoch is replayed
    after a crash between parquet commit and checkpoint commit), re-read
    files must NOT duplicate rows — the table-level idempotent append is
    the second layer under the file-source log."""
    import shutil

    cfg = _cfg(tmp_path)
    _drop_file(tmp_path, "r1", [
        {"userId": 1, "id": 1, "title": "t1", "body": "b"},
        {"userId": 1, "id": 2, "title": "t2", "body": "b"},
    ])
    assert ingest_stream.incremental_load(spark, cfg) == 2
    # lose the checkpoint entirely -> every file is re-read from scratch
    shutil.rmtree(str(tmp_path / "ckpt"))
    assert ingest_stream.incremental_load(spark, cfg) == 0
    assert ingest.read_table(spark, cfg).count() == 2


def test_incremental_stream_crash_mid_batch_is_exactly_once(spark, tmp_path, monkeypatch):
    """Kill the foreachBatch AFTER its parquet append but BEFORE the
    checkpoint commit (the at-least-once crash window): restarting from
    the checkpoint replays the epoch, and the table-level idempotent
    append must swallow the replayed rows — final state exactly-once."""
    import pytest
    from pyspark.errors import StreamingQueryException

    from build_a_cloud_based_batch_etl_pipeline_spark import ingest as ingest_mod

    cfg = _cfg(tmp_path)
    _drop_file(tmp_path, "r1", [
        {"userId": 1, "id": 1, "title": "a", "body": ""},
        {"userId": 1, "id": 2, "title": "b", "body": ""},
    ])
    real_append = ingest_mod.append_idempotent

    def append_then_crash(spark_, df, table_path, key):
        n = real_append(spark_, df, table_path, key=key)
        raise RuntimeError("simulated crash after table commit")

    monkeypatch.setattr(ingest_mod, "append_idempotent", append_then_crash)
    with pytest.raises(StreamingQueryException):
        ingest_stream.incremental_load(spark, cfg)
    # rows hit the table, but the epoch was never checkpointed
    assert ingest.read_table(spark, cfg).count() == 2

    # restart with the fault cleared: the file source replays the epoch,
    # the idempotent append must report 0 new rows and not duplicate
    monkeypatch.setattr(ingest_mod, "append_idempotent", real_append)
    assert ingest_stream.incremental_load(spark, cfg) == 0
    got = ingest.read_table(spark, cfg)
    assert got.count() == 2
    assert got.select("id").distinct().count() == 2


def test_continuous_aggregate_maintenance(spark, tmp_path):
    """The materialized per-user totals table accumulates correctly
    across micro-batches and new file drops."""
    evdir = tmp_path / "agg_events"
    evdir.mkdir()
    schema = "event_id long, ts timestamp, user_id long, value double"

    def drop(name, rows):
        with open(evdir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    agg_path = str(tmp_path / "user_totals")
    ckpt = str(tmp_path / "agg_ckpt")
    drop("f1.json", [
        {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 7, "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01T00:01:00", "user_id": 7, "value": 2.0},
        {"event_id": 3, "ts": "2024-01-01T00:02:00", "user_id": 8, "value": 5.0},
    ])
    ingest_stream.maintain_running_aggregate(spark, str(evdir), agg_path, ckpt, schema)
    got = {r.user_id: (r.n_events, r.total_value)
           for r in spark.read.parquet(agg_path).collect()}
    assert got == {7: (2, 3.0), 8: (1, 5.0)}
    drop("f2.json", [
        {"event_id": 4, "ts": "2024-01-01T01:00:00", "user_id": 7, "value": 10.0},
        {"event_id": 5, "ts": "2024-01-01T01:01:00", "user_id": 9, "value": 0.5},
    ])
    ingest_stream.maintain_running_aggregate(spark, str(evdir), agg_path, ckpt, schema)
    got = {r.user_id: (r.n_events, r.total_value)
           for r in spark.read.parquet(agg_path).collect()}
    assert got == {7: (3, 13.0), 8: (1, 5.0), 9: (1, 0.5)}

    # the swapped dir carries the merged-epoch watermark, scoped to the
    # checkpoint lineage; wiping the checkpoint while KEEPING the table
    # is a misconfiguration (a fresh lineage restarts at epoch 0, which
    # a cross-lineage comparison would silently skip = data loss) — it
    # must raise loudly, not skip
    import shutil

    import pytest

    lineage = ingest_stream._checkpoint_lineage(spark, ckpt)
    assert ingest_stream._table_epoch_hwm(spark, agg_path, lineage) is not None
    shutil.rmtree(ckpt)  # checkpoint reset, table kept: new lineage
    with pytest.raises(Exception, match="lineage"):
        ingest_stream.maintain_running_aggregate(
            spark, str(evdir), agg_path, ckpt, schema
        )
    # the failed run must not have touched the table
    got = {r.user_id: (r.n_events, r.total_value)
           for r in spark.read.parquet(agg_path).collect()}
    assert got == {7: (3, 13.0), 8: (1, 5.0), 9: (1, 0.5)}
    # resetting BOTH (table + checkpoint) rebuilds the same totals
    shutil.rmtree(ckpt)
    shutil.rmtree(agg_path)
    ingest_stream.maintain_running_aggregate(spark, str(evdir), agg_path, ckpt, schema)
    got = {r.user_id: (r.n_events, r.total_value)
           for r in spark.read.parquet(agg_path).collect()}
    assert got == {7: (3, 13.0), 8: (1, 5.0), 9: (1, 0.5)}


def test_distinct_sketch_maintenance_is_replay_idempotent(spark, tmp_path):
    """Per-key HLL sketches accumulate across file drops, estimates track
    the exact distinct counts, and — the property that removes the epoch
    marker — replaying the ENTIRE input from a lost checkpoint leaves the
    stored sketch table bit-identical (HLL union is register-wise max)."""
    import shutil

    evdir = tmp_path / "sk_events"
    evdir.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def drop(name, rows):
        with open(evdir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    sk_path = str(tmp_path / "sketches")
    ckpt = str(tmp_path / "sk_ckpt")
    drop("f1.json", [
        {"event_id": i, "ts": "2024-01-01T00:00:00", "user_id": i % 5,
         "event_type": "click", "value": 1.0}
        for i in range(20)
    ])
    ingest_stream.maintain_distinct_sketch(spark, str(evdir), sk_path, ckpt, schema)
    est = {r.event_type: r.approx_distinct
           for r in ingest_stream.read_distinct_estimates(spark, sk_path).collect()}
    assert est["click"] == 5 and est["__all__"] == 5

    drop("f2.json", [
        {"event_id": 100 + i, "ts": "2024-01-01T01:00:00", "user_id": 10 + i,
         "event_type": "view", "value": 1.0}
        for i in range(7)
    ])
    ingest_stream.maintain_distinct_sketch(spark, str(evdir), sk_path, ckpt, schema)
    est = {r.event_type: r.approx_distinct
           for r in ingest_stream.read_distinct_estimates(spark, sk_path).collect()}
    assert est == {"click": 5, "view": 7, "__all__": 12}

    # lose the checkpoint: every file replays; sketch state must not move
    before = {(r.event_type, bytes(r.sk)) for r in spark.read.parquet(sk_path).collect()}
    shutil.rmtree(ckpt)
    ingest_stream.maintain_distinct_sketch(spark, str(evdir), sk_path, ckpt, schema)
    after = {(r.event_type, bytes(r.sk)) for r in spark.read.parquet(sk_path).collect()}
    assert after == before, "replay must be a no-op on sketch state"


def test_frequency_sketch_maintenance_one_sided_and_replay_guarded(spark, tmp_path):
    """CMS cells accumulate across drops; estimates never under-count
    the exact per-user frequencies; re-running with no new files leaves
    cells unchanged (the epoch high-water mark committed with the table
    — the _epoch_hwm marker file — guards the non-idempotent
    addition)."""
    evdir = tmp_path / "cms_events"
    evdir.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def drop(name, rows):
        with open(evdir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    cms_path = str(tmp_path / "cms")
    ckpt = str(tmp_path / "cms_ckpt")
    exact = {7: 12, 8: 5, 9: 1}
    rows = []
    i = 0
    for uid, n in exact.items():
        for _ in range(n):
            rows.append({"event_id": i, "ts": "2024-01-01T00:00:00",
                         "user_id": uid, "event_type": "click", "value": 1.0})
            i += 1
    drop("f1.json", rows)
    ingest_stream.maintain_frequency_sketch(spark, str(evdir), cms_path, ckpt, schema)
    est = ingest_stream.estimate_frequencies(spark, cms_path, [7, 8, 9, 777])
    for uid, n in exact.items():
        assert est[uid] >= n, (uid, est[uid], n)
    # total cell mass equals total fanned occurrences (no double count);
    # the swapped dir carries the merged-epoch watermark as a
    # parquet-invisible _epoch_hwm marker file
    import glob

    total = sum(r.c for r in spark.read.parquet(cms_path).collect())
    assert total == 4 * sum(exact.values())
    assert glob.glob(f"{cms_path}/_epoch_hwm-*")
    lineage = ingest_stream._checkpoint_lineage(spark, ckpt)
    assert ingest_stream._table_epoch_hwm(spark, cms_path, lineage) == 0

    # no new files -> no new epochs -> cells unchanged
    ingest_stream.maintain_frequency_sketch(spark, str(evdir), cms_path, ckpt, schema)
    assert sum(r.c for r in spark.read.parquet(cms_path).collect()) == total

    # a second drop accumulates
    drop("f2.json", [{"event_id": 999, "ts": "2024-01-01T01:00:00",
                      "user_id": 7, "event_type": "view", "value": 1.0}])
    ingest_stream.maintain_frequency_sketch(spark, str(evdir), cms_path, ckpt, schema)
    est2 = ingest_stream.estimate_frequencies(spark, cms_path, [7])
    assert est2[7] >= 13


def test_frequency_sketch_crash_replay_is_exactly_once(spark, tmp_path, monkeypatch):
    """Kill the CMS merge at THREE points of its commit sequence on a
    LIVE table (second epoch) and replay:

    (a) crash after the staging write, before the swap — the live table
        still holds the previous cells AND the previous high-water mark,
        so the replayed epoch merges exactly once;
    (b) crash MID-swap — the live dir is parked at `.old`, staging never
        renamed in; the replay's swap_recover restores the park, then
        the epoch merges exactly once (the state that silently lost the
        table before recovery was wired in);
    (c) crash after the swap, before the checkpoint commit — the swapped
        table already carries the _epoch_hwm marker, so the replayed
        epoch is skipped.

    Every scenario must end bit-identical to a crash-free run, and the
    stream must have died from the INJECTED crash (asserted on the
    exception text) — a crash function that errors before doing its
    damage would make the scenario vacuous."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    rows1 = [
        {"event_id": i, "ts": "2024-01-01T00:00:00", "user_id": 7 if i < 9 else 8,
         "event_type": "click", "value": 1.0}
        for i in range(12)
    ]
    rows2 = [
        {"event_id": 100 + i, "ts": "2024-01-01T01:00:00", "user_id": 7,
         "event_type": "view", "value": 1.0}
        for i in range(5)
    ]

    def drop(evdir, name, rows):
        with open(evdir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def run(name, swap_impl=None):
        evdir = tmp_path / f"{name}_events"
        evdir.mkdir(exist_ok=True)
        cms = str(tmp_path / f"{name}_cms")
        ckpt = str(tmp_path / f"{name}_ckpt")
        # epoch 0: clean, establishes a live table + watermark
        drop(evdir, "f1.json", rows1)
        ingest_stream.maintain_frequency_sketch(spark, str(evdir), cms, ckpt, schema)
        # epoch 1: crash mid-commit (when injected), then replay clean
        drop(evdir, "f2.json", rows2)
        if swap_impl is not None:
            real = ingest_stream._atomic_swap_in
            fired = {"n": 0}

            def wrapper(*a, **k):
                fired["n"] += 1
                swap_impl(real, *a, **k)

            monkeypatch.setattr(ingest_stream, "_atomic_swap_in", wrapper)
            with pytest.raises(StreamingQueryException) as exc_info:
                ingest_stream.maintain_frequency_sketch(
                    spark, str(evdir), cms, ckpt, schema
                )
            assert "injected crash" in str(exc_info.value)
            assert fired["n"] == 1
            monkeypatch.setattr(ingest_stream, "_atomic_swap_in", real)
        ingest_stream.maintain_frequency_sketch(spark, str(evdir), cms, ckpt, schema)
        return sorted((r.d, r.bkt, r.c) for r in spark.read.parquet(cms).collect())

    expected = run("clean")

    def crash_before_swap(real, spark_, merged, table_path, epoch_id, **k):
        merged.write.mode("overwrite").parquet(
            table_path + f".epoch-{epoch_id}.staging"
        )
        raise RuntimeError("injected crash: staging written, swap not run")

    def crash_mid_swap(real, spark_, merged, table_path, epoch_id, **k):
        merged.write.mode("overwrite").parquet(
            table_path + f".epoch-{epoch_id}.staging"
        )
        jvm = spark_._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(table_path)
        fs = hpath.getFileSystem(spark_._jsc.hadoopConfiguration())
        assert fs.exists(hpath), "mid-swap scenario requires a live table"
        assert fs.rename(
            hpath, jvm.org.apache.hadoop.fs.Path(table_path + ".old")
        )
        raise RuntimeError("injected crash: live parked, staging not renamed")

    def crash_after_swap(real, spark_, merged, table_path, epoch_id, **k):
        real(spark_, merged, table_path, epoch_id, **k)
        raise RuntimeError("injected crash: swapped, checkpoint not committed")

    assert run("preswap", crash_before_swap) == expected
    assert run("midswap", crash_mid_swap) == expected
    assert run("postswap", crash_after_swap) == expected


def test_term_count_maintenance_accumulates_and_guards_replay(spark, tmp_path):
    """Streaming vocabulary maintenance: term counts accumulate across
    document drops and match a batch recount exactly; a checkpoint
    reset that keeps the table is a loud lineage-mismatch error (not a
    silent cross-lineage skip); top-k reads come back in (count desc,
    term) order."""
    import shutil
    from collections import Counter

    docsdir = tmp_path / "tc_docs"
    docsdir.mkdir()
    schema = "doc_id long, text string"

    def drop(name, rows):
        with open(docsdir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    counts_path = str(tmp_path / "term_counts")
    ckpt = str(tmp_path / "tc_ckpt")
    d1 = [
        {"doc_id": 1, "text": "spark scales spark joins"},
        {"doc_id": 2, "text": "duck checks spark"},
    ]
    drop("f1.json", d1)
    ingest_stream.maintain_term_counts(spark, str(docsdir), counts_path, ckpt, schema)
    exact = Counter(w for r in d1 for w in r["text"].split())
    got = {r.term: r.c for r in spark.read.parquet(counts_path).collect()}
    assert got == dict(exact)

    d2 = [{"doc_id": 3, "text": "spark again"}]
    drop("f2.json", d2)
    ingest_stream.maintain_term_counts(spark, str(docsdir), counts_path, ckpt, schema)
    exact.update(w for r in d2 for w in r["text"].split())
    got = {r.term: r.c for r in spark.read.parquet(counts_path).collect()}
    assert got == dict(exact)

    # checkpoint reset with the table kept: epoch ids are from a NEW
    # lineage and must not be compared to the stored watermark — the
    # maintainer raises instead of silently skipping (or double-merging)
    import pytest

    shutil.rmtree(ckpt)
    with pytest.raises(Exception, match="lineage"):
        ingest_stream.maintain_term_counts(
            spark, str(docsdir), counts_path, ckpt, schema
        )
    got = {r.term: r.c for r in spark.read.parquet(counts_path).collect()}
    assert got == dict(exact), "failed run must not have touched the table"

    top = ingest_stream.read_top_terms(spark, counts_path, k=2).collect()
    assert [(r.term, r.c) for r in top] == [("spark", 4), ("again", 1)]


def test_minhash_index_maintenance_incremental_and_replay_safe(
    spark, tmp_path, monkeypatch
):
    """Persistent MinHash index (VERDICT r6): batch-2 duplicates are
    caught against batch-1's STORED signatures — batch-1 files are never
    rewritten (asserted on the file listing, the 'no recomputation'
    contract made mechanical); a no-new-files rerun changes nothing; a
    crash between the sigs commit and the bands commit converges on
    replay with no duplicate rows."""
    import glob
    import os

    from build_a_cloud_based_batch_etl_pipeline_spark import sinks
    from build_a_cloud_based_batch_etl_pipeline_spark.operators.dedup import (
        dedup_against_index,
    )

    docsdir = tmp_path / "mh_docs"
    docsdir.mkdir()
    schema = "doc_id long, text string"
    root = str(tmp_path / "mh_index")
    ckpt = str(tmp_path / "mh_ckpt")

    def drop(name, rows):
        with open(docsdir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def listing():
        return {
            p: (os.path.getsize(p), os.path.getmtime(p))
            for p in glob.glob(f"{root}/**/*", recursive=True)
            if os.path.isfile(p)
        }

    base = " ".join(f"w{i} x{i * 3 % 17}" for i in range(60))
    neardup = base.replace("w3 ", "Q3 ").replace("w40 ", "Q40 ")
    unique = " ".join(f"z{i} y{i * 5 % 13}" for i in range(60))

    drop("b1.json", [{"doc_id": 1, "text": base},
                     {"doc_id": 2, "text": unique}])
    ingest_stream.maintain_minhash_index(spark, str(docsdir), root, ckpt, schema)
    assert glob.glob(f"{root}/sigs/epoch=*") and glob.glob(f"{root}/bands/epoch=*")
    snap1 = listing()

    # the NEW batch dedups against the index BEFORE being indexed —
    # batch-1 text is neither read nor re-hashed (only the index tables)
    other_unique = " ".join(f"p{i} q{i * 7 % 11}" for i in range(60))
    batch2 = spark.createDataFrame(
        [(10, neardup), (11, other_unique)], schema
    )
    hits = dedup_against_index(spark, batch2, root).collect()
    assert {(r.new_doc, r.index_doc) for r in hits} == {(10, 1)}
    assert all(r.est_jaccard >= 0.5 for r in hits)

    drop("b2.json", [{"doc_id": 10, "text": neardup},
                     {"doc_id": 11, "text": other_unique}])
    ingest_stream.maintain_minhash_index(spark, str(docsdir), root, ckpt, schema)
    snap2 = listing()
    for p, meta in snap1.items():
        assert snap2[p] == meta, f"batch-1 index file rewritten: {p}"
    assert len(glob.glob(f"{root}/sigs/epoch=*")) == 2
    assert len(glob.glob(f"{root}/bands/epoch=*")) == 2

    # no new files -> no new epochs -> byte-stable
    ingest_stream.maintain_minhash_index(spark, str(docsdir), root, ckpt, schema)
    assert listing() == snap2

    # crash between the sigs commit and the bands commit: replay must
    # converge (sigs epoch skipped, bands epoch committed, no dup rows)
    drop("b3.json", [{"doc_id": 20, "text": " ".join(
        f"r{i} s{i * 11 % 7}" for i in range(60))}])
    real_commit = sinks.commit_epoch_partition
    calls = {"n": 0}

    def crashing(spark_, df, table_path, lineage, epoch_id):
        committed = real_commit(spark_, df, table_path, lineage, epoch_id)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash: sigs committed, bands not")
        return committed

    monkeypatch.setattr(sinks, "commit_epoch_partition", crashing)
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException) as exc_info:
        ingest_stream.maintain_minhash_index(
            spark, str(docsdir), root, ckpt, schema
        )
    assert "injected crash" in str(exc_info.value)
    monkeypatch.setattr(sinks, "commit_epoch_partition", real_commit)
    ingest_stream.maintain_minhash_index(spark, str(docsdir), root, ckpt, schema)
    n_sig_epochs = len(glob.glob(f"{root}/sigs/epoch=*"))
    n_band_epochs = len(glob.glob(f"{root}/bands/epoch=*"))
    assert n_sig_epochs == 3 and n_band_epochs == 3
    sigs = spark.read.parquet(f"{root}/sigs")
    assert sigs.count() == sigs.select("doc_id").distinct().count() == 5
    bands = spark.read.parquet(f"{root}/bands")
    assert bands.count() == 5 * 16  # 16 band rows per doc, no duplicates


def test_asof_enrich_stream_version_boundaries_and_late_data(spark, tmp_path):
    """Streaming as-of enrichment (VERDICT r6): events get the dim
    version in force AT THEIR EVENT TIME — boundary events (ts ==
    valid_from) get that version, pre-history events get NULL, and a
    LATE event replaying an old timestamp AFTER the dim gained newer
    versions still gets the historical version (a plain stream-static
    join would stamp it with the current one). Replays do not
    duplicate output rows."""
    evdir = tmp_path / "asof_events"
    evdir.mkdir()
    schema = "event_id long, ts timestamp, user_id long, value double"
    dim_path = str(tmp_path / "tier_versions")
    out_path = str(tmp_path / "enriched")
    ckpt = str(tmp_path / "asof_ckpt")

    def drop(name, rows):
        with open(evdir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    import datetime as dt

    def ts(h):
        return dt.datetime(2024, 1, 1, h, 0, 0)

    def tss(h):
        return f"2024-01-01T{h:02d}:00:00"

    dim1 = spark.createDataFrame(
        [(7, ts(0), "bronze"), (7, ts(2), "gold"), (8, ts(1), "silver")],
        "user_id long, valid_from timestamp, tier string",
    )
    dim1.write.mode("overwrite").parquet(dim_path)

    drop("b1.json", [
        {"event_id": 1, "ts": tss(1), "user_id": 7, "value": 1.0},   # bronze
        {"event_id": 2, "ts": tss(2), "user_id": 7, "value": 1.0},   # boundary: gold
        {"event_id": 3, "ts": tss(3), "user_id": 7, "value": 1.0},   # gold
        {"event_id": 4, "ts": tss(0), "user_id": 8, "value": 1.0},   # pre-history: NULL
        {"event_id": 5, "ts": tss(1), "user_id": 9, "value": 1.0},   # no dim key: NULL
    ])
    windows_stream.asof_enrich_stream(
        spark, str(evdir), dim_path, out_path, ckpt, schema
    )
    got = {r.event_id: r.tier for r in spark.read.parquet(out_path).collect()}
    assert got == {1: "bronze", 2: "gold", 3: "gold", 4: None, 5: None}

    # the dim gains a newer version; a LATE event with an OLD timestamp
    # must still get the version in force at its event time
    dim2 = dim1.unionByName(spark.createDataFrame(
        [(7, ts(4), "platinum")],
        "user_id long, valid_from timestamp, tier string",
    ))
    dim2.write.mode("overwrite").parquet(dim_path)
    drop("b2.json", [
        {"event_id": 6, "ts": tss(1), "user_id": 7, "value": 1.0},   # LATE: bronze
        {"event_id": 7, "ts": tss(5), "user_id": 7, "value": 1.0},   # platinum
    ])
    windows_stream.asof_enrich_stream(
        spark, str(evdir), dim_path, out_path, ckpt, schema
    )
    got = {r.event_id: r.tier for r in spark.read.parquet(out_path).collect()}
    assert got[6] == "bronze", "late event must match HISTORICAL version"
    assert got[7] == "platinum"
    assert len(got) == 7

    # no new files -> no new rows (checkpoint + idempotent append)
    windows_stream.asof_enrich_stream(
        spark, str(evdir), dim_path, out_path, ckpt, schema
    )
    assert spark.read.parquet(out_path).count() == 7


def test_eval_gram_index_incremental_decontamination(spark, tmp_path):
    """Eval-gram index: a second eval drop extends the index without
    rewriting batch-1 files; a training batch overlapping either eval
    epoch is flagged against the stored grams alone, matching the
    decontaminate threshold semantics (>= 3 shared distinct 5-grams)."""
    import glob
    import os

    from build_a_cloud_based_batch_etl_pipeline_spark.operators.sampling import (
        decontaminate_against_index,
    )

    docsdir = tmp_path / "eval_docs"
    docsdir.mkdir()
    schema = "doc_id long, text string"
    root = str(tmp_path / "eval_index")
    ckpt = str(tmp_path / "eval_ckpt")

    def drop(name, rows):
        with open(docsdir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    eval1 = " ".join(f"q{i} a{i}" for i in range(20))
    eval2 = " ".join(f"x{i} y{i}" for i in range(20))
    drop("e1.json", [{"doc_id": 100, "text": eval1}])
    ingest_stream.maintain_eval_gram_index(spark, str(docsdir), root, ckpt, schema)
    snap = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{root}/**/*", recursive=True)
        if os.path.isfile(p)
    }
    drop("e2.json", [{"doc_id": 200, "text": eval2}])
    ingest_stream.maintain_eval_gram_index(spark, str(docsdir), root, ckpt, schema)
    for p, mt in snap.items():
        assert os.path.getmtime(p) == mt, f"batch-1 index file rewritten: {p}"
    assert len(glob.glob(f"{root}/grams/epoch=*")) == 2

    # training batch: doc 1 lifts 10 tokens straight from eval1 (>= 3
    # shared 5-grams), doc 2 lifts from eval2, doc 3 is clean
    lifted1 = " ".join(f"q{i} a{i}" for i in range(5, 10))
    lifted2 = " ".join(f"x{i} y{i}" for i in range(3, 8))
    clean = " ".join(f"z{i}" for i in range(40))
    train = spark.createDataFrame(
        [(1, f"{clean} {lifted1}"), (2, f"{lifted2} {clean}"), (3, clean)],
        schema,
    )
    hits = decontaminate_against_index(spark, train, root).collect()
    got = {(r.train_doc, r.eval_doc) for r in hits}
    assert got == {(1, 100), (2, 200)}, got
    assert all(r.shared_5grams >= 3 for r in hits)


def test_incremental_load_validated_quarantine(spark, tmp_path):
    """Validated streaming load: bad rows land once (and only once) in
    the epoch-partitioned quarantine table with reason codes; valid rows
    take the idempotent-append path; a drained re-run moves nothing on
    either path."""
    cfg = _cfg(tmp_path)
    qdir = str(tmp_path / "quarantine")
    _drop_file(tmp_path, "r1", [
        {"userId": 1, "id": 1, "title": "ok", "body": ""},
        {"userId": None, "id": 2, "title": "bad-user", "body": ""},
        {"userId": 3, "id": None, "title": "bad-id", "body": ""},
        {"userId": 4, "id": 4, "title": "x" * 501, "body": ""},
    ])
    got = ingest_stream.incremental_load_validated(spark, cfg, qdir)
    assert got == {"appended": 1, "quarantined": 3}
    quar = spark.read.parquet(qdir)
    reasons = {r.title[:8]: r.reasons for r in quar.collect()}
    assert reasons["bad-user"] == "userid_null"
    assert reasons["bad-id"] == "id_null"
    assert reasons["xxxxxxxx"] == "title_too_long"
    # provenance column from the partition dir
    assert {c for c in quar.columns} >= {"reasons", "epoch"}

    # drained re-run: nothing appended, no new quarantine partitions
    got2 = ingest_stream.incremental_load_validated(spark, cfg, qdir)
    assert got2 == {"appended": 0, "quarantined": 0}
    assert spark.read.parquet(qdir).count() == 3

    # a second file: only ITS bad rows arrive, as a new epoch partition
    _drop_file(tmp_path, "r2", [
        {"userId": 5, "id": 5, "title": "ok2", "body": ""},
        {"userId": None, "id": 6, "title": "bad2", "body": ""},
    ])
    got3 = ingest_stream.incremental_load_validated(spark, cfg, qdir)
    assert got3 == {"appended": 1, "quarantined": 1}
    quar3 = spark.read.parquet(qdir)
    assert quar3.count() == 4
    assert quar3.select("epoch").distinct().count() == 2
    assert ingest.read_table(spark, cfg).count() == 2


def test_quantile_digest_maintenance_accumulates_and_guards_replay(spark, tmp_path):
    """Streaming t-digest maintenance: per-group digests accumulate
    across event drops and answer quantiles within the digest's rank
    tolerance of an exact recount over ALL events seen; weight is
    conserved exactly; a checkpoint reset that keeps the table raises a
    lineage-mismatch error instead of double-merging."""
    import shutil

    import numpy as np
    import pytest

    evdir = tmp_path / "qd_events"
    evdir.mkdir()
    schema = "event_id long, event_type string, value double"

    rng = np.random.default_rng(11)

    def drop(name, rows):
        with open(evdir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    digest_path = str(tmp_path / "digests")
    ckpt = str(tmp_path / "qd_ckpt")
    d1 = [
        {"event_id": i, "event_type": "a" if i % 2 else "b",
         "value": float(v)}
        for i, v in enumerate(rng.normal(size=4000))
    ]
    drop("f1.json", d1)
    ingest_stream.maintain_quantile_digest(
        spark, str(evdir), digest_path, ckpt, schema
    )
    d2 = [
        {"event_id": 10_000 + i, "event_type": "a",
         "value": float(v)}
        for i, v in enumerate(rng.normal(loc=3.0, size=4000))
    ]
    drop("f2.json", d2)
    ingest_stream.maintain_quantile_digest(
        spark, str(evdir), digest_path, ckpt, schema
    )

    # weight conservation: stored digest weights == events seen per group
    stored = spark.read.parquet(digest_path).collect()
    weights = {r.event_type: sum(r.weights) for r in stored}
    all_rows = d1 + d2
    for g in ("a", "b"):
        assert weights[g] == sum(1 for r in all_rows if r["event_type"] == g)

    # quantile accuracy within +-2.5% rank of the exact distribution
    # (two merge levels: per-batch compress + cross-batch re-compress)
    got = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in ingest_stream.read_quantiles(spark, digest_path).collect()
    }
    for g in ("a", "b"):
        vals = np.array([r["value"] for r in all_rows if r["event_type"] == g])
        for est, q in zip(got[g], (0.5, 0.9, 0.99)):
            lo = np.quantile(vals, max(q - 0.025, 0.0))
            hi = np.quantile(vals, min(q + 0.025, 1.0))
            assert lo - 1e-9 <= est <= hi + 1e-9, (g, q, est, lo, hi)

    # checkpoint reset with the table kept: loud lineage error, table intact
    shutil.rmtree(ckpt)
    with pytest.raises(Exception, match="lineage"):
        ingest_stream.maintain_quantile_digest(
            spark, str(evdir), digest_path, ckpt, schema
        )
    stored2 = {r.event_type: sum(r.weights)
               for r in spark.read.parquet(digest_path).collect()}
    assert stored2 == weights, "failed run must not have touched the table"


def test_stream_stream_interval_outer_join_null_completion(spark, tmp_path):
    """LEFT OUTER stream-stream join: matches emit promptly; an
    unmatched left event emits with null right columns only after the
    watermark proves its match window closed (advanced by later events
    in a second run over the same checkpoint)."""
    def drop(dirname, fname, rows):
        d = tmp_path / dirname
        d.mkdir(exist_ok=True)
        with open(d / fname, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    base = "2024-01-01T00:{m:02d}:00"
    drop("oclicks", "f1.json", [
        {"event_id": 1, "ts": base.format(m=0), "user_id": 7},
        {"event_id": 2, "ts": base.format(m=5), "user_id": 8},  # never matched
    ])
    drop("opurch", "f1.json", [
        {"event_id": 10, "ts": base.format(m=30), "user_id": 7},
    ])
    schema = "event_id long, ts timestamp, user_id long"
    out = str(tmp_path / "oout")
    ckpt = str(tmp_path / "ockpt")

    def run_once():
        clicks = spark.readStream.schema(schema).json(str(tmp_path / "oclicks"))
        purchases = spark.readStream.schema(schema).json(str(tmp_path / "opurch"))
        joined = windows_stream.join_streams_interval_outer(clicks, purchases)
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    got1 = {
        (r.l_event_id, r.r_event_id)
        for r in spark.read.parquet(out).collect()
    }
    assert got1 == {(1, 10)}, "match emits promptly; outer row must WAIT"

    # watermark advancers on BOTH sides (3h > click2.ts + 1h + 10m)
    drop("oclicks", "f2.json", [
        {"event_id": 3, "ts": "2024-01-01T03:00:00", "user_id": 9},
    ])
    drop("opurch", "f2.json", [
        {"event_id": 13, "ts": "2024-01-01T03:00:00", "user_id": 99},
    ])
    run_once()
    got2 = {
        (r.l_event_id, r.r_event_id)
        for r in spark.read.parquet(out).collect()
    }
    assert (2, None) in got2, got2
    assert (1, 10) in got2
    # the advancer click's own window is still open -> not emitted yet
    assert not any(l == 3 for l, _ in got2)


def test_drift_profile_maintenance_matches_batch_and_guards_replay(spark, tmp_path):
    """The streaming drift profile must (a) accumulate per-(key, bin)
    counts across file drops such that the maintained table equals a
    one-shot batch binning of ALL events on the same fixed grid, (b)
    produce KS/PSI via read_drift_stats with the batch monitor's exact
    arithmetic (cross-checked against an independent numpy/duckdb-free
    recomputation), and (c) guard the non-idempotent count addition: a
    re-run with no new files leaves the table bit-unchanged."""
    import math

    evdir = tmp_path / "drift_events"
    evdir.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    lo, hi = 0.0, 100.0
    BINS = 256

    def drop(name, rows):
        with open(evdir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    # two shifted distributions + out-of-range values to exercise the clamp
    vals_a = [5.0 + (i * 7 % 40) for i in range(60)] + [-3.0, 250.0]
    vals_b = [45.0 + (i * 11 % 50) for i in range(80)] + [120.0]
    rows1 = [
        {"event_id": i, "ts": "2024-01-01T00:00:00", "user_id": i,
         "event_type": "click", "value": v}
        for i, v in enumerate(vals_a[:30])
    ] + [
        {"event_id": 1000 + i, "ts": "2024-01-01T00:00:00", "user_id": i,
         "event_type": "purchase", "value": v}
        for i, v in enumerate(vals_b[:40])
    ]
    rows2 = [
        {"event_id": 2000 + i, "ts": "2024-01-01T01:00:00", "user_id": i,
         "event_type": "click", "value": v}
        for i, v in enumerate(vals_a[30:])
    ] + [
        {"event_id": 3000 + i, "ts": "2024-01-01T01:00:00", "user_id": i,
         "event_type": "purchase", "value": v}
        for i, v in enumerate(vals_b[40:])
    ]
    prof = str(tmp_path / "drift_profile")
    ckpt = str(tmp_path / "drift_ckpt")

    drop("d1.json", rows1)
    ingest_stream.maintain_drift_profile(
        spark, str(evdir), prof, ckpt, schema, lo=lo, hi=hi
    )
    drop("d2.json", rows2)
    ingest_stream.maintain_drift_profile(
        spark, str(evdir), prof, ckpt, schema, lo=lo, hi=hi
    )

    # (a) one-shot equivalence on the same grid
    def bin_of(v):
        return max(0, min(BINS - 1, math.floor((v - lo) * BINS / (hi - lo))))

    expect: dict[tuple[str, int], int] = {}
    for key, vals in (("click", vals_a), ("purchase", vals_b)):
        for v in vals:
            k = (key, bin_of(v))
            expect[k] = expect.get(k, 0) + 1
    got = {
        (r.key, r.bin): r.c for r in spark.read.parquet(prof).collect()
    }
    assert got == expect

    # (b) reader arithmetic equals an independent recomputation
    stats = ingest_stream.read_drift_stats(spark, prof, "click", "purchase").collect()[0]
    na, nb = len(vals_a), len(vals_b)
    ca = [0] * BINS
    cb = [0] * BINS
    for v in vals_a:
        ca[bin_of(v)] += 1
    for v in vals_b:
        cb[bin_of(v)] += 1
    # cumulative shares over OCCUPIED bins (the maintained table has no
    # zero rows — same as the batch monitor's aggregated-bin window)
    occupied = [b for b in range(BINS) if ca[b] or cb[b]]
    fa = fb = 0.0
    ks = 0.0
    psi = 0.0
    for b in occupied:
        fa += ca[b] / na
        fb += cb[b] / nb
        ks = max(ks, abs(fa - fb))
        pa = (ca[b] + 0.5) / (na + 0.5 * BINS)
        pb = (cb[b] + 0.5) / (nb + 0.5 * BINS)
        psi += (pa - pb) * math.log(pa / pb)
    assert stats.n_a == na and stats.n_b == nb
    assert abs(stats.ks_distance - round(ks, 4)) < 1e-9
    assert abs(stats.psi - round(psi, 4)) < 1e-9
    assert stats.ks_distance > 0.3  # the shifted distributions DO drift

    # (c) replay guard: no new files -> no new epochs -> bit-unchanged
    ingest_stream.maintain_drift_profile(
        spark, str(evdir), prof, ckpt, schema, lo=lo, hi=hi
    )
    again = {
        (r.key, r.bin): r.c for r in spark.read.parquet(prof).collect()
    }
    assert again == expect

    # degenerate grid refused
    import pytest as _pytest

    with _pytest.raises(ValueError, match="hi > lo"):
        ingest_stream.maintain_drift_profile(
            spark, str(evdir), prof, ckpt, schema, lo=5.0, hi=5.0
        )


def test_source_term_maintenance_matches_batch_jsd(spark, tmp_path):
    """Streaming twin of the text_js_divergence monitor: per-source
    term counts accumulate across drops and match a batch recount; the
    read_js_divergence answer over the MAINTAINED state equals the
    batch operator's arithmetic recomputed over the full corpus
    (one-shot equivalence); replay (second run with no new files)
    changes nothing; a checkpoint reset against a kept table is a loud
    lineage error."""
    import math
    import shutil
    from collections import Counter, defaultdict

    import pytest

    docsdir = tmp_path / "st_docs"
    docsdir.mkdir()
    schema = "doc_id long, source string, text string"

    def drop(name, rows):
        with open(docsdir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    counts_path = str(tmp_path / "src_term_counts")
    ckpt = str(tmp_path / "st_ckpt")
    d1 = [
        {"doc_id": 1, "source": "a", "text": "spark scales spark joins"},
        {"doc_id": 2, "source": "b", "text": "duck checks spark"},
    ]
    d2 = [
        {"doc_id": 3, "source": "a", "text": "spark again joins"},
        {"doc_id": 4, "source": "c", "text": "joins joins spark"},
        # source d shares NO terms with anyone: its pairs must still be
        # reported at jsd = ln 2 from the zero-filled tails
        {"doc_id": 5, "source": "d", "text": "qq ww ee"},
    ]
    drop("f1.json", d1)
    ingest_stream.maintain_source_term_counts(
        spark, str(docsdir), counts_path, ckpt, schema
    )
    drop("f2.json", d2)
    ingest_stream.maintain_source_term_counts(
        spark, str(docsdir), counts_path, ckpt, schema
    )
    dist = defaultdict(Counter)
    for r in d1 + d2:
        dist[r["source"]].update(r["text"].split())
    got = {
        (r.source, r.term): r.c
        for r in spark.read.parquet(counts_path).collect()
    }
    want = {(s, w): c for s, cnt in dist.items() for w, c in cnt.items()}
    assert got == want

    # replay: no new files => identical table
    ingest_stream.maintain_source_term_counts(
        spark, str(docsdir), counts_path, ckpt, schema
    )
    got2 = {
        (r.source, r.term): r.c
        for r in spark.read.parquet(counts_path).collect()
    }
    assert got2 == got

    # one-shot equivalence: reader over maintained state == textbook
    # union-vocabulary JSD over the full corpus
    rows = {
        (r.source_a, r.source_b): (r.n_shared_terms, r.jsd)
        for r in ingest_stream.read_js_divergence(spark, counts_path).collect()
    }
    srcs = sorted(dist)
    assert set(rows) == {(x, y) for x in srcs for y in srcs if x < y}
    for (sa, sb), (n_shared, jsd) in rows.items():
        pa, pb = dist[sa], dist[sb]
        na, nb = sum(pa.values()), sum(pb.values())
        want_jsd = 0.0
        for w in set(pa) | set(pb):
            p, q = pa[w] / na, pb[w] / nb
            m = (p + q) / 2
            if p:
                want_jsd += 0.5 * p * math.log(p / m)
            if q:
                want_jsd += 0.5 * q * math.log(q / m)
        assert n_shared == len(set(pa) & set(pb))
        assert abs(jsd - want_jsd) < 5e-4

    # lineage guard: reset checkpoint, keep table -> loud error
    shutil.rmtree(ckpt)
    with pytest.raises(Exception, match="lineage"):
        ingest_stream.maintain_source_term_counts(
            spark, str(docsdir), counts_path, ckpt, schema
        )
    got3 = {
        (r.source, r.term): r.c
        for r in spark.read.parquet(counts_path).collect()
    }
    assert got3 == got, "failed run must not have touched the table"


def test_cooc_graph_stream_equals_batch_textrank(spark, tmp_path, sf_dir):
    """maintain_cooc_graph + textrank_from_index must equal the batch
    text_textrank_keywords BIT-FOR-BIT on the same corpus: pair-count
    partials are additive across doc-disjoint batches (windows never
    cross documents) and the shared rank loop is pure bigint, so there
    is no tolerance band. Also pins epoch immutability (batch-1
    partition files are never rewritten by batch 2) and idempotent
    re-runs (no new files without new input)."""
    import glob
    import json
    import os

    from build_a_cloud_based_batch_etl_pipeline_spark.operators.text import (
        text_textrank_keywords,
        textrank_from_index,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    mid = len(docs) // 2

    docsdir = tmp_path / "cooc_docs"
    docsdir.mkdir()
    schema = "doc_id long, text string"
    root = str(tmp_path / "cooc_index")
    ckpt = str(tmp_path / "cooc_ckpt")

    def drop(name, rows):
        with open(docsdir / name, "w") as f:
            for r in rows:
                f.write(json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n")

    def listing():
        return {
            p: (os.path.getsize(p), os.path.getmtime(p))
            for p in glob.glob(f"{root}/**/*", recursive=True)
            if os.path.isfile(p)
        }

    drop("b1.json", docs[:mid])
    ingest_stream.maintain_cooc_graph(spark, str(docsdir), root, ckpt, schema)
    snap1 = listing()
    assert glob.glob(f"{root}/pairs/epoch=*") and glob.glob(
        f"{root}/words/epoch=*"
    )

    drop("b2.json", docs[mid:])
    ingest_stream.maintain_cooc_graph(spark, str(docsdir), root, ckpt, schema)
    snap2 = listing()
    for p, meta in snap1.items():
        assert snap2[p] == meta, f"batch-1 graph file rewritten: {p}"
    assert len(glob.glob(f"{root}/pairs/epoch=*")) == 2

    # no new input -> byte-stable
    ingest_stream.maintain_cooc_graph(spark, str(docsdir), root, ckpt, schema)
    assert listing() == snap2

    got = {
        r.word: (r.wdeg, r.rank_ppb)
        for r in textrank_from_index(spark, root).collect()
    }
    want = {
        r.word: (r.wdeg, r.rank_ppb)
        for r in text_textrank_keywords(spark, sf_dir).collect()
    }
    assert got == want


def test_pq_index_stream_maintenance_replay_and_missing_base(
    spark, tmp_path, monkeypatch
):
    """Streaming PQ-index maintenance (VERDICT r11 item 2): a stream
    against a MISSING base index fails loudly with build_pq_index's
    instruction (training never happens implicitly on the ingest path);
    once the base exists, each wave of arriving embedding files commits
    exactly one epoch; base files are never rewritten; a no-new-files
    rerun changes nothing; a crash after the epoch commit (before the
    checkpoint commit) converges on replay with no duplicate rows; and
    the incremental loader serves base+epochs as one index."""
    import glob
    import os

    import numpy as np

    from build_a_cloud_based_batch_etl_pipeline_spark.operators import (
        similarity as sim,
    )

    embdir = tmp_path / "pq_emb"
    embdir.mkdir()
    schema = "vec_id long, embedding array<double>"
    sf = str(tmp_path / "pq_sf")
    os.makedirs(sf)
    root = str(tmp_path / "pq_stream_index")
    ckpt = str(tmp_path / "pq_stream_ckpt")

    rng = np.random.RandomState(41)
    base = rng.randn(400, 64).astype("float32")
    spark.createDataFrame(
        [(int(i), [float(x) for x in base[i]], 0) for i in range(400)],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(2).write.parquet(f"{sf}/embeddings.parquet")

    def drop(name, id0, vecs):
        with open(embdir / name, "w") as f:
            for i in range(len(vecs)):
                f.write(
                    json.dumps(
                        {"vec_id": id0 + i,
                         "embedding": [float(x) for x in vecs[i]]}
                    )
                    + "\n"
                )

    def listing():
        return {
            p: (os.path.getsize(p), os.path.getmtime(p))
            for p in glob.glob(f"{root}/**/*", recursive=True)
            if os.path.isfile(p)
        }

    drop("w1.json", 1000, rng.randn(30, 64))

    # missing base: the first batch must fail with the build instruction
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException) as exc_info:
        ingest_stream.maintain_pq_index(spark, str(embdir), root, ckpt, schema)
    assert "build_pq_index" in str(exc_info.value)

    assert sim.build_pq_index(spark, sf, root) is True
    # restart on the SAME checkpoint: the failed batch replays and
    # commits now that the base exists
    ingest_stream.maintain_pq_index(spark, str(embdir), root, ckpt, schema)
    epochs1 = glob.glob(f"{root}/pq_codes_epochs/epoch=*")
    assert len(epochs1) == 1
    snap1 = listing()

    # wave 2: new epoch, wave-1 epoch + base files byte-stable
    drop("w2.json", 2000, rng.randn(25, 64))
    ingest_stream.maintain_pq_index(spark, str(embdir), root, ckpt, schema)
    snap2 = listing()
    for p, meta in snap1.items():
        assert snap2[p] == meta, f"earlier index file rewritten: {p}"
    assert len(glob.glob(f"{root}/pq_codes_epochs/epoch=*")) == 2

    # no new files -> byte-stable
    ingest_stream.maintain_pq_index(spark, str(embdir), root, ckpt, schema)
    assert listing() == snap2

    # crash AFTER the epoch commit, before the checkpoint commit: the
    # replayed epoch finds its partition present and skips
    drop("w3.json", 3000, rng.randn(20, 64))
    real_append = sim.append_pq_epoch

    def crash_after_commit(spark_, batch, index_root, lineage, epoch_id):
        committed = real_append(spark_, batch, index_root, lineage, epoch_id)
        raise RuntimeError(
            f"injected crash: epoch committed={committed}, checkpoint not"
        )

    import build_a_cloud_based_batch_etl_pipeline_spark.operators.similarity as sim_mod

    monkeypatch.setattr(sim_mod, "append_pq_epoch", crash_after_commit)
    with pytest.raises(StreamingQueryException) as exc_info:
        ingest_stream.maintain_pq_index(spark, str(embdir), root, ckpt, schema)
    assert "injected crash" in str(exc_info.value)
    monkeypatch.setattr(sim_mod, "append_pq_epoch", real_append)
    ingest_stream.maintain_pq_index(spark, str(embdir), root, ckpt, schema)

    assert len(glob.glob(f"{root}/pq_codes_epochs/epoch=*")) == 3
    ep = spark.read.parquet(f"{root}/pq_codes_epochs")
    assert ep.count() == ep.select("vec_id").distinct().count() == 75

    books, ids, codes, coarse, assign = sim.load_pq_index_incremental(
        spark, root
    )
    assert len(ids) == 475
    # every stored code indexes into the loaded codebooks
    assert codes.max() < books.shape[1]


def test_incremental_load_clustered_dirty_only_and_crash_convergence(
    spark, tmp_path, monkeypatch
):
    """The ingest→OPTIMIZE-ZORDER loop composed into one stream
    (VERDICT r11 item 5): wave 2 touches only one of wave 1's
    partitions — the untouched partition's files (data + marker) stay
    byte-identical (dirty-only maintenance, mechanically asserted on
    the listing); a crash between the idempotent append and the
    maintenance pass converges across a checkpoint restart to exactly
    the crash-free state (no duplicate keys, every partition
    marker-clean); replays append nothing."""
    import glob
    import os

    from build_a_cloud_based_batch_etl_pipeline_spark.operators import (
        layout as layout_mod,
    )
    from build_a_cloud_based_batch_etl_pipeline_spark.operators.layout import (
        _ZORDER_MARKER,
        _partition_fingerprint,
    )

    srcdir = tmp_path / "clustered_src"
    srcdir.mkdir()
    schema = "id long, grp string, x long, y long"
    table = str(tmp_path / "clustered_table")
    ckpt = str(tmp_path / "clustered_ckpt")

    def drop(name, rows):
        with open(srcdir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def run():
        ingest_stream.incremental_load_clustered(
            spark, str(srcdir), table, ckpt, schema, "grp", ["x", "y"]
        )

    def part_listing(part):
        d = os.path.join(table, part)
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if os.path.isfile(os.path.join(d, f))
        }

    def assert_all_clean():
        for entry in os.listdir(table):
            d = os.path.join(table, entry)
            if not os.path.isdir(d) or "=" not in entry:
                continue
            marker = os.path.join(d, _ZORDER_MARKER)
            assert os.path.isfile(marker), f"{entry} unclustered"
            with open(marker) as f:
                assert f.read().strip() == _partition_fingerprint(d), entry

    # wave 1: two partitions
    drop("w1.json", [
        {"id": i, "grp": "a" if i % 2 else "b",
         "x": i * 7 % 101, "y": i * 13 % 97}
        for i in range(200)
    ])
    run()
    assert_all_clean()
    snap_b = part_listing("grp=b")

    # wave 2: touches ONLY grp=a (plus replayed ids that must be no-ops)
    drop("w2.json", [
        {"id": 1000 + i, "grp": "a", "x": i, "y": i * 3 % 31}
        for i in range(50)
    ] + [{"id": 0, "grp": "b", "x": 0, "y": 0}])  # id=0 already loaded
    run()
    assert_all_clean()
    assert part_listing("grp=b") == snap_b, (
        "untouched partition was rewritten — maintenance must be dirty-only"
    )
    df = spark.read.parquet(table)
    assert df.count() == df.select("id").distinct().count() == 250

    # wave 3 with an injected crash BETWEEN append and maintenance
    drop("w3.json", [
        {"id": 2000 + i, "grp": "b", "x": i * 5 % 89, "y": i}
        for i in range(40)
    ])
    real_maintain = layout_mod.zorder_maintain

    def crash_before_maintain(*a, **k):
        raise RuntimeError("injected crash: appended, not maintained")

    monkeypatch.setattr(layout_mod, "zorder_maintain", crash_before_maintain)
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException) as exc_info:
        run()
    assert "injected crash" in str(exc_info.value)
    # crash window state: rows appended, partition dirty (marker stale)
    bdir = os.path.join(table, "grp=b")
    with open(os.path.join(bdir, _ZORDER_MARKER)) as f:
        assert f.read().strip() != _partition_fingerprint(bdir), (
            "crash point must leave the touched partition dirty"
        )

    monkeypatch.setattr(layout_mod, "zorder_maintain", real_maintain)
    run()  # restart on the same checkpoint: replay converges
    assert_all_clean()
    df = spark.read.parquet(table)
    assert df.count() == df.select("id").distinct().count() == 290
    assert df.filter("grp = 'b'").count() == 140
    # no parked/staging debris anywhere
    assert not glob.glob(f"{table}/.zorder_old/*")
    assert not glob.glob(f"{table}/.zorder_staging/*")

    # no new files -> full no-op pass
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{table}/**/*", recursive=True)
        if os.path.isfile(p)
    }
    run()
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{table}/**/*", recursive=True)
        if os.path.isfile(p)
    }
    assert after == before

    # the point of the loop: the streamed table's files are actually
    # CLUSTERED — a narrow x-band prunes row groups in every partition.
    # At 4 tiny files/partition the z-curve's per-file x-extent bounds
    # the fraction (~0.25-0.5 here); the clustering QUALITY floor
    # (>=0.5 on real partition sizes, vs <0.25 unclustered) is pinned
    # in tests/test_layout.py — this asserts the stream composition
    # produces clustered output at all crash/replay paths.
    from tests.test_layout import _prunable_fraction

    for part in ("grp=a", "grp=b"):
        frac = _prunable_fraction(os.path.join(table, part), "x", 92.0, 100.0)
        assert frac >= 0.25, (part, frac)
