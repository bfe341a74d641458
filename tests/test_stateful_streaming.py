"""Custom stateful streaming operator: state persists across micro-batches
(applyInPandasWithState running totals)."""

from __future__ import annotations

import json

from build_a_cloud_based_batch_etl_pipeline_spark.schemas import EVENTS
from build_a_cloud_based_batch_etl_pipeline_spark.streaming import stateful


def _write_events(d, name, rows):
    d.mkdir(parents=True, exist_ok=True)
    with open(d / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, src_dir, ckpt, out_dir):
    """foreachBatch -> parquet sink: unlike the memory sink it supports
    checkpoint recovery, which is the point of this test."""
    stream = spark.readStream.schema(EVENTS).json(str(src_dir))

    def sink(batch, epoch_id):
        if batch.count():
            batch.write.mode("append").parquet(str(out_dir))

    q = (
        stateful.running_user_totals(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(str(out_dir))


def test_state_accumulates_across_batches(spark, tmp_path):
    src = tmp_path / "ev"
    ckpt = tmp_path / "ckpt"
    _write_events(src, "b1.json", [
        {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 7,
         "event_type": "click", "value": 10.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T00:01:00", "user_id": 7,
         "event_type": "view", "value": 5.0, "props": "{}"},
    ])
    out1 = _run(spark, src, ckpt, tmp_path / "out1")
    r1 = {r.user_id: (r.n_events, r.total_value) for r in out1.collect()}
    assert r1 == {7: (2, 15.0)}

    # second run, new file: state must carry over (2+1 events, 15+5 value)
    _write_events(src, "b2.json", [
        {"event_id": 3, "ts": "2024-01-01T00:02:00", "user_id": 7,
         "event_type": "click", "value": 5.0, "props": "{}"},
    ])
    out2 = _run(spark, src, ckpt, tmp_path / "out2")
    r2 = {r.user_id: (r.n_events, r.total_value) for r in out2.collect()}
    assert r2 == {7: (3, 20.0)}
