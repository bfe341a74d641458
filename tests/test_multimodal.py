"""Multimodal plumbing: binary column construction, Arrow-batched
mapInPandas decode shape, metadata consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from build_a_cloud_based_batch_etl_pipeline_spark.operators import multimodal


def test_binary_payload_roundtrip(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    bin_df = multimodal.with_binary_payload(docs)
    row = bin_df.select("payload", "meta.byte_len", "meta.digest").first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.byte_len == len(row.payload)


def test_decode_stub_schema_and_determinism(spark, sf_dir):
    out = multimodal.multimodal_decode(spark, sf_dir)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "byte_len", "width", "height", "format",
    ]
    rows1 = {r.doc_id: (r.width, r.height, r.format) for r in out.collect()}
    rows2 = {r.doc_id: (r.width, r.height, r.format) for r in
             multimodal.multimodal_decode(spark, sf_dir).collect()}
    assert rows1 == rows2  # deterministic fake decode
    assert all(1 <= w <= 64 and 1 <= h <= 64 for (w, h, _) in rows1.values())


def test_decode_byte_len_matches_n_chars(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = multimodal.multimodal_decode(spark, sf_dir).alias("d").join(
        docs.alias("o"), "doc_id"
    )
    # ASCII fixture text: utf-8 byte length == char length == n_chars
    bad = out.filter(F.col("byte_len") != F.col("n_chars")).count()
    assert bad == 0


def test_resize_stub_shape_and_determinism(spark, sf_dir):
    out = multimodal.multimodal_resize(spark, sf_dir)
    rows1 = {r.doc_id: (r.width, r.height, bytes(r.thumb), r.mean_byte)
             for r in out.collect()}
    rows2 = {r.doc_id: (r.width, r.height, bytes(r.thumb), r.mean_byte)
             for r in multimodal.multimodal_resize(spark, sf_dir).collect()}
    assert rows1 == rows2  # deterministic fake resize
    for w, h, thumb, mean in rows1.values():
        assert (w, h) == (8, 8)
        assert len(thumb) == 64  # fixed thumbnail payload
        assert 0.0 <= mean <= 255.0


def test_frame_sample_counts(spark, sf_dir):
    """Every doc emits ceil(ceil(bytes/64)/2) frames (stride 2), and all
    but possibly the final frame carry exactly 64 bytes."""
    import math

    docs = {r.doc_id: r.n_chars
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    from build_a_cloud_based_batch_etl_pipeline_spark.queries import load_all

    out = load_all()["multimodal_frame_sample"].fn(spark, sf_dir).collect()
    per_doc: dict[int, list] = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, n_chars in docs.items():
        n_frames = math.ceil(math.ceil(n_chars / 64) / 2)
        got = per_doc.get(doc_id, [])
        assert len(got) == n_frames, (doc_id, n_chars, len(got), n_frames)
        for r in got:
            assert r.frame_bytes == 64 or r.frame_idx == max(g.frame_idx for g in got)
