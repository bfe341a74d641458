"""Multimodal plumbing: binary column construction, Arrow-batched
mapInPandas decode shape, metadata consistency."""

from __future__ import annotations

import base64

import pytest
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


# 1x1 transparent PNG (hand-built, public-domain bytes) for exercising the
# real-decode branch whenever an imaging library is present.
_PNG_1X1 = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
    "AAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
)


def test_decode_one_fake_branch_for_non_image_bytes():
    """Non-image payloads always take the deterministic fake, with or
    without PIL — fixture query output is environment-independent."""
    w, h, fmt = multimodal._decode_one(b"plain document text")
    assert (w, h, fmt) == multimodal._fake_decode(b"plain document text")
    assert fmt.startswith("fake/")
    assert multimodal._decode_one(b"") == (0, 0, "fake/empty")


@pytest.mark.skipif(not multimodal._HAVE_PIL, reason="no imaging library in container")
def test_decode_one_real_branch_with_pil():
    """With PIL present a real PNG decodes to its true dimensions."""
    assert multimodal._decode_one(_PNG_1X1) == (1, 1, "image/png")


@pytest.mark.skipif(not multimodal._HAVE_PIL, reason="no imaging library in container")
def test_resize_real_branch_with_pil():
    """With PIL present a real PNG resizes to a 64-byte 8x8 grayscale."""
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": [1], "payload": [_PNG_1X1]})
    out = next(multimodal.resize_batch(iter([pdf])))
    assert len(bytes(out["thumb"].iloc[0])) == 64
    assert 0.0 <= out["mean_byte"].iloc[0] <= 255.0


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


def test_phash_dedup_finds_planted_payload_duplicates(spark):
    """Byte-identical payloads must pair at hamming 0; a lightly
    perturbed copy (thumbnail mostly unchanged) must pair within the
    threshold; unrelated payloads must not flood the pair set."""
    texts = {
        1: "alpha beta gamma delta " * 40,
        2: "alpha beta gamma delta " * 40,  # byte-identical to 1
        3: "zz qq ww ee rr tt yy uu ii oo pp " * 31,
        4: "totally different content with other bytes " * 23,
    }
    docs = spark.createDataFrame(
        [(i, s) for i, s in texts.items()], "doc_id: long, text: string"
    )
    bin_df = multimodal.with_binary_payload(docs).select("doc_id", "payload")
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in multimodal.phash_pairs(bin_df).collect()
    }
    assert pairs.get((1, 2)) == 0, f"identical payloads must pair at 0: {pairs}"
    # self-pairs impossible by construction
    assert all(a < b for a, b in pairs)


def test_phash_batch_is_deterministic_and_bounded(spark, sf_dir):
    """The aHash fingerprint is a stable function of the payload and the
    full-query pair set is reproducible run-to-run."""
    out1 = multimodal.multimodal_phash_dedup(spark, sf_dir).collect()
    out2 = multimodal.multimodal_phash_dedup(spark, sf_dir).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    for r in out1:
        assert 0 <= r.hamming <= 6


def test_phash_index_incremental_dedup_planted(spark, tmp_path):
    """Persisted phash index: a batch payload byte-identical to an
    indexed one hits at hamming 0 using ONLY stored fingerprints; an
    unrelated batch payload yields nothing; extending the index with a
    second epoch leaves epoch-1 files untouched."""
    import glob
    import os

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta " * 40),
            (2, "zz qq ww ee rr tt yy uu ii oo pp " * 31),
        ],
        "doc_id: long, text: string",
    )
    root = str(tmp_path / "phash_idx")
    multimodal.build_phash_index(
        spark,
        multimodal.with_binary_payload(corpus).select("doc_id", "payload"),
        root,
    )
    snap = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{root}/**/*", recursive=True)
        if os.path.isfile(p)
    }

    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta " * 40),  # identical to corpus 1
            (11, "totally different content with other bytes " * 23),
        ],
        "doc_id: long, text: string",
    )
    hits = multimodal.multimodal_dedup_against_index(
        spark,
        multimodal.with_binary_payload(batch).select("doc_id", "payload"),
        root,
    ).collect()
    got = {(r.new_doc, r.index_doc): r.hamming for r in hits}
    assert got.get((10, 1)) == 0, got
    assert all(nd != 11 for nd, _ in got), "unrelated payload must not hit"

    # second epoch extends without rewriting epoch-1 files
    multimodal.build_phash_index(
        spark,
        multimodal.with_binary_payload(batch).select("doc_id", "payload"),
        root,
        epoch_id=1,
    )
    for p, mt in snap.items():
        assert os.path.getmtime(p) == mt, f"epoch-1 file rewritten: {p}"
    assert len(glob.glob(f"{root}/phash/epoch=*")) == 2
