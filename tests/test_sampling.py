"""Sampling & packing properties: hash-split stability, packing bin
budgets, stratified sampler determinism and rate accuracy."""

from __future__ import annotations

from build_a_cloud_based_batch_etl_pipeline_spark.queries import load_all
from build_a_cloud_based_batch_etl_pipeline_spark.operators.sampling import (
    STRATA_FRACTIONS,
    _BIN_CAPACITY,
)

REGISTRY = load_all()


def test_hash_split_covers_all_docs(spark, sf_dir):
    out = {r.split: r.n_docs for r in
           REGISTRY["sample_hash_split"].fn(spark, sf_dir).collect()}
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(out.values()) == total
    assert set(out) == {"train", "valid", "test"}
    # ~5% buckets, wide tolerance at 500 docs
    assert 0.005 * total < out["valid"] < 0.15 * total
    assert out["train"] > 0.7 * total


def test_hash_split_stable_under_growth(spark, sf_dir):
    """A doc's split never changes when the corpus grows — the hash
    depends only on doc_id."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(bucket < "0d", "valid").when(bucket < "1a", "test").otherwise("train")
    )
    full = {r.doc_id: r.s for r in docs.select("doc_id", split.alias("s")).collect()}
    half = {r.doc_id: r.s for r in
            docs.limit(200).select("doc_id", split.alias("s")).collect()}
    assert all(full[k] == v for k, v in half.items())


def test_pack_token_bins_budget(spark, sf_dir):
    """Every bin except a source's last holds >= capacity-worth of docs
    only through its final (straddling) doc: the cumsum BEFORE each doc
    in the bin is under capacity; totals are preserved."""
    rows = REGISTRY["pack_token_bins"].fn(spark, sf_dir).collect()
    import math

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    est_total = sum(math.ceil(d.n_chars / 4.0) for d in docs)
    assert sum(r.bin_tokens for r in rows) == est_total
    per_source: dict[str, list] = {}
    for r in rows:
        per_source.setdefault(r.source, []).append(r)
    for source, bins in per_source.items():
        bins.sort(key=lambda r: r.bin)
        assert [b.bin for b in bins] == list(range(len(bins)))  # contiguous
        for b in bins[:-1]:
            # each non-final bin crossed the capacity with its last doc
            assert b.bin_tokens >= 1  # non-empty
        # all but possibly the last bin reach capacity once the straddling
        # doc lands: cumulative mass of bins 0..k spans (k*cap, inf)
        cum = 0
        for b in bins[:-1]:
            cum += b.bin_tokens
            assert cum >= (b.bin + 1) * _BIN_CAPACITY


def test_stratified_sample_deterministic_and_rated(spark, sf_dir):
    fn = REGISTRY["sample_stratified"].fn
    a = {r.doc_id for r in fn(spark, sf_dir).collect()}
    b = {r.doc_id for r in fn(spark, sf_dir).collect()}
    assert a == b  # same seed, same partitioning -> same sample
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    strata = {r.lang: r.n for r in docs.groupBy("lang").count()
              .withColumnRenamed("count", "n").collect()}
    got = {r.lang: 0 for r in docs.select("lang").distinct().collect()}
    for r in fn(spark, sf_dir).collect():
        got[r.lang] = got.get(r.lang, 0) + 1
    for lang, frac in STRATA_FRACTIONS.items():
        if lang in strata and strata[lang] >= 30:
            rate = got.get(lang, 0) / strata[lang]
            assert abs(rate - frac) < 0.2, (lang, rate, frac)
    # unlisted strata are excluded entirely
    for lang, n in got.items():
        if lang not in STRATA_FRACTIONS:
            assert n == 0
