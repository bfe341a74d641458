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


def test_weighted_topn_shape_and_bias(spark, sf_dir):
    """Per-source sample is exactly min(N, n_docs) rows, keys valid, and
    the token-weighted draw favors long documents (mean est_tokens of
    winners >= corpus mean — E-S keys are stochastically larger for
    larger weights)."""
    from pyspark.sql import functions as F

    from build_a_cloud_based_batch_etl_pipeline_spark.operators.sampling import _WTOP_N

    out = REGISTRY["sample_weighted_topn"].fn(spark, sf_dir)
    rows = out.collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_source = {r.source: r.n for r in docs.groupBy("source").count()
                  .withColumnRenamed("count", "n").collect()}
    got = {}
    for r in rows:
        got[r.source] = got.get(r.source, 0) + 1
        assert 0.0 <= r.weight_key <= 1.0
    for src, n in per_source.items():
        assert got.get(src, 0) == min(_WTOP_N, n), (src, got.get(src), n)
    mean_win = sum(r.est_tokens for r in rows) / len(rows)
    mean_all = docs.select(
        F.avg(F.ceil(F.col("n_chars") / 4.0))
    ).first()[0]
    assert mean_win >= mean_all, (mean_win, mean_all)


def test_weighted_median_between_bounds(spark, sf_dir):
    """The weighted median is an actual data value inside [min, max] and
    at least half the group's weight sits at or below it."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    med = {r.flag: r.weighted_median
           for r in REGISTRY["agg_weighted_median"].fn(spark, sf_dir).collect()}
    for r in li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        F.sum("l_quantity").alias("tot"),
    ).collect():
        assert r.lo <= med[r.l_returnflag] <= r.hi
    for flag, m in med.items():
        below = li.filter(
            (F.col("l_returnflag") == flag) & (F.col("l_extendedprice") <= m)
        ).agg(F.sum("l_quantity")).first()[0]
        tot = li.filter(F.col("l_returnflag") == flag).agg(
            F.sum("l_quantity")
        ).first()[0]
        assert below >= tot / 2.0


def test_strata_threshold_clamps_and_keeps_all_at_full_fraction():
    """ADVICE r3: frac near/at 1.0 must not render a 5-char threshold
    that excludes every 4-char md5 prefix (sampling ~0 rows). >=1.0 is
    keep-all (None); just-below clamps to 'ffff'."""
    from build_a_cloud_based_batch_etl_pipeline_spark.operators.sampling import (
        _strata_hex_lt,
    )

    assert _strata_hex_lt(1.0) is None
    assert _strata_hex_lt(1.5) is None
    assert _strata_hex_lt(0.999999) == "ffff"
    assert _strata_hex_lt(0.5) == "8000"
    assert _strata_hex_lt(0.2) == "3333"
    assert _strata_hex_lt(0.0) == "0000"


def test_bloom_confusion_one_sided_guarantee(spark, monkeypatch):
    """The Bloom pre-filter can NEVER miss an exact duplicate (the
    (bloom=False, exact=True) cell must be empty) and must flag a
    PLANTED cross-split duplicate as (True, True); false positives are
    allowed (and expected at the demo-tiny m)."""
    import hashlib

    from build_a_cloud_based_batch_etl_pipeline_spark.operators import (
        sampling as sampling_mod,
    )
    from build_a_cloud_based_batch_etl_pipeline_spark.operators.sampling import (
        _TEST_LT,
        _VALID_LT,
        decontaminate_bloom_confusion,
    )

    def bucket(i: int) -> str:
        return hashlib.md5(str(i).encode()).hexdigest()[:2]

    eval_id = next(i for i in range(1000) if bucket(i) < _VALID_LT)
    train_id = next(i for i in range(1000) if bucket(i) >= _TEST_LT)
    others = [i for i in range(1000) if bucket(i) >= _TEST_LT and i != train_id][:40]

    rows = [(eval_id, "the planted duplicate text", "en", "s", 20)]
    rows += [(train_id, "the planted duplicate text", "en", "s", 20)]
    rows += [(i, f"unique text number {i} with words", "en", "s", 30) for i in others]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(sampling_mod, "t", lambda s, d, n: docs)

    cells = {
        (r.bloom_hit, r.exact_hit): r.n_docs
        for r in decontaminate_bloom_confusion(spark, "ignored").collect()
    }
    assert (False, True) not in cells, cells  # one-sided: no false negatives
    assert cells.get((True, True), 0) == 1, cells  # the planted dup is caught
    assert sum(cells.values()) == 1 + len(others)


def test_dsir_weights_separate_target_from_offtarget(spark, sf_dir):
    """DSIR sanity: target-language (en) documents must score a higher
    MEAN importance weight than off-target docs — the whole point of the
    estimator — and every weight must be finite (Laplace smoothing
    guarantees no -inf/0-division even for buckets absent from the
    target)."""
    import math

    w = REGISTRY["sample_importance_weights"].fn(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    rows = w.join(docs, "doc_id").collect()
    assert all(math.isfinite(r.avg_logratio) for r in rows)
    en = [r.avg_logratio for r in rows if r.lang == "en"]
    other = [r.avg_logratio for r in rows if r.lang != "en"]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)


def test_dsir_resample_is_weight_biased_and_deterministic(spark, sf_dir):
    """The Gumbel top-k draw is (a) exactly k rows, (b) a subset of the
    corpus with keys consistent with the weight table, (c) identical
    across two runs (hash noise, no RNG state), and (d) biased toward
    high-weight docs (selected mean weight > corpus mean weight)."""
    from build_a_cloud_based_batch_etl_pipeline_spark.operators.sampling import (
        _DSIR_TOPK,
    )

    fn = REGISTRY["sample_dsir_resample"].fn
    a = fn(spark, sf_dir).collect()
    b = fn(spark, sf_dir).collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
    assert len(a) == _DSIR_TOPK
    w = {
        r.doc_id: r.avg_logratio
        for r in REGISTRY["sample_importance_weights"].fn(spark, sf_dir).collect()
    }
    assert all(r.doc_id in w and r.avg_logratio == w[r.doc_id] for r in a)
    sel_mean = sum(r.avg_logratio for r in a) / len(a)
    corpus_mean = sum(w.values()) / len(w)
    assert sel_mean > corpus_mean
