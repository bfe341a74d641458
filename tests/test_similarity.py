"""ANN recall property checks for both approximate variants (hyperplane
LSH and IVF centroid bucketing):

1. On the fixture corpus — a MODERATE-similarity regime (max pairwise
   cosine ~0.5) — the tuned defaults must recover a substantial fraction
   of the exact brute-force top-5, and every pair they emit must carry
   the same exact cosine the baseline computes (approximation may LOSE
   pairs, never corrupt scores).
2. On planted near-duplicates (cosine ~1), LSH with near-dup-regime
   parameters (12 bits x 2 tables — sparse buckets) must find every
   planted pair: the actual dedup guarantee at corpus scale.
"""

from __future__ import annotations

import pytest

from build_a_cloud_based_batch_etl_pipeline_spark.queries import load_all
from build_a_cloud_based_batch_etl_pipeline_spark.operators.similarity import (
    ann_lsh_topk,
)

REGISTRY = load_all()


def _pairs(df):
    return {(r.qid, r.nid): r.cosine for r in df.collect()}


@pytest.fixture(scope="module")
def exact(spark, sf_dir):
    return _pairs(REGISTRY["embed_cosine_topk"].fn(spark, sf_dir))


# Thresholds from the parameter sweep on sf0.001 (see similarity.py
# defaults): LSH(4,8) measured 0.644, IVF(nprobe=3) measured 0.532.
@pytest.mark.parametrize(
    "ann,min_recall", [("embed_ann_lsh", 0.55), ("embed_ann_ivf", 0.45)]
)
def test_ann_recall_vs_exact(spark, sf_dir, exact, ann, min_recall):
    approx = _pairs(REGISTRY[ann].fn(spark, sf_dir))
    hits = set(exact) & set(approx)
    recall = len(hits) / len(exact)
    assert recall >= min_recall, f"{ann} recall {recall:.2f} vs exact top-5"
    # scores for recovered pairs are the exact cosine, bit-for-bit at 4dp
    for key in hits:
        assert abs(exact[key] - approx[key]) < 1e-9, f"{ann} corrupted score {key}"


@pytest.mark.parametrize("ann", ["embed_ann_lsh", "embed_ann_ivf"])
def test_ann_output_shape(spark, sf_dir, ann):
    df = REGISTRY[ann].fn(spark, sf_dir)
    rows = df.collect()
    assert rows, f"{ann} returned nothing"
    per_q: dict[int, int] = {}
    for r in rows:
        assert r.qid != r.nid
        per_q[r.qid] = per_q.get(r.qid, 0) + 1
    assert max(per_q.values()) <= 5


def test_dedup_embedding_lsh_subset_and_recall(spark, sf_dir):
    """The LSH-candidate semantic dedup must emit a strict SUBSET of the
    exact pair set (exact rescore => zero false positives) at a
    deterministic fixture recall (seeded hyperplanes, fixed data)."""
    exact_pairs = {
        (r.id_a, r.id_b): r.cosine
        for r in REGISTRY["dedup_embedding_cosine"].fn(spark, sf_dir).collect()
    }
    lsh_pairs = {
        (r.id_a, r.id_b): r.cosine
        for r in REGISTRY["dedup_embedding_lsh"].fn(spark, sf_dir).collect()
    }
    assert set(lsh_pairs) <= set(exact_pairs), "false positive pairs emitted"
    for k, v in lsh_pairs.items():
        assert abs(v - exact_pairs[k]) < 1e-9
    recall = len(lsh_pairs) / len(exact_pairs)
    # measured 0.59 at sf0.001 / 0.71 (24/34) at sf0.01 with the (4, 8)
    # moderate-cosine defaults; deterministic, so a drop means the
    # operator changed
    assert recall >= 0.55, f"dedup_embedding_lsh recall {recall:.2f}"


def test_embed_cosine_topk_index_guard(spark, monkeypatch):
    """The brute-force baseline must refuse an index above the broadcast
    cap instead of collecting it to the driver."""
    from build_a_cloud_based_batch_etl_pipeline_spark.operators import similarity

    monkeypatch.setattr(similarity, "_MAX_INDEX_ROWS", 10)
    with pytest.raises(ValueError, match="embed_ann_lsh"):
        REGISTRY["embed_cosine_topk"].fn(spark, "/root/testdata/sf0.01")


def test_lsh_finds_planted_near_duplicates(spark):
    """Near-dup regime: 40 well-separated base vectors + a tiny-jitter
    copy of each. With 12x2 signatures (sparse buckets) LSH must emit
    every planted pair as its neighbor's top hit."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(40, 64)
    rows = []
    for i, v in enumerate(base):
        dup = v + rng.randn(64) * 0.01  # cosine ~0.9999
        rows.append((i * 2, [float(x) for x in v]))
        rows.append((i * 2 + 1, [float(x) for x in dup]))
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    got = _pairs(ann_lsh_topk(emb, bits=12, tables=2, k=5))
    for i in range(40):
        a, b = i * 2, i * 2 + 1
        assert (a, b) in got and (b, a) in got, f"planted pair {(a, b)} missed"
        assert got[(a, b)] > 0.99
