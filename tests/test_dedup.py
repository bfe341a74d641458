"""Dedup operator properties: exact-duplicate detection is total, MinHash
candidate recall vs the exact-Jaccard ground truth, SimHash invariants
(SURVEY.md §5 item 4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from build_a_cloud_based_batch_etl_pipeline_spark.operators import dedup
from build_a_cloud_based_batch_etl_pipeline_spark.schemas import DOCUMENTS


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema=DOCUMENTS)


def test_exact_dedup_finds_planted_duplicates(spark, sf_dir):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    dup = base.withColumn("doc_id", F.col("doc_id") + 100000)
    both = base.unionByName(dup)

    grouped = (
        both.groupBy(F.md5("text").alias("h"))
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("canon"))
    )
    rows = grouped.collect()
    assert all(r.n == 2 for r in rows)
    assert all(r.canon < 100000 for r in rows)


def test_minhash_recall_vs_exact(spark, sf_dir):
    exact = dedup.dedup_ngram_jaccard(spark, sf_dir)
    truth = {(r.doc_a, r.doc_b) for r in exact.collect()}
    approx = dedup.dedup_minhash_pairs(spark, sf_dir)
    found = {(r.doc_a, r.doc_b) for r in approx.collect()}
    # candidates are verified with the same exact jaccard threshold, so
    # false positives are impossible by construction...
    assert found <= truth
    # ...and 16x2 banding keeps recall high at the 0.5 threshold
    if truth:
        recall = len(found & truth) / len(truth)
        assert recall >= 0.8, f"recall {recall:.2f}, missed {truth - found}"


def test_simhash_invariants(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 0),
        (2, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 0),
        (3, "alpha beta gamma delta epsilon zeta eta iota", "en", "s", 0),
        (4, "x1 y2 z3 w4 v5 u6 t7 s8 r9 q10 p11 o12", "en", "s", 0),
    ]
    fp = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(_docs(spark, rows)).collect()}
    # identical text -> identical fingerprint
    assert fp[1] == fp[2]
    # one-word change -> small hamming distance; unrelated -> large
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(fp[1], fp[3]) <= 16
    assert ham(fp[1], fp[4]) > 16


def test_clusters_cover_near_dup_pairs(spark, sf_dir):
    """Total cover (one cluster row per doc); every near-dup edge joins
    one cluster; cluster_id is the component's smallest doc_id; sizes are
    consistent with the edge-induced components."""
    from build_a_cloud_based_batch_etl_pipeline_spark.queries import load_all

    REG = load_all()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = {r.doc_id: (r.cluster_id, r.cluster_size)
           for r in REG["dedup_clusters"].fn(spark, sf_dir).collect()}
    assert len(out) == docs.count()  # total cover, one row per doc
    edges = [(r.doc_a, r.doc_b)
             for r in REG["dedup_minhash_pairs"].fn(spark, sf_dir).collect()]
    assert edges, "fixture should contain near-duplicate pairs"
    for a, b in edges:
        assert out[a][0] == out[b][0], f"edge ({a},{b}) split across clusters"
    # brute-force union-find over the same edges -> exact components
    parent = {d: d for d in out}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, set] = {}
    for d in out:
        comp.setdefault(find(d), set()).add(d)
    for root, members in comp.items():
        expect_id = min(members)
        for m in members:
            assert out[m][0] == expect_id, (m, out[m][0], expect_id)
            assert out[m][1] == len(members), (m, out[m][1], len(members))


def test_shingle_helpers_handle_short_docs(spark):
    """Docs shorter than the shingle width must yield ZERO shingles, not
    a descending [1, 0] index sequence that element_at's past the array
    (ANSI crash; regression for the sequence(1, 0) pitfall)."""
    from build_a_cloud_based_batch_etl_pipeline_spark.operators.dedup import (
        gram_hashes,
        shingles,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two words"), (4, "a b c"), (5, "a b c d e")],
        "doc_id: long, text: string",
    )
    by_doc = {r.doc_id: len(r.grams) for r in gram_hashes(docs).collect()}
    assert by_doc == {1: 0, 2: 0, 3: 0, 4: 1, 5: 3}
    sh = shingles(docs).collect()
    assert {r.doc_id for r in sh} == {4, 5}


def test_minhash_band_cap_keeps_degenerate_corpus_connected(spark, monkeypatch):
    """400 identical documents put every doc in ONE band bucket per band —
    the occ^2 hotspot. With a small band-occupancy cap the candidate set
    must shrink well below all-pairs, yet the surviving pairs must still
    connect the corpus into a single duplicate cluster (what dedup
    actually needs at 100 TB: cluster cover, not every pairwise edge)."""
    from build_a_cloud_based_batch_etl_pipeline_spark.operators import dedup

    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(i, "the same exact document body repeated many times over") for i in range(400)],
        "doc_id: long, text: string",
    )

    def run(sf_dir_ignored=None):
        sh = dedup.gram_hashes(docs)
        sig = dedup.minhash_signatures(sh)
        bands = sig.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bi).alias("band"),
                            F.xxhash64(
                                *[
                                    f"m{bi * dedup._MH_ROWS + r}"
                                    for r in range(dedup._MH_ROWS)
                                ]
                            ).alias("bh"),
                        )
                        for bi in range(dedup._MH_BANDS)
                    ]
                )
            ).alias("b"),
        ).select("doc_id", "b.band", "b.bh")
        from build_a_cloud_based_batch_etl_pipeline_spark.operators.util import (
            cap_bucket_occupancy,
        )

        capped = cap_bucket_occupancy(
            bands, ["band", "bh"], "doc_id", dedup._MH_BAND_CAP
        )
        return (
            capped.alias("x")
            .join(capped.alias("y"), ["band", "bh", "sub"])
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(
                F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
            )
            .distinct()
        )

    monkeypatch.setattr(dedup, "_MH_BAND_CAP", 25)
    pairs = run()
    n_pairs = pairs.count()
    all_pairs = 400 * 399 // 2
    assert 0 < n_pairs < 0.75 * all_pairs, f"cap did not prune: {n_pairs}"

    nodes = docs.select("doc_id", F.col("doc_id").alias("label"))
    labels = dedup.propagate_min_label(nodes, pairs, max_iters=6)
    n_clusters = labels.select("label").distinct().count()
    assert n_clusters == 1, f"cap fragmented the duplicate cluster: {n_clusters}"


def test_simhash_recall_is_exact_at_hamming_threshold(spark, sf_dir):
    """Pigeonhole guarantee, checked against a brute-force numpy ground
    truth: the fingerprint is banded into 4x16-bit chunks, and any pair
    with hamming <= 3 differs in at most 3 chunks, so at least one chunk
    matches and the pair MUST surface as a candidate. dedup_simhash must
    therefore return EXACTLY the all-pairs hamming<=3 set — 100% recall,
    not a sampled bound (and zero false positives, since candidates are
    re-scored with the exact bit_count)."""
    import numpy as np

    fps = dedup.simhash_fingerprints(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).collect()
    ids = np.array([r.doc_id for r in fps], dtype=np.int64)
    sh = np.array([r.simhash for r in fps], dtype=np.int64).astype(np.uint64)
    xor = sh[:, None] ^ sh[None, :]
    ham = np.zeros_like(xor, dtype=np.int64)
    for _ in range(64):  # popcount via shift-and-mask (no np.bit_count on u64)
        ham += (xor & np.uint64(1)).astype(np.int64)
        xor >>= np.uint64(1)
    iu = np.triu_indices(len(ids), k=1)
    truth = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i, j in zip(*iu)
        if ham[i, j] <= 3
    }
    assert truth, "fixture should contain hamming<=3 fingerprint pairs"
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_simhash(spark, sf_dir).collect()
    }
    assert got == truth, (
        f"missed {truth - got} / extra {got - truth} vs brute-force hamming"
    )


def test_propagate_min_label_escalates_long_chains_to_doubling(spark):
    """A path graph propagates the min label one hop per round — depth
    beyond max_iters must ESCALATE to pointer doubling and still return
    CORRECT components (silently-fragmented components were the r3
    failure mode; a dead job on a chain-heavy graph was the r7
    SCALE_SWEEP failure mode — escalation guards both), while an
    adequate cap converges the same chain without escalation."""
    n = 12  # path 0-1-2-...-11: diameter 11
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id: long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a: long, doc_b: long"
    )
    nodes = docs.select("doc_id", F.col("doc_id").alias("label"))
    # cap below the diameter: plain rounds cannot finish — the doubling
    # escalation must, with the partial labels as its seed
    labels = dedup.propagate_min_label(nodes, edges, max_iters=4)
    got = {r.doc_id: r.label for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    # adequate cap: converges in the plain loop alone
    labels = dedup.propagate_min_label(nodes, edges, max_iters=n + 1)
    got = {r.doc_id: r.label for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}


def test_cache_once_memoizes_per_key(spark):
    """Repeat invocations with the same key must return the SAME cached
    DataFrame handle (one cache entry, built once — bench runs each
    query 3x; ADVICE r3), while a different key builds fresh."""
    from build_a_cloud_based_batch_etl_pipeline_spark.operators.util import cache_once

    builds = {"n": 0}

    def build():
        builds["n"] += 1
        return spark.range(5).toDF("doc_id")

    a = cache_once(spark, ("cache_once_test", "k1"), build)
    b = cache_once(spark, ("cache_once_test", "k1"), build)
    c = cache_once(spark, ("cache_once_test", "k2"), build)
    assert a is b, "same key must reuse the memoized DataFrame"
    assert c is not a
    assert builds["n"] == 2, "builder must run once per distinct key"
    assert a.count() == 5 and c.count() == 5


def test_pointer_doubling_handles_large_diameter_in_log_rounds(spark):
    """The doubling variant must converge a diameter-60 path within
    O(log d) rounds (12 allowed here, vs 61 one-hop rounds) and still
    label disconnected components independently."""
    n = 60  # path 0-..-59 plus a separate triangle 100-101-102
    docs = [(i,) for i in range(n)] + [(100,), (101,), (102,)]
    es = [(i, i + 1) for i in range(n - 1)] + [(100, 101), (101, 102), (100, 102)]
    nodes = spark.createDataFrame(docs, "doc_id: long").select(
        "doc_id", F.col("doc_id").alias("label")
    )
    edges = spark.createDataFrame(es, "doc_a: long, doc_b: long")
    labels = dedup.propagate_min_label_doubling(nodes, edges, max_iters=12)
    got = {r.doc_id: r.label for r in labels.collect()}
    expect = {i: 0 for i in range(n)} | {100: 100, 101: 100, 102: 100}
    assert got == expect


def test_containment_catches_excerpt_that_jaccard_misses(spark):
    """A short excerpt embedded in a much longer document has near-1
    containment but tiny Jaccard — the asymmetric threshold must flag
    it and the symmetric one must not."""
    rng_words = [f"w{i}" for i in range(400)]
    big = " ".join(rng_words)
    excerpt = " ".join(rng_words[100:140])  # 40 contiguous words
    docs = spark.createDataFrame(
        [(1, excerpt), (2, big)], "doc_id: long, text: string"
    )

    from build_a_cloud_based_batch_etl_pipeline_spark.operators.dedup import shingles

    sh = shingles(docs)
    sz = {r.doc_id: r.n for r in sh.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    common = (
        sh.alias("a").join(sh.alias("b"), "s")
        .filter((F.col("a.doc_id") == 1) & (F.col("b.doc_id") == 2))
        .count()
    )
    containment = common / sz[1]
    jaccard = common / (sz[1] + sz[2] - common)
    assert containment >= 0.99, containment
    assert jaccard < 0.15, jaccard


def test_cache_once_evicts_dead_applications_and_clears(spark):
    """Entries keyed to a dead applicationId are dropped on the next
    insert (their plans are unusable), and cache_once_clear unpersists
    and forgets live entries (ADVICE r4)."""
    from build_a_cloud_based_batch_etl_pipeline_spark.operators import util

    util._CACHE_ONCE[("dead-app-id", "stale")] = spark.range(1)
    live = util.cache_once(
        spark, ("cache_once_evict_test",), lambda: spark.range(3)
    )
    assert ("dead-app-id", "stale") not in util._CACHE_ONCE
    assert live.count() == 3

    util.cache_once_clear(spark)
    app = spark.sparkContext.applicationId
    assert not any(k[0] == app for k in util._CACHE_ONCE)
    assert not live.storageLevel.useMemory, "clear must unpersist"


def test_repeated_spans_planted_fixture(spark, monkeypatch):
    """Planted-span contract for dedup_repeated_spans: a 20-token span
    shared verbatim by two docs (at DIFFERENT offsets) surfaces as
    exactly one island per doc with exact 1-based coordinates and
    span_tokens == 20; a shared run shorter than _SPAN_K tokens is
    invisible; a fully unique doc produces no rows."""
    from build_a_cloud_based_batch_etl_pipeline_spark.operators import (
        dedup as dedup_mod,
    )

    K = dedup_mod._SPAN_K
    span = " ".join(f"s{i}" for i in range(20))
    short = " ".join(f"t{i}" for i in range(K - 1))  # below threshold
    doc1 = " ".join(f"a{i}" for i in range(30)) + f" {span} " + " ".join(
        f"b{i}" for i in range(10)
    )
    doc2 = " ".join(f"c{i}" for i in range(40)) + f" {span} " + " ".join(
        f"d{i}" for i in range(5)
    )
    doc3 = " ".join(f"e{i}" for i in range(25)) + f" {short} " + " ".join(
        f"f{i}" for i in range(25)
    )
    doc4 = " ".join(f"g{i}" for i in range(25)) + f" {short} " + " ".join(
        f"h{i}" for i in range(25)
    )
    doc5 = " ".join(f"u{i}" for i in range(60))
    docs = _docs(
        spark,
        [(i + 1, d, "en", "t", len(d)) for i, d in
         enumerate([doc1, doc2, doc3, doc4, doc5])],
    )
    monkeypatch.setattr(dedup_mod, "t", lambda s_, d_, n_: docs)
    rows = dedup_mod.dedup_repeated_spans(spark, "ignored").collect()
    got = {(r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_grams)
           for r in rows}
    # doc1: span occupies tokens 31..50; doc2: tokens 41..60;
    # 20-token span => 20-K+1 repeated gram positions
    assert got == {
        (1, 31, 50, 20, 20 - K + 1),
        (2, 41, 60, 20, 20 - K + 1),
    }, got


def test_dedup_against_index_recall_and_estimates(spark, tmp_path):
    """Index-only dedup contract: a batch doc near-identical to an
    indexed doc is found with est_jaccard tracking the true Jaccard; an
    unrelated batch doc produces no hits; the estimate agrees with a
    direct signature comparison (the index stores exactly the
    signatures the one-shot path computes)."""
    from build_a_cloud_based_batch_etl_pipeline_spark.operators import (
        dedup as dedup_mod,
    )

    base = " ".join(f"w{i} v{i * 3 % 23}" for i in range(80))
    corpus = _docs(spark, [
        (1, base, "en", "t", len(base)),
        (2, " ".join(f"k{i}" for i in range(80)), "en", "t", 100),
    ])
    root = str(tmp_path / "idx")
    dedup_mod.build_minhash_index(spark, corpus, root)

    neardup = base.replace("w5 ", "X5 ")  # ~97% token overlap
    unrelated = " ".join(f"z{i} u{i * 7 % 19}" for i in range(80))
    batch = _docs(spark, [
        (10, neardup, "en", "t", len(neardup)),
        (11, unrelated, "en", "t", len(unrelated)),
    ])
    hits = dedup_mod.dedup_against_index(spark, batch, root).collect()
    assert {(r.new_doc, r.index_doc) for r in hits} == {(10, 1)}
    (hit,) = hits
    assert hit.est_jaccard >= 0.7  # true Jaccard ~0.93; 32-hash noise

    # estimate == direct agreement fraction of the stored vs batch sigs
    sig_new, _ = dedup_mod.minhash_index_rows(batch)
    stored = spark.read.parquet(f"{root}/sigs").drop("epoch")
    new_sig = {r.doc_id: r for r in sig_new.collect()}[10]
    old_sig = {r.doc_id: r for r in stored.collect()}[1]
    agree = sum(
        1 for i in range(dedup_mod._MH_K)
        if getattr(new_sig, f"m{i}") == getattr(old_sig, f"m{i}")
    )
    assert hit.est_jaccard == round(agree / dedup_mod._MH_K, 4)


def test_incremental_index_query_matches_one_shot_cross_split(spark, sf_dir):
    """The registry twin must equal running candidate+verify over the
    same split in one shot: every (new, corpus) hit's est_jaccard is a
    signature agreement, and hits are exactly the cross-split pairs the
    one-shot band join finds at the same threshold."""
    from build_a_cloud_based_batch_etl_pipeline_spark.operators import (
        dedup as dedup_mod,
    )
    from build_a_cloud_based_batch_etl_pipeline_spark.operators.sampling import (
        _TEST_LT,
        _split_bucket,
    )
    from build_a_cloud_based_batch_etl_pipeline_spark.queries import load_all

    REG = load_all()
    got = {(r.new_doc, r.index_doc, r.est_jaccard)
           for r in REG["dedup_incremental_index"].fn(spark, sf_dir).collect()}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    is_new = _split_bucket() < _TEST_LT
    sig_new, bands_new = dedup_mod.minhash_index_rows(docs.filter(is_new))
    sig_old, bands_old = dedup_mod.minhash_index_rows(docs.filter(~is_new))
    cand = (
        bands_new.alias("n").join(bands_old.alias("s"), ["band", "bh"])
        .select(F.col("n.doc_id").alias("new_doc"),
                F.col("s.doc_id").alias("index_doc"))
        .distinct()
    )
    agree = sum(
        [F.when(F.col(f"x.m{i}") == F.col(f"y.m{i}"), 1).otherwise(0)
         for i in range(dedup_mod._MH_K)],
        start=F.lit(0),
    )
    est = agree * 1.0 / dedup_mod._MH_K
    expected = {
        (r.new_doc, r.index_doc, r.est_jaccard)
        for r in (
            cand.join(sig_new.alias("x"), F.col("new_doc") == F.col("x.doc_id"))
            .join(sig_old.alias("y"), F.col("index_doc") == F.col("y.doc_id"))
            .filter(est >= 0.5)
            .select("new_doc", "index_doc", F.round(est, 4).alias("est_jaccard"))
            .collect()
        )
    }
    assert got == expected


def test_remove_spans_planted_fixture(spark, monkeypatch):
    """Removal applies the exact cut-list: planted-span docs lose
    exactly their shared 20 tokens (clean_text == original minus the
    span, order preserved), untouched docs pass through verbatim."""
    from build_a_cloud_based_batch_etl_pipeline_spark.operators import (
        dedup as dedup_mod,
    )

    span = " ".join(f"s{i}" for i in range(20))
    pre1 = " ".join(f"a{i}" for i in range(30))
    post1 = " ".join(f"b{i}" for i in range(10))
    doc1 = f"{pre1} {span} {post1}"
    pre2 = " ".join(f"c{i}" for i in range(40))
    post2 = " ".join(f"d{i}" for i in range(5))
    doc2 = f"{pre2} {span} {post2}"
    doc3 = " ".join(f"u{i}" for i in range(60))
    docs = _docs(
        spark,
        [(i + 1, d, "en", "t", len(d)) for i, d in enumerate([doc1, doc2, doc3])],
    )
    monkeypatch.setattr(dedup_mod, "t", lambda s_, d_, n_: docs)
    got = {r.doc_id: r for r in
           dedup_mod.dedup_remove_spans(spark, "ignored").collect()}
    assert got[1].n_tokens == 60 and got[1].n_removed == 20
    assert got[1].clean_text == f"{pre1} {post1}"
    assert got[2].n_tokens == 65 and got[2].n_removed == 20
    assert got[2].clean_text == f"{pre2} {post2}"
    assert got[3].n_removed == 0 and got[3].clean_text == doc3


def test_cluster_stats_partitions_corpus(spark, sf_dir):
    """The size histogram must exactly cover the corpus: sum(n_docs) ==
    |documents|, n_docs == cluster_size * n_clusters per row, and the
    singleton row dominates a mostly-unique fixture."""
    from build_a_cloud_based_batch_etl_pipeline_spark.queries import load_all

    rows = load_all()["dedup_cluster_stats"].fn(spark, sf_dir).collect()
    n_docs_total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs_total
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters
    by_size = {r.cluster_size: r.n_docs for r in rows}
    assert by_size.get(1, 0) > n_docs_total * 0.5


def test_hint_label_map_size_gate(spark, monkeypatch):
    """The label-map join pin must be deterministic AND size-safe: under
    the row gate the hint is a broadcast (BroadcastHashJoin in the
    plan); above it the hint degrades to shuffle_hash (ShuffledHashJoin
    — still deterministic, never an unbounded broadcast)."""
    from build_a_cloud_based_batch_etl_pipeline_spark.operators import util

    linked = spark.range(50).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("label")
    )
    docs = spark.range(500).select(F.col("id").alias("doc_id"))

    small_plan = docs.join(
        util.hint_label_map(linked), "doc_id", "left"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in small_plan

    monkeypatch.setattr(util, "_LABEL_MAP_BROADCAST_ROWS", 10)
    big_plan = docs.join(
        util.hint_label_map(linked), "doc_id", "left"
    )._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in big_plan
    assert "BroadcastHashJoin" not in big_plan


def test_pagerank_matches_python_integer_recurrence(spark, sf_dir):
    """Third engine for dedup_pagerank: an independent pure-Python
    implementation of the same fixed-point recurrence must match the
    Spark result EXACTLY (integer arithmetic has one right answer —
    no tolerance band), on the same persisted edge set."""
    from build_a_cloud_based_batch_etl_pipeline_spark.operators.dedup import (
        _PR_ITERS,
        _PR_Q,
        _edges_parquet,
        dedup_pagerank,
    )

    edges = [(r.doc_a, r.doc_b) for r in _edges_parquet(spark, sf_dir).collect()]
    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    rank = {d: _PR_Q for d in docs}
    for _ in range(_PR_ITERS):
        insum: dict[int, int] = {}
        for src, nbrs in adj.items():
            c = rank[src] // len(nbrs)
            for dst in nbrs:
                insum[dst] = insum.get(dst, 0) + c
        rank = {
            d: 15 * _PR_Q // 100 + 85 * insum.get(d, 0) // 100 for d in docs
        }
    got = {r.doc_id: (r.degree, r.rank_ppb) for r in dedup_pagerank(spark, sf_dir).collect()}
    assert set(got) == set(docs)
    for d in docs:
        assert got[d] == (len(adj.get(d, [])), rank[d]), f"doc {d}"
