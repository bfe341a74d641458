"""Invariant checks for the LLM-data-prep additions: chunking coverage,
int8 quantization bounds/reconstruction, hashing-vectorizer mass
conservation. The value-level parity with the SQL oracles is the
check.py/driver gate; these tests pin the semantic invariants on inputs
the fixture may not contain (short docs, uneven tails, zero-heavy
vectors)."""

from __future__ import annotations

import pyspark.sql.functions as F

from build_a_cloud_based_batch_etl_pipeline_spark.operators.text import (
    _CHUNK_SIZE,
    _CHUNK_STRIDE,
)
from build_a_cloud_based_batch_etl_pipeline_spark.queries import load_all

REGISTRY = load_all()


def test_chunks_cover_every_word_with_exact_overlap(spark, sf_dir):
    rows = REGISTRY["doc_chunk_overlap"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = {
        r.doc_id: r.n for r in docs.select(
            "doc_id", (F.size(F.split("text", " "))).alias("n")
        ).collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(words), "every document must be chunked"
    for doc_id, chunks in by_doc.items():
        n = words[doc_id]
        chunks.sort(key=lambda r: r.chunk_idx)
        # chunk count and indices
        expected = -(-n // _CHUNK_STRIDE)  # ceil
        assert [c.chunk_idx for c in chunks] == list(range(1, expected + 1))
        # widths: full except possibly truncated tails; coverage is exact
        # because starts step by stride and the last start is < n
        for c in chunks:
            start = (c.chunk_idx - 1) * _CHUNK_STRIDE + 1
            assert c.chunk_words == min(_CHUNK_SIZE, n - start + 1)
            assert c.doc_words == n
        last = chunks[-1]
        last_start = (last.chunk_idx - 1) * _CHUNK_STRIDE + 1
        assert last_start + last.chunk_words - 1 == n, "tail must reach the end"


def test_quantize_int8_bounds_and_reconstruction(spark, sf_dir):
    out = {r.vec_id: r for r in
           REGISTRY["embed_quantize_int8"].fn(spark, sf_dir).collect()}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    assert set(out) == {r.vec_id for r in emb}
    for r in emb:
        q = out[r.vec_id]
        vals = [float(x) for x in r.embedding]
        absmax = max(abs(v) for v in vals)
        assert q.n_dims == len(vals)
        assert q.q_absmax <= 127, "int8 range invariant"
        assert abs(q.scale * 127 - absmax) < 1e-9, "scale = max|x|/127"
        # reconstruction: round(x/scale)*scale within scale/2 per component
        # implies the summary q_sum*scale tracks sum(x) within n*scale/2
        assert abs(q.q_sum * q.scale - sum(vals)) <= q.n_dims * q.scale / 2 + 1e-9


def test_hashing_vectorizer_conserves_token_mass(spark, sf_dir):
    out = REGISTRY["text_hashing_vectorizer"].fn(spark, sf_dir)
    per_doc = {
        r.doc_id: r.total for r in
        out.groupBy("doc_id").agg(F.sum("tf").alias("total")).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    truth = {
        r.doc_id: r.n for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    assert per_doc == truth, "sum of bucket tfs must equal the token count"
    buckets = {r.bucket for r in out.select("bucket").distinct().collect()}
    assert all(len(b) == 3 for b in buckets)


def test_cdc_chunking_is_stable_under_suffix_edits(spark):
    """THE content-defined-chunking property: appending words to a
    document re-digests only the final chunk — every earlier chunk's
    (idx, digest) survives identically (a fixed-stride chunker shifts
    every downstream chunk instead). Also: chunk word counts must
    partition the document."""
    import build_a_cloud_based_batch_etl_pipeline_spark.operators.text as text_mod

    base = "the quick brown fox jumps over a lazy dog " * 8
    doc0 = base.strip()
    doc1 = (base + "and then some entirely new trailing words appear").strip()
    docs = spark.createDataFrame(
        [(1, doc0, "en", "s", len(doc0)), (2, doc1, "en", "s", len(doc1))],
        "doc_id: long, text: string, lang: string, source: string, n_chars: long",
    )

    import build_a_cloud_based_batch_etl_pipeline_spark.operators.util as util_mod

    orig_t = util_mod.t
    try:
        util_mod.t = lambda spark_, sf_dir_, name_: docs
        text_mod.t = util_mod.t
        out = {
            (r.doc_id, r.chunk_idx): (r.n_words, r.chunk_digest)
            for r in text_mod.doc_chunk_cdc(spark, "ignored").collect()
        }
    finally:
        util_mod.t = orig_t
        text_mod.t = orig_t

    c0 = {k[1]: v for k, v in out.items() if k[0] == 1}
    c1 = {k[1]: v for k, v in out.items() if k[0] == 2}
    assert sum(n for n, _ in c0.values()) == len(doc0.split(" "))
    assert sum(n for n, _ in c1.values()) == len(doc1.split(" "))
    # every chunk of doc0 except its last reappears bit-identically in doc1
    last0 = max(c0)
    for idx, (n, digest) in c0.items():
        if idx < last0:
            assert c1[idx] == (n, digest), f"chunk {idx} not edit-stable"


def test_compression_ratio_separates_repetitive_from_diverse(spark):
    """The zlib signal must rank repetitive text as far more compressible
    than diverse text, and be deterministic run-to-run."""
    import build_a_cloud_based_batch_etl_pipeline_spark.operators.text as text_mod
    import build_a_cloud_based_batch_etl_pipeline_spark.operators.util as util_mod

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam " * 100, "en", "s", 2000),
            (2, " ".join(f"w{i}x{i * 7 % 97}" for i in range(400)), "en", "s", 2000),
        ],
        "doc_id: long, text: string, lang: string, source: string, n_chars: long",
    )
    orig_t = util_mod.t
    try:
        text_mod.t = lambda s_, d_, n_: docs
        out1 = {r.doc_id: r.compression_ratio
                for r in text_mod.text_compression_ratio(spark, "x").collect()}
        out2 = {r.doc_id: r.compression_ratio
                for r in text_mod.text_compression_ratio(spark, "x").collect()}
    finally:
        text_mod.t = orig_t
    assert out1 == out2
    assert out1[1] < 0.1 < out1[2], out1


def test_balanced_classes_equalizes_and_is_stable(spark, sf_dir):
    """Every language keeps exactly min-class-size docs, and the draw is
    reproducible (hash-ranked, no RNG)."""
    from build_a_cloud_based_batch_etl_pipeline_spark.queries import load_all

    REG = load_all()
    out1 = REG["sample_balanced_classes"].fn(spark, sf_dir).collect()
    from collections import Counter

    by_lang = Counter(r.lang for r in out1)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    true_sizes = Counter(r.lang for r in docs.select("lang").collect())
    floor = min(true_sizes.values())
    assert set(by_lang) == set(true_sizes)
    assert all(n == floor for n in by_lang.values()), by_lang
    out2 = REG["sample_balanced_classes"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))


def test_zipf_slope_degenerate_single_term_corpus(spark, tmp_path):
    """A single-term vocabulary makes the least-squares denominator 0;
    both engines must agree on NULL for slope/intercept (ADVICE r5:
    Spark NULLs double div-by-zero while DuckDB IEEE can emit inf/nan
    — guarded by when() in Spark and NULLIF in the oracle)."""
    import duckdb

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "spam spam spam", "en", "t", 14), (2, "spam", "en", "t", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    row = REGISTRY["text_zipf_slope"].fn(spark, sf).collect()[0]
    assert row.n_terms_fit == 1
    assert row.zipf_slope is None and row.zipf_intercept is None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    orc = con.execute(REGISTRY["text_zipf_slope"].oracle).fetchone()
    assert orc[0] == 1 and orc[1] is None and orc[2] is None


def test_filter_funnel_telescopes_and_matches_flags(spark, sf_dir):
    """The attrition report must telescope (each stage's n_out is the
    next stage's n_in; n_in - n_dropped == n_out), start from the full
    document count, and end at exactly the conjunction of the three
    per-doc pass flags computed independently."""
    rows = sorted(
        REGISTRY["text_filter_funnel"].fn(spark, sf_dir).collect(),
        key=lambda r: r.rule_order,
    )
    assert [r.rule for r in rows] == ["gopher", "repetition", "unigram_lm"]
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert rows[0].n_in == n_docs
    for r in rows:
        assert r.n_in - r.n_dropped == r.n_out
        if r.n_in:
            assert r.drop_pct == round(r.n_dropped / r.n_in, 4)
    for prev, nxt in zip(rows, rows[1:]):
        assert prev.n_out == nxt.n_in

    g = {r.doc_id: r.passes_gopher
         for r in REGISTRY["text_gopher_quality"].fn(spark, sf_dir).collect()}
    rp = {r.doc_id: r.passes_repetition
          for r in REGISTRY["text_repetition"].fn(spark, sf_dir).collect()}
    lm = {r.doc_id: r.passes_lm
          for r in REGISTRY["text_unigram_logprob"].fn(spark, sf_dir).collect()}
    survivors = sum(1 for d in g if g[d] and rp[d] and lm[d])
    assert rows[-1].n_out == survivors


def test_bpe_pair_stats_matches_bruteforce(spark, tmp_path):
    """Planted corpus: the pair table must equal a Python brute-force BPE
    first-iteration count (each word's adjacent pairs weighted by corpus
    frequency), in (count desc, pair) rank order; 1-char words and empty
    tokens contribute nothing."""
    from collections import Counter

    import pandas as pd

    from build_a_cloud_based_batch_etl_pipeline_spark.operators.text import (
        text_bpe_pair_stats,
    )

    texts = [
        "the cat sat on the mat",
        "the theme of the thesis",
        "a b c abba abba",
        "x  doubled  spaces here",
    ]
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
        }
    ).to_parquet(f"{tmp_path}/documents.parquet")

    words = Counter(w for t in texts for w in t.split(" ") if w)
    expect = Counter()
    for w, c in words.items():
        for i in range(len(w) - 1):
            expect[w[i : i + 2]] += c
    ranked = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    got = text_bpe_pair_stats(spark, str(tmp_path)).collect()
    assert [(r.rk, r.pair, r.pair_count) for r in sorted(got, key=lambda r: r.rk)] == [
        (i + 1, p, c) for i, (p, c) in enumerate(ranked)
    ]


def test_lexical_diversity_matches_python(spark, sf_dir):
    """TTR/Guiraud recomputed in plain python per doc (third engine)."""
    import math
    from collections import defaultdict

    import pyarrow.parquet as pq

    from build_a_cloud_based_batch_etl_pipeline_spark.operators.text import (
        text_lexical_diversity,
    )

    rows = {r.source: r for r in text_lexical_diversity(spark, sf_dir).collect()}
    tb = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    acc = defaultdict(lambda: [0, 0, 0.0, 0.0])  # docs, toks, ttr_sum, gui_sum
    for src, txt in zip(
        tb.column("source").to_pylist(), tb.column("text").to_pylist()
    ):
        ws = txt.split(" ")
        toks, types = len(ws), len(set(ws))
        a = acc[src]
        a[0] += 1
        a[1] += toks
        a[2] += types / toks
        a[3] += types / math.sqrt(toks)
    assert set(rows) == set(acc)
    for src, (nd, toks, ts, gs) in acc.items():
        r = rows[src]
        assert r.n_docs == nd and r.tokens == toks
        assert abs(r.mean_ttr - ts / nd) < 5e-4
        assert abs(r.mean_guiraud - gs / nd) < 5e-4
        assert 0.0 < r.mean_ttr <= 1.0


def test_textrank_matches_python_integer_recurrence(spark, sf_dir):
    """Third engine for text_textrank_keywords: independent pure-Python
    weighted fixed-point recurrence over the same persisted graph must
    match EXACTLY (integer arithmetic, no tolerance). Also sanity: the
    highest-ranked word has non-trivial weighted degree."""
    from build_a_cloud_based_batch_etl_pipeline_spark.operators.text import (
        _TR_ITERS,
        _TR_Q,
        _textrank_graph,
        text_textrank_keywords,
    )

    outw_df, nodes_df = _textrank_graph(spark, sf_dir)
    outw = [
        (r.src, r.dst, r.wt, r.wdeg) for r in outw_df.collect()
    ]
    words = [r.word for r in nodes_df.collect()]
    rank = {w: _TR_Q for w in words}
    for _ in range(_TR_ITERS):
        insum: dict[str, int] = {}
        for src, dst, wt, wdeg in outw:
            insum[dst] = insum.get(dst, 0) + (rank[src] * wt) // wdeg
        rank = {
            w: 15 * _TR_Q // 100 + 85 * insum.get(w, 0) // 100 for w in words
        }
    wdeg_of = {src: wdeg for src, _dst, _wt, wdeg in outw}
    got = {
        r.word: (r.wdeg, r.rank_ppb)
        for r in text_textrank_keywords(spark, sf_dir).collect()
    }
    assert set(got) == set(words)
    for w in words:
        assert got[w] == (wdeg_of.get(w, 0), rank[w]), f"word {w}"
    top = max(got, key=lambda w: got[w][1])
    assert got[top][0] > 0


def test_bpe_canonical_merge_three_engines(spark, tmp_path):
    """BPE training + encode vs a pure-Python canonical reference (third
    engine) AND the DuckDB oracle, on a planted corpus heavy in
    BACK-TO-BACK pair occurrences ('aaaa', 'abab', 'banana') — the case
    where a consumed-separator replace() deviates from canonical greedy
    left-to-right merging ([a,a,a,a] must become [aa,aa], not [aa,a,a]).
    Also pins: non-letter words are excluded everywhere, and docs with
    zero letter-words drop from the encode output."""
    import duckdb
    import pandas as pd
    from collections import Counter

    from build_a_cloud_based_batch_etl_pipeline_spark.operators.text import (
        _BPE_ENCODE_ORACLE,
        _BPE_K,
        bpe_doc_tokens,
        bpe_merges,
    )

    texts = [
        "aaaa abab abab banana banana banana the cat",
        "aaaa aaaa baab abab banana mississippi",
        "123 ?!",  # zero letter-words: must drop from encode output
        "the the the cat aa a b ab",
    ]
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["src0", "src0", "src1", "src1"],
        }
    ).to_parquet(f"{tmp_path}/documents.parquet")

    # --- canonical python reference (list-splice, no regex/replace) ---
    def merge_word(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    words = Counter(
        w for t_ in texts for w in t_.split(" ") if w and w.isalpha() and w.islower()
    )
    state = {w: list(w) for w in words}
    ref_merges = []
    for _ in range(_BPE_K):
        pc = Counter()
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += words[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        ref_merges.append((a, b, cnt))
        state = {w: merge_word(s, a, b) for w, s in state.items()}

    got = bpe_merges(spark, str(tmp_path))
    assert got == ref_merges, (got, ref_merges)

    # the incremental-pair-maintenance trainer (the k~30000 production
    # shape, VERDICT r12 item 5) must be LIST-IDENTICAL: same merges,
    # same counts, same order — delta-maintained counts are exact longs,
    # so any divergence is a maintenance bug, not noise. The planted
    # corpus's back-to-back pairs also stress the delta extraction.
    from build_a_cloud_based_batch_etl_pipeline_spark.operators.text import (
        bpe_merges_delta,
    )

    got_delta = bpe_merges_delta(spark, str(tmp_path))
    assert got_delta == ref_merges, (got_delta, ref_merges)

    ref_doc = {}
    for d, t_ in enumerate(texts):
        ws = [w for w in t_.split(" ") if w and w.isalpha() and w.islower()]
        if ws:
            ref_doc[d] = (len(ws), sum(len(state[w]) for w in ws))
    enc = {
        r.doc_id: (r.n_words, r.bpe_tokens)
        for r in bpe_doc_tokens(spark, str(tmp_path)).collect()
    }
    assert enc == ref_doc, (enc, ref_doc)
    assert 2 not in enc  # the no-letter-words doc dropped

    # --- the DuckDB oracle on the SAME planted corpus (its recursive
    # leftmost-splice must be canonical too, not just on the fixture) ---
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    oracle = {
        int(r[0]): (int(r[1]), int(r[2]))
        for r in con.execute(_BPE_ENCODE_ORACLE).fetchall()
    }
    assert oracle == ref_doc, (oracle, ref_doc)


def test_bpe_delta_lineage_bounded_at_production_k(spark, sf_dir):
    """VERDICT r13 item 2: at k=128 the delta trainer's symbol table
    must hold a BOUNDED plan depth and partition count — each round
    rebuilds `cur` as filter+union, which would otherwise compound to
    an O(k)-deep plan carrying k extra partitions, the driver-side
    planning blowup that makes the k~30000 production shape infeasible.
    The checkpoint cadence (_BPE_CUR_CKPT=32) truncates both: the
    fixture corpus exhausts around round ~89, so the cadence fires at
    least twice (rounds 32 and 64), and the bounds below hold at ANY k.
    Prefix-stability is the correctness pin: greedy BPE's first 16
    merges are independent of k, so the long run must start with the
    k=16 list already certified hash-identical to the retraining
    DuckDB oracle (text_bpe_merge_table_delta) and list-identical to
    bpe_merges."""
    from build_a_cloud_based_batch_etl_pipeline_spark.operators.text import (
        _BPE_CUR_CKPT,
        _BPE_K,
        bpe_merges_delta,
    )

    short = bpe_merges_delta(spark, sf_dir, k=_BPE_K)
    diag: dict = {}
    long_run = bpe_merges_delta(spark, sf_dir, k=128, diag=diag)
    assert long_run[:_BPE_K] == short
    assert diag["rounds"] >= 2 * _BPE_CUR_CKPT, diag
    # partitions: original count + at most one per round since the last
    # checkpoint (+1 for the union ordering); plan depth: bounded by
    # the cadence, never by k
    assert (
        diag["cur_partitions"] <= diag["base_partitions"] + _BPE_CUR_CKPT + 1
    ), diag
    assert diag["cur_plan_lines"] <= 5 * _BPE_CUR_CKPT, diag
    # the pair table holds the same bounds: its fold chain (one
    # broadcast join + one tiny union per round) truncates on the same
    # cadence
    assert (
        diag["counts_partitions"]
        <= diag["base_partitions"] + _BPE_CUR_CKPT + 1
    ), diag
    assert diag["counts_plan_lines"] <= 8 * _BPE_CUR_CKPT, diag


def test_train_bpe_dispatches_by_measured_crossover(spark, sf_dir, monkeypatch):
    """train_bpe encodes the measured trainer crossover (VERDICT r14
    item 7): below _BPE_DELTA_CROSSOVER_K merges it runs the naive
    full-recount trainer, at or above it the incremental delta trainer
    — so a k~30000 production caller cannot pick the quadratic shape
    and a k=16 fixture query skips delta's constant factor. The two
    trainers' output equality is pinned separately
    (test_bpe_canonical_merge_three_engines); this pins the routing
    and that the dispatch returns the real trained table."""
    from build_a_cloud_based_batch_etl_pipeline_spark.operators import text

    picked = []
    real_naive, real_delta = text.bpe_merges, text.bpe_merges_delta
    monkeypatch.setattr(
        text,
        "bpe_merges",
        lambda s, d, k=text._BPE_K: (picked.append("naive"), real_naive(s, d, k))[1],
    )
    monkeypatch.setattr(
        text,
        "bpe_merges_delta",
        lambda s, d, k=text._BPE_K: (picked.append("delta"), real_delta(s, d, k))[1],
    )
    out_small = text.train_bpe(spark, sf_dir, k=text._BPE_K)
    assert picked == ["naive"]
    assert out_small == real_naive(spark, sf_dir, text._BPE_K)
    assert text.train_bpe(
        spark, sf_dir, k=text._BPE_DELTA_CROSSOVER_K - 1
    ) is not None
    assert picked == ["naive", "naive"]
    # at the crossover the delta trainer takes over (run the smallest
    # at-or-above-crossover k the fixture supports by intercepting the
    # call — the real k=256 train is the scale sweep's job, not a unit
    # test's)
    monkeypatch.setattr(
        text, "bpe_merges_delta", lambda s, d, k: (picked.append("delta"), [])[1]
    )
    assert text.train_bpe(spark, sf_dir, k=text._BPE_DELTA_CROSSOVER_K) == []
    assert picked == ["naive", "naive", "delta"]
