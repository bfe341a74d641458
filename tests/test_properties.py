"""Property-based checks (hypothesis): the distributed compositions must
agree with brute-force Python references on arbitrary small inputs —
catching semantic edge cases (ties, empty groups, all-late rows) that
fixture data may never produce.

One shared SparkSession round-trip per example keeps runtime bounded;
examples are capped and deadlines disabled (Spark latency >> hypothesis
defaults).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from build_a_cloud_based_batch_etl_pipeline_spark.operators.joins import asof_join

BASE = datetime(2024, 1, 1)

# (key, minute-offset) event streams; small key space forces collisions,
# small time space forces ties.
events_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 30)), min_size=0, max_size=12
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sources=events_strategy, targets=events_strategy)
def test_asof_join_matches_bruteforce(spark, sources, targets):
    src_rows = [
        (k, BASE + timedelta(minutes=m), float(i))
        for i, (k, m) in enumerate(sources)
    ]
    tgt_rows = [
        (k, BASE + timedelta(minutes=m), i) for i, (k, m) in enumerate(targets)
    ]
    src_df = spark.createDataFrame(
        src_rows, "key: long, ts: timestamp, src_val: double"
    ) if src_rows else spark.createDataFrame([], "key: long, ts: timestamp, src_val: double")
    tgt_df = spark.createDataFrame(
        tgt_rows, "key: long, ts: timestamp, tgt_id: long"
    ) if tgt_rows else spark.createDataFrame([], "key: long, ts: timestamp, tgt_id: long")

    out = asof_join(
        tgt_df, src_df, key="key", time_col="ts",
        value_col="src_val", out_col="asof_val", strict=True,
    ).collect()

    # brute force: latest strictly-earlier source per key. When several
    # sources TIE on the winning ts, the window's intra-ts order is not
    # contractual — any tied value is a correct answer.
    def expected(k, ts):
        cands = [(s_ts, v) for (sk, s_ts, v) in src_rows if sk == k and s_ts < ts]
        if not cands:
            return {None}
        best_ts = max(c[0] for c in cands)
        return {v for (s_ts, v) in cands if s_ts == best_ts}

    assert len(out) == len(tgt_rows)
    got = {r.tgt_id: r.asof_val for r in out}
    for k, ts, tid in tgt_rows:
        assert got[tid] in expected(k, ts), (k, ts, tid, got[tid], expected(k, ts))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sources=events_strategy, targets=events_strategy)
def test_asof_join_nonstrict_includes_equal_ts(spark, sources, targets):
    src_rows = [
        (k, BASE + timedelta(minutes=m), float(i))
        for i, (k, m) in enumerate(sources)
    ]
    tgt_rows = [
        (k, BASE + timedelta(minutes=m), i) for i, (k, m) in enumerate(targets)
    ]
    src_df = spark.createDataFrame(
        src_rows, "key: long, ts: timestamp, src_val: double"
    ) if src_rows else spark.createDataFrame([], "key: long, ts: timestamp, src_val: double")
    tgt_df = spark.createDataFrame(
        tgt_rows, "key: long, ts: timestamp, tgt_id: long"
    ) if tgt_rows else spark.createDataFrame([], "key: long, ts: timestamp, tgt_id: long")

    out = asof_join(
        tgt_df, src_df, key="key", time_col="ts",
        value_col="src_val", out_col="asof_val", strict=False,
    ).collect()

    def expected(k, ts):
        cands = [(s_ts, v) for (sk, s_ts, v) in src_rows if sk == k and s_ts <= ts]
        if not cands:
            return {None}
        best_ts = max(c[0] for c in cands)
        return {v for (s_ts, v) in cands if s_ts == best_ts}

    got = {r.tgt_id: r.asof_val for r in out}
    for k, ts, tid in tgt_rows:
        assert got[tid] in expected(k, ts), (k, ts, tid)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sources=events_strategy, targets=events_strategy)
def test_asof_join_forward_and_tolerance_match_bruteforce(spark, sources, targets):
    """Forward direction picks the earliest strictly-later source; a
    tolerance nulls any match farther than the bound — both checked
    against brute force on adversarial tied/colliding streams."""
    from datetime import timedelta

    src_rows = [
        (k, BASE + timedelta(minutes=m), float(i))
        for i, (k, m) in enumerate(sources)
    ]
    tgt_rows = [
        (k, BASE + timedelta(minutes=m), i) for i, (k, m) in enumerate(targets)
    ]
    schema_s = "key: long, ts: timestamp, src_val: double"
    schema_t = "key: long, ts: timestamp, tgt_id: long"
    src_df = spark.createDataFrame(src_rows, schema_s) if src_rows else spark.createDataFrame([], schema_s)
    tgt_df = spark.createDataFrame(tgt_rows, schema_t) if tgt_rows else spark.createDataFrame([], schema_t)

    fwd = {
        r.tgt_id: r.asof_val
        for r in asof_join(
            tgt_df, src_df, key="key", time_col="ts", value_col="src_val",
            out_col="asof_val", strict=True, direction="forward",
        ).collect()
    }
    tol = {
        r.tgt_id: r.asof_val
        for r in asof_join(
            tgt_df, src_df, key="key", time_col="ts", value_col="src_val",
            out_col="asof_val", strict=True, tolerance_seconds=600,
        ).collect()
    }
    assert len(fwd) == len(tgt_rows) and len(tol) == len(tgt_rows)

    for k, ts, tid in tgt_rows:
        later = [(s_ts, v) for (sk, s_ts, v) in src_rows if sk == k and s_ts > ts]
        if not later:
            assert fwd[tid] is None
        else:
            best = min(c[0] for c in later)
            assert fwd[tid] in {v for (s_ts, v) in later if s_ts == best}

        earlier = [(s_ts, v) for (sk, s_ts, v) in src_rows if sk == k and s_ts < ts]
        if not earlier:
            assert tol[tid] is None
        else:
            best = max(c[0] for c in earlier)
            if (ts - best).total_seconds() <= 600:
                assert tol[tid] in {v for (s_ts, v) in earlier if s_ts == best}
            else:
                assert tol[tid] is None


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sources=events_strategy, targets=events_strategy)
def test_asof_nearest_composition_matches_bruteforce(spark, sources, targets):
    """The nearest-direction composition (backward non-strict +
    forward non-strict + smaller-gap CASE, as join_asof_nearest builds
    it) must pick the source ts with minimum |gap|, ties going backward
    — verified against brute force on tied/colliding streams."""
    from pyspark.sql import functions as F

    src_rows = [
        (k, BASE + timedelta(minutes=m)) for (k, m) in set(sources)
    ]
    tgt_rows = [
        (k, BASE + timedelta(minutes=m), i) for i, (k, m) in enumerate(targets)
    ]
    schema_s = "key: long, ts: timestamp"
    schema_t = "key: long, ts: timestamp, tgt_id: long"
    src_df = (
        spark.createDataFrame(src_rows, schema_s)
        if src_rows
        else spark.createDataFrame([], schema_s)
    ).withColumn("src_ts", F.col("ts"))
    tgt_df = spark.createDataFrame(tgt_rows, schema_t) if tgt_rows else spark.createDataFrame([], schema_t)

    prev = asof_join(
        tgt_df, src_df, key="key", time_col="ts", value_col="src_ts",
        out_col="prev_ts", strict=False, direction="backward",
    )
    both = asof_join(
        prev, src_df, key="key", time_col="ts", value_col="src_ts",
        out_col="next_ts", strict=False, direction="forward",
    )
    d_prev = F.col("ts").cast("double") - F.col("prev_ts").cast("double")
    d_next = F.col("next_ts").cast("double") - F.col("ts").cast("double")
    nearest = (
        F.when(F.col("prev_ts").isNull(), F.col("next_ts"))
        .when(F.col("next_ts").isNull(), F.col("prev_ts"))
        .when(d_prev <= d_next, F.col("prev_ts"))
        .otherwise(F.col("next_ts"))
    )
    got = {
        r.tgt_id: r.nearest
        for r in both.select("tgt_id", nearest.alias("nearest")).collect()
    }

    assert len(got) == len(tgt_rows)
    for k, ts, tid in tgt_rows:
        cands = [s_ts for (sk, s_ts) in src_rows if sk == k]
        if not cands:
            assert got[tid] is None
            continue
        best = min(abs((s_ts - ts).total_seconds()) for s_ts in cands)
        tied = [s_ts for s_ts in cands if abs((s_ts - ts).total_seconds()) == best]
        assert got[tid] == min(tied), (k, ts, got[tid], tied)


# ---------------------------------------------------------------------------
# Repeated-span detection vs a brute-force Python reference: small random
# corpora over a tiny alphabet force heavy gram collisions, short docs
# hit the under-k edge, and shared runs arise naturally.
# ---------------------------------------------------------------------------

docs_strategy = st.lists(
    st.lists(st.integers(0, 5), min_size=0, max_size=26),
    min_size=2,
    max_size=5,
)


def _brute_spans(texts, k):
    """Reference implementation: repeated grams by set arithmetic, islands
    by linear scan."""
    grams = {}
    for d, words in enumerate(texts):
        for i in range(len(words) - k + 1):
            grams.setdefault(tuple(words[i : i + k]), set()).add(d)
    rep = {g for g, ds in grams.items() if len(ds) >= 2}
    out = set()
    for d, words in enumerate(texts):
        hit = [
            i + 1  # 1-based
            for i in range(len(words) - k + 1)
            if tuple(words[i : i + k]) in rep
        ]
        run = []
        for p in hit + [None]:
            if run and (p is None or p != run[-1] + 1):
                out.add((d + 1, run[0], run[-1] + k - 1,
                         run[-1] - run[0] + k, len(run)))
                run = []
            if p is not None:
                run.append(p)
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy)
def test_repeated_spans_matches_bruteforce(spark, docs):
    from build_a_cloud_based_batch_etl_pipeline_spark.operators import (
        dedup as dedup_mod,
    )
    from build_a_cloud_based_batch_etl_pipeline_spark.schemas import DOCUMENTS

    k = dedup_mod._SPAN_K
    texts = [[f"w{x}" for x in words] for words in docs]
    sdf = spark.createDataFrame(
        [
            (d + 1, " ".join(words), "en", "t", len(" ".join(words)))
            for d, words in enumerate(texts)
        ],
        schema=DOCUMENTS,
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_grams)
        for r in dedup_mod.repeated_spans_frame(sdf).collect()
    }
    assert got == _brute_spans(texts, k)


# snapshots: lists of (key, value-or-None); duplicate keys collapse to
# the last occurrence (dict semantics), None values exercise the
# null-safe compare.
snap_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.one_of(st.none(), st.integers(0, 3))),
    min_size=0,
    max_size=12,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old=snap_strategy, new=snap_strategy)
def test_diff_snapshots_matches_bruteforce(spark, old, new):
    """diff_snapshots classification == dict-based brute force on random
    snapshots, including NULL->value / value->NULL edits and unchanged
    (incl. NULL==NULL) rows, which must be ABSENT from the delta."""
    from build_a_cloud_based_batch_etl_pipeline_spark.operators.dq import (
        diff_snapshots,
    )

    old_d, new_d = dict(old), dict(new)
    odf = spark.createDataFrame(
        [(k, v) for k, v in old_d.items()], "k long, v long"
    )
    ndf = spark.createDataFrame(
        [(k, v) for k, v in new_d.items()], "k long, v long"
    )
    got = {
        r.k: (r.change_type, r.old_v, r.new_v)
        for r in diff_snapshots(odf, ndf, "k", ["v"]).collect()
    }
    want = {}
    for k in old_d.keys() | new_d.keys():
        if k not in old_d:
            want[k] = ("added", None, new_d[k])
        elif k not in new_d:
            want[k] = ("removed", old_d[k], None)
        elif old_d[k] != new_d[k]:
            want[k] = ("changed", old_d[k], new_d[k])
    assert got == want


# intervals: (id-ordinal, start-day, length-days) per side; small domain
# forces overlaps, bucket-straddling, and same-part collisions.
iv_strategy = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 80), st.integers(0, 20)),
    min_size=0,
    max_size=10,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lft=iv_strategy, rgt=iv_strategy)
def test_interval_overlap_bucketing_matches_bruteforce(spark, lft, rgt):
    """The bucketize-explode-equijoin-residual plan of
    join_interval_overlap must find EXACTLY the brute-force overlap
    pairs, for every bucket-straddling configuration — including
    intervals longer than a bucket (fan-out > 2), zero-length
    intervals, and boundary touches (closed-interval semantics)."""
    from pyspark.sql import functions as F

    def rows(side, tag):
        return [
            (tag * 1000 + i, k, s, s + ln)
            for i, (k, s, ln) in enumerate(side)
        ]

    lrows, rrows = rows(lft, 1), rows(rgt, 2)
    schema = "iv_id long, part long, s long, e long"
    ldf = spark.createDataFrame(lrows, schema)
    rdf = spark.createDataFrame(rrows, schema)

    bucket_days = 7  # < max interval length: forces fan-out > 2

    def side(df, prefix):
        return df.withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("s") / bucket_days),
                    F.floor(F.col("e") / bucket_days),
                )
            ),
        ).select(
            F.col("iv_id").alias(f"{prefix}_id"),
            F.col("part").alias(f"{prefix}_part"),
            F.col("s").alias(f"{prefix}_s"),
            F.col("e").alias(f"{prefix}_e"),
            "bucket",
        )

    l, r = side(ldf, "l"), side(rdf, "r")
    got = {
        (row.l_id, row.r_id)
        for row in l.join(
            r,
            (F.col("l_part") == F.col("r_part"))
            & (l.bucket == r.bucket)
            & (F.col("l_s") <= F.col("r_e"))
            & (F.col("r_s") <= F.col("l_e")),
        )
        .dropDuplicates(["l_id", "r_id"])
        .collect()
    }
    want = {
        (li, ri)
        for (li, lk, ls, le) in lrows
        for (ri, rk, rs, re) in rrows
        if lk == rk and ls <= re and rs <= le
    }
    assert got == want


# --- r8 additions: degenerate-input properties for the new operators ---


def _seasonal_from_rows(spark, rows):
    """Run events_seasonal_strength's arithmetic on an in-memory events
    frame by writing it as the expected parquet layout."""
    raise NotImplementedError  # placeholder; replaced below if used


def test_ewma_constant_series_is_flat(spark, tmp_path):
    """EWMA of a constant series equals the constant at every point —
    the weighted-mean form cannot over/undershoot (a classic sign of a
    broken normalizer); also ewma stays within [min, max] of history on
    a two-level series."""
    import pandas as pd

    from build_a_cloud_based_batch_etl_pipeline_spark.operators.events import (
        events_ewma,
    )

    rows = []
    eid = 0
    for d in range(10):
        for h in (1, 13):
            rows.append(
                {
                    "event_id": eid,
                    "ts": pd.Timestamp(2024, 1, 1 + d, h),
                    "user_id": 1,
                    "event_type": "flat",
                    "value": 5.00,
                    "props": "{}",
                }
            )
            eid += 1
    for d in range(10):
        rows.append(
            {
                "event_id": eid,
                "ts": pd.Timestamp(2024, 1, 1 + d, 2),
                "user_id": 1,
                "event_type": "step",
                # 1.00 for 5 days then 9.00: ewma must stay in [1, 9]
                "value": 1.00 if d < 5 else 9.00,
                "props": "{}",
            }
        )
        eid += 1
    sf = str(tmp_path / "ewma_fixture")
    import os

    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(pd.DataFrame(rows)).write.mode("overwrite").parquet(
        f"{sf}/events.parquet"
    )
    got = events_ewma(spark, sf).collect()
    flat = [r for r in got if r.event_type == "flat"]
    assert len(flat) == 10
    assert all(abs(r.ewma - 5.0) < 1e-9 for r in flat)
    step = sorted((r for r in got if r.event_type == "step"), key=lambda r: r.day)
    assert all(1.0 - 1e-9 <= r.ewma <= 9.0 + 1e-9 for r in step)
    # monotone approach to the new level after the shift
    tail = [r.ewma for r in step[5:]]
    assert tail == sorted(tail)
    assert tail[-1] > 7.0  # alpha=0.3 converges fast


def test_gini_uniform_and_extreme(spark, tmp_path):
    """Gini = 0 on an equal-value group; -> high on a one-whale group;
    output invariant to row order (rank-tie invariance made visible)."""
    import pandas as pd

    from build_a_cloud_based_batch_etl_pipeline_spark.operators.aggregates import (
        agg_gini_concentration,
    )

    rows = []
    k = 0
    for _ in range(40):
        rows.append(
            {
                "o_orderkey": k,
                "o_custkey": 1,
                "o_orderstatus": "F",
                "o_totalprice": 100.00,
                "o_orderdate": pd.Timestamp(2024, 1, 1).date(),
                "o_orderpriority": "EQUAL",
            }
        )
        k += 1
    for i in range(40):
        rows.append(
            {
                "o_orderkey": k,
                "o_custkey": 1,
                "o_orderstatus": "F",
                "o_totalprice": 1000000.00 if i == 0 else 0.01,
                "o_orderdate": pd.Timestamp(2024, 1, 1).date(),
                "o_orderpriority": "WHALE",
            }
        )
        k += 1
    sf = str(tmp_path / "gini_fixture")
    import os

    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(pd.DataFrame(rows)).write.mode("overwrite").parquet(
        f"{sf}/orders.parquet"
    )
    got = {r.grp: r for r in agg_gini_concentration(spark, sf).collect()}
    assert got["EQUAL"].gini == 0.0
    assert got["WHALE"].gini > 0.9


def test_js_divergence_identical_and_disjoint_sources(spark, tmp_path):
    """JSD = 0 for identical distributions; = ln 2 for disjoint
    vocabularies (the shared-terms telescoping's two boundary cases —
    disjoint sources never meet in the inner join, so the tails must
    carry the whole value)."""
    import math

    import pandas as pd

    from build_a_cloud_based_batch_etl_pipeline_spark.operators.text import (
        text_js_divergence,
    )

    rows = [
        {"doc_id": 0, "text": "a b c a", "lang": "en", "source": "s1", "n_chars": 7},
        {"doc_id": 1, "text": "a b c a", "lang": "en", "source": "s2", "n_chars": 7},
        {"doc_id": 2, "text": "x y z", "lang": "en", "source": "s3", "n_chars": 5},
    ]
    sf = str(tmp_path / "jsd_fixture")
    import os

    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(pd.DataFrame(rows)).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    got = {(r.source_a, r.source_b): r for r in text_js_divergence(spark, sf).collect()}
    assert got[("s1", "s2")].jsd == 0.0
    assert got[("s1", "s2")].n_shared_terms == 3
    ln2 = round(math.log(2.0), 4)
    assert abs(got[("s1", "s3")].jsd - ln2) < 1e-9
    assert got[("s1", "s3")].n_shared_terms == 0
    assert abs(got[("s2", "s3")].jsd - ln2) < 1e-9


def test_degenerate_division_guards(spark, tmp_path):
    """The ADVICE-r7 0/0 class, swept across the r8 operators: a
    constant-x regression group -> NULL slope/r2; an all-zero-value
    gini group -> NULL gini; a constant event series -> NULL MASE and
    seasonal strength 0 — never an engine-semantics-sensitive NaN."""
    import math
    import os

    import pandas as pd

    from build_a_cloud_based_batch_etl_pipeline_spark.operators.aggregates import (
        agg_gini_concentration,
        agg_linear_regression,
    )
    from build_a_cloud_based_batch_etl_pipeline_spark.operators.events import (
        events_forecast_backtest,
        events_seasonal_strength,
    )

    sf = str(tmp_path / "degen_fixture")
    os.makedirs(sf, exist_ok=True)

    li = pd.DataFrame(
        [
            # group C: constant quantity (sxx = 0) -> NULL slope
            {"l_orderkey": i, "l_partkey": 1, "l_suppkey": 1,
             "l_linenumber": 1, "l_quantity": 5.0,
             "l_extendedprice": 100.0 + i, "l_discount": 0.0, "l_tax": 0.0,
             "l_returnflag": "C", "l_linestatus": "O",
             "l_shipdate": pd.Timestamp(2024, 1, 1).date()}
            for i in range(6)
        ]
        + [
            # group V: varying quantity -> real slope
            {"l_orderkey": 10 + i, "l_partkey": 1, "l_suppkey": 1,
             "l_linenumber": 1, "l_quantity": float(i + 1),
             "l_extendedprice": 10.0 * (i + 1), "l_discount": 0.0,
             "l_tax": 0.0, "l_returnflag": "V", "l_linestatus": "O",
             "l_shipdate": pd.Timestamp(2024, 1, 1).date()}
            for i in range(6)
        ]
    )
    spark.createDataFrame(li).write.mode("overwrite").parquet(
        f"{sf}/lineitem.parquet"
    )
    reg = {r.l_returnflag: r for r in agg_linear_regression(spark, sf).collect()}
    assert reg["C"].slope is None and reg["C"].r2 is None
    assert reg["V"].slope is not None and abs(reg["V"].slope - 10.0) < 1e-6

    orders = pd.DataFrame(
        [
            {"o_orderkey": i, "o_custkey": 1, "o_orderstatus": "F",
             "o_totalprice": 0.00, "o_orderdate": pd.Timestamp(2024, 1, 1).date(),
             "o_orderpriority": "ZERO"}
            for i in range(5)
        ]
    )
    spark.createDataFrame(orders).write.mode("overwrite").parquet(
        f"{sf}/orders.parquet"
    )
    gini = {r.grp: r for r in agg_gini_concentration(spark, sf).collect()}
    assert gini["ZERO"].gini is None

    ev = pd.DataFrame(
        [
            {"event_id": d, "ts": pd.Timestamp(2024, 1, 1 + d, 12),
             "user_id": 1, "event_type": "const", "value": 3.00,
             "props": "{}"}
            for d in range(14)
        ]
    )
    spark.createDataFrame(ev).write.mode("overwrite").parquet(
        f"{sf}/events.parquet"
    )
    bt = {r.event_type: r for r in events_forecast_backtest(spark, sf).collect()}
    assert bt["const"].mae_naive == 0.0 and bt["const"].mase is None
    ss = {r.event_type: r for r in events_seasonal_strength(spark, sf).collect()}
    assert ss["const"].var_total == 0.0
    assert ss["const"].seasonal_strength == 0.0


def test_ewma_calendar_gap_decays_by_day_not_row(spark, tmp_path):
    """A series observed on days 0..4 then absent until day 14 must
    decay the old state by (1-a)^10 at the re-appearance — the
    day-index exponent's core claim (a ROW-index lag would decay by
    one step only). Verified against the recursion with explicit gap
    handling."""
    import os

    import pandas as pd

    from build_a_cloud_based_batch_etl_pipeline_spark.operators.events import (
        _EWMA_ALPHA,
        events_ewma,
    )

    rows = []
    days = [0, 1, 2, 3, 4, 14]
    for i, d in enumerate(days):
        rows.append(
            {
                "event_id": i,
                "ts": pd.Timestamp(2024, 1, 1) + pd.Timedelta(days=d, hours=6),
                "user_id": 1,
                "event_type": "gappy",
                "value": 2.00 if d < 14 else 8.00,
                "props": "{}",
            }
        )
    sf = str(tmp_path / "gap_fixture")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(pd.DataFrame(rows)).write.mode("overwrite").parquet(
        f"{sf}/events.parquet"
    )
    got = sorted(events_ewma(spark, sf).collect(), key=lambda r: r.day)
    decay = 1.0 - _EWMA_ALPHA
    num = den = 0.0
    prev = None
    for r, d in zip(got, days):
        gap = d - prev if prev is not None else 0
        num = (2.0 if d < 14 else 8.0) + (decay**gap) * num
        den = 1.0 + (decay**gap) * den
        prev = d
        assert abs(r.ewma - num / den) < 5e-4, (d, r.ewma, num / den)
    # after a 10-day gap the old state carries (1-a)^10 ~ 0.028 weight:
    # the day-14 ewma must sit close to the new level, not at the
    # one-step blend a row-index formulation would produce
    assert got[-1].ewma > 7.5
    one_step_blend = _EWMA_ALPHA * 8.0 + (1 - _EWMA_ALPHA) * 2.0  # = 3.8
    assert abs(got[-1].ewma - one_step_blend) > 3.0


def test_pmi_and_bpe_degenerate_corpora(spark, tmp_path):
    """Single-word documents emit no pairs (PMI output empty below min
    support; the (w1, null) rows count unigrams only), and a corpus of
    1-char words yields zero BPE pairs — the sequence(1, len-1) guard
    both docstrings claim (Spark's sequence would DESCEND on len-1=0)."""
    import os

    import pandas as pd

    from build_a_cloud_based_batch_etl_pipeline_spark.operators.text import (
        text_bpe_pair_stats,
        text_collocation_pmi,
    )

    rows = [
        {"doc_id": i, "text": t, "lang": "en", "source": "s", "n_chars": len(t)}
        for i, t in enumerate(["q", "w", "e", "r", "t", "y"])
    ]
    sf = str(tmp_path / "degen_text")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(pd.DataFrame(rows)).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    assert text_collocation_pmi(spark, sf).count() == 0
    assert text_bpe_pair_stats(spark, sf).count() == 0
