"""Join operators: inner/left/right/full equi-joins, semi/anti, theta/range,
as-of, broadcast, cross (SURVEY.md §2.2 "Joins" — all absent from the
reference, whose join capability was delegated to BigQuery).

Scale notes: equi-joins shuffle both sides on the key unless one side is
broadcast; Catalyst+AQE pick broadcast automatically under the threshold.
The range join here demonstrates the 100 TB-safe pattern (bucketize the
range key -> equi-join on bucket -> exact filter) instead of the naive
broadcast-nested-loop that a raw theta predicate produces. The as-of join
is the union+window composition, which is a single shuffle on the
partition key — no per-row lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..queries import query
from .util import r2, r4, t, ts


@query(
    "join_inner",
    oracle="""
    SELECT c_mktsegment, o_orderstatus,
           count(*)                    AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment, o_orderstatus
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + grouped agg."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(F.count("*").alias("n"), r2(F.sum("o_totalprice")).alias("total"))
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey,
           count(o_orderkey)                       AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS total
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
                    AND o_orderdate < TIMESTAMP '1995-03-01 00:00:00'
    GROUP BY c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count over the
    null-extended side counts only matches)."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < ts("1995-03-01 00:00:00")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            r2(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias("total"),
        )
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT p_partkey, p_brand,
           count(l_orderkey) AS n_lines
    FROM (SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-06-01 00:00:00') li
    RIGHT JOIN part ON l_partkey = p_partkey
    GROUP BY p_partkey, p_brand
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: every part survives, unmatched get zero counts."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= ts("2001-06-01 00:00:00")
    )
    part = t(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey, "right")
        .groupBy("p_partkey", "p_brand")
        .agg(F.count("l_orderkey").alias("n_lines"))
    )


@query(
    "join_full_outer",
    oracle="""
    WITH rich AS (
        SELECT c_custkey, round(c_acctbal, 2) AS bal
        FROM customer WHERE c_acctbal > 9000
    ),
    active AS (
        SELECT o_custkey, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate < TIMESTAMP '1995-02-01 00:00:00'
        GROUP BY o_custkey
    )
    SELECT c_custkey, bal, o_custkey, n_orders
    FROM rich FULL OUTER JOIN active ON c_custkey = o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with nulls on both sides."""
    rich = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", r2("c_acctbal").alias("bal"))
    )
    active = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < ts("1995-02-01 00:00:00"))
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return rich.join(active, rich.c_custkey == active.o_custkey, "full_outer").select(
        "c_custkey", "bal", "o_custkey", "n_orders"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderpriority = '1-URGENT'
          AND o_totalprice > 400000
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): no duplication, left columns only."""
    cust = t(spark, sf_dir, "customer")
    urgent = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 400000)
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    )
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS)."""
    cust = t(spark, sf_dir, "customer")
    recent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= ts("1999-01-01 00:00:00")
    )
    return cust.join(
        recent, cust.c_custkey == recent.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


@query(
    "join_range_band",
    oracle="""
    SELECT c_custkey, s_suppkey,
           round(c_acctbal, 2) AS c_bal,
           round(s_acctbal, 2) AS s_bal
    FROM customer JOIN supplier
      ON s_acctbal > c_acctbal - 1.0 AND s_acctbal < c_acctbal + 1.0
    """,
)
def join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (range/theta) join: |s_acctbal - c_acctbal| < 1.

    100 TB-safe pattern: instead of the broadcast-nested-loop a raw theta
    predicate plans, bucketize the range key to integer buckets, explode
    one side to its 3 adjacent buckets, equi-join on bucket, then apply the
    exact predicate. Turns O(n*m) comparisons into a hash join with ~3x
    fan-out on one side.
    """
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", F.floor("c_acctbal").alias("bucket")
    )
    sup = (
        t(spark, sf_dir, "supplier")
        .select(
            "s_suppkey",
            "s_acctbal",
            F.explode(
                F.array(
                    F.floor("s_acctbal") - 1,
                    F.floor("s_acctbal"),
                    F.floor("s_acctbal") + 1,
                )
            ).alias("bucket"),
        )
    )
    return (
        cust.join(sup, "bucket")
        .filter(
            (F.col("s_acctbal") > F.col("c_acctbal") - 1.0)
            & (F.col("s_acctbal") < F.col("c_acctbal") + 1.0)
        )
        .select(
            "c_custkey",
            "s_suppkey",
            r2("c_acctbal").alias("c_bal"),
            r2("s_acctbal").alias("s_bal"),
        )
    )


def asof_join(
    targets: DataFrame,
    sources: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    out_col: str,
    strict: bool = True,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Generic as-of join builder: for every target row, attach
    `value_col` from the nearest source row of the same `key` —
    `backward` (latest source with time < target time; <= when
    non-strict) or `forward` (earliest source with time > target; >=
    when non-strict), optionally nulled when the matched source lies
    further than `tolerance_seconds` away (pandas merge_asof parity).

    Spark has no native ASOF JOIN; the scalable composition is
    union-the-streams + one window sorted by time with
    last/first(value, ignorenulls=True): a single shuffle on the
    partition key, linear scan per partition — no correlated per-row
    lookup, no range explosion, and tolerance is a post-hoc null-out of
    the carried match timestamp, not a join-condition blowup.
    (SURVEY.md §2.2 / §7 "what's hard".) Property-tested against a
    brute-force reference on random inputs in tests/test_properties.py
    (both directions, with and without tolerance).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    tgt_cols = targets.columns
    src = sources.select(
        key,
        F.col(time_col),
        F.col(value_col).alias("__asof_val"),
        F.col(time_col).alias("__asof_ts"),
        F.lit(0).alias("__is_target"),
        *[F.lit(None).cast(targets.schema[c].dataType).alias(c)
          for c in tgt_cols if c not in (key, time_col)],
    )
    tgt = targets.select(
        key,
        F.col(time_col),
        F.lit(None).cast(sources.schema[value_col].dataType).alias("__asof_val"),
        F.lit(None).cast(sources.schema[time_col].dataType).alias("__asof_ts"),
        F.lit(1).alias("__is_target"),
        *[c for c in tgt_cols if c not in (key, time_col)],
    )
    # Tie-break places the target so an equal-time source is excluded
    # (strict) or included (non-strict) by the frame. Backward frame
    # looks at strictly-earlier rows, so the target sorts BEFORE an
    # equal-time source under strict; forward mirrors it.
    if direction == "backward":
        order_tgt = F.col("__is_target").desc() if strict else F.col("__is_target").asc()
        frame = (W.unboundedPreceding, -1)
        pick = F.last
    else:
        order_tgt = F.col("__is_target").asc() if strict else F.col("__is_target").desc()
        frame = (1, W.unboundedFollowing)
        pick = F.first
    w = (
        W.partitionBy(key)
        .orderBy(F.col(time_col), order_tgt)
        .rowsBetween(*frame)
    )
    joined = (
        src.unionByName(tgt)
        .withColumn(out_col, pick("__asof_val", ignorenulls=True).over(w))
        .withColumn("__match_ts", pick("__asof_ts", ignorenulls=True).over(w))
        .filter(F.col("__is_target") == 1)
    )
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col(time_col).cast("double") - F.col("__match_ts").cast("double")
        )
        joined = joined.withColumn(
            out_col, F.when(gap <= float(tolerance_seconds), F.col(out_col))
        )
    return joined.select(*tgt_cols, out_col)


@query(
    "join_asof",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, event_type,
                       CAST(ts AS TIMESTAMP) AS ts FROM events)
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT max(c.ts) FROM ev c
            WHERE c.user_id = e.user_id AND c.event_type = 'click' AND c.ts < e.ts
           ) AS last_click_ts
    FROM ev e
    WHERE e.event_type = 'purchase'
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the user's most recent prior click
    (strict) — the fixture instantiation of the generic asof_join
    builder."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        purchases, clicks, key="user_id", time_col="ts",
        value_col="click_ts", out_col="last_click_ts", strict=True,
    ).select("event_id", "user_id", "ts", "last_click_ts")


@query(
    "join_asof_forward",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, event_type,
                       CAST(ts AS TIMESTAMP) AS ts FROM events)
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT min(c.ts) FROM ev c
            WHERE c.user_id = e.user_id AND c.event_type = 'purchase'
              AND c.ts > e.ts
           ) AS next_purchase_ts
    FROM ev e
    WHERE e.event_type = 'click'
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each click, the user's NEXT purchase
    (strict) — time-to-conversion attribution. Same single-shuffle
    union+window plan as the backward form, mirrored frame."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("ts").alias("purchase_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        clicks, purchases, key="user_id", time_col="ts",
        value_col="purchase_ts", out_col="next_purchase_ts",
        strict=True, direction="forward",
    ).select("event_id", "user_id", "ts", "next_purchase_ts")


@query(
    "join_asof_tolerance",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, event_type,
                       CAST(ts AS TIMESTAMP) AS ts FROM events)
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT max(c.ts) FROM ev c
            WHERE c.user_id = e.user_id AND c.event_type = 'click'
              AND c.ts < e.ts AND c.ts >= e.ts - INTERVAL 1 HOUR
           ) AS last_click_1h
    FROM ev e
    WHERE e.event_type = 'purchase'
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-lookback as-of join: last prior click only if within one
    hour (pandas merge_asof `tolerance` parity). The bound is a post-hoc
    null-out of the carried match timestamp — the window plan is
    unchanged, no range-join explosion."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        purchases, clicks, key="user_id", time_col="ts",
        value_col="click_ts", out_col="last_click_1h",
        strict=True, tolerance_seconds=3600,
    ).select("event_id", "user_id", "ts", "last_click_1h")


@query(
    "join_asof_nearest",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, event_type,
                       CAST(ts AS TIMESTAMP) AS ts FROM events),
    p AS (SELECT event_id, user_id, ts FROM ev
          WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM ev WHERE event_type = 'click'),
    cand AS (
        SELECT p.event_id, p.user_id, p.ts,
               (SELECT max(c.ts) FROM c
                WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS prev_ts,
               (SELECT min(c.ts) FROM c
                WHERE c.user_id = p.user_id AND c.ts >= p.ts) AS next_ts
        FROM p
    )
    SELECT event_id, user_id, ts,
           CASE WHEN prev_ts IS NULL THEN next_ts
                WHEN next_ts IS NULL THEN prev_ts
                WHEN ts - prev_ts <= next_ts - ts THEN prev_ts
                ELSE next_ts END AS nearest_click_ts
    FROM cand
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (pandas merge_asof direction='nearest'
    parity): for each purchase, the click closest in time in EITHER
    direction, ties preferring the earlier (backward) click. Composed
    from the two directed as-of passes — backward non-strict carries
    prev_ts, forward non-strict carries next_ts, a null-safe CASE picks
    the smaller gap. Two union+window passes, both partitioned on the
    same key (user_id), so the plan stays linear-scan-per-partition
    with no range-join explosion — the same scale shape as each
    directed variant."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    prev = asof_join(
        purchases, clicks, key="user_id", time_col="ts",
        value_col="click_ts", out_col="prev_ts",
        strict=False, direction="backward",
    )
    both = asof_join(
        prev, clicks, key="user_id", time_col="ts",
        value_col="click_ts", out_col="next_ts",
        strict=False, direction="forward",
    )
    d_prev = F.col("ts").cast("double") - F.col("prev_ts").cast("double")
    d_next = F.col("next_ts").cast("double") - F.col("ts").cast("double")
    nearest = (
        F.when(F.col("prev_ts").isNull(), F.col("next_ts"))
        .when(F.col("next_ts").isNull(), F.col("prev_ts"))
        .when(d_prev <= d_next, F.col("prev_ts"))
        .otherwise(F.col("next_ts"))
    )
    return both.select(
        "event_id", "user_id", "ts", nearest.alias("nearest_click_ts")
    )


@query(
    "join_broadcast_dims",
    oracle="""
    SELECT r_name,
           count(*)               AS n_customers,
           round(avg(c_acctbal), 4) AS avg_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers per region through explicitly broadcast constant-size dims
    (nation 25 rows / region 5 rows at every SF -> no shuffle for the fact
    side beyond the final 5-group aggregation)."""
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")  # broadcast-hinted by t()
    reg = t(spark, sf_dir, "region")
    return (
        cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"), r4(F.avg("c_acctbal")).alias("avg_bal"))
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, s.o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two (deliberately tiny) inputs."""
    reg = t(spark, sf_dir, "region").select("r_name")
    statuses = t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return reg.crossJoin(statuses)


_SALT_BUCKETS = 8


@query(
    "join_skew_salted",
    oracle="""
    SELECT o_orderpriority,
           count(*)                                          AS n_lines,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated equi-join: manual key salting, result identical to
    the plain join (the oracle IS the plain join).

    The probe side appends a deterministic salt in [0, B) to its key; the
    build side is exploded B-fold, one copy per salt value; the join key
    becomes (key, salt), so one hot key's rows spread over B shuffle
    partitions instead of one straggler task. This is the manual
    technique for engines/settings without AQE skew-join splitting; with
    AQE on (session default) Spark does the equivalent split at runtime
    from map-output sizes — both paths ship, and the plan guardrails keep
    this an equi-join (no BNLJ). Salting cost: B-fold replication of the
    (small, pre-projected) build side — bounded and chosen, unlike a
    straggler, which is unbounded.
    """
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    salted_li = li.withColumn(
        "salt", (F.xxhash64("l_orderkey", "l_extendedprice") % _SALT_BUCKETS + _SALT_BUCKETS) % _SALT_BUCKETS
    )
    exploded_orders = orders.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT_BUCKETS - 1)))
    ).withColumn("salt", F.col("salt").cast("long"))
    joined = salted_li.join(
        exploded_orders,
        (salted_li.l_orderkey == exploded_orders.o_orderkey)
        & (salted_li.salt == exploded_orders.salt),
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
        )
        .orderBy("o_orderpriority")
    )


_INTERVAL_OVERLAP_ORACLE = """
WITH base AS (
    SELECT l_orderkey * 10 + l_linenumber AS iv_id,
           l_partkey, l_suppkey,
           l_shipdate AS iv_start,
           l_shipdate + (CAST(l_quantity AS INT) % 14 + 1) * INTERVAL 1 DAY
               AS iv_end
    FROM lineitem
), lft AS (
    SELECT * FROM base WHERE l_suppkey % 25 = 1
), rgt AS (
    SELECT * FROM base WHERE l_suppkey % 25 = 2
)
SELECT lft.l_partkey                AS part_key,
       lft.iv_id                    AS left_id,
       rgt.iv_id                    AS right_id,
       CAST(date_diff('day', greatest(lft.iv_start, rgt.iv_start),
                      least(lft.iv_end, rgt.iv_end)) + 1 AS BIGINT)
           AS overlap_days
FROM lft JOIN rgt
  ON lft.l_partkey = rgt.l_partkey
 AND lft.iv_start <= rgt.iv_end
 AND rgt.iv_start <= lft.iv_end
"""

# ~30-day buckets: intervals here are at most 15 days long, so each
# interval covers at most 2 buckets — the explode fan-out is <= 2x.
_IV_BUCKET_DAYS = 30


@query("join_interval_overlap", oracle=_INTERVAL_OVERLAP_ORACLE)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join between two large interval sets: pair up
    shipment windows of two supplier cohorts that overlap in time ON THE
    SAME PART (detecting concurrent multi-supplier shipments). Intervals
    are [l_shipdate, l_shipdate + (l_quantity % 14 + 1) days], derived
    deterministically from the fixture.

    100 TB-safe pattern (both sides big, so neither broadcasts and a raw
    theta predicate would plan a BNLJ): quantize time into fixed-width
    buckets, explode each interval to the buckets it covers (<= 2 here
    because bucket width >= max interval length), equi-join on
    (part_key, bucket) — a plain shuffled hash join — then apply the
    exact overlap predicate and dropDuplicates the (left,right) pairs
    that met in two buckets. The co-key (part_key) bounds per-bucket
    occupancy, and bucket width is the knob trading fan-out against
    bucket occupancy.
    """
    base = (
        t(spark, sf_dir, "lineitem")
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("iv_id"),
            "l_partkey",
            "l_suppkey",
            F.col("l_shipdate").alias("iv_start"),
            F.expr(
                "l_shipdate + make_dt_interval(cast(l_quantity as int) % 14 + 1, 0, 0, 0)"
            ).alias("iv_end"),
        )
        .withColumn("start_day", F.floor(F.unix_timestamp("iv_start") / 86400))
        .withColumn("end_day", F.floor(F.unix_timestamp("iv_end") / 86400))
    )

    def side(mod: int, prefix: str) -> DataFrame:
        return (
            base.filter(F.col("l_suppkey") % 25 == mod)
            .withColumn(
                "bucket",
                F.explode(
                    F.sequence(
                        F.floor(F.col("start_day") / _IV_BUCKET_DAYS),
                        F.floor(F.col("end_day") / _IV_BUCKET_DAYS),
                    )
                ),
            )
            .select(
                F.col("iv_id").alias(f"{prefix}_id"),
                F.col("l_partkey").alias(f"{prefix}_part"),
                F.col("iv_start").alias(f"{prefix}_start"),
                F.col("iv_end").alias(f"{prefix}_end"),
                "bucket",
            )
        )

    lft = side(1, "l")
    rgt = side(2, "r")
    pairs = (
        lft.join(
            rgt,
            (F.col("l_part") == F.col("r_part"))
            & (lft.bucket == rgt.bucket)
            & (F.col("l_start") <= F.col("r_end"))
            & (F.col("r_start") <= F.col("l_end")),
        )
        # an overlapping pair can meet in both buckets it straddles
        .dropDuplicates(["l_id", "r_id"])
    )
    return pairs.select(
        F.col("l_part").alias("part_key"),
        F.col("l_id").alias("left_id"),
        F.col("r_id").alias("right_id"),
        (
            F.datediff(
                F.least("l_end", "r_end"), F.greatest("l_start", "r_start")
            )
            + 1
        )
        .cast("long")
        .alias("overlap_days"),
    )
