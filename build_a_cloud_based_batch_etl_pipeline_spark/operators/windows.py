"""Window functions: ranking, analytic (lag/lead/first/last), aggregate
frames, top-k per group (SURVEY.md §2.2 "Window functions").

Scale notes: a window = one shuffle on partitionBy + per-partition sort.
All windows here partition on a natural key (custkey/suppkey/user) whose
cardinality grows with data — no global (unpartitioned) windows, which
would serialize 100 TB through one task. Top-k per group pushes the
rank filter immediately after the window so nothing but k rows per key
survives the stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..queries import query
from .util import cents, r2, r4, t


@query(
    "window_ranking",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey,
               round(o_totalprice, 2) AS price,
               row_number() OVER w AS rn,
               rank()       OVER w AS rk,
               dense_rank() OVER w AS drk,
               ntile(4)     OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile. The ranking window orders by
    (price desc, orderkey) so ranks are total-ordered and deterministic;
    ntile uses the unique orderkey ordering for the same reason."""
    orders = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    wq = W.partitionBy("o_custkey").orderBy("o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            r2("o_totalprice").alias("price"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
            F.ntile(4).over(wq).alias("quartile"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(o_totalprice, 2)                                  AS price,
           round(lag(o_totalprice)  OVER w, 2)                     AS prev_price,
           round(lead(o_totalprice) OVER w, 2)                     AS next_price,
           round(first_value(o_totalprice) OVER w, 2)              AS first_price,
           round(o_totalprice - coalesce(lag(o_totalprice) OVER w,
                                         o_totalprice), 2)         AS delta
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value and a lag-derived delta per customer order
    history (ordered by date with unique-key tie-break)."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        r2("o_totalprice").alias("price"),
        r2(F.lag("o_totalprice").over(w)).alias("prev_price"),
        r2(F.lead("o_totalprice").over(w)).alias("next_price"),
        r2(F.first("o_totalprice").over(w)).alias("first_price"),
        r2(
            F.col("o_totalprice")
            - F.coalesce(F.lag("o_totalprice").over(w), F.col("o_totalprice"))
        ).alias("delta"),
    )


@query(
    "window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW), 2) AS running_total,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN 2 PRECEDING
                                              AND CURRENT ROW), 4) AS moving_avg3,
           count(*) OVER (PARTITION BY o_custkey)                   AS n_orders
    FROM orders
    WHERE o_custkey < 100
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over row frames: running total, 3-row moving average,
    whole-partition count."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        r2(F.sum("o_totalprice").over(wo.rowsBetween(W.unboundedPreceding, 0))).alias(
            "running_total"
        ),
        r4(F.avg("o_totalprice").over(wo.rowsBetween(-2, 0))).alias("moving_avg3"),
        F.count("*").over(W.partitionBy("o_custkey")).alias("n_orders"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT s_suppkey,
           round(s_acctbal, 2) AS bal,
           count(*) OVER (ORDER BY s_acctbal
                          RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING) AS n_within_500
    FROM supplier
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering: suppliers with balance within
    ±500. (Global window is acceptable here only because supplier is a
    bounded dimension; fact-table ranges go through the banded-join
    pattern instead — see join_range_band.)"""
    sup = t(spark, sf_dir, "supplier")
    w = W.orderBy("s_acctbal").rangeBetween(-500, 500)
    return sup.select(
        "s_suppkey",
        r2("s_acctbal").alias("bal"),
        F.count("*").over(w).alias("n_within_500"),
    )


@query(
    "topk_per_group",
    oracle="""
    WITH s AS (
        SELECT p_brand, p_partkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS s4
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey
    )
    SELECT * FROM (
        SELECT p_brand, p_partkey,
               ((s4 + 50) // 100) / 100.0 AS revenue,
               row_number() OVER (PARTITION BY p_brand
                                  ORDER BY s4 DESC, p_partkey) AS rn
        FROM s
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by revenue within each brand: agg -> window -> rank
    filter. The canonical top-k-per-group at scale (no global sort).

    Exact integer core (r9 margin-sweep fix; the old double revenue sum
    sat ON a 2dp half-boundary at sf0.01, margin 0): the per-part
    revenue is summed as exact bigint 1e-4-dollar units, so BOTH the
    displayed 2dp value (integer half-up) and — just as important for a
    rank query — the ORDER BY are tie-order invariant; two parts whose
    double revenues differed by an ulp could previously swap rn
    cross-host.

    Join AFTER the aggregate (classic pre-aggregation pushdown):
    p_brand is functionally determined by p_partkey, so summing by
    l_partkey first shrinks the broadcast-join probe side from every
    lineitem row to one row per part — same exchange count, ~30x
    fewer join lookups at TPC-H row ratios, and the agg hash keys on
    one bigint instead of (string, bigint)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    per_part = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                cents("l_extendedprice") * (100 - cents("l_discount"))
            ).alias("s4")
        )
        .join(part.select("p_partkey", "p_brand"), F.col("l_partkey") == F.col("p_partkey"))
    )
    w = W.partitionBy("p_brand").orderBy(F.col("s4").desc(), "p_partkey")
    return (
        per_part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "p_brand",
            "p_partkey",
            (F.expr("(s4 + 50) div 100") / 100.0).alias("revenue"),
            "rn",
        )
    )


@query(
    "window_cume",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM customer
    WHERE c_custkey < 300
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist distribution functions."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "window_ratio_to_report",
    oracle="""
    WITH nat_rev AS (
        SELECT n_name, n_regionkey,
               sum(s_acctbal) AS nation_bal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name, n_regionkey
    )
    SELECT n_name,
           round(nation_bal, 2) AS nation_bal,
           round(nation_bal / sum(nation_bal) OVER (PARTITION BY n_regionkey), 4)
               AS share_of_region,
           round(nation_bal / sum(nation_bal) OVER (), 4)
               AS share_of_total
    FROM nat_rev
    """,
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total at two grains (ratio_to_report): each nation's
    supplier balance as a share of its region and of the world — window
    aggregates over a pre-reduced input, so the unpartitioned total
    window runs over |nations| rows, not the fact table (the safe way to
    use a global window at any scale)."""
    sup = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    nat_rev = (
        sup.join(nat, sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name", "n_regionkey")
        .agg(F.sum("s_acctbal").alias("nation_bal"))
    )
    w_region = W.partitionBy("n_regionkey")
    w_all = W.partitionBy()
    return nat_rev.select(
        "n_name",
        F.round("nation_bal", 2).alias("nation_bal"),
        F.round(F.col("nation_bal") / F.sum("nation_bal").over(w_region), 4).alias(
            "share_of_region"
        ),
        F.round(F.col("nation_bal") / F.sum("nation_bal").over(w_all), 4).alias(
            "share_of_total"
        ),
    )


@query(
    "window_median",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round(c_acctbal, 2) AS bal,
           round(median(c_acctbal) OVER (PARTITION BY c_mktsegment), 4)
               AS segment_median,
           round(c_acctbal - median(c_acctbal) OVER (PARTITION BY c_mktsegment), 4)
               AS diff_from_median
    FROM customer
    WHERE c_custkey < 300
    """,
)
def window_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median as a window aggregate (each row vs its segment median) —
    the robust-center analog of the avg-over-window pattern; partition
    key cardinality grows with data, so partitions stay bounded."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    w = W.partitionBy("c_mktsegment")
    med = F.median("c_acctbal").over(w)
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("bal"),
        F.round(med, 4).alias("segment_median"),
        F.round(F.col("c_acctbal") - med, 4).alias("diff_from_median"),
    )


@query(
    "window_distinct_frame",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(count(DISTINCT o_custkey) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS distinct_custs_20
    FROM orders
    """,
)
def window_distinct_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct count over a moving rows-frame — an operator Spark's
    window aggregates LACK natively (count_distinct is not allowed over
    a frame): per priority class, the number of DISTINCT customers among
    the trailing 20 orders. Expressed as size(collect_set() OVER frame),
    which Spark evaluates incrementally per frame.

    The frame is ordered by (o_orderdate, o_orderkey) — a total order,
    so ROWS frames are deterministic and both engines slice identically.

    Scale shape: one shuffle on the partition key; per-row state is
    bounded by the 20-row frame (collect_set holds <= 20 keys), so
    memory is O(frame), never O(partition). An unbounded-preceding
    variant would instead need the dedup-then-running-sum rewrite
    (first-occurrence flag via row_number, then a running sum)."""
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-19, 0)
    )
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.size(F.collect_set("o_custkey").over(w)).cast("long").alias(
            "distinct_custs_20"
        ),
    )
