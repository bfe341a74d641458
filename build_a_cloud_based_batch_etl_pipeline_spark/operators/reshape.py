"""Reshaping + second-wave scalar functions: unpivot/melt, GROUPING flags,
nth_value/frame windows, struct & map columns, hash/encoding functions,
bitwise ops, extended datetime/string functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..queries import query
from .util import r2, r4, t


@query(
    "unpivot_metrics",
    oracle="""
    WITH m AS (
        SELECT c_mktsegment,
               round(sum(c_acctbal), 2) AS total_bal,
               round(avg(c_acctbal), 2) AS avg_bal,
               round(max(c_acctbal), 2) AS max_bal
        FROM customer GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, 'total_bal' AS metric, total_bal AS value FROM m
    UNION ALL
    SELECT c_mktsegment, 'avg_bal',   avg_bal   FROM m
    UNION ALL
    SELECT c_mktsegment, 'max_bal',   max_bal   FROM m
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long unpivot (melt) of per-segment metrics (the inverse of
    events_pivot; oracle is the UNION ALL expansion it desugars to)."""
    cust = t(spark, sf_dir, "customer")
    wide = cust.groupBy("c_mktsegment").agg(
        r2(F.sum("c_acctbal")).alias("total_bal"),
        r2(F.avg("c_acctbal")).alias("avg_bal"),
        r2(F.max("c_acctbal")).alias("max_bal"),
    )
    return wide.unpivot(
        ids=["c_mktsegment"],
        values=["total_bal", "avg_bal", "max_bal"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "agg_grouping_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag,
           GROUPING(l_linestatus) AS g_status,
           count(*)               AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() indicator columns distinguish subtotal rows from real
    NULL groups (per-column flags; grouping_id bit order is engine-
    specific so the portable form is per-column)."""
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        F.count("*").alias("n"),
    )


@query(
    "window_nth_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price,
           round(last_value(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
               AS final_price
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value + last_value over an explicit full-partition frame (the
    default frame would stop at CURRENT ROW and surprise)."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        r2(F.nth_value("o_totalprice", 2).over(w)).alias("second_price"),
        r2(F.last("o_totalprice").over(wfull)).alias("final_price"),
    )


@query(
    "struct_columns",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus            AS status,
           round(o_totalprice, 2)   AS price,
           CAST(year(o_orderdate) AS INT) AS yr
    FROM orders
    WHERE o_orderkey < 800
    """,
)
def struct_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct column construction + field access round-trip (nested types
    in flight, flat columns at the boundary for oracle comparability)."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 800)
    nested = orders.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.round("o_totalprice", 2).alias("price"),
            F.year("o_orderdate").alias("yr"),
        ).alias("info"),
    )
    return nested.select(
        "o_orderkey",
        F.col("info.status").alias("status"),
        F.col("info.price").alias("price"),
        F.col("info.yr").alias("yr"),
    )


@query(
    "map_columns",
    oracle="""
    SELECT c_custkey, 'segment' AS k, c_mktsegment AS v
    FROM customer WHERE c_custkey < 100
    UNION ALL
    SELECT c_custkey, 'name', c_name
    FROM customer WHERE c_custkey < 100
    """,
)
def map_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map column construction + explode to (key, value) rows (oracle is
    the UNION ALL the explode flattens to)."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    mapped = cust.select(
        "c_custkey",
        F.create_map(
            F.lit("segment"), F.col("c_mktsegment"), F.lit("name"), F.col("c_name")
        ).alias("m"),
    )
    return mapped.select("c_custkey", F.explode("m").alias("k", "v"))


@query(
    "fn_hash_encode",
    oracle="""
    SELECT doc_id,
           md5(text)                       AS h_md5,
           sha256(text)                    AS h_sha256,
           base64(encode(substring(text, 1, 24))) AS b64_prefix
    FROM documents WHERE doc_id < 200
    """,
)
def fn_hash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digests + base64 encoding (content-addressing
    primitives for dedup/provenance)."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        F.base64(F.encode(F.substring("text", 1, 24), "UTF-8")).alias("b64_prefix"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT c_custkey,
           c_custkey & 255     AS low_byte,
           c_custkey | 4096    AS with_flag,
           xor(c_custkey, 170) AS xored,
           c_custkey << 3      AS shl,
           c_custkey >> 2      AS shr,
           bit_count(c_custkey) AS popcnt
    FROM customer WHERE c_custkey < 300
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator surface."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    k = F.col("c_custkey")
    return cust.select(
        "c_custkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(170)).alias("xored"),
        F.shiftleft(k, 3).alias("shl"),
        F.shiftright(k, 2).alias("shr"),
        F.bit_count(k).cast("long").alias("popcnt"),
    )


@query(
    "fn_datetime_extended",
    oracle="""
    SELECT o_orderkey,
           CAST(quarter(o_orderdate)   AS INT) AS qtr,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3mo,
           CAST(o_orderdate - INTERVAL 7 DAY   AS TIMESTAMP) AS minus_7d
    FROM orders WHERE o_orderkey < 600
    """,
)
def fn_datetime_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter/day-of-year extraction, month-end, interval arithmetic."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 600)
    return orders.select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus_3mo"),
        (F.col("o_orderdate") - F.expr("INTERVAL 7 DAYS")).alias("minus_7d"),
    )


@query(
    "fn_string_extended",
    oracle="""
    SELECT p_partkey,
           translate(p_name, 'aeiou', 'AEIOU') AS devoweled,
           reverse(p_name)                     AS reversed,
           repeat(p_brand, 2)                  AS doubled,
           left(p_name, 4)                     AS l4,
           right(p_name, 4)                    AS r4,
           strpos(p_name, 'o')                 AS first_o,
           contains(p_name, 'bolt')            AS has_bolt,
           starts_with(p_type, 'PRO')          AS is_promo_type
    FROM part WHERE p_partkey < 400
    """,
)
def fn_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """translate / reverse / repeat / left / right / position / contains /
    prefix tests."""
    part = t(spark, sf_dir, "part").filter(F.col("p_partkey") < 400)
    return part.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "AEIOU").alias("devoweled"),
        F.reverse("p_name").alias("reversed"),
        F.repeat("p_brand", 2).alias("doubled"),
        F.substring("p_name", 1, 4).alias("l4"),
        F.substring(F.col("p_name"), -4, 4).alias("r4"),
        F.instr("p_name", "o").cast("long").alias("first_o"),
        F.contains("p_name", F.lit("bolt")).alias("has_bolt"),
        F.startswith("p_type", F.lit("PRO")).alias("is_promo_type"),
    )


_QBIN_QS = [i / 10.0 for i in range(1, 10)]


@query(
    "feature_quantile_bins",
    oracle="""
    WITH bounds AS (
        SELECT quantile_cont(o_totalprice,
                             [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
        FROM orders
    ),
    binned AS (
        SELECT o_totalprice,
               1 + len(list_filter(bs, b -> round(b, 2) < o_totalprice)) AS decile
        FROM orders CROSS JOIN bounds
    )
    SELECT CAST(decile AS BIGINT)   AS decile,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price,
           round(avg(o_totalprice), 4) AS avg_price
    FROM binned GROUP BY decile
    """,
)
def feature_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile discretizer (the ML feature-binning primitive): assign
    every order to a price decile and report per-bin stats. Bin
    boundaries are the exact interpolated deciles of o_totalprice,
    ROUNDED to 2dp on both engines before the strict `<` comparison, so
    a boundary value bins identically everywhere.

    Scale shape: boundaries come from ONE exact-percentile aggregate
    (1 row), broadcast back onto the scan via crossJoin — binning itself
    is a codegen'd projection, and per-bin stats are a 10-group
    aggregation. A global ntile() would need a single-partition window
    (forbidden by the plan sweep); at 100 TB swap the exact percentile
    for approx_percentile or the t-digest digests
    (sketch_tdigest_quantiles) — the binning plan is unchanged."""
    orders = t(spark, sf_dir, "orders").select("o_totalprice")
    bounds = orders.agg(
        F.percentile("o_totalprice", F.array(*[F.lit(q) for q in _QBIN_QS])).alias(
            "bs"
        )
    )
    binned = orders.crossJoin(F.broadcast(bounds)).select(
        "o_totalprice",
        (
            F.lit(1)
            + F.size(
                F.filter(
                    "bs", lambda b: F.round(b, 2) < F.col("o_totalprice")
                )
            )
        )
        .cast("long")
        .alias("decile"),
    )
    return binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )
