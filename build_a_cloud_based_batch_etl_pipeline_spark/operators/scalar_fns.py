"""Scalar function surface: string / datetime / math / conditional /
array / JSON (SURVEY.md §2.2 "Scalar fns" — the expression vocabulary the
reference's users get from BigQuery SQL).

Everything is a built-in pyspark.sql.functions call — JVM-side, inside
whole-stage codegen. No Python UDF appears anywhere in this module: at
100 TB a row-at-a-time UDF on these expressions would be the single
slowest thing in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import query
from .util import r4, t


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                                   AS uname,
           lower(c_mktsegment)                             AS lseg,
           substring(c_name, 10, 8)                        AS keypart,
           length(c_name)                                  AS name_len,
           concat(c_mktsegment, ':', c_name)               AS tagged,
           trim(concat('  ', c_name, '  '))                AS trimmed,
           replace(c_name, 'Customer', 'Cust')             AS shortname,
           regexp_extract(c_name, '([0-9]+)', 1)           AS digits,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0')        AS padded_key,
           split_part(c_name, '#', 2)                      AS after_hash
    FROM customer
    WHERE c_custkey < 100
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: case, substring, length, concat, trim, replace,
    regexp extraction, padding, splitting."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 10, 8).alias("keypart"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("tagged"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("shortname"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("after_hash"),
    )


@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate)  AS INT)          AS yr,
           CAST(month(o_orderdate) AS INT)          AS mo,
           CAST(day(o_orderdate)   AS INT)          AS dom,
           date_trunc('month', o_orderdate)         AS month_start,
           date_trunc('week', o_orderdate)          AS week_start,
           date_diff('day', o_orderdate,
                     TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
           o_orderdate + INTERVAL 90 DAY            AS due_date,
           CAST(epoch(o_orderdate) AS BIGINT)       AS epoch_s,
           strftime(o_orderdate, '%Y-%m')           AS ym
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime functions: component extraction, truncation, arithmetic,
    interval add, epoch, formatting."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_trunc("week", "o_orderdate").alias("week_start"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate")).alias(
            "days_to_y2k"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice / l_quantity * 10000) / 10000 AS unit_price,
           CAST(l_quantity AS BIGINT) % 7              AS qty_mod7,
           abs(l_discount - 0.05)                      AS disc_dev,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT)  AS price_kilo_ceil,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_kilo_floor,
           round(sqrt(l_quantity), 6)                  AS qty_sqrt,
           round(ln(l_extendedprice), 6)               AS price_ln,
           round(log10(l_extendedprice), 6)            AS price_log10,
           round(power(l_discount, 2), 6)              AS disc_sq,
           CAST(sign(l_discount - 0.05) AS DOUBLE)     AS disc_sign,
           greatest(l_discount, l_tax)                 AS max_rate,
           least(l_discount, l_tax)                    AS min_rate
    FROM lineitem
    WHERE l_orderkey < 300
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions: arithmetic, modulo, abs, ceil/floor, sqrt, logs,
    power, sign, greatest/least."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # floor-scale, not round: 2dp-price / integer-qty lands on exact
        # rounding ties where Spark (HALF_UP) and DuckDB disagree; floor is
        # tie-free and bit-identical across engines.
        (F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 10000) / 10000).alias(
            "unit_price"
        ),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_kilo_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_kilo_floor"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.pow(F.col("l_discount"), 2), 6).alias("disc_sq"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END                             AS price_band,
           coalesce(NULLIF(o_orderstatus, 'O'), 'OPEN')    AS status_or_open,
           NULLIF(o_orderpriority, '5-LOW')                AS prio_or_null,
           CASE o_orderstatus WHEN 'F' THEN 1 ELSE 0 END   AS is_final,
           ifnull(NULLIF(o_orderstatus, o_orderstatus), 'same') AS always_same
    FROM orders
    WHERE o_orderkey < 1000
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expressions: searched/simple CASE, coalesce, nullif,
    ifnull."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).alias("prio_or_null"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_final"),
        F.ifnull(
            F.nullif(F.col("o_orderstatus"), F.col("o_orderstatus")), F.lit("same")
        ).alias("always_same"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')           AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS absent,
           CAST(json_valid(props) AS BOOLEAN)          AS is_valid
    FROM events
    WHERE event_id < 2000
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions over the events.props JSON column: path extraction
    (string + typed), missing-path null, validity. Generalizes the
    reference's JSON deserialize step (R2, reference src/load/main.py:32)
    to a columnar, codegen'd expression."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("absent"),
        F.get_json_object("props", "$").isNotNull().alias("is_valid"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding)                              AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6)      AS first_val,
           round(CAST(embedding[64] AS DOUBLE), 6)     AS last_val,
           round(CAST(list_sum(embedding) AS DOUBLE), 4) AS vec_sum,
           list_contains([label, 0], 3)                AS label_is_3
    FROM embeddings
    WHERE vec_id < 200
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over the embedding column: size, element access
    (1-based in both engines), fold-sum, construction + contains."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(F.element_at("embedding", 64).cast("double"), 6).alias("last_val"),
        F.round(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            4,
        ).alias("vec_sum"),
        F.array_contains(F.array(F.col("label"), F.lit(0)), 3).alias("label_is_3"),
    )


@query(
    "fn_json_parse_serialize",
    oracle="""
    SELECT event_id,
           len(json_keys(props))                               AS n_keys,
           CAST(json_extract(props, '$.k') AS BIGINT)          AS k_typed,
           CAST(json_extract(json(props), '$.k') AS BIGINT)    AS k_reparsed,
           CAST(json_extract_string(props, '$.k') AS VARCHAR)  AS k_str
    FROM events
    WHERE event_id < 2000
    """,
)
def fn_json_parse_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON parse -> typed struct -> serialize -> re-parse round-trip
    (from_json / to_json — R2/R3 generalized): the parsed value survives
    a serialize/re-parse cycle bit-identically. Key COUNT is compared
    rather than serialized text, since JSON text formatting (spacing) is
    engine-specific but the data model is not."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    parsed = F.from_json("props", "map<string,bigint>")
    reparsed = F.from_json(F.to_json(parsed), "map<string,bigint>")
    return ev.select(
        "event_id",
        F.size(F.map_keys(parsed)).alias("n_keys"),
        parsed.getItem("k").alias("k_typed"),
        reparsed.getItem("k").alias("k_reparsed"),
        parsed.getItem("k").cast("string").alias("k_str"),
    )


@query(
    "fn_try_safe",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / NULLIF(l_quantity - l_quantity, 0.0), 4)
               AS div_by_zero,
           CAST(floor(l_extendedprice / NULLIF(l_quantity, 0.0)) AS BIGINT)
               AS unit_price_floor,
           TRY_CAST(l_returnflag AS INTEGER)                   AS bad_cast,
           TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER)  AS good_cast
    FROM lineitem
    WHERE l_orderkey < 300
    """,
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic/casts under ANSI mode (Spark 4 default):
    try_divide and try_cast return NULL where strict evaluation would
    raise — the per-row fault isolation a 100 TB job needs so one bad
    record cannot kill a stage (the reference's row-error behavior,
    src/load/main.py:41-43, aborts the whole request instead)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - F.col("l_quantity")), 4
        ).alias("div_by_zero"),
        # floor-to-int, not round-to-4dp: a division result can sit within
        # one ulp of a 4dp rounding boundary and the two engines' rounding
        # implementations split (observed: 1731.47125) — integer floors
        # have 1e4x fewer boundaries.
        F.floor(F.try_divide("l_extendedprice", "l_quantity"))
        .cast("bigint")
        .alias("unit_price_floor"),
        F.col("l_returnflag").try_cast("int").alias("bad_cast"),
        F.col("l_linenumber").cast("string").try_cast("int").alias("good_cast"),
    )
