"""Set operations: UNION [ALL] / INTERSECT / EXCEPT / DISTINCT
(SURVEY.md §2.2 "Set ops").

Scale notes: UNION ALL is a zero-shuffle concatenation of partitions;
UNION/INTERSECT/EXCEPT/DISTINCT each shuffle on the full row — at 100 TB
prefer pre-aggregated or key-projected inputs (as here) so the shuffled
payload is keys, not whole rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import query
from .util import t, ts


def _jan_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= ts("1995-01-01 00:00:00"))
            & (F.col("o_orderdate") < ts("1995-02-01 00:00:00"))
        )
        .select(F.col("o_custkey").alias("custkey"))
    )


def _feb_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= ts("1995-02-01 00:00:00"))
            & (F.col("o_orderdate") < ts("1995-03-01 00:00:00"))
        )
        .select(F.col("o_custkey").alias("custkey"))
    )


_JAN = """SELECT o_custkey AS custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
            AND o_orderdate <  TIMESTAMP '1995-02-01 00:00:00'"""
_FEB = """SELECT o_custkey AS custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-02-01 00:00:00'
            AND o_orderdate <  TIMESTAMP '1995-03-01 00:00:00'"""


@query("setop_union_all", oracle=f"({_JAN}) UNION ALL ({_FEB})")
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics, duplicates preserved, no shuffle)."""
    return _jan_custkeys(spark, sf_dir).unionByName(_feb_custkeys(spark, sf_dir))


@query("setop_union_distinct", oracle=f"({_JAN}) UNION ({_FEB})")
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics = union all + distinct)."""
    return (
        _jan_custkeys(spark, sf_dir).unionByName(_feb_custkeys(spark, sf_dir)).distinct()
    )


@query("setop_intersect", oracle=f"({_JAN}) INTERSECT ({_FEB})")
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    return _jan_custkeys(spark, sf_dir).intersect(_feb_custkeys(spark, sf_dir))


@query("setop_except", oracle=f"({_JAN}) EXCEPT ({_FEB})")
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics; Spark's subtract)."""
    return _jan_custkeys(spark, sf_dir).subtract(_feb_custkeys(spark, sf_dir))


@query(
    "setop_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def setop_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a projection."""
    return t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()
