"""Shared helpers for operator modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import BROADCAST_TABLES
from ..sources import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a fixture table; constant-size dims come back broadcast-hinted.

    region/nation are 5/25 rows at every scale factor, so the broadcast hint
    is always right and removes a shuffle from every join that touches them.
    """
    df = load_table(spark, sf_dir, name)
    if name in BROADCAST_TABLES:
        return F.broadcast(df)
    return df


def r2(c: Column | str) -> Column:
    """Round a double aggregate to 2dp (sums / revenues).

    Spark and DuckDB sum doubles in different orders; the ~1e-5 relative
    wobble would break the oracle's value hash. 2dp is far above the wobble
    and at/below the precision of the input money columns.
    """
    return F.round(c if isinstance(c, Column) else F.col(c), 2)


def r4(c: Column | str) -> Column:
    """Round to 4dp (averages, ratios, stats)."""
    return F.round(c if isinstance(c, Column) else F.col(c), 4)


def ts(lit: str) -> Column:
    """Timestamp literal (session TZ is pinned to UTC => bit-equal to DuckDB)."""
    return F.lit(lit).cast("timestamp")


def seq1(stop: Column) -> Column:
    """sequence(1, stop) that is EMPTY when stop < 1.

    F.sequence(1, 0) silently yields a DESCENDING [1, 0] (Spark
    auto-steps -1 when start > stop), so the classic
    sequence(1, greatest(size - k, 0)) shingle/n-gram index pattern
    evaluates element_at(arr, 0) on short inputs and throws under ANSI
    mode. Every 1-based index sequence in the engine goes through this
    guard instead."""
    return F.when(stop >= 1, F.sequence(F.lit(1), stop)).otherwise(
        F.array().cast("array<int>")
    )
