"""Named query registry — the engine's public query surface.

Every operator family from SURVEY.md §2 ships as one or more named queries.
Each entry pairs a Spark DataFrame implementation with (where SQL can
express it) an equivalent ANSI-SQL oracle string that DuckDB runs over the
same parquet fixtures; the driver hash-compares the two at sf 0.01.

Conventions (critical for oracle parity):
- every computed/aggregate column is aliased identically on both sides;
- double-typed aggregates are rounded (sum→2dp, avg/ratio→4dp) so the two
  engines' different summation orders cannot flip the value hash;
- timestamps compare bit-for-bit because the session timezone is UTC;
- result sets either carry a unique key or are closed under permutation
  (the driver's value hash is order-insensitive).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL; None => rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, bench: bool = False):
    """Decorator registering a named query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip(), bench)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registry population)."""
    from .operators import (  # noqa: F401
        relational,
        aggregates,
        windows,
        joins,
        setops,
        scalar_fns,
        events,
        dedup,
        similarity,
        text,
        multimodal,
        subqueries,
        udfs,
        reshape,
        tpch_extra,
        sampling,
    )

    return REGISTRY
