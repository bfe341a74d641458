"""Data-layout optimization: Z-order (Morton-curve) clustering for
multi-column data skipping.

A single sort column gives parquet min/max pruning on that column only;
interleaving the bits of TWO (or more) normalized columns into one
Morton key and range-sorting by it clusters rows so that BOTH columns'
min/max ranges are narrow within every file — a filter on either column
(or both) skips most files. This is the standard lakehouse answer to
multi-dimensional pruning at 100 TB (the reference has no layout control
at all: BigQuery manages physical layout — SURVEY.md §4.1).

The Morton key is computed with pure integer arithmetic (generated
bit-extract + scale + sum terms) so the exact same formula runs as a
codegen'd Spark projection and as the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import query
from .util import t

_Z_BITS = 16  # bits per dimension; 2 dims -> 32-bit Morton key


def _interleave_sql(xcol: str, ycol: str, idiv: str, bits: int = _Z_BITS) -> str:
    """Morton interleave as pure integer arithmetic.

    bit_i(x) contributes at position 2i, bit_i(y) at 2i+1:
    z = sum_i bit_i(x)*4^i + 2*sum_i bit_i(y)*4^i.
    `idiv` is the engine's integer-division operator ('div' for Spark
    SQL, '//' for DuckDB); the rest is engine-neutral."""
    xs = " + ".join(
        f"((({xcol}) {idiv} {1 << i}) % 2) * {4 ** i}" for i in range(bits)
    )
    ys = " + ".join(
        f"((({ycol}) {idiv} {1 << i}) % 2) * {2 * 4 ** i}" for i in range(bits)
    )
    return f"({xs}) + ({ys})"


# Normalization to the 16-bit grid. Floating ops are written identically
# on both engines (same IEEE double arithmetic => same result bits), the
# guard caps x == max onto the top cell, and a constant column
# (mx == mn => division by NULL) degrades to cell 0 for every row
# instead of NULL keys — the clustering contribution of a constant
# column is zero either way, but the key stays sortable.
_NORM = (
    "coalesce(least(cast(floor(({col} - {mn}) * {scale} "
    "/ nullif(({mx} - {mn}), 0.0)) as bigint), {top}), 0)"
)


def _norm_expr(col: str, mn: str, mx: str, bits: int = _Z_BITS) -> str:
    top = (1 << bits) - 1
    return _NORM.format(col=col, mn=mn, mx=mx, scale=float(top), top=top)


_ZKEY_ORACLE = f"""
WITH b AS (
    SELECT CAST(min(o_custkey) AS DOUBLE)    AS ck_mn,
           CAST(max(o_custkey) AS DOUBLE)    AS ck_mx,
           min(o_totalprice)                 AS tp_mn,
           max(o_totalprice)                 AS tp_mx
    FROM orders
),
norm AS (
    SELECT o_orderkey,
           {_norm_expr('o_custkey', 'ck_mn', 'ck_mx')}    AS xi,
           {_norm_expr('o_totalprice', 'tp_mn', 'tp_mx')} AS yi
    FROM orders CROSS JOIN b
)
SELECT o_orderkey, CAST(xi AS BIGINT) AS xi, CAST(yi AS BIGINT) AS yi,
       CAST({_interleave_sql('xi', 'yi', '//')} AS BIGINT) AS zkey
FROM norm
"""


@query("zorder_key", oracle=_ZKEY_ORACLE)
def zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) key over (o_custkey, o_totalprice): each column
    min-max normalized to a 16-bit grid cell, cells bit-interleaved into
    one 32-bit key. Sorting by this key is what zorder_layout does to
    the physical files; this query exposes (and oracles) the key
    arithmetic itself.

    Scale shape: min/max is ONE tiny aggregate broadcast back via
    crossJoin; normalization + interleave is a codegen'd scan-side
    projection (the generated expression is 32 integer terms — constant
    work per row, no shuffle)."""
    orders = t(spark, sf_dir, "orders")
    b = orders.agg(
        F.min("o_custkey").cast("double").alias("ck_mn"),
        F.max("o_custkey").cast("double").alias("ck_mx"),
        F.min("o_totalprice").alias("tp_mn"),
        F.max("o_totalprice").alias("tp_mx"),
    )
    norm = orders.crossJoin(F.broadcast(b)).select(
        "o_orderkey",
        F.expr(_norm_expr("o_custkey", "ck_mn", "ck_mx")).alias("xi"),
        F.expr(_norm_expr("o_totalprice", "tp_mn", "tp_mx")).alias("yi"),
    )
    return norm.select(
        "o_orderkey",
        F.col("xi").cast("long").alias("xi"),
        F.col("yi").cast("long").alias("yi"),
        F.expr(_interleave_sql("xi", "yi", "div")).cast("long").alias("zkey"),
    )


def zorder_layout(
    df: DataFrame,
    cols: list[str] | tuple[str, ...],
    path: str,
    n_files: int = 16,
) -> None:
    """Write `df` Z-order-clustered on 2..4 columns: compute the Morton
    key (each column min-max normalized to floor(32/k) bits, bits
    interleaved round-robin), range-repartition on it (contiguous key
    ranges per file => tight per-file min/max on EVERY clustered
    column), sort within partitions, write parquet WITHOUT the helper
    key.

    More dimensions buy pruning on more columns at the cost of per-
    column resolution (32/k bits each) — the standard Z-order trade; at
    4+ dims per-file ranges widen enough that most deployments stop at
    2-3.

    repartitionByRange samples the key distribution, so skew in the
    source columns still yields balanced files — unlike hash
    partitioning, which would scatter the curve and destroy locality.
    tests/test_layout.py measures the effect directly from parquet
    row-group stats: files prunable for a selective filter on EITHER
    column must far exceed the unclustered layout's."""
    cols = list(cols)
    if not 2 <= len(cols) <= 4:
        raise ValueError("zorder_layout clusters on 2..4 columns")
    bits = 32 // len(cols)
    bounds = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(c).cast("double").alias(f"__{c}_mn"),
                F.max(c).cast("double").alias(f"__{c}_mx"),
            )
        ]
    )
    keyed = df.crossJoin(F.broadcast(bounds))
    cells = []
    for c in cols:
        cell = f"__cell_{c}"
        keyed = keyed.withColumn(
            cell, F.expr(_norm_expr(c, f"__{c}_mn", f"__{c}_mx", bits))
        )
        cells.append(cell)
    # round-robin bit interleave: bit i of column j lands at i*k + j
    k = len(cols)
    terms = " + ".join(
        f"((({cell}) div {1 << i}) % 2) * {2 ** (i * k + j)}"
        for j, cell in enumerate(cells)
        for i in range(bits)
    )
    keyed = keyed.withColumn("__zkey", F.expr(terms).cast("long"))
    drop = [f"__{c}_mn" for c in cols] + [f"__{c}_mx" for c in cols] + cells
    (
        keyed.drop(*drop)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
