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


_ZORDER_MARKER = "_ZORDER_OK"


def _partition_fingerprint(part_dir: str, fs=None) -> str:
    """Content fingerprint of a partition's DATA files: md5 over the
    sorted (name, size) list. Appends, compactions, and rewrites all
    change it; the marker file itself (underscore-prefixed, ignored by
    parquet readers) does not.

    With an fsio.Fs handle the listing goes through the Hadoop
    FileSystem API (any scheme); without one it falls back to os (local
    paths only — the direct-call form tests use). Both branches produce
    the identical (name, size) tuple list, so fingerprints written by
    one are verifiable by the other."""
    import hashlib

    if fs is not None:
        entries = sorted(
            (e.name, e.size)
            for e in fs.list_entries(part_dir)
            if not e.name.startswith((".", "_"))
        )
    else:
        import os

        entries = sorted(
            (f, os.path.getsize(os.path.join(part_dir, f)))
            for f in os.listdir(part_dir)
            if not f.startswith((".", "_"))
        )
    return hashlib.md5(repr(entries).encode()).hexdigest()


def _footer_row_count(fs, part_dir: str) -> int:
    """Row count from parquet footer metadata — no Spark job (a count()
    per re-clustered partition was ~1 job of pure overhead each).
    Footers are read via the parquet-hadoop reader (fsio.Fs), so the
    count works on any Hadoop scheme, not just local paths."""
    from ..fsio import child

    return sum(
        fs.parquet_row_count(child(part_dir, e.name))
        for e in fs.list_entries(part_dir)
        if e.name.endswith(".parquet") and not e.name.startswith((".", "_"))
    )


_ZORDER_STAGING_ROOT = ".zorder_staging"
_ZORDER_PARKED_ROOT = ".zorder_old"


def _zorder_recover(fs, path: str) -> int:
    """Crash recovery for zorder_maintain's per-partition swaps, run at
    the head of every maintenance pass. Returns #partitions restored.
    All filesystem traffic goes through the Hadoop FileSystem handle
    `fs` (fsio.Fs), so recovery runs identically on `file:` and
    object-store URIs (VERDICT r12 item 1).

    Both helper locations are dot-prefixed, so Spark partition discovery
    and parquet readers never see them (ADVICE r11: the old scheme's
    `<part>.zorder.staging` / `<part>.old` sat in the table root WITH an
    '=' in the name — a crash exposed duplicates or a bogus partition
    value to readers, and a mid-swap crash left the partition only under
    `<part>.old`, which discovery then adopted as a wrong value). Rules:

    - `.zorder_old/<entry>` with the live partition MISSING is a
      mid-swap crash: the parked dir IS the data — restore it.
    - `.zorder_old/<entry>` with the live partition present is post-swap
      debris (crash before the final delete) — sweep it.
    - `.zorder_staging/` is ALWAYS discardable: data still lives in the
      original partition (crash before the swap) or was already swapped
      in (the swap consumes the staging dir by rename).
    - legacy in-root `<part>.old` / `<part>.zorder.staging` artifacts
      from the pre-r12 scheme are healed the same way (restore-if-
      missing / sweep), so tables written by the old code converge too.
    """
    from ..fsio import child

    restored = 0
    parked_root = child(path, _ZORDER_PARKED_ROOT)
    if fs.is_dir(parked_root):
        for entry in fs.listdir(parked_root):
            live = child(path, entry)
            parked = child(parked_root, entry)
            if fs.exists(live):
                fs.delete(parked)
            else:
                fs.rename(parked, live)
                restored += 1
    fs.delete(child(path, _ZORDER_STAGING_ROOT))
    for entry in fs.listdir(path):
        full = child(path, entry)
        if entry.endswith(".zorder.staging"):
            fs.delete(full)
        elif entry.endswith(".old") and "=" in entry:
            base = child(path, entry[: -len(".old")])
            if fs.exists(base):
                fs.delete(full)
            else:
                fs.rename(full, base)
                restored += 1
    return restored


def zorder_maintain(
    spark: SparkSession,
    path: str,
    cols: list[str] | tuple[str, ...],
    n_files: int = 4,
    only: set[str] | None = None,
) -> list[tuple[str, str, int]]:
    """Incremental Z-order maintenance over a hive-partitioned table:
    re-cluster ONLY dirty partitions (VERDICT r10 item 6's second
    candidate — the OPTIMIZE-ZORDER maintenance loop a lakehouse runs,
    on plain parquet).

    A partition is CLEAN when its `_ZORDER_OK` marker holds the current
    fingerprint of its data files (written after the last clustering);
    any append/compaction/rewrite since then changes the fingerprint and
    the partition is re-clustered with zorder_layout + atomic swap.
    Staging lands under `<table>/.zorder_staging/<entry>` and the old
    partition parks under `<table>/.zorder_old/<entry>` — dot-prefixed
    names partition discovery IGNORES, so a racing or post-crash reader
    never sees duplicate rows or a bogus partition value (ADVICE r11).
    `_zorder_recover` at the head of every pass restores a mid-swap
    parked partition and sweeps staging debris; the marker lands AFTER
    the swap, so a crash anywhere leaves the partition dirty and the
    next run converges idempotently (crash-point sweep pinned in
    tests/test_layout.py::test_zorder_maintain_crash_points).

    Returns [(partition_dir_name, action, n_rows)] per partition, action
    in {'clustered', 'skipped'}.

    only: optional set of partition directory names (`col=value`) to
    restrict the pass to — the streaming composition
    (ingest_stream.incremental_load_clustered) passes the partitions
    the just-committed micro-batch touched, so per-epoch maintenance
    cost is O(touched), not O(partitions-listed). Crash recovery still
    sweeps the WHOLE table first: a crash in an earlier epoch may have
    parked a partition the current batch does not touch, and leaving it
    parked would hide its rows from readers.

    Scale shape: maintenance cost is proportional to DIRTY data only —
    the steady-state win at 100 TB, where a daily ingest dirties a few
    date partitions of a thousand. Partition discovery is one directory
    listing; each re-cluster is one bounded partition-sized job (the
    zorder_layout range-repartition samples keys, so skewed appends
    still yield balanced files). Clean partitions are never read. Every
    filesystem operation (listing, marker read/write, footer counts,
    staging/park renames) goes through the Hadoop FileSystem API
    (fsio.Fs) — the same handles sinks.swap_dir uses — so the loop runs
    unchanged against object-store table URIs (VERDICT r12 item 1).
    Reference: no layout control at all — BigQuery manages physical
    layout (src/load/main.py:40, SURVEY.md §4.1)."""
    from ..fsio import Fs, child
    from ..sinks import swap_dir

    fs = Fs(spark, path)
    _zorder_recover(fs, path)
    report: list[tuple[str, str, int]] = []
    for e in fs.list_entries(path):
        entry = e.name
        part_dir = child(path, entry)
        if (
            not e.is_dir
            or "=" not in entry
            or entry.startswith((".", "_"))
            or entry.endswith((".old", ".zorder.staging"))
        ):
            continue
        if only is not None and entry not in only:
            continue
        marker = child(part_dir, _ZORDER_MARKER)
        fp = _partition_fingerprint(part_dir, fs)
        stored = None
        if fs.is_file(marker):
            stored = fs.read_text(marker).strip()
        if stored == fp:
            report.append((entry, "skipped", -1))
            continue
        df = spark.read.parquet(part_dir)
        staging = child(path, _ZORDER_STAGING_ROOT, entry)
        zorder_layout(df, cols, staging, n_files=n_files)
        swap_dir(
            spark,
            staging,
            part_dir,
            park=child(path, _ZORDER_PARKED_ROOT, entry),
        )
        fs.write_text(
            child(part_dir, _ZORDER_MARKER),
            _partition_fingerprint(part_dir, fs) + "\n",
        )
        report.append((entry, "clustered", _footer_row_count(fs, part_dir)))
    return report


@query("layout_zorder_maintain")
def layout_zorder_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental Z-order maintenance, end to end (rows-only: the
    result reports filesystem clustering ACTIONS, which SQL cannot
    express; dirty-only selectivity, idempotent convergence, crash
    recovery, and the pruning win are pinned in tests/test_layout.py):
    stage orders as a hive-partitioned table (by o_orderpriority),
    cluster it, append a late batch into exactly TWO partitions, then
    run maintenance again — only those two partitions re-cluster, the
    other three report 'skipped'. Returns (partition, action, n_rows)
    for the incremental pass; n_rows is -1 for skipped partitions
    (never read — reading them to count would defeat the point)."""
    import shutil
    import tempfile

    from ..sinks import write_parquet_table

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    workdir = tempfile.mkdtemp(prefix="zorder_maintain_")
    try:
        table = f"{workdir}/orders_zt"
        write_parquet_table(
            orders, table, mode="overwrite", partition_by=["o_orderpriority"]
        )
        zorder_maintain(spark, table, ["o_custkey", "o_totalprice"])
        # orderBy before limit: an unordered limit(200) is plan/
        # partitioning dependent, so the per-partition row counts (and
        # in the extreme the dirty set) could vary under perturb
        # settings (ADVICE r11).
        late = (
            orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
            .orderBy("o_orderkey")
            .limit(200)
        )
        write_parquet_table(
            late, table, mode="append", partition_by=["o_orderpriority"]
        )
        report = zorder_maintain(spark, table, ["o_custkey", "o_totalprice"])
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(
        sorted(report), "partition string, action string, n_rows long"
    )
