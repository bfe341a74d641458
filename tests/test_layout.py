"""Z-order layout: the clustered files must actually enable
multi-column data skipping, measured from real parquet footer stats."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from build_a_cloud_based_batch_etl_pipeline_spark.operators.layout import (
    zorder_key,
    zorder_layout,
)


def _prunable_fraction(path: str, col: str, lo: float, hi: float) -> float:
    """Fraction of row groups whose [min,max] for `col` does NOT
    intersect [lo,hi] — exactly what a min/max-pruning scan skips."""
    total = skipped = 0
    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.to_arrow_schema().get_field_index(col)
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            total += 1
            if st is not None and (st.max < lo or st.min > hi):
                skipped += 1
    assert total > 0
    return skipped / total


def test_zorder_layout_skips_on_both_columns(spark, tmp_path):
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    plain = str(tmp_path / "plain")
    zed = str(tmp_path / "zorder")
    # unclustered baseline with the same file count
    orders.repartition(16).write.mode("overwrite").parquet(plain)
    zorder_layout(orders, ["o_custkey", "o_totalprice"], zed, n_files=16)

    # identical data back
    assert spark.read.parquet(zed).count() == orders.count()
    assert (
        spark.read.parquet(zed).agg(F.sum("o_orderkey")).first()[0]
        == orders.agg(F.sum("o_orderkey")).first()[0]
    )

    ck_lo, ck_hi = 100.0, 200.0  # ~6% of the custkey domain
    tp_lo, tp_hi = 60_000.0, 100_000.0  # narrow price band
    for col, lo, hi in (
        ("o_custkey", ck_lo, ck_hi),
        ("o_totalprice", tp_lo, tp_hi),
    ):
        base = _prunable_fraction(plain, col, lo, hi)
        z = _prunable_fraction(zed, col, lo, hi)
        # hash-scattered files are never prunable on a narrow band;
        # z-ordered files mostly are — on BOTH dimensions at once
        assert base < 0.25, (col, base)
        assert z >= 0.5, (col, z)
        assert z > base + 0.3, (col, base, z)


def test_zorder_key_locality(spark):
    """Adjacent Morton keys must map to nearby (xi, yi) cells: the mean
    L1 cell distance between rows ADJACENT IN KEY ORDER has to be far
    below the mean distance between randomly ordered rows — that
    locality is the entire reason the layout prunes on both columns."""
    rows = (
        zorder_key(spark, "/root/testdata/sf0.001")
        .orderBy("zkey")
        .select("xi", "yi")
        .collect()
    )
    xs = [r.xi for r in rows]
    ys = [r.yi for r in rows]
    n = len(xs)
    adj = sum(
        abs(xs[i] - xs[i - 1]) + abs(ys[i] - ys[i - 1]) for i in range(1, n)
    ) / (n - 1)
    # key-order neighbours vs orderkey-order neighbours (arrival order)
    rows2 = (
        zorder_key(spark, "/root/testdata/sf0.001")
        .orderBy("o_orderkey")
        .select("xi", "yi")
        .collect()
    )
    xs2 = [r.xi for r in rows2]
    ys2 = [r.yi for r in rows2]
    rnd = sum(
        abs(xs2[i] - xs2[i - 1]) + abs(ys2[i] - ys2[i - 1]) for i in range(1, n)
    ) / (n - 1)
    assert adj * 4 < rnd, (adj, rnd)


def test_zorder_layout_three_dims(spark, tmp_path):
    """3-column clustering still prunes on every clustered column (at
    reduced 10-bit per-column resolution)."""
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    zed = str(tmp_path / "z3")
    plain = str(tmp_path / "p3")
    li.repartition(16).write.mode("overwrite").parquet(plain)
    zorder_layout(li, ["l_partkey", "l_suppkey", "l_extendedprice"], zed, n_files=16)
    assert spark.read.parquet(zed).count() == li.count()
    for col, lo, hi in (
        ("l_partkey", 100.0, 180.0),
        ("l_suppkey", 10.0, 16.0),
        ("l_extendedprice", 20_000.0, 24_000.0),
    ):
        base = _prunable_fraction(plain, col, lo, hi)
        z = _prunable_fraction(zed, col, lo, hi)
        assert z > base + 0.25, (col, base, z)


def test_zorder_maintain_incremental(spark, tmp_path):
    """Incremental maintenance contract: (1) a fresh table clusters
    every partition; (2) after appending into TWO partitions, only those
    two re-cluster — clean partitions' files are byte-identical (never
    read, never rewritten); (3) a third run is a full no-op;
    (4) deleting a marker (crash stand-in: swap succeeded, marker write
    lost) makes exactly that partition re-cluster and converge."""
    import os

    from build_a_cloud_based_batch_etl_pipeline_spark.operators.layout import (
        zorder_maintain,
    )
    from build_a_cloud_based_batch_etl_pipeline_spark.sinks import (
        write_parquet_table,
    )

    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    table = str(tmp_path / "orders_zt")
    write_parquet_table(
        orders, table, mode="overwrite", partition_by=["o_orderpriority"]
    )
    cols = ["o_custkey", "o_totalprice"]

    r1 = zorder_maintain(spark, table, cols, n_files=16)
    assert {a for _, a, _ in r1} == {"clustered"}
    assert len(r1) == 5
    total = orders.count()
    assert sum(n for _, _, n in r1) == total

    def files_of(part: str) -> set[tuple[str, int, float]]:
        d = os.path.join(table, part)
        return {
            (f, os.path.getsize(os.path.join(d, f)),
             os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d)
            if not f.startswith((".", "_"))
        }

    clean_parts = [
        p for p, _, _ in r1
        if not p.endswith(("1-URGENT", "2-HIGH"))
    ]
    before = {p: files_of(p) for p in clean_parts}

    late = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).limit(200)
    n_late = late.count()
    write_parquet_table(
        late, table, mode="append", partition_by=["o_orderpriority"]
    )
    r2 = {p: (a, n) for p, a, n in zorder_maintain(spark, table, cols, n_files=16)}
    dirty = {p for p, (a, _) in r2.items() if a == "clustered"}
    assert dirty == {
        "o_orderpriority=1-URGENT", "o_orderpriority=2-HIGH"
    }, r2
    for p in clean_parts:
        assert files_of(p) == before[p], f"clean partition {p} was touched"

    # all rows survive (original + appended), data intact per partition
    assert spark.read.parquet(table).count() == total + n_late

    r3 = zorder_maintain(spark, table, cols, n_files=16)
    assert {a for _, a, _ in r3} == {"skipped"}

    # crash stand-in: marker lost after a successful swap
    victim = os.path.join(table, "o_orderpriority=3-MEDIUM", "_ZORDER_OK")
    os.remove(victim)
    sum_before = spark.read.parquet(table).agg(F.sum("o_orderkey")).first()[0]
    r4 = {p: a for p, a, _ in zorder_maintain(spark, table, cols, n_files=16)}
    assert r4["o_orderpriority=3-MEDIUM"] == "clustered"
    assert sum(1 for a in r4.values() if a == "clustered") == 1
    assert (
        spark.read.parquet(table).agg(F.sum("o_orderkey")).first()[0]
        == sum_before
    )

    # the re-clustered dirty partition actually prunes on both columns
    part = os.path.join(table, "o_orderpriority=1-URGENT")
    assert _prunable_fraction(part, "o_custkey", 100.0, 200.0) >= 0.5


def test_zorder_maintain_dirty_set_matches_append_set_randomized(
    spark, tmp_path
):
    """Property: for ANY subset of partitions receiving appends, the
    maintenance pass re-clusters exactly that subset (derandomized
    sweep over several subsets — the scenario query pins one fixed
    case; this pins the general contract the marker fingerprints make)."""
    import os
    import random

    from build_a_cloud_based_batch_etl_pipeline_spark.operators.layout import (
        zorder_maintain,
    )
    from build_a_cloud_based_batch_etl_pipeline_spark.sinks import (
        write_parquet_table,
    )

    orders = spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet"
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    prios = [r[0] for r in orders.select("o_orderpriority").distinct().collect()]
    table = str(tmp_path / "zt")
    write_parquet_table(
        orders, table, mode="overwrite", partition_by=["o_orderpriority"]
    )
    zorder_maintain(spark, table, ["o_custkey", "o_totalprice"], n_files=2)

    rng = random.Random(7)
    for trial in range(3):
        dirty = set(rng.sample(prios, rng.randint(1, len(prios))))
        # deterministic batch: an unordered limit() may pick different
        # rows on each evaluation, and `touched` below re-evaluates it
        late = (
            orders.filter(F.col("o_orderpriority").isin(*dirty))
            .orderBy("o_orderkey")
            .limit(40)
        )
        write_parquet_table(
            late, table, mode="append", partition_by=["o_orderpriority"]
        )
        got = {
            p.split("=", 1)[1]: a
            for p, a, _ in zorder_maintain(
                spark, table, ["o_custkey", "o_totalprice"], n_files=2
            )
        }
        # limit(40) may draw rows from only SOME of the sampled
        # priorities — the true dirty set is what the append actually
        # touched
        touched = {
            r[0]
            for r in late.select("o_orderpriority").distinct().collect()
        }
        assert {p for p, a in got.items() if a == "clustered"} == touched, (
            trial, dirty, got,
        )
        # markers exist everywhere afterwards
        for p in prios:
            assert os.path.isfile(
                os.path.join(table, f"o_orderpriority={p}", "_ZORDER_OK")
            )


def test_zorder_maintain_heals_compaction(spark, tmp_path):
    """Composition with the compaction loop: compact_table rewrites a
    partition's files (hash-repartitioned — clustering destroyed), the
    fingerprint sees every rewritten partition as dirty, and the next
    maintenance pass restores the clustered layout. This is the steady
    state of a maintained table: ingest -> compact -> re-cluster."""
    import os

    from build_a_cloud_based_batch_etl_pipeline_spark.operators.layout import (
        zorder_maintain,
    )
    from build_a_cloud_based_batch_etl_pipeline_spark.sinks import (
        compact_table,
        write_parquet_table,
    )

    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    table = str(tmp_path / "zt")
    write_parquet_table(
        orders, table, mode="overwrite", partition_by=["o_orderpriority"]
    )
    cols = ["o_custkey", "o_totalprice"]
    zorder_maintain(spark, table, cols, n_files=16)
    part = os.path.join(table, "o_orderpriority=1-URGENT")
    clustered = _prunable_fraction(part, "o_custkey", 100.0, 200.0)
    assert clustered >= 0.5

    # compaction rewrites every partition (fewer, hash-ordered files)
    compact_table(spark, table, target_rows_per_file=400,
                  partition_col="o_orderpriority")
    # markers were dropped with the old files by the swap; all dirty
    r = {p: a for p, a, _ in zorder_maintain(spark, table, cols, n_files=16)}
    assert set(r.values()) == {"clustered"}, r
    assert spark.read.parquet(table).count() == orders.count()
    assert _prunable_fraction(part, "o_custkey", 100.0, 200.0) >= 0.5


def test_zorder_maintain_crash_points(spark, tmp_path):
    """Crash-anywhere convergence for the r12 swap scheme (ADVICE r11:
    the old in-root `<part>.zorder.staging` / `<part>.old` names
    contained '=', so partition discovery adopted crash artifacts as
    partitions — duplicate rows or a bogus partition value). Pins, for
    each crash point, BOTH properties: (a) a reader between the crash
    and the next maintenance pass sees exactly the real rows — helper
    dirs are invisible to discovery; (b) the next pass converges.

    Crash points: (1) staging fully written, swap never ran;
    (2) mid-swap — partition parked under .zorder_old/, live dir gone;
    (3) post-swap — parked copy not yet deleted; (4) legacy pre-r12
    artifacts (`<part>.old` with live missing, `<part>.zorder.staging`)
    are healed, not adopted."""
    import os
    import shutil

    from build_a_cloud_based_batch_etl_pipeline_spark.operators.layout import (
        zorder_layout,
        zorder_maintain,
    )
    from build_a_cloud_based_batch_etl_pipeline_spark.sinks import (
        write_parquet_table,
    )

    orders = spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet"
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    table = str(tmp_path / "zt")
    write_parquet_table(
        orders, table, mode="overwrite", partition_by=["o_orderpriority"]
    )
    cols = ["o_custkey", "o_totalprice"]
    zorder_maintain(spark, table, cols, n_files=2)
    total = orders.count()
    checksum = spark.read.parquet(table).agg(F.sum("o_orderkey")).first()[0]

    def assert_reader_clean():
        df = spark.read.parquet(table)
        assert df.count() == total
        assert df.agg(F.sum("o_orderkey")).first()[0] == checksum
        vals = {r[0] for r in df.select("o_orderpriority").distinct().collect()}
        assert not any(
            v.endswith((".old", ".staging", ".zorder.staging")) for v in vals
        ), vals

    victim = "o_orderpriority=1-URGENT"
    part = os.path.join(table, victim)

    # (1) crash BEFORE swap: staging written under .zorder_staging/
    staging = os.path.join(table, ".zorder_staging", victim)
    zorder_layout(spark.read.parquet(part), cols, staging, n_files=2)
    assert_reader_clean()  # no duplicate rows despite a full staged copy
    r = {p: a for p, a, _ in zorder_maintain(spark, table, cols, n_files=2)}
    assert not os.path.exists(os.path.join(table, ".zorder_staging", victim))
    assert_reader_clean()

    # (2) crash MID-swap: live dir parked, nothing swapped in
    parked = os.path.join(table, ".zorder_old", victim)
    os.makedirs(os.path.dirname(parked), exist_ok=True)
    os.rename(part, parked)
    df = spark.read.parquet(table)  # reader mid-crash: partition absent,
    assert df.count() < total       # never a bogus partition value
    r = {p: a for p, a, _ in zorder_maintain(spark, table, cols, n_files=2)}
    assert victim in r  # restored AND processed in the same pass
    assert_reader_clean()

    # (3) crash AFTER swap, parked copy not deleted
    shutil.copytree(part, parked)
    assert_reader_clean()  # parked copy invisible: no duplicates
    zorder_maintain(spark, table, cols, n_files=2)
    assert not os.path.exists(parked)
    assert_reader_clean()

    # (4) legacy pre-r12 artifacts are healed, not adopted
    legacy_old = part + ".old"
    os.rename(part, legacy_old)  # live missing + <part>.old => restore
    legacy_staging = os.path.join(table, "o_orderpriority=2-HIGH.zorder.staging")
    shutil.copytree(os.path.join(table, "o_orderpriority=2-HIGH"), legacy_staging)
    r = {p: a for p, a, _ in zorder_maintain(spark, table, cols, n_files=2)}
    assert not os.path.exists(legacy_old)
    assert not os.path.exists(legacy_staging)
    assert not any(p.endswith((".old", ".zorder.staging")) for p in r), r
    assert_reader_clean()
