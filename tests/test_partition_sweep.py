"""Partition-count sensitivity sweep for float-aggregate queries.

The r1 `agg_conditional` class of defect only surfaced on the DRIVER's
session: shuffle partition count changes the partial-aggregation
accumulation order, and a double sum sitting at a half-ulp rounding
boundary can flip its last rounded digit under one partitioning and not
another. This sweep re-runs every oracled query whose oracle carries a
float rounding (the `round(...)` call sites — the queries where the
r2/r4 rounding discipline is load-bearing) at sf0.001 under
spark.sql.shuffle.partitions in {1, 7} (the shared test session default
is 8, tools/check.py's sf0.01 sweep covers 32 and the vanilla 200), and
holds the DuckDB value compare green under every setting.
"""

from __future__ import annotations

import importlib.util
import pathlib

import pytest

_ROOT = pathlib.Path(__file__).resolve().parents[1]
_spec = importlib.util.spec_from_file_location("_check", _ROOT / "tools" / "check.py")
_check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_check)

SF = "/root/testdata/sf0.001"


def _float_query_names() -> list[str]:
    import __spark_entry__ as e

    return sorted(n for n, s in e.oracle_sql().items() if "round(" in s.lower())


@pytest.fixture(scope="module")
def duck():
    con = _check.duck_con(SF)
    yield con
    con.close()


@pytest.mark.parametrize("parts", [1, 7])
def test_float_aggs_stable_under_partitioning(spark, duck, parts):
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    names = _float_query_names()
    assert len(names) >= 60, "float-agg query census shrank unexpectedly"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        failures = []
        for name in names:
            sdf = qs[name](spark, SF).toPandas()
            ddf = duck.execute(osql[name]).fetchdf()
            problems = _check.compare(name, sdf, ddf)
            if problems:
                failures.append((name, problems))
        assert not failures, (
            f"{len(failures)} float-agg queries diverge from the oracle at "
            f"shuffle.partitions={parts}: {failures}"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
