#!/usr/bin/env python
"""Plan inspector: print the physical-plan summary (and optionally the
full formatted plan) for any registered query — the iterate-on-the-plan
loop the engine was built with.

Usage: python tools/explain.py q1_pricing_summary [--full] [--sf DIR]
       python tools/explain.py --all          # summary table for all
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize(plan: str) -> dict[str, int]:
    return {
        "exchanges": plan.count("Exchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "hash_aggs": plan.count("HashAggregate"),
        "sorts": plan.count("Sort "),
        "bnlj": plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
        "codegen_spans": plan.count("WholeStageCodegen"),
        "python_stages": plan.count("MapInPandas")
        + plan.count("ArrowEvalPython")
        + plan.count("FlatMapGroupsInPandas"),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--full", action="store_true", help="print formatted plan")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from build_a_cloud_based_batch_etl_pipeline_spark.queries import load_all
    from build_a_cloud_based_batch_etl_pipeline_spark.session import get_spark

    registry = load_all()
    names = list(registry) if args.all else args.names
    if not names:
        print("give query names or --all; known:", ", ".join(sorted(registry)))
        return 1
    spark = get_spark("explain")
    for name in names:
        df = registry[name].fn(spark, args.sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        s = summarize(plan)
        print(f"{name:32s} " + " ".join(f"{k}={v}" for k, v in s.items() if v))
        if args.full:
            df.explain("formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
