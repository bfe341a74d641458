"""Plan-shape regression freeze: every registered query's static plan
must not SHUFFLE MORE than the committed PLANS.md records for it.

The other plan tests assert hand-picked properties for a few queries;
this one mechanically freezes the exchange budget for the WHOLE
registry, so an innocent-looking refactor that sneaks an extra shuffle
into any of the 200+ queries fails CI instead of surviving until a
bench regression. Fewer exchanges than recorded is fine (an
improvement — regenerate PLANS.md to tighten the budget); more is a
regression. Compared at sf0.01, the same scale PLANS.md is generated
at, because join-strategy choices (and so exchange counts) are
data-size dependent."""

from __future__ import annotations

import re

from build_a_cloud_based_batch_etl_pipeline_spark import plans
from build_a_cloud_based_batch_etl_pipeline_spark.queries import load_all

SF_PLANS = "/root/testdata/sf0.01"


def _committed_budgets() -> dict[str, int]:
    budgets = {}
    for line in open("PLANS.md"):
        m = re.match(r"^(\w+)\s+.*?(?:exchanges=(\d+))?(?:\s|$)", line)
        if not m or " " not in line:
            continue
        name = line.split()[0]
        ex = re.search(r"exchanges=(\d+)", line)
        if re.match(r"^[a-z]\w+$", name):
            budgets[name] = int(ex.group(1)) if ex else 0
    return budgets


def test_no_query_exceeds_committed_shuffle_budget(spark):
    budgets = _committed_budgets()
    assert len(budgets) > 150, "PLANS.md parse failed"
    registry = load_all()
    # PLANS.md must stay in sync with the registry (regenerate via
    # `python tools/explain.py --all` after adding queries)
    missing = sorted(set(registry) - set(budgets))
    assert not missing, f"queries missing from PLANS.md: {missing}"
    over = []
    for name, spec in registry.items():
        df = spec.fn(spark, SF_PLANS)
        # identical counting to tools/explain.py summarize(): substring
        # count over executedPlan().toString()
        plan = df._jdf.queryExecution().executedPlan().toString()
        got = plan.count("Exchange")
        if got > budgets[name]:
            over.append((name, budgets[name], got))
    assert not over, f"shuffle budget exceeded (name, budget, got): {over}"
