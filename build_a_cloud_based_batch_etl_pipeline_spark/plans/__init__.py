"""Plan inspection helpers: the engine's guardrails that the *physical*
plan is the one we designed for 100 TB, not merely one that returns
correct rows (tests/test_plans.py asserts these per headline query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Formatted physical plan (post-Catalyst, pre-AQE-finalization)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """True if at least one parquet scan carries pushed-down predicates."""
    plan = physical_plan(df)
    return "PushedFilters: [" in plan and not _pushed_filters_all_empty(plan)


def _pushed_filters_all_empty(plan: str) -> bool:
    return all(
        seg.startswith("]")
        for seg in (p.split("PushedFilters: [", 1)[1] for p in plan.split("\n") if "PushedFilters: [" in p)
    )


def scans_read_columns(df: DataFrame) -> list[str]:
    """ReadSchema column lists per parquet scan (column-pruning check)."""
    out = []
    for line in physical_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            out.append(line.split("ReadSchema:", 1)[1].strip())
    return out


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_cartesian_or_bnlj(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen regions (formatted plans tag
    member operators with '[codegen id : N]')."""
    import re

    ids = set(re.findall(r"\[codegen id : (\d+)\]", physical_plan(df)))
    return len(ids)


def count_shuffles(df: DataFrame) -> int:
    # formatted plans list each operator twice (tree + "(N) Op" details);
    # count only the numbered detail headers.
    import re

    return len(re.findall(r"^\(\d+\) Exchange", physical_plan(df), re.MULTILINE))


import re as _re

_ORDERED_ARG = _re.compile(r"\s(?:ASC|DESC) NULLS (?:FIRST|LAST)$")


def _split_top_level_args(s: str) -> list[str]:
    """Split the argument list that follows an opening paren into its
    top-level comma-separated pieces, stopping at the matching close.
    Nested parens (casts, functions, frames) stay inside one piece."""
    args: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in s:
        if ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            if depth == 0:
                args.append("".join(cur).strip())
                return args
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    args.append("".join(cur).strip())
    return args


def _wspec_is_global(line: str) -> bool:
    """True if any windowspecdefinition on the line has NO partition
    columns. Structural check (not a regex over the whole spec): a
    partitioned spec's FIRST top-level argument is a bare partition
    column, while a global spec's first argument is either the frame
    (`specifiedwindowframe(...)`) or an ordering expression, which
    always carries an `ASC|DESC NULLS FIRST|LAST` suffix — even when
    the ordered expression itself contains parens/commas
    (`cast(x#1 as double) ASC NULLS FIRST`)."""
    marker = "windowspecdefinition("
    idx = 0
    while True:
        j = line.find(marker, idx)
        if j < 0:
            return False
        args = _split_top_level_args(line[j + len(marker):])
        first = args[0] if args else ""
        if first.startswith("specifiedwindowframe") or _ORDERED_ARG.search(first):
            return True
        idx = j + len(marker)


def global_window_subtrees(df: DataFrame) -> list[tuple[str, list[str]]]:
    """(window_line, child_subtree_lines) for every Window node whose
    spec has NO partition columns — a global window funnels every row
    through one task, so it is only scale-safe over a bounded input.

    Detection: in the executed plan's tree string, a partitioned spec
    prints `windowspecdefinition(<part_col>, <order_col> ASC ...)` while
    a global one starts directly with an ordered column or the frame —
    `windowspecdefinition(<col> ASC NULLS ...` or
    `windowspecdefinition(specifiedwindowframe(...)`."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    out = []
    for i, ln in enumerate(lines):
        if "Window [" not in ln or not _wspec_is_global(ln):
            continue
        depth = len(ln) - len(ln.lstrip(" :+-"))
        sub = []
        for nxt in lines[i + 1 :]:
            if len(nxt) - len(nxt.lstrip(" :+-")) <= depth:
                break
            sub.append(nxt)
        out.append((ln, sub))
    return out
