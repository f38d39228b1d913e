"""Physical-plan inspection helpers.

Performance properties (filter pushdown, broadcast vs shuffle joins,
shuffle counts, codegen coverage) are asserted in tests, not just eyeballed
once — a regression that adds a shuffle or drops a pushdown fails CI the
same way a wrong result does. Helpers parse ``explain("formatted")`` output;
they intentionally read the *initial* plan (AQE may improve it further at
runtime, never worsen it).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans.

    Bracket-aware: an ``In(col, [a,b])`` entry contains a nested ']', so a
    naive ``\\[[^\\]]*\\]`` capture would truncate at it and DROP every
    filter after the In — failing assertions on perfectly good plans."""
    out: list[str] = []
    plan = formatted_plan(df)
    for m in re.finditer(r"PushedFilters: \[", plan):
        depth, i = 1, m.end()
        while i < len(plan) and depth > 0:
            if plan[i] == "[":
                depth += 1
            elif plan[i] == "]":
                depth -= 1
            i += 1
        body = plan[m.end() : i - 1] if depth == 0 else plan[m.end() :]
        # split on entry boundaries (after a closing paren), not every comma
        out.extend(s.strip() for s in re.split(r"(?<=[)\]]),", body) if s.strip())
    return out


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — the column-pruning witness."""
    return re.findall(r"ReadSchema: (\S+)", formatted_plan(df))


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges). Counts
    the formatted plan's per-node detail headers ("(3) Exchange"), which
    appear exactly once per node."""
    return len(re.findall(r"^\(\d+\) Exchange\b", formatted_plan(df), re.M))


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"^\(\d+\) BroadcastHashJoin", formatted_plan(df), re.M))


def has_cartesian(df: DataFrame) -> bool:
    p = formatted_plan(df)
    return "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans (zero means everything runs
    interpreted — a red flag for a hot path)."""
    return len(set(re.findall(r"codegen id : (\d+)", formatted_plan(df))))


def assert_pushed(df: DataFrame, *fragments: str) -> None:
    fl = " | ".join(pushed_filters(df))
    for frag in fragments:
        assert frag in fl, f"expected pushed filter containing {frag!r}, got: {fl}"


def assert_max_shuffles(df: DataFrame, n: int) -> None:
    got = shuffle_count(df)
    assert got <= n, f"plan has {got} shuffles, budget is {n}:\n{formatted_plan(df)}"
