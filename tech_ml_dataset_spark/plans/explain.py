"""Plan inspection: the engine's `.explain` surface as testable predicates.

The reference has no plan layer at all (SURVEY §4 — no optimizer, no IR);
on Spark the physical plan IS the scale contract, so we expose it as
first-class helpers. Used by tests/test_plans.py to pin the properties
that decide 100 TB viability (pushdown, broadcast, partial aggregation,
no accidental Python stages) and available to users for the same audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (physical) plan as text — what actually runs."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    """The Catalyst-optimized logical plan as text."""
    return df._jdf.queryExecution().optimizedPlan().toString()


def num_shuffles(df: DataFrame) -> int:
    """Count of exchange (shuffle) operators in the physical plan."""
    plan = physical_plan(df)
    return sum(line.lstrip("+- :").startswith("Exchange")
               for line in plan.splitlines())


def has_python_stage(df: DataFrame) -> bool:
    """True when the plan crosses into Python (UDF / Arrow eval stages) —
    the slow path that JVM-only operators must never take."""
    plan = physical_plan(df)
    return any(m in plan for m in
               ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                "FlatMapGroupsInPandas", "PythonMapInArrow"))


def pushed_filters(df: DataFrame) -> str:
    """The `PushedFilters: [...]` fragment of the scan, or '' when absent."""
    plan = physical_plan(df)
    if "PushedFilters" not in plan:
        return ""
    frag = plan.split("PushedFilters:", 1)[1]
    return frag.split("]", 1)[0] + "]"
