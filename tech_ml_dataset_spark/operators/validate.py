"""Dataset validation: expectation checks as a single-pass report.

Beyond-reference (the reference validates ad hoc in tests); production
training pipelines gate ingest on exactly these checks. Every row-level
rule compiles to a conditional-sum aggregate, so ANY number of rules costs
ONE scan; uniqueness rules add one groupBy each (they are aggregations by
nature). Nothing collects but the per-rule violation counts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def not_null(*cols: str) -> tuple[str, Column]:
    """Violation when any of ``cols`` is NULL."""
    cond = None
    for c in cols:
        clause = F.col(c).isNull()
        cond = clause if cond is None else (cond | clause)
    return (f"not_null({','.join(cols)})", cond)


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    """Violation when value falls outside [lo, hi] (NULLs don't violate —
    pair with not_null to forbid them)."""
    c = F.col(col)
    return (f"in_range({col},{lo},{hi})", c.isNotNull() & ((c < lo) | (c > hi)))


def matches(col: str, pattern: str) -> tuple[str, Column]:
    """Violation when a non-null value does NOT match the regex."""
    c = F.col(col)
    return (f"matches({col})", c.isNotNull() & ~c.rlike(pattern))


def one_of(col: str, allowed: Sequence) -> tuple[str, Column]:
    """Violation when a non-null value is outside the allowed set."""
    c = F.col(col)
    arr = F.array(*[F.lit(v) for v in allowed])
    return (f"one_of({col})", c.isNotNull() & ~F.array_contains(arr, c))


def custom(name: str, violation: Column) -> tuple[str, Column]:
    """Arbitrary Column predicate that is TRUE on violating rows."""
    return (name, violation)


def unique(*cols: str) -> tuple[str, Sequence[str]]:
    """Violation count = rows beyond the first per duplicate key group."""
    return (f"unique({','.join(cols)})", list(cols))


def validate(df: DataFrame, rules: Sequence[tuple]) -> DataFrame:
    """Run expectation ``rules`` and return a report: one row per rule with
    ``rule``, ``n_violations``, ``passed``. Row-level rules fuse into one
    aggregate pass; each ``unique`` rule adds one groupBy job inside the
    same returned plan (union)."""
    row_rules = [(n, c) for (n, c) in rules if isinstance(c, Column)]
    uniq_rules = [(n, cols) for (n, cols) in rules if not isinstance(cols, Column)]

    parts = []
    if row_rules:
        # coalesce: sum over ZERO rows is NULL — an empty-but-clean input
        # must report 0 violations / passed, not a NULL that fails expect()
        aggs = [F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
                 .cast("long").alias(name)
                for name, cond in row_rules]
        one = df.agg(*aggs)
        structs = [F.struct(F.lit(name).alias("rule"),
                            F.col(f"`{name}`").alias("n_violations"))
                   for name, _ in row_rules]
        parts.append(one.select(F.inline(F.array(*structs))))
    for name, cols in uniq_rules:
        dup = (df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__n__"))
                 .agg(F.coalesce(F.sum(F.col("__n__") - 1), F.lit(0))
                       .cast("long").alias("n_violations"))
                 .select(F.lit(name).alias("rule"), "n_violations"))
        parts.append(dup)
    if not parts:
        raise ValueError("validate() needs at least one rule")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("n_violations") == 0)


def expect(df: DataFrame, rules: Sequence[tuple]) -> None:
    """Assert-style gate: raises ValueError listing every failed rule."""
    bad = [(r["rule"], r["n_violations"])
           for r in validate(df, rules).collect() if not r["passed"]]
    if bad:
        raise ValueError("validation failed: " +
                         "; ".join(f"{n} ({c} violations)" for n, c in bad))
