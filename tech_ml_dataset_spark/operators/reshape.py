"""Reshaping operators: explode, melt/unpivot, pivot, padding.

Reference semantics: unroll-column (src/tech/v3/dataset_api.clj:1204),
columnwise-concat i.e. melt (dataset_api.clj:1126), transpose-by-key
(dataset_api.clj:1472), extend-with-empty (base.clj:1091),
row-mapcat (dataset_api.clj:946).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def unroll_column(df: DataFrame, colname: str, *, indexes: str | None = None) -> DataFrame:
    """``unroll-column`` (dataset_api.clj:1204): explode a list-valued column
    into one row per element, other columns duplicated. ``indexes`` names an
    optional position column (the reference's ``:indexes?`` option) —
    compiled to ``posexplode``. Null/empty lists drop the row, matching the
    reference (use explode_outer semantics via ``unroll_column_outer``)."""
    others = [c for c in df.columns if c != colname]
    if indexes is None:
        return df.withColumn(colname, F.explode(F.col(colname)))
    ex = df.select(*others, F.posexplode(F.col(colname)).alias(indexes, colname))
    return ex.select(*others, indexes, colname)


def unroll_column_outer(df: DataFrame, colname: str) -> DataFrame:
    """unroll keeping rows whose list is null/empty (element becomes null)."""
    return df.withColumn(colname, F.explode_outer(F.col(colname)))


def columnwise_concat(df: DataFrame, columns: Sequence[str], *,
                      colname: str = "column", value: str = "value") -> DataFrame:
    """``columnwise-concat`` / melt (dataset_api.clj:1126): unpivot the given
    columns into (name, value) pairs, keeping all other columns as ids.
    Spark's native ``unpivot`` — a zero-shuffle narrow transform."""
    ids = [c for c in df.columns if c not in set(columns)]
    return df.unpivot(ids, list(columns), colname, value)


def transpose_by_key(df: DataFrame, key_col: str, value_col: str, *,
                     group_by: Sequence[str] | None = None,
                     values: Sequence[str] | None = None,
                     agg: str = "first") -> DataFrame:
    """``transpose-by-key`` (dataset_api.clj:1472): rows of (key, value) ->
    one column per key. Compiled to ``groupBy().pivot()``.

    ``values`` pins the output columns (avoids the extra distinct-scan Spark
    otherwise runs to discover pivot values — ALWAYS pass it at scale).
    """
    gb = list(group_by) if group_by else [c for c in df.columns
                                          if c not in (key_col, value_col)]
    agg_fn = {"first": F.first, "sum": F.sum, "mean": F.avg, "max": F.max,
              "min": F.min, "count": F.count}[agg]
    piv = df.groupBy(*gb).pivot(key_col, list(values) if values else None)
    return piv.agg(agg_fn(F.col(value_col)))


def extend_with_empty(df: DataFrame, n: int) -> DataFrame:
    """``extend-with-empty`` (base.clj:1091): append n all-null rows."""
    spark = df.sparkSession
    empty = spark.range(n).select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in df.schema.fields])
    return df.unionByName(empty)


def row_mapcat(df: DataFrame, fn, schema, *, batch_size: int | None = None) -> DataFrame:
    """``row-mapcat`` (dataset_api.clj:946): row -> seq of rows. ``fn`` takes
    a row-dict and returns a list of row-dicts (possibly empty — row dropped).

    Spark-first: when the expansion is expressible as an array column,
    prefer ``unroll_column``/``explode``. This general form runs ``fn`` via
    ``mapInPandas`` (Arrow batches, parallel per partition) for arbitrary
    Python logic — the documented slow path (SURVEY §2.8).
    """
    def gen(batches):
        import pandas as pd
        for pdf in batches:
            out = []
            for rec in pdf.to_dict("records"):
                out.extend(fn(rec))
            yield pd.DataFrame(out) if out else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in schema.fields})

    return df.mapInPandas(gen, schema=schema)
