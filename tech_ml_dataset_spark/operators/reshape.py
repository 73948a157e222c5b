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


def json_normalize(df: DataFrame, json_col: str, *, sep: str = ".",
                   schema: str | None = None,
                   sample_rows: int = 1000,
                   drop: bool = True) -> DataFrame:
    """Flatten a JSON string column into typed top-level columns (the
    ``pandas.json_normalize`` analog; reference users ingest mapseq
    blobs the same way): nested objects expand to ``parent<sep>child``
    columns, scalars keep their inferred types, arrays stay arrays.

    Schema discipline: pass ``schema`` (a DDL string) for production —
    at 100 TB the scan must not depend on what a sample happened to
    contain. Without it, the schema is INFERRED from ``sample_rows``
    non-null values on the driver via ``spark.read.json`` (a bounded,
    sampled convenience for exploration — fields absent from the sample
    are dropped, exactly pandas' failure mode, and a UserWarning says
    so). Parsing itself is one JVM-side ``from_json`` projection —
    scan-fused, no Python, no shuffle; malformed JSON yields NULLs in
    every flattened column (from_json's PERMISSIVE law)."""
    from pyspark.sql.types import StructType

    if schema is None:
        import warnings
        warnings.warn(
            "json_normalize: inferring the schema from a "
            f"{sample_rows}-row sample — fields absent from the sample "
            "are silently dropped; pass schema= in production",
            UserWarning, stacklevel=2)
        spark = df.sparkSession
        sample = [r[0] for r in df.select(json_col).dropna()
                  .limit(sample_rows).collect()]
        if not sample:
            raise ValueError(f"json_normalize: no non-null values in "
                             f"{json_col!r} to infer a schema from")
        inferred = spark.read.json(
            spark.createDataFrame([(s,) for s in sample],
                                  "v string").rdd.map(lambda r: r[0]))
        st = inferred.schema
        # spark.read.json surfaces corrupt sample entries as this column
        st = StructType([f for f in st.fields
                         if f.name != "_corrupt_record"])
    else:
        from pyspark.sql.types import _parse_datatype_string
        st = _parse_datatype_string(schema)

    parsed = df.withColumn("__j__", F.from_json(F.col(json_col), st))

    def leaves(struct, prefix, path):
        for f in struct.fields:
            name = prefix + f.name
            p = path + f"`{f.name}`"
            if isinstance(f.dataType, StructType):
                yield from leaves(f.dataType, name + sep, p + ".")
            else:
                yield name, p

    cols = [F.col(f"__j__.{p}").alias(n) for n, p in leaves(st, "", "")]
    # collision checks (r8, r7 ADVICE): the json column itself doesn't
    # count when drop=True removes it anyway, and two LEAVES flattening
    # to the same name (top-level field 'a.b' vs struct a.b with
    # sep='.') must also raise — duplicate output columns otherwise
    existing = set(df.columns)
    if drop:
        existing.discard(json_col)
    seen: set[str] = set()
    for n, _ in leaves(st, "", ""):
        if n in existing:
            raise ValueError(
                f"json_normalize: flattened column {n!r} collides with "
                f"an existing column; pass sep= or rename first")
        if n in seen:
            raise ValueError(
                f"json_normalize: two JSON leaves both flatten to {n!r} "
                f"(a literal {sep!r} in a field name vs nesting); pass "
                "a different sep=")
        seen.add(n)
    # exclude the json column from the projection up front when
    # drop=True — a leaf reusing its name must not be ambiguous with it
    base = [c for c in df.columns if not (drop and c == json_col)]
    return parsed.select(*base, *cols)
