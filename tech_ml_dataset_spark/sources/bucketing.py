"""Bucketed tables: pre-shuffled storage for repeated co-located joins.

The reference is single-JVM, so its hash join always builds in memory
(src/tech/v3/dataset/join.clj:204-266) and "layout" is not a concept. At
100 TB the dominant join cost is the shuffle; Spark's bucketing writes data
pre-partitioned (and optionally pre-sorted) by the join key so that every
future join/aggregation on that key runs with ZERO exchange — the classic
fact-table strategy when the same key is joined query after query.

Contract: both sides bucketed by the same keys into the same bucket count →
SortMergeJoin with no Exchange (and no Sort when ``sort_by`` matches).
Verified by plan assertion in tests/test_plans.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, buckets: int,
                   keys: Sequence[str] | str, *,
                   sort_by: Sequence[str] | str | None = None,
                   path: str | None = None, mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (optionally sorted) parquet table.

    ``buckets`` should be sized so one bucket of the FACT table fits an
    executor's memory at the target scale (100 TB / buckets ≲ a few GB);
    both join sides must use the same ``buckets`` and ``keys``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort_by is not None:
        sort_by = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sort_by)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (a plain
    ``spark.read.parquet`` on the files would lose it and re-shuffle)."""
    return spark.table(table)
