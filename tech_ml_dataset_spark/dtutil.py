"""NTZ-safe datetime/epoch helpers.

Spark forbids direct numeric casts on TIMESTAMP_NTZ columns
(``DATATYPE_MISMATCH``: ``CAST(ntz AS BIGINT)``, ``unix_micros(ntz)``), while
plain TIMESTAMP supports them. Parquet written with naive timestamps (the
driver testdata) loads as NTZ, so every epoch-arithmetic site must route
through TIMESTAMP first. The engine pins ``spark.sql.session.timeZone=UTC``
(session.py), making the NTZ->TIMESTAMP reinterpretation exact and DST-free;
DuckDB's ``epoch()`` on the same naive values agrees.

Reference parity: the reference does datetime->epoch conversion inside its
column-math layer (src/tech/v3/dataset/math.clj:160, rolling.clj:281-301);
these helpers are the Spark expression equivalent.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame, functions as F


def warn_unpartitioned(op: str) -> None:
    """Ordered window operators without ``by`` build
    ``Window.partitionBy()`` — Spark funnels EVERY row through one task
    (it even logs WindowExec's own nag). Correct, but a silent
    single-task bottleneck at scale; surface it as a Python warning so
    the copy-pasted signature doesn't hide it."""
    warnings.warn(
        f"{op}: no 'by' partitioning given — the ordered window runs as a "
        "single task over the full dataset. Pass by=<series key column(s)> "
        "to keep it parallel at scale.",
        UserWarning, stacklevel=3)


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def epoch_micros(col: str | Column) -> Column:
    """Epoch microseconds from TIMESTAMP / TIMESTAMP_NTZ / DATE."""
    return F.unix_micros(_c(col).cast("timestamp"))


def epoch_seconds(col: str | Column) -> Column:
    """Epoch seconds (long, truncated) from TIMESTAMP / TIMESTAMP_NTZ / DATE."""
    return _c(col).cast("timestamp").cast("long")


def is_temporal(dtype: str) -> bool:
    return dtype.startswith("timestamp") or dtype == "date"


def axis_double(df: DataFrame, axis_col: str) -> Column:
    """A numeric (double) view of an axis column for distance/interpolation
    arithmetic: temporal axes become epoch micros, numerics cast directly.
    Scale-invariant consumers (lerp fractions, nearest-distance compares)
    don't care about the micros-vs-seconds unit."""
    dtype = dict(df.dtypes)[axis_col]
    if is_temporal(dtype):
        return epoch_micros(axis_col).cast("double")
    return F.col(axis_col).cast("double")


def from_epoch_micros(col: str | Column, target_dtype: str) -> Column:
    """Inverse of :func:`epoch_micros`: epoch-micros long -> ``target_dtype``
    (e.g. ``timestamp_ntz``, ``timestamp``, ``date``)."""
    return F.timestamp_micros(_c(col).cast("long")).cast(target_dtype)


def ensure_parallelism(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition up to one partition per core when the input has fewer.

    A stage cannot split an input partition mid-flight: a small parquet
    file (< maxPartitionBytes) scans as ONE partition, so CPU-heavy
    per-row work layered on it (tokenize/explode/hash) runs on one core
    no matter how wide the cluster. Call this BEFORE the heavy expression
    when the downstream cost is per-row compute, not I/O. No-op when the
    scan is already wide (the 100 TB case — many splits)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *key_cols) if key_cols \
        else df.repartition(target)
