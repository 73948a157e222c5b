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


def _let(value: Column, body) -> Column:
    """Let-binding for Catalyst expressions: evaluate ``value`` ONCE and
    pass it to ``body`` as a lambda variable, so every reference inside is
    a variable read instead of a re-evaluation of the full subtree.

    Implemented as ``transform(array(value), v -> body(v))[0]`` — one
    single-element array allocation per row. Load-bearing wherever an
    expensive subexpression (regex normalization, tokenization) is
    referenced many times inside one Column tree: higher-order-function
    expressions are CodegenFallback, and interpreted evaluation has no
    common-subexpression elimination, so an inlined subtree is re-run at
    EVERY reference — including once per ELEMENT when the reference sits
    inside another HOF's lambda body (the O(len²) char-shingle case,
    r11)."""
    return F.get(F.transform(F.array(value), body), 0)


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
    scan is already wide (the 100 TB case — many splits).

    Streaming-safe (r5): ``.rdd`` is illegal on a streaming DataFrame, so
    streaming inputs pass through unchanged (micro-batch parallelism is
    the source's concern — maxFilesPerTrigger / partition count).
    Plan-cheap (r5): for a plain file scan the partition count is derived
    from file sizes and the session's split config — no physical planning
    and no Python->JVM RDD conversion; ``.rdd.getNumPartitions()`` (which
    plans the query twice per call) is the fallback for non-scan plans
    (post-shuffle inputs are shuffle.partitions-wide and return early)."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if _scan_partition_estimate(df) >= target:
        return df
    return df.repartition(target, *key_cols) if key_cols \
        else df.repartition(target)


_SIZE_UNITS = {"": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10,
               "m": 1 << 20, "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30,
               "t": 1 << 40, "tb": 1 << 40}

# plan nodes that change row/partition structure above a scan — if any
# appears in the ANALYZED logical plan, file sizes say nothing about the
# DataFrame's actual partitioning and the estimate must not be used
_NON_SCAN_NODES = ("Repartition", "Coalesce", "Limit", "Sample", "Join",
                   "Aggregate", "Window", "Sort", "Distinct", "Union",
                   "Deduplicate", "MapInPandas", "FlatMapGroupsInPandas",
                   "Generate", "Offset")

# whole-file compression codecs Hadoop cannot split: one file = ONE scan
# partition no matter its size, so ceil(total/maxPartitionBytes) is NOT a
# lower bound (a 10*mpb .csv.gz scans as a single task). bz2 is splittable
# and columnar container files (.snappy.parquet, .zstd.orc) keep their
# container suffix last, so a plain suffix check is sufficient.
_NON_SPLITTABLE_SUFFIXES = (".gz", ".gzip", ".zst", ".zstd", ".lz4",
                            ".snappy", ".deflate", ".br")


def _parse_bytes(s: str) -> int | None:
    s = s.strip().lower()
    i = len(s)
    while i > 0 and not s[i - 1].isdigit():
        i -= 1
    num, unit = s[:i], s[i:].strip()
    if not num or unit not in _SIZE_UNITS:
        return None
    return int(num) * _SIZE_UNITS[unit]


def _scan_partition_estimate(df: DataFrame) -> int:
    """Partition count of ``df``, avoiding ``.rdd`` when the plan is a
    BARE file scan (projections/filters only — anything that reshapes
    partitioning above the scan disqualifies the estimate, r5 review:
    ``ensure_parallelism(df.coalesce(1))`` must not be fooled by wide
    source files). Spark packs file splits into at-most-maxPartitionBytes
    partitions, so ceil(total_size/maxPartitionBytes) is a LOWER bound on
    scan partitions (file COUNT is not — many small files pack into one
    partition): if even the lower bound clears the target, skip the
    repartition; any doubt — remote files, unparseable size conf, a
    non-scan plan node — falls back to the exact (but planning-
    triggering) ``.rdd.getNumPartitions()``."""
    try:
        files = df.inputFiles()
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        files, plan = [], None
    if files and plan is not None \
            and not any(n in plan for n in _NON_SCAN_NODES):
        import os
        from urllib.parse import urlparse
        spark = df.sparkSession
        mpb = None
        try:
            mpb = _parse_bytes(
                spark.conf.get("spark.sql.files.maxPartitionBytes"))
        except Exception:
            pass
        if mpb:
            total = 0
            local = True
            for f in files:
                p = urlparse(f)
                if p.scheme not in ("file", ""):
                    local = False
                    break
                if p.path.lower().endswith(_NON_SPLITTABLE_SUFFIXES):
                    # non-splittable codec: one partition per file however
                    # large, so the size-based lower bound is invalid —
                    # use the exact (planning) fallback below
                    local = False
                    break
                try:
                    total += os.path.getsize(p.path)
                except OSError:
                    local = False
                    break
            if local:
                est = -(-total // mpb)
                target = spark.sparkContext.defaultParallelism
                if est >= target:
                    return est
    return df.rdd.getNumPartitions()
