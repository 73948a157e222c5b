"""Structured Streaming operators (beyond-reference surface).

The reference is batch-only — its "streaming" is a lazy seq of datasets
consumed by the reductions namespace (src/tech/v3/dataset/reductions.clj:1-11).
This module supplies the real streaming surface the driver's north star
requires: tumbling/sliding/session windows, watermarks for late data,
stateful dedup. Every function works identically on a batch DataFrame and a
streaming DataFrame (Spark's unified API) — the batch form is what the
correctness oracle checks; the streaming form is the production path.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..operators.aggregate import resolve_reducer


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Late-data bound: state for windows older than max(event time) - delay
    is finalized and dropped. Batch DataFrames pass through unchanged."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df


def tumbling_window_agg(df: DataFrame, ts_col: str, duration: str,
                        aggs: Mapping[str, object], *,
                        by: Sequence[str] = (), watermark: str | None = None
                        ) -> DataFrame:
    """Non-overlapping event-time windows: groupBy(window(ts, duration)).
    Output exposes window_start/window_end plus the reducer columns."""
    if watermark:
        df = with_watermark(df, ts_col, watermark)
    win = F.window(F.col(ts_col), duration)
    exprs = [resolve_reducer(spec).alias(name) for name, spec in aggs.items()]
    out = df.groupBy(win.alias("__w__"), *by).agg(*exprs)
    return out.select(F.col("__w__.start").alias("window_start"),
                      F.col("__w__.end").alias("window_end"),
                      *by, *aggs.keys())


def sliding_window_agg(df: DataFrame, ts_col: str, duration: str, slide: str,
                       aggs: Mapping[str, object], *,
                       by: Sequence[str] = (), watermark: str | None = None
                       ) -> DataFrame:
    """Overlapping windows of ``duration`` advancing every ``slide``."""
    if watermark:
        df = with_watermark(df, ts_col, watermark)
    win = F.window(F.col(ts_col), duration, slide)
    exprs = [resolve_reducer(spec).alias(name) for name, spec in aggs.items()]
    out = df.groupBy(win.alias("__w__"), *by).agg(*exprs)
    return out.select(F.col("__w__.start").alias("window_start"),
                      F.col("__w__.end").alias("window_end"),
                      *by, *aggs.keys())


def session_window_agg(df: DataFrame, ts_col: str, gap: str,
                       aggs: Mapping[str, object], *,
                       by: Sequence[str] = (), watermark: str | None = None
                       ) -> DataFrame:
    """Session windows closed by ``gap`` inactivity (F.session_window).
    The streaming-native analog of the batch lag+cumsum sessionization."""
    if watermark:
        df = with_watermark(df, ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    exprs = [resolve_reducer(spec).alias(name) for name, spec in aggs.items()]
    out = df.groupBy(win.alias("__w__"), *by).agg(*exprs)
    return out.select(F.col("__w__.start").alias("window_start"),
                      F.col("__w__.end").alias("window_end"),
                      *by, *aggs.keys())


def stateful_dedup(df: DataFrame, keys: Sequence[str], *,
                   ts_col: str | None = None, watermark: str | None = None
                   ) -> DataFrame:
    """Streaming exact dedup on key columns. With a watermark the state is
    bounded (dropDuplicatesWithinWatermark); unbounded otherwise. On batch
    frames this degrades to dropDuplicates — same semantics, one pass."""
    if df.isStreaming and watermark and ts_col:
        df = df.withWatermark(ts_col, watermark)
        return df.dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))


def stateful_running_agg(df: DataFrame, keys: Sequence[str], value_col: str
                         ) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (SURVEY §7: the greenfield stateful surface): per-key running
    count/sum/mean maintained in GroupState ACROSS micro-batches, one
    output row per key per batch. This is the template for any
    user-defined streaming accumulator (the reference's reducer
    init/rfn/merge shape, kept alive between batches).

    State is a single (n, total) row per key — O(keys) memory, partitioned
    by key across executors like any shuffle.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_fields = [df.schema[k] for k in keys]
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in key_fields)
    out_schema += ", n bigint, total double, mean double"
    state_schema = "n bigint, total double"

    def fn(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            n += int(len(vals))
            total += float(vals.sum())
        state.update((n, total))
        row = dict(zip(keys, key))
        row.update({"n": n, "total": total, "mean": (total / n) if n else None})
        yield pd.DataFrame([row])

    return df.groupBy(*[F.col(k) for k in keys]).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout)


def read_stream(spark, path: str, schema, *, fmt: str = "parquet",
                max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over a directory (the scalable ingest pattern:
    writers land files, the stream picks them up incrementally)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def stream_static_join(stream: DataFrame, dim: DataFrame, on, *,
                       how: str = "inner", broadcast_dim: bool = True
                       ) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    static dimension. With ``broadcast_dim`` the dim ships to executors
    once — no per-batch shuffle of the stream (the standard star-schema
    enrichment shape at scale; the static side is re-read per trigger so
    slowly-changing dims stay fresh)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def stream_stream_join(left: DataFrame, right: DataFrame, on, *,
                       left_ts: str, right_ts: str,
                       left_delay: str, right_delay: str,
                       max_gap: str, how: str = "inner") -> DataFrame:
    """Stream-stream equi join with bounded state — the watermarked
    interval-join contract Structured Streaming requires.

    Both sides get event-time watermarks, and the join condition carries
    a TIME-RANGE predicate (|left.ts − right.ts| ≤ ``max_gap``) on top of
    the equi keys. The range bound is what lets Spark EVICT state: a
    buffered left row can only ever match right rows within the gap, so
    once the right watermark passes ``row.ts + max_gap`` the row is
    dropped from the join state. Without it, stream-stream state grows
    without bound — the canonical streaming-join OOM. Outer variants
    additionally emit the unmatched row when its watermark expires.

    ``on`` is a key name or [(left_key, right_key), ...]. The two
    timestamp columns must be distinct names (rename before joining —
    stream-stream joins can't disambiguate same-name event-time
    columns)."""
    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must be distinct column names")
    lw = left.withWatermark(left_ts, left_delay)
    rw = right.withWatermark(right_ts, right_delay)
    keys = [(on, on)] if isinstance(on, str) else list(on)
    cond = None
    for lk, rk in keys:
        c = lw[lk] == rw[rk]
        cond = c if cond is None else (cond & c)
    gap = F.expr(f"INTERVAL {max_gap}")
    cond = cond & (rw[right_ts] >= lw[left_ts] - gap) \
                & (rw[right_ts] <= lw[left_ts] + gap)
    return lw.join(rw, cond, how)


def foreach_batch_sink(df: DataFrame, batch_fn, *, checkpoint: str,
                       output_mode: str = "update"):
    """``foreachBatch`` sink: the exactly-once escape hatch for sinks Spark
    lacks a connector for. ``batch_fn(batch_df, batch_id)`` — idempotent on
    ``batch_id`` replays (checkpoint-tracked), each batch a normal batch
    DataFrame so any writer works. Returns the started query handle."""
    return (df.writeStream.foreachBatch(batch_fn)
              .outputMode(output_mode)
              .option("checkpointLocation", checkpoint)
              .trigger(availableNow=True).start())


def run_to_memory(df: DataFrame, name: str, *, output_mode: str = "complete"):
    """Execute a streaming frame into an in-memory table and process all
    available data once (tests / interactive use). Returns the query handle;
    results land in ``spark.table(name)``."""
    q = (df.writeStream.format("memory").queryName(name)
           .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination()
    return q


def streaming_upsert_sink(df: DataFrame, target_path: str, keys, *,
                          checkpoint: str, fmt: str = "parquet",
                          when_matched: str = "update",
                          dedupe_batch: bool = True,
                          sequence_by: str | None = None):
    """Continuously MERGE a change stream into a parquet target: each
    micro-batch runs :func:`~tech_ml_dataset_spark.sources.io.merge_upsert`
    (copy-on-write, crash-safe two-rename swap) via foreachBatch — the
    streaming CDC-apply pattern for targets without a Delta/Iceberg log.

    Within a batch, the LAST change per key wins, ordered by
    ``sequence_by`` — a CDC sequence number or event-time column. Pass it
    whenever batches can hold multiple changes per key: it is the only
    ordering that is stable across batch replays, which is what makes the
    exactly-once claim real (replays re-run the same MERGE with the same
    survivor). Without ``sequence_by`` the fallback orders by
    ``monotonically_increasing_id()``, which encodes (partition id,
    position), NOT arrival order — reliable only for single-partition
    batches (e.g. one file per trigger); multi-partition batches get an
    arbitrary, replay-unstable survivor, so a warning is raised.
    Exactly-once: batch replays re-run the same MERGE, which is
    idempotent for update/ignore/delete semantics. Copy-on-write
    rewrites the target per batch — the right shape for minutes-cadence
    upserts of dimension-sized targets; high-frequency trickle belongs in
    a real table format.

    Returns the started query handle (availableNow trigger)."""
    from ..sources.io import merge_upsert

    keys = [keys] if isinstance(keys, str) else list(keys)
    if dedupe_batch and sequence_by is None:
        import warnings
        warnings.warn(
            "streaming_upsert_sink: no sequence_by column — falling back "
            "to monotonically_increasing_id() for last-change-wins, which "
            "is only stable for single-partition micro-batches. Pass a CDC "
            "sequence number or event timestamp for a replay-stable "
            "survivor.", UserWarning, stacklevel=2)

    def _apply(batch_df: DataFrame, batch_id: int):
        upsert_batch_apply(batch_df, target_path, keys, fmt=fmt,
                           when_matched=when_matched,
                           dedupe_batch=dedupe_batch,
                           sequence_by=sequence_by)

    return foreach_batch_sink(df, _apply, checkpoint=checkpoint)


def upsert_batch_apply(batch_df: DataFrame, target_path: str, keys, *,
                       fmt: str = "parquet",
                       when_matched: str = "update",
                       dedupe_batch: bool = True,
                       sequence_by: str | None = None) -> None:
    """ONE micro-batch of the CDC upsert sink — the exact function
    :func:`streaming_upsert_sink`'s foreachBatch invokes, exposed so
    :func:`replay_upsert` can drive the identical code path at
    deterministic batch boundaries (the fingerprint-dedup two-arm
    pattern): within-batch last-change-wins by ``sequence_by``, then
    the crash-safe copy-on-write MERGE."""
    from ..sources.io import merge_upsert

    keys = [keys] if isinstance(keys, str) else list(keys)
    if not batch_df.take(1):
        return
    src = batch_df
    if dedupe_batch:
        from pyspark.sql import Window as W, functions as SF
        order = (SF.col(sequence_by).desc() if sequence_by
                 else SF.monotonically_increasing_id().desc())
        w = W.partitionBy(*keys).orderBy(order)
        src = (src.withColumn("__rn__", SF.row_number().over(w))
                  .filter(SF.col("__rn__") == 1).drop("__rn__"))
    merge_upsert(batch_df.sparkSession, target_path, src, keys,
                 fmt=fmt, when_matched=when_matched)


def replay_upsert(batches, target_path: str, keys, *,
                  fmt: str = "parquet", when_matched: str = "update",
                  sequence_by: str | None = None) -> None:
    """Deterministic batch-replay arm of :func:`streaming_upsert_sink`
    (the two-arm pattern that promoted the media-dedup sink): apply the
    SAME per-batch function over an EXPLICIT ordered list of batch
    DataFrames. The resulting target has a closed form a SQL oracle
    replays — for every key, the surviving row comes from the LAST
    batch containing the key (and within that batch, the max
    ``sequence_by``) — which hash-checks the sink's merge law
    end-to-end; the production streaming arm keeps its e2e pytest
    evidence (real readStream, replay idempotency)."""
    for b in batches:
        upsert_batch_apply(b, target_path, keys, fmt=fmt,
                           when_matched=when_matched,
                           sequence_by=sequence_by)



from contextlib import contextmanager


@contextmanager
def _dynamic_partition_overwrite(spark):
    """Scope spark.sql.sources.partitionOverwriteMode=dynamic to a block,
    restoring EXACTLY the prior state: when the session never set the key,
    conf.get returns None and a bare skip would leak 'dynamic'
    session-wide — a later unrelated overwrite+partitionBy write would
    then keep stale partitions instead of truncating the table."""
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        yield
    finally:
        if prev is not None:
            spark.conf.set(key, prev)
        else:
            spark.conf.unset(key)


def streaming_dedup_sink(df: DataFrame, corpus_path: str, *,
                         checkpoint: str, text_col: str = "text",
                         id_col: str = "doc_id",
                         exact_verify: bool = True):
    """Continuous crawl-ingest dedup: each micro-batch is deduplicated
    (a) within itself and (b) against everything already ACCEPTED into
    ``corpus_path``, then the surviving docs are appended — so the corpus
    stays exactly-deduped as the stream runs. The streaming face of
    :func:`~tech_ml_dataset_spark.functions.dedup.incremental_dedup`
    (same bloom-filter history probe: NEITHER side shuffles).

    Replay idempotency (the part foreachBatch does NOT give for free):
    accepted docs land under ``batch_id=N`` partition directories, written
    with dynamic partition OVERWRITE — and the history read EXCLUDES the
    current batch id (partition-pruned), so a replayed batch N never
    deduplicates against its own failed half-write and simply rewrites
    its directory. At-least-once delivery therefore converges to exactly
    the same corpus.

    Local-filesystem target only (same contract as ``merge_upsert`` —
    the corpus-existence probe and partition listing use os.path); an
    object-store corpus needs a real table format underneath.

    Cost model: each batch re-scans the accepted corpus to rebuild the
    bloom filter (one column, predicate-pruned — cheap relative to the
    crawl itself, and correct under replay because the corpus IS the
    state). Right for minutes-cadence ingest; a seconds-cadence trickle
    should persist and OR-merge the bloom bitmaps instead of rebuilding —
    at that point reach for the batch ``incremental_dedup`` API with a
    cached history frame.

    Returns the started query handle (availableNow trigger).

    The per-batch logic lives in :func:`text_dedup_batch_apply` (shared
    with the oracle-able :func:`replay_text_dedup` deterministic arm)."""
    from ..sources.io import _require_local_path
    corpus_path = _require_local_path(corpus_path, "streaming_dedup_sink")

    def _apply(batch_df: DataFrame, batch_id: int):
        text_dedup_batch_apply(batch_df, batch_id, corpus_path,
                               text_col=text_col, id_col=id_col,
                               exact_verify=exact_verify)

    return foreach_batch_sink(df, _apply, checkpoint=checkpoint)


def text_dedup_batch_apply(batch_df: DataFrame, batch_id: int,
                           corpus_path: str, *, text_col: str = "text",
                           id_col: str = "doc_id",
                           exact_verify: bool = True) -> None:
    """ONE micro-batch of the crawl-ingest text-dedup sink — the exact
    function :func:`streaming_dedup_sink`'s foreachBatch invokes,
    exposed for the :func:`replay_text_dedup` deterministic arm (the
    two-arm pattern shared with the fingerprint and upsert sinks)."""
    import os as _os

    from ..functions.dedup import exact_dedup, incremental_dedup

    if not batch_df.take(1):
        return
    spark = batch_df.sparkSession
    fresh = exact_dedup(batch_df, text_col, id_col)
    hist_dirs = ([f for f in _os.listdir(corpus_path)
                  if f.startswith("batch_id=")
                  and f != f"batch_id={batch_id}"]
                 if _os.path.isdir(corpus_path) else [])
    if hist_dirs:
        hist = (spark.read.parquet(corpus_path)
                     .filter(F.col("batch_id") != batch_id))
        kw = {}
        if exact_verify:
            # Bloom SIZING from the corpus parquet footers (r12): with
            # exact_verify the bloom is a pure prefilter — any m/k gives
            # the identical row set — so the default sizing count()
            # (a full normalize+scan of the history PER MICRO-BATCH,
            # inside build_bloom) is a scheduler round trip spent
            # reading back a number the footers already store. The
            # footer count over-counts NULL-text rows, which only makes
            # the bitmap marginally larger. exact_verify=False keeps
            # the exact count: there the fpp actually picks which rows
            # are (falsely) dropped, and sizing must stay bit-stable.
            from ..sources.io import parquet_row_count
            kw["expected_items"] = max(1, sum(
                parquet_row_count(_os.path.join(corpus_path, d))
                for d in hist_dirs))
        fresh = incremental_dedup(fresh, hist, text_col,
                                  exact_verify=exact_verify, **kw)
    out = fresh.withColumn("batch_id", F.lit(batch_id))
    with _dynamic_partition_overwrite(spark):
        (out.write.mode("overwrite").partitionBy("batch_id")
            .parquet(corpus_path))


def replay_text_dedup(batches, corpus_path: str, *,
                      text_col: str = "text", id_col: str = "doc_id",
                      exact_verify: bool = True) -> None:
    """Deterministic batch-replay arm of :func:`streaming_dedup_sink`:
    the same per-batch function over an explicit ordered batch list.
    With exact matching the accepted corpus has a closed form (each
    distinct text accepted exactly once — in its earliest batch, by the
    exact_dedup survivor within that batch), which a SQL oracle
    replays; the production streaming arm keeps its e2e pytest
    evidence (bloom-filter history probe, replay idempotency)."""
    for i, b in enumerate(batches):
        text_dedup_batch_apply(b, i, corpus_path, text_col=text_col,
                               id_col=id_col, exact_verify=exact_verify)


def fingerprint_dedup_batch_apply(batch_df: DataFrame, batch_id: int,
                                  corpus_path: str, *, fp_col: str,
                                  id_col: str = "doc_id",
                                  max_distance: int = 0,
                                  band_bits: int = 16) -> None:
    """ONE micro-batch of the media-fingerprint dedup sink — the exact
    function :func:`streaming_fingerprint_dedup_sink`'s foreachBatch
    invokes, exposed so :func:`replay_fingerprint_dedup` can drive the
    identical code path at deterministic batch boundaries (the two-arm
    production/replay pattern): dedup within the batch (greedy
    keep-lowest-id over the banded Hamming pairs), probe the accepted
    corpus' fingerprints excluding this batch_id, append survivors under
    ``batch_id=N`` with dynamic partition overwrite."""
    import os as _os

    from ..functions.dedup import hamming_dedup_pairs, hamming_pairs_between

    if not batch_df.take(1):
        return
    spark = batch_df.sparkSession
    fresh = batch_df
    dup_ids = (hamming_dedup_pairs(fresh, fp_col, id_col,
                                   max_distance=max_distance,
                                   band_bits=band_bits)
               .select(F.col("id_b").alias(id_col)).distinct())
    fresh = fresh.join(dup_ids, id_col, "left_anti")
    if _os.path.isdir(corpus_path) and any(
            f.startswith("batch_id=") for f in _os.listdir(corpus_path)):
        hist = (spark.read.parquet(corpus_path)
                     .filter(F.col("batch_id") != batch_id)
                     .select(id_col, fp_col))
        matched = (hamming_pairs_between(fresh, hist, fp_col,
                                         new_id=id_col, hist_id=id_col,
                                         max_distance=max_distance,
                                         band_bits=band_bits)
                   .select(F.col("new_id").alias(id_col)).distinct())
        fresh = fresh.join(matched, id_col, "left_anti")
    out = fresh.withColumn("batch_id", F.lit(batch_id))
    with _dynamic_partition_overwrite(spark):
        (out.write.mode("overwrite").partitionBy("batch_id")
            .parquet(corpus_path))


def replay_fingerprint_dedup(batches, corpus_path: str, *, fp_col: str,
                             id_col: str = "doc_id",
                             max_distance: int = 0,
                             band_bits: int = 16) -> None:
    """Deterministic batch-replay arm of
    :func:`streaming_fingerprint_dedup_sink` (the two-arm pattern that
    promoted the :abb fill and the reservoir sampler from rows-only):
    apply the SAME per-batch function the streaming sink's foreachBatch
    calls — :func:`fingerprint_dedup_batch_apply`, byte-for-byte the
    same dedup/probe/write logic — over an EXPLICIT ordered list of
    batch DataFrames, so micro-batch boundaries are fixed by the caller
    instead of source file-listing order. With ``max_distance=0`` the
    resulting corpus has a closed form a SQL oracle replays (each
    fingerprint accepted exactly once: in its earliest batch, by the
    lowest id within that batch), which hash-checks the sink's accept
    law end-to-end; the production streaming arm keeps its e2e pytest
    evidence (real readStream/foreachBatch, at-least-once replay)."""
    for i, b in enumerate(batches):
        fingerprint_dedup_batch_apply(b, i, corpus_path, fp_col=fp_col,
                                      id_col=id_col,
                                      max_distance=max_distance,
                                      band_bits=band_bits)


def streaming_fingerprint_dedup_sink(df: DataFrame, corpus_path: str, *,
                                     checkpoint: str, fp_col: str,
                                     id_col: str = "doc_id",
                                     max_distance: int = 0,
                                     band_bits: int = 16):
    """Continuous MEDIA-ingest near-dup — the 64-bit-fingerprint face of
    :func:`streaming_dedup_sink` for image dHash / audio / video frame
    hashes: the stream already carries ``fp_col`` (the fingerprint
    mapInPandas passes run fine on streaming frames, so decode happens
    once, upstream); each micro-batch is (a) deduped within itself
    (greedy keep-lowest-id over the banded Hamming pairs) and (b) probed
    against the accepted corpus' fingerprints via
    :func:`~tech_ml_dataset_spark.functions.dedup.hamming_pairs_between`
    — the history side is the already-written slim (id, fp) rows, so
    accepted MEDIA BYTES are never re-read, let alone re-decoded.

    Replay idempotency mirrors streaming_dedup_sink exactly: accepted
    rows land under ``batch_id=N`` with dynamic partition overwrite and
    the history read excludes the current batch id. Local-filesystem
    target only (same contract). Returns the started query handle.

    The per-batch logic lives in :func:`fingerprint_dedup_batch_apply`
    (shared with the oracle-able :func:`replay_fingerprint_dedup`
    deterministic arm)."""
    from ..sources.io import _require_local_path
    corpus_path = _require_local_path(corpus_path,
                                      "streaming_fingerprint_dedup_sink")

    def _apply(batch_df: DataFrame, batch_id: int):
        fingerprint_dedup_batch_apply(batch_df, batch_id, corpus_path,
                                      fp_col=fp_col, id_col=id_col,
                                      max_distance=max_distance,
                                      band_bits=band_bits)

    return foreach_batch_sink(df, _apply, checkpoint=checkpoint)


def streaming_neardup_sink(df: DataFrame, corpus_path: str, *,
                           checkpoint: str, text_col: str = "text",
                           id_col: str = "doc_id", k: int = 5,
                           n_hashes: int = 64, bands: int = 16,
                           threshold: float = 0.8, seed: int = 42,
                           hash_fn: str = "xxhash64"):
    """Continuous crawl ingest with NEAR-duplicate dedup — the MinHash
    face of :func:`streaming_dedup_sink`: each micro-batch is (a)
    minhash-deduped within itself and (b) probed against the persisted
    LSH index of everything already accepted (``<corpus_path>/index`` —
    the :func:`~tech_ml_dataset_spark.functions.dedup.minhash_index_write`
    layout plus a batch_id partition level); survivors land under
    ``<corpus_path>/docs/batch_id=N`` and their bands/shingles are
    appended to the index under the same batch_id.

    Replay idempotency mirrors streaming_dedup_sink: every table is
    batch_id-partitioned and written with dynamic partition overwrite,
    and the index read EXCLUDES the current batch id — a replayed batch
    never dedups against its own failed half-write and converges to the
    same corpus and index.

    Scale shape: the accepted corpus is shingled ONCE, when accepted —
    each batch reads only the slim (id, band, band_key) table for the
    candidate join plus the candidate rows' shingle sets for the exact
    verify; the 100 TB of accepted text is never re-scanned.

    Local-filesystem target only (directory probe uses os.path — the
    streaming_dedup_sink contract). Returns the started query handle
    (availableNow trigger)."""
    import os as _os

    from ..functions.dedup import (_shingle_and_band, _verified_cross_pairs,
                                   minhash_dedup)
    from ..sources.io import _require_local_path
    corpus_path = _require_local_path(corpus_path, "streaming_neardup_sink")
    params = dict(k=k, n_hashes=n_hashes, bands=bands, seed=seed,
                  hash_fn=hash_fn)

    def _apply(batch_df: DataFrame, batch_id: int):
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        fresh = minhash_dedup(batch_df, id_col, text_col,
                              threshold=threshold, **params)
        bands_dir = corpus_path + "/index/bands"
        if _os.path.isdir(bands_dir) and any(
                f.startswith("batch_id=") for f in _os.listdir(bands_dir)):
            band_h = (spark.read.parquet(bands_dir)
                           .filter(F.col("batch_id") != batch_id))
            sh_h = (spark.read.parquet(corpus_path + "/index/shingles")
                         .filter(F.col("batch_id") != batch_id))
            sh_n, band_n = _shingle_and_band(fresh, id_col, text_col,
                                             **params)
            matched = (_verified_cross_pairs(sh_n, band_n, sh_h, band_h,
                                             id_col, threshold)
                       .select(F.col("new_id").alias(id_col)).distinct())
            fresh = fresh.join(matched, id_col, "left_anti")
        sh, banded = _shingle_and_band(fresh, id_col, text_col, **params)
        with _dynamic_partition_overwrite(spark):
            for frame, sub in ((fresh, "/docs"), (banded, "/index/bands"),
                               (sh, "/index/shingles")):
                (frame.withColumn("batch_id", F.lit(batch_id))
                      .write.mode("overwrite").partitionBy("batch_id")
                      .parquet(corpus_path + sub))

    return foreach_batch_sink(df, _apply, checkpoint=checkpoint)
