"""Missing-value operators.

Reference semantics: tech.v3.dataset.missing — replace-missing strategies
:down :up :downup :updown :nearest :midpoint :lerp :abb :value
(src/tech/v3/dataset/missing.clj:242, strategy impls :77-207), plus
missing / drop-missing / select-missing (base.clj:428-443).

The reference stores missing in a per-column RoaringBitmap; Spark columns
are natively nullable, so SQL NULL is the missing bitmap. NaN is NOT null
in Spark — ``nan_as_missing`` converts, replicating the reference parser's
NaN->missing convention (io/column_parsers.clj:92-102).

Scale note: :down/:up fills are window functions over an explicit ordering.
Unpartitioned (no ``by``) they force a single total order; pass ``by`` (e.g.
the series/symbol key) to keep the window partitioned and parallel.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F
from pyspark.sql import types as T


def _float_cols(df: DataFrame, cols: Iterable[str]) -> list[str]:
    ft = {f.name for f in df.schema.fields if isinstance(f.dataType, (T.FloatType, T.DoubleType))}
    return [c for c in cols if c in ft]


def nan_as_missing(df: DataFrame, columns: Iterable[str] | None = None) -> DataFrame:
    """Convert NaN -> NULL on float columns (reference NaN-as-missing)."""
    cols = _float_cols(df, columns or df.columns)
    return df.withColumns({c: F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c))
                           for c in cols})


def missing_count(df: DataFrame) -> DataFrame:
    """``missing`` (base.clj:428): per-column null counts, single pass."""
    exprs = [F.sum(F.col(c).isNull().cast("long")).alias(c) for c in df.columns]
    return df.agg(*exprs)


def drop_missing(df: DataFrame, columns: Iterable[str] | None = None) -> DataFrame:
    """``drop-missing`` (base.clj:435): drop rows with any null in columns."""
    return df.na.drop(subset=list(columns) if columns else None)


def select_missing(df: DataFrame, columns: Iterable[str] | None = None) -> DataFrame:
    """``select-missing`` (base.clj:443): rows with at least one null."""
    cols = list(columns) if columns else df.columns
    cond = None
    for c in cols:
        clause = F.col(c).isNull()
        cond = clause if cond is None else (cond | clause)
    return df.filter(cond)


def _pool_join_fill(out: DataFrame, c: str, donors: list,
                    draw_idx: Column, dtype: str) -> DataFrame:
    """Fill ``c``'s NULLs from ``donors[draw_idx]`` via a BROADCAST JOIN
    on the 0-based draw index. Equivalent to
    ``element_at(array(*donors), draw_idx + 1)`` but without a pool-size
    literal expression (4096 literals ≈ ~1 s of analysis/codegen per
    fill and an effective cap on pool size). NULL draw indices (NULL
    keys in the deterministic arm) miss the join and leave the cell
    missing; float NaN donors survive (NaN is not NULL in coalesce)."""
    spark = out.sparkSession
    pool = spark.createDataFrame(
        [(j, v) for j, v in enumerate(donors)],
        schema=f"__abbi__ int, __abbv__ {dtype}")
    return (out.withColumn("__abbk__", draw_idx)
               .join(F.broadcast(pool),
                     F.col("__abbk__") == F.col("__abbi__"), "left")
               .withColumn(c, F.coalesce(F.col(c), F.col("__abbv__")))
               .drop("__abbk__", "__abbi__", "__abbv__"))


def replace_missing(df: DataFrame, columns: str | Sequence[str] | None = None,
                    strategy: str = "mid",
                    value=None, *, order_by: str | None = None,
                    by: str | Sequence[str] | None = None,
                    seed: int = 42, abb_sample_size: int = 4096,
                    key_cols: str | Sequence[str] | None = None) -> DataFrame:
    """``replace-missing`` (missing.clj:242). Strategies:

    :value    -> na.fill(value) (or per-column dict)
    :down     -> forward fill   = last non-null over preceding frame
    :up       -> backward fill  = first non-null over following frame
    :downup   -> :down then :up (leading nulls get first valid)
    :updown   -> :up then :down
    :nearest  -> closer of prev/next non-null by ``order_by`` distance;
                 exact ties go to PREV (reference positional law,
                 missing.clj:193-205 — first half of a gap copies the
                 left value; pinned by dataset_test.clj:1068-1104).
                 :mid is an alias (missing.clj:255) and the reference
                 DEFAULT strategy.
    :midpoint -> (prev + next)/2 — numeric/datetime columns only; other
                 dtypes fall back to :down (missing.clj:215-219 — the
                 reference downgrades :lerp/:midpoint on non-numeric
                 columns; pinned by regression-184's string columns)
    :lerp     -> linear interpolation between prev/next by axis position
                 (same non-numeric :down fallback)
    :mean/:min/:max -> fill with that column statistic (computed once,
                 joined back as a literal via cross-join of 1-row agg)
    :abb      -> approximate bayesian bootstrap (missing.clj ``:abb``): each
                 missing cell draws uniformly from a donor pool sampled from
                 the observed values. The pool is capped at
                 ``abb_sample_size`` and broadcast as a literal array —
                 at 100 TB the donor sample is the only collected state.
                 With ``key_cols`` the whole strategy becomes DETERMINISTIC
                 and engine-portable: the pool is the ``abb_sample_size``
                 rows ranked first by ``md5(key || ':' || seed)`` (an
                 unbiased uniform subsample, fixing the scan-prefix bias
                 of the default path; ALL columns' pools come from ONE
                 per-partition-top-k pass), and each missing row draws
                 index ``conv(md5(key || ':' || seed+i)[:8], 16)
                 % pool_size``. Identical fills on any engine and across
                 task retries (rand(seed) is partition-placement-dependent,
                 so a 100 TB retry refills DIFFERENT values — key_cols is
                 the production-safe arm), and replayable by a SQL oracle.
                 NULL keys neither donate nor fill (null-propagating
                 ``||`` law). Hash ties (duplicate keys, or composite
                 keys whose ':'-joined strings collide) break by the
                 key STRING — engine-independent — but when tied rows
                 carry DIFFERENT values the donated VALUE (not just its
                 provenance) still depends on collect order: full
                 determinism requires key_cols to be unique per row (the
                 values are unorderable in general, so no value tiebreak
                 is possible without changing the pool law). A key column
                 that is itself being filled hashes its PRE-fill value in
                 every draw (the key string is materialized before any
                 fill). Float NaN values remain donors (only genuine
                 NULLs are excluded, matching the default arm and the
                 SQL replay).

    For :down/:up/:downup/:updown a non-None ``value`` fills whatever the
    directional pass leaves missing (the reference's two-arg form,
    replace-missing-test: ``(replace-missing ds :all :down 555)``).

    ``columns=None`` means every column (the reference ``:all`` default).
    ``order_by`` names the axis column for ordered strategies (defaults to a
    scan-order index — fine for freshly-read data, see selection.py).
    ``by`` partitions the fill (per-series), keeping windows parallel.
    """
    if columns is None:
        skip = set(([order_by] if isinstance(order_by, str) else list(order_by or []))
                   + ([by] if isinstance(by, str) else list(by or [])))
        cols = [c for c in df.columns if c not in skip]
    else:
        cols = [columns] if isinstance(columns, str) else list(columns)
    if strategy == "mid":
        strategy = "nearest"

    if strategy == "value":
        if isinstance(value, dict):
            return df.na.fill(value)
        return df.na.fill(value, subset=cols)

    if strategy == "abb":
        out = df
        if key_cols is not None:
            # Deterministic arm: per column, the pool is the
            # ``abb_sample_size`` non-null rows that rank FIRST by
            # md5(key ':' seed) (an unbiased uniform subsample, vs the
            # scan-prefix default), kept in that md5-rank order; a
            # missing row draws pool index
            # conv(md5(key ':' seed+i)[:8], 16, 10) % pool_size. Both
            # halves replay verbatim in any SQL engine (md5 of the same
            # string is universal; conv-of-8-hex-chars fits in an int64),
            # and fills survive task retries unchanged.
            #
            # Key strings use NULL-PROPAGATING concatenation (`concat`,
            # the SQL `||` law — concat_ws would silently hash all
            # NULL-key rows identically and diverge from the oracle, r5
            # review): a NULL-key row neither donates to the pool nor
            # draws a fill, same as the SQL replay.
            #
            # ALL pools come from ONE job (r5 review — the per-column
            # TakeOrdered loop re-scanned the table #cols times): a
            # single mapInPandas pass keeps each partition's per-column
            # top-k by hash, and the driver merges the tiny
            # (#partitions x #cols x k) summaries. Exactly the same
            # pools as the per-column global TakeOrdered.
            keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
            parts = [F.col(keys[0]).cast("string")]
            for k in keys[1:]:
                parts += [F.lit(":"), F.col(k).cast("string")]
            kstr = F.concat(*parts) if len(parts) > 1 else parts[0]
            pool_rank = F.md5(F.concat(kstr, F.lit(":" + str(seed))))
            # the draw hash must read PRE-fill key values: when a key
            # column is itself being filled, the sequential withColumn
            # fills below would feed already-filled keys into later
            # columns' draw hashes and diverge from the documented
            # engine-replayable law (r5 advice) — materialize the key
            # string once on the original frame and draw from that
            kdraw = kstr
            kname = None
            if set(keys) & set(cols):
                kname = "__kstr__"
                i2 = 0
                while kname in df.columns:
                    kname, i2 = f"__kstr__{i2}", i2 + 1
                out = out.withColumn(kname, kstr)
                kdraw = F.col(kname)
            k_top = abb_sample_size
            import pandas as pd
            names = list(cols)
            reserved = {"__h__", "__k__", "__col__", "__nan__",
                        "__abbk__", "__abbi__", "__abbv__"} \
                | {f"__nn{i}__" for i in range(len(names))}
            clash = reserved & set(names)
            if clash:
                raise ValueError(f"replace_missing(abb, key_cols=...): "
                                 f"{sorted(clash)} are reserved summary "
                                 f"names; rename those columns first")
            summary_schema = ", ".join(
                ["__col__ string", "__h__ string", "__k__ string",
                 "__nan__ boolean"]
                + [f"`{c}` {dict(df.dtypes)[c]}" for c in names])
            # per-column Spark-side NULL flags: pandas folds NULL and
            # float NaN into one NaN, but the pool law (and the SQL
            # oracle's IS NOT NULL) keeps NaN values as donors —
            # filtering on notna() would silently drop them (r5 review)
            flags = [F.col(c).isNull().alias(f"__nn{i}__")
                     for i, c in enumerate(names)]

            def _tops(it):
                acc: dict[str, pd.DataFrame] = {}
                for pdf in it:
                    for i2, c in enumerate(names):
                        sub = pdf[~pdf[f"__nn{i2}__"]][["__h__", "__k__", c]]
                        if sub.empty:
                            continue
                        prev = acc.get(c)
                        both = pd.concat([prev, sub]) if prev is not None \
                            else sub
                        # (hash, key-string) order: engine-independent
                        # even for md5 ties from ':'-ambiguous composite
                        # keys (r5 review — hash-only stable sort broke
                        # ties by partition placement); never sorts by
                        # the VALUE, so unorderable dtypes are safe
                        acc[c] = both.sort_values(
                            ["__h__", "__k__"], kind="mergesort").head(k_top)
                for c, top in acc.items():
                    o = pd.DataFrame({"__col__": c, "__h__": top["__h__"],
                                      "__k__": top["__k__"]})
                    # Arrow's pandas return path folds float NaN into
                    # NULL; carry an explicit marker so NaN donors
                    # survive the summary channel (the Spark-side isNull
                    # flag already excluded genuine NULLs)
                    vals_c = top[c]
                    o["__nan__"] = [isinstance(v, float) and v != v
                                    for v in vals_c]
                    for c2 in names:
                        o[c2] = vals_c if c2 == c else None
                    yield o

            summaries = (df.select(pool_rank.alias("__h__"),
                                   kstr.alias("__k__"), *names, *flags)
                           .filter(F.col("__h__").isNotNull())
                           .mapInPandas(_tops, summary_schema)
                           .collect())
            pools: dict[str, list] = {c: [] for c in names}
            for r in summaries:
                v = float("nan") if r["__nan__"] else r[r["__col__"]]
                pools[r["__col__"]].append((r["__h__"], r["__k__"], v))
            # pool lookup is a BROADCAST JOIN on the draw index, not an
            # element_at over an F.array of pool-size literals: a 4096-
            # literal expression tree blows up analysis/codegen (the r4
            # "Catalyst literal maps don't scale" class — measured ~1 s
            # of fixed planning cost on this very query) and caps the
            # pool at whatever the expression budget tolerates, while a
            # (idx, value) broadcast table stays cheap at any pool size
            for i, c in enumerate(cols):
                donors = [v for _, _, v in
                          sorted(pools[c],
                                 key=lambda t: (t[0], t[1]))[:k_top]]
                if not donors:
                    continue
                draw = F.conv(F.substring(
                    F.md5(F.concat(kdraw, F.lit(":" + str(seed + i)))),
                    1, 8), 16, 10).cast("bigint")
                out = _pool_join_fill(out, c, donors,
                                      (draw % len(donors)).cast("int"),
                                      dict(df.dtypes)[c])
            return out.drop(kname) if kname else out
        # Default arm — donor pools for ALL columns from ONE bounded job:
        # LIMIT plans CollectLimit, which stops the scan after enough rows
        # — no full count() pass and no per-column jobs (the r1 shape ran
        # 1 + #cols jobs, two of them full scans). The pool is
        # scan-prefix-biased rather than uniform; the reference's :abb is
        # itself an *approximate* bootstrap, and the pool size cap
        # dominates any bias at 100 TB. A column that is entirely null
        # within the scanned prefix keeps its nulls (as before with an
        # empty pool).
        head = (df.select(*cols).na.drop(how="all")
                  .limit(4 * abb_sample_size).collect())
        dtypes = dict(df.dtypes)
        for i, c in enumerate(cols):
            donors = [r[c] for r in head if r[c] is not None][:abb_sample_size]
            if not donors:
                continue
            # broadcast-join pool lookup, same rationale as the
            # deterministic arm above (no pool-size literal array)
            out = _pool_join_fill(
                out, c, donors,
                F.floor(F.rand(seed + i) * len(donors)).cast("int"),
                dtypes[c])
        return out

    if strategy in ("mean", "min", "max"):
        fn = {"mean": F.avg, "min": F.min, "max": F.max}[strategy]
        stats = df.agg(*[fn(c).alias(c) for c in cols]).collect()[0].asDict()
        return df.na.fill({c: stats[c] for c in cols if stats[c] is not None})

    from .selection import IDX_COL, with_row_index
    drop_idx = False
    if order_by is None:
        df = with_row_index(df)
        order_by = IDX_COL
        drop_idx = True
    # order_by may be a list (tiebreak columns); the FIRST column is the axis
    # for distance-based strategies (:nearest/:lerp).
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    axis_col = order_cols[0]
    by_cols = [] if by is None else ([by] if isinstance(by, str) else list(by))
    if not by_cols:
        from ..dtutil import warn_unpartitioned
        warn_unpartitioned(f"replace_missing(strategy={strategy!r})")
    part = W.partitionBy(*by_cols) if by_cols else W.partitionBy()

    w_down = part.orderBy(*[F.col(c).asc() for c in order_cols]).rowsBetween(W.unboundedPreceding, 0)
    w_up = part.orderBy(*[F.col(c).asc() for c in order_cols]).rowsBetween(0, W.unboundedFollowing)

    from ..dtutil import axis_double, epoch_micros, from_epoch_micros, is_temporal
    axis_num = axis_double(df, axis_col)
    dtypes = dict(df.dtypes)

    def prev_next(c: str, val: Column) -> tuple[Column, Column, Column, Column]:
        prev_v = F.last(F.when(F.col(c).isNotNull(), val), ignorenulls=True).over(w_down)
        next_v = F.first(F.when(F.col(c).isNotNull(), val), ignorenulls=True).over(w_up)
        prev_x = F.last(F.when(F.col(c).isNotNull(), axis_num), ignorenulls=True).over(w_down)
        next_x = F.first(F.when(F.col(c).isNotNull(), axis_num), ignorenulls=True).over(w_up)
        return prev_v, next_v, prev_x, next_x

    _NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double")

    out = df
    for c in cols:
        # Per-column strategy downgrade (missing.clj:215-219): the
        # value-arithmetic strategies only apply to numeric/datetime
        # columns; everything else (strings, booleans, arrays...) falls
        # back to :down — trying (prev+next)/2 on a string column would
        # throw under ANSI and silently null under non-ANSI.
        dt = dtypes.get(c, "")
        col_strategy = strategy
        if strategy in ("midpoint", "lerp") and not (
                dt in _NUMERIC or dt.startswith("decimal")
                or is_temporal(dt)):
            col_strategy = "down"
        # Datetime fill columns (reference dataset_test.clj:899-908
        # replace-missing-ldt): :midpoint/:lerp interpolate LINEARLY IN
        # EPOCH TIME — value arithmetic runs in epoch-micros space and the
        # fill converts back to the column's temporal type. Pick-a-value
        # strategies (:down/:up/:nearest/...) never do value arithmetic,
        # so they use the raw column for any dtype.
        temporal_arith = (col_strategy in ("midpoint", "lerp")
                          and is_temporal(dt))
        val = epoch_micros(c).cast("double") if temporal_arith else F.col(c)
        prev_v, next_v, prev_x, next_x = prev_next(c, val)
        cur = F.col(c)
        if col_strategy == "down":
            fill = prev_v
        elif col_strategy == "up":
            fill = next_v
        elif col_strategy == "downup":
            fill = F.coalesce(prev_v, next_v)
        elif col_strategy == "updown":
            fill = F.coalesce(next_v, prev_v)
        elif col_strategy == "nearest":
            fill = F.when(prev_v.isNull(), next_v).when(next_v.isNull(), prev_v) \
                    .when((axis_num - prev_x) <= (next_x - axis_num), prev_v).otherwise(next_v)
        elif col_strategy == "midpoint":
            fill = F.coalesce((prev_v + next_v) / 2.0, prev_v, next_v)
        elif col_strategy == "lerp":
            # guard the degenerate prev_x == next_x case (axis ties straddling
            # the gap): 0/0 would be NaN; fall through to prev_v instead
            frac = F.when(next_x != prev_x, (axis_num - prev_x) / (next_x - prev_x))
            fill = F.coalesce(prev_v + (next_v - prev_v) * frac, prev_v, next_v)
        else:
            raise ValueError(f"unknown replace-missing strategy {strategy!r}")
        if temporal_arith:
            fill = from_epoch_micros(F.round(fill), dtypes[c])
        out = out.withColumn(c, F.when(cur.isNull(), fill).otherwise(cur))
    if value is not None and strategy in ("down", "up", "downup", "updown"):
        # the reference's two-arg direction form: residual missing (a fully
        # empty lead/tail) takes the provided value
        out = out.na.fill(value, subset=cols)
    return out.drop(IDX_COL) if drop_idx else out
