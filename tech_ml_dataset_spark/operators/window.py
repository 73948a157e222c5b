"""Rolling / expanding windows and analytic functions.

Reference semantics: tech.v3.dataset.rolling — fixed windows with
:relative-window-position :left/:center/:right and :edge-mode :clamp/:zero
(src/tech/v3/dataset/rolling.clj:116-304), variable (value-range) windows
(rolling.clj:281-301), expanding/cumulative (rolling.clj:307-314), reducers
(rolling.clj:17-73).

The reference windows over PHYSICAL row order; on Spark every window takes
an explicit ``order_by`` axis plus optional ``by`` partition keys. Without
``by`` the window is a single total order — correct but serial; real
pipelines should always pass the series key.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window as W, WindowSpec, functions as F

from ..dtutil import warn_unpartitioned

# reducer-name -> window aggregate (rolling.clj:17-73)
_WIN_REDUCERS: dict[str, Callable[[Column], Column]] = {
    "mean": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "variance": F.var_samp,
    "standard-deviation": F.stddev_samp,
    "first": lambda c: F.first(c, ignorenulls=False),
    "last": lambda c: F.last(c, ignorenulls=False),
    "count": F.count,
}


def _frame(window_size: int, position: str) -> tuple[int, int]:
    """Fixed-window frame offsets for :left/:center/:right
    (rolling.clj window-range machinery :76-113)."""
    if position == "left":
        return (-(window_size - 1), 0)
    if position == "right":
        return (0, window_size - 1)
    # center: matches the reference's split (earlier half before, rest after)
    lo = -((window_size - 1) // 2)
    hi = window_size - 1 + lo
    return (lo, hi)


def _base_window(order_by, by) -> WindowSpec:
    by_cols = [] if by is None else ([by] if isinstance(by, str) else list(by))
    if not by_cols:
        warn_unpartitioned("rolling/expanding window")
    order = [order_by] if isinstance(order_by, (str, Column)) else list(order_by)
    order = [F.col(c) if isinstance(c, str) else c for c in order]
    return (W.partitionBy(*by_cols) if by_cols else W.partitionBy()).orderBy(*order)


#: built-in TWO-column frame reducers (reference multi-column reducers,
#: rolling.clj:102-111 — a reducer fn over k window readers). Spark's
#: declarative aggregates work directly as window functions, so rolling
#: correlation/covariance stay JVM-side with zero extra machinery.
_MULTI_WIN_REDUCERS = {
    "corr": F.corr,
    "covariance": F.covar_samp,
    "covariance-pop": F.covar_pop,
}


class FrameReducer:
    """Aggregation handle over one window frame, for CUSTOM multi-column
    reducers (rolling.clj:102-111,200-216): the reducer callable receives
    this handle plus one Column per source and composes any expression
    from frame aggregates, e.g. rolling beta::

        def beta(w, x, y):
            cov = w.mean(x * y) - w.mean(x) * w.mean(y)
            return cov / w.var_pop(x)

        rolling(df, "ts", {"beta": (beta, ["mkt", "asset"])}, window_size=20)

    Every method aggregates an arbitrary expression over the SAME frame,
    so a k-column reducer is k× window aggregates inside one WindowExec —
    no shuffle multiplication."""

    def __init__(self, wspec: WindowSpec):
        self._w = wspec

    def _agg(self, fn, c):
        return fn(c if isinstance(c, Column) else F.col(c)).over(self._w)

    def sum(self, c): return self._agg(F.sum, c)
    def mean(self, c): return self._agg(F.avg, c)
    def count(self, c): return self._agg(F.count, c)
    def min(self, c): return self._agg(F.min, c)
    def max(self, c): return self._agg(F.max, c)
    def var_samp(self, c): return self._agg(F.var_samp, c)
    def var_pop(self, c): return self._agg(F.var_pop, c)
    def std_samp(self, c): return self._agg(F.stddev_samp, c)
    def std_pop(self, c): return self._agg(F.stddev_pop, c)
    def first(self, c): return self._agg(lambda x: F.first(x, ignorenulls=True), c)
    def last(self, c): return self._agg(lambda x: F.last(x, ignorenulls=True), c)


def _spec_expr(spec: tuple, w: WindowSpec) -> Column:
    """One rolling-spec entry -> Column. Forms:
    ``(reducer_name, src)`` single-column built-in;
    ``("nth", src, k)`` k-th value inside the frame (rolling.clj:57);
    ``(reducer_name, [src1, src2])`` two-column built-in (corr/covariance);
    ``(callable, [src...])`` custom — callable(FrameReducer, *cols)."""
    if len(spec) == 3 and spec[0] == "nth":
        _red, src, k = spec
        return F.nth_value(F.col(src), int(k) + 1).over(w)  # 0-based like rdr
    red, src = spec
    if callable(red) and not isinstance(red, str):
        srcs = [src] if isinstance(src, (str, Column)) else list(src)
        cols = [F.col(s) if isinstance(s, str) else s for s in srcs]
        return red(FrameReducer(w), *cols)
    if isinstance(src, (list, tuple)):
        return _MULTI_WIN_REDUCERS[red](*[F.col(s) for s in src]).over(w)
    return _WIN_REDUCERS[red](F.col(src)).over(w)


def rolling(df: DataFrame, order_by, specs: Mapping[str, tuple], *,
            window_size: int, by=None, position: str = "right",
            edge_mode: str = "shrink") -> DataFrame:
    """Fixed-size rolling windows (rolling.clj:116-304).

    ``specs``: {out_col: spec} where spec is any :func:`_spec_expr` form —
    ``(name, src)``, ``("nth", src, k)``, ``(name, [x, y])`` (corr /
    covariance), or ``(callable, [srcs])`` with a :class:`FrameReducer`.
    ``position`` ∈ left|center|right. ``edge_mode``:
      "shrink" — Spark-native: frames truncate at partition edges (this is
                 what SQL gives for free);
      "clamp"  — reference :clamp (rolling.clj:130-133): out-of-range
                 positions are clamped to the first/last row, i.e. edge
                 windows re-count the boundary value. Emulated by padding
                 the aggregate with k*first/last values via arithmetic only
                 for sum/mean/count; min/max are unaffected by clamping
                 (boundary value is already in frame).
    """
    lo, hi = _frame(window_size, position)
    w = _base_window(order_by, by).rowsBetween(lo, hi)
    out = df
    if edge_mode == "shrink" or edge_mode == "zero":
        for name, spec in specs.items():
            out = out.withColumn(name, _spec_expr(spec, w))
        return out

    # clamp: compute the shortfall (how many positions fell off each edge)
    full = _base_window(order_by, by)
    w_all = full.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    rn = F.row_number().over(full)
    total = F.count(F.lit(1)).over(w_all)
    # positions requested before row 1 / after row N
    miss_lo = F.greatest(F.lit(0), F.lit(-lo) - (rn - 1))
    miss_hi = F.greatest(F.lit(0), (rn + hi) - total)

    for name, (red, src) in specs.items():
        tmp = out.withColumn("__src__", F.col(src))
        base_cnt = F.count(F.col("__src__")).over(
            _base_window(order_by, by).rowsBetween(lo, hi))
        base_sum = F.sum(F.col("__src__")).over(
            _base_window(order_by, by).rowsBetween(lo, hi))
        fv = F.first(F.col("__src__")).over(w_all)
        lv = F.last(F.col("__src__")).over(w_all)
        pad_sum = miss_lo * fv + miss_hi * lv
        pad_cnt = miss_lo + miss_hi
        if red == "sum":
            expr = base_sum + pad_sum
        elif red == "mean":
            expr = (base_sum + pad_sum) / (base_cnt + pad_cnt)
        elif red in ("min", "max", "first", "last", "count",
                     "variance", "standard-deviation"):
            # boundary value already inside the frame -> clamp is a no-op for
            # min/max; for the others fall back to shrink semantics.
            expr = _WIN_REDUCERS[red](F.col("__src__")).over(
                _base_window(order_by, by).rowsBetween(lo, hi))
        else:
            raise ValueError(f"unsupported clamp reducer {red!r}")
        out = tmp.withColumn(name, expr).drop("__src__")
    return out


def rolling_range(df: DataFrame, order_by: str, specs: Mapping[str, tuple], *,
                  window_size: float, by=None, units: str | None = None) -> DataFrame:
    """Variable (value-range) rolling windows (rolling.clj:281-301): window
    covers rows whose axis value is within ``window_size`` BEFORE the current
    row's value (inclusive), i.e. rangeBetween(-window_size, 0).

    ``units`` for datetime axes: "days"/"hours"/"minutes"/"seconds" — the
    axis is cast to epoch seconds and the delta scaled. ``"months"`` is a
    CALENDAR unit (not a fixed span — rolling.clj:281-301's datetime
    between-op), handled by :func:`rolling_range_months`' anchored
    self-join instead of a range frame.
    """
    if units == "months":
        return rolling_range_months(df, order_by, specs,
                                    window_size=int(window_size), by=by)
    axis = F.col(order_by)
    if units is not None:
        scale = {"seconds": 1, "minutes": 60, "hours": 3600, "days": 86400}
        if units not in scale:
            raise ValueError(f"unknown calendar unit {units!r}")
        axis = axis.cast("timestamp").cast("long")
        delta = int(window_size * scale[units])
    else:
        axis = axis.cast("double")
        delta = window_size
    by_cols = [] if by is None else ([by] if isinstance(by, str) else list(by))
    if not by_cols:
        warn_unpartitioned("rolling_range")
    w = ((W.partitionBy(*by_cols) if by_cols else W.partitionBy())
         .orderBy(axis).rangeBetween(-delta, 0))
    out = df
    for name, spec in specs.items():
        out = out.withColumn(name, _spec_expr(spec, w))
    return out


# groupBy equivalents of _WIN_REDUCERS for the months self-join path
_AGG_REDUCERS: dict[str, Callable[[Column], Column]] = {
    "mean": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
    "variance": F.var_samp, "standard-deviation": F.stddev_samp,
    "count": F.count,
}


def rolling_range_months(df: DataFrame, order_by: str,
                         specs: Mapping[str, tuple], *, window_size: int,
                         by=None) -> DataFrame:
    """Calendar-month rolling windows: each row aggregates peer rows whose
    axis lies in ``[axis - window_size months, axis]``, month subtraction
    clamping to month end (add_months semantics — Feb 30 -> Feb 29/28; SQL
    ``date - INTERVAL n MONTH`` agrees across engines).

    Months have no fixed width, so this can't be a rangeBetween frame;
    instead: equi-join on ``by`` with the anchored interval as a join-time
    range predicate, then re-aggregate per left row. Plan: one shuffle per
    side keyed by ``by`` + one aggregation — work is O(rows x window
    membership) within each key, the honest cost of calendar windows.
    Reducers: built-in single-column names only (the join regroup can't
    host window-frame composition)."""
    from .selection import _free_name

    by_cols = [] if by is None else ([by] if isinstance(by, str) else list(by))
    if not by_cols:
        warn_unpartitioned("rolling_range_months")
    is_date = dict(df.dtypes)[order_by] == "date"
    rid = _free_name(df.columns, "__rid__")
    left = df.withColumn(rid, F.monotonically_increasing_id())

    srcs = sorted({src for (_red, src) in specs.values()})
    for (_red, src) in specs.values():
        if not isinstance(src, str) or callable(_red):
            raise ValueError("rolling months windows support built-in "
                             "single-column reducers only")
    right = df.select(
        *[F.col(c).alias(f"__r_{c}__") for c in dict.fromkeys(by_cols + [order_by] + srcs)])

    l_axis = F.col(order_by)
    r_axis = F.col(f"__r_{order_by}__")
    anchor = (F.add_months(l_axis, -window_size) if is_date
              else F.timestamp_add("MONTH", F.lit(-window_size), l_axis))
    cond = F.lit(True)
    for c in by_cols:
        # null-safe: a NULL by-key must still match its own partition, like
        # the rangeBetween path's partitionBy does (NULL keys group together)
        cond = cond & F.col(c).eqNullSafe(F.col(f"__r_{c}__"))
    cond = cond & (r_axis >= anchor) & (r_axis <= l_axis)
    axis_nullable = df.schema[order_by].nullable
    src = left.filter(F.col(order_by).isNotNull()) if axis_nullable else left
    # inner join is safe for non-NULL axes: every row matches itself
    joined = src.join(right, cond, "inner")
    aggs = [_AGG_REDUCERS[red](F.col(f"__r_{src_}__")).alias(name)
            for name, (red, src_) in specs.items()]
    # regroup on (rid, *left cols): rid makes the key unique, carrying the
    # left columns through the groupBy keeps the plan LINEAR — no second
    # branch re-reading the mono-id source (see _contiguous_index on why
    # forked lineage over nondeterministic ids is dangerous)
    out = joined.groupBy(rid, *df.columns).agg(*aggs)
    if axis_nullable:
        # A NULL axis can't anchor a calendar interval: instead of silently
        # dropping the row (the pre-r3 behavior), keep it with NULL
        # aggregates — mirroring how the rangeBetween path retains
        # NULL-ordered rows rather than erasing them from the output.
        agg_types = {name: out.schema[name].dataType for name in specs}
        null_out = (left.filter(F.col(order_by).isNull())
                        .select(rid, *df.columns)
                        .withColumns({n: F.lit(None).cast(t)
                                      for n, t in agg_types.items()}))
        out = out.unionByName(null_out.select(*out.columns))
    return out.drop(rid)


def rolling_udf(df: DataFrame, order_by, specs: Mapping[str, tuple], *,
                window_size: int, by=None, position: str = "right") -> DataFrame:
    """Window-UDF helper (SURVEY §2.8): custom PYTHON rolling reducers for
    aggregations no SQL window function expresses (trimmed means, custom
    quantile blends...).

    ``specs``: {out_col: (fn, src_col, return_type)} — ``fn`` receives a
    pandas Series whose elements are the frame's values as a list/ndarray
    and returns a Series of scalars.

    Plan shape: the frame is materialized per row with ``collect_list``
    over the window (JVM), then crosses to Python ONCE per output column
    through an Arrow-batched pandas UDF. Cost is O(rows × window_size)
    transfer — the honest price of an opaque Python reducer; prefer
    :class:`FrameReducer` composition or built-in reducers whenever the
    function is expressible as SQL aggregates."""
    lo, hi = _frame(window_size, position)
    w = _base_window(order_by, by).rowsBetween(lo, hi)
    out = df
    for name, (fn, src, rtype) in specs.items():
        pudf = F.pandas_udf(fn, rtype)
        out = out.withColumn(name, pudf(F.collect_list(src).over(w)))
    return out


def expanding(df: DataFrame, order_by, specs: Mapping[str, tuple], *, by=None) -> DataFrame:
    """``expanding`` cumulative windows (rolling.clj:307-314): cumsum etc."""
    w = _base_window(order_by, by).rowsBetween(W.unboundedPreceding, 0)
    out = df
    for name, spec in specs.items():
        out = out.withColumn(name, _spec_expr(spec, w))
    return out


def with_analytic(df: DataFrame, order_by, exprs: Mapping[str, str | tuple], *,
                  by=None) -> DataFrame:
    """Parity-plus analytic functions (absent in the reference, SURVEY §2.5):
    rank / dense_rank / row_number / lag / lead / percent_rank / ntile.

    ``exprs``: {out_col: "rank"} or {out_col: ("lag", src, offset)}.
    """
    w = _base_window(order_by, by)
    out = df
    for name, spec in exprs.items():
        if isinstance(spec, str):
            fn = {"rank": F.rank, "dense-rank": F.dense_rank, "dense_rank": F.dense_rank,
                  "row-number": F.row_number, "row_number": F.row_number,
                  "percent-rank": F.percent_rank, "percent_rank": F.percent_rank,
                  "cume-dist": F.cume_dist, "cume_dist": F.cume_dist}[spec]
            out = out.withColumn(name, fn().over(w))
        else:
            op, src, *rest = spec
            k = rest[0] if rest else 1
            if op == "lag":
                out = out.withColumn(name, F.lag(F.col(src), k).over(w))
            elif op == "lead":
                out = out.withColumn(name, F.lead(F.col(src), k).over(w))
            elif op == "ntile":
                out = out.withColumn(name, F.ntile(src).over(w))
            else:
                raise ValueError(f"unknown analytic op {op!r}")
    return out
