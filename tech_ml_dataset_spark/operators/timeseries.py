"""Time-series axis operators: fill-range-replace and LOESS smoothing.

Reference semantics: ``fill-range-replace`` (src/tech/v3/dataset/math.clj:160)
densifies a monotonic numeric/datetime axis so consecutive deltas are
<= max-span, inserting rows whose non-axis columns are missing (then
optionally filled via replace-missing); ``interpolate-loess``
(src/tech/v3/dataset/math.clj:112) fits a LOESS smoother to (x, y) and adds
the smoothed column.

Spark-first design:
* fill-range-replace is lead()-over-window + sequence()/explode — generated
  rows never touch the driver, and the window partitions by the series key
  so densification is embarrassingly parallel per series.
* LOESS is the classic small-model/big-data split: fit on a bounded
  deterministic sample (driver, numpy — the model is a few-hundred-point
  grid), then evaluate distributed via a broadcast grid and piecewise-linear
  interpolation in an Arrow-batched pandas UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F
from pyspark.sql import types as T

from ..dtutil import epoch_micros, from_epoch_micros


def _apply_fill(out: DataFrame, fill: dict | None, axis_col: str, by):
    """Apply a fill-range ``fill`` spec: column -> strategy name, or
    ``("value", v)`` for the reference's constant-replacement arm
    (math_test.clj:38-41 ``fill-range-replace :a 2 :value 20``)."""
    from .missing import replace_missing

    for colname, strategy in (fill or {}).items():
        if isinstance(strategy, (tuple, list)):
            name, val = strategy
            out = replace_missing(out, colname, name, value=val,
                                  order_by=axis_col, by=by)
        else:
            out = replace_missing(out, colname, strategy,
                                  order_by=axis_col, by=by)
    return out


def fill_range_replace(df: DataFrame, axis_col: str, max_span, *,
                       by: str | Sequence[str] | None = None,
                       fill: dict | None = None,
                       units: str | None = None) -> DataFrame:
    """``fill-range-replace`` (math.clj:160): wherever the ordered axis gap
    between consecutive rows exceeds ``max_span``, insert ceil(gap/span)-1
    evenly spaced rows so every delta is <= ``max_span``. Inserted rows have
    NULL in every other column; ``fill`` maps column -> replace-missing
    strategy (e.g. {"value": "down"}) applied afterwards.

    ``units`` ("seconds"/"minutes"/"hours"/"days") marks a timestamp axis;
    ``max_span`` is then in those units and the axis round-trips through
    epoch microseconds. ``"months"`` is calendar arithmetic, not a fixed
    span — handled by :func:`fill_range_months`.
    """
    from .missing import replace_missing

    if units == "months":
        return fill_range_months(df, axis_col, int(max_span), by=by, fill=fill)
    is_time = units is not None
    if is_time:
        scale = {"seconds": 1, "minutes": 60, "hours": 3600, "days": 86400}
        if units not in scale:
            raise ValueError(f"calendar unit {units!r} is not span-expressible")
        span = float(max_span * scale[units] * 1_000_000)  # micros
        axis = epoch_micros(axis_col).cast("double")
    else:
        span = float(max_span)
        axis = F.col(axis_col).cast("double")

    by_cols = [] if by is None else ([by] if isinstance(by, str) else list(by))
    if not by_cols:
        from ..dtutil import warn_unpartitioned
        warn_unpartitioned("fill_range_replace")
    w = (W.partitionBy(*by_cols) if by_cols else W.partitionBy()).orderBy(axis)

    gap = F.lead(axis).over(w) - axis
    n_insert = F.when(gap > span, F.ceil(gap / span) - 1).otherwise(F.lit(0))
    tagged = df.withColumn("__x__", axis).withColumn("__n_ins__", n_insert.cast("int"))

    other = [c for c in df.columns if c != axis_col]
    gap2 = F.lead(F.col("__x__")).over(
        (W.partitionBy(*by_cols) if by_cols else W.partitionBy()).orderBy("__x__"))
    step = (gap2 - F.col("__x__")) / (F.col("__n_ins__") + 1)
    inserted = (tagged
                .withColumn("__step__", step)  # BEFORE the filter: the lead
                # window must see every row of the series, not the survivors
                .filter(F.col("__n_ins__") > 0)
                .withColumn("__i__", F.explode(F.sequence(F.lit(1), F.col("__n_ins__"))))
                .withColumn("__x__", F.col("__x__") + F.col("__i__") * F.col("__step__")))
    new_axis = (from_epoch_micros(F.col("__x__"), dict(df.dtypes)[axis_col]) if is_time
                else F.col("__x__").cast(dict(df.dtypes)[axis_col]))
    null_others = {c: F.lit(None).cast(dict(df.dtypes)[c])
                   for c in other if c not in by_cols}
    inserted = inserted.withColumn(axis_col, new_axis).withColumns(null_others) \
                       .select(*df.columns)
    out = df.unionByName(inserted)
    return _apply_fill(out, fill, axis_col, by)


def fill_range_months(df: DataFrame, axis_col: str, max_span_months: int, *,
                      by: str | Sequence[str] | None = None,
                      fill: dict | None = None) -> DataFrame:
    """Calendar-month fill-range (parity-plus over math.clj:160, whose spans
    are fixed-width): wherever consecutive rows are more than
    ``max_span_months`` MONTH-INDEX steps apart (month index = year*12 +
    month — day-of-month is ignored, the natural reading for densifying a
    monthly series), insert rows at ``add_months(prev, i*max_span)``
    (day clamped to month end, same as SQL ``+ INTERVAL n MONTH``).
    Inserted rows are NULL outside the axis/by columns; ``fill`` applies
    replace-missing per column afterwards. Same single-window plan shape as
    :func:`fill_range_replace`."""
    from .missing import replace_missing

    by_cols = [] if by is None else ([by] if isinstance(by, str) else list(by))
    if not by_cols:
        from ..dtutil import warn_unpartitioned
        warn_unpartitioned("fill_range_months")
    is_date = dict(df.dtypes)[axis_col] == "date"
    midx = F.year(axis_col) * 12 + F.month(axis_col)
    w = (W.partitionBy(*by_cols) if by_cols else W.partitionBy()) \
        .orderBy(F.col(axis_col))

    gap = F.lead(midx).over(w) - midx
    n_insert = (F.when(gap > max_span_months,
                       F.ceil(gap / F.lit(max_span_months)) - 1)
                 .otherwise(F.lit(0)))
    tagged = df.withColumn("__n_ins__", n_insert.cast("int"))
    other = [c for c in df.columns if c != axis_col]
    stepped = (F.add_months(F.col(axis_col), F.col("__i__") * max_span_months)
               if is_date else
               F.timestamp_add("MONTH", F.col("__i__") * max_span_months,
                               F.col(axis_col)))
    inserted = (tagged.filter(F.col("__n_ins__") > 0)
                .withColumn("__i__", F.explode(F.sequence(F.lit(1), F.col("__n_ins__"))))
                .withColumn(axis_col, stepped)
                .withColumns({c: F.lit(None).cast(dict(df.dtypes)[c])
                              for c in other if c not in by_cols})
                .select(*df.columns))
    out = df.unionByName(inserted)
    return _apply_fill(out, fill, axis_col, by)


# ---------------------------------------------------------------------------
# LOESS (Cleveland 1979 local linear regression, tricube weights)
# ---------------------------------------------------------------------------

def _loess_fit(x: np.ndarray, y: np.ndarray, grid: np.ndarray, *,
               bandwidth: float = 0.3, iterations: int = 2) -> np.ndarray:
    """Local linear regression at each grid point with tricube weights and
    bisquare robustness iterations — the same algorithm as commons-math
    LoessInterpolator used by the reference (math.clj:112). Pure numpy."""
    n = len(x)
    r = max(2, int(np.ceil(bandwidth * n)))
    order = np.argsort(x)
    x, y = x[order], y[order]
    robust = np.ones(n)
    out = np.empty(len(grid))
    for _ in range(max(1, iterations)):
        for gi, g in enumerate(grid):
            d = np.abs(x - g)
            idx = np.argpartition(d, min(r - 1, n - 1))[:r]
            dmax = d[idx].max() or 1.0
            w = (1 - np.clip(d[idx] / dmax, 0, 1) ** 3) ** 3 * robust[idx]
            sw = w.sum()
            if sw <= 0:
                out[gi] = np.nan
                continue
            xw, yw = x[idx], y[idx]
            xm = (w * xw).sum() / sw
            ym = (w * yw).sum() / sw
            sxx = (w * (xw - xm) ** 2).sum()
            b = ((w * (xw - xm) * (yw - ym)).sum() / sxx) if sxx > 1e-12 else 0.0
            out[gi] = ym + b * (g - xm)
        # robustness: reweight by residuals at the sample points
        fitted = np.interp(x, grid, out)
        resid = np.abs(y - fitted)
        s = np.median(resid) or 1.0
        robust = np.clip(1 - (resid / (6 * s)) ** 2, 0, 1) ** 2
    return out


def interpolate_loess(df: DataFrame, x_col: str, y_col: str, *,
                      out_col: str | None = None, bandwidth: float = 0.3,
                      iterations: int = 2, max_fit_points: int = 5000,
                      grid_size: int = 200) -> DataFrame:
    """``interpolate-loess`` (math.clj:112): add a LOESS-smoothed ``y``.

    Scale path: the model is fit on a DETERMINISTIC sample of ~
    ``max_fit_points`` rows selected by hash(x, y) mod k — no RNG, no global
    sort, stable across runs and partitionings, fully distributed — then
    evaluated on a ``grid_size``-point grid, and the grid is broadcast into
    an Arrow-batched pandas UDF doing np.interp. The 100 TB table streams
    through executors; only the sample crosses to the driver.
    """
    out_col = out_col or f"{y_col}-loess"
    pts = df.select(F.col(x_col).cast("double").alias("x"),
                    F.col(y_col).cast("double").alias("y")).dropna()
    n = pts.count()
    if n == 0:
        return df.withColumn(out_col, F.lit(None).cast("double"))
    k = max(1, n // max_fit_points)
    sample = pts.filter(
        F.pmod(F.xxhash64(F.col("x"), F.col("y")), F.lit(k)) == 0).collect()
    x = np.array([r["x"] for r in sample])
    y = np.array([r["y"] for r in sample])
    grid = np.linspace(x.min(), x.max(), num=min(grid_size, len(x)))
    fitted = _loess_fit(x, y, grid, bandwidth=bandwidth, iterations=iterations)

    from pyspark.sql.functions import pandas_udf

    g_b = grid.tolist()
    f_b = fitted.tolist()

    @pandas_udf(T.DoubleType())
    def _predict(xs: pd.Series) -> pd.Series:
        gg = np.asarray(g_b)
        ff = np.asarray(f_b)
        return pd.Series(np.interp(xs.astype(float).to_numpy(), gg, ff))

    return df.withColumn(out_col, _predict(F.col(x_col).cast("double")))


def sessionize(df: DataFrame, ts_col: str, *, gap_seconds: int,
               by, order_tiebreak: Sequence[str] = (),
               out_col: str = "session_seq") -> DataFrame:
    """Batch sessionization: rows within one ``by`` partition belong to
    the same session while consecutive ``ts_col`` gaps stay <=
    ``gap_seconds``; a longer gap (or the first row) starts a new session.
    Adds ``out_col`` (1-based per partition) — the batch analog of
    streaming session windows (streaming/windows.py session_window_agg).

    Plan: one shuffle on ``by``; lag + a cumulative sum over the same
    window spec, so both window functions share one sort. Pass
    ``order_tiebreak`` (e.g. an event id) whenever ``ts_col`` can tie —
    the cumulative sum is order-sensitive and ties would otherwise
    assign session numbers nondeterministically."""
    from ..dtutil import epoch_seconds

    by = [by] if isinstance(by, str) else list(by)
    w = W.partitionBy(*by).orderBy(ts_col, *order_tiebreak)
    ts_sec = epoch_seconds(ts_col)
    gap = ts_sec - F.lag(ts_sec).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        out_col, F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, 0)))
