"""fill-range-replace and interpolate-loess (reference math.clj:160,112)."""
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tech_ml_dataset_spark.operators import timeseries as tss


def test_fill_range_numeric(spark):
    df = spark.createDataFrame(
        [(0.0, "a", 1.0), (1.0, "a", 2.0), (4.0, "a", 5.0), (4.5, "a", 9.0)],
        "x double, k string, v double")
    out = tss.fill_range_replace(df, "x", 1.0, by="k").orderBy("x").collect()
    xs = [r["x"] for r in out]
    # gap 1->4 is 3.0 -> 2 inserted at 2.0, 3.0
    assert xs == [0.0, 1.0, 2.0, 3.0, 4.0, 4.5]
    assert [r["v"] for r in out] == [1.0, 2.0, None, None, 5.0, 9.0]
    assert all(r["k"] == "a" for r in out)  # series key preserved on inserts
    # every delta <= max_span
    assert all(b - a <= 1.0 + 1e-9 for a, b in zip(xs, xs[1:]))


def test_fill_range_with_fill_strategy(spark):
    df = spark.createDataFrame(
        [(0.0, 10.0), (3.0, 40.0)], "x double, v double")
    out = tss.fill_range_replace(df, "x", 1.0, fill={"v": "lerp"}) \
             .orderBy("x").collect()
    assert [r["x"] for r in out] == [0.0, 1.0, 2.0, 3.0]
    assert [round(r["v"], 6) for r in out] == [10.0, 20.0, 30.0, 40.0]


def test_fill_range_timestamp(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1.0), ("2024-01-01 02:30:00", 2.0)],
        "ts string, v double").withColumn("ts", F.to_timestamp("ts"))
    out = tss.fill_range_replace(df, "ts", 1.0, units="hours").orderBy("ts").collect()
    ts = [r["ts"] for r in out]
    assert len(ts) == 4  # 150min / 3 spans of 50min
    deltas = [(b - a).total_seconds() for a, b in zip(ts, ts[1:])]
    assert all(d <= 3600 + 1 for d in deltas)
    assert [r["v"] for r in out] == [1.0, None, None, 2.0]


def test_fill_range_no_gaps_is_identity(spark):
    df = spark.createDataFrame([(0.0, 1.0), (0.5, 2.0), (1.0, 3.0)],
                               "x double, v double")
    assert tss.fill_range_replace(df, "x", 1.0).count() == 3


def test_loess_recovers_smooth_signal(spark):
    rng = np.random.RandomState(7)
    xs = np.linspace(0, 10, 400)
    ys = np.sin(xs) + rng.normal(0, 0.15, len(xs))
    df = spark.createDataFrame([(float(a), float(b)) for a, b in zip(xs, ys)],
                               "x double, y double")
    out = tss.interpolate_loess(df, "x", "y", bandwidth=0.15).collect()
    err = [abs(r["y-loess"] - math.sin(r["x"])) for r in out]
    assert sum(err) / len(err) < 0.08   # mean error well under noise sd
    assert max(err) < 0.5


def test_loess_deterministic(spark):
    xs = np.linspace(0, 5, 100)
    ys = xs ** 2
    df = spark.createDataFrame([(float(a), float(b)) for a, b in zip(xs, ys)],
                               "x double, y double")
    a = tss.interpolate_loess(df, "x", "y").orderBy("x").collect()
    b = tss.interpolate_loess(df, "x", "y").orderBy("x").collect()
    assert [r["y-loess"] for r in a] == [r["y-loess"] for r in b]


def test_fill_range_months(spark):
    """Calendar-month densify: a Jan->Jul gap at 2-month max span inserts
    Mar and May rows (month-index gaps, add_months day clamping)."""
    import datetime as dt
    from tech_ml_dataset_spark.operators.timeseries import fill_range_replace

    df = spark.createDataFrame(
        [(1, dt.date(2024, 1, 31), 10.0), (1, dt.date(2024, 7, 31), 70.0),
         (2, dt.date(2024, 3, 1), 1.0)],
        "k int, d date, v double")
    out = fill_range_replace(df, "d", 2, by="k", units="months",
                             fill={"v": "down"})
    rows = sorted((r["k"], str(r["d"]), r["v"]) for r in out.collect())
    assert rows == [
        (1, "2024-01-31", 10.0),
        (1, "2024-03-31", 10.0),   # +2 months, day clamped (Mar has 31)
        (1, "2024-05-31", 10.0),   # +4 months
        (1, "2024-07-31", 70.0),
        (2, "2024-03-01", 1.0),
    ]


def test_rolling_range_months_window(spark):
    import datetime as dt
    from tech_ml_dataset_spark.operators.window import rolling_range

    df = spark.createDataFrame(
        [(1, dt.date(2024, 1, 15), 1.0), (1, dt.date(2024, 2, 20), 2.0),
         (1, dt.date(2024, 5, 10), 4.0), (2, dt.date(2024, 1, 1), 9.0)],
        "k int, d date, v double")
    out = rolling_range(df, "d", {"s": ("sum", "v"), "n": ("count", "v")},
                        window_size=3, by="k", units="months")
    got = {(r["k"], str(r["d"])): (r["s"], r["n"]) for r in out.collect()}
    assert got[(1, "2024-01-15")] == (1.0, 1)
    assert got[(1, "2024-02-20")] == (3.0, 2)   # Jan 15 within 3 months
    # May 10 anchor = Feb 10: Feb 20 in, Jan 15 out
    assert got[(1, "2024-05-10")] == (6.0, 2)
    assert got[(2, "2024-01-01")] == (9.0, 1)


def test_rolling_range_months_keeps_null_keys_and_axis(spark):
    """ADVICE r2 (medium): NULL by-keys and NULL axis values used to vanish
    through the inner join's NULL-propagating predicates — switching units
    to months changed the row count. NULL keys must match their own
    partition (eqNullSafe, like partitionBy does); NULL-axis rows are kept
    with NULL aggregates instead of being dropped."""
    import datetime as dt
    from tech_ml_dataset_spark.operators.window import rolling_range

    df = spark.createDataFrame(
        [(None, dt.date(2024, 1, 15), 1.0), (None, dt.date(2024, 2, 20), 2.0),
         (1, None, 7.0), (1, dt.date(2024, 3, 1), 3.0)],
        "k int, d date, v double")
    out = rolling_range(df, "d", {"s": ("sum", "v"), "n": ("count", "v")},
                        window_size=3, by="k", units="months")
    rows = out.collect()
    assert len(rows) == 4, "months path must not drop NULL-key/axis rows"
    got = {(r["k"], str(r["d"])): (r["s"], r["n"]) for r in rows}
    # NULL-key partition windows over itself
    assert got[(None, "2024-01-15")] == (1.0, 1)
    assert got[(None, "2024-02-20")] == (3.0, 2)
    # NULL axis anchors nothing: retained with NULL aggregates
    assert got[(1, "None")] == (None, None)
    assert got[(1, "2024-03-01")] == (3.0, 1)


def test_fill_range_reference_vectors(spark):
    """Pin the reference's own fill-range-replace vectors
    (/root/reference/test/tech/v3/dataset/math_test.clj:22-50): axis
    [1 5 10 15 20] with max-span 2 inserts ceil(gap/span)-1 evenly spaced
    rows; :down fill carries b forward across inserted AND originally-nil
    rows; no fill leaves inserted rows nil; :value 20 replaces every
    missing b with 20."""
    df = spark.createDataFrame(
        [(1.0, 2), (5.0, 2), (10.0, None), (15.0, 4), (20.0, 8)],
        "a double, b int")

    def run(fill):
        out = tss.fill_range_replace(df, "a", 2.0, by=None, fill=fill)
        rows = out.orderBy("a").collect()
        return ([round(r["a"], 2) for r in rows], [r["b"] for r in rows])

    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # by=None single-task demo
        a_down, b_down = run({"b": "down"})
        a_nil, b_nil = run(None)
        a_val, b_val = run({"b": ("value", 20)})
    want_a = [1.0, 3.0, 5.0, 6.67, 8.33, 10.0,
              11.67, 13.33, 15.0, 16.67, 18.33, 20.0]
    assert a_down == a_nil == a_val == want_a
    assert b_down == [2, 2, 2, 2, 2, 2, 2, 2, 4, 4, 4, 8]
    assert b_nil == [2, None, 2, None, None, None,
                     None, None, 4, None, None, 8]
    assert b_val == [2, 20, 2, 20, 20, 20, 20, 20, 4, 20, 20, 8]
