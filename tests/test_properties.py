"""Property-based tests (hypothesis): semantics the reference pins with
hand-picked examples (SURVEY §5), checked here against pure-Python oracles
over randomized inputs. Example counts are kept small — every example is a
real Spark job — but the properties are exact, not statistical."""

import collections

from hypothesis import HealthCheck, given, settings, strategies as hs
from pyspark.sql import functions as F

from tech_ml_dataset_spark.operators import missing as ms
from tech_ml_dataset_spark.operators import setops as st

_rows = hs.lists(
    hs.tuples(hs.integers(-2, 2), hs.sampled_from(["a", "b"])),
    min_size=0, max_size=10)

_SET_SETTINGS = settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(xs=_rows, ys=_rows)
@_SET_SETTINGS
def test_bag_setops_match_counter_semantics(spark, xs, ys):
    a = spark.createDataFrame(xs, "i int, s string") if xs else \
        spark.createDataFrame([], "i int, s string")
    b = spark.createDataFrame(ys, "i int, s string") if ys else \
        spark.createDataFrame([], "i int, s string")
    ca, cb = collections.Counter(xs), collections.Counter(ys)

    got_union = collections.Counter(
        (r["i"], r["s"]) for r in st.union(a, b).collect())
    want_union = collections.Counter(
        {k: max(ca[k], cb[k]) for k in set(ca) | set(cb)})
    assert got_union == {k: v for k, v in want_union.items() if v}

    got_inter = collections.Counter(
        (r["i"], r["s"]) for r in st.intersection(a, b).collect())
    want_inter = {k: min(ca[k], cb[k]) for k in set(ca) & set(cb)}
    assert got_inter == {k: v for k, v in want_inter.items() if v}

    got_diff = collections.Counter(
        (r["i"], r["s"]) for r in st.difference(a, b).collect())
    want_diff = ca - cb
    assert got_diff == want_diff

    assert st.datasets_equal(a, b) == (ca == cb)


@given(vals=hs.lists(hs.one_of(hs.none(), hs.floats(-10, 10, width=32)),
                     min_size=1, max_size=12))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_replace_missing_downup_fills_everything(spark, vals):
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "idx int, v float")
    out = ms.replace_missing(df, "v", "downup", order_by=["idx"])
    got = {r["idx"]: r["v"] for r in out.collect()}
    observed = [v for v in vals if v is not None]
    if not observed:
        assert all(v is None for v in got.values())
        return
    assert all(v is not None for v in got.values())
    # every fill comes from the nearest preceding (else following) non-null
    for i, v in enumerate(vals):
        if v is not None:
            assert got[i] == v
        else:
            prev = next((vals[j] for j in range(i - 1, -1, -1)
                         if vals[j] is not None), None)
            nxt = next((vals[j] for j in range(i + 1, len(vals))
                        if vals[j] is not None), None)
            assert got[i] == (prev if prev is not None else nxt)
