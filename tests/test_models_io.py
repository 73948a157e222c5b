"""Model training wrappers (tribuo.clj analog), reservoir sampling, and
Arrow/libsvm source round-trips."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from tech_ml_dataset_spark.ml import models as mdl
from tech_ml_dataset_spark.operators import aggregate as agg
from tech_ml_dataset_spark.sources import io as sio


@pytest.fixture(scope="module")
def labeled(spark):
    rng = np.random.RandomState(0)
    n = 400
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    label = (x1 + 2 * x2 > 0).astype(float)
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, label)]
    return spark.createDataFrame(rows, "x1 double, x2 double, label double")


def test_inference_target_metadata(spark, labeled):
    tagged = mdl.set_inference_target(labeled, "label")
    assert mdl.inference_target_column_names(tagged) == ["label"]
    assert mdl.inference_target_column_names(labeled) == []


def test_train_predict_classification(spark, labeled):
    fit = mdl.train_classification(labeled, "label", ["x1", "x2"])
    pred = mdl.predict(labeled, fit)
    acc = pred.filter(F.col("prediction") == F.col("label")).count() / pred.count()
    assert acc > 0.95
    assert "__features__" not in pred.columns


def test_train_predict_regression(spark, labeled):
    df = labeled.withColumn("y", 3 * F.col("x1") - F.col("x2") + 0.5)
    fit = mdl.train_regression(df, "y", ["x1", "x2"])
    pred = mdl.predict(df, fit, out_col="y_hat")
    mae = pred.agg(F.avg(F.abs(F.col("y_hat") - F.col("y")))).collect()[0][0]
    assert mae < 1e-6  # exact linear relation -> recovered


def test_reservoir_sample_counts(spark):
    df = spark.createDataFrame(
        [(g, i) for g in ("a", "b") for i in range(20)] + [("c", 0)],
        "g string, i int")
    out = agg.reservoir_sample(df, 5, by="g")
    counts = {r["g"]: r["n"] for r in
              out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"a": 5, "b": 5, "c": 1}
    # deterministic under a fixed seed
    a = sorted(map(tuple, agg.reservoir_sample(df, 5, by="g", seed=7).collect()))
    b = sorted(map(tuple, agg.reservoir_sample(df, 5, by="g", seed=7).collect()))
    assert a == b


def test_arrow_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "x", 1.5), (2, "y", None)],
                               "a int, b string, c double")
    p = str(tmp_path / "t.arrow")
    sio.write_arrow(df, p)
    back = sio.read_arrow(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    assert dict(back.dtypes) == dict(df.dtypes)


def test_libsvm_read(spark, tmp_path):
    p = str(tmp_path / "data.svm")
    with open(p, "w") as f:
        f.write("1.0 1:0.5 3:2.0\n0.0 2:1.5\n")
    df = sio.to_dataset(spark, p, numFeatures="4")
    rows = df.collect()
    assert {r["label"] for r in rows} == {0.0, 1.0}
    assert rows[0]["features"].toArray().shape == (4,)


def test_count_distinct_twophase_matches_exact(spark):
    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)] + [("b", i % 3) for i in range(30)],
        "k string, v int")
    got = {r["k"]: r["n_distinct"] for r in
           agg.count_distinct_twophase(df, "k", "v").collect()}
    assert got == {"a": 7, "b": 3}


def test_kahan_sum_exact_where_naive_cancels(spark):
    # 1e16 + 1 + ... + 1 - 1e16 with naive left-to-right float sum loses the
    # ones; fsum recovers them exactly
    data = [("g", 1e16)] + [("g", 1.0)] * 100 + [("g", -1e16)]
    df = spark.createDataFrame(data, "k string, v double").coalesce(1)
    out = agg.group_by_column_agg(df, "k", {"s": ("sum-kahan", "v")}).collect()
    assert out[0]["s"] == 100.0
