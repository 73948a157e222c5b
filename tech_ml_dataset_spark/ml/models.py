"""Model training/prediction with the reference's train/predict shape.

Reference semantics: the Tribuo bindings (src/tech/v3/libs/tribuo.clj:232,
263,285,292 — ``train-classification``/``train-regression``/``predict``)
expose "train on a dataset with an inference target, get a model, predict a
column". Here the engines are ``pyspark.ml`` estimators — distributed
natively — wrapped so the API stays dataframe-in/dataframe-out, plus the
modelling metadata helpers (src/tech/v3/dataset/modelling.clj:26,37,203).

Scale notes: VectorAssembler + MLlib estimators run as Spark jobs (gradient
aggregation is a treeAggregate — map-side partials, no driver bottleneck);
prediction is a broadcast model applied in a single narrow pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

_TARGET_META_KEY = "inference-target"


def set_inference_target(df: DataFrame, colname: str) -> DataFrame:
    """``set-inference-target`` (modelling.clj:26): tag the label column via
    StructField metadata (the same trick the reference's own Spark bridge
    uses for column metadata, libs/spark.clj:128-144)."""
    return df.withMetadata(colname, {_TARGET_META_KEY: True})


def inference_target_column_names(df: DataFrame) -> list[str]:
    """``inference-target-column-names`` (modelling.clj:37)."""
    return [f.name for f in df.schema.fields
            if f.metadata.get(_TARGET_META_KEY)]


def feature_ecount(df: DataFrame) -> int:
    """``feature-ecount`` (modelling.clj:83): number of feature columns —
    columns that are not inference targets."""
    return len(df.columns) - len(inference_target_column_names(df))


def num_inference_classes(cat_map: dict) -> int:
    """``num-inference-classes`` (modelling.clj:75): size of the target's
    categorical table (our fitted map dict, ml/preprocess.py)."""
    return len(cat_map["table"])


def model_type(df: DataFrame, columns: Sequence[str] | None = None) -> str:
    """``model-type`` (modelling.clj:91): 'classification' if every target
    column is integral/string-categorical, else 'regression'."""
    cols = list(columns) if columns else inference_target_column_names(df)
    integral = {"tinyint", "smallint", "int", "bigint", "string", "boolean"}
    dts = dict(df.dtypes)
    return "classification" if cols and all(dts[c] in integral for c in cols) \
        else "regression"


def inference_target_ds(df: DataFrame, cat_map: dict | None = None
                        ) -> DataFrame | None:
    """``inference-target-ds`` (modelling.clj:203): the target columns,
    reverse-mapped through the categorical table when one is supplied (our
    categorical maps are explicit fitted dicts, ml/preprocess.py, rather
    than column metadata)."""
    cols = inference_target_column_names(df)
    if not cols:
        return None
    out = df.select(*cols)
    if cat_map is not None:
        from .preprocess import invert_categorical_map
        out = invert_categorical_map(out, cat_map)
    return out


def labels(df: DataFrame, cat_map: dict | None = None) -> DataFrame:
    """``labels`` (modelling.clj:212): single reverse-mapped target column;
    errors when the dataset has != 1 inference target."""
    out = inference_target_ds(df, cat_map)
    if out is None or len(out.columns) != 1:
        n = 0 if out is None else len(out.columns)
        raise ValueError(f"labels requires exactly 1 inference target, got {n}")
    return out


def probability_distributions_to_label_column(
        df: DataFrame, prob_cols: Sequence[str], dst_colname: str, *,
        on_invalid: str = "raise") -> DataFrame:
    """``probability-distributions->label-column`` (modelling.clj:225): the
    probability columns are named after their labels; the output label is
    the argmax column name per row. Pure Column expressions (greatest +
    chained when) — codegen'd, no UDF.

    A NaN or missing probability RAISES (executor-side ``raise_error``, no
    extra scan) — the reference's issue-267 law (modelling_test.clj:39-45:
    a distribution containing NaN/nil has no argmax; silently emitting a
    label poisons training data downstream). ``on_invalid="null"`` opts
    into a NULL label instead."""
    if on_invalid not in ("raise", "null"):
        raise ValueError(f"on_invalid must be 'raise' or 'null', "
                         f"got {on_invalid!r}")
    cols = list(prob_cols)
    mx = F.greatest(*[F.col(c) for c in cols]) if len(cols) > 1 else F.col(cols[0])
    expr = F.lit(None).cast("string")
    for c in reversed(cols):  # first match wins, like the reference's scan
        expr = F.when(F.col(c) == mx, F.lit(c)).otherwise(expr)
    bad = None
    for c in cols:
        isbad = F.col(c).isNull() | F.isnan(F.col(c).cast("double"))
        bad = isbad if bad is None else (bad | isbad)
    invalid = (F.raise_error(F.lit(
        f"probability_distributions_to_label_column: NaN/missing "
        f"probability in {cols} — no argmax exists (reference issue-267); "
        f"pass on_invalid='null' to emit NULL labels instead"))
        .cast("string") if on_invalid == "raise"
        else F.lit(None).cast("string"))
    return df.withColumn(dst_colname, F.when(bad, invalid).otherwise(expr))


def train_classification(df: DataFrame, label_col: str,
                         feature_cols: Sequence[str], *,
                         algorithm: str = "logistic-regression",
                         **params) -> dict:
    """``train-classification`` (tribuo.clj:263): returns {"model": fitted
    MLlib model, "features": [...], "label": ...}. Algorithms:
    logistic-regression | random-forest | gbt | naive-bayes."""
    from pyspark.ml.classification import (
        GBTClassifier, LogisticRegression, NaiveBayes, RandomForestClassifier)
    from pyspark.ml.feature import VectorAssembler

    est = {"logistic-regression": LogisticRegression,
           "random-forest": RandomForestClassifier,
           "gbt": GBTClassifier,
           "naive-bayes": NaiveBayes}[algorithm]
    assembler = VectorAssembler(inputCols=list(feature_cols),
                                outputCol="__features__", handleInvalid="skip")
    assembled = assembler.transform(df)
    model = est(featuresCol="__features__", labelCol=label_col,
                **params).fit(assembled)
    return {"model": model, "features": list(feature_cols), "label": label_col,
            "kind": "classification"}


def train_regression(df: DataFrame, label_col: str,
                     feature_cols: Sequence[str], *,
                     algorithm: str = "linear-regression", **params) -> dict:
    """``train-regression`` (tribuo.clj:285). Algorithms:
    linear-regression | random-forest | gbt."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import (
        GBTRegressor, LinearRegression, RandomForestRegressor)

    est = {"linear-regression": LinearRegression,
           "random-forest": RandomForestRegressor,
           "gbt": GBTRegressor}[algorithm]
    assembler = VectorAssembler(inputCols=list(feature_cols),
                                outputCol="__features__", handleInvalid="skip")
    assembled = assembler.transform(df)
    model = est(featuresCol="__features__", labelCol=label_col,
                **params).fit(assembled)
    return {"model": model, "features": list(feature_cols), "label": label_col,
            "kind": "regression"}


def predict(df: DataFrame, trained: dict, *,
            out_col: str = "prediction") -> DataFrame:
    """``predict`` (tribuo.clj:292): adds the prediction column; the fitted
    model is broadcast by MLlib, so this is a narrow (shuffle-free) pass."""
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(inputCols=trained["features"],
                                outputCol="__features__", handleInvalid="keep")
    assembled = assembler.transform(df)
    out = trained["model"].transform(assembled)
    drop = [c for c in ("__features__", "rawPrediction", "probability")
            if c in out.columns]
    if out_col != "prediction":
        out = out.withColumnRenamed("prediction", out_col)
    return out.drop(*drop)
