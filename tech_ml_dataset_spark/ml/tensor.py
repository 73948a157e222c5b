"""Tensor / matrix bridge (reference: src/tech/v3/dataset/tensor.clj:27,42,70,104
and neanderthal.clj dense-matrix interop).

The reference converts datasets to in-memory dense matrices for BLAS work.
The Spark-native split:

* ``mean_center_columns`` — DISTRIBUTED: one aggregate pass for the means,
  then a narrow broadcast-subtract projection. This is the piece that must
  scale (PCA preprocessing at 100 TB); it never materializes the matrix.
* ``dataset_to_tensor`` / ``tensor_to_dataset`` — DRIVER-SIDE by design:
  a dense numpy matrix is an inherently single-node object (the reference's
  is too). Guarded by ``max_rows`` so a 100 TB table can't be collected by
  accident; for distributed linear algebra use ``pyspark.ml.linalg`` +
  ``VectorAssembler`` (see ml/models.py) instead.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F


def dataset_to_tensor(df: DataFrame, columns: Sequence[str] | None = None, *,
                      max_rows: int = 10_000_000) -> np.ndarray:
    """``dataset->tensor`` (tensor.clj:42): numeric columns -> (n, k) float64
    numpy array via one Arrow transfer. Driver-side by contract — refuses
    tables above ``max_rows`` instead of silently OOMing the driver."""
    cols = list(columns) if columns is not None else [
        f.name for f in df.schema.fields
        if f.dataType.simpleString() in
        ("tinyint", "smallint", "int", "bigint", "float", "double", "boolean")]
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"dataset_to_tensor is a driver-side bridge; {n} rows > "
            f"max_rows={max_rows}. Use pyspark.ml.linalg for distributed work.")
    pdf = df.select(*[F.col(c).cast("double").alias(c) for c in cols]).toPandas()
    return pdf.to_numpy(dtype=np.float64)


def tensor_to_dataset(spark: SparkSession, arr, columns: Sequence[str] | None = None
                      ) -> DataFrame:
    """``tensor->dataset`` (tensor.clj:27): (n, k) array -> k double columns."""
    mat = np.asarray(arr, dtype=np.float64)
    if mat.ndim != 2:
        raise ValueError(f"expected a 2-D tensor, got shape {mat.shape}")
    cols = list(columns) if columns is not None else [
        str(i) for i in range(mat.shape[1])]
    import pandas as pd
    return spark.createDataFrame(pd.DataFrame(mat, columns=cols))


def mean_center_columns(df: DataFrame, columns: Sequence[str] | None = None, *,
                        divide_by_std: bool = False) -> tuple[DataFrame, dict]:
    """``mean-center-columns!`` (tensor.clj:70): subtract per-column means
    (optionally scale by stddev). Distributed: ONE aggregate pass computes
    every mean/std, then a shuffle-free projection applies them as literals
    (same broadcast-the-small-state shape as fit/transform scalers).
    Returns (centered-df, {"means": {...}, "stds": {...}})."""
    cols = list(columns) if columns is not None else [
        f.name for f in df.schema.fields
        if f.dataType.simpleString() in
        ("tinyint", "smallint", "int", "bigint", "float", "double")]
    aggs = [F.avg(F.col(c)).alias(f"m_{c}") for c in cols]
    if divide_by_std:
        aggs += [F.stddev_samp(F.col(c)).alias(f"s_{c}") for c in cols]
    row = df.agg(*aggs).collect()[0].asDict()
    means = {c: row[f"m_{c}"] for c in cols}
    stds = {c: row.get(f"s_{c}") for c in cols} if divide_by_std else {}
    out = df.withColumns({
        c: ((F.col(c) - F.lit(means[c])) / F.lit(stds[c])
            if divide_by_std and stds.get(c) else F.col(c) - F.lit(means[c]))
        for c in cols})
    return out, {"means": means, "stds": stds}
