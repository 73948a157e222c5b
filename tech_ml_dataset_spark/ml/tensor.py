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
            f"max_rows={max_rows}. The distributed alternatives cover the "
            f"usual reasons to materialize a matrix: matmul(df, B) for "
            f"A @ B, gram_matrix(df) for AᵀA, mean_center_columns(df) for "
            f"centering (all in tech_ml_dataset_spark.ml.tensor, scale to "
            f"the full table), or pyspark.ml.linalg + VectorAssembler for "
            f"MLlib work. Raise max_rows only if the driver genuinely has "
            f"memory for an (n, k) float64 matrix.")
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


def matmul(df: DataFrame, b, columns: Sequence[str] | None = None, *,
           output_cols: Sequence[str] | None = None) -> DataFrame:
    """Distributed matrix multiply A @ B (reference tensor.clj:104
    ``matrix-multiply`` via neanderthal GEMM).

    A is the dataset's numeric columns, (n, k), distributed; B is a
    driver-side (k, m) array — the only GEMM layout that is sane at
    100 TB is tall-skinny × small, so B rides to the executors as m
    column expressions (``sum_i a_i * B[i, j]``), keeping the whole
    product inside whole-stage codegen: no UDF, no shuffle, one narrow
    projection. (The reference's GEMM is single-node in-memory, so this
    strictly dominates its scale envelope.) For m beyond a few hundred,
    fall back to a Pandas-UDF numpy dot via ``matmul_arrow``."""
    cols = list(columns) if columns is not None else [
        f.name for f in df.schema.fields
        if f.dataType.simpleString() in
        ("tinyint", "smallint", "int", "bigint", "float", "double")]
    mat = np.asarray(b, dtype=np.float64)
    if mat.ndim != 2 or mat.shape[0] != len(cols):
        raise ValueError(
            f"B must be ({len(cols)}, m) to multiply {len(cols)} columns; "
            f"got shape {mat.shape}")
    out = list(output_cols) if output_cols is not None else [
        f"p{j}" for j in range(mat.shape[1])]
    exprs = []
    for j, name in enumerate(out):
        terms = [F.col(c).cast("double") * float(mat[i, j])
                 for i, c in enumerate(cols)]
        acc = terms[0]
        for t in terms[1:]:
            acc = acc + t
        exprs.append(acc.alias(name))
    return df.select(*exprs)


def matmul_arrow(df: DataFrame, b, columns: Sequence[str] | None = None, *,
                 output_cols: Sequence[str] | None = None) -> DataFrame:
    """A @ B for WIDE B: one Arrow-batched ``mapInPandas`` pass doing a
    numpy GEMM per batch against the broadcast B. Same distribution
    contract as :func:`matmul` (no shuffle, n scales freely); crosses the
    Python boundary once, so prefer :func:`matmul` when m is small."""
    cols = list(columns) if columns is not None else [
        f.name for f in df.schema.fields
        if f.dataType.simpleString() in
        ("tinyint", "smallint", "int", "bigint", "float", "double")]
    mat = np.asarray(b, dtype=np.float64)
    if mat.ndim != 2 or mat.shape[0] != len(cols):
        raise ValueError(f"B must be ({len(cols)}, m); got {mat.shape}")
    out = list(output_cols) if output_cols is not None else [
        f"p{j}" for j in range(mat.shape[1])]
    bc = df.sparkSession.sparkContext.broadcast(mat)
    schema = ", ".join(f"`{c}` double" for c in out)

    def gemm(it):
        import pandas as pd
        bmat = bc.value
        for pdf in it:
            a = pdf[cols].to_numpy(dtype=np.float64)
            yield pd.DataFrame(a @ bmat, columns=out)

    return df.select(*[F.col(c).cast("double").alias(c) for c in cols]) \
             .mapInPandas(gemm, schema)


def gram_matrix(df: DataFrame, columns: Sequence[str] | None = None,
                *, arrow_threshold: int = 24) -> np.ndarray:
    """Distributed Gramian Aᵀ A -> (k, k) numpy array — the reduction that
    makes covariance/PCA scale (n never leaves the executors; only k² partial
    sums do).

    Two physical strategies by width:

    * k ≤ ``arrow_threshold``: k(k+1)/2 native ``sum(ci*cj)`` aggregate
      expressions — pure JVM codegen, map-side partial aggregation, one
      one-row result.
    * wider: per-Arrow-batch numpy ``aᵀa`` partials inside ``mapInPandas``
      (one flattened k² array row per batch), summed on the driver — the
      partial is k² doubles regardless of n, so the exchange stays tiny
      while avoiding a quadratic explosion of aggregate expressions."""
    cols = list(columns) if columns is not None else [
        f.name for f in df.schema.fields
        if f.dataType.simpleString() in
        ("tinyint", "smallint", "int", "bigint", "float", "double")]
    k = len(cols)
    # A Gramian over rows with missing entries is ill-defined; drop them
    # (both strategies then agree, and the Arrow path can't be NaN-poisoned).
    df = df.na.drop(subset=cols)
    if k <= arrow_threshold:
        aggs = [F.sum(F.col(cols[i]).cast("double")
                      * F.col(cols[j]).cast("double")).alias(f"g_{i}_{j}")
                for i in range(k) for j in range(i, k)]
        row = df.agg(*aggs).collect()[0]
        g = np.zeros((k, k))
        for i in range(k):
            for j in range(i, k):
                v = row[f"g_{i}_{j}"]
                g[i, j] = g[j, i] = 0.0 if v is None else v
        return g

    def partials(it):
        import pandas as pd
        for pdf in it:
            a = pdf[cols].to_numpy(dtype=np.float64)
            yield pd.DataFrame({"g": [(a.T @ a).ravel().tolist()]})

    rows = df.select(*[F.col(c).cast("double").alias(c) for c in cols]) \
             .mapInPandas(partials, "g array<double>").collect()
    g = np.zeros(k * k)
    for r in rows:
        g += np.asarray(r["g"])
    return g.reshape(k, k)


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
