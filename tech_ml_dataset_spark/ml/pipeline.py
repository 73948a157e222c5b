"""Metamorph-style fit/transform pipelines.

Reference: ``src/tech/v3/dataset/metamorph.clj:1-8`` — ctx-map pipelines where
each op runs in ``:fit`` mode (computing + stashing per-stage state) or
``:transform`` mode (replaying stashed state on new data), the conceptual
match of ``pyspark.ml.Pipeline``'s Estimator/Transformer split.

Spark-first shape: a stage is either

* ``stage(fit_fn, transform_fn, *args, **kwargs)`` pairing this package's
  ``fit_*``/``transform_*`` functions (fit returns a plain picklable dict;
  transform applies it as pure Column expressions — broadcastable to any
  executor count, no Python in the hot path);
* a plain callable ``df -> df`` (stateless op — filters, projections);
* any object with ``.fit(df)`` returning an object with ``.transform(df)``
  (a ``pyspark.ml`` Estimator drops straight in).

``Pipeline.fit`` threads the dataset through the stages, fitting each on the
*output* of the previous stage (the reference's ctx threading); the returned
``FittedPipeline`` replays only transforms and is picklable when every stage
state is (dict-based stages are), so a pipeline fitted at sf0.01 ships to a
1000-executor job unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class stage:
    """Pair a ``fit_fn(df, *args, **kwargs) -> state`` with a
    ``transform_fn(df, state) -> df`` (the PDatasetTransform shape,
    protocols.clj:68-69)."""

    def __init__(self, fit_fn, transform_fn, *args, **kwargs):
        self.fit_fn = fit_fn
        self.transform_fn = transform_fn
        self.args = args
        self.kwargs = kwargs

    def fit(self, df: DataFrame):
        state = self.fit_fn(df, *self.args, **self.kwargs)
        return _FittedStage(self.transform_fn, state)


class _FittedStage:
    def __init__(self, transform_fn, state):
        self.transform_fn = transform_fn
        self.state = state

    def transform(self, df: DataFrame) -> DataFrame:
        return self.transform_fn(df, self.state)


class _StatelessStage:
    def __init__(self, fn):
        self.fn = fn

    def fit(self, df: DataFrame):
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        return self.fn(df)


class _PrefittedStage:
    """A Transformer with no fit step (e.g. pyspark.ml Transformer)."""

    def __init__(self, transformer):
        self.transformer = transformer

    def fit(self, df: DataFrame):
        return self.transformer


def _as_stage(s):
    if hasattr(s, "fit"):
        return s
    if hasattr(s, "transform"):
        return _PrefittedStage(s)
    if callable(s):
        return _StatelessStage(s)
    raise TypeError(f"not a pipeline stage: {s!r}")


class Pipeline:
    """``(metamorph/pipeline op1 op2 ...)`` — ordered fit/transform stages."""

    def __init__(self, *stages):
        self.stages = [_as_stage(s) for s in stages]

    def fit(self, df: DataFrame) -> "FittedPipeline":
        fitted = []
        cur = df
        for s in self.stages:
            fs = s.fit(cur)
            cur = fs.transform(cur)
            fitted.append(fs)
        return FittedPipeline(fitted, cur)

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).output


class FittedPipeline:
    """Replays the fitted stages on new data (``:transform`` mode)."""

    def __init__(self, fitted_stages, output: DataFrame):
        self.stages = fitted_stages
        #: the training data after all stages (fit_transform result)
        self.output = output

    def transform(self, df: DataFrame) -> DataFrame:
        cur = df
        for s in self.stages:
            cur = s.transform(cur)
        return cur

    @property
    def states(self) -> list:
        """Per-stage fitted state (None for stateless stages) — the ctx map."""
        return [getattr(s, "state", None) for s in self.stages]
