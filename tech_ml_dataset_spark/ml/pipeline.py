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


def _fn_ref(fn) -> str:
    mod, qn = getattr(fn, "__module__", None), getattr(fn, "__qualname__", None)
    if not mod or not qn or "<" in qn:   # lambdas / locals aren't importable
        raise ValueError(
            f"stage function {fn!r} is not importable (module-level named "
            f"functions only) — lambdas cannot be persisted")
    import importlib
    resolved = importlib.import_module(mod)
    for part in qn.split("."):
        resolved = getattr(resolved, part)
    if resolved is not fn:
        raise ValueError(f"{mod}:{qn} does not resolve back to {fn!r}")
    return f"{mod}:{qn}"


def _fn_load(ref: str):
    import importlib
    mod, qn = ref.split(":")
    obj = importlib.import_module(mod)
    for part in qn.split("."):
        obj = getattr(obj, part)
    return obj


def save_pipeline(fitted: FittedPipeline, path: str) -> None:
    """Persist a fitted pipeline to a directory — the analog of the
    reference serializing datasets+fitted transforms with nippy
    (nippy.clj round-trips any fitted state): dict-state stages store
    (importable transform-fn reference, JSON state); stateless stages
    store their fn reference; ``pyspark.ml`` models delegate to their own
    ``save`` into a subdirectory. A pipeline fitted at sf0.01 reloads
    unchanged for a 1000-executor job — fit once, ship the artifact."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    records = []
    for i, s in enumerate(fitted.stages):
        if isinstance(s, _FittedStage):
            records.append({"kind": "state",
                            "fn": _fn_ref(s.transform_fn),
                            "state": s.state})
        elif isinstance(s, _StatelessStage):
            records.append({"kind": "stateless", "fn": _fn_ref(s.fn)})
        elif hasattr(s, "write") and hasattr(s, "transform"):
            # a fitted pyspark.ml model lands in fitted.stages as itself
            sub = f"stage_{i}_mllib"
            s.write().overwrite().save(os.path.join(path, sub))
            records.append({"kind": "mllib",
                            "cls": f"{type(s).__module__}:"
                                   f"{type(s).__qualname__}",
                            "dir": sub})
        else:
            raise ValueError(f"cannot persist stage {s!r}")
    with open(os.path.join(path, "pipeline.json"), "w") as f:
        json.dump({"version": 1, "stages": records}, f, indent=1,
                  default=float)  # numpy scalars in states -> plain floats


def load_pipeline(path: str) -> FittedPipeline:
    """Reload a :func:`save_pipeline` artifact; transforms replay exactly
    (states are plain data, transform fns resolve by import reference)."""
    import json
    import os

    with open(os.path.join(path, "pipeline.json")) as f:
        meta = json.load(f)
    stages = []
    for rec in meta["stages"]:
        if rec["kind"] == "state":
            stages.append(_FittedStage(_fn_load(rec["fn"]), rec["state"]))
        elif rec["kind"] == "stateless":
            stages.append(_StatelessStage(_fn_load(rec["fn"])).fit(None))
        else:
            cls = _fn_load(rec["cls"])
            model = cls.load(os.path.join(path, rec["dir"]))
            stages.append(_PrefittedStage(model).fit(None))
    return FittedPipeline(stages, output=None)
