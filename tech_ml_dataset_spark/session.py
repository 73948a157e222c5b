"""SparkSession factory tuned for this engine.

The reference (tech.ml.dataset) is a single-JVM in-memory library whose
parallelism is the fork-join pool (reference: src/tech/v3/dataset/reductions.clj
pgroups usage). On Spark the equivalent knobs are partition counts and AQE;
we default them so local[N] testing mirrors the multi-executor layout we
design for: shuffle partitions sized to cores, AQE for runtime coalescing
and skew-join handling, Arrow for every Python<->JVM batch boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # AQE: runtime re-planning (partition coalescing, skew-join splitting,
    # dynamic broadcast). Essential at 100 TB where static estimates are wrong.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow batches for every pandas_udf / mapInPandas / toPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # ANSI off: we want NULL-on-bad-cast semantics like the reference's
    # parse-failure -> missing convention (io/column_parsers.clj:92-102).
    "spark.sql.ansi.enabled": "false",
    # Timestamps in test parquet are ns-precision; read without truncation error.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def get_spark(
    app_name: str = "tech-ml-dataset-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is configured; on a real cluster pass
    ``master=None`` with spark-submit providing the master URL.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # Local: match cores. Cluster: callers should size to 2-3x total cores
        # (or rely on AQE coalescing from a higher initial number).
        shuffle_partitions = cpus

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if master.startswith("local"):
        conf.setdefault("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        conf.setdefault("spark.ui.enabled", "false")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
