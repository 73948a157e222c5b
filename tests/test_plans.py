"""Physical-plan assertions: the properties that decide 100 TB viability.

Correctness tests prove the answers match; these prove the PLANS are the
ones we'd want on a 1000-executor cluster — filters pushed into the scan,
columns pruned, dimension joins broadcast, aggregation partial+final,
top-k as TakeOrderedAndProject, and no Python stages in JVM-only operators.
"""
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_and_column_pruning(spark, sf_dir):
    df = entry.queries()["filter_project"](spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters" in plan and "l_discount" in plan.split("PushedFilters")[1][:200]
    # scan must read only the projected+filtered columns, not all 16
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "l_orderkey" in read_schema and "l_comment" not in read_schema


def test_star_join_broadcasts_dims(spark, sf_dir):
    df = entry.queries()["q5_nation_revenue"](spark, sf_dir)
    plan = _plan(df)
    # region/nation/supplier are dimension tables -> must not shuffle lineitem
    # against them via sort-merge; broadcast-hash is the scale-correct shape
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_aggregation_is_partial_final(spark, sf_dir):
    df = entry.queries()["q1_pricing_summary"](spark, sf_dir)
    plan = _plan(df)
    # partial (map-side combine) + final: two HashAggregate levels means the
    # shuffle carries per-partition partial states, not raw rows
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan or "partial" in plan.lower()


def test_topk_plans_take_ordered(spark, sf_dir):
    df = entry.queries()["topk_orders"](spark, sf_dir)
    assert "TakeOrderedAndProject" in _plan(df)  # never a global sort


def test_jvm_only_operators_have_no_python_stage(spark, sf_dir):
    qs = entry.queries()
    for name in ("doc_quality_lang", "media_meta_docs", "dedup_exact_docs",
                 "simhash_docs", "q1_pricing_summary", "rolling_range_events",
                 "fill_range_events", "cosine_topk_embeddings"):
        plan = _plan(qs[name](spark, sf_dir))
        assert "EvalPython" not in plan, f"{name} fell out of codegen into Python"


def test_whole_stage_codegen_covers_q1(spark, sf_dir):
    df = entry.queries()["q1_pricing_summary"](spark, sf_dir)
    df.collect()  # AQE inserts codegen stages at execution; inspect final plan
    plan = _plan(df)
    # '*(n)' marks WholeStageCodegen spans in the compact plan string
    assert "*(1)" in plan and "isFinalPlan=true" in plan


def test_semi_anti_join_not_materialized(spark, sf_dir):
    df = entry.queries()["customers_without_orders"](spark, sf_dir)
    plan = _plan(df)
    assert "LeftAnti" in plan  # planned as anti-join, not except/distinct


def test_limit_pushdown_in_to_dataset(spark, sf_dir):
    from tech_ml_dataset_spark.sources.io import to_dataset
    df = to_dataset(spark, f"{sf_dir}/lineitem.parquet", num_rows=10,
                    column_allowlist=["l_orderkey", "l_quantity"])
    plan = _plan(df)
    assert "GlobalLimit" in plan or "CollectLimit" in plan
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "l_comment" not in read_schema


def test_asof_join_single_shuffle_per_side(spark, sf_dir):
    """The union+window as-of join must shuffle by the 'by' key once —
    not once per window function."""
    df = entry.queries()["asof_purchase_click"](spark, sf_dir)
    plan = _plan(df)
    # events scanned twice (purchases, clicks) but the whole query needs
    # only a bounded number of exchanges, not one per analytic expression
    assert plan.count("Exchange") <= 6
