"""End-to-end training-data pipeline integration: the full
crawl -> quality-filter -> dedup -> stratified-sample -> pack flow over
the sf0.001 documents fixture, composing the operators a real pipeline
chains. Catches cross-operator regressions (column contracts, NULL
handling, funnel accounting) that per-operator tests can't."""
import pytest
from pyspark.sql import functions as F

from tech_ml_dataset_spark.functions import dedup as dd
from tech_ml_dataset_spark.functions import text as txt
from tech_ml_dataset_spark.operators import selection as sel
from tech_ml_dataset_spark.sources.io import read_parquet

SF = "/root/testdata/sf0.001"


def test_training_pipeline_end_to_end(spark):
    docs = read_parquet(spark, f"{SF}/documents.parquet") \
        .select("doc_id", "text", "lang")
    n0 = docs.count()
    assert n0 > 0

    # 1. signals: quality + repetition in one pass each
    q = txt.gopher_quality(docs, min_words=5)
    rep = txt.repetition_signals(docs, top_ngram_ns=(2,), dup_ngram_ns=(5,))
    enriched = q.join(
        rep.select("doc_id", "top_2gram_char_frac", "dup_5gram_char_frac"),
        "doc_id")
    assert enriched.count() == n0

    # 2. declarative funnel with drop accounting
    kept, report = txt.filter_funnel(enriched, {
        "word_count": F.col("rule_word_count"),
        "stopwords": F.col("rule_stopwords"),
        "repetition": F.col("top_2gram_char_frac") < 0.5,
    })
    rep_rows = {r["rule"]: r for r in report.collect()}
    assert rep_rows["word_count"]["n_in"] == n0
    n_kept = kept.count()
    assert rep_rows["repetition"]["n_out"] == n_kept
    assert 0 < n_kept <= n0

    # 3. exact dedup, then language-stratified exact sampling
    deduped = dd.exact_dedup(kept.select("doc_id", "text", "lang"))
    n_dedup = deduped.count()
    assert 0 < n_dedup <= n_kept
    sample = sel.sample_stratified_exact(deduped, "lang", 10,
                                         key_col="doc_id")
    per_lang = {r["lang"]: r["n"] for r in
                sample.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(v <= 10 for v in per_lang.values())

    # 4. token counts + greedy packing into 256-token shards
    counted = sample.withColumn(
        "n_tokens", F.size(F.split(F.trim("text"), r"\s+")))
    packed = txt.pack_sequences(counted, 256, by="lang", order_by="doc_id")
    assert packed.count() == sample.count()
    over = (packed.groupBy("lang", "pack_id")
                  .agg(F.sum("n_tokens").alias("t"),
                       F.count("*").alias("k"))
                  .filter((F.col("t") > 256) & (F.col("k") > 1)).count())
    assert over == 0  # only singleton oversized rows may exceed budget
