"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` maps operator names -> (spark, sf_dir) -> DataFrame;
``oracle_sql()`` gives the DuckDB-equivalent SQL per query.

Float-valued outputs are rounded to 4 decimals on BOTH sides (Spark sums
are naive while the oracle may associate differently — see BASELINE.md
tolerance note); all computed columns share identical aliases on both sides.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from tech_ml_dataset_spark.functions import similarity as sim
from tech_ml_dataset_spark.functions import text as txt
from tech_ml_dataset_spark.operators import aggregate as agg
from tech_ml_dataset_spark.operators import join as jn
from tech_ml_dataset_spark.operators import missing as ms
from tech_ml_dataset_spark.operators import selection as sel
from tech_ml_dataset_spark.operators import setops as st
from tech_ml_dataset_spark.operators import window as win


from tech_ml_dataset_spark.sources.io import read_parquet


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def _r4(c) -> F.Column:
    return F.round(c, 4)


# --------------------------------------------------------------------------
# TPC-H-flavored relational queries (SURVEY §2.2-§2.6 spine)
# --------------------------------------------------------------------------

def q1_pricing_summary(spark, sf_dir):
    """Filter → group-by-column-agg → sort (reference reductions.clj:517)."""
    li = _t(spark, sf_dir, "lineitem")
    out = agg.group_by_column_agg(
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")),
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("sum", "l_quantity"),
            "sum_base_price": ("sum", "l_extendedprice"),
            "sum_disc_price": lambda F: F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            "avg_qty": ("mean", "l_quantity"),
            "avg_price": ("mean", "l_extendedprice"),
            "avg_disc": ("mean", "l_discount"),
            "count_order": ("row-count", None),
        })
    num = ["sum_qty", "sum_base_price", "sum_disc_price", "avg_qty", "avg_price", "avg_disc"]
    out = out.withColumns({c: _r4(F.col(c)) for c in num})
    return st.sort_by(out, "l_returnflag", "l_linestatus")


def q3_segment_revenue(spark, sf_dir):
    """3-way join + agg + top-k (customer ⋈ orders ⋈ lineitem)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = jn.inner_join(orders, cust, ("o_custkey", "c_custkey"), broadcast_right=True)
    j = jn.inner_join(li, j, ("l_orderkey", "o_orderkey"))
    out = agg.group_by_column_agg(
        j, ["l_orderkey", "o_orderdate"],
        {"revenue": lambda F: F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))})
    out = out.withColumn("revenue", _r4(F.col("revenue")))
    return out.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc()).limit(10)


def q5_nation_revenue(spark, sf_dir):
    """Star join through region/nation/supplier dims (broadcast) + agg."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    dims = jn.inner_join(nation, region, ("n_regionkey", "r_regionkey"), broadcast_right=True)
    dims = jn.inner_join(supplier, dims, ("s_nationkey", "n_nationkey"), broadcast_right=True)
    j = jn.inner_join(li, dims, ("l_suppkey", "s_suppkey"), broadcast_right=True)
    out = agg.group_by_column_agg(
        j, "n_name",
        {"revenue": lambda F: F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
         "n_items": ("row-count", None)})
    out = out.withColumn("revenue", _r4(F.col("revenue")))
    return st.sort_by_column(out, "revenue", desc=True)


def filter_project(spark, sf_dir):
    """Projection + predicate — verifies scan pruning/pushdown semantics."""
    li = _t(spark, sf_dir, "lineitem")
    out = sel.filter_rows(
        sel.select_columns(li, ["l_orderkey", "l_quantity", "l_discount", "l_shipdate"]),
        (F.col("l_discount") >= 0.05) & (F.col("l_quantity") < 10))
    return out.withColumn("l_quantity", _r4(F.col("l_quantity"))) \
              .withColumn("l_discount", _r4(F.col("l_discount")))


def topk_orders(spark, sf_dir):
    """min-n-by-column / TakeOrderedAndProject (dataset_api.clj:453)."""
    orders = _t(spark, sf_dir, "orders")
    out = orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc()).limit(15)
    return out.select("o_orderkey", "o_custkey", _r4(F.col("o_totalprice")).alias("o_totalprice"))


def group_distinct_stats(spark, sf_dir):
    """count-distinct / min / max / stddev reducers (reductions.clj:202)."""
    orders = _t(spark, sf_dir, "orders")
    out = agg.group_by_column_agg(
        orders, "o_orderpriority",
        {"n_orders": ("row-count", None),
         "n_customers": ("count-distinct", "o_custkey"),
         "min_price": ("min", "o_totalprice"),
         "max_price": ("max", "o_totalprice"),
         "stddev_price": ("stddev", "o_totalprice")})
    for c in ("min_price", "max_price", "stddev_price"):
        out = out.withColumn(c, _r4(F.col(c)))
    return st.sort_by_column(out, "o_orderpriority")


def unique_by_order(spark, sf_dir):
    """unique-by-column with deterministic survivor (base.clj:778)."""
    li = _t(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is not unique in the synthetic data; the
    # survivor ordering must be total for a deterministic cross-engine result.
    out = st.unique_by_column(li, "l_orderkey",
                              keep_order_by=["l_linenumber", "l_partkey",
                                             "l_suppkey", "l_extendedprice"])
    return out.select("l_orderkey", "l_linenumber", "l_partkey",
                      _r4(F.col("l_quantity")).alias("l_quantity"))


def customers_without_orders(spark, sf_dir):
    """anti-join (reference set/difference analog, set.clj:183)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    out = jn.anti_join(cust, orders, ("c_custkey", "o_custkey"))
    return out.select("c_custkey", "c_name", "c_mktsegment")


def concat_slices(spark, sf_dir):
    """concat with widening (base.clj:626-744) — two disjoint slices, one
    with a column dropped (null backfill) and an int column widened."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    a = li.filter(F.col("l_returnflag") == "R")
    b = li.filter(F.col("l_returnflag") == "A") \
          .withColumn("l_linenumber", F.col("l_linenumber").cast("bigint")) \
          .drop("l_quantity")
    out = st.concat(a, b)
    return out.withColumn("l_quantity", _r4(F.col("l_quantity")))


def lineitem_except(spark, sf_dir):
    """bag difference / EXCEPT ALL (set.clj:183)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    a = li.filter(F.col("l_quantity") < 30)
    b = li.filter(F.col("l_quantity") < 10)
    return st.difference(a, b)


# --------------------------------------------------------------------------
# Window / time-series / missing (SURVEY §2.5, §2.2)
# --------------------------------------------------------------------------

def rolling_user_value(spark, sf_dir):
    """Fixed rolling mean/sum, right-aligned 3-row window per user
    (rolling.clj:116-304)."""
    ev = _t(spark, sf_dir, "events")
    out = win.rolling(ev, ["ts", "event_id"],
                      {"roll_mean": ("mean", "value"), "roll_sum": ("sum", "value")},
                      window_size=3, by="user_id", position="left")
    return out.select("event_id", "user_id",
                      _r4(F.col("roll_mean")).alias("roll_mean"),
                      _r4(F.col("roll_sum")).alias("roll_sum"))


def expanding_user_cumsum(spark, sf_dir):
    """Expanding/cumulative window (rolling.clj:307-314)."""
    ev = _t(spark, sf_dir, "events")
    out = win.expanding(ev, ["ts", "event_id"], {"cum_sum": ("sum", "value"),
                                                 "cum_n": ("count", "value")}, by="user_id")
    return out.select("event_id", "user_id", _r4(F.col("cum_sum")).alias("cum_sum"), "cum_n")


def analytic_lag_rank(spark, sf_dir):
    """Parity-plus analytics: lag/lead/rank over user sessions."""
    ev = _t(spark, sf_dir, "events")
    out = win.with_analytic(ev, ["ts", "event_id"],
                            {"prev_value": ("lag", "value", 1),
                             "next_type": ("lead", "event_type", 1),
                             "rn": "row-number"}, by="user_id")
    return out.select("event_id", "user_id", _r4(F.col("prev_value")).alias("prev_value"),
                      "next_type", "rn")


def ffill_events(spark, sf_dir):
    """replace-missing :down (missing.clj:242) — nulls synthesized
    deterministically (value<5 → missing), forward-filled per user."""
    ev = _t(spark, sf_dir, "events")
    ev = ev.withColumn("value", F.when(F.col("value") < 5, None).otherwise(F.col("value")))
    out = ms.replace_missing(ev, "value", "down", order_by=["ts", "event_id"], by="user_id")
    return out.select("event_id", "user_id", _r4(F.col("value")).alias("value"))


def asof_purchase_click(spark, sf_dir):
    """left-join-asof (join.clj:747-799): latest click at-or-before each
    purchase, per user."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase") \
                  .select("event_id", "user_id", "ts", "value")
    clicks = ev.filter(F.col("event_type") == "click") \
               .groupBy("user_id", "ts").agg(F.max("value").alias("click_value"))
    out = jn.left_join_asof(purchases, clicks, "ts", by="user_id", asof_op="<=")
    return out.select("event_id", "user_id", "ts",
                      _r4(F.col("value")).alias("value"),
                      F.col("`right.ts`").alias("click_ts"),
                      _r4(F.col("click_value")).alias("click_value"))


def sessionize_events(spark, sf_dir):
    """Batch sessionization (30-min inactivity gap) via lag + cumulative
    window — the batch analog of streaming session windows (SURVEY §2.5)."""
    from pyspark.sql import Window as W
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn("session_seq",
                         F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, 0)))
    out = sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        _r4(F.sum("value")).alias("session_value"))
    return out


# --------------------------------------------------------------------------
# LLM-pipeline operators (beyond-reference mandate)
# --------------------------------------------------------------------------

def text_stats_by_lang(spark, sf_dir):
    """Token counting + quality features aggregated per language."""
    docs = _t(spark, sf_dir, "documents")
    s = docs.select("lang",
                    txt.token_count(F.col("text")).alias("n_tokens"),
                    txt.char_count(F.col("text")).alias("n_chars_calc"))
    out = agg.group_by_column_agg(
        s, "lang",
        {"n_docs": ("row-count", None),
         "avg_tokens": ("mean", "n_tokens"),
         "max_chars": ("max", "n_chars_calc")})
    out = out.withColumn("avg_tokens", _r4(F.col("avg_tokens")))
    return st.sort_by_column(out, "lang")


def dedup_exact_docs(spark, sf_dir):
    """Exact dedup: md5 fingerprint of normalized text, min doc_id survives,
    duplicate multiplicity exposed (hash-groupBy — one shuffle)."""
    docs = _t(spark, sf_dir, "documents")
    fp = docs.withColumn("fp", txt.md5_fingerprint(F.col("text")))
    out = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"),
                               F.count(F.lit(1)).alias("n_copies"))
    return out.select("doc_id", "fp", "n_copies")


def doc_fingerprints(spark, sf_dir):
    """Per-document stable fingerprint + quality band projection."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        txt.md5_fingerprint(F.col("text")).alias("fp"),
        txt.token_count(F.col("text")).alias("n_tokens"))


def cosine_topk_embeddings(spark, sf_dir):
    """Brute-force cosine top-k vs the vec_id=0 query vector."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    out = sim.cosine_topk(emb.filter(F.col("vec_id") != 0), "embedding",
                          qvec, k=10)
    return out.select("vec_id", _r4(F.col("cos")).alias("cos")) \
              .orderBy(F.col("cos").desc(), F.col("vec_id").asc())


def events_json_extract(spark, sf_dir):
    """JSON prop extraction (scalar-function surface, SURVEY §2.7)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    out = ev.withColumn("prop_k", k).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("prop_k").alias("avg_k"),
        F.max("prop_k").alias("max_k"))
    out = out.withColumn("avg_k", _r4(F.col("avg_k")))
    return st.sort_by_column(out, "event_type")


# --------------------------------------------------------------------------
# contract functions
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "q3_segment_revenue": q3_segment_revenue,
        "q5_nation_revenue": q5_nation_revenue,
        "filter_project": filter_project,
        "topk_orders": topk_orders,
        "group_distinct_stats": group_distinct_stats,
        "unique_by_order": unique_by_order,
        "customers_without_orders": customers_without_orders,
        "concat_slices": concat_slices,
        "lineitem_except": lineitem_except,
        "rolling_user_value": rolling_user_value,
        "expanding_user_cumsum": expanding_user_cumsum,
        "analytic_lag_rank": analytic_lag_rank,
        "ffill_events": ffill_events,
        "asof_purchase_click": asof_purchase_click,
        "sessionize_events": sessionize_events,
        "text_stats_by_lang": text_stats_by_lang,
        "dedup_exact_docs": dedup_exact_docs,
        "doc_fingerprints": doc_fingerprints,
        "cosine_topk_embeddings": cosine_topk_embeddings,
        "events_json_extract": events_json_extract,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_segment_revenue": """
            SELECT l_orderkey, o_orderdate,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING'
              AND c_custkey = o_custkey AND l_orderkey = o_orderkey
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "q5_nation_revenue": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
                   count(*) AS n_items
            FROM lineitem, supplier, nation, region
            WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey AND r_name = 'ASIA'
            GROUP BY n_name
            ORDER BY revenue DESC
        """,
        "filter_project": """
            SELECT l_orderkey, round(l_quantity, 4) AS l_quantity,
                   round(l_discount, 4) AS l_discount, l_shipdate
            FROM lineitem
            WHERE l_discount >= 0.05 AND l_quantity < 10
        """,
        "topk_orders": """
            SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 15
        """,
        "group_distinct_stats": """
            SELECT o_orderpriority,
                   count(*) AS n_orders,
                   count(DISTINCT o_custkey) AS n_customers,
                   round(min(o_totalprice), 4) AS min_price,
                   round(max(o_totalprice), 4) AS max_price,
                   round(stddev_samp(o_totalprice), 4) AS stddev_price
            FROM orders
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "unique_by_order": """
            SELECT l_orderkey, l_linenumber, l_partkey, round(l_quantity, 4) AS l_quantity
            FROM (
                SELECT *, row_number() OVER (PARTITION BY l_orderkey
                                             ORDER BY l_linenumber, l_partkey,
                                                      l_suppkey, l_extendedprice) AS rn
                FROM lineitem
            ) WHERE rn = 1
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name, c_mktsegment
            FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "concat_slices": """
            SELECT l_orderkey, l_linenumber, round(l_quantity, 4) AS l_quantity, l_returnflag
            FROM lineitem WHERE l_returnflag = 'R'
            UNION ALL
            SELECT l_orderkey, CAST(l_linenumber AS BIGINT), NULL, l_returnflag
            FROM lineitem WHERE l_returnflag = 'A'
        """,
        "lineitem_except": """
            SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_quantity < 30
            EXCEPT ALL
            SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_quantity < 10
        """,
        "rolling_user_value": """
            SELECT event_id, user_id,
                   round(avg(value) OVER w, 4) AS roll_mean,
                   round(sum(value) OVER w, 4) AS roll_sum
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """,
        "expanding_user_cumsum": """
            SELECT event_id, user_id,
                   round(sum(value) OVER w, 4) AS cum_sum,
                   count(value) OVER w AS cum_n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "analytic_lag_rank": """
            SELECT event_id, user_id,
                   round(lag(value, 1) OVER w, 4) AS prev_value,
                   lead(event_type, 1) OVER w AS next_type,
                   row_number() OVER w AS rn
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "ffill_events": """
            SELECT event_id, user_id,
                   round(last_value(CASE WHEN value < 5 THEN NULL ELSE value END IGNORE NULLS)
                         OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS value
            FROM events
        """,
        "asof_purchase_click": """
            WITH purchases AS (
                SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
            ), clicks AS (
                SELECT user_id, ts, max(value) AS click_value
                FROM events WHERE event_type = 'click' GROUP BY user_id, ts
            ), matched AS (
                SELECT p.*, (SELECT max(c.ts) FROM clicks c
                             WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS click_ts
                FROM purchases p
            )
            SELECT m.event_id, m.user_id, m.ts, round(m.value, 4) AS value,
                   m.click_ts, round(c.click_value, 4) AS click_value
            FROM matched m
            LEFT JOIN clicks c ON c.user_id = m.user_id AND c.ts = m.click_ts
        """,
        "sessionize_events": """
            WITH gaps AS (
                SELECT user_id, ts, value,
                       CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                                 OR lag(ts) OVER w IS NULL
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sessions AS (
                SELECT user_id, value,
                       sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS session_seq
                FROM gaps
            )
            SELECT user_id, session_seq, count(*) AS n_events,
                   round(sum(value), 4) AS session_value
            FROM sessions GROUP BY user_id, session_seq
        """,
        "text_stats_by_lang": """
            SELECT lang, count(*) AS n_docs,
                   round(avg(CASE WHEN length(trim(text)) = 0 THEN 0
                             ELSE len(regexp_split_to_array(trim(text), '\\s+')) END), 4)
                       AS avg_tokens,
                   max(length(text)) AS max_chars
            FROM documents
            GROUP BY lang ORDER BY lang
        """,
        "dedup_exact_docs": """
            SELECT min(doc_id) AS doc_id, fp, count(*) AS n_copies
            FROM (SELECT doc_id,
                         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
                  FROM documents)
            GROUP BY fp
        """,
        "doc_fingerprints": """
            SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
            FROM documents
        """,
        "cosine_topk_embeddings": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(CAST(list_cosine_similarity(e.embedding, q.qe) AS DOUBLE), 4) AS cos
            FROM embeddings e, q
            WHERE e.vec_id <> 0
            ORDER BY cos DESC, e.vec_id ASC
            LIMIT 10
        """,
        "events_json_extract": """
            SELECT event_type, count(*) AS n,
                   round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
                   max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
            FROM events
            GROUP BY event_type ORDER BY event_type
        """,
    }
