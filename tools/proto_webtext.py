"""Scratch harness: prototype webtext queries vs DuckDB replays (sf0.001)."""
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import functions as F

from tech_ml_dataset_spark import get_spark
from tech_ml_dataset_spark.functions import webtext as wt

SF = "/root/testdata/sf0.001"


def structured_text(text):
    toks = F.split(text, " ")
    nt = F.size(toks)
    n_sent = F.ceil(nt / F.lit(8.0)).cast("int")
    sents = F.transform(F.sequence(F.lit(0), n_sent - 1),
                        lambda i: F.concat(F.array_join(
                            F.slice(toks, i * 8 + 1, 8), " "), F.lit(".")))
    n_line = F.ceil(F.size(sents) / F.lit(3.0)).cast("int")
    lines = F.transform(F.sequence(F.lit(0), n_line - 1),
                        lambda j: F.array_join(F.slice(sents, j * 3 + 1, 3), " "))
    return F.array_join(lines, "\n")


STRUCT_SQL = """
    array_to_string(
      list_transform(range(0, CAST(ceil(len(string_split(text,' '))/24.0) AS INT)),
        j -> array_to_string(
          list_transform(
            list_filter(range(j*3, j*3+3),
                        i -> i < CAST(ceil(len(string_split(text,' '))/8.0) AS INT)),
            i -> array_to_string(list_slice(string_split(text,' '), i*8+1, i*8+8), ' ') || '.'),
          ' ')),
      chr(10))
"""

# NOTE: the nested-transform SQL above must equal the Spark two-stage law.
# Simpler equivalent: build sentence list once in a CTE (used in real oracles).

con = duckdb.connect()
for t in ("documents",):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

spark = get_spark("proto", shuffle_partitions=8)

docs = spark.read.parquet(f"{SF}/documents.parquet")

# ---- 1. structured text parity ----
sdf = docs.filter(F.col("doc_id") < 50).select(
    "doc_id", structured_text(F.col("text")).alias("st"))
spark_rows = {r["doc_id"]: r["st"] for r in sdf.collect()}

duck = con.execute(f"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
    s AS (
      SELECT doc_id,
             list_transform(range(0, CAST(ceil(len(string_split(text,' '))/8.0) AS INT)),
               i -> array_to_string(list_slice(string_split(text,' '), i*8+1, i*8+8), ' ') || '.') AS sents
      FROM d)
    SELECT doc_id,
           array_to_string(
             list_transform(range(0, CAST(ceil(len(sents)/3.0) AS INT)),
               j -> array_to_string(list_slice(sents, j*3+1, j*3+3), ' ')),
             chr(10)) AS st
    FROM s
""").df()
duck_rows = dict(zip(duck["doc_id"], duck["st"]))
bad = [k for k in spark_rows if spark_rows[k] != duck_rows[k]]
print("structured parity:", "OK" if not bad else f"MISMATCH {bad[:3]}")
if bad:
    k = bad[0]
    print(repr(spark_rows[k][:200]))
    print(repr(duck_rows[k][:200]))
    sys.exit(1)

# ---- 2. html_to_text parity ----
html_expr = F.concat(
    F.lit('<html><head><title>Doc</title><style type="text/css">p {color:red}\n'
          'em {x:1}</style><script type="text/javascript">if (1 < 2) { '
          'alert("x&y"); }</script></head><body><!-- id '),
    F.col("doc_id").cast("string"),
    F.lit(' --><h1>Header '), F.col("doc_id").cast("string"),
    F.lit('</h1><p>'),
    F.replace(F.col("text"), F.lit(" merge "), F.lit("</p><p>")),
    F.lit('</p><br/>Tail &amp;amp; &lt;b&gt;&nbsp;end.</body></html>'))
hdf = docs.filter(F.col("doc_id") < 50).select(
    "doc_id", wt.html_to_text(html_expr).alias("extracted"))
spark_h = {r["doc_id"]: r["extracted"] for r in hdf.collect()}

html_sql = ("'<html><head><title>Doc</title><style type=\"text/css\">p {color:red}' || chr(10) || "
            "'em {x:1}</style><script type=\"text/javascript\">if (1 < 2) { alert(\"x&y\"); }</script>"
            "</head><body><!-- id ' || CAST(doc_id AS VARCHAR) || ' --><h1>Header ' || "
            "CAST(doc_id AS VARCHAR) || '</h1><p>' || replace(text, ' merge ', '</p><p>') || "
            "'</p><br/>Tail &amp;amp; &lt;b&gt;&nbsp;end.</body></html>'")
duck_h = con.execute(f"""
    SELECT doc_id, {wt.html_to_text_sql(html_sql)} AS extracted
    FROM documents WHERE doc_id < 50
""").df()
duck_hr = dict(zip(duck_h["doc_id"], duck_h["extracted"]))
bad = [k for k in spark_h if spark_h[k] != duck_hr[k]]
print("html parity:", "OK" if not bad else f"MISMATCH {bad[:3]}")
if bad:
    k = bad[0]
    print(repr(spark_h[k]))
    print(repr(duck_hr[k]))
    sys.exit(1)

# ---- 3. c4_filters parity ----
perturbed = F.concat(
    structured_text(F.col("text")),
    F.when(F.col("doc_id") % 7 == 0, F.lit("\nshort line")).otherwise(F.lit("")),
    F.when(F.col("doc_id") % 13 == 0,
           F.lit("\nEnable javascript and cookies to continue browsing here.")).otherwise(F.lit("")),
    F.when(F.col("doc_id") % 11 == 0,
           F.lit("\nNote lorem ipsum dolor sit amet consectetur.")).otherwise(F.lit("")),
    F.when(F.col("doc_id") % 17 == 0,
           F.lit("\nfunction f() { return 1; }")).otherwise(F.lit("")))
cdf = wt.c4_filters(
    docs.filter(F.col("doc_id") < 200).select("doc_id", perturbed.alias("text")),
    badwords=("kangaroo", "slow"))
out = cdf.select("doc_id", "c4_n_sentences", "c4_keep",
                 F.md5("c4_text").alias("clean_md5"))
spark_c = {r["doc_id"]: (r["c4_n_sentences"], r["c4_keep"], r["clean_md5"])
           for r in out.collect()}

duck_c = con.execute("""
    WITH d0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
    s AS (
      SELECT doc_id,
             list_transform(range(0, CAST(ceil(len(string_split(text,' '))/8.0) AS INT)),
               i -> array_to_string(list_slice(string_split(text,' '), i*8+1, i*8+8), ' ') || '.') AS sents,
             text AS orig
      FROM d0),
    st AS (
      SELECT doc_id,
             array_to_string(
               list_transform(range(0, CAST(ceil(len(sents)/3.0) AS INT)),
                 j -> array_to_string(list_slice(sents, j*3+1, j*3+3), ' ')),
               chr(10))
             || CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'short line' ELSE '' END
             || CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'Enable javascript and cookies to continue browsing here.' ELSE '' END
             || CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'Note lorem ipsum dolor sit amet consectetur.' ELSE '' END
             || CASE WHEN doc_id % 17 = 0 THEN chr(10) || 'function f() { return 1; }' ELSE '' END
             AS text
      FROM s),
    f AS (
      SELECT doc_id, text,
             array_to_string(
               list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                 l -> length(l) > 0 AND regexp_matches(l, '[.!?"]$')
                      AND len(string_split_regex(l, '\\s+')) >= 5
                      AND NOT contains(lower(l), 'javascript')),
               chr(10)) AS clean
      FROM st)
    SELECT doc_id,
           len(regexp_extract_all(clean, '[.!?]')) AS c4_n_sentences,
           len(regexp_extract_all(clean, '[.!?]')) >= 3
             AND NOT contains(lower(text), 'lorem ipsum')
             AND NOT contains(text, '{')
             AND NOT regexp_matches(text, '(?i)\\b(kangaroo|slow)\\b') AS c4_keep,
           md5(clean) AS clean_md5
    FROM f
""").df()
duck_cr = {int(r["doc_id"]): (int(r["c4_n_sentences"]), bool(r["c4_keep"]), r["clean_md5"])
           for _, r in duck_c.iterrows()}
bad = [k for k in spark_c if spark_c[k] != duck_cr[k]]
print("c4_filters parity:", "OK" if not bad else f"MISMATCH {bad[:5]}")
if bad:
    k = bad[0]
    print(spark_c[k]); print(duck_cr[k])
    sys.exit(1)
kept = sum(1 for v in spark_c.values() if v[1])
print(f"  kept {kept}/{len(spark_c)} pages")

# ---- 4. c4_span_dedup parity ----
base = docs.filter(F.col("doc_id") < 120).select(
    "doc_id", structured_text(F.col("text")).alias("text"))
dup = base.filter(F.col("doc_id") < 20).select(
    (F.col("doc_id") + 1000).alias("doc_id"), "text")
inp = base.unionByName(dup)
ddf = wt.c4_span_dedup(inp)
sout = ddf.select("doc_id", F.md5("text").alias("clean_md5"))
spark_d = {r["doc_id"]: r["clean_md5"] for r in sout.collect()}

duck_d = con.execute("""
    WITH d0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 120),
    s0 AS (
      SELECT doc_id,
             list_transform(range(0, CAST(ceil(len(string_split(text,' '))/8.0) AS INT)),
               i -> array_to_string(list_slice(string_split(text,' '), i*8+1, i*8+8), ' ') || '.') AS sents
      FROM d0),
    st AS (
      SELECT doc_id,
             array_to_string(
               list_transform(range(0, CAST(ceil(len(sents)/3.0) AS INT)),
                 j -> array_to_string(list_slice(sents, j*3+1, j*3+3), ' ')),
               chr(10)) AS text
      FROM s0),
    d AS (
      SELECT doc_id, text FROM st
      UNION ALL
      SELECT doc_id + 1000, text FROM st WHERE doc_id < 20),
    sent AS (
      SELECT doc_id,
             list_filter(
               list_transform(
                 string_split(regexp_replace(text, '([.!?])\\s+', '\\1' || chr(30), 'g'), chr(30)),
                 x -> trim(x)),
               x -> length(x) > 0) AS s
      FROM d),
    spans AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(list_slice(s, i, i + 2), ' ')) AS h
      FROM sent, unnest(range(1, CASE WHEN len(s) >= 3 THEN len(s) - 1 ELSE 1 END)) AS t(i)
      WHERE len(s) >= 3),
    ranked AS (
      SELECT doc_id, pos, h,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
      FROM spans),
    rmx AS (
      SELECT doc_id, unnest([pos, pos + 1, pos + 2]) AS ridx
      FROM ranked WHERE rn > 1),
    rm AS (SELECT doc_id, list(DISTINCT ridx) AS rl FROM rmx GROUP BY doc_id)
    SELECT sent.doc_id,
           md5(coalesce(array_to_string(
             list_filter(s, (x, i) -> rl IS NULL OR NOT list_contains(rl, i - 1)),
             ' '), '')) AS clean_md5
    FROM sent LEFT JOIN rm ON sent.doc_id = rm.doc_id
""").df()
duck_dr = dict(zip(duck_d["doc_id"].astype(int), duck_d["clean_md5"]))
bad = [k for k in spark_d if spark_d[k] != duck_dr[k]]
print("c4_span_dedup parity:", "OK" if not bad else f"MISMATCH {bad[:5]}")
if bad:
    k = bad[0]
    print(k, spark_d[k], duck_dr[k])
    row = ddf.filter(F.col("doc_id") == k).collect()[0]
    print(repr(row["text"][:300]))
    sys.exit(1)
changed = sum(1 for k in spark_d
              if k >= 1000 and spark_d[k] != spark_d.get(k - 1000))
print(f"  copies modified: {changed}/20 (expect 20: every span of a copy is non-canonical)")
spark.stop()
print("ALL OK")
