"""Local mimic of the driver's correctness gate: run every __spark_entry__
query on Spark at a given SF and compare to its DuckDB oracle —
row count + column names + order-insensitive multiset of normalized rows.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from collections import Counter
from datetime import date, datetime

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry
from tech_ml_dataset_spark import get_spark

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return int(v)  # unify 5.0 vs 5 across engines
        return round(v, 6)
    if isinstance(v, (datetime, date)):
        return str(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def main():
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    strict = "--strict" in args
    args = [a for a in args if a not in ("--vanilla", "--strict")]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    qs, oracles = entry.queries(), entry.oracle_sql()
    unknown = sorted(set(only) - set(qs))
    if unknown:
        # A misspelled name must NOT produce a vacuous "0 failures" pass.
        sys.exit(f"unknown query name(s): {unknown} — not in queries()")

    if vanilla:
        # Mimic the external driver exactly: a PLAIN session — Spark 4
        # defaults (ANSI on, no tuned confs). Queries must survive both.
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[32]")
                 .appName("verify-vanilla").getOrCreate())
        assert spark.conf.get("spark.sql.ansi.enabled") == "true", \
            "vanilla session unexpectedly has ANSI off"
    else:
        spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    fails = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"OK?   {name}: rows-only ({len(s_rows)} rows, no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            fails.append(name)
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL  {name}: columns {sorted(s_cols)} != {sorted(d_cols)}")
            fails.append(name)
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL  {name}: rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
            fails.append(name)
            continue
        if strict:
            # driver-hash mimic: compare rows IN ORDER (columns sorted by
            # name) — catches nondeterministic/mismatched final ordering
            # that the multiset compare forgives (r2's sessionize lesson)
            so = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            do = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            sl = [tuple(_norm(r[i]) for i in so) for r in s_rows]
            dl = [tuple(_norm(r[i]) for i in do) for r in d_rows]
            if sl != dl:
                first = next((j for j, (a, b) in enumerate(zip(sl, dl))
                              if a != b), None)
                print(f"FAIL  {name}: ORDER mismatch at row {first}: "
                      f"spark={sl[first] if first is not None else '?'} "
                      f"duckdb={dl[first] if first is not None else '?'}")
                fails.append(name)
                continue
        sm, dm = rows_multiset(s_cols, s_rows), rows_multiset(d_cols, d_rows)
        if sm != dm:
            diff_s = list((sm - dm).items())[:3]
            diff_d = list((dm - sm).items())[:3]
            print(f"FAIL  {name}: value mismatch; spark-only={diff_s} duckdb-only={diff_d}")
            fails.append(name)
            continue
        print(f"OK    {name} ({len(s_rows)} rows)")

    print(f"\n{checked} queries checked, {len(fails)} failures"
          + (f": {fails}" if fails else ""))
    if checked == 0:
        sys.exit("0 queries checked — refusing to report a vacuous pass")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
