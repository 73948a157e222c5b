"""Dump .explain('formatted') for named declared queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> <suffix> <query> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt for each query (e.g. suffix
'before' / 'after' for optimization-round evidence).

Queries whose functions build fixtures (write temp archives, parquet
targets) still run their fixture mill here — the explain is taken on the
RETURNED frame only, which is the part the optimization evidence pins.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from tech_ml_dataset_spark import get_spark


def main():
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    qs = entry.queries()
    unknown = sorted(set(names) - set(qs))
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
