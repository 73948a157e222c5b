"""CSV promotional type-inference parity (r1 verdict missing #4).

The reference's parser promotes each column through a dtype ladder
bool -> int16 -> int32 -> int64 -> float64 -> string as values arrive
(io/column_parsers.clj:309-328), with "" / NA tokens becoming missing
(parse_test.clj:131,170). Spark's two-pass inferSchema is the delegate
(sources/io.py docstring); these tests PIN the effective parity contract:
same logical outcome per ladder rung (Spark has no int16 inference — the
integer rungs land on int/bigint, documented delta), missing tokens
become NULL, and per-column parser-fn pinning overrides inference.
"""

import pytest
from pyspark.sql import types as T

from tech_ml_dataset_spark.sources.io import to_dataset


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


@pytest.fixture()
def csv_path(tmp_path):
    return _write(tmp_path, "ladder.csv", "\n".join([
        "b,i,f,promoted,s,miss_i,d",
        "true,1,1.5,1,abc,1,2024-01-01",
        "false,2,2.0,2.5,def,,2024-06-30",
        "true,3,-4.25,xyz,ghi,3,2024-12-31",
        ""]))


def test_promotional_ladder(spark, csv_path):
    df = to_dataset(spark, csv_path)
    dt = dict(df.dtypes)
    assert dt["b"] == "boolean"          # bool rung
    assert dt["i"] in ("int", "bigint")  # integer rung (no int16 in Spark)
    assert dt["f"] == "double"           # float rung
    assert dt["promoted"] == "string"    # int -> float -> string promotion
    assert dt["s"] == "string"
    assert dt["d"] == "date"             # ISO dates infer as date
    # missing token "" -> NULL, column keeps its numeric rung
    assert dt["miss_i"] in ("int", "bigint")
    assert df.filter(df["miss_i"].isNull()).count() == 1
    assert df.count() == 3


def test_parser_fn_pins_dtype(spark, csv_path):
    """:parser-fn per-column pinning beats inference (reference
    ->dataset {:parser-fn {...}})."""
    df = to_dataset(spark, csv_path,
                    parser_fn={"i": "int16", "f": "float32"})
    sch = {f.name: f.dataType for f in df.schema.fields}
    assert isinstance(sch["i"], T.ShortType)
    assert isinstance(sch["f"], T.FloatType)


def test_bad_parse_becomes_missing(spark, tmp_path):
    """Unparseable cell under a pinned dtype -> NULL, row survives
    (column_parsers.clj bad-value -> missing convention)."""
    p = _write(tmp_path, "bad.csv", "x\n1\noops\n3\n")
    df = to_dataset(spark, p, parser_fn={"x": "int32"})
    vals = [r["x"] for r in df.orderBy("x").collect()]
    assert vals.count(None) == 1 and {1, 3} <= set(v for v in vals if v is not None)


def test_na_tokens(spark, tmp_path):
    """Reference NA tokens ("", "NA", "n/a"...) map to missing via the
    nullValue option surface."""
    p = _write(tmp_path, "na.csv", "x,y\n1,alpha\nNA,beta\n3,NA\n")
    df = to_dataset(spark, p, nullValue="NA")
    got = {(r["x"], r["y"]) for r in df.collect()}
    assert got == {(1, "alpha"), (None, "beta"), (3, None)}
    assert dict(df.dtypes)["x"] in ("int", "bigint")  # NA didn't break the rung
