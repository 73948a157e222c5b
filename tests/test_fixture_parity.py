"""Reference-fixture analogs (SURVEY §5 canonical fixtures): the parsing
and format edge cases the reference pins with checked-in files —
winequality's ``;`` separator, ragged CSV, datatype_parser's bool/char
ladder, pokemon's list-valued string column, nested.parquet,
uuid.parquet — reproduced as synthetic equivalents."""

from pyspark.sql import functions as F

from tech_ml_dataset_spark.sources import io as tio


def test_semicolon_separated_csv(spark, tmp_path):
    """winequality-red.csv analog: ';' separator with numeric inference."""
    p = tmp_path / "wine.csv"
    p.write_text("fixed_acidity;ph;quality\n7.4;3.51;5\n7.8;3.20;5\n")
    df = tio.to_dataset(spark, str(p), sep=";")
    assert df.columns == ["fixed_acidity", "ph", "quality"]
    types = dict(df.dtypes)
    assert types["fixed_acidity"] == "double" and types["quality"] == "int"
    assert df.count() == 2


def test_ragged_csv_null_backfill(spark, tmp_path):
    """parse_test.clj:337 ragged-row analog: short rows null-backfill
    (PERMISSIVE default), long rows are malformed."""
    p = tmp_path / "ragged.csv"
    p.write_text("a,b,c\n1,2,3\n4,5\n6\n")
    df = tio.to_dataset(spark, str(p))
    rows = {r["a"]: (r["b"], r["c"]) for r in df.collect()}
    assert rows[4] == (5, None)
    assert rows[6] == (None, None)


def test_datatype_parser_ladder(spark, tmp_path):
    """datatype_parser.csv analog: bool tokens (mixed case), single-char
    strings, ISO dates — each lands on its promoted dtype."""
    p = tmp_path / "dt.csv"
    p.write_text("flag,ch,day\ntrue,a,2024-01-01\nFalse,b,2024-02-03\n")
    df = tio.to_dataset(spark, str(p))
    types = dict(df.dtypes)
    assert types["flag"] == "boolean"
    assert types["ch"] == "string"          # TMD :char -> string column
    assert types["day"].startswith("timestamp") or types["day"] == "date"
    vals = {r["ch"]: r["flag"] for r in df.collect()}
    assert vals["a"] is True and vals["b"] is False


def test_list_valued_string_column(spark, tmp_path):
    """pokemon.csv analog: a delimited list inside one CSV field, split to
    array<string> and unrolled (reference parses it as a list column)."""
    from tech_ml_dataset_spark.operators import reshape as rs

    p = tmp_path / "poke.csv"
    p.write_text('name,abilities\npikachu,"static;lightning-rod"\nmew,"synchronize"\n')
    df = tio.to_dataset(spark, str(p))
    df = df.withColumn("abilities", F.split("abilities", ";"))
    assert dict(df.dtypes)["abilities"] == "array<string>"
    un = rs.unroll_column(df, "abilities")
    got = {(r["name"], r["abilities"]) for r in un.collect()}
    assert got == {("pikachu", "static"), ("pikachu", "lightning-rod"),
                   ("mew", "synchronize")}


def test_nested_parquet_roundtrip(spark, tmp_path):
    """nested.parquet analog: struct + array-of-struct columns round-trip,
    field access and posexplode work on the re-read table."""
    df = spark.createDataFrame(
        [(1, {"x": 1.5, "y": "a"}, [{"k": "p", "v": 10}, {"k": "q", "v": 20}])],
        "id int, point struct<x:double,y:string>, "
        "tags array<struct<k:string,v:int>>")
    path = str(tmp_path / "nested.parquet")
    tio.write(df, path)
    back = tio.read_parquet(spark, path)
    assert dict(back.dtypes)["point"] == "struct<x:double,y:string>"
    r = back.select(F.col("point.x"),
                    F.explode("tags").alias("t")).collect()
    assert {(row["x"], row["t"]["k"], row["t"]["v"]) for row in r} == \
        {(1.5, "p", 10), (1.5, "q", 20)}


def test_uuid_parquet_reads_as_binary(spark, tmp_path):
    """uuid.parquet analog: pyarrow writes UUID as fixed-size-binary(16);
    Spark reads it as a 16-byte binary column losslessly."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = [uuid.uuid4() for _ in range(3)]
    table = pa.table({
        "u": pa.array([i.bytes for i in ids], type=pa.binary(16)),
        "n": pa.array([1, 2, 3], type=pa.int64())})
    path = str(tmp_path / "uuid.parquet")
    pq.write_table(table, path)
    df = tio.read_parquet(spark, path)
    assert dict(df.dtypes)["u"] == "binary"
    got = sorted(bytes(r["u"]).hex() for r in df.collect())
    assert got == sorted(i.bytes.hex() for i in ids)
