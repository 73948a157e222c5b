"""Sorts, distinct, concat, and bag-semantics set operations.

Reference semantics: sort-by-column (src/tech/v3/dataset/base.clj:596),
unique-by (base.clj:760,778), concat with dtype widening (base.clj:626-744),
bag union/intersection/difference (src/tech/v3/dataset/set.clj:166,174,183,
counts-based core at :72,:118).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F
from pyspark.sql import types as T


def sort_by_column(df: DataFrame, colname: str, *, desc: bool = False,
                   nulls_first: bool | None = None,
                   nulls: str | None = None) -> DataFrame:
    """``sort-by-column`` (base.clj:596). The reference's ``:nan-strategy``
    maps onto null placement here (Spark orders NaN as greatest; the
    reference's NaN-as-missing convention means callers treat NaN via
    nulls): ``nulls_first`` True/False = :first/:last, and
    ``nulls="exception"`` = :exception — an executor-side raise_error on
    the first NULL key, no extra scan (sort-works-with-nan law,
    dataset_test.clj:1306-1313)."""
    if nulls == "exception":
        df = df.withColumn(colname, F.when(
            F.col(colname).isNull(),
            F.raise_error(F.lit(
                f"sort_by_column({colname!r}): NULL sort key under "
                f"nulls='exception' (reference :nan-strategy :exception)"))
            .cast(dict(df.dtypes)[colname])).otherwise(F.col(colname)))
    elif nulls is not None:
        raise ValueError(f"nulls must be 'exception' or None, got {nulls!r}")
    c = F.col(colname)
    if desc:
        c = c.desc_nulls_first() if nulls_first else c.desc_nulls_last() if nulls_first is not None else c.desc()
    else:
        c = c.asc_nulls_first() if nulls_first else c.asc_nulls_last() if nulls_first is not None else c.asc()
    return df.orderBy(c)


def sort_by(df: DataFrame, *cols) -> DataFrame:
    """``sort-by`` with expression keys (base.clj:570): pass Columns with
    .asc()/.desc() or names."""
    return df.orderBy(*cols)


def unique_by_column(df: DataFrame, colname: str | Sequence[str], *,
                     keep_order_by=None) -> DataFrame:
    """``unique-by-column`` (base.clj:778). Default keeps an arbitrary
    survivor per key (``dropDuplicates`` — hash-agg, one shuffle, no sort).
    ``keep_order_by`` implements the reference's ``:keep-fn`` (pick survivor):
    a window row_number over that ordering keeps the first row per key."""
    keys = [colname] if isinstance(colname, str) else list(colname)
    if keep_order_by is None:
        return df.dropDuplicates(keys)
    order = keep_order_by if isinstance(keep_order_by, (list, tuple)) else [keep_order_by]
    w = W.partitionBy(*keys).orderBy(*[F.col(c) if isinstance(c, str) else c for c in order])
    return (df.withColumn("__rn__", F.row_number().over(w))
              .filter(F.col("__rn__") == 1).drop("__rn__"))


def distinct(df: DataFrame) -> DataFrame:
    """Whole-row distinct."""
    return df.distinct()


_WIDEN_ORDER = ["boolean", "tinyint", "smallint", "int", "bigint",
                "float", "double", "decimal", "date", "timestamp", "string"]


def _widen(a: T.DataType, b: T.DataType) -> T.DataType:
    """Pairwise dtype widening for concat (reference base.clj:642-655):
    promote to the wider numeric / fall back to string."""
    if a == b:
        return a
    sa, sb = a.simpleString(), b.simpleString()
    for t in (sa, sb):
        if t.startswith("decimal"):
            return T.DoubleType()
    order = {t: i for i, t in enumerate(_WIDEN_ORDER)}
    numerics = {"boolean", "tinyint", "smallint", "int", "bigint", "float", "double"}
    if sa in numerics and sb in numerics:
        ints = {"boolean", "tinyint", "smallint", "int", "bigint"}
        if {sa, sb} & ints and {sa, sb} & {"float", "double"}:
            # int/float mix: float32's 24-bit mantissa cannot hold int32/64
            # exactly — promote to double unless the int side fits a float
            # (reference widens long+float32 to float64, dataset_test.clj:363)
            it = sa if sa in ints else sb
            ft = sb if sa in ints else sa
            if ft == "float" and it in ("boolean", "tinyint", "smallint"):
                return T.FloatType()
            return T.DoubleType()
        wide = _WIDEN_ORDER[max(order[sa], order[sb])]
        return {"tinyint": T.ByteType(), "smallint": T.ShortType(), "int": T.IntegerType(),
                "bigint": T.LongType(), "float": T.FloatType(), "double": T.DoubleType(),
                "boolean": T.BooleanType()}[wide]
    if {sa, sb} == {"date", "timestamp"}:
        return T.TimestampType()
    return T.StringType()


def concat(*dfs: DataFrame) -> DataFrame:
    """``concat`` (base.clj:744): row-concat by column NAME, widening dtypes
    pairwise and null-filling columns absent on one side (base.clj:626-697).
    Spark's unionByName errors on type conflicts, so widened casts are
    applied first. Union is a zero-shuffle narrow op.

    nil-pun law (dataset_test.clj:155-166): None arguments are skipped —
    ``concat(None, ds) == ds`` — and all-None (or zero) inputs return
    None. The reference's concat-inplace vs concat-copying distinction is
    storage-level (realize vs view) and has no Spark analog: both map to
    this one lazy union, so their behavioral tests (missing offsets,
    widening, nil-pun) pin THIS function."""
    dfs = [d for d in dfs if d is not None]
    if not dfs:
        return None
    if len(dfs) == 1:
        return dfs[0]
    # compute union schema: name -> widened type, in first-seen column order
    target: dict[str, T.DataType] = {}
    for df in dfs:
        for f in df.schema.fields:
            target[f.name] = _widen(target[f.name], f.dataType) if f.name in target else f.dataType
    out = None
    for df in dfs:
        have = {f.name: f.dataType for f in df.schema.fields}
        cols = []
        for name, dt in target.items():
            if name in have:
                c = F.col(name).cast(dt) if have[name] != dt else F.col(name)
            else:
                c = F.lit(None).cast(dt)
            cols.append(c.alias(name))
        part = df.select(*cols)
        out = part if out is None else out.unionByName(part)
    return out


def _explode_counts(df: DataFrame, cnt: Column) -> DataFrame:
    """Re-expand a (distinct-rows, count) table to bag form via sequence+explode."""
    cols = [c for c in df.columns if not c.startswith("__")]
    return (df.withColumn("__out_cnt__", cnt)
              .filter(F.col("__out_cnt__") > 0)
              .withColumn("__rep__", F.explode(F.sequence(F.lit(1), F.col("__out_cnt__"))))
              .select(*cols))


def _side_counts(dfs: Sequence[DataFrame]) -> tuple[DataFrame, list[str]]:
    """Per-distinct-row multiplicity of every input in ONE shuffle: tag each
    side, union (narrow), then a single groupBy with conditional counts.
    Map-side partial aggregation collapses duplicates before the exchange,
    so the shuffle carries (distinct-row, partial-counts) — the same volume
    a per-side groupBy would, but once instead of per-side + a join."""
    keys = list(dfs[0].columns)
    tagged = None
    for i, d in enumerate(dfs):
        t = d.select(*keys).withColumn("__side__", F.lit(i))
        tagged = t if tagged is None else tagged.unionByName(t)
    aggs = [F.count(F.when(F.col("__side__") == i, 1)).alias(f"__c{i}__")
            for i in range(len(dfs))]
    return tagged.groupBy(*keys).agg(*aggs), keys


def union(a: DataFrame, b: DataFrame, *,
          order_by: Sequence[str] | None = None) -> DataFrame:
    """Bag-semantics ``union`` (set.clj:166): output multiplicity =
    max(count_a, count_b) per distinct row — NOT ``df.union`` (which sums).
    Single-shuffle: tagged union -> one groupBy with per-side counts ->
    greatest() -> re-explode via sequence().

    ``order_by`` (r9) yields a DETERMINISTIC output order by sorting the
    (distinct-row, counts) table BEFORE the explode — duplicates are
    identical rows, so intra-group order is immaterial and the sort pays
    for the aggregated table, not the exploded bag (a post-explode
    orderBy measured 1.9x on the bench: range-partition sampling
    re-executes the explode)."""
    counts, _ = _side_counts([a, b])
    if order_by:
        counts = counts.orderBy(*order_by)
    return _explode_counts(counts, F.greatest("__c0__", "__c1__"))


def intersection(a: DataFrame, b: DataFrame, *,
                 order_by: Sequence[str] | None = None) -> DataFrame:
    """Bag-semantics ``intersection`` (set.clj:174): multiplicity =
    min(count_a, count_b) — equivalent to SQL INTERSECT ALL (the default,
    Spark-native plan). ``order_by`` (r9) routes through the same
    single-shuffle tagged-counts plan as :func:`union` so the
    deterministic sort pays pre-explode — see the union docstring."""
    if not order_by:
        return a.intersectAll(b)
    counts, _ = _side_counts([a, b])
    return _explode_counts(counts.orderBy(*order_by),
                           F.least("__c0__", "__c1__"))


def difference(a: DataFrame, b: DataFrame, *,
               order_by: Sequence[str] | None = None) -> DataFrame:
    """``difference`` (set.clj:183): remove rows of b from a with bag
    semantics — SQL EXCEPT ALL (the default, Spark-native plan).
    ``order_by`` (r9): same pre-explode sort contract as
    :func:`intersection`; multiplicity = max(count_a - count_b, 0)."""
    if not order_by:
        return a.exceptAll(b)
    counts, _ = _side_counts([a, b])
    return _explode_counts(counts.orderBy(*order_by),
                           F.greatest(F.col("__c0__") - F.col("__c1__"),
                                      F.lit(0)))


def datasets_equal(a: DataFrame, b: DataFrame) -> bool:
    """Dataset equality (reference dataset equality/hash semantics,
    dataset_test.clj:796-846) under the distributed contract: same column
    names+types and the same BAG of rows — row order is not observable on a
    shuffled engine, so it deliberately does not participate (the reference,
    being single-node ordered, also compares order; callers that need
    order-sensitive equality should compare with an explicit sort key).

    One shuffle total: tagged union -> per-side counts -> any row whose two
    multiplicities differ falsifies equality (checked with a LIMIT-1 probe,
    so the scan short-circuits)."""
    if dict(a.dtypes) != dict(b.dtypes) or len(a.columns) != len(b.columns):
        return False
    counts, _ = _side_counts([a, b.select(*a.columns)])
    return counts.filter(F.col("__c0__") != F.col("__c1__")).isEmpty()


def dataset_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bag diff between two same-schema datasets — the validation
    companion to :func:`datasets_equal`: every row whose multiplicity
    differs, with how many copies each side holds and the signed delta
    (positive = ``a`` has more). Empty result ⟺ ``datasets_equal``.

    Same single tagged-union shuffle as ``union``/``datasets_equal`` —
    NOT two ``exceptAll`` passes (which would shuffle both inputs twice
    and still lose the per-side counts)."""
    if dict(a.dtypes) != dict(b.dtypes) or len(a.columns) != len(b.columns):
        raise ValueError(
            f"dataset_diff needs matching schemas; "
            f"left={a.dtypes} right={b.dtypes}")
    counts, keys = _side_counts([a, b.select(*a.columns)])
    return (counts.filter(F.col("__c0__") != F.col("__c1__"))
                  .select(*keys,
                          F.col("__c0__").alias("n_left"),
                          F.col("__c1__").alias("n_right"),
                          (F.col("__c0__") - F.col("__c1__")).alias("delta")))


def reduce_union_counts(*dfs: DataFrame) -> DataFrame:
    """``reduce-union`` :count mode (set.clj:118): distinct rows + max
    multiplicity as a ``count`` column. Same single-shuffle tagged-union
    plan as ``union`` regardless of input count (an n-way join chain would
    be n-1 extra exchanges)."""
    counts, keys = _side_counts(list(dfs))
    cnt = F.greatest(*[F.col(f"__c{i}__") for i in range(len(dfs))]) \
        if len(dfs) > 1 else F.col("__c0__")
    return counts.select(*keys, cnt.alias("count"))
