"""Property-based tests (hypothesis): semantics the reference pins with
hand-picked examples (SURVEY §5), checked here against pure-Python oracles
over randomized inputs. Example counts are kept small — every example is a
real Spark job — but the properties are exact, not statistical."""

import collections

from hypothesis import HealthCheck, example, given, settings, strategies as hs

# r8 (r7 verdict #9): codec property suites (avro/pdf/warc — the
# components with the largest silent-failure surface) scale their
# example budget via SPARK_GRAFT_HYP_EXAMPLES; the once-per-round
# thorough gate runs them at >=1000 examples:
#   SPARK_GRAFT_HYP_EXAMPLES=1000 python -m pytest tests/test_properties.py -q -k "avro or pdf or warc"
import os as _os

_CODEC_EXAMPLES = int(_os.environ.get("SPARK_GRAFT_HYP_EXAMPLES", "0"))


def _codec_settings(default: int):
    return settings(max_examples=_CODEC_EXAMPLES or default,
                    deadline=None)
from pyspark.sql import functions as F

from tech_ml_dataset_spark.operators import missing as ms
from tech_ml_dataset_spark.operators import setops as st

_rows = hs.lists(
    hs.tuples(hs.integers(-2, 2), hs.sampled_from(["a", "b"])),
    min_size=0, max_size=10)

_SET_SETTINGS = settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(xs=_rows, ys=_rows)
@_SET_SETTINGS
def test_bag_setops_match_counter_semantics(spark, xs, ys):
    a = spark.createDataFrame(xs, "i int, s string") if xs else \
        spark.createDataFrame([], "i int, s string")
    b = spark.createDataFrame(ys, "i int, s string") if ys else \
        spark.createDataFrame([], "i int, s string")
    ca, cb = collections.Counter(xs), collections.Counter(ys)

    got_union = collections.Counter(
        (r["i"], r["s"]) for r in st.union(a, b).collect())
    want_union = collections.Counter(
        {k: max(ca[k], cb[k]) for k in set(ca) | set(cb)})
    assert got_union == {k: v for k, v in want_union.items() if v}

    got_inter = collections.Counter(
        (r["i"], r["s"]) for r in st.intersection(a, b).collect())
    want_inter = {k: min(ca[k], cb[k]) for k in set(ca) & set(cb)}
    assert got_inter == {k: v for k, v in want_inter.items() if v}

    got_diff = collections.Counter(
        (r["i"], r["s"]) for r in st.difference(a, b).collect())
    want_diff = ca - cb
    assert got_diff == want_diff

    assert st.datasets_equal(a, b) == (ca == cb)


@given(vals=hs.lists(hs.one_of(hs.none(), hs.floats(-10, 10, width=32)),
                     min_size=1, max_size=12))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_replace_missing_downup_fills_everything(spark, vals):
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "idx int, v float")
    out = ms.replace_missing(df, "v", "downup", order_by=["idx"])
    got = {r["idx"]: r["v"] for r in out.collect()}
    observed = [v for v in vals if v is not None]
    if not observed:
        assert all(v is None for v in got.values())
        return
    assert all(v is not None for v in got.values())
    # every fill comes from the nearest preceding (else following) non-null
    for i, v in enumerate(vals):
        if v is not None:
            assert got[i] == v
        else:
            prev = next((vals[j] for j in range(i - 1, -1, -1)
                         if vals[j] is not None), None)
            nxt = next((vals[j] for j in range(i + 1, len(vals))
                        if vals[j] is not None), None)
            assert got[i] == (prev if prev is not None else nxt)


_series = hs.lists(
    hs.one_of(hs.none(), hs.floats(-100, 100, allow_nan=False)),
    min_size=1, max_size=12)


@given(vals=_series)
@_SET_SETTINGS
def test_replace_missing_strategies_match_pandas(spark, vals):
    """:down/:up/:downup/:lerp against pandas ffill/bfill/interpolate on a
    single ordered series — exact (both are IEEE double pipelines)."""
    import math
    import pandas as pd

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "x int, v double")
    ps = pd.Series(vals, dtype="float64")

    def got(strategy):
        out = ms.replace_missing(df, "v", strategy, order_by="x", by=())
        return [r["v"] for r in out.orderBy("x").collect()]

    def eq(a, b):
        return len(a) == len(b) and all(
            (x is None and (y is None or (isinstance(y, float) and math.isnan(y))))
            or (x is not None and y == y and abs(x - y) < 1e-9)
            for x, y in zip(a, b))

    assert eq(got("down"), ps.ffill().tolist())
    assert eq(got("up"), ps.bfill().tolist())
    assert eq(got("downup"), ps.ffill().bfill().tolist())
    # pandas interpolate = lerp on the integer axis, then edges stay NaN;
    # our :lerp coalesces edges to prev/next — apply the same to pandas
    want = ps.interpolate(method="linear", limit_direction="both").tolist()
    assert eq(got("lerp"), want)


@given(vals=hs.lists(hs.floats(-1000, 1000, allow_nan=False, allow_subnormal=False),
                     min_size=2, max_size=15))
@_SET_SETTINGS
def test_descriptive_stats_match_numpy(spark, vals):
    """mean/min/max/median/quartiles against numpy on random doubles
    (exact quantile mode; linear interpolation both sides)."""
    import numpy as np
    from tech_ml_dataset_spark.operators import aggregate as agg

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = agg.descriptive_stats(
        df, stats=("min", "max", "mean", "quartile-1", "median", "quartile-3"),
        quantile_accuracy="exact").collect()[0]
    assert abs(r["mean"] - np.mean(vals)) < 1e-6 * max(1, abs(np.mean(vals)))
    assert float(r["min"]) == min(vals) and float(r["max"]) == max(vals)
    for s, q in (("quartile-1", 25), ("median", 50), ("quartile-3", 75)):
        assert abs(r[s] - np.percentile(vals, q)) < 1e-7 * max(1.0, abs(np.percentile(vals, q)))


_pts = hs.lists(hs.integers(-5, 25), min_size=0, max_size=8)
_ivs = hs.lists(hs.tuples(hs.integers(-5, 25), hs.integers(-8, 30)),
                min_size=0, max_size=6)


@given(ps=_pts, ivs=_ivs,
       bucket=hs.sampled_from([1.0, 3.0, 7.0, 100.0]),
       bounds=hs.sampled_from(["[]", "[)", "(]", "()"]))
@_SET_SETTINGS
def test_range_join_matches_python_oracle(spark, ps, ivs, bucket, bounds):
    """Bucketized range join == pure-Python interval containment for every
    bounds mode, bucket width, and random (incl. inverted) intervals."""
    from tech_ml_dataset_spark.operators import join as jn

    pdf = spark.createDataFrame([(i, float(p)) for i, p in enumerate(ps)],
                                "pid int, p double") if ps else \
        spark.createDataFrame([], "pid int, p double")
    idf = spark.createDataFrame(
        [(j, float(lo), float(hi)) for j, (lo, hi) in enumerate(ivs)],
        "iid int, lo double, hi double") if ivs else \
        spark.createDataFrame([], "iid int, lo double, hi double")

    lo_ok = (lambda p, lo: p >= lo) if bounds[0] == "[" else (lambda p, lo: p > lo)
    hi_ok = (lambda p, hi: p <= hi) if bounds[1] == "]" else (lambda p, hi: p < hi)
    want = {(i, j) for i, p in enumerate(ps)
            for j, (lo, hi) in enumerate(ivs)
            if lo_ok(p, lo) and hi_ok(p, hi)}
    got = {(r["pid"], r["iid"]) for r in jn.range_join(
        pdf, idf, "p", "lo", "hi", bounds=bounds, bucket=bucket).collect()}
    assert got == want


@given(xs=_rows, ys=_rows)
@_SET_SETTINGS
def test_dataset_diff_matches_counter_delta(spark, xs, ys):
    from tech_ml_dataset_spark.operators import setops as so

    a = spark.createDataFrame(xs, "i int, s string") if xs else \
        spark.createDataFrame([], "i int, s string")
    b = spark.createDataFrame(ys, "i int, s string") if ys else \
        spark.createDataFrame([], "i int, s string")
    ca, cb = collections.Counter(xs), collections.Counter(ys)
    want = {k: (ca[k], cb[k], ca[k] - cb[k])
            for k in set(ca) | set(cb) if ca[k] != cb[k]}
    got = {(r["i"], r["s"]): (r["n_left"], r["n_right"], r["delta"])
           for r in so.dataset_diff(a, b).collect()}
    assert got == want


@given(toks=hs.lists(hs.integers(0, 12), min_size=1, max_size=12),
       budget=hs.integers(1, 10))
@_SET_SETTINGS
def test_pack_sequences_matches_python_next_fit(spark, toks, budget):
    from tech_ml_dataset_spark.functions import text as txt

    df = spark.createDataFrame(
        [(i, "g", t) for i, t in enumerate(toks)],
        "doc_id int, grp string, n_tokens long")
    got = {r["doc_id"]: r["pack_id"] for r in txt.pack_sequences(
        df, budget, by="grp", order_by="doc_id").collect()}

    pack, fill, want = 0, 0, {}
    for i, t in enumerate(toks):
        if fill > 0 and fill + t > budget:
            pack, fill = pack + 1, 0
        fill += t
        want[i] = pack
    assert got == want
    # invariants: pack ids contiguous from 0; no pack exceeds budget
    # unless exactly one POSITIVE-token (oversized) row caused it —
    # zero-token rows occupy no budget and may share any pack
    by_pack = collections.Counter(got.values())
    assert sorted(by_pack) == list(range(len(by_pack)))
    for p in by_pack:
        members = [toks[i] for i, q in got.items() if q == p]
        positive = [t for t in members if t > 0]
        assert sum(members) <= budget or len(positive) == 1


_texts = hs.lists(
    hs.text(alphabet="ab \n.", min_size=0, max_size=40),
    min_size=1, max_size=5)


@given(ts=_texts)
@_SET_SETTINGS
def test_repetition_fracs_bounded(spark, ts):
    """Every repetition signal is in [0, 1] (or NULL only for NULL text)."""
    from tech_ml_dataset_spark.functions import text as txt
    df = spark.createDataFrame(list(enumerate(ts)), "doc_id int, text string")
    out = txt.repetition_signals(df, top_ngram_ns=(2,), dup_ngram_ns=(3,))
    for r in out.collect():
        for c in ("dup_line_frac", "dup_line_char_frac", "dup_para_frac",
                  "dup_para_char_frac", "top_2gram_char_frac",
                  "dup_3gram_char_frac"):
            v = r[c]
            assert v is not None and 0.0 <= v <= 1.0, (c, v, r)


@given(ts=hs.lists(hs.text(alphabet="abc ", min_size=0, max_size=30),
                   min_size=1, max_size=4))
@_SET_SETTINGS
def test_bpe_segmentation_is_lossless(spark, ts):
    """Encoding never loses characters: joining subwords and restoring
    spaces at </w> boundaries reconstructs the whitespace-normalized
    text, for ANY merge table trained on any corpus."""
    from tech_ml_dataset_spark.functions import text as txt
    df = spark.createDataFrame(list(enumerate(ts)), "doc_id int, text string")
    merges = txt.bpe_train(df, n_merges=8)
    for r in txt.bpe_encode(df, merges).collect():
        want = " ".join((ts[r["doc_id"]] or "").split())
        got = "".join(r["bpe_tokens"]).replace("</w>", " ").strip()
        assert got == want


@given(xs=hs.lists(hs.floats(allow_nan=True, allow_infinity=True,
                             width=64),
                   min_size=1, max_size=12),
       digits=hs.integers(1, 10))
@_SET_SETTINGS
def test_format_sequence_uniform_width(xs, digits):
    """All rendered strings in a sequence share one width (the aligned-
    column contract), and finite values round-trip within precision."""
    from tech_ml_dataset_spark.functions.format_sequence import \
        format_sequence
    out = format_sequence(xs, digits)
    widths = {len(s) for s in out}
    assert len(widths) == 1, (xs, out)


@given(hs.lists(hs.text(alphabet="ab-", min_size=1, max_size=4),
                min_size=1, max_size=8))
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_unique_headers_properties(cols):
    """_unique_headers invariants under BOTH suffix laws: output is
    always unique, same length, non-duplicated names survive verbatim,
    and first-occurrence names survive under the excel law."""
    from tech_ml_dataset_spark.sources.io import _unique_headers

    for suffix_all in (False, True):
        out = _unique_headers(cols, True, suffix_all=suffix_all)
        assert len(out) == len(cols)
        assert len(set(out)) == len(out)
        for c, o in zip(cols, out):
            if cols.count(c) == 1:
                assert o == c
        if not suffix_all:
            seen = set()
            for c, o in zip(cols, out):
                if c not in seen:
                    assert o == c
                    seen.add(c)
    if len(set(cols)) != len(cols):
        import pytest as _pt
        with _pt.raises(ValueError, match="duplicate"):
            _unique_headers(cols, False)


@given(hs.lists(hs.text(alphabet="abc", min_size=1, max_size=3),
                min_size=0, max_size=9),
       hs.integers(min_value=2, max_value=5))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_word_shingles_match_python_law(spark, words, k):
    """Word-mode shingles match the brute-force law on every doc length,
    INCLUDING the sub-k partial-gram case the oracles encode via the
    clamping slice (r4 review regression)."""
    from tech_ml_dataset_spark.functions import dedup as dd

    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    got = df.select(
        dd.shingles(F.col("text"), k, mode="word").alias("s")
    ).collect()[0]["s"]
    toks = text.lower().split()
    if not toks:
        expect = []
    elif len(toks) < k:
        expect = [" ".join(toks)]
    else:
        expect = list(dict.fromkeys(
            " ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)))
    assert got == expect


_docs = hs.lists(hs.text(alphabet="ab c", min_size=0, max_size=24),
                 min_size=1, max_size=8)


@given(ts=_docs, q=hs.text(alphabet="abc ", min_size=1, max_size=8))
@_SET_SETTINGS
def test_bm25_matches_python_oracle(spark, ts, q):
    """BM25 scores against a direct pure-Python Okapi implementation on
    random corpora/queries: same doc set (score > 0 only), same scores."""
    import math

    from hypothesis import assume
    from tech_ml_dataset_spark.functions import text as txt

    terms = sorted({t for t in q.lower().split() if t})
    assume(terms)
    k1, b = 1.2, 0.75
    docs = [(i, t) for i, t in enumerate(ts)]
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    lens = {i: len(tk) for i, tk in toks.items()}
    nonempty = [lv for lv in lens.values() if lv > 0]
    want = {}
    if nonempty:
        avgdl = sum(nonempty) / len(nonempty)
        dfreq = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
        for i, tk in toks.items():
            s = 0.0
            for t in terms:
                tf = tk.count(t)
                idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
                s += idf * tf / (tf + k1 * (1 - b + b * lens[i] / avgdl))
            if s > 0:
                want[i] = s
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["score"]
           for r in txt.bm25_search(df, q, k1=k1, b=b).collect()}
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i] - want[i]) < 1e-9 * max(1.0, abs(want[i]))


@given(hs.lists(hs.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
                min_size=0, max_size=40))
@_codec_settings(200)
def test_avro_zigzag_varint_roundtrip(values):
    """The vendored Avro codec's long encoding (zigzag varint) must
    round-trip the full signed 64-bit domain — including the -2^63 edge
    where (n << 1) ^ (n >> 63) relies on Python's arbitrary-precision
    two's-complement semantics."""
    from tech_ml_dataset_spark.sources import avro as av

    buf = bytearray()
    for v in values:
        av._write_long(buf, v)
    pos = 0
    got = []
    for _ in values:
        v, pos = av._read_long(bytes(buf), pos)
        got.append(v)
    assert got == values and pos == len(buf)


@given(hs.lists(
    hs.tuples(
        hs.one_of(hs.none(),
                  hs.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1)),
        hs.one_of(hs.none(), hs.floats(allow_nan=False,
                                       allow_infinity=True)),
        hs.one_of(hs.none(), hs.text(max_size=40)),
        hs.one_of(hs.none(), hs.binary(max_size=40)),
        hs.one_of(hs.none(), hs.booleans())),
    min_size=1, max_size=30))
@_codec_settings(50)
def test_avro_value_block_roundtrip(rows):
    """Driver-side OCF block encode/decode over the nullable primitive
    kinds: arbitrary unicode strings (incl. quote/NUL-bearing), raw
    bytes, ±inf doubles, full-range longs, NULLs anywhere."""
    from tech_ml_dataset_spark.sources import avro as av

    kinds = ["long", "double", "string", "bytes", "boolean"]
    buf = bytearray()
    for row in rows:
        for kind, v in zip(kinds, row):
            av._encode_value(buf, kind, v)
    data, pos = bytes(buf), 0
    got = []
    for _ in rows:
        out = []
        for kind in kinds:
            v, pos = av._decode_value(data, pos, kind)
            out.append(bytes(v) if isinstance(v, bytearray) else v)
        got.append(tuple(out))
    assert got == list(map(tuple, rows)) and pos == len(data)

    # r8 (ADVICE): NON-union fields — no branch varint on the wire; the
    # same rows with NULLs stripped round-trip with nullable=False and
    # encode STRICTLY SHORTER (the branch byte per non-null cell)
    solid = [tuple((0 if k == "long" else 0.0 if k == "double"
                    else "" if k == "string" else b""
                    if k == "bytes" else False) if v is None else v
                   for k, v in zip(kinds, row)) for row in rows]
    nbuf = bytearray()
    for row in solid:
        for kind, v in zip(kinds, row):
            av._encode_value(nbuf, kind, v, nullable=False)
    ndata, pos = bytes(nbuf), 0
    ngot = []
    for _ in solid:
        out = []
        for kind in kinds:
            v, pos = av._decode_value(ndata, pos, kind, nullable=False)
            out.append(bytes(v) if isinstance(v, bytearray) else v)
        ngot.append(tuple(out))
    assert ngot == solid and pos == len(ndata)
    # and a NULL into a non-union field raises, never mis-encodes
    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-nullable"):
        av._encode_value(bytearray(), "long", None, nullable=False)


@given(hs.lists(hs.text(
    alphabet=hs.characters(min_codepoint=0x20, max_codepoint=0xFF),
    max_size=60), min_size=0, max_size=8),
    hs.sampled_from([True, False, "lzw", "a85", "a85+flate",
                     "flate+pred", "flate+tiff"]))
@_codec_settings(60)
@example(
    lines=['56B]m\x83\x86\x93\x9f§Ø'],
    compress=True,
).via('discovered failure')
def test_pdf_build_extract_roundtrip_property(lines, compress):
    """Any latin-1 printable line set round-trips through
    build_pdf -> extract_text (escape handling for ( ) \\ included)
    across every stream encoding: raw, Flate, LZW, ASCII85, the
    A85+Flate chain, and the r9 PNG/TIFF predictor'd Flate modes."""
    from tech_ml_dataset_spark.functions import pdf

    data = pdf.build_pdf(lines, compress=compress)
    assert pdf.extract_text(data) == "\n".join(lines)


@given(hs.lists(hs.text(
    alphabet=hs.characters(min_codepoint=0x20, max_codepoint=0x2FFF),
    max_size=40), min_size=0, max_size=6),
    hs.booleans(), hs.booleans())
@_codec_settings(60)
def test_pdf_differences_roundtrip_property(lines, compress, indirect):
    """r9: any text (BMP range incl. non-Latin) whose distinct-char
    count fits 224 one-byte codes round-trips through the legacy
    /Encoding /Differences builder and the AGL/uniXXXX name
    resolution, inline and indirect encoding objects."""
    from tech_ml_dataset_spark.functions import pdf

    if len({c for ln in lines for c in ln}) > 224:
        return
    data = pdf.build_pdf_differences(lines, compress=compress,
                                     indirect_encoding=indirect)
    assert pdf.extract_text(data) == "\n".join(lines)


@given(hs.binary(max_size=300),
       hs.text(alphabet=hs.characters(min_codepoint=0x21,
                                      max_codepoint=0x7E), min_size=1,
               max_size=40),
       hs.sampled_from([None, "gzip", "x-gzip", "deflate"]),
       hs.booleans(), hs.integers(1, 64))
@_codec_settings(60)
def test_warc_record_roundtrip_property(payload, uri, cenc, chunked,
                                        chunk_size):
    """Arbitrary binary payloads (incl. CRLF-bearing and empty) frame
    and parse back exactly through the WARC record builder — the
    Content-Length discipline, not delimiters, bounds the body — under
    every HTTP framing combination (r9: Transfer-Encoding: chunked,
    Content-Encoding gzip/x-gzip/deflate, both stacked)."""
    from tech_ml_dataset_spark.sources import warc

    rec = warc.build_record("https://" + uri, "2024-01-01T00:00:00Z",
                            payload, content_encoding=cenc,
                            transfer_chunked=chunked,
                            chunk_size=chunk_size)
    [(headers, body)] = list(warc._parse_records(rec))
    assert headers["warc-target-uri"] == "https://" + uri
    status, ctype, inner, decoded = warc._split_http(body)
    assert status == 200 and inner == payload and decoded is True
    # two concatenated records parse as two (framing never bleeds)
    assert len(list(warc._parse_records(rec + rec))) == 2


@given(docs=hs.lists(hs.lists(hs.sampled_from("abcde"),
                              min_size=0, max_size=12),
                     min_size=1, max_size=5),
       k=hs.integers(2, 4))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_exact_substring_dedup_matches_python(spark, docs, k):
    """ExactSubstr law vs a transparent pure-Python oracle over tiny
    random corpora: canonical (lowest id, pos) occurrence per k-window
    survives; every other occurrence's k positions are marked; marks
    union; docs rebuild from unmarked tokens."""
    import collections

    from tech_ml_dataset_spark.functions import dedup as dd

    first = {}
    for i, toks in enumerate(docs):
        for p in range(max(0, len(toks) - k + 1)):
            first.setdefault(tuple(toks[p:p + k]), (i, p))
    marks = collections.defaultdict(set)
    for i, toks in enumerate(docs):
        for p in range(max(0, len(toks) - k + 1)):
            if first[tuple(toks[p:p + k])] != (i, p):
                marks[i].update(range(p, p + k))
    want = {i: " ".join(t for j, t in enumerate(toks)
                        if j not in marks[i])
            for i, toks in enumerate(docs)}

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id int, text string")
    got = {r["doc_id"]: r["text"]
           for r in dd.exact_substring_dedup(df, k=k).collect()}
    assert got == want


@given(paths=hs.lists(
    hs.text(alphabet=hs.characters(min_codepoint=0x20,
                                   max_codepoint=0x7E),
            min_size=0, max_size=20),
    min_size=1, max_size=12))
@_codec_settings(60)
def test_cdx_index_roundtrip_property(paths):
    """Any printable-ASCII URL paths survive the CDX cycle: build a
    member-per-record archive, write its CDXJ index (canonical
    %-encoded SURT keys keep the space-delimited line format parseable),
    read the index back — the triples equal the member index exactly,
    for gzip'd and plain index files."""
    import os
    import tempfile
    import zlib as z

    from tech_ml_dataset_spark.sources import warc

    d = tempfile.mkdtemp(prefix="cdx_prop_")
    try:
        arc = os.path.join(d, "a.warc.gz")
        with open(arc, "wb") as f:
            for i, p in enumerate(paths):
                rec = warc.build_record(
                    f"https://ex{i % 3}.org/{p}",
                    "2026-08-16T00:00:00Z", b"x %d" % i)
                co = z.compressobj(6, z.DEFLATED, 31)
                f.write(co.compress(rec) + co.flush())
        want = sorted(warc.warc_member_index(arc))
        for gz in (True, False):
            idx = os.path.join(d, "i.cdx.gz" if gz else "i.cdx")
            n = warc.build_cdx_index(arc, idx, compress=gz)
            assert n == len(paths)
            got = sorted(warc.read_cdx_index(idx))
            assert got == want
    finally:
        import shutil
        shutil.rmtree(d, ignore_errors=True)


@given(samples=hs.lists(hs.integers(-32768, 32767),
                        min_size=0, max_size=400),
       sub=hs.sampled_from(["verbatim", "fixed0", "fixed1", "fixed2",
                            "fixed3", "fixed4"]),
       block=hs.sampled_from([64, 100, 256]),
       stereo=hs.sampled_from(["indep", "left_side", "right_side",
                               "mid_side"]))
@_codec_settings(60)
def test_flac_roundtrip_property(samples, sub, block, stereo):
    """Any int16 sample sequence round-trips losslessly through the
    vendored FLAC codec for every fixture subframe type, block size,
    and stereo assignment (mono when the list is odd-length)."""
    import numpy as np

    from tech_ml_dataset_spark.functions import flac

    arr = np.asarray(samples, dtype=np.int64)
    if len(arr) == 0:
        return
    if len(arr) % 2 == 0 and len(arr) >= 2:
        arr = arr.reshape(-1, 2)
        mode = stereo
    else:
        mode = "indep"
    out = flac.decode(flac.encode(arr, subframe=sub, block_size=block,
                                  stereo_mode=mode))[3]
    want = arr if arr.ndim == 2 else arr[:, None]
    assert (out == want).all()


@given(hs.text(alphabet=hs.sampled_from("/abπ.?*$%"), max_size=12),
       hs.text(alphabet=hs.sampled_from("/abπ.?$%"), max_size=16))
@_codec_settings(120)
def test_robots_pattern_regex_property(pattern, path):
    """r9: the RFC 9309 wildcard translation agrees with a transparent
    recursive reference matcher on arbitrary pattern/path pairs —
    '*' spans anything, a FINAL '$' anchors the end, every other char
    (regex metachars included) is literal, match is prefix-anchored."""
    import re as _re

    from tech_ml_dataset_spark.functions import robots as rb

    def ref_match(pat: str, s: str) -> bool:
        anchored = pat.endswith("$")
        if anchored:
            pat = pat[:-1]

        def walk(pi: int, si: int) -> bool:
            if pi == len(pat):
                return si == len(s) if anchored else True
            if pat[pi] == "*":
                return any(walk(pi + 1, k) for k in range(si, len(s) + 1))
            return (si < len(s) and s[si] == pat[pi]
                    and walk(pi + 1, si + 1))

        return walk(0, 0)

    got = _re.search(rb._pattern_regex(pattern), path) is not None
    assert got == ref_match(pattern, path), (pattern, path)


@given(hs.lists(hs.tuples(
    hs.text(alphabet=hs.characters(min_codepoint=0x21, max_codepoint=0x7E,
                                   exclude_characters="<>&'\""),
            min_size=1, max_size=30),
    hs.one_of(hs.none(), hs.sampled_from(["2024-01-02", "2025-12-31"])),
    hs.one_of(hs.none(), hs.sampled_from(["daily", "weekly"])),
    hs.one_of(hs.none(), hs.floats(0, 1).map(lambda x: round(x, 1)))),
    min_size=1, max_size=10),
    hs.booleans())
@_codec_settings(60)
def test_sitemap_roundtrip_property(entries, index):
    """r9: law-built urlset/sitemapindex XML parses back to exactly the
    entries that went in (optional fields None when absent; index
    documents carry loc+lastmod only)."""
    from tech_ml_dataset_spark.functions import robots as rb

    tag, etag = (("sitemapindex", "sitemap") if index
                 else ("urlset", "url"))
    parts = [f"<{tag} xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"]
    for loc, lastmod, freq, pr in entries:
        parts.append(f"<{etag}><loc>{loc}</loc>")
        if lastmod:
            parts.append(f"<lastmod>{lastmod}</lastmod>")
        if not index and freq:
            parts.append(f"<changefreq>{freq}</changefreq>")
        if not index and pr is not None:
            parts.append(f"<priority>{pr}</priority>")
        parts.append(f"</{etag}>")
    parts.append(f"</{tag}>")
    got = rb.parse_sitemap_text("".join(parts))
    want = [(loc, lastmod,
             None if index else freq,
             None if index or pr is None else pr,
             index)
            for loc, lastmod, freq, pr in entries]
    assert got == want


@given(hs.binary(max_size=600), hs.integers(2, 7),
       hs.sampled_from(["response", "resource"]))
@_codec_settings(60)
def test_warc_segment_assembly_property(payload, segments, rtype):
    """r10: WARC 1.1 segment assembly round-trips any payload at any
    split count — the merged record carries the full block (HTTP
    parsed for response types), segment headers are stripped, and
    Content-Length is rewritten; dropping the final segment always
    raises (truncated run, never a partial payload)."""
    from tech_ml_dataset_spark.sources import warc

    segs = warc.build_segmented_record(
        "https://p.ex.com/x", "2024-01-01T00:00:00Z", payload,
        segments=segments, rtype=rtype)
    blob = b"".join(segs)
    [(headers, block)] = list(
        warc._assemble_segments(warc._parse_records(blob)))
    assert "warc-segment-number" not in headers
    assert int(headers["content-length"]) == len(block)
    if rtype == "response":
        status, _, body, ok = warc._split_http(block)
        assert (status, ok, body) == (200, True, payload)
    else:
        assert block == payload
    if len(segs) > 1:
        import pytest

        with pytest.raises(ValueError, match="mid-segment"):
            list(warc._assemble_segments(
                warc._parse_records(b"".join(segs[:-1]))))
