"""Web-crawl text refinement: HTML extraction + the C4 filter battery.

The stages a crawl corpus passes through before the dedup/quality
operators in :mod:`text` and :mod:`dedup` ever see it (Raffel et al.
2020, "Exploring the Limits of Transfer Learning" — the C4 pipeline;
Penedo et al. 2023 RefinedWeb uses the same shape): strip markup, keep
only prose-like lines, drop junk pages, and remove every repeated
three-sentence span corpus-wide.

Everything here is native ``pyspark.sql.functions`` string/array/lambda
expressions — JVM-side, whole-stage-codegen'd, zero Python stages — so
one scan streams 100 TB of raw crawl. The regex vocabulary is restricted
to the Java-regex ∩ RE2 common subset (inline ``(?is)`` flags, lazy
quantifiers, alternation, classes; NO backreferences, NO lookaround) so
every law replays verbatim in the DuckDB oracles.

Reference analog: none — tech.ml.dataset has no web-text surface; this
is driver-mandate training-pipeline function, same tier as text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------------------
# HTML -> text
# ---------------------------------------------------------------------------

#: Explicit whitespace class shared by BOTH regex chains: Java's ``\s``
#: includes ``\x0B`` (vertical tab) while RE2's does not, so a bare
#: ``\s`` would let the Spark chain and the DuckDB oracle drift on
#: vertical-tab input. Spelling the class out keeps the two engines
#: byte-identical (the module's Java-regex ∩ RE2 common-subset law).
_WS = r"[ \t\n\x0B\f\r]"

#: Block-level closers/voids rewritten to a newline BEFORE tags are
#: stripped, so paragraph structure survives as line structure.
_BLOCK_BREAK = (rf"(?i)<br{_WS}*/?>|<hr{_WS}*/?>"
                r"|</(?:p|div|h[1-6]|li|tr|ul|ol|table|blockquote|section"
                rf"|article|header|footer|pre){_WS}*>")

#: Entity decode order is part of the law: named entities first,
#: ``&amp;`` LAST, so ``&amp;lt;`` decodes to the literal ``&lt;`` (one
#: pass, no re-scan) exactly like a single-pass SGML decoder.
_ENTITIES = (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"))


def html_to_text(html: Column) -> Column:
    """Extract visible text from an HTML payload — the fixed-order law:

    1. drop comments ``(?s)<!--.*?-->``;
    2. drop ``<script>``/``<style>`` elements INCLUDING content
       (two separate lazy-dotall replaces — RE2 has no backreferences,
       so the closing tag cannot be matched with ``</\\1>``);
    3. rewrite block closers / ``<br>`` / ``<hr>`` to ``\\n``;
    4. strip every remaining tag to a space;
    5. decode the five named entities, ``&amp;`` last;
    6. normalize whitespace: any run containing a newline collapses to
       one ``\\n``, other runs to one space, then strip the ends.

    Pure Catalyst — six ``regexp_replace`` + five ``replace`` over one
    projection; at 100 TB this is a map-only pass fused into the scan.

    The stripper is deliberately NOT an HTML parser: a ``<...>`` span in
    prose ("1 < 2 and 3 > 2") is stripped like a tag, while a ``<`` with
    no later ``>`` survives — the standard regex-extraction tradeoff,
    pinned in tests and replayed identically by the oracle.
    """
    c = F.regexp_replace(html, r"(?s)<!--.*?-->", "")
    c = F.regexp_replace(c, rf"(?is)<script\b[^>]*>.*?</script{_WS}*>", "")
    c = F.regexp_replace(c, rf"(?is)<style\b[^>]*>.*?</style{_WS}*>", "")
    c = F.regexp_replace(c, _BLOCK_BREAK, "\n")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, rf"[ \t\x0B\f\r]*\n{_WS}*", "\n")
    c = F.regexp_replace(c, r"[ \t\x0B\f\r]+", " ")
    return F.regexp_replace(c, rf"^{_WS}+|{_WS}+$", "")


def html_to_text_sql(expr: str) -> str:
    """The DuckDB replay of :func:`html_to_text` (oracle builder) —
    kept adjacent to the Spark law so the two chains cannot drift."""
    # DuckDB ''-literals pass backslashes through to RE2 verbatim, so the
    # shared class constants are inserted as-is (same chars both engines).
    ws = _WS
    c = f"regexp_replace({expr}, '(?s)<!--.*?-->', '', 'g')"
    c = f"regexp_replace({c}, '(?is)<script\\b[^>]*>.*?</script{ws}*>', '', 'g')"
    c = f"regexp_replace({c}, '(?is)<style\\b[^>]*>.*?</style{ws}*>', '', 'g')"
    c = f"regexp_replace({c}, '{_BLOCK_BREAK}', chr(10), 'g')"
    c = f"regexp_replace({c}, '<[^>]*>', ' ', 'g')"
    for ent, ch in _ENTITIES:
        lit = ch.replace("'", "''")
        c = f"replace({c}, '{ent}', '{lit}')"
    c = f"regexp_replace({c}, '[ \\t\\x0B\\f\\r]*\\n{ws}*', chr(10), 'g')"
    c = f"regexp_replace({c}, '[ \\t\\x0B\\f\\r]+', ' ', 'g')"
    return f"regexp_replace({c}, '^{ws}+|{ws}+$', '', 'g')"


# ---------------------------------------------------------------------------
# C4 page/line filters
# ---------------------------------------------------------------------------

_TERMINAL = r'[.!?"]$'


def c4_clean_lines(text: Column, *, min_words: int = 5) -> Column:
    """C4's line filter (Raffel 2020 §2.2): keep only lines that, after
    trimming, (a) end in a terminal punctuation mark, (b) contain at
    least ``min_words`` whitespace words, and (c) do not mention
    "javascript" (case-insensitive); rejoin survivors with ``\\n``.

    One ``filter()`` lambda over ``split`` — array expression, no
    explode, no shuffle: the 100 TB shape is scan-fused."""
    kept = F.filter(
        F.transform(F.split(text, r"\n"), F.trim),
        lambda l: (F.length(l) > 0)
        & l.rlike(_TERMINAL)
        & (F.size(F.split(l, r"\s+")) >= min_words)
        & ~F.lower(l).contains("javascript"))
    return F.array_join(kept, "\n")


def c4_filters(df: DataFrame, text_col: str = "text", *,
               badwords: tuple = (), min_words: int = 5,
               min_sentences: int = 3, clean_col: str = "c4_text",
               keep_col: str = "c4_keep") -> DataFrame:
    """The C4 page battery on top of :func:`c4_clean_lines`: adds
    ``clean_col`` (line-filtered text), ``c4_n_sentences`` (terminal
    punctuation marks in the cleaned text — C4 counts sentences on the
    RETAINED lines), and ``keep_col``, true iff

    * the cleaned page still has >= ``min_sentences`` sentences,
    * the ORIGINAL page has no "lorem ipsum" (placeholder spill), no
      ``{`` (leaked source code), and no word from ``badwords``
      (word-boundary, case-insensitive — pass the deployment blocklist;
      the default is empty because the real LDNOOBW list is a policy
      choice, not a library constant).

    Everything is one projection of Column expressions — composable with
    :func:`tech_ml_dataset_spark.functions.text.filter_funnel` for
    per-rule loss accounting."""
    t = F.col(text_col)
    clean = c4_clean_lines(t, min_words=min_words)
    # n_sent/keep read the PROJECTED clean column, not the clean
    # expression: inlined, the whole line filter re-ran for the sentence
    # count and again for the keep flag — 3 evaluations per row
    # (interpreted HOF trees have no CSE; r11). CollapseProject keeps
    # the projection boundary (multi-referenced non-cheap alias).
    n_sent = F.size(F.regexp_extract_all(F.col(clean_col),
                                         F.lit(r"[.!?]"), F.lit(0)))
    keep = (F.col("c4_n_sentences") >= min_sentences) \
        & ~F.lower(t).contains("lorem ipsum") \
        & ~t.contains("{")
    if badwords:
        # Escape every entry: a blocklist word with regex metacharacters
        # ('c++', 'a.b') would otherwise break the pattern or silently
        # widen the match ('a.b' hitting 'aXb'). Per-char backslash
        # escaping of everything outside [A-Za-z0-9 _'] is unambiguous
        # in the Java-regex ∩ RE2 common subset. Delimiter guards are
        # explicit (?:^|\W)..(?:\W|$) rather than \b: for word-edged
        # entries they're existence-equivalent to \b, and for entries
        # ending in a metacharacter ('c++') a trailing \b can NEVER
        # match ('+' and ' ' are both non-word), silently disabling the
        # rule. \W is [^0-9A-Za-z_] in both engines.
        def esc(w: str) -> str:
            return "".join(ch if ch.isalnum() or ch in " _'"
                           else "\\" + ch for ch in w)
        pat = ("(?i)(?:^|\\W)(" + "|".join(esc(w) for w in badwords)
               + ")(?:\\W|$)")
        keep = keep & ~t.rlike(pat)
    return (df.withColumn(clean_col, clean)
              .withColumn("c4_n_sentences", n_sent)
              .withColumn(keep_col, keep))


# ---------------------------------------------------------------------------
# C4 three-sentence-span corpus dedup
# ---------------------------------------------------------------------------

#: Sentence splitter without lookbehind (RE2 subset): terminal punct +
#: whitespace becomes punct + US (unit separator), then split on US.
_SENT_MARK = "\x1e"


def sentence_array(text: Column) -> Column:
    """Deterministic sentence split: ``([.!?])\\s+`` -> ``$1\\x1e`` then
    split on ``\\x1e``; trimmed, empties dropped. Lookbehind-free so the
    identical law runs under RE2 in the oracle."""
    marked = F.regexp_replace(text, r"([.!?])\s+", "$1" + _SENT_MARK)
    return F.filter(F.transform(F.split(marked, _SENT_MARK), F.trim),
                    lambda s: F.length(s) > 0)


def c4_span_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", *, span: int = 3,
                  out_col: str | None = None) -> DataFrame:
    """C4's "remove all but one of any three-sentence span occurring
    more than once in the data set" (Raffel 2020 §2.2), corpus-wide:

    1. sentence arrays per doc (:func:`sentence_array`, scan-fused);
    2. every consecutive ``span``-sentence window posexplodes to a SLIM
       ``(id, pos, md5(span))`` row — the sentence arrays themselves
       never cross an exchange, only 32-char hashes do;
    3. the canonical occurrence per hash is elected by a partial-
       aggregable ``min(struct(id, pos))`` + join (r8: hot boilerplate
       spans combine map-side instead of funneling one window reducer);
    4. every NON-canonical occurrence marks its ``span`` sentence
       indices; the removal sets groupBy back to doc grain (small:
       bounded by duplicate volume, not corpus volume);
    5. docs rebuild from unmarked sentences (index-aware ``filter()``
      lambda), joined ``" "``.

    The rebuilt text is the normalized form (single-space sentence
    joins) — documented law, replayed by the oracle. At 100 TB the cost
    profile is: one corpus scan, one hash-keyed exchange of slim span
    rows, one duplicate-bounded groupBy — the same shape the published
    C4/RefinedWeb pipelines run at web scale."""
    out_col = out_col or text_col
    sent = df.select(F.col(id_col), sentence_array(F.col(text_col))
                     .alias("__s__"))
    n = F.size("__s__")
    spans = sent.select(
        id_col,
        F.posexplode(
            F.when(n >= span,
                   F.transform(F.sequence(F.lit(0), n - span),
                               lambda i: F.md5(F.array_join(
                                   F.slice("__s__", i + 1, span), " "))))
             .otherwise(F.array().cast("array<string>"))
        ).alias("__pos__", "__h__"))
    # canonical occurrence per hash = min(struct(id, pos)): a PARTIAL-
    # AGGREGABLE reduction rather than a row_number window — a
    # boilerplate span shared by millions of pages combines map-side
    # instead of funneling through one window reducer (r8 skew
    # hardening; same shape as dedup.exact_substring_dedup)
    canon = spans.groupBy("__h__").agg(
        F.min(F.struct(F.col(id_col).alias("i"),
                       F.col("__pos__").alias("p"))).alias("__c__"))
    dup = (spans.join(canon, "__h__")
                .filter((F.col(id_col) != F.col("__c__.i"))
                        | (F.col("__pos__") != F.col("__c__.p"))))
    rm = (dup.select(id_col,
                     F.explode(F.sequence(F.col("__pos__"),
                                          F.col("__pos__") + (span - 1)))
              .alias("__ridx__"))
             .groupBy(id_col)
             .agg(F.collect_set("__ridx__").alias("__rm__")))
    rebuilt = (sent.join(rm, id_col, "left")
                   .select(id_col,
                           F.array_join(
                               F.filter("__s__",
                                        lambda x, i: F.col("__rm__").isNull()
                                        | ~F.array_contains("__rm__", i)),
                               " ").alias(out_col)))
    base = df.drop(out_col) if out_col != text_col else df.drop(text_col)
    return base.join(rebuilt, id_col, "left")


# ---------------------------------------------------------------------------
# URL-level quality filtering (the crawl stage BEFORE any content fetch)
# ---------------------------------------------------------------------------

def url_quality_signals(df: DataFrame, url_col: str = "url", *,
                        blocked_domains: tuple = (),
                        blocked_tlds: tuple = (),
                        max_url_len: int = 2048,
                        max_path_depth: int = 10,
                        max_params: int = 8,
                        keep_col: str = "url_keep") -> DataFrame:
    """URL-level quality battery (RefinedWeb §3.1 / C4 practice: filter
    on the URL BEFORE fetching or parsing anything — the cheapest
    possible rejection point in a crawl). Adds per-row signals plus
    ``keep_col``:

    * ``url_host`` — lowercased host, port stripped;
    * ``url_len``, ``url_path_depth``, ``url_n_params``,
      ``url_host_digit_frac``, ``url_n_subdomains``;
    * ``url_is_ip`` — dotted-quad host (link farms / C2 mirrors);
    * flag contributions: too long, too deep, too many query params,
      IP-literal host, digit-heavy host (>1/3), blocked domain
      (suffix-match against ``blocked_domains`` — the deployment
      blocklist is a policy input, like ``badwords``), blocked TLD.

    Pure Catalyst — one projection, Java-regex ∩ RE2 subset so oracles
    replay verbatim; NULL url -> NULL signals, keep=false. At 100 TB
    this runs in the crawl-frontier scan itself, no Python, no shuffle.
    Entries in both blocklists are escaped literally (the badwords
    lesson: 'co.uk' must not wildcard)."""
    u = F.col(url_col)
    # host: text after scheme up to first / ? # or :port
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1))
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    path_depth = F.when(F.length(path) > 0,
                        F.size(F.split(path, "/")) - 1).otherwise(0)
    n_params = F.when(F.length(query) > 0,
                      F.size(F.split(query, "&"))).otherwise(0)
    host_digits = F.length(F.regexp_replace(host, r"[^0-9]", ""))
    digit_frac = F.when(F.length(host) > 0,
                        host_digits / F.length(host)).otherwise(0.0)
    n_sub = F.when(F.length(host) > 0,
                   F.size(F.split(host, r"\.")) - 1).otherwise(0)
    is_ip = host.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")

    def esc(w: str) -> str:
        return "".join(ch if ch.isalnum() else "\\" + ch for ch in w)

    keep = (u.isNotNull()
            & (F.length(u) <= max_url_len)
            & (path_depth <= max_path_depth)
            & (n_params <= max_params)
            & ~is_ip
            & (digit_frac <= 1.0 / 3.0))
    if blocked_domains:
        # suffix match on a domain boundary: 'evil.com' blocks
        # 'evil.com' and 'a.evil.com', never 'notevil.com'
        pat = "(^|\\.)(" + "|".join(esc(d.lower())
                                    for d in blocked_domains) + ")$"
        keep = keep & ~host.rlike(pat)
    if blocked_tlds:
        tpat = "\\.(" + "|".join(esc(t.lower().lstrip("."))
                                 for t in blocked_tlds) + ")$"
        keep = keep & ~host.rlike(tpat)
    return (df.withColumn("url_host", host)
              .withColumn("url_len", F.length(u))
              .withColumn("url_path_depth", path_depth)
              .withColumn("url_n_params", n_params)
              .withColumn("url_host_digit_frac",
                          F.round(digit_frac, 4))
              .withColumn("url_n_subdomains", n_sub)
              .withColumn("url_is_ip", is_ip)
              .withColumn(keep_col, F.coalesce(keep, F.lit(False))))
