"""webtext.py laws: HTML extraction, C4 filters, span dedup."""

import pytest
from pyspark.sql import Row, functions as F

from tech_ml_dataset_spark.functions import webtext as wt


def _one(spark, html):
    return spark.createDataFrame([Row(t=html)]) \
                .select(wt.html_to_text(F.col("t")).alias("x")) \
                .collect()[0]["x"]


class TestHtmlToText:
    def test_basic_page(self, spark):
        out = _one(spark, "<html><body><h1>Title</h1>"
                          "<p>Hello world</p><p>Second para</p></body></html>")
        assert out == "Title\nHello world\nSecond para"

    def test_script_and_style_content_dropped(self, spark):
        # the '<' inside the script must not terminate the element drop
        out = _one(spark, "<p>a</p><script>if (1 < 2) { x(); }</script>"
                          "<style>p {color:red}</style><p>b</p>")
        assert out == "a\nb"

    def test_comment_dropped_across_lines(self, spark):
        # comments are dropped to EMPTY (not a space), per the law
        assert _one(spark, "x<!-- multi\nline\ncomment -->y") == "xy"

    def test_entity_decode_order(self, spark):
        # &amp;lt; is DOUBLE-encoded: single-pass decode yields literal &lt;
        assert _one(spark, "a &amp;lt; b &lt; c &amp; d") == "a &lt; b < c & d"

    def test_nbsp_and_quotes(self, spark):
        assert _one(spark, "a&nbsp;b &quot;c&quot; &#39;d&#39;") \
            == 'a b "c" \'d\''

    def test_br_and_block_closers_break_lines(self, spark):
        assert _one(spark, "a<br>b<br/>c</div>d") == "a\nb\nc\nd"

    def test_whitespace_normalization(self, spark):
        assert _one(spark, "  a   b  \n\n\n  c  ") == "a b\nc"

    def test_vertical_tab_engine_parity(self, spark):
        """r6 advice: a bare regex \\s includes \\x0B under Java but not
        RE2, so the Spark chain and the DuckDB oracle drifted on
        vertical-tab input. Both now spell the class out — assert the
        two chains agree byte-for-byte on \\x0B (and \\f) payloads."""
        import duckdb

        payloads = ["a \x0b b<br>\x0b c", "x\x0b", "\x0by",
                    "a\fb", " \x0b \f <p>t</p> \x0b "]
        got_spark = [_one(spark, p) for p in payloads]
        con = duckdb.connect()
        got_duck = [con.execute(
            "SELECT " + wt.html_to_text_sql("$1"), [p]).fetchone()[0]
            for p in payloads]
        assert got_spark == got_duck

    def test_angle_brackets(self, spark):
        # '<...>' spans ARE treated as tags even in prose (documented
        # law: the stripper is not an HTML parser) ...
        assert _one(spark, "1 < 2 and 3 > 2") == "1 2"
        # ... but a '<' with no later '>' survives
        assert _one(spark, "1 < 2 with no close") == "1 < 2 with no close"


class TestC4Lines:
    @pytest.fixture()
    def clean(self, spark):
        def run(text, **kw):
            return spark.createDataFrame([Row(t=text)]) \
                        .select(wt.c4_clean_lines(F.col("t"), **kw)
                                 .alias("x")).collect()[0]["x"]
        return run

    def test_terminal_punct_required(self, clean):
        assert clean("one two three four five\n"
                     "one two three four five.") == "one two three four five."

    def test_min_words(self, clean):
        assert clean("too short line.\n"
                     "this line has exactly five words.") \
            == "this line has exactly five words."

    def test_javascript_line_dropped(self, clean):
        assert clean("Please enable JavaScript to view this site.\n"
                     "a perfectly fine prose sentence here.") \
            == "a perfectly fine prose sentence here."

    def test_quote_is_terminal(self, clean):
        assert clean('he said "five words right here"') \
            == 'he said "five words right here"'


class TestC4Filters:
    def _df(self, spark, rows):
        return spark.createDataFrame([Row(doc_id=i, text=t)
                                      for i, t in enumerate(rows)])

    def test_page_rules(self, spark):
        good = ("a good first sentence right here.\n"
                "a good second sentence right here.\n"
                "a good third sentence right here.")
        out = wt.c4_filters(self._df(spark, [
            good,                                   # keeps
            good + "\nlorem ipsum dolor sit.",      # page-killer
            good + "\ncode { leaked }",             # brace page-killer
            "only one good sentence right here.",   # < 3 sentences
        ])).orderBy("doc_id").collect()
        assert [r["c4_keep"] for r in out] == [True, False, False, False]
        assert out[0]["c4_n_sentences"] == 3

    def test_badwords_word_boundary(self, spark):
        good = ("a good first sentence right here.\n"
                "a good second sentence right here.\n"
                "a good third sentence right here.")
        out = wt.c4_filters(self._df(spark, [
            good.replace("third", "BADWORD"),
            good.replace("third", "notBADWORDhere"),  # substring: no match
        ]), badwords=("badword",)).orderBy("doc_id").collect()
        assert [r["c4_keep"] for r in out] == [False, True]

    def test_badwords_metacharacters_escaped(self, spark):
        """r6 advice: 'c++' / 'a.b' style blocklist entries must match
        LITERALLY — unescaped they broke the pattern or silently widened
        the match ('a.b' matching 'aXb')."""
        good = ("a good first sentence right here.\n"
                "a good second sentence right here.\n"
                "a good third sentence right here.")
        out = wt.c4_filters(self._df(spark, [
            good.replace("third", "c++"),    # literal hit -> dropped
            good.replace("third", "ccc"),    # 'c++' as regex would match
            good.replace("third", "a.b"),    # literal hit -> dropped
            good.replace("third", "aXb"),    # '.' must not wildcard
        ]), badwords=("c++", "a.b")).orderBy("doc_id").collect()
        assert [r["c4_keep"] for r in out] == [False, True, False, True]

    def test_no_python_stage(self, spark):
        df = wt.c4_filters(self._df(spark, ["x."]))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


class TestSpanDedup:
    def test_sentence_array(self, spark):
        r = spark.createDataFrame([Row(t="One two. Three four! Five six? end")]) \
                 .select(wt.sentence_array(F.col("t")).alias("s")) \
                 .collect()[0]["s"]
        assert r == ["One two.", "Three four!", "Five six?", "end"]

    def test_no_punct_single_sentence(self, spark):
        r = spark.createDataFrame([Row(t="no punctuation at all")]) \
                 .select(wt.sentence_array(F.col("t")).alias("s")) \
                 .collect()[0]["s"]
        assert r == ["no punctuation at all"]

    def _dedup(self, spark, rows):
        df = spark.createDataFrame([Row(doc_id=i, text=t)
                                    for i, t in enumerate(rows)])
        return {r["doc_id"]: r["text"]
                for r in wt.c4_span_dedup(df).collect()}

    def test_full_copy_emptied(self, spark):
        doc = "s one alpha. s two beta. s three gamma."
        out = self._dedup(spark, [doc, doc])
        assert out[0] == "s one alpha. s two beta. s three gamma."
        assert out[1] == ""

    def test_partial_overlap_removes_span_sentences(self, spark):
        a = "s1 alpha. s2 beta. s3 gamma. s4 delta."
        # doc 1 shares the (s2,s3,s4) span only
        b = "intro unique. s2 beta. s3 gamma. s4 delta."
        out = self._dedup(spark, [a, b])
        assert out[0] == a.replace(". ", ". ").strip()  # canonical untouched
        assert out[1] == "intro unique."

    def test_short_docs_untouched(self, spark):
        out = self._dedup(spark, ["one. two.", "one. two."])
        # < 3 sentences -> no spans -> both survive (normalized join)
        assert out[0] == "one. two." and out[1] == "one. two."

    def test_canonical_is_lowest_id_and_pos(self, spark):
        doc = "s one alpha. s two beta. s three gamma."
        out = self._dedup(spark, [doc, doc, doc])
        assert out[0] != "" and out[1] == "" and out[2] == ""

    def test_within_doc_duplicate_span_removed(self, spark):
        # the same 3-sentence span twice INSIDE one doc: the first
        # occurrence is canonical, the second's sentences are removed
        doc = ("s one alpha. s two beta. s three gamma. "
               "s one alpha. s two beta. s three gamma.")
        out = self._dedup(spark, [doc])
        assert out[0] == "s one alpha. s two beta. s three gamma."

    def test_overlapping_spans_share_canonical_sentences(self, spark):
        # doc 1 duplicates a span whose sentences also belong to doc 0's
        # canonical overlapping spans; only doc 1 loses sentences
        a = "w1 a. w2 b. w3 c. w4 d."
        b = "w2 b. w3 c. w4 d."
        out = self._dedup(spark, [a, b])
        assert out[0] == a
        assert out[1] == ""


class TestUrlQuality:
    def test_signals_and_keep(self, spark):
        rows = [
            (1, "https://www.example.com/articles/2024/post?id=3"),
            (2, "http://192.168.1.7/admin"),                  # IP host
            (3, "https://x1234567.com/a"),                    # digit-heavy
            (4, "https://a.evil.com/page"),                   # blocked dom
            (5, "https://notevil.com/page"),                  # NOT blocked
            (6, "https://ok.com/" + "/".join("d" * 15)),      # too deep
            (7, "https://ok.com/p?" + "&".join(f"k{i}=v"
                                               for i in range(12))),
            (8, None),
            (9, "https://shop.example.co.zz/x"),              # blocked tld
        ]
        df = spark.createDataFrame(rows, "id int, url string")
        out = {r["id"]: r for r in wt.url_quality_signals(
            df, "url", blocked_domains=("evil.com",),
            blocked_tlds=("zz",)).collect()}
        assert out[1]["url_keep"] and out[1]["url_host"] == "www.example.com"
        assert out[1]["url_path_depth"] == 3
        assert out[1]["url_n_params"] == 1
        assert out[2]["url_is_ip"] and not out[2]["url_keep"]
        assert out[3]["url_host_digit_frac"] > 0.33 \
            and not out[3]["url_keep"]
        assert not out[4]["url_keep"]     # suffix-matched subdomain
        assert out[5]["url_keep"]         # 'notevil.com' must survive
        assert not out[6]["url_keep"]     # path depth
        assert not out[7]["url_keep"]     # param count
        assert out[8]["url_keep"] is False and out[8]["url_host"] is None
        assert not out[9]["url_keep"]     # blocked tld

    def test_no_python_stage(self, spark):
        df = spark.createDataFrame([(1, "https://a.com/b")],
                                   "id int, url string")
        plan = wt.url_quality_signals(df, "url") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


# ---- robots.txt frontier filtering (r9, RFC 9309) -------------------------

def test_robots_parse_vectors():
    """RFC 9309 parse laws: group runs of User-agent lines share rules;
    the most specific matching agent group wins (exact beats *);
    empty Disallow emits no rule; unknown directives and comments are
    ignored; * and $ translate to anchored RE2."""
    from tech_ml_dataset_spark.functions import robots as rb

    txt = ("# hi\n"
           "User-agent: BadBot\n"
           "User-agent: WorseBot\n"
           "Disallow: /\n"
           "\n"
           "User-agent: *\n"
           "Disallow: /private*\n"
           "Allow: /private/ok$\n"
           "Crawl-delay: 5\n"
           "Disallow:\n")
    star = rb.parse_robots_text(txt, agent="mybot/1.0")
    assert [(p, a) for p, _, a, _ in star] == \
        [("/private*", False), ("/private/ok$", True)]
    assert [rx for _, rx, _, _ in star] == \
        ["^/private.*", "^/private/ok$"]
    # exact agent group beats *, shared across the agent run
    for ua in ("BadBot/2.1", "worsebot"):
        got = rb.parse_robots_text(txt, agent=ua)
        assert [(p, a) for p, _, a, _ in got] == [("/", False)], ua
    # no groups at all -> no rules
    assert rb.parse_robots_text("Disallow: /x\n") == []
    # spec_len is octet length
    assert rb.parse_robots_text("User-agent: *\nDisallow: /é\n")[0][3] \
        == len("/é".encode())


def test_robots_filter_match_law(spark):
    """RFC 9309 match law end-to-end: longest pattern wins, Allow wins
    length ties, no match / no rules = allowed; host compare is
    case-insensitive and port-blind; bare-host URLs match path '/'."""
    from tech_ml_dataset_spark.functions import robots as rb

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /p*\nAllow: /p/ok$\n"
                   "Disallow: /tmp/\nAllow: /tmp/pub\n"),
         ("b.com", "User-agent: *\nDisallow: /\n"),
         ("t.com", "User-agent: *\nDisallow: /dir\nAllow: /dir\n")],
        "host string, robots_txt string")
    rules = rb.parse_robots(robots)
    urls = spark.createDataFrame(
        [("https://a.com/q",), ("https://a.com/p/x",),
         ("https://a.com/p/ok",), ("https://a.com/p/okno",),
         ("https://a.com/tmp/priv",), ("https://a.com/tmp/public",),
         ("https://A.COM:8443/p/zz",), ("https://b.com",),
         ("https://t.com/dir/tie",), ("https://c.net/any",)],
        "url string")
    got = {r["url"]: r["robots_allowed"]
           for r in rb.robots_filter(urls, rules).collect()}
    assert got == {
        "https://a.com/q": True,
        "https://a.com/p/x": False,
        "https://a.com/p/ok": True,          # longer allow wins
        "https://a.com/p/okno": False,       # $ anchor fails
        "https://a.com/tmp/priv": False,
        "https://a.com/tmp/public": True,    # /tmp/pub longer
        "https://A.COM:8443/p/zz": False,    # case+port blind
        "https://b.com": False,              # bare host -> path '/'
        "https://t.com/dir/tie": True,       # allow wins the tie
        "https://c.net/any": True,           # no rules for host
    }


def test_sitemap_parsing(spark):
    """r9: frontier seeding — Sitemap: directives extracted from
    robots.txt (global, case-insensitive), urlset and sitemapindex
    documents parsed namespace-agnostically, malformed XML raises."""
    import pytest as _pytest

    from tech_ml_dataset_spark.functions import robots as rb

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /x\n"
                   "Sitemap: https://a.com/sitemap.xml\n"
                   "SITEMAP:https://a.com/s2.xml\n"),
         ("b.com", "User-agent: *\nDisallow:\n")],
        "host string, robots_txt string")
    got = sorted((r["host"], r["sitemap_url"]) for r in
                 rb.sitemap_urls_from_robots(robots).collect())
    assert got == [("a.com", "https://a.com/s2.xml"),
                   ("a.com", "https://a.com/sitemap.xml")]

    ns = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
    urlset = (f'<?xml version="1.0"?><urlset {ns}>'
              '<url><loc>https://a.com/p1</loc>'
              '<lastmod>2024-01-02</lastmod>'
              '<changefreq>daily</changefreq>'
              '<priority>0.8</priority></url>'
              '<url><loc>https://a.com/p2</loc></url></urlset>')
    index = (f'<sitemapindex {ns}><sitemap>'
             '<loc>https://a.com/s-0.xml</loc>'
             '<lastmod>2024-02-03</lastmod></sitemap></sitemapindex>')
    df = spark.createDataFrame([("https://a.com/sitemap.xml", urlset),
                                ("https://a.com/index.xml", index)],
                               "src string, xml string")
    rows = sorted((r["src"], r["loc"], r["lastmod"], r["changefreq"],
                   r["priority"], r["is_index"])
                  for r in rb.parse_sitemaps(df, src_col="src").collect())
    assert rows == [
        ("https://a.com/index.xml", "https://a.com/s-0.xml",
         "2024-02-03", None, None, True),
        ("https://a.com/sitemap.xml", "https://a.com/p1", "2024-01-02",
         "daily", 0.8, False),
        ("https://a.com/sitemap.xml", "https://a.com/p2", None, None,
         None, False),
    ]
    # malformed XML / wrong root / missing loc raise loudly
    with _pytest.raises(Exception):
        rb.parse_sitemap_text("<urlset><url><loc>x</loc>")
    with _pytest.raises(ValueError, match="root"):
        rb.parse_sitemap_text("<rss></rss>")
    with _pytest.raises(ValueError, match="loc"):
        rb.parse_sitemap_text("<urlset><url></url></urlset>")


def test_robots_tied_groups_merge(spark):
    """RFC 9309 §2.2.1 (r10 ADVICE): rules from EVERY group whose
    agent match ties the winning specificity MUST combine — a second
    ``User-agent: *`` block (common in real robots.txt) contributes
    its rules instead of being silently dropped; a more-specific
    named-agent group still excludes the ``*`` groups entirely."""
    from tech_ml_dataset_spark.functions import robots as rb

    txt = ("User-agent: *\nDisallow: /a\n\n"
           "User-agent: *\nDisallow: /b\nAllow: /b/ok\n\n"
           "User-agent: special\nDisallow: /s\n")
    got = rb.parse_robots_text(txt, agent="anybot")
    assert [(p, a) for p, _, a, _ in got] == \
        [("/a", False), ("/b", False), ("/b/ok", True)]
    assert [(p, a) for p, _, a, _
            in rb.parse_robots_text(txt, agent="special/2.0")] == \
        [("/s", False)]
    # two groups naming the same specific agent also merge
    txt2 = ("User-agent: bot\nDisallow: /x\n\n"
            "User-agent: bot\nDisallow: /y\n")
    assert [(p, a) for p, _, a, _
            in rb.parse_robots_text(txt2, agent="bot")] == \
        [("/x", False), ("/y", False)]
    # end-to-end: the second * block's Disallow now bites
    rules = rb.parse_robots(spark.createDataFrame(
        [("m.com", txt)], "host string, robots_txt string"))
    urls = spark.createDataFrame(
        [("https://m.com/a/1",), ("https://m.com/b/1",),
         ("https://m.com/b/ok",), ("https://m.com/free",)],
        "url string")
    got2 = {r["url"]: r["robots_allowed"]
            for r in rb.robots_filter(urls, rules).collect()}
    assert got2 == {"https://m.com/a/1": False,
                    "https://m.com/b/1": False,
                    "https://m.com/b/ok": True,
                    "https://m.com/free": True}


def test_robots_filter_uppercase_scheme(spark):
    """r10 ADVICE: URI schemes are case-insensitive (RFC 3986 §3.1) —
    an uppercase HTTPS:// URL must still extract its host, hit the
    rules join, and be disallowed when the host disallows it."""
    from tech_ml_dataset_spark.functions import robots as rb

    rules = rb.parse_robots(spark.createDataFrame(
        [("b.com", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string"))
    urls = spark.createDataFrame(
        [("HTTPS://B.COM/x",), ("Http://b.com/y",),
         ("https://ok.com/z",)], "url string")
    got = {r["url"]: r["robots_allowed"]
           for r in rb.robots_filter(urls, rules).collect()}
    assert got == {"HTTPS://B.COM/x": False, "Http://b.com/y": False,
                   "https://ok.com/z": True}
