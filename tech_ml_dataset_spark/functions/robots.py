"""robots.txt frontier filtering — RFC 9309, Spark-first.

The cheapest rejection point in a crawl after URL-quality heuristics:
before fetching a URL, the frontier must honor the host's robots.txt.
At 100 TB frontier scale this is a JOIN problem, not a per-URL parser
problem — so the surface splits the way Spark wants it:

* :func:`parse_robots` — one bounded Python pass over the (host,
  robots.txt text) table (a robots file is a few KB; one row per host)
  producing the SLIM rules table (host, pattern, regex, allow,
  spec_len): group-aware line parse per RFC 9309 §2.1 (``User-agent``
  lines open a group; ``Allow``/``Disallow`` attach to every agent of
  the group; the most specific matching group is chosen per agent —
  exact name beats ``*``), with ``*`` / ``$`` wildcards translated to
  anchored RE2 at parse time so matching downstream is a pure JVM
  ``regexp_like``.
* :func:`robots_filter` — frontier URLs ⋈ broadcast rules on host,
  per-URL verdict by the RFC match law: the longest-pattern matching
  rule wins (``spec_len`` = octet length of the rule's pattern,
  §2.2.2), Allow wins length ties, no matching rule (or no robots.txt
  for the host) = allowed. The election is a map-side-combinable
  ``max(struct(...))`` aggregation keyed by the URL row — never a
  window, so a host whose rules match millions of frontier URLs
  combines partial maxima instead of funneling one reducer.

Reference parity anchor: none — tech.ml.dataset has no crawl surface;
driver-mandate (training-data pipeline) function. Format facts from
public RFC 9309 only.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

_RULE_RE = re.compile(r"^\s*(user-agent|allow|disallow)\s*:\s*([^#]*)",
                      re.I)


def _pattern_regex(pattern: str) -> str:
    """RFC 9309 §2.2.3: a rule pattern matches as a PREFIX of the URL
    path, with ``*`` matching any span and ``$`` (final only)
    anchoring the end. Translate to RE2 once at parse time: escape
    everything, ``*`` -> ``.*``, trailing ``$`` -> ``$``; anchor at
    the start."""
    anchored_end = pattern.endswith("$")
    if anchored_end:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored_end else "")


def parse_robots_text(text: str, agent: str = "*"
                      ) -> list[tuple[str, str, bool, int]]:
    """Parse ONE robots.txt into [(pattern, regex, allow, spec_len)]
    for ``agent``: RFC 9309 group semantics — consecutive
    ``User-agent`` lines share the following rule block; the group
    chosen is the most specific one whose agent token matches
    (case-insensitive substring product token match; exact product
    name beats ``*``); unknown directives and comments are ignored;
    an empty Disallow value means "allow everything" and emits no
    rule. ``spec_len`` is the pattern's octet length (§2.2.2 longest-
    match specificity)."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_agent_run = False
    for line in text.splitlines():
        m = _RULE_RE.match(line)
        if not m:
            continue
        field = m.group(1).lower()
        value = m.group(2).strip()
        if field == "user-agent":
            if not in_agent_run:
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_agent_run = True
            cur_agents.append(value.lower())
            continue
        in_agent_run = False
        if not value:
            continue                        # empty Disallow = no rule
        cur_rules.append((value, field == "allow"))
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    # RFC 9309 §2.2.1: rules from EVERY group whose agent line matches
    # at the winning specificity MUST be combined — real robots.txt
    # files routinely carry two ``User-agent: *`` blocks (r10 ADVICE:
    # electing a single group silently dropped the second block's
    # Disallow rules). Two passes: find the best specificity, then
    # merge all groups that tie it.
    best_spec = -1
    group_specs: list[int] = []
    for agents, _ in groups:
        spec = -1
        for a in agents:
            if a == "*":
                spec = max(spec, 0)
            elif a and a in agent:
                spec = max(spec, len(a))
        group_specs.append(spec)
        best_spec = max(best_spec, spec)
    if best_spec < 0:
        return []
    best: list[tuple[str, bool]] = []
    for (agents, rules), spec in zip(groups, group_specs):
        if spec == best_spec:
            best.extend(rules)
    return [(p, _pattern_regex(p), allow, len(p.encode()))
            for p, allow in best]


_RULES_DDL = ("host string, pattern string, regex string, "
              "allow boolean, spec_len int")


def parse_robots(df: DataFrame, *, host_col: str = "host",
                 text_col: str = "robots_txt",
                 agent: str = "*") -> DataFrame:
    """DISTRIBUTED robots parse: (host, robots.txt) rows -> the slim
    rules table :func:`robots_filter` consumes. One bounded Python
    pass per host file (a robots.txt is KB-scale; the rules output is
    what travels)."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for host, text in zip(pdf[host_col], pdf[text_col]):
                if text is None:
                    continue
                for pat, rx, allow, spec in parse_robots_text(
                        str(text), agent):
                    rows.append((host, pat, rx, allow, spec))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["host", "pattern", "regex", "allow",
                                   "spec_len"])

    return df.mapInPandas(batches, _RULES_DDL)


def sitemap_urls_from_robots(df: DataFrame, *, host_col: str = "host",
                             text_col: str = "robots_txt") -> DataFrame:
    """Extract ``Sitemap:`` directive URLs from robots.txt files (the
    sitemaps.org discovery convention; the directive is global, not
    group-scoped) — pure Catalyst: split lines, prefix-match, extract.
    Returns (host, sitemap_url) rows, one per directive."""
    line = F.explode(F.split(F.col(text_col), "\r?\n")).alias("__line__")
    out = df.select(F.col(host_col).alias("host"), line)
    url = F.regexp_extract("__line__", r"(?i)^\s*sitemap\s*:\s*(\S+)", 1)
    return (out.select("host", url.alias("sitemap_url"))
               .filter(F.col("sitemap_url") != ""))


def parse_sitemap_text(xml: str) -> list[tuple]:
    """Parse ONE sitemap document (sitemaps.org protocol): a
    ``<urlset>`` yields (loc, lastmod, changefreq, priority, False)
    per ``<url>``; a ``<sitemapindex>`` yields (loc, lastmod, None,
    None, True) per ``<sitemap>`` — callers fetch those and recurse.
    Namespace-agnostic (tag localnames); malformed XML raises loudly —
    a seeder that silently drops a sitemap is a recall bug."""
    import xml.etree.ElementTree as ET

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    root = ET.fromstring(xml)
    kind = local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"sitemap: unexpected root element <{kind}>")
    is_index = kind == "sitemapindex"
    want = "sitemap" if is_index else "url"
    out = []
    for el in root:
        if local(el.tag) != want:
            continue
        fields = {local(c.tag): (c.text or "").strip() for c in el}
        loc = fields.get("loc")
        if not loc:
            raise ValueError("sitemap: entry missing <loc>")
        pr = fields.get("priority")
        out.append((loc, fields.get("lastmod") or None,
                    None if is_index else (fields.get("changefreq")
                                           or None),
                    None if is_index or not pr else float(pr),
                    is_index))
    return out


_SITEMAP_DDL = ("loc string, lastmod string, changefreq string, "
                "priority double, is_index boolean")


def parse_sitemaps(df: DataFrame, *, xml_col: str = "xml",
                   src_col: str | None = None) -> DataFrame:
    """DISTRIBUTED sitemap parse: one bounded Python pass per sitemap
    document (the spec caps a file at 50k URLs / 50 MB) producing the
    flat frontier-seed table. ``src_col`` names a column to carry
    through (e.g. the sitemap's own URL, for index recursion)."""
    import pandas as pd

    cols = ([src_col] if src_col else []) + \
        ["loc", "lastmod", "changefreq", "priority", "is_index"]
    ddl = ((f"{src_col} string, " if src_col else "") + _SITEMAP_DDL)

    def batches(it):
        for pdf in it:
            rows = []
            for idx in range(len(pdf)):
                xml = pdf[xml_col].iloc[idx]
                if xml is None:
                    continue
                src = (pdf[src_col].iloc[idx],) if src_col else ()
                for tup in parse_sitemap_text(str(xml)):
                    rows.append(src + tup)
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(batches, ddl)


def robots_filter(urls: DataFrame, rules: DataFrame, *,
                  url_col: str = "url",
                  keep_col: str = "robots_allowed") -> DataFrame:
    """Frontier filter: adds ``keep_col`` per the RFC 9309 match law —
    among the host's rules whose regex matches the URL PATH, the
    longest pattern wins and Allow wins length ties; no match (or no
    rules for the host) = allowed.

    Plan shape for 100 TB: the rules collapse to ONE array row per
    host (vocabulary-sized — a whole crawl's robots rules fit in a
    broadcast), the frontier left-joins it on host, and the verdict is
    a pure projection — ``array_max`` over the matching rules'
    (spec_len, allow) structs, so no second shuffle, no window, and
    frontier row identity/multiplicity is untouched."""
    # (?i) on the scheme: URI schemes are case-insensitive (RFC 3986
    # §3.1) — an uppercase HTTPS:// URL must still extract its host
    # and hit the rules join (r10 ADVICE).
    host = F.lower(F.regexp_extract(
        url_col, r"(?i)^[a-z][a-z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_replace(host, r":\d+$", "")     # strip port
    path = F.regexp_extract(
        url_col, r"(?i)^[a-z][a-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    per_host = rules.groupBy(F.col("host").alias("__host__")).agg(
        F.collect_list(F.struct("spec_len", "allow", "regex"))
         .alias("__rules__"))
    u = urls.withColumn("__host__", host).withColumn("__path__", path)
    j = u.join(F.broadcast(per_host), "__host__", "left")
    hits = F.filter(
        "__rules__",
        lambda rl: F.regexp_like(F.col("__path__"), rl["regex"]))
    best = F.array_max(F.transform(
        hits, lambda rl: F.struct(rl["spec_len"].alias("spec_len"),
                                  rl["allow"].cast("int").alias("allow"))))
    keep = F.when(F.col("__rules__").isNull() | (F.size(hits) == 0),
                  F.lit(True)).otherwise(best["allow"] == 1)
    return j.select(*urls.columns, keep.alias(keep_col))
