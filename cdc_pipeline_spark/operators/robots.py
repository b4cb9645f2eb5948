"""robots.txt policy evaluation for crawled-corpus builds.

Corpus pipelines that respect crawl policy (C4/CCNet-style builds)
need, for every candidate URL, an allowed/denied decision against the
host's robots.txt — keyed on the same canonical host the rest of the
URL hygiene stack uses (``operators/urls.py``). The reference engine
has no URL or policy surface; this module is part of the
training-data-pipeline mandate, same charter as ``operators/urls.py``.

Semantics (RFC 9309 subset, documented precisely so the SQL oracle can
replay it rule for rule):

* groups are runs of consecutive ``User-agent`` lines plus the rules
  that follow them (RFC 9309 §2.2.1 start-of-group semantics: stacked
  agent lines share one rule block; any non-agent NON-BLANK line ends
  the stacking — blank lines are dropped at keying per the ABNF's
  emptyline — and the next agent line after a rule starts a new
  group). Input is capped at ``ROBOTS_MAX_LINES`` (§2.4 truncation).
* group selection (:func:`parse_robots_group`): a group matches a
  crawler when one of its agent values is a case-insensitive PREFIX of
  the crawler's product token; the most specific (longest) value wins,
  ties by first occurrence; no match ⇒ the ``*`` groups. ALL groups
  carrying the selected value are merged (RFC 9309: "groups MUST be
  combined"). :func:`parse_robots_rules` is the agent-less form —
  it evaluates the merged ``*`` groups.
* ``Crawl-delay`` (non-standard but ubiquitous) is surfaced as a typed
  double from the selected groups (first parseable value in document
  order); ``Sitemap`` lines are document-global (RFC 9309 allows them
  anywhere) and surfaced as an array in file order.
* ``Allow``/``Disallow`` values match per RFC 9309 §2.2.2/§2.2.3:
  plain values are path prefixes; ``*`` matches any character
  sequence and a TRAILING ``$`` anchors the end of the path (a ``$``
  anywhere else is a literal, matching Google's reference parser).
  Wildcard values compile ONCE per rule on the broadcast side into an
  anchored regex (:func:`_compiled_rule`); precedence is
  most-specific-match where specificity counts the rule's LITERAL
  octets (``*`` and the end anchor contribute nothing — for plain
  prefixes this is exactly prefix length), ``Allow`` winning ties.
  No matching rule ⇒ allowed; missing/empty robots.txt ⇒ allowed.
  Measured-and-rejected alternative (r11): a regex-free glob-segment
  ``locate`` fold — split the value on ``*`` runs, leftmost-locate
  each literal per URL — benchmarked SLOWER at sf0.1 (agent-policy
  2.32 s vs 1.91 s; even plain-prefix policy regressed 0.93 → 2.13 s,
  the bigger interpreted HOF tree taxes every branch). The per-rule
  regex stays; don't redo the fold.
* empty rule values (``Disallow:`` alone = allow-all) are no-ops and
  dropped at parse time — equivalent under longest-match.
* lines whose key is not one of ``user-agent/allow/disallow/
  crawl-delay/sitemap`` (including colon-free junk) are dropped at
  keying, like blank lines — widely-deployed parsers ignore unknown
  lines, and ADVICE r10: an unknown line between stacked
  ``User-agent`` lines must not split the group.
* comments (``#`` to end of line) and ``\r`` are stripped; directive
  names are case-insensitive; tabs count as whitespace (RFC 9309 WS =
  space/tab — tabs are folded to spaces before trimming, so
  ``Disallow:\t/x`` and indented lines parse; a raw tab INSIDE a path
  value would fold too, but tabs are not legal in URI paths).
* rule values are percent-normalized with the SAME
  :func:`urls.percent_normalize` pass the URL paths get (RFC 9309
  compares percent-decoded octets), so ``Disallow: /priv%61te/``
  matches ``/private/`` paths — both sides normalize identically,
  reserved encodings stay encoded on both.

Everything is pure column expressions over arrays — parsing is a
per-row rewrite of the robots text (no Python, no shuffle), and the
policy join is a broadcast of the (tiny) per-domain rules frame against
the URL corpus: the 100 TB shape is one corpus scan plus one broadcast.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RULES_TYPE = (
    "array<struct<allow:boolean, prefix:string, pattern:string, spec:int>>"
)

# line keys with RFC 9309 (or de-facto) meaning; anything else is
# dropped at keying so junk lines neither split stacked user-agent
# runs nor end a group (ADVICE r10)
_RECOGNIZED_KEYS = ("user-agent", "allow", "disallow", "crawl-delay", "sitemap")


# bounded broadcast-side evaluation: RFC 9309 §2.4 requires processing
# at least 500 KiB and sanctions truncation beyond a parser limit; a
# line cap bounds the group machinery's cost on adversarial inputs
ROBOTS_MAX_LINES = 8192


def _keyed_lines(robots_col: Column | str) -> Column:
    """Per-line ``struct<k,v>`` array of a robots.txt text: lines are
    ``\\r``-stripped, tab-folded (RFC 9309 WS = space/tab), comment-
    stripped, trimmed; BLANK lines are dropped (the RFC's ABNF gives
    emptyline no syntactic role — in particular it may sit between
    stacked ``User-agent`` lines without splitting the group, review
    r10); the first ``ROBOTS_MAX_LINES`` survivors are kept. ``k`` =
    lowercased text before the first ``:``, ``v`` = trimmed remainder
    (lines without ``:`` get ``v = ''``). Lines whose ``k`` is not in
    ``_RECOGNIZED_KEYS`` are then dropped like blank lines (ADVICE
    r10: unknown lines — ``Host:``, junk — must not split a stacked
    agent run; widely-deployed parsers ignore them)."""
    col = F.col(robots_col) if isinstance(robots_col, str) else robots_col
    lines = F.transform(
        F.split(F.regexp_replace(F.coalesce(col, F.lit("")), "\r", ""), "\n"),
        lambda l: F.trim(F.regexp_replace(F.translate(l, "\t", " "), "#.*", "")),
    )
    lines = F.slice(F.filter(lines, lambda l: l != ""), 1, ROBOTS_MAX_LINES)
    keyed = F.transform(
        lines,
        lambda l: F.struct(
            F.lower(F.trim(F.substring_index(l, ":", 1))).alias("k"),
            F.trim(
                l.substr(
                    F.length(F.substring_index(l, ":", 1)) + F.lit(2), F.lit(1 << 20)
                )
            ).alias("v"),
        ),
    )
    return F.filter(keyed, lambda s: s["k"].isin(*_RECOGNIZED_KEYS))


_GROUP_TYPE = (
    f"struct<rules:{_RULES_TYPE}, crawl_delay:double, sitemaps:array<string>>"
)


def parse_robots_group(
    robots_col: Column | str, agent: str | None = None
) -> Column:
    """Single-expression form of :func:`_group_from_keyed` — fine for
    unit tests and one-off frames, but every internal reference to the
    keyed-lines array INLINES the whole line-parse subtree, and
    Catalyst analysis walks the multiplied tree (measured ~13 s for one
    projection, review r10). Anything that runs per query should
    materialize ``_keyed_lines`` in its own projection first, the way
    :func:`robots_policy` does."""
    return _group_from_keyed(_keyed_lines(robots_col), agent)


def _line_ops(keyed: Column):
    """Shared index/lookup helpers over a keyed-lines column: 1-based
    index array (empty-safe — blank-line filtering can leave zero lines
    and sequence(1, 0) counts DOWN), element lookup, user-agent test,
    and run-start resolution (latest user-agent line at or before i
    whose predecessor is not one — for a UA line its own run's start,
    for a rule line the owning group's start)."""
    n = F.size(keyed)
    idxs = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    at = lambda i: F.element_at(keyed, i)  # noqa: E731
    is_ua = lambda i: at(i)["k"] == F.lit("user-agent")  # noqa: E731
    # F.get is 0-based and null-safe at the boundary (i=1 probes -1)
    pred_is_ua = lambda i: F.coalesce(  # noqa: E731
        F.get(keyed, i - F.lit(2))["k"] == F.lit("user-agent"), F.lit(False)
    )
    start_of = lambda i: F.array_max(  # noqa: E731
        F.filter(idxs, lambda j: (j <= i) & is_ua(j) & ~pred_is_ua(j))
    )
    return idxs, at, is_ua, start_of


def _selected_value(keyed: Column, agent: str | None) -> Column:
    """RFC 9309 §2.2.1 selection: the longest agent value that
    case-insensitively PREFIXES the crawler product token (ties: first
    occurrence); no match — or ``agent=None`` — selects ``'*'``."""
    token = F.lit((agent or "").lower())
    idxs, at, is_ua, _ = _line_ops(keyed)
    matching = F.filter(
        idxs,
        lambda i: is_ua(i)
        & (at(i)["v"] != "*")
        & (at(i)["v"] != "")
        & token.startswith(F.lower(at(i)["v"])),
    )
    maxlen = F.array_max(F.transform(matching, lambda i: F.length(at(i)["v"])))
    sel_idx = F.array_min(
        F.filter(matching, lambda i: F.length(at(i)["v"]) == maxlen)
    )
    return F.coalesce(F.lower(F.get(keyed, sel_idx - F.lit(1))["v"]), F.lit("*"))


def _winner_starts(keyed: Column, sel_value: Column) -> Column:
    """Run starts of every group carrying the winning agent value —
    the merged-group membership set (RFC 9309: groups with the same
    agent MUST be combined). Probing only the winner-value lines keeps
    rule filtering O(rules x m x lines), m = stacked-agent count
    (review r10: probing all lines made it cubic)."""
    idxs, at, is_ua, start_of = _line_ops(keyed)
    return F.transform(
        F.filter(idxs, lambda j: is_ua(j) & (F.lower(at(j)["v"]) == sel_value)),
        start_of,
    )


def _compiled_rule(is_allow: Column, value: Column) -> Column:
    """Compile one ``Allow``/``Disallow`` value into the rule struct
    (RFC 9309 §2.2.2/§2.2.3 matching, done ONCE per rule on the
    broadcast side, never per URL):

    * the value is percent-normalized with the SAME pass URL paths get
      (the RFC compares decoded octets);
    * a TRAILING ``$`` is the end-of-path anchor (a ``$`` anywhere
      else is a literal — Google's reference parser does the same);
    * ``prefix`` = the anchor-stripped normalized value;
    * ``pattern`` = NULL for plain prefix values (the match is a cheap
      ``startswith``), else the value translated to an anchored Java
      regex: metacharacters escaped, each ``*`` → ``.*``, a leading
      ``^`` and — for anchored rules — a trailing ``$``;
    * ``spec`` = the rule's LITERAL octet count (``prefix`` minus the
      ``*``s) — the §2.2.2 most-specific-match precedence key; for
      plain prefixes it equals prefix length, so wildcard and prefix
      rules rank on one scale."""
    from cdc_pipeline_spark.operators.urls import percent_normalize

    v = percent_normalize(value)
    anchored = v.endswith("$")
    body = F.when(anchored, v.substr(F.lit(1), F.length(v) - 1)).otherwise(v)
    wild = body.contains("*") | anchored
    # escape every Java-regex metacharacter EXCEPT '*' (still raw at
    # this point), then turn each '*' into '.*'
    esc = F.regexp_replace(body, r"([.^$|?()\[\]{}+\\])", r"\\$1")
    rex = F.concat(
        F.lit("^"),
        F.regexp_replace(esc, r"\*", ".*"),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    return F.struct(
        is_allow.alias("allow"),
        body.alias("prefix"),
        F.when(wild, rex).alias("pattern"),
        F.length(F.regexp_replace(body, r"\*", "")).cast("int").alias("spec"),
    )


def _group_struct(keyed: Column, wstarts: Column) -> Column:
    """rules / crawl_delay / sitemaps of the selected groups, given the
    winner run-start set. A line is selected iff its owning run start
    is in ``wstarts``."""
    idxs, at, _, start_of = _line_ops(keyed)
    selected = lambda i: F.coalesce(  # noqa: E731
        F.array_contains(wstarts, start_of(i)), F.lit(False)
    )
    rule_idx = F.filter(
        idxs,
        lambda i: at(i)["k"].isin("allow", "disallow")
        & (at(i)["v"] != "")
        & selected(i),
    )
    rules = F.transform(
        rule_idx,
        lambda i: _compiled_rule(at(i)["k"] == F.lit("allow"), at(i)["v"]),
    ).cast(_RULES_TYPE)
    cd_idx = F.array_min(
        F.filter(
            idxs,
            lambda i: (at(i)["k"] == "crawl-delay")
            & at(i)["v"].try_cast("double").isNotNull()
            & selected(i),
        )
    )
    crawl_delay = F.get(keyed, cd_idx - F.lit(1))["v"].try_cast("double")
    sitemaps = F.transform(
        F.filter(idxs, lambda i: (at(i)["k"] == "sitemap") & (at(i)["v"] != "")),
        lambda i: at(i)["v"],
    )
    return F.struct(
        rules.alias("rules"),
        crawl_delay.alias("crawl_delay"),
        sitemaps.alias("sitemaps"),
    ).cast(_GROUP_TYPE)


def _group_from_keyed(keyed: Column, agent: str | None = None) -> Column:
    """Single-expression composition of the group machinery — see
    :func:`parse_robots_group` for semantics and the analysis-cost
    caveat (the staged projections in :func:`robots_policy` are the
    per-query shape).

    Group model: a group is a run of consecutive ``User-agent`` lines
    plus the rules that follow (stacked agents share one rule block;
    blank lines between them are dropped at keying and do not split
    the run). A group matches when one of its agent values is a
    case-insensitive PREFIX of ``agent``; the longest matching value
    wins (ties: first occurrence); no match — or ``agent=None`` —
    selects the ``*`` groups. ALL groups carrying the winning value
    merge, per RFC 9309's group-combining rule. ``crawl_delay`` is the
    first parseable value inside the selected groups; ``sitemaps`` is
    document-global. Null/empty text parses to empty rules
    (allow-all). Input capped at ``ROBOTS_MAX_LINES`` so adversarial
    files stay bounded."""
    return _group_struct(keyed, _winner_starts(keyed, _selected_value(keyed, agent)))


def parse_robots_rules(robots_col: Column | str) -> Column:
    """Prefix rules of the merged ``User-agent: *`` groups:
    ``array<struct<allow boolean, prefix string>>`` in file order —
    the agent-less form of :func:`parse_robots_group` (a crawler with
    a dedicated token passes it there instead). Null/empty text parses
    to an empty array (allow-all)."""
    return parse_robots_group(robots_col)["rules"]


def robots_allowed(path_col: Column | str, rules_col: Column | str) -> Column:
    """RFC 9309 §2.2.2 most-specific-match decision for one path
    against a compiled rules array: a plain rule matches by prefix, a
    wildcard rule by its precompiled anchored regex; specificity is
    the rule's literal octet count (``spec``), and the path is allowed
    iff the most specific matching Allow is at least as specific as
    the most specific matching Disallow (no matching Disallow ⇒
    allowed; null rules — e.g. no robots row joined — ⇒ allowed)."""
    path = F.col(path_col) if isinstance(path_col, str) else path_col
    rules = F.col(rules_col) if isinstance(rules_col, str) else rules_col
    matched = F.filter(
        F.coalesce(rules, F.lit([]).cast(_RULES_TYPE)),
        lambda r: F.when(r["pattern"].isNull(), path.startswith(r["prefix"]))
        .otherwise(F.regexp_like(path, r["pattern"])),
    )
    best = lambda want_allow: F.array_max(  # noqa: E731
        F.transform(
            F.filter(matched, lambda r: r["allow"] == F.lit(want_allow)),
            lambda r: r["spec"],
        )
    )
    return F.coalesce(best(True), F.lit(-1)) >= F.coalesce(best(False), F.lit(-1))


# --- sitemap XML (sitemaps.org protocol) ---------------------------------
#
# robots.txt surfaces sitemap URLs as typed columns (the `sitemaps`
# group column above); these parse the fetched sitemap DOCUMENTS into
# a URL frontier — <urlset> files list page URLs, <sitemapindex> files
# list further sitemap files. Entry-level regexes, not an XML parser:
# the protocol's entry grammar is flat (<url>/<sitemap> elements with
# <loc> + optional <lastmod>), and per-row column expressions keep a
# 100 TB frontier build scan-parallel and shuffle-free.

_SITEMAP_ENTRY_TYPE = "array<struct<loc:string, lastmod:string>>"
_SITEMAP_ENTRY_RE = r"(?is)<(?:url|sitemap)\b[^>]*>(.*?)</(?:url|sitemap)\s*>"
_SITEMAP_LOC_RE = r"(?is)<loc\s*>(.*?)</loc\s*>"
_SITEMAP_LASTMOD_RE = r"(?is)<lastmod\s*>(.*?)</lastmod\s*>"


def sitemap_kind(xml_col: Column | str) -> Column:
    """'index' for ``<sitemapindex>`` documents, 'urlset' for
    ``<urlset>`` documents, null otherwise — the routing column a
    frontier builder branches on (index entries are further sitemap
    FETCH tasks, urlset entries are page URLs)."""
    col = F.col(xml_col) if isinstance(xml_col, str) else xml_col
    lowered = F.lower(F.coalesce(col, F.lit("")))
    return (
        F.when(lowered.contains("<sitemapindex"), "index")
        .when(lowered.contains("<urlset"), "urlset")
        .otherwise(F.lit(None).cast("string"))
    )


def parse_sitemap_entries(xml_col: Column | str) -> Column:
    """Entries of a sitemap document: ``array<struct<loc, lastmod>>``
    in file order. ``loc`` is whitespace-trimmed (the protocol allows
    padding inside the element); entries without a ``<loc>`` are
    dropped; ``lastmod`` is the raw W3C-datetime string (date-only or
    full ISO timestamp), null when absent — callers derive a typed
    date with ``to_date(substr(lastmod, 1, 10))``."""
    col = F.col(xml_col) if isinstance(xml_col, str) else xml_col
    blocks = F.regexp_extract_all(
        F.coalesce(col, F.lit("")), F.lit(_SITEMAP_ENTRY_RE), F.lit(1)
    )
    entries = F.transform(
        blocks,
        lambda b: F.struct(
            F.trim(F.regexp_extract(b, _SITEMAP_LOC_RE, 1)).alias("loc"),
            F.nullif(
                F.trim(F.regexp_extract(b, _SITEMAP_LASTMOD_RE, 1)), F.lit("")
            ).alias("lastmod"),
        ),
    )
    return F.filter(entries, lambda e: e["loc"] != "").cast(_SITEMAP_ENTRY_TYPE)


def robots_policy(
    urls: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    robots_domain_col: str = "domain",
    robots_text_col: str = "robots_txt",
    out_col: str = "robots_allowed",
    agent: str | None = None,
    group_cols: bool = False,
) -> DataFrame:
    """Tag every URL row with its robots.txt verdict: adds ``domain``,
    ``path`` and ``out_col`` (boolean). ``robots`` holds one row per
    registered domain with the raw robots.txt text; its rules parse
    inside the (broadcast) build side, so the per-domain text is parsed
    ONCE, not per URL. URLs whose domain has no robots row are allowed
    (crawl-standard default). ``agent`` selects the crawler's group per
    RFC 9309 §2.2.1 (default: the ``*`` groups); ``group_cols=True``
    additionally surfaces the selected group's ``crawl_delay`` (double)
    and the document-global ``sitemaps`` (array<string>) per row. Plan:
    one BroadcastHashJoin on the registered domain, the longest-match
    decision in-row — no shuffle on the corpus side."""
    # materialize the keyed-lines array ONCE, then run the group
    # machinery against the column reference: inlined, every at(i)
    # duplicates the line-parse subtree and Catalyst ANALYSIS of the
    # multiplied tree takes seconds per query (review r10 — measured
    # 13.5 s -> sub-second). CollapseProject leaves the split alone
    # because the alias is referenced many times and is not cheap.
    # The stage expressions themselves are cached templates (r12):
    # building this battery is ~4k py4j round-trips (~1.3 s of driver
    # latency per QUERY BUILD, cProfile-measured), and the trees are
    # pure unresolved expressions over fixed internal aliases — no
    # data, no session state; every robots consumer (policy / agent /
    # wildcard / sitemap-frontier / both crawl queries) reuses them.
    parsed = (
        robots.select(
            F.col(robots_domain_col).alias("__r_domain"),
            _keyed_lines_t(robots_text_col).alias("__keyed"),
        )
        .withColumn("__selv", _selected_value_t(agent))
        .withColumn("__wstarts", _winner_starts_t())
        .select(
            "__r_domain",
            _group_struct_t().alias("__g"),
        )
    )
    side = [F.col("__r_domain"), F.col("__g.rules").alias("__r_rules")]
    if group_cols:
        side += [
            F.col("__g.crawl_delay").alias("crawl_delay"),
            F.col("__g.sitemaps").alias("sitemaps"),
        ]
    rules = F.broadcast(parsed.select(*side))
    domain_expr, path_expr = _url_parts_t()
    tagged = (
        urls.withColumn("__url_pct", _pct_url_t(url_col))
        .withColumn("domain", domain_expr)
        .withColumn("path", path_expr)
        .drop("__url_pct")
    )
    return (
        tagged.join(rules, tagged["domain"] == rules["__r_domain"], "left")
        .withColumn(out_col, _allowed_t())
        .drop("__r_domain", "__r_rules")
    )


@lru_cache(maxsize=None)
def _keyed_lines_t(robots_text_col: str) -> Column:
    return _keyed_lines(robots_text_col)


@lru_cache(maxsize=None)
def _selected_value_t(agent: str | None) -> Column:
    return _selected_value(F.col("__keyed"), agent)


@lru_cache(maxsize=None)
def _winner_starts_t() -> Column:
    return _winner_starts(F.col("__keyed"), F.col("__selv"))


@lru_cache(maxsize=None)
def _group_struct_t() -> Column:
    return _group_struct(F.col("__keyed"), F.col("__wstarts"))


@lru_cache(maxsize=None)
def _allowed_t() -> Column:
    return robots_allowed("path", "__r_rules")


@lru_cache(maxsize=None)
def _pct_url_t(url_col: str) -> Column:
    from cdc_pipeline_spark.operators.urls import percent_normalize

    return percent_normalize(url_col)


@lru_cache(maxsize=None)
def _url_parts_t() -> tuple[Column, Column]:
    from cdc_pipeline_spark.operators.urls import (
        _authority_parts,
        _host_pre_normalized,
        registered_domain,
    )

    # strip the fragment BEFORE authority parsing: a '#' preceding the
    # first '/' (https://a.com#frag) must not leak into hostport/path
    u = F.regexp_replace(F.col("__url_pct"), "#.*$", "")
    _, tail = _authority_parts(u)
    # RFC 9309 matches against path + query; a query-only URL
    # (https://a.com?x=1) has tail '?x=1' — treated as path '/' + query,
    # so prefix rules (incl. 'Disallow: /') can match it
    path = (
        F.when(tail == "", F.lit("/"))
        .when(tail.startswith("?"), F.concat(F.lit("/"), tail))
        .otherwise(tail)
    )
    return registered_domain(_host_pre_normalized(u)), path
