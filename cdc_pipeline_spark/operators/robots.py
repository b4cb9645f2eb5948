"""robots.txt policy evaluation for crawled-corpus builds.

Corpus pipelines that respect crawl policy (C4/CCNet-style builds)
need, for every candidate URL, an allowed/denied decision against the
host's robots.txt — keyed on the same canonical host the rest of the
URL hygiene stack uses (``operators/urls.py``). The reference engine
has no URL or policy surface; this module is part of the
training-data-pipeline mandate, same charter as ``operators/urls.py``.

Semantics (RFC 9309 subset, documented precisely so the SQL oracle can
replay it rule for rule):

* only the ``User-agent: *`` group is evaluated (a crawler with a
  dedicated token would pre-filter its own group upstream); the group
  runs from the first ``user-agent: *`` line to the next ``user-agent``
  line with a different token. Stacked user-agent lines BEFORE the
  ``*`` line are handled (the group starts at the ``*`` line); a
  non-``*`` agent stacked AFTER it ends the group — a documented
  simplification of RFC 9309's multi-agent groups.
* ``Allow``/``Disallow`` values are path prefixes; matching is
  longest-match with ``Allow`` winning length ties (RFC 9309 §2.2.2).
  No matching rule ⇒ allowed; missing/empty robots.txt ⇒ allowed.
* empty rule values (``Disallow:`` alone = allow-all) are no-ops and
  dropped at parse time — equivalent under longest-match.
* ``*``/``$`` wildcard rules are SKIPPED (documented subset: prefix
  rules only); comments (``#`` to end of line) and ``\r`` are
  stripped; directive names are case-insensitive; tabs count as
  whitespace (RFC 9309 WS = space/tab — tabs are folded to spaces
  before trimming, so ``Disallow:\t/x`` and indented lines parse; a
  raw tab INSIDE a path value would fold too, but tabs are not legal
  in URI paths).
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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RULES_TYPE = "array<struct<allow:boolean, prefix:string>>"


def parse_robots_rules(robots_col: Column | str) -> Column:
    """Parse a robots.txt text column into the ``User-agent: *`` group's
    prefix rules: ``array<struct<allow boolean, prefix string>>`` in
    file order. Null/empty text parses to an empty array (allow-all).
    Pure column expression (split / transform / filter — one pass)."""
    from cdc_pipeline_spark.operators.urls import percent_normalize

    col = F.col(robots_col) if isinstance(robots_col, str) else robots_col
    lines = F.transform(
        F.split(F.regexp_replace(F.coalesce(col, F.lit("")), "\r", ""), "\n"),
        lambda l: F.trim(F.regexp_replace(F.translate(l, "\t", " "), "#.*", "")),
    )
    # per-line (key, value): key = lowercased text before the first
    # ':', value = trimmed remainder (lines without ':' get value '')
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
    n = F.size(keyed)
    idxs = F.sequence(F.lit(1), n)  # split() yields >= 1 element, so ascending
    at = lambda i: F.element_at(keyed, i)  # noqa: E731
    ua_idx = F.array_min(
        F.filter(idxs, lambda i: (at(i)["k"] == "user-agent") & (at(i)["v"] == "*"))
    )
    stop_idx = F.array_min(
        F.filter(
            idxs,
            lambda i: (i > ua_idx)
            & (at(i)["k"] == "user-agent")
            & (at(i)["v"] != "*"),
        )
    )
    rule_idx = F.filter(
        idxs,
        lambda i: (i > ua_idx)
        & F.coalesce(i < stop_idx, F.lit(True))
        & at(i)["k"].isin("allow", "disallow")
        & (at(i)["v"] != "")
        & ~at(i)["v"].contains("*")
        & ~at(i)["v"].contains("$"),
    )
    # percent-normalize the prefix with the same pass URL paths get
    # (RFC 9309 compares decoded octets; both sides must normalize
    # identically or encoded rules silently never match)
    return F.transform(
        rule_idx,
        lambda i: F.struct(
            (at(i)["k"] == F.lit("allow")).alias("allow"),
            percent_normalize(at(i)["v"]).alias("prefix"),
        ),
    ).cast(_RULES_TYPE)


def robots_allowed(path_col: Column | str, rules_col: Column | str) -> Column:
    """RFC 9309 longest-match decision for one path against a parsed
    rules array: allowed iff the longest matching Allow prefix is at
    least as long as the longest matching Disallow prefix (no matching
    Disallow ⇒ allowed; null rules — e.g. no robots row joined —
    ⇒ allowed)."""
    path = F.col(path_col) if isinstance(path_col, str) else path_col
    rules = F.col(rules_col) if isinstance(rules_col, str) else rules_col
    matched = F.filter(
        F.coalesce(rules, F.lit([]).cast(_RULES_TYPE)),
        lambda r: path.startswith(r["prefix"]),
    )
    best = lambda want_allow: F.array_max(  # noqa: E731
        F.transform(
            F.filter(matched, lambda r: r["allow"] == F.lit(want_allow)),
            lambda r: F.length(r["prefix"]),
        )
    )
    return F.coalesce(best(True), F.lit(-1)) >= F.coalesce(best(False), F.lit(-1))


def robots_policy(
    urls: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    robots_domain_col: str = "domain",
    robots_text_col: str = "robots_txt",
    out_col: str = "robots_allowed",
) -> DataFrame:
    """Tag every URL row with its robots.txt verdict: adds ``domain``,
    ``path`` and ``out_col`` (boolean). ``robots`` holds one row per
    registered domain with the raw robots.txt text; its rules parse
    inside the (broadcast) build side, so the per-domain text is parsed
    ONCE, not per URL. URLs whose domain has no robots row are allowed
    (crawl-standard default). Plan: one BroadcastHashJoin on the
    registered domain, the longest-match decision in-row — no shuffle
    on the corpus side."""
    from cdc_pipeline_spark.operators.urls import (
        _authority_parts,
        _host_pre_normalized,
        percent_normalize,
        registered_domain,
    )

    rules = F.broadcast(
        robots.select(
            F.col(robots_domain_col).alias("__r_domain"),
            parse_robots_rules(robots_text_col).alias("__r_rules"),
        )
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
    tagged = (
        urls.withColumn("__url_pct", percent_normalize(url_col))
        .withColumn("domain", registered_domain(_host_pre_normalized(u)))
        .withColumn("path", path)
        .drop("__url_pct")
    )
    return (
        tagged.join(rules, tagged["domain"] == rules["__r_domain"], "left")
        .withColumn(out_col, robots_allowed("path", "__r_rules"))
        .drop("__r_domain", "__r_rules")
    )
