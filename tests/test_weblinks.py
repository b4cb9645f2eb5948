"""Unit tests for the WAT-surface link/metadata extraction and RFC 3986
reference resolution (`operators/weblinks.py`).  Resolution is checked
DIFFERENTIALLY against `urllib.parse.urljoin` (CPython's RFC 3986
implementation) over the in-scope reference shapes, so the column
expressions track the spec rather than our reading of it."""

from __future__ import annotations

from urllib.parse import urljoin

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from cdc_pipeline_spark.operators import weblinks as W


def _one(spark, expr):
    return spark.range(1).select(expr.alias("v")).first().v


# --- extraction ----------------------------------------------------------


def test_extract_links_battery(spark):
    html = (
        '<p>intro</p><a href="/a">first <b>link</b></a>'
        "<a href='b/c.html'>second</a>"
        "<a href=../up>third</a>"
        '<a class="x" href="https://other.com/p?q=1#f">abs</a>'
        '<a href="">self</a><a name="anchor">no href</a>'
        '<A HREF="/CASE">upper</A>'
    )
    links = _one(spark, W.extract_links(F.lit(html)))
    assert [(l["href"], l["text"]) for l in links] == [
        ("/a", "first link"),
        ("b/c.html", "second"),
        ("../up", "third"),
        ("https://other.com/p?q=1#f", "abs"),
        ("/CASE", "upper"),
    ]


def test_extract_links_attribute_token_precedence(spark):
    """Review r11: data-href's suffix must not match, an href= inside
    another attribute's position must not override document order, and
    quote style must not outrank document order."""
    html = (
        '<a data-href="/tracked" href=/real>x</a>'
        "<a href=/first href=\"/second\">y</a>"
    )
    links = _one(spark, W.extract_links(F.lit(html)))
    assert [l["href"] for l in links] == ["/real", "/first"]


def test_extract_links_unclosed_anchor_does_not_swallow(spark):
    """Review r11: a missing </a> ends at the next <a (browser
    auto-close), so following anchors keep their hrefs."""
    html = '<p><a href="/1">one <a href="/2">two</a><a href="/3">three'
    links = _one(spark, W.extract_links(F.lit(html)))
    assert [(l["href"], l["text"]) for l in links] == [
        ("/1", "one"),
        ("/2", "two"),
        ("/3", "three"),
    ]


def test_extract_links_entity_decode(spark):
    """Review r11: spec-compliant pages escape & as &amp; in every
    multi-parameter href; the link table must carry the DECODED URL."""
    html = '<a href="/p?a=1&amp;b=2">A &amp; B &lt;now&gt;</a>'
    links = _one(spark, W.extract_links(F.lit(html)))
    assert [(l["href"], l["text"]) for l in links] == [
        ("/p?a=1&b=2", "A & B <now>")
    ]
    assert (
        _one(spark, W.extract_title(F.lit("<title>A &amp; B</title>"))) == "A & B"
    )
    # single-pass semantics: '&amp;lt;' is the literal text '&lt;'
    assert _one(spark, W.decode_entities(F.lit("&amp;lt;"))) == "&lt;"


def test_extract_title_and_meta(spark):
    html = (
        "<head><title> The\n <i>Big</i>   Page </title>"
        '<meta name="description" content="a long summary">'
        "<meta name='robots' content='noindex'>"
        '<meta charset="utf-8"><meta name="dup" content="1">'
        '<meta name="dup" content="2">'
        "<meta name=viewport content=width=device-width></head>"
    )
    assert _one(spark, W.extract_title(F.lit(html))) == "The Big Page"
    metas = _one(spark, W.extract_meta(F.lit(html)))
    assert [(m["name"], m["content"]) for m in metas] == [
        ("description", "a long summary"),
        ("robots", "noindex"),
        ("dup", "1"),
        ("dup", "2"),
        ("viewport", "width=device-width"),
    ]
    assert _one(spark, W.extract_title(F.lit("<p>no title</p>"))) is None


# --- remove_dot_segments -------------------------------------------------


@pytest.mark.parametrize(
    "path,expect",
    [
        ("/a/b/c/./../../g", "/a/g"),  # RFC 3986 §5.4.1 example
        ("/mid/content=5/../6", "/mid/6"),  # RFC 3986 §5.4.2 example
        ("/a/../..", "/"),  # excess .. at root drops
        ("/../../g", "/g"),
        ("/a/b/..", "/a/"),  # trailing /.. keeps the slash
        ("/a/b/.", "/a/b/"),
        ("/a//b", "/a//b"),  # empty segments preserved
        ("/a/", "/a/"),
        ("/", "/"),
    ],
)
def test_remove_dot_segments(spark, path, expect):
    assert _one(spark, W.remove_dot_segments(F.lit(path))) == expect


# --- resolve_reference: differential vs urllib ---------------------------

_BASES = [
    "https://example.com/art/42?z=9&a=1",
    "https://m.sub.example.co.uk:8443/a/b/index.html",
    "http://example.com/",
    "https://example.com/a/b/",
    "https://example.com?x=1",  # pathless base (review r11)
]

_REFS = [
    "",
    "#frag",
    "g",
    "./g",
    "g/",
    "../g",
    "../../g",
    "../../../g",  # excess .. — urljoin (3986 mode) drops it
    "g?y=2",
    "g?y=2#s",
    "?y",
    "/rooted/x",
    "/rooted/../y",
    "//cdn.example.net/lib.js",
    "//cdn.example.net/a/./b",  # §5.2.2 strict rds (review r11)
    "https://abs.example.org/p?q#m",
    "https://abs.example.org/a/../b?q",  # §5.2.2 strict rds (review r11)
    "https://abs.example.org",  # empty path stays empty
    "mailto:a@b.example",
    "javascript:void(0)",
]


def _rds_py(path: str) -> str:
    """RFC 3986 §5.2.4 reference model (mirrors the column fold's
    documented trailing-slash rule)."""
    if not path:
        return path
    out: list[str] = []
    for seg in path.lstrip("/").split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    joined = "/" + "/".join(out)
    if (path.endswith("/.") or path.endswith("/..")) and not joined.endswith("/"):
        joined += "/"
    return joined


def _rfc_expected(base: str, href: str) -> str:
    """urljoin, then strict §5.2.2: CPython's urljoin deviates from the
    RFC by SKIPPING remove_dot_segments when the reference carries its
    own authority (absolute or protocol-relative refs) — the RFC's
    T.path = remove_dot_segments(R.path) applies in every branch, so
    the model re-applies it (idempotent where urljoin already did)."""
    from urllib.parse import urlsplit, urlunsplit

    expect = urljoin(base, href).split("#", 1)[0]
    sp = urlsplit(expect)
    if sp.netloc:
        expect = urlunsplit((sp.scheme, sp.netloc, _rds_py(sp.path), sp.query, ""))
    return expect


def test_resolve_reference_differential_vs_urljoin(spark):
    rows = [Row(base=b, href=r) for b in _BASES for r in _REFS]
    df = spark.createDataFrame(rows).select(
        "base", "href", W.resolve_reference("base", "href").alias("got")
    )
    for r in df.collect():
        # our resolver strips the fragment (link-table semantics);
        # urljoin keeps it — compare on the defragmented form
        expect = _rfc_expected(r.base, r.href)
        assert r.got == expect, f"base={r.base!r} href={r.href!r}"


def test_http_links_filters_nonweb_schemes(spark):
    html = (
        '<a href="/a">x</a><a href="mailto:a@b">m</a>'
        '<a href="javascript:void(0)">j</a><a href="//c.com/y">p</a>'
        '<a href="data:text/plain,hi">d</a>'
        '<a href="HTTP://up.example/z">case</a>'
    )
    out = _one(
        spark,
        W.http_links(
            F.lit("https://h.example:8080/base/page"),
            W.extract_links(F.lit(html)),
        ),
    )
    # schemes are case-insensitive (review r11): HTTP:// survives the
    # web-scheme filter, verbatim (resolution never canonicalizes)
    assert out == [
        "https://h.example:8080/a",
        "https://c.com/y",
        "HTTP://up.example/z",
    ]


def test_crawl_frontier_fold_semantics(spark):
    """Review r11 regressions the fixture can't trigger: a url
    discovered both as outlink AND redirect keeps both per-kind rows,
    and a captured event kills the url regardless of discovery kinds."""
    events = spark.createDataFrame(
        [
            ("https://d.com/x", "outlink"),
            ("https://d.com/x", "outlink"),
            ("https://d.com/x", "redirect"),
            ("https://d.com/seen", "outlink"),
            ("https://d.com/seen", "captured"),
            ("https://d.com/mine", "captured"),
            ("https://d.com/new", "redirect"),
        ],
        "url string, kind string",
    )
    got = {
        (r.url, r.link_kind): r.n_discoveries
        for r in W.crawl_frontier(events).collect()
    }
    assert got == {
        ("https://d.com/x", "outlink"): 2,
        ("https://d.com/x", "redirect"): 1,
        ("https://d.com/new", "redirect"): 1,
    }


def test_resolve_reference_null_safe(spark):
    df = spark.createDataFrame(
        [Row(base=None, href="/a"), Row(base="https://x.com/", href=None)]
    )
    got = df.select(W.resolve_reference("base", "href").alias("v")).collect()
    assert [r.v for r in got] == [None, None]
