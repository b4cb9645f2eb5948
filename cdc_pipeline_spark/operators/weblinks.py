"""WAT-style link/metadata extraction for crawled-page corpora.

CommonCrawl ships every WARC capture with a WAT sidecar — per-response
metadata: the HTTP envelope, the page ``<title>``, ``<meta>`` tags and,
most importantly, the OUTLINKS (every ``<a href>`` resolved against the
capture's target URI).  The link table is what crawl frontiers, host-
level web graphs (harmonic/PageRank centrality is a standard quality
prior — see the RefinedWeb / Gopher pipelines) and spam analyses are
built from.  This module is the engine's WAT surface: extraction and
RFC 3986 reference resolution as PURE COLUMN EXPRESSIONS (zero UDF,
zero shuffle — a projection over the parsed record rows that
`sources/warc.py:warc_records` emits).

Reference parity: the reference engine has no web-archive surface —
this module is part of the training-data-pipeline mandate, the same
charter as `operators/urls.py` (which owns canonicalization; resolution
here deliberately does NOT canonicalize — a resolved link preserves
port/case/params so policy layers decide what to collapse).

Scope (documented, not silent):

* ``extract_links`` parses ``<a ...>...</a>`` elements with a regex
  battery (double-quoted / single-quoted / unquoted ``href``), not an
  HTML5 tree builder — comments/CDATA containing anchors are counted,
  and an ``<a`` inside a ``<script>`` string literal would be too (run
  AFTER `text.strip_nontext_elements` when that matters).  Empty
  ``href=""`` self-links are dropped.
* ``resolve_reference`` implements RFC 3986 §5.2 for the reference
  shapes a crawl actually meets: absolute URI, protocol-relative
  ``//host/p``, root-relative ``/p``, query-only ``?q``, fragment-only
  (→ base sans fragment) and relative-path references with full
  ``remove_dot_segments`` semantics (§5.2.4: ``..`` pops, excess ``..``
  at root is dropped, trailing ``/.`` and ``/..`` keep the directory
  slash).  Out of scope: ``scheme:opaque`` non-hierarchical bases and
  bare ``scheme:`` relative forms (kept verbatim by the has-scheme
  branch, which is what a link filter wants anyway).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cdc_pipeline_spark.operators.urls import _authority_parts

__all__ = [
    "extract_links",
    "extract_title",
    "extract_meta",
    "remove_dot_segments",
    "resolve_reference",
    "http_links",
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# --- extraction ----------------------------------------------------------

_ANCHOR_RE = r"(?is)<a\b[^>]*>.*?</a\s*>"
_HREF_DQ = r"(?is)<a\b[^>]*?href\s*=\s*\"([^\"]*)\""
_HREF_SQ = r"(?is)<a\b[^>]*?href\s*=\s*'([^']*)'"
_HREF_UQ = r"(?is)<a\b[^>]*?href\s*=\s*([^\s\"'>][^\s>]*)"
_TITLE_RE = r"(?is)<title[^>]*>(.*?)</title\s*>"
_META_RE = r"(?is)<meta\b[^>]*>"
_META_NAME_DQ = r"(?is)\bname\s*=\s*\"([^\"]*)\""
_META_NAME_SQ = r"(?is)\bname\s*=\s*'([^']*)'"
_META_CONTENT_DQ = r"(?is)\bcontent\s*=\s*\"([^\"]*)\""
_META_CONTENT_SQ = r"(?is)\bcontent\s*=\s*'([^']*)'"


def _first_nonempty(*cols: Column) -> Column:
    out = cols[-1]
    for c in reversed(cols[:-1]):
        out = F.when(c != "", c).otherwise(out)
    return out


def _collapse_ws(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def extract_links(html: Column | str) -> Column:
    """``array<struct<href string, text string>>`` of the document's
    anchor elements, in order.  ``href`` is the raw attribute value
    (double-/single-/un-quoted battery, first anchor attribute wins);
    ``text`` is the tag-stripped, whitespace-collapsed anchor body.
    Anchors with no (or empty) ``href`` are dropped."""
    h = _col(html)
    elems = F.regexp_extract_all(h, F.lit(_ANCHOR_RE), 0)
    links = F.transform(
        elems,
        lambda e: F.struct(
            F.trim(
                _first_nonempty(
                    F.regexp_extract(e, _HREF_DQ, 1),
                    F.regexp_extract(e, _HREF_SQ, 1),
                    F.regexp_extract(e, _HREF_UQ, 1),
                )
            ).alias("href"),
            _collapse_ws(F.regexp_replace(e, r"(?is)<[^>]*>", " ")).alias("text"),
        ),
    )
    return F.filter(links, lambda l: l["href"] != "")


def extract_title(html: Column | str) -> Column:
    """The first ``<title>`` body, tag-stripped and whitespace-
    collapsed; NULL when the document has none."""
    t = _collapse_ws(
        F.regexp_replace(
            F.regexp_extract(_col(html), _TITLE_RE, 1), r"(?is)<[^>]*>", " "
        )
    )
    return F.when(t != "", t)


def extract_meta(html: Column | str) -> Column:
    """``array<struct<name string, content string>>`` of the
    document's named ``<meta>`` tags in order (duplicates preserved —
    callers that want a map decide the collision rule)."""
    tags = F.regexp_extract_all(_col(html), F.lit(_META_RE), 0)
    metas = F.transform(
        tags,
        lambda t: F.struct(
            F.lower(
                F.trim(
                    _first_nonempty(
                        F.regexp_extract(t, _META_NAME_DQ, 1),
                        F.regexp_extract(t, _META_NAME_SQ, 1),
                    )
                )
            ).alias("name"),
            F.trim(
                _first_nonempty(
                    F.regexp_extract(t, _META_CONTENT_DQ, 1),
                    F.regexp_extract(t, _META_CONTENT_SQ, 1),
                )
            ).alias("content"),
        ),
    )
    return F.filter(metas, lambda m: m["name"] != "")


# --- RFC 3986 resolution -------------------------------------------------

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:"


def remove_dot_segments(path: Column | str) -> Column:
    """RFC 3986 §5.2.4 over an absolute path column: ``.`` segments
    drop, ``..`` pops the previous segment, excess ``..`` at the root
    is discarded, and a trailing ``/.`` / ``/..`` keeps the trailing
    slash.  Empty segments (``//``) are preserved — they are legal path
    segments, not separators to collapse.  Pure fold
    (``F.aggregate``), no regex backtracking, no UDF."""
    p = _col(path)
    segs = F.split(F.regexp_replace(p, r"^/", ""), "/")
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(s == ".", acc)
        .when(s == "..", F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))))
        .otherwise(F.concat(acc, F.array(s))),
    )
    joined = F.concat(F.lit("/"), F.array_join(folded, "/"))
    return F.when(
        p.rlike(r"/\.\.?$") & ~joined.endswith("/"), F.concat(joined, F.lit("/"))
    ).otherwise(joined)


def resolve_reference(base: Column | str, href: Column | str) -> Column:
    """Resolve one reference against an absolute hierarchical base URI
    (RFC 3986 §5.2, scope note above).  The result keeps the base's
    authority verbatim (port, case, userinfo) — resolution is not
    canonicalization; feed the output to `urls.canonicalize_url` when
    a collapsed key is wanted.  NULL base or NULL href resolves NULL."""
    b = F.regexp_replace(_col(base), "#.*$", "")
    h = F.regexp_replace(F.trim(_col(href)), "#.*$", "")
    scheme = F.lower(F.substring_index(b, "://", 1))
    hostport, tail = _authority_parts(b)
    origin = F.concat(scheme, F.lit("://"), hostport)
    base_rawpath = F.substring_index(tail, "?", 1)
    base_path = F.when(base_rawpath == "", F.lit("/")).otherwise(base_rawpath)
    base_dir = F.regexp_replace(base_path, "[^/]*$", "")
    hpath = F.substring_index(h, "?", 1)
    hquery = F.when(h.contains("?"), h.substr(F.length(hpath) + F.lit(1), F.lit(1 << 20)))
    return (
        F.when(h == "", b)
        .when(h.rlike(_SCHEME_RE), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(
            h.startswith("/"),
            F.concat(origin, remove_dot_segments(hpath), F.coalesce(hquery, F.lit(""))),
        )
        .when(h.startswith("?"), F.concat(origin, base_path, h))
        .otherwise(
            F.concat(
                origin,
                remove_dot_segments(F.concat(base_dir, hpath)),
                F.coalesce(hquery, F.lit("")),
            )
        )
    )


def http_links(base: Column | str, links: Column | str) -> Column:
    """Resolve an `extract_links` array against the capture's target
    URI and keep only fetchable web links: ``array<string>`` of
    resolved ``http(s)://`` URLs in document order (``javascript:`` /
    ``mailto:`` / ``data:`` / other non-web schemes drop out AFTER
    resolution, so scheme-less relative forms survive)."""
    b = _col(base)
    resolved = F.transform(_col(links), lambda l: resolve_reference(b, l["href"]))
    return F.filter(resolved, lambda u: u.rlike(r"^https?://"))
