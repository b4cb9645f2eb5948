"""URL hygiene operators for web-scale corpus builds.

A crawled corpus keys on URLs three ways before any text-level dedup
runs: CANONICALIZATION (the same page reached via tracking params /
fragments / default ports / www must collapse to one key — C4 and
RefinedWeb both dedupe on a canonicalized URL first), REGISTERED-DOMAIN
extraction (per-domain quality priors, per-domain caps, robots/license
policy all key on the registrable domain, not the full host), and
DOMAIN CAPPING (a handful of boilerplate-heavy domains otherwise
dominate the token budget).

Reference parity: the reference engine has no URL surface — this module
is part of the training-data-pipeline mandate, same charter as
operators/dedup.py. Everything is pure column expressions (zero-UDF,
zero-shuffle per row); the only aggregation is the per-domain rollup a
caller adds, and the cap sample rides the engine's portable
multiplicative hash (`sampling._bucket`) so a SQL oracle replays the
keep-decision bit-for-bit.

Scope (documented, not silent): scheme://host[:port]/path[?query][#frag]
URLs. Canonicalization lowercases scheme+host only (paths are
case-sensitive), strips the fragment, strips DEFAULT ports (:80, :443),
strips a leading ``www.``, drops tracking params (``utm_*``, ``ref``)
and sorts the survivors — percent-encoding normalization and IDN are
out of scope (they need a real URL parser; run this AFTER a fetcher
that emits already-percent-normalized URLs). The registered-domain
extraction uses a compact multi-label-TLD table, not the full public
suffix list — extend ``MULTI_LABEL_TLDS`` for corpora where the long
tail matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_pipeline_spark.operators.sampling import _bucket

# Curated high-traffic multi-label public suffixes (two-label ccTLD
# registrations from the public suffix list; the full PSL is ~10k
# entries — swap in a broadcast lookup if the long tail matters for
# policy). The workload oracle generates its SQL IN-list from THIS
# tuple, so engine and oracle cannot drift.
MULTI_LABEL_TLDS = (
    # UK / IE-style
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "ltd.uk", "plc.uk",
    "net.uk", "sch.uk",
    # Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz", "school.nz",
    # Japan / Korea
    "co.jp", "ne.jp", "or.jp", "go.jp", "ac.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    "co.kr", "or.kr", "ne.kr", "go.kr", "re.kr", "pe.kr", "ac.kr",
    # India / South Asia
    "co.in", "net.in", "org.in", "ac.in", "edu.in", "gov.in", "res.in",
    "gen.in", "firm.in", "ind.in",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "ac.bd",
    "com.lk", "org.lk", "edu.lk", "gov.lk",
    "com.np", "org.np", "edu.np",
    # Greater China / SE Asia
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "co.th", "ac.th", "or.th", "go.th", "in.th",
    "co.id", "or.id", "ac.id", "web.id", "sch.id", "go.id",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    # Americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    "com.co", "net.co", "org.co",
    "com.pe", "net.pe", "org.pe", "gob.pe",
    "com.ve", "com.ec", "com.uy", "com.bo", "com.py", "com.do",
    "com.gt", "com.sv", "com.ni", "com.pa", "com.pr",
    # Europe / Middle East / Africa
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "web.tr",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "waw.pl",
    "com.es", "nom.es", "org.es", "edu.es", "gob.es",
    "com.pt", "net.pt", "org.pt", "edu.pt",
    "com.gr", "net.gr", "org.gr", "edu.gr",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "co.ae", "net.ae", "org.ae", "ac.ae", "gov.ae",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg",
    "co.za", "org.za", "net.za", "web.za", "ac.za", "gov.za",
    "co.ke", "or.ke", "ne.ke", "ac.ke", "go.ke",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng",
    "co.tz", "or.tz", "ac.tz", "go.tz",
    "co.zw", "org.zw", "ac.zw",
)

_TRACKING_PARAM_RE = r"^(utm_[a-z]+|ref|fbclid|gclid)="


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of an absolute URL (see module scope note):
    lowercase scheme+host, no fragment, no default port, no leading
    ``www.``, tracking params dropped, remaining query params sorted.
    Pure column expression — stays inside whole-stage codegen.

    The scheme/rest split and the path/query split both anchor on the
    FIRST occurrence of their delimiter (RFC 3986: a query may legally
    embed another absolute URL, e.g. ``?next=https://b.com/x``, and a
    second ``?`` inside the query is ordinary data) — a last-occurrence
    split would canonicalize a redirect URL to its *embedded* target."""
    u = F.regexp_replace(F.col(url) if isinstance(url, str) else url, "#.*$", "")
    scheme_raw = F.substring_index(u, "://", 1)
    scheme = F.lower(scheme_raw)
    rest = u.substr(F.length(scheme_raw) + F.lit(4), F.lit(1 << 20))
    # authority ends at the first '/' OR '?' (fragment already gone):
    # a query with no path — https://a.com?x=1, legal per RFC 3986 —
    # must not leak into the host
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    tail = rest.substr(F.length(hostport) + F.lit(1), F.lit(1 << 20))
    host = F.regexp_replace(hostport, ":(443|80)$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.substring_index(tail, "?", 1)
    query = F.when(
        tail.contains("?"), tail.substr(F.length(path) + F.lit(2), F.lit(1 << 20))
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )


def url_host(url: Column | str) -> Column:
    """Lowercased host of an absolute URL, default port and leading
    ``www.`` stripped (the canonicalized host on its own). Splits on
    the FIRST ``://`` — same embedded-URL rationale as
    :func:`canonicalize_url`."""
    u = F.regexp_replace(F.col(url) if isinstance(url, str) else url, "#.*$", "")
    rest = u.substr(F.length(F.substring_index(u, "://", 1)) + F.lit(4), F.lit(1 << 20))
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = F.regexp_replace(hostport, ":(443|80)$", "")
    return F.regexp_replace(host, r"^www\.", "")


def registered_domain(host: Column | str) -> Column:
    """Registrable domain of a host: last two labels, or last three when
    the two-label suffix is a known multi-label TLD (``a.b.co.uk`` →
    ``b.co.uk``). Hosts with one label (localhost) pass through."""
    h = F.col(host) if isinstance(host, str) else host
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    return (
        F.when(n <= 1, h)
        .when((n >= 3) & last2.isin(*MULTI_LABEL_TLDS), last3)
        .otherwise(last2)
    )


def domain_cap_sample(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    keep_pct: int = 40,
) -> DataFrame:
    """Per-document URL policy columns + a deterministic UNIFORM sample
    decision: adds ``canonical_url``, ``domain`` and ``keep`` (True for
    the ``keep_pct``% of ids the portable multiplicative hash selects —
    rerun-stable, engine-portable, replayed by the SQL oracle via
    ``sampling.bucket_sql``). ``keep`` is a global thinning knob,
    *independent of domain* — every domain is thinned proportionally.
    For an actual per-domain cap (bound the rows any single domain may
    contribute), use :func:`domain_cap`, which keeps at most N rows per
    registered domain. Both are zero-extra-shuffle projections here;
    the cap adds the one grouped-top-k shuffle it needs."""
    canon = canonicalize_url(url_col)
    return df.withColumn("canonical_url", canon).withColumn(
        "domain", registered_domain(url_host(F.col(url_col)))
    ).withColumn("keep", _bucket(F.col(id_col)) < F.lit(int(keep_pct)))


def domain_cap(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    max_per_domain: int = 1000,
) -> DataFrame:
    """TRUE per-domain cap: adds ``canonical_url`` + ``domain``, then
    keeps at most ``max_per_domain`` rows per registered domain, chosen
    by the portable hash order of the id (ties by id) — deterministic,
    partitioning-independent, and SQL-oracle-replayable as a
    ``row_number() OVER (PARTITION BY domain ORDER BY hash, id)``
    predicate. This is the operation the module header promises: a
    handful of boilerplate-heavy domains can no longer dominate the
    token budget, while small domains keep everything. One shuffle on
    ``domain`` (grouped top-k); at 100 TB the skew is the point — a
    mega-domain's partition still only *emits* ``max_per_domain`` rows,
    and AQE skew-split handles the scan-side imbalance."""
    from cdc_pipeline_spark.operators.sampling import deterministic_downsample

    tagged = df.withColumn("canonical_url", canonicalize_url(url_col)).withColumn(
        "domain", registered_domain(url_host(F.col(url_col)))
    )
    return deterministic_downsample(tagged, "domain", int(max_per_domain), id_col)
