"""Property-based tests (hypothesis) for the pure-expression invariants
the oracle gate can't explore exhaustively: cross-engine rounding, the
Morton key bijection, SCD2 interval algebra. Each property drives a
local Python model; the Spark twin is pinned separately by example
tests — these guard the MODELS the twins were derived from, cheaply
over thousands of generated cases.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# round_half_up model: floor(x·10^d + 0.5)/10^d must agree with itself
# across the expression shapes both engines use, and differ from
# banker's rounding only at exact .5 ties.
# ---------------------------------------------------------------------------


def _round_half_up(x: float, d: int) -> float:
    scale = float(10**d)
    return math.floor(x * scale + 0.5) / scale


@given(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
    st.integers(min_value=0, max_value=6),
)
@settings(max_examples=2000, deadline=None)
def test_round_half_up_bounded_and_monotone(x, d):
    r = _round_half_up(x, d)
    # result is within half a step of the input
    assert abs(r - x) <= 0.5 / 10**d + 1e-9 * max(1.0, abs(x))
    # idempotent: re-rounding is a fixpoint
    assert _round_half_up(r, d) == r


@given(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
    st.integers(min_value=0, max_value=6),
)
@settings(max_examples=1000, deadline=None)
def test_round_half_up_monotone_pairs(a, b, d):
    lo, hi = sorted((a, b))
    assert _round_half_up(lo, d) <= _round_half_up(hi, d)


# ---------------------------------------------------------------------------
# Morton key: interleaving must be a bijection on the rank grid and
# preserve per-dimension bit ordering (the property parquet pruning
# relies on: a Z-range covers a bounded rectangle set).
# ---------------------------------------------------------------------------


def _morton(coords: tuple[int, ...], bits: int) -> int:
    z = 0
    n = len(coords)
    for i, c in enumerate(coords):
        for j in range(bits):
            z |= ((c >> j) & 1) << (j * n + i)
    return z


@given(
    st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)), min_size=2, max_size=50, unique=True
    )
)
@settings(max_examples=500, deadline=None)
def test_morton_key_is_injective_on_grid(points):
    keys = [_morton(p, 8) for p in points]
    assert len(set(keys)) == len(points)


@given(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255))
@settings(max_examples=500, deadline=None)
def test_morton_key_monotone_per_dimension(x1, x2, y):
    # fixing one dimension, the key is monotone in the other
    lo, hi = sorted((x1, x2))
    assert _morton((lo, y), 8) <= _morton((hi, y), 8)


# ---------------------------------------------------------------------------
# SCD2 interval algebra (model of operators/cdc.py::scd2_history): for
# any per-key version/state sequence, the emitted intervals must tile
# the timeline — no gaps, no overlaps, exactly one open current row —
# and compression must never merge distinct adjacent states.
# ---------------------------------------------------------------------------


def _scd2_model(rows: list[tuple[int, str]], compress: bool = True):
    rows = sorted(set(rows))
    if compress:
        kept = []
        for v, s in rows:
            if not kept or kept[-1][1] != s:
                kept.append((v, s))
        rows = kept
    out = []
    for i, (v, s) in enumerate(rows):
        nxt = rows[i + 1][0] if i + 1 < len(rows) else None
        out.append((s, v, nxt, nxt is None))
    return out


@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=1000, deadline=None)
def test_scd2_intervals_tile_without_overlap(rows):
    intervals = _scd2_model(rows)
    assert sum(1 for *_, current in intervals if current) == 1
    for (s1, f1, t1, _), (s2, f2, t2, _) in zip(intervals, intervals[1:]):
        assert t1 == f2, "intervals must tile with no gap"
        assert s1 != s2, "compression must remove same-state repeats"
    assert intervals[-1][2] is None


def test_scd2_model_matches_spark(spark):
    """The property-tested model and the Spark operator agree on a
    generated sequence — anchoring the model to the real implementation."""
    from cdc_pipeline_spark.operators.cdc import scd2_history

    rows = [(v, s) for v, s in [(1, "a"), (3, "a"), (5, "b"), (9, "b"), (12, "c"), (20, "a")]]
    df = spark.createDataFrame([(1, v, s) for v, s in rows], "k long, v long, status string")
    got = sorted(
        (r["status"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_history(df, ["k"], "v", ["status"]).collect()
    )
    assert got == sorted(_scd2_model(rows))


def _budget_model(rows, budget):
    """Greedy-prefix reference: per group, sort by (quality desc, id),
    keep while the running total BEFORE the row is under budget."""
    from collections import defaultdict

    groups = defaultdict(list)
    for g, i, n, q in rows:
        groups[g].append((i, n, q))
    kept = set()
    for g, members in groups.items():
        members.sort(key=lambda t: (-t[2], t[0]))
        cum = 0
        for i, n, _q in members:
            if cum < budget:
                kept.add((g, i))
            cum += n
    return kept


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),            # group
            st.integers(0, 10_000),                  # id
            st.integers(1, 50),                      # tokens
            st.sampled_from([0.1, 0.2, 0.5, 0.9]),   # quality (ties likely)
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[1],
    ),
    st.integers(1, 120),
)
@settings(max_examples=30, deadline=None)
def test_token_budget_select_matches_model(spark, rows, budget):
    """Spark token_budget_select == the greedy-prefix reference model on
    arbitrary inputs: same kept set under ties, overshoot ≤ one row,
    never an undershoot while candidates remain."""
    from pyspark.sql import functions as F

    from cdc_pipeline_spark.operators.sampling import token_budget_select

    df = spark.createDataFrame(rows, "g string, id long, n long, q double")
    got = {
        (r.g, r.id)
        for r in token_budget_select(
            df, "g", "n", budget, order_by=[F.col("q").desc(), F.col("id")]
        ).collect()
    }
    assert got == _budget_model(rows, budget)


@given(
    st.lists(st.integers(0, 9), min_size=1, max_size=40),
    st.integers(1, 8),
    st.integers(1, 8),
)
@settings(max_examples=20, deadline=None)
def test_chunking_covers_every_token_with_correct_overlap(spark, toks_ints, window, stride):
    """Every token index lands in ⌈(i+1)/stride⌉-bounded chunks, chunk i
    starts at i·stride, and with stride == window the chunks partition
    the document exactly (concatenation reconstructs it)."""
    from cdc_pipeline_spark.operators.chunking import chunk_documents

    toks = [f"w{i}_{v}" for i, v in enumerate(toks_ints)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, window=window, stride=stride).collect(),
        key=lambda r: r.chunk_id,
    )
    n = len(toks)
    import math

    assert len(rows) == max(1, math.ceil(n / stride))
    seen = set()
    for r in rows:
        start = r.chunk_id * stride
        expect = toks[start : start + window]
        assert r.chunk_text.split(" ") == expect if expect else r.chunk_text == ""
        assert r.n_tokens == len(expect)
        seen.update(range(start, start + len(expect)))
    if stride <= window:
        # RAG overlap mode: every token position covered
        assert seen == set(range(n)), "every token position must be covered"
    else:
        # sparse-sampling mode (stride > window): exactly the strided
        # windows, nothing else
        expect_seen = {
            i for s in range(0, n, stride) for i in range(s, min(s + window, n))
        }
        assert seen == expect_seen
    if stride == window:
        rebuilt = " ".join(r.chunk_text for r in rows).split(" ")
        assert rebuilt == toks


# ---------------------------------------------------------------------------
# BPE greedy-merge model: the aggregate-fold twin (merge_pair_expr) and
# the DuckDB gaps-and-islands replay were both derived from the classic
# scan-skip-2 loop — guard that model's invariants over generated
# symbol sequences, then pin the Spark twin against it on a sample.
# ---------------------------------------------------------------------------


def _greedy_merge(syms: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


_SYMS = st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12)


@given(_SYMS, st.sampled_from(["a", "b", "c"]), st.sampled_from(["a", "b", "c"]))
@settings(max_examples=1500, deadline=None)
def test_greedy_merge_model_invariants(syms, a, b):
    out = _greedy_merge(syms, a, b)
    # token conservation: concatenation is unchanged
    assert "".join(out) == "".join(syms)
    # no adjacent (a, b) pair of ORIGINAL single-char symbols survives —
    # with a single-char alphabet a merged token ("ab", len 2) can never
    # equal the left element a, so scan-skip-2 must have consumed every
    # original pair occurrence
    for i in range(len(out) - 1):
        assert not (out[i] == a and out[i + 1] == b), (
            f"surviving pair at {i} in {out} from {syms}"
        )
    # hence a second application is a no-op (idempotence on the output)
    assert _greedy_merge(out, a, b) == out


@given(st.data())
@settings(max_examples=30, deadline=None)
def test_merge_pair_expr_matches_model_sampled(spark, data):
    from pyspark.sql import functions as F

    from cdc_pipeline_spark.operators.chunking import merge_pair_expr

    cases = [
        data.draw(_SYMS) for _ in range(8)
    ]
    a = data.draw(st.sampled_from(["a", "b", "c"]))
    b = data.draw(st.sampled_from(["a", "b", "c"]))
    df = spark.createDataFrame(
        [(i, syms) for i, syms in enumerate(cases)], "id int, syms array<string>"
    )
    got = {
        r["id"]: list(r["m"])
        for r in df.select("id", merge_pair_expr(F.col("syms"), a, b).alias("m")).collect()
    }
    for i, syms in enumerate(cases):
        assert got[i] == _greedy_merge(syms, a, b), (syms, a, b)


# ---------------------------------------------------------------------------
# Integer power-iteration renormalization: sign-split division must
# equal Python's floor division on the signed value ONLY for
# non-negative operands — the property that makes DuckDB's truncating
# `//` and Python's flooring `//` interchangeable in the oracle replay.
# ---------------------------------------------------------------------------


@given(
    st.integers(min_value=-(10**18), max_value=10**18),
    st.integers(min_value=1, max_value=10**12),
    st.integers(min_value=1, max_value=10**6),
)
@settings(max_examples=2000, deadline=None)
def test_sign_split_division_is_engine_portable(w, mx, v_scale):
    ours = -(((-w) * v_scale) // mx) if w < 0 else (w * v_scale) // mx
    # truncating division on the signed product (what DuckDB's CASE
    # computes, since its operands are made non-negative first)
    trunc = int(abs(w) * v_scale // mx) * (1 if w >= 0 else -1)
    assert ours == trunc
    assert abs(ours) <= abs(w) * v_scale // mx + (1 if w < 0 else 0)


# ---------------------------------------------------------------------------
# Unigram-LM Viterbi DP (chunking.unigram_viterbi): the DP must find the
# true optimum of the total lexicographic objective — verified against a
# brute-force enumeration of EVERY segmentation — and its path must
# reconstruct the word exactly.
# ---------------------------------------------------------------------------


def _all_segmentations(word, vocab, max_piece_len=4):
    """Every (n_pieces, n_unk, weight) over all covers of `word` by
    vocab pieces (len 1..max_piece_len) and 1-char UNKs."""
    n = len(word)
    if n == 0:
        return [(0, 0, 0)]
    out = []

    def rec(pos, np_, nu, wt):
        if pos == n:
            out.append((np_, nu, wt))
            return
        for j in range(1, min(max_piece_len, n - pos) + 1):
            piece = word[pos : pos + j]
            if piece in vocab:
                rec(pos + j, np_ + 1, nu, wt + vocab[piece])
        rec(pos + 1, np_ + 1, nu + 1, wt)  # UNK char

    rec(0, 0, 0, 0)
    return out


_UNI_WORD = st.text(alphabet="abc", min_size=0, max_size=8)
_UNI_VOCAB = st.dictionaries(
    st.text(alphabet="abc", min_size=1, max_size=4),
    st.integers(min_value=1, max_value=50),
    max_size=12,
)


@given(_UNI_WORD, _UNI_VOCAB)
@settings(max_examples=800, deadline=None)
def test_unigram_viterbi_is_optimal_and_reconstructs(word, vocab):
    from cdc_pipeline_spark.operators.chunking import unigram_viterbi

    np_, nu, pieces = unigram_viterbi(word, vocab)
    wt = sum(vocab[p] for p in pieces)
    # optimality under (n_pieces ASC, n_unk ASC, weight DESC)
    best = min((np2, nu2, -w2) for np2, nu2, w2 in _all_segmentations(word, vocab))
    assert (np_, nu, -wt) == best, (word, vocab, (np_, nu, wt), best)
    # path accounting: pieces + UNKs tile the word exactly
    assert np_ == len(pieces) + nu
    assert sum(len(p) for p in pieces) + nu == len(word)
    for p in pieces:
        assert p in vocab and p in word
    # full single-char coverage → no UNKs
    if all(c in vocab for c in set(word)):
        assert nu == 0


# ---------------------------------------------------------------------------
# Avro binary codec round-trip (sources/avro_codec.py) — pure Python,
# no Spark: encode→decode must be the identity over the supported
# subset for ARBITRARY values, not just the fixture rows.
# ---------------------------------------------------------------------------

_AVRO_PROP_SCHEMA = None


def _avro_prop_tools():
    global _AVRO_PROP_SCHEMA
    import json

    from cdc_pipeline_spark.sources.avro_codec import compile_decoder, compile_encoder

    if _AVRO_PROP_SCHEMA is None:
        _AVRO_PROP_SCHEMA = json.dumps(
            {
                "type": "record",
                "name": "r",
                "fields": [
                    {"name": "l", "type": "long"},
                    {"name": "s", "type": ["null", "string"]},
                    {"name": "d", "type": "double"},
                    {"name": "b", "type": "bytes"},
                    {"name": "arr", "type": {"type": "array", "items": "long"}},
                    {"name": "m", "type": {"type": "map", "values": "string"}},
                ],
            }
        )
    return compile_encoder(_AVRO_PROP_SCHEMA), compile_decoder(_AVRO_PROP_SCHEMA)


@settings(max_examples=300, deadline=None)
@given(
    l=st.integers(min_value=-(2**63), max_value=2**63 - 1),
    s=st.one_of(st.none(), st.text(max_size=80)),
    d=st.floats(allow_nan=False),  # NaN != NaN breaks dict equality, not the codec
    b=st.binary(max_size=60),
    arr=st.lists(st.integers(-(2**62), 2**62), max_size=12),
    m=st.dictionaries(st.text(max_size=10), st.text(max_size=10), max_size=6),
)
def test_avro_codec_roundtrip_identity(l, s, d, b, arr, m):
    enc, dec = _avro_prop_tools()
    rec = {"l": l, "s": s, "d": d, "b": b, "arr": arr, "m": m}
    assert dec(enc(rec)) == rec


@settings(max_examples=100, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(-(2**40), 2**40), st.text(max_size=30)), max_size=40
    ),
    per_block=st.integers(1, 7),
    codec=st.sampled_from(["null", "deflate"]),
)
def test_avro_ocf_container_roundtrip_any_blocking(rows, per_block, codec):
    """Container framing must be block-size invariant: any
    records_per_block and either codec reproduce the record stream."""
    import json

    from cdc_pipeline_spark.sources.avro_ocf import read_ocf_bytes, write_ocf_bytes

    schema = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "k", "type": "long"},
                {"name": "v", "type": "string"},
            ],
        }
    )
    recs = [{"k": k, "v": v} for k, v in rows]
    blob = write_ocf_bytes(recs, schema, codec=codec, records_per_block=per_block)
    assert list(read_ocf_bytes(blob)) == recs


# ---------------------------------------------------------------------------
# URL canonicalization properties (round 8): idempotence + host stability.
# Hypothesis GENERATES the URLs driver-side; one Spark job evaluates the
# whole batch (per-example Spark jobs would be 100x slower).
# ---------------------------------------------------------------------------

_URL_LABEL = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-",
    min_size=1,
    max_size=8,
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))
_URL_PARAM = st.one_of(
    st.tuples(st.sampled_from(["a", "b", "zz", "x1"]), st.sampled_from(["1", "2", "v?w", "https://e.com/p"])),
    st.tuples(st.sampled_from(["utm_source", "utm_campaign", "ref", "fbclid"]), st.just("t")),
)


@given(
    scheme=st.sampled_from(["http", "https", "HTTP", "HTTPS", "hTtPs"]),
    www=st.booleans(),
    labels=st.lists(_URL_LABEL, min_size=1, max_size=3),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.lists(
        st.sampled_from(
            # percent-encoded segments exercise normalization inside the
            # idempotence property: unreserved decode (%61, %7E),
            # hex-case (%3a), reserved stays (%2F, %25), invalid (%g1,
            # trailing %), half-valid pair (%%62)
            ["P", "p", "Api", "x-1", "%61bc", "%7E", "a%3ab", "q%2Fr", "%25", "%g1", "x%", "a%%62"]
        ),
        min_size=0,
        max_size=3,
    ),
    params=st.lists(_URL_PARAM, min_size=0, max_size=4),
    frag=st.sampled_from(["", "#f", "#a/b?c"]),
)
@settings(max_examples=60, deadline=None)
@pytest.mark.slow  # ~2 min hypothesis battery; exact percent/canonical tables stay default
def test_canonicalize_url_idempotent_and_host_stable(
    spark, scheme, www, labels, port, path, params, frag
):
    """canonicalize(canonicalize(u)) == canonicalize(u) — the canonical
    form is a fixed point (lowered scheme/host, default port and www and
    fragment and tracking params gone, sorted query), even for queries
    embedding absolute URLs or extra '?'s — and url_host agrees between
    the raw and canonical forms."""
    from cdc_pipeline_spark.operators.urls import canonicalize_url, url_host

    host = ("WWW." if www else "") + ".".join(labels)
    url = scheme + "://" + host + port
    if path:
        url += "/" + "/".join(path)
    if params:
        url += "?" + "&".join(f"{k}={v}" for k, v in params)
    url += frag
    df = spark.createDataFrame([(url,)], "url string")
    # STAGED columns, not nested expressions: canonicalize_url inlines
    # the big percent-normalize subtree at every reference, and
    # canonicalize(canonicalize(u)) in one select multiplied the tree —
    # Catalyst ANALYSIS took ~70 s per hypothesis example, 4325 s for
    # this one test (r10 durations run). c2/h_canon referencing the c1
    # COLUMN keeps every tree additive; it is also the documented
    # production idiom (see urls.canonicalize_url docstring).
    row = (
        df.withColumn("c1", canonicalize_url("url"))
        .withColumn("c2", canonicalize_url("c1"))
        .withColumn("h_raw", url_host("url"))
        .withColumn("h_canon", url_host("c1"))
        .collect()[0]
    )
    assert row["c2"] == row["c1"], f"not a fixed point: {url!r} -> {row['c1']!r} -> {row['c2']!r}"
    assert row["h_raw"] == row["h_canon"], f"host drifted: {url!r}"
    assert "#" not in row["c1"] and "utm_" not in row["c1"] and "ref=t" not in row["c1"]


def test_percent_normalize_idempotent_and_exact(spark):
    """percent_normalize is a fixed point and matches the RFC 3986
    normalization table on adversarial byte sequences."""
    from pyspark.sql import functions as F

    from cdc_pipeline_spark.operators.urls import percent_normalize

    cases = [
        ("%41%62%2d%5F%7e", "Ab-_~"),        # unreserved decode, both hex cases
        ("%3a%2f%3F%25", "%3A%2F%3F%25"),     # reserved: uppercase only
        ("plain", "plain"),
        ("%", "%"),
        ("%2", "%2"),
        ("%g1", "%g1"),
        # decode is SUPPRESSED after an invalid piece — decoding there
        # could synthesize a new valid sequence and break idempotence
        ("a%%62", "a%%62"),
        ("%4%31", "%4%31"),                  # naive decode would yield '%41' -> 'A' on pass 2
        ("%a%41", "%a%41"),
        ("a%%34%31", "a%%341"),              # decode resumes one piece after the invalid one
        ("%41%41%41", "AAA"),
        ("tr%61iling%", "trailing%"),
        ("", ""),
    ]
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(cases)], "i long, s string")
    out = df.select(
        "i",
        percent_normalize("s").alias("once"),
        percent_normalize(percent_normalize("s")).alias("twice"),
    )
    got = {r.i: (r.once, r.twice) for r in out.collect()}
    for i, (s, want) in enumerate(cases):
        assert got[i][0] == want, f"{s!r}: got {got[i][0]!r}, want {want!r}"
        assert got[i][1] == got[i][0], f"not idempotent on {s!r}"


# ---------------------------------------------------------------------------
# RFC 9309 wildcard matching (r11): the engine's compiled-rule match +
# literal-octet precedence must agree with a direct Python model of the
# RFC on arbitrary rule sets — including values where '*' / a trailing
# '$' / regex metacharacters appear in adversarial positions.
# ---------------------------------------------------------------------------

_RULE_CHARS = st.sampled_from(list("/ab.pdf*$?()[]{}+|^\\"))
_RULE_VALUE = st.text(alphabet=_RULE_CHARS, min_size=1, max_size=12).filter(
    lambda v: v.strip() == v and v != ""
)
_PATH = st.text(
    alphabet=st.sampled_from(list("/ab.pdf?$+x")), min_size=0, max_size=14
).map(lambda p: "/" + p)


def _model_robots_verdict(rules: list[tuple[bool, str]], path: str) -> bool:
    """Direct RFC 9309 §2.2.2/§2.2.3 model: trailing '$' anchors, '*'
    matches any sequence, specificity = literal octet count, Allow wins
    ties, no match => allowed."""
    import re as _re

    best = {True: -1, False: -1}
    for allow, value in rules:
        anchored = value.endswith("$")
        body = value[:-1] if anchored else value
        spec = len(body.replace("*", ""))
        if "*" in body or anchored:
            rex = "^" + _re.escape(body).replace(r"\*", ".*") + ("$" if anchored else "")
            ok = _re.search(rex, path) is not None
        else:
            ok = path.startswith(body)
        if ok:
            best[allow] = max(best[allow], spec)
    return best[True] >= best[False]


@given(st.data())
@settings(max_examples=12, deadline=None)
def test_robots_wildcard_match_agrees_with_rfc_model(spark, data):
    from pyspark.sql import functions as F

    from cdc_pipeline_spark.operators.robots import (
        _group_from_keyed,
        _keyed_lines,
        robots_allowed,
    )

    # several rule sets x several paths per example, ONE spark job:
    # the group machinery is staged through a materialized __keyed
    # projection (the robots_policy shape) so Catalyst analysis of the
    # inlined parse tree doesn't dominate the property run (review r10)
    rulesets = [
        [(data.draw(st.booleans()), data.draw(_RULE_VALUE)) for _ in range(8)]
        for _ in range(4)
    ]
    paths = [data.draw(_PATH) for _ in range(12)]
    rows = []
    for si, rules in enumerate(rulesets):
        txt = "User-agent: *\n" + "".join(
            f"{'Allow' if allow else 'Disallow'}: {v}\n" for allow, v in rules
        )
        rows += [(si, pi, txt, p) for pi, p in enumerate(paths)]
    df = spark.createDataFrame(rows, "si int, pi int, txt string, p string")
    keyed = df.select("si", "pi", "p", _keyed_lines("txt").alias("__k"))
    out = keyed.select(
        "si",
        "pi",
        robots_allowed("p", _group_from_keyed(F.col("__k"))["rules"]).alias("ok"),
    )
    got = {(r.si, r.pi): r.ok for r in out.collect()}
    for si, rules in enumerate(rulesets):
        for pi, p in enumerate(paths):
            want = _model_robots_verdict(rules, p)
            assert got[(si, pi)] == want, (
                f"path {p!r} rules {rules}: got {got[(si, pi)]}, want {want}"
            )
