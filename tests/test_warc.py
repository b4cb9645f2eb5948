"""WARC source tests: byte-level round trips (plain + per-member
gzip), framing quarantine, digest verification, HTTP sub-parse
(chunked coding, charset), and the Arrow-batched DataFrame operator."""

from __future__ import annotations

import base64
import hashlib

from pyspark.sql import functions as F

from cdc_pipeline_spark.sources.warc import (
    build_record,
    build_warc,
    dechunk,
    gzip_member,
    http_charset,
    http_response_block,
    iter_warc_file,
    parse_http_response,
    parse_warc_stream,
    payload_digest_header,
    split_gzip_members,
    warc_records,
)


def _response_record(uri: str, payload: bytes, status: int = 200, **hdr) -> bytes:
    block = http_response_block(
        status,
        "OK" if status == 200 else "Not Found",
        {"Content-Type": "text/html; charset=utf-8", "Content-Length": str(len(payload))},
        payload,
    )
    headers = {
        "WARC-Record-ID": f"<urn:test:{uri}>",
        "WARC-Date": "2025-03-04T05:06:07Z",
        "WARC-Target-URI": uri,
        "Content-Type": 'application/http; msgtype=response',
        "WARC-Payload-Digest": payload_digest_header(payload),
    }
    headers.update(hdr)
    return build_record("response", headers, block)


def _request_record(uri: str) -> bytes:
    block = f"GET {uri} HTTP/1.1\r\nHost: x\r\n\r\n".encode()
    return build_record(
        "request",
        {
            "WARC-Record-ID": f"<urn:test:req:{uri}>",
            "WARC-Date": "2025-03-04T05:06:07Z",
            "WARC-Target-URI": uri,
            "Content-Type": "application/http; msgtype=request",
        },
        block,
    )


def test_plain_roundtrip_offsets_and_fields():
    r1 = _request_record("https://a.com/x")
    r2 = _response_record("https://a.com/x", b"<html>hi</html>")
    data = build_warc([r1, r2])
    recs = list(parse_warc_stream(data))
    assert [r["valid"] for r in recs] == [True, True]
    assert recs[0]["headers"]["warc-type"] == "request"
    assert recs[1]["headers"]["warc-target-uri"] == "https://a.com/x"
    # offsets/lengths slice the original bytes exactly
    assert recs[0]["offset"] == 0 and recs[0]["length"] == len(r1)
    assert recs[1]["offset"] == len(r1) and recs[1]["length"] == len(r2)
    sliced = data[recs[1]["offset"] : recs[1]["offset"] + recs[1]["length"]]
    (again,) = parse_warc_stream(sliced)
    assert again["block"] == recs[1]["block"]


def test_gzip_member_roundtrip_compressed_coordinates():
    records = [
        _response_record(f"https://b.com/{i}", f"payload {i}".encode()) for i in range(3)
    ]
    gz = build_warc(records, per_record_gzip=True)
    recs = list(iter_warc_file(gz))
    assert len(recs) == 3 and all(r["valid"] for r in recs)
    # CDX convention: offsets/lengths address the COMPRESSED members —
    # each slice must decompress to exactly one record
    for i, rec in enumerate(recs):
        member = gz[rec["offset"] : rec["offset"] + rec["length"]]
        (only,) = split_gzip_members(member)
        assert only[2] == records[i]
    assert recs[-1]["offset"] + recs[-1]["length"] == len(gz)


def test_corrupt_gzip_member_quarantines_in_band():
    good = gzip_member(_response_record("https://c.com/ok", b"ok"))
    bad = gzip_member(_response_record("https://c.com/bad", b"bad"))[:-7]  # truncate CRC
    recs = list(iter_warc_file(good + bad))
    assert recs[0]["valid"] is True
    assert recs[1]["valid"] is False and "gzip" in recs[1]["error"]


def test_truncated_block_and_bad_version_quarantine():
    r = _response_record("https://d.com/x", b"full payload bytes")
    recs = list(parse_warc_stream(r[: len(r) // 2]))
    assert len(recs) == 1 and recs[0]["valid"] is False
    assert "truncated" in recs[0]["error"]
    recs = list(parse_warc_stream(b"NOTWARC/9 nope\r\n\r\n"))
    assert recs[0]["valid"] is False and "version" in recs[0]["error"]


def test_bare_lf_headers_and_junk_lines_tolerated():
    block = b"x" * 4
    raw = (
        b"WARC/1.0\nWARC-Type: resource\nWARC-Target-URI: https://e.com/\n"
        b"junk line without colon\nContent-Length: 4\n\n" + block + b"\r\n\r\n"
    )
    (rec,) = parse_warc_stream(raw)
    assert rec["valid"] and rec["block"] == block
    assert rec["headers"]["warc-target-uri"] == "https://e.com/"


def test_http_parse_chunked_and_charset():
    body = b"7\r\nMozilla\r\n4\r\nDev!\r\n0\r\n\r\n"
    assert dechunk(body) == b"MozillaDev!"
    block = http_response_block(
        200,
        "OK",
        {"Content-Type": 'text/html; charset="ISO-8859-1"', "Transfer-Encoding": "chunked"},
        body,
    )
    http = parse_http_response(block)
    assert http["payload"] == b"MozillaDev!"
    assert http["stored_payload"] == body  # digests verify bytes AS STORED
    assert http_charset(http["headers"]["content-type"]) == "iso-8859-1"
    assert http_charset("text/plain") is None


def test_digest_verification_base32_and_hex():
    payload = b"digest me"
    rec = _response_record("https://f.com/", payload)
    (parsed,) = parse_warc_stream(rec)
    from cdc_pipeline_spark.sources.warc import _digest_ok

    claimed = parsed["headers"]["warc-payload-digest"]
    assert _digest_ok(claimed, payload) is True
    assert _digest_ok(claimed, payload + b"!") is False
    hexed = "sha256:" + hashlib.sha256(payload).hexdigest().upper()
    assert _digest_ok(hexed, payload) is True
    assert _digest_ok("md5:ABCD", payload) is None  # unknown algo: unverifiable
    assert _digest_ok(None, payload) is None


def test_warc_records_dataframe_all_paths(spark):
    ok = build_warc(
        [_request_record("https://g.com/1"), _response_record("https://g.com/1", b"<html>1</html>")]
    )
    gz = build_warc(
        [_response_record("https://g.com/2", b"<html>2</html>", status=404)],
        per_record_gzip=True,
    )
    bad_digest = _response_record(
        "https://g.com/3", b"<html>3</html>", **{"WARC-Payload-Digest": "sha256:AAAA"}
    )
    truncated = _response_record("https://g.com/4", b"<html>4</html>")[:40]
    df = spark.createDataFrame(
        [
            ("a.warc", bytearray(ok)),
            ("b.warc.gz", bytearray(gz)),
            ("c.warc", bytearray(bad_digest + truncated)),
            ("d.warc", None),
        ],
        "path string, content binary",
    )
    out = warc_records(df).orderBy("path", "record_offset").collect()
    by_path: dict[str, list] = {}
    for row in out:
        by_path.setdefault(row["path"], []).append(row)
    assert len(by_path["a.warc"]) == 2
    req, resp = by_path["a.warc"]
    assert req["warc_type"] == "request" and req["http_status"] is None
    assert resp["http_status"] == 200 and bytes(resp["http_payload"]) == b"<html>1</html>"
    assert resp["payload_digest_ok"] is True
    assert resp["warc_date"] == "2025-03-04T05:06:07Z"
    (gz_row,) = by_path["b.warc.gz"]
    assert gz_row["http_status"] == 404 and gz_row["valid"] is True
    bad, trunc = by_path["c.warc"]
    assert bad["valid"] is True and bad["payload_digest_ok"] is False
    assert trunc["valid"] is False and "truncated" in trunc["error"]
    assert "d.warc" not in by_path  # NULL payload: no archive, skipped


def test_warc_records_need_payload_false_header_only_projection(spark):
    """The header-only parse (need_payload=False, r12) must be
    byte-identical to the full parse on EVERY column except
    http_payload / *_digest_ok, which read NULL — framing, HTTP
    sub-parse, `valid` and quarantine semantics unchanged."""
    ok = build_warc(
        [_request_record("https://g.com/1"), _response_record("https://g.com/1", b"<html>1</html>")]
    )
    gz = build_warc(
        [_response_record("https://g.com/2", b"<html>2</html>", status=404)],
        per_record_gzip=True,
    )
    bad_digest = _response_record(
        "https://g.com/3", b"<html>3</html>", **{"WARC-Payload-Digest": "sha256:AAAA"}
    )
    truncated = _response_record("https://g.com/4", b"<html>4</html>")[:40]
    df = spark.createDataFrame(
        [
            ("a.warc", bytearray(ok)),
            ("b.warc.gz", bytearray(gz)),
            ("c.warc", bytearray(bad_digest + truncated)),
        ],
        "path string, content binary",
    )
    full = warc_records(df).orderBy("path", "record_offset", "record_id").collect()
    lean = (
        warc_records(df, need_payload=False)
        .orderBy("path", "record_offset", "record_id")
        .collect()
    )
    assert len(full) == len(lean)
    nulled = {"http_payload", "block_digest_ok", "payload_digest_ok"}
    for f_row, l_row in zip(full, lean):
        for name in f_row.asDict():
            if name in nulled:
                assert l_row[name] is None
            else:
                assert l_row[name] == f_row[name], name


def test_warc_records_empty_input_schema_stable(spark):
    df = spark.createDataFrame([], "path string, content binary")
    out = warc_records(df)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields][:4] == [
        "path",
        "record_offset",
        "record_length",
        "warc_version",
    ]


def test_payload_digest_header_is_spec_base32():
    payload = b"abc"
    value = payload_digest_header(payload, algo="sha1")
    algo, _, b32 = value.partition(":")
    assert algo == "sha1"
    assert base64.b32decode(b32) == hashlib.sha1(payload).digest()


def test_surt_key_battery(spark):
    from cdc_pipeline_spark.operators.urls import surt_key

    cases = [
        ("https://www.Example.COM/A/b?b=2&a=1&utm_source=x", "com,example)/a/b?a=1&b=2"),
        ("http://sub.site.co.uk:8080/", "uk,co,site,sub:8080)/"),
        ("https://a.com:443?q=1#frag", "com,a)/?q=1"),
        ("https://ex%41mple.com/P%61th", "com,example)/path"),
        ("http://h.io:80/x", "io,h)/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["k"] for r in df.select(surt_key("url").alias("k")).collect()]
    assert got == [want for _, want in cases]


def test_truncated_record_does_not_merge_into_next():
    """A record cut mid-header must NOT frame on the NEXT record's
    Content-Length: the embedded version line marks the merge and the
    remainder quarantines as one invalid row."""
    truncated = _response_record("https://h.com/x", b"<html>x</html>")[:40]
    following = _request_record("https://h.com/y")
    recs = list(parse_warc_stream(truncated + following))
    assert len(recs) == 1
    assert recs[0]["valid"] is False and "framing merge" in recs[0]["error"]
    assert recs[0]["length"] == len(truncated) + len(following)


def test_stream_warc_records_matches_batch_twin(spark, tmp_path):
    """Streaming ingest golden test: files landing one per micro-batch
    must produce EXACTLY the batch parse of the same directory —
    including quarantine rows and compressed-coordinate offsets."""
    from cdc_pipeline_spark.sources.files import read_binary_files
    from cdc_pipeline_spark.sources.warc import stream_warc_records

    src = tmp_path / "captures"
    src.mkdir()
    for i in range(4):
        records = [
            _request_record(f"https://s{i}.com/a"),
            _response_record(f"https://s{i}.com/a", f"<html>{i}</html>".encode()),
        ]
        if i == 2:  # one truncated capture: the quarantine row must stream too
            records[1] = records[1][:40]
        (src / f"cap{i}.warc.gz").write_bytes(build_warc(records, per_record_gzip=True))

    out = stream_warc_records(spark, str(src), glob="*.warc.gz")
    assert out.isStreaming
    query = (
        out.writeStream.format("memory")
        .queryName("warc_stream_rows")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    streamed = spark.sql(
        "select * from warc_stream_rows order by path, record_offset"
    ).collect()
    batch = (
        warc_records(read_binary_files(spark, str(src), glob="*.warc.gz"))
        .orderBy("path", "record_offset")
        .collect()
    )
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]
    assert sum(1 for r in streamed if not r["valid"]) == 1
    assert len(streamed) == 8


def test_dechunk_rejects_negative_and_malformed_sizes():
    """int(x, 16) would accept '-6' and move the cursor backwards into
    an infinite loop — size tokens must be pure hex digits."""
    import pytest

    for bad in (b"1\r\nA\r\n-6\r\n", b"+2\r\nAB\r\n0\r\n\r\n", b"0x2\r\nAB\r\n0\r\n\r\n",
                b"1_0\r\nA\r\n0\r\n\r\n", b"\r\nA\r\n0\r\n\r\n"):
        with pytest.raises(ValueError):
            dechunk(bad)


def test_gzip_member_larger_than_feed_chunk_roundtrips():
    """Members are decompressed from fixed-size feed chunks (the
    O(members x filesize) tail-slice fix) — a member whose compressed
    size crosses the chunk boundary must still split exactly."""
    import cdc_pipeline_spark.sources.warc as W

    old = W._GZ_CHUNK
    W._GZ_CHUNK = 64  # force many feed chunks per member
    try:
        records = [_response_record(f"https://big.com/{i}", bytes(range(256)) * 40) for i in range(3)]
        gz = build_warc(records, per_record_gzip=True)
        parts = list(split_gzip_members(gz))
        assert [p[2] for p in parts] == records
        assert parts[-1][0] + parts[-1][1] == len(gz)
    finally:
        W._GZ_CHUNK = old


def test_http_lf_headers_with_crlfcrlf_in_payload():
    """An LF-framed header block followed by a payload containing
    CRLFCRLF must split on the EARLIER bare-LF blank line — payload
    bytes must not leak into the header block."""
    block = b"HTTP/1.1 200 OK\nContent-Type: application/octet-stream\n\n<body>\r\n\r\nrest"
    http = parse_http_response(block)
    assert http["payload"] == b"<body>\r\n\r\nrest"
    assert http["headers"]["content-type"] == "application/octet-stream"


def test_gzip_quarantine_and_extra_records_use_member_coordinates():
    """Every record parsed out of one member — extras past the first
    and quarantine rows included — reports the MEMBER's stored
    (offset, length): mixing the compressed base with uncompressed
    in-member positions points outside the file."""
    r1 = _response_record("https://m.com/1", b"one")
    r2 = _response_record("https://m.com/2", b"two")
    two_in_one = gzip_member(r1 + r2)
    with_tail = gzip_member(r1 + _response_record("https://m.com/3", b"xyz")[:40])
    data = two_in_one + with_tail
    recs = list(iter_warc_file(data))
    assert [r["valid"] for r in recs] == [True, True, True, False]
    assert "truncated" in recs[3]["error"]
    for rec in recs[:2]:
        assert (rec["offset"], rec["length"]) == (0, len(two_in_one))
    for rec in recs[2:]:
        assert (rec["offset"], rec["length"]) == (len(two_in_one), len(with_tail))
        # the coordinates address real stored bytes: re-fetch works
        member = data[rec["offset"] : rec["offset"] + rec["length"]]
        assert next(split_gzip_members(member))[2] is not None


def test_transfer_encoding_coding_list_still_dechunks():
    """'gzip, chunked' is spec-legal (chunked must be final) and must
    still de-chunk — an exact-match test ships raw chunk framing."""
    body = b"3\r\nabc\r\n0\r\n\r\n"
    block = http_response_block(
        200, "OK", {"Transfer-Encoding": "gzip, chunked"}, body
    )
    assert parse_http_response(block)["payload"] == b"abc"


def test_obs_fold_value_containing_warc_token_stays_valid():
    """A folded header continuation whose text contains 'WARC/' belongs
    to a named field — the framing-merge guard must not fire."""
    block = b"ok"
    raw = (
        b"WARC/1.1\r\nWARC-Type: resource\r\n"
        b"WARC-Target-URI: https://a.com/crawl/\r\n WARC/segment/1.warc\r\n"
        b"Content-Length: 2\r\n\r\n" + block + b"\r\n\r\n"
    )
    (rec,) = parse_warc_stream(raw)
    assert rec["valid"] is True
    assert rec["headers"]["warc-target-uri"].endswith("WARC/segment/1.warc")


def test_surt_key_case_variants_collapse(spark):
    """The case fold happens BEFORE tracking filtering and param
    sorting — mixed-case variants of one URL must produce the SAME
    urlkey (review r11: folding the finished key sorted params by
    pre-fold ASCII and let UTM_Source survive the tracking filter)."""
    from cdc_pipeline_spark.operators.urls import surt_key

    cases = [
        ("https://a.com/p?B=2&a=1", "com,a)/p?a=1&b=2"),
        ("https://a.com/p?b=2&a=1", "com,a)/p?a=1&b=2"),
        ("https://a.com/p?UTM_Source=feed&a=1", "com,a)/p?a=1"),
        ("https://a.com/p?utm_source=feed&a=1", "com,a)/p?a=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["k"] for r in df.select(surt_key("url").alias("k")).collect()]
    assert got == [want for _, want in cases]


def test_write_warc_files_roundtrip_with_manifest(spark, tmp_path):
    """Write direction: rows -> per-partition .warc.gz shards + a
    manifest receipt; reading the shards back yields every record."""
    from cdc_pipeline_spark.sources.files import read_binary_files
    from cdc_pipeline_spark.sources.warc import write_warc_files

    rows = [
        (
            "resource",
            {"WARC-Record-ID": f"<urn:w:{i}>", "WARC-Target-URI": f"https://w.com/{i}"},
            f"payload {i}".encode(),
        )
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "warc_type string, headers map<string,string>, block binary"
    ).repartition(3)
    out = str(tmp_path / "shards")
    manifest = write_warc_files(df, out).collect()
    assert sum(m["n_records"] for m in manifest) == 10
    assert all(m["path"].endswith(".warc.gz") for m in manifest)
    import os

    for m in manifest:
        assert os.path.getsize(m["path"]) == m["n_bytes"]
    back = warc_records(read_binary_files(spark, out, glob="*.warc.gz")).collect()
    assert len(back) == 10 and all(r["valid"] for r in back)
    assert sorted(r["record_id"] for r in back) == sorted(f"<urn:w:{i}>" for i in range(10))
    # round-trip through the gzip member coordinates: re-fetch one
    raw = open(manifest[0]["path"], "rb").read()
    recs = list(iter_warc_file(raw))
    assert all(r["valid"] for r in recs)
