"""Unit tests for source-chain pure parts (no Kafka/JDBC needed): wire
header strip, schema-id extraction, CDC normalization, JSON decode."""

from __future__ import annotations

import datetime as dt
import struct

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from cdc_pipeline_spark.operators.cdc import (
    latest_state,
    normalize_cdc,
    parse_cdc_timestamp,
    soft_delete_filter,
)
from cdc_pipeline_spark.sources.kafka_avro import confluent_schema_id, strip_confluent_header


def test_strip_confluent_header(spark):
    payload = b"avro-bytes-here"
    wire = struct.pack(">bI", 0, 42) + payload
    df = spark.createDataFrame([(bytearray(wire),)], "value binary")
    out = df.select(strip_confluent_header("value").alias("p"), confluent_schema_id("value")).collect()[0]
    assert bytes(out["p"]) == payload
    assert out["schema_id"] == 42


def test_parse_cdc_timestamp_three_formats(spark):
    df = spark.createDataFrame(
        [
            ("2024-03-05T10:20:30.123456Z",),
            ("2024-03-05T10:20:30Z",),
            ("2024-03-05 10:20:30",),
        ],
        "raw string",
    )
    rows = df.select(parse_cdc_timestamp(F.col("raw")).alias("ts")).collect()
    assert [r.ts is not None for r in rows] == [True, True, True]
    assert rows[0].ts.microsecond == 123456
    assert rows[1].ts == dt.datetime(2024, 3, 5, 10, 20, 30)


def test_normalize_cdc_filters_deletes_and_parses(spark):
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("created_at", StringType()),
            StructField("__op", StringType()),
            StructField("__deleted", StringType()),
        ]
    )
    df = spark.createDataFrame(
        [
            (1, "2024-03-05T10:20:30Z", "c", "false"),
            (2, "2024-03-05T10:20:31Z", "u", "false"),
            (3, "2024-03-05T10:20:32Z", "d", "true"),
            (4, "2024-03-05T10:20:33Z", "r", "false"),
        ],
        schema,
    )
    out = normalize_cdc(df, ["created_at"]).collect()
    assert sorted(r.id for r in out) == [1, 2, 4]
    assert all(isinstance(r.created_at, dt.datetime) for r in out)
    assert soft_delete_filter(df).count() == 3


def test_latest_state_collapses_cdc_lifecycle(spark):
    # order 1: pending → completed (two CDC rows); order 2: single row
    df = spark.createDataFrame(
        [
            (1, "pending", 100),
            (1, "completed", 200),
            (2, "pending", 150),
        ],
        "id long, status string, __source_ts_ms long",
    )
    out = {r.id: r.status for r in latest_state(df, ["id"], ["__source_ts_ms"]).collect()}
    assert out == {1: "completed", 2: "pending"}


# ---------------------------------------------------------------------------
# S3 Avro decode: reader-schema derivation + capability gate. The container
# has no spark-avro jar, so decode EXECUTION can't run here — these pin (a)
# the Debezium union-ordering conventions the reference documents
# (/root/reference/src/streaming/schemas.py:174-180), where a wrong union
# order makes PERMISSIVE mode null every record, and (b) the graceful
# AVRO_NOT_LOADED gate, so a future jar drop lights the chain up.
# ---------------------------------------------------------------------------

ZONED_DEFAULT = "1970-01-01T00:00:00.000000Z"


def _users_reader_schema():
    import json as _json

    from cdc_pipeline_spark.schemas import USERS, with_cdc_meta
    from cdc_pipeline_spark.sources.kafka_avro import avro_reader_schema

    return _json.loads(
        avro_reader_schema(
            with_cdc_meta(USERS),
            "UsersCdc",
            zoned_ts_cols=("created_at", "updated_at"),
            defaults={"id": 0, "created_at": ZONED_DEFAULT, "updated_at": ZONED_DEFAULT},
        )
    )


def test_avro_reader_schema_debezium_union_ordering():
    schema = _users_reader_schema()
    by_name = {f["name"]: f for f in schema["fields"]}
    # non-nullable id with connect default → plain long, not a union
    assert by_name["id"]["type"] == {"type": "long", "connect.default": 0}
    assert by_name["id"]["default"] == 0
    # defaulted ZonedTimestamp → STRING-FIRST union (Debezium emits the
    # defaulted member first; null-first here would null every record)
    created = by_name["created_at"]["type"]
    assert isinstance(created, list) and created[1] == "null"
    assert created[0]["connect.name"] == "io.debezium.time.ZonedTimestamp"
    assert created[0]["connect.default"] == ZONED_DEFAULT
    assert by_name["created_at"]["default"] == ZONED_DEFAULT
    # plain nullable column → null-first union, default null
    assert by_name["country_code"]["type"] == ["null", "string"]
    assert by_name["country_code"]["default"] is None
    # CDC envelope meta columns ride along
    assert by_name["__op"]["type"] == ["null", "string"]
    assert by_name["__source_ts_ms"]["type"] == ["null", "long"]


def test_avro_reader_schema_boolean_first_and_direct_topics():
    import json as _json

    from cdc_pipeline_spark.schemas import REQUEST_LOG, SESSIONS, with_cdc_meta
    from cdc_pipeline_spark.sources.kafka_avro import avro_reader_schema

    sessions = _json.loads(
        avro_reader_schema(
            with_cdc_meta(SESSIONS),
            "SessionsCdc",
            zoned_ts_cols=("started_at", "ended_at", "created_at"),
            uuid_cols=("id",),
            defaults={"is_active": True, "created_at": ZONED_DEFAULT},
        )
    )
    by_name = {f["name"]: f for f in sessions["fields"]}
    # boolean-first union with true default (reference convention)
    assert by_name["is_active"]["type"][0] == {"type": "boolean", "connect.default": True}
    assert by_name["is_active"]["type"][1] == "null"
    # non-nullable ZonedTimestamp → bare logical type, no union
    assert by_name["started_at"]["type"]["connect.name"] == "io.debezium.time.ZonedTimestamp"
    # nullable ZonedTimestamp without default → null-first
    assert by_name["ended_at"]["type"][0] == "null"

    # direct (non-CDC) topic: plain TimestampType → epoch-millis long
    request_log = _json.loads(avro_reader_schema(REQUEST_LOG, "RequestLog"))
    by_name = {f["name"]: f for f in request_log["fields"]}
    assert by_name["created_at"]["type"] == {"type": "long", "logicalType": "timestamp-millis"}
    assert by_name["status_code"]["type"] == "int"


def test_decode_avro_gate_without_jar(spark):
    """Without the spark-avro jar the capability probe is False and
    decode_avro fails at ANALYSIS time with Spark's AVRO_NOT_LOADED error
    — never silently, never at runtime mid-stream."""
    import pytest as _pytest

    from cdc_pipeline_spark.schemas import USERS, with_cdc_meta
    from cdc_pipeline_spark.sources.kafka_avro import (
        avro_available,
        avro_reader_schema,
        decode_avro,
    )

    reader_schema = avro_reader_schema(
        with_cdc_meta(USERS), "UsersCdc", zoned_ts_cols=("created_at", "updated_at")
    )
    wire = struct.pack(">bI", 0, 7) + b"\x00" * 16
    df = spark.createDataFrame([(bytearray(wire),)], "value binary")
    if avro_available(spark):
        # jar present (future container): the chain must analyze cleanly
        assert set(decode_avro(df, reader_schema).columns) >= {"id", "username", "__op"}
    else:
        with _pytest.raises(Exception, match="AVRO_NOT_LOADED|avro"):
            decode_avro(df, reader_schema).schema


def test_align_to_schema_evolution_rules(spark):
    """Add-only evolution: missing → typed NULLs, extras drop, widening
    casts, narrowing raises."""
    import pytest
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from cdc_pipeline_spark.sources.evolution import align_to_schema, union_evolved

    target = StructType(
        [
            StructField("id", LongType()),
            StructField("amount", DoubleType()),
            StructField("note", StringType()),
        ]
    )
    v1 = spark.createDataFrame([(1, 2.5)], "id long, amount double")          # missing note
    v2 = spark.createDataFrame(
        [(2, 3.0, "hi", "extra")], "id int, amount double, note string, debug string"
    )  # int id (widen) + extra column (drop)
    a1, a2 = align_to_schema(v1, target), align_to_schema(v2, target)
    assert a1.schema == target and a2.schema == target
    merged = union_evolved([v1, v2], target)
    rows = {r.id: (r.amount, r.note) for r in merged.collect()}
    assert rows == {1: (2.5, None), 2: (3.0, "hi")}

    narrowing = spark.createDataFrame([(1.5, 1.0, "x")], "id double, amount double, note string")
    with pytest.raises(TypeError, match="narrow"):
        align_to_schema(narrowing, target)


def test_parse_json_with_dlq_routes_failures(spark):
    """Good rows parse once; unparseable and schema-violating payloads
    land in the dead-letter frame with their raw payload intact —
    nothing is silently dropped."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from cdc_pipeline_spark.sources.kafka_avro import parse_json_with_dlq

    schema = StructType([StructField("id", LongType()), StructField("name", StringType())])
    rows = [
        (0, '{"id": 1, "name": "ok"}'),
        (1, 'not json at all'),
        (2, '{"id": "NaN-ish", "name": "bad-type"}'),
        (3, '{"id": 2, "name": "fine"}'),
    ]
    df = spark.createDataFrame(rows, "offset long, value string")
    good, dead = parse_json_with_dlq(df, schema, carry_cols=("offset",))
    got = {r.id: r.name for r in good.collect()}
    assert got == {1: "ok", 2: "fine"}
    assert set(good.columns) == {"offset", "id", "name"}
    dl = {r.offset: r.raw_payload for r in dead.collect()}
    assert set(dl) == {1, 2}
    assert dl[1] == "not json at all", "raw evidence preserved"


# ---------------------------------------------------------------------------
# Pure-Python Avro decode path (sources/avro_codec.py): S1/S3/S6 exercised
# end-to-end without the spark-avro jar — synthetic Confluent-framed Avro
# bytes, encoded here from the public Avro 1.11 binary spec, flow through
# header strip → decode → CDC normalize as a real micro-batched stream.
# ---------------------------------------------------------------------------


def _avro_varint(u: int) -> bytes:
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz(n: int) -> bytes:
    return _avro_varint((n << 1) ^ (n >> 63))


def _avro_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return _zz(len(b)) + b


def _encode_cdc_user(id_, username, created_at_iso, op, source_ts_ms):
    """Encode one record against the avro_reader_schema layout for a
    (id, username, created_at)+CDC-meta struct: non-null long, then
    null-first unions for each nullable field (branch 1 = value)."""
    import struct as _s

    body = _zz(id_)
    for val, enc in (
        (username, _avro_str),
        (created_at_iso, _avro_str),  # ZonedTimestamp rides as string
        (op, _avro_str),
        ("users", _avro_str),  # __table
        (source_ts_ms, _zz),  # __source_ts_ms long
        ("false", _avro_str),  # __deleted
    ):
        if val is None:
            body += _zz(0)  # null branch
        else:
            body += _zz(1) + enc(val)
    return body


def _confluent_frame(avro_bytes: bytes, schema_id: int = 7) -> bytes:
    import struct as _s

    return b"\x00" + _s.pack(">I", schema_id) + avro_bytes


def _cdc_user_avro_schema():
    import json as _json

    from pyspark.sql.types import LongType, StringType, StructField, StructType, TimestampType

    from cdc_pipeline_spark.schemas import with_cdc_meta
    from cdc_pipeline_spark.sources.kafka_avro import avro_reader_schema

    struct = with_cdc_meta(
        StructType(
            [
                StructField("id", LongType(), False),
                StructField("username", StringType()),
                StructField("created_at", TimestampType()),
            ]
        )
    )
    return avro_reader_schema(struct, "UserEnvelope", zoned_ts_cols=("created_at",))


def test_avro_codec_roundtrip_and_permissive_drop():
    """compile_decoder inverts the spec encoding exactly; corrupt and
    truncated payloads raise (→ PERMISSIVE drop in the frame API)."""
    import pytest as _pytest

    from cdc_pipeline_spark.sources.avro_codec import avro_to_spark_schema, compile_decoder

    schema_json = _cdc_user_avro_schema()
    decode = compile_decoder(schema_json)
    rec = decode(_encode_cdc_user(41, "ada", "2024-01-01T00:00:05.000000Z", "c", 1704067205000))
    assert rec["id"] == 41 and rec["username"] == "ada"
    assert rec["__op"] == "c" and rec["__source_ts_ms"] == 1704067205000
    # nullable field: null branch decodes to None
    rec2 = decode(_encode_cdc_user(42, None, "2024-01-01T00:00:06Z", "u", 1))
    assert rec2["username"] is None
    for bad in (b"", b"\xff\xff\xff", _encode_cdc_user(1, "x", "t", "c", 1) + b"\x00"):
        with _pytest.raises(Exception):
            decode(bad)
    spark_schema = avro_to_spark_schema(schema_json)
    assert [f.name for f in spark_schema.fields][:3] == ["id", "username", "created_at"]
    assert spark_schema["created_at"].dataType.simpleString() == "string"  # ZonedTimestamp string


def test_avro_cdc_chain_end_to_end_stream(spark, tmp_path):
    """The full S1→S3→S4→S5 chain as a stream, jar-free: Confluent-framed
    Avro micro-batches → header strip → pure-Python decode (corrupt rows
    dropped) → op filter (deletes dropped) → ZonedTimestamp normalize."""
    import datetime as _dt

    from cdc_pipeline_spark.operators.cdc import normalize_cdc
    from cdc_pipeline_spark.sources.kafka_avro import avro_available, decode_avro_auto

    assert not avro_available(spark), "container has no spark-avro jar; test exercises fallback"
    schema_json = _cdc_user_avro_schema()
    frames = [
        _confluent_frame(_encode_cdc_user(1, "ada", "2024-01-01T00:00:05.000000Z", "c", 100)),
        _confluent_frame(_encode_cdc_user(2, "bob", "2024-01-01T00:00:06Z", "u", 200)),
        _confluent_frame(_encode_cdc_user(3, "eve", "2024-01-01T00:00:07.000000Z", "d", 300)),  # delete → dropped
        _confluent_frame(b"\x13\x37garbage-not-avro"),  # corrupt → dropped
    ]
    src = tmp_path / "avro_stream"
    src.mkdir()
    for i, frame in enumerate(frames):
        spark.createDataFrame([(bytearray(frame),)], "value binary").write.parquet(
            str(src / f"batch_{i}.parquet")
        )
    raw = spark.readStream.schema("value binary").option(
        "maxFilesPerTrigger", "2"
    ).parquet(str(src) + "/*/")
    decoded = decode_avro_auto(raw, schema_json)
    normalized = normalize_cdc(decoded, ["created_at"])
    q = (
        normalized.writeStream.format("memory")
        .queryName("avro_e2e")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.id: r for r in spark.sql("SELECT * FROM avro_e2e").collect()}
    assert set(rows) == {1, 2}, rows  # delete + corrupt dropped
    assert rows[1].username == "ada" and rows[1]["__op"] == "c"
    assert rows[1].created_at == _dt.datetime(2024, 1, 1, 0, 0, 5)
    assert rows[2].created_at == _dt.datetime(2024, 1, 1, 0, 0, 6)
    assert rows[2]["__source_ts_ms"] == 200


def test_read_binary_files_glob_and_size_guard(spark, tmp_path):
    """binaryFile ingestion: glob filters at listing time, max_bytes
    prunes on the status column, content round-trips byte-exact."""
    from cdc_pipeline_spark.sources.files import read_binary_files

    (tmp_path / "a.img").write_bytes(b"\x89IMG" + b"\x00" * 10)
    (tmp_path / "b.img").write_bytes(b"\x89IMG" + b"\xff" * 500)
    (tmp_path / "skip.txt").write_bytes(b"not media")
    out = read_binary_files(spark, str(tmp_path), glob="*.img", max_bytes=100)
    rows = out.collect()
    assert [r.path.rsplit("/", 1)[-1] for r in rows] == ["a.img"]
    assert bytes(rows[0].content) == b"\x89IMG" + b"\x00" * 10
    assert rows[0].length == 14
    all_imgs = read_binary_files(spark, str(tmp_path), glob="*.img")
    assert all_imgs.count() == 2


def test_avro_python_timestamp_millis_true_epoch_any_session_tz(spark):
    """The jar-free decode path must yield the TRUE epoch for
    timestamp-millis longs regardless of spark.sql.session.timeZone —
    naive datetimes cross Arrow in the session zone, so the decoder
    shifts non-UTC wall clocks to compensate."""
    import json as _json

    from cdc_pipeline_spark.session import temp_conf
    from cdc_pipeline_spark.sources.avro_codec import decode_avro_python

    schema = _json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-millis"}},
            ],
        }
    )
    epoch_ms = 1704067205000  # 2024-01-01T00:00:05Z
    payload = _zz(7) + _zz(epoch_ms)
    df = spark.createDataFrame([(bytearray(payload),)], "value binary")
    for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
        with temp_conf(spark, "spark.sql.session.timeZone", tz):
            out = decode_avro_python(df, schema).select(
                "id", F.unix_millis("ts").alias("ms")
            ).collect()
        assert [(r.id, r.ms) for r in out] == [(7, epoch_ms)], tz


def test_avro_negative_length_is_dropped_not_rewound(spark):
    """A corrupt negative length varint must fail the record (PERMISSIVE
    drop), never move the cursor backwards into already-decoded bytes."""
    import json as _json

    import pytest as _pytest

    from cdc_pipeline_spark.sources.avro_codec import compile_decoder, decode_avro_python

    schema = _json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [{"name": "s", "type": "string"}],
        }
    )
    bad = _zz(-1)  # string length -1
    with _pytest.raises(ValueError):
        compile_decoder(schema)(bad)
    df = spark.createDataFrame([(bytearray(bad),)], "value binary")
    assert decode_avro_python(df, schema).count() == 0


def test_orc_roundtrip_preserves_values_and_schema(spark, tmp_path):
    """ORC write→read must reproduce the parquet-loaded table exactly
    (columnar with embedded schema — the lake-format alternative)."""
    from cdc_pipeline_spark.sources.files import load_table, read_orc, write_orc

    src = load_table(spark, "/root/testdata/sf0.001", "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(src, path)
    back = read_orc(spark, path, schema=src.schema)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_xml_roundtrip_with_declared_schema(spark, tmp_path):
    """XML write→read under a declared schema must reproduce values —
    the interchange edge for third-party feeds (no type metadata in the
    format, so the schema contract carries everything)."""
    from cdc_pipeline_spark.sources.files import load_table, read_xml, write_xml

    src = load_table(spark, "/root/testdata/sf0.001", "region")
    path = str(tmp_path / "region_xml")
    write_xml(src, path, row_tag="region", root_tag="regions")
    back = read_xml(spark, path, schema=src.schema, row_tag="region")
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_schema_registry_fetch_against_wire_compatible_local_server():
    """S10 (`kafka_avro.fetch_schema_from_registry`) exercised against a
    real HTTP server speaking the Confluent REST wire shape on loopback
    (GET /subjects/<subject>/versions/latest → {"schema": "<json>"}).
    Upgrades the row from code-only to protocol-tested without external
    infrastructure; the fetched schema must feed the jar-free codec."""
    import http.server
    import json as _json
    import threading

    from cdc_pipeline_spark.sources.avro_codec import compile_decoder
    from cdc_pipeline_spark.sources.kafka_avro import fetch_schema_from_registry

    schema = {
        "type": "record",
        "name": "Transaction",
        "fields": [
            {"name": "transaction_id", "type": "string"},
            {"name": "amount", "type": "double"},
        ],
    }
    seen = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            seen.append(self.path)
            if self.path == "/subjects/transactions-value/versions/latest":
                body = _json.dumps(
                    {"subject": "transactions-value", "version": 3, "id": 17,
                     "schema": _json.dumps(schema)}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

        def log_message(self, *a):  # keep pytest output clean
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        got = fetch_schema_from_registry(url, "transactions-value")
        assert _json.loads(got) == schema
        assert seen == ["/subjects/transactions-value/versions/latest"]
        assert compile_decoder(got) is not None
    finally:
        srv.shutdown()
        srv.server_close()


def test_jdbc_snapshot_roundtrip_on_embedded_derby(spark):
    """S9 (`jdbc.read_table_snapshot`) exercised against a REAL JDBC
    database — Derby embedded, which ships in Spark's classpath — with
    no external infrastructure: write a table through Spark's JDBC sink,
    read it back plain AND range-partitioned, and require identical
    rows (no dropped/duplicated boundary rows), the same contract the
    env-gated Postgres smoke checks in production."""
    from pyspark.sql import functions as F

    from cdc_pipeline_spark.sources.jdbc import read_table_snapshot

    url = "jdbc:derby:memory:s9db;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    # Derby writes derby.log to the working directory at engine boot;
    # point it at tmp (a no-op if the engine already booted this JVM)
    spark._jvm.java.lang.System.setProperty(
        "derby.stream.error.file", "/tmp/derby-test.log"
    )
    src = spark.range(0, 97).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 3 % 11).cast("int").alias("v"),
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "snap")
        .option("driver", driver)
        .mode("overwrite")
        .save()
    )
    # Derby resolves unqualified names against the connection USER's
    # schema; the sink above wrote as the default APP user
    plain = read_table_snapshot(
        spark, url, "APP.snap", user="u", password="p", driver=driver
    )
    assert plain.count() == 97
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, src.collect()))

    parted = read_table_snapshot(
        spark,
        url,
        "APP.snap",
        user="u",
        password="p",
        driver=driver,
        partition_column="k",
        lower_bound=0,
        upper_bound=97,
        num_partitions=4,
    )
    assert parted.rdd.getNumPartitions() == 4
    assert sorted(map(tuple, parted.collect())) == sorted(map(tuple, src.collect()))


# ---------------------------------------------------------------------------
# Avro encoder + OCF container (sources/avro_codec.py, avro_ocf.py)
# ---------------------------------------------------------------------------


def _ocf_schema():
    import json

    return json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "name", "type": ["null", "string"]},
                {"name": "price", "type": "double"},
                {"name": "flag", "type": "boolean"},
                {"name": "raw", "type": "bytes"},
                {"name": "tags", "type": {"type": "array", "items": "string"}},
                {"name": "kv", "type": {"type": "map", "values": "long"}},
                {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
            ],
        }
    )


def _ocf_records(n=2500):
    import datetime

    return [
        {
            "id": i,
            "name": None if i % 3 == 0 else f"név{i}",
            "price": i * 0.5,
            "flag": i % 2 == 0,
            "raw": bytes([i % 256, 0, 255]),
            "tags": [f"t{i}", "x"] if i % 5 else [],
            "kv": {"a": i, "b": -i} if i % 7 else {},
            "ts": datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=i, microseconds=i),
        }
        for i in range(n)
    ]


def test_ocf_roundtrip_null_and_deflate_codecs():
    from cdc_pipeline_spark.sources.avro_ocf import read_ocf_bytes, write_ocf_bytes

    schema, recs = _ocf_schema(), _ocf_records()
    for codec in ("null", "deflate"):
        blob = write_ocf_bytes(recs, schema, codec=codec, records_per_block=700)
        assert list(read_ocf_bytes(blob)) == recs
    # deflate must actually compress this redundant data
    assert len(write_ocf_bytes(recs, schema, codec="deflate")) < len(
        write_ocf_bytes(recs, schema)
    )


def test_ocf_encoder_long_extremes_and_empty():
    from cdc_pipeline_spark.sources.avro_codec import compile_decoder, compile_encoder
    from cdc_pipeline_spark.sources.avro_ocf import read_ocf_bytes, write_ocf_bytes
    import json

    schema = json.dumps(
        {"type": "record", "name": "r", "fields": [{"name": "v", "type": "long"}]}
    )
    enc, dec = compile_encoder(schema), compile_decoder(schema)
    for v in (0, -1, 1, 63, -64, 2**62, -(2**62), 2**63 - 1, -(2**63)):
        assert dec(enc({"v": v})) == {"v": v}, v
    assert list(read_ocf_bytes(write_ocf_bytes([], schema))) == []


def test_ocf_rejects_corruption_and_bad_magic():
    import pytest

    from cdc_pipeline_spark.sources.avro_ocf import read_ocf_bytes, write_ocf_bytes

    schema, recs = _ocf_schema(), _ocf_records(10)
    blob = write_ocf_bytes(recs, schema)
    with pytest.raises(ValueError, match="sync marker"):
        list(read_ocf_bytes(blob[:-5] + b"XXXXX"))
    with pytest.raises(ValueError, match="bad magic"):
        list(read_ocf_bytes(b"NOPE" + blob[4:]))
    with pytest.raises(ValueError, match="unsupported Avro codec"):
        write_ocf_bytes(recs, schema, codec="snappy")


def test_ocf_deflate_bomb_bounded():
    """A tiny deflate block expanding past max_block_bytes must raise
    without allocating the expansion (bound enforced DURING inflate)."""
    import json

    import pytest

    from cdc_pipeline_spark.sources.avro_ocf import read_ocf_bytes, write_ocf_bytes

    schema = json.dumps(
        {"type": "record", "name": "r", "fields": [{"name": "s", "type": "string"}]}
    )
    # 8 MiB of zeros deflates to ~8 KiB
    recs = [{"s": "\x00" * (1 << 23)}]
    blob = write_ocf_bytes(recs, schema, codec="deflate")
    assert len(blob) < 1 << 16
    with pytest.raises(ValueError, match="max_block_bytes"):
        list(read_ocf_bytes(blob, max_block_bytes=1 << 16))
    # and within budget it decodes fine
    assert next(read_ocf_bytes(blob, max_block_bytes=1 << 24))["s"] == "\x00" * (1 << 23)


def test_write_read_avro_spark_roundtrip(spark, tmp_path):
    """Distributed round-trip: nullable strings, doubles, timestamps
    across multiple partitions/files; read back equals the original."""
    import datetime

    from cdc_pipeline_spark.sources.files import read_avro, write_avro

    rows = [
        (
            i,
            None if i % 4 == 0 else f"u{i}",
            i * 1.25,
            datetime.datetime(2024, 2, 1) + datetime.timedelta(minutes=i),
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id long, name string, amt double, ts timestamp")
    target = str(tmp_path / "avro_rt")
    write_avro(df.repartition(4), target, mode="overwrite")
    import os

    parts = [p for p in os.listdir(target) if p.endswith(".avro")]
    assert len(parts) == 4  # one container per partition, no tmp leftovers
    back = read_avro(spark, target)
    assert back.schema == df.schema
    assert sorted(back.collect()) == sorted(df.collect())
    # mode=error refuses to clobber
    import pytest

    with pytest.raises(FileExistsError):
        write_avro(df, target, mode="error")


def test_read_avro_empty_dir_requires_schema(spark, tmp_path):
    import os

    import pytest

    from cdc_pipeline_spark.sources.files import read_avro

    empty = str(tmp_path / "none")
    os.makedirs(empty)
    with pytest.raises(Exception):  # binaryFile on empty dir or explicit raise
        read_avro(spark, empty).collect()


def test_write_avro_exact_bigints_and_nan_null_distinction(spark, tmp_path):
    """The Arrow-native writer path must not widen nullable longs to
    float64 (values past 2^53 stay exact even when the column holds
    nulls) and must keep genuine NaN doubles distinct from nulls
    (NaN → Avro double branch, null → union null branch)."""
    from cdc_pipeline_spark.sources.files import read_avro, write_avro

    big = 9007199254740993  # 2^53 + 1: unrepresentable in float64
    df = spark.createDataFrame(
        [(1, big, 1.5), (2, None, float("nan")), (3, -big - 2, None)],
        "id long, big long, d double",
    )
    target = str(tmp_path / "avro_exact")
    write_avro(df, target, mode="overwrite")
    back = {r.id: r for r in read_avro(spark, target).collect()}
    assert back[1].big == big and back[3].big == -big - 2
    assert back[2].big is None
    assert back[2].d != back[2].d  # NaN, not null
    assert back[3].d is None  # null, not NaN


def test_write_avro_validates_mode_before_write(tmp_path, spark):
    """A typo'd mode fails loudly on a FRESH path too — not a silent
    write followed by an error on the second run."""
    import pytest

    from cdc_pipeline_spark.sources.files import write_avro

    df = spark.range(3)
    fresh = str(tmp_path / "nope")
    with pytest.raises(ValueError, match="modes error/overwrite"):
        write_avro(df, fresh, mode="append")
    import os

    assert not os.path.exists(fresh)  # nothing was written


def test_read_avro_rejects_mismatched_pinned_schema(spark, tmp_path):
    """A caller-pinned schema whose field names don't match the embedded
    writer schema raises instead of returning silently all-null columns."""
    import pytest
    from pyspark.sql.types import LongType, StructField, StructType

    from cdc_pipeline_spark.sources.files import read_avro, write_avro

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    target = str(tmp_path / "avro_pin")
    write_avro(df, target, mode="overwrite")
    wrong = StructType(
        [StructField("id", LongType()), StructField("missing_col", LongType())]
    )
    with pytest.raises(Exception, match="do not match embedded"):
        read_avro(spark, target, schema=wrong).collect()


def test_ocf_deflate_rejects_trailing_garbage():
    """Trailing bytes after a deflate stream are rejected like every
    other trailing-bytes case (do.unused_data check)."""
    import json

    import pytest

    from cdc_pipeline_spark.sources.avro_ocf import read_ocf_bytes, write_ocf_bytes

    schema = json.dumps(
        {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    )
    blob = write_ocf_bytes([{"x": 7}], schema, codec="deflate")
    # locate the deflate payload: header ends at the first sync marker;
    # rebuild the block with garbage appended inside the size envelope
    import zlib

    from cdc_pipeline_spark.sources.avro_ocf import _read_header

    schema_json, codec, sync, cur = _read_header(blob)
    header = blob[: cur.pos]
    count = cur.read_long()
    size = cur.read_long()
    payload = cur.take(size)
    tampered = payload + b"\x00garbage"

    def zz(n):
        z = (n << 1) ^ (n >> 63)
        out = bytearray()
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    bad = header + zz(count) + zz(len(tampered)) + tampered + sync
    with pytest.raises(ValueError, match="trailing bytes after OCF deflate"):
        list(read_ocf_bytes(bad))


def test_write_read_avro_non_utc_session_preserves_instants(spark, tmp_path):
    """Timestamps must land on the TRUE epoch under a non-UTC session:
    the writer receives tz-aware Arrow instants and the reader emits
    tz=UTC Arrow instants, so the stored epoch — asserted via
    ``cast(ts as long)``, which is session-zone-independent — survives
    a DST-crossing pair of values exactly, read back from EITHER a
    non-UTC or a UTC session. (Wall-clock RENDERING of a naive datetime
    is a session concern outside this contract: `newSession()` +
    runtime tz conf interprets createDataFrame's naive inputs
    self-consistently but surprisingly, so the pin is on instants.)"""
    from pyspark.sql import functions as F

    from cdc_pipeline_spark.sources.files import read_avro, write_avro

    ny = spark.newSession()
    ny.conf.set("spark.sql.session.timeZone", "America/New_York")
    df = ny.createDataFrame(
        [(1, 1706788800), (2, 1719815400), (3, None)], "id long, epoch long"
    ).select("id", F.col("epoch").cast("timestamp").alias("ts"))
    target = str(tmp_path / "avro_tz")
    write_avro(df, target, mode="overwrite")
    stored_in = {r.id: r.epoch for r in df.select("id", F.col("ts").cast("long").alias("epoch")).collect()}
    assert stored_in == {1: 1706788800, 2: 1719815400, 3: None}
    for session in (ny, spark):
        back = {
            r.id: r.epoch
            for r in read_avro(session, target)
            .select("id", F.col("ts").cast("long").alias("epoch"))
            .collect()
        }
        assert back == stored_in, session.conf.get("spark.sql.session.timeZone")


def test_write_read_avro_nested_struct_timestamp(spark, tmp_path):
    """Nested-struct timestamps ride the Arrow instants end to end (the
    old pandas path shifted only TOP-LEVEL timestamp columns; the
    mapInArrow path is uniform at any nesting depth): exact epoch in and
    out, including a null inner timestamp and a null whole struct."""
    import datetime

    from pyspark.sql import functions as F

    from cdc_pipeline_spark.sources.files import read_avro, write_avro

    df = spark.createDataFrame(
        [
            (1, (datetime.datetime(2024, 2, 1, 12, 0, 0), "x")),
            (2, (None, "y")),
            (3, None),
        ],
        "id long, payload struct<ts:timestamp, tag:string>",
    )
    target = str(tmp_path / "avro_nested")
    write_avro(df, target, mode="overwrite")
    back = read_avro(spark, target)
    assert back.schema == df.schema
    want = sorted(map(str, df.select("id", F.col("payload.ts").cast("long")).collect()))
    got = sorted(map(str, back.select("id", F.col("payload.ts").cast("long")).collect()))
    assert got == want
    assert sorted(map(str, back.collect())) == sorted(map(str, df.collect()))


def test_arrow_schema_utc_fallback_matches_private_converter(spark):
    """The local fallback in _arrow_schema_utc must produce the same
    Arrow schema as pyspark's private to_arrow_schema(timestamp_utc=True)
    for a representative nested type tree — so losing the private API on
    a pyspark upgrade changes nothing observable (ADVICE r7)."""
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    from cdc_pipeline_spark.sources import files as files_mod

    st = StructType.fromDDL(
        "id long, name string, flag boolean, amt decimal(12,2), d date, "
        "ts timestamp, tags array<string>, "
        "payload struct<ts:timestamp, score:double, inner:array<struct<k:string,v:long>>>, "
        "m map<string, timestamp>"
    )
    want = to_arrow_schema(st, timestamp_utc=True)
    # exercise the fallback branch by forcing the private import to fail
    import builtins

    real_import = builtins.__import__

    def block(name, *a, **k):
        if name == "pyspark.sql.pandas.types":
            raise ImportError("blocked for fallback test")
        return real_import(name, *a, **k)

    builtins.__import__ = block
    try:
        got = files_mod._arrow_schema_utc(st)
    finally:
        builtins.__import__ = real_import
    assert got == want, f"fallback schema drifted:\n{got}\nvs\n{want}"
