"""Pure-Python Avro binary decoder (Arrow-batched) — the jar-free S3 path.

The production decode path is ``pyspark.sql.avro.functions.from_avro``
(``kafka_avro.decode_avro``), which needs the spark-avro connector jar on
the JVM classpath. This container ships no such jar and no Python avro
package, so this module implements the subset of the **public Avro 1.11
binary encoding spec** the CDC chain needs, from scratch:

  * zig-zag varint ints/longs, IEEE float/double (little-endian),
    length-prefixed bytes/strings, 1-byte booleans;
  * unions (zig-zag branch index + value), records (fields in order),
    arrays and maps (block runs with optional negative-count byte-size
    form, terminated by an empty block);
  * ``timestamp-millis`` logical longs → UTC timestamps.

It is deliberately NOT a full Avro implementation: no schema resolution
(reader schema must equal the writer schema — which is exactly what
``fetch_schema_from_registry`` returns), no enums/fixed/recursive types.

Execution shape: decoding is per-row Python work, so it runs as an
Arrow-batched ``mapInPandas`` — partition-preserving, no shuffle, batch
size governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``. On a
cluster this is the same plumbing as any other Python source decode; the
jar path stays strictly preferable when available (JVM-side, codegen),
which is why ``decode_avro_auto`` probes for it first.

Reference parity: reproduces the PERMISSIVE + null-drop contract of the
reference's decoder (``src/streaming/kafka_sources.py:66-84``) — any
payload that fails to decode, or decodes without consuming the full
buffer, is dropped, never an error.
"""

from __future__ import annotations

import json
import struct as _struct
from datetime import datetime, timedelta, timezone
from typing import Any, Callable

_EPOCH_NAIVE = datetime(1970, 1, 1)

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "avro_to_spark_schema",
    "compile_decoder",
    "compile_encoder",
    "decode_avro_python",
    "spark_to_avro_schema",
]


class _Cursor:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        if n < 0:
            # a corrupt length varint must fail the record (PERMISSIVE
            # drop), not walk the cursor backwards into decoded bytes
            raise ValueError(f"negative Avro length {n}")
        end = self.pos + n
        if end > len(self.buf):
            raise EOFError("truncated Avro payload")
        out = self.buf[self.pos : end]
        self.pos = end
        return out

    def read_long(self) -> int:
        """Zig-zag varint (Avro spec §binary encoding, primitive types)."""
        acc = 0
        shift = 0
        while True:
            byte = self.take(1)[0]
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 70:
                raise ValueError("varint too long")
        return (acc >> 1) ^ -(acc & 1)


def _normalize(schema: Any) -> tuple[str, dict]:
    """(type name, full dict form) of a schema node."""
    if isinstance(schema, str):
        return schema, {"type": schema}
    if isinstance(schema, list):
        return "union", {"type": "union", "branches": schema}
    if isinstance(schema, dict):
        return schema["type"], schema
    raise ValueError(f"unsupported Avro schema node: {schema!r}")


def _spark_type(schema: Any) -> tuple[DataType, bool]:
    """Spark type + nullability for an Avro schema node (mirrors
    spark-avro's SchemaConverters for the supported subset)."""
    kind, node = _normalize(schema)
    if kind == "union":
        branches = [b for b in node["branches"] if b != "null"]
        nullable = len(branches) != len(node["branches"])
        if len(branches) != 1:
            raise ValueError("only 2-branch null unions are supported")
        inner, _ = _spark_type(branches[0])
        return inner, nullable
    if kind == "long" and node.get("logicalType") in (
        "timestamp-millis",
        "timestamp-micros",
    ):
        return TimestampType(), False
    scalar = {
        "null": StringType(),  # degenerate; never used alone in practice
        "boolean": BooleanType(),
        "int": IntegerType(),
        "long": LongType(),
        "float": FloatType(),
        "double": DoubleType(),
        "bytes": BinaryType(),
        "string": StringType(),
    }
    if kind in scalar:
        return scalar[kind], False
    if kind == "record":
        fields = []
        for f in node["fields"]:
            ftype, fnullable = _spark_type(f["type"])
            fields.append(StructField(f["name"], ftype, fnullable))
        return StructType(fields), False
    if kind == "array":
        inner, el_nullable = _spark_type(node["items"])
        return ArrayType(inner, el_nullable), False
    if kind == "map":
        inner, v_nullable = _spark_type(node["values"])
        return MapType(StringType(), inner, v_nullable), False
    raise ValueError(f"unsupported Avro type: {kind}")


def avro_to_spark_schema(avro_schema_json: str) -> StructType:
    """Top-level record schema → Spark StructType."""
    node = json.loads(avro_schema_json)
    kind, node = _normalize(node)
    if kind != "record":
        raise ValueError("top-level Avro schema must be a record")
    fields = []
    for f in node["fields"]:
        ftype, fnullable = _spark_type(f["type"])
        fields.append(StructField(f["name"], ftype, fnullable))
    return StructType(fields)


def _compile(schema: Any) -> Callable[[_Cursor], Any]:
    kind, node = _normalize(schema)
    if kind == "union":
        branches = [_compile(b) for b in node["branches"]]

        def read_union(cur: _Cursor, _branches=branches):
            idx = cur.read_long()
            if not 0 <= idx < len(_branches):
                raise ValueError(f"union branch {idx} out of range")
            return _branches[idx](cur)

        return read_union
    if kind == "null":
        return lambda cur: None
    if kind == "boolean":
        return lambda cur: cur.take(1) == b"\x01"
    if kind in ("int", "long"):
        if node.get("logicalType") == "timestamp-millis":
            return lambda cur: datetime.fromtimestamp(cur.read_long() / 1000.0, tz=timezone.utc).replace(tzinfo=None)
        if node.get("logicalType") == "timestamp-micros":
            # integer path — float division would round micros above
            # ~2^53/1e6 seconds; timedelta arithmetic is exact
            return lambda cur: _EPOCH_NAIVE + timedelta(microseconds=cur.read_long())
        return lambda cur: cur.read_long()
    if kind == "float":
        return lambda cur: _struct.unpack("<f", cur.take(4))[0]
    if kind == "double":
        return lambda cur: _struct.unpack("<d", cur.take(8))[0]
    if kind == "bytes":
        return lambda cur: cur.take(cur.read_long())
    if kind == "string":
        return lambda cur: cur.take(cur.read_long()).decode("utf-8")
    if kind == "record":
        readers = [(f["name"], _compile(f["type"])) for f in node["fields"]]

        def read_record(cur: _Cursor, _readers=readers):
            return {name: reader(cur) for name, reader in _readers}

        return read_record
    if kind == "array":
        item = _compile(node["items"])

        def read_array(cur: _Cursor, _item=item):
            out = []
            while True:
                count = cur.read_long()
                if count == 0:
                    return out
                if count < 0:  # block byte-size form (spec: complex types)
                    cur.read_long()
                    count = -count
                out.extend(_item(cur) for _ in range(count))

        return read_array
    if kind == "map":
        value = _compile(node["values"])

        def read_map(cur: _Cursor, _value=value):
            out = {}
            while True:
                count = cur.read_long()
                if count == 0:
                    return out
                if count < 0:
                    cur.read_long()
                    count = -count
                for _ in range(count):
                    key = cur.take(cur.read_long()).decode("utf-8")
                    out[key] = _value(cur)

        return read_map
    raise ValueError(f"unsupported Avro type: {kind}")


def compile_decoder(avro_schema_json: str) -> Callable[[bytes], dict]:
    """bytes → record dict; raises on corrupt/truncated/over-long input."""
    reader = _compile(json.loads(avro_schema_json))

    def decode(payload: bytes) -> dict:
        cur = _Cursor(payload)
        out = reader(cur)
        if cur.pos != len(cur.buf):
            raise ValueError("trailing bytes after record")
        return out

    # cursor-level entry point for container formats (avro_ocf): block
    # records are back-to-back, so the full-consumption check above
    # moves to the block boundary there
    decode.reader = reader  # type: ignore[attr-defined]
    return decode


def decode_avro_python(df: DataFrame, avro_schema_json: str, column: str = "value") -> DataFrame:
    """S3 fallback: PERMISSIVE-style decode of a binary column without the
    spark-avro jar. Same contract as ``kafka_avro.decode_avro`` — corrupt
    records are dropped — but runs as an Arrow ``mapInPandas``.

    Timestamp correctness is tz-pinned: the decoder yields UTC-naive
    datetimes, but Arrow interprets naive timestamps in
    ``spark.sql.session.timeZone`` — so the session zone is captured at
    plan-build time and non-UTC wall clocks are shifted inside the UDF.
    Without this, the jar and jar-free decode paths would disagree by
    the session's UTC offset for identical bytes."""
    import pandas as pd

    spark_schema = avro_to_spark_schema(avro_schema_json)
    out_cols = spark_schema.fieldNames()
    ts_cols = tuple(
        f.name for f in spark_schema.fields if f.dataType.typeName() == "timestamp"
    )
    # The tz shift below reaches only TOP-LEVEL timestamp columns. A
    # timestamp nested inside a struct/array/map would silently decode
    # wall-clock-shifted versus the jar path under a non-UTC session —
    # the exact disagreement this shift exists to prevent — so refuse
    # loudly instead (flatten the schema or use the spark-avro jar).
    def _contains_ts(dt) -> bool:
        from pyspark.sql.types import ArrayType, MapType, StructType

        if dt.typeName() == "timestamp":
            return True
        if isinstance(dt, StructType):
            return any(_contains_ts(f.dataType) for f in dt.fields)
        if isinstance(dt, ArrayType):
            return _contains_ts(dt.elementType)
        if isinstance(dt, MapType):
            return _contains_ts(dt.keyType) or _contains_ts(dt.valueType)
        return False

    nested_ts = [
        f.name
        for f in spark_schema.fields
        if f.dataType.typeName() != "timestamp" and _contains_ts(f.dataType)
    ]
    if nested_ts:
        raise NotImplementedError(
            f"decode_avro_python: columns {nested_ts} nest timestamps below "
            "the top level; the session-timezone alignment only covers "
            "top-level timestamp columns. Flatten the schema or decode via "
            "the spark-avro jar path (kafka_avro.decode_avro)."
        )
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")

    def gen(batches):
        decode = compile_decoder(avro_schema_json)
        for pdf in batches:
            records = []
            for payload in pdf[column]:
                if payload is None:
                    continue
                try:
                    records.append(decode(bytes(payload)))
                except Exception:
                    continue  # PERMISSIVE null-drop (kafka_sources.py:66-84)
            out = pd.DataFrame(records, columns=out_cols)
            if len(out) and session_tz not in ("UTC", "Etc/UTC", "GMT"):
                for c in ts_cols:
                    # UTC-naive → session-zone wall clock, so Arrow's
                    # naive-in-session-tz reading lands on the true epoch
                    out[c] = (
                        pd.to_datetime(out[c])
                        .dt.tz_localize("UTC")
                        .dt.tz_convert(session_tz)
                        .dt.tz_localize(None)
                    )
            yield out

    return df.select(column).mapInPandas(gen, schema=spark_schema)


# ---------------------------------------------------------------------------
# Encoder — the symmetric half (jar-free Avro writes: OCF batch mirror,
# Kafka producer payloads). Same supported subset as the decoder; a
# round-trip through compile_encoder → compile_decoder is the identity
# for every supported type.
# ---------------------------------------------------------------------------


def _zigzag_bytes(n: int) -> bytes:
    """Avro long: zig-zag then base-128 varint, little-endian groups."""
    # canonical (n << 1) ^ (n >> 63) on the 64-bit value; Python ints
    # never wrap, so mask to the u64 the varint loop expects
    z = ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ts_micros(value: Any) -> int:
    """datetime/pandas-Timestamp/int → exact epoch micros (naive = UTC)."""
    if isinstance(value, int):
        return value
    if hasattr(value, "to_pydatetime"):  # pandas Timestamp
        value = value.to_pydatetime()
    if isinstance(value, datetime):
        if value.tzinfo is not None:
            value = value.astimezone(timezone.utc).replace(tzinfo=None)
        delta = value - _EPOCH_NAIVE
        return (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
    raise TypeError(f"cannot encode {type(value).__name__} as timestamp-micros")


def _compile_writer(schema: Any) -> Callable[[Any, bytearray], None]:
    kind, node = _normalize(schema)
    if kind == "union":
        branches = node["branches"]
        null_idx = next((i for i, b in enumerate(branches) if b == "null"), None)
        others = [(i, _compile_writer(b)) for i, b in enumerate(branches) if b != "null"]
        if null_idx is None or len(others) != 1:
            raise ValueError("only 2-branch null unions are supported")
        (val_idx, write_val) = others[0]

        def write_union(value, buf, _n=null_idx, _v=val_idx, _w=write_val):
            if value is None:
                buf += _zigzag_bytes(_n)
            else:
                buf += _zigzag_bytes(_v)
                _w(value, buf)

        return write_union
    if kind == "null":
        return lambda value, buf: None
    if kind == "boolean":
        return lambda value, buf: buf.append(1 if value else 0)
    if kind in ("int", "long"):
        if node.get("logicalType") == "timestamp-millis":
            return lambda value, buf: buf.__iadd__(
                _zigzag_bytes(_ts_micros(value) // 1000)
            )
        if node.get("logicalType") == "timestamp-micros":
            return lambda value, buf: buf.__iadd__(_zigzag_bytes(_ts_micros(value)))
        return lambda value, buf: buf.__iadd__(_zigzag_bytes(int(value)))
    if kind == "float":
        return lambda value, buf: buf.__iadd__(_struct.pack("<f", float(value)))
    if kind == "double":
        return lambda value, buf: buf.__iadd__(_struct.pack("<d", float(value)))
    if kind == "bytes":
        def write_bytes(value, buf):
            data = bytes(value)
            buf += _zigzag_bytes(len(data))
            buf += data

        return write_bytes
    if kind == "string":
        def write_string(value, buf):
            data = str(value).encode("utf-8")
            buf += _zigzag_bytes(len(data))
            buf += data

        return write_string
    if kind == "record":
        writers = [(f["name"], _compile_writer(f["type"])) for f in node["fields"]]

        def write_record(value, buf, _writers=writers):
            for name, writer in _writers:
                writer(value[name], buf)

        return write_record
    if kind == "array":
        item = _compile_writer(node["items"])

        def write_array(value, buf, _item=item):
            items = list(value)
            if items:
                buf += _zigzag_bytes(len(items))
                for v in items:
                    _item(v, buf)
            buf += _zigzag_bytes(0)

        return write_array
    if kind == "map":
        val = _compile_writer(node["values"])

        def write_map(value, buf, _val=val):
            entries = dict(value)
            if entries:
                buf += _zigzag_bytes(len(entries))
                for k, v in entries.items():
                    data = str(k).encode("utf-8")
                    buf += _zigzag_bytes(len(data))
                    buf += data
                    _val(v, buf)
            buf += _zigzag_bytes(0)

        return write_map
    raise ValueError(f"unsupported Avro type: {kind}")


def compile_encoder(avro_schema_json: str) -> Callable[[dict], bytes]:
    """record dict → Avro binary bytes (inverse of compile_decoder)."""
    writer = _compile_writer(json.loads(avro_schema_json))

    def encode(record: dict) -> bytes:
        buf = bytearray()
        writer(record, buf)
        return bytes(buf)

    return encode


def spark_to_avro_schema(schema: StructType, name: str = "row") -> str:
    """Spark StructType → Avro record schema JSON (inverse of
    avro_to_spark_schema for the supported subset; timestamps map to
    ``timestamp-micros`` — Spark's native resolution, lossless)."""

    def field_type(dt: DataType, nullable: bool) -> Any:
        t = dt.typeName()
        scalar = {
            "boolean": "boolean",
            "integer": "int",
            "long": "long",
            "float": "float",
            "double": "double",
            "binary": "bytes",
            "string": "string",
        }
        if t in scalar:
            out: Any = scalar[t]
        elif t == "timestamp":
            out = {"type": "long", "logicalType": "timestamp-micros"}
        elif isinstance(dt, StructType):
            out = json.loads(spark_to_avro_schema(dt, name=f"{name}_struct"))
        elif isinstance(dt, ArrayType):
            out = {"type": "array", "items": field_type(dt.elementType, dt.containsNull)}
        elif isinstance(dt, MapType):
            if dt.keyType.typeName() != "string":
                raise ValueError("Avro maps require string keys")
            out = {"type": "map", "values": field_type(dt.valueType, dt.valueContainsNull)}
        else:
            raise ValueError(f"unsupported Spark type for Avro: {t}")
        return ["null", out] if nullable else out

    fields = [
        {"name": f.name, "type": field_type(f.dataType, f.nullable)}
        for f in schema.fields
    ]
    return json.dumps({"type": "record", "name": name, "fields": fields})
