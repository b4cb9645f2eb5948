"""Golden Debezium/Confluent wire frames for the Avro differential test.

Each frame is a Confluent wire-format message: 1 magic byte (0x00) +
4-byte big-endian schema-registry id + Avro single-record binary body,
exactly what the reference's Kafka chain consumes
(``/root/reference/src/streaming/kafka_sources.py:66-84``). The bodies
are built by a MINIMAL SPEC-DIRECT encoder below — deliberately
independent of ``cdc_pipeline_spark.sources.avro_codec`` (whose decoder
is the unit under test): every union branch index, varint and field
order is hand-wired from the reference's registered writer schemas
(``/root/reference/src/streaming/schemas.py:181-189``), so agreement
between this encoder and the engine's decoder is evidence, not
circularity.

Covered writer-schema edge cases (the riskiest parity gaps named in
round 6): NON-NULL-FIRST unions (``[string, "null"]`` for defaulted
ZonedTimestamp columns, ``[boolean, "null"]`` for is_active,
``[string, "null"]`` for orders.currency), null-first unions, plain
non-union ZonedTimestamp (sessions.started_at), Debezium Uuid/Json
connect-named strings, all three CDC timestamp formats
(microsecond-Z / second-Z / plain), the ``__op`` c/u/r/d lifecycle and
a corrupt (truncated) frame for the PERMISSIVE null-drop.

``FRAMES_HEX`` are the COMMITTED bytes; ``build_frames()`` regenerates
them and the test asserts both match, so fixture drift is loud.
"""

from __future__ import annotations

import struct

# --- minimal spec-direct Avro binary encoder (Avro 1.11 spec §Binary) ---


def zz(n: int) -> bytes:
    """zig-zag + base-128 varint for Avro int/long."""
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


def s(v: str) -> bytes:
    data = v.encode("utf-8")
    return zz(len(data)) + data


def d(v: float) -> bytes:
    return struct.pack("<d", v)


def b(v: bool) -> bytes:
    return b"\x01" if v else b"\x00"


def u(branch: int, payload: bytes = b"") -> bytes:
    """union: varint branch index + encoded branch value."""
    return zz(branch) + payload


def frame(schema_id: int, body: bytes) -> bytes:
    """Confluent wire format: magic 0x00 + BE schema id + Avro body."""
    return b"\x00" + struct.pack(">I", schema_id) + body


# --- per-table frame builders, field-for-field from the writer schemas ---

USERS_SCHEMA_ID = 7001
ORDERS_SCHEMA_ID = 7002
SESSIONS_SCHEMA_ID = 7003
USER_EVENTS_SCHEMA_ID = 7004


def _users_body(
    id_, username, display_name, email, country_code, city, region_name,
    platform, created_at, updated_at, op, table, source_ts_ms, deleted,
) -> bytes:
    """USERS_AVRO_SCHEMA (schemas.py:181): id long; username/display_name/
    email string; country_code/city/region_name/platform ["null","string"];
    created_at/updated_at [ZonedTimestamp-string, "null"] (STRING FIRST);
    __op/__table ["null","string"]; __source_ts_ms ["null","long"];
    __deleted ["null","string"]."""
    out = zz(id_) + s(username) + s(display_name) + s(email)
    for v in (country_code, city, region_name, platform):
        out += u(0) if v is None else u(1, s(v))
    for v in (created_at, updated_at):  # string-first union
        out += u(1) if v is None else u(0, s(v))
    for v in (op, table):
        out += u(0) if v is None else u(1, s(v))
    out += u(0) if source_ts_ms is None else u(1, zz(source_ts_ms))
    out += u(0) if deleted is None else u(1, s(deleted))
    return out


def _orders_body(
    id_, user_id, total_amount, currency, status, region_name,
    user_display_name, platform, created_at, updated_at, op, table,
    source_ts_ms, deleted,
) -> bytes:
    """ORDERS_AVRO_SCHEMA (schemas.py:183): id long; user_id
    ["null","long"]; total_amount double; currency [string,"null"]
    (STRING FIRST, default "USD"); status string; region_name/
    user_display_name/platform ["null","string"]; created_at/updated_at
    [ZonedTimestamp-string,"null"]; CDC metadata as in users."""
    out = zz(id_)
    out += u(0) if user_id is None else u(1, zz(user_id))
    out += d(total_amount)
    out += u(1) if currency is None else u(0, s(currency))  # string-first
    out += s(status)
    for v in (region_name, user_display_name, platform):
        out += u(0) if v is None else u(1, s(v))
    for v in (created_at, updated_at):  # string-first union
        out += u(1) if v is None else u(0, s(v))
    for v in (op, table):
        out += u(0) if v is None else u(1, s(v))
    out += u(0) if source_ts_ms is None else u(1, zz(source_ts_ms))
    out += u(0) if deleted is None else u(1, s(deleted))
    return out


def _sessions_body(
    id_, user_id, started_at, ended_at, platform, country_code, city,
    region_name, is_active, created_at, op, table, source_ts_ms, deleted,
) -> bytes:
    """SESSIONS_AVRO_SCHEMA (schemas.py:187): id Uuid-string (no union);
    user_id ["null","long"]; started_at ZonedTimestamp-string (NO union);
    ended_at ["null", ZonedTimestamp-string] (null-first); platform/
    country_code/city/region_name ["null","string"]; is_active
    [boolean,"null"] (BOOLEAN FIRST, default true); created_at
    [ZonedTimestamp-string,"null"]; CDC metadata as in users."""
    out = s(id_)
    out += u(0) if user_id is None else u(1, zz(user_id))
    out += s(started_at)  # non-union: bare string
    out += u(0) if ended_at is None else u(1, s(ended_at))
    for v in (platform, country_code, city, region_name):
        out += u(0) if v is None else u(1, s(v))
    out += u(1) if is_active is None else u(0, b(is_active))  # bool-first
    out += u(1) if created_at is None else u(0, s(created_at))
    for v in (op, table):
        out += u(0) if v is None else u(1, s(v))
    out += u(0) if source_ts_ms is None else u(1, zz(source_ts_ms))
    out += u(0) if deleted is None else u(1, s(deleted))
    return out


def _user_events_body(
    id_, user_id, event_type, page_url, referrer_url, user_agent, ip_address,
    session_id, metadata, user_display_name, region_name, city, country_code,
    platform, amount, created_at, op, table, source_ts_ms, deleted,
) -> bytes:
    """USER_EVENTS_AVRO_SCHEMA (schemas.py:186): id long; user_id
    ["null","long"]; event_type string; page_url/referrer_url/user_agent/
    ip_address ["null","string"]; session_id ["null", Uuid-string];
    metadata ["null", Json-string]; user_display_name/region_name/city/
    country_code/platform ["null","string"]; amount ["null","double"];
    created_at [ZonedTimestamp-string,"null"]; CDC metadata as in users."""
    out = zz(id_)
    out += u(0) if user_id is None else u(1, zz(user_id))
    out += s(event_type)
    for v in (page_url, referrer_url, user_agent, ip_address, session_id, metadata):
        out += u(0) if v is None else u(1, s(v))
    for v in (user_display_name, region_name, city, country_code, platform):
        out += u(0) if v is None else u(1, s(v))
    out += u(0) if amount is None else u(1, d(amount))
    out += u(1) if created_at is None else u(0, s(created_at))  # string-first
    for v in (op, table):
        out += u(0) if v is None else u(1, s(v))
    out += u(0) if source_ts_ms is None else u(1, zz(source_ts_ms))
    out += u(0) if deleted is None else u(1, s(deleted))
    return out


def build_frames() -> dict[str, list[bytes]]:
    users = [
        # insert, µs-precision ZonedTimestamp
        frame(USERS_SCHEMA_ID, _users_body(
            101, "ada", "Ada L", "ada@x.io", "GB", None, "West", "web",
            "2024-03-01T08:15:30.123456Z", "2024-03-01T08:15:30.123456Z",
            "c", "users", 1709280930123, "false")),
        # update, second-precision ZonedTimestamp, updated_at null
        frame(USERS_SCHEMA_ID, _users_body(
            102, "bob", "Bob", "bob@x.io", None, "Lyon", None, None,
            "2024-03-01T09:00:00Z", None,
            "u", "users", 1709283600000, "false")),
        # delete — must be dropped by the op filter
        frame(USERS_SCHEMA_ID, _users_body(
            103, "eve", "Eve", "eve@x.io", None, None, None, None,
            "2024-03-01T09:30:00Z", "2024-03-01T09:30:00Z",
            "d", "users", 1709285400000, "true")),
        # snapshot read, plain (no-Z) timestamp format
        frame(USERS_SCHEMA_ID, _users_body(
            104, "kim", "Kim", "kim@x.io", "FR", "Paris", "Sud", "ios",
            "2024-03-01 10:30:00", "2024-03-01 10:30:00",
            "r", "users", 1709289000000, "false")),
        # corrupt: truncated mid-record — PERMISSIVE drops it
        frame(USERS_SCHEMA_ID, _users_body(
            105, "zed", "Zed", "zed@x.io", None, None, None, None,
            "2024-03-01T11:00:00Z", "2024-03-01T11:00:00Z",
            "c", "users", 1709290800000, "false"))[:-7],
    ]
    orders = [
        frame(ORDERS_SCHEMA_ID, _orders_body(
            9001, 101, 149.99, "USD", "pending", "West", "Ada L", "web",
            "2024-03-02T10:00:00.500000Z", "2024-03-02T10:00:00.500000Z",
            "c", "orders", 1709373600500, "false")),
        # currency takes the NULL branch of the string-first union
        frame(ORDERS_SCHEMA_ID, _orders_body(
            9002, None, 20.5, None, "completed", None, None, None,
            "2024-03-02T11:00:00Z", "2024-03-02T11:30:00Z",
            "u", "orders", 1709379000000, "false")),
        frame(ORDERS_SCHEMA_ID, _orders_body(
            9003, 102, 0.0, "EUR", "cancelled", "Sud", "Bob", "ios",
            "2024-03-02T12:00:00Z", None,
            "d", "orders", 1709380800000, "true")),
    ]
    sessions = [
        frame(SESSIONS_SCHEMA_ID, _sessions_body(
            "0b0e7b32-9c1f-4a6e-8f21-3d8f0a1b2c3d", 101,
            "2024-03-03T07:45:10.250000Z", None, "web", "GB", None, "West",
            True, "2024-03-03T07:45:10.250000Z",
            "c", "sessions", 1709451910250, "false")),
        # is_active takes the NULL branch of the boolean-first union
        frame(SESSIONS_SCHEMA_ID, _sessions_body(
            "1c1f8c43-ad20-5b7f-9032-4e9f1b2c3d4e", None,
            "2024-03-03T08:00:00Z", "2024-03-03T08:20:05.000001Z",
            None, None, "Lyon", None,
            None, "2024-03-03T08:00:00Z",
            "u", "sessions", 1709452800000, "false")),
        frame(SESSIONS_SCHEMA_ID, _sessions_body(
            "2d2f9d54-be31-6c80-a143-5fa02c3d4e5f", 102,
            "2024-03-03 09:15:00", None, "ios", "FR", "Paris", "Sud",
            False, "2024-03-03 09:15:00",
            "r", "sessions", 1709457300000, "false")),
    ]
    user_events = [
        # purchase with JSONB metadata + amount through the double union
        frame(USER_EVENTS_SCHEMA_ID, _user_events_body(
            41, 101, "purchase", "/checkout", "/cart", "UA/1.0", "10.0.0.7",
            "3e3fae65-cf42-7d91-b254-60b13d4e5f60", '{"sku":"A-7","qty":2}',
            "Ada L", "West", None, "GB", "web", 149.99,
            "2024-03-04T14:05:06.000007Z",
            "c", "user_events", 1709561106000, "false")),
        # page_view with every optional string on its null branch
        frame(USER_EVENTS_SCHEMA_ID, _user_events_body(
            42, None, "page_view", None, None, None, None,
            None, None, None, None, None, None, None, None,
            "2024-03-04T15:00:00Z",
            "r", "user_events", 1709564400000, "false")),
        # delete — dropped by the op filter
        frame(USER_EVENTS_SCHEMA_ID, _user_events_body(
            43, 102, "error", "/api", None, None, "10.0.0.9",
            None, '{"code":500}', "Bob", "Sud", "Lyon", "FR", "ios", None,
            "2024-03-04 16:30:00",
            "d", "user_events", 1709569800000, "true")),
    ]
    return {
        "users": users,
        "orders": orders,
        "sessions": sessions,
        "user_events": user_events,
    }


# Committed golden bytes (hex). Regenerated-equals-committed is asserted
# by the test; populated by scripts at fixture-freeze time.
FRAMES_HEX: dict[str, list[str]] = {
    "users": [
        "0000001b59ca01066164610a416461204c1061646140782e696f020447420002085765737402067765620036323032342d30332d30315430383a31353a33302e3132333435365a0036323032342d30332d30315430383a31353a33302e3132333435365a020263020a75736572730296a5a991bf63020a66616c7365",
        "0000001b59cc0106626f6206426f6210626f6240782e696f0002084c796f6e00000028323032342d30332d30315430393a30303a30305a02020275020a757365727302809aef93bf63020a66616c7365",
        "0000001b59ce0106657665064576651065766540782e696f000000000028323032342d30332d30315430393a33303a30305a0028323032342d30332d30315430393a33303a30305a020264020a75736572730280f7ca95bf63020874727565",
        "0000001b59d001066b696d064b696d106b696d40782e696f02044652020a506172697302065375640206696f730026323032342d30332d30312031303a33303a30300026323032342d30332d30312031303a33303a3030020272020a75736572730280b18299bf63020a66616c7365",
        "0000001b59d201067a6564065a6564107a656440782e696f000000000028323032342d30332d30315431313a30303a30305a0028323032342d30332d30315431313a30303a30305a020263020a757365727302808ede9abf63",
    ],
    "orders": [
        "0000001b5ad28c0102ca0148e17a14aebf624000065553440e70656e64696e67020857657374020a416461204c02067765620036323032342d30332d30325431303a30303a30302e3530303030305a0036323032342d30332d30325431303a30303a30302e3530303030305a020263020c6f726465727302e8cbd9e9bf63020a66616c7365",
        "0000001b5ad48c010000000000008034400212636f6d706c657465640000000028323032342d30332d30325431313a30303a30305a0028323032342d30332d30325431313a33303a30305a020275020c6f72646572730280dbeceebf63020a66616c7365",
        "0000001b5ad68c0102cc01000000000000000000064555521263616e63656c6c656402065375640206426f620206696f730028323032342d30332d30325431323a30303a30305a02020264020c6f72646572730280b8c8f0bf63020874727565",
    ],
    "sessions": [
        "0000001b5b4830623065376233322d396331662d346136652d386632312d33643866306131623263336402ca0136323032342d30332d30335430373a34353a31302e3235303030305a000206776562020447420002085765737400010036323032342d30332d30335430373a34353a31302e3235303030305a020263021073657373696f6e7302d4f1b0b4c063020a66616c7365",
        "0000001b5b4831633166386334332d616432302d356237662d393033322d3465396631623263336434650028323032342d30332d30335430383a30303a30305a0236323032342d30332d30335430383a32303a30352e3030303030315a000002084c796f6e00020028323032342d30332d30335430383a30303a30305a020275021073657373696f6e730280c09db5c063020a66616c7365",
        "0000001b5b4832643266396435342d626533312d366338302d613134332d35666130326333643465356602cc0126323032342d30332d30332030393a31353a3030000206696f7302044652020a5061726973020653756400000026323032342d30332d30332030393a31353a3030020272021073657373696f6e7302c0e8c2b9c063020a66616c7365",
    ],
    "user_events": [
        "0000001b5c5202ca0110707572636861736502122f636865636b6f7574020a2f63617274020c55412f312e30021031302e302e302e37024833653366616536352d636634322d376439312d623235342d363062313364346535663630022a7b22736b75223a22412d37222c22717479223a327d020a416461204c020857657374000204474202067765620248e17a14aebf62400036323032342d30332d30345431343a30353a30362e3030303030375a0202630216757365725f6576656e747302a0b9c29cc163020a66616c7365",
        "0000001b5c540012706167655f766965770000000000000000000000000028323032342d30332d30345431353a30303a30305a0202720216757365725f6576656e74730280c6d49fc163020a66616c7365",
        "0000001b5c5602cc010a6572726f7202082f6170690000021031302e302e302e390002187b22636f6465223a3530307d0206426f62020653756402084c796f6e020446520206696f73000026323032342d30332d30342031363a33303a30300202640216757365725f6576656e74730280dde7a4c163020874727565",
    ],
}
