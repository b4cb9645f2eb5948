"""Declared StructType registry.

The reference declares fixed Spark schemas per Kafka topic
(``src/streaming/schemas.py:23-170``) using exactly
``LongType, StringType, DoubleType, IntegerType, BooleanType,
TimestampType`` and appends the Debezium unwrap metadata columns
``__op, __table, __source_ts_ms, __deleted`` (``schemas.py:15-20``).
This module reproduces those relations' semantics (no runtime inference
anywhere in the streaming path) plus the testdata tables the engine is
verified against.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# CDC envelope metadata (reference schemas.py:15-20; op semantics
# DESCRIPTION.md:1086-1120: c=create, u=update, d=delete, r=snapshot read)
# ---------------------------------------------------------------------------

CDC_META_FIELDS = [
    StructField("__op", StringType()),
    StructField("__table", StringType()),
    StructField("__source_ts_ms", LongType()),
    StructField("__deleted", StringType()),
]


def with_cdc_meta(schema: StructType) -> StructType:
    """Append the Debezium unwrap metadata columns to a row schema."""
    return StructType(list(schema.fields) + list(CDC_META_FIELDS))


# ---------------------------------------------------------------------------
# Domain relations (reference schemas.py:23-154, seed-postgres.sql:22-106).
# DECIMAL(10,2) arrives as double (decimal.handling.mode=double,
# postgres-connector.json:25); TIMESTAMPTZ arrives as ISO-8601 string and is
# normalized by sources.cdc.normalize_timestamps; UUID/JSONB/INET are strings.
# ---------------------------------------------------------------------------

USERS = StructType(
    [
        StructField("id", LongType(), False),
        StructField("username", StringType(), False),
        StructField("display_name", StringType(), False),
        StructField("email", StringType(), False),
        StructField("country_code", StringType()),
        StructField("city", StringType()),
        StructField("region_name", StringType()),
        StructField("platform", StringType()),
        StructField("created_at", TimestampType()),
        StructField("updated_at", TimestampType()),
    ]
)

PRODUCTS = StructType(
    [
        StructField("id", LongType(), False),
        StructField("name", StringType(), False),
        StructField("category", StringType()),
        StructField("price", DoubleType(), False),
        StructField("merchant_region", StringType()),
        StructField("created_at", TimestampType()),
        StructField("updated_at", TimestampType()),
    ]
)

ORDERS = StructType(
    [
        StructField("id", LongType(), False),
        StructField("user_id", LongType()),
        StructField("total_amount", DoubleType(), False),
        StructField("currency", StringType()),
        StructField("status", StringType(), False),
        StructField("region_name", StringType()),
        StructField("user_display_name", StringType()),
        StructField("platform", StringType()),
        StructField("created_at", TimestampType()),
        StructField("updated_at", TimestampType()),
    ]
)

ORDER_ITEMS = StructType(
    [
        StructField("id", LongType(), False),
        StructField("order_id", LongType()),
        StructField("product_id", LongType()),
        StructField("quantity", IntegerType(), False),
        StructField("unit_price", DoubleType(), False),
        StructField("created_at", TimestampType()),
    ]
)

CART_ITEMS = StructType(
    [
        StructField("id", LongType(), False),
        StructField("user_id", LongType()),
        StructField("product_id", LongType()),
        StructField("quantity", IntegerType(), False),
        StructField("added_at", TimestampType()),
        StructField("removed_at", TimestampType()),
    ]
)

USER_EVENTS = StructType(
    [
        StructField("id", LongType(), False),
        StructField("user_id", LongType()),
        StructField("event_type", StringType(), False),
        StructField("page_url", StringType()),
        StructField("referrer_url", StringType()),
        StructField("user_agent", StringType()),
        StructField("ip_address", StringType()),
        StructField("session_id", StringType()),
        StructField("metadata", StringType()),  # JSONB passthrough
        StructField("user_display_name", StringType()),
        StructField("region_name", StringType()),
        StructField("city", StringType()),
        StructField("country_code", StringType()),
        StructField("platform", StringType()),
        StructField("amount", DoubleType()),
        StructField("created_at", TimestampType()),
    ]
)

SESSIONS = StructType(
    [
        StructField("id", StringType(), False),  # UUID as string
        StructField("user_id", LongType()),
        StructField("started_at", TimestampType(), False),
        StructField("ended_at", TimestampType()),
        StructField("platform", StringType()),
        StructField("country_code", StringType()),
        StructField("city", StringType()),
        StructField("region_name", StringType()),
        StructField("is_active", BooleanType()),
        StructField("created_at", TimestampType()),
    ]
)

REQUEST_LOG = StructType(
    [
        StructField("id", LongType(), False),
        StructField("endpoint", StringType()),
        StructField("method", StringType()),
        StructField("status_code", IntegerType(), False),
        StructField("latency_ms", IntegerType(), False),
        StructField("user_id", LongType()),
        StructField("session_id", StringType()),
        StructField("region_name", StringType()),
        StructField("user_display_name", StringType()),
        StructField("platform", StringType()),
        StructField("created_at", TimestampType(), False),
    ]
)

SYSTEM_METRICS = StructType(
    [
        StructField("id", LongType(), False),
        StructField("node_name", StringType(), False),
        StructField("metric_name", StringType(), False),
        StructField("metric_value", DoubleType(), False),
        StructField("recorded_at", TimestampType(), False),
    ]
)

# Derived topic aggregated.kpis (reference schemas.py:156-170) — JSON snapshot
AGGREGATED_KPIS = StructType(
    [
        StructField("window_start", TimestampType()),
        StructField("window_end", TimestampType()),
        StructField("active_users", LongType()),
        StructField("revenue", DoubleType()),
        StructField("orders", LongType()),
        StructField("error_rate", DoubleType()),
        StructField("latency_ms", DoubleType()),
        StructField("updated_at", LongType()),
    ]
)

# Static reference/dimension tables (seed-postgres.sql:108-175;
# broadcast-enrichment design DESCRIPTION.md:871-893)
COUNTRY_REGION_MAPPING = StructType(
    [
        StructField("country_code", StringType(), False),
        StructField("region_name", StringType()),
        StructField("longitude", DoubleType()),
        StructField("latitude", DoubleType()),
    ]
)

CITY_REGION_MAPPING = StructType(
    [
        StructField("id", LongType(), False),
        StructField("country_code", StringType()),
        StructField("city_pattern", StringType()),
        StructField("region_name", StringType()),
        StructField("longitude", DoubleType()),
        StructField("latitude", DoubleType()),
    ]
)

CDC_TABLES = {
    "users": USERS,
    "products": PRODUCTS,
    "orders": ORDERS,
    "order_items": ORDER_ITEMS,
    "cart_items": CART_ITEMS,
    "user_events": USER_EVENTS,
    "sessions": SESSIONS,
}

DIRECT_TABLES = {
    "request_log": REQUEST_LOG,
    "system_metrics": SYSTEM_METRICS,
}

# ---------------------------------------------------------------------------
# Testdata tables (/root/testdata/sf*/ — TESTDATA.md). Declared so batch
# readers never rely on inference in tests either.
# ---------------------------------------------------------------------------

TESTDATA = {
    "region": StructType(
        [StructField("r_regionkey", IntegerType()), StructField("r_name", StringType())]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_name", StringType()),
            StructField("s_nationkey", IntegerType()),
            StructField("s_acctbal", DoubleType()),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampType()),
        ]
    ),
    # events.ts is a microsecond TIMESTAMP in current testdata. Some
    # generators emit TIMESTAMP(NANOS,false) instead; sources.files
    # detects that from the parquet footer and swaps in EVENTS_NANOS
    # (ns long + floor-convert to µs TimestampType on load).
    "events": StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    ),
    "documents": StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    ),
    "embeddings": StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    ),
}

# Variant schema for generators that write events.ts as TIMESTAMP(NANOS):
# Spark has no nanosecond type, so the column is read as a ns long
# (spark.sql.legacy.parquet.nanosAsLong) and floor-converted on load.
EVENTS_NANOS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

TESTDATA_TABLE_NAMES = tuple(TESTDATA.keys())
