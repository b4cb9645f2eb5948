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
