"""Live-broker smoke tests for the Kafka surfaces (S1/S3/S8/K1) —
skipped by default: set ``KAFKA_BOOTSTRAP=host:port`` to run them
against a real broker (the sandbox ships none, so these rows stay
"plan-build only" there; any deployment with infra flips them to
tested by exporting one variable).

Covers the full round trips the unit suite can only simulate:
  * produce JSON → ``read_json_stream`` → memory sink (S8)
  * produce Confluent-framed Avro CDC bytes (encoded from the public
    Avro binary spec by the helpers in test_sources.py) →
    ``read_cdc_stream`` (header strip → decode → op filter → timestamp
    normalize) → memory sink (S1+S2+S3+S4+S5)
  * ``write_kafka_json`` streaming sink → batch read-back (K1)
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="Kafka smoke tests need a live broker: set KAFKA_BOOTSTRAP=host:port",
)


def _require_kafka_source(spark):
    """The kafka connector jar ships separately from pyspark; skip (not
    error) when the deployment has a broker but no connector. The probe
    stops at ``load()`` — source-class resolution happens there, BEFORE
    any broker/topic contact, so a broker with topic auto-creation
    disabled (or a probe topic that doesn't exist) can never fail it;
    genuine broker problems surface in the tests themselves, loudly."""
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", BOOTSTRAP
        ).option("subscribe", "__probe__").load()
    except Exception as exc:  # noqa: BLE001 — classify below
        msg = str(exc)
        if "Failed to find data source" in msg or "DATA_SOURCE_NOT_FOUND" in msg:
            pytest.skip("spark-sql-kafka connector jar not on the classpath")
        raise


def _topic(prefix: str) -> str:
    return f"{prefix}-{uuid.uuid4().hex[:10]}"


def _produce(spark, topic: str, values, keys=None) -> None:
    """Batch-produce (key, value) binary pairs through the kafka sink."""
    rows = [
        (keys[i] if keys else str(i), bytearray(v) if isinstance(v, bytes) else v)
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(rows, "key string, value binary")
    (
        df.select(F.col("key").cast("binary"), "value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )


def _drain_to_rows(stream_df, tmp_path, name: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt-{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}").collect()


def test_json_stream_roundtrip(spark, tmp_path):
    from cdc_pipeline_spark.sources.kafka_avro import read_json_stream

    _require_kafka_source(spark)
    topic = _topic("smoke-json")
    payloads = [
        json.dumps({"event_id": i, "event_type": "view", "value": i * 1.5}).encode()
        for i in range(5)
    ]
    _produce(spark, topic, payloads)

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", StringType()),
        ]
    )
    stream = read_json_stream(
        spark, BOOTSTRAP, topic, schema, starting_offsets="earliest"
    )
    rows = _drain_to_rows(stream, tmp_path, f"m{uuid.uuid4().hex[:8]}")
    assert sorted(r["event_id"] for r in rows) == list(range(5))


def test_cdc_avro_chain_roundtrip(spark, tmp_path):
    from test_sources import _cdc_user_avro_schema, _confluent_frame, _encode_cdc_user

    from cdc_pipeline_spark.sources.kafka_avro import read_cdc_stream

    _require_kafka_source(spark)
    topic = _topic("smoke-cdc")
    frames = [
        _confluent_frame(_encode_cdc_user(1, "ada", "2024-01-01T00:00:05.000000Z", "c", 100)),
        _confluent_frame(_encode_cdc_user(2, "bob", "2024-01-01T00:00:06Z", "u", 200)),
        _confluent_frame(_encode_cdc_user(3, "eve", "2024-01-01T00:00:07.000000Z", "d", 300)),
    ]
    _produce(spark, topic, frames)

    schema_json = _cdc_user_avro_schema()
    stream = read_cdc_stream(
        spark,
        BOOTSTRAP,
        topic,
        schema_json,
        timestamp_columns=["created_at"],
        starting_offsets="earliest",
    )
    rows = _drain_to_rows(stream, tmp_path, f"m{uuid.uuid4().hex[:8]}")
    # delete (op=d) filtered; timestamps normalized to TimestampType
    assert sorted(r["id"] for r in rows) == [1, 2]
    assert all(r["created_at"] is not None for r in rows)


def test_write_kafka_json_sink_roundtrip(spark, tmp_path):
    from cdc_pipeline_spark.sources.kafka_avro import write_kafka_json

    _require_kafka_source(spark)
    topic = _topic("smoke-k1")
    src_dir = tmp_path / "src"
    os.makedirs(src_dir)
    spark.createDataFrame(
        [(1, "alpha", 10.0), (2, "beta", 20.0)], "id long, label string, metric double"
    ).coalesce(1).write.parquet(str(src_dir / "b0"))

    stream = spark.readStream.schema("id long, label string, metric double").parquet(
        str(src_dir / "b0")
    )
    q = write_kafka_json(
        stream,
        BOOTSTRAP,
        topic,
        checkpoint=str(tmp_path / "ckpt-k1"),
        key_col="label",
        output_mode="append",
    )
    # availableNow is not part of write_kafka_json's contract; drain briefly
    q.processAllAvailable()
    q.stop()

    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .select(F.col("key").cast("string"), F.col("value").cast("string"))
        .collect()
    )
    got = {r["key"]: json.loads(r["value"]) for r in back}
    assert got["alpha"]["metric"] == 10.0
    assert got["beta"]["id"] == 2
