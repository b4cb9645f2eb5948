#!/usr/bin/env python
"""Live-boundary smoke kit (VERDICT r7 #7): one command to verify the
three environment-gated components the test container cannot exercise —
the live Kafka connector (S1/S6/K1), a Confluent-compatible Schema
Registry (S10) and a real Redis backend (K2-K5) — the moment the
environment exists. Everything asserted here is the SAME golden-wire
expectation the offline tests pin (`tests/test_golden_wire.py`), so a
green smoke run upgrades those components from "plan-build verified"
to "runtime verified" with zero new expectations.

RUNBOOK
=======
Each component runs only when its env var is set; unset vars report
SKIP (exit stays 0). Any attempted component that fails exits 1.

1. Redis (K2-K5 sink family + pub/sub):

       REDIS_URL=redis://host:6379/0 python scripts_live_smoke.py

   Needs the ``redis`` pip package (import-gated, not in the test
   container).

2. Schema Registry (S10):

       SCHEMA_REGISTRY_URL=http://host:8081 \\
       SMOKE_SUBJECT=pg_server.public.orders-value \\
           python scripts_live_smoke.py

   Read-only: fetches the subject's latest schema and asserts field-set
   wire-compatibility with the engine's derived orders reader schema.

3. Kafka (S1 stream in, K1 producer side is exercised by the frame
   publish; full chain frame → strip → decode → CDC normalize → A1-shape
   windowed agg → K2 hash sink):

       KAFKA_BOOTSTRAP=host:9092 python scripts_live_smoke.py

   The Kafka connector jar is not bundled with pyspark — launch with:

       PYSPARK_SUBMIT_ARGS="--packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 pyspark-shell"

   Optionally add ``org.apache.spark:spark-avro_2.13:4.1.2`` to ALSO
   run the JVM ``from_avro`` decode against the jar-free codec on the
   same consumed bytes (S3 runtime parity — asserted equal when the
   jar is present, reported SKIP when not).

   When REDIS_URL is also set, the chain's sink is the real Redis
   writer; otherwise the in-memory twin (same contract, same asserts).

Expected golden numbers (from the recorded Debezium orders frames):
window 2024-03-02T10:00 'pending' -> 1 order / 149.99 revenue;
window 2024-03-02T11:00 'completed' -> 1 order / 20.5; the delete
(order 9003) must never reach the aggregation.
"""

from __future__ import annotations

import datetime
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

ZONED_DEFAULT = "1970-01-01T00:00:00.000000Z"
EXPECTED_WINDOWS = {
    (datetime.datetime(2024, 3, 2, 10, 0), "pending"): (1, 149.99),
    (datetime.datetime(2024, 3, 2, 11, 0), "completed"): (1, 20.5),
}


def orders_reader_schema() -> str:
    from cdc_pipeline_spark import schemas
    from cdc_pipeline_spark.sources.kafka_avro import avro_reader_schema

    return avro_reader_schema(
        schemas.with_cdc_meta(schemas.ORDERS),
        "OrdersCdc",
        zoned_ts_cols=("created_at", "updated_at"),
        defaults={
            "id": 0,
            "currency": "USD",
            "created_at": ZONED_DEFAULT,
            "updated_at": ZONED_DEFAULT,
        },
    )


def smoke_redis(url: str) -> None:
    """K2-K5 contract against a real server: hash, JSON, capped list,
    pub/sub fan-out — the same calls the golden streaming tests make
    against the in-memory twin."""
    from cdc_pipeline_spark.streaming.sinks import make_redis_kv

    kv = make_redis_kv(url)
    kv.write_hash("smoke:kpi", {"revenue": 149.99, "n": 1})
    got = kv.read_hash("smoke:kpi")
    assert float(got["revenue"]) == 149.99 and int(got["n"]) == 1, got
    kv.write_json("smoke:regions", [{"region": "West", "value": 1}])
    assert kv.read_json("smoke:regions") == [{"region": "West", "value": 1}]
    for i in range(5):
        kv.push_to_list("smoke:feed", {"i": i}, max_len=3)
    feed = kv.read_list("smoke:feed")
    assert len(feed) == 3, feed
    q = kv.subscribe("smoke:chan")
    kv.publish("smoke:chan", "ping")
    msg = q.get(timeout=10)
    assert "ping" in str(msg), msg
    kv.unsubscribe(q)


def smoke_registry(url: str, subject: str) -> None:
    """S10 read-only: latest writer schema for the orders subject must
    be field-set wire-compatible with the engine's derived reader."""
    import json

    from cdc_pipeline_spark.sources.kafka_avro import fetch_schema_from_registry

    live = json.loads(fetch_schema_from_registry(url, subject))
    ours = json.loads(orders_reader_schema())
    live_fields = {f["name"] for f in live.get("fields", [])}
    our_fields = {f["name"] for f in ours.get("fields", [])}
    missing = our_fields - live_fields
    assert not missing, (
        f"registry schema for {subject} lacks fields the reader "
        f"derivation expects: {sorted(missing)}"
    )


def smoke_kafka(bootstrap: str, spark, redis_url: str | None) -> None:
    """S1/K1 runtime + the full golden chain: publish the recorded
    Debezium orders frames, consume them through read_cdc_stream
    (header strip + auto Avro decode + op filter + ts normalize),
    run the A1-shape windowed revenue agg, sink via the K2 hash/JSON
    writer, and assert the exact golden window totals."""
    from fixtures_debezium_wire import FRAMES_HEX

    from pyspark.sql import functions as F

    from cdc_pipeline_spark.sources.kafka_avro import (
        avro_available,
        read_cdc_stream,
        strip_confluent_header,
    )
    from cdc_pipeline_spark.streaming.sinks import (
        InMemoryKV,
        make_redis_kv,
        snapshot_json_writer,
    )

    topic = "smoke_orders_" + os.urandom(4).hex()
    frames = [bytes.fromhex(h) for h in FRAMES_HEX["orders"]]
    # K1 producer side (batch form of the same connector)
    (
        spark.createDataFrame([(f,) for f in frames], "value binary")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )

    reader_schema = orders_reader_schema()
    normalized = read_cdc_stream(
        spark,
        bootstrap,
        topic,
        reader_schema,
        ["updated_at"],
        starting_offsets="earliest",
    )
    agg = (
        normalized.withWatermark("updated_at", "1 hour")
        .groupBy(F.window("updated_at", "1 hour").alias("w"), "status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("total_amount").alias("revenue"),
        )
        .select(F.col("w.start").alias("window_start"), "status", "n_orders", "revenue")
    )
    kv = make_redis_kv(redis_url) if redis_url else InMemoryKV()
    writer = snapshot_json_writer(kv, "smoke:orders_windows")
    with tempfile.TemporaryDirectory(prefix="smoke_ck_") as ck:
        q = (
            agg.writeStream.outputMode("complete")
            .foreachBatch(writer)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(300)
        if not finished:
            q.stop()
            raise TimeoutError(
                "availableNow replay did not finish within 300 s — broker "
                f"slow/unreachable, or topic {topic} never received the frames"
            )
    rows = kv.read_json("smoke:orders_windows")
    if rows is None:
        raise AssertionError(
            "sink key smoke:orders_windows never written — the consumed "
            "stream produced no aggregate rows (check topic contents)"
        )
    got = {
        (
            datetime.datetime.fromisoformat(str(r["window_start"]).replace("Z", "")),
            r["status"],
        ): (int(r["n_orders"]), float(r["revenue"]))
        for r in rows
    }
    assert got == EXPECTED_WINDOWS, f"golden window mismatch: {got}"

    # S3 runtime parity: when the spark-avro jar is on the classpath,
    # decode the SAME consumed bytes both ways and assert equality.
    if avro_available(spark):
        from cdc_pipeline_spark.sources.avro_codec import decode_avro_python
        from pyspark.sql.avro.functions import from_avro

        raw = (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("subscribe", topic)
            .option("startingOffsets", "earliest")
            .load()
        )
        stripped = raw.select(strip_confluent_header("value").alias("value"))
        jar_rows = sorted(
            map(
                str,
                stripped.select(
                    from_avro("value", reader_schema, {"mode": "PERMISSIVE"}).alias("r")
                )
                .select("r.*")
                .collect(),
            )
        )
        py_rows = sorted(map(str, decode_avro_python(stripped, reader_schema).collect()))
        assert jar_rows == py_rows, "JVM from_avro and jar-free codec disagree"
        print("  [kafka] S3 JVM/jar-free decode parity: OK")
    else:
        print("  [kafka] S3 JVM parity: SKIP (spark-avro jar not on classpath)")


def main() -> int:
    checks = {
        "redis": os.environ.get("REDIS_URL"),
        "registry": os.environ.get("SCHEMA_REGISTRY_URL"),
        "kafka": os.environ.get("KAFKA_BOOTSTRAP"),
    }
    if not any(checks.values()):
        print(
            "live smoke: nothing to do — set REDIS_URL / SCHEMA_REGISTRY_URL / "
            "KAFKA_BOOTSTRAP (see the runbook in this file's docstring)"
        )
        return 0
    failures = []
    spark = None
    if checks["kafka"]:
        from cdc_pipeline_spark.session import create_spark_session

        spark = create_spark_session(
            app_name="live-smoke", master="local[4]", shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
    for name, env in checks.items():
        if not env:
            print(f"[{name}] SKIP (env not set)")
            continue
        try:
            if name == "redis":
                smoke_redis(env)
            elif name == "registry":
                smoke_registry(env, os.environ.get("SMOKE_SUBJECT", "pg_server.public.orders-value"))
            else:
                smoke_kafka(env, spark, checks["redis"])
            print(f"[{name}] OK")
        except Exception as exc:  # noqa: BLE001 — smoke harness reports, not raises
            failures.append(name)
            print(f"[{name}] FAIL: {type(exc).__name__}: {exc}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
