"""Seeded CDC load generator (reference generate_test_data.py parity):
deterministic journey traffic, Debezium-shaped lifecycle chains, and the
end-to-end drive of the transaction job from generated file batches."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from cdc_pipeline_spark.sources.files import stream_parquet
from cdc_pipeline_spark.streaming import generator, jobs
from cdc_pipeline_spark.streaming.generator import (
    JourneyGenerator,
    generate_batches,
    kpi_components_from_cdc,
)
from cdc_pipeline_spark.streaming.sinks import InMemoryKV


def _all_cycles(gen, n=400):
    base = dt.datetime(2024, 1, 1)
    return [gen.cycle(base + dt.timedelta(seconds=i)) for i in range(n)]


def test_generator_is_seed_deterministic():
    a = _all_cycles(JourneyGenerator(seed=11))
    b = _all_cycles(JourneyGenerator(seed=11))
    assert a == b
    c = _all_cycles(JourneyGenerator(seed=12))
    assert a != c, "a different seed must redraw the traffic"


def test_journey_semantics_order_gate_and_status_mix():
    """~75% of journey mass contains checkout_start (the order gate);
    every order update ('u') targets a previously inserted order ('c'),
    and completed >> failed/refunded in the status mix."""
    cycles = _all_cycles(JourneyGenerator(seed=7), n=600)
    with_order = sum(1 for c in cycles if c["orders"])
    frac = with_order / len(cycles)
    assert 0.65 < frac < 0.85, f"order-creating fraction {frac} out of band"

    inserts, updates, statuses = set(), set(), []
    for c in cycles:
        for row in c["orders"]:
            if row["__op"] == "c":
                inserts.add(row["id"])
                assert row["status"] == "pending"
            else:
                updates.add(row["id"])
                statuses.append(row["status"])
    assert updates <= inserts, "every update must follow its insert"
    assert statuses.count("completed") > 5 * (
        statuses.count("failed") + statuses.count("refunded")
    )
    # request latency: log-normal body (median well under the tail)
    lat = [r["latency_ms"] for c in cycles for r in c["request_log"]]
    lat.sort()
    assert lat[len(lat) // 2] < 200 and lat[-1] > 300


def test_generated_batches_drive_transaction_job(spark, tmp_path):
    """End-to-end: generator files → stream_parquet sources → the
    reference's transaction job (KPI + activity + region) → kv sinks.
    This is the sandbox-runnable version of the reference's stress run."""
    dirs = generate_batches(
        spark, str(tmp_path / "gen"), rate=20, n_ticks=3, seed=7
    )
    orders = stream_parquet(spark, dirs["orders"], generator.TABLE_SCHEMAS["orders"])
    events = stream_parquet(spark, dirs["user_events"], generator.TABLE_SCHEMAS["user_events"])
    requests = stream_parquet(spark, dirs["request_log"], generator.TABLE_SCHEMAS["request_log"])
    events2 = stream_parquet(spark, dirs["user_events"], generator.TABLE_SCHEMAS["user_events"])
    events3 = stream_parquet(spark, dirs["user_events"], generator.TABLE_SCHEMAS["user_events"])

    fused = kpi_components_from_cdc(orders, events, requests)
    region_src = events3.select(
        F.col("created_at").alias("event_time"),
        F.col("region_name"),
        F.coalesce(F.col("amount"), F.lit(0.0)).alias("sales"),
        F.lit(1).alias("request_count"),
    )
    kv = InMemoryKV()
    queries = jobs.start_transaction_job(
        fused, events2, region_src, kv, str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    for q in queries:
        q.awaitTermination(180)

    kpi = kv.read_hash("nexus:kpi:current")
    assert kpi and float(kpi["revenue"]) > 0, kpi
    assert int(kpi["orders"]) > 0
    feed = [json.loads(i) for i in kv.lists["nexus:activity:feed"]]
    assert feed and all("action" in item for item in feed)
    regions = json.loads(kv.strings["nexus:regions:current"])
    assert regions and {r["region_name"] for r in regions} <= {
        "North America", "Europe", "Asia Pacific", "South America", "Unknown"
    }


def test_generated_batches_replay_identically(spark, tmp_path):
    """Same seed + same rate → byte-identical parquet batch contents
    (the property that makes generator-driven golden tests possible)."""
    d1 = generate_batches(spark, str(tmp_path / "g1"), rate=10, n_ticks=2, seed=3)
    d2 = generate_batches(spark, str(tmp_path / "g2"), rate=10, n_ticks=2, seed=3)
    for table in d1:
        a = spark.read.parquet(d1[table]).orderBy("id").collect()
        b = spark.read.parquet(d2[table]).orderBy("id").collect()
        assert a == b, f"{table} differs between identical-seed runs"
    # preset ladder resolves
    with pytest.raises(KeyError):
        generate_batches(spark, str(tmp_path / "g3"), preset="nope")


def test_session_close_preserves_original_start_time():
    """The close 'u' row must carry the session's ORIGINAL started_at —
    immutable columns churning between CDC versions breaks SCD2/change
    detection downstream."""
    gen = JourneyGenerator(seed=1)
    base = dt.datetime(2024, 1, 1)
    starts: dict[str, object] = {}
    for i in range(400):
        out = gen.cycle(base + dt.timedelta(seconds=i))
        for row in out["sessions"]:
            if row["__op"] == "c":
                starts[row["id"]] = row["started_at"]
            else:
                assert row["started_at"] == starts[row["id"]], row["id"]
                assert row["ended_at"] > row["started_at"]
    assert any(r["__op"] == "u" for c in [gen.cycle(base)] for r in c["sessions"]) or starts
