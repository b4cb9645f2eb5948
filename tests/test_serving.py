"""Serving-layer contract tests: REST snapshot shapes + SSE fan-out
against the reference's payload contracts (redis_service.py:57-163,
sse_manager.py:34-73) — served from InMemoryKV, no Spark involved."""

from __future__ import annotations

import json
import threading
import time

import pytest

flask = pytest.importorskip("flask")

from cdc_pipeline_spark.serving.app import create_app, encode_event
from cdc_pipeline_spark.streaming.sinks import InMemoryKV


@pytest.fixture
def kv():
    return InMemoryKV()


@pytest.fixture
def client(kv):
    app = create_app(kv)
    app.config["TESTING"] = True
    return app.test_client()


def test_snapshot_empty_defaults(client):
    assert client.get("/api/snapshots/metrics").get_json() == {"updatedAt": 0}
    assert client.get("/api/snapshots/traffic").get_json() == []
    assert client.get("/api/snapshots/regions").get_json() == []
    alerts = client.get("/api/snapshots/alerts").get_json()
    assert alerts["rules"] == [] and alerts["summary"]["criticalCount"] == 0
    assert client.get("/api/health").get_json() == {"status": "ok"}


def test_snapshot_typed_payloads(client, kv):
    kv.write_hash(
        "nexus:kpi:current",
        {
            "window_start": 100, "window_end": 130, "active_users": 7,
            "revenue": 12.5, "orders": 3, "error_rate": 0.5,
            "latency_p50": 40.0, "revenue_trend": 25.0,
        },
    )
    metrics = client.get("/api/snapshots/metrics").get_json()
    assert metrics["orders"] == 3 and isinstance(metrics["orders"], int)
    assert metrics["revenue"] == 12.5 and metrics["revenue_trend"] == 25.0
    assert metrics["updatedAt"] == 130

    # ring buffer is newest-first in kv; the API serves oldest-first
    for i in range(3):
        kv.push_to_list("nexus:traffic:timeseries", {"window_end": i}, max_len=21)
    traffic = client.get("/api/snapshots/traffic").get_json()
    assert [t["window_end"] for t in traffic] == [0, 1, 2]

    kv.write_json("nexus:regions:current", [{"region": "EU", "value": 1.0}])
    assert client.get("/api/snapshots/regions").get_json() == [{"region": "EU", "value": 1.0}]

    kv.push_to_list("nexus:activity:feed", {"id": 1}, max_len=15)
    assert client.get("/api/snapshots/activities").get_json() == [{"id": 1}]


def test_sse_refetches_snapshot_on_publish(kv):
    # drive the view's generator directly — the werkzeug test client
    # buffers (and closes) streamed responses, which would consume an
    # endless SSE body
    app = create_app(kv)
    with app.test_request_context("/api/events"):
        rv = app.view_functions["events"]()
    gen = iter(rv.response)
    got: list[str] = []
    t = threading.Thread(target=lambda: got.append(next(gen)), daemon=True)
    t.start()
    time.sleep(0.3)  # generator must be subscribed before the publish
    kv.write_hash(
        "nexus:kpi:current",
        {"window_end": 200, "orders": 9, "revenue": 5.0},
        channel="nexus:kpi",
    )
    t.join(10)
    assert got, "SSE stream should yield an event after a publish"
    frame = got[0] if isinstance(got[0], str) else got[0].decode()
    assert frame.startswith("event: metrics\n")
    payload = json.loads(frame.split("data: ", 1)[1].strip())
    # the frame carries the re-fetched, typed snapshot — not the raw publish
    assert payload["orders"] == 9 and payload["updatedAt"] == 200


def test_encode_event_frame_format():
    assert encode_event("geo", {"a": 1}) == 'event: geo\ndata: {"a":1}\n\n'


def test_subscribe_receives_only_selected_channels(kv):
    q = kv.subscribe("nexus:kpi")
    kv.publish("nexus:other", "x")
    kv.publish("nexus:kpi", "y")
    channel, payload = q.get(timeout=2)
    assert (channel, payload) == ("nexus:kpi", "y")
    assert q.empty()
    kv.unsubscribe(q)
    kv.publish("nexus:kpi", "z")
    assert q.empty()
