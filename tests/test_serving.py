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


# ---------------------------------------------------------------------------
# WebSocket endpoint (RFC 6455 over the kv contract; reference
# routes/ws.py + services/ws_manager.py)
# ---------------------------------------------------------------------------

_WS_EVENTS = ("metrics", "traffic", "activity", "regions", "flows",
              "alert", "platform", "health", "geo")


class _BufferedSock:
    """Socket wrapper that replays bytes over-read during the handshake
    (the server pushes snapshot frames immediately after the 101, so one
    recv can deliver headers + the start of frame data)."""

    def __init__(self, sock, leftover: bytes) -> None:
        self._sock = sock
        self._buf = leftover

    def recv(self, n: int) -> bytes:
        if self._buf:
            out, self._buf = self._buf[:n], self._buf[n:]
            return out
        return self._sock.recv(n)

    def sendall(self, data: bytes) -> None:
        self._sock.sendall(data)

    def close(self) -> None:
        self._sock.close()


def _ws_connect(port: int, path: str = "/ws"):
    """Minimal RFC 6455 client: upgrade handshake, returns a buffered socket."""
    import base64
    import os as _os
    import socket

    from cdc_pipeline_spark.serving.ws import accept_key

    sock = socket.create_connection(("127.0.0.1", port), timeout=5)
    key = base64.b64encode(_os.urandom(16)).decode("ascii")
    req = (
        f"GET {path} HTTP/1.1\r\n"
        f"Host: 127.0.0.1:{port}\r\n"
        "Upgrade: websocket\r\n"
        "Connection: Upgrade\r\n"
        f"Sec-WebSocket-Key: {key}\r\n"
        "Sec-WebSocket-Version: 13\r\n\r\n"
    )
    sock.sendall(req.encode("latin-1"))
    resp = b""
    while b"\r\n\r\n" not in resp:
        chunk = sock.recv(4096)
        assert chunk, "server closed during handshake"
        resp += chunk
    head, leftover = resp.split(b"\r\n\r\n", 1)
    head_text = head.decode("latin-1")
    assert head_text.startswith("HTTP/1.1 101"), head_text
    assert f"Sec-WebSocket-Accept: {accept_key(key)}" in head_text
    return _BufferedSock(sock, leftover)


def _recv_event(sock):
    from cdc_pipeline_spark.serving.ws import OP_TEXT, decode_frame

    opcode, payload = decode_frame(sock)
    assert opcode == OP_TEXT
    return json.loads(payload.decode("utf-8"))


def test_ws_snapshot_on_connect_then_pubsub_fanout(kv):
    """The reference WS contract end-to-end: connect → nine snapshot
    frames (REST-identical payload shapes) → a kv publish fans out a
    re-fetched snapshot frame to every connected client."""
    from cdc_pipeline_spark.serving.ws import serve_ws

    kv.write_hash("nexus:kpi:current", {"window_end": 100, "orders": 7, "revenue": 1.5})
    server, hub = serve_ws(kv)
    port = server.server_address[1]
    try:
        c1 = _ws_connect(port)
        frames = [_recv_event(c1) for _ in range(9)]
        assert tuple(f["event"] for f in frames) == _WS_EVENTS
        metrics = frames[0]["data"]
        assert metrics["orders"] == 7 and metrics["updatedAt"] == 100
        # shapes match the REST snapshots (ws_manager docstring contract)
        assert frames[1]["data"] == [] and frames[5]["data"]["summary"]["criticalCount"] == 0

        c2 = _ws_connect(port)
        for _ in range(9):
            _recv_event(c2)

        # publish → BOTH clients get the re-fetched (typed) snapshot
        kv.write_hash(
            "nexus:kpi:current",
            {"window_end": 200, "orders": 9, "revenue": 5.0},
            channel="nexus:kpi",
        )
        for sock in (c1, c2):
            evt = _recv_event(sock)
            assert evt["event"] == "metrics"
            assert evt["data"]["orders"] == 9 and evt["data"]["updatedAt"] == 200
        c1.close()
        c2.close()
    finally:
        server.shutdown()
        server.server_close()
        hub.close()


def test_ws_ping_pong_and_clean_close(kv):
    import struct
    import time as _time

    from cdc_pipeline_spark.serving.ws import (
        OP_CLOSE,
        OP_PING,
        OP_PONG,
        decode_frame,
        encode_frame,
        serve_ws,
    )

    server, hub = serve_ws(kv)
    port = server.server_address[1]
    try:
        sock = _ws_connect(port)
        for _ in range(9):
            _recv_event(sock)
        assert hub.client_count == 1
        # ping (client frames must be masked) → pong with same payload
        sock.sendall(encode_frame(OP_PING, b"hb", mask=True))
        opcode, payload = decode_frame(sock)
        assert (opcode, payload) == (OP_PONG, b"hb")
        # close → server echoes the close code and detaches the client
        sock.sendall(encode_frame(OP_CLOSE, struct.pack(">H", 1000), mask=True))
        opcode, payload = decode_frame(sock)
        assert opcode == OP_CLOSE and payload == struct.pack(">H", 1000)
        sock.close()
        deadline = _time.time() + 5
        while hub.client_count and _time.time() < deadline:
            _time.sleep(0.05)
        assert hub.client_count == 0
    finally:
        server.shutdown()
        server.server_close()
        hub.close()


def test_ws_pipelined_frame_with_handshake_not_lost(kv):
    """A client that writes its upgrade request AND its first frame in a
    single send must not lose the frame: the server buffers handshake
    leftover bytes into the frame parser (mirror of the client-side
    _BufferedSock) and answers the pipelined PING with a PONG."""
    import base64
    import os as _os
    import socket
    import struct as _struct

    from cdc_pipeline_spark.serving.ws import (
        OP_PING,
        OP_PONG,
        accept_key,
        decode_frame,
        encode_frame,
        serve_ws,
    )

    server, hub = serve_ws(kv)
    port = server.server_address[1]
    try:
        sock = socket.create_connection(("127.0.0.1", port), timeout=5)
        key = base64.b64encode(_os.urandom(16)).decode("ascii")
        req = (
            f"GET /ws HTTP/1.1\r\nHost: 127.0.0.1:{port}\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
        )
        ping = encode_frame(OP_PING, b"hi", mask=True)
        sock.sendall(req.encode("latin-1") + ping)  # pipelined
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = sock.recv(4096)
            assert chunk
            resp += chunk
        head, leftover = resp.split(b"\r\n\r\n", 1)
        assert head.decode("latin-1").startswith("HTTP/1.1 101")
        buf = _BufferedSock(sock, leftover)
        # drain the nine snapshot frames, then the PONG must arrive
        seen_pong = False
        for _ in range(12):
            opcode, payload = decode_frame(buf)
            if opcode == OP_PONG:
                assert payload == b"hi"
                seen_pong = True
                break
        assert seen_pong, "pipelined PING was lost by the handshake"
        sock.close()
    finally:
        server.shutdown()
        server.server_close()
        hub.close()


def test_generator_control_routes(spark, kv, tmp_path):
    """Reference generator control surface (routes/generator.py):
    status → start (409 on double-start, 400 on unknown preset) → the
    daemon emits ingestible micro-batch files → stop."""
    import time as _time

    from cdc_pipeline_spark.serving.app import create_app
    from cdc_pipeline_spark.serving.generator_control import GeneratorManager
    from cdc_pipeline_spark.streaming import generator as genmod

    manager = GeneratorManager(spark, str(tmp_path / "genctl"))
    client = create_app(kv, generator_manager=manager).test_client()

    assert client.get("/api/generator/status").get_json()["running"] is False
    r = client.post(
        "/api/generator/start",
        json={"rate": 5, "duration": 2, "tick_seconds": 0.2},
    )
    assert r.status_code == 200 and r.get_json()["running"] is True
    assert client.post("/api/generator/start", json={}).status_code == 409
    # wait for the run to finish (10 ticks x 0.2s + write overhead)
    deadline = _time.time() + 60
    while client.get("/api/generator/status").get_json()["running"]:
        assert _time.time() < deadline, "generator run should finish"
        _time.sleep(0.3)
    status = client.get("/api/generator/status").get_json()
    assert status["rows"] > 0 and status["ticks"] >= 1
    # a stopped manager accepts a new start; unknown preset is a 400
    assert client.post("/api/generator/start", json={"preset": "warp"}).status_code == 400
    # emitted files parse under the declared CDC schemas
    orders = spark.read.schema(genmod.TABLE_SCHEMAS["orders"]).parquet(
        status["dirs"]["orders"]
    )
    assert orders.count() > 0 and "__op" in orders.columns
    r = client.post("/api/generator/start", json={"preset": "light", "duration": 30})
    assert r.status_code == 200 and r.get_json()["rate"] == 5
    stopped = client.post("/api/generator/stop").get_json()
    assert stopped["running"] is False


def test_generator_restart_never_reuses_filenames(spark, kv, tmp_path):
    """Spark's file source tracks processed files BY PATH: a second run
    must emit fresh filenames, never overwrite the first run's batches.
    Bad parameters 400 at the route instead of killing the daemon."""
    import os as _os
    import time as _time

    from cdc_pipeline_spark.serving.app import create_app
    from cdc_pipeline_spark.serving.generator_control import GeneratorManager

    manager = GeneratorManager(spark, str(tmp_path / "genrestart"))
    client = create_app(kv, generator_manager=manager).test_client()
    assert client.post("/api/generator/start", json={"tick_seconds": 0}).status_code == 400
    assert client.post("/api/generator/start", json={"rate": "fast"}).status_code == 400

    def run_once():
        r = client.post(
            "/api/generator/start", json={"rate": 5, "duration": 0.4, "tick_seconds": 0.2}
        )
        assert r.status_code == 200
        deadline = _time.time() + 60
        while client.get("/api/generator/status").get_json()["running"]:
            assert _time.time() < deadline
            _time.sleep(0.2)
        return client.get("/api/generator/status").get_json()

    s1 = run_once()
    files1 = set(_os.listdir(s1["dirs"]["orders"]))
    s2 = run_once()
    files2 = set(_os.listdir(s2["dirs"]["orders"]))
    assert files1 <= files2 and files2 - files1, "second run must ADD files, not overwrite"
    assert s2["rows"] > 0


def test_retrieval_search_route_serves_ranked_docs(spark, kv, tmp_path):
    """GET /api/retrieval/search over a streaming-maintained BM25 index
    directory: ranked docs come back as JSON, ranking matches the index
    query operator (broad heap path), and bad requests 400."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from cdc_pipeline_spark.streaming.retrieval_index import (
        Bm25IndexWriter,
        bm25_topk_over_index,
    )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    path = str(tmp_path / "bm25serve")
    writer = Bm25IndexWriter(path)
    writer(
        spark.createDataFrame(
            [(1, "apple banana apple"), (2, "apple cherry"), (3, "banana date")], schema
        ),
        0,
    )
    writer(spark.createDataFrame([(4, "cherry apple date")], schema), 1)

    client = create_app(kv, spark=spark, bm25_index_path=path).test_client()
    resp = client.get("/api/retrieval/search?q=Apple+cherry&k=3")
    assert resp.status_code == 200
    body = resp.get_json()
    assert body["query"] == "apple cherry" and body["k"] == 3
    expected = [
        {"doc_id": r.doc_id, "score": r.score, "rank": r.rank}
        for r in sorted(
            bm25_topk_over_index(
                spark, path, queries=((0, ("apple", "cherry")),), k=3
            ).collect(),
            key=lambda r: r.rank,
        )
    ]
    assert body["results"] == expected
    assert [r["rank"] for r in body["results"]] == list(range(1, len(expected) + 1))

    assert client.get("/api/retrieval/search").status_code == 400
    assert client.get("/api/retrieval/search?q=apple&k=x").status_code == 400
    # route absent when the app is built without an index (snapshot-only)
    assert create_app(kv).test_client().get("/api/retrieval/search").status_code == 404


def test_retrieval_ann_route_serves_neighbors(spark, kv, tmp_path):
    """GET /api/retrieval/ann over a built IVF index: query-by-example
    returns ranked neighbors matching the index operator; unknown ids
    404, malformed params 400, absent index config 404s the route."""
    from cdc_pipeline_spark.operators.ann_index import build_ivf_index, ivf_index_topk

    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    path = str(tmp_path / "annserve")
    build_ivf_index(vecs, path, cell_col="label")
    example = vecs.orderBy("vec_id").limit(1).collect()[0]

    client = create_app(kv, spark=spark, ann_index_path=path).test_client()
    resp = client.get(f"/api/retrieval/ann?like={example.vec_id}&k=3&n_probe=2")
    assert resp.status_code == 200
    body = resp.get_json()
    expected = [
        {"vec_id": r.vec_id, "score": r.score, "rank": r.rank}
        for r in sorted(
            ivf_index_topk(
                spark, path, [(example.vec_id, list(example.embedding))], k=3, n_probe=2
            ).collect(),
            key=lambda r: r.rank,
        )
    ]
    assert body["results"] == expected and len(expected) == 3

    assert client.get("/api/retrieval/ann?like=999999999").status_code == 404
    assert client.get("/api/retrieval/ann?like=abc").status_code == 400
    assert client.get("/api/retrieval/ann").status_code == 400
    assert create_app(kv).test_client().get("/api/retrieval/ann").status_code == 404

    # direct-vector query: no lookup scan; qid=-1 means no self to
    # exclude, so the example itself ranks first at score 1.0
    qs = ",".join(str(x) for x in example.embedding)
    direct = client.get(f"/api/retrieval/ann?vec={qs}&k=3&n_probe=2").get_json()
    expected_direct = [
        {"vec_id": r.vec_id, "score": r.score, "rank": r.rank}
        for r in sorted(
            ivf_index_topk(
                spark, path, [(-1, list(example.embedding))], k=3, n_probe=2
            ).collect(),
            key=lambda r: r.rank,
        )
    ]
    assert direct["results"] == expected_direct
    assert direct["results"][0] == {"vec_id": example.vec_id, "score": 1.0, "rank": 1}
    assert client.get("/api/retrieval/ann?vec=1.0,not-a-float").status_code == 400

    # configured-but-unbuilt index must 404 as JSON, never 500
    unbuilt = create_app(
        kv, spark=spark, ann_index_path=str(tmp_path / "never_built")
    ).test_client()
    resp = unbuilt.get("/api/retrieval/ann?like=1")
    assert resp.status_code == 404 and "no IVF index" in resp.get_json()["error"]
