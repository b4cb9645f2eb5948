"""Snapshot service: typed read-side shaping of the kv serving contract.

Mirrors the reference's RedisService payload contracts
(``/root/reference/src/api/services/redis_service.py:57-163``; JSON
shapes ``DESCRIPTION.md:380-626``): each getter reads one kv key
(hash / JSON string / capped list), applies the documented empty-state
default, and coerces field types — serving is dumb-read + shape, all
computation happened in the streaming sinks.

Works against any kv backend with ``read_hash`` / ``read_json`` /
``read_list`` (InMemoryKV here; a Redis client in production — the
methods map 1:1 onto HGETALL / GET / LRANGE).
"""

from __future__ import annotations

import json
from typing import Any

# engine kv channels (streaming/jobs.py) → SSE event names — the same
# mapping role as the reference's CHANNEL_TO_EVENT (api/config.py:18-28),
# keyed by this engine's channel names.
CHANNEL_TO_EVENT = {
    "nexus:kpi": "metrics",
    "nexus:traffic": "traffic",
    "nexus:activity": "activity",
    "nexus:regions": "regions",
    "nexus:flows": "flows",
    "nexus:alerts": "alert",
    "nexus:platform": "platform",
    "nexus:health": "health",
    "nexus:geo": "geo",
}


def _num(value: Any, default: int = 0) -> int:
    if value in (None, ""):
        return default
    return int(float(value))


def _flt(value: Any, default: float = 0.0) -> float:
    if value in (None, ""):
        return default
    return float(value)


class SnapshotService:
    def __init__(self, kv: Any) -> None:
        self.kv = kv

    # -- hash snapshots ----------------------------------------------------
    def get_metrics(self) -> dict[str, Any]:
        """KPI hash → typed payload (redis_service.py:57-85). The engine's
        column names ride through; trends come from the K5 read-back
        fields (`<col>_trend`, streaming/sinks.py::trend_hash_writer)."""
        payload = self.kv.read_hash("nexus:kpi:current")
        if not payload:
            return {"updatedAt": 0}
        out: dict[str, Any] = {}
        for field, value in payload.items():
            if field in ("window_start", "window_end", "orders", "active_users"):
                out[field] = _num(value)
            else:
                out[field] = _flt(value)
        out["updatedAt"] = _num(payload.get("window_end"))
        return out

    def get_health(self) -> dict[str, Any]:
        payload = self.kv.read_hash("nexus:health:current")
        if not payload:
            return {"updatedAt": 0}
        return {k: (_flt(v) if k not in ("window_start", "window_end", "nodes") else _num(v)) for k, v in payload.items()} | {
            "updatedAt": _num(payload.get("window_end"))
        }

    def get_geo(self) -> dict[str, Any]:
        payload = self.kv.read_hash("nexus:geo:header")
        if not payload:
            # same field names/units as populated payloads
            # (windowed_geo_header emits global_load "<n> TB/S")
            return {"global_load": "0.0 TB/S", "request_count": 0, "updatedAt": 0}
        out = dict(payload)
        for k in ("window_start", "window_end", "request_count"):
            if k in out:
                out[k] = _num(out[k])
        out["updatedAt"] = _num(payload.get("window_end"))
        return out

    # -- capped lists ------------------------------------------------------
    def get_traffic(self) -> list[dict[str, Any]]:
        """Ring buffer newest-first in kv; serve oldest-first (reference
        reverses LRANGE, redis_service.py:87-91)."""
        items = self.kv.read_list("nexus:traffic:timeseries", 0, 20)
        return list(reversed([json.loads(i) for i in items]))

    def get_activities(self) -> list[dict[str, Any]]:
        return [json.loads(i) for i in self.kv.read_list("nexus:activity:feed", 0, 14)]

    # -- JSON snapshots ----------------------------------------------------
    def get_regions(self) -> list[dict[str, Any]]:
        return self.kv.read_json("nexus:regions:current") or []

    def get_flows(self) -> list[dict[str, Any]]:
        return self.kv.read_json("nexus:flows:current") or []

    def get_platform(self) -> list[dict[str, Any]]:
        return self.kv.read_json("nexus:platform:breakdown") or []

    def get_alerts(self) -> dict[str, Any]:
        rules = self.kv.read_json("nexus:alert:rules") or []
        summary = self.kv.read_hash("nexus:alert:summary")
        shaped = (
            {
                "criticalCount": _num(summary.get("criticalCount")),
                "warningCount": _num(summary.get("warningCount")),
                "healthyCount": _num(summary.get("healthyCount")),
                "updatedAt": _num(summary.get("updatedAt")),
            }
            if summary
            else {"criticalCount": 0, "warningCount": 0, "healthyCount": 0, "updatedAt": 0}
        )
        return {"rules": rules, "summary": shaped}

    # -- registry ----------------------------------------------------------
    def fetch(self, event: str):
        return {
            "metrics": self.get_metrics,
            "traffic": self.get_traffic,
            "activity": self.get_activities,
            "regions": self.get_regions,
            "flows": self.get_flows,
            "alert": self.get_alerts,
            "platform": self.get_platform,
            "health": self.get_health,
            "geo": self.get_geo,
        }[event]()
