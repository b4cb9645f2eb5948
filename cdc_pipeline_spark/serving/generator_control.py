"""Generator control surface: start/stop/status over the seeded CDC
load generator.

Reference parity: ``src/api/routes/generator.py`` +
``services/generator_manager.py:34-69`` — a REST surface that launches
the traffic generator at a preset, reports its status/log, refuses a
second concurrent start (409), and stops it on demand. The reference
shells out to the generator script and pipes Postgres/Kafka; here the
manager runs :func:`streaming.generator.write_tick` on a daemon thread
at a wall-clock cadence, emitting file-source micro-batches a streaming
job ingests live — the sandbox-complete equivalent of `make stress`
while dashboards watch.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from typing import Any

from cdc_pipeline_spark.streaming.generator import (
    PRESETS,
    JourneyGenerator,
    make_table_dirs,
    write_tick,
)


class GeneratorManager:
    """Single-flight load-generator runner (generator_manager.py:34-69
    semantics: one run at a time, status snapshot, bounded log)."""

    def __init__(self, spark, out_base: str) -> None:
        self._spark = spark
        self._out_base = out_base
        self._lock = threading.Lock()
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()
        self._log: deque[str] = deque(maxlen=200)
        self._state: dict[str, Any] = {"running": False}
        # each start gets a fresh filename prefix: the file source tracks
        # processed files by path, so tick names must never repeat
        self._run_seq = 0
        self.dirs = make_table_dirs(out_base)

    # -- public API ---------------------------------------------------

    def start(
        self,
        preset: str = "custom",
        rate: float = 10.0,
        duration: float = 30.0,
        error_rate: float = 0.05,
        tick_seconds: float = 1.0,
        seed: int = 7,
    ) -> dict[str, Any]:
        # validate BEFORE the thread exists: a bad JSON body (string
        # rate, zero tick_seconds) must 400 at the route, not kill the
        # daemon after start already returned 200 running=true
        rate, duration = float(rate), float(duration)
        error_rate, tick_seconds = float(error_rate), float(tick_seconds)
        if rate <= 0 or duration <= 0 or tick_seconds <= 0:
            raise ValueError("rate, duration and tick_seconds must be > 0")
        if not 0.0 <= error_rate <= 1.0:
            raise ValueError("error_rate must be in [0, 1]")
        with self._lock:
            if self._thread is not None and self._thread.is_alive():
                raise RuntimeError("generator is already running")
            if preset != "custom":
                conf = PRESETS[preset]  # KeyError → 400 at the route
                rate, error_rate = conf["rate"], conf["error_rate"]
            self._run_seq += 1
            self._stop.clear()
            self._state = {
                "running": True,
                "preset": preset,
                "rate": rate,
                "error_rate": error_rate,
                "duration": duration,
                "started_at": time.time(),
                "ticks": 0,
                "rows": 0,
            }
            self._log.append(f"start preset={preset} rate={rate}/s duration={duration}s")
            gen = JourneyGenerator(seed=seed, error_rate=error_rate)
            self._thread = threading.Thread(
                target=self._run,
                args=(gen, rate, duration, tick_seconds, f"run{self._run_seq:03d}-"),
                daemon=True,
                name="cdc-load-generator",
            )
            self._thread.start()
        return self.status

    def stop(self) -> dict[str, Any]:
        self._stop.set()
        t = self._thread
        if t is not None:
            t.join(timeout=30)
        self._log.append("stop requested")
        return self.status

    @property
    def status(self) -> dict[str, Any]:
        with self._lock:
            snap = dict(self._state)
            snap["running"] = self._thread is not None and self._thread.is_alive()
            snap["log"] = list(self._log)[-20:]
            snap["dirs"] = self.dirs
            return snap

    # -- worker -------------------------------------------------------

    def _run(
        self, gen: JourneyGenerator, rate: float, duration: float,
        tick_seconds: float, prefix: str,
    ) -> None:
        try:
            n_ticks = max(1, int(duration / tick_seconds))
            for tick in range(n_ticks):
                if self._stop.is_set():
                    break
                t0 = time.time()
                n = write_tick(
                    self._spark, gen, self.dirs, tick, rate, tick_seconds,
                    time.time(), prefix=prefix,
                )
                with self._lock:
                    self._state["ticks"] = tick + 1
                    self._state["rows"] += n
                self._log.append(f"tick {tick}: {n} rows in {time.time() - t0:.2f}s")
                # wall-clock pacing: sleep out the remainder of the tick
                # (the stop event cuts the sleep short)
                remainder = tick_seconds - (time.time() - t0)
                if remainder > 0:
                    self._stop.wait(remainder)
        except Exception as exc:  # surfaced via status, never kills the server
            self._log.append(f"generator error: {type(exc).__name__}: {exc}")
        finally:
            with self._lock:
                self._state["running"] = False
                self._state["finished_at"] = time.time()


def register_routes(app, manager: GeneratorManager) -> None:
    """Attach the reference's three generator endpoints to a Flask app
    (routes/generator.py:33-62): GET status, POST start (409 when
    already running, 400 on an unknown preset), POST stop."""
    from flask import jsonify, request

    @app.route("/api/generator/status")
    def generator_status():
        return jsonify(manager.status)

    @app.route("/api/generator/start", methods=["POST"])
    def generator_start():
        body = request.get_json(silent=True) or {}
        kwargs = {
            k: body[k]
            for k in ("preset", "rate", "duration", "error_rate", "tick_seconds", "seed")
            if k in body
        }
        try:
            return jsonify(manager.start(**kwargs))
        except RuntimeError as exc:
            return jsonify({"error": str(exc)}), 409
        except KeyError as exc:
            return jsonify({"error": f"unknown preset {exc}"}), 400
        except (ValueError, TypeError) as exc:
            return jsonify({"error": f"bad parameter: {exc}"}), 400

    @app.route("/api/generator/stop", methods=["POST"])
    def generator_stop():
        return jsonify(manager.stop())
