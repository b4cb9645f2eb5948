#!/usr/bin/env python
"""Benchmark harness: runs the headline workload queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "workload_wall_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

followed by a compact LAST line (same keys, headline-query map only,
plus n_queries / calibration / gate totals) sized to survive the
driver's bounded stdout-tail capture — BENCH_r{N}.json is parsed from
that tail, and rounds 9-10 recorded "parsed": null when the full
per-query line alone overflowed it. The complete map is always in
BENCH_LOCAL_r{N}.json.

Each query is forced with ``agg(sum(xxhash64(struct(*))))`` — a one-row
collect that still evaluates EVERY output column. A bare ``count()``
would let Catalyst prune unreferenced projections, so projection-heavy
queries (text features, winnowing) would measure the scan instead of
their expressions.

``--check [BASELINE_QUERIES.json|BASELINE.md]`` (default
BASELINE_QUERIES.json next to this file) additionally compares every
query against its frozen per-query baseline and exits 1 on regression:
measured > 1.5x frozen AND measured above the 1-second noise floor
(local[32] sub-second timings jitter ±30% from scheduling alone — see
BASELINE.md — so sub-second rows can't gate at a ratio). Queries new
since the freeze are reported informationally, never failed.

Would-be regressions get one ISOLATION RETRY (best of two, in a FRESH
JVM at the end of the suite) before the gate fails: multi-second
queries on local[32] spike 2-4x from scheduler/GC luck alone — three
consecutive full-suite runs of identical code flagged three disjoint
sets — and a long bench session additionally degrades late queries
2-5x from accumulated driver/codegen state, which an in-JVM retry
inherits (measured: 4.0s retry vs 0.95s fresh, identical code). A
genuine plan regression is exactly the thing that reproduces in the
fresh session too. Retried names are recorded in the JSON
(``isolation_retried``) so a pass never hides that a retry happened.

The JSON line also carries a ``calibration`` block (host_drift vs the
committed freeze, three control-query ratios, 1/5/15-min load averages
around the run) so a reader can adjudicate host noise from the artifact
alone: controls near 1.0x and load << cpus mean per-query ratios are
believable; controls at 1.5-3x or load >> cpus mean the run measured
the neighbors, not the code.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from cdc_pipeline_spark.session import create_spark_session
from cdc_pipeline_spark import workload


def _force(df) -> None:
    """Evaluate the full result: hash every output column of every row
    into one aggregated long. Defeats count()-style column pruning while
    keeping driver-side transfer to a single row. bit_xor, not sum —
    summing 64-bit hashes overflows under ANSI mode."""
    df.agg(F.bit_xor(F.xxhash64(F.struct(*df.columns)))).collect()


def _warm_python_workers(spark, n_workers: int) -> None:
    """Spawn the Python/Arrow worker pool BEFORE timing anything.

    A fresh JVM has no Python workers; the first mapInPandas/mapInArrow
    query pays one worker spawn + numpy/pandas/pyarrow import per core
    (~4 s wall at local[32] — measured round 8: cold 6.5 s vs warm
    2.4 s for embedding_principal_component, identical code). Without
    this warm-up the cost lands on whichever ARROW query happens to run
    first — which is how that query "drifted" 1.50 → 2.69 s across
    rounds as registry reordering moved it around the suite, and why
    isolation retries of Arrow queries read systematically high. One
    row per core guarantees every worker in the pool starts and caches
    the heavy imports."""

    def gen(batches):
        import numpy  # noqa: F401 — the import IS the warm-up
        import pandas  # noqa: F401

        yield from batches

    df = spark.range(n_workers, numPartitions=n_workers)
    df.mapInPandas(gen, df.schema).count()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline queries: one per operator family (relational aggs, joins,
# windowed streaming semantics, top-k, CDC, trends, dedup/similarity/text
# once registered). Anything registered in the workload and not listed
# here still runs — this list only fixes a stable ordering and which
# per-query rows ride the compact tail line the driver parses.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_volume",
    "kpi_sliding_window",
    "traffic_tumbling_count",
    "health_conditional_avg",
    "platform_breakdown",
    "geo_header_load",
    "customer_region_enrichment",
    "cdc_latest_state",
    "grouped_topk_events",
    "hourly_value_trend",
    # r12 (VERDICT r11 #2): the rows above are all sub-2 s at sf0.1 and
    # overhead-bound (job scheduling + plan analysis), so an 8-core vs
    # 32-core ratio over them reads ≈ 1 and the driver's scaling probe
    # was uninformative. These three are the queries the r11 c8/c32
    # runs showed genuinely compute-parallel (broadcast-join scoring /
    # LSH verify over all cores: 2.7× / 1.6× / 1.7× at 8 cores), so
    # the probe now measures parallel compute, not the scheduling
    # floor. Additions only — no row removed or renamed.
    "embedding_neardup_pairs",
    "embedding_neardup_lsh",
    "docs_incremental_neardup",
]

# The headline rows whose runtime genuinely scales with cores at sf0.1
# (the r11 c8/c32 evidence above); every OTHER headline row is
# overhead-bound and its low-core ratio carries no signal — the
# emitted `scaling_hint` names both sets so a reader knows which
# ratios to trust.
SCALING_PARALLEL = (
    "embedding_neardup_pairs",
    "embedding_neardup_lsh",
    "docs_incremental_neardup",
)


REGRESSION_RATIO = 1.5
NOISE_FLOOR_SEC = 1.0

# Control queries for host-noise calibration: multi-second, untouched
# for several rounds, spanning the engine's three execution families
# (windowed JVM agg / LSH shuffle join / Arrow mapInPandas). When THESE
# read well above their freezes, the host is loaded — per-query ratios
# from that run measure the neighbors, not the code (BENCH_r08 read
# 1.40x geomean purely from a load-avg-11 neighbor window; adjudicating
# it required a fresh probe because the artifact carried no calibration).
CONTROL_QUERIES = ("kpi_sliding_window", "dedup_minhash_lsh", "embedding_kmeans")


def load_baseline(path: str) -> dict[str, float]:
    """Per-query frozen timings from BASELINE_QUERIES.json ({"queries":
    {name: sec}}) or from BASELINE.md's freeze table (| `name` | sec |)."""
    if path.endswith(".json"):
        with open(path) as fh:
            doc = json.load(fh)
        return {str(k): float(v) for k, v in doc["queries"].items()}
    import re

    out: dict[str, float] = {}
    with open(path) as fh:
        for line in fh:
            m = re.match(r"\s*\|\s*`([a-z0-9_]+)`\s*\|\s*([0-9.]+)\s*\|\s*$", line)
            if m:
                out[m.group(1)] = float(m.group(2))
    if not out:
        raise ValueError(f"no per-query baseline rows found in {path}")
    return out


def host_drift(timings: dict[str, float], baseline: dict[str, float]) -> float:
    """Calibration factor for UNIFORM host-speed drift: the median
    measured/frozen ratio over every comparable query, floored at 1.0.

    The freeze ran on a particular machine at a particular load; a
    shared host that is globally 1.3× slower months later would flag
    dozens of phantom "regressions" under a raw per-query ratio (seen
    live mid-round-5: median 1.27×, 23 untouched queries over the raw
    gate, including pure TPC-H joins whose code hadn't changed in
    rounds). The MEDIAN is the right normalizer: a real regression
    moves one query's ratio, not the median of 150 — so dividing by it
    preserves per-query sensitivity while cancelling fleet-wide drift.
    Floored at 1.0 so a FASTER host never loosens the gate's absolute
    meaning (everything simply passes more easily, which is fine)."""
    ratios = sorted(
        timings[n] / baseline[n] for n in timings if n in baseline and baseline[n] > 0
    )
    if not ratios:
        return 1.0
    mid = len(ratios) // 2
    med = ratios[mid] if len(ratios) % 2 else (ratios[mid - 1] + ratios[mid]) / 2
    return max(1.0, med)


def find_regressions(
    timings: dict[str, float],
    baseline: dict[str, float],
    ratio: float = REGRESSION_RATIO,
    noise_floor: float = NOISE_FLOOR_SEC,
    drift: float | None = None,
) -> tuple[dict[str, tuple[float, float]], list[str], float]:
    """(regressions {name: (measured, frozen)}, new-query names, drift).

    A query regresses when measured > ratio x drift x frozen AND
    measured exceeds the drift-scaled absolute noise floor — sub-second
    timings on local[32] jitter ±30% from scheduling alone, so a pure
    ratio would flag noise, and `host_drift` cancels uniform
    machine-speed shifts since the freeze (a genuine single-query
    regression still stands out against the median). Pass ``drift`` to
    pin a previously computed ratio — the isolation-retry pass must
    re-evaluate under the SAME drift it selected retries with, or
    lowering the retried timings would lower the median and flag a
    query that never got its retry.
    """
    if drift is None:
        drift = host_drift(timings, baseline)
    regressions: dict[str, tuple[float, float]] = {}
    new: list[str] = []
    for name, measured in timings.items():
        frozen = baseline.get(name)
        if frozen is None:
            new.append(name)
        elif measured > ratio * drift * frozen and measured > noise_floor * drift:
            regressions[name] = (measured, frozen)
    return regressions, new, drift


_RETRY_SNIPPET = r"""
import json, sys, time
from pyspark.sql import functions as F
from cdc_pipeline_spark.session import create_spark_session
from cdc_pipeline_spark import workload

names = json.loads(sys.argv[1])
sf_dir = sys.argv[2]
cpus = int(sys.argv[3])
spark = create_spark_session(
    app_name="cdc-pipeline-spark-bench-retry",
    master=f"local[{cpus}]",
    shuffle_partitions=cpus,
)
spark.sparkContext.setLogLevel("ERROR")

def _force(df):
    df.agg(F.bit_xor(F.xxhash64(F.struct(*df.columns)))).collect()

_force(workload.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001"))

def _gen(batches):
    import numpy, pandas  # noqa: F401
    yield from batches

warm_df = spark.range(cpus, numPartitions=cpus)
warm_df.mapInPandas(_gen, warm_df.schema).count()

out = {}
for name in names:
    # best of THREE, not two: the first run pays plan analysis/codegen
    # (measured 1.7-2.3s vs 0.8-1.0s steady for HOF-heavy queries), so
    # best-of-2 leaves a single steady draw and its jitter false-flags
    # sub-2s rows; two steady draws make the min a real steady-state
    # reading. Cost is one extra run, only for flagged queries.
    best = None
    for _ in range(3):
        start = time.perf_counter()
        _force(workload.QUERIES[name](spark, sf_dir))
        elapsed = time.perf_counter() - start
        best = elapsed if best is None else min(best, elapsed)
    out[name] = best
print(json.dumps(out))
"""


def _subprocess_retry(names: list[str]) -> dict[str, float]:
    """Best-of-two re-measurement of flagged queries in a brand-new
    Python process (hence a brand-new py4j gateway JVM), warmed the
    same way the suite is. Returns {} on any failure — the gate then
    judges the in-suite numbers, never silently passes."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c", _RETRY_SNIPPET, json.dumps(names), SF_DIR, str(CPUS)],
            capture_output=True,
            text=True,
            timeout=1800,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not lines:
            print(
                f"# isolation-retry subprocess failed rc={proc.returncode}: "
                f"{proc.stderr[-500:]}",
                file=sys.stderr,
            )
            return {}
        return {k: float(v) for k, v in json.loads(lines[-1]).items()}
    except (OSError, subprocess.TimeoutExpired, ValueError) as exc:
        print(f"# isolation-retry subprocess error: {exc}", file=sys.stderr)
        return {}


def main() -> None:
    check_path = None
    baseline = None
    if "--check" in sys.argv:
        i = sys.argv.index("--check")
        check_path = (
            sys.argv[i + 1]
            if len(sys.argv) > i + 1 and not sys.argv[i + 1].startswith("-")
            else os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_QUERIES.json")
        )
        # load BEFORE the multi-minute run: a typo'd path must fail in
        # milliseconds, not after the whole benchmark has been measured
        baseline = load_baseline(check_path)
    # calibration baseline: even WITHOUT --check, load the default
    # freeze if present so the emitted artifact carries its own
    # host-noise calibration (drift + control ratios + loadavg) — the
    # driver's BENCH_r{N}.json is built from this stdout and must be
    # adjudicable without a fresh probe
    calib_baseline = baseline
    if calib_baseline is None:
        default_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BASELINE_QUERIES.json"
        )
        try:
            calib_baseline = load_baseline(default_path)
        except (OSError, ValueError, KeyError):
            calib_baseline = None
    try:
        loadavg_start: tuple[float, ...] | None = os.getloadavg()
    except OSError:
        loadavg_start = None
    spark = create_spark_session(
        app_name="cdc-pipeline-spark-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in workload.QUERIES]
    names += [n for n in sorted(workload.QUERIES) if n not in names]

    # warm the JVM/codegen once on the smallest SF so per-query numbers
    # measure the plan, not first-run JIT — and the Python worker pool,
    # so the first Arrow query doesn't absorb the one-time spawn cost
    warm = workload.QUERIES["q1_pricing_summary"]
    _force(warm(spark, "/root/testdata/sf0.001"))
    _warm_python_workers(spark, int(CPUS))

    timings: dict[str, float] = {}
    total = 0.0
    for name in names:
        # best of two runs: the first run pays plan compilation/codegen,
        # the second measures the steady-state plan — which is what a
        # resident engine re-executing a query shape actually costs
        best = None
        for _ in range(2):
            start = time.perf_counter()
            _force(workload.QUERIES[name](spark, SF_DIR))
            elapsed = time.perf_counter() - start
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 3)
        total += timings[name]
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    # Isolation retry for would-be regressions: single-shot heavy
    # queries on local[32] vary 2-4x run to run (three consecutive
    # full-suite runs on IDENTICAL code flagged three DISJOINT sets —
    # e.g. doc_quality_classifier 0.63s / 0.70s / 3.31s), so a flag
    # from the in-suite pass alone measures scheduler luck, not the
    # plan. A genuine plan regression reproduces on a quiet re-measure
    # at the end; a hiccup does not. Keep the better of the two
    # measurements — the same steady-state philosophy as best-of-two.
    # Gate timings are a SEPARATE view: the durable artifact keeps the
    # in-suite best-of-2 for every query (a retried query must not get
    # a tighter frozen baseline than its never-flagged peers — that
    # would bias future freezes low for exactly the jitteriest
    # queries), while the gate judges the flake-filtered values. The
    # drift ratio is pinned from the in-suite pass for the same reason:
    # retries lowering the median must not move the threshold under a
    # query that never received its retry.
    retried: list[str] = []
    gate_timings = dict(timings)
    drift0: float | None = None
    if baseline is not None:
        pre, _, drift0 = find_regressions(timings, baseline)
        if pre:
            # Retry in a GENUINELY fresh JVM — a subprocess. After ~4k
            # stages a local-mode session accumulates enough
            # driver/codegen/GC debris that late queries (and any retry
            # sharing the JVM) run 2-5x slow regardless of plan —
            # measured: winnowing 4.0s on an in-JVM retry vs 0.95s in a
            # fresh session, identical code. The earlier spark.stop() +
            # new-session retry did NOT deliver this: PySpark's py4j
            # gateway JVM survives a SparkContext stop, so the "fresh"
            # retry inherited the aged JVM and re-read the same
            # degraded numbers (measured r11: winnowing 4.9s in the
            # same-JVM retry vs 0.71s isolated best-of-5, identical
            # code, quiet host, two suite runs in a row). A genuine
            # plan regression reproduces in the subprocess too;
            # long-session degradation does not.
            retry_timings = _subprocess_retry(sorted(pre))
            for name in sorted(pre):
                fresh_best = retry_timings.get(name)
                if fresh_best is not None:
                    gate_timings[name] = min(timings[name], round(fresh_best, 3))
                retried.append(name)
                print(
                    f"# isolation retry {name}: {gate_timings[name]:.3f}s",
                    file=sys.stderr,
                )

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else None
    doc = {
        "metric": "workload_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if retried:
        doc["isolation_retried"] = retried
    # Self-calibration (VERDICT r8 #3): the artifact carries what a
    # reader needs to adjudicate host noise without a fresh probe —
    # median drift vs the committed freeze, the three control-query
    # ratios, and the 1/5/15-min load averages around the run. Controls
    # near 1.0x + low load = per-query ratios are believable; controls
    # at 1.5-3x or load >> cpus = the run measured the neighbors.
    try:
        loadavg_end: tuple[float, ...] | None = os.getloadavg()
    except OSError:
        loadavg_end = None
    calibration: dict = {
        "loadavg_start": list(loadavg_start) if loadavg_start else None,
        "loadavg_end": list(loadavg_end) if loadavg_end else None,
        "cpus": int(CPUS),
    }
    # drift/control ratios compare against the sf0.1 freeze — at any
    # other SF they'd read as phantom speedups/slowdowns, so emit only
    # load averages there
    if calib_baseline is not None and SF_DIR.rstrip("/") == "/root/testdata/sf0.1":
        calibration["host_drift"] = round(host_drift(timings, calib_baseline), 3)
        calibration["controls"] = {
            name: {
                "sec": timings[name],
                "frozen": calib_baseline[name],
                "ratio": round(timings[name] / calib_baseline[name], 3),
            }
            for name in CONTROL_QUERIES
            if name in timings and calib_baseline.get(name)
        }
    doc["calibration"] = calibration
    print(json.dumps(doc))
    # Driver-tail-safe summary (VERDICT r10 #6): the full doc above runs
    # ~10 KB at 172 queries and the driver's stdout capture keeps only a
    # bounded tail, so BENCH_r09/r10.json recorded "parsed": null. Emit a
    # compact line LAST — same required keys (metric/value/unit/queries/
    # sf) but only the headline queries in the map, plus gate totals and
    # the calibration block — so the tail window always ends with one
    # complete, parseable JSON record. Full per-query map stays in
    # BENCH_LOCAL_r{N}.json below.
    summary = {
        "metric": doc["metric"],
        "value": doc["value"],
        "unit": doc["unit"],
        "queries": {n: timings[n] for n in HEADLINE if n in timings},
        "sf": sf,
        "n_queries": len(timings),
        "calibration": calibration,
        # which headline rows actually exercise parallel compute at
        # sf0.1 — the rest sit at the per-query scheduling floor, so
        # their low-core/high-core ratios are expected ≈ 1 and carry no
        # scaling signal (VERDICT r11 #2)
        "scaling_hint": {
            "parallel_compute": [n for n in SCALING_PARALLEL if n in timings],
            "overhead_bound": [
                n for n in HEADLINE if n in timings and n not in SCALING_PARALLEL
            ],
        },
    }
    if retried:
        summary["isolation_retried"] = retried
    # Durable full-timings artifact: the driver's BENCH_r{N}.json keeps
    # only a truncated stdout tail (r05 preserved 62 of 153 per-query
    # rows), so ALSO write the complete map to BENCH_LOCAL_r{N}.json —
    # same {"queries": ...} shape, so `--check` accepts one as a
    # baseline file. Round number: $SPARK_GRAFT_ROUND, else one past the
    # newest committed BENCH_r*.json.
    repo = os.path.dirname(os.path.abspath(__file__))
    if SF_DIR.rstrip("/") != "/root/testdata/sf0.1":
        # only the official per-round scale writes the durable artifact:
        # a smaller-SF spot-check must not clobber the round's full-SF
        # timings (the file is what round N+1's judge diffs against)
        print(f"# BENCH_LOCAL write skipped: non-default SF {SF_DIR}", file=sys.stderr)
    else:
        rnd = os.environ.get("SPARK_GRAFT_ROUND")
        if rnd is not None:
            try:
                rnd = f"{int(rnd):02d}"  # normalize '6' -> '06' (r0N convention)
            except ValueError:
                pass
        else:
            import re

            seen = [
                int(m.group(1))
                for f in os.listdir(repo)
                if (m := re.fullmatch(r"BENCH_r(\d+)\.json", f))
            ]
            rnd = f"{(max(seen) + 1 if seen else 1):02d}"
        try:
            with open(os.path.join(repo, f"BENCH_LOCAL_r{rnd}.json"), "w") as fh:
                json.dump(doc, fh)
                fh.write("\n")
        except OSError as exc:  # read-only checkout must not fail the bench
            print(f"# BENCH_LOCAL write skipped: {exc}", file=sys.stderr)
    spark.stop()

    if baseline is None:
        print(json.dumps(summary))
    else:
        regressions, new, drift = find_regressions(
            gate_timings, baseline, drift=drift0
        )
        summary["gate"] = {
            "gated": len(timings) - len(new),
            "new": len(new),
            "regressions": sorted(regressions),
            "drift": round(drift, 3),
        }
        print(json.dumps(summary))
        print(f"# host drift vs freeze (median ratio): {drift:.2f}x", file=sys.stderr)
        for cname, c in calibration.get("controls", {}).items():
            print(
                f"# control {cname}: {c['sec']:.3f}s vs frozen {c['frozen']:.3f}s "
                f"({c['ratio']:.2f}x)",
                file=sys.stderr,
            )
        if loadavg_start and loadavg_end:
            print(
                f"# loadavg start {loadavg_start} -> end {loadavg_end} "
                f"on {CPUS} cpus",
                file=sys.stderr,
            )
        for name in new:
            print(f"# new since freeze (not gated): {name}", file=sys.stderr)
        for name, (measured, frozen) in sorted(regressions.items()):
            print(
                f"REGRESSION {name}: {measured:.3f}s vs frozen {frozen:.3f}s "
                f"({measured / frozen:.2f}x > {REGRESSION_RATIO}x·{drift:.2f}x drift)",
                file=sys.stderr,
            )
        if regressions:
            sys.exit(1)
        print(
            f"# regression gate: OK ({len(timings) - len(new)} gated, "
            f"{len(new)} new)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
