#!/usr/bin/env python
"""Benchmark harness: runs the headline workload queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "workload_wall_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced with ``agg(sum(xxhash64(struct(*))))`` — a one-row
collect that still evaluates EVERY output column. A bare ``count()``
would let Catalyst prune unreferenced projections, so projection-heavy
queries (text features, winnowing) would measure the scan instead of
their expressions.
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline queries: one per operator family (relational aggs, joins,
# windowed streaming semantics, top-k, CDC, trends, dedup/similarity/text
# once registered). Anything registered in the workload and not listed
# here still runs — this list only fixes a stable ordering.
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
]


def main() -> None:
    spark = create_spark_session(
        app_name="cdc-pipeline-spark-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in workload.QUERIES]
    names += [n for n in sorted(workload.QUERIES) if n not in names]

    # warm the JVM/codegen once on the smallest SF so per-query numbers
    # measure the plan, not first-run JIT
    warm = workload.QUERIES["q1_pricing_summary"]
    _force(warm(spark, "/root/testdata/sf0.001"))

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

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else None
    print(
        json.dumps(
            {
                "metric": "workload_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
