#!/usr/bin/env python
"""Round-12 phase probe for doc_link_frontier / doc_fetch_schedule
(VERDICT r11 item 4): stage-by-stage timings of the frontier chain plus
a construction/analysis-vs-execution split, so the expression-battery
cost is localized before any change.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

from cdc_pipeline_spark.session import create_spark_session
from cdc_pipeline_spark import workload

SF_DIR = "/root/testdata/sf0.1"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def force(df):
    df.agg(F.bit_xor(F.xxhash64(F.struct(*df.columns)))).collect()


def timeit(label, fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"# {label}: {best:.3f}s", file=sys.stderr, flush=True)
    return best


def main() -> None:
    spark = create_spark_session(
        app_name="probe-frontier", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")
    force(workload.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001"))

    def gen(batches):
        import numpy, pandas  # noqa: F401
        yield from batches

    wdf = spark.range(int(CPUS), numPartitions=int(CPUS))
    wdf.mapInPandas(gen, wdf.schema).count()

    from cdc_pipeline_spark.operators.weblinks import (
        capture_link_events,
        crawl_frontier,
        frontier_partial,
    )
    from cdc_pipeline_spark.sources.warc import warc_records

    docs = workload._t(spark, SF_DIR, "documents")
    fixture = workload.warc_fixture_payloads(docs)

    timeit("fixture synth", lambda: force(fixture))
    records = warc_records(fixture)
    timeit("+warc_records", lambda: force(records))
    events = capture_link_events(records)
    timeit("+capture_link_events", lambda: force(events))
    partial = frontier_partial(events)
    timeit("+frontier_partial", lambda: force(partial))
    frontier = crawl_frontier(events)
    timeit("+crawl_frontier", lambda: force(frontier))

    # construction + analysis cost vs execution, per query
    for name in ("doc_link_frontier", "doc_fetch_schedule"):
        t0 = time.perf_counter()
        df = workload.QUERIES[name](spark, SF_DIR)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()  # trigger analysis+planning
        t2 = time.perf_counter()
        force(df)
        t3 = time.perf_counter()
        print(
            f"# {name}: build {t1-t0:.3f}s plan {t2-t1:.3f}s exec {t3-t2:.3f}s",
            file=sys.stderr, flush=True,
        )
        # steady-state re-run (fresh build each time, like the bench)
        timeit(f"{name} full (best of 3)", lambda n=name: force(workload.QUERIES[n](spark, SF_DIR)))


if __name__ == "__main__":
    main()
