#!/usr/bin/env python
"""Round-12 A/B for connected-components round structure (VERDICT r11
item 5): min-label propagation vs the Kiveris star algorithm, on
(a) the bench near-dup graph (low diameter — dedup_canonical_docs'
edge set at sf0.1) and (b) a synthetic high-diameter chain graph.
Outputs must be identical (component = min member id) for both
algorithms; the probe asserts that before timing.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

from cdc_pipeline_spark.session import create_spark_session
from cdc_pipeline_spark import workload
from cdc_pipeline_spark.operators.graph import connected_components

SF_DIR = "/root/testdata/sf0.1"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    spark = create_spark_session(
        app_name="probe-cc", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = workload.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")
    d.agg(F.bit_xor(F.xxhash64(F.struct(*d.columns)))).collect()

    from cdc_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    docs = workload._t(spark, SF_DIR, "documents")
    pairs = (
        ngram_jaccard_pairs(docs, threshold=0.3)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )

    # (b) high-diameter fixture: 100 parallel chains of 128 nodes each
    # (diameter 127, 12.8k nodes) — the adversarial shape for
    # propagation (rounds = diameter; a full-size 20k-diameter chain
    # would run 20k driver rounds and is untimeable) where star
    # converges in O(log n) rounds
    chain = spark.range(0, 100 * 128).filter((F.col("id") % 128) != 127).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    chain_edges = chain.repartition(int(CPUS)).localCheckpoint(eager=True)

    def fp(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(F.struct("doc_id", "component"))).alias("x"),
        ).collect()[0]

    for label, edges, max_iter in (("benchgraph", pairs, 25), ("chain128", chain_edges, 500)):
        outs = {}
        for algo in ("propagation", "star"):
            stats: dict = {}
            t0 = time.perf_counter()
            out = connected_components(
                edges, max_iter=max_iter, algorithm=algo, stats=stats
            )
            r = fp(out)
            dt = time.perf_counter() - t0
            outs[algo] = (r["n"], r["x"])
            print(
                f"# {label} {algo}: {dt:.3f}s rounds={stats.get('rounds')} "
                f"converged={stats.get('converged')} fp=({r['n']},{r['x']})",
                file=sys.stderr, flush=True,
            )
        assert outs["propagation"] == outs["star"], f"{label}: outputs differ!"

    # full-query A/B for the bench consumer (propagation is the shipped default)
    for _ in range(3):
        t0 = time.perf_counter()
        df = workload.QUERIES["dedup_canonical_docs"](spark, SF_DIR)
        df.agg(F.bit_xor(F.xxhash64(F.struct(*df.columns)))).collect()
        print(f"# dedup_canonical_docs full: {time.perf_counter()-t0:.3f}s", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
