#!/usr/bin/env python
"""Round-12 phase probe for the kmeans family (VERDICT r11 item 1).

Replicates clustering.kmeans step by step at sf0.1 and times each
phase (checkpoint, init, per-iteration update collect, final assign),
then A/Bs a candidate single-shuffle `grouped_vector_means` rewrite
(groupBy(cluster).collect_list(struct(id, vec)) -> id-sorted zip_with
fold) against the shipped posexplode form, asserting bit-identical
centroids per iteration.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

from cdc_pipeline_spark.session import create_spark_session
from cdc_pipeline_spark import workload
from cdc_pipeline_spark.operators.clustering import _assign, _update
from cdc_pipeline_spark.operators.similarity import grouped_vector_means

SF_DIR = "/root/testdata/sf0.1"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def new_update(assigned, vec_col, id_col="vec_id"):
    """Candidate: ONE shuffle — collect (id, vec) per cluster, sort by
    id, fold vectors element-wise in id order (0.0 + x == x exactly, so
    starting from the first vector matches the old 0.0-seeded per-dim
    fold), divide by count."""
    acc_t = "array<double>"
    lst = F.array_sort(
        F.collect_list(
            F.struct(F.col(id_col).alias("i"), F.col(vec_col).cast(acc_t).alias("x"))
        )
    )
    summed = F.aggregate(
        lst,
        F.lit(None).cast(acc_t),
        lambda acc, s: F.when(acc.isNull(), s["x"]).otherwise(
            F.zip_with(acc, s["x"], lambda a, b: a + b)
        ),
    )
    mean = F.transform(summed, lambda v: v / F.size(lst))
    rows = (
        assigned.groupBy("cluster")
        .agg(mean.alias("centroid"))
        .collect()
    )
    return sorted((int(r.cluster), list(r.centroid)) for r in rows)


def main() -> None:
    spark = create_spark_session(
        app_name="probe-kmeans", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")
    _ = workload.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")
    _.agg(F.bit_xor(F.xxhash64(F.struct(*_.columns)))).collect()

    def gen(batches):
        import numpy, pandas  # noqa: F401
        yield from batches

    wdf = spark.range(int(CPUS), numPartitions=int(CPUS))
    wdf.mapInPandas(gen, wdf.schema).count()

    emb_path = os.path.join(SF_DIR, "embeddings.parquet")
    id_col, vec_col, k, iters = "vec_id", "embedding", 8, 5

    for trial in range(3):
        emb = spark.read.parquet(emb_path)
        t0 = time.perf_counter()
        corpus = emb.select(id_col, vec_col).localCheckpoint(eager=True)
        t1 = time.perf_counter()
        init = (
            corpus.orderBy(F.col(id_col).asc())
            .limit(k)
            .select(F.col(vec_col).cast("array<double>").alias("v"))
            .collect()
        )
        centroids = [(i, list(r.v)) for i, r in enumerate(init)]
        t2 = time.perf_counter()
        print(f"[trial {trial}] checkpoint {t1-t0:.3f}s init {t2-t1:.3f}s", file=sys.stderr)
        for it in range(iters):
            ta = time.perf_counter()
            assigned = _assign(corpus, centroids, id_col, vec_col)
            tb = time.perf_counter()
            old = _update(assigned, vec_col, id_col)
            tc = time.perf_counter()
            new = new_update(_assign(corpus, centroids, id_col, vec_col), vec_col, id_col)
            td = time.perf_counter()
            same = old == new
            print(
                f"[trial {trial}] iter {it}: build_assign {tb-ta:.3f}s "
                f"old_update {tc-tb:.3f}s new_update {td-tc:.3f}s identical={same}",
                file=sys.stderr,
            )
            if not same:
                for (ca, va), (cb, vb) in zip(old, new):
                    if va != vb:
                        diff = [(i, a, b) for i, (a, b) in enumerate(zip(va, vb)) if a != b]
                        print(f"  cluster {ca}: {len(diff)} dims differ, first {diff[:2]}", file=sys.stderr)
                sys.exit(1)
            merged = dict(centroids)
            merged.update(dict(old))
            centroids = sorted(merged.items())
        te = time.perf_counter()
        final = _assign(corpus, centroids, id_col, vec_col).select(
            F.col(id_col), F.col("cluster").cast("int").alias("cluster")
        )
        final.agg(F.bit_xor(F.xxhash64(F.struct(*final.columns)))).collect()
        print(f"[trial {trial}] final assign force {time.perf_counter()-te:.3f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
