#!/usr/bin/env python
"""Scale-evidence harness (SCALE.md): measure candidate-volume and
wall-time scaling of the dedup / ANN / BM25 / tokenizer families from
sf0.1 to an sf1-EQUIVALENT corpus (10x documents + embeddings), and
print ONE JSON line of measured-vs-predicted numbers.

Corpus construction (deterministic, no Python RNG, pure column
expressions): each sf0.1 document is replicated ``REPS`` times; replica
0 is the original corpus and replica r > 0 renames EVERY token
injectively (``r{r}_<token>``). Jaccard similarity is invariant under
injective token renaming, so each replica carries exactly the sf0.1
corpus' planted near-dup structure, while replicas are pairwise
DISJOINT (no token shared → no cross-replica candidates). That yields a
falsifiable prediction: every exact pair family must return EXACTLY
10x the sf0.1 pair count, and LSH candidate volume must grow ~10x
(same structure, fresh hash draws per replica) — linear-at-constant-
density, the 100 TB design claim. Quadratic behavior (an all-pairs
leak, an unbounded bucket) would show up as ~100x instead.

Embeddings likewise: replica r offsets vec_id and adds a deterministic
±5e-4 per-element jitter (cluster structure preserved), so the IVF
index sees 10x rows in the same cell geometry and per-query cost must
scale with rows-per-probed-cell, not corpus size.

Run: ``python bench_scale.py`` (~3-5 min on local[32]).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from cdc_pipeline_spark.session import create_spark_session
from cdc_pipeline_spark.sources.files import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "10"))


def replicated_docs(spark, reps: int):
    """sf0.1 documents x reps with injective per-replica token renaming
    (replica 0 = original). doc_id offset by 1e6 per replica."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text", "source")
    rep = F.col("rep")
    renamed = F.array_join(
        F.transform(
            F.split(F.trim(F.col("text")), r"\s+"),
            lambda w: F.when(rep == 0, w).otherwise(
                F.concat(F.lit("r"), rep.cast("string"), F.lit("_"), w)
            ),
        ),
        " ",
    )
    return (
        docs.crossJoin(F.broadcast(spark.range(reps).select(F.col("id").alias("rep"))))
        .select(
            (F.col("doc_id") + rep * 1_000_000).alias("doc_id"),
            renamed.alias("text"),
            "source",
        )
        .repartition(32)
    )


def replicated_embeddings(spark, reps: int):
    """sf0.1 embeddings x reps with a deterministic +-5e-4 jitter per
    element (splitmix-style xxhash fold), labels preserved."""
    emb = load_table(spark, SF_DIR, "embeddings")
    rep = F.col("rep")
    jittered = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x
            + (
                F.pmod(F.xxhash64(F.col("vec_id"), rep, i), F.lit(1000)) - F.lit(500)
            ).cast("float")
            * F.lit(1e-6)
        ).cast("float"),
    )
    return (
        emb.crossJoin(F.broadcast(spark.range(reps).select(F.col("id").alias("rep"))))
        .select(
            (F.col("vec_id") + rep * 1_000_000).alias("vec_id"),
            jittered.alias("embedding"),
            "label",
        )
        .repartition(32)
    )


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = create_spark_session(
        app_name="bench-scale", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cdc_pipeline_spark.operators.ann_index import build_ivf_index, ivf_index_topk
    from cdc_pipeline_spark.operators.chunking import unigram_vocab
    from cdc_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
        prefix_filter_jaccard_pairs,
    )
    from cdc_pipeline_spark.operators.retrieval import bm25_topk

    base_docs = replicated_docs(spark, 1).localCheckpoint(eager=True)
    big_docs = replicated_docs(spark, REPS).localCheckpoint(eager=True)
    base_emb = replicated_embeddings(spark, 1).localCheckpoint(eager=True)
    big_emb = replicated_embeddings(spark, REPS).localCheckpoint(eager=True)

    result: dict = {
        "metric": "scale_evidence",
        "sf_dir": SF_DIR,
        "reps": REPS,
        "n_docs": {"base": base_docs.count(), "big": big_docs.count()},
        "n_vecs": {"base": base_emb.count(), "big": big_emb.count()},
        "families": {},
    }

    def family(name: str, base_fn, big_fn, exact_linear: bool):
        (b_val, b_sec) = timed(base_fn)
        (g_val, g_sec) = timed(big_fn)
        entry = {
            "base_count": b_val,
            "big_count": g_val,
            "predicted_big": b_val * REPS,
            "count_ratio": round(g_val / b_val, 3) if b_val else None,
            "predicted_ratio": float(REPS),
            "exact_linear_expected": exact_linear,
            "base_sec": b_sec,
            "big_sec": g_sec,
            "sec_ratio": round(g_sec / b_sec, 2) if b_sec else None,
        }
        result["families"][name] = entry
        print(f"# {name}: {entry}", flush=True)

    # exact pair families — injective renaming ⇒ EXACTLY 10x pairs
    family(
        "minhash_lsh_verified_pairs",
        lambda: minhash_lsh_pairs(base_docs, threshold=0.3).count(),
        lambda: minhash_lsh_pairs(big_docs, threshold=0.3).count(),
        exact_linear=True,
    )
    # candidate volume (verify=False) — fresh hash draws per replica ⇒ ~10x
    family(
        "minhash_lsh_candidates",
        lambda: minhash_lsh_pairs(base_docs, threshold=0.3, verify=False).count(),
        lambda: minhash_lsh_pairs(big_docs, threshold=0.3, verify=False).count(),
        exact_linear=False,
    )
    family(
        "prefix_filter_jaccard_pairs",
        lambda: prefix_filter_jaccard_pairs(base_docs).count(),
        lambda: prefix_filter_jaccard_pairs(big_docs).count(),
        exact_linear=True,
    )
    # retrieval + tokenizer: wall-time scaling (counts are k-bounded /
    # vocab-bounded by design, so the clock is the claim under test)
    # non-exact near-dup variants: not invariant under token renaming
    # (feature hashes and sort orders change per replica), but both are
    # STRUCTURALLY bounded — SNM candidates <= passes*window*n, simhash
    # candidates by band-bucket collisions — so the reps^1.5 ceiling
    # still gates a quadratic leak
    from cdc_pipeline_spark.operators.dedup import (
        simhash_pairs,
        sorted_neighborhood_pairs,
    )

    family(
        "simhash_pairs",
        lambda: simhash_pairs(base_docs).count(),
        lambda: simhash_pairs(big_docs).count(),
        exact_linear=False,
    )
    family(
        "snm_pairs",
        lambda: sorted_neighborhood_pairs(base_docs).count(),
        lambda: sorted_neighborhood_pairs(big_docs).count(),
        exact_linear=False,
    )
    family(
        "bm25_broad_topk_rows",
        lambda: bm25_topk(base_docs, broad_candidates=1000).count(),
        lambda: bm25_topk(big_docs, broad_candidates=1000).count(),
        exact_linear=False,
    )
    family(
        "unigram_vocab_rows",
        lambda: unigram_vocab(base_docs).count(),
        lambda: unigram_vocab(big_docs).count(),
        exact_linear=False,
    )

    # IVF index: build + query at both scales; pruning fraction constant
    tmp = tempfile.mkdtemp(prefix="ivf_scale_")
    try:
        queries = [
            (qid, [float(x) for x in r["embedding"]])
            for qid, r in enumerate(base_emb.orderBy("vec_id").limit(4).collect())
        ]
        ivf = {}
        for tag, frame in (("base", base_emb), ("big", big_emb)):
            path = os.path.join(tmp, tag)
            _, build_sec = timed(
                lambda: build_ivf_index(frame, path, n_cells=16)
            )
            rows, query_sec = timed(
                lambda: ivf_index_topk(spark, path, queries, k=5, n_probe=2).count()
            )
            ivf[tag] = {"build_sec": build_sec, "query_sec": query_sec, "rows": rows}
        ivf["build_sec_ratio"] = round(ivf["big"]["build_sec"] / ivf["base"]["build_sec"], 2)
        ivf["query_sec_ratio"] = round(ivf["big"]["query_sec"] / ivf["base"]["query_sec"], 2)
        ivf["probed_fraction"] = 2 / 16
        result["families"]["ivf_index_topk"] = ivf
        print(f"# ivf_index_topk: {ivf}", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # verdicts: exact-linear families must hit predicted_big EXACTLY;
    # candidate volume within 2x of linear (hash-draw variance), never
    # quadratic (>= REPS^1.5 would flag a bucket/all-pairs leak)
    ok = True
    for name, e in result["families"].items():
        if name == "ivf_index_topk":
            continue
        if e["exact_linear_expected"] and e["big_count"] != e["predicted_big"]:
            ok = False
        if (
            not e["exact_linear_expected"]
            and e["count_ratio"] is not None
            and e["count_ratio"] > REPS**1.5
        ):
            ok = False
    result["linear_scaling_ok"] = ok
    print(json.dumps(result))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
