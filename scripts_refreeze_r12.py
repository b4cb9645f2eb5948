#!/usr/bin/env python
"""Round-12 re-freeze (VERDICT r11 #3 + this round's optimized rows).

Updates BASELINE_QUERIES.json rows from the closing clean bench run
(BENCH_LOCAL_r12.json, in-suite best-of-2 — the repo's freeze
precedent) for exactly two classes of row, printing an audit table:

  * rows whose operator/plan/construction changed in r11/r12
    optimization work (listed explicitly below), and
  * of those, only when the delta matters: new < frozen/1.15 (stale
    slack a 1.5x gate can't see past) or new > frozen (conservative
    upward re-freeze for intended plan changes).

Never touches any other row. Run AFTER the closing bench.
"""

from __future__ import annotations

import json
import sys

# rows optimized in r11 (VERDICT r11 "what's wrong" #1: stale freeze
# slack) and r12 (this round's sections 2-5)
REFREEZE = [
    # r11 optimizations whose freeze kept big slack
    "orders_from_avro",
    "multimodal_gif_keyframes",
    "multimodal_gif_pixel_audit",
    "embedding_kcenter_select",
    "corpus_bpe_train",
    "doc_entropy_profile",
    "dedup_clusters_star",
    "dedup_duplicate_clusters",
    "dedup_graph_pagerank",
    "dedup_canonical_docs",
    "doc_lang_ngram_rank",
    "multimodal_phash_neardup",
    "doc_bm25_topk",
    "doc_bm25_broad_topk",
    "doc_max_dup_span",
    # r12 optimizations (sections 2-5), controls included
    "embedding_kmeans",
    "embedding_minibatch_kmeans",
    "ann_ivf_topk",
    "embedding_semantic_dedup",
    "embedding_cluster_medoids",
    "doc_link_frontier",
    "doc_fetch_schedule",
    "doc_robots_policy",
    "doc_robots_agent_policy",
    "doc_robots_wildcard_policy",
    "doc_sitemap_frontier",
    "embedding_neardup_lsh",
    "ann_rp_lsh_topk",
    "ann_pq_adc_topk",
    "dedup_minhash_lsh",
    "docs_incremental_neardup",
    "dedup_simhash",
    "dedup_simhash_capped",
    "dedup_snm_multipass",
    "dedup_sorted_neighborhood",
]


def main() -> None:
    with open("BENCH_LOCAL_r12.json") as fh:
        run = json.load(fh)
    with open("BASELINE_QUERIES.json") as fh:
        table = json.load(fh)
    drift = run.get("calibration", {}).get("host_drift")
    print(f"# closing-run host_drift {drift}", file=sys.stderr)
    changed = []
    for name in REFREEZE:
        new = run["queries"].get(name)
        old = table["queries"].get(name)
        if new is None or old is None:
            print(f"# SKIP {name}: missing (new={new}, old={old})", file=sys.stderr)
            continue
        if new > old * 1.25:
            # an upward re-freeze beyond 25% is a noise draw or an
            # unnoticed regression, not a freeze candidate — heavy
            # queries vary 2-4x run to run (bench.py header); refuse
            # rather than bake the inflated row into the gate
            print(
                f"# REFUSE upward {name}: {old} -> {new} (> 1.25x); "
                "adjudicate with isolated probes instead",
                file=sys.stderr,
            )
            continue
        if new < old / 1.15 or new > old:
            table["queries"][name] = new
            changed.append((name, old, new))
        else:
            print(f"# keep {name}: {old} -> {new} within slack", file=sys.stderr)
    with open("BASELINE_QUERIES.json", "w") as fh:
        json.dump(table, fh, indent=1, sort_keys=True)
        fh.write("\n")
    for name, old, new in changed:
        print(f"| `{name}` | {old:.3f} | {new:.3f} |")


if __name__ == "__main__":
    main()
