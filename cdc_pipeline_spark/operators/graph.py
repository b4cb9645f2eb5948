"""Graph operators for dedup pipelines: connected components over
near-duplicate pair edges.

Pairwise dedup (dedup.py) yields EDGES (a ~ b at similarity ≥ τ); a
training-data pipeline needs CLUSTERS — near-duplication is transitively
chained (A~B, B~C ⇒ {A,B,C} even when A~C is below τ), and one canonical
document is kept per cluster. Components are computed by iterative
min-label propagation expressed as DataFrame joins:

  label(v) ← min(label(v), min over neighbors u of label(u))

repeated to fixpoint. Labels only decrease, so convergence is checked
with one count of still-shrinking labels per round; the label frame is
``localCheckpoint``-ed each round to keep the logical plan constant
(same lineage-truncation rationale as clustering.py's collected
centroids — here the state is distributed, so it stays a DataFrame).

Rounds needed = graph diameter. Near-dup graphs are unions of small
dense blobs (diameter ≲ 3-4), so this settles in a handful of rounds;
for adversarial long-chain graphs at 100 TB, switch to the
alternating large-star/small-star rewiring of Kiveris et al.
("Connected Components in MapReduce and Beyond", SoCC'14), which
converges in O(log n) rounds with the same join-shaped building blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    vertices: DataFrame | None = None,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Undirected connected components; returns (``id_col``,
    ``component``) with component = MIN member id (a deterministic,
    engine-portable label — stable across partitionings and reruns).

    ``vertices`` (optional) adds isolated nodes: every vertex appears in
    the output, edge-less ones as singleton components of themselves.

    Each round is one shuffle of the label frame (join on the edge key)
    plus a min-aggregate; edge and label frames partition by node id.
    """
    # Materialize the symmetrized edge list ONCE. `edges` may be the tail
    # of an expensive pipeline (shingling + inverted-index join for
    # near-dup pairs); without this, every propagation round — and both
    # branches of the union — would re-execute that whole plan.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .localCheckpoint(eager=True)
    )
    # Propagate only over nodes that have edges; isolated vertices can't
    # change label and are appended as singletons at the end.
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    # Labels only decrease, so sum(label) strictly decreases until the
    # fixpoint — a one-column scan of the just-checkpointed frame is the
    # convergence test (no join against the previous round needed).
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]

    for _ in range(max_iter):
        neighbor_labels = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(F.col("a").alias("node"), "label")
        )
        labels = (
            labels.unionAll(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    out = labels.select(F.col("node").alias(id_col), F.col("label").alias("component"))
    if vertices is not None:
        singletons = (
            vertices.select(F.col(id_col))
            .join(out.select(id_col), id_col, "left_anti")
            .select(F.col(id_col), F.col(id_col).alias("component"))
        )
        out = out.unionAll(singletons)
    return out
