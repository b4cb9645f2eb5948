"""Continuously maintained BM25 index: a ``foreachBatch`` writer that
lands each micro-batch's term-frequency postings and document lengths,
plus a query-time scorer over the accumulated state.

Design (the incremental-retrieval shape at 100 TB): the corpus-global
BM25 inputs — df(t), N, avgdl — CHANGE with every ingested document, so
a streaming index must not bake final weights at write time. Instead
each micro-batch appends only its LOCAL, immutable facts:

  * ``tf/``       (doc_id, token, tf)   — the batch's postings
  * ``doclens/``  (doc_id, dl)          — every batch doc, incl. dl = 0

both partitioned by ``batch_id`` with per-batch dynamic-partition
overwrite, so a replayed micro-batch rewrites exactly its own partition
and the index is replay-idempotent with no marker files (same layout
contract as ``streaming/neardup_index.py`` / ``streaming/rollup.py``).
Per-batch work is proportional to the batch; nothing re-reads history.
At query time ``bm25_topk_over_index`` derives the corpus stats from
the accumulated tables and ranks — bit-identical to running the batch
operator over the full corpus (pinned by the golden twin test), because
``operators/retrieval.py`` computes weights from exactly these two
tables. Bucketing ``tf/`` by token makes the query-term probe
shuffle-free on the corpus side.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pipeline_spark.operators.retrieval import (
    BM25_QUERIES,
    bm25_term_weights_from_stats,
    bm25_topk_from_weights,
    doc_lengths,
    token_tf,
)
from cdc_pipeline_spark.streaming.neardup_index import _write_batch_partition
from cdc_pipeline_spark.streaming.rollup import (
    _replay_folded,
    _swap_compacted,
    _table_lock,
)

_TF_SCHEMA = "doc_id long, token string, tf long, batch_id int"
_DL_SCHEMA = "doc_id long, dl long, batch_id int"


class Bm25IndexWriter:
    """``foreachBatch`` writer maintaining the BM25 index tables.

    Call with ``(batch_df, batch_id)``; ``batch_df`` needs
    ``(id_col, text_col)``. Document ids are assumed unique across
    batches (the CDC/corpus-ingest convention); re-ingesting an id in a
    LATER batch double-counts it — route updates through a replay of
    the original batch id instead.

    ``run_id`` scopes the compaction replay guard exactly as in
    :class:`~cdc_pipeline_spark.streaming.rollup.RollupTableWriter`:
    after :func:`compact_index` folds per-batch partitions into
    ``batch_id=-1``, a replayed (at-least-once) batch whose id the
    marker says is folded is skipped instead of re-creating its
    partition and double-counting postings on merge.
    """

    def __init__(
        self,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        run_id: str = "",
    ) -> None:
        self.path = path
        self.id_col = id_col
        self.text_col = text_col
        self.run_id = run_id

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.select(
            F.col(self.id_col).alias("doc_id"), F.col(self.text_col).alias("text")
        ).localCheckpoint()  # tf and doclens both re-read the batch; cut lineage once
        tf = token_tf(docs).withColumn("batch_id", F.lit(int(batch_id)))
        dls = doc_lengths(docs, tf.drop("batch_id")).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        # per-table lock + guard: a crash between the two folds in
        # compact_index leaves tf folded / doclens not — per-table
        # skipping keeps BOTH consistent under a subsequent replay
        for frame, sub in ((tf, "tf"), (dls, "doclens")):
            table = os.path.join(self.path, sub)
            with _table_lock(table):
                if _replay_folded(table, self.run_id, batch_id):
                    continue
                _write_batch_partition(frame, table)


def compact_index(
    spark: SparkSession, path: str, run_id: str = "", lock_timeout: float = 30.0
) -> tuple[int, int]:
    """Fold both index tables' per-batch partitions into one
    ``batch_id=-1`` partition each, dropping the per-batch dirs —
    thousands of micro-batches otherwise mean thousands of tiny
    parquet partitions under ``tf/`` and ``doclens/``, and every query
    pays the file-listing + small-file scan tax.

    Postings are immutable FACTS (not mergeable aggregates), so the
    fold rewrites rows unchanged — queries read identical data before
    and after (pinned by the golden test). Locking, crash safety
    (tmp-write + rename-aside) and the replay marker are shared with
    ``rollup.compact_partials``; run from the maintenance cadence.
    Returns (tf_rows, doclens_rows) after compaction; a never-written
    table counts 0.
    """
    counts = []
    for sub in ("tf", "doclens"):
        table = os.path.join(path, sub)
        with _table_lock(table, timeout=lock_timeout):
            try:
                partials = spark.read.parquet(table)
            except AnalysisException:  # index never written
                counts.append(0)
                continue
            folded = partials.drop("batch_id").withColumn("batch_id", F.lit(-1))
            counts.append(_swap_compacted(spark, table, partials, folded, run_id))
    return counts[0], counts[1]


def read_index(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """The accumulated ``(tf, doclens)`` tables (explicit schemas — a
    never-started index or an empty-corpus batch leaves file-less
    directories that schema inference cannot read).

    "Unreadable" is NOT always "empty": a compaction that crashed
    between its two renames leaves the complete table at ``<table>.old``
    and nothing at ``<table>`` — treating that as an empty index would
    silently serve zero results forever. Existence is decided by READS
    (the path may be object storage), same principle as the near-dup
    probe: if the table is unreadable but its ``.old`` sibling reads,
    raise so the operator recovers by renaming it back."""

    def _read(sub: str, schema: str) -> DataFrame:
        table = os.path.join(path, sub)
        try:
            return spark.read.schema(schema).parquet(table)
        except AnalysisException:
            try:
                spark.read.schema(schema).parquet(table + ".old").head(1)
            except AnalysisException:
                return spark.createDataFrame([], schema)  # genuinely never written
            raise RuntimeError(
                f"index table {table} is missing but {table}.old exists — a "
                f"compaction crashed mid-swap; rename {table}.old back to recover"
            ) from None

    return _read("tf", _TF_SCHEMA), _read("doclens", _DL_SCHEMA)


def bm25_topk_over_index(
    spark: SparkSession,
    path: str,
    queries: Sequence[tuple[int, tuple[str, ...]]] = BM25_QUERIES,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    broad_candidates: int | None = None,
) -> DataFrame:
    """Rank a term-query batch against the streaming-maintained index —
    corpus stats (df, N, avgdl) are derived from the accumulated state
    at query time, so results always reflect every ingested batch.
    ``broad_candidates`` enables the per-query TakeOrdered heap path for
    broad terms (see ``bm25_topk_from_weights``); the df probe counts
    postings directly on the STORED tf table (one groupBy over a
    broadcast-semi-pruned scan), never by executing the derived weight
    plan a second time."""
    tf, dls = read_index(spark, path)
    tf = tf.drop("batch_id")
    w = bm25_term_weights_from_stats(tf, dls.drop("batch_id"), k1=k1, b=b)
    return bm25_topk_from_weights(
        w, queries, k, broad_candidates=broad_candidates, probe=tf
    )
