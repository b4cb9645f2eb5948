"""Document chunking and adjacent-pair statistics for LLM data prep.

Two corpus-scale text operators with no reference counterpart (the
reference processes event streams, not documents — nearest concern is
its text passthrough in src/streaming/transforms/activity_enricher.py):

  * ``chunk_documents`` — RAG-style overlapping token-window chunking:
    every document becomes ⌈n/stride⌉ chunks of ``window`` tokens with
    ``window − stride`` tokens of overlap, the standard retrieval-corpus
    prep (and the context-window split used before embedding). Pure
    narrow plan: scan → project → explode. No shuffle at any scale —
    a 100 TB corpus chunks at scan speed, partition by partition.
  * ``adjacent_pair_counts`` — corpus-wide adjacent token-pair
    frequencies (the scoring pass of one BPE merge round, and the
    collocation statistic behind phrase detection à la word2vec's
    phrase pass). One explode + one hash groupBy (map-side partial
    aggregation does the heavy lifting — pair counts collapse before
    the shuffle) + a TakeOrdered top-k: no global sort.

Everything is JVM built-ins (split/slice/transform/sequence/explode);
no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_pipeline_spark.operators.partitioning import spread as _spread
from cdc_pipeline_spark.operators.text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into overlapping token-window chunks.

    Chunk ``i`` covers tokens ``[i·stride, i·stride + window)``; the
    last chunk is short rather than padded. Output one row per chunk:
    (doc_id, chunk_id, n_tokens, chunk_text). Deterministic and
    rerun-stable — chunk identity is a pure function of the text.

    ``stride ≤ window`` (the RAG default) covers every token, adjacent
    chunks overlapping by ``window − stride``. ``stride > window`` is
    the sparse-sampling mode — strided windows with gaps between them
    (the text analogue of video frame sampling).

    Plan shape: narrow (no shuffle). The explode multiplies rows by
    ~n_tokens/stride, so downstream consumers should expect the row
    count, not the byte count, to grow: each token lands in
    ``window/stride`` chunks (~1.33× bytes at the 64/48 default).
    """
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    # drop the [''] artifact split() yields for empty/whitespace text:
    # an empty document has ZERO chunks (⌈0/stride⌉), not one phantom
    # chunk claiming a token
    toks = F.filter(tokens(text_col), lambda t: t != F.lit(""))
    starts = F.sequence(F.lit(0), F.greatest(F.size("__toks") - 1, F.lit(0)), F.lit(stride))
    return (
        _spread(df)
        .select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
        .filter(F.size("__toks") > 0)
        .select("doc_id", "__toks", F.size("__toks").alias("__n"), F.posexplode(starts))
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("chunk_id"),
            F.least(F.lit(window), F.col("__n") - F.col("col")).cast("long").alias("n_tokens"),
            F.concat_ws(" ", F.slice(F.col("__toks"), F.col("col") + 1, window)).alias(
                "chunk_text"
            ),
        )
    )


def adjacent_pair_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 30,
) -> DataFrame:
    """Top-``k`` adjacent token pairs by corpus frequency — the
    candidate-scoring half of a BPE merge step / collocation mining.

    All occurrences count (not per-doc distinct): BPE merge priority is
    total frequency. Ties break on the pair string so the top-k set is
    deterministic. Returns (pair, n_docs, n_occurrences) ordered by
    (n_occurrences DESC, pair ASC).

    Scale: the explode emits one row per token, but map-side partial
    aggregation collapses to distinct-pairs-per-partition before the
    single shuffle; the final top-k is a TakeOrdered (no global sort).
    """
    from cdc_pipeline_spark.operators.text import adjacent_grams

    toks = tokens(text_col)
    pairs = adjacent_grams(F.col("__toks"))
    posting = (
        _spread(df)
        .select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
        .select("doc_id", F.explode_outer(pairs).alias("pair"))
        .filter(F.col("pair").isNotNull())
    )
    counts = posting.groupBy("pair").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )
    return counts.orderBy(F.col("n_occurrences").desc(), F.col("pair").asc()).limit(k)
