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

  * ``bpe_train_merges`` — full iterative BPE merge training (Sennrich
    et al. 2016, without the end-of-word marker): k rounds of
    (weighted pair count → argmax merge → greedy left-to-right apply)
    over the corpus word-frequency table. Each round is ONE shuffle
    whose rows are map-side-combined distinct pairs; the winning merge
    is a 1-row TakeOrdered collect (driver control state, k rows
    total); the merge APPLICATION is a pure JVM ``aggregate`` fold over
    the symbol arrays — no Python UDF, no per-word driver work. Round
    t re-derives symbols from the base character split through the t
    accumulated merge folds, so no distributed state persists between
    rounds and lineage stays one scan deep.

Everything is JVM built-ins (split/slice/transform/sequence/explode/
aggregate); no Python UDFs anywhere.
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

    Plan shape: narrow (project/explode — no shuffle on an input that
    already has adequate partitions; an under-partitioned source, e.g.
    one small parquet file, gets a one-time repartition via
    ``ensure_parallelism`` so the explode doesn't serialize onto one
    core). The explode multiplies rows by ~n_tokens/stride, so
    downstream consumers should expect the row count, not the byte
    count, to grow: each token lands in ``window/stride`` chunks
    (~1.33× bytes at the 64/48 default).
    """
    from cdc_pipeline_spark.operators.partitioning import ensure_parallelism

    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    # drop the [''] artifact split() yields for empty/whitespace text:
    # an empty document has ZERO chunks (⌈0/stride⌉), not one phantom
    # chunk claiming a token
    toks = F.filter(tokens(text_col), lambda t: t != F.lit(""))
    starts = F.sequence(F.lit(0), F.greatest(F.size("__toks") - 1, F.lit(0)), F.lit(stride))
    return (
        ensure_parallelism(df)
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


def merge_pair_expr(syms, a: str, b: str):
    """Greedy left-to-right non-overlapping merge of adjacent symbol
    pair (a, b) into ``a+b`` — the apply step of one BPE merge round,
    as a pure JVM ``aggregate`` fold (state: emitted prefix + one
    pending symbol; '' is the no-pending sentinel, impossible as a real
    symbol since characters and merges are non-empty).

    Greedy semantics match the classic implementation: "aaa" under
    (a,a) becomes ["aa","a"], and a merged token is not reconsidered as
    the LEFT side within the same round (it is appended to the result,
    never to the pending slot)."""

    def _acc(res, prev):
        return F.struct(res.alias("res"), prev.alias("prev"))

    init = _acc(F.array().cast("array<string>"), F.lit(""))

    def step(acc, s):
        return (
            F.when(acc["prev"] == F.lit(""), _acc(acc["res"], s))
            .when(
                (acc["prev"] == F.lit(a)) & (s == F.lit(b)),
                _acc(F.concat(acc["res"], F.array(F.lit(a + b))), F.lit("")),
            )
            .otherwise(_acc(F.concat(acc["res"], F.array(acc["prev"])), s))
        )

    def fin(acc):
        return F.when(acc["prev"] == F.lit(""), acc["res"]).otherwise(
            F.concat(acc["res"], F.array(acc["prev"]))
        )

    return F.aggregate(syms, init, step, fin)


def bpe_train_merges(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 8,
    max_word_chars: int | None = None,
) -> list[tuple[str, str, int]]:
    """Train ``rounds`` BPE merges over the corpus; returns the ordered
    merge table [(left, right, score)].

    The distributed state is the word-frequency table (one groupBy of
    the token explode — at 100 TB this is the standard vocab-count
    shuffle, map-side combined). Per round: symbols = base character
    split run through the accumulated merge folds (re-derived, so no
    cached distributed state and replay-stable lineage); adjacent pair
    counts weighted by word frequency collapse map-side before ONE
    shuffle; the argmax merge (count DESC, pair ASC — deterministic)
    is a 1-row collect. Stops early when no pair remains. Counts are
    integer sums — exact under any partitioning, which is what lets a
    SQL replay match bit-for-bit.

    ``max_word_chars`` (default off — the oracle-checked semantics)
    drops pathologically long "words" (URLs, base64 blobs) before the
    character split: on web-scale corpora a handful of megabyte tokens
    would otherwise dominate the per-round symbol rows and the fold
    cost while contributing nothing to a useful merge table. At 100 TB,
    set it (the classic tokenizers pre-tokenize such spans away too).
    """
    words = (
        _spread(df)
        .select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if max_word_chars is not None:
        words = words.filter(F.length("word") <= int(max_word_chars))
    words = words.persist()
    try:
        merges: list[tuple[str, str, int]] = []
        for _ in range(rounds):
            syms = F.split(F.col("word"), "")
            for a, b, _score in merges:
                syms = merge_pair_expr(syms, a, b)
            sc = F.col("__syms")
            n = F.size(sc)
            idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
                F.array().cast("array<int>")
            )
            pair = F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(sc, i).alias("a"),
                    F.element_at(sc, i + 1).alias("b"),
                ),
            )
            best = (
                words.withColumn("__syms", syms)
                .select("freq", F.explode(pair).alias("p"))
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.col("cnt").desc(), "a", "b")
                .limit(1)
                .collect()
            )
            if not best:
                break
            r = best[0]
            merges.append((r["a"], r["b"], int(r["cnt"])))
        return merges
    finally:
        words.unpersist()
