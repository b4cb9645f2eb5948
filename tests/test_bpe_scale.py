"""Production-scale BPE surfaces: the broadcast-ranks Arrow tokenizer
and the driver-side heap trainer must be EXACTLY equivalent to the
oracle-checked distributed fold/per-round paths, and must handle merge
counts the fold path cannot (1k+), in time the per-round trainer
cannot (hundreds of rounds in seconds)."""

from __future__ import annotations

import random
import time

import pytest
from pyspark.sql import functions as F

from cdc_pipeline_spark.operators.chunking import (
    FOLD_APPLY_MAX_MERGES,
    bpe_rank_table,
    bpe_train_merges,
    bpe_train_merges_local,
    bpe_vocab_segments,
    bpe_vocab_token_counts,
    merge_pair_expr,
    segment_word,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    from cdc_pipeline_spark.sources.files import load_table

    return load_table(spark, SF_DIR, "documents")


# ---------------------------------------------------------------------------
# trainer equivalence: distributed per-round ≡ driver-side heap
# ---------------------------------------------------------------------------


def test_local_trainer_matches_distributed_bit_for_bit(spark):
    docs = _docs(spark)
    dist = bpe_train_merges(docs, rounds=8)
    local = bpe_train_merges_local(docs, rounds=8)
    assert local == dist  # pairs AND scores, in training order


def test_local_trainer_matches_distributed_on_adversarial_corpus(spark):
    # overlapping-run corpus ("aaa...") exercises the greedy
    # left-to-right non-overlap semantics inside the incremental
    # pair-count deltas; ties exercise the (count DESC, pair ASC) argmax
    rows = [("aaaa bb abab baba",), ("aa aa bb bb ab ba",), ("aaab bbba abba",)]
    df = spark.createDataFrame(rows, "text string")
    dist = bpe_train_merges(df, rounds=6)
    local = bpe_train_merges_local(df, rounds=6)
    assert local == dist


def test_local_trainer_early_stops_like_distributed(spark):
    df = spark.createDataFrame([("a b c",)], "text string")  # no 2+-char word
    assert bpe_train_merges_local(df, rounds=5) == bpe_train_merges(df, rounds=5) == []


def test_local_trainer_vocab_cap_raises(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="max_vocab_rows"):
        bpe_train_merges_local(docs, rounds=1, max_vocab_rows=3)


def test_local_trainer_respects_max_word_chars(spark):
    rows = [("superlongtoken superlongtoken aa aa",)]
    df = spark.createDataFrame(rows, "text string")
    dist = bpe_train_merges(df, rounds=2, max_word_chars=4)
    local = bpe_train_merges_local(df, rounds=2, max_word_chars=4)
    assert local == dist
    assert all(len(a + b) <= 8 for a, b, _ in local)


# ---------------------------------------------------------------------------
# apply equivalence: fold chain ≡ rank-priority segmenter ≡ Arrow path
# ---------------------------------------------------------------------------


def _fold_segments(spark, words, merges):
    syms = F.split(F.col("word"), "")
    for a, b, *_ in merges:
        syms = merge_pair_expr(syms, a, b)
    df = spark.createDataFrame([(w,) for w in words], "word string")
    return {
        r["word"]: r["syms"] for r in df.select("word", syms.alias("syms")).collect()
    }


def test_segment_word_equals_fold_chain_on_trained_table(spark):
    docs = _docs(spark)
    merges = bpe_train_merges(docs, rounds=8)
    vocab = [
        r["word"]
        for r in docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
        .collect()
    ]
    ranks = bpe_rank_table(merges)
    fold = _fold_segments(spark, vocab, merges)
    for w in vocab:
        assert segment_word(w, ranks) == fold[w], w


def test_arrow_vocab_segments_matches_fold_path(spark):
    docs = _docs(spark)
    merges = bpe_train_merges(docs, rounds=8)
    vocab_df = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    arrow = {
        r["word"]: r["syms"] for r in bpe_vocab_segments(vocab_df, merges).collect()
    }
    fold = _fold_segments(spark, list(arrow), merges)
    assert arrow == fold


def test_vocab_token_counts_router_is_path_invariant(spark):
    docs = _docs(spark)
    merges = bpe_train_merges(docs, rounds=8)
    vocab_df = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    jvm = {
        r["word"]: r["n_syms"]
        for r in bpe_vocab_token_counts(vocab_df, merges).collect()
    }
    arrow = {
        r["word"]: r["n_syms"]
        for r in bpe_vocab_token_counts(vocab_df, merges, fold_max_merges=0).collect()
    }
    assert jvm == arrow
    assert len(merges) <= FOLD_APPLY_MAX_MERGES  # oracle config stays JVM-side


def test_segment_word_priority_equals_sequential_application_property():
    # the equivalence claim in segment_word's docstring, checked by brute
    # force: rank-priority application == applying each merge fully in
    # rank order, over random words and random (but causally valid)
    # merge tables built the way training builds them — each merge's
    # output may feed later merges only
    rng = random.Random(7)
    for _ in range(200):
        word = "".join(rng.choice("abc") for _ in range(rng.randint(1, 14)))
        symbols = ["a", "b", "c"]
        merges = []
        for _ in range(rng.randint(1, 10)):
            a, b = rng.choice(symbols), rng.choice(symbols)
            if (a, b) in {(m[0], m[1]) for m in merges}:
                continue
            merges.append((a, b))
            symbols.append(a + b)
        # sequential: one full greedy pass per merge, in rank order
        seq = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        assert segment_word(word, bpe_rank_table(merges)) == seq, (word, merges)


# ---------------------------------------------------------------------------
# scale: merge counts / round counts the oracle-checked paths cannot take
# ---------------------------------------------------------------------------


def _rich_corpus(spark, n_words=3000, seed=11):
    # synthetic vocab rich enough to sustain 1k+ merges (sf0.001's real
    # vocab exhausts earlier); long words over a wide alphabet
    rng = random.Random(seed)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    rows = [
        (" ".join(
            "".join(rng.choice(alpha) for _ in range(rng.randint(6, 16)))
            for _ in range(20)
        ),)
        for _ in range(n_words // 20)
    ]
    return spark.createDataFrame(rows, "text string")


def test_local_trainer_handles_hundreds_of_rounds_fast(spark):
    # the per-round distributed trainer pays one shuffle + one collect
    # per round (~0.5 s each even at sf0.001 → minutes for 256); the
    # heap trainer must do 256 rounds in seconds after the single
    # word-frequency shuffle
    df = _rich_corpus(spark)
    t0 = time.monotonic()
    merges = bpe_train_merges_local(df, rounds=256)
    elapsed = time.monotonic() - t0
    assert len(merges) == 256
    assert elapsed < 30, f"heap trainer took {elapsed:.1f}s for 256 rounds"
    # sanity: merge table is causally valid (every symbol is a char or a
    # previously produced merge output)
    produced = set()
    for a, b, score in merges:
        assert score > 0
        for side in (a, b):
            assert len(side) == 1 or side in produced, (a, b)
        produced.add(a + b)


def test_arrow_tokenizer_handles_1k_merges_fold_path_cannot(spark):
    # 1000 merges: far beyond FOLD_APPLY_MAX_MERGES — a 1000-deep nested
    # aggregate-fold chain is not a compilable Catalyst tree; the router
    # must take the Arrow path and produce a valid segmentation
    df = _rich_corpus(spark, n_words=6000)
    merges = bpe_train_merges_local(df, rounds=1000)
    assert len(merges) == 1000 > FOLD_APPLY_MAX_MERGES
    vocab_df = (
        df.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    counts = bpe_vocab_token_counts(vocab_df, merges).collect()
    assert counts
    ranks = bpe_rank_table(merges)
    sample = {r["word"]: r["n_syms"] for r in counts[:50]}
    for w, n in sample.items():
        assert 1 <= n <= len(w)
        assert len(segment_word(w, ranks)) == n


def test_vocab_token_counts_drops_empty_words_on_both_paths(spark):
    # '' is the one input where F.split and segment_word disagree
    # (1 phantom symbol vs 0); both router paths must drop it so the
    # "identical output either way" contract holds (round-5 review)
    merges = [("a", "b", 2)]
    vocab = spark.createDataFrame([("",), ("ab",), ("ba",)], "word string")
    jvm = {r["word"]: r["n_syms"] for r in bpe_vocab_token_counts(vocab, merges).collect()}
    arrow = {
        r["word"]: r["n_syms"]
        for r in bpe_vocab_token_counts(vocab, merges, fold_max_merges=0).collect()
    }
    assert jvm == arrow == {"ab": 1, "ba": 2}
    segs = {r["word"]: r["syms"] for r in bpe_vocab_segments(vocab, merges).collect()}
    assert segs == {"ab": ["ab"], "ba": ["b", "a"]}


# ---------------------------------------------------------------------------
# WordPiece greedy family (chunking.py::wordpiece_vocab / segment_counts)
# ---------------------------------------------------------------------------


def test_wordpiece_greedy_prefers_longest_match(spark):
    from cdc_pipeline_spark.operators.chunking import wordpiece_segment_counts

    words = spark.createDataFrame([("abcd",), ("abca",), ("zzzz",)], "word string")
    vocab = ["abc", "ab", "a", "b", "c", "d"]
    got = {
        r["word"]: (r["n_pieces"], r["n_unk"])
        for r in wordpiece_segment_counts(words, vocab).collect()
    }
    # abcd -> abc|d (longest-first, not ab|c|d); abca -> abc|a;
    # zzzz -> 4 single-char UNKs
    assert got == {"abcd": (2, 0), "abca": (2, 0), "zzzz": (4, 4)}


def test_wordpiece_vocab_total_order_and_weighting(spark):
    from cdc_pipeline_spark.operators.chunking import wordpiece_vocab

    # "aa" appears twice (freq weight), so pieces of it outweigh "bc"'s
    df = spark.createDataFrame([("aa aa bc",)], "text string")
    rows = wordpiece_vocab(df, vocab_size=10).collect()
    ranked = [(r["piece"], r["weight"], r["rank"]) for r in rows]
    assert ranked[0] == ("a", 4, 1)  # 2 positions x freq 2
    assert ranked[1] == ("aa", 2, 2)
    # ties (weight 1: b, bc, c) break on piece ASC
    assert [p for p, w, _ in ranked if w == 1] == ["b", "bc", "c"]
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_wordpiece_segment_counts_drops_empty_and_handles_empty_vocab(spark):
    from cdc_pipeline_spark.operators.chunking import wordpiece_segment_counts

    words = spark.createDataFrame([("",), ("xy",)], "word string")
    got = {r["word"]: (r["n_pieces"], r["n_unk"]) for r in wordpiece_segment_counts(words, []).collect()}
    assert got == {"xy": (2, 2)}  # every char is UNK under an empty vocab


# ---------------------------------------------------------------------------
# Unigram-LM family (chunking.py::unigram_vocab / unigram_segment_counts)
# ---------------------------------------------------------------------------


def test_unigram_dp_beats_greedy_where_optimal_differs(spark):
    """The DP must find the GLOBALLY optimal split where greedy
    longest-match would not: with vocab {abc, ab, cd}, greedy takes
    abc + UNK(d); the DP takes ab|cd (2 pieces, 0 UNK)."""
    from cdc_pipeline_spark.operators.chunking import unigram_segment_counts

    words = spark.createDataFrame([("abcd",)], "word string")
    weights = {"abc": 5, "ab": 1, "cd": 1}
    got = {
        r["word"]: (r["n_pieces"], r["n_unk"])
        for r in unigram_segment_counts(words, weights).collect()
    }
    assert got == {"abcd": (2, 0)}


def test_unigram_segment_counts_empty_vocab_and_empty_word(spark):
    from cdc_pipeline_spark.operators.chunking import unigram_segment_counts

    words = spark.createDataFrame([("",), ("xy",)], "word string")
    got = {
        r["word"]: (r["n_pieces"], r["n_unk"])
        for r in unigram_segment_counts(words, {}).collect()
    }
    assert got == {"xy": (2, 2)}  # every char is UNK under an empty vocab


def test_unigram_vocab_hard_em_reweights_by_usage(spark):
    """Hard-EM usage, not raw substring counts, ranks the final vocab:
    every substring seeds, but only pieces the Viterbi path actually
    uses survive with weight > 0."""
    from cdc_pipeline_spark.operators.chunking import unigram_vocab

    df = spark.createDataFrame([("aa aa bc",)], "text string")
    rows = unigram_vocab(df, vocab_size=10, seed_size=10).collect()
    ranked = {r["piece"]: (r["weight"], r["rank"]) for r in rows}
    # seed weights: a=4, aa=2, b=bc=c=1. DP segments "aa" as the single
    # piece "aa" (1 piece beats a|a), used twice -> usage 2; "bc" as the
    # single piece "bc" -> usage 1. "a", "b", "c" are never on a path.
    assert ranked == {"aa": (2, 1), "bc": (1, 2)}
    # determinism: ranks are dense from 1
    assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
