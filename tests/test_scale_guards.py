"""Round-4 scale guards: hot-bucket caps on every LSH band self-join,
the size-guarded broadcast hint, and the ADVICE fixes (kcenter
no-replacement, capped-list None keys, alert-state padding, negative-id
sampling, small-file consolidation). These pin the behaviors that keep
the declared 100 TB dedup/enrichment paths linear."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Hot-bucket caps
# ---------------------------------------------------------------------------


def _hot_corpus(spark):
    """A planted hot cluster (40 identical boilerplate docs — every band
    bucket they occupy has 40 members) plus one genuine near-dup pair of
    distinct docs whose buckets stay small."""
    boiler = "terms of service apply to all users of this site always " * 3
    rows = [(i, boiler) for i in range(40)]
    rows.append((100, "quick brown fox jumps over the lazy dog near the river bank today"))
    rows.append((101, "quick brown fox jumps over the lazy dog near the river bank again"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_hot_bucket_cap_bounds_candidates(spark):
    from cdc_pipeline_spark.operators.dedup import minhash_lsh_pairs

    docs = _hot_corpus(spark)
    uncapped = minhash_lsh_pairs(docs, threshold=0.5, verify=False)
    capped = minhash_lsh_pairs(docs, threshold=0.5, verify=False, max_bucket=10)
    n_un, n_cap = uncapped.count(), capped.count()
    assert n_un >= 40 * 39 / 2, "hot cluster must be quadratic uncapped"
    assert n_cap < n_un, "cap must drop hot-bucket candidates"
    survivors = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in survivors, "pairs in small buckets must survive the cap"
    # verified path still works with the cap on
    verified = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs, threshold=0.5, max_bucket=10).collect()}
    assert (100, 101) in verified


def test_simhash_hot_bucket_cap(spark):
    from cdc_pipeline_spark.operators.dedup import simhash_pairs

    docs = _hot_corpus(spark)
    uncapped = simhash_pairs(docs).count()
    capped = simhash_pairs(docs, max_bucket=10).count()
    assert uncapped >= 40 * 39 / 2
    assert capped < uncapped


def test_rp_lsh_hot_bucket_cap(spark):
    from cdc_pipeline_spark.operators.similarity import rp_lsh_neardup_pairs

    # 30 identical vectors = one hot bucket per band; 2 distinct near-dups
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(30)]
    rows += [(100, [0.0, 1.0, 0.05, 0.0]), (101, [0.0, 1.0, 0.06, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uncapped = rp_lsh_neardup_pairs(emb, dim=4, threshold=0.9)
    capped = rp_lsh_neardup_pairs(emb, dim=4, threshold=0.9, max_bucket=10)
    assert uncapped.count() >= 30 * 29 / 2
    survivors = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in survivors
    assert len(survivors) < uncapped.count()


def test_incremental_minhash_cap_keeps_small_bucket_matches(spark):
    from cdc_pipeline_spark.operators.dedup import incremental_minhash_neardup

    boiler = "terms of service apply to all users of this site always " * 3
    rows = [(i, boiler, False) for i in range(30)]
    rows += [
        (100, "quick brown fox jumps over the lazy dog near the river bank today", False),
        (200, boiler, True),
        (201, "quick brown fox jumps over the lazy dog near the river bank again", True),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_new boolean")
    out = incremental_minhash_neardup(df, F.col("is_new"), threshold=0.5, max_bucket=10)
    got = {(r.doc_id, r.match_id) for r in out.collect()}
    assert (201, 100) in got, "small-bucket probe must survive the cap"
    assert not any(d == 200 for d, _ in got), "hot-bucket probes are pruned"


def test_prune_hot_buckets_rejects_bad_cap(spark):
    from cdc_pipeline_spark.operators.dedup import prune_hot_buckets

    posting = spark.createDataFrame([(1, 0, 0)], "doc_id long, band int, bucket long")
    with pytest.raises(ValueError, match="max_bucket"):
        prune_hot_buckets(posting, ["band", "bucket"], 0)


# ---------------------------------------------------------------------------
# Size-guarded broadcast enrichment
# ---------------------------------------------------------------------------


def _join_hints(df) -> str:
    """Optimized logical plan text — carries `strategy=broadcast` join
    hints; the physical plan can't distinguish a pinned hint from an
    auto-broadcast chosen by size stats at toy scale."""
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_broadcast_enrich_small_dim_keeps_hint(spark):
    from cdc_pipeline_spark.operators.enrich import broadcast_enrich

    fact = spark.range(1000).withColumnRenamed("id", "k")
    dim = spark.range(50).withColumnRenamed("id", "k").withColumn("v", F.col("k") * 2)
    out = broadcast_enrich(fact, dim, on=["k"], max_broadcast_rows=1000)
    assert "strategy=broadcast" in _join_hints(out)
    assert out.count() == 1000


def test_broadcast_enrich_oversized_dim_drops_hint(spark):
    from cdc_pipeline_spark.operators.enrich import broadcast_enrich

    fact = spark.range(1000).withColumnRenamed("id", "k")
    dim = spark.range(500).withColumnRenamed("id", "k").withColumn("v", F.col("k") * 2)
    out = broadcast_enrich(fact, dim, on=["k"], max_broadcast_rows=100)
    assert "strategy=broadcast" not in _join_hints(out), "over-budget dim must not pin the hint"
    assert out.count() == 1000  # semantics unchanged, AQE free to choose


def test_broadcast_enrich_default_still_unconditional(spark):
    from cdc_pipeline_spark.operators.enrich import broadcast_enrich

    fact = spark.range(100).withColumnRenamed("id", "k")
    dim = spark.range(10).withColumnRenamed("id", "k")
    assert "strategy=broadcast" in _join_hints(broadcast_enrich(fact, dim, on=["k"]))


# ---------------------------------------------------------------------------
# ADVICE fixes
# ---------------------------------------------------------------------------


def test_kcenter_never_reselects_duplicate_vectors(spark):
    from cdc_pipeline_spark.operators.clustering import kcenter_greedy

    # 2 distinct directions, 4 rows: ids 1..3 duplicate each other.
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 1.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = kcenter_greedy(df, k=4).collect()
    ids = [r.vec_id for r in out]
    assert len(ids) == len(set(ids)), f"selection must be without replacement: {ids}"
    # only 2 distinct vectors exist -> early stop after 2 picks
    assert sorted(ids) == [0, 1]


def test_capped_list_upsert_skips_unkeyed_entries(spark):
    from cdc_pipeline_spark.streaming.sinks import InMemoryKV, capped_list_writer, self_read

    kv = InMemoryKV()
    # a legacy entry without the dedupe key is already in the list
    kv.push_to_list("feed", {"other": 1}, max_len=5)
    writer = capped_list_writer(kv, "feed", max_len=5, order_cols=["w"], dedupe_key="w")
    batch = spark.createDataFrame([(3, "a"), (1, "b"), (None, "c")], "w int, v string")
    writer(batch, 0)  # must not raise on the None / missing keys
    items = self_read(kv, "feed")
    assert [i["w"] for i in items] == [3, 1], "keyed entries newest-first, unkeyed skipped"


def test_alert_state_pads_legacy_two_field_state():
    from cdc_pipeline_spark.streaming.stateful import _unpack_alert_state

    assert _unpack_alert_state((2, "pending")) == (2, "pending", 0)
    assert _unpack_alert_state((2, "pending", None)) == (2, "pending", 0)
    assert _unpack_alert_state((3, "firing", 1700000000)) == (3, "firing", 1700000000)


def test_weighted_priority_sample_handles_negative_ids(spark):
    from cdc_pipeline_spark.operators.sampling import weighted_priority_sample

    df = spark.createDataFrame(
        [(i, 1.0) for i in range(-5, 6)], "doc_id long, weight double"
    )
    out = weighted_priority_sample(df, "doc_id", F.col("weight"), k=11).collect()
    assert len(out) == 11, "negative ids must draw a valid priority, not vanish"
    assert all(r.priority_q is not None for r in out)


def test_write_parquet_consolidates_without_partition_cols(spark, tmp_path):
    from cdc_pipeline_spark.streaming.batch_sink import write_partitioned_parquet

    df = spark.range(1000).repartition(8)
    path = str(tmp_path / "consolidated")
    write_partitioned_parquet(df, path, num_output_files=1)
    files = [f for f in __import__("os").listdir(path) if f.endswith(".parquet")]
    assert len(files) == 1, f"expected one consolidated file, got {files}"
    assert spark.read.parquet(path).count() == 1000
