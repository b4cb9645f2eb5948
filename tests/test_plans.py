"""Physical-plan shape assertions (SURVEY §4): filters reach the parquet
scan, projections prune columns, dimension joins broadcast, aggregations
are partial+final. These are the properties that decide whether a plan
survives a 100× scale-up — pinned here so a refactor that silently turns
a broadcast join into a sort-merge join or un-pushes a filter fails CI."""

from __future__ import annotations

import pytest

from cdc_pipeline_spark import plans, workload

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    return plans.plan_string(workload.QUERIES[name](spark, SF_DIR))


def test_no_hof_recompute_below_repartition(spark):
    """Regression pin for the inferred-filter trap (fixed twice in this
    repo): no workload dedup/text plan may evaluate a higher-order
    expression in a Filter pushed below its repartition spread point."""
    for name in ["dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash", "doc_winnowing_fingerprints"]:
        offenders = plans.hof_filter_below_repartition(workload.QUERIES[name](spark, SF_DIR))
        assert not offenders, f"{name}: HOF filter below repartition: {offenders}"


def test_q1_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan, "shipdate filter must reach the scan"
    # column pruning: the scan must not read join keys it doesn't need
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    # partial + final hash aggregation around one exchange
    assert plan.count("HashAggregate") >= 2


def test_q5_star_join_is_all_broadcast(spark):
    plan = plan_of(spark, "q5_nation_volume")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "dimension hops must broadcast, not shuffle"
    assert "EqualTo(r_name,ASIA)" in plan, "region filter must push into the dim scan"


def test_enrichment_join_broadcasts(spark):
    plan = plan_of(spark, "customer_region_enrichment")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_kpi_scan_prunes_unused_columns(spark):
    plan = plan_of(spark, "kpi_sliding_window")
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "props" not in read_schema and "event_id" not in read_schema


def test_topk_uses_take_ordered_not_global_sort(spark):
    plan = plan_of(spark, "q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan, "global top-k must be heap-based"


def test_latest_state_single_shuffle_on_key(spark):
    import re

    plan = plan_of(spark, "cdc_latest_state")
    # exactly one exchange (hashpartitioning on the entity key), and the
    # rank-limit pushed map-side (partial WindowGroupLimit before it)
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE)
    assert len(exchanges) == 1, plan
    assert "hashpartitioning(user_id" in plan
    assert "WindowGroupLimit" in plan


def test_q2_min_subquery_decorrelates_to_broadcast(spark):
    plan = plan_of(spark, "q2_min_price_per_type")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "6-row min aggregate must broadcast back"


def test_q4_exists_is_semi_join_with_residual(spark):
    plan = plan_of(spark, "q4_priority_late_orders")
    assert "LeftSemi" in plan, "EXISTS must plan as a semi join"
    # the date filter must reach the orders scan, not sit above the join
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q8_star_join_no_sort_merge(spark):
    plan = plan_of(spark, "q8_nation_market_share")
    assert plan.count("BroadcastHashJoin") >= 5, "all dims must broadcast"
    assert "EqualTo(p_type,PROMO)" in plan, "part filter must push into the dim scan"


def test_window_battery_single_window_exchange(spark):
    """Eight analytic columns over the same (partition, order) must share
    ONE sort + window chain — not one exchange per function."""
    plan = plan_of(spark, "customer_order_window_battery")
    # tree nodes print as "Exchange (n)"; the per-node detail section
    # repeats the name as "(n) Exchange" — count tree nodes only
    assert plan.count("Exchange (") == 1, plan
    assert plan.count("Window (") == 1, plan
    assert plan.count("Sort (") == 1, plan


def test_q21_no_lineitem_self_join(spark):
    """The window-counter formulation must scan lineitem ONCE (the
    textbook EXISTS/NOT-EXISTS pair scans it three times)."""
    plan = plan_of(spark, "q21_sole_late_supplier")
    assert plan.count("lineitem.parquet") == 1, "lineitem must be scanned once"


def test_quality_rules_zero_shuffle(spark):
    """The rule filter is stateless per-row — any Exchange would mean an
    accidental aggregation/sort crept into a scan-parallel operator."""
    plan = plan_of(spark, "doc_quality_rules")
    assert plan.count("Exchange (") == 0, plan


def test_contamination_benchmark_side_broadcasts(spark):
    """The eval-set shingles must broadcast: a sort-merge join here
    would shuffle the full corpus posting list at 100 TB."""
    plan = plan_of(spark, "doc_benchmark_contamination")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_unigram_logprob_vocab_broadcasts(spark):
    plan = plan_of(spark, "doc_unigram_logprob")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_scd2_windows_share_one_exchange(spark):
    """Compression lag + interval lead use the same (key, version)
    ordering — a second Exchange would mean the window specs diverged."""
    plan = plan_of(spark, "cdc_scd2_history")
    assert plan.count("Exchange (") == 1, plan


def test_two_level_lookup_no_window_no_fact_shuffle(spark):
    """The pattern level is expression-compiled: no Window (the old
    longest-match dedup shuffled the whole fact table) and the only
    joins are broadcasts."""
    plan = plan_of(spark, "two_level_region_resolution")
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_unpivot_is_expand_without_shuffle(spark):
    """Wide→long must be a local Expand over the aggregated frame, not a
    join or union-of-scans."""
    plan = plan_of(spark, "lineitem_measures_unpivot")
    assert "Expand" in plan
    # exactly the aggregation's own exchange — unpivot itself adds none
    assert plan.count("Exchange (") == 1, plan


def test_training_pipeline_two_shuffles_total(spark):
    """gate (scan-parallel) → dedup window → packing window: the whole
    three-stage corpus build composes into one plan with exactly two
    Exchanges — materializing between stages would break this."""
    plan = plan_of(spark, "training_corpus_pipeline")
    assert plan.count("Exchange (") == 2, plan
    assert plan.count("Window (") == 2, plan


def _with_confs(spark, confs: dict):
    """Set session confs, returning the previous values for restore."""
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    return old


def _restore_confs(spark, old: dict):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Scale pin: when a selective dim filter feeds a SHUFFLE join (the
    100 TB case where neither side broadcasts), Catalyst's runtime bloom
    filter must be injected on the fact side — the scan then drops
    non-qualifying rows before the shuffle instead of shipping them.
    Broadcast joins get this for free (the hash table IS the filter);
    this pins the non-broadcast path."""
    from cdc_pipeline_spark.sources.files import load_table

    old = _with_confs(spark, {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # testdata scans are far below the 10 GiB production default
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    })
    try:
        orders = load_table(spark, SF_DIR, "orders").filter("o_orderstatus = 'F'")
        lineitem = load_table(spark, SF_DIR, "lineitem")
        joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
    finally:
        _restore_confs(spark, old)


def test_aqe_splits_planted_skew_join(spark):
    """Scale pin: a hot join key (one key holding most rows — the
    salting scenario) must be split by AQE's skew-join handling at
    runtime, so one straggler partition can't serialize the stage. The
    explicit `salted_agg` operator remains the aggregation-side answer;
    this pins Spark's join-side answer."""
    from pyspark.sql import functions as F

    old = _with_confs(spark, {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        # keep AQE from first coalescing the skew away at test scale
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    })
    try:
        # 50k rows on ONE key + 1k spread over 1k keys; right side 2 rows/key
        left = spark.range(51_000).select(
            F.when(F.col("id") < 50_000, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(2_000).select(
            (F.col("id") % 1000).alias("k"), F.col("id").alias("r_val")
        )
        joined = left.join(right, "k")
        # materialize THIS frame's own query execution (count() would
        # spawn a separate one and leave this plan un-finalized)
        joined.collect()
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final
    finally:
        _restore_confs(spark, old)


def test_budgeted_pipeline_three_windows_two_shuffles(spark):
    """gate → dedup window → budget window → packing window: the budget
    and packing windows both partition on the shard, so they share ONE
    Exchange — four stages, two Exchanges total in the plan."""
    plan = plan_of(spark, "training_corpus_budgeted")
    assert plan.count("Window (") == 3, plan
    assert plan.count("Exchange (") == 2, plan


def test_rag_chunking_is_narrow_zero_exchange(spark):
    """Chunking must stay scan → project → generate: any Exchange here
    would shuffle the full corpus text for a per-row transformation."""
    plan = plan_of(spark, "doc_rag_chunks")
    # the spread repartition is the single allowed exchange (single-file
    # local inputs); nothing else may shuffle. Tree nodes print as
    # "Exchange (n)"; the detail section repeats "(n) Exchange".
    assert plan.count("Exchange (") <= 1, plan
    assert "Generate" in plan  # posexplode


def test_pair_merges_partial_agg_and_take_ordered(spark):
    """Pair counting must partially aggregate map-side (the shuffle
    carries distinct pairs, not tokens) and top-k via TakeOrdered."""
    plan = plan_of(spark, "corpus_pair_merges")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2, "need partial+final aggregation"


def test_containment_benchmark_postings_broadcast(spark):
    """The eval-set posting join must broadcast (eval sets are tiny);
    a sort-merge join here would shuffle the whole corpus posting."""
    plan = plan_of(spark, "doc_eval_containment")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_markup_profile_zero_shuffle(spark):
    """Markup profiling is per-row regexp work — any Exchange means a
    corpus-wide shuffle crept into a scan-parallel stage."""
    plan = plan_of(spark, "doc_markup_profile")
    assert plan.count("Exchange (") == 0, plan


def test_weighted_sample_take_ordered_no_shuffle(spark):
    """A-ES weighted sampling must stay a pure projection + heap top-k:
    an Exchange here would mean the corpus is shuffled to draw k rows."""
    plan = plan_of(spark, "docs_token_weighted_sample")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan, plan


def test_histogram_sketch_partial_agg_two_exchanges(spark):
    """The sketch state must collapse map-side BEFORE the shuffle (the
    whole point of a mergeable sketch: the exchange carries bin counts,
    not rows), and both windows + the final rank-walk aggregate reuse
    the group exchange."""
    plan = plan_of(spark, "lineitem_histogram_percentiles")
    assert plan.count("Exchange (") == 2, plan
    assert plan.count("HashAggregate (") == 4, plan
    assert plan.count("Sort (") == 1, plan


def test_ensure_parallelism_no_exchange_on_parallel_input(spark):
    """The round-5 verdict's one perf-weak item: operators must not pay a
    gratuitous full-corpus RoundRobin Exchange when the input already
    arrives well-partitioned (a 100 TB corpus does). Three representative
    operators from the migrated families: an input pre-repartitioned to
    the session parallelism flows through with exactly the ONE roundrobin
    exchange the caller added, while the raw single-file scan (one
    partition) still gets spread — the tiny-input fix keeps working."""
    from cdc_pipeline_spark.operators.dedup import _posting, _shingled
    from cdc_pipeline_spark.operators.multimodal import extract_features
    from cdc_pipeline_spark.operators.similarity import brute_force_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = vecs.limit(3).select("vec_id", "embedding").withColumnRenamed("vec_id", "query_id")
    par = spark.sparkContext.defaultParallelism

    def rr_count(df):
        return plans.plan_string(df).count("RoundRobinPartitioning")

    cases = [
        # ngram_jaccard_pairs now localCheckpoints its posting (three plan
        # references share one tokenize), and a checkpoint truncates the
        # explain output — so the spread contract is inspected on the
        # pre-checkpoint posting sub-plan, which is where _spread applies
        (
            "ngram_jaccard_posting",
            lambda d: _posting(_shingled(d, "doc_id", "text", 3)),
            docs,
            "doc_id",
        ),
        ("brute_force_topk", lambda v: brute_force_topk(v, queries, k=3), vecs, "vec_id"),
        ("extract_features", lambda d: extract_features(d, payload_col="text"), docs, "doc_id"),
    ]
    for name, op, table, key in cases:
        # raw single-file scan: one partition -> the operator must spread it
        assert rr_count(op(table)) >= 1, f"{name}: single-partition input must be spread"
        # well-partitioned input (hash-partitioned, so any RoundRobin in the
        # plan could only come from the operator): pass through untouched
        pre = table.repartition(par, key)
        assert pre.rdd.getNumPartitions() >= par
        assert rr_count(op(pre)) == 0, f"{name}: well-partitioned input must pass through untouched"


def test_zscore_outliers_is_take_ordered_zero_shuffle_scoring(spark):
    """embedding_zscore_outliers: scoring is an in-row expression over
    broadcast moment literals (no Exchange between the scan and the
    ranking) and the top-k is TakeOrderedAndProject, not a global
    Sort."""
    plan = plan_of(spark, "embedding_zscore_outliers")
    assert "TakeOrderedAndProject" in plan
    # no standalone Sort node may appear — TakeOrdered IS the ranking
    # ("Sort (" matches the node line, never the TakeOrdered substring;
    # the previous disjunct form was vacuously true)
    assert "Sort (" not in plan, plan
    # the final query (moments already collected driver-side) must not
    # shuffle the corpus to score it — the only allowed Exchange is the
    # single-file input spread (RoundRobin from ensure_parallelism)
    import re

    # formatted plans list node partitioning in the details section:
    # every Exchange node must be the RoundRobin input spread
    n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    n_roundrobin = plan.count("RoundRobinPartitioning")
    assert n_exchanges == n_roundrobin, plan


def test_source_kl_single_corpus_scan(spark):
    """source_token_kl: the global vocabulary and per-source totals are
    RE-AGGREGATIONS of the (source, token) counts — the documents
    parquet must be scanned exactly once."""
    plan = plan_of(spark, "source_token_kl")
    # the (source, token) count table is localCheckpointed, so the
    # final plan's leaves are the materialized RDD — the corpus parquet
    # appears at most once (at checkpoint time it is not in this plan
    # at all); without the checkpoint this was FIVE full corpus scans
    scans = [l for l in plan.splitlines() if "Scan parquet" in l]
    assert len(scans) <= 1, plan
    if not scans:
        assert "ExistingRDD" in plan, plan


def test_bloom_anti_join_filter_on_build_scan(spark):
    """docs_bloom_incremental: the bloom membership predicate must sit
    on the HISTORY (build) side scan, below the anti join. Uses the
    executed plan's tree string (node lines carry their conditions
    there) — the formatted mode prints conditions only in the details
    section, which always follows the tree and made the first version
    of this assertion vacuous."""
    from cdc_pipeline_spark import workload

    df = workload.QUERIES["docs_bloom_incremental"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_pos = plan.find("LeftAnti")
    forall_pos = plan.find("forall")
    assert join_pos != -1 and forall_pos != -1
    # tree prints top-down: the filter must be DEEPER than the join
    assert forall_pos > join_pos, plan
    # and it guards the build (history) side scan, not the output: no
    # forall may appear ABOVE the join
    assert "forall" not in plan[:join_pos], plan


def test_psl_registered_domain_one_broadcast_join_no_shuffle(spark):
    """registered_domain_psl: ONE BroadcastHashJoin of the host's last
    label against the grouped rule table, prevailing-rule resolution
    in-row — the operator itself must add no Exchange (the registered
    query's rollup adds the only shuffle)."""
    from pyspark.sql import functions as F

    from cdc_pipeline_spark import plans
    from cdc_pipeline_spark.operators.urls import registered_domain_psl
    from cdc_pipeline_spark.sources.files import load_table

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.concat(F.lit("a."), F.col("source"), F.lit(".blogspot.com")).alias("host")
    )
    import re

    plan = plans.plan_string(registered_domain_psl(docs, "host", "domain"))
    # detail-section node lines ("(7) BroadcastHashJoin") count each
    # physical node exactly once; the tree repeats the name
    assert len(re.findall(r"^\(\d+\) BroadcastHashJoin", plan, re.MULTILINE)) == 1, plan
    # shuffle exchanges print as "(n) Exchange"; BroadcastExchange is
    # a different node name and must be the only exchange present
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE)) == 0, plan
    assert "BroadcastExchange" in plan, plan
