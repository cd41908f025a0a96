"""Physical-plan shape assertions: the scale properties SURVEY.md
§"Optimize for scale" promises must be visible in explain output —
filters reaching the parquet scan, column pruning, broadcast joins on
dim tables, whole-stage codegen on the hot path."""

from __future__ import annotations

import contextlib
import io

from aliyun_emapreduce_datasources_spark.operators.catalog import QUERIES


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    plan = plan_of(QUERIES["q6_forecast_revenue"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({col})" in plan or f"GreaterThan({col}" in plan or f"LessThan({col}" in plan, col


def test_q6_column_pruning(spark, sf_dir):
    plan = plan_of(QUERIES["q6_forecast_revenue"](spark, sf_dir))
    read = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "l_extendedprice" in read and "l_discount" in read
    # untouched wide columns must NOT be read
    for col in ("l_returnflag", "l_linestatus", "l_partkey", "l_orderkey"):
        assert col not in read, f"scan reads unused column {col}"


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = plan_of(QUERIES["q3_star_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    plan5 = plan_of(QUERIES["q5_local_supplier"](spark, sf_dir))
    assert plan5.count("BroadcastHashJoin") >= 4, "snowflake dims should broadcast"
    assert "SortMergeJoin" not in plan5 or plan5.count("SortMergeJoin") <= 1


def test_semi_anti_joins_in_plan(spark, sf_dir):
    plan = plan_of(QUERIES["q21_waiting_supplier"](spark, sf_dir), mode="simple")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    """Map-side combine: the shuffle must carry partial aggregates,
    not raw rows (AQE's pre-execution plan hides codegen markers, so
    partial_sum presence is the checkable scale property here)."""
    plan = plan_of(QUERIES["q1_pricing_summary"](spark, sf_dir))
    assert "partial_sum" in plan
    assert plan.index("partial_sum") < plan.index("Exchange") or "HashAggregate" in plan


def test_kv_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(QUERIES["kv_filter_pushdown"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "c_acctbal" in plan[plan.index("PushedFilters") :].splitlines()[0]


def test_text_stats_prunes_to_two_columns(spark, sf_dir):
    plan = plan_of(QUERIES["text_token_stats"](spark, sf_dir))
    read = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "doc_id" in read and "text" in read
    assert "lang" not in read and "source" not in read


def test_range_join_binned_is_equi_join(spark, sf_dir):
    """The binned composition must plan as a hash/sort-merge join on
    the bin key — never the nested-loop a bare range predicate gets."""
    plan = plan_of(QUERIES["range_join_binned"](spark, sf_dir), mode="simple")
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "bin" in plan


def test_asof_join_single_shuffle_window(spark, sf_dir):
    """The as-of composition is union + one window — no join of the
    event table against the orders table at all (and so no pair
    blow-up); exactly one Window operator over user_id."""
    plan = plan_of(QUERIES["asof_join_events"](spark, sf_dir), mode="simple")
    assert plan.count("Window") >= 1
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_runtime_bloom_filter_injects_on_shuffled_fact_join(spark, sf_dir):
    """Runtime bloom-filter join pruning (SPARK-32268): when a fact-fact
    join shuffles (no broadcast) and the build side carries a selective
    filter, Catalyst injects `might_contain(bloom_filter_agg(...))` onto
    the probe-side scan, so most fact rows die before the shuffle. At
    production scale this fires on defaults (probe side > 10 GB scan);
    the thresholds are lowered here only because sf-test inputs are
    tiny. This is the scale path for every selective fact-fact join in
    the catalog (q12/q18/q21 shapes)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
            "o_orderpriority = '1-URGENT'"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_returnflag")
            .count()
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt, "bloom filter not injected"
        assert "bloom_filter_agg" in opt
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_source_overlap_is_join_free(spark, sf_dir):
    """The overlap matrix must be the one-wide-shuffle shape: pair
    expansion happens inside the reduced row — no join operator of any
    kind belongs in this plan."""
    plan = plan_of(QUERIES["dedup_source_overlap"](spark, sf_dir))
    for op in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin", "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert op not in plan, op
    assert "Generate" in plan  # the in-row pair explode


def test_prototype_assignment_has_no_prototype_join(spark, sf_dir):
    """Prototypes ride in the map-pass closure: the arg-min must not
    introduce a join against a centroid table, and since the r11
    optimization round it must also not pay the per-vector row_number
    window — the assignment is one Arrow map pass with NO shuffle
    (the only Exchange allowed is the single-split fixture's
    ensure_parallelism round-robin spread)."""
    plan = plan_of(QUERIES["emb_assign_prototype"](spark, sf_dir))
    for op in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert op not in plan, op
    assert "Window" not in plan  # the shuffle+sort the rewrite removed
    assert "MapInPandas" in plan  # the Arrow arg-min pass


def test_events_funnel_joins_are_hash_equi(spark, sf_dir):
    """Funnel stage joins are equi-joins on user_id — a cartesian or
    nested-loop here would be quadratic in users."""
    plan = plan_of(QUERIES["events_funnel"](spark, sf_dir))
    for op in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert op not in plan, op
    assert "HashAggregate" in plan


def test_rare_bigram_prunes_documents_scan(spark, sf_dir):
    """The quality filter reads only (doc_id, text); the corpus
    frequency aggregate must combine map-side before its shuffle."""
    plan = plan_of(QUERIES["text_rare_bigram_ratio"](spark, sf_dir))
    read = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "doc_id" in read and "text" in read
    for col in ("source", "lang", "n_chars"):
        assert col not in read, f"scan reads unused column {col}"
    assert "partial_count" in plan or "partial_sum" in plan


def test_dup_spans_scans_corpus_once(spark, sf_dir):
    """The duplicated-span flagger must not re-scan documents for a
    join probe — one FileScan, the ≥2-docs test is a window."""
    plan = plan_of(QUERIES["dedup_dup_spans"](spark, sf_dir), mode="simple")
    assert plan.count("FileScan parquet") == 1
    assert "Window" in plan


def test_chunking_is_shuffle_free(spark, sf_dir):
    """chunk_documents (pre-orderBy) must be a narrow expression tree:
    split → sequence → posexplode, zero Exchange."""
    from aliyun_emapreduce_datasources_spark.operators.chunking import chunk_documents

    import re

    df = chunk_documents(spark, sf_dir)
    plan = plan_of(df)
    # exactly the one Exchange the final orderBy needs — nothing from
    # the chunking logic itself
    assert len(re.findall(r"Exchange (?:range|hash|Single)", plan)) <= 1, plan


def test_dsir_stats_join_is_broadcast(spark, sf_dir):
    plan = plan_of(QUERIES["dsir_importance"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_semantic_dedup_single_cluster_shuffle(spark, sf_dir):
    """Per-cluster prune: one hash Exchange on the cluster key feeding
    FlatMapGroupsInPandas (applyInPandas), plus only the final sort."""
    import re

    plan = plan_of(QUERIES["dedup_semantic"](spark, sf_dir), mode="simple")
    assert "FlatMapGroupsInPandas" in plan
    hash_exchanges = re.findall(r"Exchange hashpartitioning", plan)
    assert len(hash_exchanges) == 1, plan


def test_epoch_plan_aggregate_is_partial(spark, sf_dir):
    """mix_epoch_plan: map-side partial aggregation before its one
    shuffle; totals ride a broadcast."""
    plan = plan_of(QUERIES["mix_epoch_plan"](spark, sf_dir))
    assert "HashAggregate" in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_triplets_single_label_shuffle_and_broadcasts(spark, sf_dir):
    """Triplet generation: windows shuffle on label; the sizes/labels
    side tables ride broadcasts; no pair-explosion join appears."""
    plan = plan_of(QUERIES["emb_contrastive_triplets"](spark, sf_dir), mode="simple")
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pseudonymize_join_stays_hash_or_broadcast(spark, sf_dir):
    plan = plan_of(QUERIES["pseudonymize_join"](spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_batch_plan_single_bucket_shuffle(spark, sf_dir):
    """Length-bucketed batch planning: the window and the rollup share
    the bucket partitioning — exactly one hash Exchange plus the final
    sort."""
    import re

    plan = plan_of(QUERIES["batch_plan_length_bucketed"](spark, sf_dir), mode="simple")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_aqe_coalesces_small_shuffle_partitions(spark, sf_dir):
    """The spill/partition-sizing story: with AQE on, a shuffle whose
    configured partition count (64 locally) far exceeds the data
    produces far fewer ACTUAL post-shuffle partitions — the runtime
    right-sizing that replaces hand-tuned spark.sql.shuffle.partitions
    at every scale."""
    df = (
        QUERIES["q1_pricing_summary"](spark, sf_dir)
        .sparkSession.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .count()
    )
    n_conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_actual = df.rdd.getNumPartitions()
    assert n_actual < n_conf, (n_actual, n_conf)


def test_aqe_skew_join_splits_hot_partition(spark, sf_dir):
    """The AQE skew-join remedy (the runtime complement to the manual
    salting in operators/skew.py): a join where one key holds almost
    all rows must show ``skew=true`` on the SortMergeJoin after
    adaptive execution splits the hot partition into parallel
    sub-tasks. Thresholds are lowered so the testdata-sized hot key
    trips the same code path a production hot key would."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.join.preferSortMergeJoin": "true",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # collapse ~98% of rows onto one join key -> one hot partition
        # (synthesized with range: the hot side must dwarf the lowered
        # threshold regardless of testdata scale). The right side is a
        # plain unique-key table: OptimizeSkewedJoin pattern-matches
        # SMJ(Sort(shuffle stage), Sort(shuffle stage)) — an aggregate
        # between shuffle and join would defeat it.
        skewed = spark.range(400_000).select(
            F.when(F.col("id") % 50 != 0, F.lit(1))
            .otherwise(F.col("id"))
            .alias("k"),
            (F.col("id") * 2).alias("v"),
        )
        right = spark.range(400_000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("w")
        )
        joined = skewed.join(right, "k").agg(F.sum("v").alias("s"))
        # drive the Dataset's OWN QueryExecution (a write would spawn a
        # fresh execution and leave this one un-finalized)
        joined.collect()
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:4000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_incremental_dedup_broadcasts_new_side(spark, sf_dir):
    """Cross-snapshot dedup geometry: the incoming batch's postings
    must be the broadcast build side, the base-corpus scan keeps its
    source filter in PushedFilters (never shuffled on shingle keys),
    and the per-new-doc argmax uses WindowGroupLimit (partial top-1
    before the shuffle)."""
    plan = plan_of(QUERIES["dedup_incremental"](spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in plan and "BuildRight" in plan, plan
    assert "Not(EqualTo(source,src19))" in plan, plan
    assert "WindowGroupLimit" in plan, plan
    # the broadcast join must be the ONLY join (no shuffled postings join)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_reservoir_topk_is_take_ordered(spark, sf_dir):
    # A-ES top-k must be TakeOrderedAndProject (per-partition heaps),
    # not a global Sort+Limit, and the scan must not shuffle first
    plan = plan_of(QUERIES["sample_weighted_reservoir"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # explain prints root-first: everything upstream of the top-k (the
    # scan side) appears AFTER it in the text — check that suffix
    upstream = plan[plan.index("TakeOrderedAndProject") :]
    assert "Exchange hashpartitioning" not in upstream


def test_pagerank_iteration_joins_are_hash_or_broadcast(spark, sf_dir):
    # no nested-loop joins anywhere in the unrolled 3-iteration plan;
    # edges come from the in-row basket expansion (Generate), not an
    # |lineitem| x |lineitem| self-join
    plan = plan_of(QUERIES["graph_pagerank"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # the adjacency table is materialized once (lazy persist since r12
    # — CacheManager-managed, was a localCheckpoint): every iteration
    # reads the ONE cached relation, so lineitem is not re-scanned per
    # iteration at execution (each InMemoryTableScan merely PRINTS the
    # cached child plan, so a raw scan-count over the text would lie)
    assert plan.count("InMemoryTableScan") >= 2


def test_boilerplate_set_is_broadcast_anti_join(spark, sf_dir):
    # membership against the (small) boilerplate block set must be a
    # broadcast LeftAnti — the corpus must not shuffle for it
    plan = plan_of(QUERIES["text_boilerplate_scrub"](spark, sf_dir))
    assert "BroadcastHashJoin LeftAnti BuildRight" in plan


def test_trend_fit_single_aggregate_with_partials(spark, sf_dir):
    # closed-form OLS: customer dim broadcast, one partial+final
    # HashAggregate pair on the segment key, no extra shuffles
    plan = plan_of(QUERIES["trend_linear_fit"](spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in plan
    # the only hash shuffle is the segment-key aggregate exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_column_profile_pruned_per_column_aggs(spark, sf_dir):
    # one single-distinct aggregate per column, unioned — NO 6-way
    # Expand (the multi-distinct rewrite's row replication, measured
    # 2.2x slower at sf0.1); each of the 6 scans must prune to at most
    # its own column, so total I/O equals the old single 5-column scan
    plan = plan_of(QUERIES["audit_column_profile"](spark, sf_dir), mode="simple")
    assert "Expand" not in plan
    assert plan.count("FileScan parquet") == 6
    import re
    for m_ in re.finditer(r"FileScan parquet[^\[]*\[([^\]]*)\]", plan):
        read_cols = [c for c in m_.group(1).split(",") if c.strip()]
        assert len(read_cols) <= 1, m_.group(0)


def test_pit_features_single_user_shuffle(spark, sf_dir):
    # both PIT features ride ONE union + user_id window pass — no
    # spine-x-events join of any kind in the plan
    plan = plan_of(QUERIES["feature_matrix_pit"](spark, sf_dir), mode="simple")
    for op in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
               "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert op not in plan, op
    assert "Union" in plan and "Window" in plan


def test_er_blocking_join_is_hash_equi(spark, sf_dir):
    # the blocked self-join must plan hash-equi on the block key, not
    # a nested loop over all part pairs
    plan = plan_of(QUERIES["er_fuzzy_match_parts"](spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_trigram_lm_count_tables_have_partials(spark, sf_dir):
    # every n-gram count table must combine map-side before its shuffle
    plan = plan_of(QUERIES["lm_trigram_backoff"](spark, sf_dir))
    assert "partial_count" in plan or "partial_sum" in plan


def test_keyness_topk_is_window_group_limit(spark, sf_dir):
    # per-source top-k must compile to WindowGroupLimit (per-partition
    # heaps), the corpus grand total must be a broadcast (1-row scalar
    # crossJoin, never a shuffled join), and no nested loops beyond it
    plan = plan_of(QUERIES["text_keyness_lift"](spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row scalar only
    assert "CartesianProduct" not in plan
    # the (source, token) count aggregate combines map-side
    assert "partial_count" in plan


def test_ks_drift_grid_join_shapes(spark, sf_dir):
    # the type list is broadcast onto the value grid; the pertype
    # lookup is a hash-equi left join; cumulative sums run as Window
    # over the aggregate, and raw events reduce with map-side partials
    plan = plan_of(QUERIES["events_ks_drift"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan  # tiny type list cross
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    assert "partial_count" in plan


def test_containment_join_is_hash_equi_on_postings(spark, sf_dir):
    # the candidate join must be hash-equi on (source, shingle-hash) —
    # never a nested loop over doc pairs — and the stop-shingle DF cut
    # plus set sizes must come from Window over the postings, not
    # re-joins of the corpus
    from aliyun_emapreduce_datasources_spark.dedup.containment import (
        containment_pairs,
    )

    # materialize=False: the catalog path eagerly checkpoints (cache
    # release) which would reduce the plan to an RDD scan — the lazy
    # twin exposes the real join/Window shape this test pins
    plan = plan_of(containment_pairs(spark, sf_dir, materialize=False))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" in plan


def test_robust_outliers_reduces_before_windows(spark, sf_dir):
    # events reduce ONCE to the (type, centi-value) grid, materialized
    # via a lazy persist (r12 — CacheManager-managed, was a
    # localCheckpoint) so the three consumer branches (median, MAD,
    # outlier count) all read the one cached relation instead of
    # re-scanning the corpus; med/MAD tables join back broadcast
    plan = plan_of(QUERIES["events_robust_outliers"](spark, sf_dir))
    assert plan.count("InMemoryTableScan") >= 2
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_label_noise_knn_is_blocked_cogroup(spark, sf_dir):
    # exact kNN must run as the block-matrix cogroup (replication via
    # broadcast of the block grid) — never a row-level self-join or
    # cartesian pair materialization; global top-k is a Window over
    # the n·B·K candidate rows
    plan = plan_of(QUERIES["emb_label_noise_knn"](spark, sf_dir))
    assert "FlatMapCoGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # block-grid replication joins
    assert "Window" in plan


def test_embedding_lsh_plan_is_bucket_grouped(spark, sf_dir):
    # the cataloged near-dup headline must be the LSH shape: signature
    # MapInPandas -> one hashpartitioning Exchange into the per-bucket
    # grouped verify -> pair distinct. No all-pairs stage of any kind:
    # no cartesian, no nested-loop, no self-join replication.
    plan = plan_of(QUERIES["dedup_embedding_cosine"](spark, sf_dir))
    assert "MapInPandas" in plan  # matmul signature generation
    assert "FlatMapGroupsInPandas" in plan  # per-bucket BLAS verify
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_quantile_rank_check_broadcasts_quantile_table(spark, sf_dir):
    """doc_length_quantiles_rank_check: the tiny unpivoted quantile
    table must broadcast against the single corpus scan (null-safe
    equality still compiles to a BroadcastHashJoin on the coalesced
    key, never a nested-loop or cartesian plan)."""
    plan = plan_of(QUERIES["doc_length_quantiles_rank_check"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_hll_bound_check_is_two_aggregate_join(spark, sf_dir):
    """distinct_users_hll_bound_check joins two aggregate outputs
    (each |event_type|-sized) — the join must be on the aggregated
    sides, never a re-scan-per-row shape, and stays integer-exact
    (no division in the plan)."""
    plan = plan_of(QUERIES["distinct_users_hll_bound_check"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 4  # partial+final per side
    assert "Join" in plan
    assert "divide" not in plan.lower()


def test_simhash_bits_check_semi_joins_members_before_refingerprint(
    spark, sf_dir
):
    """dedup_simhash_bits_check re-fingerprints ONLY pair members: the
    documents scan must pass through a LeftSemi join before the
    re-derivation mapInPandas — re-hashing the whole corpus would be
    O(corpus) Python work for an O(pairs) check."""
    plan = plan_of(QUERIES["dedup_simhash_bits_check"](spark, sf_dir))
    assert "LeftSemi" in plan
    assert "MapInPandas" in plan


def test_eval_class_scores_broadcast_cross_join(spark, sf_dir):
    """The 10-class probe fan-out must ride a broadcast (classes are
    bytes), never a shuffle of the embedding side — and the confusion
    margins must come from ONE pass (no self-join diamond scanning
    embeddings twice)."""
    plan = plan_of(QUERIES["eval_class_prf"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Scan parquet") + plan.count("FileScan") <= 2  # embeddings once (+ formatted dup section)
    plan_s = plan_of(QUERIES["eval_class_prf"](spark, sf_dir), mode="simple")
    assert plan_s.count("FileScan") == 1, "embeddings must be scanned once"


def test_eval_auc_range_partitioned_prefix(spark, sf_dir):
    """AUC = hash agg per score + a range-partitioned prefix walk: the
    only join is the BROADCAST of the ~210-row bucket-offset table,
    map-side partials on the score agg, and the single-partition
    exchange (the bucket-offset window) sits above aggregates only —
    never above raw score rows."""
    plan = plan_of(QUERIES["eval_auc_binary"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "partial_sum" in plan or "partial_count" in plan
    simple = plan_of(QUERIES["eval_auc_binary"](spark, sf_dir), mode="simple")
    _assert_single_partition_only_above_aggregates(simple)


def _tree_depth(line: str) -> int:
    """Nesting depth of a simple-mode plan line: position of its
    ':-'/'+-' connector (-1 for the root, which has none)."""
    cands = [i for i in (line.find(":-"), line.find("+-")) if i != -1]
    return min(cands) if cands else -1


def _assert_single_partition_only_above_aggregates(plan: str) -> None:
    """Every Exchange SinglePartition (an unpartitioned window's
    shuffle) must have an aggregate BELOW it — i.e. it only ever moves
    a grid/aggregate-sized table to one task, never raw rows. The
    search is scoped to the exchange's OWN subtree (children print
    after the node at strictly greater connector depth) — a
    HashAggregate in a sibling branch of a multi-leg plan must not
    satisfy the guard (round-7 advisor: the old flat string search
    did exactly that)."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        depth = _tree_depth(line)
        subtree = []
        for nxt in lines[i + 1:]:
            if _tree_depth(nxt) <= depth:
                break
            subtree.append(nxt)
        assert any("HashAggregate" in s for s in subtree), (
            "single-partition exchange over non-aggregated (raw-row) input"
        )


def _assert_windows_above_aggregates(plan: str) -> None:
    """EVERY Window must have an aggregate below it IN ITS OWN SUBTREE:
    rank walks run over the count grid, never raw rows. Subtree-scoped
    like _assert_single_partition_only_above_aggregates (the round-7
    advisor's flat-string finding applies equally here: a sibling
    branch's HashAggregate must not vouch for a raw-row window)."""
    lines = plan.splitlines()
    checked = 0
    for i, line in enumerate(lines):
        if "Window" not in line or "WindowGroupLimit" in line:
            continue
        depth = _tree_depth(line)
        subtree = []
        for nxt in lines[i + 1:]:
            if _tree_depth(nxt) <= depth:
                break
            subtree.append(nxt)
        assert any("HashAggregate" in s for s in subtree), (
            "found a Window with no aggregate below it (raw-row rank walk)"
        )
        checked += 1
    assert checked > 0, "plan has no Window — assertion is vacuous"


def test_percentile_family_rank_walks_on_count_grid(spark, sf_dir):
    """Round-7 contract for the exact order-statistics family: every
    rank/percentile window runs over the (key, value) COUNT GRID (an
    aggregate below every window) and any single-partition exchange
    moves grid rows only — the raw-row single-task sort shape is
    forbidden (mirror of test_rolling_wau_joins_deduped_pairs_not_events)."""
    for name in (
        "events_value_percentiles",
        "events_value_percentiles_cont",
        "events_conversion_lag",
    ):
        plan = plan_of(QUERIES[name](spark, sf_dir), mode="simple")
        _assert_windows_above_aggregates(plan)
        _assert_single_partition_only_above_aggregates(plan)


def test_interarrival_bucketed_lag_and_grid_walk(spark, sf_dir):
    """events_interarrival_stats: the adjacent-diff window is
    partitioned by (event_type, hour-bucket) — never a bare
    per-type partitioning whose task holds a type's full history —
    and the gap rank walk runs on the count grid (single-partition
    exchanges above aggregates only)."""
    # materialize=False: the default path checkpoints the lagged rows
    # (they feed three consumers — see test_materialize_once.py), which
    # hides the raw-row window behind an RDD scan; the lazy twin IS the
    # pipeline plan this test pins.
    from aliyun_emapreduce_datasources_spark.operators.events import (
        events_interarrival_stats,
    )

    plan = plan_of(events_interarrival_stats(spark, sf_dir, materialize=False), mode="simple")
    _assert_single_partition_only_above_aggregates(plan)
    assert "bkt" in plan, "hourly bucket column missing from the lag window"
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        if "us#" in spec:  # the raw-row lag window
            assert "bkt" in spec, f"raw-row window not bucket-partitioned: {spec}"


def test_score_deciles_no_global_sort(spark, sf_dir):
    """eval_score_deciles: NTILE's closed form — no unpartitioned
    raw-row window; the only single-partition exchange carries the
    per-score grid, and the per-score row_number is partitioned by s."""
    plan = plan_of(QUERIES["eval_score_deciles"](spark, sf_dir), mode="simple")
    _assert_single_partition_only_above_aggregates(plan)
    assert "ntile" not in plan.lower(), "global NTILE crept back in"


def test_vocab_coverage_broadcasts_k_table(spark, sf_dir):
    """The ×3 k fan-out is a broadcast of the 3-row k table; the
    corpus-sized explode aggregates with map-side partials first."""
    plan = plan_of(QUERIES["text_vocab_coverage"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan


def test_vocab_coverage_rank_is_takeordered_topk(spark, sf_dir):
    """round-7.5: the vocab rank never sorts the full vocabulary — the
    head is a TakeOrderedAndProject (per-partition heaps of depth
    max(k)) and the rank window runs over those <= max(k) rows only."""
    plan = plan_of(QUERIES["text_vocab_coverage"](spark, sf_dir), mode="simple")
    assert "TakeOrderedAndProject" in plan, "top-k head is a full sort"
    wi = plan.find("Window")
    assert wi != -1 and "TakeOrderedAndProject" in plan[wi:], (
        "rank window not above the TakeOrdered head"
    )


def _assert_rank_windows_bucketed_or_grid(plan: str) -> None:
    """round-7.5 contract for the bucketed-rank family: every window
    either carries the `_rb` bucket in its partition spec (the raw-row
    window sorts one bucket slice per task) or sits above an aggregate
    (a grid walk). A window over raw rows partitioned only by a
    low-cardinality stratum (lang / nothing) is forbidden."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "windowspecdefinition" not in line:
            continue
        rest = "\n".join(lines[i + 1 :])
        assert "_rb" in line or "HashAggregate" in rest, (
            f"raw-row rank window without bucket partitioning: {line.strip()[:160]}"
        )


def test_bucketed_rank_family_no_raw_stratum_sorts(spark, sf_dir):
    """pareto_revenue / text_stratified_filter / text_ccnet_buckets:
    the per-stratum exact ranks run via common.bucketed_rank — the
    offsets window moves the occupied-bucket grid only, the raw-row
    window is partitioned by (stratum, _rb), and NTILE never appears
    (closed form in-row). audit_token_gini joins the family with a
    pure grid walk (every window above the (source, x) count grid)."""
    for name in ("pareto_revenue", "text_stratified_filter", "text_ccnet_buckets"):
        plan = plan_of(QUERIES[name](spark, sf_dir), mode="simple")
        assert "_rb" in plan, f"{name}: bucketed rank not in the plan"
        assert "ntile" not in plan.lower(), f"{name}: raw NTILE crept back in"
        _assert_rank_windows_bucketed_or_grid(plan)
        _assert_single_partition_only_above_aggregates(plan)
    gini = plan_of(QUERIES["audit_token_gini"](spark, sf_dir), mode="simple")
    _assert_windows_above_aggregates(gini)
    _assert_single_partition_only_above_aggregates(gini)


def test_round7_new_entries_grid_shapes(spark, sf_dir):
    """The five round-7 additions keep the house plan discipline:
    growth accounting / seasonality / ship-lag run their rank or share
    windows over GRIDS (an aggregate below every window, single-
    partition exchanges above aggregates only — week/cell/day-lag
    grids); ab-lift and prefix-dedup are pure one-aggregate plans (no
    windows, no single-partition exchange at all)."""
    for name in (
        "events_growth_accounting",
        "events_hourly_seasonality",
        "orders_ship_lag_percentiles",
    ):
        plan = plan_of(QUERIES[name](spark, sf_dir), mode="simple")
        _assert_windows_above_aggregates(plan)
        _assert_single_partition_only_above_aggregates(plan)
    for name in ("events_ab_lift", "dedup_exact_prefix"):
        plan = plan_of(QUERIES[name](spark, sf_dir), mode="simple")
        assert "Exchange SinglePartition" not in plan, name
        assert "windowspecdefinition" not in plan, name


def test_win_topk_entries_compile_to_window_group_limit(spark, sf_dir):
    """The rank<=k demo windows stay scale-safe through Catalyst's
    WindowGroupLimit (per-partition partial top-k BEFORE the group
    shuffle) — the reason they need no bucketed_rank rewrite. Pin it
    so a refactor that breaks the limit-pushdown pattern (e.g. filter
    moved behind another projection) is caught."""
    for name in ("win_topk_per_group", "win_rank_suppliers"):
        plan = plan_of(QUERIES[name](spark, sf_dir), mode="simple")
        assert "WindowGroupLimit" in plan, f"{name}: top-k not pushed down"


def test_benford_is_single_scan_no_join(spark, sf_dir):
    plan = plan_of(QUERIES["audit_benford"](spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("FileScan") + plan.count("Scan parquet") >= 1


def test_rolling_wau_joins_deduped_pairs_not_events(spark, sf_dir):
    """The range join's inputs must be the (user, day) pair table and
    the day spine — both post-aggregation — never raw event rows: the
    plan has aggregates BELOW the join."""
    plan = plan_of(QUERIES["events_rolling_wau"](spark, sf_dir), mode="simple")
    ji = plan.index("Join")
    assert "HashAggregate" in plan[ji:], "join inputs must be pre-aggregated"


def test_quality_by_prototype_single_key_join(spark, sf_dir):
    """Cross-family join runs on the primary key with reduced inputs —
    hash or broadcast, never a cartesian."""
    plan = plan_of(QUERIES["emb_quality_by_prototype"](spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in plan
