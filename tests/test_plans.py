"""Physical-plan regression tests: the PLANS.md audit, enforced.

Each assertion pins a scale-critical plan property — filter pushdown into
the parquet scan, broadcast build side for small dims, shuffle count for
the window formulation — so a refactor that silently degrades the plan
(e.g. loses pushdown behind a cast, or flips a broadcast to a sort-merge
shuffle) fails CI instead of surfacing at cluster scale.
"""

from moc_indexer_spark.plans.registry import registry

_SPECS = {s.name: s for s in registry()}


def _plan(spark, sf_dir, name: str) -> str:
    df = _SPECS[name].build(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_tx_list_pushes_filters_into_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tx_list")
    assert "PushedFilters: [" in plan
    # the address equality must reach the parquet reader, not a post-scan Filter
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "user_id" in pushed, f"address filter not pushed: {pushed}"
    # top-k page never globally sorts
    assert "TakeOrderedAndProject" in plan


def test_tx_enrich_money_broadcasts_dim_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tx_enrich_money")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_latest_per_address_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "latest_per_address")
    # one exchange for the window partitioning — no self-join formulation
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_pricing_summary_partial_aggregation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    # map-side combine: partial+final HashAggregate pair around one exchange
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange hashpartitioning") == 1


def test_registered_user_txs_semi_join_no_fact_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "registered_user_txs")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "Exchange hashpartitioning" not in plan


def test_training_corpus_filter_broadcasts_droplists(spark, sf_dir):
    plan = _plan(spark, sf_dir, "training_corpus_filter")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_asof_join_is_union_window_one_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "asof_join_price_at_click")
    # distributed as-of: union + last-value window -> exactly one exchange,
    # never a per-row lookup join
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan
    assert "NestedLoop" not in plan


def test_interval_joins_are_binned_equi_not_nested_loop(spark, sf_dir):
    for name in ("settlement_window_activity", "recent_price_enrichment"):
        plan = _plan(spark, sf_dir, name)
        # the bin key makes the range join an equi hash join; a theta-only
        # formulation would appear as BroadcastNestedLoopJoin
        assert "NestedLoop" not in plan, f"{name} fell back to nested loop"
        assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_customer_returns_topk_plan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "customer_returns_topk")
    # returnflag filter reaches the lineitem scan; dims broadcast; top-k
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_returnflag" in pushed
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_moving_hour_sum_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "moving_hour_sum")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_large_volume_orders_single_fact_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "large_volume_orders")
    # lineitem shuffles once for the groupBy; the HAVING-filtered aggregate
    # (tiny) then broadcasts into both enrichment joins
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("BroadcastHashJoin") == 2


def test_below_avg_qty_decorrelation_broadcasts_aggregate(spark, sf_dir):
    plan = _plan(spark, sf_dir, "below_avg_qty_revenue")
    # the per-partkey aggregate broadcasts back onto the fact scan: the
    # correlated-subquery shape costs lineitem ONE shuffle (its groupBy),
    # never a second one for the join
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_contamination_broadcasts_benchmark_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "benchmark_contamination")
    # the tiny benchmark shingle set must broadcast; the corpus side must
    # not shuffle before the join (its only exchange is the per-doc count)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_returned_order_priority_semi_join_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "returned_order_priority")
    # EXISTS runs as a semi join; both filters reach their parquet scans
    assert "LeftSemi" in plan
    assert "EqualTo(l_returnflag,R)" in plan
    assert "GreaterThanOrEqual(o_orderdate,1996-01-01" in plan


def test_part_supplier_variety_broadcast_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "part_supplier_variety")
    # NOT IN is an anti join; no sort-merge anywhere (both dims broadcast);
    # the distinct agg dedups (brand,type,size,suppkey) BEFORE its shuffle
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_idle_customer_balance_anti_join_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "idle_customer_balance")
    assert "LeftAnti" in plan
    # the NOT-EXISTS probe side is date-pruned at the scan
    assert "GreaterThanOrEqual(o_orderdate,2000-01-01" in plan


def test_repetition_stats_map_only(spark, sf_dir):
    # per-doc stats need no shuffle at all: one scan, zero exchanges
    # (sorted-array run-length fold, not explode+groupBy)
    plan = _plan(spark, sf_dir, "repetition_stats")
    assert plan.count("Scan parquet") == 1
    assert "Exchange" not in plan


def test_sole_blame_supplier_no_expand(spark, sf_dir):
    # Q21 shape: the two-distinct-aggregate formulation would insert an
    # Expand (3x shuffle volume); the pair-grain pre-aggregation must not.
    plan = _plan(spark, sf_dir, "sole_blame_supplier")
    assert "Expand" not in plan
    assert "BroadcastHashJoin" in plan  # supplier-name join stays broadcast


def test_nation_pair_volume_pruned_before_shuffle(spark, sf_dir):
    # Q7 shape: both fact sides must be pruned through broadcast dim joins
    # BEFORE the one lineitem<->orders shuffle join; the nation pair filter
    # must not force extra exchanges.
    plan = _plan(spark, sf_dir, "nation_pair_volume")
    assert plan.count("BroadcastHashJoin") >= 3
    # shuffle exchanges: the l<->o join (2 sides) + final group-by <= 3
    assert plan.count("Exchange hashpartitioning") <= 3


def test_doc_chunking_map_only(spark, sf_dir):
    # chunking is a pure 1->N projection: no exchange anywhere
    plan = _plan(spark, sf_dir, "doc_chunking")
    assert "Exchange" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_source_temperature_sample_broadcasts_stats(spark, sf_dir):
    # the per-source counts and global min must come back as broadcasts;
    # the documents scan itself is never hash-shuffled
    plan = _plan(spark, sf_dir, "source_temperature_sample")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_forecast_revenue_pushdown_and_pruning(spark, sf_dir):
    # Q6 shape: the date/discount/quantity predicates reach the parquet
    # scan and only the needed columns are read
    plan = _plan(spark, sf_dir, "forecast_revenue")
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed
    schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "l_orderkey" not in schema  # pruned: scan reads 4 of 11 columns


def test_constraint_report_bounded_passes(spark, sf_dir):
    # Three column-pruned passes (r11 adjudication of the r10
    # regression): row-local rules as a whole-relation aggregate with NO
    # join, dup_key_rows over exactly the two key columns, orphans via
    # broadcast LEFT ANTI join (duplicate-safe). Nothing may sort-merge,
    # the orphan join must stay broadcast-anti, and the wide r10 fold
    # must not come back: no per-key groupBy may carry the violation
    # sums (the dup-key exchange stays two keys + one count).
    plan = _plan(spark, sf_dir, "constraint_report")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan and "LeftOuter" not in plan
    assert plan.count("lineitem.parquet") == 3
    # dup-key scan reads ONLY the two key columns
    assert "struct<l_orderkey:bigint,l_linenumber:int>" in plan


def test_driver_window_is_all_oracle_gated():
    """The driver's correctness gate reads the first 50 registered queries;
    every one of those slots must carry a DuckDB oracle (a no-oracle entry
    there records an unfixable `err` row) and the registry must stay
    duplicate-free."""
    from moc_indexer_spark.plans.registry import _DRIVER_WINDOW, registry

    specs = registry()
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate registrations"
    assert len(_DRIVER_WINDOW) == 50
    assert names[:50] == _DRIVER_WINDOW
    for s in specs[:50]:
        assert s.oracle, f"driver-window query {s.name} lacks an oracle"
    # no-oracle (rows-only) entries must sit at the very end
    tail_flags = [bool(s.oracle) for s in specs[50:]]
    assert tail_flags == sorted(tail_flags, reverse=True)


def test_bm25_probe_broadcasts_and_prunes(spark, sf_dir):
    plan = _plan(spark, sf_dir, "bm25_topk")
    # query terms + df + stats all broadcast; postings never sort-merge
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # per-query top-k never globally sorts the scored relation
    assert "WindowGroupLimit" in plan or "TakeOrderedAndProject" in plan


def test_dsir_bucket_table_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dsir_importance_weights")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_logreg_gradient_is_single_aggregate_per_step(spark, sf_dir):
    plan = _plan(spark, sf_dir, "logreg_quality_scores")
    # every GD step reduces through partial HashAggregates to ONE row —
    # a feature shuffle would appear as hashpartitioning on doc columns
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row weight cross-joins
    # 3 steps + final scoring: no per-step exchange of the corpus
    assert plan.count("Exchange hashpartitioning") == 0


def test_kmv_two_phase_windows(spark, sf_dir):
    plan = _plan(spark, sf_dir, "kmv_distinct_sketch")
    # phase 1 partitions by (group, salt), phase 2 by group alone —
    # never a single global window over the distinct relation
    assert plan.count("WindowGroupLimit") >= 1 or "Window" in plan
    assert "pmod" in plan or "%" in plan  # the salt is in the plan


def test_weighted_sample_salted_not_global(spark, sf_dir):
    plan = _plan(spark, sf_dir, "weighted_reservoir_sample")
    # the corpus-sized window partitions by salt; only the <=64k
    # candidate relation sees the global single-partition window
    assert "Exchange hashpartitioning" in plan


def test_cms_probe_broadcasts_sketch(spark, sf_dir):
    plan = _plan(spark, sf_dir, "cms_trigram_estimates")
    assert "BroadcastHashJoin" in plan


def test_ivfpq_candidate_side_is_codes_only(spark, sf_dir):
    """The composed IVF+PQ ADC scan must read CODES, not vectors, on the
    candidate side of the cell cogroup — the property that makes the
    scan ~30x lighter than the vector relation at scale. The vector
    column may appear only on the query/probe side and in the re-rank
    joins."""
    plan = _plan(spark, sf_dir, "ivfpq_ann_topk")
    # the FlatMapCoGroups (ADC) input projections: find the cogroup node
    # and check its right (candidate) child carries codes but no raw
    # vector column
    assert "FlatMapCoGroupsInPandas" in plan
    cg = plan.split("FlatMapCoGroupsInPandas", 1)[1]
    header = cg.split("\n", 1)[0]
    assert "codes" in header
    # per-query shortlist merge + final top-k never globally sort
    assert "WindowGroupLimit" in plan or "TakeOrderedAndProject" in plan


def test_ivfpq_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """Persisted-index probes must reach the parquet scan as a cell
    PartitionFilter (only probed cells' directories read)."""
    from moc_indexer_spark.operators.similarity import (
        build_ivfpq_index, ivfpq_probe_topk,
    )
    from moc_indexer_spark.tables import table

    corpus = table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(corpus, path, n_cells=8)
    qrows = corpus.orderBy("vec_id").limit(2).collect()
    got = ivfpq_probe_topk(
        spark, path, [(int(r.vec_id), list(r.embedding)) for r in qrows],
        k=3, n_probe=2,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan


def test_hll_register_relation_broadcasts(spark, sf_dir):
    """The HLL register/estimate relation is m-bounded and must reach
    the exact-count side as a broadcast, never a sort-merge shuffle."""
    plan = _plan(spark, sf_dir, "hll_distinct_certified")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_histogram_quantiles_stats_broadcast(spark, sf_dir):
    """Pass-2 binning joins each row against per-group stats: the stats
    side is group-bounded and must broadcast; the per-(group,bin) count
    must partial-aggregate map-side (the bins-bounded shuffle claim)."""
    plan = _plan(spark, sf_dir, "histogram_quantiles_certified")
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan or "partial count" in plan.lower()


def test_classifier_auc_ranks_distinct_scores_not_rows(spark, sf_dir):
    """The one unavoidable total-order step in exact AUC (ranking IS a
    total order) must run over the distinct-score relation, never the
    row relation: the Window's child chain is Sort <- Exchange
    SinglePartition <- HashAggregate(keys=[s]), so the single partition
    receives |distinct scores| rows. A per-row row_number would be a
    single-partition sort of the whole eval set."""
    plan = _plan(spark, sf_dir, "classifier_auc")
    assert "row_number" not in plan
    iw = plan.index("Window ")
    agg = plan.index("HashAggregate(keys=[s#")
    sp = plan.index("Exchange SinglePartition")
    # tree prints top-down: Window above the single-partition exchange,
    # which sits above the per-score aggregate that shrinks the input
    assert iw < sp < agg


def test_ngram_guarded_stop_list_broadcast_anti(spark, sf_dir):
    """The stop-shingle guard must stay a BROADCAST anti-join (the stop
    list is heavy-hitters only — tiny by construction) and the candidate
    join must stay hash-based: a SortMergeJoin anywhere here would resort
    the whole inverted index."""
    plan = _plan(spark, sf_dir, "ngram_dup_pairs_guarded")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_driver_window_is_50_oracle_gated_slots():
    """The driver evaluates the FIRST 50 registered queries: the curated
    window must be exactly 50 unique names, every one oracle-gated, and
    registry() must surface them first in order."""
    from moc_indexer_spark.plans.registry import _DRIVER_WINDOW, registry

    specs = registry()
    w = _DRIVER_WINDOW
    assert len(w) == len(set(w)) == 50
    assert [s.name for s in specs[:50]] == list(w)
    for s in specs[:50]:
        assert s.oracle, f"{s.name} is rows-only"
