"""Physical-plan quality gates (the 100 TB design point, SURVEY.md §4).

Correctness tests prove the small-SF answer; these prove the *plan* is the
one that survives a 1000-executor scale-up: filters reach the parquet scan,
small dims broadcast instead of shuffling the fact side, aggregates combine
map-side, top-k never globally sorts, and nothing collapses to a single
partition the way the reference's Window.orderBy(lit(1)) does
(/root/reference/code/spark-jobs/raw_to_landing_sparkjob.py:85-86).
"""

from __future__ import annotations

import re

import pytest

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES


def plan_of(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_push_to_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_csv_scan")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "GreaterThan(l_quantity" in m.group(1)
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    # 5 projected source columns only — not lineitem's full 16-column schema
    assert m and m.group(1).count(":") == 5, m.group(1)


def test_small_dim_join_broadcasts(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_join_broadcast")
    assert "BroadcastHashJoin" in plan
    # the fact side must not shuffle for the join (only the agg exchanges)
    assert "hashpartitioning(l_partkey" not in plan


def test_aggregate_is_partial_then_final(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_groupby_agg")
    assert "partial_sum" in plan  # map-side combine before the exchange
    # fixed-point interior: sums run on longs (vectorized fast path), not
    # on >18-digit decimals that fall off whole-stage codegen
    assert "as bigint))" in plan and "partial_sum(cast(round(" in plan


def test_topk_avoids_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_topk")
    assert "TakeOrderedAndProject" in plan


def test_no_single_partition_exchange(spark, sf_dir):
    """No query may funnel all rows through one partition (the reference's
    skip-rows pessimization). Global-sort range exchanges and broadcast
    exchanges are fine; SinglePartition exchanges are not."""
    for name in [
        "q_skip_rows",
        "q_groupby_agg",
        "q_window_rank",
        "q_window_cumsum",
        "q_dedup_keep_latest",
        "q_join_inner",
    ]:
        plan = plan_of(spark, sf_dir, name)
        assert "Exchange SinglePartition" not in plan, name


def test_windows_shuffle_once_by_partition_key(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_window_cumsum")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "hashpartitioning(l_suppkey" in plan


def test_semi_anti_do_not_materialize_right_columns(spark, sf_dir):
    for name, kind in [("q_join_semi", "LeftSemi"), ("q_join_anti", "LeftAnti")]:
        plan = plan_of(spark, sf_dir, name)
        assert kind in plan, name


def test_similarity_broadcasts_query_vector(spark, sf_dir):
    """Brute-force cosine top-k: the query vector is inlined as a literal —
    no join, no shuffle of the corpus side at all — and the result is a
    streaming top-k, not a global sort."""
    plan = plan_of(spark, sf_dir, "q_cosine_topk")
    assert "Join" not in plan and "Exchange" not in plan
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize("name", ["q_events_tumbling", "q_pivot"])
def test_event_and_pivot_aggregates_partial(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "partial_" in plan


def test_tpch_q5_broadcasts_dims_and_pushes_dates(spark, sf_dir):
    """Snowflake join: every dim side broadcasts (no fact shuffle before
    the agg) and the order-date band reaches the parquet scan."""
    plan = plan_of(spark, sf_dir, "q_sql_tpch_q5")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "Exchange SinglePartition" not in plan


def test_tpch_q6_pushes_all_band_predicates(spark, sf_dir):
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = plan_of(spark, sf_dir, "q_sql_tpch_q6")
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    m = re.search(r"PushedFilters: \[(.*?)\], ReadSchema", plan)
    pushed = m.group(1) if m else ""
    for frag in [
        "GreaterThanOrEqual(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24",
    ]:
        assert frag in pushed, (frag, pushed)
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    # scan reads only the 4 referenced columns, not all 11
    assert m and m.group(1).count(":") == 4, m.group(1)


def test_tpch_q18_no_single_partition_funnel(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_sql_tpch_q18")
    assert "Exchange SinglePartition" not in plan


def test_chunking_is_exchange_free(spark, sf_dir):
    """The 1→N expansion must stay embarrassingly parallel — any exchange
    here would shuffle the full token payload at 100 TB."""
    plan = plan_of(spark, sf_dir, "q_chunk_docs")
    assert "Exchange" not in plan


def test_tfidf_single_pass_over_text(spark, sf_dir):
    """TF-IDF may scan `documents.text` once: document frequency is derived
    from the TF frame, not a second explode of the raw text. Round 9:
    q_tfidf checkpoints the tf frame (the tokenize explode then lives in
    the checkpointed subtree — 0 Generate nodes in the outer plan), so the
    single-pass property is asserted on the operator's un-checkpointed
    form and the key's plan is bounded at <= 1."""
    from fortune_500_financial_insights_pipeline_spark.operators.tfidf import tfidf
    from fortune_500_financial_insights_pipeline_spark.queries._core import load_table

    d = load_table(spark, sf_dir, "documents")
    plan = (
        tfidf(d, top_k=3)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Generate explode") == 1
    assert plan_of(spark, sf_dir, "q_tfidf").count("Generate explode") <= 1


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """A selective dim filter injects a runtime bloom filter on the fact
    side's join key (semi-join reduction before the shuffle). Local data
    sits under the 10 GiB application-side default threshold, so the test
    lowers it to zero — at the 100 TB design point the defaults fire on
    their own."""
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            "o_orderpriority = '1-URGENT'"
        )
        plan = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "bloom_filter_agg" in plan and "might_contain" in plan, plan[:1500]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_zorder_layout_skips_files_on_second_dimension(spark, sf_dir, tmp_path):
    """Data skipping proof via parquet footer stats: with a linear sort on
    quantity, a price-only filter cannot prune any file (every file spans
    the full price range); the z-ordered layout gives each file a tight
    envelope on BOTH dims, so the same filter skips most files."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.zorder import zorder_write

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    linear = str(tmp_path / "linear")
    zpath = str(tmp_path / "zorder")
    (
        li.repartitionByRange(64, F.col("l_quantity"))
        .sortWithinPartitions("l_quantity")
        .write.mode("overwrite").parquet(linear)
    )
    zorder_write(li, zpath, ["l_quantity", "l_extendedprice"], n_files=64)

    lo, hi = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).head()
    band_lo = lo + 0.45 * (hi - lo)
    band_hi = lo + 0.55 * (hi - lo)

    def files_touched(path: str) -> tuple[int, int]:
        import glob
        touched = total = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            fmin, fmax = None, None
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.row_group(rg).num_columns)
                    if md.row_group(rg).column(i).path_in_schema
                    == "l_extendedprice"
                )
                s = col.statistics
                fmin = s.min if fmin is None else min(fmin, s.min)
                fmax = s.max if fmax is None else max(fmax, s.max)
            total += 1
            if not (fmax < band_lo or fmin > band_hi):
                touched += 1
        return touched, total

    lin_touched, lin_total = files_touched(linear)
    z_touched, z_total = files_touched(zpath)
    assert lin_total >= 32 and z_total >= 32
    assert lin_touched == lin_total  # linear layout: zero pruning on price
    assert z_touched < z_total // 2, (z_touched, z_total)  # z-order: >50% skipped

    # the layouts hold identical data
    a = spark.read.parquet(linear).count()
    b = spark.read.parquet(zpath).count()
    assert a == b == li.count()


def test_packing_shuffles_once_on_bucket(spark, sf_dir):
    """Both packing modes move data exactly once, on the bucket key —
    never through a single partition. The greedy mode's Python stage is
    fed by the same one exchange (FlatMapGroupsInPandas over bucket)."""
    for name in ["q_pack_offsets", "q_pack_greedy"]:
        plan = plan_of(spark, sf_dir, name)
        assert "Exchange SinglePartition" not in plan, name
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, name
        assert "hashpartitioning(bucket" in plan, name


def test_quality_gate_threshold_is_broadcast(spark, sf_dir):
    """The percentile threshold joins as a broadcast nested loop over a
    1-row aggregate — the document side is never shuffled for the join."""
    plan = plan_of(spark, sf_dir, "q_quality_gate")
    assert "BroadcastNestedLoopJoin" in plan
    # the 1-row aggregate side necessarily funnels to one partition; the
    # document side must reach the join without any hash exchange
    assert "Exchange hashpartitioning" not in plan


def test_join_strategy_hints_are_honored(spark, sf_dir):
    """The SQL surface exposes Spark's join-strategy hints: the same
    logical join flips physical strategy on demand — BROADCAST forces a
    broadcast-hash, SHUFFLE_HASH forbids it, MERGE forces sort-merge.
    At 100 TB these hints are the manual override when statistics mislead
    AQE (e.g. a 'small' side that explodes after a filter)."""
    from fortune_500_financial_insights_pipeline_spark.catalog import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("o_hint")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("c_hint")
    base = "SELECT /*+ {h} */ o_orderkey FROM o_hint JOIN c_hint ON o_custkey = c_custkey"

    def physical(hint):
        return (
            spark.sql(base.format(h=hint))
            ._jdf.queryExecution().executedPlan().toString()
        )

    assert "BroadcastHashJoin" in physical("BROADCAST(c_hint)")
    shuffled = physical("SHUFFLE_HASH(c_hint)")
    assert "ShuffledHashJoin" in shuffled and "BroadcastHashJoin" not in shuffled
    merged = physical("MERGE(c_hint)")
    assert "SortMergeJoin" in merged and "BroadcastHashJoin" not in merged


def test_full_outer_pre_aggregates_before_join(spark, sf_dir):
    """q_join_full: the orders side must collapse to one row per customer
    BEFORE the full-outer join (partial agg map-side), and the customer
    balance filter must reach its scan — at 100 TB the join then shuffles
    |customers| rows, not |orders|."""
    plan = plan_of(spark, sf_dir, "q_join_full")
    assert "FullOuter" in plan
    assert "partial_count" in plan or "partial_sum" in plan
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThan\(c_acctbal", plan), plan


def test_ohlc_resample_aggregates_partial(spark, sf_dir):
    """q_ohlc_resample: min_by/max_by/extrema all combine map-side, so the
    one exchange carries a row per (series, day) bar, not per tick. The
    struct ordering key forces SortAggregate (structs aren't mutable-buffer
    types), but its sorts are partition-local (global=false) — no
    single-partition funnel, unlike a window-function formulation which
    would shuffle and sort the full tick stream."""
    plan = plan_of(spark, sf_dir, "q_ohlc_resample")
    assert "partial_min_by" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    import re as _re

    for m in _re.finditer(r"Sort \[[^\]]*\], (\w+),", plan):
        assert m.group(1) == "false", "global sort in OHLC plan"


def test_interval_join_avoids_nested_loop(spark, sf_dir):
    """q_interval_join: the theta band between two fact-sized inputs must
    run as an equi-join on (user_id, bin) — BroadcastNestedLoopJoin or a
    cartesian here is O(|L|*|R|) and would be the 100 TB killer."""
    plan = plan_of(spark, sf_dir, "q_interval_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan), plan


def test_grouped_topk_limits_before_shuffle(spark, sf_dir):
    """q_window_rank (rank ≤ 3 per customer): Catalyst must insert a
    Partial WindowGroupLimit below the exchange — each map task forwards at
    most 3 rows per group, so the shuffle carries top-k candidates, not the
    whole orders table. Breaking the rank-filter pattern (e.g. filtering on
    a derived column) silently loses this."""
    plan = plan_of(spark, sf_dir, "q_window_rank")
    assert re.search(r"WindowGroupLimit .*row_number\(\), 3, Partial", plan), plan


def test_simhash_pairs_joins_on_bands_not_cartesian(spark, sf_dir):
    """q_simhash_pairs: candidate generation must stay bucketed — an O(n²)
    signature cross-compare would defeat the banding entirely. Since round
    2 the bucket grouping is a hash AGGREGATE on (band, bval) with
    within-bucket pair expansion (bucket_pairs) rather than a self-join:
    zero join nodes, and the signature subtree computes once instead of
    twice."""
    plan = plan_of(spark, sf_dir, "q_simhash_pairs")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Join" not in plan  # bucket_pairs replaced the bucket self-join
    assert re.search(r"HashAggregate.*\bband\b", plan, re.S), plan[:2000]


def test_semdedup_pairs_join_on_cell_not_cartesian(spark, sf_dir):
    """q_semdedup: the within-cell pair enumeration must be an equi-join on
    ``cell`` — an all-pairs cosine compare (CartesianProduct /
    BroadcastNestedLoopJoin) is the O(n²) shape SemDeDup's clustering
    exists to avoid. (Unlike simhash's scalar signatures, the payload here
    is the embedding array, so a shuffled join beats collect_list-based
    bucket expansion: no cell-sized vector lists buffered per task.)"""
    plan = plan_of(spark, sf_dir, "q_semdedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin).*cell", plan), plan[:3000]


def test_skyline_no_selfjoin_and_frontier_broadcasts(spark, sf_dir):
    """The skyline must plan as agg + window + broadcast join back — never
    the O(n²) dominance self-join (no nested-loop/cartesian anywhere), and
    the anti-chain frontier side must broadcast, not shuffle the base."""
    plan = plan_of(spark, sf_dir, "q_skyline")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_bloom_probe_broadcasts_filter_side(spark, sf_dir):
    """The Bloom relation is kilobytes by construction; the probe join must
    broadcast it — the probe table never shuffles for the membership test."""
    plan = plan_of(spark, sf_dir, "q_bloom_semijoin")
    # probe join: filter side built (broadcast), probe side streamed — the
    # build side's own m/32-row aggregation may exchange (it's kilobytes);
    # what must NOT happen is a sort-merge/shuffle join of the probe table
    assert "BroadcastHashJoin" in plan and "BuildRight" in plan
    assert "SortMergeJoin" not in plan


def test_weighted_sample_is_takeordered(spark, sf_dir):
    """Top-n by sampling key must plan as TakeOrderedAndProject (map-side
    partial top-n, driver holds n rows) — not a global sort."""
    plan = plan_of(spark, sf_dir, "q_weighted_sample")
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_kmv_sketch_caps_rank_before_shuffle(spark, sf_dir):
    """The bottom-k rank must run as a WindowGroupLimit partial before the
    exchange so each input partition ships at most k rows per group —
    the property that keeps the sketch build O(k) per group at 100 TB."""
    plan = plan_of(spark, sf_dir, "q_kmv_distinct")
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_weighted_sample_grouped_limits_before_shuffle(spark, sf_dir):
    """The per-group quota rank must cap map-side (WindowGroupLimit
    Partial) so each partition ships at most n rows per group — the skew
    guard that keeps a giant source from flooding the exchange."""
    plan = plan_of(spark, sf_dir, "q_weighted_sample_grouped")
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_parquet_aggregate_pushdown_reads_footers_only(spark, sf_dir):
    """COUNT/MIN/MAX with no filter can be answered from parquet FOOTER
    statistics — at 100 TB that's a metadata-only scan instead of reading
    every page. Requires the v2 parquet source + aggregatePushdown; both
    set per-query here, restored after."""
    import pyspark.sql.functions as F

    prev_push = spark.conf.get("spark.sql.parquet.aggregatePushdown", "false")
    prev_v1 = spark.conf.get("spark.sql.sources.useV1SourceList", None)
    try:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        df = spark.read.parquet(f"{sf_dir}/orders.parquet").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation: [COUNT(*), MIN(o_totalprice), MAX(o_totalprice)]" in plan
        row = df.head()
        assert row["n"] > 0 and row["lo"] <= row["hi"]
    finally:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", prev_push)
        if prev_v1 is None:
            spark.conf.unset("spark.sql.sources.useV1SourceList")
        else:
            spark.conf.set("spark.sql.sources.useV1SourceList", prev_v1)


def test_phrase_search_probes_broadcast_terms(spark, sf_dir):
    """The positional-postings probe must broadcast the tiny phrase-term
    list (inverted-index contract: corpus postings never shuffle for the
    join) and plan no cartesian product."""
    plan = plan_of(spark, sf_dir, "q_phrase_search")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # occurrence agg combines map-side before its exchange
    assert "partial_" in plan


def test_rrf_fusion_legs_stay_bounded(spark, sf_dir):
    """Fusion joins two top-k lists: the corpus-sized work sits in the legs
    (broadcast probe / broadcast query batch), every per-query top-k cut
    runs as a WindowGroupLimit partial (per-partition heaps, never a full
    sort of the leg), and no WINDOW runs with an empty partition spec (the
    single-partition funnel; the BM25 corpus constants do plan a scalar
    SinglePartition final over per-partition partials, which carries one
    row per partition and is scale-fine)."""
    plan = plan_of(spark, sf_dir, "q_rrf_fusion")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "WindowGroupLimit" in plan and ", Partial" in plan
    assert not re.search(r"windowspecdefinition\((rrf|total_score|sim)#", plan), (
        "rank window lost its query_id partition key"
    )


def test_round2m_ops_avoid_cartesian(spark, sf_dir):
    """Candidate generation in the new pair-producing operators must ride
    equi-joins (SN blocking, FIFO key join, covariance day join, BFS/walk
    vertex joins) — a CartesianProduct or BroadcastNestedLoopJoin in any
    of these is the all-pairs plan that dies at scale."""
    for name in [
        "q_sorted_neighborhood",
        "q_fifo_pnl",
        "q_cov_matrix",
        "q_shortest_path",
        "q_random_walk",
        "q_mann_kendall",
    ]:
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_hhi_and_vwap_partial_aggregate(spark, sf_dir):
    """The per-key revenue folds must combine map-side: the shuffle carries
    one row per (nation, supplier) / supplier, not per lineitem."""
    for name in ["q_hhi", "q_vwap"]:
        plan = plan_of(spark, sf_dir, name)
        assert "partial_sum" in plan, name


def test_auc_and_ks_shuffle_bounded_by_distinct_values(spark, sf_dir):
    """The rank/ECDF windows must consume the per-distinct-value aggregate,
    not raw rows: a partial aggregate runs before any window exchange."""
    for name in ["q_auc", "q_ks_test"]:
        plan = plan_of(spark, sf_dir, name)
        assert "partial_" in plan, name
        # window input comes from the per-distinct-value aggregate — a
        # HashAggregate sits BELOW the Window in the tree (plan prints
        # top-down, so the deepest aggregate appears after the Window)
        assert plan.rindex("HashAggregate") > plan.index("Window"), name


def test_scd2_lookup_is_keyed_join(spark, sf_dir):
    """The temporal lookup must join on the user key (episode containment
    applied as a post-filter on the keyed join), never range-join raw."""
    plan = plan_of(spark, sf_dir, "q_scd2_lookup")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_quantile_sketch_caps_rank_before_shuffle(spark, sf_dir):
    """Bottom-k value sample: the <=k rank filter must plan as a partial
    WindowGroupLimit so every map task forwards at most k rows per group."""
    plan = plan_of(spark, sf_dir, "q_quantile_sketch")
    assert re.search(r"WindowGroupLimit .*row_number\(\), 64, Partial", plan), plan


def test_item_cooccurrence_meets_on_order_key(spark, sf_dir):
    """Co-occurrence pairs must meet in an equi-join on the order key —
    never a part×part comparison — and the top-3 cut must cap map-side."""
    plan = plan_of(spark, sf_dir, "q_item_cooccurrence")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"WindowGroupLimit .*row_number\(\), 3, Partial", plan), plan


def test_mmr_joins_stay_equi(spark, sf_dir):
    """Every unrolled MMR step is an (anti/equi) join on the query key —
    an all-pairs comparison would show up as a nested-loop operator."""
    plan = plan_of(spark, sf_dir, "q_mmr_rerank")
    assert "CartesianProduct" not in plan


def test_bootstrap_resample_relation_broadcasts(spark, sf_dir):
    """The B=32 resample-id relation must broadcast onto the fact scan
    (tiny side), never shuffle orders B ways."""
    plan = plan_of(spark, sf_dir, "q_bootstrap_ci")
    assert "BroadcastNestedLoopJoin" in plan  # broadcast cross of the 32-row side
    assert "hashpartitioning(o_orderkey" not in plan
    # subsample means combine map-side before the (group x B) shuffle
    assert "partial_sum" in plan


def test_tail_index_caps_rank_before_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_tail_index")
    assert re.search(r"WindowGroupLimit .*row_number\(\), 51, Partial", plan), plan


def test_topk_stability_caps_variant_ranks(spark, sf_dir):
    """All ten leave-one-fold-out rankings must cap map-side."""
    plan = plan_of(spark, sf_dir, "q_topk_stability")
    assert re.search(r"WindowGroupLimit .*row_number\(\), 20, Partial", plan), plan


def test_naive_bayes_scoring_broadcasts_language_stats(spark, sf_dir):
    """The per-language floor/prior relations must broadcast onto the
    token stream — the corpus never shuffles by language."""
    plan = plan_of(spark, sf_dir, "q_naive_bayes")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_adamic_adar_no_cartesian(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_adamic_adar")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-20 never global-sorts


def test_star_cc_round_count_is_logarithmic(spark):
    """SCALE.md round-4 gate: large-star/small-star must converge on a
    2048-node chain (diameter 2047) in O(log n) rounds — propagation
    would need ~2047. A regression to linear rounds makes the 100 TB
    unknown-topology path unusable."""
    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.operators.graph import (
        connected_components_star,
    )

    chain = spark.range(2048).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    stats: dict = {}
    out = connected_components_star(chain, max_iter=20, stats=stats)
    assert out.select("comp").distinct().count() == 1
    assert stats["rounds"] <= 14, stats


def test_sparse_cosine_candidates_are_keyed_joins(spark, sf_dir):
    """q_sparse_cosine_pairs (round 4): candidate generation must be a
    vocabulary-keyed equi-join — never a cartesian/nested-loop document
    pairing — and the norm re-attachments must be id-keyed joins."""
    plan = plan_of(spark, sf_dir, "q_sparse_cosine_pairs")
    assert "CartesianProduct" not in plan
    joins = plan.count("HashJoin") + plan.count("SortMergeJoin")
    assert joins >= 3, plan  # term join + two norm joins at minimum


def test_pagerank_dist_runs_the_shuffle_loop(spark, sf_dir, monkeypatch):
    """q_pagerank_dist exists to keep a driver hash row on the DISTRIBUTED
    recurrence (q_pagerank certifies the driver-side twin at fixture
    scale). Both paths end behind a checkpoint scan, so plan strings can't
    tell them apart — spy on the twin instead: the dist key must never
    call _rank_recurrence_local, and q_pagerank at fixture scale must
    (the pair keeps both paths exercised)."""
    from fortune_500_financial_insights_pipeline_spark.operators import pagerank as pr

    calls: list[str] = []
    real = pr._rank_recurrence_local

    def spy(*a, **kw):
        calls.append("local")
        return real(*a, **kw)

    monkeypatch.setattr(pr, "_rank_recurrence_local", spy)
    QUERIES["q_pagerank_dist"](spark, sf_dir).collect()
    assert calls == [], "dist key took the driver-side twin"
    QUERIES["q_pagerank"](spark, sf_dir).collect()
    assert calls == ["local"], "fixture-scale q_pagerank should engage the twin"


def test_gopher_repetition_fused_window_pass(spark, sf_dir):
    """Round 9: the nine gram depths are built ROW-LOCALLY from each
    document's own token array (higher-order array lambdas), so the plan
    must carry NO Window node at all — the guarded-against regressions
    are (a) the r5 per-n formulation (9+ window families) and (b) the
    r5-r8 fused-lead formulation (a corpus-wide exchange+sort carrying
    nine lead string columns, re-run per consumer branch)."""
    df = QUERIES["q_gopher_repetition"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_windows = sum(
        1 for line in plan.splitlines() if line.lstrip("+:- ").startswith("Window [")
    )
    assert n_windows == 0, n_windows
    assert "lead(" not in plan
    assert "CartesianProduct" not in plan


def test_label_propagation_no_cartesian_no_window(spark, sf_dir):
    """The per-round argmax is a (count, -label) struct max — a hash
    aggregate, never a per-node sort window; joins stay keyed."""
    df = QUERIES["q_label_propagation"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_crawl_pipeline_map_only_until_gate_and_frontier(spark, sf_dir):
    """q_crawl_pipeline_e2e (round 8): the WARC→response→robots-join→
    extract→links chain must stay map-shaped — the rules dim BROADCASTS
    (never shuffles the page side), and the only exchanges in the whole
    composed plan are aggregate/distinct ones (gate max_by, funnel
    counts, frontier distinct). No hash-partitioning of the corpus by
    anything except aggregate keys; no SinglePartition exchange."""
    plan = plan_of(spark, sf_dir, "q_crawl_pipeline_e2e")
    assert "BroadcastHashJoin" in plan  # robots rules dim
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the only SinglePartition exchanges are the 1-row funnel aggregates,
    # and those must combine map-side first (partial_count/partial_sum)
    assert "partial_count" in plan or "partial_sum" in plan
    # the page corpus never hash-partitions on its own id — only gate /
    # frontier aggregate keys may shuffle
    assert "hashpartitioning(doc_id" not in plan


def test_robots_gate_is_map_only_over_urls(spark):
    """robots_gate (round-8 rewrite): the URL side must NOT shuffle —
    the per-host rules collapse on the (tiny) dim side, the dim
    broadcasts, and the longest-match winner folds row-locally via
    array expressions. The only exchange in the gated plan is the rule
    dim's own per-host collect."""
    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.operators.robots import (
        robots_gate,
        robots_rules,
    )

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /x/*.gif$\nAllow: /x/ok\n")],
        "host string, robots_txt string",
    )
    urls = spark.range(100).select(
        F.concat(F.lit("http://a.com/x/p"), F.col("id")).alias("url"),
        F.col("id").alias("payload"),
    )
    gated = robots_gate(urls, robots_rules(robots))
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # no shuffle keyed on anything from the URL frame
    assert "hashpartitioning(url" not in plan
    assert "hashpartitioning(payload" not in plan
    assert "hashpartitioning(__host" not in plan or "collect_list" in plan
    # rows pass through 1:1 (no aggregate collapse of duplicate URLs)
    assert gated.count() == 100


def test_crawl_budget_has_no_url_sized_global_sort(spark):
    """crawl_budget (round 9): budget selection must decompose into
    host/level-keyed windows plus a broadcast cumulative-level join —
    the ONLY single-partition exchange allowed is the level dim's own
    cumulative window (rows = per-host cap), never the URL frame."""
    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.operators.crawl import (
        crawl_budget,
    )

    urls = spark.range(500).select(
        F.concat(
            F.lit("http://h"), F.col("id") % 37, F.lit(".com/p/"), F.col("id")
        ).alias("loc"),
        ((F.col("id") % 10) / 10.0).alias("priority"),
    )
    out = crawl_budget(urls, budget=100, per_host_cap=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # URL-side windows are keyed: host rank by __host, level rank by host_rank
    assert "hashpartitioning(__host" in plan
    assert "hashpartitioning(host_rank" in plan
    # the level dim broadcasts back to the URL frame
    assert "BroadcastHashJoin" in plan
    # exactly one single-partition exchange: the level dim's cumulative
    # window (bounded by per_host_cap rows) — the URL frame never
    # funnels through one task
    assert plan.count("Exchange SinglePartition") == 1
    assert out.count() == 500


def test_knn_search_indexed_broadcasts_query_probes(spark):
    """knn_search_indexed (round 9): the prebuilt index side streams;
    only the (small) exploded query-probe frame broadcasts, and the
    top-k window partitions per query — never corpus-wide."""
    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        ivf_index_portable,
        knn_search_indexed,
    )

    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 3) % 17).cast("float") for i in range(8)]).alias(
            "embedding"
        ),
    )
    centroids = [[float((i * j + 1) % 5) for j in range(8)] for i in range(4)]
    indexed = ivf_index_portable(emb, centroids)
    out = knn_search_indexed(
        emb.where(F.col("vec_id") < 3), indexed, centroids, k=2, n_probe=2
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # top-k window keyed per query, not corpus-global
    assert "hashpartitioning(q_id" in plan
    assert out.count() == 6
