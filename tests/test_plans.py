"""Physical-plan quality gates: the 100 TB discipline, asserted.

These tests read ``explain('formatted')`` output and fail if a plan
regresses to a shape that would not survive scale-up: a lost parquet
filter pushdown, a broadcast join that became a shuffle join, a scan
reading columns the query never uses."""

from __future__ import annotations

from spark_streaming_testbed_spark.operators import relational as R
from spark_streaming_testbed_spark.operators.similarity import cosine_topk
from tests.conftest import SF_SMOKE


def plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_tpch_q1_pushes_date_filter_to_scan(spark):
    plan = plan_of(R.tpch_q1(spark, SF_SMOKE))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_tpch_q1_prunes_unused_columns(spark):
    plan = plan_of(R.tpch_q1(spark, SF_SMOKE))
    # lineitem has 11 columns; Q1 needs 7 — the scan must not read keys
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_star_join_broadcasts_dimensions(spark):
    plan = plan_of(R.star_join(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2  # customer + nation
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan or \
        plan.count("BroadcastHashJoin") >= 3  # fact join may also broadcast at tiny sf


def test_batch_stats_is_single_pass_hash_agg(spark):
    plan = plan_of(R.batch_stats(spark, SF_SMOKE))
    # partial + final aggregation, fused in HashAggregate (no sort-based agg)
    assert plan.count("HashAggregate") >= 2
    assert "ObjectHashAggregate" not in plan


def test_cosine_topk_broadcasts_query_side(spark):
    plan = plan_of(cosine_topk(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # corpus side must NOT be exchanged by the join itself (only the
    # later window's partitioning may shuffle the scored rows)
    assert "CartesianProduct" not in plan


def test_semi_anti_join_plans_semi_modes(spark):
    plan = plan_of(R.semi_anti_join(spark, SF_SMOKE))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_flagship_scan_is_vectorized_and_codegen_enabled(spark):
    # whole-stage codegen subtrees are not displayed under AQE before the
    # plan finalizes, so assert the enabling conf + the vectorized scan
    # (Batched: true) instead of grepping for WholeStageCodegen.
    assert spark.conf.get("spark.sql.codegen.wholeStage") == "true"
    plan = plan_of(R.batch_stats(spark, SF_SMOKE))
    assert "Batched: true" in plan
    assert "Scan parquet" in plan


def test_winnow_reuses_one_exchange_for_window_and_distinct(spark):
    from spark_streaming_testbed_spark.operators.text import winnow_fingerprints

    plan = plan_of(winnow_fingerprints(spark, SF_SMOKE))
    # exactly two exchanges: the doc_id fan-out (which also serves the
    # sliding-min window AND the distinct) and the final output sort's
    # range partitioning - a third would mean the distinct stopped
    # reusing the doc_id clustering
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    assert "Generate" in plan          # explode runs AFTER the fan-out


def test_lang_id_is_shuffle_free_before_output_sort(spark):
    from spark_streaming_testbed_spark.operators.text import lang_id_ngram

    plan = plan_of(lang_id_ngram(spark, SF_SMOKE))
    import re

    # one Exchange total (the orderBy) - scoring is row-local codegen
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Generate" not in plan      # no explode
    assert "HashAggregate" not in plan # no aggregation


def test_project_embeddings_is_shuffle_free_before_output_sort(spark):
    from spark_streaming_testbed_spark.operators.similarity import (
        project_embeddings,
    )

    plan = plan_of(project_embeddings(spark, SF_SMOKE))
    import re

    # one Exchange total (the orderBy) — the projection is a row-local
    # codegen map over literal planes, no UDF, no aggregation
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "HashAggregate" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_epoch_mix_plan_single_fact_shuffle_and_broadcast_total(spark):
    from spark_streaming_testbed_spark.operators.text import epoch_mix_plan

    plan = plan_of(epoch_mix_plan(spark, SF_SMOKE))
    # partial+final agg keyed on source; the scalar weight total comes
    # back via a broadcast, never a second fact-table shuffle join
    assert "partial_sum" in plan or "partial_count" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "ReadSchema: struct<text:string,source:string>" in plan


def test_interarrival_reuses_user_exchange_for_window_and_agg(spark):
    from spark_streaming_testbed_spark.operators.advanced import (
        interarrival_stats,
    )

    plan = plan_of(interarrival_stats(spark, SF_SMOKE))
    import re

    # exactly two exchanges: the user_id fan-out (serving BOTH the lag
    # window and the per-user aggregate) and the output sort's range
    # partitioning — a third means the aggregate stopped reusing the
    # window's hash clustering
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    assert "Window" in plan


def test_entropy_signals_zero_compute_shuffles(spark):
    from spark_streaming_testbed_spark.operators.text import entropy_signals

    plan = plan_of(entropy_signals(spark, SF_SMOKE))
    import re

    # the entropy math itself is row-local (the zero-shuffle claim):
    # besides the output sort's range partitioning, the only exchange
    # allowed is with_tokens' scale-adaptive fan-out (r12) — an
    # explicit REPARTITION_BY_NUM that widens the narrow local scan
    # before the per-row lambda folds and is a no-op at cluster scale
    exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    fan_outs = plan.count("REPARTITION_BY_NUM")
    assert exchanges - fan_outs == 1 and fan_outs <= 1
    assert "HashAggregate" not in plan


def test_cumulative_counts_two_phase_shape(spark):
    """The cumsum must not serialize on the ~5-value event_type alone:
    the data window partitions on (event_type, day-bucket) and the
    cross-bucket offsets arrive via a broadcast join."""
    plan = plan_of(R.cumulative_counts(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # the big-side window partition spec carries the day bucket
    assert "bkt" in plan


def test_ann_ivf_assignment_is_codegen_not_udf(spark):
    """IVF corpus list-assignment must stay JVM-side against centroid
    literals — a Python UDF here would put every corpus row through
    Arrow at 100 TB. (The only accepted Python is none at all: probes
    and scoring are built-ins too.)"""
    from spark_streaming_testbed_spark.operators.similarity import (
        ann_ivf_topk,
    )

    plan = plan_of(ann_ivf_topk(spark, SF_SMOKE))
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan  # probes are the broadcast side


def test_bucketed_join_has_no_exchange(spark):
    """Both join sides are bucketed on the join key, so the join must
    plan as a sort-merge with ZERO hash-partition exchanges — the
    co-located warehouse contract. Broadcast is disabled for the assert:
    at smoke scale Spark prefers broadcasting the tiny orders side
    (also shuffle-free), but at 100 TB neither side broadcasts and the
    bucket layout is what saves the shuffle."""
    from spark_streaming_testbed_spark.sources.warehouse import (
        bucketed_join_stats,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(bucketed_join_stats(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Bucketed: true" in plan


def test_salted_join_spreads_hot_keys(spark):
    """Under disabled broadcast, the salted join must shuffle on
    (user_id, salt) — the hot keys' rows spread across reducers — and
    the dim side must carry the explode."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(R.skew_salted_join(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    join_keys = plan.split("Left keys")[1].split("\n")[0] if "Left keys" in plan else ""
    assert "salt" in join_keys and "user_id" in join_keys
    assert "Generate" in plan  # the dim-side explode


def test_edit_distance_pairs_is_segment_equijoin(spark):
    """The PassJoin shape: the 9-row segment table and 17-row shift
    table broadcast onto the docs (tiny-side nested-loop broadcasts are
    the correct plan for literal spines), and candidacy is an EQUI-join
    on (segment#, piece) — never a cartesian product between doc
    sides."""
    from spark_streaming_testbed_spark.operators.dedup import (
        edit_distance_pairs,
    )

    plan = plan_of(edit_distance_pairs(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    # candidate join on (seg, piece) is a hash/sort-merge equi-join
    assert "piece" in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan \
        or "ShuffledHashJoin" in plan


def test_heavy_hitters_confirm_join_is_broadcast(spark):
    """Pass 2's candidate semi-join must broadcast the tiny candidate
    set — the raw token stream is never hash-exchanged by a join."""
    from spark_streaming_testbed_spark.operators.sketches import (
        heavy_hitters,
    )

    plan = plan_of(heavy_hitters(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    # no shuffle-side join anywhere: the token stream only ever meets
    # the candidate set through the broadcast
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bloom_decontaminate_filters_before_exact_join(spark):
    """The Bloom prefilter (MapInPandas) must sit below the broadcast
    exact-confirm join: grams die executor-side before any join."""
    from spark_streaming_testbed_spark.operators.sketches import (
        bloom_decontaminate,
    )

    plan = plan_of(bloom_decontaminate(spark, SF_SMOKE))
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan
    assert plan.index("MapInPandas") > plan.index("BroadcastHashJoin"), (
        "formatted plans print top-down: the map node must be deeper "
        "(later) than the join consuming it"
    )


def test_groupwise_regression_is_one_agg_pass_plus_broadcast(spark):
    """Sufficient-statistics regression: a broadcast join for the
    per-group recentring minimum, then ONE partial+final HashAggregate
    pair — no window over the fact table, no Python."""
    from spark_streaming_testbed_spark.operators.advanced import (
        groupwise_regression,
    )

    plan = plan_of(groupwise_regression(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2
    assert "Window" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_markov_window_is_user_partitioned(spark):
    """The lag window must partition by user_id (small per-user sorts),
    never a global single-partition sort over the fact table."""
    from spark_streaming_testbed_spark.operators.advanced import (
        markov_transitions,
    )

    plan = plan_of(markov_transitions(spark, SF_SMOKE))
    assert "hashpartitioning(user_id" in plan


def test_rolling_anomaly_aggregates_before_window(spark):
    """The per-minute collapse (HashAggregate) must run before the
    rolling window, so the window only ever sees the minute series."""
    from spark_streaming_testbed_spark.operators.advanced import (
        rolling_anomaly,
    )

    plan = plan_of(rolling_anomaly(spark, SF_SMOKE))
    assert "HashAggregate" in plan and "Window" in plan
    assert plan.index("Window") < plan.index("HashAggregate"), (
        "top-down print: the window consumes the aggregate, so the "
        "aggregate node prints deeper"
    )


def test_triangle_count_has_no_cartesian_or_nested_loop(spark):
    """Every triangle-counting step must stay an equi-join on node ids
    (the inequality orientation predicates are post-join filters on an
    equi-join), never a cartesian/nested-loop wedge blowup."""
    from spark_streaming_testbed_spark.operators.advanced import (
        triangle_count,
    )

    plan = plan_of(triangle_count(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ewma_fold_is_codegen_single_compute_shuffle(spark):
    """The EWMA recurrence folds row-locally via the higher-order
    aggregate expression — JVM codegen, no Python eval — after exactly
    one compute shuffle (the groupBy); the only other exchange is the
    output-sort range partitioning."""
    from spark_streaming_testbed_spark.operators.advanced import (
        ewma_smooth,
    )

    plan = plan_of(ewma_smooth(spark, SF_SMOKE))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # detail headers "(n) Exchange": agg hash + output range only
    assert plan.count(") Exchange") <= 2
    assert "rangepartitioning" in plan


def test_snm_rank_is_bucketed_window_plus_broadcast_offsets(spark):
    """The global rank must come from the two-phase shape: row_number
    windows partitioned by the key-prefix bucket (parallel), bucket
    offsets broadcast back; the neighborhood join is an equi-join on
    the shifted rank — no cartesian, no global single-partition window
    over the documents."""
    from spark_streaming_testbed_spark.operators.dedup import (
        snm_candidate_pairs,
    )

    plan = plan_of(snm_candidate_pairs(spark, SF_SMOKE))
    assert "hashpartitioning(bkt" in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_partition_skew_report_shuffles_only_key_counts(spark):
    """The audit's only wide exchange carries (user_id, count) partial
    aggregates, never fact rows: a map-side-combined HashAggregate must
    sit below the first exchange, and nothing leaves the JVM."""
    from spark_streaming_testbed_spark.operators.relational import (
        partition_skew_report,
    )

    plan = plan_of(partition_skew_report(spark, SF_SMOKE))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    first_ex = plan.index("Exchange")
    assert "HashAggregate" in plan[first_ex:], (
        "partial per-key counts must combine map-side below the shuffle"
    )


def test_pmi_top_k_plans_take_ordered(spark):
    """The top-100 cut must plan as TakeOrderedAndProject, never a full
    global sort of the pair table."""
    from spark_streaming_testbed_spark.operators.text import (
        pmi_collocations,
    )

    plan = plan_of(pmi_collocations(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_knn_graph_joins_on_bucket_without_broadcast_corpus(spark):
    """The corpus self-join must key on the LSH signature (equi-join);
    the corpus is both sides, so neither may be a nested-loop build."""
    from spark_streaming_testbed_spark.operators.similarity import (
        knn_graph,
    )

    plan = plan_of(knn_graph(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "bucket" in plan


def test_ts_similarity_blocks_on_signature(spark):
    """Candidate pairs come from the signature equi-join over the tiny
    per-user stats table; the day-level sxy join is an equi-join on
    day — no all-pairs nested loop anywhere."""
    from spark_streaming_testbed_spark.operators.advanced import (
        ts_similarity_pairs,
    )

    plan = plan_of(ts_similarity_pairs(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "sig" in plan


def test_lpa_rounds_have_no_cartesian(spark):
    from spark_streaming_testbed_spark.operators.advanced import (
        lpa_communities,
    )

    plan = plan_of(lpa_communities(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_median_second_pass_is_broadcast_pruned(spark):
    """Pass 2 must reach the data through a BROADCAST join against the
    tiny located-bin table (the 1/1024 prune), and nothing leaves the
    JVM."""
    from spark_streaming_testbed_spark.operators.relational import (
        exact_median_twopass,
    )

    plan = plan_of(exact_median_twopass(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_zipf_topk_plans_take_ordered_not_global_window(spark):
    """The top-500 cut must be TakeOrderedAndProject (distributed
    top-k); an unpartitioned rank window over the full vocabulary would
    sort every token in one task."""
    from spark_streaming_testbed_spark.operators.modeling import (
        zipf_token_slope,
    )

    plan = plan_of(zipf_token_slope(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_assortativity_broadcasts_degree_table(spark):
    """Endpoint degrees attach via broadcast joins of the tiny
    node-cardinality degree table — the edge table never re-shuffles
    for them."""
    from spark_streaming_testbed_spark.operators.modeling import (
        degree_assortativity,
    )

    plan = plan_of(degree_assortativity(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_incremental_merge_anchor_is_broadcast(spark):
    """The midpoint cutoff is a 1-row scalar anchor: it must attach via
    BroadcastNestedLoopJoin/BroadcastExchange, never a shuffle."""
    from spark_streaming_testbed_spark.operators.modeling import (
        incremental_agg_merge,
    )

    plan = plan_of(incremental_agg_merge(spark, SF_SMOKE))
    assert "BroadcastExchange" in plan


def test_uplift_slope_broadcasts_part_dimension(spark):
    from spark_streaming_testbed_spark.operators.modeling import (
        discount_uplift_slope,
    )

    plan = plan_of(discount_uplift_slope(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    # quantized integer math stays in the JVM
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_ngram_novelty_single_gram_shuffle(spark):
    """r5 rewrite: first-seer via a gram-partitioned window — the
    exploded gram table must shuffle exactly twice (gram window + doc
    re-aggregate), with the join-back gone."""
    from spark_streaming_testbed_spark.operators.prep import ngram_novelty

    plan = plan_of(ngram_novelty(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_bloom_join_fact_side_never_shuffles_before_join(spark):
    """The runtime-filter audit's whole point: the orders scan joins a
    BROADCAST verdict table (bounded by distinct custkeys); a
    SortMergeJoin would shuffle the fact side the filter exists to
    protect."""
    from spark_streaming_testbed_spark.operators.sketches import (
        bloom_join_prefilter,
    )

    plan = plan_of(bloom_join_prefilter(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_hll_register_build_is_partial_aggregated(spark):
    """The HLL register build must be a map-side-combinable aggregate
    (partial HashAggregate before the Exchange) so at 100 TB only
    (source x 64)-cell partials shuffle, never the shingle stream; the
    only nested-loop join is the bounded source x 64 register spine."""
    from spark_streaming_testbed_spark.operators.sketches import (
        hll_shingle_estimate,
    )

    plan = plan_of(hll_shingle_estimate(spark, SF_SMOKE))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # partial-final pairs around every planner-inserted Exchange; the
    # explicit REPARTITION_BY_NUM fan-out (r12, with_tokens) widens the
    # narrow local scan before the shingle hot loop and carries no
    # aggregate — exclude it from the pairing invariant
    assert plan.count("HashAggregate") >= (
        plan.count("Exchange") - plan.count("REPARTITION_BY_NUM")
    )


def test_link_prediction_avoids_cartesian_and_broadcasts_degrees(spark):
    """The wedge join must key on the shared-neighbor node (never a
    cartesian pair enumeration), and endpoint degrees/hub caps attach
    via broadcasts of the node-cardinality degree table."""
    from spark_streaming_testbed_spark.operators.modeling import (
        link_prediction_topk,
    )

    plan = plan_of(link_prediction_topk(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_pixel_stats_is_two_chained_pandas_maps_no_shuffle(spark):
    """Pixel statistics must be a straight pipeline: columnar scan →
    encode mapInPandas → decode/reduce mapInPandas → sort. PAYLOAD bytes
    must never cross a shuffle — the allowed Exchanges are the final
    orderBy's range partitioning on the tiny stats rows and the r12
    scale-adaptive fan-out (REPARTITION_BY_NUM), which sits UPSTREAM of
    the encode map and therefore carries document text, never the
    encoded payload."""
    from spark_streaming_testbed_spark.operators.multimodal import (
        multimodal_pixel_stats,
    )

    plan = plan_of(multimodal_pixel_stats(spark, SF_SMOKE))
    tree = plan.split("(1) Scan")[0]  # formatted output repeats nodes
    assert tree.count("MapInPandas") == 2
    assert "Join" not in plan and "HashAggregate" not in plan
    # one sort exchange + at most the pre-encode fan-out; nothing else
    # (the REPARTITION_BY_NUM marker lives in the details section of the
    # formatted output, not the tree header — count it on the full plan)
    fan_outs = min(1, plan.count("REPARTITION_BY_NUM"))
    assert tree.count("Exchange") - fan_outs <= 1


def test_loglake_roundtrip_fan_policy(spark):
    """r12 fan-out policy for the loglake family: the regex-parse hot
    loops that won the A/B (memory roundtrip, plain execution
    roundtrip, per-second rollup) carry exactly one scale-adaptive
    fan-out exchange before the parse; the consumers whose parse feeds
    straight into an aggregate (execution dedup, stacked pivot) must
    stay on the narrow scan — their aggregate shuffles anyway and the
    extra exchange measured as a pure loss."""
    from spark_streaming_testbed_spark.operators import loglake_queries as L

    for fanned in (L.loglake_memory_roundtrip,
                   L.loglake_execution_roundtrip,
                   L.loglake_per_second_rollup):
        plan = plan_of(fanned(spark, SF_SMOKE))
        assert plan.count("REPARTITION_BY_NUM") == 1, fanned.__name__
    for narrow in (L.loglake_execution_dedup, L.loglake_stacked_pivot):
        plan = plan_of(narrow(spark, SF_SMOKE))
        assert plan.count("REPARTITION_BY_NUM") == 0, narrow.__name__
