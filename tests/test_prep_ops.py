"""Round-4 feature-prep / data-quality operators: plan-shape gates (the
100 TB discipline) and data-level invariants at smoke scale. Value
parity vs DuckDB is covered by the parametrized oracle gate in
test_oracle_parity.py — these tests assert the things a hash match
can't: physical plan shape and mathematical invariants."""

from __future__ import annotations

from spark_streaming_testbed_spark.operators import prep as P
from tests.conftest import SF_SMOKE
from tests.test_plans import plan_of


# ---------------------------------------------------------------------------
# plan-shape gates
# ---------------------------------------------------------------------------

def test_target_encoding_broadcasts_type_stats(spark):
    plan = plan_of(P.target_encoding(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def test_quantile_binning_prunes_scan(spark):
    plan = plan_of(P.quantile_binning(spark, SF_SMOKE))
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    # only the sort keys are read; no dates, flags, or quantities
    assert "l_extendedprice" in read_schema
    assert "l_shipdate" not in read_schema
    assert "l_quantity" not in read_schema


def test_k_anonymity_is_two_hash_aggregates_no_join(spark):
    plan = plan_of(P.k_anonymity_audit(spark, SF_SMOKE))
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan


def test_feature_hashing_stays_jvm_side(spark):
    plan = plan_of(P.feature_hashing(spark, SF_SMOKE))
    assert "BatchEvalPython" not in plan
    assert "HashAggregate" in plan


def test_mad_outliers_broadcasts_cutoffs(spark):
    plan = plan_of(P.mad_outliers(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_benford_reads_one_column(spark):
    plan = plan_of(P.benford_audit(spark, SF_SMOKE))
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "l_extendedprice" in read_schema
    assert "l_orderkey" not in read_schema


def test_ngram_novelty_no_cartesian(spark):
    plan = plan_of(P.ngram_novelty(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_novelty_hash_collision_free_on_corpus(spark):
    # ngram_novelty shuffles xxhash64(gram) codes while the DuckDB
    # oracle keys on the exact gram string; cross-engine parity is
    # therefore conditional on zero 64-bit collisions among the
    # corpus's distinct grams (P ~ n^2/2^64). Assert that condition
    # holds on the fixture corpus so a collision would fail loudly
    # here instead of as a silent oracle hash mismatch.
    from pyspark.sql import functions as F

    from spark_streaming_testbed_spark.operators.prep import (
        NOVELTY_N,
        _t,
        with_grams,
        with_tokens,
    )

    grams = (
        with_grams(
            with_tokens(_t(spark, SF_SMOKE, "documents")),
            NOVELTY_N,
            "grams",
        )
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    n_grams, n_hashes = (
        grams.agg(
            F.count(F.lit(1)),
            F.countDistinct(F.xxhash64("gram")),
        ).first()
    )
    assert n_grams == n_hashes


def test_cusum_reduces_before_python(spark):
    # the sequential recursion runs over the per-type DAILY series, not
    # the raw facts: the pandas stage must sit above an aggregate
    plan = plan_of(P.cusum_drift(spark, SF_SMOKE))
    assert "FlatMapGroupsInPandas" in plan
    # both the daily-series and the baseline aggregates sit BELOW the
    # pandas stage in the tree (children print after parents in
    # formatted explain), so the raw facts never reach Python
    tree = plan.split("(1) Scan")[0]
    pandas_depth = min(
        line.index("FlatMapGroupsInPandas")
        for line in tree.splitlines() if "FlatMapGroupsInPandas" in line
    )
    agg_depths = [
        line.index("HashAggregate")
        for line in tree.splitlines() if "HashAggregate" in line
    ]
    assert agg_depths and all(d > pandas_depth for d in agg_depths)


def test_gap_fill_single_window_pass(spark):
    plan = plan_of(P.gap_fill_locf(spark, SF_SMOKE))
    tree = plan.split("(1) Scan")[0]
    assert sum("Window" in line for line in tree.splitlines()) == 1
    # the spine cross join is broadcast (two tiny aggregates), never a
    # partitioned cartesian of fact rows
    assert "CartesianProduct" not in plan


def test_threshold_sweep_joins_on_list_id(spark):
    plan = plan_of(P.embedding_threshold_sweep(spark, SF_SMOKE))
    # the quadratic join is keyed (within-cluster), never a global
    # cartesian over the corpus
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# data-level invariants (sf0.001)
# ---------------------------------------------------------------------------

def test_target_encoding_excludes_self(spark):
    rows = P.target_encoding(spark, SF_SMOKE).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, grp in by_type.items():
        if len(grp) > 1:
            # leave-one-out: encoding of the max-valued event is strictly
            # below the plain group mean; of the min-valued, above it
            mean = sum(r.value for r in grp) / len(grp)
            mx = max(grp, key=lambda r: r.value)
            mn = min(grp, key=lambda r: r.value)
            assert mx.loo_encoding < mean + 1e-6
            assert mn.loo_encoding > mean - 1e-6


def test_quantile_binning_partitions_rows(spark):
    rows = P.quantile_binning(spark, SF_SMOKE).collect()
    assert [r.bin for r in rows] == list(range(1, P.N_BINS + 1))
    counts = [r.n for r in rows]
    assert max(counts) - min(counts) <= 1  # ntile balance
    for lo_bin, hi_bin in zip(rows, rows[1:]):
        assert lo_bin.hi <= hi_bin.lo + 1e-9  # bins ordered, no overlap


def test_k_anonymity_accounting(spark):
    for r in P.k_anonymity_audit(spark, SF_SMOKE).collect():
        assert r.n_small <= r.n_classes
        assert r.rows_suppressed <= r.n_rows
        assert r.rows_suppressed < P.K_ANON * max(r.n_small, 1)
        assert 0 <= r.suppression_bp <= 10000


def test_length_bucket_plan_padding(spark):
    rows = P.length_bucket_plan(spark, SF_SMOKE).collect()
    assert rows, "at least one bucket"
    for r in rows:
        assert r.bucket in P.LENGTH_BUCKETS
        assert r.padded_tokens >= r.true_tokens
        assert 0 <= r.waste_bp < 10000


def test_class_balance_weights_inverse_frequency(spark):
    rows = P.class_balance_weights(spark, SF_SMOKE).collect()
    assert all(r.weight_micro > 0 for r in rows)
    # bigger stratum => no larger weight
    by_n = sorted(rows, key=lambda r: r.n_g)
    for a, b in zip(by_n, by_n[1:]):
        assert a.weight_micro >= b.weight_micro


def test_feature_hashing_bucket_range(spark):
    rows = P.feature_hashing(spark, SF_SMOKE).collect()
    assert all(0 <= r.bucket < P.HASH_BUCKETS for r in rows)
    assert all(r.weight != 0 for r in rows)


def test_ngram_novelty_first_doc_fully_novel(spark):
    rows = P.ngram_novelty(spark, SF_SMOKE).collect()
    first = min(rows, key=lambda r: r.doc_id)
    assert first.novelty_bp == 10000
    for r in rows:
        assert 0 <= r.n_novel <= r.n_grams


def test_benford_proportions_account_for_all_rows(spark):
    rows = P.benford_audit(spark, SF_SMOKE).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    total_obs = sum(r.n_obs for r in rows)
    # obs proportions sum to ~1e6 (integer truncation loses <9 per digit)
    s = sum(r.obs_millionths for r in rows)
    assert 1_000_000 - 9 <= s + 9 and s <= 1_000_000
    assert all(r.chi2_micro >= 0 for r in rows)
    assert total_obs > 0


def test_mad_outlier_rate_is_sane(spark):
    for r in P.mad_outliers(spark, SF_SMOKE).collect():
        assert r.mad >= 0
        assert 0 <= r.n_outliers < r.n
        assert r.outlier_bp < 2000  # a robust rule never flags 20%+


def test_gap_fill_carries_forward(spark):
    rows = P.gap_fill_locf(spark, SF_SMOKE).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for grp in by_type.values():
        seen_value = False
        for r in sorted(grp, key=lambda r: (r.day, r.hod)):
            if r.value_filled is not None:
                seen_value = True
            elif seen_value:
                raise AssertionError("null after first fill — LOCF broke")
            if not r.is_gap:
                assert r.value_filled is not None


def test_cusum_states_nonnegative(spark):
    rows = P.cusum_drift(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.s_pos >= 0 and r.s_neg >= 0
        assert r.alarm in (0, 1)


def test_threshold_sweep_monotone(spark):
    rows = P.embedding_threshold_sweep(spark, SF_SMOKE).collect()
    for a, b in zip(rows, rows[1:]):
        assert a.threshold < b.threshold
        assert a.n_pairs >= b.n_pairs
        assert a.n_docs_removed >= b.n_docs_removed
    for r in rows:
        assert r.n_docs_removed <= max(r.n_pairs, 1)


# ---------------------------------------------------------------------------
# round-4 batch 2: ranks, sampling, leakage, dataset card
# ---------------------------------------------------------------------------

def test_percentile_rank_bounds_and_extremes(spark):
    rows = P.percentile_rank_features(spark, SF_SMOKE).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.pr_bp <= 10000
        by_type.setdefault(r.event_type, []).append(r)
    for grp in by_type.values():
        assert max(grp, key=lambda r: r.value).pr_bp == 10000
        assert min(grp, key=lambda r: r.value).pr_bp == 0


def test_quantile_normalize_covers_every_dim(spark):
    rows = P.quantile_normalize_embeddings(spark, SF_SMOKE).collect()
    dims = {r.dim_idx for r in rows}
    n_vecs = len({r.vec_id for r in rows})
    assert len(rows) == len(dims) * n_vecs
    assert all(0 <= r.rank_bp <= 10000 for r in rows)


def test_group_sample_is_deterministic_and_bounded(spark):
    a = P.group_sample_topk(spark, SF_SMOKE).collect()
    b = P.group_sample_topk(spark, SF_SMOKE).collect()
    assert a == b  # same hash order every run — df.sample can't do this
    per_type: dict[str, int] = {}
    for r in a:
        per_type[r.event_type] = per_type.get(r.event_type, 0) + 1
    assert all(v <= P.GROUP_SAMPLE_K for v in per_type.values())


def test_cross_split_leakage_accounts_for_all_pairs(spark):
    from spark_streaming_testbed_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    cells = P.cross_split_leakage(spark, SF_SMOKE).collect()
    total_pairs = ngram_jaccard_pairs(spark, SF_SMOKE).count()
    assert sum(r.n_pairs for r in cells) == total_pairs
    for r in cells:
        assert r.crosses_split == int(r.split_a != r.split_b)


def test_dataset_card_sections(spark):
    rows = P.dataset_card_report(spark, SF_SMOKE).collect()
    card = {(r.section, r.metric): r.value for r in rows}
    n_docs = card[("corpus", "n_docs")]
    assert n_docs > 0
    lang_total = sum(v for (s, _), v in card.items() if s == "lang")
    split_total = sum(v for (s, _), v in card.items() if s == "split")
    assert lang_total == n_docs == split_total
    assert card[("dedup", "exact_dup_docs")] >= 0
    assert card[("corpus", "total_tokens")] > n_docs


# ---------------------------------------------------------------------------
# round-4 batch 3: forecasting, cohorts, containment, readability,
# matryoshka
# ---------------------------------------------------------------------------

def test_holt_reduces_before_python(spark):
    plan = plan_of(P.holt_trend(spark, SF_SMOKE))
    assert "FlatMapGroupsInPandas" in plan
    tree = plan.split("(1) Scan")[0]
    pandas_depth = min(
        line.index("FlatMapGroupsInPandas")
        for line in tree.splitlines() if "FlatMapGroupsInPandas" in line
    )
    agg_depths = [
        line.index("HashAggregate")
        for line in tree.splitlines() if "HashAggregate" in line
    ]
    assert agg_depths and all(d > pandas_depth for d in agg_depths)


def test_holt_first_point_anchors_level(spark):
    rows = P.holt_trend(spark, SF_SMOKE).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for grp in by_type.values():
        first = min(grp, key=lambda r: r.day)
        assert first.level == first.x
        assert first.trend == 0.0


def test_cohort_ltv_monotone_cumulative(spark):
    rows = P.cohort_ltv(spark, SF_SMOKE).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort, []).append(r)
    for grp in by_cohort.values():
        grp.sort(key=lambda r: r.age)
        assert grp[0].age == 0  # a cohort exists because someone bought
        cum = 0
        for r in grp:
            cum += r.rev_cents
            assert r.cum_rev_cents == cum


def test_containment_dominates_jaccard(spark):
    from spark_streaming_testbed_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    cont = {
        (r.doc_a, r.doc_b): r.containment_bp
        for r in P.containment_pairs(spark, SF_SMOKE).collect()
    }
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(spark, SF_SMOKE).collect()
    }
    # containment >= jaccard always; every high-jaccard pair must appear
    for pair, j in jac.items():
        if j >= 0.5:
            assert pair in cont
            assert cont[pair] >= int(j * 10000) - 1


def test_readability_row_local_plan(spark):
    plan = plan_of(P.readability_scores(spark, SF_SMOKE))
    assert "BatchEvalPython" not in plan
    assert "HashAggregate" not in plan  # pure projection before the sort
    rows = P.readability_scores(spark, SF_SMOKE).collect()
    for r in rows:
        assert r.n_sentences >= 1
        assert r.n_syllables >= r.n_words  # every corpus word has a vowel


def test_matryoshka_full_prefix_is_identity(spark):
    rows = P.matryoshka_fidelity(spark, SF_SMOKE).collect()
    assert all(0.0 < r.cosine <= 1.0 for r in rows)
    by_vec: dict = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, {})[r.prefix_len] = r.cosine
    for fid in by_vec.values():
        assert set(fid) == set(P.MATRYOSHKA_PREFIXES)


# ---------------------------------------------------------------------------
# round-4 batch 4: bounded funnel, embedding outliers, integrity audit
# ---------------------------------------------------------------------------

def test_bounded_funnel_never_exceeds_unbounded(spark):
    from spark_streaming_testbed_spark.operators.advanced import (
        event_funnel,
    )

    bounded = {
        r.stage: r.users
        for r in P.funnel_time_bounded(spark, SF_SMOKE).collect()
    }
    unbounded = {
        r.stage: r.users for r in event_funnel(spark, SF_SMOKE).collect()
    }
    for stage, users in bounded.items():
        assert users <= unbounded[stage]
    assert bounded["purchase"] <= bounded["click"] <= bounded["view"]


def test_embedding_outlier_rate_near_five_pct(spark):
    rows = P.embedding_outliers(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # p95 cutoff => ~5% flagged (ties/quantization shift it slightly)
        assert 0 <= r.outlier_bp <= 800
        assert r.p95_dist > 0


def test_referential_integrity_checks_present(spark):
    rows = {r.check_name: r
            for r in P.referential_integrity_audit(spark, SF_SMOKE)
            .collect()}
    assert set(rows) == {
        "orphan_lineitems", "childless_orders",
        "customers_no_orders", "total_mismatch_orders",
    }
    assert rows["orphan_lineitems"].violations == 0  # generator invariant
    for r in rows.values():
        assert 0 <= r.rate_bp <= 10000
        assert r.violations <= r.entities


# ---------------------------------------------------------------------------
# round-4 batch 5: anomaly alerts, OOV, label noise
# ---------------------------------------------------------------------------

def test_seasonal_anomaly_alert_rate_is_tail(spark):
    rows = P.seasonal_anomaly_alerts(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.sigma >= 0
        # 3-sigma rule flags a small tail, never the bulk
        assert 0 <= r.alert_bp <= 2500
        assert r.n_alerts <= r.n_cells


def test_oov_rate_bounds_and_vocab_effect(spark):
    rows = P.oov_rate(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert 0 <= r.oov_bp <= 10000
    # the corpus vocabulary covers the corpus far better than nothing
    total = sum(r.n_tokens for r in rows)
    oov = sum(r.n_oov for r in rows)
    assert oov < total


def test_label_noise_accounting(spark):
    rows = P.label_noise_audit(spark, SF_SMOKE).collect()
    n_total = sum(r.n_docs for r in rows)
    from spark_streaming_testbed_spark.session import load_table

    assert n_total == load_table(spark, SF_SMOKE, "documents").count()
    for r in rows:
        assert 0 <= r.n_mismatch <= r.n_docs


# ---------------------------------------------------------------------------
# round-4 batch 6: LSH sweep, joint histogram, l-diversity
# ---------------------------------------------------------------------------

def test_lsh_sweep_monotone_in_bands(spark):
    from spark_streaming_testbed_spark.operators.dedup import (
        lsh_param_sweep,
    )

    rows = sorted(
        lsh_param_sweep(spark, SF_SMOKE).collect(), key=lambda r: r.bands
    )
    assert [(r.bands, r.rows_per_band) for r in rows] == [
        (1, 8), (2, 4), (4, 2), (8, 1)
    ]
    # more bands => looser filter => candidates and recall only grow
    for a, b in zip(rows, rows[1:]):
        assert a.n_candidates <= b.n_candidates
        assert a.recall_bp <= b.recall_bp
        assert a.n_hits <= a.n_candidates
        assert a.n_hits <= a.n_truth


def test_joint_histogram_shares_sum(spark):
    rows = P.joint_histogram(spark, SF_SMOKE).collect()
    assert all(0 <= r.hod < 24 for r in rows)
    total_bp = sum(r.share_bp for r in rows)
    # truncation loses < 1 bp per cell
    assert 10000 - len(rows) <= total_bp <= 10000


def test_l_diversity_bounds(spark):
    rows = P.l_diversity_audit(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_low_diversity <= r.n_classes
        assert 0 <= r.low_diversity_bp <= 10000


def test_dedup_consensus_contains_every_detector(spark):
    from spark_streaming_testbed_spark.operators.dedup import (
        lsh_near_dup_pairs,
        ngram_jaccard_pairs,
    )

    rows = P.dedup_consensus(spark, SF_SMOKE).collect()
    by_pair = {(r.doc_a, r.doc_b): r for r in rows}
    jac = {(r.doc_a, r.doc_b)
           for r in ngram_jaccard_pairs(spark, SF_SMOKE).collect()}
    lsh = {(r.doc_a, r.doc_b)
           for r in lsh_near_dup_pairs(spark, SF_SMOKE).collect()}
    for pair in jac:
        assert by_pair[pair].sig_jaccard == 1
    for pair in lsh:
        assert by_pair[pair].sig_lsh == 1
        # LSH-verified pairs pass the same Jaccard bar => subset
        assert by_pair[pair].sig_jaccard == 1
    for r in rows:
        assert 1 <= r.n_signals <= 3


def test_bounce_rate_bounds(spark):
    rows = P.bounce_rate(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_bounces <= r.n_sessions
        assert 0 <= r.bounce_bp <= 10000


def test_skyline_is_pareto_frontier(spark):
    rows = sorted(
        P.skyline_parts(spark, SF_SMOKE).collect(),
        key=lambda r: r.avg_price,
    )
    assert rows
    # along increasing price, surviving quantity strictly increases
    for a, b in zip(rows, rows[1:]):
        assert a.avg_price <= b.avg_price
        assert a.total_qty < b.total_qty
    # no row dominates another
    for a in rows:
        for b in rows:
            if a is not b:
                assert not (
                    b.avg_price < a.avg_price
                    and b.total_qty >= a.total_qty
                )


def test_sla_rates_bounded(spark):
    rows = P.sla_compliance(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_in_sla <= r.n_lines
        assert 0 <= r.sla_bp <= 10000


def test_cluster_canonicals_election_rules(spark):
    rows = P.cluster_canonicals(spark, SF_SMOKE).collect()
    for r in rows:
        member_ids = [int(x) for x in r.member_ids.split(",")]
        assert member_ids == sorted(member_ids)  # numeric sort order
        assert r.n_members > 1
        assert r.canonical_doc in member_ids
        assert r.cluster_id == min(member_ids)
        assert r.canonical_chars <= r.total_chars


def test_rolling_active_users_dominates_daily(spark):
    rows = P.rolling_active_users(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.dau <= r.wau
        assert 0 < r.stickiness_bp <= 10000


def test_source_vocab_overlap_bounds(spark):
    rows = P.source_vocab_overlap(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.src_a < r.src_b
        assert 0 < r.n_common <= P.SRC_VOCAB_K
        assert 0 < r.jaccard_bp <= 10000


def test_dedup_savings_cumulative_monotone(spark):
    rows = P.dedup_savings_curve(spark, SF_SMOKE).collect()
    prev = 0
    for r in rows:  # ordered by size desc; cumulative share only grows
        assert r.docs_removed == (r.size - 1) * r.n_clusters
        assert r.cum_savings_bp >= prev
        prev = r.cum_savings_bp
        assert 0 <= r.cum_savings_bp <= 10000


def test_dup_graph_degree_mass_matches_pairs(spark):
    from spark_streaming_testbed_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    rows = P.dup_graph_degrees(spark, SF_SMOKE).collect()
    n_pairs = ngram_jaccard_pairs(spark, SF_SMOKE).count()
    # handshake lemma: sum(deg * count) == 2 * |edges|
    assert sum(r.deg * r.n_docs for r in rows) == 2 * n_pairs


def test_jaccard_histogram_mass(spark):
    from spark_streaming_testbed_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    rows = P.jaccard_histogram(spark, SF_SMOKE).collect()
    assert sum(r.n_pairs for r in rows) == \
        ngram_jaccard_pairs(spark, SF_SMOKE).count()
    assert all(0 <= r.bin < P.JACC_HIST_BINS for r in rows)


def test_session_depth_dist_mass(spark):
    rows = P.session_depth_dist(spark, SF_SMOKE).collect()
    from spark_streaming_testbed_spark.session import load_table

    n_users = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == n_users
    assert all(r.n_sessions >= 1 for r in rows)


def test_cooccurrence_lift_identities(spark):
    rows = P.session_cooccurrence_lift(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_both <= min(r.n_a, r.n_b)
        assert 0 < r.support_bp <= 10000
        assert 0 < r.confidence_bp <= 10000
        assert r.lift_micro > 0


def test_part_growth_movers_sorted_desc(spark):
    rows = P.part_growth_movers(spark, SF_SMOKE).collect()
    assert len(rows) <= P.MOVERS_TOP_N
    for a, b in zip(rows, rows[1:]):
        assert (a.growth_bp, -a.l_partkey) >= (b.growth_bp, -b.l_partkey)
    for r in rows:
        assert r.prev_cents > 0


def test_uniform_negatives_contract(spark):
    rows = P.uniform_negatives(spark, SF_SMOKE).collect()
    per_q: dict = {}
    for r in rows:
        assert r.q_label != r.c_label  # negatives only
        per_q.setdefault(r.q_id, []).append(r.rk)
    for rks in per_q.values():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= P.NEG_PER_QUERY
    # determinism: a second run produces the identical sample
    assert rows == P.uniform_negatives(spark, SF_SMOKE).collect()


def test_temporal_split_covers_everything(spark):
    from spark_streaming_testbed_spark.session import load_table

    rows = {r.split: r
            for r in P.temporal_split_audit(spark, SF_SMOKE).collect()}
    events = load_table(spark, SF_SMOKE, "events")
    assert rows["train"].n_rows + rows["test"].n_rows == events.count()
    for r in rows.values():
        assert r.n_seen_users <= r.n_users or r.split == "test"
        assert 0 <= r.seen_user_bp <= 10000


def test_ts_feature_table_window_identities(spark):
    rows = P.ts_feature_table(spark, SF_SMOKE).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for grp in by_type.values():
        grp.sort(key=lambda r: r.day)
        assert grp[0].lag1 is None
        for prev, cur in zip(grp, grp[1:]):
            assert cur.lag1 == prev.dm
        for i, r in enumerate(grp):
            window = [g.dm for g in grp[max(0, i - 6): i + 1]]
            assert abs(r.roll7_mean - sum(window) / len(window)) < 1e-5


def test_fulfillment_lag_shares_per_month(spark):
    rows = P.fulfillment_lag_hist(spark, SF_SMOKE).collect()
    by_mon: dict = {}
    for r in rows:
        by_mon.setdefault(r.mon, []).append(r)
    for grp in by_mon.values():
        s = sum(r.share_bp for r in grp)
        assert 10000 - len(grp) <= s <= 10000  # truncation loses <1bp/row


def test_segment_migration_covers_all_users(spark):
    from spark_streaming_testbed_spark.session import load_table

    rows = P.segment_migration(spark, SF_SMOKE).collect()
    n_users = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == n_users
    segs = {"high", "mid", "low", "inactive"}
    for r in rows:
        assert r.from_seg in segs and r.to_seg in segs


def test_weekday_profile_shares(spark):
    rows = P.weekday_activity_profile(spark, SF_SMOKE).collect()
    by_dow: dict = {}
    for r in rows:
        assert 1 <= r.iso_dow <= 7
        by_dow.setdefault(r.iso_dow, []).append(r)
    for grp in by_dow.values():
        s = sum(r.share_bp for r in grp)
        assert 10000 - len(grp) <= s <= 10000


def test_repeat_purchase_gaps_positive(spark):
    rows = P.repeat_purchase_gaps(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.gap_days >= 1  # distinct days => gaps of at least a day
        assert r.n_gaps > 0


def test_partition_scheme_advisor_invariants(spark):
    from spark_streaming_testbed_spark.operators.prep import (
        partition_scheme_advisor,
    )
    from tests.conftest import SF_SMOKE

    rows = {
        r.scheme: r
        for r in partition_scheme_advisor(spark, SF_SMOKE).collect()
    }
    assert set(rows) == {"day", "hour", "type", "day_type"}
    for r in rows.values():
        assert r.max_partition_rows >= r.avg_partition_rows
        assert r.skew_bp >= 10000  # max/avg is at least balanced
    # finer keys mean at least as many partitions
    assert rows["day_type"].n_partitions >= rows["day"].n_partitions
    assert rows["hour"].n_partitions >= rows["day"].n_partitions


def test_t_closeness_rollup_invariants(spark):
    from spark_streaming_testbed_spark.operators.prep import (
        t_closeness_audit,
    )
    from tests.conftest import SF_SMOKE

    rows = t_closeness_audit(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.n_violations <= r.n_classes
        assert 0 <= r.violation_bp <= 10000
        # EMD in bp of the bucket span can never exceed the span
        assert 0 <= r.max_t_bp <= 10000
