"""Property tests for the round-5 modeling operators (statistical-law
fits, survival analysis, interval concurrency, incremental maintenance).

The oracle-parity test already proves value equality vs DuckDB; these
pin the SEMANTIC invariants each operator's math must satisfy, so a
future edit that keeps cross-engine parity but breaks the statistics
(e.g. dropping censoring from Kaplan-Meier) still fails."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_testbed_spark.operators import modeling as M
from tests.conftest import SF_SMOKE


def test_zipf_slope_is_negative_power_law(spark):
    row = M.zipf_token_slope(spark, SF_SMOKE).first()
    # the synthetic corpus has a small closed vocabulary (~31 tokens),
    # so the fit covers min(vocab, K) points
    assert 2 <= row.n_tokens <= M.ZIPF_TOP_K
    # frequency must fall with rank; any natural-ish corpus sits well
    # below zero (a flat corpus would be ~0, perfect Zipf -100000)
    assert row.slope_e5 < 0


def test_heaps_curve_monotone_and_bounded(spark):
    rows = M.heaps_vocab_curve(spark, SF_SMOKE).collect()
    assert rows, "empty Heaps curve"
    prev_t, prev_v = 0, 0
    for r in rows:
        assert r.cum_tokens >= prev_t and r.cum_vocab >= prev_v
        # vocabulary can never exceed the tokens that introduced it
        assert r.cum_vocab <= r.cum_tokens
        prev_t, prev_v = r.cum_tokens, r.cum_vocab


def test_concurrency_timeline_bounded_by_users(spark):
    from spark_streaming_testbed_spark.session import load_table

    out = M.concurrent_sessions_timeline(spark, SF_SMOKE)
    n_users = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id").distinct().count()
    )
    mx = out.agg(F.max("n_active")).first()[0]
    # a user holds at most one open session at a time, so hourly
    # concurrency can never exceed the user population
    assert 1 <= mx <= n_users


def test_incremental_merge_equals_full_recompute(spark):
    """The materialized-view contract itself: merging the two partial
    aggregates must equal a one-shot groupBy over the union."""
    from spark_streaming_testbed_spark.session import load_table

    merged = {
        (r.mon, r.o_orderpriority): (r.n_orders, r.revenue_cents)
        for r in M.incremental_agg_merge(spark, SF_SMOKE).collect()
    }
    full = {
        (r.mon, r.o_orderpriority): (r.n_orders, r.revenue_cents)
        for r in load_table(spark, SF_SMOKE, "orders")
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("mon"),
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.expr("cast(round(o_totalprice * 100) as bigint)")
            ).alias("revenue_cents"),
        )
        .collect()
    }
    assert merged == full


def test_survival_curve_is_monotone_decreasing(spark):
    rows = M.survival_km_curve(spark, SF_SMOKE).collect()
    assert rows, "no event times — KM curve empty"
    prev = 1_000_000
    for r in rows:
        assert 0 <= r.surv_milli <= prev, "S(t) must be non-increasing"
        assert r.d_events >= 1 and r.n_risk >= r.d_events
        prev = r.surv_milli
    # risk sets shrink as t grows
    risks = [r.n_risk for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_survival_counts_censored_subjects_in_risk_sets(spark):
    """With censoring, the first risk set must exceed the total number
    of observed events (censored subjects are at risk too) — deleting
    the censored branch would make them equal."""
    rows = M.survival_km_curve(spark, SF_SMOKE).collect()
    total_events = sum(r.d_events for r in rows)
    assert rows[0].n_risk > total_events


def test_assortativity_is_a_correlation(spark):
    # sf0.001 has no co-activity edges (no two users share a cell):
    # the degenerate graph must report 0 edges and a NULL coefficient,
    # never a fabricated number
    row = M.degree_assortativity(spark, SF_SMOKE).first()
    if row.n_edges == 0:
        assert row.assortativity_micro is None
    else:
        assert -1_000_000 <= row.assortativity_micro <= 1_000_000


def test_assortativity_on_a_known_graph(spark):
    """A star graph is maximally DISassortative: hubs (deg n-1) link
    only to leaves (deg 1), so r = -1 exactly."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # five users in one (event_type, minute) cell with user 0 — build a
    # star by giving each leaf its own cell shared ONLY with the hub
    rows = []
    for i, leaf in enumerate([1, 2, 3, 4, 5]):
        t = base + dt.timedelta(minutes=i)
        rows.append((0, t, "click"))
        rows.append((leaf, t, "click"))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    from spark_streaming_testbed_spark.operators.advanced import (
        _coactivity_edges,
    )

    edges = _coactivity_edges(df)
    assert edges.count() == 10  # 5 undirected star edges, both directions
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    xy = (
        edges.join(deg.select("src", F.col("deg").alias("dx")), "src")
        .join(
            deg.select(F.col("src").alias("dst"), F.col("deg").alias("dy")),
            "dst",
        )
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("dx").cast("double").alias("sx"),
        F.sum("dy").cast("double").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).cast("double").alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).cast("double").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("double").alias("syy"),
    ).first()
    num = s.n * s.sxy - s.sx * s.sy
    den = ((s.n * s.sxx - s.sx**2) * (s.n * s.syy - s.sy**2)) ** 0.5
    assert abs(num / den - (-1.0)) < 1e-9


def test_uplift_slope_covers_every_brand(spark):
    from spark_streaming_testbed_spark.session import load_table

    out = M.discount_uplift_slope(spark, SF_SMOKE)
    n_brands = (
        load_table(spark, SF_SMOKE, "part")
        .select("p_brand").distinct().count()
    )
    assert out.count() == n_brands


def test_streaming_topk_equals_batch_topk(spark):
    """batch == stream: the complete-mode leaderboard must equal the
    batch group-by + rank over the same events."""
    from spark_streaming_testbed_spark.session import load_table
    from spark_streaming_testbed_spark.streaming.stateful import (
        TOPK_USERS_K,
        streaming_topk_users,
    )

    got = [
        (r.user_id, r.n_purchases, r.rnk)
        for r in streaming_topk_users(spark, SF_SMOKE).collect()
    ]
    from pyspark.sql.window import Window as W

    batch = (
        load_table(spark, SF_SMOKE, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .select(
            "user_id", "n_purchases",
            F.row_number().over(
                W.orderBy(F.col("n_purchases").desc(), F.col("user_id"))
            ).alias("rnk"),
        )
        .where(F.col("rnk") <= TOPK_USERS_K)
        .orderBy("rnk")
    )
    want = [(r.user_id, r.n_purchases, r.rnk) for r in batch.collect()]
    assert got == want


# --- round-5 batch 2 ---------------------------------------------------


def test_rrf_prefers_docs_ranked_by_both(spark):
    rows = M.reciprocal_rank_fusion(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    assert [r.fused_rank for r in rows] == list(range(1, 21))
    # a doc present in both lists must outrank a doc with only one
    # equal-rank contribution
    both = [r for r in rows if r.rank_a > 0 and r.rank_b > 0]
    assert both, "no doc made both top-100 lists"
    # rrf scores non-increasing down the fused list
    scores = [r.rrf_e6 for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_abc_classes_partition_revenue(spark):
    from spark_streaming_testbed_spark.session import load_table

    rows = {r.abc_class: r for r in
            M.abc_classification(spark, SF_SMOKE).collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    n_parts = sum(r.n_parts for r in rows.values())
    assert n_parts == (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_partkey").distinct().count()
    )
    # A-class carries the bulk of revenue with the fewest parts
    if "C" in rows:
        assert rows["A"].share_bp > rows["C"].share_bp
    assert sum(r.share_bp for r in rows.values()) <= 10000


def test_new_vs_returning_accounting(spark):
    from spark_streaming_testbed_spark.session import load_table

    rows = M.new_vs_returning(spark, SF_SMOKE).collect()
    total_new = sum(r.new_users for r in rows)
    n_users = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id").distinct().count()
    )
    # every user is new exactly once
    assert total_new == n_users
    # day one has no returning users
    assert rows[0].returning_users == 0


def test_decile_curve_is_top_heavy_and_complete(spark):
    rows = M.user_decile_curve(spark, SF_SMOKE).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    # decile 1 (most active) has at least the share of decile 10
    assert rows[0].share_bp >= rows[-1].share_bp
    assert 9990 <= sum(r.share_bp for r in rows) <= 10000


def test_also_bought_rank_contract(spark):
    rows = M.also_bought_topn(spark, SF_SMOKE).collect()
    assert rows
    per_anchor: dict = {}
    for r in rows:
        per_anchor.setdefault(r.anchor, []).append(r)
    assert len(per_anchor) <= M.ALSO_BOUGHT_ANCHORS
    for recs in per_anchor.values():
        assert len(recs) <= M.ALSO_BOUGHT_N
        counts = [r.n_both for r in recs]
        assert counts == sorted(counts, reverse=True)
        assert all(r.reco != r.anchor for r in recs)


def test_burst_flags_only_real_bursts(spark):
    from spark_streaming_testbed_spark.session import load_table

    rows = M.burst_velocity_flags(spark, SF_SMOKE).collect()
    for r in rows:
        assert r.max_in_60s >= M.BURST_MIN_EVENTS
    # verify one flagged user really has two events within 60 s
    if rows:
        u = rows[0].user_id
        secs = sorted(
            r.sec
            for r in load_table(spark, SF_SMOKE, "events")
            .where(F.col("user_id") == u)
            .select((F.unix_millis("ts") / 1000).cast("long").alias("sec"))
            .collect()
        )
        assert any(
            b - a <= M.BURST_WINDOW_S - 1 for a, b in zip(secs, secs[1:])
        )


def test_order_batches_cover_all_orders(spark):
    from spark_streaming_testbed_spark.session import load_table

    rows = M.order_batching_windows(spark, SF_SMOKE).collect()
    total_orders = sum(r.batch_size * r.n_batches for r in rows)
    assert total_orders == load_table(spark, SF_SMOKE, "orders").count()


# --- round-5 batch 3 ---------------------------------------------------


def test_minhash_estimator_is_plausible(spark):
    from spark_streaming_testbed_spark.operators.dedup import (
        MINHASH_K,
        minhash_estimate_error,
    )

    rows = minhash_estimate_error(spark, SF_SMOKE).collect()
    step = 1_000_000 // MINHASH_K
    for r in rows:
        # estimates land on the K-grid and stay in [0, 1]
        assert r.est_milli % step == 0
        assert 0 <= r.est_milli <= 1_000_000
        assert r.abs_err_milli == abs(r.est_milli - r.true_milli)


def test_cms_never_undercounts(spark):
    from spark_streaming_testbed_spark.operators.sketches import (
        CMS_REPORT_K,
        cms_frequency_estimates,
    )

    rows = cms_frequency_estimates(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= CMS_REPORT_K
    for r in rows:
        # the count-min guarantee: estimate >= truth, always
        assert r.overcount >= 0
        assert r.est_cnt == r.true_cnt + r.overcount


def test_session_conversion_consistent_with_sessions(spark):
    rows = M.session_conversion_rate(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_converted <= r.n_sessions
        assert 0 <= r.conversion_bp <= 10000


def test_chi2_cells_cover_all_orders(spark):
    from spark_streaming_testbed_spark.session import load_table

    rows = M.chi2_independence_audit(spark, SF_SMOKE).collect()
    assert sum(r.n_obs for r in rows) == load_table(
        spark, SF_SMOKE, "orders"
    ).count()
    for r in rows:
        assert r.exp_cnt_micro > 0
        assert r.chi2_micro >= 0


# --- round-5: ACF / changepoint / PSI / link prediction ------------------


def test_acf_is_bounded_and_lag_monotone_pairs(spark):
    rows = M.acf_daily_orders(spark, SF_SMOKE).collect()
    assert [r.lag for r in rows] == list(range(1, M.ACF_MAX_LAG + 1))
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs == b.n_pairs + 1  # one fewer pair per extra lag
    for r in rows:
        assert -1000 <= r.acf_milli <= 1000


def test_changepoint_partitions_all_days(spark):
    from spark_streaming_testbed_spark.session import load_table

    (row,) = M.changepoint_daily_orders(spark, SF_SMOKE).collect()
    n_days = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_orderdate")
        .distinct()
        .count()
    )
    assert row.n_left + row.n_right == n_days
    assert row.n_left >= 1 and row.n_right >= 1
    # between-segment SSE reduction is non-negative by construction
    assert row.gain_micro >= 0


def test_psi_bins_cover_all_orders(spark):
    from spark_streaming_testbed_spark.session import load_table

    rows = M.psi_price_drift(spark, SF_SMOKE).collect()
    assert len(rows) == M.PSI_BINS
    covered = sum(r.n_first + r.n_second for r in rows)
    assert covered == load_table(spark, SF_SMOKE, "orders").count()
    # PSI is a sum of same-sign products; quantization can only push a
    # term epsilon-negative at the zero boundary
    assert sum(r.psi_term_e10 for r in rows) >= -10_000


def test_link_prediction_pairs_are_non_adjacent(spark):
    """Runs at sf0.01: the sf0.001 co-activity graph is empty (no two
    users share a cell), which the oracle confirms as an empty result;
    the invariants need actual wedges."""
    from tests.conftest import SF_CORRECT

    from spark_streaming_testbed_spark.operators.advanced import (
        _coactivity_edges,
    )
    from spark_streaming_testbed_spark.session import load_table

    rows = M.link_prediction_topk(spark, SF_CORRECT).collect()
    assert 0 < len(rows) <= M.LP_TOP_K
    edges = {
        (r.src, r.dst)
        for r in _coactivity_edges(
            load_table(spark, SF_CORRECT, "events")
        ).collect()
    }
    for r in rows:
        assert r.u < r.v
        assert (r.u, r.v) not in edges
        assert r.cn >= 1
        assert 0 < r.jaccard_bp <= 10000


def test_kendall_pair_accounting(spark):
    (row,) = M.kendall_rank_stability(spark, SF_SMOKE).collect()
    k = M.KENDALL_TOP_PARTS
    assert 0 < row.n_parts <= k  # actual anchor count, not the LIMIT
    assert row.n_pairs == row.n_parts * (row.n_parts - 1) // 2
    assert row.concordant + row.discordant == row.n_pairs
    assert -1000 <= row.tau_milli <= 1000
