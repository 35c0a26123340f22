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
