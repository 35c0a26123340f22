"""Invariant tests for the layout (z-order, compaction) and analytics
(markov, anomaly, regression) operators plus the edit-distance join's
blocking soundness. Oracle equality is covered by test_oracle_parity;
these pin the properties the designs claim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_testbed_spark.operators.advanced import (
    groupwise_regression,
    markov_transitions,
    rolling_anomaly,
)
from spark_streaming_testbed_spark.operators.dedup import (
    EDIT_MAX_DIST,
    EDIT_PREFIX_LEN,
    edit_distance_pairs,
)
from spark_streaming_testbed_spark.session import load_table
from spark_streaming_testbed_spark.sources.warehouse import (
    COMPACT_TARGET_BYTES,
    compaction_plan,
    zorder_layout,
)
from tests.conftest import SF_SMOKE


def test_edit_distance_blocking_finds_every_true_pair(spark):
    """The PPJoin prefix filter must lose NO pair within the distance
    bound: compare against a brute-force cross join."""
    got = {
        (r.doc_a, r.doc_b, r.dist)
        for r in edit_distance_pairs(spark, SF_SMOKE).collect()
    }
    p = (
        load_table(spark, SF_SMOKE, "documents")
        .where(F.length("text") >= EDIT_PREFIX_LEN)
        .select("doc_id", F.substring("text", 1, EDIT_PREFIX_LEN).alias("s"))
    )
    a = p.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    b = p.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    brute = {
        (r.doc_a, r.doc_b, r.dist)
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("dist", F.levenshtein("sa", "sb"))
        .where(F.col("dist") <= EDIT_MAX_DIST)
        .collect()
    }
    assert got == brute and len(got) > 0


def test_zorder_files_cover_narrow_rectangles(spark):
    """Z-ordered files must each span a small slice of the key space:
    the mean per-file user_id range should be well under the global
    range (unclustered random packing would give ~the full range)."""
    rows = zorder_layout(spark, SF_SMOKE).collect()
    assert len(rows) == 16
    spans = [r.u_max - r.u_min for r in rows]
    global_span = max(r.u_max for r in rows) - min(r.u_min for r in rows)
    assert sum(spans) / len(spans) <= 0.55 * global_span
    assert sum(r.n_rows for r in rows) == load_table(
        spark, SF_SMOKE, "events"
    ).count()


def test_compaction_bins_are_bounded_and_monotonic(spark):
    rows = compaction_plan(spark, SF_SMOKE).collect()
    # plan covers every chunk, bins appear in key order
    bins: dict[int, int] = {}
    prev_bin = 0
    for r in rows:
        assert r.bin_id >= prev_bin
        prev_bin = r.bin_id
        bins[r.bin_id] = bins.get(r.bin_id, 0) + r.est_bytes
    max_chunk = max(r.est_bytes for r in rows)
    # streaming rule: a bin never exceeds target + one chunk overhang
    for total in bins.values():
        assert total <= COMPACT_TARGET_BYTES + max_chunk


def test_markov_rows_are_probabilities(spark):
    rows = markov_transitions(spark, SF_SMOKE).collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        assert 0.0 <= r.p <= 1.0
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p
    for prev, s in by_prev.items():
        assert abs(s - 1.0) < 1e-4, (prev, s)


def test_rolling_anomaly_flags_only_extreme_minutes(spark):
    rows = rolling_anomaly(spark, SF_SMOKE).collect()
    assert rows[0].z is None and not rows[0].anomaly
    for r in rows:
        if r.anomaly:
            assert r.z is not None and abs(r.z) > 2.0
        elif r.z is not None:
            assert abs(r.z) <= 2.0


def test_regression_stats_are_well_formed(spark):
    rows = groupwise_regression(spark, SF_SMOKE).collect()
    ev_n = load_table(spark, SF_SMOKE, "events").count()
    assert sum(r.n for r in rows) == ev_n
    for r in rows:
        assert 0.0 <= r.r2 <= 1.0


def test_pagerank_is_a_distribution_over_the_graph(spark):
    from tests.conftest import SF_CORRECT

    from spark_streaming_testbed_spark.operators.advanced import (
        pagerank_coactivity,
    )

    rows = pagerank_coactivity(spark, SF_CORRECT).collect()
    assert len(rows) > 0
    total = sum(r.rank for r in rows)
    # symmetric graph, no dangling mass: ranks stay a distribution
    assert abs(total - 1.0) < 1e-3
    assert all(r.rank > 0 for r in rows)


def test_session_paths_cover_every_session(spark):
    from spark_streaming_testbed_spark.operators.advanced import (
        SESSION_GAP_MS,
        session_paths,
    )

    rows = session_paths(spark, SF_SMOKE).collect()
    assert all(1 <= len(r.path.split(">")) <= 3 for r in rows)
    n_paths = sum(r.n_sessions for r in rows)
    # cross-check the session count against the independent
    # session_window-based operator (same 30-min gap semantics)
    from spark_streaming_testbed_spark.operators.advanced import sessionize

    n_sessions = sessionize(spark, SF_SMOKE).count()
    assert n_paths == n_sessions


def test_rfm_scores_are_quintiles_over_all_users(spark):
    from spark_streaming_testbed_spark.operators.advanced import rfm_features

    rows = rfm_features(spark, SF_SMOKE).collect()
    n_users = load_table(spark, SF_SMOKE, "events").select(
        "user_id"
    ).distinct().count()
    assert len(rows) == n_users
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 \
            and 1 <= r.m_score <= 5
        assert r.recency_days >= 0 and r.frequency > 0


def test_rate_timeline_spine_is_complete(spark):
    from spark_streaming_testbed_spark.operators.advanced import rate_timeline

    rows = rate_timeline(spark, SF_SMOKE).collect()
    minutes = [r.minute_ms for r in rows]
    assert minutes == list(
        range(minutes[0], minutes[-1] + 60_000, 60_000)
    )
    assert sum(r.cnt for r in rows) == load_table(
        spark, SF_SMOKE, "events"
    ).count()
    assert any(r.cnt == 0 for r in rows)  # the zeros are the point


def test_embedding_covariance_is_a_valid_gram(spark):
    from spark_streaming_testbed_spark.operators.similarity import (
        EMB_DIM,
        embedding_covariance,
    )

    rows = embedding_covariance(spark, SF_SMOKE).collect()
    assert len(rows) == EMB_DIM * (EMB_DIM + 1) // 2
    var = {r.i: r.cov for r in rows if r.i == r.j}
    assert len(var) == EMB_DIM and all(v >= 0 for v in var.values())
    # Cauchy-Schwarz: |cov(i,j)| <= sqrt(var_i * var_j) (+rounding slack)
    for r in rows:
        bound = (var[r.i] * var[r.j]) ** 0.5 + 1e-5
        assert abs(r.cov) <= bound, (r.i, r.j, r.cov, bound)


def test_dq_report_flags_are_consistent(spark):
    from spark_streaming_testbed_spark.operators.relational import dq_report

    rows = dq_report(spark, SF_SMOKE).collect()
    assert len(rows) == 11
    for r in rows:
        assert r.passed == (r.n_violations == 0)
        assert r.n_violations >= 0
    # the suite must exercise BOTH outcomes on this corpus
    assert any(not r.passed for r in rows)
    assert any(r.passed for r in rows)


def test_scd2_ranges_are_contiguous_and_single_current(spark):
    from collections import defaultdict

    from spark_streaming_testbed_spark.operators.relational import scd2_build

    rows = scd2_build(spark, SF_SMOKE).collect()
    by_cust = defaultdict(list)
    for r in rows:
        by_cust[r.custkey].append(r)
    for cust, versions in by_cust.items():
        versions.sort(key=lambda r: r.version_no)
        assert [v.version_no for v in versions] == list(
            range(1, len(versions) + 1)
        )
        assert sum(v.is_current for v in versions) == 1
        assert versions[-1].is_current and versions[-1].valid_to_ms is None
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to_ms == b.valid_from_ms  # contiguous, no gaps
            assert a.segment != b.segment  # true SCD2: runs collapsed


def test_file_skipping_zorder_dominates_arrival(spark):
    """The point of the audit: under every predicate the z-order layout
    scans no more files than arrival order, and on at least one
    predicate it strictly prunes where arrival order cannot."""
    from spark_streaming_testbed_spark.sources.warehouse import (
        file_skipping_audit,
    )
    from tests.conftest import SF_SMOKE

    rows = file_skipping_audit(spark, SF_SMOKE).collect()
    by_pred: dict = {}
    for r in rows:
        by_pred.setdefault(r.pred, {})[r.layout] = r
    strict = 0
    for pred, d in by_pred.items():
        assert set(d) == {"arrival", "zorder"}
        assert d["zorder"].n_scanned <= d["arrival"].n_scanned
        assert d["zorder"].n_files == d["arrival"].n_files
        if d["zorder"].n_scanned < d["arrival"].n_scanned:
            strict += 1
    assert strict >= 1
