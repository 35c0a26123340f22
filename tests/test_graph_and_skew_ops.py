"""Property tests for the round-3 graph / time-series / blocking /
skew-audit operators, beyond their DuckDB oracle parity:

- triangle_count vs a driver-side brute-force enumeration of the same
  (small) co-activity graph,
- ewma_smooth bounds and single-event fixpoints,
- snm_candidate_pairs neighborhood completeness/counts,
- partition_skew_report internal consistency (the salt advisor must
  agree with its own max/mean inputs).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from spark_streaming_testbed_spark.operators.advanced import (
    _coactivity_edges,
    ewma_smooth,
    triangle_count,
)
from spark_streaming_testbed_spark.operators.dedup import (
    SNM_WINDOW,
    snm_candidate_pairs,
)
from spark_streaming_testbed_spark.operators.relational import (
    partition_skew_report,
)
from spark_streaming_testbed_spark.session import load_table
from tests.conftest import SF_CORRECT, SF_SMOKE


def test_triangle_count_matches_brute_force(spark):
    """The degree-oriented wedge join must count exactly the triangles a
    naive all-combinations enumeration finds on the same edge set.
    Runs at sf0.01 — the sf0.001 co-activity graph is empty (no two
    users ever share a cell), which only exercises the degenerate path.
    """
    ev = load_table(spark, SF_CORRECT, "events")
    edges = {
        (r.src, r.dst)
        for r in _coactivity_edges(ev).collect()
        if r.src < r.dst
    }
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    brute = sum(
        1
        for u, v in edges
        for w in adj[u]
        if w > v and w in adj[v]
    )
    row = triangle_count(spark, SF_CORRECT).collect()[0]
    assert row.n_triangles == brute
    assert row.n_edges == len(edges)
    # wedges >= 3*triangles always (every triangle closes 3 wedges)
    assert row.n_wedges >= 3 * row.n_triangles
    if row.n_wedges:
        assert 0.0 <= row.clustering_coeff <= 1.0


def test_ewma_stays_inside_value_envelope(spark):
    """A convex combination can never leave [min, max] of the folded
    values, and a single-event user's EWMA is exactly that value."""
    out = ewma_smooth(spark, SF_SMOKE)
    env = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    bad = (
        out.join(env, "user_id")
        .where((F.col("ewma") < F.col("lo")) | (F.col("ewma") > F.col("hi")))
        .count()
    )
    assert bad == 0
    singles = out.where(
        (F.col("n_events") == 1) & (F.col("ewma") != F.col("last_value"))
    ).count()
    assert singles == 0


def test_snm_neighborhood_is_complete(spark):
    """Every sorted-order pair within the window must appear exactly
    once: with n docs and window w the candidate count is
    (w-1)*n - (1+2+...+(w-1)), and per-gap multiplicity is n-gap."""
    pairs = snm_candidate_pairs(spark, SF_SMOKE)
    n = load_table(spark, SF_SMOKE, "documents").count()
    w = SNM_WINDOW
    expected = (w - 1) * n - sum(range(1, w))
    assert pairs.count() == expected
    per_gap = {r.gap: r.cnt for r in
               pairs.groupBy("gap").agg(F.count("*").alias("cnt")).collect()}
    assert per_gap == {g: n - g for g in range(1, w)}
    # no pair may appear twice and no self-pairs
    assert pairs.select("doc_a", "doc_b").distinct().count() == expected
    assert pairs.where(F.col("doc_a") == F.col("doc_b")).count() == 0


def test_snm_sort_keys_are_adjacent(spark):
    """gap=1 pairs must be true sort neighbors: key_a <= key_b in the
    normalized collation (ties broken by doc_id)."""
    pairs = snm_candidate_pairs(spark, SF_SMOKE).where(F.col("gap") == 1)
    bad = pairs.where(
        (F.col("key_a") > F.col("key_b"))
        | ((F.col("key_a") == F.col("key_b")) & (F.col("doc_a") > F.col("doc_b")))
    ).count()
    assert bad == 0


def test_skew_report_is_internally_consistent(spark):
    import math

    row = partition_skew_report(spark, SF_SMOKE).collect()[0]
    assert row.n_keys > 0 and row.n_rows > 0
    assert row.p50_key_rows <= row.p99_key_rows <= row.max_key_rows
    mean = row.n_rows / row.n_keys
    assert abs(row.skew_ratio - row.max_key_rows / mean) < 1e-4
    assert row.salt_factor == math.ceil(row.max_key_rows / mean)
    # entropy of a distribution over n_keys outcomes is <= ln(n_keys)
    assert 0.0 <= row.key_entropy <= math.log(row.n_keys) + 1e-9
    assert 0.0 < row.top_key_share <= 1.0


def test_streaming_ewma_equals_batch_ewma(spark):
    """Chunked cross-trigger state folding must be bitwise identical to
    the one-shot batch fold (same IEEE754 literals, same order)."""
    from spark_streaming_testbed_spark.streaming.stateful import (
        streaming_ewma,
    )

    batch = {tuple(r) for r in ewma_smooth(spark, SF_SMOKE).collect()}
    stream = {tuple(r) for r in streaming_ewma(spark, SF_SMOKE).collect()}
    assert batch == stream


def test_pmi_pairs_respect_floor_and_ordering(spark):
    from spark_streaming_testbed_spark.operators.text import (
        PMI_MIN_COUNT,
        pmi_collocations,
    )

    rows = pmi_collocations(spark, SF_CORRECT).collect()
    assert rows, "corpus should yield at least one collocation"
    assert all(r.n_pair >= PMI_MIN_COUNT for r in rows)
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    # lift is a ratio of probabilities: positive, and bounded by
    # min(1/p(x), 1/p(y)) <= n_tokens
    assert all(0 < r.lift for r in rows)


def test_knn_graph_restricted_to_queries_equals_ann_lsh(spark):
    """knn_graph is the all-pairs generalization of ann_lsh_topk: on
    the first N_QUERIES vectors (same buckets, same rounded-cosine
    ranking, same k) the two must produce identical edges."""
    from spark_streaming_testbed_spark.operators.similarity import (
        N_QUERIES,
        ann_lsh_topk,
        knn_graph,
    )

    knn = {
        (r.v_id, r.rk, r.nn_id, r.cosine)
        for r in knn_graph(spark, SF_CORRECT).collect()
        if r.v_id < N_QUERIES
    }
    ann = {
        (r.q_id, r.rk, r.c_id, r.cosine)
        for r in ann_lsh_topk(spark, SF_CORRECT).collect()
    }
    assert knn == ann


def test_knn_graph_neighbors_share_bucket(spark):
    from spark_streaming_testbed_spark.operators.similarity import (
        _lsh_signature_col,
        knn_graph,
    )

    emb = load_table(spark, SF_CORRECT, "embeddings").select(
        "vec_id", _lsh_signature_col().alias("bucket")
    )
    g = knn_graph(spark, SF_CORRECT)
    joined = (
        g.join(emb.withColumnRenamed("vec_id", "v_id"), "v_id")
        .withColumnRenamed("bucket", "b_v")
        .join(emb.withColumnRenamed("vec_id", "nn_id"), "nn_id")
    )
    assert joined.where(F.col("b_v") != F.col("bucket")).count() == 0


def test_ts_similarity_pairs_are_valid_correlations(spark):
    from spark_streaming_testbed_spark.operators.advanced import (
        ts_similarity_pairs,
    )

    rows = ts_similarity_pairs(spark, SF_CORRECT).collect()
    assert rows, "identical activity bitmaps should exist in the corpus"
    assert all(-1.0 - 1e-9 <= r.pearson_r <= 1.0 + 1e-9 for r in rows)
    assert all(r.user_a < r.user_b for r in rows)
    rs = [r.pearson_r for r in rows]
    assert rs == sorted(rs, reverse=True)


def test_upsert_merge_partitions_keys_exactly(spark):
    """Merged keyset == base ∪ updates; actions partition it: inserts
    are update-only keys, keeps are base-only keys, updates the rest."""
    from spark_streaming_testbed_spark.operators.relational import (
        upsert_merge,
    )

    m = upsert_merge(spark, SF_CORRECT)
    orders = load_table(spark, SF_CORRECT, "orders")
    base_keys = {
        r.o_orderkey
        for r in orders.where("o_orderdate < timestamp '1998-01-01'")
        .select("o_orderkey").collect()
    }
    upd_keys = {
        r.o_orderkey
        for r in orders.where("o_orderdate >= timestamp '1997-01-01'")
        .select("o_orderkey").collect()
    }
    rows = m.collect()
    assert {r.o_orderkey for r in rows} == base_keys | upd_keys
    assert {r.o_orderkey for r in rows if r.action == "insert"} \
        == upd_keys - base_keys
    assert {r.o_orderkey for r in rows if r.action == "keep"} \
        == base_keys - upd_keys
    assert {r.o_orderkey for r in rows if r.action == "update"} \
        == base_keys & upd_keys


def test_cep_matches_are_ordered_chains_within_bounds(spark):
    from spark_streaming_testbed_spark.operators.advanced import (
        CEP_STEP_GAP_MS,
        cep_pattern_match,
    )

    rows = cep_pattern_match(spark, SF_CORRECT).collect()
    assert rows, "6-hour chains must exist at sf0.01"
    for r in rows:
        assert r.v_ms < r.c_ms <= r.v_ms + CEP_STEP_GAP_MS
        assert r.c_ms < r.p_ms <= r.c_ms + CEP_STEP_GAP_MS
        assert r.span_ms == r.p_ms - r.v_ms


def test_column_histogram_reconciles_and_covers_range(spark):
    from spark_streaming_testbed_spark.operators.relational import (
        HIST_BINS,
        column_histograms,
    )

    rows = column_histograms(spark, SF_CORRECT).collect()
    n = load_table(spark, SF_CORRECT, "events").count()
    assert sum(r.cnt for r in rows) == n
    assert all(0 <= r.bin < HIST_BINS for r in rows)
    for r in rows:
        assert r.bin_lo < r.bin_hi


def test_json_extract_parses_every_row(spark):
    from spark_streaming_testbed_spark.operators.relational import (
        json_extract_stats,
    )

    rows = json_extract_stats(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert r.n_parsed == r.n_rows  # corpus props are all well-formed
        assert r.min_k <= r.max_k


def test_bm25_scores_positive_and_ranked(spark):
    from spark_streaming_testbed_spark.operators.text import (
        BM25_TOP_K,
        bm25_retrieval,
    )

    rows = bm25_retrieval(spark, SF_CORRECT).collect()
    assert 0 < len(rows) <= BM25_TOP_K
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_hard_negatives_are_cross_label_and_harder_than_rank(spark):
    from spark_streaming_testbed_spark.operators.similarity import (
        HARD_NEG_K,
        N_QUERIES,
        hard_negatives,
    )

    rows = hard_negatives(spark, SF_CORRECT).collect()
    assert rows
    by_anchor = {}
    for r in rows:
        assert r.a_label != r.n_label
        assert 1 <= r.rk <= HARD_NEG_K
        assert r.a_id < N_QUERIES
        by_anchor.setdefault(r.a_id, []).append((r.rk, r.cosine))
    for sims in by_anchor.values():
        ordered = [c for _, c in sorted(sims)]
        assert ordered == sorted(ordered, reverse=True)


def test_lpa_labels_come_from_neighborhoods(spark):
    """After k sync rounds every node's label must be a node id from
    within its k-hop neighborhood; with k>=1 every label is some node's
    id and community count can only shrink vs the node count."""
    from spark_streaming_testbed_spark.operators.advanced import (
        lpa_communities,
    )

    rows = lpa_communities(spark, SF_CORRECT).collect()
    assert rows
    nodes = {r.node for r in rows}
    labels = {r.label for r in rows}
    assert labels <= nodes
    assert len(labels) <= len(nodes)


def test_two_pass_median_equals_buffered_percentile(spark):
    """The histogram-narrowed exact median must equal the classic
    buffered computation and sit at rank ceil(n/2) of each group."""
    from spark_streaming_testbed_spark.operators.relational import (
        exact_median_twopass,
    )

    rows = {r.event_type: r for r in
            exact_median_twopass(spark, SF_CORRECT).collect()}
    ev = load_table(spark, SF_CORRECT, "events")
    for et, r in rows.items():
        vals = sorted(
            v.value for v in ev.where(F.col("event_type") == et)
            .select("value").collect()
        )
        assert r.n_rows == len(vals)
        assert r.median == vals[(len(vals) + 1) // 2 - 1]


def test_pq_codes_cover_and_compress(spark):
    """Every vector gets a full code word; codes use the [0, PQ_K)
    alphabet and at least two distinct codes appear per subspace (the
    fit must not collapse)."""
    from spark_streaming_testbed_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        pq_codes,
    )

    rows = pq_codes(spark, SF_CORRECT).collect()
    n = load_table(spark, SF_CORRECT, "embeddings").count()
    assert len(rows) == n
    for m in range(PQ_M):
        vals = {getattr(r, f"code_{m}") for r in rows}
        assert vals <= set(range(PQ_K))
        assert len(vals) >= 2


def test_pq_adc_recall_against_exact_topk(spark):
    """ADC over 3-bit-per-subspace codes is coarse, but for each query
    at least one of the exact top-5 cosine neighbors should surface in
    the ADC top-5 for a majority of queries (sanity recall bound), and
    distances must be non-negative and ranked ascending."""
    from spark_streaming_testbed_spark.operators.similarity import (
        cosine_topk,
        pq_adc_topk,
    )

    adc = {}
    for r in pq_adc_topk(spark, SF_CORRECT).collect():
        assert r.adc_dist >= 0
        adc.setdefault(r.q_id, []).append(r.c_id)
    exact = {}
    for r in cosine_topk(spark, SF_CORRECT).collect():
        exact.setdefault(r.q_id, set()).add(r.c_id)
    hits = sum(
        1 for q, cands in adc.items() if exact.get(q, set()) & set(cands)
    )
    assert hits >= len(adc) * 0.3, f"{hits}/{len(adc)} queries overlap"


# ---------------------------------------------------------------------------
# Property tests (hypothesis): the math the streaming fold leans on
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from spark_streaming_testbed_spark.operators.advanced import (
    EWMA_ALPHA,
    EWMA_BETA,
)


def _fold(seq, s=None, n=0):
    for v in seq:
        s = v if n == 0 else EWMA_ALPHA * v + EWMA_BETA * s
        n += 1
    return s, n


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.floats(min_value=-1e6, max_value=1e6,
                       allow_nan=False, allow_infinity=False),
             min_size=1, max_size=60),
    st.integers(min_value=1, max_value=6),
)
def test_chunked_ewma_fold_is_bitwise_exact(values, n_chunks):
    """streaming_ewma's correctness rests on this: folding a sequence
    in ANY chunking, carrying (s, n) across chunks, is bitwise equal to
    the one-shot fold — IEEE754 ops are deterministic and the fold
    never re-associates."""
    one_s, one_n = _fold(values)
    # deterministic chunk boundaries derived from the example
    size = max(1, len(values) // n_chunks)
    s, n = None, 0
    for i in range(0, len(values), size):
        s, n = _fold(values[i:i + size], s, n)
    assert n == one_n
    assert s == one_s  # bitwise, no tolerance


def test_scd2_probe_covers_every_order_exactly_once(spark):
    """Every order must land in exactly one dimension version (the
    validity ranges partition each customer's timeline from their first
    order onward)."""
    from spark_streaming_testbed_spark.operators.relational import (
        scd2_pointintime_join,
    )

    out = scd2_pointintime_join(spark, SF_CORRECT)
    n_orders = load_table(spark, SF_CORRECT, "orders").count()
    assert out.agg(F.sum("n_orders")).first()[0] == n_orders


def test_bootstrap_ci_brackets_the_point_estimate(spark):
    from spark_streaming_testbed_spark.operators.relational import (
        BOOT_B,
        bootstrap_ci,
    )

    r = bootstrap_ci(spark, SF_CORRECT).collect()[0]
    assert r.n_replicates == BOOT_B
    assert r.ci_lo <= r.point_mean <= r.ci_hi
    # CI width for n=10k iid values should be modest but nonzero
    assert 0 < r.ci_hi - r.ci_lo < r.point_mean


def test_ab_test_arms_partition_users(spark):
    from spark_streaming_testbed_spark.operators.advanced import (
        conversion_ab_test,
    )

    r = conversion_ab_test(spark, SF_CORRECT).collect()[0]
    n_users = (
        load_table(spark, SF_CORRECT, "events")
        .select("user_id").distinct().count()
    )
    assert r.users_a + r.users_b == n_users
    assert 0 < r.rate_a < 1 and 0 < r.rate_b < 1
    assert r.significant_95 == (abs(r.z_score) >= 1.96)


def test_attribution_models_conserve_conversions(spark):
    """Both models attribute the SAME purchases (those with >=1 touch
    in the lookback), so totals across channels must agree between
    last-touch and first-touch."""
    from spark_streaming_testbed_spark.operators.advanced import (
        attribution_report,
    )

    rows = attribution_report(spark, SF_CORRECT).collect()
    assert rows
    assert sum(r.n_conv_last for r in rows) == sum(
        r.n_conv_first for r in rows
    )
    assert sum(r.revenue_last_cents for r in rows) == sum(
        r.revenue_first_cents for r in rows
    )


def test_cdc_chunks_reassemble_documents(spark):
    """Chunk lengths per doc must sum to the document length (the
    boundaries partition the text), and dup accounting is bounded."""
    from spark_streaming_testbed_spark.operators.dedup import (
        cdc_chunk_dedup,
    )

    rep = {r.doc_id: r for r in cdc_chunk_dedup(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    for d in docs:
        r = rep[d.doc_id]
        assert r.n_dup_chunks <= r.n_chunks
        assert 0 <= r.dup_chars <= len(d.text)


def test_winsorized_stats_shrink_spread(spark):
    from spark_streaming_testbed_spark.operators.relational import (
        winsorized_stats,
    )

    ev = load_table(spark, SF_CORRECT, "events")
    raw = {
        r.event_type: r.sd
        for r in ev.groupBy("event_type")
        .agg(F.stddev_pop("value").alias("sd")).collect()
    }
    for r in winsorized_stats(spark, SF_CORRECT).collect():
        assert r.p5 <= r.wins_mean <= r.p95
        assert r.wins_stddev <= raw[r.event_type] + 1e-9
        assert 0 <= r.n_clamped <= r.n


def test_seasonal_adjustment_cannot_increase_variance(spark):
    """ANOVA decomposition: subtracting the group (hour-of-day) mean
    can only remove between-group variance (up to the baseline's 6 dp
    rounding)."""
    from spark_streaming_testbed_spark.operators.relational import (
        seasonal_adjust,
    )

    rows = seasonal_adjust(spark, SF_CORRECT).collect()
    assert len(rows) == 24
    r = rows[0]
    assert r.residual_variance <= r.raw_variance + 1e-6
    assert all(x.n_days >= 1 and x.baseline > 0 for x in rows)


def test_revenue_concentration_bounds(spark):
    from spark_streaming_testbed_spark.operators.relational import (
        revenue_concentration,
    )

    r = revenue_concentration(spark, SF_CORRECT).collect()[0]
    assert 0.0 <= r.gini < 1.0
    # the top 20% of parts must hold at least 20% of revenue
    assert 0.2 <= r.top20_share <= 1.0


def test_kcore_monotone_and_consistent(spark):
    """Cores shrink as k grows; runs at sf0.01 because the sf0.001
    co-activity graph is empty (cores of size 0 are the correct
    degenerate answer there, pinned by the oracle)."""
    from spark_streaming_testbed_spark.operators.advanced import (
        kcore_decomposition,
    )
    from tests.conftest import SF_CORRECT

    rows = {r.k: r for r in kcore_decomposition(spark, SF_CORRECT).collect()}
    assert set(rows) == {2, 3}
    assert rows[3].core_nodes <= rows[2].core_nodes
    assert rows[3].core_edges <= rows[2].core_edges
    for r in rows.values():
        # a k-core node has >= k neighbors, so edges >= nodes*k/2
        assert 2 * r.core_edges >= r.k * r.core_nodes
