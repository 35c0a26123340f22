"""Degenerate-input contracts (round-9 sweep, tools/degenerate_sweep.py).

At warehouse scale every query eventually runs over an empty landing
zone or a single-row partition. The r9 sweep found 26 queries that
either crashed (ANSI div-by-zero, np.stack over an empty fit sample,
driver-side int(None)) or diverged from their oracle (NULL-vs-0 on
empty aggregates, Spark cube() vs ANSI CUBE over empty input). These
tests pin the fixed behavior per failure class so it cannot regress;
the registry-wide evidence is DEGENERATE_SWEEP_r09.json.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE

SRC = SF_SMOKE


def _tier(tmp_path, n_rows: int) -> str:
    d = tmp_path / f"tier_{n_rows}"
    d.mkdir()
    for f in sorted(os.listdir(SRC)):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(SRC, f))
            pq.write_table(t.slice(0, n_rows), str(d / f))
    return str(d)


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    return _tier(tmp_path_factory.mktemp("degen"), 0)


@pytest.fixture(scope="module")
def one_row_dir(tmp_path_factory):
    return _tier(tmp_path_factory.mktemp("degen1"), 1)


# --- crash class: empty-corpus index fits must short-circuit ----------


def test_ann_ivf_topk_empty_corpus(spark, empty_dir):
    from spark_streaming_testbed_spark.operators.similarity import (
        ann_ivf_topk,
    )

    out = ann_ivf_topk(spark, empty_dir)
    assert out.columns == ["q_id", "rk", "c_id", "cosine"]
    assert out.count() == 0


def test_ivf_assign_empty_corpus(spark, empty_dir):
    from spark_streaming_testbed_spark.operators.similarity import ivf_assign

    out = ivf_assign(spark, empty_dir)
    # the contract schema must not vary with corpus emptiness: the
    # empty early-return and the fitted path both end at exactly these
    # three columns (ADVICE r9 — no _cents/_dists helper leakage)
    assert out.columns == ["vec_id", "embedding", "list_id"]
    assert out.count() == 0


def test_ivf_assign_schema_invariant_nonempty(spark):
    from spark_streaming_testbed_spark.operators.similarity import ivf_assign

    out = ivf_assign(spark, SRC)
    assert out.columns == ["vec_id", "embedding", "list_id"]


def test_pq_codes_and_adc_empty_corpus(spark, empty_dir):
    from spark_streaming_testbed_spark.operators.similarity import (
        PQ_M,
        pq_adc_topk,
        pq_codes,
    )

    codes = pq_codes(spark, empty_dir)
    assert codes.columns == ["vec_id"] + [f"code_{m}" for m in range(PQ_M)]
    assert codes.count() == 0
    assert pq_adc_topk(spark, empty_dir).count() == 0


def test_ts_similarity_pairs_empty_events(spark, empty_dir):
    from spark_streaming_testbed_spark.operators.advanced import (
        ts_similarity_pairs,
    )

    out = ts_similarity_pairs(spark, empty_dir)
    assert out.columns == ["user_a", "user_b", "n_days", "pearson_r"]
    assert out.count() == 0


# --- crash class: ANSI division by zero must yield NULL, not raise ----


def test_event_funnel_empty_yields_null_pct(spark, empty_dir):
    from spark_streaming_testbed_spark.operators.advanced import event_funnel

    rows = event_funnel(spark, empty_dir).collect()
    assert len(rows) == 3  # every stage row survives with 0 users
    assert all(r["users"] == 0 and r["pct_of_top"] is None for r in rows)


def test_funnel_time_bounded_empty_keeps_bigint_type(spark, empty_dir):
    from spark_streaming_testbed_spark.operators.prep import (
        funnel_time_bounded,
    )

    out = funnel_time_bounded(spark, empty_dir)
    # the when()-guard must NOT widen the integer-division dtype
    assert dict(out.dtypes)["pct_of_top_bp"] == "bigint"
    rows = out.collect()
    assert len(rows) == 3
    assert all(r["pct_of_top_bp"] is None for r in rows)


def test_groupwise_regression_single_point_is_null(spark, one_row_dir):
    from spark_streaming_testbed_spark.operators.advanced import (
        groupwise_regression,
    )

    rows = groupwise_regression(spark, one_row_dir).collect()
    assert len(rows) == 1  # one event type from the single event
    r = rows[0]
    # one point: slope / intercept / r² are undefined, never 0-guesses
    assert r["slope_per_day"] is None
    assert r["intercept"] is None
    assert r["r2"] is None


def test_percentile_rank_single_member_group_null(spark, one_row_dir):
    from spark_streaming_testbed_spark.operators.prep import (
        percentile_rank_features,
    )

    rows = percentile_rank_features(spark, one_row_dir).collect()
    assert len(rows) == 1
    assert rows[0]["pr_bp"] is None  # n=1: no rank span


def test_column_histograms_constant_column_top_bin(spark, one_row_dir):
    from spark_streaming_testbed_spark.operators.relational import (
        HIST_BINS,
        column_histograms,
    )

    rows = column_histograms(spark, one_row_dir).collect()
    # hi == lo: NULL quotient + NULL-skipping least() = top bin, the
    # same row DuckDB's least() produces — pinned so both engines agree
    assert len(rows) == 1
    assert rows[0]["bin"] == HIST_BINS - 1
    assert rows[0]["cnt"] == 1


# --- divergence class: empty aggregates must match oracle semantics ---


def test_cube_rollup_empty_input_no_rows(spark, empty_dir):
    from spark_streaming_testbed_spark.operators.relational import (
        cube_agg,
        rollup_agg,
    )

    # Spark's cube()/rollup() emit nothing over an empty relation; the
    # oracles pin this with HAVING cnt > 0 (vs ANSI's cnt=0 () row)
    assert cube_agg(spark, empty_dir).count() == 0
    assert rollup_agg(spark, empty_dir).count() == 0


def test_dq_report_empty_tables_all_pass(spark, empty_dir):
    from spark_streaming_testbed_spark.operators.relational import dq_report

    rows = dq_report(spark, empty_dir).collect()
    assert rows  # every check row present
    # an empty feed has zero violations — it PASSES the audit, the
    # NULL sums must not void the report
    assert all(r["n_violations"] == 0 and r["passed"] for r in rows)


def test_table_profile_empty_renders_null_not_string(spark, empty_dir):
    from spark_streaming_testbed_spark.operators.relational import (
        table_profile,
    )

    rows = {r["column_name"]: r for r in table_profile(spark, empty_dir).collect()}
    v = rows["value"]
    # format_string('%.6f', NULL) used to render the STRING 'null'
    assert v["min_s"] is None and v["max_s"] is None
    assert v["n_rows"] == 0 and v["n_distinct"] == 0


def test_mix_shift_empty_chi2_is_null_and_alerts(spark, empty_dir):
    from spark_streaming_testbed_spark.operators.relational import (
        mix_shift_test,
        pipeline_health_report,
    )

    r = mix_shift_test(spark, empty_dir).collect()[0]
    # zero orders: the statistic is untestable (NULL), not chi²=0 "ok"
    assert r["chi2"] is None
    health = {
        row["metric"]: row
        for row in pipeline_health_report(spark, empty_dir).collect()
    }
    assert health["priority_mix_chi2"]["status"] == "alert"


def test_ann_recall_eval_empty_zero_not_null(spark, empty_dir):
    from spark_streaming_testbed_spark.operators.similarity import (
        ann_recall_eval,
    )

    r = ann_recall_eval(spark, empty_dir).collect()[0]
    assert r["n_queries"] == 0
    assert r["n_perfect_queries"] == 0  # SUM-over-nothing coalesced


# --- nulls tier (malformed feed: 20% NULL text/value/props) -----------


@pytest.fixture(scope="module")
def nulls_dir(tmp_path_factory):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from degenerate_sweep import build_null_tier

    d = tmp_path_factory.mktemp("degen_nulls") / "tier"
    d.mkdir()
    build_null_tier(SRC, str(d))
    return str(d)


def test_with_grams_null_text_yields_no_grams(spark, nulls_dir):
    from pyspark.sql import functions as F

    from spark_streaming_testbed_spark.operators.text import (
        with_grams,
        with_tokens,
    )
    from spark_streaming_testbed_spark.session import load_table

    docs = with_tokens(load_table(spark, nulls_dir, "documents"))
    grams = with_grams(docs, 2, "grams")
    # the NGram transformer NPE'd on NULL token arrays before the
    # boundary guard; a NULL document must yield [] grams (exactly the
    # oracles' unnest(NULL) — zero gram rows downstream)
    nulls = grams.where(F.col("text").isNull())
    assert nulls.count() > 0
    assert nulls.where(F.size("grams") != 0).count() == 0
    # and the tokens column itself is untouched (still NULL)
    assert nulls.where(F.col("tokens").isNotNull()).count() == 0


def test_png_assets_skip_null_text_docs(spark, nulls_dir):
    from spark_streaming_testbed_spark.operators.multimodal import (
        png_assets,
    )
    from spark_streaming_testbed_spark.session import load_table

    docs = load_table(spark, nulls_dir, "documents")
    n_null = docs.where("text IS NULL").count()
    assert n_null > 0
    # no content, no asset: str(None) used to rasterize "None" pixels
    assert png_assets(spark, nulls_dir).count() == docs.count() - n_null


def test_percentile_rank_null_values_rank_last(spark, nulls_dir):
    from pyspark.sql import functions as F

    from spark_streaming_testbed_spark.operators.prep import (
        percentile_rank_features,
    )

    out = percentile_rank_features(spark, nulls_dir)
    # nulls_last pins Spark's NULLS-FIRST default to the oracle's
    # NULLS-LAST: within every group, every null-value row must
    # out-rank every measured row
    per_group = (
        out.groupBy("event_type")
        .agg(
            F.max(F.when(F.col("value").isNotNull(), F.col("pr_bp")))
            .alias("max_measured"),
            F.min(F.when(F.col("value").isNull(), F.col("pr_bp")))
            .alias("min_null"),
        )
        .collect()
    )
    # a group that is all-null or all-measured has one side None —
    # that's a fixture shape, not a ranking defect, so skip it instead
    # of dying on a None comparison (ADVICE r9); but the tier must
    # still produce at least one mixed group or the test checks nothing
    mixed = [
        r for r in per_group
        if r["min_null"] is not None and r["max_measured"] is not None
    ]
    assert mixed, f"no mixed null/measured group in tier: {per_group}"
    for r in mixed:
        assert r["min_null"] > r["max_measured"]


def test_approx_percentiles_rank_window_contract(spark):
    from spark_streaming_testbed_spark.operators.relational import (
        approx_percentiles,
    )

    rows = approx_percentiles(spark, SRC).collect()
    # the flags are a RANK-window contract (sketch guarantees rank
    # error, not value error); on the committed corpus every group
    # must satisfy it
    assert rows and all(r["a50_ok"] and r["a95_ok"] for r in rows)
