"""Scale-pattern proofs: bucketed co-located joins (no shuffle) and
partition pruning — the storage-layout levers for the 100 TB design,
asserted on actual physical plans."""

from __future__ import annotations

import tempfile

import pytest

from spark_streaming_testbed_spark.session import load_table
from tests.conftest import SF_SMOKE
from tests.test_plans import plan_of


def test_bucketed_join_avoids_exchange(spark):
    """Both sides bucketed by the join key into the same bucket count →
    the sort-merge join reads co-located buckets with NO Exchange."""
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    (
        lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_b")
    )
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_b")
    )
    joined = spark.table("li_b").join(
        spark.table("ord_b").hint("merge"),
        spark.table("li_b").l_orderkey == spark.table("ord_b").o_orderkey,
    )
    plan = plan_of(joined)
    assert "SortMergeJoin" in plan
    # co-located buckets: no shuffle exchange feeds the join
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() == lineitem.count()
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_partition_pruning_reads_one_day(spark):
    """Write events partitioned by day; a day-filtered read must prune to
    a single partition directory (PartitionFilters in the scan)."""
    from pyspark.sql import functions as F

    events = load_table(spark, SF_SMOKE, "events")
    with tempfile.TemporaryDirectory(prefix="part_") as tmp:
        (
            events.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
            .write.partitionBy("day").mode("overwrite")
            .parquet(f"{tmp}/events_by_day")
        )
        df = (
            spark.read.parquet(f"{tmp}/events_by_day")
            .where(F.col("day") == "2024-01-05")
        )
        plan = plan_of(df)
        assert "PartitionFilters" in plan
        assert "2024-01-05" in plan
        n_one_day = df.count()
        n_expected = events.where(
            F.date_format("ts", "yyyy-MM-dd") == "2024-01-05"
        ).count()
        assert n_one_day == n_expected > 0


def test_write_partitioned_bounds_file_sizes(spark):
    """The warehouse writer produces day directories whose parquet file
    count matches ceil(rows/max_records_per_file) — no small-file storm,
    no giant single file — and the round-trip preserves every row."""
    import glob
    import math

    from pyspark.sql import functions as F

    from spark_streaming_testbed_spark.sources.warehouse import (
        compact,
        write_partitioned,
    )

    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    per_day = {
        r["day"]: r["cnt"]
        for r in events.groupBy("day").agg(
            F.count(F.lit(1)).alias("cnt")).collect()
    }
    with tempfile.TemporaryDirectory(prefix="wh_") as tmp:
        target = 40
        write_partitioned(
            events, f"{tmp}/events", ["day"], max_records_per_file=target
        )
        for day, cnt in per_day.items():
            files = glob.glob(f"{tmp}/events/day={day}/*.parquet")
            assert len(files) == math.ceil(cnt / target), (day, cnt, len(files))
        back = spark.read.parquet(f"{tmp}/events")
        assert back.count() == events.count()

        # compaction: re-layout the same rows into bigger files
        compacted = compact(
            spark, f"{tmp}/events", f"{tmp}/events_c", ["day"],
            max_records_per_file=10_000,
        )
        assert compacted.count() == events.count()
        for day in per_day:
            files = glob.glob(f"{tmp}/events_c/day={day}/*.parquet")
            assert len(files) == 1, (day, files)
        with pytest.raises(ValueError):
            compact(spark, f"{tmp}/events", f"{tmp}/events", ["day"])


def test_dynamic_partition_pruning_on_dim_filter(spark):
    """Joining a day-partitioned fact to a filtered dim injects a
    dynamicpruning subquery into the fact scan — at 100 TB the fact
    reads only the dim-selected days, not the whole table."""
    from pyspark.sql import functions as F

    events = load_table(spark, SF_SMOKE, "events")
    with tempfile.TemporaryDirectory(prefix="dpp_") as tmp:
        (
            events.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
            .write.partitionBy("day").mode("overwrite")
            .parquet(f"{tmp}/ev")
        )
        fact = spark.read.parquet(f"{tmp}/ev")
        days = ["2024-01-05", "2024-01-06"]
        dim = spark.createDataFrame(
            [(d, 1) for d in days] + [("2024-01-07", 0)],
            "day string, flag int",
        )
        j = fact.join(dim.where(F.col("flag") == 1), "day")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower()
        expected = events.where(
            F.date_format("ts", "yyyy-MM-dd").isin(days)
        ).count()
        assert j.count() == expected > 0


def test_aqe_splits_skewed_join_partition(spark):
    """A 90%-hot join key makes AQE re-plan the sort-merge join with the
    skewed partition split (skew=true + AQEShuffleRead skewed) — the
    runtime answer to hot keys at 100 TB, complementing the manual
    salting in `skew_salted_agg`. Thresholds are lowered so the tiny
    fixture qualifies; the assertion is on the FINAL adaptive plan, which
    only exists after executing this exact DataFrame (not `.count()`)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 55_000).withColumn(
            "k",
            F.when(F.col("id") < 50_000, F.lit(0)).otherwise(F.col("id") % 100),
        ).withColumn("pad", F.lpad(F.lit("x"), 64, "x"))
        right = (
            spark.range(0, 100).withColumnRenamed("id", "k")
            .withColumn("v", F.col("k") * 2)
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 55_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
