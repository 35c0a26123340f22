"""Log-lake parser tests: synthetic lines with known expectations, plus
parsing the reference's real checked-in logs when available."""

from __future__ import annotations

import os

import pytest

from spark_streaming_testbed_spark.sources import loglake

REF_RUN_001 = "/root/reference/test-runs-001/vanilla-1.4.0-7-50000"
REF_RECV_006 = (
    "/root/reference/test-runs-006/"
    "1.5.0-rc3-7-25000.60-8-25000.100-7-25000.150_pid"
)


def lines_df(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "value string")


def test_parse_execution_and_malformed_drop(spark):
    rows = loglake.parse_execution(
        lines_df(spark, [
            "batch result: 1434457808277\t1434457805000\t7\t0\t88500\tx",
            "some unrelated line",
            "batch result: garbage",
        ])
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.time_ms, r.batch_time_ms, r.value, r.stream_id, r["count"]) == (
        1434457808277, 1434457805000, 7, 0, 88500,
    )


def test_parse_memory_units_and_formats(spark):
    rows = loglake.parse_memory(
        lines_df(spark, [
            "2015-06-16 12:30:03,100+0000 INFO x: Added input-0-1 (size: 1 KB, free: 431.7 KB)",
            "15/06/16 12:30:03 INFO x: Added input-0-2 (size: 1 KB, free: 264.9 MB)",
            "junk",
        ])
    ).orderBy("time_ms").collect()
    assert len(rows) == 2
    # the yy/MM/dd line has no millis → sorts first (…03.000 < …03.100)
    assert rows[0].free_kb == pytest.approx(264.9 * 1024)
    assert rows[1].free_kb == pytest.approx(431.7)


def test_parse_feedback_drops_zero_limits(spark):
    rows = loglake.parse_feedback(
        lines_df(spark, [
            "2015-09-04 13:33:51,146+0000 INFO R: Received a new rate limit for 0 : 15729.",
            "2015-09-04 13:33:52,146+0000 INFO R: Received a new rate limit for 0 : 0.",
        ])
    ).collect()
    assert len(rows) == 1
    assert rows[0].limit == 15729 and rows[0].stream_id == 0


def test_parse_tick_dropped_requested_ratio(spark):
    tick = loglake.parse_tick(
        lines_df(spark, [
            "2015-07-27 15:05:15.144+0000 INFO DataGeneratorActor: At tick 3, 2689 times 7",
        ])
    ).collect()
    assert tick[0].value == 7 and tick[0]["count"] == 2689
    dropped = loglake.parse_dropped(
        lines_df(spark, [
            "2015-07-27 15:05:15.144+0000 WARN a: unable to deliver 280 values to client 1",
        ])
    ).collect()
    assert dropped[0]["count"] == 280 and dropped[0].client_id == 1
    req = loglake.parse_requested(
        lines_df(spark, [
            "2015-07-27 15:05:15.144+0000 INFO a: received request for 500 values from client 2",
        ])
    ).collect()
    assert req[0]["count"] == 500 and req[0].client_id == 2
    ratio = loglake.parse_ratio(
        lines_df(spark, [
            "2015-07-02 10:58:12,402+0000 DEBUG D: Dropping for stream 0 block with ratio of 0.19.",
        ])
    ).collect()
    assert ratio[0].ratio == pytest.approx(0.19) and ratio[0].stream_id == 0


def test_stacked_counts_missing_propagation(spark):
    from pyspark.sql import functions as F

    pivoted = spark.createDataFrame(
        [(1000, 2, None, 5), (2000, None, 3, None)],
        "batch_time_ms long, a int, b int, c int",
    )
    out = {
        r.batch_time_ms: (r.acc_a, r.acc_b, r.acc_c)
        for r in loglake.stacked_counts(pivoted, ["a", "b", "c"]).collect()
    }
    # missing cell → null, accumulator not advanced (TestData.scala:155-168)
    assert out[1000] == (2, None, 7)
    assert out[2000] == (None, 3, None)
    _ = F


@pytest.mark.skipif(
    not os.path.exists(f"{REF_RUN_001}/memory.log"),
    reason="reference logs not present",
)
def test_parse_real_reference_memory_log(spark):
    lines = spark.read.text(f"{REF_RUN_001}/memory.log")
    parsed = loglake.parse_memory(lines)
    n = parsed.count()
    assert n > 100
    # all 2015 epoch millis, all free_kb positive
    row = parsed.agg(
        {"time_ms": "min", "free_kb": "min"}
    ).collect()[0]
    assert row["min(time_ms)"] > 1.4e12
    assert row["min(free_kb)"] > 0


@pytest.mark.skipif(
    not os.path.exists(f"{REF_RECV_006}/receiver_0.log"),
    reason="reference logs not present",
)
def test_parse_real_reference_receiver_log(spark):
    lines = spark.read.text(f"{REF_RECV_006}/receiver_0.log")
    fb = loglake.parse_feedback(lines)
    assert fb.count() > 10
    stats = fb.agg({"limit": "max", "time_ms": "min"}).collect()[0]
    assert stats["max(limit)"] > 1000
    assert stats["min(time_ms)"] > 1.4e12
