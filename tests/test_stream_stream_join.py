"""Stream-stream inner join with watermarks + event-time constraint —
the Structured Streaming capability tier above the reference (T9
stretch): two live profile streams joined on key within a time bound,
verified against the equivalent batch join."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from spark_streaming_testbed_spark.plans import parse_plan
from spark_streaming_testbed_spark.sources.profile_source import (
    profile_dataframe,
    profile_stream,
)

PLAN_A = '{"sequence": [{"type": "cycle", "values": [1, 2, 3], "rate": 30, "duration": 4}]}'
PLAN_B = '{"sequence": [{"type": "cycle", "values": [2, 3, 4], "rate": 30, "duration": 4}]}'


def _join(left, right):
    l = left.withWatermark("ts", "10 seconds").select(
        F.col("ts").alias("lts"), F.col("value").alias("v")
    )
    r = right.withWatermark("ts", "10 seconds").select(
        F.col("ts").alias("rts"), F.col("value").alias("v")
    )
    return l.join(
        r,
        (l.v == r.v)
        & (r.rts >= l.lts)
        & (r.rts <= l.lts + F.expr("interval 1 second")),
    ).select(l.v.alias("v"), "lts", "rts")


def test_stream_stream_join_matches_batch(spark):
    plan_a, plan_b = parse_plan(PLAN_A), parse_plan(PLAN_B)
    with tempfile.TemporaryDirectory() as tmp:
        sa = profile_stream(spark, plan_a, tmp, stream_id=0, seconds_per_file=2)
        sb = profile_stream(spark, plan_b, tmp, stream_id=1, seconds_per_file=2)
        name = f"ssj_{uuid.uuid4().hex[:8]}"
        q = (
            _join(sa, sb)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        stream_rows = {tuple(r) for r in spark.table(name).collect()}

    batch_rows = {
        tuple(r)
        for r in _join(
            profile_dataframe(spark, plan_a), profile_dataframe(spark, plan_b)
        ).collect()
    }
    assert len(batch_rows) > 0
    assert stream_rows == batch_rows
