"""Live StreamingQueryListener → PID integration over a real query."""

from __future__ import annotations

import tempfile

from spark_streaming_testbed_spark.plans import parse_plan
from spark_streaming_testbed_spark.sources.profile_source import profile_stream
from spark_streaming_testbed_spark.streaming.listener import RateFeedbackListener
from spark_streaming_testbed_spark.streaming.pipeline import (
    run_stream_to_table,
    windowed_stats,
)


def test_listener_receives_real_metrics_and_estimates(spark):
    listener = RateFeedbackListener()
    spark.streams.addListener(listener)
    try:
        plan = parse_plan(
            '{"sequence": [{"type": "fixed", "value": 6, "rate": 100, '
            '"duration": 8}]}'
        )
        with tempfile.TemporaryDirectory() as tmp:
            stream = profile_stream(spark, plan, tmp, seconds_per_file=2)
            table = run_stream_to_table(
                windowed_stats(stream, window="4 seconds"), mode="complete"
            )
            assert spark.table(table).count() > 0
    finally:
        spark.streams.removeListener(listener)

    with_rows = [s for s in listener.samples if s["rows"] > 0]
    assert len(with_rows) >= 2  # multiple triggers observed
    assert sum(s["rows"] for s in with_rows) == 800  # all profile rows seen
    assert len(listener.estimates) >= 1  # PID produced live estimates
    assert all(e > 0 for e in listener.estimates)
