"""Live StreamingQueryListener → PID integration over a real query."""

from __future__ import annotations

import tempfile
import time

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
        # Listener events arrive asynchronously on the listener bus — poll
        # until all 800 rows have been reported before asserting.
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            if sum(s["rows"] for s in listener.samples) >= 800 and listener.estimates:
                break
            time.sleep(0.25)
    finally:
        spark.streams.removeListener(listener)

    with_rows = [s for s in listener.samples if s["rows"] > 0]
    assert len(with_rows) >= 1  # at least one trigger observed
    assert sum(s["rows"] for s in with_rows) == 800  # all profile rows seen
    assert len(listener.estimates) >= 1  # PID produced live estimates
    assert all(e > 0 for e in listener.estimates)
