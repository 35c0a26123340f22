"""Live TCP socket source test (S1): generator thread → spark socket
stream → parse-filter → counts. Time-bounded; skips rather than flakes
if the socket round cannot complete in this environment."""

from __future__ import annotations

import time
import uuid

import pytest

from spark_streaming_testbed_spark.plans import parse_plan
from spark_streaming_testbed_spark.sources.socket_source import (
    ProfileSocketServer,
    socket_stream,
)

PLAN = '{"sequence": [{"type": "cycle", "values": [5, 6], "rate": 40, "duration": 2}]}'


def test_socket_source_end_to_end(spark):
    plan = parse_plan(PLAN)
    expected = len(plan.rows())  # 80 values
    server = ProfileSocketServer(plan)
    name = f"sock_{uuid.uuid4().hex[:8]}"
    q = None
    try:
        stream = socket_stream(spark, "127.0.0.1", server.port)
        q = (
            stream.groupBy("value").count()
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        deadline = time.time() + 30
        total = 0
        while time.time() < deadline:
            rows = spark.sql(f"SELECT sum(count) AS n FROM {name}").collect()
            total = rows[0].n or 0
            if total >= expected:
                break
            time.sleep(0.5)
        if total != expected:
            # partial/empty delivery = environment timing (socket source
            # has no replay); only a wrong-but-complete result is a bug
            pytest.skip(
                f"socket delivered {total}/{expected} within deadline"
            )
        per_value = {
            r.value: r["count"] for r in spark.table(name).collect()
        }
        assert per_value == {5: 40, 6: 40}
    finally:
        if q is not None:
            q.stop()
        server.close()
